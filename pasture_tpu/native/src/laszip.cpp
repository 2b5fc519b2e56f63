// LASzip codec — native implementation for pasture_tpu.
//
// Replaces the pure-Rust `laz` crate the reference depends on
// (pasture-io uses laz::LasZipDecompressor / LasZipCompressor,
// raw_readers.rs:418-660).  Implements the LASzip 2.x "pointwise chunked"
// scheme (compressor 2): Amir Said's FastAC range coder with adaptive
// bit/symbol models, the k-bit corrector IntegerCompressor, and the item
// codecs POINT10 v2, GPSTIME11 v2, RGB12 v2, WAVEPACKET13 v1, BYTE v2.
// Chunks are independent, so decompression fans out over host threads
// (SURVEY.md §7 hard part (d)).
//
// Exposed as a small extern "C" surface driven from Python via ctypes
// (pasture_tpu/native/laszip.py).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <thread>
#include <algorithm>

namespace {

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;
typedef int8_t I8;
typedef int16_t I16;
typedef int32_t I32;
typedef int64_t I64;

constexpr U32 AC_MIN_LENGTH = 0x01000000u;
constexpr U32 AC_MAX_LENGTH = 0xFFFFFFFFu;
constexpr U32 BM_LENGTH_SHIFT = 13;
constexpr U32 BM_MAX_COUNT = 1u << BM_LENGTH_SHIFT;
constexpr U32 DM_LENGTH_SHIFT = 15;
constexpr U32 DM_MAX_COUNT = 1u << DM_LENGTH_SHIFT;

// ---------------------------------------------------------------- models ----

struct ArithmeticBitModel {
  U32 bit_0_prob, bit_0_count, bit_count, update_cycle, bits_until_update;

  void init() {
    bit_0_count = 1;
    bit_count = 2;
    bit_0_prob = 1u << (BM_LENGTH_SHIFT - 1);
    update_cycle = bits_until_update = 4;
  }

  void update() {
    if ((bit_count += update_cycle) > BM_MAX_COUNT) {
      bit_count = (bit_count + 1) >> 1;
      bit_0_count = (bit_0_count + 1) >> 1;
      if (bit_0_count == bit_count) ++bit_count;
    }
    U32 scale = 0x80000000u / bit_count;
    bit_0_prob = (bit_0_count * scale) >> (31 - BM_LENGTH_SHIFT);
    update_cycle = (5 * update_cycle) >> 2;
    if (update_cycle > 64) update_cycle = 64;
    bits_until_update = update_cycle;
  }
};

struct ArithmeticModel {
  std::vector<U32> distribution, symbol_count, decoder_table;
  U32 symbols = 0, total_count = 0, update_cycle = 0, symbols_until_update = 0;
  U32 last_symbol = 0, table_size = 0, table_shift = 0;
  bool compress = false;

  void init(U32 nsymbols, bool for_compress) {
    symbols = nsymbols;
    compress = for_compress;
    last_symbol = symbols - 1;
    distribution.assign(symbols, 0);
    symbol_count.assign(symbols, 1);
    if (!compress && symbols > 16) {
      U32 table_bits = 3;
      while (symbols > (1u << (table_bits + 2))) ++table_bits;
      table_size = 1u << table_bits;
      table_shift = DM_LENGTH_SHIFT - table_bits;
      decoder_table.assign(table_size + 2, 0);
    } else {
      table_size = table_shift = 0;
      decoder_table.clear();
    }
    total_count = 0;
    update_cycle = symbols;
    update();
    symbols_until_update = update_cycle = (symbols + 6) >> 1;
  }

  void update() {
    if ((total_count += update_cycle) > DM_MAX_COUNT) {
      total_count = 0;
      for (U32 k = 0; k < symbols; k++)
        total_count += (symbol_count[k] = (symbol_count[k] + 1) >> 1);
    }
    U32 sum = 0, s = 0;
    U32 scale = 0x80000000u / total_count;
    if (compress || table_size == 0) {
      for (U32 k = 0; k < symbols; k++) {
        distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
        sum += symbol_count[k];
      }
    } else {
      for (U32 k = 0; k < symbols; k++) {
        distribution[k] = (scale * sum) >> (31 - DM_LENGTH_SHIFT);
        sum += symbol_count[k];
        U32 w = distribution[k] >> table_shift;
        while (s < w) decoder_table[++s] = k - 1;
      }
      decoder_table[0] = 0;
      while (s <= table_size) decoder_table[++s] = symbols - 1;
    }
    update_cycle = (5 * update_cycle) >> 2;
    U32 max_cycle = (symbols + 6) << 3;
    if (update_cycle > max_cycle) update_cycle = max_cycle;
    symbols_until_update = update_cycle;
  }
};

// --------------------------------------------------------------- decoder ----

struct Decoder {
  const U8* buf;
  size_t pos, size;
  U32 value = 0, length = 0;
  bool overrun = false;

  U8 getByte() {
    if (pos >= size) {
      overrun = true;
      ++pos;
      return 0;
    }
    return buf[pos++];
  }

  void init() {
    value = (U32(getByte()) << 24) | (U32(getByte()) << 16) |
            (U32(getByte()) << 8) | U32(getByte());
    length = AC_MAX_LENGTH;
  }

  void renorm() {
    do {
      value = (value << 8) | getByte();
    } while ((length <<= 8) < AC_MIN_LENGTH);
  }

  U32 decodeBit(ArithmeticBitModel& m) {
    U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    U32 sym = (value >= x);
    if (sym == 0) {
      length = x;
      ++m.bit_0_count;
    } else {
      value -= x;
      length -= x;
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
    return sym;
  }

  U32 decodeSymbol(ArithmeticModel& m) {
    U32 n, sym, x, y = length;
    if (!m.decoder_table.empty()) {
      U32 dv = value / (length >>= DM_LENGTH_SHIFT);
      U32 t = dv >> m.table_shift;
      sym = m.decoder_table[t];
      n = m.decoder_table[t + 1] + 1;
      while (n > sym + 1) {
        U32 k = (sym + n) >> 1;
        if (m.distribution[k] > dv) n = k; else sym = k;
      }
      x = m.distribution[sym] * length;
      if (sym != m.last_symbol) y = m.distribution[sym + 1] * length;
    } else {
      x = sym = 0;
      length >>= DM_LENGTH_SHIFT;
      U32 k = (n = m.symbols) >> 1;
      do {
        U32 z = length * m.distribution[k];
        if (z > value) {
          n = k;
          y = z;
        } else {
          sym = k;
          x = z;
        }
      } while ((k = (sym + n) >> 1) != sym);
    }
    value -= x;
    length = y - x;
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
    return sym;
  }

  U32 readBits(U32 bits) {  // bits <= 19
    U32 sym = value / (length >>= bits);
    value -= sym * length;
    if (length < AC_MIN_LENGTH) renorm();
    return sym;
  }

  U32 readShort() { return readBits(16); }
  U32 readInt() {
    U32 lo = readShort();
    U32 hi = readShort();
    return (hi << 16) | lo;
  }
  U64 readInt64() {
    U64 lo = readInt();
    U64 hi = readInt();
    return (hi << 32) | lo;
  }
};

// --------------------------------------------------------------- encoder ----

struct Encoder {
  std::vector<U8> out;
  U32 base = 0, length = AC_MAX_LENGTH;

  void init() {
    base = 0;
    length = AC_MAX_LENGTH;
    out.clear();
  }

  void propagate_carry() {
    size_t p = out.size();
    while (p > 0 && out[p - 1] == 0xFF) out[--p] = 0;
    if (p > 0) ++out[p - 1];
  }

  void renorm() {
    do {
      out.push_back(U8(base >> 24));
      base <<= 8;
    } while ((length <<= 8) < AC_MIN_LENGTH);
  }

  void encodeBit(ArithmeticBitModel& m, U32 bit) {
    U32 x = m.bit_0_prob * (length >> BM_LENGTH_SHIFT);
    if (bit == 0) {
      length = x;
      ++m.bit_0_count;
    } else {
      U32 init_base = base;
      base += x;
      length -= x;
      if (init_base > base) propagate_carry();
    }
    if (length < AC_MIN_LENGTH) renorm();
    if (--m.bits_until_update == 0) m.update();
  }

  void encodeSymbol(ArithmeticModel& m, U32 sym) {
    U32 x, init_base = base;
    if (sym == m.last_symbol) {
      // NB: non-mutating shift — the last symbol's interval extends to the
      // full (unshifted) length, mirroring the decoder's y = length
      x = m.distribution[sym] * (length >> DM_LENGTH_SHIFT);
      base += x;
      length -= x;
    } else {
      x = m.distribution[sym] * (length >>= DM_LENGTH_SHIFT);
      base += x;
      length = m.distribution[sym + 1] * length - x;
    }
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
    ++m.symbol_count[sym];
    if (--m.symbols_until_update == 0) m.update();
  }

  void writeBits(U32 bits, U32 sym) {  // bits <= 19
    U32 init_base = base;
    base += sym * (length >>= bits);
    if (init_base > base) propagate_carry();
    if (length < AC_MIN_LENGTH) renorm();
  }

  void writeShort(U32 sym) { writeBits(16, sym); }
  void writeInt(U32 sym) {
    writeShort(sym & 0xFFFF);
    writeShort(sym >> 16);
  }
  void writeInt64(U64 sym) {
    writeInt(U32(sym & 0xFFFFFFFFu));
    writeInt(U32(sym >> 32));
  }

  void done() {
    U32 init_base = base;
    if (length > 2 * AC_MIN_LENGTH) {
      base += AC_MIN_LENGTH;
      length = AC_MIN_LENGTH >> 1;
    } else {
      base += AC_MIN_LENGTH >> 1;
      length = AC_MIN_LENGTH >> 9;
    }
    if (init_base > base) propagate_carry();
    renorm();
    // the decoder reads 4 init bytes; pad so they exist
    out.push_back(0);
    out.push_back(0);
    out.push_back(0);
  }
};

// ---------------------------------------------------- integer compressor ----

struct IntegerModelSet {
  std::vector<ArithmeticModel> mBits;       // one per context
  ArithmeticBitModel mCorrector0;
  std::vector<ArithmeticModel> mCorrector;  // 1..corr_bits
};

struct IntegerCodec {
  U32 bits, contexts, bits_high;
  U32 corr_bits, corr_range;
  I32 corr_min, corr_max;
  U32 k = 0;
  IntegerModelSet m;

  void setup(U32 bits_, U32 contexts_, U32 bits_high_ = 8) {
    bits = bits_;
    contexts = contexts_;
    bits_high = bits_high_;
    if (bits && bits < 32) {
      corr_bits = bits;
      corr_range = 1u << bits;
      corr_min = -I32(corr_range / 2);
      corr_max = corr_min + I32(corr_range) - 1;
    } else {
      corr_bits = 32;
      corr_range = 0;
      corr_min = INT32_MIN;
      corr_max = INT32_MAX;
    }
  }

  void initModels(bool for_compress) {
    m.mBits.resize(contexts);
    for (U32 c = 0; c < contexts; c++) m.mBits[c].init(corr_bits + 1, for_compress);
    m.mCorrector0.init();
    m.mCorrector.resize(corr_bits + 1);
    for (U32 i = 1; i <= corr_bits; i++)
      m.mCorrector[i].init(i <= bits_high ? (1u << i) : (1u << bits_high),
                           for_compress);
  }

  I32 readCorrector(Decoder& dec, ArithmeticModel& mb) {
    I32 c;
    k = dec.decodeSymbol(mb);
    if (k) {
      if (k < 32) {
        if (k <= bits_high) {
          c = I32(dec.decodeSymbol(m.mCorrector[k]));
        } else {
          U32 k1 = k - bits_high;
          c = I32(dec.decodeSymbol(m.mCorrector[k]));
          U32 c1 = (k1 <= 19) ? dec.readBits(k1)
                              : ((dec.readBits(16)) | (dec.readBits(k1 - 16) << 16));
          c = (c << k1) | I32(c1);
        }
        if (c >= (1 << (k - 1))) c += 1;
        else c -= ((1 << k) - 1);
      } else {
        c = corr_min;
      }
    } else {
      c = I32(dec.decodeBit(m.mCorrector0));
    }
    return c;
  }

  I32 decompress(Decoder& dec, I32 pred, U32 context) {
    I32 real = pred + readCorrector(dec, m.mBits[context]);
    if (corr_range) {
      if (real < 0) real += I32(corr_range);
      else if (U32(real) >= corr_range) real -= I32(corr_range);
    }
    return real;
  }

  void writeCorrector(Encoder& enc, I32 c, ArithmeticModel& mb) {
    U32 c1;
    k = 0;
    c1 = (c <= 0) ? U32(-I64(c)) : U32(c - 1);
    while (c1) {
      c1 >>= 1;
      ++k;
    }
    enc.encodeSymbol(mb, k);
    if (k) {
      if (k < 32) {
        if (c >= 0) c -= 1;
        else c += ((1 << k) - 1);
        if (k <= bits_high) {
          enc.encodeSymbol(m.mCorrector[k], U32(c));
        } else {
          U32 k1 = k - bits_high;
          enc.encodeSymbol(m.mCorrector[k], U32(c) >> k1);
          U32 rest = U32(c) & ((1u << k1) - 1);
          if (k1 <= 19) enc.writeBits(k1, rest);
          else {
            enc.writeBits(16, rest & 0xFFFF);
            enc.writeBits(k1 - 16, rest >> 16);
          }
        }
      }
    } else {
      enc.encodeBit(m.mCorrector0, U32(c));
    }
  }

  void compress(Encoder& enc, I32 pred, I32 real, U32 context) {
    I32 corr = I32(U32(real) - U32(pred));
    if (corr_range) {
      if (corr < corr_min) corr += I32(corr_range);
      else if (corr > corr_max) corr -= I32(corr_range);
    }
    writeCorrector(enc, corr, m.mBits[context]);
  }
};

// ------------------------------------------------------- streaming median ----

struct StreamingMedian5 {
  I32 values[5];
  bool high;

  void init() {
    values[0] = values[1] = values[2] = values[3] = values[4] = 0;
    high = true;
  }

  void add(I32 v) {
    if (high) {
      if (v < values[2]) {
        values[4] = values[3];
        values[3] = values[2];
        if (v < values[0]) {
          values[2] = values[1];
          values[1] = values[0];
          values[0] = v;
        } else if (v < values[1]) {
          values[2] = values[1];
          values[1] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (v < values[3]) {
          values[4] = values[3];
          values[3] = v;
        } else {
          values[4] = v;
        }
        high = false;
      }
    } else {
      if (values[2] < v) {
        values[0] = values[1];
        values[1] = values[2];
        if (values[4] < v) {
          values[2] = values[3];
          values[3] = values[4];
          values[4] = v;
        } else if (values[3] < v) {
          values[2] = values[3];
          values[3] = v;
        } else {
          values[2] = v;
        }
      } else {
        if (values[1] < v) {
          values[0] = values[1];
          values[1] = v;
        } else {
          values[0] = v;
        }
        high = true;
      }
    }
  }

  I32 get() const { return values[2]; }
};

// ----------------------------------------------------------- POINT10 v2 ----

static const U8 number_return_map[8][8] = {
    {15, 14, 13, 12, 11, 10, 9, 8}, {14, 0, 1, 3, 6, 10, 10, 9},
    {13, 1, 2, 4, 7, 11, 11, 10},   {12, 3, 4, 5, 8, 12, 12, 11},
    {11, 6, 7, 8, 9, 13, 13, 12},   {10, 10, 11, 12, 13, 14, 14, 13},
    {9, 10, 11, 12, 13, 14, 15, 14}, {8, 9, 10, 11, 12, 13, 14, 15}};

static const U8 number_return_level[8][8] = {
    {0, 1, 2, 3, 4, 5, 6, 7}, {1, 0, 1, 2, 3, 4, 5, 6},
    {2, 1, 0, 1, 2, 3, 4, 5}, {3, 2, 1, 0, 1, 2, 3, 4},
    {4, 3, 2, 1, 0, 1, 2, 3}, {5, 4, 3, 2, 1, 0, 1, 2},
    {6, 5, 4, 3, 2, 1, 0, 1}, {7, 6, 5, 4, 3, 2, 1, 0}};

static inline U8 u8_fold(I32 n) { return U8(n & 0xFF); }
static inline U8 u8_clamp(I32 n) {
  return n < 0 ? 0 : (n > 255 ? 255 : U8(n));
}

struct Point10v2 {
  bool for_compress;
  U8 last[20];
  U16 last_intensity[16];
  StreamingMedian5 last_x_diff_median5[16], last_y_diff_median5[16];
  I32 last_height[8];

  ArithmeticModel m_changed_values;
  IntegerCodec ic_intensity;
  ArithmeticModel m_scan_angle_rank[2];
  IntegerCodec ic_point_source_ID;
  std::vector<ArithmeticModel*> m_bit_byte, m_classification, m_user_data;
  IntegerCodec ic_dx, ic_dy, ic_z;

  ~Point10v2() {
    for (auto* p : m_bit_byte) delete p;
    for (auto* p : m_classification) delete p;
    for (auto* p : m_user_data) delete p;
  }

  void init(const U8* item, bool compress) {
    for_compress = compress;
    for (int i = 0; i < 16; i++) {
      last_x_diff_median5[i].init();
      last_y_diff_median5[i].init();
      last_intensity[i] = 0;
    }
    for (int i = 0; i < 8; i++) last_height[i] = 0;

    m_changed_values.init(64, compress);
    ic_intensity.setup(16, 4);
    ic_intensity.initModels(compress);
    m_scan_angle_rank[0].init(256, compress);
    m_scan_angle_rank[1].init(256, compress);
    ic_point_source_ID.setup(16, 1);
    ic_point_source_ID.initModels(compress);
    for (auto* p : m_bit_byte) delete p;
    for (auto* p : m_classification) delete p;
    for (auto* p : m_user_data) delete p;
    m_bit_byte.assign(256, nullptr);
    m_classification.assign(256, nullptr);
    m_user_data.assign(256, nullptr);
    ic_dx.setup(32, 2);
    ic_dx.initModels(compress);
    ic_dy.setup(32, 22);
    ic_dy.initModels(compress);
    ic_z.setup(32, 20);
    ic_z.initModels(compress);

    std::memcpy(last, item, 20);
    last[12] = 0;  // the reference implementation zeroes the intensity in
    last[13] = 0;  // last_item (prediction uses last_intensity[m] instead)
  }

  ArithmeticModel* lazyModel(std::vector<ArithmeticModel*>& v, U32 idx) {
    if (!v[idx]) {
      v[idx] = new ArithmeticModel();
      v[idx]->init(256, for_compress);
    }
    return v[idx];
  }

  void read(Decoder& dec, U8* item) {
    U32 r, n, m, l;
    U32 changed_values = dec.decodeSymbol(m_changed_values);
    if (changed_values) {
      if (changed_values & 32) {
        U8 b = U8(dec.decodeSymbol(*lazyModel(m_bit_byte, last[14])));
        last[14] = b;
      }
      r = last[14] & 7;
      n = (last[14] >> 3) & 7;
      m = number_return_map[n][r];
      l = number_return_level[n][r];
      if (changed_values & 16) {
        U16 intensity = U16(ic_intensity.decompress(
            dec, last_intensity[m], (m < 3 ? m : 3)));
        last_intensity[m] = intensity;
        std::memcpy(last + 12, &intensity, 2);
      } else {
        std::memcpy(last + 12, &last_intensity[m], 2);
      }
      if (changed_values & 8) {
        last[15] = U8(dec.decodeSymbol(*lazyModel(m_classification, last[15])));
      }
      if (changed_values & 4) {
        U32 f = (last[14] >> 6) & 1;
        U32 val = dec.decodeSymbol(m_scan_angle_rank[f]);
        last[16] = u8_fold(I32(val) + I32(last[16]));
      }
      if (changed_values & 2) {
        last[17] = U8(dec.decodeSymbol(*lazyModel(m_user_data, last[17])));
      }
      if (changed_values & 1) {
        U16 psid;
        std::memcpy(&psid, last + 18, 2);
        psid = U16(ic_point_source_ID.decompress(dec, psid, 0));
        std::memcpy(last + 18, &psid, 2);
      }
    } else {
      r = last[14] & 7;
      n = (last[14] >> 3) & 7;
      m = number_return_map[n][r];
      l = number_return_level[n][r];
      std::memcpy(last + 12, &last_intensity[m], 2);
    }

    // x
    I32 x, y, z;
    std::memcpy(&x, last + 0, 4);
    std::memcpy(&y, last + 4, 4);
    std::memcpy(&z, last + 8, 4);
    I32 median = last_x_diff_median5[m].get();
    I32 diff = ic_dx.decompress(dec, median, n == 1);
    x += diff;
    last_x_diff_median5[m].add(diff);
    // y
    median = last_y_diff_median5[m].get();
    U32 k_bits = ic_dx.k;
    diff = ic_dy.decompress(
        dec, median, (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
    y += diff;
    last_y_diff_median5[m].add(diff);
    // z
    k_bits = (ic_dx.k + ic_dy.k) / 2;
    z = ic_z.decompress(dec, last_height[l],
                        (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
    last_height[l] = z;

    std::memcpy(last + 0, &x, 4);
    std::memcpy(last + 4, &y, 4);
    std::memcpy(last + 8, &z, 4);
    std::memcpy(item, last, 20);
  }

  void write(Encoder& enc, const U8* item) {
    U32 r = item[14] & 7;
    U32 n = (item[14] >> 3) & 7;
    U32 m = number_return_map[n][r];
    U32 l = number_return_level[n][r];

    U16 intensity;
    std::memcpy(&intensity, item + 12, 2);
    U16 last_psid, psid;
    std::memcpy(&last_psid, last + 18, 2);
    std::memcpy(&psid, item + 18, 2);

    U32 changed_values =
        (U32(last[14] != item[14]) << 5) |
        (U32(last_intensity[m] != intensity) << 4) |
        (U32(last[15] != item[15]) << 3) | (U32(last[16] != item[16]) << 2) |
        (U32(last[17] != item[17]) << 1) | U32(last_psid != psid);
    enc.encodeSymbol(m_changed_values, changed_values);
    if (changed_values) {
      if (changed_values & 32)
        enc.encodeSymbol(*lazyModel(m_bit_byte, last[14]), item[14]);
      if (changed_values & 16) {
        ic_intensity.compress(enc, last_intensity[m], intensity,
                              (m < 3 ? m : 3));
        last_intensity[m] = intensity;
      }
      if (changed_values & 8)
        enc.encodeSymbol(*lazyModel(m_classification, last[15]), item[15]);
      if (changed_values & 4) {
        U32 f = (item[14] >> 6) & 1;
        enc.encodeSymbol(m_scan_angle_rank[f],
                         u8_fold(I32(item[16]) - I32(last[16])));
      }
      if (changed_values & 2)
        enc.encodeSymbol(*lazyModel(m_user_data, last[17]), item[17]);
      if (changed_values & 1)
        ic_point_source_ID.compress(enc, last_psid, psid, 0);
    }

    I32 x, y, z, lx, ly, lz;
    std::memcpy(&x, item + 0, 4);
    std::memcpy(&y, item + 4, 4);
    std::memcpy(&z, item + 8, 4);
    std::memcpy(&lx, last + 0, 4);
    std::memcpy(&ly, last + 4, 4);
    std::memcpy(&lz, last + 8, 4);

    I32 median = last_x_diff_median5[m].get();
    I32 diff = I32(U32(x) - U32(lx));
    ic_dx.compress(enc, median, diff, n == 1);
    last_x_diff_median5[m].add(diff);

    median = last_y_diff_median5[m].get();
    U32 k_bits = ic_dx.k;
    diff = I32(U32(y) - U32(ly));
    ic_dy.compress(enc, median, diff,
                   (n == 1) + (k_bits < 20 ? (k_bits & ~1u) : 20));
    last_y_diff_median5[m].add(diff);

    k_bits = (ic_dx.k + ic_dy.k) / 2;
    ic_z.compress(enc, last_height[l], z,
                  (n == 1) + (k_bits < 18 ? (k_bits & ~1u) : 18));
    last_height[l] = z;

    std::memcpy(last, item, 20);
    last[12] = 0;
    last[13] = 0;
  }
};

// ---------------------------------------------------------- GPSTIME11 v2 ----

constexpr I32 GPS_MULTI = 500;
constexpr I32 GPS_MULTI_MINUS = -10;
constexpr U32 GPS_MULTI_UNCHANGED = U32(GPS_MULTI - GPS_MULTI_MINUS + 1);  // 511
constexpr U32 GPS_MULTI_CODE_FULL = GPS_MULTI_UNCHANGED + 1;               // 512
constexpr U32 GPS_MULTI_TOTAL = U32(GPS_MULTI - GPS_MULTI_MINUS + 6);      // 516

union I64F64 {
  I64 i64;
  U64 u64;
  double f64;
};

struct Gpstime11v2 {
  U32 last_idx, next_idx;
  I64F64 last_gpstime[4];
  I32 last_gpstime_diff[4];
  I32 multi_extreme_counter[4];
  ArithmeticModel m_gpstime_multi, m_gpstime_0diff;
  IntegerCodec ic_gpstime;

  void init(const U8* item, bool compress) {
    m_gpstime_multi.init(GPS_MULTI_TOTAL, compress);
    m_gpstime_0diff.init(6, compress);
    ic_gpstime.setup(32, 9);
    ic_gpstime.initModels(compress);
    last_idx = 0;
    next_idx = 0;
    for (int i = 0; i < 4; i++) {
      last_gpstime[i].u64 = 0;
      last_gpstime_diff[i] = 0;
      multi_extreme_counter[i] = 0;
    }
    std::memcpy(&last_gpstime[0].u64, item, 8);
  }

  void read(Decoder& dec, U8* item) {
    if (last_gpstime_diff[last_idx] == 0) {
      U32 multi = dec.decodeSymbol(m_gpstime_0diff);
      if (multi == 1) {
        last_gpstime_diff[last_idx] = ic_gpstime.decompress(dec, 0, 0);
        last_gpstime[last_idx].i64 += last_gpstime_diff[last_idx];
        multi_extreme_counter[last_idx] = 0;
      } else if (multi == 2) {
        next_idx = (next_idx + 1) & 3;
        U64 hi = U64(U32(ic_gpstime.decompress(
            dec, I32(last_gpstime[last_idx].u64 >> 32), 8)));
        last_gpstime[next_idx].u64 = (hi << 32) | U64(dec.readInt());
        last_idx = next_idx;
        last_gpstime_diff[last_idx] = 0;
        multi_extreme_counter[last_idx] = 0;
      } else if (multi > 2) {
        last_idx = (last_idx + multi - 2) & 3;
        read(dec, item);
        return;
      }
    } else {
      U32 multi = dec.decodeSymbol(m_gpstime_multi);
      if (multi == 1) {
        last_gpstime[last_idx].i64 +=
            ic_gpstime.decompress(dec, last_gpstime_diff[last_idx], 1);
        multi_extreme_counter[last_idx] = 0;
      } else if (multi < GPS_MULTI_UNCHANGED) {
        I32 gpstime_diff;
        if (multi == 0) {
          gpstime_diff = ic_gpstime.decompress(dec, 0, 7);
          multi_extreme_counter[last_idx]++;
          if (multi_extreme_counter[last_idx] > 3) {
            last_gpstime_diff[last_idx] = gpstime_diff;
            multi_extreme_counter[last_idx] = 0;
          }
        } else if (multi < U32(GPS_MULTI)) {
          if (multi < 10)
            gpstime_diff = ic_gpstime.decompress(
                dec, I32(multi) * last_gpstime_diff[last_idx], 2);
          else
            gpstime_diff = ic_gpstime.decompress(
                dec, I32(multi) * last_gpstime_diff[last_idx], 3);
        } else if (multi == U32(GPS_MULTI)) {
          gpstime_diff = ic_gpstime.decompress(
              dec, GPS_MULTI * last_gpstime_diff[last_idx], 4);
          multi_extreme_counter[last_idx]++;
          if (multi_extreme_counter[last_idx] > 3) {
            last_gpstime_diff[last_idx] = gpstime_diff;
            multi_extreme_counter[last_idx] = 0;
          }
        } else {
          I32 neg_multi = GPS_MULTI - I32(multi);
          if (neg_multi > GPS_MULTI_MINUS) {
            gpstime_diff = ic_gpstime.decompress(
                dec, neg_multi * last_gpstime_diff[last_idx], 5);
          } else {
            gpstime_diff = ic_gpstime.decompress(
                dec, GPS_MULTI_MINUS * last_gpstime_diff[last_idx], 6);
            multi_extreme_counter[last_idx]++;
            if (multi_extreme_counter[last_idx] > 3) {
              last_gpstime_diff[last_idx] = gpstime_diff;
              multi_extreme_counter[last_idx] = 0;
            }
          }
        }
        last_gpstime[last_idx].i64 += gpstime_diff;
      } else if (multi == GPS_MULTI_CODE_FULL) {
        next_idx = (next_idx + 1) & 3;
        U64 hi = U64(U32(ic_gpstime.decompress(
            dec, I32(last_gpstime[last_idx].u64 >> 32), 8)));
        last_gpstime[next_idx].u64 = (hi << 32) | U64(dec.readInt());
        last_idx = next_idx;
        last_gpstime_diff[last_idx] = 0;
        multi_extreme_counter[last_idx] = 0;
      } else if (multi >= GPS_MULTI_CODE_FULL) {
        last_idx = (last_idx + multi - GPS_MULTI_CODE_FULL) & 3;
        read(dec, item);
        return;
      }
    }
    std::memcpy(item, &last_gpstime[last_idx].u64, 8);
  }

  void write(Encoder& enc, const U8* item) {
    I64F64 this_gpstime;
    std::memcpy(&this_gpstime.u64, item, 8);

    if (last_gpstime_diff[last_idx] == 0) {
      if (this_gpstime.i64 == last_gpstime[last_idx].i64) {
        enc.encodeSymbol(m_gpstime_0diff, 0);
        return;
      }
      // look whether another sequence matches
      for (U32 i = 1; i < 4; i++) {
        I64 other_diff_64 = this_gpstime.i64 - last_gpstime[(last_idx + i) & 3].i64;
        if (other_diff_64 == I64(I32(other_diff_64)) &&
            last_gpstime[(last_idx + i) & 3].u64 != 0) {
          // only switch when the other sequence gives a 32-bit diff and the
          // current one cannot
          I64 curr_diff_64 = this_gpstime.i64 - last_gpstime[last_idx].i64;
          if (curr_diff_64 != I64(I32(curr_diff_64))) {
            enc.encodeSymbol(m_gpstime_0diff, i + 2);
            last_idx = (last_idx + i) & 3;
            write(enc, item);
            return;
          }
        }
      }
      I64 curr_diff_64 = this_gpstime.i64 - last_gpstime[last_idx].i64;
      I32 curr_diff = I32(curr_diff_64);
      if (curr_diff_64 == I64(curr_diff)) {
        enc.encodeSymbol(m_gpstime_0diff, 1);
        ic_gpstime.compress(enc, 0, curr_diff, 0);
        last_gpstime_diff[last_idx] = curr_diff;
        multi_extreme_counter[last_idx] = 0;
        last_gpstime[last_idx].i64 = this_gpstime.i64;
      } else {
        enc.encodeSymbol(m_gpstime_0diff, 2);
        ic_gpstime.compress(enc, I32(last_gpstime[last_idx].u64 >> 32),
                            I32(this_gpstime.u64 >> 32), 8);
        enc.writeInt(U32(this_gpstime.u64));
        next_idx = (next_idx + 1) & 3;
        last_idx = next_idx;
        last_gpstime[last_idx].i64 = this_gpstime.i64;
        last_gpstime_diff[last_idx] = 0;
        multi_extreme_counter[last_idx] = 0;
      }
    } else {
      if (this_gpstime.i64 == last_gpstime[last_idx].i64) {
        enc.encodeSymbol(m_gpstime_multi, GPS_MULTI_UNCHANGED);
        return;
      }
      I64 curr_diff_64 = this_gpstime.i64 - last_gpstime[last_idx].i64;
      I32 curr_diff = I32(curr_diff_64);
      if (curr_diff_64 == I64(curr_diff)) {
        float multi_f =
            float(curr_diff) / float(last_gpstime_diff[last_idx]);
        I32 multi = multi_f >= 0 ? I32(multi_f + 0.5f) : I32(multi_f - 0.5f);
        if (multi == 1) {
          enc.encodeSymbol(m_gpstime_multi, 1);
          ic_gpstime.compress(enc, last_gpstime_diff[last_idx], curr_diff, 1);
          multi_extreme_counter[last_idx] = 0;
        } else if (multi > 0) {
          if (multi < GPS_MULTI) {
            enc.encodeSymbol(m_gpstime_multi, U32(multi));
            if (multi < 10)
              ic_gpstime.compress(enc, multi * last_gpstime_diff[last_idx],
                                  curr_diff, 2);
            else
              ic_gpstime.compress(enc, multi * last_gpstime_diff[last_idx],
                                  curr_diff, 3);
          } else {
            enc.encodeSymbol(m_gpstime_multi, U32(GPS_MULTI));
            ic_gpstime.compress(enc, GPS_MULTI * last_gpstime_diff[last_idx],
                                curr_diff, 4);
            multi_extreme_counter[last_idx]++;
            if (multi_extreme_counter[last_idx] > 3) {
              last_gpstime_diff[last_idx] = curr_diff;
              multi_extreme_counter[last_idx] = 0;
            }
          }
        } else if (multi < 0) {
          if (multi > GPS_MULTI_MINUS) {
            enc.encodeSymbol(m_gpstime_multi, U32(GPS_MULTI - multi));
            ic_gpstime.compress(enc, multi * last_gpstime_diff[last_idx],
                                curr_diff, 5);
          } else {
            enc.encodeSymbol(m_gpstime_multi,
                             U32(GPS_MULTI - GPS_MULTI_MINUS));
            ic_gpstime.compress(enc,
                                GPS_MULTI_MINUS * last_gpstime_diff[last_idx],
                                curr_diff, 6);
            multi_extreme_counter[last_idx]++;
            if (multi_extreme_counter[last_idx] > 3) {
              last_gpstime_diff[last_idx] = curr_diff;
              multi_extreme_counter[last_idx] = 0;
            }
          }
        } else {
          enc.encodeSymbol(m_gpstime_multi, 0);
          ic_gpstime.compress(enc, 0, curr_diff, 7);
          multi_extreme_counter[last_idx]++;
          if (multi_extreme_counter[last_idx] > 3) {
            last_gpstime_diff[last_idx] = curr_diff;
            multi_extreme_counter[last_idx] = 0;
          }
        }
        last_gpstime[last_idx].i64 = this_gpstime.i64;
      } else {
        // cannot represent as 32-bit diff: switch or full
        for (U32 i = 1; i < 4; i++) {
          I64 other_diff_64 =
              this_gpstime.i64 - last_gpstime[(last_idx + i) & 3].i64;
          if (other_diff_64 == I64(I32(other_diff_64))) {
            enc.encodeSymbol(m_gpstime_multi, GPS_MULTI_CODE_FULL + i);
            last_idx = (last_idx + i) & 3;
            write(enc, item);
            return;
          }
        }
        enc.encodeSymbol(m_gpstime_multi, GPS_MULTI_CODE_FULL);
        ic_gpstime.compress(enc, I32(last_gpstime[last_idx].u64 >> 32),
                            I32(this_gpstime.u64 >> 32), 8);
        enc.writeInt(U32(this_gpstime.u64));
        next_idx = (next_idx + 1) & 3;
        last_idx = next_idx;
        last_gpstime[last_idx].i64 = this_gpstime.i64;
        last_gpstime_diff[last_idx] = 0;
        multi_extreme_counter[last_idx] = 0;
      }
    }
  }
};

// -------------------------------------------------------------- RGB12 v2 ----

struct Rgb12v2 {
  U16 last[3];
  ArithmeticModel m_byte_used;
  ArithmeticModel m_rgb_diff[6];

  void init(const U8* item, bool compress) {
    m_byte_used.init(128, compress);
    for (int i = 0; i < 6; i++) m_rgb_diff[i].init(256, compress);
    std::memcpy(last, item, 6);
  }

  void read(Decoder& dec, U8* item) {
    U16 r, g, b;
    I32 diff;
    U32 corr;
    U32 sym = dec.decodeSymbol(m_byte_used);
    if (sym & 1) {
      corr = dec.decodeSymbol(m_rgb_diff[0]);
      r = U16(u8_fold(I32(corr) + (last[0] & 0xFF)));
    } else {
      r = last[0] & 0xFF;
    }
    if (sym & 2) {
      corr = dec.decodeSymbol(m_rgb_diff[1]);
      r |= U16(u8_fold(I32(corr) + (last[0] >> 8))) << 8;
    } else {
      r |= last[0] & 0xFF00;
    }
    if (sym & 64) {
      diff = (r & 0xFF) - (last[0] & 0xFF);
      if (sym & 4) {
        corr = dec.decodeSymbol(m_rgb_diff[2]);
        g = U16(u8_fold(I32(corr) + u8_clamp(diff + (last[1] & 0xFF))));
      } else {
        g = last[1] & 0xFF;
      }
      if (sym & 16) {
        corr = dec.decodeSymbol(m_rgb_diff[4]);
        diff = (diff + ((g & 0xFF) - (last[1] & 0xFF))) / 2;
        b = U16(u8_fold(I32(corr) + u8_clamp(diff + (last[2] & 0xFF))));
      } else {
        b = last[2] & 0xFF;
      }
      diff = (r >> 8) - (last[0] >> 8);
      if (sym & 8) {
        corr = dec.decodeSymbol(m_rgb_diff[3]);
        g |= U16(u8_fold(I32(corr) + u8_clamp(diff + (last[1] >> 8)))) << 8;
      } else {
        g |= last[1] & 0xFF00;
      }
      if (sym & 32) {
        corr = dec.decodeSymbol(m_rgb_diff[5]);
        diff = (diff + ((g >> 8) - (last[1] >> 8))) / 2;
        b |= U16(u8_fold(I32(corr) + u8_clamp(diff + (last[2] >> 8)))) << 8;
      } else {
        b |= last[2] & 0xFF00;
      }
    } else {
      g = r;
      b = r;
    }
    last[0] = r;
    last[1] = g;
    last[2] = b;
    std::memcpy(item, last, 6);
  }

  void write(Encoder& enc, const U8* item) {
    U16 r, g, b;
    std::memcpy(&r, item + 0, 2);
    std::memcpy(&g, item + 2, 2);
    std::memcpy(&b, item + 4, 2);

    U32 sym = 0;
    bool rl = (r & 0xFF) != (last[0] & 0xFF);
    bool rh = (r >> 8) != (last[0] >> 8);
    if (rl) sym |= 1;
    if (rh) sym |= 2;
    bool gb_differ = ((r & 0xFF) != (g & 0xFF)) || ((r & 0xFF) != (b & 0xFF)) ||
                     ((r >> 8) != (g >> 8)) || ((r >> 8) != (b >> 8));
    if (gb_differ) {
      sym |= 64;
      if ((g & 0xFF) != (last[1] & 0xFF)) sym |= 4;
      if ((g >> 8) != (last[1] >> 8)) sym |= 8;
      if ((b & 0xFF) != (last[2] & 0xFF)) sym |= 16;
      if ((b >> 8) != (last[2] >> 8)) sym |= 32;
    }
    enc.encodeSymbol(m_byte_used, sym);

    I32 diff;
    if (sym & 1)
      enc.encodeSymbol(m_rgb_diff[0],
                       u8_fold(I32(r & 0xFF) - I32(last[0] & 0xFF)));
    if (sym & 2)
      enc.encodeSymbol(m_rgb_diff[1], u8_fold(I32(r >> 8) - I32(last[0] >> 8)));
    if (sym & 64) {
      diff = (r & 0xFF) - (last[0] & 0xFF);
      if (sym & 4)
        enc.encodeSymbol(
            m_rgb_diff[2],
            u8_fold(I32(g & 0xFF) - u8_clamp(diff + (last[1] & 0xFF))));
      if (sym & 16) {
        diff = (diff + ((g & 0xFF) - (last[1] & 0xFF))) / 2;
        enc.encodeSymbol(
            m_rgb_diff[4],
            u8_fold(I32(b & 0xFF) - u8_clamp(diff + (last[2] & 0xFF))));
      }
      diff = (r >> 8) - (last[0] >> 8);
      if (sym & 8)
        enc.encodeSymbol(m_rgb_diff[3],
                         u8_fold(I32(g >> 8) - u8_clamp(diff + (last[1] >> 8))));
      if (sym & 32) {
        diff = (diff + ((g >> 8) - (last[1] >> 8))) / 2;
        enc.encodeSymbol(m_rgb_diff[5],
                         u8_fold(I32(b >> 8) - u8_clamp(diff + (last[2] >> 8))));
      }
    }
    last[0] = r;
    last[1] = g;
    last[2] = b;
  }
};

// ------------------------------------------------------- WAVEPACKET13 v1 ----

struct Wavepacket13v1 {
  U8 last[29];  // 28-byte packed wavepacket after the leading index byte
  I32 last_diff_32;
  U32 sym_last_offset_diff;
  ArithmeticModel m_packet_index;
  ArithmeticModel m_offset_diff[4];
  IntegerCodec ic_offset_diff, ic_packet_size, ic_return_point, ic_xyz;

  void init(const U8* item, bool compress) {
    m_packet_index.init(256, compress);
    for (int i = 0; i < 4; i++) m_offset_diff[i].init(4, compress);
    ic_offset_diff.setup(32, 1);
    ic_offset_diff.initModels(compress);
    ic_packet_size.setup(32, 1);
    ic_packet_size.initModels(compress);
    ic_return_point.setup(32, 1);
    ic_return_point.initModels(compress);
    ic_xyz.setup(32, 3);
    ic_xyz.initModels(compress);
    last_diff_32 = 0;
    sym_last_offset_diff = 0;
    std::memcpy(last, item, 29);
  }

  void read(Decoder& dec, U8* item) {
    item[0] = U8(dec.decodeSymbol(m_packet_index));

    U64 last_offset, offset;
    U32 last_size, size;
    I32 last_rp, rp, lx, ly, lz;
    std::memcpy(&last_offset, last + 1, 8);
    std::memcpy(&last_size, last + 9, 4);
    std::memcpy(&last_rp, last + 13, 4);
    std::memcpy(&lx, last + 17, 4);
    std::memcpy(&ly, last + 21, 4);
    std::memcpy(&lz, last + 25, 4);

    sym_last_offset_diff = dec.decodeSymbol(m_offset_diff[sym_last_offset_diff]);
    if (sym_last_offset_diff == 0) {
      offset = last_offset;
    } else if (sym_last_offset_diff == 1) {
      offset = last_offset + last_size;
    } else if (sym_last_offset_diff == 2) {
      last_diff_32 = ic_offset_diff.decompress(dec, last_diff_32, 0);
      offset = U64(I64(last_offset) + last_diff_32);
    } else {
      offset = dec.readInt64();
    }
    size = U32(ic_packet_size.decompress(dec, I32(last_size), 0));
    rp = ic_return_point.decompress(dec, last_rp, 0);
    I32 x = ic_xyz.decompress(dec, lx, 0);
    I32 y = ic_xyz.decompress(dec, ly, 1);
    I32 z = ic_xyz.decompress(dec, lz, 2);

    std::memcpy(item + 1, &offset, 8);
    std::memcpy(item + 9, &size, 4);
    std::memcpy(item + 13, &rp, 4);
    std::memcpy(item + 17, &x, 4);
    std::memcpy(item + 21, &y, 4);
    std::memcpy(item + 25, &z, 4);
    std::memcpy(last, item, 29);
  }

  void write(Encoder& enc, const U8* item) {
    enc.encodeSymbol(m_packet_index, item[0]);

    U64 last_offset, offset;
    U32 last_size, size;
    I32 last_rp, rp, lx, ly, lz, x, y, z;
    std::memcpy(&last_offset, last + 1, 8);
    std::memcpy(&last_size, last + 9, 4);
    std::memcpy(&last_rp, last + 13, 4);
    std::memcpy(&lx, last + 17, 4);
    std::memcpy(&ly, last + 21, 4);
    std::memcpy(&lz, last + 25, 4);
    std::memcpy(&offset, item + 1, 8);
    std::memcpy(&size, item + 9, 4);
    std::memcpy(&rp, item + 13, 4);
    std::memcpy(&x, item + 17, 4);
    std::memcpy(&y, item + 21, 4);
    std::memcpy(&z, item + 25, 4);

    if (offset == last_offset) {
      enc.encodeSymbol(m_offset_diff[sym_last_offset_diff], 0);
      sym_last_offset_diff = 0;
    } else if (offset == last_offset + last_size) {
      enc.encodeSymbol(m_offset_diff[sym_last_offset_diff], 1);
      sym_last_offset_diff = 1;
    } else {
      I64 diff64 = I64(offset) - I64(last_offset);
      if (diff64 == I64(I32(diff64))) {
        enc.encodeSymbol(m_offset_diff[sym_last_offset_diff], 2);
        sym_last_offset_diff = 2;
        ic_offset_diff.compress(enc, last_diff_32, I32(diff64), 0);
        last_diff_32 = I32(diff64);
      } else {
        enc.encodeSymbol(m_offset_diff[sym_last_offset_diff], 3);
        sym_last_offset_diff = 3;
        enc.writeInt64(offset);
      }
    }
    ic_packet_size.compress(enc, I32(last_size), I32(size), 0);
    ic_return_point.compress(enc, last_rp, rp, 0);
    ic_xyz.compress(enc, lx, x, 0);
    ic_xyz.compress(enc, ly, y, 1);
    ic_xyz.compress(enc, lz, z, 2);
    std::memcpy(last, item, 29);
  }
};

// --------------------------------------------------------------- BYTE v2 ----

struct Bytev2 {
  U32 number;
  std::vector<U8> last;
  std::vector<ArithmeticModel> m_byte;

  void init(const U8* item, U32 n, bool compress) {
    number = n;
    m_byte.resize(n);
    for (U32 i = 0; i < n; i++) m_byte[i].init(256, compress);
    last.assign(item, item + n);
  }

  void read(Decoder& dec, U8* item) {
    for (U32 i = 0; i < number; i++) {
      item[i] = u8_fold(I32(dec.decodeSymbol(m_byte[i])) + I32(last[i]));
    }
    std::memcpy(last.data(), item, number);
  }

  void write(Encoder& enc, const U8* item) {
    for (U32 i = 0; i < number; i++) {
      enc.encodeSymbol(m_byte[i], u8_fold(I32(item[i]) - I32(last[i])));
    }
    std::memcpy(last.data(), item, number);
  }
};

// ------------------------------------------------------------ item specs ----

enum ItemType : U16 {
  ITEM_BYTE = 0,
  ITEM_POINT10 = 6,
  ITEM_GPSTIME11 = 7,
  ITEM_RGB12 = 8,
  ITEM_WAVEPACKET13 = 9,
  ITEM_POINT14 = 10,
  ITEM_RGB14 = 11,
  ITEM_RGBNIR14 = 12,
  ITEM_WAVEPACKET14 = 13,
  ITEM_BYTE14 = 14,
};

struct ItemSpec {
  U16 type, size, version;
};

struct ChunkCodec {
  std::vector<ItemSpec> items;
  Point10v2 point10;
  Gpstime11v2 gpstime;
  Rgb12v2 rgb;
  Wavepacket13v1 wavepacket;
  Bytev2 bytes;

  // returns false on unsupported item
  bool supported() const {
    for (const auto& it : items) {
      switch (it.type) {
        case ITEM_POINT10:
          if (it.version != 2) return false;
          break;
        case ITEM_GPSTIME11:
          if (it.version != 2) return false;
          break;
        case ITEM_RGB12:
          if (it.version != 2) return false;
          break;
        case ITEM_WAVEPACKET13:
          if (it.version != 1) return false;
          break;
        case ITEM_BYTE:
          if (it.version != 2) return false;
          break;
        default:
          return false;
      }
    }
    return true;
  }

  void init(const U8* first_point, bool compress) {
    const U8* p = first_point;
    for (const auto& it : items) {
      switch (it.type) {
        case ITEM_POINT10: point10.init(p, compress); break;
        case ITEM_GPSTIME11: gpstime.init(p, compress); break;
        case ITEM_RGB12: rgb.init(p, compress); break;
        case ITEM_WAVEPACKET13: wavepacket.init(p, compress); break;
        case ITEM_BYTE: bytes.init(p, it.size, compress); break;
      }
      p += it.size;
    }
  }

  void readPoint(Decoder& dec, U8* out) {
    U8* p = out;
    for (const auto& it : items) {
      switch (it.type) {
        case ITEM_POINT10: point10.read(dec, p); break;
        case ITEM_GPSTIME11: gpstime.read(dec, p); break;
        case ITEM_RGB12: rgb.read(dec, p); break;
        case ITEM_WAVEPACKET13: wavepacket.read(dec, p); break;
        case ITEM_BYTE: bytes.read(dec, p); break;
      }
      p += it.size;
    }
  }

  void writePoint(Encoder& enc, const U8* in) {
    const U8* p = in;
    for (const auto& it : items) {
      switch (it.type) {
        case ITEM_POINT10: point10.write(enc, p); break;
        case ITEM_GPSTIME11: gpstime.write(enc, p); break;
        case ITEM_RGB12: rgb.write(enc, p); break;
        case ITEM_WAVEPACKET13: wavepacket.write(enc, p); break;
        case ITEM_BYTE: bytes.write(enc, p); break;
      }
      p += it.size;
    }
  }
};

// decompress one chunk: [raw first point][arith stream] -> npoints records
static bool decompress_chunk(const U8* in, size_t in_len, U8* out,
                             U64 npoints, const std::vector<ItemSpec>& items,
                             U32 point_size) {
  if (npoints == 0) return true;
  if (in_len < point_size) return false;
  std::memcpy(out, in, point_size);
  if (npoints == 1) return true;

  ChunkCodec codec;
  codec.items = items;
  if (!codec.supported()) return false;
  codec.init(out, false);

  Decoder dec;
  dec.buf = in;
  dec.pos = point_size;
  dec.size = in_len;
  dec.init();
  for (U64 i = 1; i < npoints; i++) {
    codec.readPoint(dec, out + i * point_size);
    // the range coder legitimately reads a few bytes past the payload at
    // the end of a chunk (the encoder's done() under-writes the tail);
    // anything further means the stream went off the rails
    if (dec.overrun && dec.pos > dec.size + 16) return false;
  }
  return true;
}

static void compress_chunk(const U8* in, U64 npoints,
                           const std::vector<ItemSpec>& items, U32 point_size,
                           std::vector<U8>& out) {
  out.assign(in, in + point_size);
  if (npoints <= 1) return;
  ChunkCodec codec;
  codec.items = items;
  codec.init(in, true);
  Encoder enc;
  enc.init();
  for (U64 i = 1; i < npoints; i++) codec.writePoint(enc, in + i * point_size);
  enc.done();
  out.insert(out.end(), enc.out.begin(), enc.out.end());
}

static std::vector<ItemSpec> unpack_items(const U16* items, U32 nitems) {
  std::vector<ItemSpec> out(nitems);
  for (U32 i = 0; i < nitems; i++)
    out[i] = {items[3 * i], items[3 * i + 1], items[3 * i + 2]};
  return out;
}

}  // namespace

// ------------------------------------------------------------ public API ----

extern "C" {

// Decompress points [start, start+count) into `out` (count*point_size bytes).
// Returns 0 on success, negative error code otherwise.
int laz_decompress(const uint8_t* file, uint64_t file_len,
                   uint64_t point_data_offset, uint64_t npoints,
                   uint32_t point_size, uint32_t chunk_size,
                   const uint16_t* items, uint32_t nitems, uint64_t start,
                   uint64_t count, uint8_t* out, int nthreads) {
  if (point_data_offset + 8 > file_len) return -1;
  auto specs = unpack_items(items, nitems);
  {
    ChunkCodec probe;
    probe.items = specs;
    if (!probe.supported()) return -2;
  }

  // chunk table: i64 absolute offset at the start of the point data
  I64 table_off;
  std::memcpy(&table_off, file + point_data_offset, 8);
  if (table_off < 0 || U64(table_off) + 8 > file_len) return -3;

  U32 version, number_chunks;
  std::memcpy(&version, file + table_off, 4);
  std::memcpy(&number_chunks, file + table_off + 4, 4);
  U64 expected_chunks =
      chunk_size ? (npoints + chunk_size - 1) / chunk_size : 1;
  if (number_chunks != expected_chunks) return -4;

  // chunk sizes are themselves entropy-coded (IntegerCompressor 32-bit,
  // 2 contexts, context 1, predicted by the previous size)
  std::vector<U32> sizes(number_chunks, 0);
  if (number_chunks > 0) {
    Decoder dec;
    dec.buf = file;
    dec.pos = size_t(table_off) + 8;
    dec.size = file_len;
    dec.init();
    IntegerCodec ic;
    ic.setup(32, 2);
    ic.initModels(false);
    for (U32 i = 0; i < number_chunks; i++) {
      sizes[i] = U32(ic.decompress(dec, i ? I32(sizes[i - 1]) : 0, 1));
      if (dec.overrun && dec.pos > dec.size + 16) return -5;
    }
  }
  std::vector<U64> starts(number_chunks + 1);
  starts[0] = point_data_offset + 8;
  for (U32 i = 0; i < number_chunks; i++) starts[i + 1] = starts[i] + sizes[i];
  if (starts[number_chunks] > U64(table_off)) return -6;

  // which chunks cover [start, start+count)?
  U64 first_chunk = chunk_size ? start / chunk_size : 0;
  U64 last_chunk = chunk_size ? (start + count - 1) / chunk_size : 0;
  if (count == 0) return 0;
  if (last_chunk >= number_chunks) return -7;

  struct Job {
    U64 chunk, chunk_points, skip, take, out_off;
  };
  std::vector<Job> jobs;
  U64 out_off = 0;
  for (U64 c = first_chunk; c <= last_chunk; c++) {
    U64 c_begin = c * chunk_size;
    U64 c_points = std::min<U64>(chunk_size, npoints - c_begin);
    U64 s = (start > c_begin) ? start - c_begin : 0;
    U64 e = std::min<U64>(c_points, start + count - c_begin);
    jobs.push_back({c, c_points, s, e - s, out_off});
    out_off += (e - s) * point_size;
  }

  std::vector<int> rc(jobs.size(), 0);
  auto work = [&](size_t j) {
    const Job& job = jobs[j];
    std::vector<U8> scratch(job.chunk_points * point_size);
    bool ok = decompress_chunk(file + starts[job.chunk],
                               starts[job.chunk + 1] - starts[job.chunk],
                               scratch.data(), job.chunk_points, specs,
                               point_size);
    if (!ok) {
      rc[j] = -8;
      return;
    }
    std::memcpy(out + job.out_off, scratch.data() + job.skip * point_size,
                job.take * point_size);
  };

  if (nthreads <= 1 || jobs.size() == 1) {
    for (size_t j = 0; j < jobs.size(); j++) work(j);
  } else {
    std::vector<std::thread> pool;
    std::atomic<size_t> next{0};
    size_t nt = std::min<size_t>(nthreads, jobs.size());
    for (size_t t = 0; t < nt; t++)
      pool.emplace_back([&]() {
        for (;;) {
          size_t j = next.fetch_add(1);
          if (j >= jobs.size()) break;
          work(j);
        }
      });
    for (auto& th : pool) th.join();
  }
  for (int r : rc)
    if (r) return r;
  return 0;
}

// Compress `npoints` records into a LAZ point-data block (leading chunk
// table offset + chunks + chunk table).  *out_ptr is malloc'd; free with
// laz_free.  Returns 0 on success.
int laz_compress(const uint8_t* records, uint64_t npoints,
                 uint32_t point_size, uint32_t chunk_size,
                 const uint16_t* items, uint32_t nitems, uint8_t** out_ptr,
                 uint64_t* out_len, int nthreads) {
  auto specs = unpack_items(items, nitems);
  {
    ChunkCodec probe;
    probe.items = specs;
    if (!probe.supported()) return -2;
  }
  U64 number_chunks =
      chunk_size ? (npoints + chunk_size - 1) / chunk_size : (npoints ? 1 : 0);

  std::vector<std::vector<U8>> chunks(number_chunks);
  auto work = [&](size_t c) {
    U64 begin = c * U64(chunk_size);
    U64 n = std::min<U64>(chunk_size, npoints - begin);
    compress_chunk(records + begin * point_size, n, specs, point_size,
                   chunks[c]);
  };
  if (nthreads <= 1 || number_chunks <= 1) {
    for (size_t c = 0; c < number_chunks; c++) work(c);
  } else {
    std::vector<std::thread> pool;
    std::atomic<size_t> next{0};
    size_t nt = std::min<size_t>(nthreads, number_chunks);
    for (size_t t = 0; t < nt; t++)
      pool.emplace_back([&]() {
        for (;;) {
          size_t c = next.fetch_add(1);
          if (c >= number_chunks) break;
          work(c);
        }
      });
    for (auto& th : pool) th.join();
  }

  // chunk table (version 0, sizes entropy-coded as on read)
  Encoder enc;
  enc.init();
  IntegerCodec ic;
  ic.setup(32, 2);
  ic.initModels(true);
  for (U64 c = 0; c < number_chunks; c++)
    ic.compress(enc, c ? I32(U32(chunks[c - 1].size())) : 0,
                I32(U32(chunks[c].size())), 1);
  enc.done();

  U64 total = 8;
  for (auto& ch : chunks) total += ch.size();
  U64 table_pos_rel = total;
  total += 8 + enc.out.size();

  U8* out = static_cast<U8*>(std::malloc(total));
  if (!out) return -9;
  // table offset is written relative to 0 here; the Python driver adds the
  // absolute file position of the point data block
  I64 rel = I64(table_pos_rel);
  std::memcpy(out, &rel, 8);
  U64 off = 8;
  for (auto& ch : chunks) {
    std::memcpy(out + off, ch.data(), ch.size());
    off += ch.size();
  }
  U32 version = 0, nc32 = U32(number_chunks);
  std::memcpy(out + off, &version, 4);
  std::memcpy(out + off + 4, &nc32, 4);
  std::memcpy(out + off + 8, enc.out.data(), enc.out.size());

  *out_ptr = out;
  *out_len = total;
  return 0;
}

void laz_free(uint8_t* p) { std::free(p); }

// Round-trip self-test of the coder primitives; returns 0 or a negative
// code identifying the first failing stage.
int laz_selftest() {
  // stage 1: bit model
  {
    Encoder enc;
    enc.init();
    ArithmeticBitModel bm;
    bm.init();
    U32 bits[101];
    for (int i = 0; i < 101; i++) bits[i] = (i * 7 + i / 3) % 2;
    for (int i = 0; i < 101; i++) enc.encodeBit(bm, bits[i]);
    enc.done();
    Decoder dec;
    dec.buf = enc.out.data();
    dec.pos = 0;
    dec.size = enc.out.size();
    dec.init();
    ArithmeticBitModel bm2;
    bm2.init();
    for (int i = 0; i < 101; i++)
      if (dec.decodeBit(bm2) != bits[i]) return -101;
  }
  // stage 2: symbol models (small = linear search, large = decoder table)
  for (U32 nsym : {5u, 14u, 64u, 256u}) {
    Encoder enc;
    enc.init();
    ArithmeticModel m;
    m.init(nsym, true);
    U32 syms[257];
    for (U32 i = 0; i < 257; i++) syms[i] = (i * 31 + (i >> 2)) % nsym;
    for (U32 i = 0; i < 257; i++) enc.encodeSymbol(m, syms[i]);
    enc.done();
    Decoder dec;
    dec.buf = enc.out.data();
    dec.pos = 0;
    dec.size = enc.out.size();
    dec.init();
    ArithmeticModel m2;
    m2.init(nsym, false);
    for (U32 i = 0; i < 257; i++)
      if (dec.decodeSymbol(m2) != syms[i]) return -(200 + int(nsym));
  }
  // stage 3: raw bits
  {
    Encoder enc;
    enc.init();
    for (U32 i = 0; i < 64; i++) {
      enc.writeBits(13, (i * 2654435761u) & 0x1FFF);
      enc.writeInt(i * 2654435761u);
    }
    enc.done();
    Decoder dec;
    dec.buf = enc.out.data();
    dec.pos = 0;
    dec.size = enc.out.size();
    dec.init();
    for (U32 i = 0; i < 64; i++) {
      if (dec.readBits(13) != ((i * 2654435761u) & 0x1FFF)) return -301;
      if (dec.readInt() != i * 2654435761u) return -302;
    }
  }
  // stage 4: integer codec
  {
    Encoder enc;
    enc.init();
    IntegerCodec ic;
    ic.setup(32, 2);
    ic.initModels(true);
    I32 vals[300];
    I32 preds[300];
    for (int i = 0; i < 300; i++) {
      preds[i] = (i * 977) % 5000 - 2500;
      I32 d = ((i * 13931) % 200000) - 100000;
      if (i % 17 == 0) d = 0;
      if (i % 23 == 0) d = INT32_MIN + 5;
      vals[i] = preds[i] + d;
    }
    for (int i = 0; i < 300; i++)
      ic.compress(enc, preds[i], vals[i], i % 2);
    enc.done();
    Decoder dec;
    dec.buf = enc.out.data();
    dec.pos = 0;
    dec.size = enc.out.size();
    dec.init();
    IntegerCodec ic2;
    ic2.setup(32, 2);
    ic2.initModels(false);
    for (int i = 0; i < 300; i++)
      if (ic2.decompress(dec, preds[i], i % 2) != vals[i]) return -401;
  }
  // stage 5: ic with 16 bits (wrap-around behaviour)
  {
    Encoder enc;
    enc.init();
    IntegerCodec ic;
    ic.setup(16, 1);
    ic.initModels(true);
    I32 vals[200], preds[200];
    for (int i = 0; i < 200; i++) {
      preds[i] = (i * 7919) % 65536;
      vals[i] = (preds[i] + (i * 31) - 300) & 0xFFFF;
    }
    for (int i = 0; i < 200; i++) ic.compress(enc, preds[i], vals[i], 0);
    enc.done();
    Decoder dec;
    dec.buf = enc.out.data();
    dec.pos = 0;
    dec.size = enc.out.size();
    dec.init();
    IntegerCodec ic2;
    ic2.setup(16, 1);
    ic2.initModels(false);
    for (int i = 0; i < 200; i++) {
      I32 r = ic2.decompress(dec, preds[i], 0);
      if (U16(r) != U16(vals[i])) return -501;
    }
  }
  return 0;
}

// Debug/introspection helper: decode the chunk table into `sizes_out`
// (capacity `max_chunks`).  Returns number of chunks or negative error.
int laz_chunk_sizes(const uint8_t* file, uint64_t file_len,
                    uint64_t point_data_offset, uint32_t* sizes_out,
                    uint32_t max_chunks) {
  if (point_data_offset + 8 > file_len) return -1;
  I64 table_off;
  std::memcpy(&table_off, file + point_data_offset, 8);
  if (table_off < 0 || U64(table_off) + 8 > file_len) return -3;
  U32 version, number_chunks;
  std::memcpy(&version, file + table_off, 4);
  std::memcpy(&number_chunks, file + table_off + 4, 4);
  if (number_chunks > max_chunks) return -4;
  Decoder dec;
  dec.buf = file;
  dec.pos = size_t(table_off) + 8;
  dec.size = file_len;
  dec.init();
  IntegerCodec ic;
  ic.setup(32, 2);
  ic.initModels(false);
  for (U32 i = 0; i < number_chunks; i++) {
    sizes_out[i] = U32(ic.decompress(dec, i ? I32(sizes_out[i - 1]) : 0, 1));
  }
  return int(number_chunks);
}

}  // extern "C"
