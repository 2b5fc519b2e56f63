"""Exact two-stage voxel merge (ops/voxel_merge.py) — value-level tests
against the one-shot global voxelization (voxel_grid.rs:443-700 reduction
semantics carried across chunk boundaries)."""

import jax.numpy as jnp
import numpy as np

from pasture_tpu.buffers.device import PointBatch
from pasture_tpu.layout import attributes as att
from pasture_tpu.layout.schema import PointSchema
from pasture_tpu.ops import merge_voxel_batches, voxel_downsample

SCHEMA = PointSchema.from_attributes(
    [att.POSITION_3D, att.INTENSITY, att.CLASSIFICATION, att.GPS_TIME])


def _mk(pos, inten, cls, gps, sl):
    m = sl.stop - sl.start
    cap = max(-(-m // 8) * 8, 8)
    d = {att.POSITION_3D.name:
             jnp.asarray(np.pad(pos[sl], [(0, cap - m), (0, 0)])),
         att.INTENSITY.name: jnp.asarray(np.pad(inten[sl], (0, cap - m))),
         att.CLASSIFICATION.name: jnp.asarray(np.pad(cls[sl], (0, cap - m))),
         att.GPS_TIME.name: jnp.asarray(np.pad(gps[sl], (0, cap - m)))}
    return PointBatch(d, jnp.asarray(m, jnp.int32), SCHEMA, {})


def _cloud(rng, n=4096, classes="coherent"):
    pos = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    inten = rng.integers(0, 65536, n).astype(np.uint16)
    if classes == "coherent":
        cls = (np.floor(pos[:, 0] * 2) % 7).astype(np.uint8)
    else:
        cls = rng.integers(0, 8, n, dtype=np.uint8)
    gps = rng.uniform(0, 1e5, n)
    return pos, inten, cls, gps


def _oracle(pos, inten, cls, gps, leaf):
    """f64 per-voxel reductions, keyed by cell, in Morton row order of the
    one-shot output (cells are compared via the outputs' own grouping)."""
    cells = np.floor(pos.astype(np.float64) / leaf).astype(np.int64)
    groups = {}
    for i in range(len(pos)):
        groups.setdefault(tuple(cells[i]), []).append(i)
    return groups


def test_merge_matches_one_shot_values(rng):
    pos, inten, cls, gps, = _cloud(rng)
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="floor")
    cuts = [0, 700, 1500, 2900, n]
    parts = [voxel_downsample(_mk(pos, inten, cls, gps, slice(a, b)), 0.5,
                              bounds=bounds, semantics="floor",
                              with_aux=True)
             for a, b in zip(cuts[:-1], cuts[1:])]
    merged, aux = merge_voxel_batches(parts)
    nv = int(one.count)
    assert int(merged.count) == nv
    # both outputs are ordered by cell key: rows align
    np.testing.assert_allclose(
        np.asarray(merged.data[att.POSITION_3D.name])[:nv],
        np.asarray(one.data[att.POSITION_3D.name])[:nv], atol=2e-5)
    di = (np.asarray(merged.data[att.INTENSITY.name])[:nv].astype(np.int64)
          - np.asarray(one.data[att.INTENSITY.name])[:nv].astype(np.int64))
    assert np.abs(di).max() <= 1  # integer cast of two f32 roundings
    np.testing.assert_array_equal(
        np.asarray(merged.data[att.CLASSIFICATION.name])[:nv],
        np.asarray(one.data[att.CLASSIFICATION.name])[:nv])
    np.testing.assert_allclose(
        np.asarray(merged.data[att.GPS_TIME.name])[:nv],
        np.asarray(one.data[att.GPS_TIME.name])[:nv], rtol=1e-6)
    # aux invariants
    assert int(np.asarray(aux["counts"]).sum()) == n
    assert np.all(np.asarray(aux["counts"])[:nv] >= 1)
    mc = np.asarray(aux["mode_counts"][att.CLASSIFICATION.name])[:nv]
    assert np.all(mc >= 1)
    assert np.all(mc <= np.asarray(aux["counts"])[:nv])


def test_merge_against_f64_oracle(rng):
    """Merged centroids agree with an f64 host oracle of the global mean
    (not just with the one-shot device path)."""
    pos, inten, cls, gps = _cloud(rng, n=2048)
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    parts = [voxel_downsample(_mk(pos, inten, cls, gps, slice(a, b)), 0.5,
                              bounds=bounds, semantics="floor",
                              with_aux=True)
             for a, b in ((0, 900), (900, n))]
    merged, aux = merge_voxel_batches(parts)
    nv = int(merged.count)
    groups = _oracle(pos, inten, cls, gps, 0.5)
    assert nv == len(groups)
    got = np.asarray(merged.data[att.POSITION_3D.name])[:nv]
    cnts = np.asarray(aux["counts"])[:nv]
    want = {cell: pos[m].astype(np.float64).mean(axis=0)
            for cell, m in groups.items()}
    # match each output row to the oracle voxel containing it
    for j in range(nv):
        cell = tuple(np.floor(got[j] / 0.5).astype(int))
        assert cell in want
        np.testing.assert_allclose(got[j], want[cell], atol=2e-5)
        assert cnts[j] == len(groups[cell])


def test_merge_folds(rng):
    """merge(merge(a,b),c) == merge(a,b,c) for mean/max (fold form used by
    streaming)."""
    pos, inten, cls, gps = _cloud(rng, n=3072)
    bounds = (jnp.zeros(3, jnp.float32), None)
    parts = [voxel_downsample(_mk(pos, inten, cls, gps, slice(a, b)), 0.5,
                              bounds=bounds, semantics="floor",
                              with_aux=True)
             for a, b in ((0, 1024), (1024, 2048), (2048, 3072))]
    flat = merge_voxel_batches(parts)
    fold = merge_voxel_batches([merge_voxel_batches(parts[:2]), parts[2]])
    nv = int(flat[0].count)
    assert int(fold[0].count) == nv
    for name in (att.POSITION_3D.name, att.GPS_TIME.name):
        np.testing.assert_allclose(
            np.asarray(fold[0].data[name])[:nv],
            np.asarray(flat[0].data[name])[:nv], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(fold[1]["counts"])[:nv],
                                  np.asarray(flat[1]["counts"])[:nv])


def test_mode_envelope_documented(rng):
    """The weighted mode vote's envelope: exact on spatially-coherent
    classes (realistic data); on worst-case uniform-random classes the
    disagreement rate with the one-shot mode stays small, and every
    disagreement is a genuinely split voxel."""
    pos, inten, cls, gps = _cloud(rng, n=4096, classes="random")
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="floor")
    step = n // 4
    parts = [voxel_downsample(
        _mk(pos, inten, cls, gps, slice(a, min(a + step, n))), 0.5,
        bounds=bounds, semantics="floor", with_aux=True)
        for a in range(0, n, step)]
    merged, aux = merge_voxel_batches(parts)
    nv = int(one.count)
    assert int(merged.count) == nv
    c1 = np.asarray(one.data[att.CLASSIFICATION.name])[:nv]
    c2 = np.asarray(merged.data[att.CLASSIFICATION.name])[:nv]
    dis = (c1 != c2)
    assert dis.mean() < 0.02, dis.mean()
    # disagreements only on voxels split across parts: every single-part
    # voxel is exact.  A voxel is single-part iff some part holds its full
    # count.
    cnts = np.asarray(aux["counts"])[:nv]
    # positions identify rows across paths (they match to 2e-5)
    p1 = np.asarray(one.data[att.POSITION_3D.name])[:nv]
    p2 = np.asarray(merged.data[att.POSITION_3D.name])[:nv]
    np.testing.assert_allclose(p2, p1, atol=2e-5)
    split = np.zeros(nv, bool)
    mkeys = list(zip(*(np.asarray(k)[:nv] for k in aux["keys"])))
    lookup = {k: i for i, k in enumerate(mkeys)}
    for part, paux in parts:
        pc = np.asarray(paux["counts"])
        pn = int(part.count)
        pkeys = list(zip(*(np.asarray(k)[:pn] for k in paux["keys"])))
        for k, c in zip(pkeys, pc[:pn]):
            j = lookup[k]
            if c < cnts[j]:
                split[j] = True
    assert not np.any(dis & ~split)


def test_merge_single_key_grid_and_sort_tiles(rng):
    """grid_bits<=10 (single-u32 keys) + sort_tiles partials — the
    end-to-end pipeline's shape: tiles that split voxels emit one row per
    (tile, voxel) and the merge repairs them to the exact global result."""
    pos, inten, cls, gps = _cloud(rng, n=4096)
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="floor", grid_bits=10)
    parts = [voxel_downsample(_mk(pos, inten, cls, gps, slice(a, b)), 0.5,
                              bounds=bounds, semantics="floor",
                              grid_bits=10, sort_tiles=8, with_aux=True)
             for a, b in ((0, 2048), (2048, n))]
    assert len(parts[0][1]["keys"]) == 1        # single-u32 key aux
    merged, aux = merge_voxel_batches(parts)
    nv = int(one.count)
    assert int(merged.count) == nv
    np.testing.assert_allclose(
        np.asarray(merged.data[att.POSITION_3D.name])[:nv],
        np.asarray(one.data[att.POSITION_3D.name])[:nv], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(merged.data[att.GPS_TIME.name])[:nv],
        np.asarray(one.data[att.GPS_TIME.name])[:nv], rtol=1e-6)
    assert int(np.asarray(aux["counts"]).sum()) == n


def test_merge_nearest_semantics(rng):
    """'nearest' cells are half-open intervals too, so merging by carried
    keys stays exact for the nearest-marker semantics
    (voxel_grid.rs:22-51)."""
    pos, inten, cls, gps = _cloud(rng, n=2048)
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="nearest")
    parts = [voxel_downsample(_mk(pos, inten, cls, gps, slice(a, b)), 0.5,
                              bounds=bounds, semantics="nearest",
                              with_aux=True)
             for a, b in ((0, 800), (800, n))]
    merged, aux = merge_voxel_batches(parts)
    nv = int(one.count)
    assert int(merged.count) == nv
    np.testing.assert_allclose(
        np.asarray(merged.data[att.POSITION_3D.name])[:nv],
        np.asarray(one.data[att.POSITION_3D.name])[:nv], atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(merged.data[att.GPS_TIME.name])[:nv],
        np.asarray(one.data[att.GPS_TIME.name])[:nv], rtol=1e-6)
    assert int(np.asarray(aux["counts"]).sum()) == n


def test_mode_runner_up_votes_elect_global_mode():
    """Round-4.5 top-2 carry: a global mode that WINS NO partial (it is
    the runner-up in each) is still elected by the merge — the exact case
    the winner-only vote provably missed.  A: {1:2, 2:1}, B: {3:3, 2:2}
    -> global {2:3, 3:3, 1:2}; tie 2 vs 3 resolves to the smaller value 2
    (one-shot convention), while partial winners alone would elect 3."""
    def chunk(labels):
        m = len(labels)
        cap = max(-(-m // 8) * 8, 8)
        pos = np.full((m, 3), 0.5, np.float32)
        d = {att.POSITION_3D.name:
                 jnp.asarray(np.pad(pos, [(0, cap - m), (0, 0)])),
             att.INTENSITY.name: jnp.zeros(cap, jnp.uint16),
             att.CLASSIFICATION.name:
                 jnp.asarray(np.pad(np.asarray(labels, np.uint8),
                                    (0, cap - m))),
             att.GPS_TIME.name: jnp.zeros(cap, jnp.float64)}
        b = PointBatch(d, jnp.asarray(m, jnp.int32), SCHEMA, {})
        return voxel_downsample(b, 1.0, semantics="floor",
                                bounds=(jnp.zeros(3), None), with_aux=True)

    A, B = chunk([1, 1, 2]), chunk([3, 3, 3, 2, 2])
    # partial aux carries the runner-up votes
    a2v = int(np.asarray(A[1]["mode2_values"][att.CLASSIFICATION.name])[0])
    a2c = int(np.asarray(A[1]["mode2_counts"][att.CLASSIFICATION.name])[0])
    assert (a2v, a2c) == (2, 1)
    merged, aux = merge_voxel_batches([A, B])
    assert int(merged.count) == 1
    assert int(np.asarray(merged.data[att.CLASSIFICATION.name])[0]) == 2
    assert int(np.asarray(
        aux["mode_counts"][att.CLASSIFICATION.name])[0]) == 3
    # matches the one-shot result exactly
    one, _ = chunk([1, 1, 2, 3, 3, 3, 2, 2])
    assert int(np.asarray(one.data[att.CLASSIFICATION.name])[0]) == 2


def test_mode_top2_envelope(rng):
    """With runner-up votes the worst-case disagreement rate collapses
    (measured ~0.06% on uniform-random 8-label voxels over 4-way splits,
    vs <2% for the winner-only vote), and EVERY remaining disagreement is
    a genuine envelope case: the one-shot winner LOST votes to the carry
    (it ranked third or lower in some partial, so its carried total is
    strictly below its true global count)."""
    pos, inten, cls, gps = _cloud(rng, n=4096, classes="random")
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="floor")
    step = n // 4
    parts = [voxel_downsample(
        _mk(pos, inten, cls, gps, slice(a, min(a + step, n))), 0.5,
        bounds=bounds, semantics="floor", with_aux=True)
        for a in range(0, n, step)]
    merged, aux = merge_voxel_batches(parts)
    nv = int(one.count)
    c1 = np.asarray(one.data[att.CLASSIFICATION.name])[:nv]
    c2 = np.asarray(merged.data[att.CLASSIFICATION.name])[:nv]
    dis = c1 != c2
    assert dis.mean() < 0.005, dis.mean()
    # every disagreement: the one-shot winner's carried vote total is
    # strictly below its true global count (it ranked >= 3rd somewhere)
    mkeys = list(zip(*(np.asarray(k)[:nv] for k in aux["keys"])))
    lookup = {k: i for i, k in enumerate(mkeys)}
    cname = att.CLASSIFICATION.name
    carried = [dict() for _ in range(nv)]  # value -> carried vote total
    for part, paux in parts:
        pn = int(part.count)
        pkeys = list(zip(*(np.asarray(k)[:pn] for k in paux["keys"])))
        win = np.asarray(part.data[cname])[:pn]
        wc = np.asarray(paux["mode_counts"][cname])[:pn]
        m2v = np.asarray(paux["mode2_values"][cname])[:pn]
        m2c = np.asarray(paux["mode2_counts"][cname])[:pn]
        for i, k in enumerate(pkeys):
            d = carried[lookup[k]]
            d[int(win[i])] = d.get(int(win[i]), 0) + int(wc[i])
            if m2c[i] > 0:
                d[int(m2v[i])] = d.get(int(m2v[i]), 0) + int(m2c[i])
    # true per-voxel label counts from the points themselves
    cells = np.floor(pos.astype(np.float64) / 0.5).astype(np.int64)
    true_cnt = {}
    # map output rows to cells via the one-shot positions' own voxels
    p1 = np.asarray(one.data[att.POSITION_3D.name])[:nv]
    row_cell = np.floor(p1.astype(np.float64) / 0.5).astype(np.int64)
    for i in range(n):
        key = tuple(cells[i])
        true_cnt.setdefault(key, {})
        true_cnt[key][int(cls[i])] = true_cnt[key].get(int(cls[i]), 0) + 1
    for j in np.flatnonzero(dis):
        tc = true_cnt[tuple(row_cell[j])]
        got = carried[j].get(int(c1[j]), 0)
        assert got < tc[int(c1[j])], (j, c1[j], got, tc)


def _chunk_labeled(labels, mode_runs=False):
    m = len(labels)
    cap = max(-(-m // 8) * 8, 8)
    pos = np.full((m, 3), 0.5, np.float32)
    d = {att.POSITION_3D.name:
             jnp.asarray(np.pad(pos, [(0, cap - m), (0, 0)])),
         att.INTENSITY.name: jnp.zeros(cap, jnp.uint16),
         att.CLASSIFICATION.name:
             jnp.asarray(np.pad(np.asarray(labels, np.uint8),
                                (0, cap - m))),
         att.GPS_TIME.name: jnp.zeros(cap, jnp.float64)}
    b = PointBatch(d, jnp.asarray(m, jnp.int32), SCHEMA, {})
    return voxel_downsample(b, 1.0, semantics="floor",
                            bounds=(jnp.zeros(3), None), with_aux=True,
                            mode_runs=mode_runs)


def test_mode_runs_exact_beats_vote_envelope():
    """Run-table carriage makes the mode merge EXACT where even the top-2
    vote provably fails: the global mode ranks THIRD in every partial
    (so no vote for it is carried), yet the exact merge elects it."""
    chunks = [[5, 5, 5, 6, 6, 6, 9, 9], [7, 7, 7, 8, 8, 8, 9, 9],
              [3, 3, 3, 4, 4, 4, 9, 9]]
    cname = att.CLASSIFICATION.name
    one, _ = _chunk_labeled(sum(chunks, []))
    assert int(np.asarray(one.data[cname])[0]) == 9  # global {9:6, rest:3}

    vote, _ = merge_voxel_batches([_chunk_labeled(c) for c in chunks])
    assert int(np.asarray(vote.data[cname])[0]) != 9  # the envelope case

    parts = [_chunk_labeled(c, mode_runs=True) for c in chunks]
    exact, aux = merge_voxel_batches(parts)
    assert int(np.asarray(exact.data[cname])[0]) == 9
    assert int(np.asarray(aux["mode_counts"][cname])[0]) == 6
    # merged run table is the exact summed histogram
    rt = aux["mode_runs"][cname]
    nr = int(rt["num_runs"])
    hist = dict(zip(np.asarray(rt["values"])[:nr].tolist(),
                    np.asarray(rt["counts"])[:nr].tolist()))
    assert hist == {3: 3, 4: 3, 5: 3, 6: 3, 7: 3, 8: 3, 9: 6}
    # explicit exact_mode control
    forced, _ = merge_voxel_batches(parts, exact_mode=False)
    assert int(np.asarray(forced.data[cname])[0]) != 9
    import pytest
    with pytest.raises(ValueError, match="mode_runs"):
        merge_voxel_batches([_chunk_labeled(c) for c in chunks],
                            exact_mode=True)


def test_mode_runs_fold_and_cap():
    """merge(merge(a, b), c) with run tables equals the one-shot mode (the
    merged table is itself an exact-mode input), and mode_runs_cap clamps
    the table while reporting the true run count for overflow checks."""
    chunks = [[5, 5, 5, 6, 6, 6, 9, 9], [7, 7, 7, 8, 8, 8, 9, 9],
              [3, 3, 3, 4, 4, 4, 9, 9]]
    cname = att.CLASSIFICATION.name
    parts = [_chunk_labeled(c, mode_runs=True) for c in chunks]
    ab = merge_voxel_batches(parts[:2])
    fold, _ = merge_voxel_batches([ab, parts[2]])
    assert int(np.asarray(fold.data[cname])[0]) == 9
    capped, caux = merge_voxel_batches(parts, mode_runs_cap=4)
    rt = caux["mode_runs"][cname]
    assert rt["values"].shape[0] == 4 and int(rt["num_runs"]) == 7
    # truncation is detectable on host: num_runs > cap
    assert int(rt["num_runs"]) > 4
    # a generous cap keeps exactness through further folds
    wide = merge_voxel_batches(parts[:2], mode_runs_cap=64)
    fold2, _ = merge_voxel_batches([wide, parts[2]])
    assert int(np.asarray(fold2.data[cname])[0]) == 9


def test_mode_runs_randomized_oracle(rng):
    """Random labels over random chunkings: the exact merge equals the
    one-shot global voxelization at VALUE level for every column,
    including the mode column the vote path only bounds."""
    pos, inten, cls, gps = _cloud(rng, n=2048, classes="random")
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="floor")
    nv = int(one.count)
    for trial in range(3):
        cuts = sorted(rng.integers(1, n - 1, 3).tolist())
        edges = [0] + cuts + [n]
        parts = [voxel_downsample(
            _mk(pos, inten, cls, gps, slice(a, b)), 0.5, bounds=bounds,
            semantics="floor", with_aux=True, mode_runs=True)
            for a, b in zip(edges[:-1], edges[1:]) if b > a]
        merged, aux = merge_voxel_batches(parts)
        assert int(merged.count) == nv
        np.testing.assert_array_equal(
            np.asarray(merged.data[att.CLASSIFICATION.name])[:nv],
            np.asarray(one.data[att.CLASSIFICATION.name])[:nv])
        np.testing.assert_allclose(
            np.asarray(merged.data[att.POSITION_3D.name])[:nv],
            np.asarray(one.data[att.POSITION_3D.name])[:nv], atol=2e-5)
        # per-voxel run counts sum to the per-voxel point counts
        rt = aux["mode_runs"][att.CLASSIFICATION.name]
        assert int(np.asarray(rt["counts"]).sum()) == n


def test_mode_runs_exact_under_sort_tiles(rng):
    """sort_tiles partials with non-disjoint tiles emit DUPLICATE
    (key, value) runs (one per tile that sees the pair); the exact merge
    sums them, so the merged mode equals the global one-shot mode even on
    uniform-random labels split across tiles AND chunks."""
    pos, inten, cls, gps = _cloud(rng, n=4096, classes="random")
    n = len(pos)
    bounds = (jnp.zeros(3, jnp.float32), None)
    one = voxel_downsample(_mk(pos, inten, cls, gps, slice(0, n)), 0.5,
                           bounds=bounds, semantics="floor", grid_bits=10)
    parts = [voxel_downsample(_mk(pos, inten, cls, gps, slice(a, b)), 0.5,
                              bounds=bounds, semantics="floor",
                              grid_bits=10, sort_tiles=8, with_aux=True,
                              mode_runs=True)
             for a, b in ((0, 2048), (2048, n))]
    merged, aux = merge_voxel_batches(parts)
    nv = int(one.count)
    assert int(merged.count) == nv
    np.testing.assert_array_equal(
        np.asarray(merged.data[att.CLASSIFICATION.name])[:nv],
        np.asarray(one.data[att.CLASSIFICATION.name])[:nv])
    # duplicate-run summing left the totals exact
    rt = aux["mode_runs"][att.CLASSIFICATION.name]
    assert int(np.asarray(rt["counts"]).sum()) == n


def _chunk_cells(cells_labels, mode_runs=True):
    """One point per (cell_x, label) entry; x = cell + 0.5 so each entry
    lands in cell ``cell_x`` of a 1m grid."""
    m = len(cells_labels)
    cap = max(-(-m // 8) * 8, 8)
    pos = np.full((m, 3), 0.5, np.float32)
    pos[:, 0] += np.asarray([c for c, _ in cells_labels], np.float32)
    d = {att.POSITION_3D.name:
             jnp.asarray(np.pad(pos, [(0, cap - m), (0, 0)])),
         att.INTENSITY.name: jnp.zeros(cap, jnp.uint16),
         att.CLASSIFICATION.name:
             jnp.asarray(np.pad(
                 np.asarray([l for _, l in cells_labels], np.uint8),
                 (0, cap - m))),
         att.GPS_TIME.name: jnp.zeros(cap, jnp.float64)}
    b = PointBatch(d, jnp.asarray(m, jnp.int32), SCHEMA, {})
    return voxel_downsample(b, 1.0, semantics="floor",
                            bounds=(jnp.zeros(3), None), with_aux=True,
                            mode_runs=mode_runs)


def test_mode_runs_truncated_input_stays_aligned():
    """A TRUNCATED run table (num_runs > capacity) must not shift the
    voxel/row alignment of a later fold: the vote table is padded with
    the carried key set, so only the voxels whose runs were dropped lose
    votes (detectable: mode_counts 0 with counts > 0), every other
    column stays exact, and ``input_truncated`` flags the fold."""
    cname = att.CLASSIFICATION.name
    # voxel 0: labels {1:2, 2:1}; voxel 1: labels {3:2, 4:1} -> 4 runs
    p1 = _chunk_cells([(0, 1), (0, 1), (0, 2), (1, 3), (1, 3), (1, 4)])
    trunc = merge_voxel_batches([p1], mode_runs_cap=2)
    rt = trunc[1]["mode_runs"][cname]
    assert int(rt["num_runs"]) == 4 and rt["values"].shape[0] == 2
    assert not bool(rt["input_truncated"])  # inputs were complete
    # second chunk touches ONLY voxel 0 — before the alignment fix, the
    # vote-side compaction then lost voxel 1 entirely and every row at or
    # after it carried another voxel's mode
    p2 = _chunk_cells([(0, 2), (0, 2)])
    merged, aux = merge_voxel_batches([trunc, p2])
    assert int(merged.count) == 2
    np.testing.assert_array_equal(np.asarray(aux["counts"])[:2], [5, 3])
    np.testing.assert_allclose(
        np.asarray(merged.data[att.POSITION_3D.name])[:2, 0], [0.5, 1.5],
        atol=1e-6)
    # voxel 0's runs survived the cap: exact mode {1:2, 2:3} -> 2
    assert int(np.asarray(merged.data[cname])[0]) == 2
    assert int(np.asarray(aux["mode_counts"][cname])[0]) == 3
    # voxel 1's runs were dropped: mode degrades to 0 votes, flagged per
    # row (counts > 0 but mode_counts == 0) and per fold (input_truncated)
    assert int(np.asarray(aux["mode_counts"][cname])[1]) == 0
    assert bool(aux["mode_runs"][cname]["input_truncated"])
    # the flag propagates through further folds
    again, aux2 = merge_voxel_batches(
        [(merged, aux), _chunk_cells([(0, 2)])])
    assert bool(aux2["mode_runs"][cname]["input_truncated"])


def test_exact_mode_without_mode_columns_is_noop(rng):
    """exact_mode=True on a schema with no mode-policy columns merges
    fine (nothing to merge exactly) instead of demanding run tables."""
    schema = PointSchema.from_attributes([att.POSITION_3D])
    def chunk(x):
        pos = np.full((4, 3), 0.25, np.float32)
        pos[:, 0] += x
        cap = 8
        d = {att.POSITION_3D.name:
                 jnp.asarray(np.pad(pos, [(0, cap - 4), (0, 0)]))}
        b = PointBatch(d, jnp.asarray(4, jnp.int32), schema, {})
        return voxel_downsample(b, 1.0, semantics="floor",
                                bounds=(jnp.zeros(3), None), with_aux=True)
    merged, aux = merge_voxel_batches([chunk(0.0), chunk(0.5)],
                                      exact_mode=True)
    assert int(merged.count) == 1
    assert int(np.asarray(aux["counts"])[0]) == 8
    np.testing.assert_allclose(
        np.asarray(merged.data[att.POSITION_3D.name])[0, 0], 0.5, atol=1e-6)
