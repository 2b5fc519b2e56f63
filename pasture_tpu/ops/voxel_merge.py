"""Exact merging of partial voxelizations (two-stage downsampling).

Chunked, streaming and sharded voxel downsampling all produce PARTIAL
per-voxel statistics: a voxel whose points are split across two chunks
appears once in each partial result.  Given the merge statistics emitted
by :func:`~pasture_tpu.ops.voxel_downsample` ``with_aux=True`` (cell
keys, per-voxel point counts, winning-mode counts), this module merges
partials so the result EXACTLY equals the one-shot global voxelization
for the mean and max reduction policies (reference semantics:
pasture-algorithms/src/voxel_grid.rs:443-700):

* **mean** — weighted mean of partial means: ``sum(c_i * mean_i) /
  sum(c_i)`` is algebraically the global mean (equal up to f32 summation
  order; tests assert against an f64 oracle);
* **max** — max of partial maxes (exact; the 0-clamp is idempotent);
* **mode** — EXACT when the partials carry full run tables
  (``voxel_downsample(..., mode_runs=True)``): the vote then covers every
  voxel's complete (value, count) histogram, so the elected mode equals
  the one-shot global mode unconditionally, and the merge emits the
  summed histogram so folds stay exact.  Without run tables the merge
  falls back to a weighted vote over the partial winners AND runner-ups: each
  partial contributes its top-2 (value, count) pairs with their true
  in-partial counts, matching values are summed across partials, and the
  largest total wins (ties to the smallest value, as in the one-shot
  path).  This is exact whenever the global mode's votes are FULLY
  carried — it ranks in the top-2 of every partial it appears in (always
  true when a voxel lies in one chunk, and far more often than under the
  winner-only vote for split voxels) — and more broadly whenever its
  carried total still beats every rival's carried total; it can differ
  only when the global mode ranks third or lower in some partial, losing
  votes there — a documented,
  tested envelope (see tests/test_voxel_merge.py; 0 misses measured even
  on worst-case uniform-random labels), the price of merging without
  full per-voxel histograms.

Merged outputs carry the same aux statistics, so merging FOLDS:
``merge(merge(a, b), c) == merge(a, b, c)`` for mean/max (mode keeps the
same envelope) — the shape streaming consumption needs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from jax import lax

from ..buffers.device import PointBatch
from .segscan import (seg_totals_max, seg_totals_sum,
                      seg_totals_top2_lexmax2)
from .compact import compact_columns, pack_int_columns, unpack_int_columns
from .voxel import (DEFAULT_POLICIES, _INVALID_KEY, _cast_as, _flatten_cols,
                    _unflatten_cols)

__all__ = ["merge_voxel_batches"]


def merge_voxel_batches(parts: Sequence[Tuple[PointBatch, Dict]],
                        policies: Optional[Dict[str, str]] = None,
                        exact_mode: Optional[bool] = None,
                        mode_runs_cap: Optional[int] = None
                        ) -> Tuple[PointBatch, Dict]:
    """Merge partial voxelizations into one, exactly (see module doc).

    ``parts``: ``(batch, aux)`` pairs as returned by
    :func:`~pasture_tpu.ops.voxel_downsample` ``with_aux=True`` (or by a
    previous merge) against the SAME grid (bounds/leaf/semantics/
    grid_bits).  ``policies`` must match the ones used to produce the
    partials (default policies otherwise).  Returns ``(batch, aux)`` of
    the same form; output rows are ordered by cell key.

    Voxels are identified purely by the carried cell keys — nothing is
    re-quantized, so a partial centroid sitting on a cell boundary can
    never migrate to a neighbouring cell.

    Example — a voxel split across two chunks merges back to the exact
    global mean (0.2 and 0.4 in the same 1m cell -> 0.3):

    >>> import numpy as np, jax.numpy as jnp
    >>> from pasture_tpu.buffers.device import PointBatch
    >>> from pasture_tpu.layout import attributes as att
    >>> from pasture_tpu.layout.schema import PointSchema
    >>> from pasture_tpu.ops import merge_voxel_batches, voxel_downsample
    >>> schema = PointSchema.from_attributes([att.POSITION_3D])
    >>> def chunk(rows):
    ...     pos = jnp.asarray(rows)
    ...     b = PointBatch({att.POSITION_3D.name: pos},
    ...                    jnp.asarray(len(rows)), schema, {})
    ...     return voxel_downsample(b, 1.0, semantics="floor",
    ...                             bounds=(jnp.zeros(3), None),
    ...                             with_aux=True)
    >>> merged, aux = merge_voxel_batches(
    ...     [chunk([[0.2, 0.2, 0.2]]), chunk([[0.4, 0.4, 0.4]])])
    >>> int(merged.count), int(aux["counts"][0])
    (1, 2)
    >>> np.asarray(merged.data[att.POSITION_3D.name][0]).round(2).tolist()
    [0.3, 0.3, 0.3]

    ``exact_mode``: ``None`` (default) uses the EXACT run-table mode
    merge whenever every partial carries ``aux["mode_runs"]`` (produced
    by ``voxel_downsample(..., with_aux=True, mode_runs=True)``) and the
    top-2 weighted vote otherwise; ``True`` requires run tables (raises
    if absent); ``False`` forces the vote.  With run tables the vote is
    over each voxel's complete value histogram, so the merged mode equals
    the one-shot global mode unconditionally, and the output carries
    merged run tables (the summed histograms), keeping FOLDS exact too.
    ``mode_runs_cap``: static capacity for the merged run tables (default
    = the concatenated input capacity).  Merged tables report their true
    run count as ``aux["mode_runs"][n]["num_runs"]`` — if it exceeds the
    cap the table was truncated (largest keys dropped).  Feeding a
    TRUNCATED table into a later fold degrades ONLY the voxels whose runs
    were dropped: the vote table is always padded with the full carried
    key set, so row alignment with the non-mode columns holds by
    construction (a voxel whose runs were all dropped reports mode 0 with
    ``mode_counts`` 0 — detectable per row where ``counts`` > 0), and the
    dropped runs simply lose their votes.  Each merged table also carries
    ``input_truncated``, a device boolean that is True iff any input
    table of this merge (or of an earlier fold) reported
    ``num_runs`` beyond its capacity — assert it on host when clamping
    ``mode_runs_cap``.
    """
    if not parts:
        raise ValueError("merge_voxel_batches needs at least one partial")
    batch0, aux0 = parts[0]
    nk = len(aux0["keys"])
    names = list(batch0.data)
    for b, a in parts[1:]:
        if list(b.data) != names:
            raise ValueError("partials carry different attribute sets")
        if len(a["keys"]) != nk:
            raise ValueError("partials carry different key widths")

    pol = dict(DEFAULT_POLICIES)
    if policies:
        pol.update(policies)

    def policy_of(name, col):
        p = pol.get(name)
        if p is None:
            p = "mean" if jnp.issubdtype(col.dtype, jnp.floating) else "mode"
        return p

    def cat(cols):
        return cols[0] if len(cols) == 1 else jnp.concatenate(cols)

    keys = [cat([a["keys"][i] for _, a in parts]) for i in range(nk)]
    counts = cat([a["counts"] for _, a in parts]).astype(jnp.int32)
    data = {n: cat([b.data[n] for b, _ in parts]) for n in names}
    mode_names = [n for n in names if policy_of(n, data[n]) == "mode"]
    mode_counts = {n: cat([a["mode_counts"][n] for _, a in parts])
                   for n in mode_names}
    # runner-up (value, count) votes (voxel_downsample with_aux since the
    # top-2 carry): present unless a partial predates them
    have2 = bool(mode_names) and all(
        "mode2_counts" in a for _, a in parts)
    # full per-(voxel, value) run tables (mode_runs=True): the EXACT path
    have_runs = bool(mode_names) and all(
        "mode_runs" in a and all(n in a["mode_runs"] for n in mode_names)
        for _, a in parts)
    use_exact = have_runs if exact_mode is None else bool(exact_mode)
    # with no mode columns there is nothing to merge exactly — treat
    # exact_mode=True as a no-op instead of demanding absent run tables
    use_exact = use_exact and bool(mode_names)
    if use_exact and not have_runs:
        raise ValueError(
            "exact_mode=True needs aux['mode_runs'] on every partial for "
            "every mode column (voxel_downsample(..., with_aux=True, "
            "mode_runs=True))")
    mode2_vals = {n: cat([a["mode2_values"][n] for _, a in parts])
                  for n in mode_names} if have2 else {}
    mode2_cnts = {n: cat([a["mode2_counts"][n] for _, a in parts])
                  for n in mode_names} if have2 else {}
    # integer mean columns were truncated by the output cast; merge from
    # the carried UNROUNDED partial means instead
    raw_names = list(aux0.get("raw_means", {}))
    raw = {n: cat([a["raw_means"][n] for _, a in parts]) for n in raw_names}
    cap = keys[0].shape[0]
    valid_in = keys[0] != _INVALID_KEY
    counts = jnp.where(valid_in, counts, 0)

    # ---- sort 1: keys carry counts + every mean/max column -----------------
    carry = {n: (raw[n] if n in raw else c) for n, c in data.items()
             if policy_of(n, data[n]) != "mode"}
    ops, layout = _flatten_cols(carry)
    sorted_all = lax.sort(tuple(keys) + (counts,) + tuple(ops),
                          num_keys=nk, is_stable=False)
    skeys = sorted_all[:nk]
    scnt = sorted_all[nk]
    sops = sorted_all[nk + 1:]
    scols = _unflatten_cols(list(sops), layout)

    valid = skeys[0] != _INVALID_KEY
    new_key = jnp.concatenate([
        jnp.ones((1,), bool),
        jnp.any(jnp.stack([k[1:] != k[:-1] for k in skeys]), axis=0)
        if nk > 1 else (skeys[0][1:] != skeys[0][:-1])])
    first = new_key & valid

    reduced: Dict[str, jnp.ndarray] = {}
    raw_out: Dict[str, jnp.ndarray] = {}
    wts32 = jnp.where(valid, scnt, 0).astype(jnp.float32)
    counts_out = None
    for acc_dtype in (jnp.float32, jnp.float64):
        group = [(n, c) for n, c in scols.items()
                 if policy_of(n, data[n]) == "mean"
                 and ((c.dtype == jnp.float64) == (acc_dtype == jnp.float64))]
        is_f32 = acc_dtype == jnp.float32
        if not group and not (is_f32 and counts_out is None):
            continue
        comps, glayout = _flatten_cols(dict(group))
        w = wts32.astype(acc_dtype)
        cols_acc = [jnp.where(valid, c.astype(acc_dtype), 0) * w
                    for c in comps]
        add_counts = counts_out is None
        if add_counts:
            cols_acc.append(w)
        sums = seg_totals_sum(cols_acc, first)
        if add_counts:
            counts_out = sums[-1].astype(jnp.float32)
            sums = sums[:-1]
        cw = jnp.maximum(counts_out, 1.0).astype(acc_dtype)
        cols = _unflatten_cols([s / cw for s in sums], glayout)
        for n, c in cols.items():
            if n in raw:
                raw_out[n] = c.astype(jnp.float32)
            reduced[n] = _cast_as(c, data[n].dtype)

    for n, c in scols.items():
        if policy_of(n, data[n]) != "max":
            continue
        acc = c.dtype if jnp.issubdtype(c.dtype, jnp.floating) \
            else jnp.float32
        v = jnp.where(valid, c.astype(acc), -jnp.inf)
        m = seg_totals_max(v, first)
        reduced[n] = _cast_as(jnp.maximum(m, 0.0), data[n].dtype)

    # ---- mode: weighted vote over partial winners + runner-ups -------------
    # each partial contributes its winner AND (when carried) its runner-up
    # with their true in-partial counts; matching values sum across
    # partials and the largest total wins (ties to the smallest value).
    # The vote table is 2x the row space of sort 1, so mode columns
    # compact separately — both compactions order voxels by ascending
    # cell key, so the prefixes align row-for-row.
    mode_win: Dict[str, jnp.ndarray] = {}
    mode2_win_v: Dict[str, jnp.ndarray] = {}
    mode2_win_c: Dict[str, jnp.ndarray] = {}
    mode_compacted: Dict[str, List[jnp.ndarray]] = {}
    imin = jnp.iinfo(jnp.int32).min
    merged_runs: Dict[str, Dict[str, jnp.ndarray]] = {}
    for n in mode_names:
        col = data[n].astype(jnp.int32)
        mw = jnp.where(valid_in, mode_counts[n].astype(jnp.int32), 0)
        if use_exact:
            # exact: vote over the complete per-(voxel, value) histograms
            # — every value's true global total is on the table, so the
            # lexmax below IS the one-shot mode (no envelope).  The table
            # is padded with the carried main keys at ZERO weight so its
            # distinct valid key set equals the main key set even if an
            # input table was truncated (num_runs > capacity): row
            # alignment with the non-mode compaction then holds by
            # construction, and truncation costs only the dropped votes.
            rts = [a["mode_runs"][n] for _, a in parts]
            vote_v = cat([t["values"].astype(jnp.int32) for t in rts]
                         + [jnp.zeros_like(col)])
            vote_w = cat([t["counts"].astype(jnp.int32) for t in rts]
                         + [jnp.zeros_like(mw)])
            vote_keys = tuple(cat([t["keys"][i] for t in rts] + [keys[i]])
                              for i in range(nk))
            trunc = jnp.zeros((), bool)
            for t in rts:
                trunc |= jnp.any(t["num_runs"] > t["values"].shape[0])
                if "input_truncated" in t:
                    trunc |= jnp.any(t["input_truncated"])
        elif have2:
            w2 = jnp.where(valid_in, mode2_cnts[n].astype(jnp.int32), 0)
            vote_v = jnp.concatenate([col, mode2_vals[n].astype(jnp.int32)])
            vote_w = jnp.concatenate([mw, w2])
            # zero-weight rows (absent runner-ups, invalid inputs) sort
            # to the tail like invalid voxels
            vote_keys = tuple(
                jnp.where(vote_w > 0, jnp.concatenate([k, k]), _INVALID_KEY)
                for k in keys)
        else:
            vote_v, vote_w = col, mw
            vote_keys = tuple(keys)
        s = lax.sort(vote_keys + (vote_v, vote_w), num_keys=nk + 1,
                     is_stable=False)
        sv, sw = s[nk], s[nk + 1]
        sk = s[:nk]
        nk_new = jnp.concatenate([
            jnp.ones((1,), bool),
            jnp.any(jnp.stack([k[1:] != k[:-1] for k in sk]), axis=0)
            if nk > 1 else (sk[0][1:] != sk[0][:-1])])
        run_new = nk_new | jnp.concatenate([jnp.ones((1,), bool),
                                            sv[1:] != sv[:-1]])
        svalid = sk[0] != _INVALID_KEY
        f2 = nk_new & svalid
        runs = run_new & svalid
        # total votes for each (voxel, value) run, then top-2 under the
        # lexicographic (max votes, then min value) order per voxel
        run_tot = seg_totals_sum(jnp.where(svalid, sw, 0), runs)
        if use_exact:
            # carry the merged histogram (summed counts per (voxel, value))
            # so a merge output is itself an exact-mode merge input: folds
            # stay exact while the true run count fits the table capacity.
            # Zero-total runs exist only where the alignment padding hit a
            # voxel with no real run of that value — keep them out of the
            # carried table (genuine runs always total >= 1)
            runs_real = runs & (run_tot > 0)
            rcols = ([jnp.where(runs_real, k, _INVALID_KEY) for k in sk]
                     + [jnp.where(runs_real, sv, 0),
                        jnp.where(runs_real, run_tot, 0)])
            rcomp, nruns = compact_columns(rcols, runs_real)
            rn = rcomp[0].shape[0]
            rcap = rn if mode_runs_cap is None else int(mode_runs_cap)
            rvalid = jnp.arange(rn, dtype=jnp.int32) < nruns

            def _fit(c, pad):
                c = jnp.where(rvalid, c, jnp.asarray(pad, c.dtype))
                if rcap <= rn:
                    return c[:rcap]
                return jnp.concatenate(
                    [c, jnp.full((rcap - rn,), pad, c.dtype)])

            merged_runs[n] = {
                "keys": tuple(_fit(k, _INVALID_KEY) for k in rcomp[:nk]),
                "values": _fit(rcomp[nk], 0),
                "counts": _fit(rcomp[nk + 1], 0),
                "num_runs": nruns,
                "input_truncated": trunc,
            }
        primary = jnp.where(runs, run_tot, -1)
        secondary = jnp.where(runs, -sv, imin)
        p1, s1, p2, s2 = seg_totals_top2_lexmax2(primary, secondary, f2)
        win_v = -s1
        win_c = jnp.maximum(p1, 0)
        c2 = jnp.maximum(p2, 0)
        v2 = jnp.where(c2 > 0, -s2, 0)
        cols4, nv_mode = compact_columns([win_v, win_c, v2, c2], f2)
        mode_compacted[n] = cols4
        # nv_mode == the main num_voxels BY CONSTRUCTION in every branch:
        # the vote keys are the main keys (vote paths) or the run-table
        # keys padded with the main keys (exact path), so both
        # compactions see the same distinct valid key set and the
        # key-ordered prefixes align row-for-row
        del nv_mode

    # ---- compact first rows to the front -----------------------------------
    for i in range(nk):
        reduced[f"__aux_key{i}"] = skeys[i]
    reduced["__aux_counts"] = counts_out.astype(jnp.int32)
    for n, rm in raw_out.items():
        reduced[f"__aux_raw:{n}"] = rm
    cops, clayout = _flatten_cols(reduced)
    packed_ops, pack_info = pack_int_columns(cops)
    compacted, num_voxels = compact_columns(packed_ops, first)
    out = _unflatten_cols(unpack_int_columns(compacted, pack_info), clayout)

    valid_out = jnp.arange(cap, dtype=jnp.int32) < num_voxels
    for n, (win_v, win_c, v2, v2c) in mode_compacted.items():
        out[n] = _cast_as(win_v[:cap].astype(jnp.float32), data[n].dtype)
        mode_win[n] = jnp.where(valid_out, win_c[:cap], 0)
        mode2_win_v[n] = jnp.where(valid_out, v2[:cap], 0)
        mode2_win_c[n] = jnp.where(valid_out, v2c[:cap], 0)
    aux = {
        "keys": tuple(jnp.where(valid_out, out.pop(f"__aux_key{i}"),
                                _INVALID_KEY) for i in range(nk)),
        "counts": jnp.where(valid_out, out.pop("__aux_counts"), 0),
        "mode_counts": mode_win,
        "mode2_values": mode2_win_v,
        "mode2_counts": mode2_win_c,
        "raw_means": {n: out.pop(f"__aux_raw:{n}") for n in raw_out},
    }
    if use_exact:
        aux["mode_runs"] = merged_runs
    # canonical attribute order: merge outputs must themselves be valid
    # merge inputs (the fold form), and inputs are order-checked above
    out = {n: out[n] for n in names}
    return (PointBatch(out, num_voxels, batch0.schema, batch0.meta), aux)
