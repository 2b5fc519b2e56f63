"""EXACT-path headline bench: transform + voxelize with no approximation.

Since round 3 the EXACT path IS the headline (bench.py): positions ride
the voxel sort as exact 10-bit integer local-coordinate residuals (one
u32 operand) and centroids are the affine image of the exact local mean
— no quantization anywhere, and a 3-operand sort instead of the round-2
5-operand f32 formulation (639 Mpts/s -> >1 Gpts/s; see
benches/sort_ablation.py for the operand-cost measurements).

This file re-exports the headline run under the historical metric name
so round-over-round comparisons stay greppable.

Run on the TPU (default env): python benches/exact_path_bench.py
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import (K, N, TARGET_POINTS_PER_S, make_batch,  # noqa: E402
                   run_overhead, run_pipeline, timed_fetch)


def main() -> None:
    batch = make_batch(N)
    int(run_overhead(batch))
    int(run_pipeline(batch))

    t0 = timed_fetch(run_overhead, batch)
    tk = timed_fetch(run_pipeline, batch)
    per_iter = max((tk - t0) / K, 1e-9)

    pps = N / per_iter
    print(json.dumps({
        "metric": "transform_voxelize_exact_throughput",
        "value": round(pps / 1e6, 2),
        "unit": "Mpoints/s/chip",
        "vs_baseline": round(pps / TARGET_POINTS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
