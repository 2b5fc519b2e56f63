"""Profiling helpers: jax profiler traces + roofline accounting.

Usage::

    with trace("/tmp/pasture-trace"):
        out = pipeline(batch)
        jax.block_until_ready(out)

    est = roofline_estimate(num_points=4<<20, bytes_per_point=15,
                            flops_per_point=30)
    print(est)
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional

import jax

__all__ = ["trace", "roofline_estimate", "RooflineEstimate"]

#: per-chip peak numbers used for speed-of-light accounting (TPU v5e)
V5E_HBM_BW = 819e9          # bytes/s
V5E_BF16_FLOPS = 394e12     # FLOP/s (bf16 MXU)
V5E_F32_FLOPS = 197e12


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax profiler trace context (view with TensorBoard/xprof)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class RooflineEstimate:
    hbm_bound_s: float
    compute_bound_s: float

    @property
    def speed_of_light_s(self) -> float:
        return max(self.hbm_bound_s, self.compute_bound_s)

    @property
    def bound(self) -> str:
        return ("HBM" if self.hbm_bound_s >= self.compute_bound_s
                else "compute")

    def __repr__(self) -> str:
        return (f"RooflineEstimate({self.bound}-bound, "
                f"SoL={self.speed_of_light_s * 1e3:.3f} ms)")


def roofline_estimate(num_points: int, bytes_per_point: float,
                      flops_per_point: float = 0.0,
                      hbm_bw: float = V5E_HBM_BW,
                      peak_flops: float = V5E_F32_FLOPS) -> RooflineEstimate:
    """Speed-of-light estimate for a per-point kernel on one chip."""
    return RooflineEstimate(
        hbm_bound_s=num_points * bytes_per_point / hbm_bw,
        compute_bound_s=num_points * flops_per_point / peak_flops)
