"""Auxiliary subsystems: profiling, checkpointing, logging.

The reference has none of these (SURVEY.md §5 — no tracing, no
checkpoint/resume); they are greenfield requirements of a production
framework and live here.
"""

from .profiling import trace, roofline_estimate  # noqa: F401
from .checkpoint import load_pytree, save_pytree  # noqa: F401
