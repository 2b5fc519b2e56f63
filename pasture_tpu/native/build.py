"""Build helper for the native extension(s).

Compiles ``src/laszip.cpp`` into ``_laszip.so`` next to this module on
first use (single translation unit, ~1s with g++ -O2).  The .so is loaded
via ctypes — no pybind11 required.
"""

from __future__ import annotations

import os
import subprocess
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_LOCK = threading.Lock()


def ensure_laszip() -> Path:
    """Compile (if stale) and return the path of the laszip shared object."""
    src = _HERE / "src" / "laszip.cpp"
    so = _HERE / "_laszip.so"
    with _LOCK:
        if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
            return so
        tmp = so.with_suffix(".so.tmp")
        cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
               "-fPIC", "-pthread", str(src), "-o", str(tmp)]
        try:
            subprocess.run(cmd, check=True, capture_output=True, text=True)
        except FileNotFoundError:
            raise RuntimeError("g++ not available; cannot build the native "
                               "laszip codec") from None
        except subprocess.CalledProcessError as e:
            raise RuntimeError(f"laszip build failed:\n{e.stderr}") from None
        os.replace(tmp, so)
        return so
