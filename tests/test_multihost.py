"""True multi-process multihost test: 2 OS processes, one global mesh.

Spawns tests/multihost_worker.py twice (jax.distributed coordinator on a
free localhost port, 4 virtual CPU devices per process -> 8 global) and
asserts both processes complete the full distributed pipeline and agree on
the ICP solution.  This is the correctness half of the multi-host scaling
target (BASELINE.md): the same ``initialize_multihost``/``global_mesh``
entry points run unchanged on real multi-host TPU slices.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = pathlib.Path(__file__).parent / "multihost_worker.py"
_REPO = pathlib.Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_runs_distributed_pipeline():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    env["PYTHONPATH"] = str(_REPO)

    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), f"localhost:{port}", "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(_REPO))
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))

    oks = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        ok_lines = [ln for ln in out.splitlines()
                    if ln.startswith("MULTIHOST_OK")]
        assert ok_lines, f"process {i} printed no MULTIHOST_OK:\n{out}"
        oks.append(ok_lines[0])
    # replicated result: both processes must report the same solution
    assert oks[0] == oks[1], oks
