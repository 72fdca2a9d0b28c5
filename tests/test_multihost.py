"""True multi-process mesh test (2 processes, localhost coordinator).

The single-process tests exercise the 8-virtual-device mesh inside one
runtime; this one validates the actual ``jax.distributed`` machinery that
multi-host TPU pods use — :func:`feos_tpu.parallel.mesh.initialize_multi_host`
with a real coordinator, a mesh spanning two OS processes, a global sharded
array, and an all-reduce across the process boundary (SURVEY.md section 5,
distributed-communication row).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_allreduce():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers set their own platform/device-count flags
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert "MULTIHOST_OK" in outs[0] and "MULTIHOST_OK" in outs[1]
