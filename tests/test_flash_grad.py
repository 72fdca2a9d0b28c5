"""Implicit-function gradients of the isothermal flash (``gradients=True``).

The actual checks live in ``tests/_flash_grad_checks.py`` and run in a
FRESH child interpreter with the persistent compilation cache disabled:
compiling/caching these graphs (jacfwd over the nested flash/incipient
pjits) inside a long-lived pytest process nondeterministically
segfaults/aborts the process inside the compilation cache's executable
(de)serialization under the sandbox's remote-compile relay — observed
in 4 of 5 full-suite runs, always at this module's graphs, never in a
fresh standalone process.  See the child module's docstring for the
validation content (binary phase-rule anchors, FD-vs-AD for kij /
epsilon_k / p / T, primal-identity, gc path).
"""

import os
import subprocess
import sys
from pathlib import Path

_CHILD = Path(__file__).parent / "_flash_grad_checks.py"


def test_flash_gradients_in_child_process():
    env = dict(os.environ)
    # the child sets its own platform/flags; make sure no inherited
    # persistent-cache setting leaks in
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    proc = subprocess.run(
        [sys.executable, str(_CHILD)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3000,
    )
    assert proc.returncode == 0 and "ALL-OK" in proc.stdout, (
        f"child failed (rc={proc.returncode})\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}"
    )
