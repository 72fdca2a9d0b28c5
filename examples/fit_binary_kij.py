"""Binary interaction-parameter regression (the companion paper's workload).

Fits k_ij of a binary PC-SAFT mixture to synthetic bubble-point data by
Adam, with parameter gradients through the stationary bubble-point
identity (no solver unrolling).  The reference's users do this with
torch.optim over ``PcSaftMix.bubble_point`` (reference README.md:42-56);
here it is a first-class loop.

Run:  python examples/fit_binary_kij.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from feos_tpu.models.pcsaft_mix import bubble_point, static_branches
from feos_tpu.regression import fit_binary

# two non-associating components; ground-truth interaction parameter
COMPONENTS = np.array(
    [[1.0, 3.5, 150.0, 0, 0, 0, 0, 0], [1.0, 3.5, 200.0, 0, 0, 0, 0, 0]]
)
KIJ_TRUE = -0.1

# synthetic "experimental" bubble points over a (T, x) grid
B = 32
T = np.linspace(140.0, 160.0, B)
x1 = np.tile(np.linspace(0.2, 0.8, 8), 4)
branches = static_branches(COMPONENTS[None])
p_exp, nans = jax.jit(lambda *a: bubble_point(*a, branches=branches))(
    np.tile(COMPONENTS, (B, 1, 1)), np.tile([KIJ_TRUE, 0.0], (B, 1)),
    T, x1, np.full(B, 1e5),
)
assert not np.asarray(nans).any()

result = fit_binary(COMPONENTS, T, x1, np.asarray(p_exp), kij0=0.0, steps=100)
print(f"fitted k_ij = {float(result.parameters[0]):+.6f}  (true {KIJ_TRUE:+.4f})")
print(f"loss: {float(result.loss_history[0]):.3e} -> {float(result.loss_history[-1]):.3e}")
