"""gc binary segment-parameter regression (k_ab fitting).

Fits the CH3/OH binary segment interaction parameter k_ab of a
heterosegmented gc-PC-SAFT ethanol/butane system to synthetic bubble-point
data by Adam.  Gradients flow through the gc parameter *assembly* (the
dispersion combining-rule bases are built in jnp) and the stationary
bubble-point identity — the reference exposes the same derivative path via
torch (feos_torch/gc_pcsaft.py:60-63) but leaves the training loop to the
user.

Run:  python examples/fit_gc_kab.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import json

import numpy as np

from feos_tpu.models.gc_pcsaft import GcPcSaftMix
from feos_tpu.regression import fit_gc

# segment parameters from the vendored sauer2014 heterosegmented table
FIXTURE = Path(__file__).resolve().parent.parent / "tests" / "sauer2014_hetero.json"
segs = json.loads(FIXTURE.read_text())
IDENT = [r["identifier"] for r in segs]
PARAMETER = tuple(
    np.array([r["model_record"].get(k, 0) for r in segs])
    for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab", "epsilon_k_ab", "na", "nb"]
)

# ethanol (CH3-CH2-OH) / n-butane (CH3-CH2-CH2-CH3)
TOPO_SEGS = [["CH3", "CH2", "OH"], ["CH3", "CH2", "CH2", "CH3"]]
TOPO_BONDS = [[[0, 1], [1, 2]], [[0, 1], [1, 2], [2, 3]]]
KAB_TRUE = -0.05

# synthetic "experimental" bubble points over a (T, x) grid
B = 16
T = np.linspace(300.0, 330.0, B)
x1 = np.tile(np.linspace(0.2, 0.8, 8), 2)

eos = GcPcSaftMix(
    IDENT, PARAMETER, [TOPO_SEGS] * B, [TOPO_BONDS] * B,
    [("CH3", "OH", KAB_TRUE)], None,
)
p_exp, nans = eos.bubble_point(T, x1, np.full(B, 1e5))
assert not np.asarray(nans).any()

result = fit_gc(
    IDENT, PARAMETER, [TOPO_SEGS], [TOPO_BONDS], [("CH3", "OH", 0.0)],
    T, x1, np.asarray(p_exp), steps=100,
)
print(f"fitted k_ab(CH3,OH) = {float(result.parameters[0]):+.6f}  (true {KAB_TRUE:+.4f})")
print(f"loss: {float(result.loss_history[0]):.3e} -> {float(result.loss_history[-1]):.3e}")
