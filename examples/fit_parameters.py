"""Large-scale PC-SAFT parameter regression (the reference paper's workload).

Fits pure-component PC-SAFT parameters to synthetic vapor-pressure +
liquid-density data by Adam, data-parallel over all available devices.

Run:  python examples/fit_parameters.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feos_tpu import PcSaftPure
from feos_tpu.parallel.mesh import batch_mesh
from feos_tpu.regression import fit_pure

# ground truth: an associating fluid (README example of the reference)
TRUE = np.array([1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0])

# synthetic "experimental" data
T = jnp.linspace(250.0, 420.0, 64)
eos = PcSaftPure(np.tile(TRUE, (64, 1)))
_, p_sat = eos.vapor_pressure(T)
_, rho_liq = eos.equilibrium_liquid_density(T)

# start from a perturbed guess and fit m, sigma, epsilon_k, kappa_ab, eps_ab
start = TRUE.copy()
start[[0, 1, 2]] = [1.8, 3.3, 235.0]

mesh = batch_mesh() if jax.device_count() > 1 else None
result = fit_pure(
    start,
    T,
    p_sat=p_sat,
    rho_liq=rho_liq,
    pressure=p_sat,  # NPT liquid density at p_sat == saturated liquid density
    steps=int(__import__("os").environ.get("FIT_STEPS", 300)),
    optimizer=optax.adam(optax.exponential_decay(2e-2, 100, 0.5)),
    mesh=mesh,
)

np.set_printoptions(precision=5, suppress=True)
print(f"loss: {result.loss_history[0]:.3e} -> {result.loss_history[-1]:.3e}")
print("fitted:", np.asarray(result.parameters))
print("truth: ", TRUE)
