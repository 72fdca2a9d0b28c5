"""Fit k_ij to two-phase SPLIT data through the differentiable flash.

The reference can only fit to incipient-point pressures (bubble/dew);
with ``flash(..., gradients=True)`` the loss can target what a
separator actually measures — the coexisting phase COMPOSITIONS at
given (T, p, z) — because x/y/beta carry exact implicit-function-theorem
derivatives w.r.t. k_ij (solvers/flash.py::flash_implicit_gradients).

Synthetic ground truth at k_ij = -0.1; the fit starts at 0 and recovers
it from x/y data alone (no pressures in the loss).

Run:  python examples/fit_flash_kij.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from feos_tpu.models.pcsaft_mix import flash, static_branches

COMPONENTS = np.array(
    [[1.0, 3.5, 150.0, 0, 0, 0, 0, 0], [1.0, 3.5, 200.0, 0, 0, 0, 0, 0]]
)
KIJ_TRUE = -0.1

# synthetic "experimental" splits over a (T, z) grid at mid-window p
B = 24
T = np.linspace(142.0, 158.0, B)
Z1 = np.tile(np.linspace(0.3, 0.7, 6), 4)
BR = static_branches(COMPONENTS[None])
PARAMS = np.tile(COMPONENTS, (B, 1, 1))


def run_flash(kij_scalar, pressure):
    kij = jnp.stack(
        [jnp.full((B,), kij_scalar), jnp.zeros((B,))], axis=-1
    )
    return flash(PARAMS, kij, T, Z1, pressure, branches=BR, gradients=True)


# pick pressures inside the true-kij two-phase window
from feos_tpu.models.pcsaft_mix import bubble_point, dew_point

p_bub, nb = bubble_point(
    PARAMS, np.tile([KIJ_TRUE, 0.0], (B, 1)), T, Z1, np.full(B, 1e5),
    branches=BR,
)
p_dew, nd = dew_point(
    PARAMS, np.tile([KIJ_TRUE, 0.0], (B, 1)), T, Z1, np.full(B, 1e5),
    branches=BR,
)
assert not (np.asarray(nb).any() or np.asarray(nd).any())
P = np.sqrt(np.asarray(p_bub) * np.asarray(p_dew))

beta_t, x_t, y_t, rho_t, phase_t = run_flash(KIJ_TRUE, P)
assert np.all(np.asarray(phase_t) == 2)
x_exp = jax.lax.stop_gradient(x_t)
y_exp = jax.lax.stop_gradient(y_t)


@jax.jit
def loss_fn(kij_scalar):
    beta, x, y, rho, phase = run_flash(kij_scalar, P)
    ok = (phase == 2)[:, None]
    # masked-loss pattern: substitute the TARGET on non-two-phase rows
    # BEFORE squaring, so those rows contribute exactly zero residual AND
    # zero gradient.  (Masking after the square — where(ok, se, 0) — is a
    # NaN trap: a row that leaves the two-phase window mid-optimization
    # carries NaN fillers, and reverse-mode 0 * NaN poisons the whole
    # gradient.)
    xs = jnp.where(ok, x, x_exp)
    ys = jnp.where(ok, y, y_exp)
    se = (xs - x_exp) ** 2 + (ys - y_exp) ** 2
    return jnp.sum(se) / jnp.maximum(jnp.sum(ok), 1)


opt = optax.adam(optax.exponential_decay(2e-2, 30, 0.3))
kij = jnp.asarray(0.0)
state = opt.init(kij)
l0 = None
for step in range(100):
    val, g = jax.value_and_grad(loss_fn)(kij)
    l0 = val if l0 is None else l0
    upd, state = opt.update(g, state)
    kij = optax.apply_updates(kij, upd)

print(f"fitted k_ij = {float(kij):+.6f}  (true {KIJ_TRUE:+.4f})")
print(f"loss: {float(l0):.3e} -> {float(loss_fn(kij)):.3e}")
assert abs(float(kij) - KIJ_TRUE) < 5e-3
