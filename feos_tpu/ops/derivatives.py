"""Derivative machinery: JAX transforms replacing the reference's hand-rolled
hyper-dual numbers.

The reference implements three AD primitives on top of torch tensors
(reference feos_torch/dual.py:5 ``Dual3``, feos_torch/dual_torch.py:4
``DualTensor``, feos_torch/dual_torch.py:165 ``Dual2``).  On TPU we get all
of them from composable JAX transforms:

* ``Dual3`` (value + d/drho + d2/drho2 of a scalar function)
  -> :func:`value_and_2derivs` via nested ``jax.jvp``.
* ``DualTensor`` (A, dA/dn_i, dA/dV, d2A/dn_i dV, d2A/dV2 in one sweep)
  -> :func:`state_derivatives` via forward-over-reverse
  (``jax.jvp`` of ``jax.grad``), which computes exactly the directional
  second derivatives the reference materializes — no full Hessian.
* ``Dual2`` (Jacobians of the 1-/2-unknown association fixed points)
  -> closed-form 2x2 solves in :mod:`feos_tpu.ops.association` (no dual
  arithmetic needed because the residuals are written in JAX and
  differentiated with ``jax.jacfwd`` where required).

All functions here are written for *unbatched* (per-item) inputs and are
designed to be ``jax.vmap``-ed over the batch axis — the TPU-native
equivalent of the reference's hand-broadcast batched dual tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def value_and_2derivs(f, x):
    """Return ``(f(x), f'(x), f''(x))`` for a scalar->scalar function.

    Replaces the reference's second-order dual number ``Dual3.diff``
    (feos_torch/dual.py:11), used for the pressure and compressibility
    expressions p~ = rho - phi + rho*phi', dp~/drho = 1 + rho*phi''
    (feos_torch/pcsaft_pure.py:180-182).
    """
    one = jnp.ones_like(x)

    def df(y):
        return jax.jvp(f, (y,), (one,))

    (val, d1), (_, d2) = jax.jvp(df, (x,), (one,))
    return val, d1, d2


def state_derivatives(phi_fn, rho):
    """First- and mixed-second derivatives of A(n, V) = phi(n/V) * V at V=1.

    ``phi_fn`` maps a partial-density vector (n,) to the reduced Helmholtz
    energy density phi = A/(kB T V) (a scalar).  Returns the tuple

        (A, mu, A_V, A_nV, A_VV)

    where ``mu[i] = dA/dn_i`` (residual reduced chemical potentials),
    ``A_V = dA/dV``, ``A_nV[i] = d2A/dn_i dV`` and ``A_VV = d2A/dV2``,
    all evaluated at n = rho, V = 1.

    This is the exact derivative set the reference materializes with its
    batched hyper-dual ``DualTensor`` (feos_torch/pcsaft_mix.py:395-420):
    eps1 = (mu, A_V), eps2-direction = V, eps1eps2 = (A_nV, A_VV).

    Implementation is forward-mode only (a vmapped jvp for the gradient and
    one more jvp along the V direction for the mixed second derivatives):
    reverse-mode through the association solvers produces HLO that XLA
    compiles far more slowly at identical values.
    """
    rho = jnp.asarray(rho)
    n = rho.shape[0]

    def A(u):  # u = [n_1..n_n, V]
        return phi_fn(u[:n] / u[n]) * u[n]

    u0 = jnp.concatenate([rho, jnp.ones((1,), rho.dtype)])
    eye = jnp.eye(n + 1, dtype=rho.dtype)

    def G(u):  # value + full gradient, one batched tangent graph
        vals, tangs = jax.vmap(lambda v: jax.jvp(A, (u,), (v,)))(eye)
        return vals[0], tangs

    (val, grad), (_, grad_V) = jax.jvp(G, (u0,), (eye[n],))
    return val, grad[:n], grad[n], grad_V[:n], grad_V[n]


def pressure_set(phi_fn, rho):
    """(A, p~, mu, v) for a mixture state — reference ``derivatives``.

    Mirrors feos_torch/pcsaft_mix.py:395-420 / gc_pcsaft.py:443-468:

        p~  = sum(rho) - dA/dV
        mu_i = dA/dn_i                      (residual, reduced)
        v_i  = -(1 - d2A/dn_i dV) / (-sum(rho) - d2A/dV2)

    ``v_i`` are reduced partial molar volumes.
    """
    val, mu, A_V, A_nV, A_VV = state_derivatives(phi_fn, rho)
    rho_tot = jnp.sum(rho)
    p = rho_tot - A_V
    v = -(1.0 - A_nV) / (-rho_tot - A_VV)
    return val, p, mu, v


def newton_reattach_1d(residual_fn, x_star, n_steps: int = 1):
    """Differentiably re-attach a converged scalar root to its parameters.

    ``x_star`` is a solver output treated as a constant
    (``stop_gradient``-ed); ``residual_fn`` is the differentiable residual
    whose root x(theta) satisfies residual_fn(x, theta) = 0.  Applying ``k``
    symbolic Newton steps

        x <- x - residual(x) / residual'(x)

    at the converged point leaves the value unchanged (residual ~ 0) but
    makes derivatives of the result w.r.t. any parameters inside
    ``residual_fn`` exact up to order ``k`` (implicit-function theorem;
    the d(Newton)/dx factor vanishes at the root).  This is the JAX-native
    generalization of the reference's single re-attachment step
    (feos_torch/pcsaft_pure.py:196-199).
    """
    x = jax.lax.stop_gradient(x_star)
    for _ in range(n_steps):
        r, dr = jax.jvp(residual_fn, (x,), (jnp.ones_like(x),))
        x = x - r / dr
    return x

