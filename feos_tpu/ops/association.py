"""Association site-fraction solvers (cross and induced regimes).

The reference solves these small fixed points with 50-iteration damped
Newton loops whose Jacobians come from ``Dual2`` dual numbers and whose
reverse-mode gradients flow through the unrolled iterations
(feos_torch/pcsaft_mix.py:241-393).  The TPU-native design instead:

1. solves the fixed point with a fixed-trip-count ``lax.fori_loop`` of
   damped Newton steps with *analytic* Jacobians on ``stop_gradient``-ed
   inputs.  The stopped inputs keep the loop out of every AD transform
   (it stays a compact primal HLO loop no matter how many derivative
   layers are stacked on phi), and the analytic Jacobian keeps the body
   small.  Converged lanes take ~machine-zero steps, so the fixed trip
   count matches the reference's converge-then-freeze behavior
   (feos_torch/pcsaft_mix.py:271-311, damping rule included: negative
   iterates pulled back to 0.2x the previous value);
2. re-attaches derivatives with ``_REATTACH_STEPS`` symbolic Newton steps
   on the *differentiable* residual.  k steps make derivatives of the
   result exact to order k (the dNewton/dx factor vanishes at the root);
   k = 3 covers the worst case used downstream:
   d(user params) . d(n_i) . d(V) in ``bubble_point`` gradients.

Residual conventions follow the reference exactly so golden values match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_N_ITER = 30
_REATTACH_STEPS = 3


def _cross_residual(xa, d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1):
    xa0, xa1 = xa[0], xa[1]
    w0 = 1.0 + xa0 * rhoa0 * d00 + xa1 * rhoa1 * d01
    w1 = 1.0 + xa0 * rhoa0 * d10 + xa1 * rhoa1 * d11
    f0 = xa0 - 1.0 + xa0 / w0 * rhob0 * d00 + xa0 / w1 * rhob1 * d01
    f1 = xa1 - 1.0 + xa1 / w0 * rhob0 * d10 + xa1 / w1 * rhob1 * d11
    return jnp.stack([f0, f1])


def _cross_step(xa0, xa1, d00, d01, d10, d11, A0, A1, B0, B1):
    """One damped Newton step with the analytic 2x2 Jacobian."""
    w0 = 1.0 + xa0 * A0 * d00 + xa1 * A1 * d01
    w1 = 1.0 + xa0 * A0 * d10 + xa1 * A1 * d11
    q00 = B0 * d00 / w0
    q01 = B1 * d01 / w1
    q10 = B0 * d10 / w0
    q11 = B1 * d11 / w1
    f0 = xa0 - 1.0 + xa0 * (q00 + q01)
    f1 = xa1 - 1.0 + xa1 * (q10 + q11)
    j00 = 1.0 + q00 + q01 - xa0 * (q00 / w0 * A0 * d00 + q01 / w1 * A0 * d10)
    j01 = -xa0 * (q00 / w0 * A1 * d01 + q01 / w1 * A1 * d11)
    j10 = -xa1 * (q10 / w0 * A0 * d00 + q11 / w1 * A0 * d10)
    j11 = 1.0 + q10 + q11 - xa1 * (q10 / w0 * A1 * d01 + q11 / w1 * A1 * d11)
    det = j00 * j11 - j01 * j10
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    n0 = xa0 - (j11 * f0 - j01 * f1) / det
    n1 = xa1 - (-j10 * f0 + j00 * f1) / det
    # damping (reference feos_torch/pcsaft_mix.py:304-308)
    n0 = jnp.where(n0 < 0.0, 0.2 * xa0, n0)
    n1 = jnp.where(n1 < 0.0, 0.2 * xa1, n1)
    return n0, n1


def solve_cross_assoc(d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1):
    """Solve the 2-unknown cross-association fixed point for (XA0, XA1).

    Returns the site fractions with derivatives re-attached (exact to 3rd
    order) w.r.t. every input.
    """
    args = (d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1)
    s = tuple(jax.lax.stop_gradient(a) for a in args)

    xa0 = jnp.full_like(s[0], 0.2)
    xa1 = jnp.full_like(s[0], 0.2)
    xa0, xa1 = jax.lax.fori_loop(
        0, _N_ITER, lambda _, xs: _cross_step(xs[0], xs[1], *s), (xa0, xa1)
    )

    # differentiable re-attachment
    xa = jnp.stack([jax.lax.stop_gradient(xa0), jax.lax.stop_gradient(xa1)])

    def residual(x):
        return _cross_residual(x, *args)

    for _ in range(_REATTACH_STEPS):
        f = residual(xa)
        J = jax.jacfwd(residual)(xa)
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        # guard against det = 0 on sanitized (masked-out) lanes; real cross
        # rows have det ~ 1 + O(delta) > 0
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        dx0 = (J[1, 1] * f[0] - J[0, 1] * f[1]) / det
        dx1 = (-J[1, 0] * f[0] + J[0, 0] * f[1]) / det
        xa = xa - jnp.stack([dx0, dx1])
    return xa[0], xa[1]


def _induced_residual(xa, d00, d01, d10, d11, na0, na1, nb0, nb1):
    xb0_i = 1.0 + xa * (na0 * d00 + na1 * d01)
    xb1_i = 1.0 + xa * (na0 * d10 + na1 * d11)
    f0 = xa * (xb0_i * xb1_i + nb0 * xb1_i * d00 + nb1 * xb0_i * d01) - xb0_i * xb1_i
    f1 = xa * (xb0_i * xb1_i + nb0 * xb1_i * d10 + nb1 * xb0_i * d11) - xb0_i * xb1_i
    return na0 * f0 + na1 * f1


def _induced_step(xa, d00, d01, d10, d11, na0, na1, nb0, nb1):
    """One damped Newton step with the analytic derivative."""
    c0 = na0 * d00 + na1 * d01
    c1 = na0 * d10 + na1 * d11
    w0 = 1.0 + xa * c0
    w1 = 1.0 + xa * c1
    g0 = w0 * w1 + nb0 * w1 * d00 + nb1 * w0 * d01
    g1 = w0 * w1 + nb0 * w1 * d10 + nb1 * w0 * d11
    f = na0 * (xa * g0 - w0 * w1) + na1 * (xa * g1 - w0 * w1)
    dww = c0 * w1 + c1 * w0  # d(w0 w1)/dxa
    dg0 = dww + nb0 * c1 * d00 + nb1 * c0 * d01
    dg1 = dww + nb0 * c1 * d10 + nb1 * c0 * d11
    df = na0 * (g0 + xa * dg0 - dww) + na1 * (g1 + xa * dg1 - dww)
    df = jnp.where(jnp.abs(df) > 1e-30, df, 1.0)
    new = xa - f / df
    return jnp.where(new < 0.0, 0.2 * xa, new)


def solve_induced_assoc(d00, d01, d10, d11, na0, na1, nb0, nb1):
    """Solve the 1-unknown induced-association fixed point for XA.

    ``dij`` here are Delta_ij * rho_j (reference feos_torch/pcsaft_mix.py:341-359).
    """
    args = (d00, d01, d10, d11, na0, na1, nb0, nb1)
    s = tuple(jax.lax.stop_gradient(a) for a in args)

    xa = jnp.full_like(s[0], 0.2)
    xa = jax.lax.fori_loop(0, _N_ITER, lambda _, x: _induced_step(x, *s), xa)

    xa = jax.lax.stop_gradient(xa)
    for _ in range(_REATTACH_STEPS):
        f, df = jax.jvp(
            lambda x: _induced_residual(x, *args), (xa,), (jnp.ones_like(xa),)
        )
        # guard: on sanitized lanes (all site counts zero) f and df are both
        # identically zero and the step must be a no-op, not 0/0
        df = jnp.where(jnp.abs(df) > 1e-30, df, 1.0)
        xa = xa - f / df
    return xa


def _cross_sym_residual(xa, d00, d01, d10, d11):
    """gc cross-association residual, hardcoded nA = nB = 1
    (reference feos_torch/gc_pcsaft.py:360-377); dij = Delta_ij * rho_j."""
    xa0, xa1 = xa[0], xa[1]
    f0 = xa0 + xa0 * xa0 * d00 + xa0 * xa1 * d01 - 1.0
    f1 = xa1 + xa1 * xa0 * d10 + xa1 * xa1 * d11 - 1.0
    return jnp.stack([f0, f1])


def _cross_sym_step(xa0, xa1, d00, d01, d10, d11):
    f0 = xa0 + xa0 * xa0 * d00 + xa0 * xa1 * d01 - 1.0
    f1 = xa1 + xa1 * xa0 * d10 + xa1 * xa1 * d11 - 1.0
    j00 = 1.0 + 2.0 * xa0 * d00 + xa1 * d01
    j01 = xa0 * d01
    j10 = xa1 * d10
    j11 = 1.0 + xa0 * d10 + 2.0 * xa1 * d11
    det = j00 * j11 - j01 * j10
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    n0 = xa0 - (j11 * f0 - j01 * f1) / det
    n1 = xa1 - (-j10 * f0 + j00 * f1) / det
    n0 = jnp.where(n0 < 0.0, 0.2 * xa0, n0)
    n1 = jnp.where(n1 < 0.0, 0.2 * xa1, n1)
    return n0, n1


def solve_cross_assoc_sym(d00, d01, d10, d11):
    """Solve the gc cross-association fixed point (nA = nB = 1) for (XA0, XA1)
    with derivative re-attachment; ``dij`` are Delta_ij * rho_j."""
    args = (d00, d01, d10, d11)
    s = tuple(jax.lax.stop_gradient(a) for a in args)

    xa0 = jnp.full_like(s[0], 0.2)
    xa1 = jnp.full_like(s[0], 0.2)
    xa0, xa1 = jax.lax.fori_loop(
        0, _N_ITER, lambda _, xs: _cross_sym_step(xs[0], xs[1], *s), (xa0, xa1)
    )

    xa = jnp.stack([jax.lax.stop_gradient(xa0), jax.lax.stop_gradient(xa1)])

    def residual(x):
        return _cross_sym_residual(x, *args)

    for _ in range(_REATTACH_STEPS):
        f = residual(xa)
        J = jax.jacfwd(residual)(xa)
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        dx0 = (J[1, 1] * f[0] - J[0, 1] * f[1]) / det
        dx1 = (-J[1, 0] * f[0] + J[0, 0] * f[1]) / det
        xa = xa - jnp.stack([dx0, dx1])
    return xa[0], xa[1]
