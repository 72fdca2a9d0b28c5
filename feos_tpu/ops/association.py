"""Association site-fraction solvers (cross and induced regimes).

The reference solves these small fixed points with 50-iteration damped
Newton loops whose Jacobians come from ``Dual2`` dual numbers and whose
reverse-mode gradients flow through the unrolled iterations
(feos_torch/pcsaft_mix.py:241-393).  The TPU-native design instead uses
**implicit differentiation** via ``jax.custom_jvp``:

1. the primal solve is a fixed-trip-count ``lax.fori_loop`` of damped
   Newton steps with *analytic* Jacobians.  Converged lanes take
   ~machine-zero steps, so the fixed trip count matches the reference's
   converge-then-freeze behavior (feos_torch/pcsaft_mix.py:271-311,
   damping rule included: negative iterates pulled back to 0.2x the
   previous value).  ``custom_jvp`` guarantees no AD transform ever
   traces *into* the loop — the solve appears exactly once in the HLO no
   matter how many derivative layers are stacked on phi, which is what
   keeps the mixture VLE programs small enough to compile on TPU;
2. tangents come from the implicit-function theorem at the converged
   root:  J(x*, theta) dx = -(df/dtheta) theta_dot, with the 1x1 / 2x2
   linear solve written out in closed form.  The JVP rule recomputes
   ``x*`` by calling the custom function itself and otherwise consists
   of ordinary differentiable primitives, so **higher-order** JVPs (the
   mixture `derivatives` set needs d2/dn dV) recursively reuse the rule
   and stay exact — strictly better than the reference's truncated
   unrolled-iteration gradients.

Residual conventions follow the reference exactly so golden values match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_N_ITER = 30


def _safe(d):
    """Guard a scalar denominator against the sanitized (masked-out) lanes
    where residuals are identically zero."""
    return jnp.where(jnp.abs(d) > 1e-30, d, 1.0)


# ---------------------------------------------------------------------------
# Cross association: two self-associating components, 2 unknowns (XA0, XA1)
# ---------------------------------------------------------------------------


def _cross_residual(xa0, xa1, d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1):
    w0 = 1.0 + xa0 * rhoa0 * d00 + xa1 * rhoa1 * d01
    w1 = 1.0 + xa0 * rhoa0 * d10 + xa1 * rhoa1 * d11
    f0 = xa0 - 1.0 + xa0 / w0 * rhob0 * d00 + xa0 / w1 * rhob1 * d01
    f1 = xa1 - 1.0 + xa1 / w0 * rhob0 * d10 + xa1 / w1 * rhob1 * d11
    return f0, f1


def _cross_jac(xa0, xa1, d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1):
    """Analytic 2x2 Jacobian of the cross residual w.r.t. (xa0, xa1)."""
    w0 = 1.0 + xa0 * rhoa0 * d00 + xa1 * rhoa1 * d01
    w1 = 1.0 + xa0 * rhoa0 * d10 + xa1 * rhoa1 * d11
    q00 = rhob0 * d00 / w0
    q01 = rhob1 * d01 / w1
    q10 = rhob0 * d10 / w0
    q11 = rhob1 * d11 / w1
    j00 = 1.0 + q00 + q01 - xa0 * (q00 / w0 * rhoa0 * d00 + q01 / w1 * rhoa0 * d10)
    j01 = -xa0 * (q00 / w0 * rhoa1 * d01 + q01 / w1 * rhoa1 * d11)
    j10 = -xa1 * (q10 / w0 * rhoa0 * d00 + q11 / w1 * rhoa0 * d10)
    j11 = 1.0 + q10 + q11 - xa1 * (q10 / w0 * rhoa1 * d01 + q11 / w1 * rhoa1 * d11)
    return j00, j01, j10, j11


def _solve22(j00, j01, j10, j11, b0, b1):
    det = _safe(j00 * j11 - j01 * j10)
    return (j11 * b0 - j01 * b1) / det, (-j10 * b0 + j00 * b1) / det


@jax.custom_jvp
def solve_cross_assoc(d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1):
    """Solve the 2-unknown cross-association fixed point for (XA0, XA1).

    Derivatives w.r.t. every input are exact to all orders (implicit
    differentiation, see module docstring).
    """
    args = (d00, d01, d10, d11, rhoa0, rhoa1, rhob0, rhob1)

    def step(_, xs):
        xa0, xa1 = xs
        f0, f1 = _cross_residual(xa0, xa1, *args)
        J = _cross_jac(xa0, xa1, *args)
        dx0, dx1 = _solve22(*J, f0, f1)
        n0, n1 = xa0 - dx0, xa1 - dx1
        # damping (reference feos_torch/pcsaft_mix.py:304-308)
        n0 = jnp.where(n0 < 0.0, 0.2 * xa0, n0)
        n1 = jnp.where(n1 < 0.0, 0.2 * xa1, n1)
        return n0, n1

    x0 = jnp.full_like(d00, 0.2)
    return jax.lax.fori_loop(0, _N_ITER, step, (x0, x0))


@solve_cross_assoc.defjvp
def _solve_cross_assoc_jvp(primals, tangents):
    xa0, xa1 = solve_cross_assoc(*primals)
    # df/dtheta . theta_dot at fixed x (ordinary jvp over the parameters)
    _, (b0, b1) = jax.jvp(
        lambda *th: _cross_residual(xa0, xa1, *th), primals, tangents
    )
    J = _cross_jac(xa0, xa1, *primals)
    dx0, dx1 = _solve22(*J, -b0, -b1)
    return (xa0, xa1), (dx0, dx1)


# ---------------------------------------------------------------------------
# Induced association: one self-associating + one induced component, 1 unknown
# ---------------------------------------------------------------------------


def _induced_residual(xa, d00, d01, d10, d11, na0, na1, nb0, nb1):
    """Reference residual (feos_torch/pcsaft_mix.py:341-359); ``dij`` here
    are Delta_ij * rho_j."""
    xb0_i = 1.0 + xa * (na0 * d00 + na1 * d01)
    xb1_i = 1.0 + xa * (na0 * d10 + na1 * d11)
    f0 = xa * (xb0_i * xb1_i + nb0 * xb1_i * d00 + nb1 * xb0_i * d01) - xb0_i * xb1_i
    f1 = xa * (xb0_i * xb1_i + nb0 * xb1_i * d10 + nb1 * xb0_i * d11) - xb0_i * xb1_i
    return na0 * f0 + na1 * f1


def _induced_dfdx(xa, d00, d01, d10, d11, na0, na1, nb0, nb1):
    """Analytic d(residual)/dXA."""
    c0 = na0 * d00 + na1 * d01
    c1 = na0 * d10 + na1 * d11
    w0 = 1.0 + xa * c0
    w1 = 1.0 + xa * c1
    g0 = w0 * w1 + nb0 * w1 * d00 + nb1 * w0 * d01
    g1 = w0 * w1 + nb0 * w1 * d10 + nb1 * w0 * d11
    dww = c0 * w1 + c1 * w0
    dg0 = dww + nb0 * c1 * d00 + nb1 * c0 * d01
    dg1 = dww + nb0 * c1 * d10 + nb1 * c0 * d11
    return na0 * (g0 + xa * dg0 - dww) + na1 * (g1 + xa * dg1 - dww)


@jax.custom_jvp
def solve_induced_assoc(d00, d01, d10, d11, na0, na1, nb0, nb1):
    """Solve the 1-unknown induced-association fixed point for XA
    (``dij`` are Delta_ij * rho_j); implicit differentiation."""
    args = (d00, d01, d10, d11, na0, na1, nb0, nb1)

    def step(_, xa):
        f = _induced_residual(xa, *args)
        df = _safe(_induced_dfdx(xa, *args))
        new = xa - f / df
        return jnp.where(new < 0.0, 0.2 * xa, new)

    return jax.lax.fori_loop(0, _N_ITER, step, jnp.full_like(d00, 0.2))


@solve_induced_assoc.defjvp
def _solve_induced_assoc_jvp(primals, tangents):
    xa = solve_induced_assoc(*primals)
    _, b = jax.jvp(lambda *th: _induced_residual(xa, *th), primals, tangents)
    df = _safe(_induced_dfdx(xa, *primals))
    return xa, -b / df


# ---------------------------------------------------------------------------
# gc cross association, hardcoded nA = nB = 1 (two unknowns)
# ---------------------------------------------------------------------------


def _cross_sym_residual(xa0, xa1, d00, d01, d10, d11):
    """gc cross-association residual, hardcoded nA = nB = 1
    (reference feos_torch/gc_pcsaft.py:360-377); dij = Delta_ij * rho_j."""
    f0 = xa0 + xa0 * xa0 * d00 + xa0 * xa1 * d01 - 1.0
    f1 = xa1 + xa1 * xa0 * d10 + xa1 * xa1 * d11 - 1.0
    return f0, f1


def _cross_sym_jac(xa0, xa1, d00, d01, d10, d11):
    j00 = 1.0 + 2.0 * xa0 * d00 + xa1 * d01
    j01 = xa0 * d01
    j10 = xa1 * d10
    j11 = 1.0 + xa0 * d10 + 2.0 * xa1 * d11
    return j00, j01, j10, j11


@jax.custom_jvp
def solve_cross_assoc_sym(d00, d01, d10, d11):
    """Solve the gc cross-association fixed point (nA = nB = 1) for
    (XA0, XA1); ``dij`` are Delta_ij * rho_j; implicit differentiation."""
    args = (d00, d01, d10, d11)

    def step(_, xs):
        xa0, xa1 = xs
        f0, f1 = _cross_sym_residual(xa0, xa1, *args)
        J = _cross_sym_jac(xa0, xa1, *args)
        dx0, dx1 = _solve22(*J, f0, f1)
        n0, n1 = xa0 - dx0, xa1 - dx1
        n0 = jnp.where(n0 < 0.0, 0.2 * xa0, n0)
        n1 = jnp.where(n1 < 0.0, 0.2 * xa1, n1)
        return n0, n1

    x0 = jnp.full_like(d00, 0.2)
    return jax.lax.fori_loop(0, _N_ITER, step, (x0, x0))


@solve_cross_assoc_sym.defjvp
def _solve_cross_assoc_sym_jvp(primals, tangents):
    xa0, xa1 = solve_cross_assoc_sym(*primals)
    _, (b0, b1) = jax.jvp(
        lambda *th: _cross_sym_residual(xa0, xa1, *th), primals, tangents
    )
    J = _cross_sym_jac(xa0, xa1, *primals)
    dx0, dx1 = _solve22(*J, -b0, -b1)
    return (xa0, xa1), (dx0, dx1)
