"""Binary-mixture PC-SAFT: Helmholtz energy density, derivatives, bubble/dew.

TPU-native re-design of the reference's homosegmented mixture model
(``feos_torch/pcsaft_mix.py``).  Structural differences:

* per-item pure functions over a static component axis (n = 2), ``vmap``-ed
  over the batch;
* the dipolar and three association regimes are computed on *all* rows with
  sanitized inputs and combined with ``jnp.where`` masks — static shapes —
  instead of the reference's dynamic boolean row subsetting
  (``phi[dipolar, :] +=``, feos_torch/pcsaft_mix.py:111-152; SURVEY.md 3.5);
* the full derivative set (A, p~, mu_i, v_i) comes from forward-over-reverse
  AD (:func:`feos_tpu.ops.derivatives.pressure_set`) instead of the
  hand-rolled ``DualTensor`` (feos_torch/dual_torch.py:4);
* the association inner fixed points are solved under ``stop_gradient``
  with exact derivative re-attachment (:mod:`feos_tpu.ops.association`)
  instead of backpropagating through 50 unrolled damped Newton iterations
  (feos_torch/pcsaft_mix.py:271-311);
* bubble/dew solvers are batched JAX Newton iterations
  (:func:`feos_tpu.solvers.vle.mix_vle`) replacing the Rust backend
  (src/pcsaft.rs:150-214), with gradients re-attached through the
  stationary mixture identity (feos_torch/pcsaft_mix.py:435-443).

Parameter layout per component: ``[m, sigma, epsilon_k, mu, kappa_ab,
epsilon_k_ab, na, nb]``; binary interaction ``kij = [k_ij, epsilon_k_AiBj]``
(reference feos_torch/pcsaft_mix.py:13-29, src/pcsaft.rs:163).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import A0, A1, A2, B0, B1, B2
from ..ops.association import solve_cross_assoc, solve_induced_assoc
from ..ops.derivatives import pressure_set
from ..units import MU2_FACTOR, PA_PER_KT_TO_REDUCED, REDUCED_TO_PA_PER_KT
from .common import (
    DipolePre,
    assoc_strength_from_tfactor,
    assoc_strength_tfactor,
    exp_full,
    phi_dipole_pre,
    precompute_dipole,
    site_fraction_free_energy,
)

PI = np.pi


class MixParams(NamedTuple):
    """Per-item mixture parameters; each field has shape (n,)."""

    m: jnp.ndarray
    sigma: jnp.ndarray
    epsilon_k: jnp.ndarray
    mu: jnp.ndarray
    kappa_ab: jnp.ndarray
    epsilon_k_ab: jnp.ndarray
    na: jnp.ndarray
    nb: jnp.ndarray

    @classmethod
    def from_array(cls, parameters):
        parameters = jnp.asarray(parameters, dtype=jnp.float64)
        return cls(*[parameters[..., i] for i in range(8)])


class MixPre(NamedTuple):
    """Density-independent mixture quantities at fixed (parameters, kij, T).

    Everything in :func:`phi_mix` that does not depend on the densities —
    the T-dependent segment diameters, the (n, n) dispersion combining-rule
    matrices (with 1/T and 1/T^2 folded in), the dipole coefficient block
    and the association T-factors (each hiding exp/sqrt, expensive under
    emulated f64) — computed ONCE per solve by :func:`precompute_mix` and
    shared by every phi evaluation inside the Newton loops (explicit
    hoisting; XLA's loop-invariant code motion does not reliably do this
    through the f64-emulation expansion).
    """

    m: jnp.ndarray        # (n,)
    na: jnp.ndarray       # (n,)
    nb: jnp.ndarray       # (n,)
    md1: jnp.ndarray      # (n,) m * d
    md2: jnp.ndarray      # (n,) m * d^2
    md3: jnp.ndarray      # (n,) m * d^3
    d: jnp.ndarray        # (n,)
    e1: jnp.ndarray       # (n, n) m_i m_j eps_ij/T sigma_ij^3 (kij applied)
    e2: jnp.ndarray       # (n, n) e1 * eps_ij/T
    dip: DipolePre
    dipolar: jnp.ndarray  # bool: any mu2 > 0
    self_st: jnp.ndarray  # sigma_a^3 kappa (exp(eps_ab/T)-1), sanitized
    self_da: jnp.ndarray  # associating diameter d_a, sanitized
    cross_t: jnp.ndarray  # (n, n) T-factors with eps_AiBj override
    ind_t: jnp.ndarray    # (n, n) plain T-factors (induced regime)
    dd: jnp.ndarray       # (n, n) d_i d_j / (d_i + d_j)
    self_m: jnp.ndarray   # bool regime masks (parameter-only)
    cross_m: jnp.ndarray
    induced_m: jnp.ndarray


def precompute_mix(p: MixParams, kij, epsilon_k_aibj, temperature) -> MixPre:
    """Build :class:`MixPre` (per item); all ops are plain jnp so parameter
    and temperature gradients flow through unchanged.  The working dtype
    follows the inputs (the solvers build an f32 instance for warmup)."""
    m, sigma, epsilon_k = p.m, p.sigma, p.epsilon_k
    n = m.shape[0]

    d = sigma * (1.0 - 0.12 * jnp.exp(-3.0 * epsilon_k / temperature))

    # dispersion combining rules with kij; 1/T and 1/T^2 folded in
    eps_t = jnp.sqrt(epsilon_k[:, None] * epsilon_k[None, :]) / temperature
    offdiag = jnp.asarray(1.0 - np.eye(n), dtype=d.dtype)
    eps_t = eps_t * (1.0 - kij * offdiag)
    sigma_ij3 = (0.5 * (sigma[:, None] + sigma[None, :])) ** 3
    e1 = (m[:, None] * m[None, :]) * eps_t * sigma_ij3
    e2 = e1 * eps_t

    # dipole
    mu2 = p.mu**2 / (m * sigma**3 * epsilon_k) * MU2_FACTOR
    dipolar = jnp.any(mu2 > 0.0)
    mu2_scaled = sigma**3 * epsilon_k * mu2
    dip = precompute_dipole(m, sigma, epsilon_k, mu2_scaled, temperature)

    # association regime masks (parameter-only, rho-free)
    n_assoc = jnp.count_nonzero(p.na + p.nb)
    n_self = jnp.count_nonzero(p.na * p.nb)
    self_m = (n_assoc == 1) & (n_self == 1)
    cross_m = (n_assoc == 2) & (n_self == 2)
    induced_m = (n_assoc == 2) & (n_self == 1)

    # self regime: single associating component, aggregated sites
    # (sanitized on masked lanes so sqrt/exp gradients stay finite)
    kappa_s = jnp.where(self_m, jnp.sum(p.kappa_ab), 1.0)
    eps_ab_s = jnp.sum(p.epsilon_k_ab)
    na_sum = jnp.where(self_m, jnp.sum(p.na), 1.0)
    sigma_a = jnp.where(self_m, jnp.sum(p.na * sigma) / na_sum, 1.0)
    self_da = jnp.where(self_m, jnp.sum(p.na * d) / na_sum, 1.0)
    self_st = (
        sigma_a**3 * kappa_s * (exp_full(eps_ab_s / temperature) - 1.0)
    )

    # cross / induced regimes: pairwise T-factors
    kappa_c = jnp.where(cross_m, p.kappa_ab, 1.0)
    kappa_i = jnp.where(induced_m, p.kappa_ab, 1.0)
    cross_t = jnp.stack(
        [
            jnp.stack(
                [
                    assoc_strength_tfactor(
                        i, j, temperature, sigma, kappa_c, p.epsilon_k_ab,
                        epsilon_k_aibj=epsilon_k_aibj,
                    )
                    for j in range(n)
                ]
            )
            for i in range(n)
        ]
    )
    ind_t = jnp.stack(
        [
            jnp.stack(
                [
                    assoc_strength_tfactor(
                        i, j, temperature, sigma, kappa_i, p.epsilon_k_ab
                    )
                    for j in range(n)
                ]
            )
            for i in range(n)
        ]
    )
    dd = d[:, None] * d[None, :] / (d[:, None] + d[None, :])

    return MixPre(
        m=m, na=p.na, nb=p.nb,
        md1=m * d, md2=m * d * d, md3=m * d * d * d, d=d,
        e1=e1, e2=e2, dip=dip, dipolar=dipolar,
        self_st=self_st, self_da=self_da,
        cross_t=cross_t, ind_t=ind_t, dd=dd,
        self_m=self_m, cross_m=cross_m, induced_m=induced_m,
    )


def phi_mix_pre(pre: MixPre, density, assoc_q_form: bool = False,
                branches=None):
    """Reduced residual Helmholtz energy density from precomputed rho-free
    quantities (see :class:`MixPre`); the density-dependent half of
    :func:`phi_mix`."""
    m = pre.m
    rho = density
    n = m.shape[0]
    dtype = jnp.result_type(rho)
    cA0, cA1, cA2 = (jnp.asarray(c, dtype=dtype) for c in (A0, A1, A2))
    cB0, cB1, cB2 = (jnp.asarray(c, dtype=dtype) for c in (B0, B1, B2))

    d = pre.d
    zeta0 = PI / 6.0 * jnp.sum(m * rho)
    zeta1 = PI / 6.0 * jnp.sum(pre.md1 * rho)
    zeta2 = PI / 6.0 * jnp.sum(pre.md2 * rho)
    zeta3 = PI / 6.0 * jnp.sum(pre.md3 * rho)

    zeta23 = zeta2 / zeta3
    zeta3_2 = zeta3 * zeta3
    zeta3_3 = zeta3_2 * zeta3
    zeta3_m1 = 1.0 / (1.0 - zeta3)
    zeta3_m2 = zeta3_m1 * zeta3_m1
    etas = jnp.stack([jnp.ones_like(zeta3), zeta3, zeta3_2, zeta3_3,
                      zeta3_2 * zeta3_2, zeta3_2 * zeta3_3, zeta3_3 * zeta3_3])

    # hard sphere (Boublik-Mansoori zeta form)
    hs = (6.0 / PI) * (
        zeta1 * zeta2 * zeta3_m1 * 3.0
        + zeta2 * zeta2 * zeta3_m2 * zeta23
        + (zeta2 * zeta23 * zeta23 - zeta0) * jnp.log(1.0 - zeta3)
    )

    # hard chain
    c = zeta2 * zeta3_m2
    g = zeta3_m1 + d * c * 1.5 - d * d * c * c * (zeta3 - 1.0) * 0.5
    hc = -jnp.sum(rho * (m - 1.0) * jnp.log(g))

    # dispersion: combining rules precomputed into (n, n) bases
    x = rho / jnp.sum(rho)
    mmean = jnp.sum(x * m)
    rho_ij = rho[:, None] * rho[None, :]
    rho1mix = jnp.sum(rho_ij * pre.e1)
    rho2mix = jnp.sum(rho_ij * pre.e2)

    m1 = (mmean - 1.0) / mmean
    m2 = m1 * (mmean - 2.0) / mmean
    I1 = jnp.dot(m2 * cA2 + m1 * cA1 + cA0, etas)
    I2 = jnp.dot(m2 * cB2 + m1 * cB1 + cB0, etas)
    C1 = 1.0 / (
        1.0
        + mmean * (8.0 * zeta3 - 2.0 * zeta3_2) * zeta3_m2 * zeta3_m2
        + (1.0 - mmean)
        * (20.0 * zeta3 - 27.0 * zeta3_2 + 12.0 * zeta3_2 * zeta3 - 2.0 * zeta3_2 * zeta3_2)
        / ((1.0 - zeta3) * (1.0 - zeta3) * (2.0 - zeta3) * (2.0 - zeta3))
    )
    disp = (-rho1mix * 2.0 * I1 - rho2mix * C1 * I2 * mmean) * PI

    phi = hs + hc + disp

    # Trace-time branch specialization: ``branches`` (a frozenset drawn
    # from {"dipole", "self", "cross", "induced"}) statically removes
    # regime subgraphs that no row of the batch can reach.  The regimes
    # depend only on PARAMETERS (mu, na, nb), so the API layer inspects
    # concrete parameter batches before jit and passes the reachable set
    # (:func:`static_branches`); ``None`` keeps every branch traced — the
    # general masked form.  Each phi instantiation is multiplied ~30x
    # through the solver graphs, and the dead regimes (each with its own
    # inner fixed-point solve) dominate the lowered program for typical
    # single-regime batches.
    if branches is None:
        branches = _ALL_BRANCHES

    if "dipole" in branches:
        # dipole (masked lanes instead of row subsetting)
        dip = phi_dipole_pre(pre.dip, n, rho, etas)
        phi = phi + jnp.where(pre.dipolar, dip, 0.0)

    # association regime dispatch (reference feos_torch/pcsaft_mix.py:117-152)
    if "self" in branches:
        phi = phi + jnp.where(
            pre.self_m,
            _phi_self_assoc(pre, rho, zeta2, zeta3_m1, assoc_q_form),
            0.0,
        )
    if "cross" in branches:
        phi = phi + jnp.where(
            pre.cross_m,
            _phi_cross_assoc(pre, rho, zeta2, zeta3_m1, assoc_q_form),
            0.0,
        )
    if "induced" in branches:
        phi = phi + jnp.where(
            pre.induced_m,
            _phi_induced_assoc(pre, rho, zeta2, zeta3_m1, assoc_q_form),
            0.0,
        )
    return phi


def phi_mix(p: MixParams, kij, epsilon_k_aibj, temperature, density,
            assoc_q_form: bool = False, branches=None):
    """Reduced residual Helmholtz energy density of an n-component mixture.

    Per-item scalar function (``density`` has shape (n,)); semantics match
    reference feos_torch/pcsaft_mix.py:31-154 (golden-value tested).

    With ``assoc_q_form`` the association contribution is evaluated as the
    Michelsen Q function at stop-gradiented site fractions:

        Q = sum_S rho_S (ln X_S - X_S + 1)
            - sum_{A_i, B_j} rho_Ai rho_Bj X_Ai X_Bj Delta_ij(rho)

    Q is stationary w.r.t. X at the mass-action solution and equals the
    free energy there, so values and FIRST derivatives (mu, p~) are exact
    while X stays a constant in the graph — no implicit-function expansion
    under any AD transform.  Second derivatives miss the dX/drho cross
    term, which is exactly the Jacobian-grade accuracy the VLE solvers
    need (their roots are defined by first-order residuals); the exact
    default form is used everywhere user-facing derivatives are taken.

    Thin wrapper over :func:`precompute_mix` + :func:`phi_mix_pre`; hot
    loops that evaluate many density states at one (parameters, T) call
    the split form so the rho-free half is computed once per solve.  The
    working dtype follows ``density`` (f32 solver warmup phase).
    """
    dtype = jnp.result_type(density)
    p = MixParams(*(jnp.asarray(v, dtype=dtype) for v in p))
    pre = precompute_mix(
        p,
        jnp.asarray(kij, dtype=dtype),
        jnp.asarray(epsilon_k_aibj, dtype=dtype),
        jnp.asarray(temperature, dtype=dtype),
    )
    return phi_mix_pre(pre, density, assoc_q_form=assoc_q_form,
                       branches=branches)


_ALL_BRANCHES = frozenset({"dipole", "self", "cross", "induced"})


def static_branches(parameters):
    """Reachable phi branches for a CONCRETE parameter batch, or ``None``.

    ``parameters`` is the (B, n, 8) array-like; returns a frozenset for
    :func:`phi_mix`'s ``branches`` argument when the batch is concrete
    (inspectable at trace time), else ``None`` (trace everything).  The
    decision is per-batch: a branch is included if ANY row can reach it,
    so masked per-row dispatch inside phi stays correct.
    """
    try:
        arr = np.asarray(parameters, dtype=np.float64)
    except (jax.errors.TracerArrayConversionError, TypeError):
        return None
    mu, na, nb = arr[..., 3], arr[..., 6], arr[..., 7]
    out = set()
    if np.any(mu != 0.0):
        out.add("dipole")
    n_assoc = np.count_nonzero(na + nb, axis=-1)
    n_self = np.count_nonzero(na * nb, axis=-1)
    if np.any((n_assoc == 1) & (n_self == 1)):
        out.add("self")
    if np.any((n_assoc == 2) & (n_self == 2)):
        out.add("cross")
    if np.any((n_assoc == 2) & (n_self == 1)):
        out.add("induced")
    return frozenset(out)


def _q_f1(x):
    """Per-site Q-form free energy  f1(X) = ln X - X + 1."""
    return jnp.log(x) - x + 1.0


def _phi_self_assoc(pre: MixPre, rho, zeta2, zeta3_m1, q_form=False):
    """Single self-associating component, closed form
    (reference feos_torch/pcsaft_mix.py:210-239); the sanitized
    sigma_a^3 kappa (exp(eps_ab/T)-1) factor and d_a are precomputed
    (``pre.self_st`` / ``pre.self_da``)."""
    k = pre.self_da * 0.5 * zeta2 * zeta3_m1
    delta = zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * pre.self_st
    rhoa = jnp.sum(pre.na * rho)
    rhob = jnp.sum(pre.nb * rho)
    aux = 1.0 + (rhoa - rhob) * delta
    sqrt = jnp.sqrt(aux * aux + 4.0 * rhob * delta)
    xa = 2.0 / (sqrt + 1.0 + (rhob - rhoa) * delta)
    xb = 2.0 / (sqrt + 1.0 + (rhoa - rhob) * delta)
    if q_form:
        xa = jax.lax.stop_gradient(xa)
        xb = jax.lax.stop_gradient(xb)
        return rhoa * _q_f1(xa) + rhob * _q_f1(xb) - rhoa * rhob * xa * xb * delta
    f = site_fraction_free_energy
    return rhoa * f(xa) + rhob * f(xb)


def _phi_cross_assoc(pre: MixPre, rho, zeta2, zeta3_m1, q_form=False):
    """Two self-associating components, 2-unknown fixed point
    (reference feos_torch/pcsaft_mix.py:241-321); pairwise T-factors
    (with the eps_AiBj override) precomputed in ``pre.cross_t``."""
    mask = pre.cross_m

    def delta(i, j):
        dd = assoc_strength_from_tfactor(
            pre.cross_t[i, j], pre.dd[i, j], zeta2, zeta3_m1
        )
        return jnp.where(mask, dd, 0.0)

    d00, d01, d10, d11 = delta(0, 0), delta(0, 1), delta(1, 0), delta(1, 1)
    rhoa = rho * pre.na
    rhob = rho * pre.nb
    if q_form:
        stop = jax.lax.stop_gradient
        args = tuple(stop(v) for v in (d00, d01, d10, d11, rhoa[0], rhoa[1],
                                       rhob[0], rhob[1]))
        xa0, xa1 = (stop(x) for x in solve_cross_assoc(*args))
        xb0 = stop(1.0 / (1.0 + xa0 * args[4] * args[0] + xa1 * args[5] * args[1]))
        xb1 = stop(1.0 / (1.0 + xa0 * args[4] * args[2] + xa1 * args[5] * args[3]))
        # Q bilinear term: sum over (A_i, B_j) pairs with Delta_ij(rho)
        bil = (
            rhoa[0] * rhob[0] * xa0 * xb0 * d00
            + rhoa[0] * rhob[1] * xa0 * xb1 * d10
            + rhoa[1] * rhob[0] * xa1 * xb0 * d01
            + rhoa[1] * rhob[1] * xa1 * xb1 * d11
        )
        return (
            rhoa[0] * _q_f1(xa0) + rhoa[1] * _q_f1(xa1)
            + rhob[0] * _q_f1(xb0) + rhob[1] * _q_f1(xb1) - bil
        )
    xa0, xa1 = solve_cross_assoc(
        d00, d01, d10, d11, rhoa[0], rhoa[1], rhob[0], rhob[1]
    )
    xb0 = 1.0 / (1.0 + xa0 * rhoa[0] * d00 + xa1 * rhoa[1] * d01)
    xb1 = 1.0 / (1.0 + xa0 * rhoa[0] * d10 + xa1 * rhoa[1] * d11)
    f = site_fraction_free_energy
    return rhoa[0] * f(xa0) + rhoa[1] * f(xa1) + rhob[0] * f(xb0) + rhob[1] * f(xb1)


def _phi_induced_assoc(pre: MixPre, rho, zeta2, zeta3_m1, q_form=False):
    """One self-associating + one induced (nA = 0) component
    (reference feos_torch/pcsaft_mix.py:324-393); plain pairwise T-factors
    precomputed in ``pre.ind_t``."""
    mask = pre.induced_m

    def delta_rho(i, j):
        dd = assoc_strength_from_tfactor(
            pre.ind_t[i, j], pre.dd[i, j], zeta2, zeta3_m1
        )
        return jnp.where(mask, dd * rho[j], 0.0)

    d00, d01 = delta_rho(0, 0), delta_rho(0, 1)
    d10, d11 = delta_rho(1, 0), delta_rho(1, 1)
    na0, na1 = pre.na[0], pre.na[1]
    nb0, nb1 = pre.nb[0], pre.nb[1]
    if q_form:
        stop = jax.lax.stop_gradient
        args = tuple(stop(v) for v in (d00, d01, d10, d11, na0, na1, nb0, nb1))
        xa = stop(solve_induced_assoc(*args))
        xb0 = stop(1.0 / (1.0 + xa * (args[4] * args[0] + args[5] * args[1])))
        xb1 = stop(1.0 / (1.0 + xa * (args[4] * args[2] + args[5] * args[3])))
        # sites: shared-A (rho-weighted na) + B_0 + B_1; dij here are
        # Delta_ij * rho_j, so rho_Ai rho_Bj Delta_ij = (na_i rho_i) nb_j d_ij
        rho_a = na0 * rho[0] + na1 * rho[1]
        bil = xa * (
            na0 * rho[0] * (nb0 * xb0 * d00 + nb1 * xb1 * d01)
            + na1 * rho[1] * (nb0 * xb0 * d10 + nb1 * xb1 * d11)
        )
        return (
            rho_a * _q_f1(xa)
            + rho[0] * nb0 * _q_f1(xb0)
            + rho[1] * nb1 * _q_f1(xb1)
            - bil
        )
    xa = solve_induced_assoc(d00, d01, d10, d11, na0, na1, nb0, nb1)
    xb0 = 1.0 / (1.0 + xa * (na0 * d00 + na1 * d01))
    xb1 = 1.0 / (1.0 + xa * (na0 * d10 + na1 * d11))
    f = site_fraction_free_energy
    return rho[0] * (f(xa) * na0 + f(xb0) * nb0) + rho[1] * (
        f(xa) * na1 + f(xb1) * nb1
    )


# ---------------------------------------------------------------------------
# Batched API
# ---------------------------------------------------------------------------


def _split_kij(kij, batch_shape):
    if kij is None:
        z = jnp.zeros(batch_shape, dtype=jnp.float64)
        return z, z
    kij = jnp.asarray(kij, dtype=jnp.float64)
    return kij[..., 0], kij[..., 1]


def helmholtz_energy_density(parameters, kij, temperature, density,
                             branches=None):
    """Batched phi (reference ``PcSaftMix.helmholtz_energy_density``)."""
    p = MixParams.from_array(parameters)
    k, e = _split_kij(kij, jnp.shape(parameters)[0])
    br = branches if branches is not None else static_branches(parameters)
    return _mix_phi_jit(
        p, k, e,
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
        branches=br,
    )


def _mix_phi_impl(p, k, e, temperature, density, branches):
    return jax.vmap(lambda pi, ki, ei, t, r: phi_mix(pi, ki, ei, t, r,
                                                     branches=branches))(
        p, k, e, temperature, density
    )


_mix_phi_jit = jax.jit(_mix_phi_impl, static_argnames=("branches",))


def derivatives(parameters, kij, temperature, density, branches=None):
    """Batched (A, p~, mu_i, v_i) (reference feos_torch/pcsaft_mix.py:395-420)."""
    p = MixParams.from_array(parameters)
    k, e = _split_kij(kij, jnp.shape(parameters)[0])
    br = branches if branches is not None else static_branches(parameters)
    return _mix_derivatives_jit(
        p, k, e,
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
        branches=br,
    )


def _mix_derivatives_impl(p, k, e, temperature, density, branches):
    def per_item(pi, ki, ei, t, rho):
        pre = precompute_mix(pi, ki, ei, t)
        return pressure_set(
            lambda r: phi_mix_pre(pre, r, branches=branches), rho
        )

    return jax.vmap(per_item)(p, k, e, temperature, density)


_mix_derivatives_jit = jax.jit(_mix_derivatives_impl,
                               static_argnames=("branches",))


def _incipient_property(parameters, kij, temperature, molefracs, pressure,
                        bubble, branches=None, full_output=False,
                        state0=None, state_output=False):
    """Shared bubble/dew implementation with stationary re-attachment.

    Solve (stop-gradient) for the coexisting partial densities, then
    re-attach parameter gradients through the stationary pressure identity
    (reference feos_torch/pcsaft_mix.py:435-443 and :459-467):

        p~ = -(a_bulk' + p~_bulk v_bulk + g_bulk - 1) / (1/rho_inc - v_bulk)

    where 'bulk' is the phase with known composition (liquid for bubble,
    vapor for dew) and 'inc' the incipient phase.

    The *value* comes from the solver's carried residual state (p~ at the
    converged incipient state, exact to the 1e-9 solve tolerance); the
    identity only supplies the *gradient* (value-stationarity makes it
    exact w.r.t. the stopped densities).  That split lets the partial
    molar volumes v_bulk — the only second-derivative quantity — be
    computed through the f32 parameter closure: a ~1e-7-relative gradient
    perturbation, while removing all second-order f64 graphs from the
    program (the dominant TPU compile cost; see solvers/vle.py).

    ``state0`` is an optional (B, n+1) converged log-state from a previous
    solve at nearby parameters: the solver then skips its iterative
    initialization (the continuation fast path; see
    :func:`solvers.vle.mix_vle`).  ``state_output=True`` appends the
    converged log-state (NaN on failed rows, gradient-stopped) to the
    return tuple so optimizer loops can carry it.
    """
    p = MixParams.from_array(parameters)
    kv, ev = _split_kij(kij, jnp.shape(parameters)[0])
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    molefracs = jnp.asarray(molefracs, dtype=jnp.float64)
    pressure = jnp.asarray(pressure, dtype=jnp.float64)

    # compositions: the reference's binary convention passes x1 as a (B,)
    # scalar per item (src/pcsaft.rs:155); an explicit (B, n) matrix
    # generalizes to n-component mixtures (beyond the reference, which is
    # binary-only in its native solvers).  kij stays binary-only.
    n = jnp.shape(parameters)[1]
    if molefracs.ndim == 1:
        if n != 2:
            raise ValueError(
                "scalar molefracs are the binary x1 convention; pass a "
                f"(B, {n}) composition matrix for {n}-component mixtures"
            )
        molefracs = jnp.stack([molefracs, 1.0 - molefracs], axis=-1)
    if n != 2 and kij is not None:
        raise ValueError("kij can only be used for binary mixtures!")

    # static branch specialization (see phi_mix): the regime set of a
    # concrete batch removes dead fixed-point subgraphs from every phi
    # instantiation in the solver
    br = branches if branches is not None else static_branches(parameters)
    p_out, nans, y_inc, u_state = _mix_incipient_jit(
        p, kv, ev, temperature, molefracs, pressure, bubble=bubble,
        branches=br, state0=state0)
    out = (p_out, nans)
    if full_output:
        out = out + (y_inc,)
    if state_output:
        out = out + (u_state,)
    return out


def _mix_incipient_impl(p, kv, ev, temperature, molefracs, pressure, bubble,
                        branches, state0=None):
    """Jitted solver core (module-level so all call sites — facades, tests,
    repeated FD evaluations — share one trace per shape/branch set; the
    solver graphs cost tens of seconds to trace+lower).

    ``state0`` (optional, (B, n+1)) is a warm-start log-state from a
    previous converged solve (see :func:`solvers.vle.mix_vle`): the solver
    then skips its iterative initialization entirely — the optimizer-loop
    fast path.
    """
    from ..solvers.vle import _states_eos, mix_vle, solve_with_identity_gradients

    p_red = pressure / temperature * PA_PER_KT_TO_REDUCED
    f32 = jnp.float32
    br = branches

    def solve_item(pi, ki, ei, t, z, pr, s0=None):
        # rho-free precompute hoisted out of every phi instantiation in the
        # solver loops (one per solve instead of one per Newton iteration)
        pre = precompute_mix(pi, ki, ei, t)
        pi32 = MixParams(*(v.astype(f32) for v in pi))
        pre32 = precompute_mix(
            pi32, ki.astype(f32), ei.astype(f32), t.astype(f32)
        )
        # the f64 residual needs exact values and FIRST derivatives only ->
        # the Q-form association (stationary at stop-gradiented site
        # fractions) keeps implicit-function machinery out of the f64
        # graphs, the dominant TPU compile cost.  The f32 closure must stay
        # the EXACT phi: it supplies the Newton JACOBIANS (second
        # derivatives), and the Q form's second derivatives miss the
        # dX/drho terms — at strong association that stalls Newton.
        return mix_vle(
            lambda r: phi_mix_pre(pre, r, assoc_q_form=True, branches=br),
            z, pr, pre.md3,
            incipient_is_vapor=bubble,
            phi_fn32=lambda r: phi_mix_pre(pre32, r, branches=br),
            u0_init=s0,
        )

    def solve_batch(diff_args):
        # molefracs/p_red/state0 ride in diff_args (NOT the closure): under
        # a temperature/composition gradient (or a scan carry) they are
        # tracers, and a tracer captured by the custom_jvp closure leaks
        # out of the transform.  The identity ignores them, so their
        # gradient contribution is the (correct) zero of the reference's
        # detached-solver convention.
        pd, kvd, evd, td, zd, prd, s0d = diff_args
        if s0d is None:
            return jax.vmap(solve_item)(pd, kvd, evd, td, zd, prd)
        return jax.vmap(solve_item)(pd, kvd, evd, td, zd, prd, s0d)

    def attach(pi, ki, ei, t, r_inc, r_bulk):
        pre = precompute_mix(pi, ki, ei, t)
        phi_fn = lambda r: phi_mix_pre(pre, r, branches=br)
        # first-order f64: p~_bulk and mu~_bulk
        p_b, g_b = _states_eos(phi_fn, r_bulk[None, :])
        p_b = p_b[0]
        mu_b = jnp.log(r_bulk) + g_b[0]
        # second-order quantity (partial molar volumes) via the f32
        # parameter closure — gradient-only path, see docstring
        pi32 = MixParams(*(v.astype(f32) for v in pi))
        pre32 = precompute_mix(
            pi32, ki.astype(f32), ei.astype(f32), t.astype(f32)
        )
        v_b32 = pressure_set(
            lambda r: phi_mix_pre(pre32, r, branches=br),
            r_bulk.astype(f32),
        )[3]
        v_b = v_b32.astype(jnp.float64)
        rho_inc_t = jnp.sum(r_inc)
        w = r_inc / rho_inc_t
        a_inc = phi_fn(r_inc) / rho_inc_t
        v_bulk = jnp.sum(w * v_b)
        g_bulk = jnp.sum(w * (jnp.log(r_inc) - mu_b))
        return -(a_inc + p_b * v_bulk + g_bulk - 1.0) / (1.0 / rho_inc_t - v_bulk)

    def ident_batch(diff_args, rho_inc, rho_bulk):
        pd, kvd, evd, td, _, _, _ = diff_args
        return jax.vmap(attach)(pd, kvd, evd, td, rho_inc, rho_bulk)

    # value from the solver's carried state, derivatives from the
    # stationary identity — the identity graph is traced only under AD
    # (jax.custom_jvp; see solve_with_identity_gradients)
    pt_eq, ok, rho_inc, rho_bulk = solve_with_identity_gradients(
        solve_batch, ident_batch,
        (p, kv, ev, temperature, molefracs, p_red, state0),
    )
    pressure_out = pt_eq * temperature * REDUCED_TO_PA_PER_KT
    # incipient-phase composition from the converged partial densities.
    # Gradients through it are the (correct) zero of the detached-solver
    # convention — the re-attachment identity covers the pressure only.
    y_inc = rho_inc / jnp.sum(rho_inc, axis=1, keepdims=True)
    y_inc = jnp.where(ok[:, None], y_inc, jnp.nan)
    # converged log-state for warm-started continuation (NaN where failed:
    # callers keep their previous state).  rho_bulk = z exp(u[n]) with
    # sum(z) = 1, so u[n] = ln(sum rho_bulk); gradients are stopped (the
    # sanitized densities are already detached in the solver wrapper).
    u_state = jnp.concatenate(
        [jnp.log(rho_inc), jnp.log(jnp.sum(rho_bulk, axis=1))[:, None]],
        axis=1,
    )
    u_state = jnp.where(ok[:, None], u_state, jnp.nan)
    return jnp.where(ok, pressure_out, jnp.nan), ~ok, y_inc, u_state


_mix_incipient_jit = jax.jit(_mix_incipient_impl,
                             static_argnames=("bubble", "branches"))


def bubble_point(parameters, kij, temperature, liquid_molefracs, pressure,
                 branches=None, full_output=False, state0=None,
                 state_output=False):
    """Batched bubble-point pressure (Pa) with parameter gradients.

    Replaces reference ``PcSaftMix.bubble_point``
    (feos_torch/pcsaft_mix.py:422-444 + src/pcsaft.rs:150-181).
    Returns ``(p, nans)`` in the reference's order.

    ``liquid_molefracs`` may be the reference's binary (B,) x1 convention
    or an explicit (B, n) composition matrix — the latter solves
    n-component bubble points (beyond the reference's binary-only native
    solvers; kij stays binary-only).  ``branches`` is the optional static
    phi-branch set (see :func:`static_branches`): pass it when jitting
    this function directly, or use the :class:`PcSaftMix` facade which
    derives it from the concrete parameters.

    ``full_output=True`` additionally returns the converged incipient-phase
    (vapor) composition ``y`` (B, n) — NaN on failed rows, zero parameter
    gradient per the detached-solver convention (beyond the reference,
    which discards the vapor composition its solver computes).

    ``state0``/``state_output`` give continuation warm starts across
    repeated solves at slowly-moving parameters (optimizer loops): pass a
    previous call's ``state_output`` log-state back as ``state0`` and the
    solver skips its iterative initialization (see
    :func:`_incipient_property`).
    """
    return _incipient_property(
        parameters, kij, temperature, liquid_molefracs, pressure,
        bubble=True, branches=branches, full_output=full_output,
        state0=state0, state_output=state_output,
    )


def dew_point(parameters, kij, temperature, vapor_molefracs, pressure,
              branches=None, full_output=False, state0=None,
              state_output=False):
    """Batched dew-point pressure (Pa); reference feos_torch/pcsaft_mix.py:446-468.

    ``full_output=True`` additionally returns the incipient-phase (liquid)
    composition ``x`` (B, n); ``state0``/``state_output`` warm-start
    continuation — see :func:`bubble_point`.
    """
    return _incipient_property(
        parameters, kij, temperature, vapor_molefracs, pressure,
        bubble=False, branches=branches, full_output=full_output,
        state0=state0, state_output=state_output,
    )


def _incipient_temperature(parameters, kij, pressure, molefracs, t0,
                           bubble, branches, full_output=False):
    """Bubble/dew TEMPERATURE at given pressure and bulk composition.

    Beyond the reference surface (which is pressure-explicit only):
    secant outer iteration over warm-started pressure solves + implicit-
    function gradient re-attachment — see solvers/tsolve.py.  ``t0`` is
    the initial temperature estimate (same convention as the reference's
    initial-pressure argument to ``bubble_point``, src/pcsaft.rs:155);
    rows whose COLD solve at ``t0`` fails stay masked (the warm-start
    loop cannot recover a row that never produced a state).
    """
    from ..solvers.tsolve import (
        reattach_temperature, saturation_temperature_loop,
    )

    sg = jax.lax.stop_gradient
    B = jnp.shape(parameters)[0]
    p_target = jnp.broadcast_to(
        jnp.asarray(pressure, dtype=jnp.float64), (B,)
    )
    t0 = sg(jnp.broadcast_to(jnp.asarray(t0, dtype=jnp.float64), (B,)))
    par_s = sg(jnp.asarray(parameters, dtype=jnp.float64))
    kij_s = None if kij is None else sg(jnp.asarray(kij, dtype=jnp.float64))
    x_s = sg(jnp.asarray(molefracs, dtype=jnp.float64))
    p_s = sg(p_target)
    br = branches if branches is not None else static_branches(parameters)

    # cold seed at t0 (inner initial pressure = the target isobar)
    _, nans0, u0 = _incipient_property(
        par_s, kij_s, t0, x_s, p_s, bubble=bubble, branches=br,
        state_output=True,
    )

    def solve_warm(T, u):
        pw, nans, u2 = _incipient_property(
            par_s, kij_s, T, x_s, p_s, bubble=bubble, branches=br,
            state0=u, state_output=True,
        )
        return jnp.log(pw), ~nans, u2  # pw is NaN on failed rows

    t_star, u_star, done = saturation_temperature_loop(
        solve_warm, t0, sg(jnp.log(p_target)), u0,
    )

    def solve_diff(T, u):
        pw, _ = _incipient_property(
            parameters, kij, T, molefracs, p_s, bubble=bubble, branches=br,
            state0=u,
        )
        return pw

    t_out = reattach_temperature(solve_diff, t_star, u_star, p_target, done)
    if not full_output:
        return t_out, ~done
    # incipient composition at the converged temperature (stopped, NaN on
    # failed rows — the zero-gradient convention of full_output)
    _, _, y_inc = _incipient_property(
        par_s, kij_s, sg(t_star), x_s, p_s, bubble=bubble, branches=br,
        state0=sg(u_star), full_output=True,
    )
    return t_out, ~done, jnp.where(done[:, None], y_inc, jnp.nan)


def bubble_point_t(parameters, kij, pressure, liquid_molefracs, t0,
                   branches=None, full_output=False):
    """Batched bubble-point TEMPERATURE (K) at given pressure with
    parameter/pressure gradients (beyond the reference, which is
    pressure-explicit only; see :func:`_incipient_temperature`).

    Returns ``(t, nans)``; with ``full_output=True`` also the incipient
    vapor composition (B, n).
    """
    return _incipient_temperature(
        parameters, kij, pressure, liquid_molefracs, t0, bubble=True,
        branches=branches, full_output=full_output,
    )


def dew_point_t(parameters, kij, pressure, vapor_molefracs, t0,
                branches=None, full_output=False):
    """Batched dew-point TEMPERATURE (K) at given pressure (beyond the
    reference; see :func:`bubble_point_t`)."""
    return _incipient_temperature(
        parameters, kij, pressure, vapor_molefracs, t0, bubble=False,
        branches=branches, full_output=full_output,
    )


def _mix_flash_impl(p, kv, ev, temperature, z, p_red, lnK0, beta0, active,
                    branches):
    """Jitted flash core: vmapped :func:`solvers.flash.flash_tp` with the
    per-item Q-form f64 phi closure for residuals and the exact f32 phi
    for the NPT Newton slopes/stability tests (the library-wide split,
    see :func:`_mix_incipient_impl`); module-level so all call sites
    share one trace per shape/branch set."""
    from ..solvers.flash import flash_tp

    f32 = jnp.float32

    def item(pi, ki, ei, t, zi, pri, lnK0i, b0i, act):
        pre = precompute_mix(pi, ki, ei, t)
        pi32 = MixParams(*(v.astype(f32) for v in pi))
        pre32 = precompute_mix(
            pi32, ki.astype(f32), ei.astype(f32), t.astype(f32)
        )
        phi = lambda r: phi_mix_pre(pre, r, assoc_q_form=True,
                                    branches=branches)
        phi32 = lambda r: phi_mix_pre(pre32, r, branches=branches)
        lnr0 = jnp.full((2,), jnp.nan, dtype=zi.dtype)
        return flash_tp(phi, zi, pri, pre.md3, lnK0i, b0i, lnr0,
                        phi_fn_jac=phi32, active=act)

    return jax.vmap(item)(
        p, kv, ev, temperature, z, p_red, lnK0, beta0, active
    )


_mix_flash_jit = jax.jit(_mix_flash_impl, static_argnames=("branches",))


def flash(parameters, kij, temperature, molefracs, pressure, branches=None,
          gradients=False):
    """Batched isothermal pT flash at (T, p, z) — beyond the reference's
    surface (feos-torch exposes only incipient-phase solvers; the full
    two-phase split lives in the upstream feos crate,
    ``PhaseEquilibrium::tp_flash``).

    The two-phase window comes from the library's own bubble/dew solves at
    the feed composition; inside it, K-factors are initialized by
    log-interpolating the two edge solutions and refined by successive
    substitution with warm-started two-lane NPT solves (see
    :mod:`feos_tpu.solvers.flash`).

    Returns ``(vapor_frac, x, y, rho, phase)``:

    * ``vapor_frac`` (B,): molar vapor fraction beta (0.0 for subcooled
      liquid, 1.0 for superheated vapor, NaN where failed);
    * ``x`` / ``y`` (B, n): liquid / vapor compositions (the feed where
      single-phase, NaN where that phase does not exist or failed);
    * ``rho`` (B, 2): total molar densities [liquid, vapor] in A^-3 (the
      unit :func:`residual_properties` consumes) — populated only on
      two-phase rows (both lanes NaN on single-phase/failed rows; the
      single phase's density is one NPT property call away) — flash
      output chains directly into the caloric property set;
    * ``phase`` (B,) int8: 0 = liquid, 1 = vapor, 2 = two-phase,
      -1 = failed.

    With ``gradients=False`` (default) every output is gradient-detached
    (the solve itself always is).  With ``gradients=True``, derivatives
    of beta/x/y/rho w.r.t. parameters, kij, T, z, AND p are re-attached
    by the implicit-function theorem on the full flash system (see
    :func:`feos_tpu.solvers.flash.flash_implicit_gradients`) — the
    "differentiable flash" for fitting to two-phase split data.  The
    exact-phi second-order graph it needs is traced only under AD.
    """
    sg = jax.lax.stop_gradient
    parameters = jnp.asarray(parameters, dtype=jnp.float64)
    kij_a = None if kij is None else jnp.asarray(kij, dtype=jnp.float64)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    z = jnp.asarray(molefracs, dtype=jnp.float64)
    pressure = jnp.asarray(pressure, dtype=jnp.float64)
    n = jnp.shape(parameters)[1]
    if z.ndim == 1:
        if n != 2:
            raise ValueError(
                "scalar molefracs are the binary x1 convention; pass a "
                f"(B, {n}) composition matrix for {n}-component mixtures"
            )
        z = jnp.stack([z, 1.0 - z], axis=-1)
    if not gradients:
        parameters, temperature, z, pressure = map(
            sg, (parameters, temperature, z, pressure)
        )
        kij_a = None if kij_a is None else sg(kij_a)
    br = branches if branches is not None else static_branches(parameters)

    # two-phase window from the library's own edge solvers at the feed
    # (detached: the window feeds masks and solver initialization only).
    # The initial pressure estimate is floored at 1e5 Pa: the edge
    # solvers structurally recover from a too-HIGH estimate (the grid
    # scan caps p0 below the spinodal maximum) but not from one decades
    # too LOW (the vapor lane initializes at rho ~ p0) — and a flash
    # target mid-way through an ultra-wide window (fuzz rows with
    # (p_dew, p_bub) spanning 6+ decades) sits 3+ decades below its
    # bubble point.
    kij_s = None if kij_a is None else sg(kij_a)
    p0_edges = sg(jnp.maximum(pressure, 1e5))
    p_bub, nan_b, y_bub = _incipient_property(
        sg(parameters), kij_s, sg(temperature), sg(z), p0_edges,
        bubble=True, branches=br, full_output=True,
    )
    p_dew, nan_d, x_dew = _incipient_property(
        sg(parameters), kij_s, sg(temperature), sg(z), p0_edges,
        bubble=False, branches=br, full_output=True,
    )

    p = MixParams.from_array(parameters)
    kv, ev = _split_kij(kij_a, jnp.shape(parameters)[0])
    p_red = pressure / temperature * PA_PER_KT_TO_REDUCED

    if not gradients:
        def run_flash(lnK0, beta0, active):
            return _mix_flash_jit(
                p, kv, ev, temperature, z, p_red, lnK0, beta0, active,
                branches=br
            )
    else:
        from ..solvers.flash import flash_implicit_gradients, flash_resid

        def run_flash(lnK0, beta0, active):
            # lnK0/beta0/active ride in diff_args (captured tracers would
            # leak out of the custom_jvp transform — see _mix_incipient_
            # impl); their tangents are correctly ignored (the root does
            # not depend on solver initialization)
            def solve_fn(diff_args):
                pd, kvd, evd, td, zd, prd, lnK0d, b0d, actd = diff_args
                return _mix_flash_jit(
                    pd, kvd, evd, td, zd, prd, lnK0d, b0d, actd,
                    branches=br
                )

            def resid_fn(diff_args, v):
                pd, kvd, evd, td, zd, prd, _, _, _ = diff_args

                def item(pi, ki, ei, t, zi, pri, vi):
                    pre = precompute_mix(pi, ki, ei, t)
                    phi = lambda r: phi_mix_pre(pre, r, branches=br)
                    return flash_resid(phi, zi, pri, vi)

                return jax.vmap(item)(pd, kvd, evd, td, zd, prd, v)

            return flash_implicit_gradients(
                solve_fn, resid_fn,
                (p, kv, ev, temperature, z, p_red, lnK0, beta0, active),
            )

    from ..solvers.flash import flash_window

    return flash_window(
        z, pressure, p_bub, nan_b, y_bub, p_dew, nan_d, x_dew, run_flash
    )


class PcSaftMix:
    """Object facade mirroring reference ``PcSaftMix`` (feos_torch/pcsaft_mix.py:12).

    ``kij`` is an optional (B, 2) array ``[k_ij, epsilon_k_AiBj]``.  Only
    binary mixtures are supported (as in the reference,
    feos_torch/pcsaft_mix.py:74-75).
    """

    def __init__(self, parameters, kij=None):
        self.parameters = jnp.asarray(parameters, dtype=jnp.float64)
        if self.parameters.shape[1] != 2 and kij is not None:
            raise ValueError("kij can only be used for binary mixtures!")
        self.kij = None if kij is None else jnp.asarray(kij, dtype=jnp.float64)
        # static phi-branch specialization from the concrete batch; the
        # closed-over frozenset survives a later jit of the bound methods
        self.branches = static_branches(parameters)

    def helmholtz_energy_density(self, temperature, density):
        return helmholtz_energy_density(
            self.parameters, self.kij, temperature, density,
            branches=self.branches,
        )

    def derivatives(self, temperature, density):
        return derivatives(self.parameters, self.kij, temperature, density,
                           branches=self.branches)

    def residual_properties(self, temperature, density):
        """Batched residual caloric/state property set at (T, rho_vec) —
        see :mod:`feos_tpu.properties` (beyond the reference surface)."""
        from ..properties import mix_properties

        return mix_properties(self.parameters, self.kij, temperature, density,
                              branches=self.branches)

    def flash(self, temperature, molefracs, pressure, gradients=False):
        """Batched isothermal pT flash at (T, p, z) — see :func:`flash`
        (beyond the reference surface)."""
        return flash(self.parameters, self.kij, temperature, molefracs,
                     pressure, branches=self.branches, gradients=gradients)

    def bubble_point(self, temperature, liquid_molefracs, pressure,
                     full_output=False, state0=None, state_output=False):
        return bubble_point(
            self.parameters, self.kij, temperature, liquid_molefracs, pressure,
            branches=self.branches, full_output=full_output,
            state0=state0, state_output=state_output,
        )

    def dew_point(self, temperature, vapor_molefracs, pressure,
                  full_output=False, state0=None, state_output=False):
        return dew_point(
            self.parameters, self.kij, temperature, vapor_molefracs, pressure,
            branches=self.branches, full_output=full_output,
            state0=state0, state_output=state_output,
        )

    def bubble_point_t(self, pressure, liquid_molefracs, t0,
                       full_output=False):
        """Bubble-point temperature at given pressure (beyond the
        reference; see :func:`bubble_point_t`)."""
        return bubble_point_t(
            self.parameters, self.kij, pressure, liquid_molefracs, t0,
            branches=self.branches, full_output=full_output,
        )

    def dew_point_t(self, pressure, vapor_molefracs, t0, full_output=False):
        """Dew-point temperature at given pressure (beyond the reference;
        see :func:`dew_point_t`)."""
        return dew_point_t(
            self.parameters, self.kij, pressure, vapor_molefracs, t0,
            branches=self.branches, full_output=full_output,
        )
