"""Pure-component PC-SAFT: Helmholtz energy core and differentiable property API.

TPU-native re-design of the reference's pure-component model
(``feos_torch/pcsaft_pure.py``).  Key differences from the reference:

* The Helmholtz energy is a *per-item* pure function ``phi_pure(params, T,
  rho)`` (scalar in, scalar out) that is ``vmap``-ed over the batch — the
  same function serves as solver residual and as the differentiable
  re-attachment layer, collapsing the reference's Rust/torch duplication
  (SURVEY.md section 1).
* Derivatives come from nested ``jax.jvp`` instead of the hand-rolled
  ``Dual3`` dual numbers (reference feos_torch/dual.py).
* The VLE / density solvers are batched ``lax.while_loop`` Newton
  iterations (:mod:`feos_tpu.solvers.vle`) instead of a detached Rust/rayon
  CPU backend (reference src/pcsaft.rs:82-129); gradients re-attach through
  the stationary thermodynamic identities exactly as in the reference
  (feos_torch/pcsaft_pure.py:196-233).
* Failed rows are reported through a boolean mask and NaN-filled outputs of
  *fixed shape* — no in-place compaction (`reduce`,
  feos_torch/pcsaft_pure.py:235-243), which would be a dynamic shape on TPU.

Parameter layout (per row, same as reference feos_torch/pcsaft_pure.py:90-103):
``[m, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb]``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import A0, A1, A2, B0, B1, B2, AD, BD, CD
from ..units import (
    KMOL_M3_TO_REDUCED,
    MU2_FACTOR,
    PA_PER_KT_TO_REDUCED,
    REDUCED_TO_PA_PER_KT,
)
from ..ops.derivatives import value_and_2derivs

PI = np.pi


class PureParams(NamedTuple):
    """PC-SAFT pure-component parameters (scalars per item; arrays when vmapped)."""

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


class PurePre(NamedTuple):
    """Density-independent PC-SAFT quantities at fixed (parameters, T).

    Everything in :func:`phi_pure` that does not depend on the density —
    the T-dependent segment diameter, the dispersion/dipole coefficient
    vectors, and the association/dipole temperature factors (each hiding an
    ``exp``/``sqrt``, expensive under the TPU's emulated f64) — computed
    ONCE per solve by :func:`precompute_pure` and shared by every phi
    evaluation inside the Newton loops.  XLA's while-loop invariant code
    motion does not reliably hoist these through the f64-emulation
    expansion (measured on the gc dispersion precompute), so the hoisting
    is explicit.
    """

    m: jnp.ndarray        # segment number (hs, hc, C1)
    eta_m: jnp.ndarray    # pi/6 m d^3: eta = eta_m * rho
    c_i1: jnp.ndarray     # (7,) I1 eta-polynomial coefficients
    c_i2: jnp.ndarray     # (7,) I2 eta-polynomial coefficients
    me: jnp.ndarray       # m * eps/T
    m2es3: jnp.ndarray    # m^2 (eps/T) sigma^3 (dispersion prefactor)
    c_j1: jnp.ndarray     # (5,) dipole J1 coefficients ad + bd * eps/T
    c_j2: jnp.ndarray     # (4,) dipole J2 coefficients
    inv_s3: jnp.ndarray   # 1 / sigma^3
    mu2eff: jnp.ndarray   # mu^2 reduced and T-scaled (phi2 weight)
    delta_t: jnp.ndarray  # (exp(eps_ab/T) - 1) sigma^3 kappa_ab
    na: jnp.ndarray
    nb: jnp.ndarray


def precompute_pure(p: PureParams, temperature) -> PurePre:
    """Build :class:`PurePre` from parameters and temperature (per item).

    All ops are plain jnp, so parameter/temperature gradients flow through
    the precompute unchanged; the working dtype follows the inputs (the
    solvers build an f32 instance for their warmup phases).
    """
    m, sigma, epsilon_k = p.m, p.sigma, p.epsilon_k
    dtype = jnp.result_type(m, temperature)
    cA0, cA1, cA2 = (jnp.asarray(c, dtype=dtype) for c in (A0, A1, A2))
    cB0, cB1, cB2 = (jnp.asarray(c, dtype=dtype) for c in (B0, B1, B2))
    cAD, cBD, cCD = (jnp.asarray(c, dtype=dtype) for c in (AD, BD, CD))

    # temperature-dependent segment diameter.  The two Boltzmann factors
    # (diameter + association) share one size-2 exp: the TPU plugin's
    # emulated-f64 exp computes scalar/size-1 operands at f32-level
    # precision only (see models.common.exp_full)
    eb = jnp.exp(jnp.stack(
        [-3.0 * epsilon_k / temperature, p.epsilon_k_ab / temperature]
    ))
    d = sigma * (1.0 - 0.12 * eb[0])
    eta_m = PI / 6.0 * m * d**3

    # dispersion
    e = epsilon_k / temperature
    s3 = sigma**3
    m1 = (m - 1.0) / m
    m2 = (m - 2.0) / m
    c_i1 = m1 * (m2 * cA2 + cA1) + cA0
    c_i2 = m1 * (m2 * cB2 + cB1) + cB0

    # dipole coefficients (PCP-SAFT)
    mu2 = p.mu**2 / (m * s3 * epsilon_k) * MU2_FACTOR
    mu2eff = mu2 * e * s3
    mc = jnp.clip(m, max=2.0)
    md1 = (mc - 1.0) / mc
    md2 = md1 * (mc - 2.0) / mc
    ad = cAD[:, 0] + md1 * cAD[:, 1] + md2 * cAD[:, 2]
    bd = cBD[:, 0] + md1 * cBD[:, 1] + md2 * cBD[:, 2]
    c_j1 = ad + bd * e
    c_j2 = cCD[:, 0] + md1 * cCD[:, 1] + md2 * cCD[:, 2]

    # association temperature factor
    delta_t = (eb[1] - 1.0) * s3 * p.kappa_ab

    return PurePre(
        m=jnp.asarray(m, dtype=dtype),
        eta_m=eta_m,
        c_i1=c_i1,
        c_i2=c_i2,
        me=m * e,
        m2es3=m**2 * e * s3,
        c_j1=c_j1,
        c_j2=c_j2,
        inv_s3=1.0 / s3,
        mu2eff=mu2eff,
        delta_t=delta_t,
        na=jnp.asarray(p.na, dtype=dtype),
        nb=jnp.asarray(p.nb, dtype=dtype),
    )


def phi_pure_pre(pre: PurePre, density):
    """Reduced residual Helmholtz energy density from precomputed
    rho-free quantities (see :class:`PurePre`); the density-dependent half
    of :func:`phi_pure`."""
    m = pre.m
    rho = density

    eta = pre.eta_m * rho
    eta2 = eta * eta
    eta3 = eta2 * eta
    eta_m1 = 1.0 / (1.0 - eta)
    eta_m2 = eta_m1 * eta_m1
    etas = jnp.stack(
        [jnp.ones_like(eta), eta, eta2, eta3, eta2 * eta2, eta2 * eta3, eta3 * eta3]
    )

    # hard sphere
    hs = m * rho * (4.0 * eta - 3.0 * eta2) * eta_m2

    # hard chain
    g = (1.0 - eta / 2.0) * eta_m1 * eta_m2
    hc = -rho * (m - 1.0) * jnp.log(g)

    # dispersion
    I1 = jnp.dot(pre.c_i1, etas)
    I2 = jnp.dot(pre.c_i2, etas)
    C1 = 1.0 / (
        1.0
        + m * (8.0 * eta - 2.0 * eta2) * eta_m2 * eta_m2
        + (1.0 - m)
        * (20.0 * eta - 27.0 * eta2 + 12.0 * eta2 * eta - 2.0 * eta2 * eta2)
        / ((1.0 - eta) * (1.0 - eta) * (2.0 - eta) * (2.0 - eta))
    )
    I = 2.0 * I1 + C1 * I2 * pre.me
    disp = (-PI * rho * rho * pre.m2es3) * I

    # dipole (PCP-SAFT); mu is factored out of phi2/phi3 so that mu = 0 rows
    # contribute exactly zero with finite gradients (reference
    # feos_torch/pcsaft_pure.py:144-160).
    J1 = jnp.dot(pre.c_j1, etas[:5])
    J2 = jnp.dot(pre.c_j2, etas[:4])
    phi2 = -rho * rho * J1 * pre.inv_s3 * PI
    # scale-safe Pade: phi2^2 mu2^2/(phi2 - phi3 mu2) = phi2 mu2^2/(1 - r mu2)
    # with the density powers of r = phi3/phi2 cancelled *analytically*:
    # r = rho (J2/J1) (4 pi / 3).  The naive form squares and cubes
    # phi2 ~ O(rho^2), which under-/overflows the TPU's emulated-f64
    # exponent range (~1e+-38) at dilute states and poisons the second
    # derivative with NaN/inf.
    ratio = rho * (J2 / jnp.where(J1 != 0.0, J1, 1.0)) * (4.0 / 3.0 * PI)
    dipole = phi2 * pre.mu2eff * pre.mu2eff / (1.0 - ratio * pre.mu2eff)

    # association (closed-form 2-site solution; degenerates to zero when
    # kappa_ab * (exp(eps_ab/T) - 1) = 0, reference feos_torch/pcsaft_pure.py:162-176)
    k = eta * eta_m1
    delta = (1.0 + k * (1.5 + 0.5 * k)) * eta_m1 * pre.delta_t
    rhoa = pre.na * rho
    rhob = pre.nb * rho
    aux = 1.0 + (rhoa - rhob) * delta
    sqrt = jnp.sqrt(aux * aux + 4.0 * rhob * delta)
    xa = 2.0 / (sqrt + 1.0 + (rhob - rhoa) * delta)
    xb = 2.0 / (sqrt + 1.0 - (rhob - rhoa) * delta)
    assoc = rhoa * (jnp.log(xa) - 0.5 * xa + 0.5) + rhob * (
        jnp.log(xb) - 0.5 * xb + 0.5
    )

    return hs + hc + disp + dipole + assoc


def phi_pure(p: PureParams, temperature, density):
    """Reduced residual Helmholtz energy density phi = A/(kB T V) in A^-3.

    Per-item scalar function; hard-sphere + hard-chain + dispersion + dipole
    + association contributions with semantics matching reference
    feos_torch/pcsaft_pure.py:106-178 (validated against golden values
    generated from the reference implementation, see tests/golden/).

    Thin wrapper over :func:`precompute_pure` + :func:`phi_pure_pre`; hot
    loops that evaluate many densities at one (parameters, T) should call
    the split form so the rho-free half is computed once.  The working
    dtype follows ``density`` (the solvers run an f32 warmup phase).
    """
    dtype = jnp.result_type(density)
    p = PureParams(*(jnp.asarray(v, dtype=dtype) for v in p))
    pre = precompute_pure(p, jnp.asarray(temperature, dtype=dtype))
    return phi_pure_pre(pre, density)


def pure_derivatives(p: PureParams, temperature, density):
    """(phi, p~, dp~/drho) at a scalar state — reference ``derivatives``.

    p~ = rho - phi + rho * phi'  and  dp~/drho = 1 + rho * phi''
    (reference feos_torch/pcsaft_pure.py:180-182).
    """
    val, d1, d2 = value_and_2derivs(lambda r: phi_pure(p, temperature, r), density)
    return val, density - val + density * d1, 1.0 + density * d2


def mu_res_pure(p: PureParams, temperature, density):
    """Reduced residual chemical potential  mu_res/kT = d(phi)/drho."""
    _, d1 = jax.jvp(
        lambda r: phi_pure(p, temperature, r), (density,), (jnp.ones_like(density),)
    )
    return d1


# ---------------------------------------------------------------------------
# Batched differentiable property functions (functional API)
# ---------------------------------------------------------------------------


def _identity_grads(ident_fn, params: PureParams, exact_args, fixed,
                    param_tangents: str = "f64"):
    """Stationary-identity evaluation with transpose-free derivatives.

    ``ident_fn(params, *exact_args, *fixed) -> (B,)`` is a batched
    stationary re-attachment identity evaluated at detached solver state
    (``fixed``).  The returned value is the plain f64 evaluation —
    bit-identical to calling ``ident_fn`` directly — but the derivative
    rule (``jax.custom_jvp``) never builds an f64 *transposed* graph: the
    flagship ``value_and_grad(vapor_pressure)`` program spends ~135 s of
    its ~140 s cold compile in the transposed emulated-f64 elementwise
    ops (measured; docs/design.md "Compile-time anatomy"), while the f64
    *forward* graph — the entire nested-Newton solver included — compiles
    in ~5 s.  State-argument partials (temperature, target pressure; at
    most two directions) always come from single-direction f64 forward
    sweeps attached as ``stop_gradient`` constants, so temperature
    gradients are f64-exact (test_properties.py pins dp_sat/dT against
    the Clapeyron identity at rtol 1e-7).  Parameter tangents pick one of
    two modes:

    * ``param_tangents="f64"`` — one f64 forward sweep per parameter
      column, ``vmap``-ed over the direction axis so the lowered HLO
      holds ONE copy of the tangent graph (the unrolled-loop form was
      measured at 149 s cold / 337 ms per step at B=1e5: twenty-one
      emulated-f64 graph copies).  Exact; used where the identity embeds
      second density derivatives (``liquid_density``,
      ``equilibrium_liquid_density``, whose f32 gradients were measured
      at up to 1.4e-3 relative — past the reference's rel-1e-4
      acceptance, /root/reference/tests/test_pcsaft_pure.py:91-161).
    * ``param_tangents="f32"`` — a single forward sweep of an f32 clone
      of the identity carrying the actual parameter tangent; its
      transpose is ordinary single-word arithmetic.  Used by the
      throughput-critical ``vapor_pressure``, whose identity is
      first-order in phi: measured parameter-gradient noise ~1e-7
      relative, three decades inside the reference's acceptance.

    The all-ones seed per direction yields per-row partials because
    ``ident_fn`` is batch-diagonal (a vmapped per-row function); the
    constant coefficients mean parameter derivatives are first-order
    only, matching the detached-solver convention these properties
    already define.
    """
    fixed = tuple(jax.lax.stop_gradient(jnp.asarray(x)) for x in fixed)

    @jax.custom_jvp
    def inner(params, *exact):
        return ident_fn(params, *exact, *fixed)

    def inner_jvp(primals, tangents):
        from jax.custom_derivatives import SymbolicZero

        p, *exact = primals
        dp, *dexact = tangents
        leaves, treedef = jax.tree_util.tree_flatten(p)
        args = tuple(
            jax.lax.stop_gradient(x) for x in (*leaves, *exact)
        )

        def f(*flat):
            q = jax.tree_util.tree_unflatten(treedef, flat[: len(leaves)])
            return ident_fn(q, *flat[len(leaves):], *fixed)

        # symbolic_zeros=True: directions nobody differentiates never
        # enter the lowered HLO — the flagship value_and_grad(vapor_
        # pressure) program (parameter gradients only) carries no f64
        # tangent graph at all
        if isinstance(dp, SymbolicZero):  # whole-tree zero tangent
            dp_leaves = [dp] * len(jax.tree_util.tree_leaves(p))
        else:
            dp_leaves = jax.tree_util.tree_leaves(
                dp, is_leaf=lambda x: isinstance(x, SymbolicZero)
            )
        tang = tuple(dp_leaves) + tuple(dexact)
        live = [not isinstance(t, SymbolicZero) for t in tang]

        val = None
        dv_terms = []

        if param_tangents == "f64":
            # every live direction in ONE vmapped f64 forward sweep:
            # seeds are scalar one-hot rows broadcast to the (B,)
            # argument shapes.  The jvp primal does not depend on the
            # mapped seed, so vmap leaves it unbatched and it doubles as
            # the value — no separate f(*args) copy in HLO.
            idx = [i for i, l in enumerate(live) if l]
            if idx:
                eye = jnp.eye(len(args), dtype=jnp.float64)[jnp.array(idx)]

                def sweep(e):
                    seeds = tuple(
                        jnp.full_like(a, e[j]) for j, a in enumerate(args)
                    )
                    return jax.jvp(f, args, seeds)

                val, g = jax.vmap(sweep, out_axes=(None, 0))(eye)
                for k, i in enumerate(idx):
                    dv_terms.append(jax.lax.stop_gradient(g[k]) * tang[i])
        else:
            # parameter tangents on an f32 clone (single sweep, actual
            # tangent direction)
            if any(live[: len(leaves)]):
                f32c = lambda xs: tuple(
                    jnp.asarray(x, dtype=jnp.float32) for x in xs
                )
                fixed32 = f32c(fixed)

                def f32(*flat):
                    q = jax.tree_util.tree_unflatten(
                        treedef, flat[: len(leaves)]
                    )
                    return ident_fn(q, *flat[len(leaves):], *fixed32)

                dp32 = tuple(
                    jnp.asarray(t, dtype=jnp.float32) if l
                    else jnp.zeros_like(a, dtype=jnp.float32)
                    for t, l, a in zip(
                        tang[: len(leaves)], live[: len(leaves)], args
                    )
                )
                dex_zero = tuple(jnp.zeros_like(a, dtype=jnp.float32)
                                 for a in args[len(leaves):])
                _, dv32 = jax.jvp(f32, f32c(args), dp32 + dex_zero)
                dv_terms.append(dv32.astype(jnp.float64))
            # live state-argument partials: one f64 forward sweep each
            # (<= 2); the first sweep's primal doubles as the value
            for i, ti in enumerate(tang[len(leaves):]):
                if not live[len(leaves) + i]:
                    continue
                seeds = tuple(
                    jnp.ones_like(a) if j == len(leaves) + i
                    else jnp.zeros_like(a)
                    for j, a in enumerate(args)
                )
                vi, gi = jax.jvp(f, args, seeds)
                val = vi if val is None else val
                dv_terms.append(jax.lax.stop_gradient(gi) * ti)

        if val is None:
            val = f(*args)
        dv = jnp.zeros_like(val)
        for t in dv_terms:
            dv = dv + t
        return val, dv

    inner.defjvp(inner_jvp, symbolic_zeros=True)

    return inner(params, *exact_args)


def vapor_pressure(parameters, temperature):
    """Batched vapor pressure in Pa with parameter gradients.

    Replaces reference ``PcSaftPure.vapor_pressure``
    (feos_torch/pcsaft_pure.py:201-215): the VLE densities are solved by a
    non-differentiated batched Newton (stop_gradient), and the pressure is
    re-attached through the stationary identity

        p~ = -(a_V - a_L + ln(rho_V/rho_L)) / (1/rho_V - 1/rho_L)

    which is stationary w.r.t. both converged densities, so the identity's
    derivative equals the implicit-function derivative of the solve.
    Parameter tangents ride an f32 clone of the (first-order-in-phi)
    identity — measured ~1e-7 relative noise, three decades inside the
    reference's own rel-1e-4 gradient acceptance — while temperature
    tangents are f64-exact (see :func:`_identity_grads`).

    Returns ``(nans, p)`` where ``p`` has the full batch length with NaN at
    failed rows (fixed shapes; no compaction).
    """
    from ..solvers.vle import pure_vle

    p = PureParams.from_array(parameters)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    rho_v, rho_l, ok = jax.vmap(pure_vle)(_stop(p), jax.lax.stop_gradient(temperature))
    # sanitize failed lanes BEFORE re-attachment: a masked-out lane whose
    # density is NaN/0 would otherwise produce NaN *derivatives*, and the
    # zero cotangent a downstream jnp.where routes to it cannot repair
    # 0 * NaN — one failed row in a batch would poison the whole gradient
    rho_v = jnp.where(ok, jax.lax.stop_gradient(rho_v), 1e-5)
    rho_l = jnp.where(ok, jax.lax.stop_gradient(rho_l), 1e-3)

    def attach(pi, t, rv, rl):
        a_l = phi_pure(pi, t, rl) / rl
        a_v = phi_pure(pi, t, rv) / rv
        return -(a_v - a_l + jnp.log(rv / rl)) / (1.0 / rv - 1.0 / rl)

    p_red = _identity_grads(
        lambda pi, t, rv, rl: jax.vmap(attach)(pi, t, rv, rl),
        p, (temperature,), (rho_v, rho_l), param_tangents="f32",
    )
    pressure = p_red * temperature * REDUCED_TO_PA_PER_KT
    return ~ok, jnp.where(ok, pressure, jnp.nan)


def liquid_density(parameters, temperature, pressure):
    """Batched liquid density (kmol/m^3) at (T, p) with parameter gradients.

    Replaces reference ``PcSaftPure.liquid_density``
    (feos_torch/pcsaft_pure.py:184-199): non-differentiated NPT Newton solve
    from a liquid-branch initialization, then one symbolic Newton step
    re-attaches the gradient:  rho <- rho - (p~(rho) - p~*) / (dp~/drho).
    """
    from ..solvers.vle import npt_density

    p = PureParams.from_array(parameters)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    pressure = jnp.asarray(pressure, dtype=jnp.float64)
    p_red = pressure / temperature * PA_PER_KT_TO_REDUCED

    rho, ok = jax.vmap(lambda pi, t, pr: npt_density(pi, t, pr, liquid=True))(
        _stop(p), jax.lax.stop_gradient(temperature), jax.lax.stop_gradient(p_red)
    )
    # sanitize failed lanes before re-attachment (see vapor_pressure)
    rho = jnp.where(ok, jax.lax.stop_gradient(rho), 1e-3)

    def attach(pi, t, pr, r):
        _, ptilde, dptilde = pure_derivatives(pi, t, r)
        return r - (ptilde - pr) / dptilde

    rho = _identity_grads(
        lambda pi, t, pr, r: jax.vmap(attach)(pi, t, pr, r),
        p, (temperature, p_red), (rho,),
    )
    return ~ok, jnp.where(ok, rho / KMOL_M3_TO_REDUCED, jnp.nan)


def equilibrium_liquid_density(parameters, temperature):
    """Batched equilibrium (saturated) liquid density in kmol/m^3.

    Replaces reference ``PcSaftPure.equilibrium_liquid_density``
    (feos_torch/pcsaft_pure.py:217-233): combines the stationary
    vapor-pressure identity with one Newton re-attachment step on the
    liquid density.
    """
    from ..solvers.vle import pure_vle

    p = PureParams.from_array(parameters)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    rho_v, rho_l, ok = jax.vmap(pure_vle)(_stop(p), jax.lax.stop_gradient(temperature))
    # sanitize failed lanes before re-attachment (see vapor_pressure)
    rho_v = jnp.where(ok, jax.lax.stop_gradient(rho_v), 1e-5)
    rho_l = jnp.where(ok, jax.lax.stop_gradient(rho_l), 1e-3)

    def attach(pi, t, rv, rl):
        a_l, p_l, dp_l = pure_derivatives(pi, t, rl)
        a_l = a_l / rl
        a_v = phi_pure(pi, t, rv) / rv
        p_eq = -(a_v - a_l + jnp.log(rv / rl)) / (1.0 / rv - 1.0 / rl)
        return rl - (p_l - p_eq) / dp_l

    rho = _identity_grads(
        lambda pi, t, rv, rl: jax.vmap(attach)(pi, t, rv, rl),
        p, (temperature,), (rho_v, rho_l),
    )
    return ~ok, jnp.where(ok, rho / KMOL_M3_TO_REDUCED, jnp.nan)


def critical_point(parameters):
    """Batched pure-component critical point with parameter gradients.

    Beyond the reference's capability set (its solvers stop below the
    critical point; feos_torch/pcsaft_pure.py exposes no critical-point
    API): solves dp/drho = 0, d2p/drho2 = 0 simultaneously
    (:func:`feos_tpu.solvers.vle.pure_critical`), then re-attaches exact
    implicit-function gradients by one symbolic Newton step on the
    converged (ln rho_c, ln T_c) — the same detached-solver convention as
    :func:`liquid_density`.

    Returns ``(nans, T_c (K), rho_c (kmol/m^3))``.
    """
    from ..solvers.vle import _crit_residual, _val_and_jac, pure_critical

    p = PureParams.from_array(parameters)
    rho_c, t_c, ok = jax.vmap(pure_critical)(_stop(p))
    # sanitize failed lanes before re-attachment (see vapor_pressure)
    rho_c = jnp.where(ok, jax.lax.stop_gradient(rho_c), 1e-3)
    t_c = jnp.where(ok, jax.lax.stop_gradient(t_c), 300.0)

    def attach(pi, rc, tc):
        u = jax.lax.stop_gradient(jnp.stack([jnp.log(rc), jnp.log(tc)]))
        r = _crit_residual(pi, u)
        # the Jacobian's parameter dependence contributes O(r) ~ 0 to the
        # implicit-function gradient; stopping it keeps reverse-mode AD to
        # one level over the (third-order-forward) residual instead of
        # differentiating the fourth-order _val_and_jac graph
        J = jax.lax.stop_gradient(
            _val_and_jac(lambda v: _crit_residual(_stop(pi), v), u)[1]
        )
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        du = jnp.stack(
            [
                (J[1, 1] * r[0] - J[0, 1] * r[1]) / det,
                (-J[1, 0] * r[0] + J[0, 0] * r[1]) / det,
            ]
        )
        return jnp.exp(u - du)

    out = jax.vmap(attach)(p, rho_c, t_c)
    t_out = jnp.where(ok, out[:, 1], jnp.nan)
    rho_out = jnp.where(ok, out[:, 0] / KMOL_M3_TO_REDUCED, jnp.nan)
    return ~ok, t_out, rho_out


def boiling_temperature(parameters, pressure, t0):
    """Batched boiling temperature (K) at given pressure with parameter
    and pressure gradients.

    Beyond the reference surface (pressure-explicit only): secant outer
    iteration in (1/T, ln p) over :func:`vapor_pressure` + one symbolic
    Newton step in T for exact implicit-function gradients — see
    solvers/tsolve.py.  ``t0`` is the initial temperature estimate (same
    convention as the reference's initial-pressure argument to its
    mixture solvers, src/pcsaft.rs:155).

    Returns ``(nans, t)`` in the pure-model return order.
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

    def solve_warm(T, u):
        nans, pw = vapor_pressure(par_s, T)
        return jnp.log(pw), ~nans, u  # pw is NaN on failed rows

    # the pure solver has no warm-start state; a dummy scalar carry keeps
    # the generic loop's pytree handling trivial
    t_star, _, done = saturation_temperature_loop(
        solve_warm, t0, sg(jnp.log(p_target)), jnp.zeros((B,)),
    )

    def solve_diff(T, u):
        _, pw = vapor_pressure(parameters, T)
        return pw

    t_out = reattach_temperature(
        solve_diff, t_star, jnp.zeros((B,)), p_target, done
    )
    return ~done, t_out


def _stop(p: PureParams) -> PureParams:
    return jax.tree_util.tree_map(jax.lax.stop_gradient, p)


class PcSaftPure:
    """Object-style facade mirroring the reference class
    (feos_torch/pcsaft_pure.py:89).

    Methods return ``(nans, values)`` in the reference's order, but with
    fixed-shape NaN-masked outputs instead of in-place compaction.  For
    gradient-based regression use the module-level functional API with
    ``jax.grad`` / ``jax.value_and_grad``.
    """

    def __init__(self, parameters):
        self.parameters = jnp.asarray(parameters, dtype=jnp.float64)

    def helmholtz_energy(self, temperature, density):
        p = PureParams.from_array(self.parameters)
        return jax.vmap(phi_pure)(
            p,
            jnp.asarray(temperature, dtype=jnp.float64),
            jnp.asarray(density, dtype=jnp.float64),
        )

    def derivatives(self, temperature, density):
        p = PureParams.from_array(self.parameters)
        return jax.vmap(pure_derivatives)(
            p,
            jnp.asarray(temperature, dtype=jnp.float64),
            jnp.asarray(density, dtype=jnp.float64),
        )

    def residual_properties(self, temperature, density):
        """Batched residual caloric/state property set at (T, rho) — see
        :mod:`feos_tpu.properties` (beyond the reference surface)."""
        from ..properties import pure_properties

        return pure_properties(self.parameters, temperature, density)

    def vapor_pressure(self, temperature):
        return vapor_pressure(self.parameters, temperature)

    def liquid_density(self, temperature, pressure):
        return liquid_density(self.parameters, temperature, pressure)

    def equilibrium_liquid_density(self, temperature):
        return equilibrium_liquid_density(self.parameters, temperature)

    def critical_point(self):
        return critical_point(self.parameters)

    def boiling_temperature(self, pressure, t0):
        """Boiling temperature at given pressure (beyond the reference;
        see :func:`boiling_temperature`)."""
        return boiling_temperature(self.parameters, pressure, t0)
