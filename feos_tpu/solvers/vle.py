"""Batched gradient-free VLE and density solvers (pure JAX, TPU-native).

These replace the reference's native Rust solver backend
(src/pcsaft.rs:82-231 and the `feos` crate algorithms behind it:
``State::new_npt``, ``PhaseEquilibrium::pure/bubble_point/dew_point``).
Design (SURVEY.md section 7):

* per-item Newton iterations written as ``lax.while_loop`` with static
  shapes, then ``jax.vmap``-ed over the batch — the TPU equivalent of the
  reference's rayon ``par_map_collect`` row parallelism (src/pcsaft.rs:88);
* all thermodynamic states needed by one iteration (vapor + liquid, or the
  several initialization branches) are **stacked and evaluated through one
  batched phi graph** — this keeps the XLA program small (one Helmholtz
  graph instance per loop body instead of one per state per derivative
  direction), which is what makes these nested-Newton programs compile in
  seconds instead of minutes;
* rows that converge early are frozen in place (masked updates) while the
  remaining rows iterate — batch-synchronized iteration;
* convergence is accepted on *residual* magnitude, not step size, so the
  solver behaves identically under exact f64 (CPU) and the TPU's
  emulated-f64 arithmetic;
* failures are reported as a boolean ``ok`` flag per row, never exceptions
  (the reference's ``.ok()`` -> mask protocol, src/pcsaft.rs:91-94);
* everything runs under ``stop_gradient`` — parameter gradients are
  re-attached outside through stationary thermodynamic identities
  (see feos_tpu.models.*), so these loops are never differentiated.
  Residual-level state errors of ~1e-9 induce only ~1e-18 relative
  property errors (the identities are stationary).

All quantities are in reduced units: densities in A^-3, reduced pressure
p~ = p A^3/(kB T), reduced chemical potential mu~ = mu/(kB T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pcsaft_pure import (
    PureParams, PurePre, phi_pure, phi_pure_pre, precompute_pure,
)
from ..ops.derivatives import value_and_2derivs

PI = np.pi

_MAX_NPT_ITER = 60
_MAX_VLE_ITER = 80
# Step-based exit tolerance: must be reachable under the TPU's emulated-f64
# arithmetic (~3e-14 relative noise; Newton steps jitter at the noise/scale
# ratio), so loops also carry residual-based exits at the acceptance level.
_STEP_TOL = 3e-12
# Residual acceptance sits well above the f64 cancellation-noise floor of
# p~ = rho - phi + rho*phi' (~1e-9 on the vapor-density scale) but far below
# any genuinely unconverged state; the stationary re-attachment identities
# make resulting property errors O(residual^2).
_RES_RTOL = 1e-6
# f32 phi-derivative evaluation floors (reduced densities, A^-3).  AD of
# the composition terms (x = rho / sum(rho)) builds 1/S^k intermediates:
# f32 FIRST derivatives overflow (inf -> NaN steps) below a total density
# S ~ 5e-20 (1/S^2 > 3.4e38) and SECOND derivatives below S ~ 1.4e-13
# (1/S^3).  A sub-Pa dew point has a bulk-vapor density in exactly this
# range, so every f32 phi-derivative closure is evaluated at
# max(rho, floor).  The induced error is O(|phi''| * floor) — orders of
# magnitude below the f32 phase tolerances (the near-ideal vapor's phi
# derivatives are ~0 there anyway) — and the f64 residual, which alone
# defines accepted roots, is never floored (f64 overflows only below
# S ~ 1e-103).
_GRAD_RHO_FLOOR_F32 = 1e-18
_HESS_RHO_FLOOR_F32 = 1e-11


# ---------------------------------------------------------------------------
# Pure-component solvers
# ---------------------------------------------------------------------------


def _eos_pure_multi(pre: PurePre, rho):
    """(p~, dp~/drho, mu~_tot, dmu~/drho) for a vector of densities (k,).

    One batched (phi, phi', phi'') graph serves all k states; the rho-free
    half of phi is precomputed once per solve (``pre``).
    """
    val, d1, d2 = jax.vmap(
        lambda r: value_and_2derivs(lambda rr: phi_pure_pre(pre, rr), r)
    )(rho)
    ptilde = rho - val + rho * d1
    dptilde = 1.0 + rho * d2
    mu = d1 + jnp.log(rho)
    dmu = d2 + 1.0 / rho
    return ptilde, dptilde, mu, dmu


def _eos_pure(p: PureParams, temperature, rho):
    """(p~, dp~/drho, mu~_tot, dmu~/drho) at a scalar density."""
    val, d1, d2 = value_and_2derivs(lambda r: phi_pure(p, temperature, r), rho)
    ptilde = rho - val + rho * d1
    dptilde = 1.0 + rho * d2
    mu = d1 + jnp.log(rho)
    dmu = d2 + 1.0 / rho
    return ptilde, dptilde, mu, dmu


def _eos_pure_first(pre: PurePre, rho):
    """(p~, mu~_tot) only — a first-order graph (no phi'')."""
    vals, d1 = jax.vmap(
        lambda r: jax.jvp(
            lambda rr: phi_pure_pre(pre, rr), (r,), (jnp.ones_like(r),)
        )
    )(rho)
    ptilde = rho - vals + rho * d1
    mu = d1 + jnp.log(rho)
    return ptilde, mu


def _phi_d2_multi(pre: PurePre, rho):
    """phi'' for a vector of densities (second-order graph; used in f32
    for Jacobian assembly)."""
    return jax.vmap(
        lambda r: value_and_2derivs(lambda rr: phi_pure_pre(pre, rr), r)[2]
    )(rho)


def _npt_multi_pure(
    pre: PurePre, p_targets, rho0, branch_sign,
    step_tol=_STEP_TOL, res_tol=_RES_RTOL,
):
    """Solve k independent pure NPT problems p~(rho_k) = p_target_k in one loop.

    ``branch_sign`` is +1 for liquid-branch solves and -1 for vapor-branch
    solves; inside the mechanically unstable region (dp~/drho <= 0) the
    iterate walks toward the requested branch.  Replaces the feos crate's
    ``State::new_npt`` (reference src/pcsaft.rs:105-129).  Runs in the
    dtype of its inputs (the VLE wrapper uses an f32 warmup phase).

    The last evaluated (p~, dp~, mu~) is carried in the loop state so that
    acceptance (and the caller's saturation estimate) need no post-loop
    re-evaluation — converged rows freeze at the iterate their carried
    values were computed at.  One (phi, phi', phi'') graph per program.

    Returns ``(rho (k,), ok (k,), mu (k,))`` with residual-based acceptance.
    """
    k = p_targets.shape[0]
    dtype = p_targets.dtype
    lr_max = jnp.log(0.74 / pre.eta_m)  # packing-fraction cap

    def cond(state):
        _, _, it, done = state
        return jnp.any(~done) & (it < _MAX_NPT_ITER)

    def body(state):
        lr, keep, it, done = state
        rho = jnp.exp(lr)
        ptilde, dptilde, mu, _ = _eos_pure_multi(pre, rho)
        r = ptilde - p_targets
        dr = rho * dptilde  # d p~ / d ln rho
        newton = r / jnp.where(dr > 0.0, dr, 1.0)
        step = jnp.where(dr > 0.0, jnp.clip(newton, -0.5, 0.5), -branch_sign * 0.2)
        converged = (jnp.abs(newton) < step_tol) & (dr > 0.0)
        bad = ~jnp.isfinite(step)
        step = jnp.where(bad, 0.0, step)
        freeze = done | converged | bad
        lr_new = jnp.where(freeze, lr, jnp.minimum(lr - step, lr_max))
        keep_new = jnp.where(done, keep, jnp.stack([ptilde, dptilde, mu]))
        return lr_new, keep_new, it + 1, freeze

    lr0 = jnp.log(rho0)
    keep0 = jnp.stack(
        [jnp.full((k,), jnp.inf, dtype), jnp.ones((k,), dtype), jnp.zeros((k,), dtype)]
    )
    lr, keep, _, _ = jax.lax.while_loop(
        cond, body, (lr0, keep0, 0, jnp.zeros(k, dtype=bool))
    )
    rho = jnp.exp(lr)
    ptilde, dptilde, mu = keep[0], keep[1], keep[2]
    resid = jnp.abs(ptilde - p_targets) / jnp.abs(
        rho * jnp.where(dptilde > 0.0, dptilde, 1.0)
    )
    ok = jnp.isfinite(rho) & (dptilde > 0.0) & (resid < res_tol)
    return rho, ok, mu


def npt_density(
    p: PureParams, temperature, p_target, liquid: bool = True,
    mixed_precision: bool = True,
):
    """Single-branch pure NPT solve; see ``_npt_multi_pure``.

    Liquid branch initializes at packing fraction eta = 0.5, vapor branch at
    the ideal-gas density (p~ = rho).  With ``mixed_precision`` the bulk of
    the Newton iterations run in f32 followed by an f64 polish (2-3
    iterations, quadratic from ~1e-5); acceptance is always f64.
    """
    pre = precompute_pure(p, temperature)
    eta_factor = pre.eta_m
    if liquid:
        rho0 = 0.5 / eta_factor
        sign = 1.0
    else:
        rho0 = jnp.maximum(p_target, 1e-30)
        sign = -1.0
    if mixed_precision:
        f32 = jnp.float32
        pre32 = precompute_pure(
            PureParams(*(x.astype(f32) for x in p)), temperature.astype(f32)
        )
        rho32, ok32, _ = _npt_multi_pure(
            pre32,
            p_target.astype(f32)[None],
            rho0.astype(f32)[None],
            jnp.full((1,), sign, dtype=f32),
            step_tol=1e-5,
            res_tol=3e-3,
        )
        rho0 = jnp.where(ok32[0], rho32[0].astype(rho0.dtype), rho0)
    rho, ok, _ = _npt_multi_pure(
        pre,
        p_target[None],
        rho0[None],
        jnp.full((1,), sign, dtype=rho0.dtype),
    )
    eta = eta_factor * rho[0]
    return rho[0], ok[0] & (eta < 0.7)


# Static packing-fraction grid used to bracket the unstable region for the
# near-critical initialization (see ``_spinodal_estimate``).
_ETA_GRID = np.concatenate(
    [np.geomspace(1e-4, 0.01, 8, endpoint=False), np.linspace(0.01, 0.55, 40)]
)


def _spinodal_estimate(pre: PurePre):
    """Grid-scan estimate of the inflection state of p~(rho).

    Evaluates dp~/drho on a static packing-fraction grid and returns
    ``(p_inf, rho_inf, supercritical)`` where ``p_inf`` is the reduced
    pressure at the minimum of dp~/drho (which lies strictly between the two
    spinodal pressures whenever a van-der-Waals loop exists), ``rho_inf``
    the corresponding density, and ``supercritical`` flags
    min dp~/drho > 0 (no loop, no VLE).  The feos crate hides its
    equivalent initialization inside ``PhaseEquilibrium::pure``
    (src/pcsaft.rs:91); this grid scan is the fixed-shape TPU analogue.
    """
    dtype = pre.m.dtype
    rhos = jnp.asarray(_ETA_GRID, dtype=dtype) / pre.eta_m
    ptildes, dptildes, _, _ = _eos_pure_multi(pre, rhos)
    i_min = jnp.argmin(dptildes)
    supercritical = dptildes[i_min] > 0.0
    p_inf = jnp.maximum(ptildes[i_min], jnp.asarray(1e-12, dtype=dtype))
    rho_inf = rhos[i_min]
    return p_inf, rho_inf, supercritical


def _vle_init(pre: PurePre, step_tol, res_tol=_RES_RTOL):
    """Initial (ln rho_V, ln rho_L) for the pure VLE Newton.

    Two regimes, selected per row with fixed shapes:

    * deep subcritical: the liquid density at vanishing pressure gives a
      saturation-pressure estimate via the ideal-vapor identity
      ln p~0 = mu~_tot(rho_L);
    * near critical (no liquid root at vanishing pressure): both phases
      start from NPT solves at the inflection pressure of the van-der-Waals
      loop (``_spinodal_estimate``).
    """
    dtype = pre.m.dtype
    eta_factor = pre.eta_m
    p_inf, rho_inf, supercritical = _spinodal_estimate(pre)

    # lane 0: liquid at vanishing pressure; lane 1: liquid at p_inf
    rho_init, ok_init, mu_init = _npt_multi_pure(
        pre,
        jnp.stack([jnp.asarray(1e-10, dtype=dtype), p_inf]),
        jnp.stack([0.5 / eta_factor, 0.5 / eta_factor]),
        jnp.array([1.0, 1.0], dtype=dtype),
        step_tol=step_tol,
        res_tol=res_tol,
    )
    ok_tiny = ok_init[0] & (eta_factor * rho_init[0] < 0.7)
    rho_l0 = jnp.where(ok_tiny, rho_init[0], rho_init[1])
    ok_l = ok_tiny | ok_init[1]

    # saturation estimate from the ideal-vapor identity ln p~0 = mu~(rho_L),
    # with mu carried out of the NPT loop (no extra phi evaluation)
    p_mu = jnp.exp(jnp.clip(mu_init[0], -78.0, 78.0))
    p0 = jnp.where(ok_tiny, p_mu, p_inf)

    rho_v0, ok_v, _ = _npt_multi_pure(
        pre,
        p0[None],
        jnp.maximum(p0, 1e-30)[None],
        jnp.full((1,), -1.0, dtype=dtype),
        step_tol=step_tol,
        res_tol=res_tol,
    )
    # The vapor density estimate must live in LOG space: strongly
    # associating fluids far below the normal boiling point have
    # p~ ~ e^-90, which underflows f32 (and the exp clip above) as a
    # value.  Where the NPT refinement is usable take its log; otherwise
    # fall back to the ideal-vapor identity ln rho_V = mu~_tot(rho_L)
    # directly — mu is ~-90, perfectly representable — which at such
    # pressures is accurate to O(B2 * rho_V) ~ 1e-38 relative.
    ln_rho_v0 = jnp.where(
        ok_v[0] & (p0 > 1e-33) & (rho_v0[0] > 0.0),
        jnp.log(jnp.where(rho_v0[0] > 0.0, rho_v0[0], 1.0)),
        jnp.where(ok_tiny, mu_init[0], jnp.log(jnp.maximum(p0, 1e-300))),
    )

    lvl0 = jnp.stack([ln_rho_v0, jnp.log(rho_l0)])
    return lvl0, jnp.log(rho_inf), ok_l, supercritical


def _vle_newton(
    pre: PurePre, lvl0, ln_inf, max_iter, step_tol, res_rtol,
    res_abs, mu_tol, jac_pre=None,
):
    """Damped 2x2 Newton on (ln rho_V, ln rho_L) with branch projection.

    Iterates stay on their branch (rho_V below, rho_L above the inflection
    density) — NaN-proof under the noisier TPU f64 emulation; exits on step
    size or on residuals at the given tolerance level.  The last evaluated
    (r_p, r_mu, dpt_V, dpt_L) is carried in the loop state, so acceptance
    needs no post-loop re-evaluation.  Rows that exit on step size or
    residual APPLY the final Newton step before freezing (free: the step is
    already computed; quadratic convergence turns an accepted ~1e-9
    residual into a ~1e-18-class state error, which is what puts the
    converged densities at the reference's 1e-10 accuracy bar), so the
    carried residual is a strict upper bound for the returned iterate;
    noise-floor-stalled rows freeze in place (their step is noise).

    With ``jac_pre`` (an f32 :class:`PurePre`) the curvature phi'' comes
    from a second-order f32 graph while the residual (pt, mu) stays
    first-order f64; the 1/rho ideal parts of the Jacobian are assembled
    in f64, so the scheme stays finite even at vapor densities that
    underflow f32.  The root is defined by the residual, so Jacobian
    precision costs at most an extra iteration — but it removes all
    second-order f64 content, the dominant TPU compile cost.

    Returns ``(lvl, keep)`` with ``keep = [r_p, r_mu, dpt_V, dpt_L]``.
    """

    def cond(state):
        _, _, _, _, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        lvl, keep, best, stale, it, done = state
        rho = jnp.exp(lvl)  # (2,) = [rho_V, rho_L]
        if jac_pre is None:
            pt, dpt, mu, dmu = _eos_pure_multi(pre, rho)
        else:
            pt, mu = _eos_pure_first(pre, rho)
            rho32 = jnp.maximum(rho, 1e-35).astype(jnp.float32)
            d2 = _phi_d2_multi(jac_pre, rho32).astype(lvl.dtype)
            dpt = 1.0 + rho * d2
            dmu = d2 + 1.0 / rho
        r1 = pt[0] - pt[1]
        r2 = mu[0] - mu[1]
        j00 = rho[0] * dpt[0]
        j01 = -rho[1] * dpt[1]
        j10 = rho[0] * dmu[0]
        j11 = -rho[1] * dmu[1]
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        dv = (j11 * r1 - j01 * r2) / det
        dl = (-j10 * r1 + j00 * r2) / det
        # exit on step size or on residuals at the acceptance level
        # (the absolute term covers the liquid-pressure cancellation noise)
        p_allow = res_rtol * jnp.abs(j00) + res_abs * jnp.abs(rho[1] * dpt[1])
        res_ok = (jnp.abs(r1) < p_allow) & (jnp.abs(r2) < mu_tol)
        # noise-floor stall detection, same scheme as _mix_newton: a row
        # whose residual merit (in units of res_ok) stops improving for 3
        # consecutive armed iterations is limit-cycling at the working
        # dtype's evaluation-noise floor (measured on the north-star batch:
        # 66/100k rows burned the full 80 f32 iterations, dragging the
        # whole batch-synchronized loop; median row needs 2)
        merit = jnp.maximum(jnp.abs(r1) / p_allow, jnp.abs(r2) / mu_tol)
        improved = merit < 0.9 * best
        armed = merit < 1e3
        stale_new = jnp.where(
            improved, 0, jnp.where(armed, stale + 1, stale)
        )
        best_new = jnp.minimum(best, merit)
        stalled = stale_new >= 3
        converged = ((jnp.abs(dv) + jnp.abs(dl)) < step_tol) | res_ok | stalled
        step = jnp.clip(jnp.stack([dv, dl]), -0.2, 0.2)
        bad = ~jnp.all(jnp.isfinite(step))
        step = jnp.where(bad, 0.0, step)
        new = lvl - step
        new = new.at[0].set(jnp.minimum(new[0], ln_inf))
        new = new.at[1].set(jnp.maximum(new[1], ln_inf))
        freeze = done | converged | bad
        # non-stalled active rows always take the computed step — including
        # the FINAL step on the iteration they converge (see docstring)
        apply = (~done) & (~bad) & (~stalled)
        lvl_new = jnp.where(apply, new, lvl)
        keep_new = jnp.where(done, keep, jnp.stack([r1, r2, dpt[0], dpt[1]]))
        return lvl_new, keep_new, best_new, stale_new, it + 1, freeze

    keep0 = jnp.full((4,), jnp.inf, dtype=lvl0.dtype)
    inf0 = jnp.asarray(jnp.inf, dtype=lvl0.dtype)
    lvl, keep, _, _, _, _ = jax.lax.while_loop(
        cond, body, (lvl0, keep0, inf0, 0, 0, jnp.array(False))
    )
    return lvl, keep


def pure_vle(p: PureParams, temperature, mixed_precision: bool = True):
    """Pure-component vapor-liquid equilibrium at temperature T.

    Replaces ``PhaseEquilibrium::pure`` behind reference src/pcsaft.rs:91.
    Equilibrium conditions: p~(rho_V) = p~(rho_L) and mu~(rho_V) = mu~(rho_L)
    solved by a damped 2x2 Newton iteration in (ln rho_V, ln rho_L).

    With ``mixed_precision`` (default), the initialization and the bulk of
    the Newton iterations run in f32 — several times cheaper than the TPU's
    emulated f64 — followed by a short f64 polish (quadratic convergence
    from ~1e-5 needs ~3 iterations); final acceptance is always f64.  Rows
    whose f32 phase went astray simply enter the f64 phase from a worse
    point and either recover or are masked.

    Returns ``(rho_v, rho_l, ok)``; supercritical rows are masked.
    """
    pre = precompute_pure(p, temperature)
    if mixed_precision:
        f32 = jnp.float32
        pre32 = precompute_pure(
            PureParams(*(x.astype(f32) for x in p)), temperature.astype(f32)
        )
        # f32 pressure-residual noise near the spinodal far exceeds the f64
        # acceptance ratio; the polish re-verifies everything in f64
        lvl0, ln_inf, ok_l, supercritical = _vle_init(
            pre32, step_tol=1e-5, res_tol=3e-3
        )
        lvl0, _ = _vle_newton(
            pre32, lvl0, ln_inf, max_iter=_MAX_VLE_ITER, step_tol=1e-5,
            res_rtol=1e-5, res_abs=1e-7, mu_tol=1e-4,
        )
        lvl0 = lvl0.astype(p.m.dtype)
        ln_inf = ln_inf.astype(p.m.dtype)
        # exact f64 Jacobian for the polish: near-critical rows have
        # ill-conditioned 2x2 systems where an f32 Jacobian stalls below
        # the acceptance residual (measured: -0.7% converged, and the
        # stalled rows drive the whole batched loop to max_iter);
        # 18 iterations cover the ultra-low-psat rows, which now start
        # within ~1e-2 of the root thanks to the log-space vapor init
        polish_iter = 18
    else:
        lvl0, ln_inf, ok_l, supercritical = _vle_init(pre, step_tol=_STEP_TOL)
        polish_iter = _MAX_VLE_ITER

    lvl, keep = _vle_newton(
        pre, lvl0, ln_inf, max_iter=polish_iter, step_tol=_STEP_TOL,
        res_rtol=1e-9, res_abs=1e-12, mu_tol=1e-9, jac_pre=None,
    )
    rho = jnp.exp(lvl)
    rho_v, rho_l = rho[0], rho[1]

    # residual-based acceptance from the carried loop state; the pressure
    # tolerance carries an absolute allowance for the f64 cancellation noise
    # of the *liquid* pressure (terms of magnitude ~rho_l*dp_l), which
    # dominates when the vapor pressure itself is many orders smaller
    # (strong association at low T)
    r_p, r_mu, dpt_v, dpt_l = keep[0], keep[1], keep[2], keep[3]
    # the coefficient is calibrated against the measured evaluation-noise
    # floor of the liquid p~ (~4e-13 x scale on XLA:CPU f64; up to ~2.6e-12
    # x scale under the TPU's emulated f64 in LARGE-BATCH context, where
    # layout-dependent fusion of the float-float arithmetic rounds
    # differently than single-row programs — measured on a converged
    # mu-residual ~1e-10 row that the former 2e-12 allowance rejected):
    # acceptance must sit above the floor or rows at low-but-not-tiny vapor
    # pressures get rejected on noise.  The value error this admits stays
    # quadratically suppressed by the stationary re-attachment identity:
    # drho/rho ~ r_p/(rho_v dpt_v) ~ 2e-5 worst case -> relative pressure
    # error O(4e-10), still below the 1e-8 accuracy bar.
    p_noise = 4e-12 * jnp.abs(rho_l * dpt_l)
    res_p_ok = jnp.abs(r_p) < (_RES_RTOL * jnp.abs(rho_v * dpt_v) + p_noise)
    ok = (
        ok_l
        & (~supercritical)
        & jnp.all(jnp.isfinite(rho))
        & res_p_ok
        & (jnp.abs(r_mu) < 1e-7)
        & (rho_l > rho_v * (1.0 + 1e-6))
        & (dpt_v > 0.0)
        & (dpt_l > 0.0)
    )
    return rho_v, rho_l, ok


def _phi_d2_d3(p: PureParams, temperature, rho):
    """(phi'', phi''') at a scalar state — the criticality derivatives."""
    one = jnp.ones_like(rho)

    def d2_of(r):
        return value_and_2derivs(lambda rr: phi_pure(p, temperature, rr), r)[2]

    return jax.jvp(d2_of, (rho,), (one,))


def _crit_residual(p: PureParams, u):
    """Residuals of the pure critical-point conditions at u = [ln rho, ln T].

    R1 = dp~/drho = 1 + rho phi''          (mechanical stability margin)
    R2 = rho d2p~/drho2 = rho (phi'' + rho phi''')   (inflection condition)

    Both are O(1) dimensionless near the solution, so one unscaled 2x2
    Newton treats them evenly.
    """
    e = jnp.exp(u)  # vector form: see _mix_newton.residual_aux
    rho, t = e[0], e[1]
    d2, d3 = _phi_d2_d3(p, t, rho)
    r1 = 1.0 + rho * d2
    r2 = rho * (d2 + rho * d3)
    return jnp.stack([r1, r2])


_CRIT_RES_TOL = 3e-8


def pure_critical(p: PureParams, max_iter: int = 60):
    """Critical point (rho_c, T_c) of a pure PC-SAFT fluid (per item).

    Beyond the reference's capability set (its VLE solvers stop below the
    critical point, src/pcsaft.rs:82-103); solves dp/drho = 0 and
    d2p/drho2 = 0 simultaneously by a damped 2x2 Newton in
    (ln rho, ln T), initialized from the empirical corresponding-states
    estimate T0 = eps_k (0.89 + 0.38 m) and the density of minimum
    dp~/drho on the static eta grid at T0.

    Runs straight f64 (no mixed-precision phases: this is a setup-scale
    solve, not a hot loop).  Returns ``(rho_c, T_c, ok)``.
    """
    dtype = p.m.dtype
    t0 = p.epsilon_k * (0.89 + 0.38 * p.m)
    pre0 = precompute_pure(p, t0)
    rhos = jnp.asarray(_ETA_GRID, dtype=dtype) / pre0.eta_m
    _, dptildes, _, _ = _eos_pure_multi(pre0, rhos)
    rho0 = rhos[jnp.argmin(dptildes)]
    u0 = jnp.stack([jnp.log(rho0), jnp.log(t0)])

    def cond(state):
        _, _, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        u, keep, it, done = state
        r, J = _val_and_jac(lambda v: _crit_residual(p, v), u)
        det = J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0]
        det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
        du = jnp.stack(
            [
                (J[1, 1] * r[0] - J[0, 1] * r[1]) / det,
                (-J[1, 0] * r[0] + J[0, 0] * r[1]) / det,
            ]
        )
        converged = jnp.max(jnp.abs(r)) < _CRIT_RES_TOL
        bad = ~jnp.all(jnp.isfinite(du))
        step = jnp.where(bad, 0.0, jnp.clip(du, -0.2, 0.2))
        new = u - step
        # keep the iterate physical: eta(T) < 0.6, T within a broad band of
        # the corresponding-states estimate
        eta_m_new = PI / 6.0 * p.m * (
            p.sigma * (1.0 - 0.12 * jnp.exp(-3.0 * p.epsilon_k / jnp.exp(new[1])))
        ) ** 3
        new = new.at[0].set(jnp.minimum(new[0], jnp.log(0.6 / eta_m_new)))
        new = new.at[1].set(
            jnp.clip(new[1], jnp.log(0.2 * t0), jnp.log(5.0 * t0))
        )
        freeze = done | converged | bad
        u_new = jnp.where(freeze, u, new)
        keep_new = jnp.where(done, keep, r)
        return u_new, keep_new, it + 1, freeze

    keep0 = jnp.full((2,), jnp.inf, dtype=dtype)
    u, r, _, _ = jax.lax.while_loop(
        cond, body, (u0, keep0, 0, jnp.array(False))
    )
    e_c = jnp.exp(u)  # vector form: see _mix_newton.residual_aux
    rho_c, t_c = e_c[0], e_c[1]
    ok = (
        jnp.all(jnp.isfinite(u))
        & (jnp.max(jnp.abs(r)) < _CRIT_RES_TOL)
        & (precompute_pure(p, t_c).eta_m * rho_c < 0.7)
    )
    return rho_c, t_c, ok


# ---------------------------------------------------------------------------
# Mixture solvers (generic over the Helmholtz-energy-density closure)
# ---------------------------------------------------------------------------


def _states_eos(phi_fn, R):
    """(p~ (k,), mu~_res (k,n)) for k stacked states.

    Forward-mode only (vmapped jvp over component directions): reverse-mode
    through the association machinery generates HLO that XLA:CPU compiles
    pathologically slowly, while the forward-only graph is both smaller and
    ~3x faster to compile at equal accuracy.
    """
    n = R.shape[1]
    eye = jnp.eye(n, dtype=R.dtype)

    def one_state(rho):
        vals, tangs = jax.vmap(lambda v: jax.jvp(phi_fn, (rho,), (v,)))(eye)
        return vals[0], tangs

    phis, gs = jax.vmap(one_state)(R)
    ptildes = jnp.sum(R, axis=1) + jnp.sum(R * gs, axis=1) - phis
    return ptildes, gs


def _val_and_jac(f, u):
    """Value and Jacobian of f: R^k -> R^j (j >= k) via one vmapped jvp graph.

    Extra output rows beyond ``k`` are auxiliary values (returned in
    ``vals`` but also present as rows of the (j, k) Jacobian; callers slice).
    """
    k = u.shape[0]
    eye = jnp.eye(k, dtype=u.dtype)
    vals, cols = jax.vmap(lambda v: jax.jvp(f, (u,), (v,)))(eye)
    return vals[0], cols.T


def _states_hess(phi_fn, R):
    """Hessians d2phi/drho_i drho_j for k stacked states: (k, n, n).

    One nested forward-mode graph; used to assemble Newton Jacobians
    analytically (products with densities happen OUTSIDE, in the caller's
    dtype, so an f32 phi closure stays finite even at densities that
    underflow f32 — the Hessian itself is finite as rho -> 0).
    """
    n = R.shape[1]
    eye = jnp.eye(n, dtype=R.dtype)

    def grad_fn(rho):
        _, tangs = jax.vmap(lambda v: jax.jvp(phi_fn, (rho,), (v,)))(eye)
        return tangs

    def one_state(rho):
        return jax.vmap(lambda v: jax.jvp(grad_fn, (rho,), (v,))[1])(eye)

    return jax.vmap(one_state)(R)


def _solve3(J, r):
    """Cramer solve of a 3x3 system (avoids LU custom calls inside loops)."""
    c00 = J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1]
    c01 = J[1, 2] * J[2, 0] - J[1, 0] * J[2, 2]
    c02 = J[1, 0] * J[2, 1] - J[1, 1] * J[2, 0]
    det = J[0, 0] * c00 + J[0, 1] * c01 + J[0, 2] * c02
    det = jnp.where(jnp.abs(det) > 1e-30, det, 1e-30)
    x0 = (
        r[0] * c00
        + r[1] * (J[0, 2] * J[2, 1] - J[0, 1] * J[2, 2])
        + r[2] * (J[0, 1] * J[1, 2] - J[0, 2] * J[1, 1])
    )
    x1 = (
        r[0] * c01
        + r[1] * (J[0, 0] * J[2, 2] - J[0, 2] * J[2, 0])
        + r[2] * (J[0, 2] * J[1, 0] - J[0, 0] * J[1, 2])
    )
    x2 = (
        r[0] * c02
        + r[1] * (J[0, 1] * J[2, 0] - J[0, 0] * J[2, 1])
        + r[2] * (J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0])
    )
    return jnp.stack([x0, x1, x2]) / det


_N_SS_WARMUP = 16
_MAX_MIX_ITER = 80


def _mix_limits(phi_fn, z, p0, md3, incipient_is_vapor):
    """Stage-1 initialization: static packing-fraction grid scan of
    p~(rho; z).

    Detects the van-der-Waals loop by *finite differences along the grid*
    (no extra jvp), caps the caller's pressure estimate at half the
    vapor-spinodal pressure, and extracts branch-limit densities for the
    Newton projection.  Shared by the cold initialization (:func:`_mix_init`)
    and the warm-start path of :func:`mix_vle`, which needs the projection
    limits but none of the iterative stages.

    Returns ``(p0_capped, limits)`` with ``limits = (ln_inc_min,
    ln_inc_max, ln_bulk_min, ln_bulk_max)``.
    """
    dtype = z.dtype
    inf = jnp.asarray(jnp.inf, dtype=dtype)
    z_md3 = jnp.sum(z * md3)
    eta_factor = PI / 6.0 * z_md3

    rho_grid = jnp.asarray(_ETA_GRID, dtype=dtype) / eta_factor
    R_grid = z[None, :] * rho_grid[:, None]
    pt_grid, _ = _states_eos(phi_fn, R_grid)
    # mechanical instability between grid points i and i+1 when the
    # pressure decreases with density (segment-level sign of dp~/drho)
    unstable = pt_grid[1:] < pt_grid[:-1]
    has_loop = jnp.any(unstable)
    seen = jnp.concatenate(
        [jnp.zeros((1,), bool), jnp.cumsum(unstable.astype(jnp.int32)) > 0]
    )
    p_sv = jnp.max(jnp.where(seen, -inf, pt_grid))
    p0 = jnp.where(has_loop, jnp.minimum(p0, 0.5 * p_sv), p0)
    p0 = jnp.maximum(p0, jnp.asarray(1e-30, dtype=dtype))

    k_seg = unstable.shape[0]
    idx = jnp.arange(k_seg)
    first_u = jnp.min(jnp.where(unstable, idx, k_seg))
    last_u = jnp.max(jnp.where(unstable, idx, -1))
    ln_grid = jnp.log(rho_grid)
    ln_rho_sv = jnp.where(has_loop, ln_grid[jnp.minimum(first_u, k_seg)], inf)
    ln_rho_sl = jnp.where(has_loop, ln_grid[jnp.minimum(last_u + 1, k_seg)], -inf)
    # the grid scan (and so the spinodal bounds) is at the BULK composition
    # z; the incipient phase rotates its composition, and equal packing
    # fraction then means a different molar density.  Widen the incipient
    # branch limits by the extreme per-component size ratio so the
    # projection cannot clamp an eta-equivalent state off its branch.
    if incipient_is_vapor:
        # incipient vapor rotates toward smaller molecules -> spinodal cap
        # at equal eta sits at a HIGHER molar density
        ln_inc_cap = ln_rho_sv + jnp.log(z_md3 / jnp.min(md3))
        limits = (-inf, ln_inc_cap, ln_rho_sl, inf)
    else:
        # incipient liquid rotates toward larger molecules -> branch floor
        # at equal eta sits at a LOWER molar density
        ln_inc_floor = ln_rho_sl + jnp.log(z_md3 / jnp.max(md3))
        limits = (ln_inc_floor, inf, -inf, ln_rho_sv)
    return p0, limits


def _mix_init(phi_fn, z, p0, md3, incipient_is_vapor, step_tol):
    """Initialization for the mixture VLE Newton (one dtype, one phi graph
    per loop body).

    Stages (each with exactly ONE phi-derivative site — compile-size
    discipline; a TPU lowering of this program is dominated by the number
    of distinct phi instantiations, each of which expands ~6x under f64
    emulation):

    1. static packing-fraction grid scan of p~(rho; z) (:func:`_mix_limits`);
    2. NPT solves of both phase branches at p0 in one 2-lane Newton loop;
    3. successive-substitution warmup on the incipient fugacities with a
       per-iteration bulk re-estimate (dew only), one stacked 2-state phi
       graph per iteration.

    Returns ``(u0, limits, init_ok)`` with ``u0 = [ln rho_inc (n), ln
    rho_bulk_t]`` and ``limits = (ln_inc_min, ln_inc_max, ln_bulk_min,
    ln_bulk_max)``.
    """
    n = z.shape[0]
    dtype = z.dtype
    z_md3 = jnp.sum(z * md3)
    eta_factor = PI / 6.0 * z_md3

    # -- stage 1: grid scan ------------------------------------------------
    p0, limits = _mix_limits(phi_fn, z, p0, md3, incipient_is_vapor)

    # -- stage 2: branch NPT solves (lane 0 = liquid, lane 1 = vapor) ------
    def npt_pt(lr):
        R = z[None, :] * jnp.exp(lr)[:, None]
        pt, _ = _states_eos(phi_fn, R)
        return pt

    branch_sign = jnp.array([1.0, -1.0], dtype=dtype)
    lr_cap = jnp.log(0.74 / eta_factor)

    def npt_cond(state):
        _, _, it, done = state
        return jnp.any(~done) & (it < _MAX_NPT_ITER)

    def npt_body(state):
        lr, keep, it, done = state
        pt, dpt = jax.jvp(npt_pt, (lr,), (jnp.ones_like(lr),))
        r = pt - p0
        newton = r / jnp.where(dpt > 0.0, dpt, 1.0)
        step = jnp.where(dpt > 0.0, jnp.clip(newton, -0.5, 0.5), -branch_sign * 0.2)
        converged = (jnp.abs(newton) < step_tol) & (dpt > 0.0)
        bad = ~jnp.isfinite(step)
        step = jnp.where(bad, 0.0, step)
        freeze = done | converged | bad
        lr_new = jnp.where(freeze, lr, jnp.minimum(lr - step, lr_cap))
        keep_new = jnp.where(done, keep, jnp.stack([pt, dpt]))
        return lr_new, keep_new, it + 1, freeze

    lr0 = jnp.log(jnp.stack([0.5 / eta_factor, p0]))
    keep0 = jnp.stack(
        [jnp.full((2,), jnp.inf, dtype), jnp.ones((2,), dtype)]
    )
    lr, keep, _, _ = jax.lax.while_loop(
        npt_cond, npt_body, (lr0, keep0, 0, jnp.zeros(2, dtype=bool))
    )
    pt_f, dpt_f = keep[0], keep[1]
    npt_ok = (dpt_f > 0.0) & (
        jnp.abs(pt_f - p0) / jnp.where(dpt_f > 0.0, dpt_f, 1.0)
        < jnp.maximum(step_tol * 1e3, 1e-6)
    )

    i_bulk = 0 if incipient_is_vapor else 1
    rho_bulk_t0 = jnp.exp(lr[i_bulk])
    rho_inc_t0 = jnp.exp(lr[1 - i_bulk])
    init_ok = npt_ok[i_bulk] & jnp.isfinite(rho_bulk_t0)

    # -- stage 3: successive-substitution warmup ---------------------------
    ln_bulk_max = limits[3]

    def ss_body(_, carry):
        ln_i, ln_bt = carry
        R = jnp.stack([jnp.exp(ln_i), z * jnp.exp(ln_bt)])
        _, g = _states_eos(phi_fn, R)
        mu_bulk = jnp.log(z) + ln_bt + g[1]
        target = mu_bulk - g[0]
        if incipient_is_vapor:
            # vapor: the fugacity fixed point is a contraction
            ln_i_new = ln_i + jnp.clip(target - ln_i, -1.0, 1.0)
        else:
            # liquid incipient: the raw exp map diverges toward the trivial
            # vapor root; rotate only the composition and pin the PACKING
            # FRACTION at the NPT liquid value (pinning the molar density
            # over-compresses the liquid once the composition rotates to
            # larger molecules -> positive residual mu -> period-2
            # oscillation; at equal eta the liquid stays near its branch
            # for any composition).  The bulk (vapor) total is re-estimated
            # from the ideal-vapor identity rho_V_i ~ exp(mu~_i(liquid)).
            ln_x = target - jax.scipy.special.logsumexp(target)
            eta_corr = z_md3 / jnp.sum(jnp.exp(ln_x) * md3)
            ln_i_new = ln_x + jnp.log(rho_inc_t0 * eta_corr)
            mu_inc = ln_i + g[0]
            ln_bt = jnp.minimum(
                jax.scipy.special.logsumexp(jnp.clip(mu_inc, -78.0, 78.0)),
                ln_bulk_max,
            )
        return ln_i_new, ln_bt

    ln_inc0 = jnp.log(z * rho_inc_t0)
    ln_inc, ln_bulk_t = jax.lax.fori_loop(
        0, _N_SS_WARMUP, ss_body, (ln_inc0, jnp.log(rho_bulk_t0))
    )

    u0 = jnp.concatenate([ln_inc, ln_bulk_t[None]])
    return u0, limits, init_ok


def _mix_newton(
    phi_fn, z, u0, limits, max_iter, step_tol, res_mu_tol, res_p_rtol,
    res_p_abs, phi_fn_jac=None,
):
    """Damped full Newton on u = [ln rho_inc (n), ln rho_bulk_t].

    The residual is [mu~_i(inc) - mu~_i(bulk), p~(inc) - p~(bulk)] with
    p~(inc) carried as an auxiliary output row, and the LAST evaluated
    residual is carried in the loop state: acceptance never needs a
    post-loop re-evaluation.  Rows that exit on step size or residual
    APPLY the final Newton step before freezing (already computed;
    quadratic convergence makes the returned state's true residual
    O(carried^2/stiffness) — the carried residual is a strict upper
    bound), while noise-floor-stalled rows freeze in place.  One stacked
    2-state phi graph per iteration.

    With ``phi_fn_jac`` (an f32 closure), the Newton JACOBIAN is assembled
    analytically from f32 phi Hessians (products with densities and the
    ideal 1/rho terms stay in the working dtype, so the assembly is finite
    even at vapor densities that underflow f32) while the residual stays in
    the working dtype: the root is defined by the residual alone, so a
    ~1e-7-accurate Jacobian costs at most an extra iteration, but it
    removes ALL second-order f64 content from the loop body — the dominant
    term of the TPU compile time (f64 is software-emulated and its
    expansion multiplies the executable).

    Returns ``(u, out)`` with
    ``out = [residual (n+1), p~_inc, p~_bulk, pressure-row stiffness]``.
    """
    n = z.shape[0]
    dtype = u0.dtype
    ln_inc_min, ln_inc_max, ln_bulk_min, ln_bulk_max = limits

    def residual_aux(u):
        # one vector exp over all n+1 unknowns: axon's emulated-f64 exp
        # lowers SCALAR/size-1 operands through an f32-level path (measured
        # 2.2e-8 rel err vs 3e-14 for size>=2), which quantizes rho_bulk at
        # f32 ulps and freezes the per-item Newton in a limit cycle
        e = jnp.exp(u)
        r_inc = e[:n]
        r_bulk = z * e[n]
        R = jnp.concatenate([r_inc[None, :], r_bulk[None, :]])
        pt, g = _states_eos(phi_fn, R)
        mu = jnp.log(R) + g
        return jnp.concatenate(
            [mu[0] - mu[1], (pt[0] - pt[1])[None], pt[0][None], pt[1][None]]
        )

    def jac_from_hess(u):
        """Analytic Newton Jacobian from f32 phi Hessians.

        With R_inc = exp(u[:n]) and R_bulk = z * exp(u[n]):
            J[i, j]  = H_inc[i, j] rho_inc[j] + delta_ij          (j < n)
            J[i, n]  = -(sum_j H_bulk[i, j] rho_bulk[j] + 1)
            J[n, j]  = rho_inc[j] (1 + sum_i rho_inc[i] H_inc[i, j])
            J[n, n]  = -sum_j rho_bulk[j] (1 + sum_i rho_bulk[i] H_bulk[i, j])
        """
        e = jnp.exp(u)  # vector form: see residual_aux
        r_inc = e[:n]
        r_bulk = z * e[n]
        R = jnp.concatenate([r_inc[None, :], r_bulk[None, :]])
        # floor keeps the f32 second-derivative AD intermediates finite at
        # low-pressure vapor states (see _HESS_RHO_FLOOR_F32); the products
        # with the TRUE densities below keep the Jacobian exact wherever
        # its entries are non-negligible
        R32 = jnp.maximum(R, _HESS_RHO_FLOOR_F32).astype(jnp.float32)
        H = _states_hess(phi_fn_jac, R32).astype(dtype)
        H_inc, H_bulk = H[0], H[1]
        eye = jnp.eye(n, dtype=dtype)
        J_mu_inc = H_inc * r_inc[None, :] + eye
        J_mu_bulk = -(H_bulk @ r_bulk + 1.0)
        J_p_inc = r_inc * (1.0 + r_inc @ H_inc)
        J_p_bulk = -jnp.sum(r_bulk * (1.0 + r_bulk @ H_bulk))
        top = jnp.concatenate([J_mu_inc, J_mu_bulk[:, None]], axis=1)
        bot = jnp.concatenate([J_p_inc, J_p_bulk[None]])[None, :]
        return jnp.concatenate([top, bot], axis=0)

    def project(u):
        # keep each phase on its branch (outside the unstable region)
        ln_inc_tot = jax.scipy.special.logsumexp(u[:n])
        shift = jnp.clip(ln_inc_tot, ln_inc_min, ln_inc_max) - ln_inc_tot
        u = u.at[:n].add(shift)
        u = u.at[n].set(jnp.clip(u[n], ln_bulk_min, ln_bulk_max))
        return u

    def cond(state):
        _, _, _, _, it, done = state
        return (~done) & (it < max_iter)

    # stall (noise-floor limit-cycle) detection: once the evaluation noise
    # of the working dtype exceeds the requested tolerance, the Newton
    # enters a period-2 cycle whose residual never crosses it (measured:
    # f32 warmup cycling at |r_mu| ~ 1.6e-4 against res_mu_tol 1e-4, f64
    # polish at the emulated-f64 floor against 1e-9) — and since the
    # batched while_loop runs until EVERY row is done, a handful of such
    # rows make the whole batch pay max_iter (80+30) instead of ~3+3
    # iterations.  The merit is the residual in units of the res_ok
    # criterion (res_ok <=> merit < 1, homogeneous in mu and pressure
    # allowances).  A row whose merit stops improving (not below 0.9x its
    # best) for 3 consecutive iterations while already within 1e3x of
    # acceptance is at its noise floor: freeze it and let the acceptance
    # (res_mu < 1e-7 with the noise-calibrated pressure allowance) judge
    # the carried residual.  Quadratically-converging rows improve far
    # faster than 0.9x; the gate keeps the detector disarmed during the
    # damped far-field march, and unarmed iterations HOLD the counter
    # (resetting it lets a cycle that straddles the gate escape).
    stall_gate = 1e3

    def body(state):
        u, out_keep, best, stale, it, done = state
        if phi_fn_jac is None:
            out, J = _val_and_jac(residual_aux, u)
            Jsq = J[: n + 1]
        else:
            out = residual_aux(u)
            Jsq = jac_from_hess(u)
        # pressure-row stiffness |d p~/d ln rho| = rho * dp~/drho of the
        # stiffer phase: sets the absolute evaluation-noise scale of the
        # pressure-equality residual (liquid p~ is a cancellation of terms
        # of this size; see the pure solver's p_noise)
        stiff = jnp.maximum(jnp.abs(Jsq[n, n]), jnp.sum(jnp.abs(Jsq[n, :n])))
        out = jnp.concatenate([out, stiff[None]])
        r = out[: n + 1]
        step = _solve3(Jsq, r) if n == 2 else jnp.linalg.solve(Jsq, r)
        eu = jnp.exp(u)  # vector form: see residual_aux
        p_allow = res_p_rtol * jnp.sum(eu[:n]) + res_p_abs * eu[n]
        res_ok = (jnp.max(jnp.abs(r[:n])) < res_mu_tol) & (
            jnp.abs(r[n]) < p_allow
        )
        merit = jnp.maximum(
            jnp.max(jnp.abs(r[:n])) / res_mu_tol, jnp.abs(r[n]) / p_allow
        )
        improved = merit < 0.9 * best
        armed = merit < stall_gate
        stale_new = jnp.where(
            improved, 0, jnp.where(armed, stale + 1, stale)
        )
        best_new = jnp.minimum(best, merit)
        stalled = stale_new >= 3
        converged = (jnp.max(jnp.abs(step)) < step_tol) | res_ok | stalled
        bad = ~jnp.all(jnp.isfinite(step))
        step = jnp.where(bad, 0.0, jnp.clip(step, -0.5, 0.5))
        # non-stalled active rows always take the computed step, including
        # the FINAL step on the iteration they converge (see docstring);
        # the carried residual then bounds the returned u's true residual
        apply = (~done) & (~bad) & (~stalled)
        u_new = jnp.where(apply, project(u - step), u)
        out_new = jnp.where(done, out_keep, out)
        return (
            u_new, out_new, best_new, stale_new, it + 1,
            done | converged | bad,
        )

    out0 = jnp.full((n + 4,), jnp.inf, dtype=u0.dtype)
    inf0 = jnp.asarray(jnp.inf, dtype=u0.dtype)
    u, out, _, _, _, _ = jax.lax.while_loop(
        cond, body, (u0, out0, inf0, 0, 0, jnp.array(False))
    )
    return u, out


def mix_vle(phi_fn, z, p0, md3, incipient_is_vapor: bool, phi_fn32=None,
            u0_init=None):
    """Bubble/dew-point solve for an n-component mixture (per item).

    Bulk phase has known mole fractions ``z`` (liquid for bubble, vapor for
    dew); unknowns are the incipient-phase partial densities and the bulk
    total density, iterated on in log space:

        R_i = mu~_i(incipient) - mu~_i(bulk)   (i = 1..n, total chem. pot.)
        R_p = p~(incipient) - p~(bulk)

    Initialization from NPT solves at the caller-provided pressure estimate
    ``p0`` (the reference forwards the same estimate to the feos crate,
    src/pcsaft.rs:170), followed by successive-substitution warmup on the
    incipient fugacities and a damped full Newton finish.  ``md3`` is the
    per-component vector m_i d_i^3, used for the eta = 0.5 liquid
    initialization (via z . md3) and to keep the incipient phase at equal
    packing fraction while its composition rotates.
    Replaces ``PhaseEquilibrium::bubble_point/dew_point``
    (src/pcsaft.rs:150-214).

    With ``phi_fn32`` (an f32 closure over f32-cast parameters) the
    initialization and Newton warmup run in f32 — TPU f64 is software-
    emulated, and keeping the bulk of the program in f32 both shrinks the
    lowered executable ~6x (which is what lets these nested-Newton mixture
    programs compile on the TPU at all) and runs several times faster.  A
    short f64 Newton polish (quadratic from ~1e-4) plus f64 acceptance
    keeps final accuracy identical to the pure-f64 path.

    With ``u0_init`` (an (n+1,) log-state ``[ln rho_inc, ln rho_bulk_t]``
    from a previous converged solve at nearby parameters/conditions) the
    iterative initialization — NPT branch solves, successive substitution,
    the f32 Newton warmup — is skipped entirely: only the (loop-free)
    grid scan runs to recover the branch-projection limits, and the f64
    Newton polish starts directly from the warm state.  This is the
    continuation fast path for optimizer loops, where parameters move by
    O(learning rate) per step and the previous root is already within the
    polish Newton's quadratic basin.  Results on converged rows are
    IDENTICAL to the cold path (same residual acceptance); rows whose warm
    state is outside the basin simply fail their mask (callers keep the
    last good state).

    Returns ``(rho_incipient (n,), rho_bulk (n,), ok, p~_eq)`` — the
    reduced equilibrium pressure, taken from the carried residual state on
    the VAPOR side (exact at the converged root, no extra phi evaluation,
    and free of the liquid p~ cancellation noise).
    """
    n = z.shape[0]
    dtype = z.dtype

    if u0_init is not None:
        # -- warm start: grid scan (limits only) + f64 polish -------------
        if phi_fn32 is not None:
            f32 = jnp.float32
            phi_fn32_g = lambda r: phi_fn32(
                jnp.maximum(r, jnp.asarray(_GRAD_RHO_FLOOR_F32, dtype=r.dtype))
            )
            _, limits32 = _mix_limits(
                phi_fn32_g, z.astype(f32), p0.astype(f32), md3.astype(f32),
                incipient_is_vapor,
            )
            limits = tuple(l.astype(dtype) for l in limits32)
        else:
            _, limits = _mix_limits(phi_fn, z, p0, md3, incipient_is_vapor)
        u0 = jnp.asarray(u0_init, dtype=dtype)
        init_ok = jnp.all(jnp.isfinite(u0))
        # a NaN/inf warm state would poison the whole (batch-synchronized)
        # Newton loop; park such rows at a harmless interior point and let
        # init_ok fail their acceptance
        u0 = jnp.where(init_ok, u0, jnp.zeros_like(u0))
        polish_iter = _MAX_MIX_ITER
    elif phi_fn32 is not None:
        f32 = jnp.float32
        z32 = z.astype(f32)
        # first-derivative closure with the density floor: keeps the f32
        # init/warmup finite at sub-Pa vapor densities (the floored
        # components see an exactly-ideal phase, the correct limit there)
        phi_fn32_g = lambda r: phi_fn32(
            jnp.maximum(r, jnp.asarray(_GRAD_RHO_FLOOR_F32, dtype=r.dtype))
        )
        u0, limits32, init_ok = _mix_init(
            phi_fn32_g, z32, p0.astype(f32), md3.astype(f32),
            incipient_is_vapor, step_tol=1e-5,
        )
        # phi_fn_jac routes the warmup Jacobian through the Hessian
        # assembly (floored at _HESS_RHO_FLOOR_F32): a direct jacfwd of
        # the residual would overflow f32 below S ~ 1.4e-13
        u0, _ = _mix_newton(
            phi_fn32_g, z32, u0, limits32, max_iter=_MAX_MIX_ITER,
            step_tol=1e-4, res_mu_tol=1e-4, res_p_rtol=1e-4, res_p_abs=1e-6,
            phi_fn_jac=phi_fn32,
        )
        u0 = u0.astype(dtype)
        limits = tuple(l.astype(dtype) for l in limits32)
        polish_iter = 30
    else:
        u0, limits, init_ok = _mix_init(
            phi_fn, z, p0, md3, incipient_is_vapor, step_tol=_STEP_TOL
        )
        polish_iter = _MAX_MIX_ITER

    u, out = _mix_newton(
        phi_fn, z, u0, limits, max_iter=polish_iter, step_tol=_STEP_TOL,
        res_mu_tol=1e-9, res_p_rtol=1e-9, res_p_abs=1e-13,
        phi_fn_jac=phi_fn32,
    )

    e_u = jnp.exp(u)  # vector form: see _mix_newton.residual_aux
    rho_inc = e_u[:n]
    rho_bulk = z * e_u[n]
    r = out[: n + 1]
    # report the VAPOR-side pressure: the liquid p~ is a cancellation of
    # large terms whose f64 noise floor (~1e-12 reduced, absolute) is
    # percent-level relative error at Pa-scale dew pressures, while the
    # vapor p~ ~ sum(rho_V) is well-conditioned.  At the converged root
    # the two sides agree within the residual tolerance.
    pt_eq = out[n + 1] if incipient_is_vapor else out[n + 2]
    scale_p = jnp.sum(rho_inc)
    res_mu = jnp.max(jnp.abs(r[:n]))
    # absolute allowance for the liquid-pressure cancellation noise (see
    # the pure solver): the carried pressure-row stiffness rho*dp~/drho of
    # the stiffer phase sets the evaluation-noise scale.  Coefficient
    # calibrated like the pure solver's: ~4e-13 x stiffness on XLA:CPU
    # true f64, up to ~2.9e-12 x stiffness under the TPU's emulated f64 in
    # large-batch layouts (measured at B>=8 on a converged low-T
    # cross-associating bubble row with res_mu ~ 1e-10 that the former
    # 2e-12 allowance rejected on pressure noise alone); 6e-12 carries a
    # 2x margin.  The admitted pressure-equality slack stays ~2e-5
    # relative at the smallest accepted vapor pressures, and the REPORTED
    # pressure is the vapor-side evaluation, so its error remains at the
    # residual level, not the allowance level.
    p_noise = 6e-12 * out[n + 3]
    res_p = jnp.abs(r[n]) / (scale_p + p_noise / _RES_RTOL)
    trivial = jnp.abs(jnp.log(jnp.sum(rho_inc)) - u[n]) < 1e-5
    if incipient_is_vapor:
        ordered = jnp.sum(rho_inc) < jnp.sum(rho_bulk)
    else:
        ordered = jnp.sum(rho_inc) > jnp.sum(rho_bulk)
    ok = (
        init_ok
        & jnp.all(jnp.isfinite(u))
        & (res_mu < 1e-7)
        & (res_p < _RES_RTOL)
        & ~trivial
        & ordered
        & (pt_eq > 0.0)
    )
    return rho_inc, rho_bulk, ok, pt_eq


def solve_with_identity_gradients(solve_fn, ident_fn, diff_args):
    """Couple a gradient-free batched VLE solve to a stationary identity.

    ``solve_fn(diff_args) -> (rho_inc (B, n), rho_bulk (B, n), ok (B,),
    pt_eq (B,))`` runs the (non-differentiable) solver; ``ident_fn(
    diff_args, rho_inc, rho_bulk) -> (B,)`` evaluates the stationary
    re-attachment identity at FIXED densities.  Returns ``(pt_eq, ok,
    rho_inc, rho_bulk)`` where ``pt_eq``'s VALUE comes from the solver's
    carried state and its DERIVATIVES from the identity.

    Implemented as ``jax.custom_jvp`` so the identity graph is traced
    ONLY under AD: forward-only property evaluation (and every batched
    FD solve in the tests) never pays the identity's second-order
    machinery — ~30% of the lowered solver program.  Reverse-mode works
    through linearization of the (linear-in-tangents) rule; failed lanes
    are sanitized before the identity so they produce finite (zero-
    contribution) tangents.
    """

    @jax.custom_jvp
    def inner(diff_args):
        rho_inc, rho_bulk, ok, pt_eq = solve_fn(diff_args)
        # sanitize failed lanes: NaN/0 densities would make the identity
        # tangents NaN, which no downstream masking can repair
        rho_inc = jnp.where(ok[:, None], rho_inc, 1e-5)
        rho_bulk = jnp.where(ok[:, None], rho_bulk, 1e-3)
        pt_eq = jnp.where(ok, pt_eq, 1.0)
        return pt_eq, ok, rho_inc, rho_bulk

    @inner.defjvp
    def inner_jvp(primals, tangents):
        (da,), (dda,) = primals, tangents
        pt_eq, ok, rho_inc, rho_bulk = inner(da)
        _, dp_ident = jax.jvp(
            lambda d: ident_fn(d, rho_inc, rho_bulk), (da,), (dda,)
        )
        f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
        return (
            (pt_eq, ok, rho_inc, rho_bulk),
            (dp_ident, f0(ok), jnp.zeros_like(rho_inc), jnp.zeros_like(rho_bulk)),
        )

    return inner(diff_args)
