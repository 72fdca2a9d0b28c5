"""Batched isothermal pT flash (two-phase TP split), pure JAX, TPU-native.

Beyond the reference's surface: feos-torch exposes only incipient-phase
solvers (bubble/dew, src/pcsaft.rs:146-231); the full two-phase split at
given (T, p, z) exists only in the upstream feos crate.  This module
implements it TPU-first on top of the same batched building blocks as
:mod:`feos_tpu.solvers.vle`:

* the two-phase window is detected EXACTLY from the library's own
  bubble/dew solves at the feed composition (no stability-analysis
  heuristics): p_dew < p < p_bubble;
* K-factors are initialized by log-interpolating between the bubble and
  dew edge solutions (both carry the incipient composition, a solver
  output the reference discards), so successive substitution starts on
  the correct branch everywhere in the window;
* the successive-substitution loop is a batch-synchronized
  ``lax.while_loop`` whose body contains a Rachford-Rice Newton (scalar,
  closed bounds), a 2-lane warm-started NPT Newton (both phases stacked
  through ONE phi graph — compile-size discipline, see solvers/vle.py),
  and the fugacity-coefficient K update;
* converged rows freeze; failures come back as a mask, never exceptions.

The SOLVE runs under ``stop_gradient`` (the detached-solver convention);
derivatives of the flash outputs (beta, x, y, densities) w.r.t. every
input (EOS parameters, kij, T, z, p) are re-attached by the implicit-
function theorem on the full flash system — see
:func:`flash_implicit_gradients` — the same strategy as the VLE
stationary identities, but through a linear solve of the (2n+1)-square
equilibrium Jacobian instead of a closed-form envelope identity (the
flash split has no single scalar output whose envelope theorem covers
the composition outputs).

Reduced units throughout: densities in A^-3, p~ = p A^3/(kB T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vle import _HESS_RHO_FLOOR_F32, _MAX_NPT_ITER, _states_eos, _states_hess


def flash_window(z, pressure, p_bub, nan_b, y_bub, p_dew, nan_d, x_dew,
                 run_flash):
    """Shared facade logic: two-phase window classification, K-factor
    initialization from the edge solutions, and output packing.

    ``run_flash(lnK0, beta0, active) -> (beta, x, y, lnr, ok)`` is the
    model's jitted batched flash core; ``active`` marks the rows inside
    the two-phase window (the rest carry benign filler inputs and freeze
    at iteration 0 so they cannot drag the batch-synchronized loop).
    Returns ``(vapor_frac, x, y, rho, phase)`` — see
    models.pcsaft_mix.flash for the full contract.  ``rho`` is populated
    only on two-phase rows (single-phase rows report NaN in both lanes;
    the caller knows which single phase exists from ``phase`` and can get
    its density from an NPT property call).
    """
    ok_b, ok_d = ~nan_b, ~nan_d
    is_liq = ok_b & (pressure >= p_bub)
    # at the degenerate p == p_bub == p_dew point both edge tests hold;
    # classify as liquid only (the phases are indistinguishable there)
    is_vap = ok_d & (pressure <= p_dew) & ~is_liq
    two_phase = ok_b & ok_d & (pressure < p_bub) & (pressure > p_dew)

    # K-factor initialization: log-interpolate the edge solutions in ln p
    lnK_bub = jnp.log(y_bub / z)
    lnK_dew = jnp.log(z / x_dew)
    denom = jnp.log(p_bub) - jnp.log(p_dew)
    w = (jnp.log(p_bub) - jnp.log(pressure)) / jnp.where(
        jnp.abs(denom) > 1e-30, denom, 1.0
    )
    w = jnp.clip(jnp.where(jnp.isfinite(w), w, 0.5), 0.02, 0.98)
    lnK0 = jnp.where(
        two_phase[:, None],
        (1.0 - w[:, None]) * lnK_bub + w[:, None] * lnK_dew,
        jnp.full_like(lnK_bub, jnp.log(2.0)),  # benign filler rows
    )

    beta, x, y, lnr, ok = run_flash(lnK0, w, two_phase)
    ok = ok & two_phase

    nanv = jnp.full_like(z, jnp.nan)
    phase = jnp.where(
        ok, 2, jnp.where(is_liq, 0, jnp.where(is_vap, 1, -1))
    ).astype(jnp.int8)
    beta_out = jnp.where(
        ok, beta,
        jnp.where(is_liq, 0.0, jnp.where(is_vap, 1.0, jnp.nan)),
    )
    x_out = jnp.where(ok[:, None], x, jnp.where(is_liq[:, None], z, nanv))
    y_out = jnp.where(ok[:, None], y, jnp.where(is_vap[:, None], z, nanv))
    rho = jnp.where(ok[:, None], jnp.exp(lnr), jnp.nan)
    return beta_out, x_out, y_out, rho, phase

_MAX_SS_ITER = 200
# warm NPT steps per SS iteration: the densities move O(dlnK) between
# iterations and Newton is quadratic from the previous root, so 4 steps
# hold the density error far below the lnK convergence tolerance; the
# final polish (outside the loop) keeps the full 8.
_N_NPT_WARM = 4
_N_NPT_POLISH = 8
_LNK_TOL = 1e-10


def _rachford_rice(z, K, beta0):
    """Safeguarded scalar Newton for the Rachford-Rice equation.

    h(beta) = sum_i z_i (K_i - 1) / (1 + beta (K_i - 1)) is monotonically
    decreasing on [0, 1] (the denominator (1-beta) + beta K_i stays
    positive for K_i > 0), so a clipped Newton from beta0 converges
    unconditionally; 24 iterations reach f64 noise from any start.
    """
    Km1 = K - 1.0

    def body(_, b):
        den = 1.0 + b * Km1
        h = jnp.sum(z * Km1 / den)
        dh = -jnp.sum(z * Km1 * Km1 / (den * den))
        step = h / jnp.where(dh < 0.0, dh, -1.0)
        return jnp.clip(b - step, 1e-12, 1.0 - 1e-12)

    return jax.lax.fori_loop(0, 24, body, jnp.clip(beta0, 1e-12, 1.0 - 1e-12))


def flash_tp(phi_fn, z, p_red, md3, lnK0, beta0, lnr0, phi_fn_jac=None,
             active=None):
    """One isothermal flash item (reduced units, f64, gradient-free).

    Args:
      phi_fn: reduced Helmholtz density closure rho (n,) -> phi (f64;
        association in Q form is fine — only exact VALUES and FIRST
        derivatives are consumed from it).
      z: feed composition (n,).
      p_red: target reduced pressure p~.
      md3: per-component m d^3 (packing-fraction scale, from the
        precompute), used for the liquid-branch NPT initialization.
      lnK0: initial ln K (n,), from the bubble/dew edge interpolation.
      beta0: initial vapor fraction estimate.
      lnr0: initial (2,) log total molar densities [liquid, vapor]; pass
        NaN to self-initialize (liquid at eta=0.5, vapor ideal-gas).
      phi_fn_jac: EXACT phi closure over f32-cast parameters, used for
        the NPT Newton slope dp~/dln rho and the final mechanical-
        stability test.  These are SECOND derivatives of phi, which the
        Q form gets wrong (its second derivatives miss the dX/drho
        association terms — the library-wide convention, see
        models.pcsaft_mix._mix_incipient_impl), so a Q-form slope can
        slow Newton or misjudge stability at strong association.
        (Measured on the cross-associating test row: Q-form and exact
        phi VALUES and first derivatives agree to ~1e-16 at the
        converged site fractions — the residual path needs no change —
        but only the exact phi makes the slope/stability test
        principled.)  f32 is ample for a Newton slope and a sign test;
        the residual stays exact f64.  When None, the slope falls back
        to a jvp through ``phi_fn`` (only correct if ``phi_fn`` is the
        exact phi).
      active: optional scalar bool; False marks a filler row (outside
        the two-phase window) that must freeze at iteration 0 instead of
        iterating on nonsense until _MAX_SS_ITER (the batched while_loop
        is batch-synchronized — one dragging row stalls every lane).

    Returns ``(beta, x, y, lnr, ok)`` with x/y the liquid/vapor
    compositions, ``lnr`` the (2,) converged log total densities.
    """
    dtype = z.dtype

    def pt_and_slope(comps, lr):
        """(p~ (2,), dp~/dln rho_t (2,)) of the two stacked phases at
        fixed compositions: values from the f64 (Q-form) phi, slopes
        analytically from f32 exact-phi Hessians (products with the true
        f64 densities happen outside, so the assembly stays finite at
        vapor densities that underflow f32 — same scheme as
        vle._mix_newton.jac_from_hess).  With p~ = sum(rho) +
        sum_i rho_i g_i - phi, the ray derivative along rho = c * rho_t
        is dp~/dln rho_t = sum(rho) + rho^T H rho."""
        R = comps * jnp.exp(lr)[:, None]
        pt, _ = _states_eos(phi_fn, R)
        if phi_fn_jac is None:
            def pt_of(lr_):
                R_ = comps * jnp.exp(lr_)[:, None]
                pt_, _ = _states_eos(phi_fn, R_)
                return pt_
            _, dpt = jax.jvp(pt_of, (lr,), (jnp.ones_like(lr),))
        else:
            R32 = jnp.maximum(R, _HESS_RHO_FLOOR_F32).astype(jnp.float32)
            H = _states_hess(phi_fn_jac, R32).astype(dtype)
            dpt = jnp.sum(R, axis=1) + jnp.einsum("ki,kij,kj->k", R, H, R)
        return pt, dpt

    def comps_of(lnK, beta):
        K = jnp.exp(lnK)
        b = _rachford_rice(z, K, beta)
        x = z / (1.0 + b * (K - 1.0))
        x = x / jnp.sum(x)
        y = K * x
        y = y / jnp.sum(y)
        return b, x, y

    beta_i, x_i, y_i = comps_of(lnK0, beta0)

    # self-initialization of the branch densities: liquid at packing
    # fraction 0.5, vapor from the ideal-gas identity rho = p~
    eta_liq = 0.5 / (jnp.pi / 6.0 * jnp.sum(x_i * md3))
    lnr_self = jnp.log(jnp.stack([eta_liq, jnp.maximum(p_red, 1e-30)]))
    lnr_i = jnp.where(jnp.isfinite(lnr0), lnr0, lnr_self)

    def npt_steps(lnr, x, y, n_steps):
        """n warm Newton steps on [ln rho_L, ln rho_V] at fixed (x, y),
        both phases through one stacked phi graph per step (f64 residual,
        exact-phi f32 slope — see pt_and_slope)."""
        comps = jnp.stack([x, y])
        # packing-fraction cap per lane (hs diverges at zeta3 -> 1; cap at
        # the close-packing-ish 0.74 like solvers.vle._mix_init)
        lr_cap = jnp.log(0.74 / (jnp.pi / 6.0 * comps @ md3))

        def body(_, lr):
            pt, dpt = pt_and_slope(comps, lr)
            newton = (pt - p_red) / jnp.where(dpt > 0.0, dpt, 1.0)
            # dpt <= 0: the iterate fell into the mechanically unstable
            # region — walk the liquid lane denser, the vapor lane thinner
            branch_sign = jnp.array([1.0, -1.0], dtype=dtype)
            step = jnp.where(
                dpt > 0.0, jnp.clip(newton, -0.5, 0.5), -branch_sign * 0.2
            )
            step = jnp.where(jnp.isfinite(step), step, 0.0)
            return jnp.minimum(lr - step, lr_cap)

        return jax.lax.fori_loop(0, n_steps, body, lnr)

    # cold NPT: full iteration budget once, before the SS loop
    lnr_i = npt_steps(lnr_i, x_i, y_i, _MAX_NPT_ITER)

    def ss_cond(state):
        _, _, _, it, done, _ = state
        return jnp.any(~done) & (it < _MAX_SS_ITER)

    def ss_body(state):
        lnK, beta, lnr, it, done, d_prev = state
        b, x, y = comps_of(lnK, beta)
        lnr_new = npt_steps(lnr, x, y, _N_NPT_WARM)
        R = jnp.stack([x, y]) * jnp.exp(lnr_new)[:, None]
        pt, g = _states_eos(phi_fn, R)
        lnK_ss = g[0] - g[1] + lnr_new[0] - lnr_new[1]
        d = lnK_ss - lnK
        # dominant-eigenvalue extrapolation (Michelsen's GDEM pattern):
        # successive substitution contracts linearly with rate lambda, so
        # the remaining correction is d / (1 - lambda); lambda estimated
        # from two CONSECUTIVE plain deltas (every-3rd-iteration cadence
        # keeps the estimate clean — the delta after an extrapolated step
        # is not a plain SS delta).  Clipped to 0.95 (a <= 20x step; 0.9
        # left ultra-wide-window rows — 6+ decade (p_dew, p_bub) spans
        # from the fuzz sweep, contraction rates ~0.99 — stuck at the
        # iteration cap) so an overshoot stays inside the NPT warm-start
        # basin; the plain update is the fallback whenever the estimate
        # is unusable.
        den = jnp.sum(d_prev * d_prev)
        lam = jnp.sum(d * d_prev) / jnp.where(den > 0.0, den, 1.0)
        lam = jnp.clip(lam, -0.95, 0.95)
        accel = (it % 3 == 2) & (it >= 5) & (den > 0.0) & jnp.isfinite(lam)
        lnK_new = jnp.where(accel, lnK + d / (1.0 - lam), lnK_ss)
        converged = jnp.max(jnp.abs(d)) < _LNK_TOL
        bad = ~jnp.all(jnp.isfinite(lnK_new)) | ~jnp.all(jnp.isfinite(lnr_new))
        # apply the converging update (solved-state accuracy: the final
        # step costs nothing — see docs/design.md), THEN freeze
        upd = ~(done | bad)
        lnK = jnp.where(upd, lnK_new, lnK)
        lnr = jnp.where(upd, lnr_new, lnr)
        beta = jnp.where(upd, b, beta)
        d_prev = jnp.where(upd, d, d_prev)
        return lnK, beta, lnr, it + 1, done | converged | bad, d_prev

    done0 = jnp.asarray(False) if active is None else ~active
    state0 = (lnK0, beta_i, lnr_i, 0, done0, jnp.zeros_like(lnK0))
    lnK, beta, lnr, _, done, _ = jax.lax.while_loop(ss_cond, ss_body, state0)

    # final NPT polish at the POST-loop compositions (the last lnK update
    # moved x/y after the last density solve), then the residual check at
    # the returned state (exact isofugacity and isobaric closure,
    # independent of the loop's own exit test)
    b, x, y = comps_of(lnK, beta)
    lnr = npt_steps(lnr, x, y, _N_NPT_POLISH)
    R = jnp.stack([x, y]) * jnp.exp(lnr)[:, None]
    pt, g = _states_eos(phi_fn, R)
    _, dpt = pt_and_slope(jnp.stack([x, y]), lnr)
    res_K = jnp.max(jnp.abs(lnK - (g[0] - g[1] + lnr[0] - lnr[1])))
    # acceptance mirrors solvers.vle (noise-calibrated): the liquid p~ is
    # a cancellation of O(phi) terms, so its f64 evaluation-noise floor is
    # ~ulp x the pressure-row stiffness rho dp~/drho (= dpt here), which
    # at sub-Pa pressures exceeds any fixed relative bar (measured: the
    # cross-associating dew edge at 0.44 Pa sits 2.5e-4 RELATIVE from the
    # target while fully converged).  Same 6e-12 stiffness coefficient as
    # mix_vle's p_noise (2x margin over the worst measured TPU
    # emulated-f64 batch layouts; XLA:CPU true f64 sits ~3 decades below)
    p_noise = 6e-12 * dpt
    ok = (
        done
        & (res_K < 1e-7)
        & jnp.all(jnp.abs(pt - p_red) < 1e-6 * p_red + p_noise)
        & jnp.all(dpt > 0.0)          # both phases mechanically stable
        & (lnr[0] > lnr[1])           # liquid denser than vapor
        & (jnp.max(jnp.abs(lnK)) > 1e-6)  # non-trivial split
        & (b > 1e-10) & (b < 1.0 - 1e-10)
        & jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    )
    return b, x, y, lnr, ok


def flash_resid(phi_fn, z, p_red, v):
    """Full flash residual F(v) = 0 at the packed per-item state
    ``v = [ln R_L (n), ln R_V (n), beta]`` (R = partial molar densities).

    The 2n+1 equations (one redundant material balance dropped — the
    component balances sum to the identity 1 = beta + (1-beta)):

    * ``mu_i(R_L) - mu_i(R_V)`` — total chemical potential equality (n);
    * ``p~(R_L) - p~_spec``, ``p~(R_V) - p~_spec`` — isobaric closure (2);
    * ``beta y_i + (1-beta) x_i - z_i``, i < n-1 — material balance (n-1).

    ``phi_fn`` must be the EXACT phi (the implicit-function Jacobian
    consumes second derivatives, which the Q form gets wrong).  Used only
    under AD (:func:`flash_implicit_gradients`), never in the solve loop.
    """
    n = z.shape[0]
    R = jnp.stack([jnp.exp(v[:n]), jnp.exp(v[n:2 * n])])
    beta = v[2 * n]
    pt, g = _states_eos(phi_fn, R)
    mu = v[:2 * n].reshape(2, n) + g
    x = R[0] / jnp.sum(R[0])
    y = R[1] / jnp.sum(R[1])
    return jnp.concatenate([
        mu[0] - mu[1],
        pt - p_red,
        (beta * y + (1.0 - beta) * x - z)[: n - 1],
    ])


def flash_implicit_gradients(solve_fn, resid_fn, diff_args):
    """Couple the gradient-free batched flash solve to implicit-function
    derivatives of the full equilibrium system.

    ``solve_fn(diff_args) -> (beta (B,), x (B,n), y (B,n), lnr (B,2),
    ok (B,))`` runs the detached solver core; ``resid_fn(diff_args, v) ->
    (B, 2n+1)`` evaluates :func:`flash_resid` through the model's exact
    phi at the packed batched state ``v``.  Values come from the solver;
    tangents solve the linearized system

        dF/dv . dv = - dF/dtheta . dtheta

    at the converged root (J is (2n+1)-square per item — 5x5 for a
    binary — batched ``jnp.linalg.solve``).  Implemented as
    ``jax.custom_jvp`` so the exact-phi second-order residual graph is
    traced ONLY under AD, exactly like
    :func:`vle.solve_with_identity_gradients`; forward-only property
    evaluation never pays it.  Failed lanes get zero tangents (their
    values are filler; downstream masking keeps them out of any loss).

    Tangent unpacking: with rho_t = sum_i R_i and w = R/rho_t,
    ``d ln rho_t = sum_i w_i d ln R_i`` and
    ``d w_i = w_i (d ln R_i - d ln rho_t)``.
    """

    @jax.custom_jvp
    def inner(diff_args):
        beta, x, y, lnr, ok = solve_fn(diff_args)
        # sanitize failed lanes: the jvp rule evaluates the residual
        # Jacobian at this state, and NaN there would poison the batched
        # linear solve's own lane (masked after) — but an all-NaN v also
        # breaks jnp.linalg.solve gradients upstream of the mask on some
        # backends, so park failed lanes at a benign interior state
        n = x.shape[1]
        beta = jnp.where(ok, beta, 0.5)
        x = jnp.where(ok[:, None], x, 1.0 / n)
        y = jnp.where(ok[:, None], y, 1.0 / n)
        lnr_park = jnp.log(jnp.asarray([1e-3, 1e-5], dtype=lnr.dtype))
        lnr = jnp.where(ok[:, None], lnr, lnr_park)
        return beta, x, y, lnr, ok

    @inner.defjvp
    def inner_jvp(primals, tangents):
        import numpy as np

        (da,), (dda,) = primals, tangents
        beta, x, y, lnr, ok = inner(da)
        n = x.shape[1]
        m = 2 * n + 1
        v = jnp.concatenate([
            jnp.log(x) + lnr[:, :1],
            jnp.log(y) + lnr[:, 1:],
            beta[:, None],
        ], axis=1)

        # J[b, i, j] = dF_i/dv_j per item, via m forward sweeps
        eye = jnp.eye(m, dtype=v.dtype)
        Jcols = jax.vmap(
            lambda e: jax.jvp(
                lambda vv: resid_fn(da, vv),
                (v,), (jnp.broadcast_to(e, v.shape),),
            )[1]
        )(eye)                                   # (m, B, m)
        J = jnp.transpose(Jcols, (1, 2, 0))      # (B, m_row, m_col)
        # failed lanes sit at a parked filler state where J can be
        # singular; a singular LU factor NaNs even a zero right-hand side
        # (and the TRANSPOSED solve of the reverse-mode rule), and that
        # NaN survives the post-masking.  Replace J with the identity and
        # zero the rhs on those lanes so the solve is well-posed
        # everywhere; their tangents come out exactly zero.
        J = jnp.where(ok[:, None, None], J, eye)
        _, dFdth = jax.jvp(lambda d: resid_fn(d, v), (da,), (dda,))
        dFdth = jnp.where(ok[:, None], dFdth, 0.0)
        dv = -jnp.linalg.solve(J, dFdth[..., None])[..., 0]
        dv = jnp.where(ok[:, None], dv, 0.0)

        dlnRL, dlnRV, dbeta = dv[:, :n], dv[:, n:2 * n], dv[:, 2 * n]
        dlnr_l = jnp.sum(x * dlnRL, axis=1)
        dlnr_v = jnp.sum(y * dlnRV, axis=1)
        dx = x * (dlnRL - dlnr_l[:, None])
        dy = y * (dlnRV - dlnr_v[:, None])
        dlnr = jnp.stack([dlnr_l, dlnr_v], axis=1)
        f0 = np.zeros(ok.shape, dtype=jax.dtypes.float0)
        return (beta, x, y, lnr, ok), (dbeta, dx, dy, dlnr, f0)

    return inner(diff_args)
