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

Everything runs under ``stop_gradient`` (the detached-solver convention).
Parameter gradients of the *total Gibbs energy* at the flash solution are
exact by the envelope theorem (the split minimizes G at fixed T, p, z);
gradients of beta/x/y themselves would need the full implicit-function
system and are not re-attached yet.

Reduced units throughout: densities in A^-3, p~ = p A^3/(kB T).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .vle import _states_eos, _MAX_NPT_ITER


def flash_window(z, pressure, p_bub, nan_b, y_bub, p_dew, nan_d, x_dew,
                 run_flash):
    """Shared facade logic: two-phase window classification, K-factor
    initialization from the edge solutions, and output packing.

    ``run_flash(lnK0, beta0) -> (beta, x, y, lnr, ok)`` is the model's
    jitted batched flash core.  Returns ``(vapor_frac, x, y, rho, phase)``
    — see models.pcsaft_mix.flash for the full contract.
    """
    ok_b, ok_d = ~nan_b, ~nan_d
    is_liq = ok_b & (pressure >= p_bub)
    is_vap = ok_d & (pressure <= p_dew)
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

    beta, x, y, lnr, ok = run_flash(lnK0, w)
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
_N_NPT_WARM = 8
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


def flash_tp(phi_fn, z, p_red, md3, lnK0, beta0, lnr0):
    """One isothermal flash item (reduced units, f64, gradient-free).

    Args:
      phi_fn: reduced Helmholtz density closure rho (n,) -> phi (f64;
        association in Q form is fine — only first derivatives are used).
      z: feed composition (n,).
      p_red: target reduced pressure p~.
      md3: per-component m d^3 (packing-fraction scale, from the
        precompute), used for the liquid-branch NPT initialization.
      lnK0: initial ln K (n,), from the bubble/dew edge interpolation.
      beta0: initial vapor fraction estimate.
      lnr0: initial (2,) log total molar densities [liquid, vapor]; pass
        NaN to self-initialize (liquid at eta=0.5, vapor ideal-gas).

    Returns ``(beta, x, y, lnr, ok)`` with x/y the liquid/vapor
    compositions, ``lnr`` the (2,) converged log total densities.
    """
    dtype = z.dtype

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
        both phases through one stacked phi graph per step."""
        comps = jnp.stack([x, y])
        # packing-fraction cap per lane (hs diverges at zeta3 -> 1; cap at
        # the close-packing-ish 0.74 like solvers.vle._mix_init)
        lr_cap = jnp.log(0.74 / (jnp.pi / 6.0 * comps @ md3))

        def pt_of(lr):
            R = comps * jnp.exp(lr)[:, None]
            pt, _ = _states_eos(phi_fn, R)
            return pt

        def body(_, lr):
            pt, dpt = jax.jvp(pt_of, (lr,), (jnp.ones_like(lr),))
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
        _, _, _, it, done = state
        return jnp.any(~done) & (it < _MAX_SS_ITER)

    def ss_body(state):
        lnK, beta, lnr, it, done = state
        b, x, y = comps_of(lnK, beta)
        lnr_new = npt_steps(lnr, x, y, _N_NPT_WARM)
        R = jnp.stack([x, y]) * jnp.exp(lnr_new)[:, None]
        pt, g = _states_eos(phi_fn, R)
        lnK_new = g[0] - g[1] + lnr_new[0] - lnr_new[1]
        converged = jnp.max(jnp.abs(lnK_new - lnK)) < _LNK_TOL
        bad = ~jnp.all(jnp.isfinite(lnK_new)) | ~jnp.all(jnp.isfinite(lnr_new))
        # apply the converging update (solved-state accuracy: the final
        # step costs nothing — see docs/design.md), THEN freeze
        upd = ~(done | bad)
        lnK = jnp.where(upd, lnK_new, lnK)
        lnr = jnp.where(upd, lnr_new, lnr)
        beta = jnp.where(upd, b, beta)
        return lnK, beta, lnr, it + 1, done | converged | bad

    state0 = (lnK0, beta_i, lnr_i, 0, jnp.asarray(False))
    lnK, beta, lnr, _, done = jax.lax.while_loop(ss_cond, ss_body, state0)

    # final NPT polish at the POST-loop compositions (the last lnK update
    # moved x/y after the last density solve), then the residual check at
    # the returned state (exact isofugacity and isobaric closure,
    # independent of the loop's own exit test)
    b, x, y = comps_of(lnK, beta)
    lnr = npt_steps(lnr, x, y, _N_NPT_WARM)
    R = jnp.stack([x, y]) * jnp.exp(lnr)[:, None]
    pt, g = _states_eos(phi_fn, R)

    def pt_of_final(lr):
        Rf = jnp.stack([x, y]) * jnp.exp(lr)[:, None]
        ptf, _ = _states_eos(phi_fn, Rf)
        return ptf

    _, dpt = jax.jvp(pt_of_final, (lnr,), (jnp.ones_like(lnr),))
    res_K = jnp.max(jnp.abs(lnK - (g[0] - g[1] + lnr[0] - lnr[1])))
    # acceptance mirrors solvers.vle: residual bars sit above the TPU's
    # emulated-f64 evaluation-noise floor (~1e-9 relative on p~), far
    # below any genuinely unconverged state
    ok = (
        done
        & (res_K < 1e-7)
        & jnp.all(jnp.abs(pt - p_red) < 1e-6 * p_red)
        & jnp.all(dpt > 0.0)          # both phases mechanically stable
        & (lnr[0] > lnr[1])           # liquid denser than vapor
        & (jnp.max(jnp.abs(lnK)) > 1e-6)  # non-trivial split
        & (b > 1e-10) & (b < 1.0 - 1e-10)
        & jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    )
    return b, x, y, lnr, ok
