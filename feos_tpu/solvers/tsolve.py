"""Saturation-temperature solves by outer iteration over pressure solvers.

The reference exposes pressure-explicit equilibria only (vapor_pressure,
bubble_point, dew_point at given T; feos_torch/pcsaft_pure.py:201,
pcsaft_mix.py:422-468) — the temperature-explicit duals (boiling
temperature at given p, bubble/dew TEMPERATURE at given p and
composition) do not exist there.  On TPU they fall out of two pieces this
library already has:

* the batched pressure solvers are cheap to re-enter with a warm start
  (``state0``; see solvers/vle.py mix_vle), so an outer iteration costs a
  few Newton-polish-only solves instead of full solves;
* saturation lines are nearly straight in (1/T, ln p) coordinates
  (Clausius-Clapeyron), so a SECANT iteration in those coordinates
  converges superlinearly from a crude start without any tangent
  machinery inside the loop — the loop body stays a primal solve.

Gradient strategy (matches the library-wide stationarity convention,
docs/design.md): the outer loop runs entirely on stop-gradient inputs;
afterwards ONE differentiable warm solve at the converged temperature
plus one symbolic Newton step

    T_out = T* - (p(theta, T*) - p_target) / (dp/dT)|*

re-attaches exact first-order gradients w.r.t. the EOS parameters and
``p_target`` by the implicit function theorem — the same single-step
trick the reference uses for ``liquid_density``
(feos_torch/pcsaft_pure.py:196-199), applied along T.  ``dp/dT`` comes
from one ``jax.jvp`` of the same warm solve (f64-exact temperature
tangents; models/pcsaft_pure._identity_grads), evaluated once outside
the loop.
"""

import jax
import jax.numpy as jnp

# Secant slope prior: d ln p / d(1/T) ~ -(d ln p/d ln T) * T with
# d ln p/d ln T ~ 10 near the normal boiling point (Trouton's rule);
# only the FIRST step uses it, after which measured slopes take over.
_TROUTON_DLNP_DLNT = 10.0
# per-step limit on the 1/T move (relative): 0.2 allows ~25% temperature
# moves, large enough to close a 30%-off initial guess in two steps while
# keeping iterates out of the supercritical/no-root region
_MAX_REL_STEP = 0.2
_LNP_TOL = 3e-9  # on |ln p - ln p_target|; the inner solve is ~1e-9 rel


def saturation_temperature_loop(solve_warm, t0, lnp_target, u0,
                                max_outer: int = 24):
    """Batched secant iteration for T with ln p(T) = lnp_target.

    ``solve_warm(T (B,), u) -> (lnp (B,), ok (B,), u')`` must be a
    NON-differentiable (stop-gradient inputs) warm-started pressure solve:
    ``u`` is the solver's carried state pytree (NaN rows = cold/failed,
    handled by the inner solver), ``lnp`` NaN where the solve failed.

    Returns ``(T*, u*, done)`` — the converged temperatures, the carried
    state AT ``T*`` (for the caller's final differentiable solve), and the
    per-row convergence mask.  Rows whose target is unreachable (e.g.
    p_target above the critical pressure) exhaust ``max_outer`` with
    ``done=False``; they never poison converged rows (frozen rows hold
    their state, failed evaluations bisect back toward the last good
    iterate).
    """
    t0 = jnp.asarray(t0, dtype=jnp.float64)
    iT0 = 1.0 / t0

    def cond(c):
        it, done = c[-2], c[-1]
        return jnp.any(~done) & (it < max_outer)

    def body(c):
        iT, iT_prev, lnp_prev, u, it, done = c
        lnp, ok, u_new = solve_warm(1.0 / iT, u)
        fin = ok & jnp.isfinite(lnp)
        err = lnp - lnp_target
        # measured secant slope where two finite points exist; the Trouton
        # prior otherwise.  Saturation slopes are strictly negative in
        # (1/T, ln p); the clamp keeps a noise-corrupted slope from
        # reversing the march direction or exploding the step.
        have_prev = jnp.isfinite(lnp_prev) & (
            jnp.abs(iT - iT_prev) > 1e-14 * iT
        )
        b = jnp.where(
            fin & have_prev,
            (lnp - lnp_prev) / jnp.where(
                jnp.abs(iT - iT_prev) > 0, iT - iT_prev, 1.0
            ),
            -_TROUTON_DLNP_DLNT / iT0,
        )
        b = jnp.minimum(b, -1e-2 / iT0)
        diT = jnp.clip(
            (lnp_target - lnp) / b, -_MAX_REL_STEP * iT, _MAX_REL_STEP * iT
        )
        # failed evaluation (overshot past the critical point / out of the
        # solver's reach): bisect back toward the last good iterate
        iT_next = jnp.where(fin, iT + diT, 0.5 * (iT + iT_prev))
        done_new = done | (fin & (jnp.abs(err) < _LNP_TOL))
        live = fin & ~done
        carry = (
            jnp.where(done_new, iT, iT_next),
            jnp.where(live, iT, iT_prev),
            jnp.where(live, lnp, lnp_prev),
            jax.tree_util.tree_map(
                lambda a, b_: jnp.where(
                    (ok & ~done).reshape((-1,) + (1,) * (a.ndim - 1)), b_, a
                ),
                u, u_new,
            ),
            it + 1,
            done_new,
        )
        return carry

    lnp_prev0 = jnp.full_like(iT0, jnp.nan)
    done0 = jnp.zeros(iT0.shape, dtype=bool)
    iT, _, _, u, _, done = jax.lax.while_loop(
        cond, body, (iT0, iT0, lnp_prev0, u0, 0, done0)
    )
    return 1.0 / iT, u, done


def reattach_temperature(solve_diff, t_star, u_star, p_target, done):
    """Exact first-order gradients for a converged saturation temperature.

    ``solve_diff(T, u) -> p (B,)`` must be the DIFFERENTIABLE warm solve
    (live parameters in its closure as solver *arguments*, gradients via
    the stationary identities).  The parameter-differentiable pressure at
    ``t_star`` comes from a PLAIN call — the stationary-identity
    ``custom_jvp`` rules must see the caller's parameter tangents
    directly; routing the value through a ``jax.jvp`` primal severs them,
    because the rules rebuild their primal from ``stop_gradient``-ed
    arguments (models/pcsaft_pure._identity_grads), so grad-of-jvp-primal
    is exactly zero (measured).  dp/dT comes from a second, gradient-
    isolated ``jax.jvp`` along T (the rules' f64-exact state-argument
    partial); the symbolic Newton step then carries the implicit-function
    gradients while leaving the value at ``t_star`` up to the solver's
    residual (|ln p - ln p_target| < 3e-9, reduced further by this step).
    """
    t_s = jax.lax.stop_gradient(t_star)
    u_s = jax.lax.stop_gradient(u_star)
    p_at = solve_diff(t_s, u_s)
    _, dp_dT = jax.jvp(
        lambda t: solve_diff(t, u_s), (t_s,), (jnp.ones_like(t_s),)
    )
    dp_dT = jax.lax.stop_gradient(dp_dT)
    # failed rows carry NaN pressures; park their denominator (output is
    # NaN-masked anyway, but a NaN here would poison batch gradients)
    dp_dT = jnp.where(
        done & jnp.isfinite(dp_dT) & (jnp.abs(dp_dT) > 0.0), dp_dT, 1.0
    )
    p_safe = jnp.where(done & jnp.isfinite(p_at), p_at, p_target)
    t_out = t_s - (p_safe - p_target) / dp_dT
    return jnp.where(done, t_out, jnp.nan)
