"""Continuation warm starts: solver state carried across repeated solves.

The optimizer-loop fast path (``state0``/``state_output`` on
bubble_point/dew_point, used by ``fit_binary``/``fit_gc``): a converged
log-state from a previous solve replaces the iterative initialization
(NPT, successive substitution, f32 Newton warmup) entirely.  These tests
pin the contract: warm results are IDENTICAL to cold results (same
residual acceptance), gradients are unchanged, and a poisoned (NaN) warm
state fails its row's mask without touching the rest of the batch.

No reference counterpart: the reference re-initializes its feos-crate
solves from scratch at every optimizer step (src/pcsaft.rs:150-214 takes
only a pressure estimate).
"""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models.pcsaft_mix import bubble_point, dew_point, static_branches

PARAMS = np.array([
    [[1.0, 3.5, 150.0, 0, 0.02, 1500.0, 1, 1],
     [1.0, 3.5, 200.0, 0, 0.03, 2500.0, 1, 1]],
] * 4)
KIJ = np.tile([-0.15, 1000.0], (4, 1))
T = np.array([145.0, 150.0, 155.0, 160.0])
X = np.full(4, 0.5)
P0 = np.full(4, 1e5)
BR = static_branches(PARAMS)


def _solve_cold_with_state(fn):
    return jax.jit(lambda *a: fn(*a, branches=BR, state_output=True))(
        PARAMS, KIJ, T, X, P0
    )


def test_warm_equals_cold_bubble_dew():
    """Warm solve at perturbed kij reproduces the cold solve there to the
    solver's own accuracy bar (the acceptance criteria are identical)."""
    kij2 = KIJ + np.array([1e-3, 0.0])
    for fn in (bubble_point, dew_point):
        _, nans, u = _solve_cold_with_state(fn)
        assert not np.any(nans)
        p_warm, nans_w = jax.jit(
            lambda *a, fn=fn, u=u: fn(*a, branches=BR, state0=u)
        )(PARAMS, kij2, T, X, P0)
        p_cold, nans_c = jax.jit(lambda *a, fn=fn: fn(*a, branches=BR))(
            PARAMS, kij2, T, X, P0
        )
        assert not np.any(nans_w) and not np.any(nans_c)
        np.testing.assert_allclose(
            np.asarray(p_warm), np.asarray(p_cold), rtol=1e-9
        )


def test_warm_gradients_equal_cold():
    """The stationary re-attachment identity is initialization-agnostic:
    kij/eps_AiBj gradients through the warm path equal the cold path."""
    _, nans, u = _solve_cold_with_state(bubble_point)
    kij2 = jnp.asarray(KIJ + np.array([1e-3, 0.0]))

    def f(k, state0):
        p, _ = bubble_point(PARAMS, k, T, X, P0, branches=BR, state0=state0)
        return jnp.sum(p)

    g_w = jax.jit(jax.grad(f))(kij2, jnp.asarray(u))
    g_c = jax.jit(jax.grad(lambda k: f(k, None)))(kij2)
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_c), rtol=1e-7)


def test_nan_warm_state_masks_row_only():
    """A NaN warm state (a row that never converged) is parked and masked;
    the rest of the batch is unaffected."""
    _, nans, u = _solve_cold_with_state(bubble_point)
    u_bad = np.asarray(u).copy()
    u_bad[1] = np.nan
    p, nans_b = jax.jit(
        lambda *a: bubble_point(*a, branches=BR, state0=jnp.asarray(u_bad))
    )(PARAMS, KIJ, T, X, P0)
    nans_b = np.asarray(nans_b)
    assert nans_b[1]
    assert not nans_b[[0, 2, 3]].any()
    assert np.isfinite(np.asarray(p)[[0, 2, 3]]).all()
