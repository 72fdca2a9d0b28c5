"""Randomized cross-validation sweeps: JAX solvers vs the C++ oracle.

The pinned oracle tests (test_cpu_backend.py) cover the reference's own
test conditions; these sweeps draw hundreds of random *physical* parameter
sets and states (seeded, deterministic) and require the two independent
implementations to agree on convergence behavior and on every converged
result.  This is the wide-range robustness evidence the reference gets
from its FeOs-oracle grid (reference tests/test_pcsaft_pure.py:9-88),
extended to randomized coverage.

Temperatures are placed below a crude PC-SAFT critical-temperature
correlation Tc ~ eps_k (0.89 + 0.38 m) (fit to methane/butane/octane);
rows that land supercritical or otherwise unsolvable must be *masked
identically* by both implementations (small mismatch budget for
genuinely marginal rows near the spinodal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu import cpu_backend

pytestmark = pytest.mark.skipif(
    not cpu_backend.available(), reason="no C++ toolchain for native backend"
)


def _random_params(rng, n):
    """Random physical PC-SAFT parameter rows: 1/3 plain, 1/3 dipolar,
    1/3 two-site associating."""
    m = rng.uniform(1.0, 4.0, n)
    sigma = rng.uniform(3.0, 4.0, n)
    eps = rng.uniform(150.0, 400.0, n)
    mu = np.where(rng.random(n) < 1.0 / 3.0, rng.uniform(1.0, 4.0, n), 0.0)
    assoc = rng.random(n) < 1.0 / 3.0
    kap = np.where(assoc, rng.uniform(0.01, 0.05, n), 0.0)
    eab = np.where(assoc, rng.uniform(1000.0, 2800.0, n), 0.0)
    na = nb = assoc.astype(float)
    return np.stack([m, sigma, eps, mu, kap, eab, na, nb], axis=1)


def _tc_estimate(params):
    return params[:, 2] * (0.89 + 0.38 * params[:, 0])


def test_fuzz_pure_vle_vs_oracle():
    from feos_tpu.models.pcsaft_pure import PureParams
    from feos_tpu.solvers.vle import pure_vle

    rng = np.random.default_rng(20260818)
    B = 256
    params = _random_params(rng, B)
    T = rng.uniform(0.55, 0.90, B) * _tc_estimate(params)

    rho_cpp, ok_cpp = cpu_backend.vapor_pressure_densities(params, T)
    p = PureParams.from_array(jnp.asarray(params))
    rv, rl, ok_jax = jax.jit(jax.vmap(pure_vle))(p, jnp.asarray(T))
    ok_jax = np.asarray(ok_jax)

    both = ok_cpp & ok_jax
    mismatch = ok_cpp ^ ok_jax
    # the sweep must actually exercise the solvers...
    assert both.sum() >= 0.7 * B, f"only {both.sum()}/{B} rows converged"
    # ...and the two implementations must agree on what is solvable
    # (marginal rows at the spinodal may differ)
    assert mismatch.sum() <= 0.02 * B, (
        f"{mismatch.sum()} convergence mismatches at rows "
        f"{np.nonzero(mismatch)[0][:10]}"
    )
    np.testing.assert_allclose(
        np.asarray(rv)[both], rho_cpp[both, 0], rtol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(rl)[both], rho_cpp[both, 1], rtol=1e-9
    )


def test_fuzz_binary_bubble_dew_vs_oracle():
    from feos_tpu.models import pcsaft_mix as M

    rng = np.random.default_rng(20260819)
    B = 64
    p1 = _random_params(rng, B)
    p2 = _random_params(rng, B)
    params = np.stack([p1, p2], axis=1)  # (B, 2, 8)
    kij = np.stack(
        [rng.uniform(-0.15, 0.15, B), np.zeros(B)], axis=1
    )
    tc = np.minimum(_tc_estimate(p1), _tc_estimate(p2))
    T = rng.uniform(0.55, 0.85, B) * tc
    x = rng.uniform(0.1, 0.9, B)
    p0 = np.full(B, 1e5)

    eos = M.PcSaftMix(params, kij)
    for bubble, fn in ((True, eos.bubble_point), (False, eos.dew_point)):
        rho_cpp, p_cpp, ok_cpp = cpu_backend.mix_vle_densities(
            params, kij, T, x, p0, bubble=bubble
        )
        p_jax, nans = jax.jit(fn)(T, x, p0)
        ok_jax = ~np.asarray(nans)
        both = ok_cpp & ok_jax
        mismatch = ok_cpp ^ ok_jax
        label = "bubble" if bubble else "dew"
        assert both.sum() >= 0.6 * B, (
            f"{label}: only {both.sum()}/{B} rows converged"
        )
        assert mismatch.sum() <= 0.06 * B, (
            f"{label}: {mismatch.sum()} convergence mismatches at rows "
            f"{np.nonzero(mismatch)[0][:10]}"
        )
        np.testing.assert_allclose(
            np.asarray(p_jax)[both], p_cpp[both], rtol=1e-7,
            err_msg=f"{label} pressures diverge from oracle",
        )


def test_fuzz_gc_bubble_dew_vs_oracle():
    """Random (T, x) sweep of the heterosegmented gc path over the
    sauer2014 butane/propane system (segment-resolved chain + dispersion,
    phi correction, kab)."""
    import json
    from pathlib import Path

    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in [
            "m", "sigma", "epsilon_k", "mu", "kappa_ab", "epsilon_k_ab",
            "na", "nb",
        ]
    )
    rng = np.random.default_rng(20260820)
    B = 64
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [("CH3", "CH2", -0.05)],
        np.tile([1.1, 0.98], (B, 1)),
    )
    T = rng.uniform(220.0, 330.0, B)
    x = rng.uniform(0.1, 0.9, B)
    p0 = np.full(B, 1e5)
    for bubble, fn in ((True, eos.bubble_point), (False, eos.dew_point)):
        rho_cpp, p_cpp, ok_cpp = cpu_backend.gc_vle_densities(
            eos.params, T, x, p0, bubble
        )
        p_jax, nans = jax.jit(fn)(T, x, p0)
        ok_jax = ~np.asarray(nans)
        both = ok_cpp & ok_jax
        mismatch = ok_cpp ^ ok_jax
        label = "gc bubble" if bubble else "gc dew"
        assert both.sum() >= 0.8 * B, (
            f"{label}: only {both.sum()}/{B} rows converged"
        )
        assert mismatch.sum() <= 0.06 * B, (
            f"{label}: {mismatch.sum()} convergence mismatches"
        )
        np.testing.assert_allclose(
            np.asarray(p_jax)[both], p_cpp[both], rtol=1e-7,
            err_msg=f"{label} pressures diverge from oracle",
        )
