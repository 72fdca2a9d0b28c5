"""Cross-validation: native C++ backend vs the JAX implementation.

Two fully independent implementations of the same physics (hand-coded dual
numbers + scalar Newton in C++ vs JAX transforms + batched Newton) must
agree: Helmholtz derivatives to ~1e-14 and converged VLE densities to the
solver acceptance level.  This replaces part of the reference's FeOs oracle
coverage with an in-repo oracle.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu import cpu_backend

GOLDEN = Path(__file__).parent / "golden"

pytestmark = pytest.mark.skipif(
    not cpu_backend.available(), reason="no C++ toolchain for native backend"
)


def test_derivatives_match_golden_and_jax():
    d = json.loads((GOLDEN / "pure_helmholtz.json").read_text())
    params = np.array(d["params"])
    n = len(params)
    T = np.full(n, d["temperature"])
    rho = np.full(n, d["density"])
    a, p, dp = cpu_backend.derivatives(params, T, rho)
    np.testing.assert_allclose(a, d["a"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(p, d["p"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(dp, d["dp"], rtol=0, atol=1e-14)


def test_vle_densities_match_jax_solver():
    from feos_tpu.models.pcsaft_pure import PureParams
    from feos_tpu.solvers.vle import pure_vle

    params = np.array(
        [
            [1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0],
            [1.5, 3.2, 350.0, 0.0, 0.0, 0.0, 0.0, 0.0],
            [1.5, 3.2, 150.0, 2.5, 0.0, 0.0, 0.0, 0.0],
            [2.5, 3.7, 220.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        ]
    )
    T = np.array([300.0, 250.0, 110.0, 180.0])
    rho_cpp, ok_cpp = cpu_backend.vapor_pressure_densities(params, T)
    assert ok_cpp.all()
    p = PureParams.from_array(jnp.asarray(params))
    rv, rl, ok = jax.jit(jax.vmap(pure_vle))(p, jnp.asarray(T))
    assert np.all(np.asarray(ok))
    # both implementations apply the final Newton step before exiting, so
    # the converged densities sit at the f64 noise floor (measured max
    # 2.1e-14 vapor / 1.9e-15 liquid over the 256-row fuzz sweep) — past
    # the reference's 1e-10 bar (reference tests/test_pcsaft_pure.py:59-88)
    np.testing.assert_allclose(rho_cpp[:, 0], rv, rtol=1e-12)
    np.testing.assert_allclose(rho_cpp[:, 1], rl, rtol=1e-13)


def test_mix_derivatives_match_golden():
    """The C++ mixture core must reproduce the 14 golden association
    regimes (values generated from the reference implementation)."""
    d = json.loads((GOLDEN / "mix_helmholtz.json").read_text())
    params = np.asarray(d["params"])
    n = params.shape[0]
    T = np.full(n, float(np.asarray(d["temperature"])))
    rho = np.tile(np.asarray(d["density"]), (n, 1))
    phi, p, mu1, mu2 = cpu_backend.mix_derivatives(params, d["kij"], T, rho)
    np.testing.assert_allclose(phi, d["a"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(p, d["p"], rtol=0, atol=1e-14)
    # golden mu is residual-only; the C++ backend returns total mu
    mu_ref = np.asarray(d["mu"]) + np.log(rho)
    np.testing.assert_allclose(
        np.stack([mu1, mu2], axis=1), mu_ref, rtol=0, atol=1e-13
    )


def test_mix_bubble_dew_match_jax_solver():
    """Independent C++ oracle vs the JAX mixture VLE over the reference's
    bubble/dew test conditions (reference tests/test_pcsaft_mix.py:127-251:
    associating binary with kij = -0.15 and the eps_AiBj = 1000 override)."""
    from feos_tpu.models import pcsaft_mix as M

    B = 4
    params = np.tile(
        [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
        (B, 1, 1),
    )
    kij = np.tile([-0.15, 1000.0], (B, 1))
    T = np.array([145.0, 150.0, 155.0, 160.0])
    x = np.full(B, 0.5)
    p0 = np.full(B, 1e5)

    rho_cpp, p_cpp, ok_cpp = cpu_backend.mix_vle_densities(
        params, kij, T, x, p0, bubble=True
    )
    assert ok_cpp.all()
    eos_jax = M.PcSaftMix(params, kij)
    pb, nans = jax.jit(eos_jax.bubble_point)(T, x, p0)
    assert not np.any(nans)
    # two independent solvers against the same physics: beats the
    # reference's 1e-8 Pa absolute bar vs FeOs
    # (reference tests/test_pcsaft_mix.py:190-192); measured ~2e-12
    np.testing.assert_allclose(np.asarray(pb), p_cpp, rtol=1e-10)

    rho_cpp, p_cpp, ok_cpp = cpu_backend.mix_vle_densities(
        params, kij, T, x, p0, bubble=False
    )
    assert ok_cpp.all()
    pd, nans = jax.jit(eos_jax.dew_point)(T, x, p0)
    assert not np.any(nans)
    np.testing.assert_allclose(np.asarray(pd), p_cpp, rtol=1e-10)
    # dew pressure below bubble pressure for the same feed
    assert np.all(np.asarray(pd) < np.asarray(pb))


def test_mix_bubble_nonassoc_kij_match_jax_solver():
    """Oracle agreement on the plain non-associating kij system
    (reference tests/test_pcsaft_mix.py:195-214 dew conditions)."""
    from feos_tpu.models import pcsaft_mix as M

    B = 3
    params = np.tile(
        [[1, 3.5, 150, 0, 0, 0, 0, 0], [1, 3.5, 200, 0, 0, 0, 0, 0]], (B, 1, 1)
    )
    kij = np.tile([-0.15, 0.0], (B, 1))
    T = np.array([140.0, 150.0, 160.0])
    x = np.full(B, 0.5)
    p0 = np.full(B, 1e5)
    eos_jax = M.PcSaftMix(params, kij)
    for bubble, fn in ((True, eos_jax.bubble_point), (False, eos_jax.dew_point)):
        rho_cpp, p_cpp, ok_cpp = cpu_backend.mix_vle_densities(
            params, kij, T, x, p0, bubble=bubble
        )
        assert ok_cpp.all()
        p_jax, nans = jax.jit(fn)(T, x, p0)
        assert not np.any(nans)
        np.testing.assert_allclose(np.asarray(p_jax), p_cpp, rtol=1e-10)


def test_liquid_density_matches_jax():
    from feos_tpu.models.pcsaft_pure import liquid_density
    from feos_tpu.units import KMOL_M3_TO_REDUCED

    params = np.tile([1.5, 3.2, 150, 2.5, 0.03, 2500, 1, 1], (3, 1))
    T = np.array([290.0, 300.0, 310.0])
    p_pa = np.full(3, 1e5)
    rho_cpp, ok = cpu_backend.liquid_density_reduced(params, T, p_pa)
    assert ok.all()
    nans, rho_jax = jax.jit(liquid_density)(params, jnp.asarray(T), jnp.asarray(p_pa))
    assert not np.any(nans)
    np.testing.assert_allclose(
        rho_cpp / KMOL_M3_TO_REDUCED, rho_jax, rtol=1e-11
    )


def _oracle_fd_caloric(phi_of_t, T, rho_tot, props, rtol):
    """s_res / c_v_res from 4th-order central FD in T of an *independent
    C++* phi implementation vs the JAX temperature-jvp property layer
    (feos_tpu.properties).  phi_of_t maps a (B,) temperature array to the
    oracle's reduced Helmholtz energy density."""
    from feos_tpu.units import RGAS

    h = 0.05  # K: truncation ~h^4, f64 roundoff ~1e-16 phi / h^2 — both << rtol
    f = [phi_of_t(T + k * h) for k in (-2, -1, 0, 1, 2)]
    phi_t = (f[0] - 8 * f[1] + 8 * f[3] - f[4]) / (12 * h)
    phi_tt = (-f[0] + 16 * f[1] - 30 * f[2] + 16 * f[3] - f[4]) / (12 * h * h)
    s_fd = -RGAS * (f[2] + T * phi_t) / rho_tot
    cv_fd = -RGAS * T * (2 * phi_t + T * phi_tt) / rho_tot
    np.testing.assert_allclose(props.s_res, s_fd, rtol=rtol)
    np.testing.assert_allclose(props.c_v_res, cv_fd, rtol=rtol)


def test_pure_caloric_vs_oracle_fd():
    from feos_tpu.properties import pure_properties

    params = np.tile([1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0], (3, 1))
    T = np.array([300.0, 350.0, 400.0])
    rho = np.array([1e-2, 8e-3, 5e-3])
    props = pure_properties(params, jnp.asarray(T), jnp.asarray(rho))
    _oracle_fd_caloric(
        lambda t: cpu_backend.derivatives(params, t, rho)[0],
        T, rho, props, rtol=1e-6,
    )


def test_mix_caloric_vs_oracle_fd():
    from feos_tpu.properties import mix_properties

    d = json.loads((GOLDEN / "mix_helmholtz.json").read_text())
    params = np.array(d["params"])
    n = len(params)
    kij = np.array(d["kij"])
    T = np.full(n, d["temperature"])
    rho = np.tile(np.asarray(d["density"]), (n, 1))
    props = mix_properties(params, kij, jnp.asarray(T), jnp.asarray(rho))
    _oracle_fd_caloric(
        lambda t: cpu_backend.mix_derivatives(params, kij, t, rho)[0],
        T, rho.sum(axis=1), props, rtol=1e-5,
    )


def test_gc_caloric_vs_oracle_fd(golden_gc_eos):
    from feos_tpu.properties import gc_properties

    eos, golden = golden_gc_eos
    n = len(golden["labels"])
    T = np.full(n, golden["temperature"])
    rho = np.tile(np.asarray(golden["density"]), (n, 1))
    props = gc_properties(eos.params, jnp.asarray(T), jnp.asarray(rho))
    _oracle_fd_caloric(
        lambda t: cpu_backend.gc_derivatives(eos.params, t, rho)[0],
        T, rho.sum(axis=1), props, rtol=1e-5,
    )


def test_mix_flash_match_cpp_oracle():
    """TP flash: JAX vs the independent C++ oracle (flash_tp_cpp) over the
    test_flash systems at mid-window pressures, plus single-phase
    classification agreement.  Measured agreement on first landing:
    beta ~1e-10, compositions ~1e-11, densities ~1e-12 rel — both
    implementations converge isofugacity to their own noise floors."""
    from feos_tpu.models.pcsaft_mix import PcSaftMix

    params = np.array([
        [[1.0, 3.5, 150.0, 0, 0, 0, 0, 0], [1.0, 3.5, 200.0, 0, 0, 0, 0, 0]],
        [[1.0, 3.5, 150.0, 0, 0, 0, 0, 0], [1.0, 3.5, 200.0, 0, 0, 0, 0, 0]],
        [[1.0, 3.5, 150.0, 0, 0.02, 1500.0, 1, 1],
         [1.0, 3.5, 200.0, 0, 0.03, 2500.0, 1, 1]],
        [[1.2, 3.4, 180.0, 1.5, 0, 0, 0, 0], [2.0, 3.7, 220.0, 0, 0, 0, 0, 0]],
        [[1.0, 3.5, 150.0, 0, 0, 0, 0, 0], [1.0, 3.5, 200.0, 0, 0, 0, 0, 0]],
        [[1.0, 3.5, 150.0, 0, 0, 0, 0, 0], [1.0, 3.5, 200.0, 0, 0, 0, 0, 0]],
    ])
    kij = np.array([[0.0, 0.0], [-0.15, 0.0], [-0.15, 1000.0], [-0.05, 0.0],
                    [0.0, 0.0], [0.0, 0.0]])
    T = np.array([150.0, 150.0, 150.0, 200.0, 145.0, 155.0])
    z1 = np.array([0.4, 0.3, 0.5, 0.6, 0.2, 0.7])
    eos = PcSaftMix(params, kij)
    p0 = np.full(6, 1e5)
    p_bub, nb = eos.bubble_point(T, z1, p0)
    p_dew, nd = eos.dew_point(T, z1, p0)
    assert not (np.asarray(nb).any() or np.asarray(nd).any())
    p = np.sqrt(np.asarray(p_bub) * np.asarray(p_dew))

    bj, xj, yj, rj, phj = map(np.asarray, eos.flash(T, z1, p))
    bo, xo, yo, ro, pho = cpu_backend.mix_flash(params, kij, T, z1, p)
    assert np.all(phj == 2) and np.all(pho == 2)
    np.testing.assert_allclose(bo, bj, rtol=1e-8)
    np.testing.assert_allclose(xo, xj, rtol=0, atol=1e-9)
    np.testing.assert_allclose(yo, yj, rtol=0, atol=1e-9)
    np.testing.assert_allclose(ro, rj, rtol=1e-9)

    # single-phase classification agrees on both sides of the window
    _, _, _, _, ph_l = cpu_backend.mix_flash(params, kij, T, z1,
                                             1.2 * np.asarray(p_bub))
    assert np.all(ph_l == 0)
    _, _, _, _, ph_v = cpu_backend.mix_flash(params, kij, T, z1,
                                             0.8 * np.asarray(p_dew))
    assert np.all(ph_v == 1)


def test_gc_flash_match_cpp_oracle():
    """gc TP flash vs the C++ oracle (butane/propane at 300 K)."""
    import json as _json

    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = _json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    B = 3
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [],
        None,
    )
    t = np.full(B, 300.0)
    z1 = np.array([0.3, 0.5, 0.7])
    p0 = np.full(B, 5e5)
    p_bub, nb = eos.bubble_point(t, z1, p0)
    p_dew, nd = eos.dew_point(t, z1, p0)
    assert not (np.asarray(nb).any() or np.asarray(nd).any())
    p = np.sqrt(np.asarray(p_bub) * np.asarray(p_dew))

    bj, xj, yj, rj, phj = map(np.asarray, eos.flash(t, z1, p))
    bo, xo, yo, ro, pho = cpu_backend.gc_flash(eos.params, t, z1, p)
    assert np.all(phj == 2) and np.all(pho == 2)
    np.testing.assert_allclose(bo, bj, rtol=1e-8)
    np.testing.assert_allclose(xo, xj, rtol=0, atol=1e-9)
    np.testing.assert_allclose(yo, yj, rtol=0, atol=1e-9)
    np.testing.assert_allclose(ro, rj, rtol=1e-9)
