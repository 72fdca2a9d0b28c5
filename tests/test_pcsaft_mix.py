"""Binary-mixture PC-SAFT tests.

Mirrors reference tests/test_pcsaft_mix.py (SURVEY.md section 4): oracle
equivalence of the Helmholtz energy density and the full derivative set over
all 14 association/dipole regime combinations (golden values generated from
the reference implementation), bubble/dew-point solves, and
finite-difference gradient checks for the binary interaction parameters.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models import pcsaft_mix as M
from feos_tpu.models.pcsaft_pure import vapor_pressure

GOLDEN = Path(__file__).parent / "golden"


def _spec(fn, params):
    """Jit ``fn`` with the static phi-branch set of the concrete batch
    (the facade calling convention; keeps solver graphs 2-4x smaller than
    the generic all-branches trace)."""
    from functools import partial

    return jax.jit(partial(fn, branches=M.static_branches(params)))


def _golden():
    return json.loads((GOLDEN / "mix_helmholtz.json").read_text())


def test_helmholtz_energy_density_golden():
    d = _golden()
    n = len(d["params"])
    T = jnp.full((n,), d["temperature"])
    rho = jnp.tile(jnp.asarray(d["density"]), (n, 1))
    a = jax.jit(M.helmholtz_energy_density)(
        np.array(d["params"]), np.array(d["kij"]), T, rho
    )
    np.testing.assert_allclose(a, d["a"], rtol=0, atol=1e-14)


def test_derivatives_golden():
    """A, p~, mu_i, v_i vs the reference DualTensor implementation, all 14
    regime cases (labels np/np ... aa/aa, reference tests/test_pcsaft_mix.py:95-124)."""
    d = _golden()
    n = len(d["params"])
    T = jnp.full((n,), d["temperature"])
    rho = jnp.tile(jnp.asarray(d["density"]), (n, 1))
    a, p, mu, v = jax.jit(M.derivatives)(
        np.array(d["params"]), np.array(d["kij"]), T, rho
    )
    np.testing.assert_allclose(a, d["a"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(p, d["p"], rtol=0, atol=1e-14)
    np.testing.assert_allclose(mu, d["mu"], rtol=0, atol=1e-13)
    np.testing.assert_allclose(v, d["v"], rtol=0, atol=1e-11)


BUBBLE_PARAMS = [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]]
DEW_PARAMS = [[1, 3.5, 150, 0, 0, 0, 0, 0], [1, 3.5, 200, 0, 0, 0, 0, 0]]


def test_bubble_point_all_gradients_fd():
    """kij, epsilon_k_AiBj, and all 8 component parameters of component 0
    through bubble_point vs central finite differences.

    Port of reference tests/test_pcsaft_mix.py:127-192 (kij / eps_AiBj;
    the oracle pressure is replaced by the in-repo C++ oracle and
    equilibrium-condition checks) plus the component-parameter sweep (the
    reference FD-checks the pure path, tests/test_pcsaft_pure.py:91-161).
    All FD evaluations share ONE batched solve and all AD gradients share
    ONE jitted value_and_grad graph — the solver compiles are the
    dominant cost of this suite on XLA:CPU.
    """
    base = np.array(BUBBLE_PARAMS, dtype=np.float64)
    kij0, eps0 = -0.15, 1000.0
    T1 = jnp.full((1,), 150.0)
    x1 = jnp.full((1,), 0.5)
    p01 = jnp.full((1,), 1e5)
    br = M.static_branches([BUBBLE_PARAMS])

    # one AD graph for every gradient: d p_bubble / d(params0, kij, eps)
    def f(params0, k, e):
        pp, _ = M.bubble_point(
            jnp.stack([params0, jnp.asarray(base[1])])[None],
            jnp.stack([k, e])[None], T1, x1, p01, branches=br,
        )
        return pp[0]

    g_par, g_kij, g_eps = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(
        jnp.asarray(base[0]), jnp.asarray(kij0), jnp.asarray(eps0)
    )
    assert np.all(np.isfinite(np.asarray(g_par)))

    # one batched solve for every central FD column:
    # rows 0..15 = +-h on the 8 component parameters, 16..17 = kij +-h,
    # 18..19 = eps_AiBj +-h
    hs = np.maximum(np.abs(base[0]), 1.0) * 3e-7
    h_kij, h_eps = 1e-8, 1e-4
    batch, kij_rows = [], []
    for i in range(8):
        for sgn in (+1.0, -1.0):
            p_i = base.copy()
            p_i[0, i] += sgn * hs[i]
            batch.append(p_i)
            kij_rows.append([kij0, eps0])
    for sgn in (+1.0, -1.0):
        batch.append(base.copy())
        kij_rows.append([kij0 + sgn * h_kij, eps0])
    for sgn in (+1.0, -1.0):
        batch.append(base.copy())
        kij_rows.append([kij0, eps0 + sgn * h_eps])
    batch = np.asarray(batch)
    n = batch.shape[0]
    p_all, nans = _spec(M.bubble_point, batch)(
        batch, np.asarray(kij_rows), jnp.full((n,), 150.0),
        jnp.full((n,), 0.5), jnp.full((n,), 1e5),
    )
    assert not np.any(nans)
    p_all = np.asarray(p_all)

    fd_par = np.array(
        [(p_all[2 * i] - p_all[2 * i + 1]) / (2 * hs[i]) for i in range(8)]
    )
    scale = np.maximum(np.abs(fd_par), 1.0)
    np.testing.assert_allclose(np.asarray(g_par) / scale, fd_par / scale, atol=2e-4)

    fd_kij = (p_all[16] - p_all[17]) / (2 * h_kij)
    assert np.abs(g_kij - fd_kij) < 1.0, f"ad={g_kij} fd={fd_kij}"

    fd_eps = (p_all[18] - p_all[19]) / (2 * h_eps)
    assert np.abs(g_eps - fd_eps) < np.abs(fd_eps) * 1e-3 + 1e-3, (
        f"ad={g_eps} fd={fd_eps}"
    )


def test_dew_point_gradient_fd():
    """kij gradient of the dew pressure vs finite differences
    (reference tests/test_pcsaft_mix.py:195-251)."""
    h = 1e-8
    params = np.array([DEW_PARAMS] * 2, dtype=np.float64)
    kij = np.array([[-0.15, 0.0], [-0.15 + h, 0.0]])
    T = jnp.full((2,), 150.0)
    y = jnp.full((2,), 0.5)
    p0 = jnp.full((2,), 1e5)
    p, nans = _spec(M.dew_point, params)(params, kij, T, y, p0)
    assert not np.any(nans)
    fd = (p[1] - p[0]) / h
    br = M.static_branches(params)

    def f(k):
        pp, _ = M.dew_point(params[:1], jnp.array([[k, 0.0]]), T[:1], y[:1],
                            p0[:1], branches=br)
        return pp[0]

    grad = jax.jit(jax.grad(f))(jnp.asarray(-0.15))
    assert np.abs(grad - fd) < 1.0, f"ad={grad} fd={fd}"


def test_bubble_dew_coincide_for_identical_components():
    """Absolute anchor: a 'binary' of two identical components with kij = 0
    must reproduce the pure-component vapor pressure at any composition
    (bubble = dew = saturation pressure).  The pure vapor pressure itself is
    anchored to the reference README values (test_pcsaft_pure.py)."""
    comp = [1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0]
    params = np.array([[comp, comp]] * 2, dtype=np.float64)
    kij = np.zeros((2, 2))
    T = jnp.array([300.0, 350.0])
    x = jnp.full((2,), 0.3)
    p0 = jnp.array([2e5, 1e6])
    _, vp = jax.jit(vapor_pressure)(np.array([comp] * 2), T)
    pb, nb = jax.jit(M.bubble_point)(params, kij, T, x, p0)
    pd, nd = jax.jit(M.dew_point)(params, kij, T, x, p0)
    assert not np.any(nb) and not np.any(nd)
    np.testing.assert_allclose(pb, vp, rtol=1e-7)
    np.testing.assert_allclose(pd, vp, rtol=1e-7)


def test_mix_reduces_to_pure_at_trace_dilution():
    """phi of a binary with a vanishing second component equals pure phi."""
    from feos_tpu.models.pcsaft_pure import PcSaftPure

    comp1 = [1.5, 3.2, 150, 2.5, 0.03, 2500, 1, 1]
    comp2 = [1.0, 3.0, 100, 0, 0, 0, 0, 0]
    params = np.array([[comp1, comp2]], dtype=np.float64)
    T = jnp.array([300.0])
    rho = jnp.array([[0.004, 1e-30]])
    a_mix = jax.jit(M.helmholtz_energy_density)(params, None, T, rho)
    a_pure = PcSaftPure(np.array([comp1])).helmholtz_energy(T, jnp.array([0.004]))
    np.testing.assert_allclose(a_mix, a_pure, rtol=1e-12)


def test_dew_point_robust_to_high_p0():
    """Dew solve with a size-asymmetric binary (butane/octane-like) and an
    initial pressure ~30x above the true dew pressure.  Regression test for
    the dew SS warmup: pinning the incipient liquid's MOLAR density while
    its composition rotated to the heavy component over-compressed the
    liquid (positive residual mu) and caused a period-2 oscillation; the
    warmup now pins the packing fraction instead."""
    params = np.array(
        [[[2.33, 3.71, 222.88, 0, 0, 0, 0, 0],
          [3.82, 3.84, 242.78, 0, 0, 0, 0, 0]]] * 2,
        dtype=np.float64,
    )
    kij = np.zeros((2, 2))
    T = jnp.full((2,), 300.0)
    y = jnp.full((2,), 0.4)
    p0 = jnp.full((2,), 1e5)
    eos = M.PcSaftMix(params, kij)
    pd, nd = jax.jit(eos.dew_point)(T, y, p0)
    assert not np.any(nd)
    pb, nb = jax.jit(eos.bubble_point)(T, y, p0)
    assert not np.any(nb)
    # dew well below bubble for this wide-boiling pair
    assert np.all(np.asarray(pd) < 0.5 * np.asarray(pb))
    # cross-check against the independent C++ oracle
    from feos_tpu import cpu_backend

    _, p_cpp, ok_cpp = cpu_backend.mix_vle_densities(
        np.asarray(params), np.asarray(kij), np.asarray(T), np.asarray(y),
        np.asarray(p0), bubble=False,
    )
    assert ok_cpp.all()
    np.testing.assert_allclose(np.asarray(pd), p_cpp, rtol=1e-7)
