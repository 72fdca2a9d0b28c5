"""Thermodynamic consistency cross-checks between independent code paths.

These replace part of the reference's oracle coverage (FeOs is not
installable here, SURVEY.md section 4): different regimes/models evaluated
on states where they must coincide exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models import pcsaft_mix as M
from feos_tpu.models.pcsaft_pure import PcSaftPure


def test_cross_assoc_regime_reduces_to_self():
    """A 'binary' of two identical self-associating components (cross-assoc
    Newton regime) must equal the pure model (closed-form assoc) evaluated
    at the total density: every term including the 2-unknown association
    fixed point must agree."""
    comp = [1.5, 3.2, 150, 0, 0.03, 2500, 1, 1]
    params = np.array([[comp, comp]], dtype=np.float64)
    kij = np.zeros((1, 2))
    T = jnp.array([300.0])
    rho = jnp.array([[0.0017, 0.0023]])
    a_mix = jax.jit(M.helmholtz_energy_density)(params, kij, T, rho)
    a_pure = PcSaftPure(np.array([comp])).helmholtz_energy(T, jnp.array([0.004]))
    np.testing.assert_allclose(a_mix, a_pure, rtol=1e-12)


def test_induced_assoc_regime_consistency():
    """Induced association (1-unknown Newton) for a pair where the induced
    component has zero kappa contributes nothing: equals switching the
    second component's association off entirely."""
    c1 = [1.5, 3.2, 150, 0, 0.03, 2500, 1, 1]
    c2_induced = [2.5, 3.5, 250, 0, 0.0, 1500, 0, 1]  # kappa=0 -> delta=0
    c2_off = [2.5, 3.5, 250, 0, 0.0, 0.0, 0, 0]
    T = jnp.array([300.0])
    rho = jnp.array([[0.001, 0.002]])
    a1 = jax.jit(M.helmholtz_energy_density)(
        np.array([[c1, c2_induced]]), None, T, rho
    )
    a2 = jax.jit(M.helmholtz_energy_density)(np.array([[c1, c2_off]]), None, T, rho)
    np.testing.assert_allclose(a1, a2, rtol=1e-13)


def test_pressure_from_derivatives_matches_euler_identity():
    """p~ from the DualTensor-equivalent sweep equals the Euler relation
    sum(rho) + rho.grad(phi) - phi computed by plain reverse-mode."""
    params = np.array(
        [[[1.5, 3.2, 150, 2.5, 0.03, 2500, 1, 1], [2.5, 3.5, 250, 2, 0.025, 1500, 1, 1]]]
    )
    kij = np.array([[-0.05, 0.0]])
    T = jnp.array([300.0])
    rho = jnp.array([[0.001, 0.002]])
    _, p, mu, _ = jax.jit(M.derivatives)(params, kij, T, rho)

    from feos_tpu.models.pcsaft_mix import MixParams, phi_mix

    pi = jax.tree_util.tree_map(lambda x: x[0], MixParams.from_array(params))
    phi_fn = lambda r: phi_mix(pi, jnp.asarray(-0.05), jnp.asarray(0.0), T[0], r)
    val, g = jax.value_and_grad(phi_fn)(rho[0])
    np.testing.assert_allclose(p[0], jnp.sum(rho[0]) + rho[0] @ g - val, atol=1e-15)
    np.testing.assert_allclose(mu[0], g, atol=1e-13)


def test_vapor_pressure_clausius_clapeyron_sign():
    """dp_sat/dT > 0 and monotone increase across the table (sanity on the
    solver across a broad temperature range)."""
    params = np.tile([1.5, 3.5, 250.0, 0, 0.03, 1500.0, 1, 1], (9, 1))
    T = jnp.linspace(240.0, 460.0, 9)
    from feos_tpu.models.pcsaft_pure import vapor_pressure

    nans, vp = jax.jit(vapor_pressure)(params, T)
    assert not np.any(nans)
    assert np.all(np.diff(np.asarray(vp)) > 0)


def test_vapor_pressure_temperature_gradient_fd():
    """AD dp_sat/dT through the stationary identity vs central finite
    differences (the reference exposes temperature gradients by marking T
    requires_grad, reference tests/test_gc_pcsaft.py:141)."""
    from feos_tpu.models.pcsaft_pure import vapor_pressure

    params = np.tile([1.5, 3.5, 250.0, 0, 0.03, 1500.0, 1, 1], (1, 1))

    def psat(t):
        nans, vp = vapor_pressure(params, t[None])
        return vp[0]

    T0 = jnp.float64(300.0)
    g = jax.jit(jax.grad(psat))(T0)
    h = 1e-3
    fd = (psat(T0 + h) - psat(T0 - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-5)


def test_bubble_point_temperature_gradient_fd():
    """AD d p_bubble/dT vs central finite differences for the associating
    binary with kij (temperature enters both the solve and the stationary
    mixture identity)."""
    params = np.array(
        [[[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]]]
    )
    kij = np.array([[-0.15, 1000.0]])
    x = jnp.array([0.5])
    p0 = jnp.array([1e5])
    br = M.static_branches(params)

    def pb(t):
        p, nans = M.bubble_point(params, kij, t[None], x, p0, branches=br)
        return p[0]

    T0 = jnp.float64(150.0)
    g = jax.jit(jax.grad(pb))(T0)
    h = 1e-3
    fd = (pb(T0 + h) - pb(T0 - h)) / (2 * h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-4)


def test_assoc_q_form_matches_exact_phi():
    """The Michelsen Q-form association (stop-gradiented site fractions,
    used by the VLE solvers' f64 residual) must agree with the exact
    implicit-diff phi in VALUES and FIRST density derivatives over all 14
    golden regime cases — Q is stationary w.r.t. the site fractions at the
    mass-action solution.  (Second derivatives intentionally differ.)"""
    import json
    from pathlib import Path

    from feos_tpu.models.pcsaft_mix import MixParams, phi_mix

    d = json.loads(
        (Path(__file__).parent / "golden" / "mix_helmholtz.json").read_text()
    )
    T = jnp.float64(d["temperature"])
    rho = jnp.asarray(d["density"])

    @jax.jit
    def both(parr, kv, ev):
        p = MixParams.from_array(parr)
        exact = lambda r: phi_mix(p, kv, ev, T, r)
        qform = lambda r: phi_mix(p, kv, ev, T, r, assoc_q_form=True)
        v_e, g_e = jax.value_and_grad(exact)(rho)
        v_q, g_q = jax.value_and_grad(qform)(rho)
        return v_e, v_q, g_e, g_q

    for parr, kij in zip(d["params"], d["kij"]):
        v_e, v_q, g_e, g_q = both(
            jnp.asarray(parr), jnp.float64(kij[0]), jnp.float64(kij[1])
        )
        np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_e), rtol=1e-13)
        np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_e), rtol=1e-12)
