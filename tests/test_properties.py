"""Residual caloric property tests (feos_tpu.properties).

This property set is beyond the reference's capability surface (feos_torch
exposes no caloric properties), so there are no reference oracles; instead
the layer is pinned by thermodynamic consistency:

* finite differences in T of the golden-pinned Helmholtz functions
  (s_res, c_v for pure / all 14 mixture regimes / all 11 gc topologies),
* the Clausius-Clapeyron relation dp_sat/dT = ds / dv against AD through
  the VLE solver (ties the T-derivative layer to the equilibrium solves),
* isofugacity ln phi_V = ln phi_L at solved equilibrium states,
* c_p_res vs finite differences of h_res along an isobar with the density
  re-solved at each temperature (closes the c_p - c_v identity loop),
* pure-vs-mixture agreement for an identical-species binary (two
  independent code paths), and the ideal-gas limit.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import feos_tpu.models.pcsaft_mix as M
from feos_tpu.models.pcsaft_pure import (
    PureParams,
    liquid_density,
    vapor_pressure,
)
from feos_tpu.properties import gc_properties, mix_properties, pure_properties
from feos_tpu.units import ANGSTROM, KB, KMOL_M3_TO_REDUCED, NAV, RGAS

GOLDEN = Path(__file__).parent / "golden"
ASSOC_PARAMS = [1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0]


def _fd_temperature_checks(props, a_molar_fn, T, rtol):
    """Check s_res and c_v_res against central FD of the molar Helmholtz
    energy / internal energy in T (h = 1e-5 K; truncation ~1e-5 rel)."""
    h = 1e-5
    s_fd = -(a_molar_fn(T + h) - a_molar_fn(T - h)) / (2 * h)
    np.testing.assert_allclose(props.s_res, s_fd, rtol=rtol)

    def u_molar(t):
        f = lambda tt: a_molar_fn(tt) / (RGAS * tt)  # noqa: E731
        _, a_t = jax.jvp(f, (t,), (jnp.ones_like(t),))
        return -RGAS * t**2 * a_t

    cv_fd = (u_molar(T + h) - u_molar(T - h)) / (2 * h)
    np.testing.assert_allclose(props.c_v_res, cv_fd, rtol=rtol)


def test_pure_fd_temperature():
    params = np.tile(ASSOC_PARAMS, (3, 1))
    T = jnp.array([300.0, 350.0, 400.0])
    rho = jnp.array([1e-2, 8e-3, 5e-3])
    props = pure_properties(params, T, rho)

    p = PureParams.from_array(params)
    from feos_tpu.models.pcsaft_pure import phi_pure

    def a_molar(t):
        return RGAS * t * jax.vmap(phi_pure)(p, t, rho) / rho

    _fd_temperature_checks(props, a_molar, T, rtol=5e-5)
    # analytic identity g = h - T s (wiring check)
    np.testing.assert_allclose(
        props.g_res, props.h_res - T * props.s_res, rtol=1e-10, atol=1e-8
    )


def test_mix_fd_temperature_all_regimes():
    """s_res / c_v_res FD over all 14 association-regime golden cases —
    exercises second T-derivatives through the cross/induced association
    implicit solves."""
    d = json.loads((GOLDEN / "mix_helmholtz.json").read_text())
    n = len(d["params"])
    T = jnp.full((n,), d["temperature"])
    rho = jnp.tile(jnp.asarray(d["density"]), (n, 1))
    params, kij = np.array(d["params"]), np.array(d["kij"])

    props = mix_properties(params, kij, T, rho)
    assert np.all(np.isfinite(props.c_p_res))

    def a_molar(t):
        phi = M.helmholtz_energy_density(params, kij, t, rho)
        return RGAS * t * phi / jnp.sum(rho, axis=1)

    _fd_temperature_checks(props, a_molar, T, rtol=2e-4)


def test_gc_fd_temperature_all_topologies(golden_gc_eos):
    eos, golden = golden_gc_eos
    n = len(golden["labels"])
    T = jnp.full((n,), golden["temperature"])
    rho = jnp.tile(jnp.asarray(golden["density"]), (n, 1))

    props = gc_properties(eos.params, T, rho)
    assert np.all(np.isfinite(props.c_p_res))

    def a_molar(t):
        phi = eos.helmholtz_energy_density(t, rho)
        return RGAS * t * phi / jnp.sum(rho, axis=1)

    _fd_temperature_checks(props, a_molar, T, rtol=2e-4)


def test_clapeyron_and_isofugacity():
    """dp_sat/dT (AD through the VLE solve) vs ds/dv from the residual
    entropies, and ln phi_V = ln phi_L at the solved equilibrium."""
    from feos_tpu.solvers.vle import pure_vle

    params = np.tile(ASSOC_PARAMS, (3, 1))
    T = jnp.array([300.0, 350.0, 400.0])

    _, dpdT = jax.jvp(
        lambda t: vapor_pressure(params, t)[1], (T,), (jnp.ones_like(T),)
    )

    rv, rl, ok = jax.vmap(pure_vle)(PureParams.from_array(params), T)
    assert np.all(ok)
    pv = pure_properties(params, T, rv)
    pl = pure_properties(params, T, rl)
    ds = (pv.s_res - pl.s_res) / NAV - KB * jnp.log(rv / rl)  # J/K/molecule
    dv = (1.0 / rv - 1.0 / rl) * ANGSTROM**3  # m^3/molecule
    np.testing.assert_allclose(dpdT, ds / dv, rtol=1e-7)
    np.testing.assert_allclose(pv.ln_phi, pl.ln_phi, rtol=0, atol=1e-8)


def test_cp_isobaric_fd():
    """c_p_res = (dh_res/dT)_p with the liquid density re-solved at each
    temperature (c_p_ig cancels in the residual)."""
    params = np.tile(ASSOC_PARAMS, (3, 1))
    T = np.array([300.0, 320.0, 340.0])
    p = np.full(3, 5e6)  # 50 bar liquid

    def h_res_at(t):
        nans, rho_kmol = liquid_density(params, t, p)
        assert not np.any(nans)
        rho = jnp.asarray(rho_kmol) * KMOL_M3_TO_REDUCED
        return pure_properties(params, t, rho).h_res

    h = 1e-3  # K; density re-solve noise dominates below this
    cp_fd = (h_res_at(T + h) - h_res_at(T - h)) / (2 * h)
    nans, rho_kmol = liquid_density(params, T, p)
    props = pure_properties(params, T, jnp.asarray(rho_kmol) * KMOL_M3_TO_REDUCED)
    np.testing.assert_allclose(props.c_p_res, cp_fd, rtol=1e-4)


def test_pure_vs_mix_consistency():
    """An identical-species equimolar binary must reproduce the pure fluid
    (two independent code paths for every property)."""
    T = jnp.array([300.0])
    rtot = 1e-2
    pm = mix_properties(
        np.array([[ASSOC_PARAMS, ASSOC_PARAMS]]), None, T,
        jnp.array([[rtot / 2, rtot / 2]]),
    )
    pp = pure_properties(np.array([ASSOC_PARAMS]), T, jnp.array([rtot]))
    for field in ["pressure", "s_res", "h_res", "u_res", "c_v_res", "c_p_res"]:
        np.testing.assert_allclose(
            getattr(pm, field)[0], getattr(pp, field)[0], rtol=2e-6,
            err_msg=field,
        )


def test_ideal_gas_limit():
    params = np.tile(ASSOC_PARAMS, (2, 1))
    T = jnp.array([300.0, 400.0])
    props = pure_properties(params, T, jnp.full((2,), 1e-14))
    np.testing.assert_allclose(props.compressibility, 1.0, rtol=0, atol=1e-10)
    for field in ["s_res", "h_res", "c_v_res", "c_p_res", "ln_phi"]:
        np.testing.assert_allclose(
            getattr(props, field), 0.0, rtol=0, atol=1e-7, err_msg=field
        )
