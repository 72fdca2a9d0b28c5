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
    np.testing.assert_allclose(rho_cpp[:, 0], rv, rtol=1e-7)
    np.testing.assert_allclose(rho_cpp[:, 1], rl, rtol=1e-9)


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
        rho_cpp / KMOL_M3_TO_REDUCED, rho_jax, rtol=1e-9
    )
