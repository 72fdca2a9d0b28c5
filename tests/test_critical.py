"""Pure-component critical point solver (beyond-reference capability).

The reference's solvers stop below the critical point (its tests never
probe T >= Tc; reference tests/test_pcsaft_pure.py); ``pure_critical``
solves dp/drho = 0 and d2p/drho2 = 0 simultaneously.  Validation is
independent of the solver: analytic pressure derivatives at the returned
state, VLE solvability bracketing around T_c, literature critical
temperatures for Gross & Sadowski (2001) parameter sets, and FD gradient
cross-checks of the implicit-function re-attachment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu.models.pcsaft_pure import (
    PcSaftPure, PureParams, critical_point, pure_derivatives,
)
from feos_tpu.units import KMOL_M3_TO_REDUCED

# Gross & Sadowski (2001), Table 1 — [m, sigma, eps_k] + experimental Tc (K)
GS2001 = {
    "methane": ([1.0000, 3.7039, 150.03], 190.6),
    "butane": ([2.3316, 3.7086, 222.88], 425.2),
    "octane": ([3.8176, 3.8373, 242.78], 568.7),
}


def _params(rows):
    return np.array([r + [0.0] * 5 for r in rows])


@pytest.fixture(scope="module")
def crit_gs2001():
    rows = [v[0] for v in GS2001.values()]
    nans, tc, rho_c = jax.jit(critical_point)(jnp.asarray(_params(rows)))
    return np.asarray(nans), np.asarray(tc), np.asarray(rho_c)


def test_critical_conditions_hold(crit_gs2001):
    """dp~/drho and d2p~/drho2 vanish at the returned state (analytic first
    condition, FD second condition — neither is the solver's own residual
    path)."""
    nans, tc, rho_c = crit_gs2001
    assert not nans.any()
    p = PureParams.from_array(jnp.asarray(_params([v[0] for v in GS2001.values()])))
    rho_red = jnp.asarray(rho_c) * KMOL_M3_TO_REDUCED
    _, pt, dpt = jax.vmap(pure_derivatives)(p, jnp.asarray(tc), rho_red)
    # scale: at the critical point p~ ~ rho, so dp~/drho is measured
    # against p~/rho (the ideal-gas stiffness)
    np.testing.assert_array_less(
        np.abs(np.asarray(dpt)) / (np.asarray(pt) / np.asarray(rho_red)), 1e-5
    )
    h = 1e-4
    _, _, dpt_p = jax.vmap(pure_derivatives)(p, jnp.asarray(tc), rho_red * (1 + h))
    _, _, dpt_m = jax.vmap(pure_derivatives)(p, jnp.asarray(tc), rho_red * (1 - h))
    d2 = (np.asarray(dpt_p) - np.asarray(dpt_m)) / (2 * h * np.asarray(rho_red))
    np.testing.assert_array_less(
        np.abs(d2) * np.asarray(rho_red) ** 2 / np.asarray(pt), 1e-3
    )


def test_critical_temperature_literature(crit_gs2001):
    """PC-SAFT is a classical EOS: it overshoots the experimental Tc by a
    few percent (no density-fluctuation crossover).  Bars: above Tc_exp - 1 K,
    within 6%."""
    _, tc, _ = crit_gs2001
    tc_exp = np.array([v[1] for v in GS2001.values()])
    assert (tc > tc_exp - 1.0).all(), (tc, tc_exp)
    assert (np.abs(tc - tc_exp) / tc_exp < 0.06).all(), (tc, tc_exp)


def test_vle_solvable_below_not_above(crit_gs2001):
    """T_c separates the solvable VLE region from the unsolvable one."""
    _, tc, _ = crit_gs2001
    eos = PcSaftPure(_params([v[0] for v in GS2001.values()]))
    nans_lo, p_lo = eos.vapor_pressure(tc * 0.98)
    assert not np.asarray(nans_lo).any()
    assert np.isfinite(np.asarray(p_lo)).all()
    nans_hi, _ = eos.vapor_pressure(tc * 1.03)
    assert np.asarray(nans_hi).all()


def test_critical_point_gradients_fd():
    """Implicit-function gradients of T_c match central finite differences
    (associating fluid: the re-attachment must see every phi branch)."""
    row = [1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0]
    p0 = jnp.asarray([row])

    def tc_of(p):
        _, tc, _ = critical_point(p)
        return tc[0]

    g = jax.jit(jax.grad(tc_of))(p0)
    g = np.asarray(g)[0]
    for j, h in ((0, 1e-5), (2, 1e-3), (5, 1e-2)):
        pp = np.asarray(p0).copy(); pp[0, j] += h
        pm = np.asarray(p0).copy(); pm[0, j] -= h
        fd = (tc_of(jnp.asarray(pp)) - tc_of(jnp.asarray(pm))) / (2 * h)
        np.testing.assert_allclose(g[j], fd, rtol=2e-5, err_msg=f"param {j}")


def test_facade_critical_point():
    eos = PcSaftPure(_params([GS2001["methane"][0]]))
    nans, tc, rho_c = eos.critical_point()
    assert not np.asarray(nans).any()
    # critical density sanity: eta_c ~ 0.15-0.20 for chains -> methane
    # rho_c ~ 10 kmol/m^3 (exp. 10.1); classical EOS overshoots some
    assert 7.0 < float(rho_c[0]) < 15.0
