"""Binary p-x-y diagram construction + bubble<->dew round-trip closure.

The round trip is a solver-level consistency oracle the reference does not
have (its native solvers discard the incipient composition): a bubble solve
at liquid composition x gives (p, y); a dew solve at vapor composition y
must recover the SAME equilibrium state — pressure p and liquid composition
x — because both parameterize one coexistence point.  Agreement is limited
only by the two solves' acceptance tolerances.
"""

import jax.numpy as jnp
import numpy as np

from feos_tpu.diagrams import binary_pxy
from feos_tpu.models import pcsaft_mix, pcsaft_pure

# propane / n-butane (Gross & Sadowski 2001), comfortably subcritical at 300 K
PARAMS = np.array(
    [[2.0020, 3.6184, 208.11, 0, 0, 0, 0, 0],
     [2.3316, 3.7086, 222.88, 0, 0, 0, 0, 0]],
    dtype=np.float64,
)
T = 300.0
N = 9


def test_binary_pxy_shape_and_bounds():
    d = binary_pxy(PARAMS, None, T, n_points=N)
    assert d.x1.shape == d.y1.shape == d.p.shape == d.nans.shape == (N,)
    assert not np.any(np.asarray(d.nans))
    # pressures bracketed by the pure-component vapor pressures
    _, psat = pcsaft_pure.vapor_pressure(
        jnp.asarray(PARAMS), jnp.array([T, T])
    )
    psat = np.asarray(psat)
    lo, hi = psat.min(), psat.max()
    p = np.asarray(d.p)
    assert np.all(p > 0.99 * lo) and np.all(p < 1.01 * hi)
    # the light component (higher psat: methane) enriches the vapor
    light = int(np.argmax(psat))
    if light == 0:
        assert np.all(np.asarray(d.y1) > np.asarray(d.x1))
    else:
        assert np.all(np.asarray(d.y1) < np.asarray(d.x1))


def test_bubble_dew_round_trip():
    d = binary_pxy(PARAMS, None, T, n_points=N)
    y = jnp.stack([d.y1, 1.0 - d.y1], axis=1)
    batch = jnp.broadcast_to(jnp.asarray(PARAMS), (N, 2, 8))
    Tb = jnp.full((N,), T)
    p_dew, nans, x_back = pcsaft_mix.dew_point(
        batch, None, Tb, y, d.p, full_output=True
    )
    assert not np.any(np.asarray(nans))
    np.testing.assert_allclose(np.asarray(p_dew), np.asarray(d.p), rtol=1e-7)
    np.testing.assert_allclose(
        np.asarray(x_back[:, 0]), np.asarray(d.x1), rtol=0, atol=1e-8
    )
