"""Binary p-x-y diagram construction + bubble<->dew round-trip closure.

The round trip is a solver-level consistency oracle the reference does not
have (its native solvers discard the incipient composition): a bubble solve
at liquid composition x gives (p, y); a dew solve at vapor composition y
must recover the SAME equilibrium state — pressure p and liquid composition
x — because both parameterize one coexistence point.  Agreement is limited
only by the two solves' acceptance tolerances.
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu.diagrams import binary_pxy, gc_binary_pxy
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
    # the light component (higher psat: propane) enriches the vapor
    light = int(np.argmax(psat))
    if light == 0:
        assert np.all(np.asarray(d.y1) > np.asarray(d.x1))
    else:
        assert np.all(np.asarray(d.y1) < np.asarray(d.x1))


def test_binary_pxy_scalar_kij():
    """A scalar kij means [k_ij, eps_AiBj=0] — it must NOT be broadcast
    into the eps_AiBj column (which would activate an induced-association
    override the user never asked for)."""
    d_scalar = binary_pxy(PARAMS, 0.02, T, n_points=N)
    d_pair = binary_pxy(PARAMS, [0.02, 0.0], T, n_points=N)
    np.testing.assert_array_equal(np.asarray(d_scalar.p), np.asarray(d_pair.p))
    with pytest.raises(ValueError, match="k_ij"):
        binary_pxy(PARAMS, [0.02, 0.0, 1.0], T, n_points=N)


def test_gc_binary_pxy():
    """gc facade over the replicated-batch construction: the batch axis IS
    the composition grid (one facade instance per diagram)."""
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    # n-butane / propane, replicated N times
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * N,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * N,
        [],
        None,
    )
    d = gc_binary_pxy(eos, 300.0, n_points=N)
    assert d.x1.shape == d.y1.shape == d.p.shape == d.nans.shape == (N,)
    assert not np.any(np.asarray(d.nans))
    # x1 is the n-butane (heavy) fraction: the vapor is butane-lean
    assert np.all(np.asarray(d.y1) < np.asarray(d.x1))
    # bubble pressure decreases monotonically with the heavy fraction
    assert np.all(np.diff(np.asarray(d.p)) < 0.0)
    # batch-size mismatch must fail with a clear message, not a shape error
    with pytest.raises(ValueError, match="batch dimension"):
        gc_binary_pxy(eos, 300.0, n_points=N + 1)


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


def test_binary_txy():
    """Isobaric T-x-y: bubble temperatures bracketed by the pure boiling
    points, vapor enriched in the light component, and the (x, T) bubble
    curve consistent with an isothermal bubble-pressure solve at each
    returned temperature."""
    from feos_tpu.diagrams import binary_txy
    from feos_tpu.models import pcsaft_pure

    P = 3e5
    d = binary_txy(PARAMS, None, P, n_points=N)
    assert d.x1.shape == d.y1.shape == d.t.shape == d.nans.shape == (N,)
    assert not np.any(np.asarray(d.nans))
    # pure boiling points bracket the curve; more propane (light, x1)
    # lowers the bubble temperature monotonically
    nb, tb = pcsaft_pure.boiling_temperature(
        jnp.asarray(PARAMS), jnp.full((2,), P), 1.2 * jnp.asarray(PARAMS)[:, 2]
    )
    assert not np.any(np.asarray(nb))
    t = np.asarray(d.t)
    assert np.all(t > float(tb.min()) - 1e-9) and np.all(t < float(tb.max()) + 1e-9)
    assert np.all(np.diff(t) < 0.0)  # x1 = propane fraction rises
    assert np.all(np.asarray(d.y1) > np.asarray(d.x1))  # light enriches vapor
    # cross-solver closure: isothermal bubble pressure at (x1, T) == P
    batch = jnp.broadcast_to(jnp.asarray(PARAMS), (N, 2, 8))
    p_back, nans2 = pcsaft_mix.bubble_point(
        batch, None, d.t, d.x1, jnp.full((N,), P)
    )
    assert not np.any(np.asarray(nans2))
    np.testing.assert_allclose(np.asarray(p_back), P, rtol=1e-9)


def test_gc_binary_txy():
    """gc isobaric T-x-y over the replicated-batch facade."""
    from feos_tpu.diagrams import gc_binary_txy
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * N,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * N,
        [],
        None,
    )
    d = gc_binary_txy(eos, 3e5, n_points=N)
    assert not np.any(np.asarray(d.nans))
    # x1 is the n-butane (heavy) fraction: bubble T rises with it and the
    # vapor is butane-lean
    assert np.all(np.diff(np.asarray(d.t)) > 0.0)
    assert np.all(np.asarray(d.y1) < np.asarray(d.x1))
    p_back, nans2 = eos.bubble_point(d.t, d.x1, jnp.full((N,), 3e5))
    assert not np.any(np.asarray(nans2))
    np.testing.assert_allclose(np.asarray(p_back), 3e5, rtol=1e-9)
