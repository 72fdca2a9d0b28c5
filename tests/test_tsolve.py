"""Saturation-TEMPERATURE solvers (boiling point, bubble/dew T at given p).

Beyond the reference surface (feos-torch is pressure-explicit only;
feos_torch/pcsaft_pure.py:201, pcsaft_mix.py:422-468): these solve the
temperature-explicit duals by a secant outer iteration over the library's
warm-started pressure solvers (solvers/tsolve.py).  The consistency oracle
is the round trip — a temperature solve at target p followed by the
pressure solve at the returned T must recover p to the outer tolerance —
plus finite-difference checks of the implicit-function gradients.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models import pcsaft_mix as M
from feos_tpu.models import pcsaft_pure as P

# associating pure component (4C-like) — exercises the assoc machinery in
# the inner solver while staying comfortably subcritical over the p grid
PURE = np.tile([1.5, 3.5, 250.0, 0, 0.03, 1500.0, 1, 1], (4, 1))
P_GRID = jnp.array([1e4, 1e5, 5e5, 2e6])
T0 = jnp.full((4,), 300.0)


def test_boiling_temperature_roundtrip():
    nans, t = P.boiling_temperature(PURE, P_GRID, T0)
    assert not np.any(np.asarray(nans))
    # temperatures increase along the isobar grid
    assert np.all(np.diff(np.asarray(t)) > 0)
    nans2, p_back = P.vapor_pressure(PURE, t)
    assert not np.any(np.asarray(nans2))
    # the final symbolic Newton step polishes past the 3e-9 outer
    # tolerance; measured closure is ~5e-15 rel
    np.testing.assert_allclose(np.asarray(p_back), np.asarray(P_GRID),
                               rtol=1e-11)


def test_boiling_temperature_param_grad_fd():
    """dT_b/d(epsilon_k) by the implicit function theorem vs central
    finite differences of the solver itself.  The identity rides the f32
    parameter-tangent clone of vapor_pressure (noise ~1e-7 rel,
    docs/design.md)."""

    def tb(eps):
        par = jnp.asarray(PURE).at[:, 2].set(eps)
        _, t = P.boiling_temperature(par, P_GRID, T0)
        return t.sum()

    g = jax.jit(jax.grad(tb))(jnp.float64(250.0))
    h = 1e-4
    fd = (tb(jnp.float64(250.0 + h)) - tb(jnp.float64(250.0 - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-5)


def test_boiling_temperature_pressure_grad():
    """dT_b/dp must equal 1/(dp_sat/dT) (inverse function theorem); the
    right side comes from the independently tested vapor_pressure
    temperature gradient (test_consistency.py)."""
    _, t_star = P.boiling_temperature(PURE, P_GRID, T0)

    def tb(p):
        _, t = P.boiling_temperature(PURE, p, T0)
        return t.sum()

    g = jax.jit(jax.grad(tb))(P_GRID)

    def psat_scalar(tt, i):
        _, p = P.vapor_pressure(PURE, jnp.full((4,), tt))
        return p[i]

    for i in range(4):
        dpdT = jax.grad(psat_scalar)(t_star[i], i)
        np.testing.assert_allclose(np.asarray(g[i]), 1.0 / np.asarray(dpdT),
                                   rtol=1e-6)


def test_boiling_temperature_unreachable_masked():
    """A target pressure above the critical pressure has no saturation
    temperature: the row must come back masked (NaN) without poisoning
    the converged rows of the same batch."""
    p = jnp.array([1e5, 1e12, 1e5, 1e5])
    nans, t = P.boiling_temperature(PURE, p, T0)
    assert bool(nans[1]) and np.isnan(float(t[1]))
    assert not np.any(np.asarray(nans)[[0, 2, 3]])
    np.testing.assert_allclose(float(t[0]), float(t[2]), rtol=1e-12)


# propane / n-butane (Gross & Sadowski 2001)
MIXP = np.tile(
    np.array([[2.0020, 3.6184, 208.11, 0, 0, 0, 0, 0],
              [2.3316, 3.7086, 222.88, 0, 0, 0, 0, 0]]),
    (3, 1, 1),
)
X1 = jnp.array([0.2, 0.5, 0.8])
P_MIX = jnp.array([2e5, 3e5, 4e5])
T0_MIX = jnp.full((3,), 280.0)


def test_mix_bubble_dew_temperature_roundtrip():
    br = M.static_branches(MIXP)
    t_b, nans_b, y = M.bubble_point_t(
        MIXP, None, P_MIX, X1, T0_MIX, branches=br, full_output=True
    )
    assert not np.any(np.asarray(nans_b))
    # pressure solve at the returned temperature closes the loop
    p_back, nans2 = M.bubble_point(MIXP, None, t_b, X1, P_MIX, branches=br)
    np.testing.assert_allclose(np.asarray(p_back), np.asarray(P_MIX),
                               rtol=1e-9)
    # more propane (light) in the liquid -> lower bubble T at equal p;
    # here p also rises along the grid, reinforcing monotonicity checks
    # per-row instead: vapor enriches in propane
    assert np.all(np.asarray(y)[:, 0] > np.asarray(X1))

    t_d, nans_d = M.dew_point_t(MIXP, None, P_MIX, X1, T0_MIX, branches=br)
    assert not np.any(np.asarray(nans_d))
    p_back_d, _ = M.dew_point(MIXP, None, t_d, X1, P_MIX, branches=br)
    np.testing.assert_allclose(np.asarray(p_back_d), np.asarray(P_MIX),
                               rtol=1e-9)
    # at equal p and equal overall composition, dew T >= bubble T
    assert np.all(np.asarray(t_d) >= np.asarray(t_b) - 1e-10)


def test_mix_bubble_temperature_kij_grad_fd():
    br = M.static_branches(MIXP)

    def tb(k):
        kij = jnp.stack([jnp.full((3,), k), jnp.zeros((3,))], axis=-1)
        t, _ = M.bubble_point_t(MIXP, kij, P_MIX, X1, T0_MIX, branches=br)
        return t.sum()

    g = jax.jit(jax.grad(tb))(jnp.float64(0.02))
    h = 1e-4
    fd = (tb(jnp.float64(0.02 + h)) - tb(jnp.float64(0.02 - h))) / (2 * h)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-4)


def test_gc_bubble_temperature_roundtrip():
    """n-butane/propane gc system (sauer2014 segments): bubble T at given
    p round-trips through the gc pressure solver."""
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    parameter = tuple(
        np.array([r["model_record"].get(k, 0) for r in segs])
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    eos = GcPcSaftMix(
        ident, parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]],
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]],
        [("CH3", "CH2", 0.0)],
        np.array([[1.0, 1.0]]),
    )
    p = jnp.array([2e5])
    x = jnp.array([0.5])
    t, nans = eos.bubble_point_t(p, x, jnp.array([280.0]))
    assert not bool(nans[0])
    p_back, nans2 = eos.bubble_point(t, x, p)
    np.testing.assert_allclose(np.asarray(p_back), np.asarray(p), rtol=1e-9)
