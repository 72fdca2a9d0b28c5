"""Isothermal pT flash (feos_tpu.models.pcsaft_mix.flash).

Beyond the reference surface (feos-torch has no flash; the upstream feos
crate's ``PhaseEquilibrium::tp_flash`` is the conceptual counterpart).
Validation is internal-consistency based, independent of the flash loop's
own exit tests:

* material balance beta*y + (1-beta)*x = z,
* isofugacity x_i phi_L_i = y_i phi_V_i through the INDEPENDENT caloric
  property module (ln_phi from temperature/density jvps, not the solver),
* isobaric closure p(T, rho_l*x) = p(T, rho_v*y) = p through the same,
* the beta -> 0 / beta -> 1 limits recover the bubble/dew edge solutions,
* single-phase classification outside the (p_dew, p_bubble) window.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu.models.pcsaft_mix import PcSaftMix, flash
from feos_tpu.properties import mix_properties

# 6 rows over the systems the solver tests/benches already pin as
# convergent (test_solvers_mix.py, benchmarks/run_all.py config 3):
# non-assoc binary, kij, cross-associating + eps_AiBj, dipolar
_NONASSOC = [[1.0, 3.5, 150.0, 0.0, 0.0, 0.0, 0.0, 0.0],
             [1.0, 3.5, 200.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
_ASSOC = [[1.0, 3.5, 150.0, 0.0, 0.02, 1500.0, 1.0, 1.0],
          [1.0, 3.5, 200.0, 0.0, 0.03, 2500.0, 1.0, 1.0]]
_DIPOLAR = [[1.2, 3.4, 180.0, 1.5, 0.0, 0.0, 0.0, 0.0],
            [2.0, 3.7, 220.0, 0.0, 0.0, 0.0, 0.0, 0.0]]
PARAMS = np.array(
    [_NONASSOC, _NONASSOC, _ASSOC, _DIPOLAR, _NONASSOC, _NONASSOC]
)
KIJ = np.array(
    [[0.0, 0.0], [-0.15, 0.0], [-0.15, 1000.0], [-0.05, 0.0],
     [0.0, 0.0], [0.0, 0.0]]
)
T = np.array([150.0, 150.0, 150.0, 200.0, 145.0, 155.0])
Z1 = np.array([0.4, 0.3, 0.5, 0.6, 0.2, 0.7])


@pytest.fixture(scope="module")
def edges():
    eos = PcSaftMix(PARAMS, KIJ)
    p0 = np.full(len(T), 1e5)
    p_bub, nb, y_bub = eos.bubble_point(T, Z1, p0, full_output=True)
    p_dew, nd, x_dew = eos.dew_point(T, Z1, p0, full_output=True)
    assert not np.any(np.asarray(nb)) and not np.any(np.asarray(nd))
    return eos, np.asarray(p_bub), np.asarray(p_dew), np.asarray(y_bub), np.asarray(x_dew)


def _check_consistency(p, beta, x, y, rho, rtol_fug=1e-7):
    """Material balance + isofugacity + isobaric closure through the
    independent property module.

    The LIQUID-lane closure carries an absolute allowance for the p~
    cancellation noise floor: p~_L is a cancellation of O(phi) terms, so
    its f64 evaluation noise is ~1e-15 reduced (measured ~9e-16 on the
    cross-associating row), which at low pressures dwarfs any fixed
    relative bar — the same physics solvers.vle documents for dew-point
    acceptance.  2e-14 reduced = ~20x margin over the measured floor.
    The vapor p~ ~ sum(rho_V) has no cancellation: tight rtol only.
    """
    from feos_tpu.units import REDUCED_TO_PA_PER_KT

    z = np.stack([Z1, 1.0 - Z1], axis=-1)
    recon = beta[:, None] * y + (1.0 - beta[:, None]) * x
    np.testing.assert_allclose(recon, z, rtol=0, atol=1e-9)

    props_l = mix_properties(PARAMS, KIJ, T, x * rho[:, :1])
    props_v = mix_properties(PARAMS, KIJ, T, y * rho[:, 1:])
    noise_pa = 2e-14 * T * REDUCED_TO_PA_PER_KT
    assert np.all(
        np.abs(np.asarray(props_l.pressure) - p) < 1e-8 * p + noise_pa
    )
    np.testing.assert_allclose(np.asarray(props_v.pressure), p, rtol=1e-8)
    # isofugacity at equal pressure: x_i phi_L_i = y_i phi_V_i.  The
    # liquid state sits off the exact root by its pressure noise floor,
    # which enters ln f with an O(1) factor: widen the bar additively by
    # the relative pressure allowance.
    f_l = x * np.exp(np.asarray(props_l.ln_phi))
    f_v = y * np.exp(np.asarray(props_v.ln_phi))
    bar = (rtol_fug + noise_pa / p)[:, None]
    assert np.all(np.abs(f_l - f_v) <= bar * np.abs(f_v)), (
        np.abs(f_l / f_v - 1.0), bar
    )


def test_two_phase_split(edges):
    eos, p_bub, p_dew, _, _ = edges
    p = np.sqrt(p_bub * p_dew)  # mid-window (log midpoint)
    beta, x, y, rho, phase = eos.flash(T, Z1, p)
    beta, x, y, rho, phase = map(np.asarray, (beta, x, y, rho, phase))
    assert np.all(phase == 2), phase
    assert np.all((beta > 0.0) & (beta < 1.0))
    assert np.all(rho[:, 0] > rho[:, 1])  # liquid denser than vapor
    _check_consistency(p, beta, x, y, rho)


def test_bubble_edge_limit(edges):
    """p -> p_bubble: beta -> 0, x -> z, y -> the bubble solve's incipient
    vapor composition."""
    eos, p_bub, p_dew, y_bub, _ = edges
    # blend in ln p: the associating row's window spans 3 decades, so a
    # linear blend would not be anywhere near the edge.  0.999 keeps the
    # first-order departure beta*|y - x| (exact by material balance)
    # under the 5e-3 composition bar on every row.
    p = np.exp(0.999 * np.log(p_bub) + 0.001 * np.log(p_dew))
    beta, x, y, rho, phase = eos.flash(T, Z1, p)
    beta, x, y, phase = map(np.asarray, (beta, x, y, phase))
    assert np.all(phase == 2)
    assert np.all(beta < 0.02)
    z = np.stack([Z1, 1.0 - Z1], axis=-1)
    np.testing.assert_allclose(x, z, atol=5e-3)
    np.testing.assert_allclose(y, y_bub, atol=5e-3)
    _check_consistency(p, beta, x, y, np.asarray(rho))


def test_dew_edge_limit(edges):
    eos, p_bub, p_dew, _, x_dew = edges
    p = np.exp(0.001 * np.log(p_bub) + 0.999 * np.log(p_dew))
    beta, x, y, rho, phase = eos.flash(T, Z1, p)
    beta, x, y, phase = map(np.asarray, (beta, x, y, phase))
    assert np.all(phase == 2)
    assert np.all(beta > 0.98)
    z = np.stack([Z1, 1.0 - Z1], axis=-1)
    np.testing.assert_allclose(y, z, atol=5e-3)
    np.testing.assert_allclose(x, x_dew, atol=5e-3)


def test_single_phase_classification(edges):
    eos, p_bub, p_dew, _, _ = edges
    z = np.stack([Z1, 1.0 - Z1], axis=-1)

    beta, x, y, rho, phase = eos.flash(T, Z1, 1.2 * p_bub)
    assert np.all(np.asarray(phase) == 0)
    np.testing.assert_allclose(np.asarray(beta), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(x), z, atol=0)
    assert np.all(np.isnan(np.asarray(y)))

    beta, x, y, rho, phase = eos.flash(T, Z1, 0.8 * p_dew)
    assert np.all(np.asarray(phase) == 1)
    np.testing.assert_allclose(np.asarray(beta), 1.0, atol=0)
    np.testing.assert_allclose(np.asarray(y), z, atol=0)
    assert np.all(np.isnan(np.asarray(x)))


def test_gc_flash():
    """gc flash: material balance, isofugacity and isobaric closure
    through the independent gc property module (butane/propane at 300 K,
    the test_diagrams system)."""
    import json
    from pathlib import Path

    from feos_tpu.models.gc_pcsaft import GcPcSaftMix
    from feos_tpu.properties import gc_properties

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
    z1 = np.array([0.3, 0.5, 0.7])  # n-butane feed fraction
    p0 = np.full(B, 5e5)
    p_bub, nb = eos.bubble_point(t, z1, p0)
    p_dew, nd = eos.dew_point(t, z1, p0)
    assert not np.any(np.asarray(nb)) and not np.any(np.asarray(nd))
    p = np.sqrt(np.asarray(p_bub) * np.asarray(p_dew))

    beta, x, y, rho, phase = eos.flash(t, z1, p)
    beta, x, y, rho, phase = map(np.asarray, (beta, x, y, rho, phase))
    assert np.all(phase == 2), phase
    z = np.stack([z1, 1.0 - z1], axis=-1)
    recon = beta[:, None] * y + (1.0 - beta[:, None]) * x
    np.testing.assert_allclose(recon, z, rtol=0, atol=1e-9)
    # vapor is lean in the heavy component (n-butane)
    assert np.all(y[:, 0] < x[:, 0])
    props_l = gc_properties(eos.params, t, x * rho[:, :1])
    props_v = gc_properties(eos.params, t, y * rho[:, 1:])
    np.testing.assert_allclose(np.asarray(props_l.pressure), p, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(props_v.pressure), p, rtol=1e-8)
    f_l = x * np.exp(np.asarray(props_l.ln_phi))
    f_v = y * np.exp(np.asarray(props_v.ln_phi))
    np.testing.assert_allclose(f_l, f_v, rtol=1e-7)


def test_functional_matches_facade(edges):
    eos, p_bub, p_dew, _, _ = edges
    p = np.sqrt(p_bub * p_dew)
    out_f = flash(PARAMS, KIJ, T, Z1, p)
    out_m = eos.flash(T, Z1, p)
    for a, b in zip(out_f, out_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
