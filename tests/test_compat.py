"""Reference-contract compatibility layer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.compat import PcSaft
from feos_tpu.units import KMOL_M3_TO_REDUCED, REDUCED_TO_PA_PER_KT


def test_vapor_pressure_contract():
    """Compacted (B_ok, 4) densities + full-length mask, reduced units —
    the reference's native convention (src/pcsaft.rs:82-103) — and the
    reconstructed pressure matches the README anchor."""
    params = np.tile([1.5, 3.5, 250.0, 0, 0.03, 1500.0, 1, 1], (3, 1))
    T = np.array([300.0, 2000.0, 350.0])  # middle row supercritical
    dens, nans = PcSaft.vapor_pressure(params, T)
    assert dens.shape == (2, 4)
    assert nans.tolist() == [False, True, False]
    assert np.all(dens[:, 2:] == 0.0)

    from feos_tpu.models.pcsaft_pure import PcSaftPure

    _, vp = PcSaftPure(params[:1]).vapor_pressure(jnp.array([300.0]))
    # reconstruct p from the compacted densities via the stationary identity
    from feos_tpu.models.pcsaft_pure import PureParams, phi_pure

    p = PureParams.from_array(jnp.asarray(params[0]))
    rv, rl = dens[0, 0], dens[0, 1]
    a_v = phi_pure(p, 300.0, jnp.asarray(rv)) / rv
    a_l = phi_pure(p, 300.0, jnp.asarray(rl)) / rl
    p_red = -(a_v - a_l + np.log(rv / rl)) / (1 / rv - 1 / rl)
    np.testing.assert_allclose(p_red * 300.0 * REDUCED_TO_PA_PER_KT, vp[0], rtol=1e-9)


def test_liquid_density_contract():
    params = np.tile([1.5, 3.2, 150, 2.5, 0.03, 2500, 1, 1], (2, 1))
    T = np.array([300.0, 310.0])
    p = np.array([1e5, 1e5])
    dens, nans = PcSaft.liquid_density(params, T, p)
    assert dens.shape == (2,)
    assert not nans.any()

    from feos_tpu.models.pcsaft_pure import liquid_density

    _, rho = jax.jit(liquid_density)(params, jnp.asarray(T), jnp.asarray(p))
    # compat returns the raw solver output (reduced); the API applies one
    # differentiable Newton re-attachment step, so agreement is ~solver tol
    np.testing.assert_allclose(dens / KMOL_M3_TO_REDUCED, rho, rtol=1e-9)


def test_gc_contract():
    """compat.GcPcSaft mirrors the reference native class's constructor and
    bubble/dew contract (reference src/gc_pcsaft.rs:26-100): stateful
    segment records + per-item topology, compacted (B_ok, 4) densities."""
    import json
    from pathlib import Path

    from feos_tpu.compat import GcPcSaft

    segs = json.loads(
        (Path(__file__).resolve().parent / "sauer2014_hetero.json").read_text()
    )
    wanted = {"CH3", "CH2"}
    segment_records = [
        (
            r["identifier"],
            np.array(
                [
                    r["model_record"].get(k, 0.0)
                    for k in [
                        "m", "sigma", "epsilon_k", "mu",
                        "kappa_ab", "epsilon_k_ab", "na", "nb",
                    ]
                ]
            ),
        )
        for r in segs
        if r["identifier"] in wanted
    ]
    # butane / propane, 2 conditions
    segments = [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * 2
    bonds = [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * 2
    gc = GcPcSaft(
        segment_records, segments, bonds, [("CH3", "CH2", -0.15)],
        np.tile([1.1, 0.98], (2, 1)),
    )
    T = np.array([230.0, 240.0])
    x = np.array([0.5, 0.5])
    p0 = np.array([1e5, 1e5])
    dens_b, nans_b = gc.bubble_point(T, x, p0)
    assert dens_b.shape == (2, 4)
    assert not nans_b.any()
    # vapor (cols 0:2) less dense than liquid (cols 2:4)
    assert np.all(dens_b[:, :2].sum(axis=1) < dens_b[:, 2:].sum(axis=1))
    dens_d, nans_d = gc.dew_point(T, x, p0)
    assert dens_d.shape == (2, 4)
    assert not nans_d.any()
    assert np.all(dens_d[:, :2].sum(axis=1) < dens_d[:, 2:].sum(axis=1))


def test_bubble_point_contract():
    params = np.array(
        [[[1, 3.5, 150, 0, 0, 0, 0, 0], [1, 3.5, 200, 0, 0, 0, 0, 0]]]
    )
    kij = np.array([[-0.15, 0.0]])
    dens, nans = PcSaft.bubble_point(
        params, kij, np.array([150.0]), np.array([0.5]), np.array([1e5])
    )
    assert dens.shape == (1, 4)
    assert not nans.any()
    # vapor (cols 0:2) less dense than liquid (cols 2:4)
    assert dens[0, :2].sum() < dens[0, 2:].sum()
