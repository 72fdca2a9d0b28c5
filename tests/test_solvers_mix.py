"""Mixture VLE solver correctness: equilibrium conditions at the solution.

The reference validates bubble/dew pressures against the FeOs oracle
(tests/test_pcsaft_mix.py:190); without that package, correctness of the
solver is established by (a) the defining equilibrium conditions holding at
the returned state to tight tolerance and (b) the reduction-to-pure anchors
in test_pcsaft_mix.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models.pcsaft_mix import MixParams, phi_mix, static_branches
from feos_tpu.solvers.vle import _states_eos, mix_vle


def _solve(parr, kij, eps, T, x1, p0_red, bubble):
    p = MixParams.from_array(parr)
    br = static_branches(parr)

    def item(pi, ki, ei, t, x, pr):
        z = jnp.stack([x, 1.0 - x])
        d = pi.sigma * (1.0 - 0.12 * jnp.exp(-3.0 * pi.epsilon_k / t))
        md3 = pi.m * d**3
        phi_fn = lambda r: phi_mix(pi, ki, ei, t, r, branches=br)
        rho_inc, rho_bulk, ok, _ = mix_vle(phi_fn, z, pr, md3, bubble)
        R = jnp.stack([rho_inc, rho_bulk])
        pt, g = _states_eos(phi_fn, R)
        mu = jnp.log(R) + g
        return rho_inc, rho_bulk, ok, pt, mu

    return jax.jit(jax.vmap(item))(p, kij, eps, T, x1, p0_red)


def test_bubble_equilibrium_conditions():
    parr = np.array(
        [[[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
         [[1.2, 3.4, 180, 1.5, 0, 0, 0, 0], [2.0, 3.7, 220, 0, 0, 0, 0, 0]]],
        dtype=np.float64,
    )
    kij = jnp.array([-0.15, -0.05])
    eps = jnp.array([1000.0, 0.0])
    T = jnp.array([150.0, 200.0])
    x1 = jnp.array([0.5, 0.4])
    p0 = jnp.array([1e5, 1e5]) / T * 7.242971666663e-8
    rho_inc, rho_bulk, ok, pt, mu = _solve(parr, kij, eps, T, x1, p0, True)
    assert np.all(ok)
    # equal pressures and chemical potentials between phases
    np.testing.assert_allclose(pt[:, 0], pt[:, 1], rtol=1e-7)
    np.testing.assert_allclose(mu[:, 0, :], mu[:, 1, :], rtol=0, atol=1e-8)
    # incipient vapor is less dense than bulk liquid
    assert np.all(np.sum(rho_inc, axis=1) < np.sum(rho_bulk, axis=1))


def test_dew_equilibrium_conditions():
    parr = np.array(
        [[[1, 3.5, 150, 0, 0, 0, 0, 0], [1, 3.5, 200, 0, 0, 0, 0, 0]]],
        dtype=np.float64,
    )
    kij = jnp.array([-0.15])
    eps = jnp.array([0.0])
    T = jnp.array([150.0])
    y1 = jnp.array([0.5])
    p0 = jnp.array([1e5]) / T * 7.242971666663e-8
    rho_inc, rho_bulk, ok, pt, mu = _solve(parr, kij, eps, T, y1, p0, False)
    assert np.all(ok)
    np.testing.assert_allclose(pt[:, 0], pt[:, 1], rtol=1e-7)
    np.testing.assert_allclose(mu[:, 0, :], mu[:, 1, :], rtol=0, atol=1e-8)
    # incipient liquid is denser than bulk vapor
    assert np.all(np.sum(rho_inc, axis=1) > np.sum(rho_bulk, axis=1))
