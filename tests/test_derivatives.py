"""Unit tests of the AD primitives (JAX replacements of Dual3/DualTensor).

Mirrors reference tests/test_dual.py: exact algebraic identities of the
second-order derivative machinery, here checked against closed-form
derivatives of analytic functions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.ops.derivatives import (
    newton_reattach_1d,
    pressure_set,
    state_derivatives,
    value_and_2derivs,
)


def test_value_and_2derivs():
    x = jnp.asarray(4.0)
    f = lambda y: y * y
    assert value_and_2derivs(f, x) == (16.0, 8.0, 2.0)
    v, d1, d2 = value_and_2derivs(jnp.log, x)
    np.testing.assert_allclose([v, d1, d2], [np.log(4.0), 0.25, -1 / 16])
    v, d1, d2 = value_and_2derivs(lambda y: 1.0 / y, x)
    np.testing.assert_allclose([v, d1, d2], [0.25, -1 / 16, 1 / 32])
    v, d1, d2 = value_and_2derivs(jnp.sqrt, x)
    np.testing.assert_allclose([v, d1, d2], [2.0, 0.25, -1 / 32])


def test_state_derivatives_analytic():
    # phi(rho) = c1*rho1^2*rho2 + c2*rho1  ->  A(n,V) = c1 n1^2 n2 / V^2 + c2 n1
    c1, c2 = 0.7, -1.3
    phi = lambda rho: c1 * rho[0] ** 2 * rho[1] + c2 * rho[0]
    rho = jnp.array([0.3, 0.5])
    A, mu, A_V, A_nV, A_VV = state_derivatives(phi, rho)
    n1, n2 = 0.3, 0.5
    np.testing.assert_allclose(A, c1 * n1**2 * n2 + c2 * n1)
    np.testing.assert_allclose(mu, [2 * c1 * n1 * n2 + c2, c1 * n1**2])
    np.testing.assert_allclose(A_V, -2 * c1 * n1**2 * n2)
    np.testing.assert_allclose(A_nV, [-4 * c1 * n1 * n2, -2 * c1 * n1**2])
    np.testing.assert_allclose(A_VV, 6 * c1 * n1**2 * n2)


def test_pressure_set_identities():
    phi = lambda rho: 0.7 * rho[0] ** 2 * rho[1] + 0.2 * rho[1] ** 3
    rho = jnp.array([0.3, 0.5])
    val, p, mu, v = pressure_set(phi, rho)
    # p~ = sum(rho) + rho . grad(phi) - phi  (Euler relation at V=1)
    grad_phi = jax.grad(phi)(rho)
    np.testing.assert_allclose(p, jnp.sum(rho) + rho @ grad_phi - phi(rho))
    np.testing.assert_allclose(mu, grad_phi)


def test_newton_reattach_gradients():
    """Implicit differentiation via k Newton steps is exact to order k."""
    # root of f(x; a) = x^3 - a  ->  x(a) = a^(1/3)
    def solve(a, n_steps):
        x0 = jax.lax.stop_gradient(a) ** (1.0 / 3.0)  # "solver output"
        return newton_reattach_1d(lambda x: x**3 - a, x0, n_steps=n_steps)

    a = jnp.asarray(8.0)
    truth = lambda a: a ** (1.0 / 3.0)
    np.testing.assert_allclose(solve(a, 1), truth(a))
    g1 = jax.grad(lambda a: solve(a, 1))(a)
    np.testing.assert_allclose(g1, jax.grad(truth)(a), rtol=1e-12)
    # second derivative needs two steps
    g2 = jax.grad(jax.grad(lambda a: solve(a, 2)))(a)
    np.testing.assert_allclose(g2, jax.grad(jax.grad(truth))(a), rtol=1e-10)
