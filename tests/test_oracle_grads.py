"""Implementation-independent gradient checks: FD of the C++ oracle vs JAX AD.

The reference finite-differences its *oracle* (the FeOs package) w.r.t. the
interaction parameters and compares against its autograd gradients
(reference tests/test_pcsaft_mix.py:130-192, tests/test_gc_pcsaft.py:130-222).
The in-repo analogue: central FD of the independent C++ solver backend's
bubble/dew pressures w.r.t. k_ij, epsilon_k_AiBj, and k_ab vs the JAX
reverse-mode gradients through the stationary re-attachment identity.
Unlike the AD-vs-self-FD tests in test_pcsaft_mix.py, a shared systematic
error in the differentiable Helmholtz layer cannot cancel here.

Step sizes: the oracle solves to the f64 noise floor (~1e-13 relative), so
the FD quotient noise is ~1e-13 * p / h and truncation ~h^2 — both leave
>=4 significant digits at the chosen h.  Tolerances follow the reference's
atol=1 (Pa per parameter unit) plus a relative bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu import cpu_backend

pytestmark = pytest.mark.skipif(
    not cpu_backend.available(), reason="no C++ toolchain for native backend"
)

# the reference's associating binary with kij = -0.15 and the
# eps_AiBj = 1000 override (reference tests/test_pcsaft_mix.py:127-251)
PARAMS = np.tile(
    [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
    (4, 1, 1),
)
T = np.array([145.0, 150.0, 155.0, 160.0])
X = np.full(4, 0.5)
P0 = np.full(4, 1e5)
KIJ0, EPS0 = -0.15, 1000.0


def _oracle_fd_mix(col, h, bubble):
    """Central-FD gradient of the oracle's solved pressures w.r.t. kij
    column ``col`` (0 = k_ij, 1 = eps_AiBj)."""
    out = []
    for s in (+1, -1):
        kij = np.tile([KIJ0, EPS0], (4, 1))
        kij[:, col] += s * h
        _, p, ok = cpu_backend.mix_vle_densities(
            PARAMS, kij, T, X, P0, bubble=bubble
        )
        assert ok.all()
        out.append(p)
    return (out[0] - out[1]) / (2 * h)


@pytest.mark.parametrize("bubble", [True, False], ids=["bubble", "dew"])
@pytest.mark.parametrize("col,h", [(0, 1e-6), (1, 1e-3)],
                         ids=["kij", "eps_aibj"])
def test_mix_grad_vs_oracle_fd(bubble, col, h):
    from feos_tpu.models import pcsaft_mix

    fn = pcsaft_mix.bubble_point if bubble else pcsaft_mix.dew_point

    def total_p(kij_b):
        p, nans = fn(
            jnp.asarray(PARAMS), kij_b, jnp.asarray(T), jnp.asarray(X),
            jnp.asarray(P0),
        )
        return jnp.sum(p)

    kij_b = jnp.asarray(np.tile([KIJ0, EPS0], (4, 1)))
    # d(sum p)/d(kij_b[i, col]) = dp_i/dkij_i: per-row gradients in one vjp
    g_ad = np.asarray(jax.grad(total_p)(kij_b))[:, col]
    g_fd = _oracle_fd_mix(col, h, bubble)
    np.testing.assert_allclose(g_ad, g_fd, rtol=1e-4, atol=1.0)


def _gc_system(kab):
    """n-butane/propane gc pair (4 rows) with the CH3-CH2 kab record."""
    import json
    from pathlib import Path

    from feos_tpu.models.gc_pcsaft import assemble

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
    B = 4
    return assemble(
        ident, parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [("CH3", "CH2", kab)],
        np.tile([1.1, 0.98], (B, 1)),
    )


GC_T = np.array([250.0, 270.0, 290.0, 310.0])
GC_X = np.array([0.3, 0.4, 0.6, 0.7])
KAB0 = -0.05


@pytest.mark.parametrize("bubble", [True, False], ids=["bubble", "dew"])
def test_gc_grad_kab_vs_oracle_fd(bubble):
    """d(bubble/dew pressure)/d(k_ab) through the assembled dispersion
    bases (reference tests/test_gc_pcsaft.py:177-222 pattern)."""
    from feos_tpu.models.gc_pcsaft import (
        gc_incipient_property, static_branches_gc,
    )

    br = static_branches_gc(_gc_system(KAB0))

    def total_p(kab):
        params = _gc_system(kab)
        p, nans = gc_incipient_property(
            params, jnp.asarray(GC_T), jnp.asarray(GC_X), jnp.asarray(P0),
            bubble=bubble, branches=br,
        )
        return jnp.sum(p), nans

    (_, nans), g = jax.value_and_grad(total_p, has_aux=True)(
        jnp.asarray(KAB0)
    )
    assert not np.any(np.asarray(nans))

    h = 1e-6
    out = []
    for s in (+1, -1):
        _, p, ok = cpu_backend.gc_vle_densities(
            _gc_system(KAB0 + s * h), GC_T, GC_X, P0, bubble
        )
        assert ok.all()
        out.append(p)
    g_fd = np.sum((out[0] - out[1]) / (2 * h))
    np.testing.assert_allclose(float(g), g_fd, rtol=1e-4, atol=1.0)
