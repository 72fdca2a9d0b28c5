"""End-to-end parameter-regression workflows (the library's purpose).

The reference leaves training loops to the user (torch.optim over the
differentiable properties, README.md:13-29); these tests pin the
first-class fitting loops: synthetic data generated at known parameters
must be recovered by gradient descent through the solvers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models.pcsaft_mix import bubble_point, static_branches
from feos_tpu.regression import fit_binary


def test_fit_binary_recovers_kij():
    """Bubble-point data generated at kij = -0.1 must be recovered from a
    kij = 0 start (the companion-paper workload: binary parametrization
    by gradients through the stationary bubble-point identity)."""
    comp = np.array([[1, 3.5, 150, 0, 0, 0, 0, 0], [1, 3.5, 200, 0, 0, 0, 0, 0]])
    kij_true = -0.1
    B = 8
    T = np.linspace(140.0, 160.0, B)
    x = np.linspace(0.2, 0.8, B)
    br = static_branches(comp[None])
    p_data, nans = jax.jit(lambda *a: bubble_point(*a, branches=br))(
        np.tile(comp, (B, 1, 1)), np.tile([kij_true, 0.0], (B, 1)),
        T, x, np.full(B, 1e5),
    )
    assert not np.asarray(nans).any()

    res = fit_binary(comp, T, x, np.asarray(p_data), kij0=0.0, steps=80)
    assert abs(float(res.parameters[0]) - kij_true) < 5e-3
    assert float(res.loss_history[-1]) < 1e-5
    # loss decreased by orders of magnitude
    assert float(res.loss_history[-1]) < 1e-4 * float(res.loss_history[0])


def test_fit_gc_recovers_kab():
    """gc bubble-point data generated at k_ab = -0.1 must be recovered from
    a k_ab = 0 start: gradients flow through the gc parameter assembly
    (dispersion bases) and the stationary bubble-point identity.  The
    system (two single-segment molecules) coincides with the homosegmented
    binary of the kij test, so convergence behavior is known-good."""
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix
    from feos_tpu.regression import fit_gc

    ident = ["A", "B"]
    parameter = (
        np.array([1.0, 1.0]), np.array([3.5, 3.5]),
        np.array([150.0, 200.0]), np.zeros(2),
        np.zeros(2), np.zeros(2), np.zeros(2), np.zeros(2),
    )
    kab_true = -0.1
    B = 8
    T = np.linspace(140.0, 160.0, B)
    x = np.linspace(0.2, 0.8, B)
    topo_segs = [[["A"], ["B"]]] * B
    topo_bonds = [[[], []]] * B

    eos = GcPcSaftMix(ident, parameter, topo_segs, topo_bonds,
                      [("A", "B", kab_true)], None)
    p_data, nans = eos.bubble_point(T, x, np.full(B, 1e5))
    assert not np.asarray(nans).any()

    res = fit_gc(
        ident, parameter, [topo_segs[0]], [topo_bonds[0]],
        [("A", "B", 0.0)], T, x, np.asarray(p_data), steps=80,
    )
    assert abs(float(res.parameters[0]) - kab_true) < 5e-3
    assert float(res.loss_history[-1]) < 1e-5
    assert float(res.loss_history[-1]) < 1e-4 * float(res.loss_history[0])
