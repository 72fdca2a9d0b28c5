"""n-component (beyond-binary) bubble/dew points.

The reference's native solvers are binary-only (src/pcsaft.rs:150-214
takes one x1 per row); the TPU solver's formulation is n-generic, so the
API accepts an explicit (B, n) composition matrix.  Correctness is pinned
by the trace-dilution limit (a ternary with one vanishing component must
reproduce the binary result, which itself is oracle-validated in
test_cpu_backend.py) and by phase ordering.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models import pcsaft_mix as M

COMPS = [
    [1.0, 3.5, 150, 0, 0, 0, 0, 0],
    [1.6, 3.6, 180, 0, 0, 0, 0, 0],
    [2.3, 3.7, 222, 0, 0, 0, 0, 0],
]


def test_ternary_bubble_dew():
    B = 2
    params = np.tile(COMPS, (B, 1, 1))
    T = np.array([180.0, 200.0])
    z = np.tile([0.3, 0.3, 0.4], (B, 1))
    p0 = np.full(B, 1e5)
    br = M.static_branches(params)
    pb, nb = jax.jit(partial(M.bubble_point, branches=br))(params, None, T, z, p0)
    pd, nd = jax.jit(partial(M.dew_point, branches=br))(params, None, T, z, p0)
    assert not np.asarray(nb).any() and not np.asarray(nd).any()
    assert np.all(np.asarray(pd) < np.asarray(pb))


def test_ternary_reduces_to_binary_at_trace_dilution():
    B = 2
    params = np.tile(COMPS, (B, 1, 1))
    T = np.array([180.0, 200.0])
    p0 = np.full(B, 1e5)
    br = M.static_branches(params)
    z_tr = np.tile([0.4 - 5e-9, 0.6 - 5e-9, 1e-8], (B, 1))
    pb3, nb3 = jax.jit(partial(M.bubble_point, branches=br))(
        params, None, T, z_tr, p0
    )
    params2 = np.tile(COMPS[:2], (B, 1, 1))
    br2 = M.static_branches(params2)
    pb2, nb2 = jax.jit(partial(M.bubble_point, branches=br2))(
        params2, None, T, np.full(B, 0.4), p0
    )
    assert not np.asarray(nb3).any() and not np.asarray(nb2).any()
    np.testing.assert_allclose(np.asarray(pb3), np.asarray(pb2), rtol=1e-5)


def test_gc_ternary_bubble_dew_and_trace_dilution():
    """gc bubble/dew accept (B, n) composition matrices like the
    homosegmented model; the ternary with one vanishing component must
    reproduce the binary result (which is C++-oracle-validated in
    test_gc_pcsaft.py)."""
    import json
    from pathlib import Path

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
    B = 2
    # butane / propane / pentane
    seg3 = [[
        ["CH3", "CH2", "CH2", "CH3"],
        ["CH3", "CH2", "CH3"],
        ["CH3", "CH2", "CH2", "CH2", "CH3"],
    ]] * B
    bnd3 = [[
        [[0, 1], [1, 2], [2, 3]],
        [[0, 1], [1, 2]],
        [[0, 1], [1, 2], [2, 3], [3, 4]],
    ]] * B
    eos3 = GcPcSaftMix(ident, parameter, seg3, bnd3, [], None)
    T = np.array([230.0, 250.0])
    p0 = np.full(B, 1e5)
    z = np.tile([0.3, 0.3, 0.4], (B, 1))
    pb, nb = jax.jit(eos3.bubble_point)(T, z, p0)
    pd, nd = jax.jit(eos3.dew_point)(T, z, p0)
    assert not np.asarray(nb).any() and not np.asarray(nd).any()
    assert np.all(np.asarray(pd) < np.asarray(pb))

    # trace-dilution: pentane fraction -> 0 reduces to the binary
    z_tr = np.tile([0.4 - 5e-9, 0.6 - 5e-9, 1e-8], (B, 1))
    pb3, nb3 = jax.jit(eos3.bubble_point)(T, z_tr, p0)
    eos2 = GcPcSaftMix(
        ident, parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [], None,
    )
    pb2, nb2 = jax.jit(eos2.bubble_point)(T, np.full(B, 0.4), p0)
    assert not np.asarray(nb3).any() and not np.asarray(nb2).any()
    np.testing.assert_allclose(np.asarray(pb3), np.asarray(pb2), rtol=1e-5)


def test_kij_rejected_for_ternary():
    params = np.tile(COMPS, (1, 1, 1))
    try:
        M.bubble_point(
            params, np.zeros((1, 2)), np.array([180.0]),
            np.array([[0.3, 0.3, 0.4]]), np.array([1e5]),
        )
    except ValueError as e:
        assert "binary" in str(e)
    else:
        raise AssertionError("kij must be rejected for n > 2")
