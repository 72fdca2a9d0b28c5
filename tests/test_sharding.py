"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The parallelism surface of this domain is pure data parallelism over the
batch (SURVEY.md section 2); these tests pin that the sharded path produces
bit-identical results to the single-device path and that the regression
training step runs sharded end-to-end.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from feos_tpu.models.pcsaft_pure import vapor_pressure
from feos_tpu.parallel.mesh import (
    batch_mesh, batch_sharding, data_parallel, initialize_multi_host,
    pad_to_multiple, shard_batch,
)


def _batch(B=16):
    params = np.tile([1.5, 3.5, 250.0, 0, 0.03, 1500.0, 1, 1], (B, 1))
    T = np.linspace(250.0, 400.0, B)
    return params, T


def test_sharded_vapor_pressure_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    mesh = batch_mesh()
    params, T = _batch(16)
    nans0, vp0 = jax.jit(vapor_pressure)(jnp.asarray(params), jnp.asarray(T))

    ps = shard_batch(jnp.asarray(params), mesh)
    Ts = shard_batch(jnp.asarray(T), mesh)
    nans1, vp1 = jax.jit(vapor_pressure)(ps, Ts)
    # results must be identical; output sharding follows the inputs
    np.testing.assert_array_equal(np.asarray(nans0), np.asarray(nans1))
    np.testing.assert_allclose(np.asarray(vp0), np.asarray(vp1), rtol=1e-12)


def test_sharded_gradients_match():
    mesh = batch_mesh()
    params, T = _batch(16)
    p0 = jnp.asarray(params[0])

    def loss(p, T):
        _, vp = vapor_pressure(jnp.tile(p, (T.shape[0], 1)), T)
        return jnp.sum(jnp.log(vp))

    g0 = jax.jit(jax.grad(loss))(p0, jnp.asarray(T))
    Ts = shard_batch(jnp.asarray(T), mesh)
    g1 = jax.jit(jax.grad(loss))(jax.device_put(p0, NamedSharding(mesh, P())), Ts)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-12)


def test_data_parallel_shard_map_with_padding():
    """A solver driven through shard_map via ``data_parallel`` with a
    ragged batch padded by ``pad_to_multiple`` must reproduce the
    single-device result on the valid rows and mask the padded ones."""
    mesh = batch_mesh()
    n_dev = mesh.devices.size
    params, T = _batch(13)  # deliberately not a multiple of 8
    nans0, vp0 = jax.jit(vapor_pressure)(jnp.asarray(params), jnp.asarray(T))

    params_p, n_valid = pad_to_multiple(params, n_dev)
    T_p, _ = pad_to_multiple(T, n_dev)
    assert params_p.shape[0] % n_dev == 0 and n_valid == 13

    fn = data_parallel(vapor_pressure, mesh, n_batched_args=2)
    nans1, vp1 = jax.jit(fn)(jnp.asarray(params_p), jnp.asarray(T_p))
    nans1, vp1 = np.asarray(nans1), np.asarray(vp1)
    np.testing.assert_array_equal(np.asarray(nans0), nans1[:n_valid])
    np.testing.assert_allclose(np.asarray(vp0), vp1[:n_valid], rtol=1e-12)
    assert nans1[n_valid:].all(), "NaN-padded rows must fail the mask"


def test_data_parallel_accepts_wrapped_callables():
    """The in_specs are derived from the call, not ``fn.__code__`` — a
    ``functools.partial`` with a replicated trailing argument must work."""
    mesh = batch_mesh()
    params, T = _batch(16)

    def scaled_vp(parameters, temperature, scale):
        nans, vp = vapor_pressure(parameters, temperature)
        return jnp.where(nans, jnp.nan, vp * scale)

    fn = data_parallel(scaled_vp, mesh, n_batched_args=2)
    out = jax.jit(fn)(jnp.asarray(params), jnp.asarray(T), jnp.asarray(2.0))
    _, vp0 = jax.jit(vapor_pressure)(jnp.asarray(params), jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(out), 2.0 * np.asarray(vp0), rtol=1e-12)

    part = functools.partial(scaled_vp)
    out2 = jax.jit(data_parallel(part, mesh, 2))(
        jnp.asarray(params), jnp.asarray(T), jnp.asarray(2.0)
    )
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=0)


def test_initialize_multi_host_single_process_noop():
    """Single-process call path: must not raise and must report the local
    process topology (the multi-process path needs a real coordinator)."""
    idx, count = initialize_multi_host()
    assert idx == 0 and count >= 1


def test_regression_step_on_mesh():
    from feos_tpu.regression import fit_pure

    mesh = batch_mesh()
    params, T = _batch(16)
    _, p_target = jax.jit(vapor_pressure)(jnp.asarray(params), jnp.asarray(T))
    start = np.asarray(params[0]).copy()
    start[2] = 245.0
    res = fit_pure(start, jnp.asarray(T), p_sat=p_target, steps=3, mesh=mesh)
    assert np.all(np.isfinite(res.loss_history))
    assert res.loss_history[-1] <= res.loss_history[0]
