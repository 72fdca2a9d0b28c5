"""Device-mesh utilities: data-parallel batch sharding over ICI.

The reference's entire parallelism story is an embarrassingly-parallel rayon
map over independent batch rows on CPU threads (src/pcsaft.rs:88; SURVEY.md
section 2, parallelism checklist).  The TPU-native equivalent is a 1-D
device mesh with the batch axis sharded: rows are independent, so the solve
itself needs **zero collectives**; only loss reductions in regression
all-reduce (``psum``) over the mesh.  Scaling is therefore linear in chips
by construction, over ICI within a slice and DCN across slices.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def batch_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices with a single 'batch' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    """Place an array with its leading axis sharded across the mesh."""
    return jax.device_put(x, batch_sharding(mesh))


def pad_to_multiple(x, multiple: int, fill=np.nan):
    """Pad the leading axis to a multiple (required for even sharding).

    Returns ``(padded, n_valid)``; padded rows are filled with ``fill`` and
    are expected to fail the solver's convergence mask (NaN rows always do),
    so they drop out of masked reductions naturally.
    """
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), pad_width, constant_values=fill), n


def data_parallel(fn, mesh: Mesh, n_batched_args: int):
    """shard_map a row-independent function over the batch mesh.

    The first ``n_batched_args`` arguments are sharded on their leading
    axis; the rest are replicated.  No collectives are inserted — the
    function must be row-independent (true for all solvers/properties here).
    """
    from jax.experimental.shard_map import shard_map

    in_specs = tuple(
        P(BATCH_AXIS) if i < n_batched_args else P()
        for i in range(fn.__code__.co_argcount)
    )
    return shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=P(BATCH_AXIS),
        check_rep=False,
    )
