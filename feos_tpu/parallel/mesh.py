"""Device-mesh utilities: data-parallel batch sharding over ICI/DCN.

The reference's entire parallelism story is an embarrassingly-parallel rayon
map over independent batch rows on CPU threads (src/pcsaft.rs:88; SURVEY.md
section 2, parallelism checklist).  The TPU-native equivalent is a 1-D
device mesh with the batch axis sharded: rows are independent, so the solve
itself needs **zero collectives**; only loss reductions in regression
all-reduce (``psum``) over the mesh.  Scaling is therefore linear in chips
by construction, over ICI within a slice and DCN across slices.

Multi-host: call :func:`initialize_multi_host` once per process before any
JAX computation, then build the mesh with :func:`batch_mesh` — it spans all
processes' devices with same-host/same-slice devices adjacent, so the one
gradient all-reduce runs hierarchically (ICI first, one DCN crossing).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def initialize_multi_host(
    coordinator_address=None, num_processes=None, process_id=None, **kwargs
):
    """Initialize the JAX distributed runtime for multi-host meshes.

    Thin wrapper over ``jax.distributed.initialize`` (SURVEY.md section 5,
    distributed row): on TPU pods the arguments are auto-detected from the
    environment, on CPU/GPU clusters pass them explicitly.  A no-op when
    the runtime is already initialized (so library code can call it
    unconditionally) and when running single-process with no coordinator
    configured.

    Returns ``(process_index, process_count)``.
    """
    already = jax.distributed.is_initialized()
    if not already and (
        coordinator_address is not None
        or num_processes is not None
        or jax.default_backend() == "tpu"
    ):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
                **kwargs,
            )
        except (RuntimeError, ValueError):
            # single-process environments (no coordinator reachable / auto-
            # detection unavailable) fall through to local-only operation
            pass
    return jax.process_index(), jax.process_count()


def batch_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices with a single 'batch' axis.

    With no argument the mesh spans every device of every process
    (``jax.devices()`` is global after :func:`initialize_multi_host`), in
    process-major order: devices of the same host/slice stay adjacent, so
    XLA lowers the regression gradient ``psum`` hierarchically — reduce
    over ICI within each slice, then one DCN crossing.
    """
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
    axis; the rest are replicated.  The specs are derived from the actual
    arguments at call time (NOT from ``fn``'s signature), so wrapped
    callables (``functools.partial``, closures, ``*args`` functions) work.
    No collectives are inserted — the function must be row-independent
    (true for all solvers/properties here).
    """
    from jax import shard_map

    def wrapped(*args):
        in_specs = tuple(
            P(BATCH_AXIS) if i < n_batched_args else P()
            for i in range(len(args))
        )
        # check_vma=False: the solvers' while_loop carries are initialized
        # from constants (spinodal grids, unit keeps), which the varying-
        # manual-axes checker would reject even though every lane is
        # row-independent by construction
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=P(BATCH_AXIS),
            check_vma=False,
        )(*args)

    return wrapped
