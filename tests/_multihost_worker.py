"""One process of the two-process virtual multi-host mesh test.

Launched by tests/test_multihost.py as
``python _multihost_worker.py <process_id> <num_processes> <port>``.
Each process owns 2 virtual CPU devices; the coordinator runs on
localhost.  Validates the real ``jax.distributed`` path (SURVEY.md
section 5, distributed row): cross-process mesh construction, a global
sharded array, and an all-reduce that crosses the process boundary —
the same topology a TPU pod presents, minus the ICI/DCN fabric.
"""

import os
import sys
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# config update, not the JAX_PLATFORMS env var: the sandbox's sitecustomize
# pre-registers the axon TPU plugin at interpreter start, after the env var
# has already been read (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from feos_tpu.parallel.mesh import (
    batch_mesh, batch_sharding, initialize_multi_host, replicated,
)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    idx, cnt = initialize_multi_host(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert (idx, cnt) == (pid, nproc), (idx, cnt)

    mesh = batch_mesh()
    n_dev = mesh.devices.size
    assert n_dev == 2 * nproc, n_dev

    # global (B,) batch sharded over all devices of all processes
    B = 4 * n_dev
    sh = batch_sharding(mesh)
    t_host = np.linspace(250.0, 450.0, B)
    temperature = jax.make_array_from_callback((B,), sh, lambda i: t_host[i])

    # a cheap but real model evaluation through the sharded batch: phi_pure
    # at a fixed liquid density, reduced over the mesh (the sum forces an
    # all-reduce across the process boundary)
    from feos_tpu.models.pcsaft_pure import PureParams, phi_pure

    p_host = np.tile([1.5, 3.5, 250.0, 0.0, 0.03, 1500.0, 1.0, 1.0], (B, 1))
    params = PureParams.from_array(
        jax.make_array_from_callback((B, 8), sh, lambda i: p_host[i])
    )
    rho_host = np.full((B,), 0.004)
    rho = jax.make_array_from_callback((B,), sh, lambda i: rho_host[i])

    total = jax.jit(
        lambda p, t, r: jnp.sum(jax.vmap(phi_pure)(p, t, r)),
        out_shardings=replicated(mesh),
    )(params, temperature, rho)

    # reference value computed locally on the full batch
    expected = float(
        np.sum(
            jax.vmap(phi_pure)(
                PureParams.from_array(jnp.asarray(p_host)),
                jnp.asarray(t_host),
                jnp.full((B,), 0.004),
            )
        )
    )
    np.testing.assert_allclose(float(total), expected, rtol=1e-13)
    print(f"MULTIHOST_OK process={idx}/{cnt} devices={n_dev}")


if __name__ == "__main__":
    main()
