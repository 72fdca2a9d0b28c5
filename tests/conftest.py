"""Test configuration: run on an 8-device virtual CPU mesh.

The sandbox exposes a single remote TPU chip through the axon plugin
(JAX_PLATFORMS=axon, re-exported by sitecustomize); per-dispatch latency over
that tunnel makes test suites impractically slow, and multi-chip hardware is
unavailable anyway.  Tests therefore force the CPU backend with 8 virtual
devices (fp64 math is platform-agnostic) and exercise the multi-chip sharding
path on a virtual mesh, per SURVEY.md section 2 (parallelism checklist).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the solver graphs are large (nested Newton
# loops under vmap/jit); caching amortizes compile time across test runs.
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
