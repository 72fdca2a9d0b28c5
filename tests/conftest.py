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
#
# Cache WRITES are gated behind FEOS_TPU_CACHE_WRITE=1: under the
# sandbox's remote-compile relay, the cache's executable serialization
# (`compilation_cache.put_executable_and_time`) segfaults/aborts
# nondeterministically in LONG-LIVED processes (observed in 5/6 full
# serial suite runs, each time at the first file needing new cache
# writes late in the run; never in short per-file processes).  Default
# mode therefore only READS the cache; `tools/warm_cache.sh` populates
# it with one clean per-file pytest pass.
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).resolve().parent.parent / ".jax_cache_cpu"))
if os.environ.get("FEOS_TPU_CACHE_WRITE") == "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
else:
    # threshold no compile ever reaches -> never write, always read
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)

import json  # noqa: E402
from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_HERE = Path(__file__).parent


@pytest.fixture(scope="session")
def golden_gc_eos():
    """(GcPcSaftMix over the 11 golden topologies, golden dict) — session
    scoped so every test file shares one assembled parameter set and the
    jitted graphs traced on it."""
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads((_HERE / "sauer2014_hetero.json").read_text())
    ident = [r["identifier"] for r in segs]

    def col(k):
        return np.array([r["model_record"].get(k, 0) for r in segs])

    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    golden = json.loads((_HERE / "golden" / "gc_helmholtz.json").read_text())
    eos = GcPcSaftMix(
        ident,
        parameter,
        golden["segment_lists"],
        golden["bond_lists"],
        [tuple(k) for k in golden["kab_list"]],
        np.array(golden["phi"]),
    )
    return eos, golden
