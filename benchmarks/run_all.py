"""All BASELINE.json benchmark configs (one JSON line each).

``bench.py`` at the repo root reports the single north-star metric (config
5); this script covers the full list from BASELINE.md:

1. PcSaftPure.vapor_pressure, README 5-temperature batch + backward grad
2. PcSaftPure liquid_density + equilibrium_liquid_density property table
3. PcSaftMix binary bubble/dew with kij
4. gc-PC-SAFT heterosegmented bubble/dew
5. Large-scale regression batch: vapor pressure + density gradients
   w.r.t. all 8 parameters (the headline; also in bench.py)
6. Isothermal pT flash, end to end (window detection by bubble+dew
   solves + the two-phase split) — beyond the reference surface

Run:  python benchmarks/run_all.py            (all configs)
      python benchmarks/run_all.py 1 3        (subset)

With BENCH_ALL_OUT=<path> every reported line is also appended to a JSON
artifact (the per-round ``BENCH_ALL_r*.json`` record), so mixture/gc perf
regressions are visible to the recorded history, not just stdout.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _timeit(fn, *args, reps=5):
    """Median of per-rep fully-synchronized timings.

    Each rep blocks on its own output: over the remote-chip tunnel an
    unsynchronized rep loop can overlap dispatch with execution and report
    dispatch latency instead of step time (observed as a 256x-too-fast
    dew-point figure in an earlier artifact).  The median discards
    stragglers from tunnel hiccups.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(max(reps, 3)):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2], out


_RESULTS = []


def report(name, value, unit, **extra):
    rec = {"metric": name, "value": round(value, 2), "unit": unit, **extra}
    _RESULTS.append(rec)
    print(json.dumps(rec))


def _write_artifact():
    out = os.environ.get("BENCH_ALL_OUT")
    if out and _RESULTS:
        payload = {
            "device": jax.devices()[0].device_kind,
            "results": _RESULTS,
        }
        Path(out).write_text(json.dumps(payload, indent=1) + "\n")


def config1():
    """README vapor-pressure batch + full backward (latency)."""
    from feos_tpu.models.pcsaft_pure import vapor_pressure

    params = jnp.asarray(np.tile([1.5, 3.5, 250.0, 0, 0.03, 1500.0, 1, 1], (5, 1)))
    T = jnp.array([250.0, 300.0, 350.0, 400.0, 450.0])

    @jax.jit
    def fwd_bwd(p, T):
        def f(p):
            nans, vp = vapor_pressure(p, T)
            return jnp.sum(jnp.where(nans, 0.0, vp)), nans

        (val, nans), g = jax.value_and_grad(f, has_aux=True)(p)
        return val, g

    dt, _ = _timeit(fwd_bwd, params, T)
    report("readme_vp_batch5_fwd_bwd_latency", dt * 1e3, "ms")


def config2():
    """Pure property table: vp + liquid density + equilibrium density."""
    from feos_tpu.models.pcsaft_pure import (
        equilibrium_liquid_density, liquid_density, vapor_pressure,
    )

    params = jnp.asarray(
        np.array(
            [
                [1.5, 3.2, 350, 0, 0, 0, 0, 0],
                [1.5, 3.2, 150, 2.5, 0.03, 2500, 2, 1],
                [1.5, 3.2, 150, 2.5, 0, 2500, 1, 1],
                [1.5, 3.2, 150, 2.5, 0.03, 0, 1, 1],
                [1.5, 3.2, 150, 2.5, 0, 0, 0, 0],
                [1.5, 3.2, 150, 2.5, 0.03, 2500, 0, 2],
            ]
        )
    )
    T = jnp.full((6,), 300.0)
    p = jnp.full((6,), 1e5)

    @jax.jit
    def table(params, T, p):
        return (
            vapor_pressure(params, T),
            liquid_density(params, T, p),
            equilibrium_liquid_density(params, T),
        )

    dt, out = _timeit(table, params, T, p)
    report("pure_property_table_latency", dt * 1e3, "ms")


def config3():
    """Binary bubble + dew points with kij (reference test conditions)."""
    from feos_tpu.models import pcsaft_mix as M

    # throughput saturates near B=4096 on v5e: the per-batch fixed cost
    # (tunnel dispatch + launch overhead, ~40 ms) dominates below that
    # (measured B=1024: 16.9k bubble/s, B=4096: 20.5k, B=16384: 32.9k
    # bubble but slower dew; 4096 is the knee for the bubble+dew pair)
    B = int(os.environ.get("BENCH_MIX_BATCH", 4096))
    params = jnp.asarray(
        np.tile(
            [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
            (B, 1, 1),
        )
    )
    kij = jnp.asarray(np.tile([-0.15, 1000.0], (B, 1)))
    T = jnp.linspace(140.0, 160.0, B)
    x = jnp.full((B,), 0.5)
    p0 = jnp.full((B,), 1e5)

    # the facade derives the static phi-branch specialization from the
    # concrete batch (the user-facing calling convention)
    from feos_tpu import PcSaftMix

    eos = PcSaftMix(np.asarray(params), np.asarray(kij))
    bubble = jax.jit(eos.bubble_point)
    dew = jax.jit(eos.dew_point)
    dtb, (pb, nb) = _timeit(bubble, T, x, p0, reps=3)
    dtd, (pd, nd) = _timeit(dew, T, x, p0, reps=3)
    okb = int(jnp.sum(~nb))
    okd = int(jnp.sum(~nd))
    report("mix_bubble_points_per_sec", okb / dtb, "1/s", converged_frac=okb / B)
    report("mix_dew_points_per_sec", okd / dtd, "1/s", converged_frac=okd / B)


def config4():
    """gc-PC-SAFT bubble/dew (sauer2014 parameters, butane/propane)."""
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).resolve().parent.parent / "tests" / "sauer2014_hetero.json")
        .read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab", "epsilon_k_ab", "na", "nb"]
    )
    # B=4096 matches config3 so the gc-vs-homosegmented overhead is
    # directly comparable (benchmarks/profile_gc.py measured the early
    # "flat past 1024" knee reading as stale: at B=4096 the round-4
    # solver runs gc_full in 35.7 ms = 114.7k bubble/s, 1.15x mix_full)
    B = int(os.environ.get("BENCH_GC_BATCH", 4096))
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [("CH3", "CH2", -0.15)],
        np.tile([1.1, 0.98], (B, 1)),
    )
    T = jnp.linspace(140.0, 160.0, B)
    x = jnp.full((B,), 0.5)
    p0 = jnp.full((B,), 1e5)
    dtb, (pb, nb) = _timeit(jax.jit(eos.bubble_point), T, x, p0, reps=3)
    okb = int(jnp.sum(~nb))
    report("gc_bubble_points_per_sec", okb / dtb, "1/s", converged_frac=okb / B)
    dtd, (pd, nd) = _timeit(jax.jit(eos.dew_point), T, x, p0, reps=3)
    okd = int(jnp.sum(~nd))
    report("gc_dew_points_per_sec", okd / dtd, "1/s", converged_frac=okd / B)


def config5():
    """North-star throughput (same as bench.py)."""
    import bench

    rec = bench.main(echo=False)
    report(rec["metric"], rec["value"], rec["unit"],
           **{k: v for k, v in rec.items() if k not in ("metric", "value", "unit")})


def config6():
    """Isothermal pT flash, end to end (config3's system, mid-window p).

    The timed call is the full user-facing ``flash``: two bubble + two
    dew solves for the window/initialization (the dominant cost) plus
    the successive-substitution split itself.
    """
    from feos_tpu import PcSaftMix

    B = int(os.environ.get("BENCH_FLASH_BATCH", 4096))
    params = np.tile(
        [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
        (B, 1, 1),
    )
    kij = np.tile([-0.15, 1000.0], (B, 1))
    T = jnp.linspace(140.0, 160.0, B)
    z = jnp.full((B,), 0.5)
    p0 = jnp.full((B,), 1e5)

    eos = PcSaftMix(params, kij)
    pb, nb = jax.jit(eos.bubble_point)(T, z, p0)
    pd, nd = jax.jit(eos.dew_point)(T, z, p0)
    p = jnp.sqrt(pb * pd)

    flash_fn = jax.jit(eos.flash)
    # vary the pressure per rep at 1e-9 relative (solution unchanged to
    # ~9 digits): identical-input reps once returned a physically
    # impossible 25M flashes/s on the remote chip — a timing artifact a
    # re-measured varied-input run did not reproduce; varying the input
    # makes every rep a genuinely fresh execution by construction
    out = flash_fn(T, z, p)
    jax.block_until_ready(out)
    times = []
    for rep in range(5):
        pv = p * (1.0 + 1e-9 * (rep + 1))
        t0 = time.time()
        out = flash_fn(T, z, pv)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    times.sort()
    dt = times[len(times) // 2]
    beta, x, y, rho, phase = out
    ok = int(jnp.sum(phase == 2))
    report("flash_tp_splits_per_sec", ok / dt, "1/s", converged_frac=ok / B)


def main():
    picks = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6]
    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5,
           6: config6}
    for k in picks:
        fns[k]()
    _write_artifact()


if __name__ == "__main__":
    main()
