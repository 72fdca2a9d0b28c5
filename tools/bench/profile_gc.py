"""Profile the gc bubble-point hot loop vs the homosegmented binary.

Separates three hypotheses for the gc/mix throughput gap
(BENCH_ALL_r03: 31.3k vs 76.4k bubble/s):
  (a) dispatch-bound at the bench batch size  -> rate rises with B
  (b) per-iteration phi cost                  -> standalone phi timing gap
  (c) iteration count (initialization quality)-> easy-T rate >> bench-T rate

Run on TPU:  python tools/bench/profile_gc.py
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def gc_eos(B):
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).resolve().parents[2] / "tests" / "sauer2014_hetero.json")
        .read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    return GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [("CH3", "CH2", -0.15)],
        np.tile([1.1, 0.98], (B, 1)),
    )


def mix_eos(B):
    from feos_tpu import PcSaftMix

    params = np.tile(
        [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
        (B, 1, 1),
    )
    kij = np.tile([-0.15, 1000.0], (B, 1))
    return PcSaftMix(params, kij)


def sweep(name, make, t_lo, t_hi, Bs=(1024, 4096, 16384)):
    for B in Bs:
        eos = make(B)
        T = jnp.linspace(t_lo, t_hi, B)
        x = jnp.full((B,), 0.5)
        p0 = jnp.full((B,), 1e5)
        f = jax.jit(eos.bubble_point)
        dt, (p, nans) = timeit(f, T, x, p0)
        ok = int(jnp.sum(~nans))
        print(json.dumps({
            "case": name, "B": B, "rate": round(ok / dt, 1),
            "us_per_row": round(dt / B * 1e6, 2),
            "converged_frac": round(ok / B, 4),
        }))


if __name__ == "__main__":
    # bench conditions (140-160 K: deeply subcooled for butane/propane,
    # p0=1e5 is ~7 decades above the true bubble pressure)
    sweep("gc_bench_T", gc_eos, 140.0, 160.0)
    # easy conditions (260-300 K: near-ambient saturation, p0 close)
    sweep("gc_easy_T", gc_eos, 260.0, 300.0)
    # the homosegmented comparison at ITS bench conditions
    sweep("mix_bench_T", mix_eos, 140.0, 160.0)
