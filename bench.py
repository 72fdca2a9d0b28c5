"""Benchmark: converged VLE solves + parameter gradients per second per chip.

The north-star workload (BASELINE.json config 5, the Rehner 2023
parametrization workload): a large batch of pure-component vapor-pressure
solves with full reverse-mode gradients w.r.t. all 8 PC-SAFT parameters per
row, fp64.  Target: >= 100,000 converged solves+gradients/sec on one
TPU v5e chip.

Prints exactly one JSON line:
    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from feos_tpu.models.pcsaft_pure import vapor_pressure  # noqa: E402

BASELINE_SOLVES_PER_SEC = 100_000.0  # BASELINE.json north-star target


def make_batch(B, seed=0):
    """Physically diverse parameter batch around common fluids (fp64)."""
    rng = np.random.default_rng(seed)
    m = rng.uniform(1.0, 3.0, B)
    sigma = rng.uniform(3.0, 4.0, B)
    epsilon_k = rng.uniform(150.0, 300.0, B)
    mu = np.where(rng.random(B) < 0.3, rng.uniform(0.5, 3.0, B), 0.0)
    assoc = rng.random(B) < 0.3
    kappa = np.where(assoc, 0.03, 0.0)
    eps_ab = np.where(assoc, 1800.0, 0.0)
    na = np.where(assoc, 1.0, 0.0)
    nb = np.where(assoc, 1.0, 0.0)
    params = np.stack([m, sigma, epsilon_k, mu, kappa, eps_ab, na, nb], axis=1)
    # reduced temperatures safely subcritical
    temperature = rng.uniform(0.55, 0.75, B) * epsilon_k / 0.75 * 1.1
    return params, temperature


def main(echo: bool = True):
    B = int(os.environ.get("BENCH_BATCH", 100_000))
    params, temperature = make_batch(B)
    params = jnp.asarray(params)
    temperature = jnp.asarray(temperature)

    def solves_and_grads(params, temperature):
        def loss(p):
            nans, vp = vapor_pressure(p, temperature)
            return jnp.sum(jnp.where(nans, 0.0, jnp.log(jnp.where(nans, 1.0, vp)))), nans

        (val, nans), grads = jax.value_and_grad(loss, has_aux=True)(params)
        return val, grads, jnp.sum(~nans)

    f = jax.jit(solves_and_grads)

    # warmup / compile
    t0 = time.time()
    val, grads, n_ok = f(params, temperature)
    jax.block_until_ready(grads)
    compile_s = time.time() - t0

    n_ok = int(n_ok)
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        val, grads, n_ok_ = f(params, temperature)
    jax.block_until_ready(grads)
    dt = (time.time() - t0) / reps

    rate = n_ok / dt
    result = {
        "metric": "converged_vle_solves_plus_param_grads_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "1/s",
        "vs_baseline": round(rate / BASELINE_SOLVES_PER_SEC, 4),
        "converged_frac": n_ok / B,
    }
    if echo:
        print(json.dumps(result))
    # exact convergence figure (never rounded up to 100%): one silent
    # unconverged row in 1e5 is a datum, not noise
    print(
        f"# batch={B} converged={n_ok} ({100.0 * n_ok / B:.4f}%) "
        f"step={dt * 1e3:.1f}ms compile={compile_s:.1f}s "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    return result


if __name__ == "__main__":
    main()
