"""Stage-by-stage profile of the gc bubble solve vs the homosegmented mix.

VERDICT r3 weak-item 6: gc bubble throughput (31.3k/s at B=1024) trails
the homosegmented binary (76.4k/s at B=4096) by 2.4x for the same
2-component solve, suspected per-iteration overhead in the gc phi.  This
script separates the candidate costs on the real chip:

* ``phi32`` / ``phi64``  — one vmapped phi evaluation (8 stacked density
  states per row, the solver's evaluation shape) for mix vs gc;
* ``init32``             — the f32 initialization (``_mix_init``: grid
  scan + NPT branch solves + successive substitution);
* ``warm32``             — the f32 Newton warmup (``_mix_newton`` at the
  warmup tolerances);
* ``polish64``           — the f64 Newton polish from the warmup state;
* ``full``               — the end-to-end facade bubble call.

Both models run at the SAME batch size (env B, default 4096) and the
same conditions so the comparison isolates the phi/assembly overhead.

Run on the TPU:  python benchmarks/profile_gc.py
Results recorded in docs/design.md ("gc hot-loop profile").
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

from feos_tpu.models import pcsaft_mix as M
from feos_tpu.models import gc_pcsaft as G
from feos_tpu.solvers import vle as V
from feos_tpu.units import PA_PER_KT_TO_REDUCED

B = int(os.environ.get("B", 4096))
REPS = int(os.environ.get("REPS", 5))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS, out


def report(tag, dt):
    print(json.dumps({"stage": tag, "ms": round(dt * 1e3, 3), "B": B}))


# ---- mix setup (bench config 3 conditions) --------------------------------
mix_par = jnp.asarray(
    np.tile(
        [[1, 3.5, 150, 0, 0.02, 1500, 1, 1], [1, 3.5, 200, 0, 0.03, 2500, 1, 1]],
        (B, 1, 1),
    )
)
mix_kij = jnp.asarray(np.tile([-0.15, 1000.0], (B, 1)))
T = jnp.linspace(140.0, 160.0, B)
x = jnp.full((B,), 0.5)
p0 = jnp.full((B,), 1e5)
mix_br = M.static_branches(np.asarray(mix_par))

# ---- gc setup (bench config 4 conditions) ---------------------------------
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
gc_eos = G.GcPcSaftMix(
    ident,
    parameter,
    [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
    [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
    [("CH3", "CH2", -0.15)],
    np.tile([1.1, 0.98], (B, 1)),
)
gc_br = G.static_branches_gc(gc_eos.params)
print(f"branches: mix={sorted(mix_br)} gc={sorted(gc_br)}", file=sys.stderr)

mix_eos = None
from feos_tpu import PcSaftMix

mix_eos = PcSaftMix(np.asarray(mix_par), np.asarray(mix_kij))

# ---- full facade calls -----------------------------------------------------
dt, (pb, nb) = timeit(jax.jit(mix_eos.bubble_point), T, x, p0)
report("mix_full", dt)
print(f"mix converged: {1 - float(jnp.mean(nb)):.4f}", file=sys.stderr)
dt, (pb_g, nb_g) = timeit(jax.jit(gc_eos.bubble_point), T, x, p0)
report("gc_full", dt)
print(f"gc converged: {1 - float(jnp.mean(nb_g)):.4f}", file=sys.stderr)

# ---- stage harnesses -------------------------------------------------------
p_red = p0 / T * PA_PER_KT_TO_REDUCED
z = jnp.stack([x, 1.0 - x], axis=-1)
f32 = jnp.float32


def mix_closures(pi_row, ki_row, t):
    pi = M.MixParams(*(pi_row[:, j] for j in range(8)))
    ki, ei = ki_row[0], ki_row[1]
    pre = M.precompute_mix(pi, ki, ei, t)
    pi32 = M.MixParams(*(v.astype(f32) for v in pi))
    pre32 = M.precompute_mix(pi32, ki.astype(f32), ei.astype(f32), t.astype(f32))
    phi64 = lambda r: M.phi_mix_pre(pre, r, assoc_q_form=True, branches=mix_br)
    phi32 = lambda r: M.phi_mix_pre(pre32, r, branches=mix_br)
    return phi64, phi32, pre.md3


def gc_closures(g, t):
    pre = G.precompute_gc(g, t)
    g32 = G.cast_float_fields(g, f32)
    pre32 = G.precompute_gc(g32, t.astype(f32))
    phi64 = lambda r: G.phi_gc_pre(pre, r, assoc_q_form=True, branches=gc_br)
    phi32 = lambda r: G.phi_gc_pre(pre32, r, branches=gc_br)
    return phi64, phi32, pre.md3


def stages(closure_fn, closure_args_axes, tag):
    floor32 = jnp.asarray(V._GRAD_RHO_FLOOR_F32, dtype=f32)

    def item_init(args, t, zi, pri):
        phi64, phi32, md3 = closure_fn(*args, t)
        phi32_g = lambda r: phi32(jnp.maximum(r, floor32.astype(r.dtype)))
        return V._mix_init(
            phi32_g, zi.astype(f32), pri.astype(f32), md3.astype(f32),
            True, step_tol=1e-5,
        )

    def item_warm(args, t, zi, pri):
        phi64, phi32, md3 = closure_fn(*args, t)
        phi32_g = lambda r: phi32(jnp.maximum(r, floor32.astype(r.dtype)))
        u0, limits32, init_ok = V._mix_init(
            phi32_g, zi.astype(f32), pri.astype(f32), md3.astype(f32),
            True, step_tol=1e-5,
        )
        u0, _ = V._mix_newton(
            phi32_g, zi.astype(f32), u0, limits32, max_iter=V._MAX_MIX_ITER,
            step_tol=1e-4, res_mu_tol=1e-4, res_p_rtol=1e-4, res_p_abs=1e-6,
            phi_fn_jac=phi32,
        )
        return u0

    def item_polish(args, t, zi, pri):
        phi64, phi32, md3 = closure_fn(*args, t)
        phi32_g = lambda r: phi32(jnp.maximum(r, floor32.astype(r.dtype)))
        u0, limits32, init_ok = V._mix_init(
            phi32_g, zi.astype(f32), pri.astype(f32), md3.astype(f32),
            True, step_tol=1e-5,
        )
        u0, _ = V._mix_newton(
            phi32_g, zi.astype(f32), u0, limits32, max_iter=V._MAX_MIX_ITER,
            step_tol=1e-4, res_mu_tol=1e-4, res_p_rtol=1e-4, res_p_abs=1e-6,
            phi_fn_jac=phi32,
        )
        limits = tuple(l.astype(jnp.float64) for l in limits32)
        u, out = V._mix_newton(
            phi64, zi, u0.astype(jnp.float64), limits, max_iter=30,
            step_tol=V._STEP_TOL, res_mu_tol=1e-9, res_p_rtol=1e-9,
            res_p_abs=1e-13, phi_fn_jac=phi32,
        )
        return u, out

    vm = lambda f: jax.jit(jax.vmap(f, in_axes=(closure_args_axes, 0, 0, 0)))
    return vm(item_init), vm(item_warm), vm(item_polish)


mix_args = (mix_par, mix_kij)
mix_axes = (0, 0)
gc_args = (gc_eos.params,)
gc_axes = (G._GC_BATCH_AXES,)

for tag, cfn, args, axes in [
    ("mix", lambda pi, ki, t: mix_closures(pi, ki, t), mix_args, mix_axes),
    ("gc", lambda g, t: gc_closures(g, t), gc_args, gc_axes),
]:
    f_init, f_warm, f_polish = stages(cfn, axes, tag)
    dt, _ = timeit(f_init, args, T, z, p_red)
    report(f"{tag}_init32", dt)
    dt, _ = timeit(f_warm, args, T, z, p_red)
    report(f"{tag}_warm32", dt)
    dt, _ = timeit(f_polish, args, T, z, p_red)
    report(f"{tag}_polish64", dt)

# ---- phi micro: 8 stacked states per row, f32 and f64 ----------------------
rng = np.random.default_rng(0)
states = jnp.asarray(rng.uniform(1e-4, 0.4, (B, 8, 2)))


def phi_micro(closure_fn, args_axes, args, dtype):
    def item(a, t, rows):
        phi64, phi32, _ = closure_fn(*a, t)
        f = phi64 if dtype == jnp.float64 else phi32
        return jax.vmap(f)(rows.astype(dtype))

    return jax.jit(jax.vmap(item, in_axes=(args_axes, 0, 0)))


for tag, cfn, args, axes in [
    ("mix", lambda pi, ki, t: mix_closures(pi, ki, t), mix_args, mix_axes),
    ("gc", lambda g, t: gc_closures(g, t), gc_args, gc_axes),
]:
    for dname, dt_ in [("f32", f32), ("f64", jnp.float64)]:
        f = phi_micro(cfn, axes, args, dt_)
        dt, _ = timeit(f, args, T, states)
        report(f"{tag}_phi_{dname}_x8", dt)
