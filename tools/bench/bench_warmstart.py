"""Measure fit-loop step time: cold-initialized vs warm-started bubble solves."""
import os, sys, time, json
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from feos_tpu.models.pcsaft_mix import static_branches
from feos_tpu.regression import binary_loss

B = int(os.environ.get("B", 4096))
rng = np.random.default_rng(0)
par = np.array([[1.0, 3.5, 150.0, 0, 0.02, 1500.0, 1, 1],
                [1.0, 3.5, 200.0, 0, 0.03, 2500.0, 1, 1]])
T = rng.uniform(140.0, 165.0, B)
x = rng.uniform(0.15, 0.85, B)
br = static_branches(np.tile(par[None], (B, 1, 1)))
kij0 = jnp.array([-0.15, 1000.0])
par_j = jnp.asarray(par); T_j = jnp.asarray(T); x_j = jnp.asarray(x)

# synth experimental pressures: one forward solve at kij0
loss0, u0 = jax.jit(lambda k: binary_loss(
    k, par_j, T_j, x_j, jnp.full(B, 1e5), branches=br, return_state=True
))(kij0)
# p_exp from a solved state: resolve with p0=1e5 and keep the pressures
from feos_tpu.models.pcsaft_mix import bubble_point
p_sol, nans = jax.jit(lambda k: bubble_point(
    jnp.tile(par_j[None], (B,1,1)), jnp.tile(k[None], (B,1)), T_j, x_j,
    jnp.full(B, 1e5), branches=br))(kij0)
p_exp = jnp.where(nans, 1e5, p_sol) * 1.03
print("converged frac (setup):", 1.0 - np.mean(np.asarray(nans)))

kij = jnp.array([-0.14, 1000.0])  # one LR step away

cold = jax.jit(jax.value_and_grad(lambda k: binary_loss(
    k, par_j, T_j, x_j, p_exp, branches=br)))
warm = jax.jit(jax.value_and_grad(
    lambda k, u: binary_loss(k, par_j, T_j, x_j, p_exp, branches=br,
                             state0=u, return_state=True)[0][0],
    has_aux=False))
# note: binary_loss with return_state returns (loss, state); grad of loss only
def warm_fn(k, u):
    loss, u2 = binary_loss(k, par_j, T_j, x_j, p_exp, branches=br,
                           state0=u, return_state=True)
    return loss, u2
warm = jax.jit(jax.value_and_grad(warm_fn, has_aux=True))

# fresh warm state at current kij
_, u = jax.jit(lambda k: binary_loss(k, par_j, T_j, x_j, p_exp, branches=br,
                                     return_state=True))(kij)

for name, f, args in [("cold", cold, (kij,)), ("warm", warm, (kij, u))]:
    t0 = time.time(); out = f(*args); jax.block_until_ready(out); c = time.time()-t0
    reps = 10
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.time()-t0)/reps
    lv = out[0][0] if isinstance(out[0], tuple) else out[0]
    print(json.dumps({"variant": name, "step_ms": round(dt*1e3, 2),
                      "compile_s": round(c, 1), "loss": float(lv), "B": B}))
