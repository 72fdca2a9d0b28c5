"""Large-scale PC-SAFT parameter regression (the library's raison d'etre).

The reference library exists to make phase-equilibrium properties
differentiable so PC-SAFT parameters can be fitted to experimental data by
gradient descent (reference README.md:42-56, Rehner/Bardow/Gross 2023).  The
reference leaves the training loop to the user (torch.optim); here we
provide a first-class, TPU-sharded fitting loop built on optax:

* the experimental batch (temperatures, target pressures/densities) is
  sharded over a 1-D device mesh (rows are independent — zero collectives
  in the solve, one ``psum`` for the loss);
* non-converged rows are masked out of the loss (the reference's
  failure-mask protocol, SURVEY.md section 5);
* relative least-squares objective, matching common practice for vapor
  pressure / liquid density fits.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .models.pcsaft_pure import liquid_density, vapor_pressure


def masked_relative_sse(pred, target, ok):
    """Mean of ((pred - target)/target)^2 over converged rows.

    Returns +inf when no row converged — a silent 0 would make a fully
    diverged parameter vector look like a perfect fit.
    """
    rel = jnp.where(ok, (pred - target) / target, 0.0)
    n_ok = jnp.sum(ok)
    loss = jnp.sum(rel * rel) / jnp.maximum(n_ok, 1)
    return jnp.where(n_ok > 0, loss, jnp.inf)


def pure_loss(parameters, temperature, p_sat=None, rho_liq=None, pressure=None):
    """Combined relative-SSE loss on vapor pressure and/or liquid density.

    ``parameters`` may be a single (8,) vector broadcast over the batch or a
    full (B, 8) batch of per-row parameters.
    """
    parameters = jnp.asarray(parameters, dtype=jnp.float64)
    if parameters.ndim == 1:
        parameters = jnp.tile(parameters, (temperature.shape[0], 1))
    loss = 0.0
    if p_sat is not None:
        nans, vp = vapor_pressure(parameters, temperature)
        loss = loss + masked_relative_sse(jnp.where(nans, 1.0, vp), p_sat, ~nans)
    if rho_liq is not None:
        nans, rl = liquid_density(parameters, temperature, pressure)
        loss = loss + masked_relative_sse(jnp.where(nans, 1.0, rl), rho_liq, ~nans)
    return loss


class FitResult(NamedTuple):
    parameters: jnp.ndarray
    loss_history: jnp.ndarray


def fit_pure(
    initial_parameters,
    temperature,
    p_sat=None,
    rho_liq=None,
    pressure=None,
    steps: int = 200,
    optimizer=None,
    mesh=None,
):
    """Fit shared PC-SAFT parameters to pure-component data by Adam.

    With ``mesh`` given (a 1-D ``jax.sharding.Mesh``), the data batch is
    sharded across devices and the parameter gradients all-reduce — standard
    data parallelism over ICI.

    Optimization runs on *scaled* parameters z = params / |params_0| (zeros
    scale to 1) so a single learning rate is meaningful across parameters
    spanning five orders of magnitude (epsilon_k ~ 250 vs kappa_ab ~ 0.03),
    and the optimizer is wrapped in ``optax.apply_if_finite`` so steps whose
    gradients are non-finite (e.g. a parameter excursion where no row
    converges) are skipped instead of poisoning the state.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)
    optimizer = optax.apply_if_finite(optimizer, max_consecutive_errors=20)
    params0 = jnp.asarray(initial_parameters, dtype=jnp.float64)
    scale = jnp.where(params0 != 0.0, jnp.abs(params0), 1.0)
    params = params0 / scale
    temperature = jnp.asarray(temperature, dtype=jnp.float64)

    loss_fn = lambda z: pure_loss(z * scale, temperature, p_sat, rho_liq, pressure)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("batch"))
        repl = NamedSharding(mesh, P())
        temperature = jax.device_put(temperature, batch_sh)
        if p_sat is not None:
            p_sat = jax.device_put(jnp.asarray(p_sat), batch_sh)
        if rho_liq is not None:
            rho_liq = jax.device_put(jnp.asarray(rho_liq), batch_sh)
        if pressure is not None:
            pressure = jax.device_put(jnp.asarray(pressure), batch_sh)
        params = jax.device_put(params, repl)
        scale = jax.device_put(scale, repl)
        loss_fn = lambda z: pure_loss(z * scale, temperature, p_sat, rho_liq, pressure)

    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for _ in range(steps):
        params, opt_state, loss = step(params, opt_state)
        losses.append(loss)
    return FitResult(params * scale, jnp.stack(losses))
