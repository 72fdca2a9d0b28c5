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


def _run_fit(loss_fn, optimizer, theta, steps: int, aux0=None):
    """Jitted ``lax.scan`` training loop shared by the fitting entry points.

    One device program for the whole fit: no per-step host round trip, the
    loss history materializes as a single stacked (steps,) array, and the
    parameter/optimizer buffers are donated so the optimizer state updates
    in place.

    With ``aux0`` given, ``loss_fn(theta, aux) -> (loss, aux_next)`` and the
    auxiliary state rides in the scan carry — used to warm-start each
    step's VLE solves at the previous step's converged pressures (the
    solver accepts an arbitrary initial pressure estimate; a converged
    result from nearly identical parameters is a far better start than the
    experimental data, so the solver's NPT/successive-substitution stages
    finish in fewer batch-synchronized iterations every step after the
    first).  The auxiliary state carries no gradient (see the callers'
    ``stop_gradient``); it changes only iteration counts, never converged
    results.
    """
    opt_state = optimizer.init(theta)

    if aux0 is None:
        def body(carry, _):
            theta, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(theta)
            updates, opt_state = optimizer.update(grads, opt_state, theta)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), loss

        @partial(jax.jit, donate_argnums=(0, 1))
        def run(theta, opt_state):
            (theta, _), losses = jax.lax.scan(
                body, (theta, opt_state), length=steps
            )
            return theta, losses

        return run(theta, opt_state)

    def body(carry, _):
        theta, opt_state, aux = carry
        (loss, aux_next), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(theta, aux)
        updates, opt_state = optimizer.update(grads, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state, aux_next), loss

    # aux0 typically aliases an array the loss closure also captures (the
    # experimental pressures double as the first warm start), so it is not
    # donatable — donate only the parameter/optimizer buffers
    @partial(jax.jit, donate_argnums=(0, 1))
    def run(theta, opt_state, aux):
        (theta, _, _), losses = jax.lax.scan(
            body, (theta, opt_state, aux), length=steps
        )
        return theta, losses

    return run(theta, opt_state, aux0)


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

    params, losses = _run_fit(loss_fn, optimizer, params, steps)
    return FitResult(params * scale, losses)


def binary_loss(kij_pair, parameters, temperature, liquid_molefracs,
                p_bubble, p0=None, branches=None, state0=None,
                return_state=False):
    """Relative-SSE loss of bubble pressures for one binary pair.

    ``kij_pair`` is the (2,) vector ``[k_ij, epsilon_k_AiBj]`` shared by
    every data row; ``parameters`` the fixed (2, 8) component parameters;
    the data are ``(temperature, liquid_molefracs, p_bubble)`` rows.  The
    experimental pressures double as the solver's initial estimates
    (``p0``) unless given — the reference forwards user estimates the
    same way (src/pcsaft.rs:170).

    ``state0`` is a (B, 3) converged solver log-state from a previous call
    at nearby parameters: the bubble solve then skips its iterative
    initialization entirely (the continuation fast path; see
    :func:`models.pcsaft_mix.bubble_point`).  ``return_state=True``
    additionally returns the converged state (gradient-stopped; failed
    rows keep their ``state0``) so a training loop can carry it.
    """
    from .models.pcsaft_mix import bubble_point

    B = temperature.shape[0]
    parameters = jnp.asarray(parameters, dtype=jnp.float64)
    params_b = jnp.tile(parameters[None], (B, 1, 1))
    kij_b = jnp.tile(kij_pair[None, :], (B, 1))
    p0 = p_bubble if p0 is None else p0
    p, nans, u_state = bubble_point(
        params_b, kij_b, temperature, liquid_molefracs, p0, branches=branches,
        state0=state0, state_output=True,
    )
    loss = masked_relative_sse(jnp.where(nans, 1.0, p), p_bubble, ~nans)
    if return_state:
        if state0 is not None:
            # failed rows keep the last good state (NaN would poison the
            # warm start forever; parameters move, so a row that failed
            # this step may re-converge from its old state next step)
            u_state = jnp.where(nans[:, None], state0, u_state)
        return loss, jax.lax.stop_gradient(u_state)
    return loss


def fit_binary(
    parameters,
    temperature,
    liquid_molefracs,
    p_bubble,
    kij0=0.0,
    epsilon_k_aibj0=None,
    steps: int = 100,
    optimizer=None,
    mesh=None,
):
    """Fit the binary interaction parameters (k_ij and optionally the
    epsilon_k_AiBj cross-association override) to bubble-point data.

    This is the reference's companion-paper workload (README.md:42-56,
    "large-scale parametrization of binary mixtures"): component
    parameters stay fixed, the interaction parameters are regressed
    against experimental (T, x, p_bubble) rows by Adam with gradients
    through the stationary bubble-point identity.  With ``mesh`` the data
    rows shard over a 1-D device mesh exactly as in :func:`fit_pure`.

    ``epsilon_k_aibj0 = None`` keeps the cross-association energy at the
    combining-rule value (the reference's eps = 0 convention,
    src/pcsaft.rs:163) and fits k_ij alone.
    """
    from .models.pcsaft_mix import static_branches

    if optimizer is None:
        optimizer = optax.adam(5e-3)
    optimizer = optax.apply_if_finite(optimizer, max_consecutive_errors=20)
    parameters = jnp.asarray(parameters, dtype=jnp.float64)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    liquid_molefracs = jnp.asarray(liquid_molefracs, dtype=jnp.float64)
    p_bubble = jnp.asarray(p_bubble, dtype=jnp.float64)
    br = static_branches(parameters[None])

    fit_eps = epsilon_k_aibj0 is not None
    eps0 = float(epsilon_k_aibj0) if fit_eps else 0.0
    eps_scale = abs(eps0) if fit_eps and eps0 != 0.0 else 1.0
    theta = jnp.array([float(kij0), eps0 / eps_scale])

    def kij_pair_of(theta):
        eps = theta[1] * eps_scale if fit_eps else 0.0
        return jnp.stack([theta[0], jnp.asarray(eps, dtype=jnp.float64)])

    def loss_fn(theta, u_prev):
        # u_prev is the previous step's converged solver state (scan
        # carry): the solve skips its initialization and polishes from
        # within O(learning-rate) of the new root
        return binary_loss(
            kij_pair_of(theta), parameters, temperature, liquid_molefracs,
            p_bubble, branches=br, state0=u_prev, return_state=True,
        )

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("batch"))
        repl = NamedSharding(mesh, P())
        temperature = jax.device_put(temperature, batch_sh)
        liquid_molefracs = jax.device_put(liquid_molefracs, batch_sh)
        p_bubble = jax.device_put(p_bubble, batch_sh)
        theta = jax.device_put(theta, repl)

    # seed the carry with ONE cold (fully initialized) solve at theta0;
    # every scan step then runs the warm fast path.  Rows that fail cold
    # keep a NaN state — the warm solver parks and masks them, matching
    # the old behavior (they failed identically at every cold re-attempt).
    _, u0 = binary_loss(
        kij_pair_of(theta), parameters, temperature, liquid_molefracs,
        p_bubble, branches=br, return_state=True,
    )

    theta, losses = _run_fit(loss_fn, optimizer, theta, steps, aux0=u0)
    kij_fit = theta[0]
    eps_fit = theta[1] * eps_scale if fit_eps else jnp.asarray(0.0)
    return FitResult(jnp.stack([kij_fit, eps_fit]), losses)


def fit_gc(
    segment_identifier,
    parameter,
    segment_lists,
    bond_lists,
    binary_segment_records,
    temperature,
    liquid_molefracs,
    p_bubble,
    phi=None,
    steps: int = 100,
    optimizer=None,
    mesh=None,
):
    """Fit the gc binary segment parameters ``k_ab`` to bubble-point data.

    The gc analogue of :func:`fit_binary`: segment parameters and molecule
    topologies stay fixed, and the ``k_ab`` entries listed in
    ``binary_segment_records`` (``[(seg_a, seg_b, k0), ...]`` — every listed
    record is fitted from its ``k0`` start) are regressed against
    experimental ``(temperature, liquid_molefracs, p_bubble)`` rows.
    Gradients flow through the assembled dispersion bases
    (:func:`feos_tpu.models.gc_pcsaft.assemble` keeps all parameter-derived
    quantities in jnp) and the stationary bubble-point identity — the
    reference exposes the same derivative path via torch
    (feos_torch/gc_pcsaft.py:60-63 builds kab into the torch graph) but
    leaves the training loop to the user.

    ``segment_lists``/``bond_lists`` may describe a single system (length
    1, or length n of plain segment lists); it is tiled over the data rows.
    With ``mesh`` the data rows shard over a 1-D device mesh as in
    :func:`fit_pure`.
    """
    from .models.gc_pcsaft import (
        assemble, gc_incipient_property, static_branches_gc,
    )

    if optimizer is None:
        optimizer = optax.adam(5e-3)
    optimizer = optax.apply_if_finite(optimizer, max_consecutive_errors=20)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    liquid_molefracs = jnp.asarray(liquid_molefracs, dtype=jnp.float64)
    p_bubble = jnp.asarray(p_bubble, dtype=jnp.float64)
    B = temperature.shape[0]

    # tile a single-system topology over the data rows
    if len(segment_lists) != B:
        if len(segment_lists) != 1:
            raise ValueError(
                "segment_lists must describe one system or one per data row"
            )
        segment_lists = list(segment_lists) * B
        bond_lists = list(bond_lists) * B
    if phi is not None:
        phi = jnp.asarray(phi, dtype=jnp.float64)
        if phi.ndim == 1 or phi.shape[0] == 1:
            phi = jnp.tile(phi.reshape(1, -1), (B, 1))

    pairs = [(s1, s2) for s1, s2, _ in binary_segment_records]
    theta = jnp.asarray([float(k) for _, _, k in binary_segment_records])

    def build(kvals):
        records = [(s1, s2, kvals[i]) for i, (s1, s2) in enumerate(pairs)]
        return assemble(
            segment_identifier, parameter, segment_lists, bond_lists,
            records, phi,
        )

    # branches from a concrete assembly at the initial kab (kab does not
    # change which dipole/association regimes are reachable)
    br = static_branches_gc(build(theta))

    def gc_loss(theta, state0, return_state):
        params = build(theta)
        p, nans, u_state = gc_incipient_property(
            params, temperature, liquid_molefracs, p_bubble,
            bubble=True, branches=br, state0=state0, state_output=True,
        )
        loss = masked_relative_sse(jnp.where(nans, 1.0, p), p_bubble, ~nans)
        if not return_state:
            return loss
        if state0 is not None:
            # failed rows keep the last good state (see binary_loss)
            u_state = jnp.where(nans[:, None], state0, u_state)
        return loss, jax.lax.stop_gradient(u_state)

    def loss_fn(theta, u_prev):
        # u_prev is the previous step's converged solver state (scan
        # carry): the solve skips its initialization (see fit_binary)
        return gc_loss(theta, u_prev, return_state=True)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sh = NamedSharding(mesh, P("batch"))
        repl = NamedSharding(mesh, P())
        temperature = jax.device_put(temperature, batch_sh)
        liquid_molefracs = jax.device_put(liquid_molefracs, batch_sh)
        p_bubble = jax.device_put(p_bubble, batch_sh)
        theta = jax.device_put(theta, repl)

    # one cold solve at theta0 seeds the warm-start carry (see fit_binary)
    _, u0 = gc_loss(theta, None, return_state=True)

    theta, losses = _run_fit(loss_fn, optimizer, theta, steps, aux0=u0)
    return FitResult(theta, losses)
