"""Binary phase-diagram construction from the batched VLE solvers.

Beyond the reference surface (feos-torch exposes single bubble/dew solves
only; a user building a p-x-y diagram loops in Python): here the batch axis
IS the composition grid, so a full isothermal diagram is ONE batched solve
per curve — the idiomatic TPU mapping (a (N,)-row solve saturates the chip
the same way the regression workloads do).

Construction (standard): at fixed T, sweep the liquid composition grid
x1 in (0, 1) through :func:`feos_tpu.models.pcsaft_mix.bubble_point` with
``full_output=True``.  The bubble curve is (x1, p); the dew curve is the
same pressures re-parameterized by the converged incipient-vapor
composition (y1, p).  Initial pressures default to the Raoult estimate
``x1 p_sat,1 + (1-x1) p_sat,2`` from the pure-component solver — a warm
start that keeps the Newton iterations on the correct branch across the
whole grid.

Azeotropes and near-critical isotherms: rows whose solve fails are
returned NaN with ``nans=True`` (the library-wide fixed-shape mask
protocol); the surviving rows still trace the diagram.

The isobaric duals (:func:`binary_txy`, :func:`gc_binary_txy`) map the
same grid through the saturation-TEMPERATURE solvers
(models.pcsaft_mix.bubble_point_t; solvers/tsolve.py) — one batched
secant-over-Newton solve per T-x-y curve.
"""

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .models import pcsaft_mix, pcsaft_pure


class BinaryTxy(NamedTuple):
    """Isobaric T-x-y diagram of a binary mixture.

    All arrays are (N,) over the composition grid; failed rows are NaN
    (``nans`` True).  ``x1`` parameterizes the bubble (liquid) curve and
    ``y1`` the dew (vapor) curve at the same temperatures ``t`` (K).
    """

    x1: jnp.ndarray
    y1: jnp.ndarray
    t: jnp.ndarray
    nans: jnp.ndarray


class BinaryPxy(NamedTuple):
    """Isothermal p-x-y diagram of a binary mixture.

    All arrays are (N,) over the composition grid; failed rows are NaN
    (``nans`` True).  ``x1`` parameterizes the bubble (liquid) curve and
    ``y1`` the dew (vapor) curve at the same pressures ``p`` (Pa).
    """

    x1: jnp.ndarray
    y1: jnp.ndarray
    p: jnp.ndarray
    nans: jnp.ndarray


def _raoult_init(parameters, temperature, x1):
    """Raoult initial pressure from the pure-component vapor pressures."""
    pp = jnp.asarray(parameters, dtype=jnp.float64)  # (2, 8)
    t2 = jnp.full((2,), temperature, dtype=jnp.float64)
    nans, psat = pcsaft_pure.vapor_pressure(pp, t2)
    psat = jnp.where(nans, 1e5, psat)
    return x1 * psat[0] + (1.0 - x1) * psat[1]


def binary_pxy(
    parameters,
    kij,
    temperature: float,
    n_points: int = 51,
    x_eps: float = 1e-3,
    pressure_init: Optional[jnp.ndarray] = None,
) -> BinaryPxy:
    """Isothermal p-x-y diagram of one binary mixture.

    ``parameters`` is a single (2, 8) parameter matrix (the per-item layout
    of the batched solvers); ``kij`` is ``None`` or ``[k_ij, eps_AiBj]``.
    The composition grid is ``n_points`` values of x1 in
    ``[x_eps, 1 - x_eps]`` (the open interval: the endpoints are the pure
    components, where the incipient composition is degenerate).

    Returns a :class:`BinaryPxy`; gradients of ``p`` w.r.t. the EOS
    parameters flow through the stationary re-attachment identity exactly
    as for single bubble-point solves.
    """
    pp = jnp.asarray(parameters, dtype=jnp.float64)
    if pp.shape != (2, 8):
        raise ValueError(f"parameters must be (2, 8), got {pp.shape}")
    x1 = jnp.linspace(x_eps, 1.0 - x_eps, n_points, dtype=jnp.float64)
    batch = jnp.broadcast_to(pp, (n_points, 2, 8))
    kb = None
    if kij is not None:
        k = jnp.asarray(kij, dtype=jnp.float64)
        if k.ndim == 0 or k.shape == (1,):
            # scalar k_ij: pad with eps_AiBj = 0 (the reference's "no
            # override" sentinel, src/pcsaft.rs:163) — broadcasting a
            # scalar to (2,) would silently activate an induced
            # association epsilon equal to k_ij
            k = jnp.stack([k.reshape(()), jnp.zeros((), jnp.float64)])
        elif k.shape != (2,):
            raise ValueError(
                "kij must be a scalar k_ij or the pair [k_ij, eps_AiBj], "
                f"got shape {k.shape}"
            )
        kb = jnp.broadcast_to(k, (n_points, 2))
    T = jnp.full((n_points,), temperature, dtype=jnp.float64)
    if pressure_init is None:
        pressure_init = _raoult_init(pp, temperature, x1)
    else:
        pressure_init = jnp.broadcast_to(
            jnp.asarray(pressure_init, dtype=jnp.float64), (n_points,)
        )
    p, nans, y = pcsaft_mix.bubble_point(
        batch, kb, T, x1, pressure_init, full_output=True
    )
    return BinaryPxy(x1=x1, y1=y[:, 0], p=p, nans=nans)


def binary_txy(
    parameters,
    kij,
    pressure: float,
    n_points: int = 51,
    x_eps: float = 1e-3,
    t_init: Optional[jnp.ndarray] = None,
) -> BinaryTxy:
    """Isobaric T-x-y diagram of one binary mixture.

    The temperature-explicit dual of :func:`binary_pxy` (a capability the
    reference has no path to — it exposes neither temperature solves nor
    diagram construction): the composition grid rides the batch axis of
    ONE :func:`feos_tpu.models.pcsaft_mix.bubble_point_t` solve at fixed
    ``pressure`` (Pa).  The bubble curve is (x1, T); the dew curve is the
    same temperatures re-parameterized by the converged incipient-vapor
    composition (y1, T).

    Initial temperatures default to the mole-fraction mix of the pure-
    component boiling points at ``pressure`` (the T-side Raoult analog,
    solved by :func:`feos_tpu.models.pcsaft_pure.boiling_temperature`
    from a dispersion-energy-scaled start); pass ``t_init`` (scalar or
    (N,)) to override, e.g. near-critical isobars where a pure solve
    fails.
    """
    pp = jnp.asarray(parameters, dtype=jnp.float64)
    if pp.shape != (2, 8):
        raise ValueError(f"parameters must be (2, 8), got {pp.shape}")
    x1 = jnp.linspace(x_eps, 1.0 - x_eps, n_points, dtype=jnp.float64)
    batch = jnp.broadcast_to(pp, (n_points, 2, 8))
    kb = None
    if kij is not None:
        k = jnp.asarray(kij, dtype=jnp.float64)
        if k.ndim == 0 or k.shape == (1,):
            k = jnp.stack([k.reshape(()), jnp.zeros((), jnp.float64)])
        elif k.shape != (2,):
            raise ValueError(
                "kij must be a scalar k_ij or the pair [k_ij, eps_AiBj], "
                f"got shape {k.shape}"
            )
        kb = jnp.broadcast_to(k, (n_points, 2))
    if t_init is None:
        # pure boiling points at the target isobar, started from the
        # dispersion energy scale (T_b ~ 1.2 eps/k for nonassociating
        # fluids near 1 bar; the secant loop reaches ~25%/step so a
        # crude start suffices)
        p2 = jnp.full((2,), pressure, dtype=jnp.float64)
        nans_b, tb = pcsaft_pure.boiling_temperature(
            pp, p2, 1.2 * pp[:, 2]
        )
        tb = jnp.where(nans_b, 1.2 * pp[:, 2], tb)
        t_init = x1 * tb[0] + (1.0 - x1) * tb[1]
    t0 = jnp.broadcast_to(
        jnp.asarray(t_init, dtype=jnp.float64), (n_points,)
    )
    p = jnp.full((n_points,), pressure, dtype=jnp.float64)
    t, nans, y = pcsaft_mix.bubble_point_t(
        batch, kb, p, x1, t0, full_output=True
    )
    return BinaryTxy(x1=x1, y1=y[:, 0], t=t, nans=nans)


def gc_binary_txy(
    eos,
    pressure: float,
    n_points: int = 51,
    x_eps: float = 1e-3,
    t_init=None,
) -> BinaryTxy:
    """Isobaric T-x-y diagram for a gc-PC-SAFT binary.

    Same replicated-batch convention as :func:`gc_binary_pxy` (the eos
    facade's batch dimension must hold ``n_points`` copies of the
    binary).  ``t_init`` is a scalar or (N,) initial temperature;
    defaults to 1.2x the batch-mean dispersion energy scale of the
    mixture's segments (see :func:`binary_txy`).
    """
    B = int(eos.params.m_mix.shape[0])
    if B != n_points:
        raise ValueError(
            f"eos batch dimension ({B}) must equal n_points ({n_points}): "
            "gc parameters are assembled per batch row, so build the facade "
            "on n_points replicas of the binary (see tests/test_diagrams.py)"
        )
    n_comp = int(eos.params.m_mix.shape[1])
    if n_comp != 2:
        raise ValueError(f"gc_binary_txy needs a binary, got {n_comp} components")
    x1 = jnp.linspace(x_eps, 1.0 - x_eps, n_points, dtype=jnp.float64)
    if t_init is None:
        t_init = 1.2 * jnp.mean(eos.params.epsilon_k_mix)
    t0 = jnp.broadcast_to(
        jnp.asarray(t_init, dtype=jnp.float64), (n_points,)
    )
    p = jnp.full((n_points,), pressure, dtype=jnp.float64)
    t, nans, y = eos.bubble_point_t(p, x1, t0, full_output=True)
    return BinaryTxy(x1=x1, y1=y[:, 0], t=t, nans=nans)


def gc_binary_pxy(
    eos,
    temperature: float,
    n_points: int = 51,
    x_eps: float = 1e-3,
    pressure_init=1e5,
) -> BinaryPxy:
    """Isothermal p-x-y diagram for a gc-PC-SAFT binary.

    ``eos`` is a :class:`feos_tpu.models.gc_pcsaft.GcPcSaftMix` whose batch
    dimension holds ``n_points`` copies of the same binary (gc parameters
    are assembled per batch row at trace time, so the facade instance must
    be built on the replicated batch — see ``tests/test_diagrams.py``).
    ``pressure_init`` is a scalar or (N,) warm start in Pa.
    """
    B = int(eos.params.m_mix.shape[0])
    if B != n_points:
        raise ValueError(
            f"eos batch dimension ({B}) must equal n_points ({n_points}): "
            "gc parameters are assembled per batch row, so build the facade "
            "on n_points replicas of the binary (see tests/test_diagrams.py)"
        )
    n_comp = int(eos.params.m_mix.shape[1])
    if n_comp != 2:
        raise ValueError(f"gc_binary_pxy needs a binary, got {n_comp} components")
    x1 = jnp.linspace(x_eps, 1.0 - x_eps, n_points, dtype=jnp.float64)
    T = jnp.full((n_points,), temperature, dtype=jnp.float64)
    p0 = jnp.broadcast_to(
        jnp.asarray(pressure_init, dtype=jnp.float64), (n_points,)
    )
    p, nans, y = eos.bubble_point(T, x1, p0, full_output=True)
    return BinaryPxy(x1=x1, y1=y[:, 0], p=p, nans=nans)
