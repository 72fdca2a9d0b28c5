"""Residual thermodynamic state properties from temperature derivatives.

Beyond the reference's capability set (feos_torch exposes only Helmholtz
energy, the (A, p~, mu, v) derivative set, and phase-equilibrium pressures):
because the EOS core here is a *pure function* of ``(parameters, T, rho)``,
every temperature derivative is one more ``jax.jvp`` — so the full residual
caloric property set (entropy, enthalpy, internal energy, Gibbs energy, heat
capacities, fugacity coefficients, pressure/compressibility) comes out of the
same golden-pinned Helmholtz functions with no new physics code.  The
flagship application is entropy scaling (residual-entropy correlations for
transport properties), which needs ``s_res`` at solved liquid densities —
compose :func:`feos_tpu.models.pcsaft_pure.liquid_density` with
:func:`pure_properties`.

All identities are standard residual thermodynamics over the reduced
Helmholtz energy density ``Phi = A_res / (kB T V)`` (units A^-3, the quantity
returned by the ``phi_*`` cores).  With ``rho_t = sum_i rho_i`` and the two
directional derivatives along the composition ray,

    S1 = sum_i rho_i dPhi/drho_i          (d/ds Phi(rho (1+s)) at s=0)
    S2 = rho^T (d2Phi/drho drho) rho      (d2/ds2, same ray)

the property set per mole of mixture is

    p~            = rho_t - Phi + S1                       (reduced pressure)
    Z             = p~ / rho_t
    a_res /(RT)   = Phi / rho_t
    s_res / R     = -(Phi + T Phi_T) / rho_t
    u_res /(RT)   = -T Phi_T / rho_t
    h_res /(RT)   = u_res/(RT) + Z - 1
    g_res /(RT)   = a_res/(RT) + Z - 1
    c_v_res / R   = -T (2 Phi_T + T Phi_TT) / rho_t
    c_p_res / R   = c_v_res/R + (p~ + T p~_T)^2 / (rho_t (rho_t + S2)) - 1
    ln phi_i      = dPhi/drho_i - ln Z                      (fugacity coeff.)

where ``p~_T = -Phi_T + S1_T`` is the fixed-density temperature derivative.
The c_p identity is the textbook  c_p - c_v = -T (dp/dT)_V^2 / (dp/dV)_T
evaluated per mole, minus the ideal-gas R.  Every formula degenerates to the
ideal-gas limit (all residuals -> 0, Z -> 1) as rho_t -> 0.

Inputs follow the conventions of the existing model APIs: temperatures in
Kelvin, (partial) number densities reduced to molecules/A^3
(multiply kmol/m^3 by :data:`feos_tpu.units.KMOL_M3_TO_REDUCED`).  Outputs
are molar SI: Pa, J/mol, J/(mol K), dimensionless Z / ln(phi_i).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .models.gc_pcsaft import GcParams, _GC_BATCH_AXES, phi_gc, static_branches_gc
from .models.pcsaft_mix import MixParams, _split_kij, phi_mix, static_branches
from .models.pcsaft_pure import PureParams, phi_pure
from .ops.derivatives import value_and_2derivs
from .units import REDUCED_TO_PA_PER_KT, RGAS


class ResidualProperties(NamedTuple):
    """Batched residual property set (see module docstring for identities).

    ``ln_phi`` has shape (B, n) for mixtures and (B,) for pure components;
    all other fields are (B,).
    """

    pressure: jnp.ndarray          # total pressure, Pa
    compressibility: jnp.ndarray   # Z = p / (rho kB T)
    a_res: jnp.ndarray             # residual molar Helmholtz energy, J/mol
    s_res: jnp.ndarray             # residual molar entropy, J/(mol K)
    u_res: jnp.ndarray             # residual molar internal energy, J/mol
    h_res: jnp.ndarray             # residual molar enthalpy, J/mol
    g_res: jnp.ndarray             # residual molar Gibbs energy, J/mol
    c_v_res: jnp.ndarray           # residual molar isochoric heat capacity, J/(mol K)
    c_p_res: jnp.ndarray           # residual molar isobaric heat capacity, J/(mol K)
    ln_phi: jnp.ndarray            # ln fugacity coefficient(s)


def _props_item(phi_fn, t, rho):
    """Per-item property set from a reduced Helmholtz density ``phi_fn(T, rho)``.

    ``rho`` is the (n,) partial-density vector (n = 1 for pure components);
    ``phi_fn`` must accept the temperature and the full density vector.
    Returns the ResidualProperties fields as scalars (ln_phi as (n,)).
    """
    rho = jnp.atleast_1d(rho)
    n = rho.shape[0]
    rho_t = jnp.sum(rho)
    zero = jnp.zeros((), rho.dtype)

    def ray(tt):
        # (Phi, S1, S2) along the composition ray rho (1 + s)
        return jnp.stack(
            value_and_2derivs(lambda s: phi_fn(tt, rho * (1.0 + s)), zero)
        )

    (phi, s1, s2), (phi_t, s1_t, _), (phi_tt, _, _) = value_and_2derivs(ray, t)

    # residual reduced chemical potentials mu_i = dPhi/drho_i (fixed T)
    mu = jax.vmap(
        lambda v: jax.jvp(lambda r: phi_fn(t, r), (rho,), (v,))[1]
    )(jnp.eye(n, dtype=rho.dtype))

    ptilde = rho_t - phi + s1
    ptilde_t = -phi_t + s1_t
    z = ptilde / rho_t

    a_rt = phi / rho_t
    s_r = -(a_rt + t * phi_t / rho_t)
    u_rt = -t * phi_t / rho_t
    h_rt = u_rt + z - 1.0
    g_rt = a_rt + z - 1.0
    cv_r = -t * (2.0 * phi_t + t * phi_tt) / rho_t
    cp_r = cv_r + (ptilde + t * ptilde_t) ** 2 / (rho_t * (rho_t + s2)) - 1.0

    rt = RGAS * t
    return ResidualProperties(
        pressure=ptilde * t * REDUCED_TO_PA_PER_KT,
        compressibility=z,
        a_res=rt * a_rt,
        s_res=RGAS * s_r,
        u_res=rt * u_rt,
        h_res=rt * h_rt,
        g_res=rt * g_rt,
        c_v_res=RGAS * cv_r,
        c_p_res=RGAS * cp_r,
        ln_phi=mu - jnp.log(z),
    )


# ---------------------------------------------------------------------------
# Batched wrappers (one shared trace per shape/branch set, like the models)
# ---------------------------------------------------------------------------


def _pure_impl(p, temperature, density):
    def per_item(pi, t, r):
        out = _props_item(lambda tt, rv: phi_pure(pi, tt, rv[0]), t, r)
        return out._replace(ln_phi=out.ln_phi[0])

    return jax.vmap(per_item)(p, temperature, density[:, None])


_pure_jit = jax.jit(_pure_impl)


def pure_properties(parameters, temperature, density):
    """Batched pure-component residual properties at (T, rho).

    ``parameters`` is the (B, 8) PC-SAFT layout, ``density`` the reduced
    number density (A^-3).  Fully differentiable w.r.t. all inputs.
    """
    return _pure_jit(
        PureParams.from_array(parameters),
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
    )


def _mix_impl(p, k, e, temperature, density, branches):
    def per_item(pi, ki, ei, t, r):
        return _props_item(
            lambda tt, rv: phi_mix(pi, ki, ei, tt, rv, branches=branches), t, r
        )

    return jax.vmap(per_item)(p, k, e, temperature, density)


_mix_jit = jax.jit(_mix_impl, static_argnames=("branches",))


def mix_properties(parameters, kij, temperature, density, branches=None):
    """Batched mixture residual properties at (T, rho_vec).

    ``parameters`` is (B, n, 8), ``kij`` the reference's (B, 2)
    [k_ij, eps_AiBj] packing (or None), ``density`` the (B, n) reduced
    partial densities.  ``ln_phi`` is (B, n).
    """
    p = MixParams.from_array(parameters)
    k, e = _split_kij(kij, jnp.shape(parameters)[0])
    br = branches if branches is not None else static_branches(parameters)
    return _mix_jit(
        p, k, e,
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
        branches=br,
    )


def _gc_impl(params, temperature, density, branches):
    def per_item(g, t, r):
        return _props_item(
            lambda tt, rv: phi_gc(g, tt, rv, branches=branches), t, r
        )

    return jax.vmap(per_item, in_axes=(_GC_BATCH_AXES, 0, 0))(
        params, temperature, density
    )


_gc_jit = jax.jit(_gc_impl, static_argnames=("branches",))


def gc_properties(params: GcParams, temperature, density, branches=None):
    """Batched gc-PC-SAFT residual properties at (T, rho_vec) over an
    assembled :class:`~feos_tpu.models.gc_pcsaft.GcParams` batch."""
    br = branches if branches is not None else static_branches_gc(params)
    return _gc_jit(
        params,
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
        branches=br,
    )
