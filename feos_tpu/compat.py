"""Reference-compatible facade (drop-in migration layer).

The reference exposes its native solver backend as static-method classes
with a *compaction* convention: converged rows only, plus a full-length
boolean failure mask (``PcSaft.vapor_pressure`` -> ``(densities[B_ok, 4],
nans[B])``, reference src/pcsaft.rs:17-80; re-exported at
feos_torch/__init__.py:1).  The TPU-native API instead returns fixed-shape
NaN-masked outputs (jit-compatible).  This module reproduces the
reference's exact host-side contract on top of the JAX solvers so existing
feos-torch code can migrate mechanically:

    from feos_tpu.compat import PcSaft
    densities, nans = PcSaft.vapor_pressure(params, temperature)

Outputs are numpy arrays computed on the default JAX device; shapes follow
the reference (compacted rows, 4 columns with the reduced vapor/liquid
densities in columns 0/1 for the pure solver).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models.pcsaft_mix import (
    MixParams, phi_mix_pre, precompute_mix, static_branches,
)
from .models.pcsaft_pure import PureParams
from .units import PA_PER_KT_TO_REDUCED


class PcSaft:
    """Static batched solvers with the reference's return conventions
    (reference src/pcsaft.rs:13-80)."""

    @staticmethod
    def vapor_pressure(parameters, temperature):
        """-> (densities[B_ok, 4] with [rho_V, rho_L, 0, 0] reduced, nans[B])."""
        from .solvers.vle import pure_vle

        p = PureParams.from_array(np.asarray(parameters, dtype=np.float64))
        t = jnp.asarray(temperature, dtype=jnp.float64)
        rv, rl, ok = jax.jit(jax.vmap(pure_vle))(p, t)
        ok = np.asarray(ok)
        out = np.zeros((int(ok.sum()), 4))
        out[:, 0] = np.asarray(rv)[ok]
        out[:, 1] = np.asarray(rl)[ok]
        return out, ~ok

    @staticmethod
    def liquid_density(parameters, temperature, pressure):
        """-> (densities[B_ok] reduced, nans[B]); pressure in Pa."""
        from .solvers.vle import npt_density

        p = PureParams.from_array(np.asarray(parameters, dtype=np.float64))
        t = jnp.asarray(temperature, dtype=jnp.float64)
        p_red = jnp.asarray(pressure, dtype=jnp.float64) / t * PA_PER_KT_TO_REDUCED
        rho, ok = jax.jit(
            jax.vmap(lambda pi, ti, pr: npt_density(pi, ti, pr, liquid=True))
        )(p, t, p_red)
        ok = np.asarray(ok)
        return np.asarray(rho)[ok], ~ok

    @staticmethod
    def bubble_point(parameters, kij, temperature, liquid_molefracs, pressure):
        """-> (densities[B_ok, 4] = [rho_V_1, rho_V_2, rho_L_1, rho_L_2], nans[B])
        (packing as reference src/pcsaft.rs:216-231)."""
        return _binary_vle(
            parameters, kij, temperature, liquid_molefracs, pressure, bubble=True
        )

    @staticmethod
    def dew_point(parameters, kij, temperature, vapor_molefracs, pressure):
        """Mirror of ``bubble_point`` for a known vapor composition."""
        return _binary_vle(
            parameters, kij, temperature, vapor_molefracs, pressure, bubble=False
        )


def _binary_vle(parameters, kij, temperature, molefracs, pressure, bubble):
    from .solvers.vle import mix_vle

    parameters = np.asarray(parameters, dtype=np.float64)
    kij = (
        np.zeros((parameters.shape[0], 2))
        if kij is None
        else np.asarray(kij, dtype=np.float64)
    )
    p = MixParams.from_array(parameters)
    t = jnp.asarray(temperature, dtype=jnp.float64)
    x = jnp.asarray(molefracs, dtype=jnp.float64)
    p_red = jnp.asarray(pressure, dtype=jnp.float64) / t * PA_PER_KT_TO_REDUCED

    br = static_branches(parameters)

    def item(pi, ki, ei, ti, xi, pr):
        z = jnp.stack([xi, 1.0 - xi])
        pre = precompute_mix(pi, ki, ei, ti)
        f32 = jnp.float32
        pi32 = MixParams(*(v.astype(f32) for v in pi))
        pre32 = precompute_mix(
            pi32, ki.astype(f32), ei.astype(f32), ti.astype(f32)
        )
        return mix_vle(
            lambda r: phi_mix_pre(pre, r, assoc_q_form=True, branches=br),
            z, pr, pre.md3,
            incipient_is_vapor=bubble,
            phi_fn32=lambda r: phi_mix_pre(pre32, r, branches=br),
        )

    rho_inc, rho_bulk, ok, _ = jax.jit(jax.vmap(item))(
        p, jnp.asarray(kij[:, 0]), jnp.asarray(kij[:, 1]), t, x, p_red
    )
    return _pack_binary(rho_inc, rho_bulk, ok, bubble)


def _pack_binary(rho_inc, rho_bulk, ok, bubble):
    """Compact converged rows into the reference's (B_ok, 4) layout
    [rho_V_1, rho_V_2, rho_L_1, rho_L_2] (reference src/pcsaft.rs:216-231)."""
    ok = np.asarray(ok)
    rho_inc = np.asarray(rho_inc)[ok]
    rho_bulk = np.asarray(rho_bulk)[ok]
    out = np.zeros((rho_inc.shape[0], 4))
    if bubble:  # incipient phase is the vapor
        out[:, 0:2] = rho_inc
        out[:, 2:4] = rho_bulk
    else:
        out[:, 0:2] = rho_bulk
        out[:, 2:4] = rho_inc
    return out, ~ok


class GcPcSaft:
    """Stateful gc solver facade with the reference's constructor and
    return conventions (reference src/gc_pcsaft.rs:15-171; re-exported at
    feos_torch/__init__.py:1).

    ``segment_records`` is a list of ``(name, array8)`` tuples with the
    8-vector ``[m, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb]``
    (reference src/gc_pcsaft.rs:26-49); ``segments``/``bonds`` are per-item
    pairs of segment-name lists / bond index-pair lists, ``phi`` the (B, 2)
    dispersion correction matrix.
    """

    def __init__(self, segment_records, segments, bonds, binary_segment_records, phi):
        from .models.gc_pcsaft import assemble

        names = [name for name, _ in segment_records]
        cols = np.stack([np.asarray(rec, dtype=np.float64) for _, rec in segment_records])
        parameter = tuple(cols[:, i] for i in range(8))
        self.params = assemble(
            names, parameter, segments, bonds, binary_segment_records, phi
        )

    def _solve(self, temperature, molefracs, pressure, bubble):
        from .models.gc_pcsaft import (
            _GC_BATCH_AXES, cast_float_fields, phi_gc_pre, precompute_gc,
            static_branches_gc,
        )
        from .solvers.vle import mix_vle

        t = jnp.asarray(temperature, dtype=jnp.float64)
        x = jnp.asarray(molefracs, dtype=jnp.float64)
        p_red = jnp.asarray(pressure, dtype=jnp.float64) / t * PA_PER_KT_TO_REDUCED

        br = static_branches_gc(self.params)

        def item(g, ti, xi, pr):
            z = jnp.stack([xi, 1.0 - xi])
            pre = precompute_gc(g, ti)
            f32 = jnp.float32
            g32 = cast_float_fields(g, f32)
            pre32 = precompute_gc(g32, ti.astype(f32))
            return mix_vle(
                lambda r: phi_gc_pre(pre, r, assoc_q_form=True, branches=br),
                z, pr, pre.md3,
                incipient_is_vapor=bubble,
                phi_fn32=lambda r: phi_gc_pre(pre32, r, branches=br),
            )

        rho_inc, rho_bulk, ok, _ = jax.jit(
            jax.vmap(item, in_axes=(_GC_BATCH_AXES, 0, 0, 0))
        )(self.params, t, x, p_red)
        return _pack_binary(rho_inc, rho_bulk, ok, bubble)

    def bubble_point(self, temperature, liquid_molefracs, pressure):
        """-> (densities[B_ok, 4] = [rho_V_1, rho_V_2, rho_L_1, rho_L_2], nans[B])."""
        return self._solve(temperature, liquid_molefracs, pressure, bubble=True)

    def dew_point(self, temperature, vapor_molefracs, pressure):
        """Mirror of ``bubble_point`` for a known vapor composition."""
        return self._solve(temperature, vapor_molefracs, pressure, bubble=False)
