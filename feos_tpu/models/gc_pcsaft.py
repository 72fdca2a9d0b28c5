"""Heterosegmented gc-PC-SAFT: parameter assembly, Helmholtz energy, bubble/dew.

TPU-native re-design of the reference's group-contribution model
(``feos_torch/gc_pcsaft.py``).  The molecule-topology assembly (segment
count matrices, symmetrized bond-count matrices, dipole/association mixing
rules) happens once in host numpy at construction — exactly the reference's
Counter-based logic (feos_torch/gc_pcsaft.py:26-86) — producing fixed-shape
arrays that the jitted per-item Helmholtz function consumes.  The
reference's 4-level Python dispersion loop over components x segments
(feos_torch/gc_pcsaft.py:177-194) becomes a broadcast contraction over an
(n, n, S, S) tensor; the hard-chain bonded-pair loop
(feos_torch/gc_pcsaft.py:156-165) a masked (S, S) matrix sum.

The bubble/dew solvers and derivative machinery are shared with the
homosegmented model (one generic implementation over the phi closure —
feos_tpu.solvers.vle.mix_vle / feos_tpu.ops.derivatives.pressure_set),
replacing the stateful native backend (reference src/gc_pcsaft.rs:15-171).
"""

from __future__ import annotations

from collections import Counter
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import A0, A1, A2, B0, B1, B2
from ..ops.association import solve_cross_assoc_sym, solve_induced_assoc
from ..ops.derivatives import pressure_set
from ..units import MU2_FACTOR, PA_PER_KT_TO_REDUCED, REDUCED_TO_PA_PER_KT
from .common import (
    DipolePre,
    phi_dipole_pre,
    precompute_dipole,
    site_fraction_free_energy,
)

PI = np.pi


class GcParams(NamedTuple):
    """Assembled gc parameters.

    Batched fields (leading batch axis under ``vmap``): ``m`` (n, S) segment
    counts times segment m; ``bonds_p`` (n, P) bond counts gathered onto the
    static set of bonded segment pairs; ``e1b``/``e2b`` (n, n) precomputed
    T-independent dispersion bases (see :func:`assemble`); ``phi_corr``
    (n,); dipole mixing ``m_mix``/``sigma_mix``/``epsilon_k_mix``/``mu2``
    (n,); association aggregates ``sigma_assoc``/``epsilon_k_assoc``/
    ``kappa_ab``/``epsilon_k_ab``/``na``/``nb`` (n,).

    Segment-level fields (shared across the batch, vmapped with
    ``in_axes=None``): ``sigma``/``epsilon_k`` (S,), ``kab`` (S, S), and
    the static int32 bonded-pair indices ``bond_a``/``bond_b`` (P,).
    """

    m: jnp.ndarray
    bonds_p: jnp.ndarray
    e1b: jnp.ndarray
    e2b: jnp.ndarray
    phi_corr: jnp.ndarray
    m_mix: jnp.ndarray
    sigma_mix: jnp.ndarray
    epsilon_k_mix: jnp.ndarray
    mu2: jnp.ndarray
    sigma_assoc: jnp.ndarray
    epsilon_k_assoc: jnp.ndarray
    kappa_ab: jnp.ndarray
    epsilon_k_ab: jnp.ndarray
    na: jnp.ndarray
    nb: jnp.ndarray
    sigma: jnp.ndarray
    epsilon_k: jnp.ndarray
    kab: jnp.ndarray
    bond_a: jnp.ndarray
    bond_b: jnp.ndarray


_GC_BATCH_AXES = GcParams(
    m=0, bonds_p=0, e1b=0, e2b=0, phi_corr=0, m_mix=0, sigma_mix=0,
    epsilon_k_mix=0, mu2=0, sigma_assoc=0, epsilon_k_assoc=0, kappa_ab=0,
    epsilon_k_ab=0, na=0, nb=0,
    sigma=None, epsilon_k=None, kab=None, bond_a=None, bond_b=None,
)


def cast_float_fields(g: GcParams, dtype):
    """Cast the floating-point fields of ``GcParams`` (the static int32
    bond-pair indices must survive the solvers' f32 warmup cast)."""
    return jax.tree_util.tree_map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(jnp.result_type(v), jnp.floating) else v,
        g,
    )


def assemble(
    segment_identifier,
    parameter,
    segment_lists,
    bond_lists,
    binary_segment_records,
    phi=None,
):
    """Build ``GcParams`` from molecule topologies (reference
    feos_torch/gc_pcsaft.py:13-114).

    ``parameter`` is the 8-tuple of segment-level arrays
    (m, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb).
    """
    m_seg, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb = [
        jnp.asarray(x, dtype=jnp.float64) for x in parameter
    ]
    S = len(segment_identifier)
    seg_idx = {s: i for i, s in enumerate(segment_identifier)}

    # static topology matrices (host numpy, never traced)
    counts = np.array(
        [
            [[Counter(comp)[s] for s in segment_identifier] for comp in item]
            for item in segment_lists
        ],
        dtype=np.float64,
    )  # (B, n, S)

    bonds = np.zeros(counts.shape + (S,), dtype=np.float64)  # (B, n, S, S)
    for b, (segs, bnds) in enumerate(zip(segment_lists, bond_lists)):
        for c, (comp_segs, comp_bonds) in enumerate(zip(segs, bnds)):
            for i, j in comp_bonds:
                hi, lo = sorted((seg_idx[comp_segs[i]], seg_idx[comp_segs[j]]))[::-1]
                bonds[b, c, hi, lo] += 1.0

    # Gather the bond-count tensor onto the STATIC set of segment pairs
    # bonded anywhere in the batch: the hard-chain term then evaluates
    # ln g(d_a, d_b) on P ~ O(bonds) pairs per Newton iteration instead of
    # the full (S, S) = 23^2 matrix of the sauer2014 table.  Topology is
    # always concrete (host lists), so the pair set is trace-time static.
    pair_mask = bonds.any(axis=(0, 1))
    bond_a, bond_b = np.nonzero(pair_mask)
    if bond_a.size == 0:  # no bonds anywhere (all single-segment molecules)
        bond_a, bond_b = np.array([0]), np.array([0])
    bonds_p = jnp.asarray(bonds[:, :, bond_a, bond_b])  # (B, n, P)
    bond_a = jnp.asarray(bond_a, dtype=jnp.int32)
    bond_b = jnp.asarray(bond_b, dtype=jnp.int32)

    # parameter-derived quantities in jnp so they stay differentiable
    # (e.g. gradients w.r.t. the binary segment parameters kab)
    counts = jnp.asarray(counts)
    m = counts * m_seg  # (B, n, S)
    m_mix = m.sum(axis=2)
    sigma_mix = ((m * sigma**3).sum(axis=2) / m_mix) ** (1.0 / 3.0)
    epsilon_k_mix = (m * epsilon_k).sum(axis=2) / m_mix
    mu2 = (counts * mu**2).sum(axis=2) / m_mix * MU2_FACTOR

    is_assoc = counts * jnp.sign(kappa_ab * epsilon_k_ab)
    try:
        if np.any(np.asarray(is_assoc).sum(axis=2) > 1):
            raise ValueError(
                "Only up to one associating segment per component is allowed!"
            )
    except jax.errors.TracerArrayConversionError:
        pass  # under tracing the static validation is skipped
    sigma_assoc = (is_assoc * sigma).sum(axis=2)
    epsilon_k_assoc = (is_assoc * epsilon_k).sum(axis=2)
    kappa_ab_c = (counts * kappa_ab).sum(axis=2)
    epsilon_k_ab_c = (counts * epsilon_k_ab).sum(axis=2)
    na_c = (counts * na).sum(axis=2)
    nb_c = (counts * nb).sum(axis=2)

    B, n = m_mix.shape
    phi_corr = (
        jnp.ones((B, n)) if phi is None else jnp.asarray(phi, dtype=jnp.float64)
    )

    kab_arr = jnp.zeros((S, S), dtype=jnp.float64)
    for s1, s2, k in binary_segment_records:
        i, j = seg_idx[s1], seg_idx[s2]
        kab_arr = kab_arr.at[i, j].set(k)
        kab_arr = kab_arr.at[j, i].set(k)

    # Precompute the dispersion bases: in the reference's 4-level loop
    # (feos_torch/gc_pcsaft.py:177-194) the (S, S) segment contraction is
    # density-independent — temperature enters as 1/T (rho1mix) and 1/T^2
    # (rho2mix) scalars.  Collapsing it here turns the per-Newton-iteration
    # dispersion cost from O(n^2 S^2) tensor work into an O(n^2) contraction
    # with rho_i rho_j (the ~5.5x gc-vs-homosegmented throughput gap of
    # round 2).  All factors are jnp, so kab/phi/segment-parameter gradients
    # flow through the bases.
    se = jnp.sqrt(epsilon_k[:, None] * epsilon_k[None, :])  # (S, S)
    sigma_ab3 = (0.5 * (sigma[:, None] + sigma[None, :])) ** 3
    kfac = 1.0 - kab_arr
    # D0/Dk: sum_ab m_ia m_jb sqrt(eps_a eps_b) sigma_ab^3 {1, (1-kab)}
    D0 = jnp.einsum("bia,ac,bjc->bij", m, se * sigma_ab3, m)
    Dk = jnp.einsum("bia,ac,bjc->bij", m, se * kfac * sigma_ab3, m)
    # E0/Ek: same with eps_a eps_b {1, (1-kab)^2} for the squared term
    E0 = jnp.einsum("bia,ac,bjc->bij", m, se * se * sigma_ab3, m)
    Ek = jnp.einsum("bia,ac,bjc->bij", m, se * se * kfac * kfac * sigma_ab3, m)
    sqphi = jnp.sqrt(phi_corr[:, :, None] * phi_corr[:, None, :])  # (B, n, n)
    n_comp = m_mix.shape[1]
    offdiag = 1.0 - jnp.eye(n_comp, dtype=jnp.float64)
    e1b = sqphi * jnp.where(offdiag[None], Dk, D0)
    e2b = sqphi * sqphi * jnp.where(offdiag[None], Ek, E0)

    return GcParams(
        m=m,
        bonds_p=bonds_p,
        e1b=e1b,
        e2b=e2b,
        phi_corr=phi_corr,
        m_mix=m_mix,
        sigma_mix=sigma_mix,
        epsilon_k_mix=epsilon_k_mix,
        mu2=mu2,
        sigma_assoc=sigma_assoc,
        epsilon_k_assoc=epsilon_k_assoc,
        kappa_ab=kappa_ab_c,
        epsilon_k_ab=epsilon_k_ab_c,
        na=na_c,
        nb=nb_c,
        sigma=sigma,
        epsilon_k=epsilon_k,
        kab=kab_arr,
        bond_a=bond_a,
        bond_b=bond_b,
    )


class GcPre(NamedTuple):
    """Density-independent gc quantities at fixed (assembled params, T).

    Collapses the per-call (n, S) segment work of :func:`phi_gc` — the
    (S,) T-dependent diameters, the m @ d^k matvecs, the bonded-pair
    diameter factors — and the dipole/association T-factors to a one-time
    precompute per solve (see pcsaft_mix.MixPre for the rationale)."""

    md0: jnp.ndarray      # (n,) total segment number
    md1: jnp.ndarray      # (n,) m @ d
    md2: jnp.ndarray      # (n,) m @ d^2
    md3: jnp.ndarray      # (n,) m @ d^3
    bonds_p: jnp.ndarray  # (n, P)
    dd_p: jnp.ndarray     # (P,) d_a d_b / (d_a + d_b) on bonded pairs
    e1t: jnp.ndarray      # (n, n) dispersion base / T
    e2t: jnp.ndarray      # (n, n) squared base / T^2
    dip: DipolePre
    dipolar: jnp.ndarray
    na: jnp.ndarray       # (n,)
    nb: jnp.ndarray       # (n,)
    is_assoc: jnp.ndarray  # (n,) sign(kappa_ab * epsilon_k_ab)
    self_st: jnp.ndarray  # sigma_s^3 kappa (exp(eps_ab/T)-1), sanitized
    self_d: jnp.ndarray   # associating-segment diameter, sanitized
    cross_t: jnp.ndarray  # (n, n) pairwise T-factors (cross regime)
    dd_cross: jnp.ndarray  # (n, n) d_i d_j/(d_i+d_j) (cross sanitization)
    ind_t: jnp.ndarray    # (n, n) pairwise T-factors (induced regime)
    dd_ind: jnp.ndarray   # (n, n) (induced sanitization)
    self_m: jnp.ndarray   # bool regime masks (parameter-only)
    cross_m: jnp.ndarray
    induced_m: jnp.ndarray


def _gc_assoc_tfactors(g: GcParams, temperature, mask):
    """Pairwise association T-factors and diameter factors with the gc
    sanitization (reference feos_torch/gc_pcsaft.py:549-564): the segment
    diameter is recomputed from the associating segment's own
    sigma/epsilon_k."""
    sigma = jnp.where(mask, g.sigma_assoc, 1.0)
    kappa = jnp.where(mask, g.kappa_ab, 1.0)
    d = sigma * (1.0 - 0.12 * jnp.exp(-3.0 * g.epsilon_k_assoc / temperature))
    sigma3_kappa = (sigma[:, None] * sigma[None, :]) ** 1.5 * jnp.sqrt(
        kappa[:, None] * kappa[None, :]
    )
    eps = 0.5 * (g.epsilon_k_ab[:, None] + g.epsilon_k_ab[None, :])
    tfac = sigma3_kappa * (jnp.exp(eps / temperature) - 1.0)
    dd = d[:, None] * d[None, :] / (d[:, None] + d[None, :])
    return tfac, dd


def precompute_gc(g: GcParams, temperature) -> GcPre:
    """Build :class:`GcPre` (per item); plain jnp throughout so segment-
    parameter/kab/phi/temperature gradients flow through unchanged."""
    d = g.sigma * (1.0 - 0.12 * jnp.exp(-3.0 * g.epsilon_k / temperature))  # (S,)

    md0 = jnp.sum(g.m, axis=1)  # (n,)
    md1 = g.m @ d
    md2 = g.m @ (d * d)
    md3 = g.m @ (d * d * d)

    da, db = d[g.bond_a], d[g.bond_b]  # (P,)
    dd_p = da * db / (da + db)

    e1t = g.e1b / temperature
    e2t = g.e2b / (temperature * temperature)

    dip = precompute_dipole(
        g.m_mix, g.sigma_mix, g.epsilon_k_mix, g.mu2, temperature
    )
    dipolar = jnp.any(g.mu2 > 0.0)

    # association regime masks (parameter-only)
    n_assoc = jnp.count_nonzero(g.kappa_ab * g.epsilon_k_ab)
    n_self = jnp.count_nonzero(g.na * g.nb)
    self_m = (n_assoc == 1) & (n_self == 1)
    cross_m = (n_assoc == 2) & (n_self == 2)
    induced_m = (n_assoc == 2) & (n_self == 1)

    is_assoc = jnp.sign(g.kappa_ab * g.epsilon_k_ab)
    sigma_s = jnp.where(self_m, jnp.sum(g.sigma_assoc), 1.0)
    epsk_s = jnp.sum(g.epsilon_k_assoc)
    kappa_s = jnp.where(self_m, jnp.sum(g.kappa_ab), 1.0)
    eps_ab_s = jnp.sum(g.epsilon_k_ab)
    # one size-2 exp for the two scalar Boltzmann factors (see
    # models.common.exp_full for the TPU scalar-exp precision pitfall)
    eb_s = jnp.exp(jnp.stack(
        [-3.0 * epsk_s / temperature, eps_ab_s / temperature]
    ))
    self_d = sigma_s * (1.0 - 0.12 * eb_s[0])
    self_st = sigma_s**3 * kappa_s * (eb_s[1] - 1.0)

    cross_t, dd_cross = _gc_assoc_tfactors(g, temperature, cross_m)
    ind_t, dd_ind = _gc_assoc_tfactors(g, temperature, induced_m)

    return GcPre(
        md0=md0, md1=md1, md2=md2, md3=md3,
        bonds_p=g.bonds_p, dd_p=dd_p, e1t=e1t, e2t=e2t,
        dip=dip, dipolar=dipolar,
        na=g.na, nb=g.nb, is_assoc=is_assoc,
        self_st=self_st, self_d=self_d,
        cross_t=cross_t, dd_cross=dd_cross,
        ind_t=ind_t, dd_ind=dd_ind,
        self_m=self_m, cross_m=cross_m, induced_m=induced_m,
    )


def phi_gc_pre(pre: GcPre, density, assoc_q_form: bool = False,
               branches=None):
    """Reduced residual Helmholtz energy density from precomputed rho-free
    quantities (see :class:`GcPre`); the density-dependent half of
    :func:`phi_gc`."""
    rho = density
    n = pre.md0.shape[0]
    # universal constants cast to the working dtype (f32 solver warmup phase)
    dtype = jnp.result_type(rho)
    cA0, cA1, cA2 = (jnp.asarray(c, dtype=dtype) for c in (A0, A1, A2))
    cB0, cB1, cB2 = (jnp.asarray(c, dtype=dtype) for c in (B0, B1, B2))

    md0 = pre.md0
    zeta0 = PI / 6.0 * jnp.sum(md0 * rho)
    zeta1 = PI / 6.0 * jnp.sum(pre.md1 * rho)
    zeta2 = PI / 6.0 * jnp.sum(pre.md2 * rho)
    zeta3 = PI / 6.0 * jnp.sum(pre.md3 * rho)

    zeta23 = zeta2 / zeta3
    zeta3_2 = zeta3 * zeta3
    zeta3_3 = zeta3_2 * zeta3
    zeta3_m1 = 1.0 / (1.0 - zeta3)
    zeta3_m2 = zeta3_m1 * zeta3_m1
    etas = jnp.stack([jnp.ones_like(zeta3), zeta3, zeta3_2, zeta3_3,
                      zeta3_2 * zeta3_2, zeta3_2 * zeta3_3, zeta3_3 * zeta3_3])

    # hard sphere
    hs = (6.0 / PI) * (
        zeta1 * zeta2 * zeta3_m1 * 3.0
        + zeta2 * zeta2 * zeta3_m2 * zeta23
        + (zeta2 * zeta23 * zeta23 - zeta0) * jnp.log(1.0 - zeta3)
    )

    # hard chain over the static set of bonded segment pairs (reference
    # feos_torch/gc_pcsaft.py:156-165): ln g is needed only where a bond
    # exists, so evaluate it on the P gathered pairs instead of (S, S)
    c = zeta2 * zeta3_m2
    cdab = c * pre.dd_p
    g_ab = zeta3_m1 + cdab * 3.0 - cdab * cdab * (zeta3 - 1.0) * 2.0
    ln_g = jnp.log(g_ab)
    hc = -jnp.sum(rho[:, None] * pre.bonds_p * ln_g[None, :])

    # dispersion over component pairs: the (S, S) segment contraction with
    # phi correction and kab is precomputed at assembly (e1b/e2b, see
    # :func:`assemble`); 1/T and 1/T^2 folded in per solve (e1t/e2t)
    x = rho / jnp.sum(rho)
    mmean = jnp.sum(x * md0)
    rho_ij = rho[:, None] * rho[None, :]  # (n, n)
    rho1mix = jnp.sum(rho_ij * pre.e1t)
    rho2mix = jnp.sum(rho_ij * pre.e2t)

    m1 = (mmean - 1.0) / mmean
    m2 = m1 * (mmean - 2.0) / mmean
    I1 = jnp.dot(m2 * cA2 + m1 * cA1 + cA0, etas)
    I2 = jnp.dot(m2 * cB2 + m1 * cB1 + cB0, etas)
    C1 = 1.0 / (
        1.0
        + mmean * (8.0 * zeta3 - 2.0 * zeta3_2) * zeta3_m2 * zeta3_m2
        + (1.0 - mmean)
        * (20.0 * zeta3 - 27.0 * zeta3_2 + 12.0 * zeta3_2 * zeta3 - 2.0 * zeta3_2 * zeta3_2)
        / ((1.0 - zeta3) * (1.0 - zeta3) * (2.0 - zeta3) * (2.0 - zeta3))
    )
    disp = (-rho1mix * 2.0 * I1 - rho2mix * C1 * I2 * mmean) * PI

    phi = hs + hc + disp

    # trace-time branch specialization (see pcsaft_mix.phi_mix /
    # static_branches_gc): dead regime subgraphs are removed statically
    # when the assembled parameter batch is concrete
    if branches is None:
        branches = _ALL_BRANCHES

    if "dipole" in branches:
        # dipole on component-level mixed parameters
        dip = phi_dipole_pre(pre.dip, n, rho, etas)
        phi = phi + jnp.where(pre.dipolar, dip, 0.0)

    # association regimes (reference feos_torch/gc_pcsaft.py:220-251)
    if "self" in branches:
        phi = phi + jnp.where(
            pre.self_m,
            _phi_self_assoc(pre, rho, zeta2, zeta3_m1, assoc_q_form),
            0.0,
        )
    if "cross" in branches:
        phi = phi + jnp.where(
            pre.cross_m,
            _phi_cross_assoc(pre, rho, zeta2, zeta3_m1, assoc_q_form),
            0.0,
        )
    if "induced" in branches:
        phi = phi + jnp.where(
            pre.induced_m,
            _phi_induced_assoc(pre, rho, zeta2, zeta3_m1, assoc_q_form),
            0.0,
        )
    return phi


def phi_gc(g: GcParams, temperature, density, assoc_q_form: bool = False,
           branches=None):
    """Reduced residual Helmholtz energy density of a gc mixture (per item).

    Semantics match reference feos_torch/gc_pcsaft.py:116-253
    (golden-value tested over 11 molecule topologies).

    ``assoc_q_form`` evaluates association as the Michelsen Q function at
    stop-gradiented site fractions — exact values and first derivatives
    with no implicit-function expansion under AD; used by the VLE solvers
    (see pcsaft_mix.phi_mix for the full rationale).

    Thin wrapper over :func:`precompute_gc` + :func:`phi_gc_pre`; hot loops
    that evaluate many density states at one (parameters, T) call the split
    form so the rho-free half is computed once per solve.
    """
    pre = precompute_gc(g, temperature)
    return phi_gc_pre(pre, density, assoc_q_form=assoc_q_form,
                      branches=branches)


_ALL_BRANCHES = frozenset({"dipole", "self", "cross", "induced"})


def static_branches_gc(g: GcParams):
    """Reachable phi branches for a CONCRETE assembled batch, or ``None``
    (see pcsaft_mix.static_branches)."""
    try:
        mu2 = np.asarray(g.mu2)
        ka = np.asarray(g.kappa_ab) * np.asarray(g.epsilon_k_ab)
        ns = np.asarray(g.na) * np.asarray(g.nb)
    except (jax.errors.TracerArrayConversionError, TypeError):
        return None
    out = set()
    if np.any(mu2 > 0.0):
        out.add("dipole")
    n_assoc = np.count_nonzero(ka, axis=-1)
    n_self = np.count_nonzero(ns, axis=-1)
    if np.any((n_assoc == 1) & (n_self == 1)):
        out.add("self")
    if np.any((n_assoc == 2) & (n_self == 2)):
        out.add("cross")
    if np.any((n_assoc == 2) & (n_self == 1)):
        out.add("induced")
    return frozenset(out)


def _phi_self_assoc(pre: GcPre, rho, zeta2, zeta3_m1, q_form=False):
    """Single self-associating segment, closed form for nA = nB = 1
    (reference feos_torch/gc_pcsaft.py:309-330); the sanitized
    sigma_s^3 kappa (exp(eps_ab/T)-1) factor and associating diameter are
    precomputed (``pre.self_st`` / ``pre.self_d``)."""
    rho_a = jnp.sum(pre.is_assoc * rho)

    k = pre.self_d * 0.5 * zeta2 * zeta3_m1
    delta = zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * pre.self_st
    deltarho = delta * rho_a
    xa = 2.0 / (jnp.sqrt(1.0 + 4.0 * deltarho) + 1.0)
    if q_form:
        xa = jax.lax.stop_gradient(xa)
        # Q form: two sites (A, B) per molecule share the fraction xa
        return 2.0 * rho_a * (jnp.log(xa) - xa + 1.0) - rho_a * rho_a * xa * xa * delta
    return rho_a * (2.0 * jnp.log(xa) - xa + 1.0)


def _phi_cross_assoc(pre: GcPre, rho, zeta2, zeta3_m1, q_form=False):
    """Two self-associating segments, nA = nB = 1 fixed point
    (reference feos_torch/gc_pcsaft.py:333-380); pairwise T-factors
    precomputed in ``pre.cross_t``."""
    mask = pre.cross_m

    def delta_rho(i, j):
        k = pre.dd_cross[i, j] * zeta2 * zeta3_m1
        dd = zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * pre.cross_t[i, j]
        return jnp.where(mask, dd * rho[j], 0.0)

    d00, d01 = delta_rho(0, 0), delta_rho(0, 1)
    d10, d11 = delta_rho(1, 0), delta_rho(1, 1)
    if q_form:
        stop = jax.lax.stop_gradient
        xa0, xa1 = (
            stop(x)
            for x in solve_cross_assoc_sym(stop(d00), stop(d01), stop(d10), stop(d11))
        )
        f1 = lambda x: jnp.log(x) - x + 1.0
        # dij = Delta_ij * rho_j, so rho_i rho_j Delta_ij x_i x_j = rho_i x_i x_j d_ij
        bil = rho[0] * xa0 * (xa0 * d00 + xa1 * d01) + rho[1] * xa1 * (
            xa0 * d10 + xa1 * d11
        )
        return 2.0 * (rho[0] * f1(xa0) + rho[1] * f1(xa1)) - bil
    xa0, xa1 = solve_cross_assoc_sym(d00, d01, d10, d11)
    f = lambda x: 2.0 * jnp.log(x) - x + 1.0
    return rho[0] * f(xa0) + rho[1] * f(xa1)


def _phi_induced_assoc(pre: GcPre, rho, zeta2, zeta3_m1, q_form=False):
    """One self-associating + one induced (nA = 0) segment
    (reference feos_torch/gc_pcsaft.py:383-441); pairwise T-factors
    precomputed in ``pre.ind_t``."""
    mask = pre.induced_m

    def delta_rho(i, j):
        k = pre.dd_ind[i, j] * zeta2 * zeta3_m1
        dd = zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * pre.ind_t[i, j]
        return jnp.where(mask, dd * rho[j], 0.0)

    d00, d01 = delta_rho(0, 0), delta_rho(0, 1)
    d10, d11 = delta_rho(1, 0), delta_rho(1, 1)
    na0, na1 = pre.na[0], pre.na[1]
    nb0, nb1 = pre.nb[0], pre.nb[1]
    if q_form:
        stop = jax.lax.stop_gradient
        args = tuple(stop(v) for v in (d00, d01, d10, d11, na0, na1, nb0, nb1))
        xa = stop(solve_induced_assoc(*args))
        xb0 = stop(1.0 / (1.0 + xa * (args[4] * args[0] + args[5] * args[1])))
        xb1 = stop(1.0 / (1.0 + xa * (args[4] * args[2] + args[5] * args[3])))
        f1 = lambda x: jnp.log(x) - x + 1.0
        rho_a = na0 * rho[0] + na1 * rho[1]
        bil = xa * (
            na0 * rho[0] * (nb0 * xb0 * d00 + nb1 * xb1 * d01)
            + na1 * rho[1] * (nb0 * xb0 * d10 + nb1 * xb1 * d11)
        )
        return (
            rho_a * f1(xa)
            + rho[0] * nb0 * f1(xb0)
            + rho[1] * nb1 * f1(xb1)
            - bil
        )
    xa = solve_induced_assoc(d00, d01, d10, d11, na0, na1, nb0, nb1)
    xb0 = 1.0 / (1.0 + xa * (na0 * d00 + na1 * d01))
    xb1 = 1.0 / (1.0 + xa * (na0 * d10 + na1 * d11))
    f = site_fraction_free_energy
    return rho[0] * (f(xa) * na0 + f(xb0) * nb0) + rho[1] * (
        f(xa) * na1 + f(xb1) * nb1
    )


# ---------------------------------------------------------------------------
# Batched API
# ---------------------------------------------------------------------------


def _vmap_gc(fn):
    return jax.vmap(fn, in_axes=(_GC_BATCH_AXES, 0, 0))


def gc_helmholtz_energy_density(params: GcParams, temperature, density,
                                branches=None):
    """Batched phi over assembled gc parameters (module-level so every
    facade instance shares one trace per shape/branch set)."""
    return _gc_phi_jit(
        params,
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
        branches=branches,
    )


def _gc_phi_impl(params, temperature, density, branches):
    return _vmap_gc(lambda g, t, r: phi_gc(g, t, r, branches=branches))(
        params, temperature, density
    )


_gc_phi_jit = jax.jit(_gc_phi_impl, static_argnames=("branches",))


def gc_derivatives(params: GcParams, temperature, density, branches=None):
    """Batched (A, p~, mu_i, v_i) over assembled gc parameters."""
    return _gc_derivatives_jit(
        params,
        jnp.asarray(temperature, dtype=jnp.float64),
        jnp.asarray(density, dtype=jnp.float64),
        branches=branches,
    )


def _gc_derivatives_impl(params, temperature, density, branches):
    def per_item(g, t, rho):
        pre = precompute_gc(g, t)
        return pressure_set(
            lambda r: phi_gc_pre(pre, r, branches=branches), rho
        )

    return _vmap_gc(per_item)(params, temperature, density)


_gc_derivatives_jit = jax.jit(_gc_derivatives_impl,
                              static_argnames=("branches",))


def gc_incipient_property(params: GcParams, temperature, molefracs, pressure,
                          bubble=True, branches=None, full_output=False,
                          state0=None, state_output=False):
    """Batched gc bubble/dew pressure with stationary re-attachment.

    Value from the solver's carried state, gradient from the stationary
    identity with f32 partial molar volumes — see
    pcsaft_mix._incipient_property for the full rationale.

    ``molefracs`` may be the reference's binary (B,) x1 convention or an
    explicit (B, n) composition matrix for n-component gc mixtures (beyond
    the reference's binary-only native solvers, matching the homosegmented
    model's n-component support).

    Module-level (params as a pytree argument, ``bubble``/``branches``
    static) so all facade instances share one trace per shape — the solver
    graphs cost tens of seconds to trace+lower, and bound-method jits
    cannot share caches.

    ``state0``/``state_output`` give continuation warm starts across
    repeated solves at slowly-moving parameters (see
    :func:`pcsaft_mix.bubble_point`).
    """
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    molefracs = jnp.asarray(molefracs, dtype=jnp.float64)
    pressure = jnp.asarray(pressure, dtype=jnp.float64)
    n = params.m_mix.shape[1]
    if molefracs.ndim == 1:
        if n != 2:
            raise ValueError(
                "scalar molefracs are the binary x1 convention; pass a "
                f"(B, {n}) composition matrix for {n}-component mixtures"
            )
        molefracs = jnp.stack([molefracs, 1.0 - molefracs], axis=-1)
    p_out, nans, y_inc, u_state = _gc_incipient_jit(
        params, temperature, molefracs, pressure, bubble=bubble,
        branches=branches, state0=state0)
    out = (p_out, nans)
    if full_output:
        out = out + (y_inc,)
    if state_output:
        out = out + (u_state,)
    return out


def _gc_incipient_impl(params, temperature, molefracs, pressure, bubble,
                       branches, state0=None):
    from ..solvers.vle import (
        _states_eos, mix_vle, solve_with_identity_gradients,
    )

    p_red = pressure / temperature * PA_PER_KT_TO_REDUCED
    f32 = jnp.float32
    br = branches

    def solve_item(g, t, z, pr, s0=None):
        # rho-free precompute hoisted out of every phi instantiation in the
        # solver loops (one per solve instead of one per Newton iteration)
        pre = precompute_gc(g, t)
        g32 = cast_float_fields(g, f32)
        pre32 = precompute_gc(g32, t.astype(f32))
        # Q-form association only in the f64 residual graph; the f32
        # closure supplies Newton Jacobians and must stay the exact
        # phi (see pcsaft_mix._incipient_property)
        return mix_vle(
            lambda r: phi_gc_pre(pre, r, assoc_q_form=True, branches=br),
            z, pr, pre.md3,
            incipient_is_vapor=bubble,
            phi_fn32=lambda r: phi_gc_pre(pre32, r, branches=br),
            u0_init=s0,
        )

    def solve_batch(diff_args):
        # molefracs/p_red/state0 ride in diff_args, not the closure: a
        # traced composition, temperature, or scan-carried state makes them
        # tracers, which must not be captured by the custom_jvp closure
        # (see pcsaft_mix)
        gd, td, zd, prd, s0d = diff_args
        if s0d is None:
            return jax.vmap(solve_item, in_axes=(_GC_BATCH_AXES, 0, 0, 0))(
                gd, td, zd, prd
            )
        return jax.vmap(solve_item, in_axes=(_GC_BATCH_AXES, 0, 0, 0, 0))(
            gd, td, zd, prd, s0d
        )

    def attach(g, t, r_inc, r_bulk):
        pre = precompute_gc(g, t)
        phi_fn = lambda r: phi_gc_pre(pre, r, branches=br)
        p_b, g_b = _states_eos(phi_fn, r_bulk[None, :])
        p_b = p_b[0]
        mu_b = jnp.log(r_bulk) + g_b[0]
        g32 = cast_float_fields(g, f32)
        pre32 = precompute_gc(g32, t.astype(f32))
        v_b = pressure_set(
            lambda r: phi_gc_pre(pre32, r, branches=br),
            r_bulk.astype(f32),
        )[3].astype(jnp.float64)
        rho_inc_t = jnp.sum(r_inc)
        w = r_inc / rho_inc_t
        a_inc = phi_fn(r_inc) / rho_inc_t
        v_bulk = jnp.sum(w * v_b)
        g_bulk = jnp.sum(w * (jnp.log(r_inc) - mu_b))
        return -(a_inc + p_b * v_bulk + g_bulk - 1.0) / (1.0 / rho_inc_t - v_bulk)

    def ident_batch(diff_args, rho_inc, rho_bulk):
        gd, td, _, _, _ = diff_args
        return jax.vmap(attach, in_axes=(_GC_BATCH_AXES, 0, 0, 0))(
            gd, td, rho_inc, rho_bulk
        )

    # value from the solver, derivatives from the stationary identity
    # (custom_jvp: identity traced only under AD; see solvers/vle.py)
    pt_eq, ok, rho_inc, rho_bulk = solve_with_identity_gradients(
        solve_batch, ident_batch,
        (params, temperature, molefracs, p_red, state0),
    )
    pressure_out = pt_eq * temperature * REDUCED_TO_PA_PER_KT
    # incipient-phase composition (zero-gradient; see pcsaft_mix)
    y_inc = rho_inc / jnp.sum(rho_inc, axis=1, keepdims=True)
    y_inc = jnp.where(ok[:, None], y_inc, jnp.nan)
    # converged log-state for warm-started continuation (see pcsaft_mix)
    u_state = jnp.concatenate(
        [jnp.log(rho_inc), jnp.log(jnp.sum(rho_bulk, axis=1))[:, None]],
        axis=1,
    )
    u_state = jnp.where(ok[:, None], u_state, jnp.nan)
    return jnp.where(ok, pressure_out, jnp.nan), ~ok, y_inc, u_state


_gc_incipient_jit = jax.jit(_gc_incipient_impl,
                            static_argnames=("bubble", "branches"))


def gc_incipient_temperature(params: GcParams, pressure, molefracs, t0,
                             bubble=True, branches=None, full_output=False):
    """Bubble/dew TEMPERATURE at given pressure for a gc mixture (beyond
    the reference surface; see pcsaft_mix._incipient_temperature and
    solvers/tsolve.py for the scheme).  Segment-parameter/kab/phi
    gradients re-attach through the implicit function theorem."""
    from ..solvers.tsolve import (
        reattach_temperature, saturation_temperature_loop,
    )

    sg = jax.lax.stop_gradient
    B = params.m_mix.shape[0]
    p_target = jnp.broadcast_to(
        jnp.asarray(pressure, dtype=jnp.float64), (B,)
    )
    t0 = sg(jnp.broadcast_to(jnp.asarray(t0, dtype=jnp.float64), (B,)))
    g_s = jax.tree_util.tree_map(sg, params)
    x_s = sg(jnp.asarray(molefracs, dtype=jnp.float64))
    p_s = sg(p_target)
    br = branches if branches is not None else static_branches_gc(params)

    _, nans0, u0 = gc_incipient_property(
        g_s, t0, x_s, p_s, bubble=bubble, branches=br, state_output=True,
    )

    def solve_warm(T, u):
        pw, nans, u2 = gc_incipient_property(
            g_s, T, x_s, p_s, bubble=bubble, branches=br,
            state0=u, state_output=True,
        )
        return jnp.log(pw), ~nans, u2  # pw is NaN on failed rows

    t_star, u_star, done = saturation_temperature_loop(
        solve_warm, t0, sg(jnp.log(p_target)), u0,
    )

    def solve_diff(T, u):
        pw, _ = gc_incipient_property(
            params, T, molefracs, p_s, bubble=bubble, branches=br, state0=u,
        )
        return pw

    t_out = reattach_temperature(solve_diff, t_star, u_star, p_target, done)
    if not full_output:
        return t_out, ~done
    _, _, y_inc = gc_incipient_property(
        g_s, sg(t_star), x_s, p_s, bubble=bubble, branches=br,
        state0=sg(u_star), full_output=True,
    )
    return t_out, ~done, jnp.where(done[:, None], y_inc, jnp.nan)


def _gc_flash_impl(params, temperature, z, p_red, lnK0, beta0, active,
                   branches):
    """Jitted gc flash core — see pcsaft_mix._mix_flash_impl."""
    from ..solvers.flash import flash_tp

    f32 = jnp.float32

    def item(g, t, zi, pri, lnK0i, b0i, act):
        pre = precompute_gc(g, t)
        g32 = cast_float_fields(g, f32)
        pre32 = precompute_gc(g32, t.astype(f32))
        phi = lambda r: phi_gc_pre(pre, r, assoc_q_form=True,
                                   branches=branches)
        phi32 = lambda r: phi_gc_pre(pre32, r, branches=branches)
        lnr0 = jnp.full((2,), jnp.nan, dtype=zi.dtype)
        return flash_tp(phi, zi, pri, pre.md3, lnK0i, b0i, lnr0,
                        phi_fn_jac=phi32, active=act)

    return jax.vmap(item, in_axes=(_GC_BATCH_AXES, 0, 0, 0, 0, 0, 0))(
        params, temperature, z, p_red, lnK0, beta0, active
    )


_gc_flash_jit = jax.jit(_gc_flash_impl, static_argnames=("branches",))


def gc_flash(params: GcParams, temperature, molefracs, pressure,
             branches=None, gradients=False):
    """Batched isothermal pT flash for a gc mixture — beyond the reference
    surface; same contract as :func:`pcsaft_mix.flash` (two-phase window
    from the gc bubble/dew solvers, K-factors interpolated between the
    edge solutions, successive substitution over the gc phi).  With
    ``gradients=True``, beta/x/y/rho derivatives w.r.t. the gc
    parameters, T, z and p are re-attached by the implicit-function
    theorem (see :func:`solvers.flash.flash_implicit_gradients`);
    otherwise all outputs are gradient-detached."""
    from ..solvers.flash import flash_window

    sg = jax.lax.stop_gradient
    g_s = jax.tree_util.tree_map(sg, params)
    temperature = jnp.asarray(temperature, dtype=jnp.float64)
    z = jnp.asarray(molefracs, dtype=jnp.float64)
    pressure = jnp.asarray(pressure, dtype=jnp.float64)
    n = params.m_mix.shape[1]
    if z.ndim == 1:
        if n != 2:
            raise ValueError(
                "scalar molefracs are the binary x1 convention; pass a "
                f"(B, {n}) composition matrix for {n}-component mixtures"
            )
        z = jnp.stack([z, 1.0 - z], axis=-1)
    if not gradients:
        params = g_s
        temperature, z, pressure = map(sg, (temperature, z, pressure))
    br = branches if branches is not None else static_branches_gc(params)

    # window detection stays detached (masks + initialization only);
    # the estimate is floored at 1e5 Pa — see pcsaft_mix.flash (the edge
    # solvers recover from a too-high estimate but not one decades low)
    p0_edges = sg(jnp.maximum(pressure, 1e5))
    p_bub, nan_b, y_bub = gc_incipient_property(
        g_s, sg(temperature), sg(z), p0_edges, bubble=True,
        branches=br, full_output=True,
    )
    p_dew, nan_d, x_dew = gc_incipient_property(
        g_s, sg(temperature), sg(z), p0_edges, bubble=False,
        branches=br, full_output=True,
    )
    p_red = pressure / temperature * PA_PER_KT_TO_REDUCED

    if not gradients:
        def run_flash(lnK0, beta0, active):
            return _gc_flash_jit(
                g_s, temperature, z, p_red, lnK0, beta0, active,
                branches=br
            )
    else:
        from ..solvers.flash import flash_implicit_gradients, flash_resid

        def run_flash(lnK0, beta0, active):
            def solve_fn(diff_args):
                gd, td, zd, prd, lnK0d, b0d, actd = diff_args
                return _gc_flash_jit(
                    gd, td, zd, prd, lnK0d, b0d, actd, branches=br
                )

            def resid_fn(diff_args, v):
                gd, td, zd, prd, _, _, _ = diff_args

                def item(g, t, zi, pri, vi):
                    pre = precompute_gc(g, t)
                    phi = lambda r: phi_gc_pre(pre, r, branches=br)
                    return flash_resid(phi, zi, pri, vi)

                return jax.vmap(
                    item, in_axes=(_GC_BATCH_AXES, 0, 0, 0, 0)
                )(gd, td, zd, prd, v)

            return flash_implicit_gradients(
                solve_fn, resid_fn,
                (params, temperature, z, p_red, lnK0, beta0, active),
            )

    return flash_window(
        z, pressure, p_bub, nan_b, y_bub, p_dew, nan_d, x_dew, run_flash
    )


class GcPcSaftMix:
    """Object facade mirroring reference ``GcPcSaftMix``
    (feos_torch/gc_pcsaft.py:13).  Constructor signature matches the
    reference: ``(segment_identifier, parameter, segment_lists, bond_lists,
    binary_segment_records, phi=None)``."""

    def __init__(
        self,
        segment_identifier,
        parameter,
        segment_lists,
        bond_lists,
        binary_segment_records,
        phi=None,
    ):
        self.params = assemble(
            segment_identifier, parameter, segment_lists, bond_lists,
            binary_segment_records, phi,
        )

    def helmholtz_energy_density(self, temperature, density):
        return gc_helmholtz_energy_density(
            self.params, temperature, density,
            branches=static_branches_gc(self.params),
        )

    def derivatives(self, temperature, density):
        return gc_derivatives(self.params, temperature, density,
                              branches=static_branches_gc(self.params))

    def residual_properties(self, temperature, density):
        """Batched residual caloric/state property set at (T, rho_vec) —
        see :mod:`feos_tpu.properties` (beyond the reference surface)."""
        from ..properties import gc_properties

        return gc_properties(self.params, temperature, density,
                             branches=static_branches_gc(self.params))

    def bubble_point(self, temperature, liquid_molefracs, pressure,
                     full_output=False, state0=None, state_output=False):
        """Batched bubble-point pressure (reference feos_torch/gc_pcsaft.py:470-490).

        ``full_output=True`` additionally returns the incipient-vapor
        composition (B, n); ``state0``/``state_output`` warm-start
        continuation — see pcsaft_mix.bubble_point."""
        return gc_incipient_property(
            self.params, temperature, liquid_molefracs, pressure,
            bubble=True, branches=static_branches_gc(self.params),
            full_output=full_output, state0=state0, state_output=state_output,
        )

    def dew_point(self, temperature, vapor_molefracs, pressure,
                  full_output=False, state0=None, state_output=False):
        """Batched dew-point pressure (reference feos_torch/gc_pcsaft.py:492-512)."""
        return gc_incipient_property(
            self.params, temperature, vapor_molefracs, pressure,
            bubble=False, branches=static_branches_gc(self.params),
            full_output=full_output, state0=state0, state_output=state_output,
        )

    def flash(self, temperature, molefracs, pressure, gradients=False):
        """Batched isothermal pT flash at (T, p, z) — see :func:`gc_flash`
        (beyond the reference surface)."""
        return gc_flash(self.params, temperature, molefracs, pressure,
                        branches=static_branches_gc(self.params),
                        gradients=gradients)

    def bubble_point_t(self, pressure, liquid_molefracs, t0,
                       full_output=False):
        """Bubble-point temperature at given pressure (beyond the
        reference; see :func:`gc_incipient_temperature`)."""
        return gc_incipient_temperature(
            self.params, pressure, liquid_molefracs, t0, bubble=True,
            branches=static_branches_gc(self.params),
            full_output=full_output,
        )

    def dew_point_t(self, pressure, vapor_molefracs, t0, full_output=False):
        """Dew-point temperature at given pressure (beyond the reference;
        see :func:`gc_incipient_temperature`)."""
        return gc_incipient_temperature(
            self.params, pressure, vapor_molefracs, t0, bubble=False,
            branches=static_branches_gc(self.params),
            full_output=full_output,
        )
