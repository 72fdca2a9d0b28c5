"""Shared PC-SAFT mixture building blocks (dipole integrals, association).

Used by both the homosegmented mixture model (pcsaft_mix) and the
group-contribution model (gc_pcsaft), mirroring the module-level helpers the
reference duplicates across feos_torch/pcsaft_mix.py:482-522 and
feos_torch/gc_pcsaft.py:531-564.

All functions are per-item (unbatched): component axes are static length-n
arrays, batch comes from ``jax.vmap`` at the API layer.  Rows that do not
belong to a regime are handled by *input sanitization + output masking*
(static shapes) instead of the reference's dynamic boolean row indexing
(SURVEY.md section 3.5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import AD, BD, CD

PI = np.pi


def exp_full(x):
    """``exp`` at full emulated-f64 precision for any operand size.

    The TPU plugin's emulated-f64 ``exp`` lowers scalar/size-1 operands
    through an f32-level path (measured 2.2e-8 relative error, vs ~3e-14
    for size>=2 operands); padding with a zero lane forces the full-
    precision vector path.  Use at f64 call sites that are scalar per item:
    batching via ``vmap`` also vectorizes them, but only for batch >= 2,
    and single-row property queries are a legitimate pattern."""
    return jnp.exp(jnp.stack([x, jnp.zeros_like(x)]))[0]


class DipolePre(NamedTuple):
    """Density-independent dipole quantities (see :func:`precompute_dipole`).

    ``pc`` has shape (n_pairs, 5) — one J2 eta-coefficient vector per
    unordered component pair (i <= j, enumerated row-major) already scaled
    by the pair's 1/sigma^3/multiplicity weights; ``tc`` (n_triplets, 4)
    is the J3 analogue over i <= j <= k.  The mu^2 composition weights are
    NOT baked in: :func:`phi_dipole_pre` folds them into the density
    weights instead (``mu2t``, the per-component mu^2 term normalized by
    ``mu2_max``), so the accumulated pair/triplet sums stay O(1) even when
    the dipolar species is at trace composition (scale-safety, see
    :func:`phi_dipole`).
    """

    pc: jnp.ndarray
    tc: jnp.ndarray
    mu2t: jnp.ndarray
    mu2_max: jnp.ndarray


def precompute_dipole(m, sigma, epsilon_k, mu2_scaled, temperature):
    """Hoist everything density-independent out of :func:`phi_dipole`.

    The pair/triplet integral coefficient vectors, the 1/sigma weights and
    the mu^2 temperature scaling depend only on (parameters, T); inside the
    VLE Newton loops they are loop-invariant, and explicit precomputation
    (once per solve) is what actually removes them from the loop body under
    the TPU's f64-emulation lowering.
    """
    n = m.shape[0]
    dtype = jnp.result_type(m, temperature)
    cAD = jnp.asarray(AD, dtype=dtype)
    cBD = jnp.asarray(BD, dtype=dtype)
    cCD = jnp.asarray(CD, dtype=dtype)

    mu2_term = mu2_scaled / temperature
    mc = jnp.clip(m, max=2.0)
    mu2_max = jnp.max(mu2_term)
    mu2_max = jnp.where(mu2_max > 0.0, mu2_max, 1.0)
    mu2_term = mu2_term / mu2_max

    pc = []
    for i in range(n):
        for j in range(i, n):
            sigma_ij_3 = (0.5 * (sigma[i] + sigma[j])) ** 3
            mij = jnp.sqrt(mc[i] * mc[j])
            mij1 = (mij - 1.0) / mij
            mij2 = mij1 * (mij - 2.0) / mij
            eps_ij_t = jnp.sqrt(epsilon_k[i] * epsilon_k[j]) / temperature
            a = cAD[:, 0] + mij1 * cAD[:, 1] + mij2 * cAD[:, 2]
            b = cBD[:, 0] + mij1 * cBD[:, 1] + mij2 * cBD[:, 2]
            c = 1.0 if i == j else 2.0
            pc.append((eps_ij_t * b + a) * (c / sigma_ij_3))

    tc = []
    for i in range(n):
        for j in range(i, n):
            for k in range(j, n):
                sigma_ij = 0.5 * (sigma[i] + sigma[j])
                sigma_ik = 0.5 * (sigma[i] + sigma[k])
                sigma_jk = 0.5 * (sigma[j] + sigma[k])
                mijk = (mc[i] * mc[j] * mc[k]) ** (1.0 / 3.0)
                mijk1 = (mijk - 1.0) / mijk
                mijk2 = mijk1 * (mijk - 2.0) / mijk
                c3 = {1: 1.0, 2: 3.0, 3: 6.0}[len({i, j, k})]
                tc.append(
                    (cCD[:, 0] + mijk1 * cCD[:, 1] + mijk2 * cCD[:, 2])
                    * (c3 / (sigma_ij * sigma_ik * sigma_jk))
                )

    return DipolePre(
        pc=jnp.stack(pc), tc=jnp.stack(tc), mu2t=mu2_term, mu2_max=mu2_max
    )


def phi_dipole_pre(dp: DipolePre, n, rho, etas):
    """Dipolar contribution from precomputed coefficients (the
    density-dependent half of :func:`phi_dipole`).  ``n`` is the static
    component count (the pair/triplet enumeration is rebuilt from it).

    The pair/triplet sums accumulate on *dipolar* composition weights
    v = (w * mu2t) / wd with wd = sum(w * mu2t), which sum to one: the
    sums S2h, S3h stay O(1) even when the dipolar species is at trace
    composition.  Accumulating on plain composition weights instead makes
    S2 ~ w_dipolar^2, and the Pade quotient's second derivative divides by
    S2^3 ~ w^6 — which underflows f32 (and the TPU's emulated-f64 exponent
    range) for w ~ 1e-8, freezing the f32 Newton warmup with NaN Jacobians
    on dilute dipolar rows.  The net powers of (rho_t * wd * mu2_max)
    reattach at the end."""
    rho_t = jnp.sum(rho)
    u = (rho / rho_t) * dp.mu2t
    wd = jnp.sum(u)
    v = u / jnp.where(wd > 0.0, wd, 1.0)
    v2 = jnp.stack([v[i] * v[j] for i in range(n) for j in range(i, n)])
    v3 = jnp.stack(
        [
            v[i] * v[j] * v[k]
            for i in range(n)
            for j in range(i, n)
            for k in range(j, n)
        ]
    )
    S2h = -PI * jnp.dot(v2 @ dp.pc, etas[:5])
    S3h = -(4.0 / 3.0 * PI * PI) * jnp.dot(v3 @ dp.tc, etas[:4])
    scale = rho_t * wd * dp.mu2_max
    phi2 = scale * scale * S2h
    ratio = scale * S3h / jnp.where(S2h != 0.0, S2h, 1.0)
    return phi2 / (1.0 - ratio)


def pair_integral(mij1, mij2, etas, eps_ij_t):
    """Dipole pair integral J2 (reference feos_torch/pcsaft_mix.py:482-490).

    ``etas`` is the (7,) vector of eta powers [1, eta, ..., eta^6].
    """
    cAD = jnp.asarray(AD, dtype=etas.dtype)
    cBD = jnp.asarray(BD, dtype=etas.dtype)
    a = cAD[:, 0] + mij1 * cAD[:, 1] + mij2 * cAD[:, 2]
    b = cBD[:, 0] + mij1 * cBD[:, 1] + mij2 * cBD[:, 2]
    return jnp.dot(eps_ij_t * b + a, etas[:5])


def triplet_integral(mijk1, mijk2, etas):
    """Dipole triplet integral J3 (reference feos_torch/pcsaft_mix.py:493-497)."""
    cCD = jnp.asarray(CD, dtype=etas.dtype)
    return jnp.dot(cCD[:, 0] + mijk1 * cCD[:, 1] + mijk2 * cCD[:, 2], etas[:4])


def phi_dipole(m, sigma, epsilon_k, mu2_scaled, temperature, rho, etas):
    """Dipolar contribution for an n-component mixture (per item).

    ``mu2_scaled`` must equal mu^2 * MU2_FACTOR / m  (i.e. the reference's
    ``sigma**3 * epsilon_k * mu2`` for the homosegmented model,
    feos_torch/pcsaft_mix.py:163, and ``mu2`` directly for the gc model,
    feos_torch/gc_pcsaft.py:262).  Returns phi2^2/(phi2 - phi3) with the
    denominator guarded so that mu = 0 rows contribute exactly zero with
    finite gradients (the reference instead row-subsets,
    feos_torch/pcsaft_mix.py:111-115).

    The pair/triplet sums accumulate on composition weights w = rho/rho_t
    (O(1)) and reattach the total-density powers at the end; the ratio
    phi3/phi2 of the Pade is then rho_t * (S3/S2) with S2, S3 both O(1).
    Accumulating on raw partial densities instead makes phi2 ~ O(rho^2)
    and the quotient's second derivative touches phi2^3, which
    under-/overflows the TPU's emulated-f64 exponent range (~1e+-38) at
    dilute states and poisons derivatives with NaN/inf.

    The dipole scale needs the same treatment: S2 ~ mu^4 and the ratio's
    density derivatives divide by S2^2, which underflows f32 (and the
    emulated-f64 range) for tiny dipole moments (e.g. FD perturbations
    around mu = 0).  ``mu2_term`` is normalized by its largest component so
    the accumulated sums are O(1) in mu; the net powers reattach at the end
    (see :func:`phi_dipole_pre`).

    Thin wrapper over :func:`precompute_dipole` + :func:`phi_dipole_pre`;
    hot loops should call the split form so the rho-free half is computed
    once per solve.
    """
    dp = precompute_dipole(m, sigma, epsilon_k, mu2_scaled, temperature)
    return phi_dipole_pre(dp, m.shape[0], rho, etas)


def association_strength(
    i, j, temperature, sigma, kappa_ab, epsilon_k_ab, d, zeta2, zeta3_m1,
    epsilon_k_aibj=None,
):
    """Association strength Delta_AiBj (reference feos_torch/pcsaft_mix.py:500-522).

    ``epsilon_k_aibj`` (optional scalar) overrides the arithmetic-mean cross
    association energy for i != j when nonzero.  Callers must sanitize
    ``kappa_ab`` on masked lanes (kappa > 0) so the sqrt has finite gradients.
    """
    k = d[i] * d[j] / (d[i] + d[j]) * zeta2 * zeta3_m1
    sigma3_kappa = (sigma[i] * sigma[j]) ** 1.5 * jnp.sqrt(
        kappa_ab[i] * kappa_ab[j]
    )
    eps = 0.5 * (epsilon_k_ab[i] + epsilon_k_ab[j])
    if epsilon_k_aibj is not None and i != j:
        eps = jnp.where(epsilon_k_aibj != 0.0, epsilon_k_aibj, eps)
    return (
        zeta3_m1
        * (k * (2.0 * k + 3.0) + 1.0)
        * sigma3_kappa
        * (exp_full(eps / temperature) - 1.0)
    )


def assoc_strength_tfactor(
    i, j, temperature, sigma, kappa_ab, epsilon_k_ab, epsilon_k_aibj=None,
):
    """Density-independent factor of :func:`association_strength`:
    sigma_ij^3 kappa_ij (exp(eps_ij/T) - 1) — precomputed once per solve
    (the exp/sqrt are the expensive ops under emulated f64)."""
    sigma3_kappa = (sigma[i] * sigma[j]) ** 1.5 * jnp.sqrt(
        kappa_ab[i] * kappa_ab[j]
    )
    eps = 0.5 * (epsilon_k_ab[i] + epsilon_k_ab[j])
    if epsilon_k_aibj is not None and i != j:
        eps = jnp.where(epsilon_k_aibj != 0.0, epsilon_k_aibj, eps)
    return sigma3_kappa * (exp_full(eps / temperature) - 1.0)


def assoc_strength_from_tfactor(tfac, dd_ij, zeta2, zeta3_m1):
    """Reattach the density-dependent hard-sphere contact factor to a
    precomputed association T-factor; ``dd_ij = d_i d_j / (d_i + d_j)``."""
    k = dd_ij * zeta2 * zeta3_m1
    return zeta3_m1 * (k * (2.0 * k + 3.0) + 1.0) * tfac


def site_fraction_free_energy(x):
    """f(X) = ln X - X/2 + 1/2 per association site."""
    return jnp.log(x) - 0.5 * x + 0.5
