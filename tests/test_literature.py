"""Published absolute anchors, independent of BOTH in-repo implementations.

Every other solved-VLE check cross-validates the JAX solvers against the
in-repo C++ oracle (one author's reading of the physics, twice) or against
golden Helmholtz values generated from the reference's torch code.  These
tests anchor the *solved states* to numbers no in-repo code produced:

* PC-SAFT parameters from Gross & Sadowski, Ind. Eng. Chem. Res. 40 (2001)
  1244, Table 1 (non-associating) and Gross & Sadowski, Ind. Eng. Chem.
  Res. 41 (2002) 5510, Table 2 (2B associating);
* experimental normal boiling points and saturated liquid densities from
  the NIST WebBook.  Gross & Sadowski report vapor-pressure AADs of
  0.3-2% (2001, Table 1) and 1-4% (2002, Table 2) over wide T ranges, so
  the model must land p_sat(T_nb) within a few percent of 101325 Pa —
  a genuinely author-independent bar (a solver converging to a wrong root
  or a mis-assembled Helmholtz term misses it by orders of magnitude).

This plays the role FeOs plays for the reference at
/root/reference/tests/test_pcsaft_mix.py:127-251 (a live external oracle),
using published data instead of an installable package.
"""

import jax
import jax.numpy as jnp
import numpy as np

from feos_tpu.models.pcsaft_pure import liquid_density, vapor_pressure

P_ATM = 101325.0

# name: ([m, sigma, eps_k, mu, kappa_ab, eps_ab, na, nb], T_nb [K], rtol)
# Parameters: Gross & Sadowski 2001 Table 1 / 2002 Table 2 (2B scheme).
# Boiling points: NIST WebBook.  rtol covers the published AAD(p) of each
# fit plus the steep Clausius slope (dlnp/dlnT ~ 10 at T_nb).
BOILING = {
    "methane": ([1.0000, 3.7039, 150.03, 0, 0, 0, 0, 0], 111.67, 0.03),
    "ethane": ([1.6069, 3.5206, 191.42, 0, 0, 0, 0, 0], 184.55, 0.03),
    "propane": ([2.0020, 3.6184, 208.11, 0, 0, 0, 0, 0], 231.05, 0.03),
    "n-butane": ([2.3316, 3.7086, 222.88, 0, 0, 0, 0, 0], 272.66, 0.03),
    "n-pentane": ([2.6896, 3.7729, 231.20, 0, 0, 0, 0, 0], 309.21, 0.03),
    "n-hexane": ([3.0576, 3.7983, 236.77, 0, 0, 0, 0, 0], 341.88, 0.03),
    "n-heptane": ([3.4831, 3.8049, 238.40, 0, 0, 0, 0, 0], 371.57, 0.03),
    "n-octane": ([3.8176, 3.8373, 242.78, 0, 0, 0, 0, 0], 398.83, 0.03),
    "nitrogen": ([1.2053, 3.3130, 90.96, 0, 0, 0, 0, 0], 77.355, 0.03),
    "benzene": ([2.4653, 3.6478, 287.35, 0, 0, 0, 0, 0], 353.23, 0.03),
    "toluene": ([2.8149, 3.7169, 285.69, 0, 0, 0, 0, 0], 383.75, 0.03),
    # 2B associating fits (Gross & Sadowski 2002, Table 2); wider AAD
    "methanol": (
        [1.5255, 3.2300, 188.90, 0, 0.035176, 2899.5, 1, 1], 337.85, 0.06),
    "ethanol": (
        [2.3827, 3.1771, 198.24, 0, 0.032384, 2653.4, 1, 1], 351.44, 0.06),
    "water": (
        [1.0656, 3.0007, 366.51, 0, 0.034868, 2500.7, 1, 1], 373.12, 0.06),
}

# name: (molar mass [g/mol], T [K], experimental saturated-liquid density
# [kg/m3] at ~1 atm, rtol).  Densities: NIST WebBook at 298.15 K.  rtol
# from the published AAD(rho_liq): <=1% for the 2001 fits, 6.6% for 2B
# water (Gross & Sadowski 2002, Table 2).
LIQ_DENSITY = {
    "n-hexane": (86.175, 298.15, 654.8, 0.015),
    "benzene": (78.112, 298.15, 873.6, 0.015),
    "ethanol": (46.068, 298.15, 785.3, 0.03),
    "water": (18.015, 298.15, 997.0, 0.08),
}


def test_boiling_points():
    """p_sat(T_nb) = 1 atm within the published accuracy of each fit."""
    names = list(BOILING)
    params = np.array([BOILING[n][0] for n in names], dtype=np.float64)
    T = np.array([BOILING[n][1] for n in names], dtype=np.float64)
    nans, vp = jax.jit(vapor_pressure)(jnp.asarray(params), jnp.asarray(T))
    nans, vp = np.asarray(nans), np.asarray(vp)
    assert not nans.any(), f"unconverged rows: {[n for n, f in zip(names, nans) if f]}"
    for name, p in zip(names, vp):
        rtol = BOILING[name][2]
        assert abs(p - P_ATM) < rtol * P_ATM, (
            f"{name}: p_sat({BOILING[name][1]} K) = {p:.0f} Pa, expected "
            f"101325 Pa within {rtol:.0%}"
        )


def test_liquid_densities():
    """NPT liquid density at 1 atm vs experimental saturated-liquid data."""
    names = list(LIQ_DENSITY)
    params = np.array([BOILING[n][0] for n in names], dtype=np.float64)
    T = np.array([LIQ_DENSITY[n][1] for n in names], dtype=np.float64)
    p = np.full(len(names), P_ATM)
    nans, rho = jax.jit(liquid_density)(
        jnp.asarray(params), jnp.asarray(T), jnp.asarray(p)
    )
    nans = np.asarray(nans)
    assert not nans.any()
    rho_kg = np.asarray(rho) * np.array([LIQ_DENSITY[n][0] for n in names])
    for name, got in zip(names, rho_kg):
        _, _, want, rtol = LIQ_DENSITY[name]
        assert abs(got - want) < rtol * want, (
            f"{name}: rho_liq = {got:.1f} kg/m3, expected {want} within "
            f"{rtol:.0%}"
        )


def test_near_ideal_binary_bubble_pressure():
    """Benzene/toluene and propane/n-butane are textbook near-ideal pairs
    (experimental activity coefficients within ~2% of unity across the
    composition range; e.g. Rosanoff & Easley 1909 for benzene/toluene,
    Kay 1970 for propane/butane): the solved equimolar bubble pressure
    must match Raoult's law built from the SAME pure fits within 3%.
    This anchors the mixture combining rules + solver against published
    phase behavior without trusting any in-repo mixture code."""
    from feos_tpu.models import pcsaft_mix

    # temperatures chosen so the total pressure stays ~1-2 bar: at higher
    # pressures the (real, experimentally observed) vapor-phase fugacity
    # corrections pull the bubble pressure below Raoult by >3% (measured
    # -3.5% for propane/butane at 300 K / 6 bar, monotone in pressure)
    pairs = [("benzene", "toluene", 360.0), ("propane", "n-butane", 240.0)]
    for a, b, T in pairs:
        pa = np.array(BOILING[a][0])
        pb = np.array(BOILING[b][0])
        _, psat = jax.jit(vapor_pressure)(
            jnp.asarray(np.stack([pa, pb])), jnp.asarray([T, T])
        )
        psat = np.asarray(psat)
        p_raoult = 0.5 * (psat[0] + psat[1])
        params = np.stack([pa, pb])[None]
        pbub, nans = pcsaft_mix.bubble_point(
            jnp.asarray(params), None, jnp.asarray([T]),
            jnp.asarray([0.5]), jnp.asarray([p_raoult]),
        )
        assert not np.asarray(nans)[0]
        got = float(np.asarray(pbub)[0])
        assert abs(got - p_raoult) < 0.03 * p_raoult, (
            f"{a}/{b} at {T} K: bubble {got:.0f} Pa vs Raoult "
            f"{p_raoult:.0f} Pa"
        )
        # deviation direction: vapor non-ideality + size asymmetry give a
        # small NEGATIVE deviation for these pairs (bubble below Raoult)
        assert got < 1.005 * p_raoult, (
            f"{a}/{b} at {T} K: bubble {got:.0f} Pa ABOVE Raoult "
            f"{p_raoult:.0f} Pa"
        )
