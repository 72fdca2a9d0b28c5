"""Randomized cross-validation sweeps: JAX solvers vs the C++ oracle.

The pinned oracle tests (test_cpu_backend.py) cover the reference's own
test conditions; these sweeps draw hundreds of random *physical* parameter
sets and states (seeded, deterministic) and require the two independent
implementations to agree on convergence behavior and on every converged
result.  This is the wide-range robustness evidence the reference gets
from its FeOs-oracle grid (reference tests/test_pcsaft_pure.py:9-88),
extended to randomized coverage.

Temperatures are placed below a crude PC-SAFT critical-temperature
correlation Tc ~ eps_k (0.89 + 0.38 m) (fit to methane/butane/octane);
rows that land supercritical or otherwise unsolvable must be *masked
identically* by both implementations (small mismatch budget for
genuinely marginal rows near the spinodal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feos_tpu import cpu_backend

pytestmark = pytest.mark.skipif(
    not cpu_backend.available(), reason="no C++ toolchain for native backend"
)


# association site schemes: (na, nb) per scheme label.  "1A" is
# acceptor-only — zero association as a pure fluid (the closed form must
# degenerate identically in both implementations) and the induced-
# association partner in mixtures (reference feos_torch/pcsaft_mix.py:324).
_SCHEMES = {"2B": (1.0, 1.0), "3B": (1.0, 2.0), "1A": (0.0, 1.0)}


def _random_params(rng, n, schemes=("2B",)):
    """Random physical PC-SAFT parameter rows: ~1/3 dipolar (independently
    of association, so dipolar+associating combinations occur), 40%
    associating with site schemes drawn uniformly from ``schemes``."""
    m = rng.uniform(1.0, 4.0, n)
    sigma = rng.uniform(3.0, 4.0, n)
    eps = rng.uniform(150.0, 400.0, n)
    mu = np.where(rng.random(n) < 1.0 / 3.0, rng.uniform(1.0, 4.0, n), 0.0)
    assoc = rng.random(n) < 0.4
    kap = np.where(assoc, rng.uniform(0.01, 0.05, n), 0.0)
    eab = np.where(assoc, rng.uniform(1000.0, 2800.0, n), 0.0)
    sch = rng.integers(0, len(schemes), n)
    na_v = np.array([_SCHEMES[s][0] for s in schemes])
    nb_v = np.array([_SCHEMES[s][1] for s in schemes])
    na = np.where(assoc, na_v[sch], 0.0)
    nb = np.where(assoc, nb_v[sch], 0.0)
    return np.stack([m, sigma, eps, mu, kap, eab, na, nb], axis=1)


def _tc_estimate(params):
    return params[:, 2] * (0.89 + 0.38 * params[:, 0])


def test_fuzz_pure_vle_vs_oracle():
    from feos_tpu.models.pcsaft_pure import PureParams
    from feos_tpu.solvers.vle import pure_vle

    rng = np.random.default_rng(20260818)
    B = 256
    # full site-scheme width: 2B, 3B (na != nb), and acceptor-only rows
    # whose association must vanish identically in both implementations
    params = _random_params(rng, B, schemes=("2B", "3B", "1A"))
    T = rng.uniform(0.55, 0.90, B) * _tc_estimate(params)

    rho_cpp, ok_cpp = cpu_backend.vapor_pressure_densities(params, T)
    p = PureParams.from_array(jnp.asarray(params))
    rv, rl, ok_jax = jax.jit(jax.vmap(pure_vle))(p, jnp.asarray(T))
    ok_jax = np.asarray(ok_jax)

    both = ok_cpp & ok_jax
    mismatch = ok_cpp ^ ok_jax
    # the sweep must actually exercise the solvers...
    assert both.sum() >= 0.7 * B, f"only {both.sum()}/{B} rows converged"
    # ...and the two implementations must agree on what is solvable
    # (marginal rows at the spinodal may differ)
    # <=1%: both solvers now apply the final Newton step before exiting,
    # so residual-level disagreement on solvability is gone (measured 0/256)
    assert mismatch.sum() <= 0.01 * B, (
        f"{mismatch.sum()} convergence mismatches at rows "
        f"{np.nonzero(mismatch)[0][:10]}: "
        f"{[(params[i].round(3).tolist(), round(T[i], 2)) for i in np.nonzero(mismatch)[0][:4]]}"
    )
    # both implementations land at the f64 noise floor (measured max
    # 2.1e-14 vapor / 1.0e-13 liquid over this sweep) — two-plus decades
    # past the reference's 1e-10 bar (reference tests/test_pcsaft_pure.py:59-88)
    np.testing.assert_allclose(
        np.asarray(rv)[both], rho_cpp[both, 0], rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(rl)[both], rho_cpp[both, 1], rtol=3e-13
    )


def test_fuzz_binary_bubble_dew_vs_oracle():
    from feos_tpu.models import pcsaft_mix as M

    rng = np.random.default_rng(20260819)
    B = 64
    # component 1 associates 2B when it associates; component 2 draws 2B
    # (-> cross regime) or acceptor-only "1A" (-> induced regime), so all
    # three mixture association regimes plus dipolar overlaps are fuzzed
    p1 = _random_params(rng, B)
    p2 = _random_params(rng, B, schemes=("2B", "1A"))
    params = np.stack([p1, p2], axis=1)  # (B, 2, 8)
    # eps_AiBj override (reference src/pcsaft.rs:163: 0 => None) on half
    # of the rows where BOTH components self-associate (cross regime)
    both_2b = (p1[:, 6] * p1[:, 7] > 0) & (p2[:, 6] * p2[:, 7] > 0)
    eps_ab_ij = np.where(
        both_2b & (rng.random(B) < 0.5),
        rng.uniform(1200.0, 2600.0, B),
        0.0,
    )
    kij = np.stack([rng.uniform(-0.15, 0.15, B), eps_ab_ij], axis=1)
    tc = np.minimum(_tc_estimate(p1), _tc_estimate(p2))
    T = rng.uniform(0.55, 0.85, B) * tc
    x = rng.uniform(0.1, 0.9, B)
    p0 = np.full(B, 1e5)

    eos = M.PcSaftMix(params, kij)
    for bubble, fn in ((True, eos.bubble_point), (False, eos.dew_point)):
        rho_cpp, p_cpp, ok_cpp = cpu_backend.mix_vle_densities(
            params, kij, T, x, p0, bubble=bubble
        )
        p_jax, nans = jax.jit(fn)(T, x, p0)
        ok_jax = ~np.asarray(nans)
        both = ok_cpp & ok_jax
        mismatch = ok_cpp ^ ok_jax
        label = "bubble" if bubble else "dew"
        assert both.sum() >= 0.6 * B, (
            f"{label}: only {both.sum()}/{B} rows converged"
        )
        assert mismatch.sum() <= 0.01 * B, (
            f"{label}: {mismatch.sum()} convergence mismatches at rows "
            f"{np.nonzero(mismatch)[0][:10]}: "
            f"{[(params[i].round(3).tolist(), round(T[i], 2), round(x[i], 3)) for i in np.nonzero(mismatch)[0][:4]]}"
        )
        # measured max 1.2e-11 (bubble) / 5.1e-10 (dew): the dew-side
        # pressure is reported from the residual-accepted carried state,
        # so it sits at the residual level, not the noise floor
        np.testing.assert_allclose(
            np.asarray(p_jax)[both], p_cpp[both], rtol=3e-9,
            err_msg=f"{label} pressures diverge from oracle",
        )


def _load_sauer2014():
    import json
    from pathlib import Path

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in [
            "m", "sigma", "epsilon_k", "mu", "kappa_ab", "epsilon_k_ab",
            "na", "nb",
        ]
    )
    return ident, parameter


def _random_gc_molecule(rng, kind):
    """A random molecule of the given family from the sauer2014 segment
    vocabulary: linear alkanes, 2-methyl branched alkanes, and chains
    terminated by OH (self-assoc), NH2 (self-assoc), CH=O (dipolar), or
    IA (acceptor-only + dipolar: the induced-association donor)."""
    k = int(rng.integers(0, 4))
    segs = ["CH3"] + ["CH2"] * k
    if kind == "branched":
        # CH3-(CH2)k->CH(-CH3)-CH3
        segs += [">CH", "CH3", "CH3"]
        b = k + 1
        bonds = [[i, i + 1] for i in range(b + 1)] + [[b, b + 2]]
    else:
        tail = {
            "alkane": "CH3", "alcohol": "OH", "amine": "NH2",
            "aldehyde": "CH=O", "induced": "IA",
        }[kind]
        segs += [tail]
        bonds = [[i, i + 1] for i in range(len(segs) - 1)]
    return segs, bonds


def test_fuzz_gc_random_topologies_vs_oracle():
    """Random branched/polar/associating gc molecules (not just one fixed
    butane/propane pair): each batch row pairs two random molecules so the
    sweep spans the plain, dipolar, self-, cross-, and induced-association
    gc regimes over random (T, x) states."""
    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    ident, parameter = _load_sauer2014()
    rng = np.random.default_rng(20260821)
    B = 48
    # regime-covering pair families, cycled over the batch
    pair_kinds = [
        ("alkane", "alkane"),        # plain
        ("branched", "aldehyde"),    # branched + dipolar
        ("alcohol", "alkane"),       # self assoc
        ("alcohol", "amine"),        # cross assoc
        ("alcohol", "induced"),      # induced assoc (+ dipole on IA)
    ]
    segment_lists, bond_lists = [], []
    for i in range(B):
        ka, kb = pair_kinds[i % len(pair_kinds)]
        sa, ba = _random_gc_molecule(rng, ka)
        sb, bb = _random_gc_molecule(rng, kb)
        segment_lists.append([sa, sb])
        bond_lists.append([ba, bb])
    phi = rng.uniform(0.95, 1.1, (B, 2))
    eos = GcPcSaftMix(
        ident, parameter, segment_lists, bond_lists,
        [("CH3", "CH2", -0.05)], phi,
    )
    # per-row subcritical temperature from the component aggregates
    m_mix = np.asarray(eos.params.m_mix)
    eps_mix = np.asarray(eos.params.epsilon_k_mix)
    tc_est = (eps_mix * (0.89 + 0.38 * m_mix)).min(axis=1)
    T = rng.uniform(0.55, 0.80, B) * tc_est
    x = rng.uniform(0.1, 0.9, B)
    p0 = np.full(B, 1e5)
    for bubble, fn in ((True, eos.bubble_point), (False, eos.dew_point)):
        rho_cpp, p_cpp, ok_cpp = cpu_backend.gc_vle_densities(
            eos.params, T, x, p0, bubble
        )
        p_jax, nans = jax.jit(fn)(T, x, p0)
        ok_jax = ~np.asarray(nans)
        both = ok_cpp & ok_jax
        mismatch = ok_cpp ^ ok_jax
        label = "gc-topo bubble" if bubble else "gc-topo dew"
        assert both.sum() >= 0.6 * B, (
            f"{label}: only {both.sum()}/{B} rows converged"
        )
        assert mismatch.sum() <= 1, (
            f"{label}: {mismatch.sum()} convergence mismatches at rows "
            f"{np.nonzero(mismatch)[0][:10]}: "
            f"{[(segment_lists[i], round(T[i], 1), round(x[i], 3)) for i in np.nonzero(mismatch)[0][:3]]}"
        )
        np.testing.assert_allclose(
            np.asarray(p_jax)[both], p_cpp[both], rtol=1e-9,
            err_msg=f"{label} pressures diverge from oracle",
        )


def test_fuzz_gc_bubble_dew_vs_oracle():
    """Random (T, x) sweep of the heterosegmented gc path over the
    sauer2014 butane/propane system (segment-resolved chain + dispersion,
    phi correction, kab)."""
    import json
    from pathlib import Path

    from feos_tpu.models.gc_pcsaft import GcPcSaftMix

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in [
            "m", "sigma", "epsilon_k", "mu", "kappa_ab", "epsilon_k_ab",
            "na", "nb",
        ]
    )
    rng = np.random.default_rng(20260820)
    B = 64
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [("CH3", "CH2", -0.05)],
        np.tile([1.1, 0.98], (B, 1)),
    )
    T = rng.uniform(220.0, 330.0, B)
    x = rng.uniform(0.1, 0.9, B)
    p0 = np.full(B, 1e5)
    for bubble, fn in ((True, eos.bubble_point), (False, eos.dew_point)):
        rho_cpp, p_cpp, ok_cpp = cpu_backend.gc_vle_densities(
            eos.params, T, x, p0, bubble
        )
        p_jax, nans = jax.jit(fn)(T, x, p0)
        ok_jax = ~np.asarray(nans)
        both = ok_cpp & ok_jax
        mismatch = ok_cpp ^ ok_jax
        label = "gc bubble" if bubble else "gc dew"
        assert both.sum() >= 0.8 * B, (
            f"{label}: only {both.sum()}/{B} rows converged"
        )
        assert mismatch.sum() <= 0.01 * B, (
            f"{label}: {mismatch.sum()} convergence mismatches at rows "
            f"{np.nonzero(mismatch)[0][:10]}: "
            f"{[(round(T[i], 2), round(x[i], 3)) for i in np.nonzero(mismatch)[0][:4]]}"
        )
        # measured max 5.8e-12 (bubble) / 8.5e-11 (dew)
        np.testing.assert_allclose(
            np.asarray(p_jax)[both], p_cpp[both], rtol=1e-9,
            err_msg=f"{label} pressures diverge from oracle",
        )


def test_fuzz_flash_vs_oracle():
    """Randomized TP-flash sweep: JAX flash vs the C++ oracle flash.

    Random binary systems over all association regimes (cross, induced,
    dipolar overlaps, eps_AiBj overrides — same draw as the bubble/dew
    fuzz), pressures placed strictly inside the two-phase window
    (log-blend weight 0.2..0.8 of the JAX edge solves, so window
    classification is unambiguous).  Both implementations must agree on
    the phase code and, on two-phase rows, on beta / x / y / rho at the
    solver noise floor."""
    from feos_tpu.models import pcsaft_mix as M

    rng = np.random.default_rng(20260821)
    B = 48
    p1 = _random_params(rng, B)
    p2 = _random_params(rng, B, schemes=("2B", "1A"))
    params = np.stack([p1, p2], axis=1)
    both_2b = (p1[:, 6] * p1[:, 7] > 0) & (p2[:, 6] * p2[:, 7] > 0)
    eps_ab_ij = np.where(
        both_2b & (rng.random(B) < 0.5),
        rng.uniform(1200.0, 2600.0, B),
        0.0,
    )
    kij = np.stack([rng.uniform(-0.15, 0.15, B), eps_ab_ij], axis=1)
    tc = np.minimum(_tc_estimate(p1), _tc_estimate(p2))
    T = rng.uniform(0.55, 0.85, B) * tc
    z1 = rng.uniform(0.1, 0.9, B)
    p0 = np.full(B, 1e5)

    eos = M.PcSaftMix(params, kij)
    p_bub, nb = eos.bubble_point(T, z1, p0)
    p_dew, nd = eos.dew_point(T, z1, p0)
    edges_ok = ~(np.asarray(nb) | np.asarray(nd))
    assert edges_ok.sum() >= 0.6 * B
    w = rng.uniform(0.2, 0.8, B)
    # harmless placeholder pressure on rows without a solved window
    p = np.where(
        edges_ok,
        np.exp((1 - w) * np.log(np.asarray(p_bub))
               + w * np.log(np.asarray(p_dew))),
        1e5,
    )

    bj, xj, yj, rj, phj = map(np.asarray, eos.flash(T, z1, p))
    bo, xo, yo, ro, pho = cpu_backend.mix_flash(params, kij, T, z1, p)

    two_j = edges_ok & (phj == 2)
    two_o = edges_ok & (pho == 2)
    mismatch = two_j ^ two_o
    assert two_j.sum() >= 0.55 * B, f"only {two_j.sum()}/{B} two-phase"
    assert mismatch.sum() <= 0.02 * B + 1, (
        f"{mismatch.sum()} phase mismatches at rows "
        f"{np.nonzero(mismatch)[0][:10]}"
    )
    both = two_j & two_o
    np.testing.assert_allclose(bo[both], bj[both], rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(xo[both], xj[both], rtol=0, atol=1e-8)
    np.testing.assert_allclose(yo[both], yj[both], rtol=0, atol=1e-8)
    np.testing.assert_allclose(ro[both], rj[both], rtol=1e-8)
