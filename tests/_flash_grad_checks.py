"""Flash implicit-gradient checks, run as a STANDALONE child process.

tests/test_flash_grad.py launches this script in a fresh interpreter
with the persistent compilation cache disabled: under the sandbox's
remote-compile setup, compiling/caching this module's executables
(jacfwd over the nested flash/incipient pjits) inside a long-lived
pytest process nondeterministically crashes it in
``compilation_cache.put/get_executable_and_time`` (SIGSEGV/SIGABRT with
a bare faulthandler dump) — observed in 4 of 5 full-suite runs, always
at this module's graphs, never standalone.  A fresh process with no
cache traffic has never crashed.

The checks themselves (same validation content as any pytest file):

* Binary phase-rule anchors: at fixed (T, p) a binary two-phase
  system's x and y are independent of the feed (F = 2), so
  dx/dz1 = dy/dz1 = drho/dz1 = 0 and the lever rule gives
  dbeta/dz1 = 1/(y1 - x1) — analytic anchors for the implicit linear
  solve.
* Central finite differences of the detached solver w.r.t. kij,
  epsilon_k, p, and T — the reference's FD-vs-AD pattern
  (tests/test_pcsaft_mix.py:130-192) applied to the flash outputs.
* gradients=True leaves every primal output bit-identical.
* The gc path: lever-rule anchor + FD in pressure.
"""

import json
import os
import sys
from pathlib import Path

if __name__ == "__main__":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if __name__ == "__main__":
    jax.config.update("jax_platforms", "cpu")
    # NO persistent compilation cache in this process (see module
    # docstring): the crash sits in the cache's executable
    # (de)serialization under the remote-compile relay.

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from feos_tpu.models.pcsaft_mix import flash, static_branches  # noqa: E402

# one non-associating kij row + one cross-associating row with the
# eps_AiBj override (the regime the advisor flagged as the hard case)
PARAMS = np.array([
    [[1.0, 3.5, 150.0, 0.0, 0.0, 0.0, 0.0, 0.0],
     [1.0, 3.5, 200.0, 0.0, 0.0, 0.0, 0.0, 0.0]],
    [[1.0, 3.5, 150.0, 0.0, 0.02, 1500.0, 1.0, 1.0],
     [1.0, 3.5, 200.0, 0.0, 0.03, 2500.0, 1.0, 1.0]],
])
KIJ = np.array([[-0.15, 0.0], [-0.15, 1000.0]])
T = np.array([150.0, 150.0])
Z1 = np.array([0.4, 0.5])
BR = static_branches(PARAMS)


def _midp():
    """Mid-window pressures (log midpoint of the two-phase window)."""
    from feos_tpu.models.pcsaft_mix import PcSaftMix

    eos = PcSaftMix(PARAMS, KIJ)
    p0 = np.full(len(T), 1e5)
    p_bub, nb = eos.bubble_point(T, Z1, p0)
    p_dew, nd = eos.dew_point(T, Z1, p0)
    assert not np.any(np.asarray(nb)) and not np.any(np.asarray(nd))
    return np.sqrt(np.asarray(p_bub) * np.asarray(p_dew))


def _flash_outs(parameters, kij, t, z1, p):
    beta, x, y, rho, phase = flash(
        parameters, kij, t, z1, p, branches=BR, gradients=True
    )
    return beta, x, y, rho


def check_phase_rule_anchors(midp):
    """dx/dz1 = dy/dz1 = drho/dz1 = 0; dbeta/dz1 = 1/(y1 - x1)."""
    beta, x, y, rho = _flash_outs(PARAMS, KIJ, T, Z1, midp)
    assert np.all(np.asarray(beta) > 0) and np.all(np.asarray(beta) < 1)

    db, dx, dy, drho = jax.jacfwd(
        lambda z1: _flash_outs(PARAMS, KIJ, T, z1, midp), argnums=0
    )(jnp.asarray(Z1))
    # each row depends only on its own z1: off-diagonal entries are zero
    # by batch independence; the diagonal carries the physics
    db = np.asarray(db)
    lever = 1.0 / (np.asarray(y)[:, 0] - np.asarray(x)[:, 0])
    np.testing.assert_allclose(np.diagonal(db), lever, rtol=1e-6)
    for d in (dx, dy, drho):
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def check_fd_kij(midp):
    """AD d(outputs)/d(kij) vs central FD of the detached solver."""
    jac = jax.jacfwd(
        lambda k: _flash_outs(PARAMS, k, T, Z1, midp), argnums=0
    )(jnp.asarray(KIJ))
    h = 1e-6

    def fd(col):
        dk = np.zeros_like(KIJ)
        dk[:, col] = h
        hi = flash(PARAMS, KIJ + dk, T, Z1, midp, branches=BR)
        lo = flash(PARAMS, KIJ - dk, T, Z1, midp, branches=BR)
        return [(np.asarray(a) - np.asarray(b)) / (2 * h)
                for a, b in (zip(hi[:4], lo[:4]))]

    fd_k = fd(0)
    for out_idx, fd_out in enumerate(fd_k):
        ad = np.asarray(jac[out_idx])
        # jac shape: out_shape + (B, 2); each row b depends only on its
        # own kij[b, 0]
        ad_diag = np.stack([ad[b, ..., b, 0] for b in range(len(T))])
        np.testing.assert_allclose(ad_diag, fd_out, rtol=2e-4, atol=2e-9)


def check_fd_epsilon_pressure_temperature(midp):
    """AD vs central FD w.r.t. epsilon_k(comp 0), p, and T."""
    params_j = jnp.asarray(PARAMS)

    # epsilon_k of component 0
    jac_p = jax.jacfwd(
        lambda pp: _flash_outs(pp, KIJ, T, Z1, midp), argnums=0
    )(params_j)
    h = 1e-4  # epsilon ~ 150 K: relative step ~ 7e-7
    dp = np.zeros_like(PARAMS)
    dp[:, 0, 2] = h
    hi = flash(PARAMS + dp, KIJ, T, Z1, midp, branches=BR)
    lo = flash(PARAMS - dp, KIJ, T, Z1, midp, branches=BR)
    for out_idx in range(4):
        fd_out = (np.asarray(hi[out_idx]) - np.asarray(lo[out_idx])) / (2 * h)
        ad = np.asarray(jac_p[out_idx])
        ad_diag = np.stack([ad[b, ..., b, 0, 2] for b in range(len(T))])
        np.testing.assert_allclose(ad_diag, fd_out, rtol=2e-4, atol=2e-9)

    # pressure: beta must fall with p (more liquid), d(beta)/dp < 0
    jac_pr = jax.jacfwd(
        lambda p: _flash_outs(PARAMS, KIJ, T, Z1, p), argnums=0
    )(jnp.asarray(midp))
    db_dp = np.diagonal(np.asarray(jac_pr[0]))
    assert np.all(db_dp < 0.0)
    hp = 1e-6 * midp
    hi = flash(PARAMS, KIJ, T, Z1, midp + hp, branches=BR)
    lo = flash(PARAMS, KIJ, T, Z1, midp - hp, branches=BR)
    for out_idx in range(4):
        fd_out = (np.asarray(hi[out_idx]) - np.asarray(lo[out_idx])) / (
            2 * hp if out_idx == 0 else 2 * hp[:, None]
        )
        ad = np.asarray(jac_pr[out_idx])
        ad_diag = np.stack([ad[b, ..., b] for b in range(len(T))])
        np.testing.assert_allclose(ad_diag, fd_out, rtol=2e-4, atol=2e-9)

    # temperature
    jac_t = jax.jacfwd(
        lambda t: _flash_outs(PARAMS, KIJ, t, Z1, midp), argnums=0
    )(jnp.asarray(T))
    ht = 1e-4
    hi = flash(PARAMS, KIJ, T + ht, Z1, midp, branches=BR)
    lo = flash(PARAMS, KIJ, T - ht, Z1, midp, branches=BR)
    for out_idx in range(4):
        fd_out = (np.asarray(hi[out_idx]) - np.asarray(lo[out_idx])) / (2 * ht)
        ad = np.asarray(jac_t[out_idx])
        ad_diag = np.stack([ad[b, ..., b] for b in range(len(T))])
        np.testing.assert_allclose(ad_diag, fd_out, rtol=2e-4, atol=2e-8)


def check_values_unchanged_by_gradients_flag(midp):
    """gradients=True must not change any primal output."""
    out_g = flash(PARAMS, KIJ, T, Z1, midp, branches=BR, gradients=True)
    out_d = flash(PARAMS, KIJ, T, Z1, midp, branches=BR)
    for a, b in zip(out_g, out_d):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def check_gc_flash_gradients():
    """gc path of the implicit rule: lever-rule anchor + FD in pressure
    (butane/propane at 300 K, the test_flash.test_gc_flash system)."""
    from feos_tpu.models.gc_pcsaft import (
        GcPcSaftMix, gc_flash, static_branches_gc,
    )

    segs = json.loads(
        (Path(__file__).parent / "sauer2014_hetero.json").read_text()
    )
    ident = [r["identifier"] for r in segs]
    col = lambda k: np.array([r["model_record"].get(k, 0) for r in segs])
    parameter = tuple(
        col(k)
        for k in ["m", "sigma", "epsilon_k", "mu", "kappa_ab",
                  "epsilon_k_ab", "na", "nb"]
    )
    B = 3
    eos = GcPcSaftMix(
        ident,
        parameter,
        [[["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]]] * B,
        [[[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]]] * B,
        [],
        None,
    )
    br = static_branches_gc(eos.params)
    t = np.full(B, 300.0)
    z1 = np.array([0.3, 0.5, 0.7])
    p0 = np.full(B, 5e5)
    p_bub, nb = eos.bubble_point(t, z1, p0)
    p_dew, nd = eos.dew_point(t, z1, p0)
    assert not np.any(np.asarray(nb)) and not np.any(np.asarray(nd))
    p = np.sqrt(np.asarray(p_bub) * np.asarray(p_dew))

    def outs(z1_, p_):
        beta, x, y, rho, _ = gc_flash(
            eos.params, t, z1_, p_, branches=br, gradients=True
        )
        return beta, x, y, rho

    beta, x, y, rho = outs(z1, p)

    # lever rule + phase-rule zeros w.r.t. the feed
    db, dx, dy, drho = jax.jacfwd(lambda z: outs(z, p))(jnp.asarray(z1))
    lever = 1.0 / (np.asarray(y)[:, 0] - np.asarray(x)[:, 0])
    np.testing.assert_allclose(np.diagonal(np.asarray(db)), lever,
                               rtol=1e-6)
    for d in (dx, dy, drho):
        np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)

    # FD in pressure
    db, dx, dy, drho = jax.jacfwd(
        lambda p_: outs(z1, p_), argnums=0
    )(jnp.asarray(p))
    hp = 1e-6 * p
    hi = gc_flash(eos.params, t, z1, p + hp, branches=br)
    lo = gc_flash(eos.params, t, z1, p - hp, branches=br)
    for ad, idx in ((db, 0), (dx, 1), (dy, 2), (drho, 3)):
        fd_out = (np.asarray(hi[idx]) - np.asarray(lo[idx])) / (
            2 * hp if idx == 0 else 2 * hp[:, None]
        )
        ad = np.asarray(ad)
        ad_diag = np.stack([ad[b, ..., b] for b in range(B)])
        np.testing.assert_allclose(ad_diag, fd_out, rtol=2e-4, atol=1e-12)


def main():
    midp = _midp()
    for name, fn in [
        ("phase_rule_anchors", lambda: check_phase_rule_anchors(midp)),
        ("fd_kij", lambda: check_fd_kij(midp)),
        ("fd_epsilon_pressure_temperature",
         lambda: check_fd_epsilon_pressure_temperature(midp)),
        ("values_unchanged_by_gradients_flag",
         lambda: check_values_unchanged_by_gradients_flag(midp)),
        ("gc_flash_gradients", check_gc_flash_gradients),
    ]:
        fn()
        print(f"OK {name}", flush=True)
    print("ALL-OK", flush=True)


if __name__ == "__main__":
    main()
