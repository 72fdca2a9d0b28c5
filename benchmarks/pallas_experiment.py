"""Pallas experiment: fused (phi, phi', phi'') kernel vs the XLA graph.

SURVEY.md section 7 names a fused batched residual+derivative Pallas
kernel as a candidate design for the pure-VLE hot loop.  This script
measures that claim on the real chip.  Scope and framing:

* TPU Pallas kernels are f32 (the VPU is f32; the f64 path everywhere
  else in this library is XLA's float-float *emulation*, which Pallas
  does not provide).  The apples-to-apples comparison is therefore the
  f32 fused evaluation — exactly the arithmetic of the solvers' f32
  warmup phase, where the bulk of Newton iterations run.
* The kernel evaluates the complete pure-component PC-SAFT Helmholtz
  energy density (hs + hc + dispersion + dipole + association) together
  with its first and second density derivatives via nested forward-mode
  seeds, on (8, 128) VMEM blocks — one HBM read of the 10 input columns,
  one HBM write of the 3 outputs, all intermediates in registers/VMEM.
* Baselines: (a) the library's production graph
  ``vmap(value_and_2derivs(phi_pure))`` under jit, f32; (b) the same
  elementwise formulation as the kernel but left to XLA's fusion, f32;
  (c) the emulated-f64 production graph for context.

Run on the TPU:  python benchmarks/pallas_experiment.py
Results recorded in docs/design.md ("Pallas experiment").
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feos_tpu.constants import A0, A1, A2, B0, B1, B2, AD, BD, CD
from feos_tpu.models.pcsaft_pure import PureParams, phi_pure
from feos_tpu.ops.derivatives import value_and_2derivs
from feos_tpu.units import MU2_FACTOR

PI = np.pi

# block shape: 32 sublanes x 128 lanes (4096 rows/program measured best:
# (8,128) pays per-step grid overhead x2, (512,128) overflows VMEM with
# the ~40 live intermediates of the nested-jvp chain)
BLK_R, BLK_C = 32, 128


def phi_elementwise(P, T, rho):
    """phi_pure's math in fully elementwise form (any array shape).

    Identical physics to :func:`feos_tpu.models.pcsaft_pure.phi_pure`;
    the eta-power integrals are unrolled scalar-coefficient polynomials
    instead of (7,)-vector dots so every op broadcasts over the block.
    """
    m, sigma, epsilon_k, mu, kappa_ab, epsilon_k_ab, na, nb = P
    d = sigma * (1.0 - 0.12 * jnp.exp(-3.0 * epsilon_k / T))
    eta = PI / 6.0 * m * rho * d * d * d
    eta2 = eta * eta
    eta_m1 = 1.0 / (1.0 - eta)
    eta_m2 = eta_m1 * eta_m1

    hs = m * rho * (4.0 * eta - 3.0 * eta2) * eta_m2
    g = (1.0 - eta / 2.0) * eta_m1 * eta_m2
    hc = -rho * (m - 1.0) * jnp.log(g)

    e = epsilon_k / T
    s3 = sigma * sigma * sigma
    m1 = (m - 1.0) / m
    m2 = (m - 2.0) / m
    # Horner evaluation of the I1/I2 eta polynomials with per-block
    # scalar coefficients
    I1 = jnp.zeros_like(eta)
    I2 = jnp.zeros_like(eta)
    for i in range(6, -1, -1):
        ca = m1 * (m2 * float(A2[i]) + float(A1[i])) + float(A0[i])
        cb = m1 * (m2 * float(B2[i]) + float(B1[i])) + float(B0[i])
        I1 = I1 * eta + ca
        I2 = I2 * eta + cb
    C1 = 1.0 / (
        1.0
        + m * (8.0 * eta - 2.0 * eta2) * eta_m2 * eta_m2
        + (1.0 - m)
        * (20.0 * eta - 27.0 * eta2 + 12.0 * eta2 * eta - 2.0 * eta2 * eta2)
        / ((1.0 - eta) * (1.0 - eta) * (2.0 - eta) * (2.0 - eta))
    )
    I = 2.0 * I1 + C1 * I2 * m * e
    disp = (-PI * rho * rho * m * m * e * s3) * I

    mu2 = mu * mu / (m * s3 * epsilon_k) * MU2_FACTOR
    mu2 = mu2 * e * s3
    mc = jnp.minimum(m, 2.0)
    md1 = (mc - 1.0) / mc
    md2 = md1 * (mc - 2.0) / mc
    J1 = jnp.zeros_like(eta)
    for i in range(4, -1, -1):
        ad = float(AD[i][0]) + md1 * float(AD[i][1]) + md2 * float(AD[i][2])
        bd = float(BD[i][0]) + md1 * float(BD[i][1]) + md2 * float(BD[i][2])
        J1 = J1 * eta + (ad + bd * e)
    J2 = jnp.zeros_like(eta)
    for i in range(3, -1, -1):
        cd = float(CD[i][0]) + md1 * float(CD[i][1]) + md2 * float(CD[i][2])
        J2 = J2 * eta + cd
    phi2 = -rho * rho * J1 / s3 * PI
    ratio = rho * (J2 / jnp.where(J1 != 0.0, J1, 1.0)) * (4.0 / 3.0 * PI)
    dipole = phi2 * mu2 * mu2 / (1.0 - ratio * mu2)

    delta_assoc = (jnp.exp(epsilon_k_ab / T) - 1.0) * s3 * kappa_ab
    k = eta * eta_m1
    delta = (1.0 + k * (1.5 + 0.5 * k)) * eta_m1 * delta_assoc
    rhoa = na * rho
    rhob = nb * rho
    aux = 1.0 + (rhoa - rhob) * delta
    sqrt = jnp.sqrt(aux * aux + 4.0 * rhob * delta)
    xa = 2.0 / (sqrt + 1.0 + (rhob - rhoa) * delta)
    xb = 2.0 / (sqrt + 1.0 - (rhob - rhoa) * delta)
    assoc = rhoa * (jnp.log(xa) - 0.5 * xa + 0.5) + rhob * (
        jnp.log(xb) - 0.5 * xb + 0.5
    )
    return hs + hc + disp + dipole + assoc


def _fused_d2(P, T, rho):
    """(phi, phi', phi'') via nested forward-mode on the elementwise phi."""
    f = lambda r: phi_elementwise(P, T, r)

    def first(r):
        return jax.jvp(f, (r,), (jnp.ones_like(r),))

    (v, d1), (_, d2) = jax.jvp(first, (rho,), (jnp.ones_like(rho),))
    return v, d1, d2


def _kernel(m, sig, eps, mu, kap, epsab, na, nb, T, rho, phi_o, d1_o, d2_o):
    P = (m[:], sig[:], eps[:], mu[:], kap[:], epsab[:], na[:], nb[:])
    v, d1, d2 = _fused_d2(P, T[:], rho[:])
    phi_o[:] = v
    d1_o[:] = d1
    d2_o[:] = d2


def pallas_fused(cols, T, rho):
    """cols: tuple of 8 (R, 128) arrays; T/rho (R, 128).  R % 8 == 0."""
    R = T.shape[0]
    grid = (R // BLK_R,)
    # 0 * i keeps the column index i32 under jax_enable_x64 (a literal 0
    # becomes i64 and Mosaic rejects the mixed-type index map)
    blk = pl.BlockSpec(
        (BLK_R, BLK_C), lambda i: (i, 0 * i), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((R, BLK_C), jnp.float32)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[blk] * 10,
        out_specs=(blk, blk, blk),
        out_shape=(out_shape, out_shape, out_shape),
    )(*cols, T, rho)


def main():
    B = 131072  # 1024 blocks of (8, 128)
    import bench

    params, T = bench.make_batch(B)
    # evaluation states: liquid-ish density per row (eta ~ 0.4)
    d = params[:, 1] * (1.0 - 0.12 * np.exp(-3.0 * params[:, 2] / T))
    rho = 0.4 * 6.0 / np.pi / (params[:, 0] * d**3)

    f32 = jnp.float32
    cols2d = tuple(
        jnp.asarray(params[:, i].reshape(-1, BLK_C), f32) for i in range(8)
    )
    T2d = jnp.asarray(T.reshape(-1, BLK_C), f32)
    rho2d = jnp.asarray(rho.reshape(-1, BLK_C), f32)

    p32 = PureParams(*(jnp.asarray(params[:, i], f32) for i in range(8)))
    T32 = jnp.asarray(T, f32)
    rho32 = jnp.asarray(rho, f32)
    p64 = PureParams(*(jnp.asarray(params[:, i]) for i in range(8)))

    def timeit(fn, *args, reps=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps, out

    # (a) production graph, f32
    prod32 = jax.jit(
        jax.vmap(
            lambda p, t, r: value_and_2derivs(lambda rr: phi_pure(p, t, rr), r)
        )
    )
    dt_prod32, out_prod32 = timeit(prod32, p32, T32, rho32)

    # (b) XLA on the same elementwise formulation, f32
    xla_elem = jax.jit(lambda c, t, r: _fused_d2(c, t, r))
    dt_xla, out_xla = timeit(xla_elem, tuple(jnp.asarray(params[:, i], f32) for i in range(8)), T32, rho32)

    # (c) Pallas kernel, f32
    pk = jax.jit(pallas_fused)
    dt_pallas, out_pallas = timeit(pk, cols2d, T2d, rho2d)

    # (d) emulated-f64 production graph, for context
    prod64 = jax.jit(
        jax.vmap(
            lambda p, t, r: value_and_2derivs(lambda rr: phi_pure(p, t, rr), r)
        )
    )
    dt_prod64, out_prod64 = timeit(
        prod64, p64, jnp.asarray(T), jnp.asarray(rho), reps=10
    )

    # correctness: all f32 variants vs the f64 graph.  f32 second
    # derivatives carry cancellation error up to ~4e-3 relative on the
    # hardest rows (which is exactly why the production solvers polish in
    # f64); a scale-aware bound checks the variants compute the same thing
    ref = [np.asarray(o, np.float64) for o in out_prod64]

    def check(name, out):
        for r, o in zip(ref, out):
            o = np.asarray(o, np.float64).reshape(r.shape)
            err = np.max(np.abs(o - r) / (np.abs(r) + 1e-6 * np.max(np.abs(r))))
            assert err < 2e-2, (name, err)

    check("prod32", out_prod32)
    check("xla_elem", out_xla)
    check("pallas", out_pallas)

    dev = jax.devices()[0].device_kind
    for name, dt in (
        ("fused_d2_prod_f32_us_per_1k", dt_prod32),
        ("fused_d2_xla_elementwise_f32_us_per_1k", dt_xla),
        ("fused_d2_pallas_f32_us_per_1k", dt_pallas),
        ("fused_d2_prod_emulated_f64_us_per_1k", dt_prod64),
    ):
        print(json.dumps({
            "metric": name,
            "value": round(dt / (B / 1000) * 1e6, 3),
            "unit": "us",
            "device": dev,
        }))
    print(json.dumps({
        "metric": "pallas_speedup_vs_prod_f32",
        "value": round(dt_prod32 / dt_pallas, 3),
        "unit": "x",
    }))


if __name__ == "__main__":
    main()
