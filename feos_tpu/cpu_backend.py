"""ctypes bindings for the native CPU solver backend (csrc/pcsaft_cpu.cpp).

The framework's analogue of the reference's Rust/pyo3 extension module
(reference src/lib.rs:10-16 exporting ``PcSaft``): batched gradient-free
pure-component solvers running OpenMP-parallel on the host.  The TPU
production path never calls this — it exists for CPU-only deployments and
as an independent implementation for cross-validating the JAX solvers.

The shared library is built on first use (``make -C csrc``); all entry
points raise ``RuntimeError`` with the build log if no C++ toolchain is
available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .units import PA_PER_KT_TO_REDUCED

_CSRC = Path(__file__).resolve().parent.parent / "csrc"
_LIB_PATH = _CSRC / "libfeos_cpu.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        proc = subprocess.run(
            ["make", "-C", str(_CSRC)], capture_output=True, text=True
        )
        if proc.returncode != 0 or not _LIB_PATH.exists():
            raise RuntimeError(
                f"failed to build native backend:\n{proc.stdout}\n{proc.stderr}"
            )
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.feos_vapor_pressure.argtypes = [dp, dp, ctypes.c_int64, dp, u8]
    lib.feos_liquid_density.argtypes = [dp, dp, dp, ctypes.c_int64, dp, u8]
    lib.feos_derivatives.argtypes = [dp, dp, dp, ctypes.c_int64, dp]
    lib.feos_mix_vle.argtypes = [
        dp, dp, dp, dp, dp, ctypes.c_int64, ctypes.c_int32, dp, dp, u8
    ]
    lib.feos_mix_derivatives.argtypes = [dp, dp, dp, dp, ctypes.c_int64, dp]
    i8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    lib.feos_mix_flash.argtypes = [
        dp, dp, dp, dp, dp, ctypes.c_int64, dp, dp, dp, dp, i8
    ]
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.feos_gc_flash.argtypes = [
        ctypes.c_int64, dp, dp, dp, ctypes.c_int64, i32, i32, dp, dp, dp, dp,
        dp, dp, dp, ctypes.c_int64, dp, dp, dp, dp, i8,
    ]
    lib.feos_gc_vle.argtypes = [
        ctypes.c_int64, dp, dp, dp, ctypes.c_int64, i32, i32, dp, dp, dp, dp,
        dp, dp, dp, ctypes.c_int64, ctypes.c_int32, dp, dp, u8,
    ]
    lib.feos_gc_derivatives.argtypes = [
        ctypes.c_int64, dp, dp, dp, ctypes.c_int64, i32, i32, dp, dp, dp, dp,
        dp, dp, ctypes.c_int64, dp,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (RuntimeError, OSError):
        return False


def vapor_pressure_densities(parameters, temperature):
    """Batched VLE solve: returns ``(rho (n, 2) [rho_V, rho_L] in A^-3, ok)``.

    Mirrors the native contract of reference src/pcsaft.rs:82-103 with
    fixed-shape NaN-filled outputs instead of compaction.
    """
    lib = _load()
    parameters = np.ascontiguousarray(parameters, dtype=np.float64)
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    n = temperature.shape[0]
    rho = np.empty((n, 2), dtype=np.float64)
    ok = np.empty(n, dtype=np.uint8)
    lib.feos_vapor_pressure(parameters, temperature, n, rho, ok)
    return rho, ok.astype(bool)


def liquid_density_reduced(parameters, temperature, pressure):
    """Batched NPT liquid solve: returns ``(rho (n,) in A^-3, ok)``.

    ``pressure`` in Pa (converted to reduced units internally, as the
    reference does at feos_torch/pcsaft_pure.py:196).
    """
    lib = _load()
    parameters = np.ascontiguousarray(parameters, dtype=np.float64)
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    p_red = np.ascontiguousarray(
        np.asarray(pressure, dtype=np.float64)
        / temperature
        * PA_PER_KT_TO_REDUCED
    )
    n = temperature.shape[0]
    rho = np.empty(n, dtype=np.float64)
    ok = np.empty(n, dtype=np.uint8)
    lib.feos_liquid_density(parameters, temperature, p_red, n, rho, ok)
    return rho, ok.astype(bool)


def derivatives(parameters, temperature, density):
    """Batched (phi, p~, dp~/drho) — cross-validation hook."""
    lib = _load()
    parameters = np.ascontiguousarray(parameters, dtype=np.float64)
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    density = np.ascontiguousarray(density, dtype=np.float64)
    n = temperature.shape[0]
    out = np.empty((n, 3), dtype=np.float64)
    lib.feos_derivatives(parameters, temperature, density, n, out)
    return out[:, 0], out[:, 1], out[:, 2]


def mix_vle_densities(parameters, kij, temperature, molefracs, pressure, bubble):
    """Batched binary bubble/dew solve — the oracle for the JAX mixture VLE.

    ``parameters`` (n, 2, 8), ``kij`` (n, 2) = [k_ij, eps_k_AiBj] (or None),
    ``pressure`` the initial estimate in Pa.  Returns ``(rho (n, 4) =
    [rho_V_1, rho_V_2, rho_L_1, rho_L_2] in A^-3, p (n,) solved pressure in
    Pa, ok (n,))`` — the reference native contract (src/pcsaft.rs:150-214)
    with fixed-shape NaN-filled outputs plus the equilibrium pressure.
    """
    lib = _load()
    parameters = np.ascontiguousarray(parameters, dtype=np.float64)
    n = parameters.shape[0]
    kij = (
        np.zeros((n, 2))
        if kij is None
        else np.ascontiguousarray(kij, dtype=np.float64)
    )
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    molefracs = np.ascontiguousarray(molefracs, dtype=np.float64)
    p0_red = np.ascontiguousarray(
        np.asarray(pressure, dtype=np.float64)
        / temperature
        * PA_PER_KT_TO_REDUCED
    )
    rho = np.empty((n, 4), dtype=np.float64)
    pt = np.empty(n, dtype=np.float64)
    ok = np.empty(n, dtype=np.uint8)
    lib.feos_mix_vle(
        parameters, kij, temperature, molefracs, p0_red, n,
        1 if bubble else 0, rho, pt, ok,
    )
    p_pa = pt * temperature / PA_PER_KT_TO_REDUCED
    return rho, p_pa, ok.astype(bool)


def mix_flash(parameters, kij, temperature, molefracs, pressure):
    """Batched isothermal TP flash — the independent oracle for
    :func:`feos_tpu.models.pcsaft_mix.flash`.

    ``pressure`` in Pa.  Returns ``(beta (n,), x (n, 2), y (n, 2),
    rho (n, 2) = [rho_L, rho_V] in A^-3, phase (n,) int8)`` with the
    :func:`solvers.flash.flash_window` phase codes (0 liquid, 1 vapor,
    2 two-phase, -1 failed); beta/x/y/rho are NaN off two-phase rows.
    """
    lib = _load()
    parameters = np.ascontiguousarray(parameters, dtype=np.float64)
    n = parameters.shape[0]
    kij = (
        np.zeros((n, 2))
        if kij is None
        else np.ascontiguousarray(kij, dtype=np.float64)
    )
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    molefracs = np.ascontiguousarray(molefracs, dtype=np.float64)
    p_red = np.ascontiguousarray(
        np.asarray(pressure, dtype=np.float64)
        / temperature
        * PA_PER_KT_TO_REDUCED
    )
    beta = np.empty(n, dtype=np.float64)
    x = np.empty((n, 2), dtype=np.float64)
    y = np.empty((n, 2), dtype=np.float64)
    rho = np.empty((n, 2), dtype=np.float64)
    phase = np.empty(n, dtype=np.int8)
    lib.feos_mix_flash(
        parameters, kij, temperature, molefracs, p_red, n, beta, x, y, rho,
        phase,
    )
    return beta, x, y, rho, phase


def gc_flash(gc_params, temperature, molefracs, pressure):
    """Batched gc isothermal TP flash — the independent oracle for
    :func:`feos_tpu.models.gc_pcsaft.gc_flash`; same contract as
    :func:`mix_flash`."""
    lib = _load()
    S, sigma, eps_k, kab, P, ba, bb, m, bonds_p, phi_corr, comp = _gc_pack(
        gc_params
    )
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    molefracs = np.ascontiguousarray(molefracs, dtype=np.float64)
    p_red = np.ascontiguousarray(
        np.asarray(pressure, dtype=np.float64)
        / temperature
        * PA_PER_KT_TO_REDUCED
    )
    n = temperature.shape[0]
    beta = np.empty(n, dtype=np.float64)
    x = np.empty((n, 2), dtype=np.float64)
    y = np.empty((n, 2), dtype=np.float64)
    rho = np.empty((n, 2), dtype=np.float64)
    phase = np.empty(n, dtype=np.int8)
    lib.feos_gc_flash(
        S, sigma, eps_k, kab, P, ba, bb, m, bonds_p, phi_corr, comp,
        temperature, molefracs, p_red, n, beta, x, y, rho, phase,
    )
    return beta, x, y, rho, phase


def _gc_pack(gc_params):
    """Flatten an assembled ``GcParams`` pytree into the contiguous arrays
    the native gc entry points consume (shared segment table + per-item
    component aggregates).  Only concrete (non-traced) parameters are
    supported — the oracle is a host-side cross-validation tool."""
    g = gc_params
    sigma = np.ascontiguousarray(g.sigma, dtype=np.float64)
    eps_k = np.ascontiguousarray(g.epsilon_k, dtype=np.float64)
    kab = np.ascontiguousarray(g.kab, dtype=np.float64)
    bond_a = np.ascontiguousarray(g.bond_a, dtype=np.int32)
    bond_b = np.ascontiguousarray(g.bond_b, dtype=np.int32)
    m = np.ascontiguousarray(g.m, dtype=np.float64)  # (B, 2, S)
    bonds_p = np.ascontiguousarray(g.bonds_p, dtype=np.float64)  # (B, 2, P)
    phi_corr = np.ascontiguousarray(g.phi_corr, dtype=np.float64)  # (B, 2)
    comp = np.ascontiguousarray(
        np.stack(
            [
                np.asarray(x, dtype=np.float64)
                for x in (
                    g.m_mix, g.sigma_mix, g.epsilon_k_mix, g.mu2,
                    g.sigma_assoc, g.epsilon_k_assoc, g.kappa_ab,
                    g.epsilon_k_ab, g.na, g.nb,
                )
            ],
            axis=1,
        )
    )  # (B, 10, 2)
    S = sigma.shape[0]
    P = bond_a.shape[0]
    return S, sigma, eps_k, kab, P, bond_a, bond_b, m, bonds_p, phi_corr, comp


def gc_vle_densities(gc_params, temperature, molefracs, pressure, bubble):
    """Batched gc bubble/dew solve — the independent oracle for the JAX gc
    VLE path (``GcPcSaftMix.bubble_point/dew_point``).

    ``gc_params`` is an assembled :class:`feos_tpu.models.gc_pcsaft.GcParams`
    batch; ``pressure`` the initial estimate in Pa.  Returns ``(rho (n, 4) =
    [rho_V_1, rho_V_2, rho_L_1, rho_L_2] in A^-3, p (n,) solved pressure in
    Pa, ok (n,))`` — the reference native contract
    (src/gc_pcsaft.rs:103-171) with fixed-shape NaN-filled outputs."""
    lib = _load()
    S, sigma, eps_k, kab, P, ba, bb, m, bonds_p, phi_corr, comp = _gc_pack(
        gc_params
    )
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    molefracs = np.ascontiguousarray(molefracs, dtype=np.float64)
    p0_red = np.ascontiguousarray(
        np.asarray(pressure, dtype=np.float64)
        / temperature
        * PA_PER_KT_TO_REDUCED
    )
    n = temperature.shape[0]
    rho = np.empty((n, 4), dtype=np.float64)
    pt = np.empty(n, dtype=np.float64)
    ok = np.empty(n, dtype=np.uint8)
    lib.feos_gc_vle(
        S, sigma, eps_k, kab, P, ba, bb, m, bonds_p, phi_corr, comp,
        temperature, molefracs, p0_red, n, 1 if bubble else 0, rho, pt, ok,
    )
    p_pa = pt * temperature / PA_PER_KT_TO_REDUCED
    return rho, p_pa, ok.astype(bool)


def gc_derivatives(gc_params, temperature, density):
    """Batched gc (phi, p~, mu_1, mu_2) — cross-validation hook.

    ``mu_i`` are *total* reduced chemical potentials (residual + ln rho_i).
    """
    lib = _load()
    S, sigma, eps_k, kab, P, ba, bb, m, bonds_p, phi_corr, comp = _gc_pack(
        gc_params
    )
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    density = np.ascontiguousarray(density, dtype=np.float64)
    n = temperature.shape[0]
    out = np.empty((n, 4), dtype=np.float64)
    lib.feos_gc_derivatives(
        S, sigma, eps_k, kab, P, ba, bb, m, bonds_p, phi_corr, comp,
        temperature, density, n, out,
    )
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3]


def mix_derivatives(parameters, kij, temperature, density):
    """Batched mixture (phi, p~, mu_1, mu_2) — cross-validation hook.

    ``mu_i`` are *total* reduced chemical potentials (residual + ln rho_i).
    """
    lib = _load()
    parameters = np.ascontiguousarray(parameters, dtype=np.float64)
    n = parameters.shape[0]
    kij = (
        np.zeros((n, 2))
        if kij is None
        else np.ascontiguousarray(kij, dtype=np.float64)
    )
    temperature = np.ascontiguousarray(temperature, dtype=np.float64)
    density = np.ascontiguousarray(density, dtype=np.float64)
    out = np.empty((n, 4), dtype=np.float64)
    lib.feos_mix_derivatives(parameters, kij, temperature, density, n, out)
    return out[:, 0], out[:, 1], out[:, 2], out[:, 3]
