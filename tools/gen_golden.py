"""One-time golden-fixture generator (run at development time only).

The reference's test suite (reference tests/*.py) validates against the FeOs
PyPI package, which is not installable here (SURVEY.md section 4).  The
reference's *torch* Helmholtz implementation is itself pinned against FeOs to
1e-14 by those tests, so it is a valid oracle for Helmholtz-level quantities.
This script executes the reference's pure-torch modules (no native solver
calls) from /root/reference with stub `si_units`/native modules, and vendors
the resulting oracle values as JSON fixtures under tests/golden/.

No reference code is copied into the repository — only numeric outputs.

Usage:  python tools/gen_golden.py
"""

import importlib
import json
import sys
import types
from pathlib import Path

import numpy as np
import torch

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden"

# ---------------------------------------------------------------------------
# Stub modules: si_units constants (CODATA 2018 SI values; MOL treated as a
# count of NAV molecules so that MOL * NAV is dimensionless) and the native
# pyo3 extension (never called on the Helmholtz-only paths we evaluate).
# ---------------------------------------------------------------------------
si = types.ModuleType("si_units")
si.KELVIN = 1.0
si.KB = 1.380649e-23
si.ANGSTROM = 1e-10
si.NAV = 6.02214076e23
si.PASCAL = 1.0
si.MOL = 1.0
si.METER = 1.0
si.KILO = 1000.0
si.JOULE = 1.0
si.RGAS = si.KB * si.NAV
si.BAR = 1e5
sys.modules["si_units"] = si

ft = types.ModuleType("feos_torch")
ft.__path__ = [str(REF / "feos_torch")]


class _StubNative:
    def __init__(self, *a, **k):
        pass


ft.PcSaft = _StubNative
ft.GcPcSaft = _StubNative
sys.modules["feos_torch"] = ft

pcsaft_pure = importlib.import_module("feos_torch.pcsaft_pure")
pcsaft_mix = importlib.import_module("feos_torch.pcsaft_mix")
gc_pcsaft = importlib.import_module("feos_torch.gc_pcsaft")


def gen_pure():
    # parameter grid of reference tests/test_pcsaft_pure.py:10-17
    params = [
        [1.5, 3.2, 350, 0, 0, 0, 0, 0],
        [1.5, 3.2, 150, 2.5, 0.03, 2500, 2, 1],
        [1.5, 3.2, 150, 2.5, 0, 2500, 1, 1],
        [1.5, 3.2, 150, 2.5, 0.03, 0, 1, 1],
        [1.5, 3.2, 150, 2.5, 0, 0, 0, 0],
        [1.5, 3.2, 150, 2.5, 0.03, 2500, 0, 2],
    ]
    T = torch.tensor([300.0] * len(params), dtype=torch.float64)
    rho = torch.tensor([0.001] * len(params), dtype=torch.float64)
    x = torch.tensor(params, dtype=torch.float64)
    eos = pcsaft_pure.PcSaftPure(x)
    a, p, dp = eos.derivatives(T, rho)
    return {
        "params": params,
        "temperature": 300.0,
        "density": 0.001,
        "a": a.tolist(),
        "p": p.tolist(),
        "dp": dp.tolist(),
    }


def gen_mix():
    # parameter grid of reference tests/test_pcsaft_mix.py:17-34 (14 cases)
    params = [
        [[1.5, 3.2, 150, 0, 0, 0, 0, 0], [2.5, 3.5, 250, 0, 0, 0, 0, 0]],
        [[1.5, 3.2, 150, 2.5, 0, 0, 0, 0], [2.5, 3.5, 250, 0, 0, 0, 0, 0]],
        [[1.5, 3.2, 150, 0, 0, 0, 0, 0], [2.5, 3.5, 250, 2, 0, 0, 0, 0]],
        [[1.5, 3.2, 150, 2.5, 0, 0, 0, 0], [2.5, 3.5, 250, 2, 0, 0, 0, 0]],
        [[1.5, 3.2, 150, 0, 0.03, 2500, 2, 1], [2.5, 3.5, 250, 0, 0, 0, 0, 0]],
        [[1.5, 3.2, 150, 0, 0, 0, 0, 0], [2.5, 3.5, 250, 0, 0.025, 1500, 1, 2]],
        [[1.5, 3.2, 150, 0, 0.03, 2500, 1, 1], [2.5, 3.5, 250, 0, 0.025, 1500, 1, 1]],
        [[1.5, 3.2, 150, 2.5, 0.03, 2500, 1, 1], [2.5, 3.5, 250, 2, 0.025, 1500, 1, 1]],
        [[1.5, 3.2, 150, 0, 0.03, 2500, 1, 1], [2.5, 3.5, 250, 0, 0.025, 1500, 0, 1]],
        [[1.5, 3.2, 150, 0, 0.03, -500, 0, 2], [2.5, 3.5, 250, 0, 0.025, 1500, 1, 1]],
        [[1.5, 3.2, 150, 0, 0, 0, 0, 0], [2.5, 3.5, 250, 0, 0.025, 1500, 0, 1]],
        [[1.5, 3.2, 150, 0, 0.03, 2500, 2, 2], [2.5, 3.5, 250, 0, 0.025, 1500, 1, 1]],
        [[1.5, 3.2, 150, 0, 0.03, 2500, 2, 2], [2.5, 3.5, 250, 0, 0.025, 1500, 1, 1]],
        [[1.5, 3.2, 150, 0, 0.03, 2500, 1, 2], [2.5, 3.5, 250, 0, 0.025, 1500, 2, 1]],
    ]
    labels = [
        "np/np", "p/np", "np/p", "p/p", "a/np", "np/a", "a/a", "ap/ap",
        "a/x", "x/a", "np/x", "aa/a", "a/a k", "aa/aa",
    ]
    kij = torch.tensor([[-0.05, 0]] * len(params), dtype=torch.float64)
    kij[12, 1] = 3000
    x = torch.tensor(params, dtype=torch.float64)
    T = torch.tensor([300.0] * len(params), dtype=torch.float64)
    rho = torch.tensor([[0.001, 0.002]] * len(params), dtype=torch.float64)
    eos = pcsaft_mix.PcSaftMix(x, kij)
    a = eos.helmholtz_energy_density(T, rho)
    a2, p, mu, v = eos.derivatives(T, rho)
    return {
        "labels": labels,
        "params": params,
        "kij": kij.tolist(),
        "temperature": 300.0,
        "density": [0.001, 0.002],
        "a": a[:, 0].tolist(),
        "p": p.tolist(),
        "mu": mu.tolist(),
        "v": v.tolist(),
    }


def gen_gc():
    # topology grid of reference tests/test_gc_pcsaft.py:17-46 (11 cases)
    segment_lists = [
        [["CH3", "CH2", "CH2", "CH3"], ["CH3", "CH2", "CH3"]],
        [["CH3", ">CH", "CH3", "CH3"], ["CH3", ">C<", "CH3", "CH3", "CH3"]],
        [["CH3", ">CH", "CH3", "CH=O"], ["CH3", ">C<", "CH3", "CH3", "CH3"]],
        [["CH3", ">CH", "CH3", "CH3"], ["CH3", ">C<", "CH3", "CH3", "HCOO"]],
        [["CH3", ">CH", "CH3", "CH=O"], ["CH3", ">C<", "CH3", "CH3", "HCOO"]],
        [["CH3", ">CH", "CH3", "OH"], ["CH3", ">C<", "CH3", "CH3", "CH3"]],
        [["CH3", ">CH", "CH3", "CH3"], ["CH3", ">C<", "CH3", "CH3", "NH2"]],
        [["CH3", ">CH", "CH3", "OH"], ["CH3", ">C<", "CH3", "CH3", "NH2"]],
        [["CH3", ">CH", "CH=O", "OH"], ["CH3", ">C<", "CH3", "HCOO", "NH2"]],
        [["CH3", ">CH", "CH=O", "OH"], ["CH3", ">C<", "CH3", "CH2", "IA"]],
        [["CH3", ">CH", "CH=O", "IA"], ["CH3", ">C<", "CH3", "CH2", "IA"]],
    ]
    bond_lists = [
        [[[0, 1], [1, 2], [2, 3]], [[0, 1], [1, 2]]],
    ] + [
        [[[0, 1], [1, 2], [1, 3]], [[0, 1], [1, 2], [1, 3], [1, 4]]]
    ] * 10
    labels = [
        "np/np", "np/np branched", "np/p", "p/np", "p/p", "a/np", "np/a",
        "a/a", "ap/ap", "a/x", "x/x",
    ]
    kab_list = [("CH3", "CH=O", 0.03), (">CH", "HCOO", -0.01)]
    phi = torch.tensor([[1.1, 0.98]] * len(segment_lists), dtype=torch.float64)

    with open(REF / "tests" / "sauer2014_hetero.json") as f:
        segment_records = json.load(f)
    segment_identifier = [r["identifier"] for r in segment_records]

    def col(key):
        return torch.tensor(
            [r["model_record"].get(key, 0) for r in segment_records],
            dtype=torch.float64,
        )

    parameter = (
        col("m"), col("sigma"), col("epsilon_k"), col("mu"),
        col("kappa_ab"), col("epsilon_k_ab"), col("na"), col("nb"),
    )
    T = torch.tensor([300.0] * len(segment_lists), dtype=torch.float64)
    rho = torch.tensor([[0.001, 0.002]] * len(segment_lists), dtype=torch.float64)
    eos = gc_pcsaft.GcPcSaftMix(
        segment_identifier, parameter, segment_lists, bond_lists, kab_list, phi
    )
    a = eos.helmholtz_energy_density(T, rho)
    a2, p, mu, v = eos.derivatives(T, rho)
    return {
        "labels": labels,
        "segment_lists": segment_lists,
        "bond_lists": bond_lists,
        "kab_list": [list(k) for k in kab_list],
        "phi": phi.tolist(),
        "temperature": 300.0,
        "density": [0.001, 0.002],
        "a": a[:, 0].tolist(),
        "p": p.tolist(),
        "mu": mu.tolist(),
        "v": v.tolist(),
    }


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, fn in [("pure", gen_pure), ("mix", gen_mix), ("gc", gen_gc)]:
        data = fn()
        path = OUT / f"{name}_helmholtz.json"
        path.write_text(json.dumps(data, indent=1))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
