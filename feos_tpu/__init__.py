"""feos-tpu: TPU-native differentiable phase equilibria (PC-SAFT / gc-PC-SAFT).

A ground-up JAX/XLA rebuild of the capabilities of feos-org/feos-torch (see
SURVEY.md): batched, fully differentiable PC-SAFT and gc-PC-SAFT
thermodynamics — vapor pressure, liquid density, equilibrium liquid density,
bubble/dew-point pressures — with exact reverse-mode gradients w.r.t. all
EOS parameters for large-scale parameter regression.

Public API (mirrors the reference feos_torch/__init__.py):

* :class:`PcSaftPure`  — pure-component model + properties
* :class:`PcSaftMix`   — binary homosegmented mixtures + bubble/dew
* :class:`GcPcSaftMix` — heterosegmented group-contribution mixtures

plus a functional API (`feos_tpu.models.*`) designed for ``jax.grad`` /
``jax.jit`` / ``jax.vmap`` composition and a regression module
(:mod:`feos_tpu.regression`) for large-scale parameter fitting.

fp64 is enabled globally at import: the accuracy bars (rtol 1e-8 .. 1e-14,
BASELINE.md) rule out f32-only evaluation.  Solvers may still run mixed
precision internally (f32 warmup, f64 polish).
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .models.pcsaft_pure import PcSaftPure, PureParams  # noqa: E402
from .models.pcsaft_mix import MixParams, PcSaftMix  # noqa: E402
from .models.gc_pcsaft import GcPcSaftMix  # noqa: E402
from . import units  # noqa: E402
from .properties import ResidualProperties  # noqa: E402
from .diagrams import BinaryPxy, BinaryTxy, binary_pxy, binary_txy  # noqa: E402

__version__ = "0.5.0"

__all__ = [
    "PcSaftPure",
    "PcSaftMix",
    "GcPcSaftMix",
    "PureParams",
    "MixParams",
    "ResidualProperties",
    "BinaryPxy",
    "BinaryTxy",
    "binary_pxy",
    "binary_txy",
    "units",
    "__version__",
]
