"""Failure-mask utilities.

The reference compacts failed rows away in place (``reduce``,
feos_torch/pcsaft_pure.py:235-243), which is a dynamic shape — impossible
under jit/TPU and also a documented footgun (single-shot semantics,
misaligned reuse; SURVEY.md section 5).  This framework instead returns
fixed-shape outputs with NaN at failed rows plus a boolean mask; these
helpers cover the places where users genuinely want compaction (host-side
post-processing) or mask-aware reductions (inside jitted losses).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compact(nans, *arrays):
    """Host-side equivalent of the reference's ``reduce``: drop failed rows.

    Returns the arrays with rows where ``nans`` is True removed.  Not
    jittable (dynamic shapes) — use :func:`masked_mean` & friends inside
    compiled code.
    """
    keep = ~np.asarray(nans)
    return tuple(np.asarray(a)[keep] for a in arrays)


def masked_mean(values, nans, fill=0.0):
    """Mean over converged rows; jit-safe (fixed shapes)."""
    ok = ~nans
    n = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, values, fill)) / n


def masked_sum(values, nans, fill=0.0):
    """Sum over converged rows; jit-safe (fixed shapes)."""
    return jnp.sum(jnp.where(~nans, values, fill))
