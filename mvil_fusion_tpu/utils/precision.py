"""Matmul-precision control.

On TPU, XLA's default f32 matmul uses bf16 MXU passes — fine for the big
perception kernels, but the tiny solver matrices (Hessians, Schur
complements, covariance propagation) need full f32 accumulation or LM
convergence degrades by orders of magnitude (observed: window-BA cost
0.5 vs 1.5e-3 at bf16 vs f32 on a v5e).  Decorate solver entry points with
@full_precision; perception kernels stay at the fast default.
"""

from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Trace `fn` under jax.default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
