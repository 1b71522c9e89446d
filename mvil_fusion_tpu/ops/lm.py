"""Generic fixed-iteration Levenberg-Marquardt for small dense problems.

The reference leans on Ceres AutoDiff for its many small solves (VI
initialization stages, SfM BA, extrinsic calibration, pose graph…).  This is
the TPU-native equivalent: residual function + forward-AD Jacobian + damped
normal equations, fixed trip count, optional box bounds via projected steps
(the functional analog of Ceres' SetParameterLowerBound/UpperBound used by
the reference's bounded init, initial_aligment.cpp:221-484).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.utils.precision import full_precision


class LMResult(NamedTuple):
    x: jnp.ndarray
    cost0: jnp.ndarray
    cost: jnp.ndarray
    n_accepted: jnp.ndarray


@full_precision
def lm_solve(residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
             x0: jnp.ndarray, iters: int = 20, mu0: float = 1e-3,
             lower: jnp.ndarray | None = None,
             upper: jnp.ndarray | None = None,
             jitter: float = 1e-9) -> LMResult:
    """Minimize ½‖r(x)‖² over flat vector x with optional box bounds."""
    dtype = x0.dtype
    n = x0.shape[0]

    def clip(x):
        if lower is not None:
            x = jnp.maximum(x, lower)
        if upper is not None:
            x = jnp.minimum(x, upper)
        return x

    def cost_of(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        x, mu, n_acc = carry
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        H = J.T @ J
        g = -J.T @ r
        Hd = H + jnp.diag(mu * jnp.diag(H) + jitter)
        L, low = jax.scipy.linalg.cho_factor(
            Hd + jitter * jnp.eye(n, dtype=dtype), lower=True)
        dx = jax.scipy.linalg.cho_solve((L, low), g)
        x_try = clip(x + dx)
        c0 = 0.5 * jnp.sum(r * r)
        c1 = cost_of(x_try)
        ok = jnp.isfinite(c1) & (c1 < c0)
        x_new = jnp.where(ok, x_try, x)
        mu_new = jnp.where(ok, jnp.maximum(mu * 0.4, 1e-8),
                           jnp.minimum(mu * 5.0, 1e6))
        return (x_new, mu_new, n_acc + ok.astype(jnp.int32)), c0

    init = (clip(x0), jnp.asarray(mu0, dtype), jnp.zeros((), jnp.int32))
    (x, mu, n_acc), costs = jax.lax.scan(step, init, None, length=iters)
    return LMResult(x=x, cost0=costs[0], cost=cost_of(x), n_accepted=n_acc)
