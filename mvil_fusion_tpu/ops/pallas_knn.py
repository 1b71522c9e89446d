"""Fused brute-force k-NN as a Pallas TPU kernel.

The LOAM correspondence search is the engine's biggest single matmul
(ops/loam_icp.py knn: (Nq,3) queries vs (Nr,3) map points).  The XLA
path materializes the full (Nq,Nr) squared-distance matrix in HBM —
at reference scale (4096 x 32768) that is 512 MB of HBM write+read
traffic per association pass, pure bandwidth waste.  This kernel tiles
queries over the grid, streams the reference through VMEM in chunks,
computes each (TILE_Q, TILE_R) score tile on the MXU and folds it into a
running top-k ENTIRELY in VMEM — the distance matrix never exists.

Score trick: with homogeneous queries q4 = [qx,qy,qz,1] and references
r4 = [-2rx,-2ry,-2rz, r2(+mask penalty)], the matmul q4 @ r4^T gives
(r2 - 2 q.r); adding the per-query q2 afterwards (outside the kernel)
yields the true squared distance.  q2 is constant per row so the
RANKING inside the kernel is unaffected.

The kernel is validated in interpreter mode on CPU
(tests/test_pallas_knn.py); `loam_icp.knn` switches to it on TPU when
MVIL_PALLAS_KNN=1 (kept opt-in until profiled on hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_Q = 128          # query rows per grid program
TILE_R = 2048         # reference chunk streamed per inner iteration
_BIG = 1e30           # masked / padded score


def _knn_kernel(q4_ref, r4t_ref, scores_ref, idx_ref, *, k: int,
                n_chunks: int):
    """One TILE_Q query block vs the whole reference (chunked).

    q4_ref: (TILE_Q, 4) VMEM; r4t_ref: (4, R_pad) VMEM;
    scores_ref/idx_ref: (TILE_Q, k) outputs."""
    dtype = jnp.float32

    def merge_chunk(j, carry):
        best_s, best_i = carry                        # (TILE_Q, k) each
        r4t = r4t_ref[:, pl.ds(j * TILE_R, TILE_R)]   # (4, TILE_R)
        tile = jnp.dot(q4_ref[:], r4t,
                       preferred_element_type=dtype)  # (TILE_Q, TILE_R)
        # combined candidate pool: current best ++ this chunk
        comb_s = jnp.concatenate([best_s, tile], axis=1)
        col_off = (j * TILE_R - k).astype(jnp.int32)
        cand_i = (jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, k + TILE_R),
                                           1) + col_off)
        comb_i = jnp.concatenate([best_i, cand_i[:, k:]], axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, k + TILE_R), 1)

        def extract(p, c2):
            s, i_, new_s, new_i = c2
            m = jnp.min(s, axis=1)                            # (TILE_Q,)
            arg = jnp.argmin(s, axis=1).astype(jnp.int32)     # (TILE_Q,)
            sel = cols == arg[:, None]
            picked_i = jnp.sum(jnp.where(sel, i_, 0), axis=1)
            new_s = new_s.at[:, p].set(m)
            new_i = new_i.at[:, p].set(picked_i)
            s = jnp.where(sel, _BIG, s)                       # retire winner
            return s, i_, new_s, new_i

        _, _, best_s, best_i = jax.lax.fori_loop(
            0, k, extract,
            (comb_s, comb_i,
             jnp.full((TILE_Q, k), _BIG, dtype),
             jnp.zeros((TILE_Q, k), jnp.int32)))
        return best_s, best_i

    best_s = jnp.full((TILE_Q, k), _BIG, dtype)
    best_i = jnp.zeros((TILE_Q, k), jnp.int32)
    best_s, best_i = jax.lax.fori_loop(0, n_chunks, merge_chunk,
                                       (best_s, best_i))
    scores_ref[:] = best_s
    idx_ref[:] = best_i


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_topk(query: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray,
             k: int, interpret: bool = False):
    """Drop-in replacement for loam_icp.knn: (idx (Nq,k), d2 (Nq,k)).

    Masked reference rows never win (their score is +1e30; the returned
    d2 there is huge, so downstream distance gates reject them exactly
    like the XLA path's +inf)."""
    dtype = jnp.float32
    nq, _ = query.shape
    nr = ref.shape[0]
    nq_pad = _round_up(max(nq, 1), TILE_Q)
    nr_pad = _round_up(max(nr, 1), TILE_R)

    q = query.astype(dtype)
    q4 = jnp.concatenate([q, jnp.ones((nq, 1), dtype)], axis=1)
    q4 = jnp.pad(q4, ((0, nq_pad - nq), (0, 0)))
    r = ref.astype(dtype)
    r2 = jnp.sum(r * r, axis=1)
    r2 = jnp.where(ref_mask, r2, _BIG)          # mask -> colossal score
    r4 = jnp.concatenate([-2.0 * r, r2[:, None]], axis=1)   # (Nr,4)
    r4t = jnp.pad(r4.T, ((0, 0), (0, nr_pad - nr)),
                  constant_values=0.0)
    # padded columns: force score _BIG via the r2 slot
    if nr_pad > nr:
        r4t = r4t.at[3, nr:].set(_BIG)

    kernel = functools.partial(_knn_kernel, k=k,
                               n_chunks=nr_pad // TILE_R)
    scores, idx = pl.pallas_call(
        kernel,
        grid=(nq_pad // TILE_Q,),
        in_specs=[
            pl.BlockSpec((TILE_Q, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nr_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, k), dtype),
            jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
        ],
        interpret=interpret,
    )(q4, r4t)

    q2 = jnp.sum(q * q, axis=1, keepdims=True)              # true d2
    d2 = scores[:nq] + q2
    idx = jnp.clip(idx[:nq], 0, max(nr - 1, 0))
    return idx, d2
