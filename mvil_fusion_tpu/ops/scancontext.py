"""ScanContext place-recognition descriptors.

Replaces the vendored ScanContext + nanoflann ring-key kd-tree of the
reference (reference: lidar_mapping/include/scancontext/Scancontext.cpp
makeAndSaveScancontextAndKeys :71-197, detectLoopClosureID :338-381,
params Scancontext.h:82-97 — 20 rings x 60 sectors, candidate search over
ring keys, column-shift alignment).

TPU-first: descriptor = scatter-max into the polar grid; ring-key search =
one (Q,K) matmul distance; column-shift alignment = all 60 rolls evaluated
as a batch. No trees.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def make_descriptor(pts: jnp.ndarray, mask: jnp.ndarray,
                    n_ring: int = 20, n_sector: int = 60,
                    max_radius: float = 80.0) -> jnp.ndarray:
    """Polar max-height descriptor (R, S) from a body-frame cloud."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(y, x) % (2 * jnp.pi)
    ring = jnp.clip((r / max_radius * n_ring).astype(jnp.int32),
                    0, n_ring - 1)
    sector = jnp.clip((theta / (2 * jnp.pi) * n_sector).astype(jnp.int32),
                      0, n_sector - 1)
    ok = mask & (r < max_radius)
    idx = jnp.where(ok, ring * n_sector + sector, n_ring * n_sector)
    desc = jnp.full((n_ring * n_sector,), -1e9, pts.dtype).at[idx].max(
        z, mode="drop")
    desc = jnp.where(desc < -1e8, 0.0, desc)
    return desc.reshape(n_ring, n_sector)


def ring_key(desc: jnp.ndarray) -> jnp.ndarray:
    """Rotation-invariant ring key: mean occupancy per ring (R,)."""
    return jnp.mean(desc, axis=-1)


def sc_distance(d1: jnp.ndarray, d2: jnp.ndarray):
    """Rotation-aligned cosine distance between two descriptors.

    Evaluates all sector shifts of d2 and returns (min distance, best
    shift) — the reference's column-shift alignment, batched.
    """
    S = d1.shape[-1]

    def dist_at(shift):
        d2s = jnp.roll(d2, shift, axis=-1)
        num = jnp.sum(d1 * d2s, axis=0)                 # per-column dot
        n1 = jnp.linalg.norm(d1, axis=0)
        n2 = jnp.linalg.norm(d2s, axis=0)
        ok = (n1 > 1e-9) & (n2 > 1e-9)
        cos = jnp.where(ok, num / jnp.maximum(n1 * n2, 1e-9), 0.0)
        cnt = jnp.maximum(jnp.sum(ok), 1)
        return 1.0 - jnp.sum(cos) / cnt

    dists = jax.vmap(dist_at)(jnp.arange(S))
    best = jnp.argmin(dists)
    return dists[best], best


class LoopCandidates(NamedTuple):
    idx: jnp.ndarray      # (K,) candidate indices
    dist: jnp.ndarray     # (K,) full SC distance
    shift: jnp.ndarray    # (K,) best sector shift


def detect_loop(query_desc: jnp.ndarray, query_key: jnp.ndarray,
                db_desc: jnp.ndarray, db_keys: jnp.ndarray,
                db_mask: jnp.ndarray, n_candidates: int = 10
                ) -> LoopCandidates:
    """Ring-key candidate search + full SC distance on the top candidates.

    db_desc (N,R,S), db_keys (N,R), db_mask (N,) — static capacity.
    """
    d2 = jnp.sum((db_keys - query_key[None, :]) ** 2, axis=-1)
    d2 = jnp.where(db_mask, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, n_candidates)

    def full_dist(i):
        return sc_distance(query_desc, db_desc[i])

    dist, shift = jax.vmap(full_dist)(idx)
    dist = jnp.where(jnp.isfinite(-neg), dist, jnp.inf)
    return LoopCandidates(idx=idx, dist=dist, shift=shift)
