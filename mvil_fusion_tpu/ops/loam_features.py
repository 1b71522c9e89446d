"""LOAM curvature feature extraction on a fixed ring grid.

Replaces the reference's scanRegistration node (reference: lidar_mapping/src/
scanRegistration.cpp:49-203 ExtractFeaturePoints + PrepareRing/
PrepareSubregion, occlusion/parallel masks :510-649).

TPU-first: the sweep is organized as a dense (R, A) ring×azimuth grid
(invalid cells masked).  Curvature is an 11-tap stencil along the azimuth
axis; sharp/flat selection is per-(ring, subregion) top-k — everything is
one fused kernel, no per-ring C++ loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LoamFeatures(NamedTuple):
    sharp: jnp.ndarray         # (NS,3) corner points (strongest)
    sharp_mask: jnp.ndarray
    less_sharp: jnp.ndarray    # (NLS,3)
    less_sharp_mask: jnp.ndarray
    flat: jnp.ndarray          # (NF,3)
    flat_mask: jnp.ndarray
    less_flat: jnp.ndarray     # (NLF,3) downsampled remainder
    less_flat_mask: jnp.ndarray
    less_flat_i: jnp.ndarray   # (NLF,) intensity of less-flat points


def organize_grid(pts: jnp.ndarray, ring: jnp.ndarray, rel_time: jnp.ndarray,
                  mask: jnp.ndarray, n_rings: int, n_azimuth: int,
                  scan_period: float, intensity: jnp.ndarray | None = None):
    """COMPACT an unordered sweep into a (R, A, 3) per-ring sequence grid:
    each ring's points are sorted by azimuth and left-packed, so column
    neighbors are CONSECUTIVE EMITTED POINTS — exactly the neighborhood the
    reference's per-ring curvature loop walks (scanRegistration.cpp
    PrepareRing), independent of azimuth density.  (A bucket-scatter layout
    breaks the 11-tap stencil for sweeps sparser than the grid: a 360-step
    sweep over 1024 columns leaves no window fully occupied and ZERO
    features extract.)

    n_azimuth is the per-ring point capacity (overflow points drop).
    Returns (grid (R,A,3), occ (R,A), igrid (R,A)); igrid is zeros when no
    per-point intensity is supplied."""
    N = pts.shape[0]
    a_idx = jnp.clip((rel_time / scan_period * n_azimuth).astype(jnp.int32),
                     0, n_azimuth - 1)
    r_idx = jnp.clip(ring, 0, n_rings - 1)
    # sort all points by (ring, azimuth); invalid points sink to the end
    key = jnp.where(mask, r_idx * n_azimuth + a_idx,
                    n_rings * n_azimuth)
    order = jnp.argsort(key)                       # stable
    seg = jnp.where(mask[order], r_idx[order], n_rings)  # (N,) sorted rings
    # within-ring rank: position minus the ring's first sorted position
    pos = jnp.arange(N, dtype=jnp.int32)
    ring_start = jnp.full((n_rings + 1,), N, jnp.int32).at[seg].min(pos)
    rank = pos - ring_start[seg]
    dest = jnp.where((seg < n_rings) & (rank < n_azimuth),
                     seg * n_azimuth + rank, n_rings * n_azimuth)
    grid = jnp.zeros((n_rings * n_azimuth, 3), pts.dtype).at[dest].set(
        pts[order], mode="drop")
    occ = jnp.zeros((n_rings * n_azimuth,), bool).at[dest].set(
        True, mode="drop")
    if intensity is None:
        igrid = jnp.zeros((n_rings, n_azimuth), pts.dtype)
    else:
        igrid = jnp.zeros((n_rings * n_azimuth,), pts.dtype).at[
            dest].set(intensity[order],
                      mode="drop").reshape(n_rings, n_azimuth)
    return (grid.reshape(n_rings, n_azimuth, 3),
            occ.reshape(n_rings, n_azimuth), igrid)


def extract(grid: jnp.ndarray, occ: jnp.ndarray,
            igrid: jnp.ndarray | None = None,
            n_subregions: int = 8,
            sharp_per_region: int = 2,
            less_sharp_per_region: int = 10,
            flat_per_region: int = 4,
            curvature_threshold: float = 0.1,
            min_range: float = 0.3,
            use_intensity_mask: bool = False) -> LoamFeatures:
    """Curvature features from the organized grid.

    grid (R,A,3), occ (R,A), igrid (R,A) per-point intensity.  Capacities
    are static: sharp R·S·sharp, etc.
    """
    R, A, _ = grid.shape
    dtype = grid.dtype
    rng_ = jnp.linalg.norm(grid, axis=-1)                    # (R,A)
    valid = occ & (rng_ > min_range)
    if igrid is None:
        igrid = jnp.zeros((R, A), dtype)

    # 11-tap curvature: sum of 5 neighbors each side minus 10x center
    # (scanRegistration.cpp curvature definition)
    def shift(x, k):
        return jnp.roll(x, k, axis=1)

    acc = -10.0 * grid
    nb_ok = valid
    diff_i = jnp.zeros((R, A), jnp.int32)
    ic = jnp.maximum(jnp.abs(igrid), 1e-6)
    for k in list(range(-5, 0)) + list(range(1, 6)):
        acc = acc + shift(grid, k)
        nb_ok = nb_ok & shift(valid, k)
        # diff_i: count of ±5 neighbors whose intensity ratio to the
        # center truncates to 1, i.e. is in [1,2) — "similar reflectivity"
        # (reference scanRegistration.cpp:575-614)
        ratio = shift(igrid, k) / ic
        diff_i = diff_i + (jnp.floor(ratio) == 1).astype(jnp.int32)
    curv = jnp.sum(acc * acc, axis=-1) / jnp.maximum(rng_ * rng_, 1e-6)
    usable = nb_ok & valid

    # occlusion / parallel-beam mask (scanRegistration.cpp:510-649):
    # neighbors with a large range jump are unreliable
    r_next = shift(rng_, -1)
    r_prev = shift(rng_, 1)
    occl = (jnp.abs(r_next - rng_) > 0.3 * rng_) | \
        (jnp.abs(r_prev - rng_) > 0.3 * rng_)
    usable = usable & ~occl

    if use_intensity_mask:
        # the reference's intensity-ratio gate: high-curvature points whose
        # neighborhood reflectivity is uniform (diff_i > 4) and flat points
        # whose reflectivity varies (diff_i < 5) are both excluded
        # (scanRegistration.cpp:603-610)
        i_bad = ((curv > curvature_threshold / 2) & (diff_i > 4)) | \
            ((curv < curvature_threshold / 10) & (diff_i < 5))
        usable = usable & ~i_bad

    curv_m = jnp.where(usable, curv, -1.0)

    # per-(ring, subregion) top-k — sharp
    S = n_subregions
    As = A // S
    curv_s = curv_m[:, : S * As].reshape(R, S, As)
    grid_s = grid[:, : S * As].reshape(R, S, As, 3)

    def topk_feats(vals, k, descending=True):
        v = vals if descending else -vals
        top_v, top_i = jax.lax.top_k(v, k)                 # (R,S,k)
        pts = jnp.take_along_axis(grid_s, top_i[..., None], axis=2)
        return (top_v if descending else -top_v), pts

    sh_v, sh_p = topk_feats(curv_s, sharp_per_region)
    sh_ok = sh_v > curvature_threshold
    ls_v, ls_p = topk_feats(curv_s, less_sharp_per_region)
    ls_ok = ls_v > curvature_threshold

    # flat: smallest curvature among usable (mask unusable to +inf)
    curv_f = jnp.where(usable, curv, jnp.inf)[:, : S * As].reshape(R, S, As)
    fl_v, fl_i = jax.lax.top_k(-curv_f, flat_per_region)
    fl_p = jnp.take_along_axis(grid_s, fl_i[..., None], axis=2)
    fl_ok = (-fl_v) < curvature_threshold

    # less-flat: every usable point that is not less-sharp (downsampling is
    # done by the caller's voxel filter); subsample the grid 4x along
    # azimuth for capacity
    lf_p = grid[:, ::4, :].reshape(-1, 3)
    lf_ok = (usable & (curv < curvature_threshold))[:, ::4].reshape(-1)
    lf_i = igrid[:, ::4].reshape(-1)

    return LoamFeatures(
        sharp=sh_p.reshape(-1, 3), sharp_mask=sh_ok.reshape(-1),
        less_sharp=ls_p.reshape(-1, 3), less_sharp_mask=ls_ok.reshape(-1),
        flat=fl_p.reshape(-1, 3), flat_mask=fl_ok.reshape(-1),
        less_flat=lf_p, less_flat_mask=lf_ok, less_flat_i=lf_i)
