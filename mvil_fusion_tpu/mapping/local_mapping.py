"""LOAM local mapping: scan-to-map refinement on a rolling feature map.

Re-architecture of the reference's `local` node (reference: lidar_mapping/
src/localMapping.cpp:259-1089): the 11×11×7 cube grid with recentering
(:341-536) becomes two fixed-capacity world-frame feature buffers cropped to
a radius around the sensor (same locality, no pointer grid); kd-trees become
brute-force MXU top-k (ops/loam_icp.py); and the FOR_GLOBAL submap handoff
(:893-982 — accumulate body-frame submap, publish every >2 m or 30 frames,
then reset the map) is preserved for the global back end.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.ops import loam_icp, voxel
from mvil_fusion_tpu.utils import lie

_scan_to_map_jit = jax.jit(
    loam_icp.scan_to_map,
    static_argnames=("outer_iters", "gn_iters", "max_corr_dist"))
_downsample_jit = jax.jit(
    voxel.voxel_downsample,
    static_argnames=("leaf", "max_out", "table_size"))

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("outer_iters", "gn_iters", "use_i"))
def _lm_step_jit(sharp, sharp_mask, flat, flat_mask, corner_map, corner_mask,
                 surf_map, surf_mask, p_guess, q_guess, p_odom, q_odom,
                 flat_i, surf_map_i, outer_iters, gn_iters, use_i):
    """Scan-to-map + degenerate gate + wmap_wodom correction + the host
    pack, in one device program (one blocking readback per sweep — each
    separate fetch costs a ~45 ms tunnel round-trip)."""
    ikw = dict(surf_i=flat_i, surf_map_i=surf_map_i) if use_i \
        else dict(surf_i=None, surf_map_i=None)
    p_new, q_new, n_e, n_p, res = loam_icp.scan_to_map(
        sharp, sharp_mask, flat, flat_mask, corner_map, corner_mask,
        surf_map, surf_mask, p_guess, q_guess,
        outer_iters=outer_iters, gn_iters=gn_iters, **ikw)
    # degenerate association (or empty/reset map) → keep the odometry guess
    cnt_ok = (n_e + n_p) >= 50
    p_new = jnp.where(cnt_ok, p_new, p_guess)
    q_new = jnp.where(cnt_ok, q_new, q_guess)
    p_oi, q_oi = lie.pose_inverse(jnp.asarray(p_odom, jnp.float32),
                                  jnp.asarray(q_odom, jnp.float32))
    pc, qc = lie.pose_compose(p_new, q_new, p_oi, q_oi)
    f32 = jnp.float32
    pack = jnp.concatenate([
        p_new.astype(f32), q_new.astype(f32),          # 0:3, 3:7
        jnp.stack([n_e.astype(f32), n_p.astype(f32),
                   res.astype(f32)]),                  # 7:10
        jnp.asarray(p_odom, f32), jnp.asarray(q_odom, f32),  # 10:13, 13:17
    ])
    return p_new, q_new, pc, qc, pack


@_partial(jax.jit, static_argnames=(
    "n_rings", "n_azimuth", "scan_period", "outer_iters", "gn_iters",
    "use_i", "corner_leaf", "surf_leaf", "crop_radius", "ds_table"))
def _mapping_full_jit(full_pts, ring, rel_time, full_mask, inten,
                      p_odom, q_odom, corner_map, corner_mask, surf_map,
                      surf_mask, surf_map_i, accum_buf, accum_mask,
                      p_corr, q_corr,
                      n_rings, n_azimuth, scan_period, outer_iters,
                      gn_iters, use_i, corner_leaf, surf_leaf,
                      crop_radius, ds_table=1 << 17):
    """The ENTIRE mapping stage for one sweep as ONE device program:
    LOAM grid organize → curvature feature extraction → scan-to-map GN (+
    degeneracy gate + wmap_wodom correction) → rolling-map inserts + crop
    → submap accumulation → host pack.  On the tunneled TPU each dependent
    program execution costs tens of ms, so the former ~12-program chain
    (organize, extract, step, 3 inserts, crop, plus unjitted quaternion
    mini-ops) dominated the mapping stage regardless of FLOPs."""
    from mvil_fusion_tpu.ops import loam_features as lfe

    grid, occ, igrid = lfe.organize_grid(
        full_pts, ring, rel_time, full_mask,
        n_rings=n_rings, n_azimuth=n_azimuth, scan_period=scan_period,
        intensity=inten)
    feats = lfe.extract(grid, occ, igrid, use_intensity_mask=use_i)
    sharp, sharp_mask = feats.sharp, feats.sharp_mask
    flat, flat_mask = feats.less_flat, feats.less_flat_mask
    flat_i = feats.less_flat_i

    # transformAssociateToMap
    q_guess = lie.quat_normalize(lie.quat_mul(q_corr, q_odom))
    p_guess = lie.quat_rotate(q_corr, p_odom) + p_corr

    ikw = dict(surf_i=flat_i, surf_map_i=surf_map_i) if use_i \
        else dict(surf_i=None, surf_map_i=None)
    p_new, q_new, n_e, n_p, res = loam_icp.scan_to_map(
        sharp, sharp_mask, flat, flat_mask, corner_map, corner_mask,
        surf_map, surf_mask, p_guess.astype(jnp.float32),
        q_guess.astype(jnp.float32),
        outer_iters=outer_iters, gn_iters=gn_iters, **ikw)
    cnt_ok = (n_e + n_p) >= 50
    p_new = jnp.where(cnt_ok, p_new, p_guess)
    q_new = jnp.where(cnt_ok, q_new, q_guess)
    p_oi, q_oi = lie.pose_inverse(jnp.asarray(p_odom, jnp.float32),
                                  jnp.asarray(q_odom, jnp.float32))
    pc, qc = lie.pose_compose(p_new, q_new, p_oi, q_oi)

    # rolling-map inserts (re-voxelized) + crop
    def insert(buf, msk, new_pts, new_mask, leaf, cap):
        allp = jnp.concatenate([buf, new_pts], axis=0)
        allm = jnp.concatenate([msk, new_mask], axis=0)
        ds = voxel.voxel_downsample(allp, allm, leaf, cap,
                                    table_size=ds_table)
        return ds.pts, ds.mask

    sharp_w = lie.quat_rotate(q_new[None, :], sharp) + p_new[None, :]
    flat_w = lie.quat_rotate(q_new[None, :], flat) + p_new[None, :]
    corner_map2, corner_mask2 = insert(corner_map, corner_mask, sharp_w,
                                       sharp_mask, corner_leaf, CORNER_CAP)
    surf4 = jnp.concatenate([surf_map, surf_map_i[:, None]], axis=1)
    new4 = jnp.concatenate([flat_w, flat_i[:, None]], axis=1)
    surf4_new, surf_mask2 = insert(surf4, surf_mask, new4, flat_mask,
                                   surf_leaf, SURF_CAP)
    d_s = jnp.linalg.norm(surf4_new[:, :3] - p_new[None, :], axis=-1)
    surf_mask2 = surf_mask2 & (d_s < crop_radius)
    d_c = jnp.linalg.norm(corner_map2 - p_new[None, :], axis=-1)
    corner_mask2 = corner_mask2 & (d_c < crop_radius)
    accum_buf2, accum_mask2 = insert(accum_buf, accum_mask, flat_w,
                                     flat_mask, surf_leaf, SUBMAP_CAP)

    f32 = jnp.float32
    pack = jnp.concatenate([
        p_new.astype(f32), q_new.astype(f32),          # 0:3, 3:7
        jnp.stack([n_e.astype(f32), n_p.astype(f32),
                   res.astype(f32)]),                  # 7:10
        jnp.asarray(p_odom, f32), jnp.asarray(q_odom, f32),  # 10:13,13:17
    ])
    return (corner_map2, corner_mask2, surf4_new[:, :3], surf_mask2,
            surf4_new[:, 3], accum_buf2, accum_mask2, pc, qc,
            p_new, q_new, pack)


@jax.jit
def _submap_pack_jit(pts_w, mask, p, q):
    """World-frame accumulated cloud → key-pose body frame + mask, as one
    fetchable array (one readback per submap emission)."""
    pts_b = lie.quat_rotate_inv(q[None, :], pts_w - p[None, :])
    return jnp.concatenate([pts_b, mask[:, None].astype(jnp.float32)],
                           axis=1)


CORNER_CAP = 16384
SURF_CAP = 32768
SUBMAP_CAP = 32768


@dataclass
class Submap:
    """Keyed local map handed to the global back end (body frame of the
    submap's key pose)."""

    t: float
    p_w: np.ndarray
    q_w: np.ndarray
    pts: np.ndarray
    odom_p: np.ndarray     # odometry pose at key time (for delta chaining)
    odom_q: np.ndarray


class LocalMapper:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        m = cfg.local_mapping
        self.corner_map = jnp.zeros((CORNER_CAP, 3), jnp.float32)
        self.corner_mask = jnp.zeros((CORNER_CAP,), bool)
        self.surf_map = jnp.zeros((SURF_CAP, 3), jnp.float32)
        self.surf_mask = jnp.zeros((SURF_CAP,), bool)
        # per-point reflectivity of the surf map (voxel-averaged alongside
        # positions; used for intensity-similar correspondence selection)
        self.surf_map_i = jnp.zeros((SURF_CAP,), jnp.float32)
        # map-to-odometry correction (reference wmap_wodom)
        self.p_corr = np.zeros(3, np.float32)
        self.q_corr = np.asarray([1, 0, 0, 0], np.float32)
        self.initialized = False
        # submap accumulation (FOR_GLOBAL) — fixed-capacity device buffer
        # (fixed shapes → no retraces; emission is one packed fetch)
        self.accum_buf = jnp.zeros((SUBMAP_CAP, 3), jnp.float32)
        self.accum_mask = jnp.zeros((SUBMAP_CAP,), bool)
        self.accum_start_pose: Optional[tuple] = None
        self.frames_since_submap = 0
        self.trajectory: list = []     # Midend.txt equivalent
        self.submaps_emitted = 0
        # deferred-readback mode (async pipeline): the per-sweep pack is
        # harvested at the next sweep instead of blocking after dispatch;
        # ordering (trajectory rows, submap trigger, map reset) is
        # identical to sync mode, just shifted to the next call
        self.defer_pack = False
        self._pending: Optional[tuple] = None

    # ------------------------------------------------------------------

    def _apply_corr(self, p_odom, q_odom):
        """w_map ← w_odom composition (transformAssociateToMap)."""
        q = lie.quat_mul(jnp.asarray(self.q_corr), jnp.asarray(q_odom))
        p = (lie.quat_rotate(jnp.asarray(self.q_corr), jnp.asarray(p_odom))
             + jnp.asarray(self.p_corr))
        return p, lie.quat_normalize(q)

    def _insert(self, buf, mask, new_pts, new_mask, leaf, cap):
        """Append + re-voxelize the rolling buffer (the reference re-filters
        touched cubes, :800-868)."""
        allp = jnp.concatenate([buf, new_pts], axis=0)
        allm = jnp.concatenate([mask, new_mask], axis=0)
        ds = _downsample_jit(allp, allm, leaf=leaf, max_out=cap,
                             table_size=self.cfg.local_mapping
                             .downsample_table_size)
        return ds.pts, ds.mask

    def _crop(self, center: np.ndarray):
        radius = self.cfg.local_mapping.map_crop_radius
        d = jnp.linalg.norm(self.surf_map - jnp.asarray(center)[None, :],
                            axis=-1)
        self.surf_mask = self.surf_mask & (d < radius)
        dc = jnp.linalg.norm(self.corner_map - jnp.asarray(center)[None, :],
                             axis=-1)
        self.corner_mask = self.corner_mask & (dc < radius)

    # ------------------------------------------------------------------

    def process_full(self, t: float, full_pts, ring, rel_time, full_mask,
                     inten, p_odom, q_odom,
                     n_rings: int, n_azimuth: int,
                     scan_period: float) -> Optional[Submap]:
        """One deskewed sweep through LOAM extraction + scan-to-map +
        map/submap maintenance — a single device program and ONE blocking
        fetch (the fused analog of scanRegistration + localMapping)."""
        m = self.cfg.local_mapping
        # drain the previous sweep's deferred pack FIRST: a submap emission
        # must reset the rolling map before this sweep's insert runs
        sm_prev = self._harvest() if self.defer_pack else None
        use_i = m.use_intensity and inten is not None
        if inten is None:
            inten = jnp.zeros((full_pts.shape[0],), jnp.float32)
        (self.corner_map, self.corner_mask, self.surf_map, self.surf_mask,
         self.surf_map_i, self.accum_buf, self.accum_mask,
         self.p_corr, self.q_corr, p_dev, q_dev, pack) = _mapping_full_jit(
            full_pts, jnp.asarray(ring), jnp.asarray(rel_time),
            jnp.asarray(full_mask), jnp.asarray(inten, jnp.float32),
            jnp.asarray(p_odom, jnp.float32), jnp.asarray(q_odom,
                                                          jnp.float32),
            self.corner_map, self.corner_mask, self.surf_map,
            self.surf_mask, self.surf_map_i, self.accum_buf,
            self.accum_mask,
            jnp.asarray(self.p_corr, jnp.float32),
            jnp.asarray(self.q_corr, jnp.float32),
            n_rings=n_rings, n_azimuth=n_azimuth, scan_period=scan_period,
            outer_iters=m.outer_iters, gn_iters=m.gn_iters, use_i=use_i,
            corner_leaf=m.corner_leaf, surf_leaf=m.surf_leaf,
            crop_radius=m.map_crop_radius,
            ds_table=m.downsample_table_size)
        self.initialized = True
        if self.defer_pack:
            try:
                pack.copy_to_host_async()
            except AttributeError:
                pass
            self._pending = (t, pack, p_dev, q_dev)
            return sm_prev
        hp = np.asarray(pack)            # the stage's single readback
        return self._after_step(t, hp, p_dev, q_dev)

    def _harvest(self) -> Optional[Submap]:
        """Drain the deferred sweep pack; may emit the pending submap."""
        if self._pending is None:
            return None
        t, pack, p_dev, q_dev = self._pending
        self._pending = None
        return self._after_step(t, np.asarray(pack), p_dev, q_dev)

    def flush(self) -> Optional[Submap]:
        """End-of-stream: drain any deferred pack (final trajectory row /
        submap)."""
        return self._harvest()

    def _after_step(self, t, hp, p_dev, q_dev) -> Optional[Submap]:
        """Host bookkeeping shared by process/process_full: trajectory,
        submap trigger, emission."""
        m = self.cfg.local_mapping
        p_np, q_np = hp[0:3], hp[3:7]
        odom_p_np, odom_q_np = hp[10:13], hp[13:17]
        self.trajectory.append((t, p_np, q_np))
        if self.accum_start_pose is None:
            self.accum_start_pose = (p_np.copy(), q_np.copy(), t,
                                     odom_p_np.copy(), odom_q_np.copy())
        self.frames_since_submap += 1
        dist = np.linalg.norm(p_np - self.accum_start_pose[0])
        if (dist > m.submap_trigger_dist
                or self.frames_since_submap >= m.submap_trigger_frames):
            return self._emit_submap(t, p_np, q_np, p_dev, q_dev,
                                     odom_p_np, odom_q_np)
        return None

    def process(self, t: float, sharp, sharp_mask, flat, flat_mask,
                p_odom: np.ndarray, q_odom: np.ndarray,
                flat_i=None) -> Optional[Submap]:
        """One feature frame: returns a Submap when the handoff triggers."""
        m = self.cfg.local_mapping
        sharp = jnp.asarray(sharp)
        flat = jnp.asarray(flat)
        sharp_mask = jnp.asarray(sharp_mask)
        flat_mask = jnp.asarray(flat_mask)
        use_i = m.use_intensity and flat_i is not None
        if flat_i is None:
            flat_i = jnp.zeros((flat.shape[0],), jnp.float32)
        else:
            flat_i = jnp.asarray(flat_i, jnp.float32)

        p_guess, q_guess = self._apply_corr(p_odom, q_odom)

        # one device program: scan-to-map + gate + correction + host pack
        # (an empty/reset map fails the count gate → odometry prediction,
        # so the uninitialized case needs no separate branch)
        p_new, q_new, pc, qc, pack = _lm_step_jit(
            sharp, sharp_mask, flat, flat_mask,
            self.corner_map, self.corner_mask,
            self.surf_map, self.surf_mask,
            p_guess.astype(jnp.float32), q_guess.astype(jnp.float32),
            jnp.asarray(p_odom, jnp.float32), jnp.asarray(q_odom,
                                                          jnp.float32),
            flat_i, self.surf_map_i,
            outer_iters=m.outer_iters, gn_iters=m.gn_iters, use_i=use_i)
        # wmap_wodom stays device-resident (consumed by _apply_corr)
        self.p_corr = pc
        self.q_corr = qc

        # insert features into the rolling map (world frame); the surf map
        # carries intensity as a 4th voxel-averaged channel
        sharp_w = lie.quat_rotate(q_new[None, :], sharp) + p_new[None, :]
        flat_w = lie.quat_rotate(q_new[None, :], flat) + p_new[None, :]
        self.corner_map, self.corner_mask = self._insert(
            self.corner_map, self.corner_mask, sharp_w, sharp_mask,
            m.corner_leaf, CORNER_CAP)
        surf4 = jnp.concatenate([self.surf_map,
                                 self.surf_map_i[:, None]], axis=1)
        new4 = jnp.concatenate([flat_w, flat_i[:, None]], axis=1)
        surf4_new, self.surf_mask = self._insert(
            surf4, self.surf_mask, new4, flat_mask, m.surf_leaf, SURF_CAP)
        self.surf_map = surf4_new[:, :3]
        self.surf_map_i = surf4_new[:, 3]
        self._crop(p_new)
        self.initialized = True

        # submap accumulation + ONE blocking readback per sweep
        self.accum_buf, self.accum_mask = self._insert(
            self.accum_buf, self.accum_mask, flat_w, flat_mask,
            m.surf_leaf, SUBMAP_CAP)
        hp = np.asarray(pack)
        return self._after_step(t, hp, p_new, q_new)

    def _emit_submap(self, t, p_np, q_np, p_dev, q_dev,
                     p_odom, q_odom) -> Submap:
        """Publish accumulated map in the key-pose body frame, then reset the
        rolling map (localMapping.cpp:893-982).  The accumulated world
        clouds are concatenated, transformed and subsampled on device; ONE
        packed fetch pulls the submap to the host."""
        packed = np.asarray(_submap_pack_jit(self.accum_buf,
                                             self.accum_mask, p_dev, q_dev))
        pts_b = packed[packed[:, 3] > 0.5, :3]
        sm = Submap(t=t, p_w=p_np.copy(), q_w=q_np.copy(),
                    pts=pts_b.astype(np.float32),
                    odom_p=np.asarray(p_odom).copy(),
                    odom_q=np.asarray(q_odom).copy())
        # reset the rolling map (the reference clears the cube grid and
        # wmap_wodom on handoff, localMapping.cpp:979-980 — bounds error
        # accumulation; the global back end owns long-term consistency)
        self.corner_mask = jnp.zeros_like(self.corner_mask)
        self.surf_mask = jnp.zeros_like(self.surf_mask)
        self.initialized = False
        self.accum_mask = jnp.zeros_like(self.accum_mask)
        self.accum_start_pose = None
        self.frames_since_submap = 0
        self.submaps_emitted += 1
        return sm
