"""Global mapping back end: keyed submaps, pose graph, loop closure.

Re-architecture of the reference's `global_ikdtree` node (reference:
lidar_mapping/src/globalMappingIkdTree.cpp): incremental localization by
odometry-delta composition (:179-182), scan-to-map registration against a
reference cloud of nearby keyed scans (:241-271, ikd-tree 5-NN + FastVGICP →
here a Gaussian-voxel map + our VGICP), GPS-z floor priors (:216-228),
radius loop closure (:300-312, 434-510) and ScanContext loop proposals
(:338-394) verified by registration, all fused by a batched pose-graph
re-solve (mapping/pose_graph.py) instead of iSAM2.  Keyed scans + corrected
poses are the persistent map (the reference's Backend.txt / Map.pcd).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.mapping import pose_graph as pg
from mvil_fusion_tpu.mapping.local_mapping import Submap
from mvil_fusion_tpu.ops import scancontext as sc, vgicp, voxel
from mvil_fusion_tpu.utils import lie, nplie

N_MAX = 512
E_MAX = 2048
Z_MAX = 512

_solve_graph_jit = jax.jit(pg.solve_cg,
                           static_argnames=("iters", "cg_iters"))
_build_map_jit = jax.jit(
    voxel.build_gaussian_voxel_map,
    static_argnames=("leaf", "table_size", "min_points", "plane_eps"))
_vgicp_jit = jax.jit(vgicp.vgicp_align,
                     static_argnames=("iters", "max_corr_dist", "eps"))
_downsample_jit = jax.jit(voxel.voxel_downsample,
                          static_argnames=("leaf", "max_out", "table_size"))
_make_desc_jit = jax.jit(sc.make_descriptor,
                         static_argnames=("n_ring", "n_sector", "max_radius"))
_detect_loop_jit = jax.jit(sc.detect_loop, static_argnames=("n_candidates",))

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("iters", "max_corr_dist", "leaf"))
def _greg_pack_jit(scan, scan_mask, ref_map, p0, q0, iters, max_corr_dist,
                   leaf):
    """Keyed-scan registration against the reference map with the result
    packed into ONE (9,) fetch [p(3) q(4) fitness n_corr] — separate
    fetches each pay the ~45 ms tunnel round-trip."""
    # right-sized hash tables: the keyed scan is ≤ SCAN_CAP (8192) points
    src_map = voxel.build_gaussian_voxel_map(scan, scan_mask, leaf,
                                             table_size=1 << 15)
    reg = voxel.voxel_downsample(scan, scan_mask, leaf, 4096,
                                 table_size=1 << 15)
    res = vgicp.vgicp_align(reg.pts, reg.mask, ref_map, src_map,
                            jnp.asarray(p0, jnp.float32),
                            jnp.asarray(q0, jnp.float32),
                            iters=iters, max_corr_dist=max_corr_dist)
    f32 = jnp.float32
    return jnp.concatenate([res.p.astype(f32), res.q.astype(f32),
                            jnp.stack([res.fitness.astype(f32),
                                       res.n_corr.astype(f32)])])


@jax.jit
def _pq_pack_jit(p, q):
    """(N,7) node poses in one fetch (host mirror refresh after a graph
    solve)."""
    return jnp.concatenate([p, q], axis=1)


@_partial(jax.jit, static_argnames=("n_candidates",))
def _detect_pack_jit(desc, key, db_desc, db_keys, db_mask, n_candidates):
    cands = sc.detect_loop(desc, key, db_desc, db_keys, db_mask,
                           n_candidates=n_candidates)
    return jnp.stack([cands.idx.astype(jnp.float32),
                      cands.dist.astype(jnp.float32)])

SCAN_CAP = 8192          # per keyed scan point capacity (padded)


class GlobalMapper:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        g = cfg.global_mapping
        # capacities: config fields override the module defaults (the CG
        # pose-graph solver is linear in capacity, so these are budget
        # knobs, not architectural walls)
        self.n_max = g.pg_n_max or N_MAX
        self.e_max = g.pg_e_max or E_MAX
        self.z_max = g.pg_z_max or Z_MAX
        self.graph = pg.empty_graph(self.n_max, self.e_max, self.z_max)
        self.n_nodes = 0
        self.n_edges = 0
        self.n_z = 0
        self.scans: list[np.ndarray] = []       # body-frame keyed scans
        self.scan_masks: list[np.ndarray] = []
        self.times: list[float] = []
        self.floor_ids: list[int] = []
        self.last_odom: Optional[tuple] = None  # (p, q) at previous submap
        self.loops_closed = 0
        self.loop_pairs: list[tuple] = []
        # ScanContext store lives ON DEVICE (uploading a (512,20,60) table
        # per detect would cost ~100 ms through the tunnel)
        self.sc_desc = jnp.zeros((self.n_max, g.sc_num_ring, g.sc_num_sector),
                                 jnp.float32)
        self.sc_keys = jnp.zeros((self.n_max, g.sc_num_ring), jnp.float32)
        # host mirror of node poses: everything the host bookkeeping reads
        # (prediction chaining, radius loops, trajectory) without fetching;
        # refreshed from the device graph only after a solve
        self.p_host = np.zeros((self.n_max, 3), np.float32)
        self.q_host = np.tile(np.asarray([1, 0, 0, 0], np.float32),
                              (self.n_max, 1))
        self._since_last_close = 10**9
        self.evictions = 0       # capacity evictions (each drops n_max//4)
        self.map_refreshes = 0   # z-jump-triggered re-solves (reference
        #                          globalMappingIkdTree.cpp:290-298)

    # ------------------------------------------------------------- helpers

    def _node_pose(self, i: int):
        return (self.p_host[i], self.q_host[i])

    def _refresh_host_poses(self):
        """One packed fetch of all node poses after a graph re-solve."""
        pq = np.asarray(_pq_pack_jit(self.graph.p, self.graph.q))
        self.p_host = pq[:, :3].copy()
        self.q_host = pq[:, 3:7].copy()

    def _floor_id(self, z: float) -> int:
        fh = self.cfg.global_mapping.floor_height
        return int(np.floor((z + 0.5 * fh) / fh))

    def _pad_scan(self, pts: np.ndarray):
        n = min(len(pts), SCAN_CAP)
        out = np.zeros((SCAN_CAP, 3), np.float32)
        out[:n] = pts[:n]
        m = np.zeros(SCAN_CAP, bool)
        m[:n] = True
        return out, m

    def _reference_map(self, center: np.ndarray, exclude_recent: int = 0):
        """Gaussian voxel map from the K nearest keyed scans (world frame,
        corrected poses) — the ikd-tree reference cloud analog."""
        n = self.n_nodes - exclude_recent
        if n <= 0:
            return None
        pos = self.p_host[:n]
        d = np.linalg.norm(pos - center[None, :], axis=1)
        near = np.argsort(d)[: min(5, n)]
        # FIXED 5-block input: a varying scan count would recompile the
        # map-build program (30-60 s each on the TPU) as the graph grows
        pts = np.zeros((5 * SCAN_CAP, 3), np.float32)
        mask = np.zeros(5 * SCAN_CAP, bool)
        for s_, i in enumerate(near):
            p_i, q_i = self._node_pose(i)
            R = nplie.quat_to_mat(q_i).astype(np.float32)
            pts[s_ * SCAN_CAP:(s_ + 1) * SCAN_CAP] = \
                self.scans[i] @ R.T + p_i
            mask[s_ * SCAN_CAP:(s_ + 1) * SCAN_CAP] = self.scan_masks[i]
        return _build_map_jit(jnp.asarray(pts), jnp.asarray(mask),
                              leaf=self.cfg.lidar.vgicp_resolution,
                              table_size=1 << 17)

    def _register(self, scan, scan_mask, ref_map, p0, q0) -> np.ndarray:
        """One packed fetch: [p(3) q(4) fitness n_corr]."""
        return np.asarray(_greg_pack_jit(
            scan, scan_mask, ref_map,
            np.asarray(p0, np.float32), np.asarray(q0, np.float32),
            iters=self.cfg.lidar.vgicp_iters,
            max_corr_dist=self.cfg.lidar.max_corr_dist,
            leaf=self.cfg.lidar.vgicp_resolution))

    def _add_edge(self, i, j, dp, dq, w):
        e = self.n_edges
        if e >= self.e_max:
            return
        self.graph = self.graph._replace(
            e_i=self.graph.e_i.at[e].set(i),
            e_j=self.graph.e_j.at[e].set(j),
            e_dp=self.graph.e_dp.at[e].set(jnp.asarray(dp, jnp.float32)),
            e_dq=self.graph.e_dq.at[e].set(jnp.asarray(dq, jnp.float32)),
            e_w=self.graph.e_w.at[e].set(float(w)),
            e_mask=self.graph.e_mask.at[e].set(True))
        self.n_edges += 1

    def _evict_oldest(self, k: int):
        """Drop the k oldest keyed scans when the graph hits capacity
        (the reference's unbounded iSAM grows forever; here the bounded
        store evicts instead of asserting).  Node indices shift by -k;
        edges/priors touching evicted nodes are dropped."""
        k = min(k, self.n_nodes)
        n = self.n_nodes
        self.evictions += 1
        p = np.array(self.graph.p)
        q = np.array(self.graph.q)
        nm = np.array(self.graph.node_mask)
        p[: n - k], q[: n - k], nm[: n - k] = (p[k:n].copy(), q[k:n].copy(),
                                               nm[k:n].copy())
        p[n - k:], q[n - k:], nm[n - k:] = 0.0, [1, 0, 0, 0], False

        e_i = np.array(self.graph.e_i)
        e_j = np.array(self.graph.e_j)
        e_dp = np.array(self.graph.e_dp)
        e_dq = np.array(self.graph.e_dq)
        e_w = np.array(self.graph.e_w)
        keep = np.nonzero((e_i >= k) & (e_j >= k)
                          & np.asarray(self.graph.e_mask))[0]
        ne = len(keep)
        e_mask = np.zeros_like(np.asarray(self.graph.e_mask))
        e_i[:ne], e_j[:ne] = e_i[keep] - k, e_j[keep] - k
        e_dp[:ne], e_dq[:ne], e_w[:ne] = e_dp[keep], e_dq[keep], e_w[keep]
        e_mask[:ne] = True

        z_node = np.array(self.graph.z_node)
        z_val = np.array(self.graph.z_val)
        z_w = np.array(self.graph.z_w)
        zkeep = np.nonzero((z_node >= k) & np.asarray(self.graph.z_mask))[0]
        nz = len(zkeep)
        z_mask = np.zeros_like(np.asarray(self.graph.z_mask))
        z_node[:nz], z_val[:nz], z_w[:nz] = (z_node[zkeep] - k,
                                             z_val[zkeep], z_w[zkeep])
        z_mask[:nz] = True

        self.graph = self.graph._replace(
            p=jnp.asarray(p), q=jnp.asarray(q), node_mask=jnp.asarray(nm),
            e_i=jnp.asarray(e_i), e_j=jnp.asarray(e_j),
            e_dp=jnp.asarray(e_dp), e_dq=jnp.asarray(e_dq),
            e_w=jnp.asarray(e_w), e_mask=jnp.asarray(e_mask),
            z_node=jnp.asarray(z_node), z_val=jnp.asarray(z_val),
            z_w=jnp.asarray(z_w), z_mask=jnp.asarray(z_mask))
        self.n_nodes, self.n_edges, self.n_z = n - k, ne, nz
        del self.scans[:k], self.scan_masks[:k]
        del self.times[:k], self.floor_ids[:k]
        # device ScanContext store + host pose mirror shift (eviction is
        # rare — a host round-trip here is fine)
        sd = np.array(self.sc_desc)
        sk = np.array(self.sc_keys)
        sd[: n - k] = sd[k:n].copy()
        sd[n - k:] = 0.0
        sk[: n - k] = sk[k:n].copy()
        sk[n - k:] = 0.0
        self.sc_desc = jnp.asarray(sd)
        self.sc_keys = jnp.asarray(sk)
        self.p_host[: n - k] = self.p_host[k:n].copy()
        self.p_host[n - k:] = 0.0
        self.q_host[: n - k] = self.q_host[k:n].copy()
        self.q_host[n - k:] = np.asarray([1, 0, 0, 0], np.float32)
        self.loop_pairs = [(a - k, b - k) for a, b in self.loop_pairs
                           if a >= k and b >= k]

    # ------------------------------------------------------------- main API

    def add_submap(self, sm: Submap) -> dict:
        """Process one keyed submap; returns localization info (the
        /laser_localizer feedback for the estimator's LPS)."""
        g = self.cfg.global_mapping
        if self.n_nodes >= self.n_max:
            self._evict_oldest(self.n_max // 4)
        i = self.n_nodes
        scan, scan_mask = self._pad_scan(sm.pts)

        if i == 0:
            p_new = sm.p_w.astype(np.float32)
            q_new = sm.q_w.astype(np.float32)
        else:
            # predicted pose: previous corrected node ∘ incremental delta.
            # The delta MUST come from one consistent stream: the local
            # mapper's refined (map-frame) poses — the reference composes
            # /local_odom deltas the same way (globalMappingIkdTree.cpp
            # :179-182).  (Mixing the previous ODOMETRY pose with the
            # current MAP pose injects the full map-correction translation
            # into every edge once the VIO drifts.)
            p_prev, q_prev = self._node_pose(i - 1)
            dp, dq = nplie.pose_between(self.last_odom[0], self.last_odom[1],
                                        sm.p_w, sm.q_w)
            p_pred, q_pred = nplie.pose_compose(p_prev, q_prev, dp, dq)
            # refine against the reference map
            ref = self._reference_map(p_pred)
            if ref is not None:
                hp = self._register(jnp.asarray(scan),
                                    jnp.asarray(scan_mask),
                                    ref, p_pred, q_pred)
                good = (float(hp[7]) < g.max_tolerable_fitness
                        and int(hp[8]) > 100)
                if good:
                    p_new, q_new = hp[0:3], hp[3:7]
                else:
                    p_new, q_new = p_pred, q_pred
            else:
                p_new, q_new = p_pred, q_pred

        # ---- add node (device graph + host mirror)
        self.graph = self.graph._replace(
            p=self.graph.p.at[i].set(jnp.asarray(p_new)),
            q=self.graph.q.at[i].set(jnp.asarray(q_new)),
            node_mask=self.graph.node_mask.at[i].set(True))
        self.p_host[i] = p_new
        self.q_host[i] = q_new
        self.scans.append(sm.pts.copy() if len(sm.pts) <= SCAN_CAP
                          else sm.pts[:SCAN_CAP].copy())
        sc_pad, sc_m = self._pad_scan(sm.pts)
        self.scans[-1] = sc_pad
        self.scan_masks.append(sc_m)
        self.times.append(sm.t)
        fid = self._floor_id(float(p_new[2]))
        self.floor_ids.append(fid)
        self.last_odom = (np.asarray(sm.p_w).copy(),
                          np.asarray(sm.q_w).copy())
        self.n_nodes += 1
        self._since_last_close += 1

        # ScanContext descriptor for every keyed scan (the reference's
        # makeAndSaveScancontextAndKeys on submap arrival :279-288) —
        # computed and stored on device, no fetch
        desc = _make_desc_jit(
            jnp.asarray(self.scans[i]), jnp.asarray(self.scan_masks[i]),
            n_ring=g.sc_num_ring, n_sector=g.sc_num_sector,
            max_radius=g.sc_max_radius)
        self.sc_desc = self.sc_desc.at[i].set(desc)
        self.sc_keys = self.sc_keys.at[i].set(sc.ring_key(desc))

        # between factor to previous node (host mirror math)
        if i > 0:
            p_prev, q_prev = self._node_pose(i - 1)
            dp, dq = nplie.pose_between(p_prev, q_prev, p_new, q_new)
            self._add_edge(i - 1, i, dp, dq, 10.0)

        # GPS-z floor prior (variance 50 when near the floor plane, huge
        # otherwise — globalMappingIkdTree.cpp:216-228)
        fh = g.floor_height
        z_floor = fid * fh
        near_floor = abs(float(p_new[2]) - z_floor) < 0.25 * fh
        if self.n_z < self.z_max:
            w = (1.0 / np.sqrt(50.0)) if near_floor else 1e-3
            self.graph = self.graph._replace(
                z_node=self.graph.z_node.at[self.n_z].set(i),
                z_val=self.graph.z_val.at[self.n_z].set(z_floor),
                z_w=self.graph.z_w.at[self.n_z].set(w),
                z_mask=self.graph.z_mask.at[self.n_z].set(True))
            self.n_z += 1

        # ---- loop closures
        closed = False
        if g.check_loop_closure and self._since_last_close >= \
                g.poses_before_reclosing:
            closed = self._try_radius_loop(i) or self._try_sc_loop(i)
        if closed:
            self.loops_closed += 1
            self._since_last_close = 0
            self.graph = _solve_graph_jit(self.graph, iters=g.pg_iters,
                                          cg_iters=g.pg_cg_iters)
            self._refresh_host_poses()
        elif i > 0 and abs(float(p_new[2])
                           - float(self.p_host[i - 1, 2])) \
                > g.z_refresh_jump:
            # z-jump (floor transition / drift): re-solve so the floor
            # priors engage and subsequent reference maps use corrected
            # poses — the analog of the reference's ikd-tree rebuild from
            # maximum-likelihood points (globalMappingIkdTree.cpp:290-298;
            # our reference map is scatter-rebuilt from graph poses per
            # query, so re-solving *is* the map refresh)
            self.graph = _solve_graph_jit(self.graph, iters=g.pg_iters,
                                          cg_iters=g.pg_cg_iters)
            self._refresh_host_poses()
            self.map_refreshes += 1

        p_fin, q_fin = self._node_pose(i)
        return dict(node=i, p=p_fin, q=q_fin, t=sm.t, floor=fid,
                    closed_loop=closed)

    # ---------------------------------------------------------------- loops

    def _verify_loop(self, i: int, j: int) -> bool:
        """Register scan i against a map around node j; add edge on
        success."""
        g = self.cfg.global_mapping
        p_i, q_i = self._node_pose(i)
        p_j, q_j = self._node_pose(j)
        # fixed 3-block input (avoids per-count recompiles)
        pts = np.zeros((3 * SCAN_CAP, 3), np.float32)
        mask = np.zeros(3 * SCAN_CAP, bool)
        s_ = 0
        for k in (j - 1, j, j + 1):
            if 0 <= k < self.n_nodes and k != i:
                pk, qk = self._node_pose(k)
                R = nplie.quat_to_mat(qk).astype(np.float32)
                pts[s_ * SCAN_CAP:(s_ + 1) * SCAN_CAP] = \
                    self.scans[k] @ R.T + pk
                mask[s_ * SCAN_CAP:(s_ + 1) * SCAN_CAP] = \
                    self.scan_masks[k]
                s_ += 1
        if s_ == 0:
            return False
        ref = _build_map_jit(jnp.asarray(pts), jnp.asarray(mask),
                             leaf=self.cfg.lidar.vgicp_resolution,
                             table_size=1 << 17)
        hp = self._register(jnp.asarray(self.scans[i]),
                            jnp.asarray(self.scan_masks[i]), ref, p_i, q_i)
        if (float(hp[7]) > g.max_tolerable_fitness or int(hp[8]) < 100):
            return False
        p_new, q_new = hp[0:3], hp[3:7]
        # measured relative pose j→i from the registration result
        dp, dq = nplie.pose_between(p_j, q_j, p_new, q_new)
        self._add_edge(j, i, dp, dq, 20.0)
        self.loop_pairs.append((j, i))
        return True

    def _try_radius_loop(self, i: int) -> bool:
        """Proximity loop closure (same floor, skip recent)."""
        g = self.cfg.global_mapping
        lim = self.n_nodes - g.skip_recent_poses
        if lim <= 0:
            return False
        p_i = self.p_host[i]
        pos = self.p_host[:lim]
        d = np.linalg.norm(pos - p_i[None, :], axis=1)
        same_floor = np.asarray(self.floor_ids[:lim]) == self.floor_ids[i]
        cand = np.nonzero((d < g.proximity_threshold) & same_floor)[0]
        if len(cand) == 0:
            return False
        j = int(cand[np.argmin(d[cand])])
        return self._verify_loop(i, j)

    def _try_sc_loop(self, i: int) -> bool:
        """ScanContext loop proposal (reference SC thread :338-394)."""
        g = self.cfg.global_mapping
        lim = self.n_nodes - g.sc_num_exclude_recent
        if lim <= 0:
            return False
        db_mask = np.zeros(self.n_max, bool)
        db_mask[:lim] = True
        same_floor = np.asarray(
            [self.floor_ids[k] == self.floor_ids[i] if k < lim else False
             for k in range(self.n_max)])
        db_mask &= same_floor
        if not db_mask.any():
            return False
        # descriptors stay on device; ONE (2,K) fetch of (idx, dist)
        cand = np.asarray(_detect_pack_jit(
            self.sc_desc[i], self.sc_keys[i], self.sc_desc, self.sc_keys,
            jnp.asarray(db_mask), n_candidates=g.sc_num_candidates))
        dists = cand[1]
        best = int(np.argmin(dists))
        if not np.isfinite(dists[best]) or dists[best] > g.sc_dist_threshold:
            return False
        j = int(cand[0, best])
        return self._verify_loop(i, j)

    # --------------------------------------------------------------- output

    def precompile_event_paths(self):
        """Force-compile the RARE-event device programs (loop-closure
        detection/verification, pose-graph solve) so a real-time run
        never hits a tunnel cache-miss compile mid-stream — the first
        loop closure otherwise stalls the mapping stage for the full
        compile latency (observed 14 s at bench r5).  Call from a
        precompile pass after at least one submap exists."""
        if self.n_nodes == 0:
            return
        g = self.cfg.global_mapping
        jax.block_until_ready(_solve_graph_jit(
            self.graph, iters=g.pg_iters, cg_iters=g.pg_cg_iters).p)
        db_mask = np.zeros(self.n_max, bool)
        db_mask[: self.n_nodes] = True
        np.asarray(_detect_pack_jit(
            self.sc_desc[0], self.sc_keys[0], self.sc_desc, self.sc_keys,
            jnp.asarray(db_mask), n_candidates=g.sc_num_candidates))
        # _verify_loop's fixed 3-block reference build + registration
        pts = np.zeros((3 * SCAN_CAP, 3), np.float32)
        pts[:SCAN_CAP] = self.scans[0]
        mask = np.zeros(3 * SCAN_CAP, bool)
        mask[:SCAN_CAP] = self.scan_masks[0]
        ref = _build_map_jit(jnp.asarray(pts), jnp.asarray(mask),
                             leaf=self.cfg.lidar.vgicp_resolution,
                             table_size=1 << 17)
        p0, q0 = self._node_pose(0)
        self._register(jnp.asarray(self.scans[0]),
                       jnp.asarray(self.scan_masks[0]), ref, p0, q0)

    def ensure_descriptor(self, i: int):
        """Recompute a missing descriptor (checkpoint-restore path)."""
        g = self.cfg.global_mapping
        if not bool(jnp.any(self.sc_keys[i])):
            desc = _make_desc_jit(
                jnp.asarray(self.scans[i]), jnp.asarray(self.scan_masks[i]),
                n_ring=g.sc_num_ring, n_sector=g.sc_num_sector,
                max_radius=g.sc_max_radius)
            self.sc_desc = self.sc_desc.at[i].set(desc)
            self.sc_keys = self.sc_keys.at[i].set(sc.ring_key(desc))

    def trajectory(self):
        """Corrected keyed poses — the Backend.txt content."""
        return [(self.times[i], self.p_host[i], self.q_host[i])
                for i in range(self.n_nodes)]

    def save_trajectory(self, path: str):
        """TUM-format trajectory (reference SerialPath2File)."""
        with open(path, "w") as f:
            for t, p, q in self.trajectory():
                f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")

    def global_map(self, leaf: float | None = None):
        """Aggregated world-frame map cloud (the Map.pcd equivalent)."""
        if self.n_nodes == 0:
            return np.zeros((0, 3), np.float32)
        leaf = leaf or self.cfg.global_mapping.map_voxel_size
        pts_all = []
        for i in range(self.n_nodes):
            p_i, q_i = self._node_pose(i)
            R = nplie.quat_to_mat(q_i).astype(np.float32)
            pts_all.append((self.scans[i] @ R.T + p_i)[self.scan_masks[i]])
        pts = np.concatenate(pts_all, axis=0).astype(np.float32)
        cap = 1 << 17
        # fixed-shape input (pad/truncate to 4*cap): a varying point count
        # would recompile the downsample per map size
        buf = np.zeros((4 * cap, 3), np.float32)
        n = min(len(pts), 4 * cap)
        buf[:n] = pts[:n]
        m = np.zeros(4 * cap, bool)
        m[:n] = True
        ds = _downsample_jit(jnp.asarray(buf), jnp.asarray(m),
                             leaf=leaf, max_out=cap)
        return np.asarray(ds.pts)[np.asarray(ds.mask)]

    def mapping_stats(self) -> dict:
        """Mapping-health counters for the runner's JSON result (the
        reference surfaces these as RViz text markers,
        globalMappingIkdTree.cpp:860-884)."""
        return {
            "nodes": int(self.n_nodes),
            "edges": int(self.n_edges),
            "loops_closed": int(self.loops_closed),
            "map_refreshes": int(self.map_refreshes),
            "evictions": int(self.evictions),
        }
