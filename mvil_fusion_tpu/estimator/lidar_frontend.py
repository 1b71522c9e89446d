"""Scan-to-scan LiDAR processing inside the estimator.

Re-architecture of `Estimator::processLidar` (reference: vils_estimator/src/
estimator.cpp:122-504) and the LiDAR-IMU extrinsic calibration
(reference: lidar_frontend.cpp:32-331):

  sweep → bracket by window frames → deskew to sweep end (slerp from VIO
  poses) → voxel downsample → VGICP vs previous key sweep with VIO-predicted
  init → constraint-mode classification {0 off, 1 icp-fail, 2 agree,
  3 drift-correct, 4 zero-velocity, 5 pure-rotation} → bounded constraint
  list → factors for the window BA.

Device kernels do deskew/downsample/VGICP; the host only tracks the
constraint deque and calibration state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.estimator import lidar_factors as lf
from mvil_fusion_tpu.estimator import state as st
from mvil_fusion_tpu.ops import deskew as dsk, vgicp, voxel
from mvil_fusion_tpu.utils import lie

_deskew_jit = jax.jit(dsk.deskew_to_end, static_argnames=("scan_period",))
_downsample_jit = jax.jit(voxel.voxel_downsample,
                          static_argnames=("leaf", "max_out", "table_size"))
_build_map_jit = jax.jit(voxel.build_gaussian_voxel_map,
                         static_argnames=("leaf", "table_size", "min_points",
                                          "plane_eps"))
_vgicp_jit = jax.jit(vgicp.vgicp_align,
                     static_argnames=("iters", "max_corr_dist", "eps"))

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("scan_period", "leaf_size",
                                    "vgicp_resolution", "iters",
                                    "max_corr_dist", "ds_table",
                                    "vg_table"))
def _sweep_full_jit(pts, rel_time, mask, state_p, state_q, idx, alphas,
                    prev_stored_p, prev_stored_q, prev_bracketed, has_prev,
                    prev_vmap, q_lb, tlb, rlb,
                    scan_period, leaf_size, vgicp_resolution, iters,
                    max_corr_dist, ds_table=1 << 16, vg_table=1 << 16):
    """The ENTIRE per-sweep device pipeline as ONE program: window-pose
    interpolation → lidar-frame poses → deskew → downsamples → Gaussian
    voxel map → (when a previous key sweep exists) VGICP + constraint-mode
    classification inputs packed into one (46,) array.

    One program per sweep matters more than its FLOPs here: on the
    tunneled TPU every dependent program execution costs tens of ms of
    launch round-trip, so the old 5-program chain paid ~5x that before
    any readback.  idx (3,2)/alphas (3,) hold the (start, end, prev-end)
    window brackets computed on host."""
    dtype = jnp.float32

    def interp(k):
        i, j = idx[k, 0], idx[k, 1]
        a = alphas[k]
        q = lie.quat_slerp(state_q[i], state_q[j], a)
        p = state_p[i] * (1 - a) + state_p[j] * a
        return p, q

    p_bs, q_bs = interp(0)
    p_be, q_be = interp(1)
    p_bp_i, q_bp_i = interp(2)
    p_bp = jnp.where(prev_bracketed, p_bp_i, prev_stored_p)
    q_bp = jnp.where(prev_bracketed, q_bp_i, prev_stored_q)

    def b2l(p, q):
        return (p + lie.quat_rotate(q, tlb),
                lie.quat_normalize(lie.quat_mul(q, q_lb)))

    pl_s, ql_s = b2l(p_bs, q_bs)
    pl_e, ql_e = b2l(p_be, q_be)
    pl_p, ql_p = b2l(p_bp, q_bp)

    undist = dsk.deskew_to_end(pts, rel_time, pl_s, ql_s, pl_e, ql_e,
                               scan_period)
    down = voxel.voxel_downsample(undist, mask, leaf_size, 8192,
                                  table_size=ds_table)
    vmap_new = voxel.build_gaussian_voxel_map(undist, mask,
                                              vgicp_resolution,
                                              table_size=vg_table)
    reg = voxel.voxel_downsample(undist, mask, vgicp_resolution, 4096,
                                 table_size=ds_table)

    def with_reg():
        p_rel, q_rel = lie.pose_between(pl_p, ql_p, pl_e, ql_e)
        res = vgicp.vgicp_align(reg.pts, reg.mask, prev_vmap, vmap_new,
                                p_rel.astype(dtype), q_rel.astype(dtype),
                                iters=iters, max_corr_dist=max_corr_dist)
        yaw = jnp.abs(jnp.degrees(
            lie.mat_to_ypr(lie.quat_to_mat(q_rel))[0]))
        n_src = jnp.sum(reg.mask).astype(dtype)
        R_icp = lie.quat_to_mat(res.q)
        Rb = rlb @ R_icp @ rlb.T
        tb_ = rlb @ res.p + tlb - Rb @ tlb
        q_b_icp = lie.mat_to_quat(Rb)
        q_b_rel = lie.quat_mul(lie.quat_conj(q_bp), q_be)
        t_b_rel = lie.quat_rotate_inv(q_bp, p_be - p_bp)
        return jnp.concatenate([
            res.p.astype(dtype), res.q.astype(dtype),          # 0:3, 3:7
            jnp.stack([res.fitness.astype(dtype),
                       res.n_corr.astype(dtype), n_src,
                       yaw.astype(dtype)]),                    # 7:11
            p_rel.astype(dtype), q_rel.astype(dtype),          # 11:14,14:18
            tb_.astype(dtype), q_b_icp.astype(dtype),          # 18:21,21:25
            q_b_rel.astype(dtype), t_b_rel.astype(dtype),      # 25:29,29:32
            pl_e.astype(dtype), ql_e.astype(dtype),            # 32:35,35:39
            p_be.astype(dtype), q_be.astype(dtype),            # 39:42,42:46
            res.converged.astype(dtype)[None],                 # 46
        ])

    pack = jax.lax.cond(has_prev, with_reg,
                        lambda: jnp.zeros((47,), dtype))
    return (undist, down.pts, down.mask, vmap_new, reg.pts, reg.mask,
            pl_e, ql_e, p_be, q_be, pack)


def lidar_align(q_l: jnp.ndarray, t_l: jnp.ndarray, t_b: jnp.ndarray,
                q_b: jnp.ndarray, q_lb0: jnp.ndarray,
                plb_lower, plb_upper, iters: int = 40):
    """Joint (R_lb, T_lb) refinement from paired relative motions.

    Faithful port of the reference's bounded Ceres solve
    (reference: lidar_frontend.cpp Lidar_align :233-331, residual
    lidar_frontend.h LidarInitConstraint :156-238):
      translation rows: (I − R_l) T_lb − t_l + R_lb t_b
      rotation rows:    2·vec( R_lb R_b R_lbᵀ R_lᵀ )
    with T_lb box-bounded by PLB_* — solved with projected LM.

    Returns (q_lb, t_lb, ok).
    """
    from mvil_fusion_tpu.ops import lm as lm_mod

    dtype = t_l.dtype
    n = t_l.shape[0]
    R_l = lie.quat_to_mat(q_l)                    # (N,3,3)
    R_b = lie.quat_to_mat(q_b)
    I3 = jnp.eye(3, dtype=dtype)

    def residual(x):
        q_lb = lie.quat_boxplus(q_lb0, x[0:3])
        t_lb = x[3:6]
        R_lb = lie.quat_to_mat(q_lb)

        def per_pair(k):
            r_t = (I3 - R_l[k]) @ t_lb - t_l[k] + R_lb @ t_b[k]
            Rres = R_lb @ R_b[k] @ R_lb.T @ R_l[k].T
            r_r = 2.0 * lie.mat_to_quat(Rres)[1:4]
            return jnp.concatenate([r_t, r_r])

        return jax.vmap(per_pair)(jnp.arange(n)).reshape(-1)

    lower = jnp.concatenate([jnp.full((3,), -jnp.inf, dtype),
                             jnp.asarray(plb_lower, dtype)])
    upper = jnp.concatenate([jnp.full((3,), jnp.inf, dtype),
                             jnp.asarray(plb_upper, dtype)])
    x0 = jnp.zeros((6,), dtype)
    x0 = x0.at[3:6].set(jnp.clip(jnp.zeros(3, dtype),
                                 jnp.asarray(plb_lower, dtype),
                                 jnp.asarray(plb_upper, dtype)))
    res = lm_mod.lm_solve(residual, x0, iters=iters, lower=lower,
                          upper=upper)
    q_lb = lie.quat_boxplus(q_lb0, res.x[0:3])
    ok = float(res.cost) < 1.0   # reference gate: final_cost > 1.0 → fail
    return q_lb, res.x[3:6], ok


@dataclass
class IcpRecord:
    """Host-side record of one scan-to-scan constraint (the reference's
    LidarICPConstraint struct)."""

    mode: int
    t_i: float
    t_j: float
    ta: float
    tb: float
    tc: float
    td: float
    trans_p: np.ndarray
    trans_q: np.ndarray
    weight: float


@dataclass
class KeySweep:
    t_end: float
    pts: jnp.ndarray          # (M,3) downsampled, deskewed (lidar frame)
    mask: jnp.ndarray
    reg_pts: jnp.ndarray      # registration source (vgicp-leaf centroids)
    reg_mask: jnp.ndarray
    vmap: voxel.GaussianVoxelMap
    bracket: tuple            # (ta, tb) image times bracketing the sweep end
    p_w: np.ndarray           # body pose at sweep end (VIO, for prediction)
    q_w: np.ndarray


class LidarFrontend:
    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        lc = cfg.lidar
        self.rlb = np.asarray(lc.rlb, np.float32).reshape(3, 3)
        self.tlb = np.asarray(lc.tlb, np.float32)
        self.q_lb = np.asarray(lie.mat_to_quat(jnp.asarray(self.rlb)))
        self.constraints: list[IcpRecord] = []
        self.prev: Optional[KeySweep] = None
        self.first_zv = True
        self.zv_pose: Optional[tuple] = None
        self.last_mode = 0
        # LI extrinsic calibration buffers (lidar_frontend.cpp:32-141)
        self.calib_q_b: list = []
        self.calib_q_l: list = []
        self.calib_t_b: list = []
        self.calib_t_l: list = []
        self.calib_w: list = []
        # constraint-mode histogram (modes 0-5; the reference surfaces the
        # mode as colored RViz markers, mynteye_leishen_indoor.yaml:136)
        self.mode_counts = [0] * 6
        self.calibrated = not lc.use_estimated_extrinsic
        self.deskewed_world: Optional[tuple] = None   # for depth register
        # deferred-readback mode (async pipeline): the per-sweep packed
        # fetch is harvested at the next sweep or at build_constraints —
        # whichever comes first — instead of blocking right after dispatch
        self.defer_pack = False
        self._pending_pack: Optional[tuple] = None

    # -------------------------------------------------------------- helpers

    def _empty_vmap(self, table_size: int | None = None):
        """Placeholder previous-sweep map for the first sweep (the fused
        program's cond skips registration, but the pytree arg must have
        the real shapes)."""
        if table_size is None:
            table_size = self.cfg.lidar.vgicp_table_size
        return voxel.GaussianVoxelMap(
            mean=jnp.zeros((table_size, 3), jnp.float32),
            cov=jnp.zeros((table_size, 3, 3), jnp.float32),
            count=jnp.zeros((table_size,), jnp.float32),
            coords=jnp.full((table_size, 3), jnp.iinfo(jnp.int32).min,
                            jnp.int32),
            leaf=self.cfg.lidar.vgicp_resolution, table_size=table_size)

    def _body_to_lidar_pose(self, p_b, q_b):
        """T_w_l = T_w_b ∘ T_b_l (EX_LB maps lidar→body)."""
        q_l = lie.quat_mul(jnp.asarray(q_b), jnp.asarray(self.q_lb))
        p_l = jnp.asarray(p_b) + lie.quat_rotate(jnp.asarray(q_b),
                                                 jnp.asarray(self.tlb))
        return p_l, lie.quat_normalize(q_l)

    @staticmethod
    def find_bracket(times, t):
        """Nearest two window frames around t (reference FindNearest2ID)."""
        for i in range(len(times) - 1):
            if times[i] <= t <= times[i + 1]:
                return i, i + 1
        return None

    # ------------------------------------------------------------- main API

    def process_sweep(self, t_start: float, pts: np.ndarray,
                      rel_time: np.ndarray, mask: np.ndarray,
                      window_times: list, s: st.WindowState) -> Optional[dict]:
        """One compensated sweep against the current VIO window.

        Returns a dict with the deskewed downsampled cloud + lidar pose (for
        mapping/depth feedback), or None if the sweep cannot be bracketed.
        """
        lc = self.cfg.lidar
        self._harvest_pack()        # drain the previous sweep's deferred pack
        t_end = t_start + lc.scan_period
        bs = self.find_bracket(window_times, t_start)
        be = self.find_bracket(window_times, t_end)
        if bs is None or be is None:
            return None

        prev = self.prev

        def alpha(bracket, t):
            i, j = bracket
            return (t - window_times[i]) / max(window_times[j]
                                               - window_times[i], 1e-6)

        # host-computed brackets for (sweep start, sweep end, prev end);
        # the previous key-sweep pose is re-interpolated from the CURRENT
        # window when still bracketed (reference PredictRelative_rt,
        # lidar_frontend.cpp:921-987 — the stored snapshot goes stale as
        # the window re-optimizes), else its stored pose is used
        bp = (self.find_bracket(window_times, prev.t_end)
              if prev is not None else None)
        idx = np.asarray([bs, be, bp if bp is not None else (0, 1)],
                         np.int32)
        alphas = np.asarray(
            [alpha(bs, t_start), alpha(be, t_end),
             alpha(bp, prev.t_end) if bp is not None else 0.0], np.float32)

        if prev is not None:
            prev_vmap = prev.vmap
            prev_sp, prev_sq = prev.p_w, prev.q_w
        else:
            prev_vmap = self._empty_vmap()
            prev_sp = jnp.zeros(3, jnp.float32)
            prev_sq = jnp.asarray([1, 0, 0, 0], jnp.float32)

        # the WHOLE sweep is one device program + (at most) one fetch
        (undist, down_pts, down_mask, vmap_new, reg_pts, reg_mask,
         pl_e, ql_e, p_be, q_be, pack) = _sweep_full_jit(
            jnp.asarray(pts), jnp.asarray(rel_time), jnp.asarray(mask),
            s.p, s.q, jnp.asarray(idx), jnp.asarray(alphas),
            jnp.asarray(prev_sp), jnp.asarray(prev_sq),
            jnp.asarray(bp is not None), jnp.asarray(prev is not None),
            prev_vmap, jnp.asarray(self.q_lb), jnp.asarray(self.tlb),
            jnp.asarray(self.rlb),
            scan_period=lc.scan_period, leaf_size=lc.leaf_size,
            vgicp_resolution=lc.vgicp_resolution,
            iters=lc.vgicp_iters, max_corr_dist=lc.max_corr_dist,
            ds_table=lc.downsample_table_size,
            vg_table=lc.vgicp_table_size)

        out = dict(t_end=t_end, pts=down_pts, mask=down_mask,
                   full_pts=undist, full_mask=jnp.asarray(mask),
                   p_l=pl_e, q_l=ql_e, mode=0)
        cur = KeySweep(t_end=t_end, pts=down_pts, mask=down_mask,
                       reg_pts=reg_pts, reg_mask=reg_mask,
                       vmap=vmap_new,
                       bracket=(window_times[be[0]], window_times[be[1]]),
                       p_w=p_be, q_w=q_be)
        if prev is None:
            self.prev = cur
            return out

        if self.defer_pack:
            # background D2H transfer; classification + constraint record
            # happen at the harvest point (next sweep / build_constraints)
            try:
                pack.copy_to_host_async()
            except AttributeError:
                pass
            self._pending_pack = (pack, prev, cur)
            self.prev = cur
            out["mode"] = None        # known at harvest (self.last_mode)
            return out

        hp = np.asarray(pack)   # the sweep's single blocking readback
        mode = self._apply_sweep_pack(hp, prev, cur)
        out["mode"] = mode
        self.prev = cur
        return out

    def _harvest_pack(self):
        """Drain a deferred sweep pack (no-op when none is pending)."""
        if self._pending_pack is None:
            return
        pack, prev, cur = self._pending_pack
        self._pending_pack = None
        self._apply_sweep_pack(np.asarray(pack), prev, cur)

    def _apply_sweep_pack(self, hp: np.ndarray, prev: "KeySweep",
                          cur: "KeySweep") -> int:
        """Constraint-mode classification + record/calibration bookkeeping
        from the fetched (47,) sweep pack."""
        lc = self.cfg.lidar
        t_end = cur.t_end
        t_icp, q_icp = hp[0:3], hp[3:7]
        fitness = float(hp[7])
        n_corr = int(hp[8])
        n_src = int(hp[9])
        yaw_guess = abs(float(hp[10]))
        p_rel_h = hp[11:14]
        converged = bool(hp[46] > 0.5)

        # ---- constraint-mode classification (estimator.cpp:324-436);
        # additionally gate on correspondence count — with too few matched
        # voxels the registration is unconstrained garbage
        diff_t = float(np.abs(p_rel_h - t_icp).sum())
        icp_t_l1 = float(np.abs(t_icp).sum())
        icp_good = (fitness < lc.fitness_fail
                    and n_corr >= max(50, int(0.4 * n_src)))
        if icp_good and diff_t > 0.1 and converged:
            # drift-correct: only from a CONVERGED registration — the
            # reference trusts its fitness alone (estimator.cpp:340), but a
            # non-converged GN disagreeing with VIO by >10 cm is exactly
            # the case where the heavy mode-3 factor would inject garbage
            mode = 3
        elif icp_good:
            mode = 2
        else:
            mode = 1
        # zero-velocity / pure-rotation override (reference hardcodes the
        # 0.01 m gate for its point-to-point ICP; ours is configurable and
        # requires a trustworthy registration)
        if icp_t_l1 < lc.zero_velocity_trans and icp_good:
            mode = 4 if yaw_guess < lc.pure_rotation_yaw else 5
        self.last_mode = mode
        self.mode_counts[mode] += 1

        # body-frame measured relative translation (EX_LB⁻¹ T EX_LB) —
        # computed inside _sweep_full_jit, read from the pack
        tb_ = hp[18:21]
        q_b_icp = hp[21:25]

        rec = IcpRecord(
            mode=mode, t_i=prev.t_end, t_j=t_end,
            ta=prev.bracket[0], tb=prev.bracket[1],
            tc=cur.bracket[0], td=cur.bracket[1],
            trans_p=tb_.astype(np.float32), trans_q=q_b_icp,
            # reference weight is 100/fitness in its point-to-point metric;
            # our voxel-mean fitness has a discretization floor, so cap the
            # weight at the ~2 cm-sigma level to keep factors sane
            weight=min(100.0 / max(fitness, 1e-3), 50.0)
            if mode == 3 else 0.0)

        # zero-velocity bookkeeping (estimator.cpp:388-412)
        if mode == 4:
            if self.first_zv:
                self.zv_pose = (np.asarray(prev.p_w).copy(),
                                np.asarray(prev.q_w).copy())
                self.first_zv = False
                while len(self.constraints) > 1:
                    self.constraints.pop(0)
        elif mode == 3 and not self.first_zv and len(self.constraints) == 1:
            self.constraints.pop(0)
            self.first_zv = True
        self.constraints.append(rec)
        while len(self.constraints) > lf.MAX_ICP:
            self.constraints.pop(0)

        # LI extrinsic calibration data (rotation pairs weighted by fitness)
        if not self.calibrated and mode in (2, 3):
            q_b_rel = hp[25:29]
            t_b_rel = hp[29:32]
            self.calib_q_b.append(q_b_rel)
            self.calib_q_l.append(q_icp)
            self.calib_t_b.append(t_b_rel)
            self.calib_t_l.append(t_icp)
            self.calib_w.append(1.0 / max(fitness, 1e-2))
            if len(self.calib_q_b) >= 30:
                self._calibrate_extrinsics()
        return mode

    def _calibrate_extrinsics(self):
        """Hand-eye LI rotation (lidar_frontend.cpp
        CalibrationLidarExRotation :32-141) followed by the bounded joint
        (R_lb, T_lb) refinement (Lidar_align :233-331).

        One-shot eager LM solve → run on the in-process CPU backend when
        the default device is the tunneled TPU (eager primitives each pay
        a dispatch round-trip there)."""
        if jax.default_backend() != "cpu":
            try:
                cpu = jax.devices("cpu")[0]
            except RuntimeError:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    return self._calibrate_extrinsics_impl()
        return self._calibrate_extrinsics_impl()

    def _calibrate_extrinsics_impl(self):
        from mvil_fusion_tpu.estimator.initialization import hand_eye_rotation
        lc = self.cfg.lidar
        q_lb = hand_eye_rotation(
            jnp.asarray(np.asarray(self.calib_q_b), jnp.float32),
            jnp.asarray(np.asarray(self.calib_q_l), jnp.float32),
            jnp.asarray(np.asarray(self.calib_w), jnp.float32))
        q_lb_r, t_lb, ok = lidar_align(
            jnp.asarray(np.asarray(self.calib_q_l), jnp.float32),
            jnp.asarray(np.asarray(self.calib_t_l), jnp.float32),
            jnp.asarray(np.asarray(self.calib_t_b), jnp.float32),
            jnp.asarray(np.asarray(self.calib_q_b), jnp.float32),
            q_lb, jnp.asarray(lc.plb_lower, jnp.float32),
            jnp.asarray(lc.plb_upper, jnp.float32))
        if not ok:
            # keep rotation-only result, retry translation later
            # (reference watchdog resets after 200 frames,
            # lidar_frontend.cpp:58-63)
            if len(self.calib_q_b) > 200:
                self.calib_q_b.clear()
                self.calib_q_l.clear()
                self.calib_t_b.clear()
                self.calib_t_l.clear()
                self.calib_w.clear()
            return
        self.q_lb = np.asarray(q_lb_r)
        self.rlb = np.asarray(lie.quat_to_mat(q_lb_r))
        self.tlb = np.asarray(t_lb)
        self.calibrated = True

    # ------------------------------------------------------- factor tables

    def build_constraints(self, window_times: list):
        """Device tables for the window BA (modes 3 → ICP rows; any mode 4
        in the list → zero-velocity flag).

        In deferred mode the newest sweep's pack is NOT force-harvested
        here: its record enters the list at the next sweep instead, so the
        solve never blocks on the in-flight sweep program.  The reference
        has the same relaxation — its lidar thread classifies constraints
        concurrently with `process`, and whatever list exists at
        optimization time is used (estimator_node.cpp:338-376)."""
        if not self.defer_pack:
            self._harvest_pack()
        ids = np.zeros((lf.MAX_ICP, 4), np.int32)
        a_i = np.zeros(lf.MAX_ICP, np.float32)
        a_j = np.zeros(lf.MAX_ICP, np.float32)
        tp = np.zeros((lf.MAX_ICP, 3), np.float32)
        w = np.zeros(lf.MAX_ICP, np.float32)
        act = np.zeros(lf.MAX_ICP, bool)
        zero_vel = self.fill_constraint_tables(window_times, ids, a_i, a_j,
                                               tp, w, act)
        icp = lf.empty_icp()._replace(
            ids=jnp.asarray(ids), alpha_i=jnp.asarray(a_i),
            alpha_j=jnp.asarray(a_j), trans_p=jnp.asarray(tp),
            weight=jnp.asarray(w), active=jnp.asarray(act))
        return icp, zero_vel

    def fill_constraint_tables(self, window_times: list, ids, a_i, a_j,
                               tp, w, act) -> bool:
        """Write the 4-pose ICP constraint rows into the given arrays
        (host views of the frame pack).  Returns the zero-velocity flag.
        NOTE: does NOT harvest the in-flight sweep pack — the packed solve
        path harvests via build-time policy exactly as build_constraints."""
        zero_vel = False
        tmap = {round(t, 6): i for i, t in enumerate(window_times)}
        for k, rec in enumerate(self.constraints[-lf.MAX_ICP:]):
            if rec.mode == 4:
                zero_vel = True
                continue
            if rec.mode != 3:
                continue
            key = [tmap.get(round(t, 6)) for t in
                   (rec.ta, rec.tb, rec.tc, rec.td)]
            if any(v is None for v in key):
                continue
            ids[k] = key
            a_i[k] = (rec.t_i - rec.ta) / max(rec.tb - rec.ta, 1e-6)
            a_j[k] = (rec.t_j - rec.tc) / max(rec.td - rec.tc, 1e-6)
            tp[k] = rec.trans_p
            w[k] = rec.weight
            act[k] = True
        return zero_vel
