"""Sliding-window VIO estimator: the system kernel.

Host-side orchestration of the jitted device kernels, replacing the
reference's Estimator state machine (reference: vils_estimator/src/
estimator.cpp processIMU :86-120, processImage :506-616, slideWindow
:1689-1814; feature_manager.cpp addFeatureCheckParallax :45-105,
removeBackShiftDepth :283-345) and the measurement-pairing thread of
estimator_node.cpp:379-535.

The host owns only bookkeeping (ids, window indices, raw IMU buffers); all
numerics — preintegration, triangulation, BA, marginalization,
initialization solves — run as fixed-shape jitted programs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.estimator import ba, factors as fac, initialization as vinit
from mvil_fusion_tpu.estimator import lidar_factors as lfac
from mvil_fusion_tpu.estimator import state as st
from mvil_fusion_tpu.ops import preintegration as pre, triangulate as tri
from mvil_fusion_tpu.utils import hostpack, lie

IMU_NMAX = 256          # default per-interval raw-sample capacity
# (VIOEstimator sizes its own buffers from ImuConfig.max_imu_per_frame and
#  decimates on overflow — see _decimate_interval; this module constant is
#  only the default capacity for external callers such as bench.py)

# jitted entry points used by the (rare) initialization path; the steady
# state runs entirely through _frame_step_jit below
_preint_batch_jit = jax.jit(pre.preintegrate_batch)
_triangulate_jit = jax.jit(tri.triangulate_window)
_merge_inv_jit = jax.jit(lambda cur, v, m: jnp.where(m, v, cur))

from functools import partial as _partial


def _frame_step_body(state, feats, need_depth, accs, gyrs, dts, imu_masks,
                     prior, gravity, noise_cov, icp_tab, lps_tab, zero_vel,
                     fix_mask, focal, iters, marg_old):
    """The WHOLE per-frame device program, fused into one XLA executable:
    preintegration → triangulation of new landmarks → extras → window BA →
    failure metrics → marginalization.  One dispatch, one readback — the
    host only does bookkeeping between frames."""
    preints = pre.preintegrate_batch(accs, gyrs, dts,
                                     state.ba[:-1], state.bg[:-1],
                                     noise_cov, imu_masks)
    imask = imu_masks.any(axis=1)

    p_wc, q_wc = tri.camera_poses_from_body(state.p, state.q,
                                            state.tic, state.qic)
    inv_d, good = tri.triangulate_window(p_wc, q_wc, feats.obs, feats.mask,
                                         feats.start)
    upd = good & need_depth
    state = state._replace(inv_depth=jnp.where(upd, inv_d,
                                               state.inv_depth))

    eJ, er = _extras_body(state, icp_tab, lps_tab, zero_vel)
    prob = ba.BAProblem(
        feats=feats, preints=preints, interval_mask=imask, prior=prior,
        gravity=gravity, anchor_ref=state, extra_J=eJ, extra_r=er,
        extra_x0=state, fix_mask=fix_mask)
    res = ba.solve(state, prob, focal, iters=iters)
    s_new = _gauge_fix(state, res.state)

    prev_p = state.p[-1]
    metrics = jnp.stack([
        jnp.linalg.norm(s_new.ba[-1]),
        jnp.linalg.norm(s_new.bg[-1]),
        jnp.linalg.norm(s_new.p[-1] - prev_p),
        jnp.abs(s_new.p[-1, 2] - prev_p[2]),
        jnp.isfinite(jnp.sum(s_new.p)).astype(jnp.float32),
    ])

    if marg_old:
        prior_new = ba.marginalize_old(s_new, prob, focal)
    else:
        prior_new = ba.marginalize_second_new(s_new, prob)

    # everything the host consumes per frame, packed into ONE array so the
    # steady-state loop pays exactly one tunnel round-trip per frame:
    # [metrics(5) cost(1) p(3) q(4) v(3) tic(3) qic(4) td(1) bg(3)
    #  inv_depth(F)]
    host_pack = jnp.concatenate([
        metrics, res.cost1[None], s_new.p[-1], s_new.q[-1], s_new.v[-1],
        s_new.tic, s_new.qic, s_new.td[None], s_new.bg[-1],
        s_new.inv_depth])
    return s_new, prior_new, metrics, res.cost1, host_pack


_frame_step_jit = _partial(jax.jit,
                           static_argnames=("focal", "iters", "marg_old"))(
    _frame_step_body)


@_partial(jax.jit, static_argnames=("layout", "focal", "iters", "marg_old"))
def _frame_step_packed(state, prior, gravity, noise_cov, fix_mask,
                       f32, i32, b8, layout, focal, iters, marg_old):
    """Packed-argument frame step: the ~25 per-frame host tables (feature
    observations, IMU buffers, ICP/LPS constraint tables, depth seeds)
    arrive as THREE flat buffers (one per dtype class) and are unpacked
    with free slices here — each separate host→device transfer costs a
    tunnel latency floor (PERF.md §1), so the old one-array-per-table
    calling convention dominated the whole feature-event budget."""
    u = hostpack.unpack(layout, f32, i32, b8)
    state = state._replace(inv_depth=jnp.where(u["ov_mask"], u["ov_val"],
                                               state.inv_depth))
    feats = st.Features(start=u["start"], obs=u["obs"], vel=u["vel"],
                        td_ref=u["td_ref"], mask=u["mask"],
                        depth_fixed=u["depth_fixed"], valid=u["valid"])
    icp_tab = lfac.IcpConstraints(
        ids=u["icp_ids"], alpha_i=u["icp_ai"], alpha_j=u["icp_aj"],
        trans_p=u["icp_tp"], weight=u["icp_w"], active=u["icp_act"])
    lps_tab = lfac.LpsConstraints(
        ids=u["lps_ids"], alpha=u["lps_alpha"], q_meas=u["lps_qm"],
        active=u["lps_act"])
    return _frame_step_body(
        state, feats, u["need_depth"], u["accs"], u["gyrs"], u["dts"],
        u["imu_masks"], prior, gravity, noise_cov, icp_tab, lps_tab,
        u["zero_vel"][0], fix_mask, focal, iters, marg_old)


def _gauge_fix(s_old, s_new):
    """4-dof gauge re-anchor after every solve (the reference's
    double2vector, estimator.cpp:960-1074): rotate/translate the whole
    window so frame 0 keeps its pre-solve yaw and position.  Yaw and
    global translation are exact null directions of the visual-inertial
    cost (gravity [0,0,g] is yaw-invariant), so without this the gauge
    random-walks ~0.5°/solve — measured 14-26° of yaw drift over a 6 s
    fixture run, which then fights the mapping feedback and leaks
    g·sin(drift) into the accelerometer bias."""
    R_old0 = lie.quat_to_mat(s_old.q[0])
    R_new0 = lie.quat_to_mat(s_new.q[0])
    ypr_old = lie.mat_to_ypr(R_old0)
    ypr_new = lie.mat_to_ypr(R_new0)
    y_diff = ypr_old[0] - ypr_new[0]
    zero = jnp.zeros((), s_new.p.dtype)
    R_yaw = lie.ypr_to_mat(jnp.stack([y_diff, zero, zero]))
    # pitch-singularity fallback (reference: "euler singular point!")
    lim = jnp.deg2rad(89.0)
    singular = (jnp.abs(ypr_old[1]) > lim) | (jnp.abs(ypr_new[1]) > lim)
    R_diff = jnp.where(singular, R_old0 @ R_new0.T, R_yaw)
    q_diff = lie.mat_to_quat(R_diff)
    p = jnp.einsum("ij,wj->wi", R_diff,
                   s_new.p - s_new.p[0:1]) + s_old.p[0:1]
    v = jnp.einsum("ij,wj->wi", R_diff, s_new.v)
    q = jax.vmap(lambda qq: lie.quat_normalize(
        lie.quat_mul(q_diff, qq)))(s_new.q)
    return s_new._replace(p=p, q=q, v=v)


def _extras_body(s, icp_tab, lps_tab, zero_vel):
    J1, r1 = lfac.icp_system(s, icp_tab)
    J2, r2 = lfac.lps_system(s, lps_tab)
    J3, r3 = lfac.zero_velocity_system(s, zero_vel)
    return (jnp.concatenate([J1, J2, J3], axis=0),
            jnp.concatenate([r1, r2, r3], axis=0))


def _np_mat_to_ypr(R: np.ndarray) -> np.ndarray:
    """Host-side copy of lie.mat_to_ypr (ZYX radians) — keeps per-frame
    bookkeeping off the device."""
    yaw = np.arctan2(R[1, 0], R[0, 0])
    pitch = np.arctan2(-R[2, 0], R[0, 0] * np.cos(yaw) + R[1, 0] * np.sin(yaw))
    roll = np.arctan2(R[0, 2] * np.sin(yaw) - R[1, 2] * np.cos(yaw),
                      -R[0, 1] * np.sin(yaw) + R[1, 1] * np.cos(yaw))
    return np.asarray([yaw, pitch, roll], np.float32)


def _np_quat_to_ypr(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    R = np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
    return _np_mat_to_ypr(R)


@dataclass
class Obs:
    norm: np.ndarray        # (2,)
    vel: np.ndarray         # (2,)
    td_ref: float
    depth: float            # lidar depth, -1 unknown


@dataclass
class Track:
    id: int
    obs: dict               # window index -> Obs
    inv_depth: float = -1.0  # <0: not yet estimated
    depth_fixed: bool = False
    slot: int = -1

    @property
    def start(self) -> int:
        return min(self.obs)


@dataclass
class ImuInterval:
    acc: list = field(default_factory=list)
    gyr: list = field(default_factory=list)
    t: list = field(default_factory=list)


def _decimate_interval(iv: ImuInterval, cap: int) -> ImuInterval:
    """Thin an over-full interval to `cap` samples by keeping evenly spaced
    raw measurements (first & last always kept, dt totals preserved).

    Engaged when repeated marginalize-second-new merges grow an interval
    past the static device capacity — the bounded-error alternative to the
    silent truncation the reference never needs (its IntegrationBase stores
    unbounded std::vectors, factor/integration_base.h)."""
    n = len(iv.t)
    if n <= cap:
        return iv
    idx = np.unique(np.round(np.linspace(0, n - 1, cap)).astype(int))
    return ImuInterval(acc=[iv.acc[i] for i in idx],
                       gyr=[iv.gyr[i] for i in idx],
                       t=[iv.t[i] for i in idx])


class VIOEstimator:
    INITIAL = 0
    NON_LINEAR = 1

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        e = cfg.estimator
        self.W = e.window_size + 1
        self.F = e.max_features
        self.status = self.INITIAL
        self.frame_count = 0        # index of the next/current frame slot
        self.times: list[float] = []
        self.tracks: dict[int, Track] = {}
        self.slots: list[Optional[int]] = [None] * self.F  # slot -> id
        self.intervals: list[ImuInterval] = []  # len == len(times)-1 .. times
        self._pending = ImuInterval()
        self.last_imu: Optional[tuple] = None
        self.marg_old = True
        self._prior_valid = False

        W, F = self.W, self.F
        self.state = st.make_window_state(W, F)
        ric = np.asarray(e.ric, np.float32).reshape(3, 3)
        self.state = self.state._replace(
            qic=jnp.asarray(lie.mat_to_quat(jnp.asarray(ric))),
            tic=jnp.asarray(e.tic, jnp.float32),
            td=jnp.asarray(e.td_init, jnp.float32))
        self.prior = fac.empty_prior(W, F)
        # host caches of slow-moving state scalars, refreshed every solve
        # (a per-frame device fetch costs a ~45 ms tunnel round-trip)
        self.td_host = float(e.td_init)
        self.bg_host = np.zeros(3, np.float32)
        self.qic_host = np.asarray(lie.mat_to_quat(jnp.asarray(ric)))
        self.gravity = jnp.asarray([0.0, 0.0, cfg.imu.g_norm], jnp.float32)
        self.noise_cov = pre.noise_covariance(
            cfg.imu.acc_n, cfg.imu.gyr_n, cfg.imu.acc_w, cfg.imu.gyr_w)
        self._key = jax.random.PRNGKey(7)
        self._fix_mask = ba.make_fix_mask(
            W, fix_ext=(e.estimate_extrinsic == 0),
            fix_td=not e.estimate_td)
        self.failures = 0
        # per-interval IMU device capacity from config (reference analog:
        # unbounded vectors; here static shape + decimation on overflow)
        self.imu_nmax = max(int(cfg.imu.max_imu_per_frame), 8)
        self.imu_decimations = 0   # observability: how often overflow hit
        self.imu_disorder = 0      # dropped out-of-order IMU samples
        self.solve_info: dict = {}
        # deferred-readback mode (async pipeline): the per-frame packed
        # fetch is harvested at the START of the next solve instead of
        # blocking right after dispatch — copy_to_host_async prefetches the
        # pack in the background, so by harvest time the bytes are already
        # on host and the fetch costs ~0 instead of a tunnel round-trip
        # plus the device-queue drain.  Host mirrors (td/bg/trajectory/
        # failure detection) lag exactly one frame; values are identical.
        self.defer_readback = False
        self._pending_solve: Optional[tuple] = None
        self._rerooted_pending: set = set()
        # solver latency budget (reference ceres 0.05 s cap): adaptive
        # iteration selection between compiled variants.  Enforced only in
        # REAL-TIME mode — bench.py and run.py --realtime-budget set
        # enforce_budget=True (the reference's cap only matters in its
        # live node); an offline CPU replay would otherwise permanently
        # clamp to min iterations and silently degrade accuracy.
        self._iters_current = e.max_solver_iters
        self._headroom = 0
        self._solves = 0
        self.budget_overruns = 0
        self.enforce_budget = False
        # one reusable host->device pack for the per-frame tables (3
        # transfers per solve instead of ~25 — see utils/hostpack.py)
        NM, MI, ML = self.imu_nmax, lfac.MAX_ICP, lfac.MAX_LPS
        self._hp = hostpack.HostPack([
            ("obs", (F, W, 2), np.float32),
            ("vel", (F, W, 2), np.float32),
            ("td_ref", (F, W), np.float32),
            ("ov_val", (F,), np.float32),
            ("accs", (W - 1, NM, 3), np.float32),
            ("gyrs", (W - 1, NM, 3), np.float32),
            ("dts", (W - 1, NM), np.float32),
            ("icp_ai", (MI,), np.float32),
            ("icp_aj", (MI,), np.float32),
            ("icp_tp", (MI, 3), np.float32),
            ("icp_w", (MI,), np.float32),
            ("lps_alpha", (ML,), np.float32),
            ("lps_qm", (ML, 4), np.float32),
            ("start", (F,), np.int32),
            ("icp_ids", (MI, 4), np.int32),
            ("lps_ids", (ML, 2), np.int32),
            ("mask", (F, W), np.bool_),
            ("depth_fixed", (F,), np.bool_),
            ("valid", (F,), np.bool_),
            ("need_depth", (F,), np.bool_),
            ("ov_mask", (F,), np.bool_),
            ("imu_masks", (W - 1, NM), np.bool_),
            ("icp_act", (MI,), np.bool_),
            ("lps_act", (ML,), np.bool_),
            ("zero_vel", (1,), np.bool_),
        ])
        # trajectory log (world frame) — the engine's Frontend.txt
        self.trajectory: list[tuple] = []
        self.last_pose_host = None   # (p, q, tic, qic) from the last solve
        # online extrinsic/td stream — the reference's ex_results.txt
        # (estimator_node.cpp:312-336 pubEXresults)
        self.ex_results: list[tuple] = []
        # LiDAR coupling (created lazily to keep mono-VIO light)
        self.lidar = None
        self.lps_list: list[tuple] = []   # (t, p_w, q_w) localizer feedback
        self._lps_fresh = False   # reference LPS_call: arm LPS rows for
        #                           exactly ONE solve per new message

    # ------------------------------------------------------------- LiDAR

    def enable_lidar(self):
        from mvil_fusion_tpu.estimator.lidar_frontend import LidarFrontend
        if self.lidar is None:
            self.lidar = LidarFrontend(self.cfg)

    def process_lidar(self, t_start: float, pts: np.ndarray,
                      rel_time: np.ndarray, mask: np.ndarray):
        """One compensated LiDAR sweep (reference process_lidar thread,
        estimator_node.cpp:338-376 → Estimator::processLidar).

        Returns the deskewed cloud + interpolated lidar pose for the mapping
        back end and the depth-register feedback, or None."""
        if self.status != self.NON_LINEAR or self.lidar is None:
            return None
        n_t = min(len(self.times), self.W)
        return self.lidar.process_sweep(t_start, pts, rel_time, mask,
                                        self.times[:n_t], self.state)

    def process_lps(self, t: float, p_w: np.ndarray, q_w: np.ndarray):
        """Global-mapping localizer feedback ('LPS', reference
        estimator_node.cpp:442-460).  Pose given in the lidar frame is
        transformed by the LiDAR-IMU extrinsic."""
        if self.lidar is None:
            return
        rlb, tlb = self.lidar.rlb, self.lidar.tlb
        R = np.asarray(lie.quat_to_mat(jnp.asarray(q_w, jnp.float32)))
        p_b = R @ tlb + np.asarray(p_w)
        q_b = np.asarray(lie.mat_to_quat(jnp.asarray(
            R @ rlb, jnp.float32)))
        self.lps_list.append((t, p_b.astype(np.float32), q_b))
        while len(self.lps_list) > lfac.MAX_LPS:
            self.lps_list.pop(0)
        self._lps_fresh = True

    def _fill_lps_tables(self, ids, alpha, qm, act):
        """Write the LPS rotation-constraint table into the given arrays.
        qm rows default to identity (inactive rows must stay normalizable).

        Reference-faithful arming: the rows are only armed on the solve
        immediately following a NEW localizer message (the reference's
        `if (LPS_call)` gate, estimator.cpp:1287-1326, reset after one
        optimization), and lps_system applies the reference's Cauchy loss.
        Round-3 armed the list on EVERY solve without robustification;
        that continuously pins the window orientation against the (slowly
        drifting) map frame and the solver pays the g·sin(drift) residual
        out of the accelerometer bias — measured |ba| 0.5 → 1.6-3.5 m/s²
        on the fixture, tripping failureDetection."""
        qm[:, 0] = 1.0
        qm[:, 1:] = 0.0
        if not self._lps_fresh:
            return
        self._lps_fresh = False
        times = self.times[:self.W]
        for k, (t, p_b, q_b) in enumerate(self.lps_list[-lfac.MAX_LPS:]):
            for i in range(len(times) - 1):
                if times[i] <= t <= times[i + 1]:
                    if times[i + 1] - times[i] < 0.2:
                        ids[k] = (i, i + 1)
                        alpha[k] = (t - times[i]) / max(
                            times[i + 1] - times[i], 1e-6)
                        qm[k] = q_b
                        act[k] = True
                    break

    def _build_lps_table(self) -> lfac.LpsConstraints:
        tab = lfac.empty_lps()
        ids = np.zeros((lfac.MAX_LPS, 2), np.int32)
        alpha = np.zeros(lfac.MAX_LPS, np.float32)
        qm = np.zeros((lfac.MAX_LPS, 4), np.float32)
        act = np.zeros(lfac.MAX_LPS, bool)
        self._fill_lps_tables(ids, alpha, qm, act)
        return tab._replace(ids=jnp.asarray(ids), alpha=jnp.asarray(alpha),
                            q_meas=jnp.asarray(qm), active=jnp.asarray(act))

    # ------------------------------------------------------------------ IMU

    def process_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        """IMU intake.  Non-monotonic samples are REJECTED (the reference's
        disorder guard, estimator_node.cpp:238-242 "imu message in disorder")
        — a disordered stream would otherwise inject negative dt into the
        preintegration scan."""
        if self.last_imu is not None and t <= self.last_imu[0]:
            self.imu_disorder += 1
            if self.imu_disorder == 1:
                import warnings
                warnings.warn(
                    f"IMU timestamp disorder: {t:.6f} <= "
                    f"{self.last_imu[0]:.6f} — sample dropped",
                    RuntimeWarning, stacklevel=2)
            return
        self._pending.acc.append(np.asarray(acc, np.float32))
        self._pending.gyr.append(np.asarray(gyr, np.float32))
        self._pending.t.append(t)
        self.last_imu = (t, acc, gyr)

    # ------------------------------------------------------- feature frames

    def process_features(self, t: float, ids: np.ndarray, norm: np.ndarray,
                         vel: np.ndarray, depth: np.ndarray | None = None):
        """One feature frame (the estimator-side of the 'feature' topic).

        The frame is paired with IMU at stamp + current td estimate — the
        reference's td-aware getMeasurements (estimator_node.cpp:145-223) —
        so the projection factor's velocity term only compensates the small
        residual (td − td_at_pairing)."""
        if self.defer_readback:
            # harvest the previous frame's deferred pack BEFORE intake so
            # td/bg/qic host mirrors are exactly as fresh as in sync mode
            # (values identical, only the fetch timing differs); a deferred
            # failure reboots here and this frame starts the new session
            self._harvest_solve()
        td_now = self.td_host   # host cache, refreshed every solve — a
        t = t + td_now          # per-frame device fetch costs a tunnel RTT
        k = self.frame_count
        if depth is None:
            depth = np.full(len(ids), -1.0, np.float32)
        # 1. record observations at window position k
        for i, fid in enumerate(ids):
            fid = int(fid)
            if fid < 0:
                continue
            tr = self.tracks.get(fid)
            if tr is None:
                tr = Track(id=fid, obs={})
                self.tracks[fid] = tr
            tr.obs[k] = Obs(norm=norm[i].astype(np.float32),
                            vel=vel[i].astype(np.float32),
                            td_ref=td_now,
                            depth=float(depth[i]))
            if depth[i] > 0 and not tr.depth_fixed:
                # adopt lidar depth at the start observation
                if tr.start == k:
                    tr.inv_depth = 1.0 / float(depth[i])
                    tr.depth_fixed = True

        self.times.append(t)
        if len(self.times) == 1:
            # first frame: drop IMU buffered before the window starts,
            # keeping the newest pre-frame sample as the boundary seed
            iv = self._pending
            keep = [i for i, tt in enumerate(iv.t) if tt >= t]
            first = keep[0] if keep else len(iv.t)
            lo = max(first - 1, 0)
            self._pending = ImuInterval(acc=iv.acc[lo:], gyr=iv.gyr[lo:],
                                        t=iv.t[lo:])
        if len(self.times) >= 2:
            self.intervals.append(self._close_interval())

        # 2. keyframe decision
        self.marg_old = self._check_parallax(k)

        if k < self.W - 1:
            self.frame_count += 1
            return

        # window is full (frames 0..W-1 present)
        if self.status == self.INITIAL:
            if self._try_initialize():
                self.status = self.NON_LINEAR
                self._solve_and_slide()
            else:
                self._slide(old=self.marg_old)
        else:
            self._solve_and_slide()

    def _close_interval(self) -> ImuInterval:
        iv = self._pending
        self._pending = ImuInterval()
        # seed the next interval with the boundary sample for midpoint
        # continuity (the reference interpolates at boundaries,
        # estimator_node.cpp getMeasurements :145-223)
        if iv.acc:
            self._pending.acc.append(iv.acc[-1])
            self._pending.gyr.append(iv.gyr[-1])
            self._pending.t.append(iv.t[-1])
        return iv

    def _rel_cam_rotation(self, i: int) -> np.ndarray:
        """R_{c_i ← c_{i+1}}: gyro-predicted relative camera rotation over
        interval i (bias-corrected trapezoid integration, host-side)."""
        if i >= len(self.intervals):
            return np.eye(3, dtype=np.float32)
        iv = self.intervals[i]
        if len(iv.t) < 2:
            return np.eye(3, dtype=np.float32)
        bg = self.bg_host   # newest gyro bias, host cache (≈ bg[i] —
        #                     biases random-walk slowly inside one window)
        g = np.asarray(iv.gyr) - bg[None, :]
        dt = np.diff(np.asarray(iv.t))
        phi = np.sum(0.5 * (g[:-1] + g[1:]) * dt[:, None], axis=0)
        ang = np.linalg.norm(phi)
        if ang < 1e-12:
            R_b = np.eye(3)
        else:                      # Rodrigues
            a = phi / ang
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]],
                          [-a[1], a[0], 0]])
            R_b = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        w, x, y, z = np.asarray(self.qic_host, np.float64)
        Ric = np.asarray([   # host cache — avoid a per-frame device fetch
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        return (Ric.T @ R_b @ Ric).astype(np.float32)

    def _check_parallax(self, k: int) -> bool:
        """True → marginalize old (current frame 2nd-newest is a keyframe).
        Mirrors addFeatureCheckParallax / compensatedParallax2
        (feature_manager.cpp:45-105): the displacement between frames k-2
        and k-1 is measured after removing the gyro-predicted rotation, so
        pure rotation does not fake parallax (per feature we keep
        min(raw, compensated) as the reference's formula does)."""
        if k < 2:
            return True
        long_tracks = sum(1 for tr in self.tracks.values()
                          if k - 1 in tr.obs and tr.start <= k - 2)
        if long_tracks < 20:
            return True
        pairs = [(tr.obs[k - 2].norm, tr.obs[k - 1].norm)
                 for tr in self.tracks.values()
                 if k - 1 in tr.obs and k - 2 in tr.obs]
        if not pairs:
            return True
        R_ij = self._rel_cam_rotation(k - 2)      # c_{k-2} ← c_{k-1}
        p_i = np.asarray([a for a, _ in pairs])   # (N,2) frame k-2
        p_j = np.asarray([b for _, b in pairs])   # (N,2) frame k-1
        rays_j = np.concatenate([p_j, np.ones((len(p_j), 1), np.float32)],
                                axis=1)
        rot = rays_j @ R_ij.T
        p_comp = rot[:, :2] / np.maximum(np.abs(rot[:, 2:3]), 1e-6) \
            * np.sign(rot[:, 2:3])
        raw = np.linalg.norm(p_j - p_i, axis=1)
        comp = np.linalg.norm(p_comp - p_i, axis=1)
        par = np.minimum(raw, comp)
        min_par = self.cfg.estimator.min_parallax / self.cfg.estimator.focal_length
        return float(np.mean(par)) >= min_par

    # ------------------------------------------------------- device tables

    def _fill_imu_tables(self, accs, gyrs, dts, masks):
        """Write padded per-interval raw IMU buffers into the given arrays.

        Intervals longer than the static capacity are decimated (evenly
        spaced samples, total dt preserved) rather than truncated."""
        W, NM = self.W, self.imu_nmax
        for kk in range(min(W - 1, len(self.intervals))):
            iv = self.intervals[kk]
            if len(iv.acc) > NM:
                iv = _decimate_interval(iv, NM)
                self.intervals[kk] = iv
                self.imu_decimations += 1
            n = len(iv.acc)
            if n < 2:
                continue
            accs[kk, :n] = np.asarray(iv.acc)
            gyrs[kk, :n] = np.asarray(iv.gyr)
            dts[kk, :n - 1] = np.diff(np.asarray(iv.t))
            masks[kk, :n] = True

    def _imu_buffers(self):
        """Padded per-interval raw IMU buffers as device arrays
        (initialization path; the steady-state solve uses the pack)."""
        W, NM = self.W, self.imu_nmax
        accs = np.zeros((W - 1, NM, 3), np.float32)
        gyrs = np.zeros((W - 1, NM, 3), np.float32)
        dts = np.zeros((W - 1, NM), np.float32)
        masks = np.zeros((W - 1, NM), bool)
        self._fill_imu_tables(accs, gyrs, dts, masks)
        return (jnp.asarray(accs), jnp.asarray(gyrs), jnp.asarray(dts),
                jnp.asarray(masks))

    def _preintegrate_all(self):
        accs, gyrs, dts, masks = self._imu_buffers()
        imask = masks.any(axis=1)
        preints = _preint_batch_jit(
            accs, gyrs, dts, self.state.ba[:-1], self.state.bg[:-1],
            self.noise_cov, masks)
        return preints, imask

    def _assign_slots(self):
        """Stable slot assignment for features usable in BA."""
        active = {fid for fid, tr in self.tracks.items()
                  if len(tr.obs) >= 2}
        # free slots of dead features
        for s, fid in enumerate(self.slots):
            if fid is not None and fid not in active:
                self.slots[s] = None
                if fid in self.tracks:
                    self.tracks[fid].slot = -1
        free = [s for s, fid in enumerate(self.slots) if fid is None]
        # prefer long tracks when capacity is tight
        order = sorted(active, key=lambda f: -len(self.tracks[f].obs))
        for fid in order:
            tr = self.tracks[fid]
            if tr.slot >= 0:
                continue
            if not free:
                break
            s = free.pop(0)
            self.slots[s] = fid
            tr.slot = s

    def _fill_feature_tables(self, start, obs, vel, td_ref, mask, fixed,
                             valid, ov_val, ov_mask, need_depth=None):
        """Write the per-slot feature tables into the given arrays (host
        views of the frame pack, or scratch arrays for the init path)."""
        W = self.W
        for s, fid in enumerate(self.slots):
            if fid is None:
                continue
            tr = self.tracks[fid]
            start[s] = tr.start
            for k, o in tr.obs.items():
                if 0 <= k < W:
                    obs[s, k] = o.norm
                    vel[s, k] = o.vel
                    td_ref[s, k] = o.td_ref
                    mask[s, k] = True
            fixed[s] = tr.depth_fixed
            valid[s] = mask[s].sum() >= 2
            if tr.inv_depth > 0:
                ov_val[s] = tr.inv_depth
                ov_mask[s] = True
            if need_depth is not None:
                need_depth[s] = tr.inv_depth <= 0 and not tr.depth_fixed

    def _build_features(self) -> st.Features:
        """Standalone feature-table build (initialization path; the
        steady-state solve ships the same tables inside the frame pack)."""
        W, F = self.W, self.F
        start = np.zeros(F, np.int32)
        obs = np.zeros((F, W, 2), np.float32)
        vel = np.zeros((F, W, 2), np.float32)
        td_ref = np.zeros((F, W), np.float32)
        mask = np.zeros((F, W), bool)
        fixed = np.zeros(F, bool)
        valid = np.zeros(F, bool)
        # host-known depth seeds merge into the device vector with a tiny
        # jitted where() — fetching state.inv_depth here would cost a
        # tunnel round-trip per frame
        ov_val = np.zeros(F, np.float32)
        ov_mask = np.zeros(F, bool)
        self._fill_feature_tables(start, obs, vel, td_ref, mask, fixed,
                                  valid, ov_val, ov_mask)
        self.state = self.state._replace(inv_depth=_merge_inv_jit(
            self.state.inv_depth, jnp.asarray(ov_val),
            jnp.asarray(ov_mask)))
        return st.Features(
            start=jnp.asarray(start), obs=jnp.asarray(obs),
            vel=jnp.asarray(vel), td_ref=jnp.asarray(td_ref),
            mask=jnp.asarray(mask), depth_fixed=jnp.asarray(fixed),
            valid=jnp.asarray(valid))

    def _triangulate_new(self, feats: st.Features):
        """Estimate depths for features without one (feature_manager
        triangulate :214-268; lidar-depth features skipped)."""
        p_wc, q_wc = tri.camera_poses_from_body(
            self.state.p, self.state.q, self.state.tic, self.state.qic)
        inv_d, good = _triangulate_jit(p_wc, q_wc, feats.obs,
                                       feats.mask, feats.start)
        inv_prev = np.asarray(self.state.inv_depth)
        need = np.asarray([
            (self.slots[s] is not None
             and self.tracks[self.slots[s]].inv_depth <= 0
             and not self.tracks[self.slots[s]].depth_fixed)
            for s in range(self.F)])
        good = np.asarray(good) & need
        inv_new = np.where(good, np.asarray(inv_d), inv_prev)
        self.state = self.state._replace(inv_depth=jnp.asarray(inv_new))
        for s in np.nonzero(good)[0]:
            self.tracks[self.slots[s]].inv_depth = float(inv_new[s])

    # ------------------------------------------------------- initialization

    def _try_initialize(self) -> bool:
        """Initialization entry: on a TPU backend the whole one-shot
        solve chain (SfM RANSAC, hand-eye, the bounded stage-A/B LM
        solvers) runs on the in-process CPU backend — these run EAGERLY
        (op-by-op), and through the tunneled TPU every primitive costs a
        dispatch round-trip (~5 min per attempt vs <1 s on host CPU)."""
        if jax.default_backend() == "cpu":
            return self._try_initialize_impl()
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            return self._try_initialize_impl()
        with jax.default_device(cpu):
            ok = self._try_initialize_impl()
        if ok:
            # commit the initialized state back to the default device
            dev = jax.devices()[0]
            self.state = jax.device_put(self.state, dev)
            self.prior = jax.device_put(self.prior, dev)
        return ok

    def _try_initialize_impl(self) -> bool:
        W = self.W
        e = self.cfg.estimator
        feats = None
        # observation table over the full window
        obs = np.zeros((self.F, W, 2), np.float32)
        mask = np.zeros((self.F, W), bool)
        self._assign_slots()
        for s, fid in enumerate(self.slots):
            if fid is None:
                continue
            tr = self.tracks[fid]
            for k, o in tr.obs.items():
                if 0 <= k < W:
                    obs[s, k] = o.norm
                    mask[s, k] = True

        # candidate reference frames l with enough parallax vs the newest
        # frame (reference relativePose, estimator.cpp:873-901 takes the
        # FIRST; here EVERY viable candidate is scored by the stage-A
        # rotation-consistency cost below and the best wins — the greedy
        # first-l choice is fragile: an anchor whose SfM is geometrically
        # poor can pass every downstream gate yet seed a solve with 10x
        # the steady-state cost, and the failure detector then reboots)
        cands = []
        for cand in range(W - 1):
            sel = mask[:, cand] & mask[:, W - 1]
            if sel.sum() < 20:
                continue
            par = np.linalg.norm(obs[sel, cand] - obs[sel, W - 1],
                                 axis=1).mean()
            if par < 30.0 / 460.0:
                continue
            self._key, sub = jax.random.split(self._key)
            r = vinit.essential_relative_pose(
                sub, jnp.asarray(obs[:, cand]), jnp.asarray(obs[:, W - 1]),
                jnp.asarray(sel))
            if bool(r.ok):
                cands.append((cand, r))
        if not cands:
            return False

        preints, imask = self._preintegrate_all()

        # stage A per candidate: gyro bias (+ optional RIC/td refinement)
        gyr_first = np.zeros((W - 1, 3), np.float32)
        gyr_last = np.zeros((W - 1, 3), np.float32)
        for kk in range(W - 1):
            iv = self.intervals[kk]
            if iv.gyr:
                gyr_first[kk] = iv.gyr[0]
                gyr_last[kk] = iv.gyr[-1]

        best = None      # (cost, l, sfm, stage_a)
        for cand, r in cands:
            sfm_c = vinit.global_sfm(obs, mask, cand, np.asarray(r.R),
                                     np.asarray(r.t))
            if not sfm_c.ok:
                continue
            sa = vinit.estimate_ric_td_bg(
                jnp.asarray(sfm_c.q_c0_c), preints,
                jnp.asarray(gyr_first), jnp.asarray(gyr_last),
                self.state.qic, fix_ric=(e.estimate_extrinsic == 0))
            if not sa.ok:
                continue
            c = float(sa.cost)
            if best is None or c < best[0]:
                best = (c, cand, sfm_c, sa)
            if c < 1e-8:
                break    # essentially exact — no need to try further l
        if best is None:
            return False
        _, l, sfm, stage_a = best
        p_c0_c = jnp.asarray(sfm.p_c0_c)
        q_c0_c = jnp.asarray(sfm.q_c0_c)
        q_ric = stage_a.q_ric

        # The (bgs, td) solution is only consistent PER INTERVAL — the
        # reference repropagates each interval with its own bgs
        # (init_refine_delta_pvq_bgs) and applies the td rotation correction
        # to each frame's camera rotation (initial_aligment.cpp:306-325).
        # Re-preintegrate with per-interval biases:
        per_frame_bg = jnp.concatenate(
            [stage_a.bgs, stage_a.bgs[-1:]], axis=0)       # (W,3)
        self.state = self.state._replace(bg=per_frame_bg, qic=q_ric)
        preints, imask = self._preintegrate_all()

        # body rotations in c0 with the td correction:
        # q_c0_bi = q_c0_ci ⊗ q_ric⁻¹ ⊗ [1, ½·w_i·td_i]  (frames 0..W-2;
        # the last frame is left uncorrected, as in the reference loop)
        w_td = np.concatenate([gyr_first, np.zeros((1, 3), np.float32)],
                              axis=0)
        qr_td = jnp.concatenate(
            [jnp.ones((W, 1), jnp.float32),
             0.5 * jnp.asarray(w_td) * stage_a.td[:, None]], axis=1)
        q_c0_b = jax.vmap(lambda qc, qtd: lie.quat_normalize(lie.quat_mul(
            lie.quat_mul(qc, lie.quat_conj(q_ric)), lie.quat_normalize(qtd)
        )))(q_c0_c, qr_td)

        # Production init path mirrors the reference dispatcher
        # (initial_aligment.cpp:486-519): the bounded stage-B solve
        # (per-frame scale s[i], per-interval acc bias, pbc, gravity
        # direction) is the authority.  It is seeded from the closed-form
        # linear alignment — the per-frame-scale system is underdetermined,
        # so LM needs to start in the consistent basin — and falls back to
        # the linear solution if its gate fails.
        e_cfg = self.cfg.estimator
        lin = vinit.linear_alignment(p_c0_c, q_c0_b, preints,
                                     self.cfg.imu.g_norm, self.state.tic)
        # scale-observability gate: if the alignment cannot DETERMINE the
        # metric scale from this window (1-sigma > 25% of the estimate),
        # defer initialization — keyframe selection stretches the window
        # span every frame, so a later window resolves it.  A confidently
        # wrong scale here costs far more than a late start: the window BA
        # must then bend the trajectory onto the IMU's metric frame and
        # parks ~g·sin(tilt) in the accel bias until the bad frames
        # marginalize out (measured |ba| up to 2.5-3.5 m/s², tripping the
        # reference's failureDetection thresholds).
        self.solve_info["init_scale_sigma"] = (
            round(lin.scale_sigma / max(float(lin.scale), 1e-9), 4))
        if (not np.isfinite(lin.scale_sigma)
                or lin.scale_sigma > 0.25 * max(float(lin.scale), 1e-9)):
            return False
        seed = dict(vel0=lin.vel, g0=lin.g_c0, scale0=lin.scale) \
            if (lin.ok and float(lin.scale) > 1e-3) else {}
        stage_b = vinit.estimate_vel_g_s_tic(
            p_c0_c, q_c0_b, preints, self.cfg.imu.g_norm,
            self.state.tic,
            jnp.asarray(e_cfg.pbc_lower, jnp.float32),
            jnp.asarray(e_cfg.pbc_upper, jnp.float32),
            fix_pbc=(e_cfg.estimate_extrinsic == 0), **seed)
        scale_vec = np.asarray(stage_b.scale)
        if stage_b.ok and float(scale_vec.min()) > 1e-3:
            init_path = "novel_stage_b"
            s = stage_b.scale                       # (W,) per-frame scale
            g_c0 = stage_b.g_c0
            align_vel = stage_b.vel
            align_cost = stage_b.cost
            # adopt refined pbc and per-interval acc bias (reference
            # visualInitialAlign applies S[i], TIC, Bas — estimator.cpp
            # :771-871)
            self.state = self.state._replace(
                tic=stage_b.pbc,
                ba=jnp.concatenate([stage_b.bas, stage_b.bas[-1:]], axis=0))
        else:
            # the linear fallback must itself be consistent: a window whose
            # closed-form alignment has large residual (e.g. it still spans
            # corrupted IMU after a reboot) must NOT seed the filter — the
            # reference rejects such windows via its solver cost/excitation
            # gates and simply waits for the next frame.
            if (not lin.ok or float(lin.scale) < 1e-3
                    or lin.cost > 5e-3):
                return False
            init_path = "linear_fallback"
            s = jnp.full((W,), lin.scale)           # single global scale
            g_c0 = lin.g_c0
            align_vel = lin.vel
            align_cost = lin.cost

        # ---- apply: gravity-align to world (visualInitialAlign,
        # reference estimator.cpp:771-871)
        R0 = lie.g2R(g_c0)
        # zero the yaw of frame 0
        R_b0 = lie.quat_to_mat(q_c0_b[0])
        yaw0 = lie.mat_to_ypr(R0 @ R_b0)[0]
        Ryaw = lie.ypr_to_mat(jnp.stack([-yaw0, jnp.zeros(()), jnp.zeros(())]))
        R0 = Ryaw @ R0

        R_c0_b = lie.quat_to_mat(q_c0_b)                     # (W,3,3)
        p_body_c0 = (s[:, None] * p_c0_c
                     - jnp.einsum("wij,j->wi", R_c0_b, self.state.tic))
        p_w = jnp.einsum("ij,wj->wi", R0, p_body_c0)
        p_w = p_w - p_w[0:1]
        q_w = jax.vmap(lambda q: lie.quat_mul(
            lie.mat_to_quat(R0), q))(q_c0_b)
        v_w = jnp.einsum("ij,wj->wi", R0,
                         jnp.einsum("wij,wj->wi", R_c0_b, align_vel))

        self.state = self.state._replace(p=p_w, q=jax.vmap(
            lie.quat_normalize)(q_w), v=v_w)

        # depths from triangulation with the aligned poses
        feats = self._build_features()
        # reset depth estimates (scale changed)
        for tr in self.tracks.values():
            if not tr.depth_fixed:
                tr.inv_depth = -1.0
        self._triangulate_new(feats)
        self.solve_info["init"] = dict(
            l=l, path=init_path, scale=np.asarray(s).tolist(),
            stage_a_cost=stage_a.cost, align_cost=align_cost)
        return True

    # ------------------------------------------------------- solve + slide

    def _solve_and_slide(self):
        W, F = self.W, self.F
        e = self.cfg.estimator
        if self.defer_readback and not self._harvest_solve():
            return      # deferred failure detected -> rebooted, skip frame
        self._assign_slots()
        hp = self._hp
        hp.zero()
        self._fill_feature_tables(
            hp["start"], hp["obs"], hp["vel"], hp["td_ref"], hp["mask"],
            hp["depth_fixed"], hp["valid"], hp["ov_val"], hp["ov_mask"],
            need_depth=hp["need_depth"])
        self._fill_imu_tables(hp["accs"], hp["gyrs"], hp["dts"],
                              hp["imu_masks"])
        if self.lidar is not None:
            if not self.lidar.defer_pack:
                self.lidar._harvest_pack()
            hp["zero_vel"][0] = self.lidar.fill_constraint_tables(
                self.times[:W], hp["icp_ids"], hp["icp_ai"], hp["icp_aj"],
                hp["icp_tp"], hp["icp_w"], hp["icp_act"])
            self._fill_lps_tables(hp["lps_ids"], hp["lps_alpha"],
                                  hp["lps_qm"], hp["lps_act"])
        else:
            hp["lps_qm"][:, 0] = 1.0

        prior_valid_host = bool(self._prior_valid)
        import time as _time
        t0_solve = _time.perf_counter()
        f32, i32, b8 = hp.buffers()
        s_new, prior_new, metrics, cost1, host_pack = _frame_step_packed(
            self.state, self.prior, self.gravity, self.noise_cov,
            self._fix_mask, f32, i32, b8, layout=hp.layout,
            focal=e.focal_length, iters=self._iters_current,
            marg_old=self.marg_old)
        self._solves += 1

        if self.defer_readback:
            # start the background D2H transfer and harvest at the next
            # solve; commit device state + prior + slide now (identical
            # values, host mirrors lag one frame)
            try:
                host_pack.copy_to_host_async()
            except AttributeError:
                pass
            self._pending_solve = (host_pack, self.times[-1])
            self._rerooted_pending = set()
            self.state = s_new
            if self.marg_old:
                self.prior = prior_new
                self._prior_valid = True
                self._slide(old=True)
            else:
                if prior_valid_host:
                    self.prior = prior_new
                self._slide(old=False)
            return

        # ONE blocking readback per frame (the pack is assembled on device;
        # separate fetches each pay the ~45 ms tunnel round-trip)
        hp = np.asarray(host_pack)
        self._update_iter_budget(_time.perf_counter() - t0_solve)
        ban, bgn, dp, dz, finite = hp[0:5]
        self.solve_info["ban"] = float(ban)
        self.solve_info["bgn"] = float(bgn)
        c_h = hp[5]
        p_h, q_h, v_h = hp[6:9], hp[9:13], hp[13:16]
        tic_h, qic_h, td_h = hp[16:19], hp[19:23], float(hp[23])
        bg_h = hp[24:27]
        inv_h = hp[27:]
        if (finite < 0.5 or ban > e.fail_ba_norm or bgn > e.fail_bg_norm
                or dp > e.fail_trans_jump or dz > e.fail_z_jump):
            self.solve_info["failure"] = dict(
                t=self.times[-1], ban=float(ban), bgn=float(bgn),
                dp=float(dp), dz=float(dz), finite=float(finite))
            self._reboot()
            return

        self.state = s_new
        self.td_host = td_h
        self.bg_host = bg_h.astype(np.float32)
        self.qic_host = qic_h.astype(np.float32)
        self.solve_info["cost"] = float(c_h)
        for s, fid in enumerate(self.slots):
            if fid is not None and not self.tracks[fid].depth_fixed:
                self.tracks[fid].inv_depth = float(inv_h[s])
        self.trajectory.append((self.times[-1], p_h, q_h, v_h))
        # newest pose for host consumers (depth register camera pose) —
        # saves them a device fetch
        self.last_pose_host = (p_h, q_h, tic_h, qic_h)
        self._record_ex_results(self.times[-1], tic_h, qic_h, td_h)

        # marginalize + slide (the prior was computed inside the fused step)
        if self.marg_old:
            self.prior = prior_new
            self._prior_valid = True
            self._slide(old=True)
        else:
            if prior_valid_host:
                self.prior = prior_new
            self._slide(old=False)

    def _update_iter_budget(self, elapsed: float):
        """Adaptive solver-iteration selection against the wall-clock
        budget (reference: Ceres max_solver_time_in_seconds=0.05 AND
        max_num_iterations, estimator.cpp:1400-1414).  A compiled XLA
        program cannot stop mid-flight, so overruns halve the iteration
        count for the NEXT frames (a separately compiled variant) and
        sustained headroom steps back up.  Compile hiccups (>5 s) are
        ignored; the first frames are warmup."""
        e = self.cfg.estimator
        budget = e.solver_time_budget_s
        self.solve_info["solve_block_s"] = round(elapsed, 4)
        self.solve_info["solver_iters"] = self._iters_current
        if (not self.enforce_budget or budget <= 0 or self._solves <= 3
                or elapsed > 5.0):
            return
        if elapsed > budget:
            self.budget_overruns += 1
            self.solve_info["budget_overruns"] = self.budget_overruns
            if self._iters_current > e.min_solver_iters:
                self._iters_current = max(e.min_solver_iters,
                                          self._iters_current // 2)
            self._headroom = 0
        else:
            self._headroom += 1
            if (self._headroom >= 20
                    and self._iters_current < e.max_solver_iters):
                self._iters_current = min(e.max_solver_iters,
                                          self._iters_current * 2)
                self._headroom = 0
        self.solve_info["solver_iters"] = self._iters_current

    def precompile_iter_variants(self):
        """Force-compile every solver-iteration variant the adaptive budget
        can select (each `iters` is a static argument → its own XLA
        executable).  Run from the bench's throwaway precompile subprocess
        so the measuring process never cache-misses mid-run when the
        budget halves the iteration count."""
        e = self.cfg.estimator
        variants = {e.max_solver_iters}
        it = e.max_solver_iters
        while it > e.min_solver_iters:
            it = max(e.min_solver_iters, it // 2)
            variants.add(it)
        f32, i32, b8 = self._hp.buffers()
        for it in sorted(variants):
            for marg_old in (True, False):
                out = _frame_step_packed(
                    self.state, self.prior, self.gravity, self.noise_cov,
                    self._fix_mask, f32, i32, b8, layout=self._hp.layout,
                    focal=e.focal_length, iters=it, marg_old=marg_old)
                jax.block_until_ready(out[4])

    def _harvest_solve(self) -> bool:
        """Deferred-readback harvest: fetch the previous frame's pack
        (already transferred in the background) and apply the host
        bookkeeping — td/bg/qic mirrors, inv-depth mirrors, trajectory,
        ex_results, failure detection.  Returns False when the deferred
        failure check fires (the estimator rebooted; the caller must skip
        the current frame)."""
        pend = self._pending_solve
        if pend is None:
            return True
        self._pending_solve = None
        host_pack, t_frame = pend
        e = self.cfg.estimator
        import time as _time
        t0 = _time.perf_counter()
        hp = np.asarray(host_pack)
        # deferred mode: the budget-relevant latency is the time the frame
        # loop actually WAITED for the pack (≈0 when the solve kept up)
        self._update_iter_budget(_time.perf_counter() - t0)
        ban, bgn, dp, dz, finite = hp[0:5]
        if (finite < 0.5 or ban > e.fail_ba_norm or bgn > e.fail_bg_norm
                or dp > e.fail_trans_jump or dz > e.fail_z_jump):
            self.solve_info["failure"] = dict(
                t=t_frame, ban=float(ban), bgn=float(bgn),
                dp=float(dp), dz=float(dz), finite=float(finite))
            self._reboot()
            return False
        c_h = hp[5]
        p_h, q_h, v_h = hp[6:9], hp[9:13], hp[13:16]
        tic_h, qic_h, td_h = hp[16:19], hp[19:23], float(hp[23])
        bg_h = hp[24:27]
        inv_h = hp[27:]
        self.td_host = td_h
        self.bg_host = bg_h.astype(np.float32)
        self.qic_host = qic_h.astype(np.float32)
        self.solve_info["cost"] = float(c_h)
        # slot->track depth mirrors: tracks re-rooted by the slide that ran
        # between dispatch and harvest were reset to -1 on purpose — the
        # stale pack value must not resurrect them
        for s, fid in enumerate(self.slots):
            if (fid is not None and fid in self.tracks
                    and fid not in self._rerooted_pending
                    and not self.tracks[fid].depth_fixed):
                self.tracks[fid].inv_depth = float(inv_h[s])
        self._rerooted_pending = set()
        self.trajectory.append((t_frame, p_h, q_h, v_h))
        self.last_pose_host = (p_h, q_h, tic_h, qic_h)
        self._record_ex_results(t_frame, tic_h, qic_h, td_h)
        return True

    def flush(self):
        """Drain any deferred readback (end of stream / checkpoint)."""
        if self._pending_solve is not None:
            self._harvest_solve()

    def _record_ex_results(self, t: float, tic=None, qic=None, td=None):
        """One row of the online extrinsic stream: camera-IMU ypr/t,
        lidar-IMU ypr/t, td (reference pubEXresults,
        estimator_node.cpp:312-336 — its EX_RESULT_PATH file).

        Pure host math on values already fetched in the per-frame pack —
        no extra device round-trips."""
        if tic is None:
            tic = np.asarray(self.state.tic)
        if qic is None:
            qic = np.asarray(self.state.qic)
        if td is None:
            td = float(self.state.td)
        vi_ypr = _np_quat_to_ypr(np.asarray(qic, np.float64))
        if self.lidar is not None:
            li_ypr = _np_mat_to_ypr(np.asarray(self.lidar.rlb, np.float64))
            li_t = np.asarray(self.lidar.tlb)
        else:
            li_ypr = np.zeros(3, np.float32)
            li_t = np.zeros(3, np.float32)
        self.ex_results.append((t, vi_ypr, np.asarray(tic), li_ypr, li_t,
                                td))

    def _reboot(self):
        """clearState + setParameter (reference estimator.cpp:588-597).

        The reference's clearState keeps the node's LiDAR path alive (only
        window state is wiped); mirror that by re-enabling the LiDAR
        frontend and carrying over its calibrated extrinsics."""
        failures = self.failures + 1
        trajectory = self.trajectory
        # the reference's EX_RESULT_PATH stream persists across clearState —
        # carry the already-recorded rows (and solver diagnostics) over
        ex_results = self.ex_results
        solve_info = self.solve_info
        cfg = self.cfg
        keep_qic, keep_tic = self.state.qic, self.state.tic
        lidar_prev = self.lidar
        defer = self.defer_readback
        self.__init__(cfg)
        self.state = self.state._replace(qic=keep_qic, tic=keep_tic)
        self.failures = failures
        self.trajectory = trajectory
        self.ex_results = ex_results
        self.solve_info = solve_info
        self.defer_readback = defer
        if lidar_prev is not None:
            self.enable_lidar()
            self.lidar.rlb = lidar_prev.rlb
            self.lidar.tlb = lidar_prev.tlb
            self.lidar.q_lb = lidar_prev.q_lb
            self.lidar.calibrated = lidar_prev.calibrated
            self.lidar.defer_pack = lidar_prev.defer_pack
            self.lidar.mode_counts = lidar_prev.mode_counts

    def _slide(self, old: bool):
        W = self.W
        if old:
            # shift states/buffers left; re-root features
            self.state = ba.shift_state(self.state)
            self.times.pop(0)
            if self.intervals:
                self.intervals.pop(0)
            self._shift_tracks_old()
        else:
            # merge second-newest into newest (frame W-1 -> slot W-2)
            self.state = ba.shift_state_second_new(self.state)
            self.times.pop(W - 2)
            if len(self.intervals) >= W - 1:
                # merge IMU of interval (W-2 -> W-1) into (W-3 -> W-2)
                last = self.intervals.pop(W - 2)
                tgt = self.intervals[W - 3]
                tgt.acc += last.acc
                tgt.gyr += last.gyr
                tgt.t += last.t
            self._shift_tracks_second_new()

    def _shift_tracks_old(self):
        """Window index k -> k-1; re-root depths of frame-0 features
        (removeBackShiftDepth, feature_manager.cpp:283-345)."""
        dead = []
        for fid, tr in self.tracks.items():
            if 0 in tr.obs:
                o0 = tr.obs.pop(0)
                rest = {k - 1: v for k, v in tr.obs.items()}
                tr.obs = rest
                if len(rest) < 2:
                    dead.append(fid)
                    continue
                # re-root: transform depth from old frame 0 to the new start
                # frame; host-side approximation uses the (pre-shift) poses
                # stored implicitly in inv_depth re-triangulation next round
                tr.inv_depth = -1.0 if not tr.depth_fixed else tr.inv_depth
                self._rerooted_pending.add(fid)
                if tr.depth_fixed:
                    # lidar depth belongs to the dropped observation
                    tr.depth_fixed = False
                    tr.inv_depth = -1.0
                    # a remaining obs may itself carry lidar depth
                    ns = min(rest)
                    if rest[ns].depth > 0:
                        tr.inv_depth = 1.0 / rest[ns].depth
                        tr.depth_fixed = True
            else:
                tr.obs = {k - 1: v for k, v in tr.obs.items()}
        for fid in dead:
            self._drop_track(fid)

    def _shift_tracks_second_new(self):
        W = self.W
        dead = []
        for fid, tr in self.tracks.items():
            if W - 2 in tr.obs:
                tr.obs.pop(W - 2)
            if W - 1 in tr.obs:
                tr.obs[W - 2] = tr.obs.pop(W - 1)
            if len(tr.obs) < 1:
                dead.append(fid)
        for fid in dead:
            self._drop_track(fid)

    def _drop_track(self, fid: int):
        tr = self.tracks.pop(fid, None)
        if tr is not None and tr.slot >= 0:
            self.slots[tr.slot] = None

    # --------------------------------------------------------------- output

    def predict_latest(self):
        """IMU-rate pose prediction: propagate the newest window state
        through the not-yet-consumed IMU samples (the reference's
        low-latency `predict`/`update` path, estimator_node.cpp:52-105).

        Returns (t, p, q, v) at the last IMU sample."""
        k = min(self.frame_count, self.W - 1)
        p = self.state.p[k]
        q = self.state.q[k]
        v = self.state.v[k]
        ba = self.state.ba[k]
        bg = self.state.bg[k]
        iv = self._pending
        t = self.times[-1] if self.times else 0.0
        for i in range(1, len(iv.t)):
            dt = iv.t[i] - iv.t[i - 1]
            if dt <= 0:
                continue
            p, q, v = pre.propagate_state(
                p, q, v, ba, bg,
                jnp.asarray(iv.acc[i - 1]), jnp.asarray(iv.gyr[i - 1]),
                jnp.asarray(iv.acc[i]), jnp.asarray(iv.gyr[i]),
                dt, self.gravity)
            t = iv.t[i]
        return t, np.asarray(p), np.asarray(q), np.asarray(v)

    def latest_pose(self):
        k = min(self.frame_count, self.W - 1)
        return (np.asarray(self.state.p[k]), np.asarray(self.state.q[k]))
