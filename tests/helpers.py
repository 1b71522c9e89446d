"""Shared test helpers: build sliding-window BA problems from the synthetic
world."""

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.estimator import ba, factors as fac, state as st
from mvil_fusion_tpu.io.synthetic import SyntheticWorld, _quat_to_mat
from mvil_fusion_tpu.ops import preintegration as pre

IMU_NMAX = 128


def build_window_problem(world: SyntheticWorld, t0=1.0, frame_dt=0.1,
                         W=7, F=64, noise_px=0.0, rng=None,
                         ba_true=None, bg_true=None):
    """Build (true_state, Features, preints, interval_mask, times) for a full
    window of W frames.  Landmark inverse depths are ground truth."""
    traj = world.traj
    times = [t0 + k * frame_dt for k in range(W)]
    ps, qs, vs = [], [], []
    for t in times:
        p, q, v = traj.state_at(t)
        ps.append(p), qs.append(q), vs.append(v)
    ps, qs, vs = np.asarray(ps), np.asarray(qs), np.asarray(vs)

    # project landmarks per frame (identity extrinsics)
    ric = np.eye(3)
    tic = np.zeros(3)
    obs_all, vis_all, z_all = [], [], []
    for t in times:
        uv, norm, z, vis = world.project(t, ric, tic)
        obs_all.append(norm), vis_all.append(vis), z_all.append(z)
    obs_all = np.asarray(obs_all)   # (W, L, 2)
    vis_all = np.asarray(vis_all)   # (W, L)
    z_all = np.asarray(z_all)

    # pick up to F landmarks visible in >= 3 frames
    counts = vis_all.sum(axis=0)
    order = np.argsort(-counts)
    chosen = [l for l in order if counts[l] >= 3][:F]

    start = np.zeros(F, np.int32)
    obs = np.zeros((F, W, 2), np.float32)
    mask = np.zeros((F, W), bool)
    inv_depth = np.ones(F, np.float32)
    valid = np.zeros(F, bool)
    for slot, l in enumerate(chosen):
        frames = np.nonzero(vis_all[:, l])[0]
        s0 = frames[0]
        start[slot] = s0
        mask[slot, frames] = True
        o = obs_all[:, l, :]
        if noise_px > 0 and rng is not None:
            o = o + rng.normal(scale=noise_px / 460.0, size=o.shape)
        obs[slot] = o
        inv_depth[slot] = 1.0 / z_all[s0, l]
        valid[slot] = True

    feats = st.Features(
        start=jnp.asarray(start),
        obs=jnp.asarray(obs),
        vel=jnp.zeros((F, W, 2), jnp.float32),
        td_ref=jnp.zeros((F, W), jnp.float32),
        mask=jnp.asarray(mask),
        depth_fixed=jnp.zeros(F, bool),
        valid=jnp.asarray(valid),
    )

    # preintegrate IMU per interval
    ba_t = np.zeros(3) if ba_true is None else np.asarray(ba_true)
    bg_t = np.zeros(3) if bg_true is None else np.asarray(bg_true)
    accs, gyrs, dts, masks = [], [], [], []
    for k in range(W - 1):
        acc, gyr, dt, _ = traj.imu_sequence(times[k], times[k + 1], 200.0,
                                            ba=ba_t, bg=bg_t)
        n = acc.shape[0]
        accs.append(np.pad(acc, ((0, IMU_NMAX - n), (0, 0))))
        gyrs.append(np.pad(gyr, ((0, IMU_NMAX - n), (0, 0))))
        dts.append(np.pad(dt, (0, IMU_NMAX - n)))
        masks.append(np.arange(IMU_NMAX) < n)
    noise_cov = pre.noise_covariance(0.02, 0.005, 0.006, 0.0008)
    preints = pre.preintegrate_batch(
        jnp.asarray(np.asarray(accs), jnp.float32),
        jnp.asarray(np.asarray(gyrs), jnp.float32),
        jnp.asarray(np.asarray(dts), jnp.float32),
        jnp.zeros((W - 1, 3), jnp.float32),
        jnp.zeros((W - 1, 3), jnp.float32),
        noise_cov,
        jnp.asarray(np.asarray(masks)))

    s_true = st.WindowState(
        p=jnp.asarray(ps, jnp.float32),
        q=jnp.asarray(qs, jnp.float32),
        v=jnp.asarray(vs, jnp.float32),
        ba=jnp.tile(jnp.asarray(ba_t, jnp.float32), (W, 1)),
        bg=jnp.tile(jnp.asarray(bg_t, jnp.float32), (W, 1)),
        tic=jnp.zeros(3, jnp.float32),
        qic=jnp.asarray([1, 0, 0, 0], jnp.float32),
        td=jnp.zeros((), jnp.float32),
        inv_depth=jnp.asarray(inv_depth),
    )
    interval_mask = jnp.ones((W - 1,), bool)
    return s_true, feats, preints, interval_mask, times


def make_problem(s_anchor, feats, preints, interval_mask, g_norm=9.795,
                 n_extra=0):
    W = s_anchor.window
    F = s_anchor.num_features
    eJ, er = ba.empty_extra(W, n_extra)
    return ba.BAProblem(
        feats=feats, preints=preints, interval_mask=interval_mask,
        prior=fac.empty_prior(W, F),
        gravity=jnp.asarray([0.0, 0.0, g_norm], jnp.float32),
        anchor_ref=s_anchor, extra_J=eJ, extra_r=er, extra_x0=s_anchor,
        fix_mask=ba.make_fix_mask(W))


def perturb_state(s, rng, dp=0.05, dth=0.02, dv=0.05, dbias=0.005,
                  dlam=0.05, keep_first=True):
    W, F = s.window, s.num_features
    D = st.pose_dim(W)
    dx = np.zeros(D, np.float32)
    for k in range(W):
        if keep_first and k == 0:
            continue
        dx[15 * k:15 * k + 3] = rng.normal(scale=dp, size=3)
        dx[15 * k + 3:15 * k + 6] = rng.normal(scale=dth, size=3)
        dx[15 * k + 6:15 * k + 9] = rng.normal(scale=dv, size=3)
        dx[15 * k + 9:15 * k + 15] = rng.normal(scale=dbias, size=6)
    dl = rng.normal(scale=dlam, size=F).astype(np.float32)
    return st.apply_delta(s, jnp.asarray(dx), jnp.asarray(dl))
