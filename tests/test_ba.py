import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvil_fusion_tpu.estimator import ba, factors as fac, state as st
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
from mvil_fusion_tpu.utils import lie

from helpers import build_window_problem, make_problem, perturb_state

# Strong rotational excitation makes the (δv, δba) weak mode observable —
# with a gentle trajectory, BA converges to a plateau ~3 cm away along that
# near-null direction (same observability structure as the reference
# system; verified: starting from truth it stays at truth).
WORLD = SyntheticWorld(
    traj=SyntheticTrajectory(duration=8.0, w_amp=(0.9, 0.8, 1.0),
                             w_freq=(0.5, 0.4, 0.6)),
    landmark_radius=8.0)
S_TRUE, FEATS, PREINTS, IMASK, TIMES = build_window_problem(WORLD)
PROB = make_problem(S_TRUE, FEATS, PREINTS, IMASK)
FOCAL = 460.0


def test_vision_residual_zero_at_truth():
    vs = fac.vision_system(S_TRUE, FEATS, FOCAL)
    r = np.asarray(vs.r)
    w = np.asarray(vs.w)
    assert w.sum() > 50, "expected many active factors"
    assert np.abs(r[w > 0]).max() < 0.2, np.abs(r[w > 0]).max()  # px-scale


def test_total_cost_small_at_truth():
    c = float(ba.evaluate_cost(S_TRUE, PROB, FOCAL))
    assert c < 5.0, c


def test_solve_recovers_truth():
    rng = np.random.default_rng(3)
    s0 = perturb_state(S_TRUE, rng)
    c0 = float(ba.evaluate_cost(s0, PROB, FOCAL))
    res = jax.jit(lambda s: ba.solve(s, PROB, FOCAL, iters=20))(s0)
    c1 = float(res.cost1)
    assert c1 < 1e-2 * c0, (c0, c1)
    p_err = np.abs(np.asarray(res.state.p - S_TRUE.p)).max()
    assert p_err < 0.02, p_err
    ang_err = np.linalg.norm(np.asarray(
        jax.vmap(lie.quat_boxminus)(res.state.q, S_TRUE.q)), axis=-1).max()
    assert ang_err < 0.01, ang_err
    v_err = np.abs(np.asarray(res.state.v - S_TRUE.v)).max()
    assert v_err < 0.05, v_err


def test_solve_stays_at_truth():
    res = ba.solve(S_TRUE, PROB, FOCAL, iters=6)
    assert float(res.cost1) < 1e-4
    assert np.abs(np.asarray(res.state.p - S_TRUE.p)).max() < 1e-4


def test_solve_respects_fixed_depth():
    rng = np.random.default_rng(4)
    fixed = np.zeros(FEATS.start.shape[0], bool)
    fixed[:8] = True
    feats = FEATS._replace(depth_fixed=jnp.asarray(fixed))
    prob = make_problem(S_TRUE, feats, PREINTS, IMASK)
    s0 = perturb_state(S_TRUE, rng, dlam=0.0)
    res = ba.solve(s0, prob, FOCAL, iters=8)
    # fixed depths unchanged from the initial value
    np.testing.assert_allclose(
        np.asarray(res.state.inv_depth[:8]), np.asarray(s0.inv_depth[:8]),
        atol=1e-7)


def test_gauge_anchor_holds_frame0():
    rng = np.random.default_rng(5)
    s0 = perturb_state(S_TRUE, rng, keep_first=True)
    res = ba.solve(s0, PROB, FOCAL, iters=10)
    # frame 0 pinned to anchor_ref (= truth here)
    np.testing.assert_allclose(np.asarray(res.state.p[0]),
                               np.asarray(S_TRUE.p[0]), atol=5e-3)


def test_gauge_fix_restores_yaw_and_position():
    rng = np.random.default_rng(6)
    s0 = perturb_state(S_TRUE, rng, keep_first=False)
    fixed = st.gauge_fix(s0, S_TRUE.p[0], S_TRUE.q[0])
    np.testing.assert_allclose(np.asarray(fixed.p[0]),
                               np.asarray(S_TRUE.p[0]), atol=1e-5)
    yaw_new = float(lie.mat_to_ypr(lie.quat_to_mat(fixed.q[0]))[0])
    yaw_old = float(lie.mat_to_ypr(lie.quat_to_mat(S_TRUE.q[0]))[0])
    assert abs(yaw_new - yaw_old) < 1e-4
    # relative poses preserved
    dp_before = np.asarray(s0.p[3] - s0.p[1])
    dp_after = np.asarray(fixed.p[3] - fixed.p[1])
    np.testing.assert_allclose(np.linalg.norm(dp_after),
                               np.linalg.norm(dp_before), atol=1e-5)


def test_marginalize_old_prior_constrains():
    """After marginalizing frame 0, the prior should pull the slid window
    back toward the (shifted) solution."""
    res = ba.solve(perturb_state(S_TRUE, np.random.default_rng(7)), PROB,
                   FOCAL, iters=10)
    prior = ba.marginalize_old(res.state, PROB, FOCAL)
    assert bool(prior.valid)
    J = np.asarray(prior.J)
    # dropped frame's columns are zero only for the *new* frame slot W-1
    W = S_TRUE.window
    assert np.abs(J[:, 15 * (W - 1):15 * W]).max() < 1e-6
    assert np.abs(J).max() > 1.0  # nontrivial information
    # prior cost increases when kept states move
    s_shift = ba.shift_state(res.state)
    prs0 = fac.prior_system(prior, s_shift)
    c0 = float(prs0.cost)
    dx = np.zeros(st.pose_dim(W), np.float32)
    dx[15 * 2 + 0] = 0.05  # move (new) frame 2 position
    s_moved = st.apply_delta(s_shift, jnp.asarray(dx))
    c1 = float(fac.prior_system(prior, s_moved).cost)
    assert c1 > c0 + 1e-3, (c0, c1)


def test_marginalize_old_then_solve_stays_at_truth():
    """Slide the window: marginalize frame 0, shift states, re-solve with
    the prior (no anchor) — states should stay near the shifted truth."""
    rng = np.random.default_rng(8)
    res = ba.solve(perturb_state(S_TRUE, rng), PROB, FOCAL, iters=10)
    prior = ba.marginalize_old(res.state, PROB, FOCAL)
    s_shift = ba.shift_state(res.state)

    # build the slid problem: reuse same features/preints shifted by one
    # frame — emulate by rebuilding from the world one frame later.
    s_true2, feats2, preints2, imask2, _ = build_window_problem(
        WORLD, t0=TIMES[1])
    prob2 = make_problem(s_true2, feats2, preints2, imask2)
    prob2 = prob2._replace(prior=prior)
    # perturb mildly and solve with prior active (anchor auto-disabled)
    s0 = perturb_state(s_true2, rng, dp=0.02, dth=0.01, dv=0.02,
                       keep_first=False)
    res2 = ba.solve(s0, prob2, FOCAL, iters=10)
    p_err = np.abs(np.asarray(res2.state.p - s_true2.p)).max()
    assert p_err < 0.05, p_err


def test_marginalize_second_new_drops_pose_cols():
    res = ba.solve(perturb_state(S_TRUE, np.random.default_rng(9)), PROB,
                   FOCAL, iters=6)
    prior0 = ba.marginalize_old(res.state, PROB, FOCAL)
    prob = PROB._replace(prior=prior0)
    prior1 = ba.marginalize_second_new(res.state, prob)
    W = S_TRUE.window
    J = np.asarray(prior1.J)
    k = W - 2
    assert np.abs(J[:, 15 * k:15 * k + 6]).max() < 1e-6
    assert np.abs(J).max() > 1e-3


def test_solve_is_jittable_and_stable():
    f = jax.jit(lambda s: ba.solve(s, PROB, FOCAL, iters=4))
    rng = np.random.default_rng(10)
    r1 = f(perturb_state(S_TRUE, rng))
    r2 = f(perturb_state(S_TRUE, rng))
    assert np.isfinite(float(r1.cost1)) and np.isfinite(float(r2.cost1))
