import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvil_fusion_tpu.estimator import ba
from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, SyntheticWorld
from mvil_fusion_tpu.parallel import mesh as mesh_lib
from mvil_fusion_tpu.parallel import sharded_ba

from helpers import build_window_problem, make_problem, perturb_state

WORLD = SyntheticWorld(
    traj=SyntheticTrajectory(duration=8.0, w_amp=(0.9, 0.8, 1.0),
                             w_freq=(0.5, 0.4, 0.6)),
    landmark_radius=8.0)
S_TRUE, FEATS, PREINTS, IMASK, TIMES = build_window_problem(WORLD)
PROB = make_problem(S_TRUE, FEATS, PREINTS, IMASK)
FOCAL = 460.0


@pytest.mark.parametrize("n_dev", [
    pytest.param(2, marks=pytest.mark.slow),   # n=2 is the
    # slow-compile variant; n=8 (the dryrun mesh) stays fast
    8,
])
def test_sharded_matches_unsharded(n_dev):
    assert len(jax.devices()) >= n_dev
    m = mesh_lib.make_mesh(n_dev)
    rng = np.random.default_rng(3)
    s0 = perturb_state(S_TRUE, rng)

    ref = ba.solve(s0, PROB, FOCAL, iters=6)

    solver = sharded_ba.make_sharded_solver(m, FOCAL, iters=6)
    s0_sh, prob_sh = sharded_ba.shard_problem(m, s0, PROB)
    res = solver(s0_sh, prob_sh)

    # the initial-linearization cost is deterministic up to f32 reduction
    # order; later iterations may diverge slightly through accept/reject
    # branching, so compare cost0 tightly and the solution loosely.
    np.testing.assert_allclose(float(res.cost0), float(ref.cost0),
                               rtol=1e-4)
    np.testing.assert_allclose(float(res.cost1), float(ref.cost1),
                               rtol=0.2, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.state.p), np.asarray(ref.state.p),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(res.state.inv_depth),
                               np.asarray(ref.state.inv_depth), atol=5e-3)
    assert int(res.n_accepted) == int(ref.n_accepted)


def test_sharded_solver_converges_to_truth():
    m = mesh_lib.make_mesh(8)
    rng = np.random.default_rng(4)
    s0 = perturb_state(S_TRUE, rng)
    solver = sharded_ba.make_sharded_solver(m, FOCAL, iters=12)
    s0_sh, prob_sh = sharded_ba.shard_problem(m, s0, PROB)
    res = solver(s0_sh, prob_sh)
    p_err = np.abs(np.asarray(res.state.p - S_TRUE.p)).max()
    assert p_err < 0.03, p_err
