import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.io.synthetic import SyntheticTrajectory, _quat_mul, _quat_to_mat
from mvil_fusion_tpu.ops import preintegration as pre
from mvil_fusion_tpu.utils import lie

TRAJ = SyntheticTrajectory(duration=6.0)


def _interval(t0, t1, rate=200.0, ba=None, bg=None, noise=0.0, rng=None):
    acc, gyr, dt, ts = TRAJ.imu_sequence(
        t0, t1, rate, ba=ba, bg=bg,
        noise_acc=noise, noise_gyr=noise, rng=rng)
    return (jnp.asarray(acc, jnp.float32), jnp.asarray(gyr, jnp.float32),
            jnp.asarray(dt, jnp.float32), ts)


def _states(t0, t1):
    p0, q0, v0 = TRAJ.state_at(t0)
    p1, q1, v1 = TRAJ.state_at(t1)
    return [jnp.asarray(x, jnp.float32) for x in (p0, q0, v0, p1, q1, v1)]


NOISE_COV = pre.noise_covariance(0.02, 0.005, 0.006, 0.0008)
G = jnp.asarray([0.0, 0.0, TRAJ.g_norm], jnp.float32)
Z3 = jnp.zeros(3, jnp.float32)


def test_residual_zero_on_perfect_data():
    acc, gyr, dt, _ = _interval(1.0, 1.5)
    p = pre.preintegrate(acc, gyr, dt, Z3, Z3, NOISE_COV)
    p0, q0, v0, p1, q1, v1 = _states(1.0, 1.5)
    r = pre.imu_residual(p, p0, q0, v0, Z3, Z3, p1, q1, v1, Z3, Z3, G)
    r = np.asarray(r)
    assert np.abs(r[:3]).max() < 2e-3, r[:3]    # position (m)
    assert np.abs(r[3:6]).max() < 1e-3, r[3:6]  # rotation (rad*2)
    assert np.abs(r[6:9]).max() < 5e-3, r[6:9]  # velocity (m/s)


def test_stationary_gravity_only():
    # stationary body: acc measures +G in body frame, no rotation
    n = 51
    acc = jnp.tile(G, (n, 1))
    gyr = jnp.zeros((n, 3), jnp.float32)
    dt = jnp.full((n,), 0.005, jnp.float32).at[-1].set(0.0)
    p = pre.preintegrate(acc, gyr, dt, Z3, Z3, NOISE_COV)
    T = float(p.sum_dt)
    np.testing.assert_allclose(float(T), 0.25, atol=1e-6)
    # delta_v = ∫ R(a_m) dt = G*T ; delta_p = 0.5 G T²
    np.testing.assert_allclose(np.asarray(p.dv), np.asarray(G) * T, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p.dp), 0.5 * np.asarray(G) * T * T,
                               atol=1e-4)
    # residual with stationary world states is zero
    qid = lie.quat_identity()
    r = pre.imu_residual(p, Z3, qid, Z3, Z3, Z3, Z3, qid, Z3, Z3, Z3, G)
    assert np.abs(np.asarray(r)).max() < 1e-5


def test_padding_invariance():
    acc, gyr, dt, _ = _interval(0.5, 0.9)
    p_ref = pre.preintegrate(acc, gyr, dt, Z3, Z3, NOISE_COV)
    # pad with garbage
    padn = 17
    acc_p = jnp.concatenate([acc, jnp.full((padn, 3), 123.0)], 0)
    gyr_p = jnp.concatenate([gyr, jnp.full((padn, 3), -9.0)], 0)
    dt_p = jnp.concatenate([dt, jnp.full((padn,), 0.1)], 0)
    mask = jnp.concatenate([jnp.ones(acc.shape[0], bool), jnp.zeros(padn, bool)])
    p_pad = pre.preintegrate(acc_p, gyr_p, dt_p, Z3, Z3, NOISE_COV, mask)
    np.testing.assert_allclose(np.asarray(p_pad.dp), np.asarray(p_ref.dp), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_pad.dq), np.asarray(p_ref.dq), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_pad.P), np.asarray(p_ref.P), rtol=1e-4,
                               atol=1e-10)
    np.testing.assert_allclose(float(p_pad.sum_dt), float(p_ref.sum_dt), atol=1e-6)


def test_bias_jacobian_first_order():
    acc, gyr, dt, _ = _interval(2.0, 2.4)
    p0 = pre.preintegrate(acc, gyr, dt, Z3, Z3, NOISE_COV)
    dba = jnp.asarray([0.02, -0.01, 0.015], jnp.float32)
    dbg = jnp.asarray([0.004, 0.003, -0.005], jnp.float32)
    # first-order correction
    dp_c, dq_c, dv_c = pre.bias_corrected_delta(p0, dba, dbg)
    # exact repropagation with the new biases
    p1 = pre.preintegrate(acc, gyr, dt, dba, dbg, NOISE_COV)
    np.testing.assert_allclose(np.asarray(dp_c), np.asarray(p1.dp), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv_c), np.asarray(p1.dv), atol=2e-4)
    ang = np.linalg.norm(np.asarray(
        lie.quat_boxminus(jnp.asarray(p1.dq), dq_c)))
    assert ang < 2e-4


def test_covariance_properties():
    acc, gyr, dt, _ = _interval(0.0, 0.5)
    p = pre.preintegrate(acc, gyr, dt, Z3, Z3, NOISE_COV)
    P = np.asarray(p.P, dtype=np.float64)
    np.testing.assert_allclose(P, P.T, atol=1e-8)
    ev = np.linalg.eigvalsh(P)
    assert ev.min() > -1e-9
    # covariance grows with integration time
    acc2, gyr2, dt2, _ = _interval(0.0, 1.5)
    p2 = pre.preintegrate(acc2, gyr2, dt2, Z3, Z3, NOISE_COV)
    assert float(jnp.trace(p2.P)) > float(jnp.trace(p.P))
    # sqrt info is finite
    si = pre.sqrt_information(p)
    assert np.isfinite(np.asarray(si)).all()


def test_residual_whitened_magnitude_with_noise():
    rng = np.random.default_rng(1)
    acc, gyr, dt, _ = _interval(1.0, 1.4, noise=0.02, rng=rng)
    p = pre.preintegrate(acc, gyr, dt, Z3, Z3,
                         pre.noise_covariance(0.02, 0.02, 0.001, 0.0001))
    p0, q0, v0, p1, q1, v1 = _states(1.0, 1.4)
    r = pre.imu_residual(p, p0, q0, v0, Z3, Z3, p1, q1, v1, Z3, Z3, G)
    wr = pre.sqrt_information(p) @ r
    # whitened residual should be O(1) per dim, not huge or tiny
    n = float(jnp.linalg.norm(wr[:9])) / 3.0
    assert n < 30.0, n


def test_batched_preintegration():
    ints = [(0.0, 0.4), (0.4, 0.8), (0.8, 1.2)]
    NMAX = 128
    accs, gyrs, dts, masks = [], [], [], []
    for (a, b) in ints:
        acc, gyr, dt, _ = _interval(a, b)
        n = acc.shape[0]
        accs.append(jnp.pad(acc, ((0, NMAX - n), (0, 0))))
        gyrs.append(jnp.pad(gyr, ((0, NMAX - n), (0, 0))))
        dts.append(jnp.pad(dt, (0, NMAX - n)))
        masks.append(jnp.arange(NMAX) < n)
    batch = pre.preintegrate_batch(
        jnp.stack(accs), jnp.stack(gyrs), jnp.stack(dts),
        jnp.zeros((3, 3)), jnp.zeros((3, 3)), NOISE_COV, jnp.stack(masks))
    for k, (a, b) in enumerate(ints):
        single = pre.preintegrate(*(x[k] for x in (jnp.stack(accs),
                                                   jnp.stack(gyrs),
                                                   jnp.stack(dts))),
                                  Z3, Z3, NOISE_COV, jnp.stack(masks)[k])
        np.testing.assert_allclose(np.asarray(batch.dp[k]),
                                   np.asarray(single.dp), atol=1e-6)


def test_forward_propagation_tracks_truth():
    # propagate world state across one interval with the IMU-rate integrator
    t0, t1 = 1.0, 1.3
    acc, gyr, dt, ts = _interval(t0, t1)
    p0, q0, v0 = TRAJ.state_at(t0)
    p, q, v = (jnp.asarray(p0, jnp.float32), jnp.asarray(q0, jnp.float32),
               jnp.asarray(v0, jnp.float32))
    for k in range(len(ts) - 1):
        p, q, v = pre.propagate_state(p, q, v, Z3, Z3,
                                      acc[k], gyr[k], acc[k + 1], gyr[k + 1],
                                      dt[k], G)
    p1, q1, v1 = TRAJ.state_at(t1)
    np.testing.assert_allclose(np.asarray(p), p1, atol=2e-3)
    np.testing.assert_allclose(np.asarray(v), v1, atol=5e-3)
