import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvil_fusion_tpu.utils import lie


def random_quat(rng, n=()):
    q = rng.normal(size=n + (4,)).astype(np.float32)
    return np.asarray(lie.quat_normalize(jnp.asarray(q)))


def test_quat_mul_matches_matrix(rng):
    q1 = random_quat(rng, (32,))
    q2 = random_quat(rng, (32,))
    R1 = np.asarray(lie.quat_to_mat(jnp.asarray(q1)))
    R2 = np.asarray(lie.quat_to_mat(jnp.asarray(q2)))
    R12 = np.asarray(lie.quat_to_mat(lie.quat_mul(jnp.asarray(q1), jnp.asarray(q2))))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = random_quat(rng, (16,))
    v = rng.normal(size=(16, 3)).astype(np.float32)
    Rv = np.einsum("nij,nj->ni", np.asarray(lie.quat_to_mat(jnp.asarray(q))), v)
    qv = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    np.testing.assert_allclose(qv, Rv, atol=1e-5)


def test_mat_quat_roundtrip(rng):
    q = random_quat(rng, (64,))
    q = np.asarray(lie.quat_canonical(jnp.asarray(q)))
    R = lie.quat_to_mat(jnp.asarray(q))
    q2 = np.asarray(lie.mat_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=2e-4)


def test_mat_quat_roundtrip_special_cases():
    # identity + 180-degree rotations around each axis (trace pivots)
    for phi in [
        [0.0, 0, 0], [np.pi - 1e-4, 0, 0], [0, np.pi - 1e-4, 0],
        [0, 0, np.pi - 1e-4], [2.0, 1.0, -0.5],
    ]:
        q = lie.quat_exp(jnp.asarray(phi, dtype=jnp.float32))
        R = lie.quat_to_mat(q)
        q2 = lie.mat_to_quat(R)
        R2 = lie.quat_to_mat(q2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_exp_log_roundtrip(rng):
    phi = rng.normal(size=(64, 3)).astype(np.float32)
    phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True)
    phi = phi * rng.uniform(0, 3.0, size=(64, 1)).astype(np.float32)
    phi2 = np.asarray(lie.quat_log(lie.quat_exp(jnp.asarray(phi))))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_exp_small_angle():
    phi = jnp.asarray([1e-9, -1e-9, 1e-9], dtype=jnp.float32)
    q = lie.quat_exp(phi)
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_allclose(np.asarray(q)[0], 1.0, atol=1e-6)
    # log at identity
    np.testing.assert_allclose(
        np.asarray(lie.quat_log(lie.quat_identity())), 0.0, atol=1e-7)


def test_slerp_endpoints_and_midpoint(rng):
    q0 = jnp.asarray(random_quat(rng))
    q1 = jnp.asarray(random_quat(rng))
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(lie.quat_slerp(q0, q1, 0.0)) * np.asarray(q0))),
        1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(lie.quat_slerp(q0, q1, 1.0)) * np.asarray(q1))),
        1.0, atol=1e-5)
    # midpoint: equal angle to both ends
    qm = lie.quat_slerp(q0, q1, 0.5)
    a0 = np.linalg.norm(np.asarray(lie.quat_boxminus(qm, q0)))
    a1 = np.linalg.norm(np.asarray(lie.quat_boxminus(q1, qm)))
    np.testing.assert_allclose(a0, a1, atol=1e-4)


def test_so3_jacobian_first_order(rng):
    phi = rng.normal(size=(3,)).astype(np.float32)
    dphi = (rng.normal(size=(3,)) * 1e-4).astype(np.float32)
    Jl = lie.so3_left_jacobian(jnp.asarray(phi))
    R_pert = lie.so3_exp(jnp.asarray(phi + dphi))
    R_pred = lie.so3_exp(Jl @ jnp.asarray(dphi)) @ lie.so3_exp(jnp.asarray(phi))
    np.testing.assert_allclose(np.asarray(R_pert), np.asarray(R_pred), atol=1e-6)


def test_boxplus_boxminus(rng):
    q = jnp.asarray(random_quat(rng))
    d = jnp.asarray(rng.normal(size=(3,)).astype(np.float32) * 0.3)
    q2 = lie.quat_boxplus(q, d)
    np.testing.assert_allclose(np.asarray(lie.quat_boxminus(q2, q)), np.asarray(d),
                               atol=1e-5)


def test_pose_compose_inverse(rng):
    p1 = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    q1 = jnp.asarray(random_quat(rng))
    p2 = jnp.asarray(rng.normal(size=(3,)).astype(np.float32))
    q2 = jnp.asarray(random_quat(rng))
    pc, qc = lie.pose_compose(p1, q1, p2, q2)
    pi, qi = lie.pose_inverse(p1, q1)
    pb, qb = lie.pose_compose(pi, qi, pc, qc)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(p2), atol=1e-5)
    assert abs(float(jnp.abs(jnp.sum(qb * q2)))) > 1 - 1e-5
    # between == inv(T1) * T2
    pbt, qbt = lie.pose_between(p1, q1, pc, qc)
    np.testing.assert_allclose(np.asarray(pbt), np.asarray(p2), atol=1e-5)


def test_g2r(rng):
    for _ in range(8):
        g = rng.normal(size=(3,)).astype(np.float32)
        g = g / np.linalg.norm(g) * 9.81
        # avoid near-antiparallel degenerate input
        if g[2] < -9.0:
            g[2] = abs(g[2])
        R0 = lie.g2R(jnp.asarray(g))
        aligned = np.asarray(R0 @ (jnp.asarray(g) / 9.81))
        np.testing.assert_allclose(aligned, [0, 0, 1.0], atol=1e-5)
        yaw = float(lie.mat_to_ypr(R0)[0])
        assert abs(yaw) < 1e-5
        # orthonormal
        np.testing.assert_allclose(
            np.asarray(R0 @ R0.T), np.eye(3), atol=1e-5)


def test_ypr_roundtrip(rng):
    ypr = (rng.uniform(-1.0, 1.0, size=(16, 3))).astype(np.float32)
    R = lie.ypr_to_mat(jnp.asarray(ypr))
    ypr2 = np.asarray(lie.mat_to_ypr(R))
    np.testing.assert_allclose(ypr2, ypr, atol=1e-5)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lambda q, v: lie.quat_rotate(q, v)))
    q = jnp.tile(lie.quat_identity(), (8, 1))
    v = jnp.ones((8, 3))
    np.testing.assert_allclose(np.asarray(f(q, v)), np.ones((8, 3)), atol=1e-6)
