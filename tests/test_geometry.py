"""Property tests for the geometry core.

Adapts the reference's inline self-checks (quaternion compose/invert against
homogeneous-matrix algebra, /root/reference/common/pose_utils.py:1197-1253;
angular-error sanity, :1255-1280) into pytest form, plus round-trip and
cross-validation properties.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from geomapnet_tpu.geometry import (
    align_camera_poses,
    align_pts,
    compose,
    euler2mat,
    hemisphere,
    invert,
    log_quaternion_angular_error,
    mat2euler,
    mat2quat,
    mat2quat_batch,
    pair_indices_fc,
    process_poses,
    qexp,
    qexp_exact,
    qexp_np,
    qinv_np,
    qlog,
    qlog_exact,
    qlog_np,
    qmult,
    qmult_np,
    quat2mat,
    quaternion_angular_error,
    relative_pose,
    relative_pose_logq,
    rotate_vec_by_q,
    rotate_vector_np,
    translation_error,
    vos_logq,
    vos_logq_fc,
    vos_simple,
)


def random_quats(rng, n):
    q = rng.randn(n, 4)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q * np.sign(q[:, :1] + 1e-12)


def random_rots(rng, n):
    return quat2mat(random_quats(rng, n))


class TestRotations:
    def test_mat2quat_roundtrip(self, rng):
        R = random_rots(rng, 50)
        q = mat2quat_batch(R)
        np.testing.assert_allclose(quat2mat(q), R, atol=1e-10)
        assert np.all(q[:, 0] >= 0)

    def test_mat2quat_identity(self):
        np.testing.assert_allclose(mat2quat(np.eye(3)), [1, 0, 0, 0], atol=1e-12)

    def test_mat2quat_180deg(self):
        # the classic hard case for naive trace-based conversion
        R = np.diag([1.0, -1.0, -1.0])  # 180 deg about x
        q = mat2quat(R)
        np.testing.assert_allclose(quat2mat(q), R, atol=1e-10)

    def test_euler_roundtrip(self, rng):
        for _ in range(20):
            ang = rng.uniform(-1.5, 1.5, 3)
            R = euler2mat(*ang)
            np.testing.assert_allclose(mat2euler(R), ang, atol=1e-10)

    def test_euler2mat_orthonormal(self, rng):
        R = euler2mat(*rng.uniform(0, 2 * np.pi, 3))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0


class TestQuaternionJnp:
    def test_qmult_matches_matrix_product(self, rng):
        q1, q2 = random_quats(rng, 10), random_quats(rng, 10)
        q = np.asarray(qmult(jnp.array(q1), jnp.array(q2)))
        R = quat2mat(q)
        R_expect = np.einsum("nij,njk->nik", quat2mat(q1), quat2mat(q2))
        np.testing.assert_allclose(R, R_expect, atol=1e-6)

    def test_qexp_qlog_roundtrip(self, rng):
        v = rng.randn(20, 3) * 0.8
        np.testing.assert_allclose(
            np.asarray(qlog(qexp(jnp.array(v)))), v, atol=1e-5
        )

    def test_exact_maps_match_numpy(self, rng):
        v = rng.randn(20, 3) * 0.8
        np.testing.assert_allclose(
            np.asarray(qexp_exact(jnp.array(v))), qexp_np(v), atol=1e-6
        )
        q = random_quats(rng, 20)
        np.testing.assert_allclose(
            np.asarray(qlog_exact(jnp.array(q))), qlog_np(q), atol=1e-6
        )

    def test_exact_maps_at_identity(self):
        np.testing.assert_allclose(
            np.asarray(qexp_exact(jnp.zeros((1, 3)))), [[1, 0, 0, 0]], atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(qlog_exact(jnp.array([[1.0, 0, 0, 0]]))), [[0, 0, 0]],
            atol=1e-12,
        )

    def test_rotate_vec_matches_matrix(self, rng):
        q = random_quats(rng, 10)
        t = rng.randn(10, 3)
        got = np.asarray(rotate_vec_by_q(jnp.array(t), jnp.array(q)))
        expect = np.einsum("nij,nj->ni", quat2mat(q), t)
        np.testing.assert_allclose(got, expect, atol=1e-6)
        np.testing.assert_allclose(rotate_vector_np(t, q), expect, atol=1e-10)

    def test_hemisphere(self):
        q = jnp.array([[-0.5, 0.5, 0.5, 0.5], [0.5, -0.5, 0.5, -0.5]])
        h = np.asarray(hemisphere(q))
        assert np.all(h[:, 0] >= 0)
        np.testing.assert_allclose(np.abs(h), np.abs(np.asarray(q)))


class TestSE3:
    def test_compose_matches_homogeneous(self, rng):
        """Reference test_pose_utils TEST_COMPOSE (pose_utils.py:1207-1234)."""
        R1, R2 = random_rots(rng, 1)[0], random_rots(rng, 1)[0]
        t1, t2 = rng.rand(3), rng.rand(3)
        p1 = np.concatenate([t1, mat2quat(R1)])[None]
        p2 = np.concatenate([t2, mat2quat(R2)])[None]
        p = np.asarray(compose(jnp.array(p1), jnp.array(p2)))[0]
        np.testing.assert_allclose(p[:3], t1 + R1 @ t2, atol=1e-6)
        np.testing.assert_allclose(quat2mat(p[3:]), R1 @ R2, atol=1e-6)

    def test_invert_matches_homogeneous(self, rng):
        """Reference test_pose_utils TEST_INV (pose_utils.py:1236-1253)."""
        R = random_rots(rng, 1)[0]
        t = rng.rand(3)
        p = np.concatenate([t, mat2quat(R)])[None]
        pinv = invert(jnp.array(p))
        ident = np.asarray(compose(jnp.array(p), pinv))[0]
        np.testing.assert_allclose(ident[:3], 0, atol=1e-6)
        np.testing.assert_allclose(np.abs(ident[3]), 1, atol=1e-6)

    def test_relative_pose_consistency(self, rng):
        q = random_quats(rng, 4)
        t = rng.randn(4, 3)
        p = np.concatenate([t, q], axis=-1)
        vo = relative_pose(jnp.array(p[:-1]), jnp.array(p[1:]))
        rec = np.asarray(compose(jnp.array(p[:-1]), vo))
        np.testing.assert_allclose(rec[:, :3], p[1:, :3], atol=1e-5)
        dot = np.abs(np.sum(rec[:, 3:] * p[1:, 3:], axis=-1))
        np.testing.assert_allclose(dot, 1, atol=1e-5)


class TestVO:
    def test_vos_simple(self, rng):
        p = rng.randn(2, 5, 6).astype(np.float32)
        v = np.asarray(vos_simple(jnp.array(p)))
        np.testing.assert_allclose(v, p[:, 1:] - p[:, :-1], rtol=1e-6)

    def test_vos_logq_shape_and_identity(self, rng):
        p = np.tile(rng.randn(1, 1, 6).astype(np.float32), (2, 4, 1))
        v = np.asarray(vos_logq(jnp.array(p)))
        assert v.shape == (2, 3, 6)
        np.testing.assert_allclose(v, 0, atol=1e-5)

    def test_vos_logq_matches_per_pair_reference(self, rng):
        """Cross-check the vectorized VO against a per-pair numpy recompute."""
        p = rng.randn(1, 4, 6) * 0.5
        v = np.asarray(vos_logq(jnp.array(p.astype(np.float32)), exact=True))[0]
        for i in range(3):
            q0, q1 = qexp_np(p[0, i, 3:]), qexp_np(p[0, i + 1, 3:])
            dt = p[0, i + 1, :3] - p[0, i, :3]
            t_rel = rotate_vector_np(dt, qinv_np(q0))
            q_rel = qmult_np(qinv_np(q0), q1)
            q_rel /= np.linalg.norm(q_rel)
            np.testing.assert_allclose(v[i, :3], t_rel, atol=1e-5)
            np.testing.assert_allclose(v[i, 3:], qlog_np(q_rel), atol=1e-5)

    def test_vos_fc_order(self):
        i, j = pair_indices_fc(4)
        expect = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        assert list(zip(i.tolist(), j.tolist())) == expect

    def test_vos_fc_consecutive_subset(self, rng):
        p = (rng.randn(1, 4, 6) * 0.5).astype(np.float32)
        fc = np.asarray(vos_logq_fc(jnp.array(p), exact=True))[0]
        cons = np.asarray(vos_logq(jnp.array(p), exact=True))[0]
        i, j = pair_indices_fc(4)
        mask = (j - i) == 1
        np.testing.assert_allclose(fc[mask], cons, atol=1e-6)


class TestProcessPoses:
    def test_identity_alignment(self, rng):
        R = random_rots(rng, 5)
        t = rng.randn(5, 3)
        raw = np.concatenate([R, t[:, :, None]], axis=-1).reshape(5, 12)
        out = process_poses(raw, np.zeros(3), np.ones(3), np.eye(3), np.zeros(3), 1)
        np.testing.assert_allclose(out[:, :3], t, atol=1e-10)
        for k in range(5):
            q = qexp_np(out[k, 3:])
            np.testing.assert_allclose(
                quat2mat(q * np.sign(q[0])), R[k], atol=1e-8
            )

    def test_normalization_and_alignment(self, rng):
        R = random_rots(rng, 4)
        t = rng.randn(4, 3)
        raw = np.concatenate([R, t[:, :, None]], axis=-1).reshape(4, 12)
        mean_t, std_t = rng.randn(3), rng.rand(3) + 0.5
        align_R = random_rots(rng, 1)[0]
        align_t, align_s = rng.randn(3), 1.7
        out = process_poses(raw, mean_t, std_t, align_R, align_t, align_s)
        expect_t = (align_s * (align_R @ (t - align_t).T).T - mean_t) / std_t
        np.testing.assert_allclose(out[:, :3], expect_t, atol=1e-10)


class TestMetrics:
    def test_angular_error_known_angle(self):
        q1 = mat2quat(euler2mat(0.3, 0, 0))
        q2 = mat2quat(euler2mat(0.8, 0, 0))
        err = quaternion_angular_error(q1, q2)
        np.testing.assert_allclose(err, np.degrees(0.5), atol=1e-8)

    def test_log_angular_error(self):
        q1 = mat2quat(euler2mat(0, 0.2, 0))
        q2 = mat2quat(euler2mat(0, 1.0, 0))
        err = log_quaternion_angular_error(qlog_np(q1), qlog_np(q2))
        np.testing.assert_allclose(err, np.degrees(0.8), atol=1e-6)

    def test_translation_error(self):
        assert translation_error([0, 0, 0], [3, 4, 0]) == pytest.approx(5.0)


class TestAlign:
    def test_align_3d_pts(self, rng):
        """Reference test_align_3d_pts (pose_utils.py:1073-1091)."""
        x1 = rng.rand(3, 30)
        s = 0.5 + rng.rand()
        t = rng.rand(3, 1)
        R = random_rots(rng, 1)[0]
        x2 = s * R @ (x1 - t)
        Re, te, se = align_pts(x1, x2)
        np.testing.assert_allclose(se, s, atol=1e-8)
        np.testing.assert_allclose(Re, R, atol=1e-8)
        np.testing.assert_allclose(te, t, atol=1e-8)

    def test_align_camera_poses(self, rng):
        """Reference test_align_camera_poses (pose_utils.py:1093-1120)."""
        N = 10
        o1 = rng.rand(3, N)
        s = 0.5 + rng.rand()
        t = rng.rand(3, 1)
        R = random_rots(rng, 1)[0]
        o2 = s * R @ (o1 - t)
        R1 = random_rots(rng, N)
        R2 = np.einsum("ij,njk->nik", R, R1)
        Re, te, se = align_camera_poses(o1, o2, R1, R2, True)
        np.testing.assert_allclose(se, s, atol=1e-8)
        np.testing.assert_allclose(Re, R, atol=1e-8)
        np.testing.assert_allclose(te, t, atol=1e-8)

    def test_align_noscale(self, rng):
        x1 = rng.rand(3, 20)
        t = rng.rand(3, 1)
        R = random_rots(rng, 1)[0]
        x2 = R @ (x1 - t)
        Re, te, se = align_pts(x1, x2, with_scale=False)
        assert se == 1.0
        np.testing.assert_allclose(Re, R, atol=1e-8)
        np.testing.assert_allclose(te, t, atol=1e-8)
