"""PGO tests: fixed points, convergence on the reference's synthetic scenario,
chain vs fully-connected, batched vmap path."""

import numpy as np
import jax.numpy as jnp
import pytest

from geomapnet_tpu.geometry import (
    euler2mat,
    mat2quat,
    qinv_np,
    qlog_np,
    qmult_np,
)
from geomapnet_tpu.data.vo_np import vos_logq_fc_np
from geomapnet_tpu.geometry.rotations import qexp_np, rotate_vector_np
from geomapnet_tpu.pgo import (
    gauss_newton_pgo,
    optimize_poses,
    optimize_poses_batch,
)


def consistent_vos(poses7, pairs):
    """VOs exactly consistent with the poses (p0-frame convention)."""
    i, j = pairs
    dt = rotate_vector_np(
        poses7[j, :3] - poses7[i, :3], qinv_np(poses7[i, 3:])
    )
    q = qmult_np(qinv_np(poses7[i, 3:]), poses7[j, 3:])
    return np.concatenate([dt, q], axis=1)


def diag_poses(n=3, yaw_deg=45.0):
    """The reference's pgo_test_poses1 trajectory: diagonal walk with fixed
    45-degree yaw (/root/reference/common/pose_utils.py:1146-1169)."""
    q = mat2quat(euler2mat(0, 0, np.deg2rad(yaw_deg)))
    poses = np.zeros((n, 7))
    poses[:, 3:] = q
    for i in range(n):
        poses[i, :3] = [i, i, 0.0]
    return poses


class TestGaussNewton:
    def test_consistent_graph_is_fixed_point(self):
        poses = diag_poses()
        pairs = (np.arange(2), np.arange(1, 3))
        vos = consistent_vos(poses, pairs)
        out = np.asarray(gauss_newton_pgo(jnp.array(poses), jnp.array(vos)))
        np.testing.assert_allclose(out[:, :3], poses[:, :3], atol=1e-4)
        dot = np.abs(np.sum(out[:, 3:] * poses[:, 3:], axis=1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_reference_perturbed_scenario(self):
        """pgo_test_poses1 + test_pgo (pose_utils.py:1146-1194): perturb the
        first VO translations; optimization must move poses toward the
        perturbed VOs while unary terms anchor them."""
        poses = diag_poses()
        pt = np.concatenate([poses[:, :3],
                             np.stack([qlog_np(p) for p in poses[:, 3:]])], 1)
        vost = vos_logq_fc_np(pt)
        vos = np.concatenate([vost[:, :3],
                              np.stack([qexp_np(v) for v in vost[:, 3:]])], 1)
        vos[0, 0] = np.sqrt(2) - 0.5
        vos[1, 0] = np.sqrt(2) - 0.5

        out = np.asarray(
            gauss_newton_pgo(jnp.array(poses), jnp.array(vos), fc=True)
        )
        # all finite, quaternions stay unit
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(
            np.linalg.norm(out[:, 3:], axis=1), 1.0, atol=1e-4
        )
        # poses moved (the perturbation pulls x-coordinates apart)
        assert not np.allclose(out[:, :3], poses[:, :3], atol=1e-3)
        # total weighted residual decreased vs initialization
        def total_residual(z):
            pairs = (np.array([0, 0, 1]), np.array([1, 2, 2]))
            r_pair = consistent_vos(z, pairs) - vos
            r_unary = z - poses
            return np.sum(r_pair ** 2) + np.sum(r_unary ** 2)

        assert total_residual(out) < total_residual(poses)

    def test_pgo_denoises_predictions(self):
        """Noisy predictions + exact GT VOs -> closer to GT after PGO."""
        rng = np.random.RandomState(0)
        n = 7
        gt = np.zeros((n, 7))
        for i in range(n):
            R = euler2mat(0, 0, 0.15 * i)
            gt[i, :3] = [0.5 * i, 0.1 * i * i, 0]
            gt[i, 3:] = mat2quat(R)
        noisy = gt.copy()
        noisy[:, :3] += rng.randn(n, 3) * 0.1

        pairs = (np.arange(n - 1), np.arange(1, n))
        vos = consistent_vos(gt, pairs)
        out = np.asarray(
            gauss_newton_pgo(jnp.array(noisy), jnp.array(vos),
                             sax=1.0, saq=1.0, srx=0.05, srq=0.05)
        )
        err_before = np.linalg.norm(noisy[:, :3] - gt[:, :3], axis=1).mean()
        err_after = np.linalg.norm(out[:, :3] - gt[:, :3], axis=1).mean()
        assert err_after < 0.7 * err_before

    def test_batched_matches_single(self):
        rng = np.random.RandomState(1)
        poses = np.stack([diag_poses(), diag_poses()])
        poses[1, :, :3] += rng.randn(3, 3) * 0.05
        pairs = (np.arange(2), np.arange(1, 3))
        vos = np.stack([consistent_vos(p, pairs) for p in poses])
        batched = np.asarray(
            optimize_poses_batch(jnp.array(poses), jnp.array(vos))
        )
        for b in range(2):
            single = np.asarray(
                gauss_newton_pgo(jnp.array(poses[b]), jnp.array(vos[b]))
            )
            np.testing.assert_allclose(batched[b], single, atol=1e-5)


class TestOptimizePoses:
    def test_vos_from_target_poses(self):
        """Fallback VO derivation (world-frame t-diff + relative quaternion,
        pose_utils.py:789-798)."""
        poses = diag_poses()
        out = optimize_poses(poses, target_poses=poses)
        assert out.shape == (3, 7)
        assert np.all(np.isfinite(out))

    def test_requires_vos_or_targets(self):
        with pytest.raises(ValueError):
            optimize_poses(diag_poses())

    def test_fc_flag(self):
        poses = diag_poses(4)
        pt = np.concatenate([poses[:, :3],
                             np.stack([qlog_np(p) for p in poses[:, 3:]])], 1)
        vost = vos_logq_fc_np(pt)
        vos = np.concatenate([vost[:, :3],
                              np.stack([qexp_np(v) for v in vost[:, 3:]])], 1)
        out = optimize_poses(poses, vos=vos, fc_vos=True)
        np.testing.assert_allclose(out[:, :3], poses[:, :3], atol=1e-4)
