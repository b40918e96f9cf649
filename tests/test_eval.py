"""Tests for the eval toolchain: Umeyama/APE, KITTI IO, Kalman fusion.

Includes the golden-baseline check: our native APE implementation must
reproduce the reference numbers computed from the shipped seq-00
trajectory pair (BASELINE.md: 23.37 m aligned+scale, 24.06 m aligned)."""

import os

import numpy as np
import pytest

from atdn_vslam_tpu.eval import (
    ape_statistics,
    ate_rmse,
    error_stds,
    fuse_trajectories,
    inverse_variance_fusion,
    load_kitti_trajectory,
    rebase_backward_trajectory,
    rpe_statistics,
    save_kitti_trajectory,
    umeyama_alignment,
)

REF_EVAL = "/root/reference/atdn_vslam/eval"


def _random_traj(rng, n=100, step=1.0):
    mats = [np.eye(4)]
    for _ in range(n - 1):
        s = np.eye(4)
        a = rng.normal(scale=0.05)
        s[:3, :3] = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
        )
        s[:3, 3] = [rng.normal(scale=0.1), rng.normal(scale=0.05), step]
        mats.append(mats[-1] @ s)
    return np.stack(mats)


def test_umeyama_recovers_similarity(rng):
    src = rng.normal(size=(50, 3))
    angle = 0.7
    R_true = np.array(
        [
            [np.cos(angle), -np.sin(angle), 0],
            [np.sin(angle), np.cos(angle), 0],
            [0, 0, 1],
        ]
    )
    s_true, t_true = 1.8, np.array([3.0, -2.0, 0.5])
    dst = (s_true * (R_true @ src.T)).T + t_true
    R, t, s = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    np.testing.assert_allclose(s, s_true, atol=1e-8)


def test_ape_zero_for_identical(rng):
    traj = _random_traj(rng)
    stats = ape_statistics(traj, traj)
    assert stats["rmse"] < 1e-9
    assert stats["max"] < 1e-9


def test_ape_alignment_removes_rigid_offset(rng):
    traj = _random_traj(rng)
    R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], float)
    moved = traj.copy()
    moved[:, :3, 3] = (R @ traj[:, :3, 3].T).T + np.array([100.0, 5.0, -20.0])
    assert ate_rmse(moved, traj, align=True, correct_scale=False) < 1e-9
    assert ate_rmse(moved, traj, align=False) > 50


def test_rpe_zero_for_identical(rng):
    traj = _random_traj(rng)
    stats = rpe_statistics(traj, traj)
    assert stats["trans_rmse"] < 1e-9
    assert stats["rot_rmse_deg"] < 1e-6


def test_kitti_io_roundtrip(tmp_path, rng):
    traj = _random_traj(rng, 10)
    path = save_kitti_trajectory(str(tmp_path / "t.txt"), traj)
    back = load_kitti_trajectory(path)
    np.testing.assert_allclose(back, traj[:, :3, :].reshape(10, 12), atol=1e-12)


def test_inverse_variance_fusion_weights():
    x1, x2 = np.array([1.0]), np.array([3.0])
    # equal stds -> midpoint
    np.testing.assert_allclose(
        inverse_variance_fusion(x1, x2, np.array([1.0]), np.array([1.0])), 2.0
    )
    # tiny s1 -> trust x1
    np.testing.assert_allclose(
        inverse_variance_fusion(x1, x2, np.array([1e-6]), np.array([1.0])),
        1.0,
        atol=1e-9,
    )


def test_rebase_backward(rng):
    traj = _random_traj(rng, 20)
    lines = traj[:, :3, :].reshape(20, 12)
    rebased = rebase_backward_trajectory(lines)
    # rebased[0] corresponds to the (flipped) last pose -> identity
    np.testing.assert_allclose(
        rebased[0].reshape(3, 4), np.eye(4)[:3], atol=1e-9
    )


def test_kalman_fusion_recovers_gt(rng):
    """Fusing a noisy forward run with a perfect backward run (tiny
    backward stds) must reproduce the backward trajectory ~= GT."""
    gt = _random_traj(rng, 30)
    gt_lines = gt[:, :3, :].reshape(30, 12)
    noisy = gt.copy()
    noisy[:, :3, 3] += rng.normal(scale=0.5, size=(30, 3))
    noisy_lines = noisy[:, :3, :].reshape(30, 12)
    # perfect backward run: GT re-expressed from the last pose, reversed
    back = (np.linalg.inv(gt[-1]) @ gt)[::-1]
    back_lines = back[:, :3, :].reshape(30, 12)

    stds = (
        np.full(3, 1.0), np.full(3, 1e-6),
        np.full(3, 1.0), np.full(3, 1e-6),
    )
    fused = fuse_trajectories(noisy_lines, back_lines, stds)
    assert fused.shape == (30, 12)
    ate = ate_rmse(fused, gt_lines, align=True, correct_scale=False)
    assert ate < 1e-4


def test_error_stds_shapes(rng):
    gt = _random_traj(rng, 15)
    gl = gt[:, :3, :].reshape(15, 12)
    back = rebase_backward_trajectory(
        (np.linalg.inv(gt[-1]) @ gt)[::-1][:, :3, :].reshape(15, 12)
    )
    stds = error_stds(gl, back, gl)
    assert all(s.shape == (3,) for s in stds)


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_EVAL, "GT.txt")),
    reason="reference golden trajectories not mounted",
)
def test_golden_baseline_ate():
    """Our APE implementation reproduces the baseline numbers computed
    from the reference's shipped trajectory artifacts (BASELINE.md)."""
    pred = load_kitti_trajectory(os.path.join(REF_EVAL, "ATDN_prediction.txt"))
    gt = load_kitti_trajectory(os.path.join(REF_EVAL, "GT.txt"))
    stats_as = ape_statistics(pred, gt, align=True, correct_scale=True)
    assert abs(stats_as["rmse"] - 23.37) < 0.15, stats_as
    assert abs(stats_as["mean"] - 19.95) < 0.15, stats_as
    assert abs(stats_as["max"] - 70.29) < 0.5, stats_as
    stats_a = ape_statistics(pred, gt, align=True, correct_scale=False)
    assert abs(stats_a["rmse"] - 24.06) < 0.15, stats_a
