"""Tests for the pose-graph Gauss-Newton backend (new capability; the
reference has no geometric backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.geometry.pose_graph import (
    edge_residuals,
    odometry_edges,
    optimize_pose_graph,
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
)
from atdn_vslam_tpu.geometry.se3 import se3_inverse


def _rand_twists(rng, n, rot_scale=0.2, tr_scale=1.0):
    return np.concatenate(
        [
            rng.normal(scale=tr_scale, size=(n, 3)),
            rng.normal(scale=rot_scale, size=(n, 3)),
        ],
        axis=-1,
    ).astype(np.float32)


def test_so3_exp_log_roundtrip(rng):
    w = rng.normal(scale=0.5, size=(32, 3)).astype(np.float32)
    R = so3_exp(jnp.asarray(w))
    back = np.asarray(so3_log(R))
    np.testing.assert_allclose(back, w, atol=1e-4)


def test_so3_small_angle(rng):
    w = rng.normal(scale=1e-6, size=(8, 3)).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray(w)))
    assert np.isfinite(R).all()
    np.testing.assert_allclose(
        R, np.broadcast_to(np.eye(3), R.shape), atol=1e-5
    )


def test_se3_exp_log_roundtrip(rng):
    xi = _rand_twists(rng, 24)
    T = se3_exp(jnp.asarray(xi))
    assert T.shape == (24, 4, 4)
    np.testing.assert_allclose(np.asarray(se3_log(T)), xi, atol=1e-4)


def test_se3_exp_is_rigid(rng):
    xi = _rand_twists(rng, 8)
    T = np.asarray(se3_exp(jnp.asarray(xi)))
    R = T[:, :3, :3]
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)),
        np.broadcast_to(np.eye(3), R.shape), atol=1e-5,
    )
    np.testing.assert_allclose(T[:, 3, :], np.tile([0, 0, 0, 1], (8, 1)))


def test_residuals_zero_for_consistent_graph(rng):
    xi = _rand_twists(rng, 5, rot_scale=0.1)
    steps = se3_exp(jnp.asarray(xi))
    poses = [jnp.eye(4)]
    for i in range(5):
        poses.append(poses[-1] @ steps[i])
    poses = jnp.stack(poses)
    ei, ej = odometry_edges(6)
    meas = se3_inverse(poses[ei]) @ poses[ej]
    r = edge_residuals(poses, ei, ej, meas)
    assert float(jnp.abs(r).max()) < 1e-4


def test_optimize_recovers_from_noise(rng):
    """Noisy odometry chain + exact loop-closure edges -> optimization
    pulls the trajectory back toward ground truth."""
    n = 12
    xi = _rand_twists(rng, n - 1, rot_scale=0.05, tr_scale=0.5)
    steps = se3_exp(jnp.asarray(xi))
    gt = [jnp.eye(4)]
    for i in range(n - 1):
        gt.append(gt[-1] @ steps[i])
    gt = jnp.stack(gt)

    # corrupt odometry measurements
    noise = _rand_twists(rng, n - 1, rot_scale=0.02, tr_scale=0.1)
    noisy_meas = steps @ se3_exp(jnp.asarray(noise))
    init = [jnp.eye(4)]
    for i in range(n - 1):
        init.append(init[-1] @ noisy_meas[i])
    init = jnp.stack(init)

    # loop closures: exact absolute constraints to pose 0 every 3 frames
    lc_j = jnp.arange(3, n, 3)
    lc_i = jnp.zeros_like(lc_j)
    lc_meas = se3_inverse(gt[lc_i]) @ gt[lc_j]

    ei, ej = odometry_edges(n)
    edges_i = jnp.concatenate([ei, lc_i])
    edges_j = jnp.concatenate([ej, lc_j])
    meas = jnp.concatenate([noisy_meas, lc_meas])
    weights = jnp.concatenate(
        [jnp.ones(n - 1), 100.0 * jnp.ones(len(lc_j))]
    )

    init_err = float(jnp.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=1).mean())
    opt, mse = optimize_pose_graph(
        init, edges_i, edges_j, meas, weights, iterations=10
    )
    opt_err = float(jnp.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1).mean())
    assert np.isfinite(float(mse))
    assert opt_err < init_err * 0.5, (init_err, opt_err)
    # gauge held
    np.testing.assert_allclose(np.asarray(opt[0]), np.eye(4), atol=1e-6)


def test_optimizer_is_jittable(rng):
    n = 6
    xi = _rand_twists(rng, n - 1, rot_scale=0.05)
    steps = se3_exp(jnp.asarray(xi))
    poses = [jnp.eye(4)]
    for i in range(n - 1):
        poses.append(poses[-1] @ steps[i])
    poses = jnp.stack(poses)
    ei, ej = odometry_edges(n)
    meas = se3_inverse(poses[ei]) @ poses[ej]
    fn = jax.jit(
        lambda p, m: optimize_pose_graph(p, ei, ej, m, iterations=3)
    )
    opt, mse = fn(poses, meas)
    assert float(mse) < 1e-6


def test_so3_log_near_pi(rng):
    """Rotation residuals near 180 deg must produce finite, correct
    logs (loop-closure edges with huge drift)."""
    # rotation by ~pi about a random axis
    axes = rng.normal(size=(8, 3)).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = np.pi - rng.uniform(0, 5e-6, (8, 1)).astype(np.float32)
    w = (axes * angles).astype(np.float32)
    R = so3_exp(jnp.asarray(w))
    back = np.asarray(so3_log(R))
    assert np.isfinite(back).all()
    # log is defined up to axis sign at pi; compare rotations
    R2 = np.asarray(so3_exp(jnp.asarray(back)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)


def test_se3_log_near_pi(rng):
    xi = np.concatenate(
        [
            rng.normal(size=(4, 3)).astype(np.float32),
            (np.pi - 1e-6)
            * (lambda a: a / np.linalg.norm(a, axis=1, keepdims=True))(
                rng.normal(size=(4, 3))
            ).astype(np.float32),
        ],
        axis=-1,
    )
    T = se3_exp(jnp.asarray(xi))
    out = np.asarray(se3_log(T))
    assert np.isfinite(out).all()
    T2 = np.asarray(se3_exp(jnp.asarray(out)))
    np.testing.assert_allclose(T2, np.asarray(T), atol=1e-2)


def _noisy_chain(rng, n, closure_every=3, rot=0.05, tr=0.5):
    """(init, gt, edges_i, edges_j, meas, weights) for a noisy odometry
    chain with exact loop-closure edges back to pose 0."""
    xi = _rand_twists(rng, n - 1, rot_scale=rot, tr_scale=tr)
    steps = se3_exp(jnp.asarray(xi))
    gt = [jnp.eye(4)]
    for i in range(n - 1):
        gt.append(gt[-1] @ steps[i])
    gt = jnp.stack(gt)
    noise = _rand_twists(rng, n - 1, rot_scale=0.02, tr_scale=0.1)
    noisy_meas = steps @ se3_exp(jnp.asarray(noise))
    init = [jnp.eye(4)]
    for i in range(n - 1):
        init.append(init[-1] @ noisy_meas[i])
    init = jnp.stack(init)
    lc_j = jnp.arange(closure_every, n, closure_every)
    lc_i = jnp.zeros_like(lc_j)
    lc_meas = se3_inverse(gt[lc_i]) @ gt[lc_j]
    ei, ej = odometry_edges(n)
    edges_i = jnp.concatenate([ei, lc_i])
    edges_j = jnp.concatenate([ej, lc_j])
    meas = jnp.concatenate([noisy_meas, lc_meas])
    weights = jnp.concatenate(
        [jnp.ones(n - 1), 100.0 * jnp.ones(len(lc_j))]
    )
    return init, gt, edges_i, edges_j, meas, weights


def test_optimize_cg_matches_dense(rng):
    """The matrix-free block-Jacobi PCG path solves the same normal
    equations as the dense Cholesky — poses must agree tightly."""
    init, gt, ei, ej, meas, w = _noisy_chain(rng, 12)
    opt_d, mse_d = optimize_pose_graph(init, ei, ej, meas, w, iterations=8)
    opt_c, mse_c = optimize_pose_graph(
        init, ei, ej, meas, w, iterations=8, solver="cg", cg_iterations=200
    )
    np.testing.assert_allclose(
        np.asarray(opt_c), np.asarray(opt_d), atol=1e-3
    )
    assert np.isfinite(float(mse_c))
    np.testing.assert_allclose(np.asarray(opt_c[0]), np.eye(4), atol=1e-6)


def test_optimize_cg_large_chain(rng):
    """CG at a scale where the dense path's (6N)^2 matrix would be the
    wrong tool (N=400 here keeps CI fast; the chip envelope for the
    dense path is measured in tools/profiling/exp_r5_posegraph.py)."""
    init, gt, ei, ej, meas, w = _noisy_chain(
        rng, 400, closure_every=20, rot=0.02, tr=0.3
    )
    init_err = float(
        jnp.linalg.norm(init[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    )
    opt, mse = optimize_pose_graph(
        init, ei, ej, meas, w, iterations=10, solver="cg", cg_iterations=100
    )
    opt_err = float(
        jnp.linalg.norm(opt[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    )
    assert np.isfinite(float(mse))
    assert opt_err < init_err * 0.5, (init_err, opt_err)


def test_optimize_sharded_cg_matches_single(rng):
    """Edge-sharded solve with the CG linear solver == single-device
    CG (the matvec's scatter-adds GSPMD-reduce over the mesh)."""
    from atdn_vslam_tpu.geometry.pose_graph import optimize_pose_graph_sharded
    from atdn_vslam_tpu.parallel import make_mesh

    init, gt, ei, ej, meas, w = _noisy_chain(rng, 9)
    opt_single, _ = optimize_pose_graph(
        init, ei, ej, meas, w, iterations=5, solver="cg", cg_iterations=150
    )
    mesh = make_mesh()
    opt_shard, mse_shard = optimize_pose_graph_sharded(
        mesh, init, ei, ej, meas, w, iterations=5,
        solver="cg", cg_iterations=150,
    )
    np.testing.assert_allclose(
        np.asarray(opt_shard), np.asarray(opt_single), atol=1e-4
    )
    assert np.isfinite(float(mse_shard))


def test_optimize_sharded_matches_single(rng):
    """Edge-sharded (psum'd normal equations) solve == single-device
    solve, including non-divisible edge counts."""
    from atdn_vslam_tpu.geometry.pose_graph import optimize_pose_graph_sharded
    from atdn_vslam_tpu.parallel import make_mesh

    n = 9
    xi = _rand_twists(rng, n - 1, rot_scale=0.05)
    steps = se3_exp(jnp.asarray(xi))
    gt = [jnp.eye(4)]
    for i in range(n - 1):
        gt.append(gt[-1] @ steps[i])
    gt = jnp.stack(gt)
    noise = _rand_twists(rng, n - 1, rot_scale=0.01, tr_scale=0.05)
    meas = steps @ se3_exp(jnp.asarray(noise))
    init = [jnp.eye(4)]
    for i in range(n - 1):
        init.append(init[-1] @ meas[i])
    init = jnp.stack(init)
    ei, ej = odometry_edges(n)  # 8 edges -> divisible by 8 devices
    lc_i = jnp.asarray([0])
    lc_j = jnp.asarray([n - 1])
    lc = se3_inverse(gt[lc_i]) @ gt[lc_j]
    E_i = jnp.concatenate([ei, lc_i])  # 9 edges -> needs padding
    E_j = jnp.concatenate([ej, lc_j])
    M = jnp.concatenate([meas, lc])

    opt_single, mse_single = optimize_pose_graph(
        init, E_i, E_j, M, iterations=5
    )
    mesh = make_mesh()
    opt_shard, mse_shard = optimize_pose_graph_sharded(
        mesh, init, E_i, E_j, M, iterations=5
    )
    np.testing.assert_allclose(
        np.asarray(opt_shard), np.asarray(opt_single), atol=1e-4
    )
    # final mse includes the zero-weight padding edge (dilution), so
    # compare only magnitude class
    assert np.isfinite(float(mse_shard))
    assert float(mse_shard) <= float(mse_single) * 1.5 + 1e-8
