"""Unit tests for the KITTI data pipeline with a synthetic on-disk
dataset (parity target: ref atdn_vslam/odometry/datasets.py)."""

import os

import numpy as np
import pytest

from atdn_vslam_tpu.data import (
    BatchLoader,
    FlowCache,
    FlowWindowDataset,
    write_flow_cache,
)
from atdn_vslam_tpu.data.kitti import load_poses, relative_poses_np

H, W = 8, 16


@pytest.fixture(scope="module")
def synthetic_kitti(tmp_path_factory):
    """Two tiny sequences with poses + native flow caches."""
    root = tmp_path_factory.mktemp("kitti")
    ds = root / "dataset"
    (ds / "poses").mkdir(parents=True)
    rng = np.random.default_rng(7)
    lengths = {"00": 12, "01": 9}
    for seq, n in lengths.items():
        # random smooth trajectory: cumulative product of small steps
        mats = [np.eye(4)]
        for _ in range(n - 1):
            step = np.eye(4)
            a = rng.normal(scale=0.02, size=3)
            ca, sa = np.cos(a[0]), np.sin(a[0])
            step[:3, :3] = np.array(
                [[ca, -sa, 0], [sa, ca, 0], [0, 0, 1]]
            )
            step[:3, 3] = rng.normal(scale=0.5, size=3)
            mats.append(mats[-1] @ step)
        lines = np.stack([m[:3, :].reshape(12) for m in mats])
        np.savetxt(ds / "poses" / f"{seq}.txt", lines)
        im_dir = ds / "sequences" / seq / "image_2"
        im_dir.mkdir(parents=True)
        # n-1 flows per sequence (one per frame pair)
        flows = rng.normal(scale=10, size=(n - 1, H, W, 2)).astype(np.float16)
        write_flow_cache(str(ds), seq, flows)
    return str(root), lengths


def test_flow_cache_roundtrip(synthetic_kitti):
    root, lengths = synthetic_kitti
    cache = FlowCache(os.path.join(root, "dataset"), "00")
    assert len(cache) == lengths["00"] - 1
    out = cache.read(2, 3)
    assert out.shape == (3, H, W, 2)
    assert out.dtype == np.float32


def test_flow_cache_width_crop(tmp_path):
    ds = str(tmp_path)
    wide = np.zeros((2, 4, 1240, 2), np.float16)
    wide[:, :, 4:1236] = 1.0
    write_flow_cache(ds, "77", wide)
    cache = FlowCache(ds, "77")
    out = cache.read(0, 2)
    assert out.shape == (2, 4, 1232, 2)
    assert (out == 1.0).all()


def test_relative_poses_roundtrip(synthetic_kitti):
    root, _ = synthetic_kitti
    lines = load_poses(os.path.join(root), "00")
    rot, tr = relative_poses_np(lines)
    assert rot.shape == (len(lines) - 1, 3)
    # re-chain and compare against the jnp geometry implementation
    import jax.numpy as jnp

    from atdn_vslam_tpu.geometry import accumulate_poses, line_to_matrix

    traj = np.asarray(
        accumulate_poses(jnp.asarray(rot, jnp.float32), jnp.asarray(tr, jnp.float32))
    )
    expected = np.asarray(line_to_matrix(jnp.asarray(lines, jnp.float32)))
    np.testing.assert_allclose(traj, expected, atol=1e-4)


def test_window_dataset_multiseq(synthetic_kitti):
    root, lengths = synthetic_kitti
    n = 3
    ds = FlowWindowDataset(root, ["00", "01"], augment=False, sequence_length=n)
    expected_len = sum((l - 1) - n + 1 for l in lengths.values())
    assert len(ds) == expected_len
    flows, rot, tr = ds[0]
    assert flows.shape == (n, H, W, 2)
    assert rot.shape == (n, 3) and tr.shape == (n, 3)
    # second sequence boundary: index past seq 00 windows maps to seq 01
    first_01 = (lengths["00"] - 1) - n + 1
    flows2, _, _ = ds[first_01]
    assert flows2.shape == (n, H, W, 2)


def test_window_targets_match_pose_deltas(synthetic_kitti):
    root, _ = synthetic_kitti
    ds = FlowWindowDataset(root, ["00"], augment=False, sequence_length=2)
    lines = load_poses(root, "00")
    rot_all, tr_all = relative_poses_np(lines)
    _, rot, tr = ds[3]
    np.testing.assert_allclose(rot, rot_all[3:5].astype(np.float32), atol=1e-6)
    np.testing.assert_allclose(tr, tr_all[3:5].astype(np.float32), atol=1e-6)


def test_reverse_augmentation_semantics(synthetic_kitti):
    """augment=-1.0 -> always reversed: flows negated + time-flipped,
    targets are deltas of the reversed pose window
    (ref: datasets.py:106-128)."""
    root, _ = synthetic_kitti
    fwd = FlowWindowDataset(root, ["00"], augment=1.0, sequence_length=3)
    bwd = FlowWindowDataset(root, ["00"], augment=-1.0, sequence_length=3)
    f_f, r_f, t_f = fwd[2]
    f_b, r_b, t_b = bwd[2]
    np.testing.assert_allclose(f_b, -f_f[::-1], atol=1e-6)
    # reversed deltas: step i of reversed window == inverse of forward
    # step (N-1-i); check via matrix inverse
    import jax.numpy as jnp

    from atdn_vslam_tpu.geometry import pose_to_matrix, se3_inverse

    fwd_mats = np.asarray(pose_to_matrix(jnp.asarray(r_f), jnp.asarray(t_f)))
    bwd_mats = np.asarray(pose_to_matrix(jnp.asarray(r_b), jnp.asarray(t_b)))
    inv_fwd = np.asarray(se3_inverse(jnp.asarray(fwd_mats)))[::-1]
    np.testing.assert_allclose(bwd_mats, inv_fwd, atol=1e-4)


def test_batch_loader_shapes_and_droplast(synthetic_kitti):
    root, _ = synthetic_kitti
    ds = FlowWindowDataset(root, ["00", "01"], augment=True, sequence_length=2)
    loader = BatchLoader(ds, batch_size=4, seed=1, prefetch=2)
    batches = list(loader)
    assert len(batches) == len(ds) // 4
    flows, rot, tr = batches[0]
    assert flows.shape == (4, 2, H, W, 2)
    assert rot.shape == (4, 2, 3)


def test_missing_sequence_raises(synthetic_kitti):
    root, _ = synthetic_kitti
    with pytest.raises(FileNotFoundError):
        FlowWindowDataset(root, ["99"], sequence_length=2)


def test_batch_loader_propagates_worker_errors(synthetic_kitti):
    """A dataset exception inside the prefetch thread must surface, not
    silently truncate the epoch."""

    class Exploding:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i_order.index(i) >= 4:  # fail partway through
                raise RuntimeError("corrupt item")
            return (np.zeros((2, 2)),)

    # fixed order so "partway" is deterministic
    loader = BatchLoader(Exploding(), batch_size=2, shuffle=False, prefetch=2)
    i_order = list(range(8))
    with pytest.raises(RuntimeError, match="corrupt item"):
        list(loader)
