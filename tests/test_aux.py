"""Tests for auxiliary parity components: depth utils, flow IO + viz,
localization datasets, flow-training datasets, distributed helpers,
utils."""

import numpy as np
import pytest

from atdn_vslam_tpu.data.flow_io import (
    flow_to_rgb,
    read_flo,
    read_kitti_png_flow,
    read_pfm,
    write_flo,
    write_kitti_png_flow,
    write_pfm,
)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.normal(scale=30, size=(12, 20, 2)).astype(np.float32)
    path = write_flo(str(tmp_path / "a.flo"), flow)
    np.testing.assert_allclose(read_flo(path), flow)


def test_flo_bad_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError):
        read_flo(str(p))


def test_pfm_roundtrip(tmp_path, rng):
    img = rng.normal(size=(8, 10, 3)).astype(np.float32)
    path = write_pfm(str(tmp_path / "a.pfm"), img)
    np.testing.assert_allclose(read_pfm(path), img, atol=1e-6)
    gray = rng.normal(size=(8, 10)).astype(np.float32)
    path = write_pfm(str(tmp_path / "b.pfm"), gray)
    np.testing.assert_allclose(read_pfm(path), gray, atol=1e-6)


def test_kitti_png_flow_roundtrip(tmp_path, rng):
    flow = rng.normal(scale=50, size=(8, 10, 2)).astype(np.float32)
    valid = (rng.random((8, 10)) > 0.3).astype(np.float32)
    path = write_kitti_png_flow(str(tmp_path / "f.png"), flow, valid)
    flow2, valid2 = read_kitti_png_flow(path)
    np.testing.assert_allclose(flow2, flow, atol=1 / 64)
    np.testing.assert_allclose(valid2, valid)


def test_flow_to_rgb(rng):
    flow = rng.normal(scale=10, size=(16, 16, 2)).astype(np.float32)
    img = flow_to_rgb(flow)
    assert img.shape == (16, 16, 3)
    assert img.dtype == np.uint8
    # zero flow -> white-ish center of the wheel
    white = flow_to_rgb(np.zeros((4, 4, 2), np.float32))
    assert (white > 240).all()


def test_depth_projection():
    import jax.numpy as jnp

    from atdn_vslam_tpu.utils.depth import project_depth

    K = jnp.asarray([[100.0, 0, 8], [0, 100.0, 6], [0, 0, 1]])
    depth = jnp.ones((12, 16)) * 5.0
    pts = np.asarray(project_depth(depth, K))
    assert pts.shape == (12, 16, 3)
    np.testing.assert_allclose(pts[..., 2], 5.0, atol=1e-5)
    # principal point projects to (0, 0, z)
    np.testing.assert_allclose(pts[6, 8, :2], [0.0, 0.0], atol=1e-5)


def test_read_calib(tmp_path):
    from atdn_vslam_tpu.utils.depth import read_calib

    d = tmp_path / "dataset" / "sequences" / "00"
    d.mkdir(parents=True)
    vals = " ".join(str(float(i)) for i in range(12))
    (d / "calib.txt").write_text(f"P0: {vals}\nP2: {vals}\n")
    P2 = read_calib(str(tmp_path), "00")
    assert P2.shape == (3, 4)
    assert P2[0, 0] == 0.0 and P2[2, 3] == 11.0


def test_color_dataset_store(tmp_path, rng):
    from atdn_vslam_tpu.data.localization import ColorDataset

    (tmp_path / "rgb").mkdir()
    for i in range(6):
        np.save(
            tmp_path / "rgb" / f"{i:06d}.npy",
            rng.integers(0, 255, (4, 6, 3)).astype(np.uint8),
        )
    ds = ColorDataset(str(tmp_path), use_store=True, division=2)
    assert len(ds) == 3
    assert ds[0].shape == (4, 6, 3)


def test_flow_augmentor(rng):
    from atdn_vslam_tpu.data.flow_datasets import FlowAugmentor

    aug = FlowAugmentor((8, 12), h_flip_prob=1.0, v_flip_prob=0.0,
                        photometric=False, spatial_aug_prob=0.0,
                        eraser_aug_prob=0.0, seed=0)
    im1 = rng.uniform(0, 255, (16, 20, 3)).astype(np.float32)
    flow = np.ones((16, 20, 2), np.float32)
    valid = np.ones((16, 20), np.float32)
    a1, a2, af, av = aug(im1, im1.copy(), flow, valid)
    assert a1.shape == (8, 12, 3)
    # guaranteed h-flip: u component negated
    np.testing.assert_allclose(af[..., 0], -1.0)
    np.testing.assert_allclose(af[..., 1], 1.0)


def test_kitti_flow_dataset(tmp_path, rng):
    from atdn_vslam_tpu.data.flow_datasets import KittiFlowDataset

    base = tmp_path / "training"
    (base / "image_2").mkdir(parents=True)
    (base / "flow_occ").mkdir()
    import cv2

    for i in range(2):
        for t in (10, 11):
            cv2.imwrite(
                str(base / "image_2" / f"{i:06d}_{t}.png"),
                rng.integers(0, 255, (8, 10, 3)).astype(np.uint8),
            )
        write_kitti_png_flow(
            str(base / "flow_occ" / f"{i:06d}_10.png"),
            rng.normal(size=(8, 10, 2)).astype(np.float32),
        )
    ds = KittiFlowDataset(str(tmp_path))
    assert len(ds) == 2
    im1, im2, flow, valid = ds[0]
    assert im1.shape == (8, 10, 3) and flow.shape == (8, 10, 2)


def test_host_shard():
    from atdn_vslam_tpu.parallel.distributed import host_shard

    items = list(range(10))
    s0 = host_shard(items, process_index=0, process_count=4)
    s3 = host_shard(items, process_index=3, process_count=4)
    assert s0 == [0, 4, 8]
    assert s3 == [3, 7]


def test_clock_and_beta():
    from atdn_vslam_tpu.utils import BetaScheduler, Clock

    c = Clock(sync=False)
    with c:
        pass
    assert c.total >= 0 and len(c.times) == 1
    b = BetaScheduler(10, beta_max=2.0)
    assert b(0) == 0.0
    assert b(5) == 1.0
    assert b(20) == 2.0


def test_profiling_timed():
    import jax.numpy as jnp

    from atdn_vslam_tpu.utils.profiling import annotate, timed

    with timed("stage") as t:
        t.result = jnp.ones((8, 8)) * 2
    assert t.seconds >= 0
    with annotate("host-stage"):
        pass
