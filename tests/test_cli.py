"""CLI integration tests: train -> evaluate -> kalman -> visualize on a
synthetic on-disk KITTI dataset (parity surface for the reference's
root-level scripts)."""

import os

import numpy as np
import pytest

H, W = 96, 192


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_cli")
    ds = root / "dataset"
    (ds / "poses").mkdir(parents=True)
    rng = np.random.default_rng(11)
    n = 14
    from atdn_vslam_tpu.data import write_flow_cache

    mats = [np.eye(4)]
    for _ in range(n - 1):
        s = np.eye(4)
        a = rng.normal(scale=0.02)
        s[:3, :3] = [
            [np.cos(a), 0, np.sin(a)],
            [0, 1, 0],
            [-np.sin(a), 0, np.cos(a)],
        ]
        s[:3, 3] = [0.1, 0.0, 1.0]
        mats.append(mats[-1] @ s)
    lines = np.stack([m[:3, :].reshape(12) for m in mats])
    np.savetxt(ds / "poses" / "00.txt", lines)
    (ds / "sequences" / "00" / "image_2").mkdir(parents=True)
    write_flow_cache(
        str(ds), "00",
        rng.normal(scale=5, size=(n - 1, H, W, 2)).astype(np.float16),
    )
    return root


@pytest.fixture(scope="module")
def trained(kitti_root, tmp_path_factory):
    """Run the training CLI for one stage."""
    from atdn_vslam_tpu.cli.train_odometry import main

    ckpt = tmp_path_factory.mktemp("ckpt")
    rc = main([
        "--data-path", str(kitti_root),
        "--checkpoint-dir", str(ckpt),
        "--log-dir", str(ckpt / "log"),
        "--stage", "1", "--epochs", "1",
        "--batch-size", "4", "--sequence-length", "2",
        "--lr", "1e-3", "--sequences", "00", "--no-mesh",
    ])
    assert rc == 0
    return ckpt


def test_train_writes_checkpoint(trained):
    assert os.path.isdir(os.path.join(str(trained), "odometry_stage1"))


def test_stage2_warm_start(kitti_root, trained):
    from atdn_vslam_tpu.cli.train_odometry import main

    rc = main([
        "--data-path", str(kitti_root),
        "--checkpoint-dir", str(trained),
        "--log-dir", str(trained / "log"),
        "--stage", "2", "--epochs", "1",
        "--batch-size", "4", "--sequence-length", "2",
        "--lr", "1e-3", "--sequences", "00", "--no-mesh",
    ])
    assert rc == 0
    assert os.path.isdir(os.path.join(str(trained), "odometry_stage2"))


def test_evaluate_and_postprocess(kitti_root, trained, tmp_path, monkeypatch):
    import yaml

    from atdn_vslam_tpu.cli.evaluate_odometry import main as eval_main
    from atdn_vslam_tpu.cli.kalman import main as kalman_main
    from atdn_vslam_tpu.cli.visualize import main as viz_main

    # slam config at test resolution so the eval template matches
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        yaml.safe_dump(
            {"slam": {"image_height": H, "image_width": W}}
        )
    )
    out = tmp_path / "results"
    rc = eval_main([
        "--config", str(cfg_path),
        "--data-path", str(kitti_root),
        "--checkpoint-dir", str(trained),
        "--stage", "1", "--sequence", "00",
        "--direction", "both", "--exp", str(out), "--plot",
    ])
    assert rc == 0
    f_txt = out / "00_f.txt"
    b_txt = out / "00_b.txt"
    assert f_txt.exists() and b_txt.exists()
    assert (out / "00_f.png").exists()
    traj = np.loadtxt(f_txt)
    assert traj.shape[1] == 12

    rc = kalman_main([
        "--results", str(out), "--sequence", "00",
        "--gt-dir", str(kitti_root / "dataset" / "poses"),
    ])
    assert rc == 0
    assert (out / "00_k.txt").exists()

    plots = tmp_path / "plots"
    rc = viz_main([
        "--pred", str(out / "00_k.txt"),
        "--gt", str(kitti_root / "dataset" / "poses" / "00.txt"),
        "--out-dir", str(plots),
    ])
    assert rc == 0
    assert (plots / "00_k_xz.png").exists()
    assert (plots / "00_k_ape.png").exists()
    assert (plots / "00_k_xyz.png").exists()


def test_slam_demo_cli(kitti_root, tmp_path):
    """Full SLAM life-cycle demo CLI on a synthetic image sequence."""
    import cv2
    import numpy as np
    import yaml

    from atdn_vslam_tpu.cli.slam_demo import main

    im_dir = kitti_root / "dataset" / "sequences" / "00" / "image_2"
    rng = np.random.default_rng(3)
    for i in range(6):
        cv2.imwrite(
            str(im_dir / f"{i:06d}.png"),
            rng.integers(0, 255, (H, W, 3)).astype(np.uint8),
        )
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        yaml.safe_dump({
            "slam": {
                "image_height": H, "image_width": W,
                "rotation_threshold_deg": 0.0,
                "translation_threshold": 0.0,
            },
            "flow": {"iters": 2, "mixed_precision": False,
                     "use_pallas_attention": False},
            "mapping_train": {"epochs": 1, "batch_size": 2},
        })
    )
    out = tmp_path / "demo_out"
    rc = main([
        "--config", str(cfg_path),
        "--data-path", str(kitti_root),
        "--sequence", "00", "--max-frames", "5",
        "--query-frame", "2", "--out-dir", str(out),
    ])
    assert rc == 0
    assert (out / "00_slam.txt").exists()
    assert (out / "00_slam_xz.png").exists()
    traj = np.loadtxt(out / "00_slam.txt")
    assert traj.shape == (5, 12)


def test_train_flow_cli_stage_kitti(tmp_path, monkeypatch):
    """train_flow --stage kitti: sparse augmentor + recipe wiring,
    2 steps on a synthetic KITTI-2015 tree, checkpoint written."""
    cv2 = pytest.importorskip("cv2")
    from atdn_vslam_tpu.data.flow_io import write_kitti_png_flow
    from atdn_vslam_tpu.cli.train_flow import main

    rng = np.random.default_rng(5)
    base = tmp_path / "k" / "training"
    (base / "image_2").mkdir(parents=True)
    (base / "flow_occ").mkdir()
    for i in range(2):
        for t in (10, 11):
            cv2.imwrite(
                str(base / "image_2" / f"{i:06d}_{t}.png"),
                rng.integers(0, 255, (80, 112, 3)).astype(np.uint8),
            )
        write_kitti_png_flow(
            str(base / "flow_occ" / f"{i:06d}_10.png"),
            rng.normal(scale=3, size=(80, 112, 2)).astype(np.float32),
        )
    out = tmp_path / "flow.msgpack"
    rc = main([
        "--stage", "kitti", "--root", str(tmp_path / "k"),
        "--steps", "2", "--batch-size", "2", "--crop", "64", "96",
        "--iters", "2", "--no-mesh", "--output", str(out),
        "--log-every", "1",
    ])
    assert rc == 0
    assert out.exists()


def test_precompute_flows_cli(tmp_path):
    """Precompute writes the native fp16 cache and the batched
    fnet-reuse path (fmap1/fmap2 shifted one batch) matches pairwise
    inference — including the short final batch."""
    cv2 = pytest.importorskip("cv2")
    import yaml
    import jax
    import jax.numpy as jnp

    from atdn_vslam_tpu.cli.precompute_flows import main
    from atdn_vslam_tpu.data.flow_cache import FlowCache
    from atdn_vslam_tpu.models.flow import RAFTGMA

    root = tmp_path / "kitti"
    ds = root / "dataset"
    imdir = ds / "sequences" / "07" / "image_2"
    imdir.mkdir(parents=True)
    (ds / "poses").mkdir()
    rng = np.random.default_rng(9)
    n = 8  # 7 pairs with --batch 3 -> final batch is short
    np.savetxt(
        ds / "poses" / "07.txt",
        np.stack([np.eye(4)[:3].reshape(12)] * n),
    )
    frames = rng.integers(0, 255, (n, H, W, 3)).astype(np.uint8)
    for i, f in enumerate(frames):
        cv2.imwrite(
            str(imdir / f"{i:06d}.png"),
            cv2.cvtColor(f, cv2.COLOR_RGB2BGR),
        )

    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(
        yaml.safe_dump({
            "slam": {"image_height": H, "image_width": W},
            "flow": {"iters": 2, "mixed_precision": False,
                     "use_pallas_attention": False},
        })
    )
    rc = main([
        "--config", str(cfg_path), "--data-path", str(root),
        "--sequence", "07", "--batch", "3",
    ])
    assert rc == 0

    cache = FlowCache(str(ds), "07")
    assert len(cache) == n - 1

    # pairwise reference with the same deterministic random init
    model = RAFTGMA(iters=2, dtype=jnp.float32, use_pallas=False)
    sample = jnp.zeros((3, H, W, 3))
    variables = jax.jit(model.init)(jax.random.key(0), sample, sample)
    fwd = jax.jit(
        lambda v, a, b: model.apply(v, a, b, test_mode=True)[1]
    )
    for i in range(n - 1):
        ref = np.asarray(
            fwd(
                variables,
                jnp.asarray(frames[i], jnp.float32)[None],
                jnp.asarray(frames[i + 1], jnp.float32)[None],
            )
        )[0]
        got = cache.read(i, 1)[0]
        # fp16 cache quantization + batched-vs-pairwise fusion noise
        np.testing.assert_allclose(got, ref, atol=5e-2)
