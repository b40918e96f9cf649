"""End-to-end SLAM life-cycle demo (ref: test_slam.py:24-148).

Runs the full pipeline on a KITTI sequence: odometry over all frames
(with FPS measurement), keyframe registration, map building,
relocalization queries, and result artifacts (trajectory txt + plots +
log) — the reference's manual smoke script, reproducible from the CLI.

Usage:
  python -m atdn_vslam_tpu.cli.slam_demo --data-path data --sequence 00 \
      --odometry-checkpoint-dir checkpoints --stage 1 \
      [--max-frames 200] [--query-frame 195]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.config import load_config
from atdn_vslam_tpu.data.kitti import KittiSequence
from atdn_vslam_tpu.eval import save_kitti_trajectory
from atdn_vslam_tpu.eval.visualizer import plot_trajectories_xz
from atdn_vslam_tpu.slam import SlamRuntime
from atdn_vslam_tpu.utils.helpers import log


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Full SLAM life-cycle demo")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--sequence", type=str, default="00")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--query-frame", type=int, default=195,
                   help="frame index for the relocalization query "
                        "(ref test_slam.py uses 195)")
    p.add_argument("--odometry-checkpoint-dir", type=str, default=None)
    p.add_argument("--stage", type=int, default=1)
    p.add_argument("--flow-checkpoint", type=str, default=None)
    p.add_argument("--out-dir", type=str, default="slam_demo_results")
    args = p.parse_args(argv)

    config = load_config(args.config)
    if args.data_path:
        config = dataclasses.replace(config, data_path=args.data_path)
    os.makedirs(args.out_dir, exist_ok=True)
    config = dataclasses.replace(
        config, keyframes_path=os.path.join(args.out_dir, "keyframes")
    )

    h, w = config.slam.image_height, config.slam.image_width
    from atdn_vslam_tpu.models.factory import build_flow_model, build_odometry_model

    # flow variables
    flow_model = build_flow_model(config)
    if args.flow_checkpoint:
        from flax.serialization import msgpack_restore

        with open(args.flow_checkpoint, "rb") as f:
            flow_vars = msgpack_restore(f.read())
    else:
        zeros = jnp.zeros((1, h, w, 3))
        flow_vars = jax.jit(flow_model.init)(jax.random.key(0), zeros, zeros)
        log("WARNING: random-init flow net")

    # odometry variables
    odo_model = build_odometry_model(config)
    if args.odometry_checkpoint_dir:
        from atdn_vslam_tpu.training.odometry import init_state, load_checkpoint

        cfg2 = dataclasses.replace(
            config,
            checkpoint_dir=args.odometry_checkpoint_dir,
        )
        template = init_state(
            odo_model, config.train, 1, jnp.zeros((1, 1, h, w, 2))
        )
        state = load_checkpoint(cfg2, args.stage, template)
        odo_vars = {"params": state.params, "batch_stats": state.batch_stats}
    else:
        odo_vars = jax.jit(odo_model.init)(
            jax.random.key(1), jnp.zeros((1, 1, h, w, 2)),
            odo_model.init_carry(1),
        )
        log("WARNING: random-init odometry net")

    slam = SlamRuntime(config, flow_vars, odo_vars)

    seq = KittiSequence(config.data_path, args.sequence, need_flows=False)
    n = len(seq.image_files)
    if args.max_frames:
        n = min(n, args.max_frames)
    log(f"Sequence {args.sequence}: {n} frames")

    # --- odometry phase (ref test_slam.py:24-81) ---
    slam.start_odometry()
    t0 = time.time()
    frames = np.stack([seq.read_image(i) for i in range(n)])
    poses = list(slam.run_odometry_sequence(frames))
    elapsed = time.time() - t0
    log(f"Odometry: {n} frames in {elapsed:.1f}s "
        f"({n / elapsed:.2f} fps incl. IO), keyframes: {len(slam)}")
    traj_path = save_kitti_trajectory(
        os.path.join(args.out_dir, f"{args.sequence}_slam.txt"),
        np.stack(poses),
    )
    plot_trajectories_xz(
        {"SLAM": np.stack(poses)},
        os.path.join(args.out_dir, f"{args.sequence}_slam_xz.png"),
    )
    log("Trajectory ->", traj_path)

    # --- mapping phase (ref test_slam.py:84-99) ---
    t0 = time.time()
    slam.end_odometry()
    log(f"Mapping trained in {time.time() - t0:.1f}s; mode: {slam.mode()}")

    # --- relocalization phase (ref test_slam.py:101-148) ---
    qi = min(args.query_frame, n - 1)
    initial, refined, distances = slam(seq.read_image(qi))
    log(f"Relocalization of frame {qi}: nearest keyframe "
        f"{int(np.argmin(distances))} of {len(distances)}")
    gt_pose = poses[qi]
    err_initial = np.linalg.norm(initial[:3, 3] - gt_pose[:3, 3])
    err_refined = np.linalg.norm(refined[:3, 3] - gt_pose[:3, 3])
    log(f"position error: initial {err_initial:.2f} m, "
        f"refined {err_refined:.2f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
