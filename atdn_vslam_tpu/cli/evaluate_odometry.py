"""Odometry evaluation CLI (ref: evaluate_odometry.py:21-143).

Runs streaming inference over a KITTI sequence (forward and/or
backward), chains relative poses into a trajectory, exports KITTI txt,
optionally plots, and reports ATE when ground truth is present.

Usage:
  python -m atdn_vslam_tpu.cli.evaluate_odometry --data-path data \
      --stage 1 --sequence 00 --direction both --exp results/exp1
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.config import load_config
from atdn_vslam_tpu.data import FlowWindowDataset
from atdn_vslam_tpu.data.kitti import load_poses
from atdn_vslam_tpu.eval import ape_statistics, save_kitti_trajectory
from atdn_vslam_tpu.eval.visualizer import plot_trajectories_xz
from atdn_vslam_tpu.geometry import accumulate_poses_host
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.training.odometry import init_state, load_checkpoint
from atdn_vslam_tpu.config import Config
from atdn_vslam_tpu.utils.helpers import log


def run_inference(
    model: ATDNVO,
    variables: dict,
    dataset: FlowWindowDataset,
    forward: bool = True,
    chunk: int = 32,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Whole-sequence inference with LSTM carry held across the WHOLE
    sequence (ref: evaluate_odometry.py:60-75 — there, a python loop of
    batch-1 calls; here, fixed-size time chunks so the CNN encoder runs
    batch-folded on the MXU while the recurrence threads the carry
    between chunks). Returns (rot, tr, seconds of pure inference)."""
    step = jax.jit(lambda v, f, c: model.apply(v, f, c))
    carry = model.init_carry(1)
    n = len(dataset)
    indices = list(range(n)) if forward else list(range(n - 1, -1, -1))
    rots, trs = [], []
    infer_time = 0.0
    for start in range(0, n, chunk):
        batch_idx = indices[start : start + chunk]
        flows = np.stack([dataset[i][0][0] for i in batch_idx])
        count = len(batch_idx)
        if count < chunk:  # pad the final chunk to the compiled shape
            pad = np.zeros((chunk - count, *flows.shape[1:]), flows.dtype)
            flows = np.concatenate([flows, pad])
        x = jnp.asarray(flows)[None]  # (1, T, H, W, 2)
        t0 = time.perf_counter()
        (rot, tr), carry = step(variables, x, carry)
        rot, tr = np.asarray(rot), np.asarray(tr)
        infer_time += time.perf_counter() - t0
        rots.append(rot[0, :count])
        trs.append(tr[0, :count])
    return np.concatenate(rots), np.concatenate(trs), infer_time


def evaluate_direction(
    model, variables, config: Config, sequence: str, forward: bool,
    out_dir: str, plot: bool,
) -> str:
    # augment value selects traversal direction semantics
    # (ref: evaluate_odometry.py:27-29,50-58 with FlowKittiDataset2)
    dataset = FlowWindowDataset(
        config.data_path, [sequence],
        augment=1.0 if forward else -1.0, sequence_length=1,
    )
    rot, tr, seconds = run_inference(model, variables, dataset, forward)
    # trajectory chaining on host in float64: over ~4.5k steps the f32
    # device scan drifts; the reference chains in CPU doubles
    # (ref: evaluate_odometry.py:131)
    traj = accumulate_poses_host(rot, tr)
    suffix = "f" if forward else "b"
    path = save_kitti_trajectory(
        os.path.join(out_dir, f"{sequence}_{suffix}.txt"), traj
    )
    fps = len(dataset) / seconds if seconds > 0 else float("inf")
    log(f"{sequence} {suffix}: {len(dataset)} frames, "
        f"{seconds:.2f}s inference ({fps:.1f} fps) -> {path}")

    try:
        gt = load_poses(config.data_path, sequence)
    except FileNotFoundError:
        gt = None
    if gt is not None and forward and len(gt) == len(traj):
        stats = ape_statistics(traj, gt, align=True, correct_scale=True)
        log(f"ATE (aligned+scale) rmse {stats['rmse']:.2f} m, "
            f"mean {stats['mean']:.2f} m, max {stats['max']:.2f} m")
    if plot:
        plots = {"prediction": traj}
        if gt is not None:
            plots["GT"] = gt
        plot_trajectories_xz(
            plots, os.path.join(out_dir, f"{sequence}_{suffix}.png")
        )
    return path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Odometry evaluation")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--stage", type=int, required=True)
    p.add_argument("--sequence", type=str, nargs="+", default=["00"],
                   help="one or more sequences; on a multi-host run "
                        "each host evaluates its shard")
    p.add_argument(
        "--direction", choices=["forward", "backward", "both"],
        default="forward",
    )
    p.add_argument("--exp", type=str, default="eval_results")
    p.add_argument("--plot", action="store_true")
    args = p.parse_args(argv)

    import dataclasses

    config = load_config(args.config)
    if args.data_path:
        config = dataclasses.replace(config, data_path=args.data_path)
    if args.checkpoint_dir:
        config = dataclasses.replace(config, checkpoint_dir=args.checkpoint_dir)
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, stage=args.stage)
    )

    from atdn_vslam_tpu.models.factory import build_odometry_model

    model = build_odometry_model(config)
    h, w = config.slam.image_height, config.slam.image_width
    template = init_state(
        model, config.train, 1, jnp.zeros((1, 1, h, w, 2))
    )
    state = load_checkpoint(config, args.stage, template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    os.makedirs(args.exp, exist_ok=True)
    from atdn_vslam_tpu.parallel.distributed import host_shard

    for sequence in host_shard(args.sequence):
        if args.direction in ("forward", "both"):
            evaluate_direction(
                model, variables, config, sequence, True, args.exp, args.plot
            )
        if args.direction in ("backward", "both"):
            evaluate_direction(
                model, variables, config, sequence, False, args.exp, args.plot
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
