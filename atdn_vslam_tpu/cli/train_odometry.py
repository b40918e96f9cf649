"""Odometry training CLI (ref: train_odometry.py:21-150).

Usage:
  python -m atdn_vslam_tpu.cli.train_odometry --config cfg.yaml
  python -m atdn_vslam_tpu.cli.train_odometry --data-path data --stage 1 \
      --epochs 2 --batch-size 24 --sequence-length 6

Multi-stage curriculum: --stage N > 1 warm-starts from stage N-1's
checkpoint (ref: train_odometry.py:94-97). Batches shard over the
device mesh "data" axis.
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
from atdn_vslam_tpu.data import BatchLoader, FlowWindowDataset
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.parallel import make_mesh
from atdn_vslam_tpu.training.odometry import (
    init_state,
    make_train_step,
    save_checkpoint,
    train_epoch,
    warm_start,
)
from atdn_vslam_tpu.utils.helpers import log


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="ATDNVO odometry training")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--log-dir", type=str, default=None)
    p.add_argument("--stage", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--sequence-length", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--sequences", type=str, nargs="+", default=None,
                   help="training sequences (default: config "
                        "train_sequences, the reference's 00-10 minus "
                        "05,07)")
    p.add_argument("--no-mesh", action="store_true",
                   help="disable device-mesh sharding (single device)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    config = load_config(args.config)
    train_over = {
        k: v
        for k, v in {
            "stage": args.stage, "epochs": args.epochs,
            "batch_size": args.batch_size, "lr": args.lr,
            "sequence_length": args.sequence_length,
            "train_sequences": tuple(args.sequences) if args.sequences else None,
        }.items()
        if v is not None
    }
    if train_over:
        config = dataclasses.replace(
            config, train=dataclasses.replace(config.train, **train_over)
        )
    if args.data_path:
        config = dataclasses.replace(config, data_path=args.data_path)
    if args.checkpoint_dir:
        config = dataclasses.replace(config, checkpoint_dir=args.checkpoint_dir)
    if args.log_dir:
        config = dataclasses.replace(config, log_dir=args.log_dir)
    tc = config.train

    log("Odometry training — stage", tc.stage)
    dataset = FlowWindowDataset(
        config.data_path,
        list(tc.train_sequences),
        augment=tc.augment_flow,
        sequence_length=tc.sequence_length,
        seed=tc.seed % (2**32),
    )
    loader = BatchLoader(
        dataset, tc.batch_size, shuffle=True, seed=tc.seed % (2**32)
    )
    log("Windows:", len(dataset), "batches/epoch:", len(loader))

    mesh = None if args.no_mesh else make_mesh(config.mesh)
    if mesh is not None:
        log("Mesh:", dict(mesh.shape))

    sample_flows, _, _ = dataset[0]
    from atdn_vslam_tpu.models.factory import build_odometry_model

    model = build_odometry_model(config, training=True)
    steps_total = tc.epochs * len(loader)
    state = init_state(
        model, tc, steps_total,
        jnp.zeros((tc.batch_size, *sample_flows.shape), jnp.float32),
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log("Trainable parameters:", n_params)
    state = warm_start(config, state)

    step = make_train_step(
        model, tc, config.loss, steps_total, mesh=mesh
    )

    writer = _maybe_tensorboard(config.log_dir, "odometry")
    all_losses: list[float] = []
    t_start = time.time()
    for epoch in range(tc.epochs):
        def log_fn(i, metrics, _e=epoch):
            loss = float(metrics["loss"])
            print(
                f"epoch {_e + 1}/{tc.epochs} batch {i}: loss {loss:.5f}"
            )
            if writer is not None:
                writer.add_scalar(
                    "Loss", loss, i + _e * len(loader)
                )

        state, losses = train_epoch(
            step, state, loader, mesh=mesh, log_fn=log_fn
        )
        all_losses.extend(losses)
        save_checkpoint(config, tc.stage, state)
        log(f"Epoch {epoch + 1} done, mean loss {np.mean(losses):.5f}")

    os.makedirs(config.log_dir, exist_ok=True)
    np.savetxt(
        os.path.join(config.log_dir, f"odometry_stage{tc.stage}_loss.txt"),
        np.asarray(all_losses),
    )
    if writer is not None:
        writer.close()
    log("Training finished in", round(time.time() - t_start, 1), "s")
    return 0


def _maybe_tensorboard(log_dir: str, name: str):
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        return None
    return SummaryWriter(os.path.join(log_dir, name))


if __name__ == "__main__":
    raise SystemExit(main())
