"""Flow-network evaluation CLI (ref: GMA/evaluate.py — the wheel's
validation suites for Chairs/Sintel/KITTI).

Computes EPE (+ KITTI F1-all) over a flow dataset with the RAFTGMA
network.

Usage:
  python -m atdn_vslam_tpu.cli.evaluate_flow --dataset kitti \
      --root /data/kitti2015 --flow-checkpoint gma.msgpack [--iters 24]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.ops.padding import InputPadder
from atdn_vslam_tpu.utils.helpers import log


def evaluate_dataset(model, variables, dataset, limit=None,
                     pad_mode: str = "sintel"):
    """-> dict of EPE stats (ref: GMA/evaluate.py validate_* structure).

    :param pad_mode: InputPadder mode — 'kitti' pads the height at the
        bottom only, 'sintel' centers (ref: GMA/core/utils/utils.py:8-17;
        the wheel's validate_kitti/validate_sintel pass these modes)."""
    fwd = jax.jit(
        lambda v, a, b: model.apply(v, a, b, test_mode=True)[1]
    )
    epes, f1s = [], []
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        im1, im2, flow_gt, valid = dataset[i]
        padder = InputPadder(im1.shape, mode=pad_mode)
        p1, p2 = padder.pad(im1, im2)
        up = np.asarray(padder.unpad(
            fwd(variables, jnp.asarray(p1)[None], jnp.asarray(p2)[None])
        ))[0]
        err = np.linalg.norm(up - flow_gt, axis=-1)
        mask = valid >= 0.5
        if mask.sum() == 0:
            continue
        epes.append(err[mask].mean())
        mag = np.linalg.norm(flow_gt, axis=-1)
        out = (err > 3.0) & (err / np.maximum(mag, 1e-9) > 0.05)
        f1s.append(out[mask].mean() * 100.0)
    return {
        "epe": float(np.mean(epes)),
        "f1_all": float(np.mean(f1s)),
        "frames": len(epes),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Flow network evaluation")
    p.add_argument("--dataset", choices=["kitti", "sintel", "chairs"],
                   required=True)
    p.add_argument("--root", required=True)
    p.add_argument("--dstype", default="clean", help="sintel pass")
    p.add_argument("--flow-checkpoint", default=None)
    p.add_argument("--iters", type=int, default=24,
                   help="refinement iterations (ref GMA/evaluate.py "
                        "uses 24-32 for eval)")
    p.add_argument("--limit", type=int, default=None)
    args = p.parse_args(argv)

    from atdn_vslam_tpu.data.flow_datasets import (
        FlyingChairsDataset,
        KittiFlowDataset,
        SintelDataset,
    )

    if args.dataset == "kitti":
        dataset = KittiFlowDataset(args.root)
    elif args.dataset == "sintel":
        dataset = SintelDataset(args.root, dstype=args.dstype)
    else:
        dataset = FlyingChairsDataset(args.root)
    log(f"{args.dataset}: {len(dataset)} pairs")

    from atdn_vslam_tpu.utils.platform import is_tpu
    on_tpu = is_tpu()
    model = RAFTGMA(
        iters=args.iters,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=None if on_tpu else False,
    )
    if args.flow_checkpoint:
        from flax.serialization import msgpack_restore

        with open(args.flow_checkpoint, "rb") as f:
            variables = msgpack_restore(f.read())
    else:
        im1, _, _, _ = dataset[0]
        pad = InputPadder(im1.shape).pad(im1)[0]
        z = jnp.zeros((1, *pad.shape))
        variables = jax.jit(model.init)(jax.random.key(0), z, z)
        log("WARNING: random-init flow net")

    stats = evaluate_dataset(
        model, variables, dataset, args.limit,
        pad_mode="kitti" if args.dataset == "kitti" else "sintel",
    )
    log(f"EPE {stats['epe']:.3f}  F1-all {stats['f1_all']:.2f}% "
        f"({stats['frames']} frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
