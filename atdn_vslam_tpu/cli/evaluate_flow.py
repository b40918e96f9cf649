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
from atdn_vslam_tpu.utils.helpers import log


def _pad8(im: np.ndarray) -> tuple[np.ndarray, tuple[int, int]]:
    h, w = im.shape[:2]
    ph = (8 - h % 8) % 8
    pw = (8 - w % 8) % 8
    if ph or pw:
        im = np.pad(im, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return im, (h, w)


def evaluate_dataset(model, variables, dataset, limit=None):
    """-> dict of EPE stats (ref: GMA/evaluate.py validate_* structure)."""
    fwd = jax.jit(
        lambda v, a, b: model.apply(v, a, b, test_mode=True)[1]
    )
    epes, f1s = [], []
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        im1, im2, flow_gt, valid = dataset[i]
        p1, hw = _pad8(im1)
        p2, _ = _pad8(im2)
        up = np.asarray(
            fwd(variables, jnp.asarray(p1)[None], jnp.asarray(p2)[None])
        )[0, : hw[0], : hw[1]]
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
        pad, _ = _pad8(im1)
        z = jnp.zeros((1, *pad.shape))
        variables = jax.jit(model.init)(jax.random.key(0), z, z)
        log("WARNING: random-init flow net")

    stats = evaluate_dataset(model, variables, dataset, args.limit)
    log(f"EPE {stats['epe']:.3f}  F1-all {stats['f1_all']:.2f}% "
        f"({stats['frames']} frames)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
