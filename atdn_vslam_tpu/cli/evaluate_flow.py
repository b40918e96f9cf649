"""Flow-network evaluation suites + benchmark submission writers
(ref: GMA/evaluate.py — validate_chairs/sintel/kitti at :153,211,348,
create_sintel_submission/create_kitti_submission at :21,100).

Protocol parity notes:
  * Sintel/Chairs validation pools EPE over ALL pixels of all frames
    and reports 1px/3px/5px inlier rates (GMA/evaluate.py:233-240);
  * KITTI validation averages per-image valid-pixel EPE and pools the
    F1-all outlier rate (GMA/evaluate.py:362-376);
  * submissions run 32 iterations; the Sintel writer optionally warm
    starts each sequence's next pair by forward-interpolating the
    previous low-res flow (GMA/evaluate.py:29-48).

Usage:
  python -m atdn_vslam_tpu.cli.evaluate_flow --dataset kitti \
      --root /data/kitti2015 --flow-checkpoint gma.msgpack [--iters 24]
  python -m atdn_vslam_tpu.cli.evaluate_flow --dataset sintel \
      --root /data/sintel --submission out_dir [--warm-start]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.ops.padding import InputPadder
from atdn_vslam_tpu.utils.helpers import log


def _forward_fn(model, variables):
    fwd = jax.jit(
        lambda a, b, init: model.apply(
            variables, a, b, test_mode=True, flow_init=init
        )
    )

    def run(im1, im2, flow_init=None):
        if flow_init is None:
            h8, w8 = im1.shape[0] // 8, im1.shape[1] // 8
            flow_init = jnp.zeros((1, h8, w8, 2))
        lo, up = fwd(
            jnp.asarray(im1)[None], jnp.asarray(im2)[None], flow_init
        )
        return np.asarray(lo)[0], np.asarray(up)[0]

    return run


def evaluate_dataset(model, variables, dataset, limit=None,
                     pad_mode: str = "sintel"):
    """Pooled EPE/1-3-5px (+ KITTI-style per-image EPE and F1-all) over
    a flow dataset. Generic harness used by the validate_* wrappers.

    :param pad_mode: InputPadder mode — 'kitti' pads the height at the
        bottom only, 'sintel' centers (ref: GMA/core/utils/utils.py:8-17)."""
    run = _forward_fn(model, variables)
    pixel_epes, image_epes, f1s = [], [], []
    n = len(dataset) if limit is None else min(limit, len(dataset))
    for i in range(n):
        im1, im2, flow_gt, valid = dataset[i]
        padder = InputPadder(im1.shape, mode=pad_mode)
        p1, p2 = padder.pad(im1, im2)
        _, up = run(p1, p2)
        up = np.asarray(padder.unpad(up[None]))[0]
        err = np.linalg.norm(up - flow_gt, axis=-1)
        mask = valid >= 0.5
        if mask.sum() == 0:
            continue
        pixel_epes.append(err[mask])
        image_epes.append(err[mask].mean())
        mag = np.linalg.norm(flow_gt, axis=-1)
        out = (err > 3.0) & (err / np.maximum(mag, 1e-9) > 0.05)
        f1s.append(out[mask])
    if not pixel_epes:
        # an empty/misconfigured dataset must not report a perfect score
        raise ValueError(
            "no valid frames evaluated — check the dataset root"
        )
    pooled = np.concatenate(pixel_epes)
    return {
        "epe": float(np.mean(image_epes)),
        "epe_all": float(pooled.mean()),
        "1px": float((pooled < 1).mean()),
        "3px": float((pooled < 3).mean()),
        "5px": float((pooled < 5).mean()),
        "f1_all": float(np.concatenate(f1s).mean() * 100.0),
        "frames": len(image_epes),
    }


def validate_chairs(model, variables, root, limit=None):
    """FlyingChairs validation-split pooled EPE
    (ref: GMA/evaluate.py:153-171)."""
    from atdn_vslam_tpu.data.flow_datasets import FlyingChairsDataset

    ds = FlyingChairsDataset(root, split="validation")
    suffix = ""
    if not ds.split_applied:
        # without FlyingChairs_train_val.txt the split cannot be
        # applied; label the number honestly instead of calling a
        # whole-dataset EPE "validation"
        suffix = " (NO split file found — EPE over ALL pairs)"
    stats = evaluate_dataset(model, variables, ds, limit)
    log(f"Validation (chairs) EPE: {stats['epe_all']:.3f}{suffix}")
    return {"chairs_epe": stats["epe_all"],
            "split_applied": ds.split_applied}


def validate_sintel(model, variables, root, limit=None):
    """Sintel train-split pooled EPE + 1/3/5px per pass
    (ref: GMA/evaluate.py:211-243)."""
    from atdn_vslam_tpu.data.flow_datasets import SintelDataset

    results = {}
    for dstype in ("clean", "final"):
        ds = SintelDataset(root, dstype=dstype)
        stats = evaluate_dataset(
            model, variables, ds, limit, pad_mode="sintel"
        )
        log(
            f"Validation ({dstype}) EPE: {stats['epe_all']:.3f}, "
            f"1px: {stats['1px']:.3f}, 3px: {stats['3px']:.3f}, "
            f"5px: {stats['5px']:.3f}"
        )
        results[dstype] = stats["epe_all"]
    return results


def validate_kitti(model, variables, root, limit=None):
    """KITTI-2015 train split: mean per-image EPE + pooled F1-all
    (ref: GMA/evaluate.py:348-378)."""
    from atdn_vslam_tpu.data.flow_datasets import KittiFlowDataset

    ds = KittiFlowDataset(root)
    stats = evaluate_dataset(model, variables, ds, limit, pad_mode="kitti")
    log(f"Validation KITTI: {stats['epe']:.3f}, {stats['f1_all']:.3f}")
    return {"kitti_epe": stats["epe"], "kitti_f1": stats["f1_all"]}


def create_sintel_submission(
    model, variables, root, output_path, iters_note=32,
    warm_start=False, limit=None,
):
    """Write Sintel-leaderboard .flo files for the test split
    (ref: GMA/evaluate.py:21-49). The model's iteration count is fixed
    at construction; pass a 32-iteration model for the reference
    protocol."""
    from atdn_vslam_tpu.data.flow_datasets import SintelDataset
    from atdn_vslam_tpu.data.flow_io import forward_interpolate, write_flo

    run = _forward_fn(model, variables)
    for dstype in ("clean", "final"):
        ds = SintelDataset(root, split="test", dstype=dstype)
        flow_prev, seq_prev = None, None
        n = len(ds) if limit is None else min(limit, len(ds))
        for i in range(n):
            im1, im2, _, _ = ds[i]
            scene, frame = ds.extra_info[i]
            if scene != seq_prev:
                flow_prev = None
            padder = InputPadder(im1.shape, mode="sintel")
            p1, p2 = padder.pad(im1, im2)
            lo, up = run(p1, p2, flow_prev)
            flow = np.asarray(padder.unpad(up[None]))[0]
            if warm_start:
                flow_prev = jnp.asarray(forward_interpolate(lo))[None]
            out_dir = os.path.join(output_path, dstype, scene)
            os.makedirs(out_dir, exist_ok=True)
            write_flo(
                os.path.join(out_dir, f"frame{frame + 1:04d}.flo"), flow
            )
            seq_prev = scene
    return output_path


def create_kitti_submission(
    model, variables, root, output_path, limit=None
):
    """Write KITTI-leaderboard 16-bit flow pngs for the testing split
    (ref: GMA/evaluate.py:100-118)."""
    from atdn_vslam_tpu.data.flow_datasets import KittiFlowDataset
    from atdn_vslam_tpu.data.flow_io import write_kitti_png_flow

    ds = KittiFlowDataset(root, split="testing")
    run = _forward_fn(model, variables)
    os.makedirs(output_path, exist_ok=True)
    n = len(ds) if limit is None else min(limit, len(ds))
    for i in range(n):
        im1, im2, _, _ = ds[i]
        frame_id = ds.extra_info[i]
        padder = InputPadder(im1.shape, mode="kitti")
        p1, p2 = padder.pad(im1, im2)
        _, up = run(p1, p2)
        flow = np.asarray(padder.unpad(up[None]))[0]
        write_kitti_png_flow(os.path.join(output_path, frame_id), flow)
    return output_path


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
    p.add_argument("--submission", default=None,
                   help="write leaderboard files to this directory "
                        "instead of validating")
    p.add_argument("--warm-start", action="store_true",
                   help="sintel submission: warm start each pair from "
                        "the previous flow")
    args = p.parse_args(argv)

    from atdn_vslam_tpu.utils.platform import is_tpu
    on_tpu = is_tpu()
    iters = 32 if args.submission else args.iters
    model = RAFTGMA(
        iters=iters,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=None if on_tpu else False,
    )
    if args.flow_checkpoint:
        from flax.serialization import msgpack_restore

        with open(args.flow_checkpoint, "rb") as f:
            variables = msgpack_restore(f.read())
    else:
        z = jnp.zeros((1, 64, 96, 3))
        variables = jax.jit(model.init)(jax.random.key(0), z, z)
        log("WARNING: random-init flow net")

    if args.submission:
        if args.dataset == "kitti":
            create_kitti_submission(
                model, variables, args.root, args.submission, args.limit
            )
        elif args.dataset == "sintel":
            create_sintel_submission(
                model, variables, args.root, args.submission,
                warm_start=args.warm_start, limit=args.limit,
            )
        else:
            p.error("submissions exist for kitti/sintel only")
        log("Submission written to", args.submission)
        return 0

    if args.dataset == "kitti":
        validate_kitti(model, variables, args.root, args.limit)
    elif args.dataset == "sintel":
        validate_sintel(model, variables, args.root, args.limit)
    else:
        validate_chairs(model, variables, args.root, args.limit)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
