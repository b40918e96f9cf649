"""Flow-cache precompute tool.

The reference trains odometry from precomputed fp16 flows under
``dataset/flows2/<seq>/`` but the tool that generates them was
gitignored and never shipped (SURVEY.md 2.14; implied by
odometry/datasets.py:42-44). This is that tool, TPU-native: runs
RAFTGMA over consecutive frame pairs of a KITTI sequence and writes the
native single-file fp16 cache (data/flow_cache.py).

Usage:
  python -m atdn_vslam_tpu.cli.precompute_flows --data-path data \
      --sequence 00 [--flow-checkpoint ckpt.msgpack] [--batch 4]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.config import load_config
from atdn_vslam_tpu.data.flow_cache import FlowCacheWriter
from atdn_vslam_tpu.data.kitti import KittiSequence
from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.utils.helpers import log


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Precompute GMA flow cache")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--data-path", type=str, default=None)
    p.add_argument("--sequence", type=str, required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--flow-checkpoint", type=str, default=None,
                   help="msgpack flow variables (tools/convert_torch_"
                        "checkpoint.py output); random init if absent "
                        "(useful only for pipeline testing)")
    args = p.parse_args(argv)

    import dataclasses
    import os

    config = load_config(args.config)
    if args.data_path:
        config = dataclasses.replace(config, data_path=args.data_path)

    seq = KittiSequence(config.data_path, args.sequence, need_flows=False)
    n_pairs = len(seq.image_files) - 1
    if n_pairs <= 0:
        raise SystemExit(f"Sequence {args.sequence} has no frame pairs")
    h, w = config.slam.image_height, config.slam.image_width

    from atdn_vslam_tpu.utils.platform import is_tpu
    on_tpu = is_tpu()
    model = RAFTGMA(
        iters=config.flow.iters,
        dtype=jnp.bfloat16 if (config.flow.mixed_precision and on_tpu)
        else jnp.float32,
        use_pallas=None if (on_tpu and config.flow.use_pallas_attention) else False,
    )
    sample = jnp.zeros((args.batch, h, w, 3))
    if args.flow_checkpoint:
        from flax.serialization import msgpack_restore

        with open(args.flow_checkpoint, "rb") as f:
            variables = msgpack_restore(f.read())
        log("Loaded flow variables from", args.flow_checkpoint)
    else:
        variables = jax.jit(model.init)(jax.random.key(0), sample, sample)
        log("WARNING: random-init flow net (no checkpoint given)")

    # fnet runs ONCE per unique frame: the B pairs of a batch share
    # B+1 frames, so encoding im1 and im2 batches separately would
    # double the feature-encoder cost (measured ~10% of the batched
    # pipeline; tools/profiling/exp_batched.py). The previous batch's
    # last feature map is carried forward like the frame itself.
    encode = jax.jit(lambda v, ims: model.apply(v, ims, encode_only=True))
    fwd = jax.jit(
        lambda v, a, b, f1, f2: model.apply(
            v, a, b, test_mode=True, fmap1=f1, fmap2=f2
        )[1]
    )

    def load_resized(i):
        img = seq.read_image(i).astype(np.float32)
        if img.shape[:2] != (h, w):
            img = np.asarray(
                jax.image.resize(jnp.asarray(img), (h, w, 3), "bilinear")
            )
        return img

    writer = FlowCacheWriter(
        os.path.join(config.data_path, "dataset"), args.sequence,
        n_pairs, h, w,
    )
    t0 = time.time()
    # frame i is im2 of pair i-1 and im1 of pair i: decode AND encode
    # each frame once by carrying the previous batch's last frame (and
    # its feature map) forward
    prev_frame = load_resized(0)
    prev_fmap = encode(variables, jnp.asarray(prev_frame)[None])
    for start in range(0, n_pairs, args.batch):
        count = min(args.batch, n_pairs - start)
        frames = [prev_frame] + [
            load_resized(start + j + 1) for j in range(count)
        ]
        prev_frame = frames[-1]
        im1 = np.stack(frames[:-1])
        im2 = np.stack(frames[1:])
        if count < args.batch:  # pad to static shape
            pad = args.batch - count
            im1 = np.concatenate([im1, np.zeros((pad, h, w, 3), np.float32)])
            im2 = np.concatenate([im2, np.zeros((pad, h, w, 3), np.float32)])
        # encode() returns the frame cache (fmap, stem-s2d format);
        # both leaves shift by one batch position like the frames
        fmaps_new = encode(variables, jnp.asarray(im2))
        fmap1 = jax.tree.map(
            lambda p, n: jnp.concatenate([p, n[:-1]], axis=0),
            prev_fmap, fmaps_new,
        )
        flows = np.asarray(
            fwd(variables, jnp.asarray(im1), jnp.asarray(im2),
                fmap1, fmaps_new)
        )
        prev_fmap = jax.tree.map(
            lambda n: n[count - 1 : count], fmaps_new
        )
        for j in range(count):
            writer.append(flows[j])
        done = start + count
        if done % (args.batch * 25) < args.batch:
            rate = done / (time.time() - t0)
            log(f"{done}/{n_pairs} pairs ({rate:.1f} pairs/s)")
    writer.close()
    log("Cache written:", writer.out_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
