"""Flow-network (RAFTGMA) training CLI (ref: GMA/train.py:78-175).

RAFT-style training: gamma-decayed sequence loss, one-cycle LR,
gradient clipping, EPE metrics — batch sharded over the device mesh.

Checkpointing: ``--checkpoint-dir`` periodically saves the FULL Orbax
train state (params + batch_stats + optimizer state + step); rerunning
with the same directory resumes from the latest checkpoint mid-stage
(exact schedule/optimizer continuation, unlike the reference's
weights-only saves at GMA/train.py:166-171). ``--output`` still writes
a weights-only msgpack for the converter/eval chain.

Schedule note: the reference uses torch OneCycleLR
(GMA/train.py:68-75); this trainer substitutes linear warmup + cosine
decay with the same peak/span (see training/flow.py make_optimizer for
why) — a documented training-recipe deviation.

Usage:
  python -m atdn_vslam_tpu.cli.train_flow --dataset kitti \
      --root /data/kitti2015 --steps 1000 --batch-size 6 \
      --crop 288 960 [--restore gma.msgpack] [--output gma_out.msgpack] \
      [--checkpoint-dir ckpts/ --checkpoint-every 2500]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.parallel import make_mesh, shard_batch
from atdn_vslam_tpu.training.flow import (
    init_state,
    make_optimizer,
    make_train_step,
)
from atdn_vslam_tpu.utils.helpers import log


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="RAFTGMA flow training")
    p.add_argument("--dataset",
                   choices=["kitti", "sintel", "chairs", "things", "hd1k"],
                   default=None,
                   help="single dataset (mutually exclusive with --stage)")
    p.add_argument("--stage",
                   choices=["chairs", "things", "sintel", "kitti"],
                   default=None,
                   help="curriculum stage mixture + aug recipe "
                        "(ref GMA/core/datasets.py:272-299); dataset "
                        "roots come from --root/--root-*")
    p.add_argument("--root", default=None,
                   help="dataset root (for --dataset, or the --stage's "
                        "primary dataset)")
    p.add_argument("--root-things", default=None)
    p.add_argument("--root-kitti", default=None)
    p.add_argument("--root-hd1k", default=None)
    p.add_argument("--dstype", default="clean")
    p.add_argument("--steps", type=int, default=50000)
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--crop", type=int, nargs=2, default=(288, 960))
    p.add_argument("--lr", type=float, default=1.25e-4)
    p.add_argument("--wd", type=float, default=1e-5)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--schedule", choices=["warmcos", "onecycle"],
                   default="warmcos",
                   help="onecycle = the reference's exact linear-anneal "
                        "OneCycleLR shape (GMA/train.py:68-75); warmcos "
                        "= warmup + cosine decay (TPU default)")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--restore", default=None)
    p.add_argument("--output", default="flow_trained.msgpack")
    p.add_argument("--checkpoint-dir", default=None,
                   help="Orbax full-state checkpoints (params + opt "
                        "state + step); resumes from the latest one "
                        "when rerun with the same directory")
    p.add_argument("--checkpoint-every", type=int, default=2500)
    p.add_argument("--no-mesh", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize update steps on backward: "
                        "O(1) update activations instead of O(iters) "
                        "— larger crops/batches on a fixed HBM budget")
    p.add_argument("--log-every", type=int, default=100)
    args = p.parse_args(argv)

    from atdn_vslam_tpu.data.flow_datasets import (
        STAGE_RECIPES,
        FlyingChairsDataset,
        FlyingThingsDataset,
        HD1KDataset,
        KittiFlowDataset,
        SintelDataset,
        _attach_aug,
        fetch_train_dataset,
    )

    if (args.dataset is None) == (args.stage is None):
        p.error("exactly one of --dataset / --stage is required")
    crop = tuple(args.crop)
    if args.stage is not None:
        roots = {args.stage: args.root} if args.root else {}
        if args.root_things:
            roots["things"] = args.root_things
        if args.root_kitti:
            roots["kitti"] = args.root_kitti
        if args.root_hd1k:
            roots["hd1k"] = args.root_hd1k
        if args.stage not in roots:
            p.error(f"--stage {args.stage} requires its primary "
                    "dataset root (--root)")
        # per-part augmentors are attached inside the mixture
        dataset = fetch_train_dataset(
            args.stage, roots, crop_size=crop, seed=args.seed
        )
        label = f"stage {args.stage}"
    else:
        if args.root is None:
            p.error("--dataset requires --root")
        if args.dataset == "kitti":
            dataset = KittiFlowDataset(args.root)
        elif args.dataset == "sintel":
            dataset = SintelDataset(args.root, dstype=args.dstype)
        elif args.dataset == "things":
            dataset = FlyingThingsDataset(args.root)
        elif args.dataset == "hd1k":
            dataset = HD1KDataset(args.root)
        else:
            dataset = FlyingChairsDataset(args.root)
        _attach_aug(
            dataset, crop, args.seed, **STAGE_RECIPES[args.dataset]
        )
        label = args.dataset
    log(f"{label}: {len(dataset)} pairs")

    from atdn_vslam_tpu.utils.platform import is_tpu
    on_tpu = is_tpu()
    model = RAFTGMA(
        iters=args.iters,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_pallas=None if on_tpu else False,
        remat=args.remat,
    )
    tx = make_optimizer(
        args.lr, args.steps, args.wd, args.clip, schedule=args.schedule
    )
    h, w = args.crop
    state = init_state(
        model, jnp.zeros((args.batch_size, h, w, 3)), tx, args.seed
    )
    if args.restore:
        from flax.serialization import msgpack_restore

        with open(args.restore, "rb") as f:
            variables = msgpack_restore(f.read())
        state = state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
        log("Restored from", args.restore)

    start = 0
    if args.checkpoint_dir:
        from atdn_vslam_tpu.training.flow import (
            latest_checkpoint,
            load_checkpoint,
        )

        latest = latest_checkpoint(args.checkpoint_dir)
        if latest is not None:
            state = load_checkpoint(latest, state)
            start = int(jax.device_get(state.step))
            log(f"Resumed from {latest} at step {start}")

    mesh = None if args.no_mesh else make_mesh()
    step = make_train_step(model, tx, args.gamma, mesh=mesh)

    for i in range(start, args.steps):
        # per-step seeded sampling: the data order is a pure function
        # of (seed, step), so a resumed run sees the exact batches the
        # uninterrupted run would have
        rng = np.random.default_rng((args.seed, i))
        idx = rng.integers(0, len(dataset), args.batch_size)
        ims1, ims2, flows, valids = [], [], [], []
        for j in idx:
            im1, im2, flow, valid = dataset[int(j)]
            ims1.append(im1); ims2.append(im2)
            flows.append(flow); valids.append(valid)
        batch = (
            jnp.asarray(np.stack(ims1)), jnp.asarray(np.stack(ims2)),
            jnp.asarray(np.stack(flows)), jnp.asarray(np.stack(valids)),
        )
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        state, metrics = step(state, *batch)
        if i % args.log_every == 0:
            log(f"step {i}: loss {float(metrics['loss']):.4f} "
                f"epe {float(metrics['epe']):.3f} "
                f"1px {float(metrics['1px']):.3f}")
        if args.checkpoint_dir and (i + 1) % args.checkpoint_every == 0:
            from atdn_vslam_tpu.training.flow import (
                checkpoint_path,
                save_checkpoint,
            )

            save_checkpoint(
                checkpoint_path(args.checkpoint_dir, i + 1), state
            )
            log(f"Checkpointed full train state at step {i + 1}")

    from flax.serialization import msgpack_serialize

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    with open(args.output, "wb") as f:
        f.write(msgpack_serialize(variables))
    log("Saved", args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
