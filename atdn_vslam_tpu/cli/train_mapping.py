"""Standalone mapping (MappingVAE) training CLI.

Parity surface for the reference's ``train_localization.py`` (which is
broken as shipped — missing import + bad kwarg, SURVEY.md 2.18); the
canonical loop semantics come from NeuralSLAM.__create_map
(neural_slam.py:305-352). Trains on a keyframe store directory and
writes the VAE variables + keyframe embeddings back to it.

Usage:
  python -m atdn_vslam_tpu.cli.train_mapping --keyframes keyframes \
      [--epochs 50 --batch-size 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np

from atdn_vslam_tpu.config import load_config
from atdn_vslam_tpu.models.mapping import MappingVAE
from atdn_vslam_tpu.slam.keyframes import KeyframeStore
from atdn_vslam_tpu.training.mapping import train_mapping
from atdn_vslam_tpu.utils.helpers import log


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="MappingVAE training")
    p.add_argument("--config", type=str, default=None)
    p.add_argument("--keyframes", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    args = p.parse_args(argv)

    config = load_config(args.config)
    if args.keyframes:
        config = dataclasses.replace(config, keyframes_path=args.keyframes)
    over = {
        k: v
        for k, v in {
            "epochs": args.epochs, "batch_size": args.batch_size,
            "lr": args.lr,
        }.items()
        if v is not None
    }
    if over:
        config = dataclasses.replace(
            config,
            mapping_train=dataclasses.replace(config.mapping_train, **over),
        )

    store = KeyframeStore(config.keyframes_path)
    store.load(with_embeddings=False)
    log("Keyframes:", len(store))
    images = np.stack([store.read_rgb(i) for i in range(len(store))])

    from atdn_vslam_tpu.models.factory import build_mapping_model

    model = build_mapping_model(config)
    state = train_mapping(
        model, config.mapping_train, images,
        log_fn=lambda e, l: log(f"epoch {e + 1}: loss {l:.5f}"),
    )

    from flax.serialization import msgpack_serialize

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    out = os.path.join(config.keyframes_path, "mapping_vae.msgpack")
    with open(out, "wb") as f:
        f.write(msgpack_serialize(variables))
    log("VAE variables ->", out)

    # embed all keyframes (ref: neural_slam.py:163-169)
    encode = jax.jit(
        lambda v, im: model.apply(v, im, method=model.get_code)
    )
    codes = []
    for start in range(0, len(store), 8):
        batch = images[start : start + 8].astype(np.float32)
        codes.append(
            np.asarray(encode(variables, batch)).reshape(len(batch), -1)
        )
    store.set_embeddings(np.concatenate(codes))
    store.save()
    log("Embeddings saved:", store.embeddings.shape)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
