"""Mapping (MappingVAE) training — the online map-building loop.

Re-design of the reference's in-runtime training
(ref: slam_framework/neural_slam.py:305-352; the standalone
train_localization.py is a broken near-duplicate — SURVEY.md 2.18):

  * 50 epochs, batch 16, AdamW lr 1e-3 wd 1e-3, cosine to 1e-5
    (neural_slam.py:310-321);
  * color-jitter augmentation on inputs (neural_slam.py:323,329) —
    jittable brightness/saturation perturbations in random op order
    with per-op clamping (torchvision ColorJitter semantics; the
    reference's hue jitter amplitude is 1e-3, visually null; omitted);
  * targets are the *unaugmented* images resized to the decoder output,
    gaussian-blurred, ImageNet-normalized (neural_slam.py:332-334);
  * loss = reconstruction MSE + saturation L1 (training/losses.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from atdn_vslam_tpu.config import MappingTrainConfig
from atdn_vslam_tpu.models.mapping import MappingVAE, normalize_rgb
from atdn_vslam_tpu.training.losses import mapping_reconstruction_loss


class MappingTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def color_jitter(rng: jax.Array, images: jax.Array,
                 brightness: float = 0.1, saturation: float = 0.1) -> jax.Array:
    """Per-image brightness/saturation jitter on [0, 255] RGB
    (ref: ColorJitter(brightness=0.1, saturation=0.1, hue=1e-3),
    neural_slam.py:323).

    torchvision's ColorJitter applies its ops in a random ORDER per
    draw with clamping after each op; both orders of the two ops are
    computed and selected per image (branchless — this runs inside the
    jitted train step). The reference's hue jitter (amplitude 1e-3,
    visually null) is a documented omission."""
    b = images.shape[0]
    r1, r2, r3 = jax.random.split(rng, 3)
    bf = jax.random.uniform(
        r1, (b, 1, 1, 1), minval=1 - brightness, maxval=1 + brightness
    )
    sf = jax.random.uniform(
        r2, (b, 1, 1, 1), minval=1 - saturation, maxval=1 + saturation
    )

    def bright(x):
        return jnp.clip(x * bf, 0.0, 255.0)

    def sat(x):
        gray = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.clip(gray + sf * (x - gray), 0.0, 255.0)

    first_bright = jax.random.bernoulli(r3, 0.5, (b, 1, 1, 1))
    return jnp.where(
        first_bright, sat(bright(images)), bright(sat(images))
    )


def gaussian_blur_5x5(images: jax.Array) -> jax.Array:
    """Separable 5x5 gaussian (sigma per torchvision default for k=5:
    0.3*((5-1)*0.5-1)+0.8 = 1.1) (ref: TF.gaussian_blur(im, [5,5]),
    neural_slam.py:333)."""
    sigma = 1.1
    x = jnp.arange(-2, 3, dtype=images.dtype)
    kernel = jnp.exp(-0.5 * (x / sigma) ** 2)
    kernel = kernel / jnp.sum(kernel)
    c = images.shape[-1]
    kh = jnp.tile(kernel.reshape(5, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(kernel.reshape(1, 5, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(
        images.shape, kh.shape, ("NHWC", "HWIO", "NHWC")
    )
    out = jax.lax.conv_general_dilated(
        images, kh, (1, 1), [(2, 2), (0, 0)], dimension_numbers=dn,
        feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        out, kw, (1, 1), [(0, 0), (2, 2)], dimension_numbers=dn,
        feature_group_count=c,
    )


def make_optimizer(cfg: MappingTrainConfig, steps_total: int):
    schedule = optax.cosine_decay_schedule(
        cfg.lr, max(steps_total, 1), alpha=cfg.eta_min / cfg.lr
    )
    return optax.adamw(schedule, weight_decay=cfg.wd)


def init_state(
    model: MappingVAE,
    cfg: MappingTrainConfig,
    steps_total: int,
    sample_images: jax.Array,
) -> MappingTrainState:
    variables = model.init(jax.random.key(cfg.seed), sample_images)
    tx = make_optimizer(cfg, steps_total)
    return MappingTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
    )


def make_train_step(
    model: MappingVAE,
    cfg: MappingTrainConfig,
    steps_total: int,
    mesh=None,
    donate: bool = True,
):
    """step(state, rng, images_uint8_NHWC) -> (state, loss).

    With ``mesh``, the image batch shards over the "data" axis and the
    state replicates — the gradient all-reduce is GSPMD-inserted, the
    same treatment the odometry/flow steps get (the reference's mapping
    loop is single-GPU inside the runtime, neural_slam.py:305-352).
    """
    tx = make_optimizer(cfg, steps_total)

    # target pipeline (resize -> blur -> normalize) runs in the model's
    # compute dtype: the bilinear resize lowers to two dense matmuls
    # (68 of the step's 231 GFLOP — round-5 trace: 27 ms of the 294 ms
    # f32 step); no gradient flows through it, and the target is
    # blurred anyway, so bf16 target formation is noise-level
    target_dtype = model.dtype or jnp.float32

    def step_fn(state: MappingTrainState, rng, images):
        images = images.astype(jnp.float32)
        inputs = color_jitter(rng, images)

        def loss_fn(params):
            (mu, logvar, latent, decoded), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, True, mutable=["batch_stats"],
            )
            target = jax.image.resize(
                images.astype(target_dtype),
                (*images.shape[:1], *decoded.shape[1:]), "bilinear",
            )
            target = normalize_rgb(gaussian_blur_5x5(target)).astype(
                jnp.float32
            )
            return mapping_reconstruction_loss(decoded, target), mutated[
                "batch_stats"
            ]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            loss,
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    from atdn_vslam_tpu.parallel.mesh import batch_sharding, replicated

    repl = replicated(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, batch_sharding(mesh)),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def train_mapping(
    model: MappingVAE,
    cfg: MappingTrainConfig,
    images: np.ndarray,
    log_fn=None,
    save_fn=None,
    mesh=None,
) -> MappingTrainState:
    """Full map-building run over a keyframe image array
    (N, H, W, 3) uint8 (ref: neural_slam.py:305-352).

    :param save_fn: optional per-epoch checkpoint callback receiving the
        current state (ref saves the VAE weights every epoch,
        neural_slam.py:347-348).
    :param mesh: optional device mesh; the batch then shards over the
        "data" axis (rounded down to a multiple of it — falls back to
        single-device when fewer keyframes than devices)."""
    n = len(images)
    batch = min(cfg.batch_size, n)
    if mesh is not None:
        dsize = mesh.shape["data"]
        batch = (batch // dsize) * dsize
        if batch == 0:
            mesh, batch = None, min(cfg.batch_size, n)
    steps_per_epoch = max(n // batch, 1)
    steps_total = cfg.epochs * steps_per_epoch

    state = init_state(
        model, cfg, steps_total, jnp.zeros((batch, *images.shape[1:]))
    )
    step = make_train_step(model, cfg, steps_total, mesh=mesh)
    if mesh is not None:
        from atdn_vslam_tpu.parallel.mesh import replicated, shard_batch

        state = jax.device_put(state, replicated(mesh))
    rng = jax.random.key(cfg.seed)
    order_rng = np.random.default_rng(cfg.seed)
    for epoch in range(cfg.epochs):
        order = order_rng.permutation(n)
        epoch_loss = 0.0
        for i in range(steps_per_epoch):
            idx = order[i * batch : (i + 1) * batch]
            rng, sub = jax.random.split(rng)
            imgs = jnp.asarray(images[idx])
            if mesh is not None:
                (imgs,) = shard_batch(mesh, (imgs,))
            state, loss = step(state, sub, imgs)
            epoch_loss += float(loss)
        if log_fn is not None:
            log_fn(epoch, epoch_loss / steps_per_epoch)
        if save_fn is not None:
            save_fn(state)
    return state
