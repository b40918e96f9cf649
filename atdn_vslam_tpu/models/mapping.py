"""MappingVAE — the convolutional-autoencoder map network.

TPU-native re-design of the reference localization network
(ref: atdn_vslam/localization/network.py:9-87):

  * input: keyframe RGB in [0, 255], NHWC; normalized internally by
    /255 + ImageNet mean/std (ref: utils/normalizations.py:4-6);
  * encoder: Conv k7 + 6x ResidualConv s2 with channels
    (16, 16, 32, 64, 128, 128) (ref network.py:29-42);
  * a 1x1-conv bottleneck produces the latent code ``mu``
    (ref network.py:45,70);
  * decoder: 6x TransposedConv s2 + final 3x3 conv
    (ref network.py:47-55). Output spatial size follows torch
    transposed-conv arithmetic (2*in - 1 per stage), so the decoded
    image is smaller than the input — training resizes targets to the
    prediction (ref neural_slam.py:332);
  * optional variational path with reparametrization
    (ref network.py:63-68; off by default). The reference's
    ``sigma_lin`` is commented out upstream (network.py:44) making
    variational=True crash there; here it works.

The latent code keeps its spatial layout (H/64-ish x W/64-ish x 128);
relocalization flattens it for nearest-neighbor search.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from atdn_vslam_tpu.models.blocks import (
    ConvBlock,
    ResidualConvBlock,
    TransposedConvBlock,
    mish,
)

# ImageNet RGB statistics (ref: utils/normalizations.py:4-6)
RGB_MEAN = (0.485, 0.456, 0.406)
RGB_STD = (0.229, 0.224, 0.225)


def normalize_rgb(image: jax.Array) -> jax.Array:
    """[0,255] RGB -> ImageNet-normalized floats (NHWC)."""
    x = image / jnp.asarray(255.0, image.dtype)
    mean = jnp.asarray(RGB_MEAN, x.dtype)
    std = jnp.asarray(RGB_STD, x.dtype)
    return (x - mean) / std


class MappingVAE(nn.Module):
    variational: bool = False
    channels: tuple[int, ...] = (16, 16, 32, 64, 128, 128)
    latent_channels: int = 128
    #: optional COMPUTE dtype (e.g. bf16): full-res small-channel conv
    #: stacks are bandwidth-bound, so the whole encode/decode chain
    #: runs in this dtype (batchnorm statistics and the parameters
    #: stay f32; mu/latent/decoded are returned f32). None = f32, the
    #: reference numerics (the ref's mapping loop never autocasts,
    #: neural_slam.py:305-352). Chip-measured in round 5 — see
    #: STATUS.md.
    dtype: Any = None
    #: width-packed encoder convs (ops/wpack.py): the 3-16-channel
    #: full-res stages otherwise pad channels to 128 lanes (a 3-channel
    #: image pays ~42x HBM amplification — the measured reason the
    #: mapping step sits ~400x above its bandwidth floor). Per-stage
    #: pack factors adapt to the width; stages with no valid factor run
    #: the plain path. Exact up to f32 summation order.
    wpack: bool = False

    def setup(self):
        self.stem = ConvBlock(
            3, (7, 7), (1, 1), (3, 3), activation=mish,
            dtype=self.dtype, act_dtype=self.dtype,
        )
        self.down = [
            ResidualConvBlock(
                ch, (2, 2), activation=mish, dtype=self.dtype
            )
            for ch in self.channels
        ]
        self.mean_lin = nn.Conv(
            self.latent_channels, (1, 1), padding="VALID", dtype=self.dtype
        )
        if self.variational:
            self.sigma_lin = nn.Conv(
                self.latent_channels, (1, 1), padding="VALID",
                dtype=self.dtype,
            )
        up_channels = (*reversed(self.channels[:-1]), 8)
        self.up = [
            TransposedConvBlock(
                ch, (3, 3), (2, 2), (1, 1), activation=mish,
                dtype=self.dtype,
            )
            for ch in up_channels
        ]
        self.out_conv = nn.Conv(
            3, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )

    def encode(self, image: jax.Array, train: bool = False) -> jax.Array:
        """RGB [0,255] NHWC -> pre-bottleneck feature map."""
        x = normalize_rgb(image)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.wpack:
            from atdn_vslam_tpu.ops.wpack import (
                choose_pack,
                pack_width,
                unpack_width,
            )

            cur_p = 0
            p_stem = choose_pack((x.shape[-2],), 3)
            if p_stem >= 2:
                x = pack_width(x, p_stem)
                cur_p = p_stem
            x = self.stem(x, train, wpack=cur_p)
            ci = 3
            for block, ch in zip(self.down, self.channels):
                w_in = (x.shape[-2] * cur_p) if cur_p else x.shape[-2]
                w_out = (w_in - 1) // 2 + 1  # 3x3 s2 SAME
                p = choose_pack((w_in, w_out), max(ci, ch))
                if p != cur_p:
                    if cur_p:
                        x = unpack_width(x, cur_p)
                    if p >= 2:
                        x = pack_width(x, p)
                    cur_p = p if p >= 2 else 0
                x = block(x, train, wpack=cur_p)
                ci = ch
            if cur_p:
                x = unpack_width(x, cur_p)
            return x
        x = self.stem(x, train)
        for block in self.down:
            x = block(x, train)
        return x

    def decode(self, latent: jax.Array, train: bool = False) -> jax.Array:
        x = latent
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.wpack:
            from atdn_vslam_tpu.ops.wpack import choose_pack

            up_channels = (*reversed(self.channels[:-1]), 8)
            ci = self.latent_channels
            for block, ch in zip(self.up, up_channels):
                w = x.shape[-2]
                p = choose_pack((w,), max(ci, ch))
                x = block(x, train, wpack=p)
                ci = ch
        else:
            for block in self.up:
                x = block(x, train)
        return self.out_conv(x).astype(jnp.float32)

    def __call__(
        self,
        image: jax.Array,
        train: bool = False,
        rng: jax.Array | None = None,
    ) -> tuple[jax.Array, jax.Array | None, jax.Array, jax.Array]:
        """Returns (mu, logvar, latent, decoded) like the reference
        forward (network.py:57-77)."""
        encoded = self.encode(image, train)
        if self.variational:
            mu = self.mean_lin(encoded).astype(jnp.float32)
            logvar = self.sigma_lin(encoded).astype(jnp.float32)
            sigma = jnp.exp(0.5 * logvar)
            if rng is None:
                rng = self.make_rng("reparam")
            eps = jax.random.normal(rng, sigma.shape, sigma.dtype)
            latent = mu + sigma * eps
        else:
            latent = self.mean_lin(encoded).astype(jnp.float32)
            mu = latent
            logvar = None
        decoded = self.decode(latent, train)
        return mu, logvar, latent, decoded

    def get_code(self, image: jax.Array) -> jax.Array:
        """Latent embedding for relocalization NN search
        (ref network.py:80-84; the reference's ``self.norm`` there is a
        latent bug — nonexistent attribute — which we drop)."""
        return self.mean_lin(self.encode(image, train=False)).astype(
            jnp.float32
        )
