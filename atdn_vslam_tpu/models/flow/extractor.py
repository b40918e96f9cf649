"""Feature/context encoders for the flow network.

Re-design of the reference ``BasicEncoder`` / ``ResidualBlock``
(ref: GMA/core/extractor.py:6-189), NHWC with a compute-dtype knob for
bfloat16 mixed precision (the reference wraps these in torch autocast,
GMA/core/network.py:85,93).

Structure (extractor.py:116-189): conv7 s2 (64) -> norm -> relu ->
2x ResidualBlock(64) -> 2x ResidualBlock(96, first s2) ->
2x ResidualBlock(128, first s2) -> 1x1 conv to output_dim. The feature
encoder uses instance norm, the context encoder batch norm
(network.py:40-41).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from atdn_vslam_tpu.ops.stem_conv import conv7x7s2_s2d


class StemConv7x7s2(nn.Module):
    """7x7 stride-2 stem conv, lowered via space-to-depth on even
    inputs (ops/stem_conv.py — same params/math as ``nn.Conv``, ~4x
    denser MXU contraction at tiny input-channel counts)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, preformatted: bool = False,
        planar: bool = False,
    ) -> jax.Array:
        """``preformatted``: ``x`` is the precomputed
        :func:`~atdn_vslam_tpu.ops.stem_conv.stem_s2d` tensor
        (B, H/2, W/2, 4C) — or its channel-major (B, 4C, H/2, W/2)
        form with ``planar`` — the shared per-frame stem format; the
        parameter shape is identical either way (same checkpoint)."""
        if preformatted:
            cin = (x.shape[1] if planar else x.shape[-1]) // 4
        else:
            cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        xb = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if preformatted:
            return conv7x7s2_s2d(
                xb, k, bias.astype(self.dtype), preformatted=True,
                planar=planar,
            )
        if x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0:
            return conv7x7s2_s2d(xb, k, bias.astype(self.dtype))
        dn = jax.lax.conv_dimension_numbers(
            xb.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        out = jax.lax.conv_general_dilated(
            xb, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
        )
        return out + bias.astype(out.dtype)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Non-affine instance norm over spatial dims (torch
    InstanceNorm2d defaults: affine=False, no running stats).

    One-pass moments: ``jnp.var`` re-reads x after the mean reduction
    (a serial dependency XLA cannot fuse — the five full-res stats
    fusions in fnet trace at ~0.6 ms/frame at KITTI resolution);
    sum and sum-of-squares reduce in a single fused pass over x with
    float32 accumulators.

    E[x^2] - E[x]^2 cancellation (advisor round-4 note): a per-channel
    shift before the sum-of-squares (subtracting the [0, 0] sample)
    was BUILT AND MEASURED in round 5 — it costs 0.52 ms/frame on the
    full streaming window (24.34 -> 24.86 ms, same-process A/B on a
    v5e: the shift couples a second operand into all five stats
    fusions), so the unshifted form stays. The cancellation is bounded
    in distribution: these are conv pre-activations whose |mean|/std
    stays O(1) (losing ~1 of 24 mantissa bits); catastrophic loss
    needs |mean|/std ~ 2^12, far outside anything a trained encoder
    produces. f32 accumulators + GMA torch parity ~3e-5 at full res
    (tests/test_gma_parity.py) cover the shipped regime."""
    x32 = x.astype(jnp.float32)
    n = x.shape[-3] * x.shape[-2]
    s = jnp.sum(x32, axis=(-3, -2), keepdims=True)
    ss = jnp.sum(x32 * x32, axis=(-3, -2), keepdims=True)
    mean = s / n
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class _Norm(nn.Module):
    kind: str  # "instance" | "batch" | "group" | "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.kind == "instance":
            return instance_norm(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.kind == "group":
            return nn.GroupNorm(
                num_groups=min(8, x.shape[-1] // 8), dtype=self.dtype
            )(x)
        return x


class ResidualBlock(nn.Module):
    """conv3-norm-relu x2 + optional strided 1x1 downsample
    (ref: extractor.py:6-55)."""

    features: int
    norm: str = "instance"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        s = (self.stride, self.stride)
        y = nn.Conv(
            self.features, (3, 3), strides=s,
            padding=((1, 1), (1, 1)), dtype=self.dtype,
        )(x)
        y = jax.nn.relu(_Norm(self.norm, self.dtype)(y, train))
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(y)
        y = jax.nn.relu(_Norm(self.norm, self.dtype)(y, train))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(
                self.features, (1, 1), strides=s, dtype=self.dtype
            )(x)
            x = _Norm(self.norm, self.dtype)(x, train)
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """1/8-resolution feature encoder (ref: extractor.py:116-189)."""

    output_dim: int = 256
    norm: str = "instance"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False,
        preformatted: bool = False, planar: bool = False,
    ) -> jax.Array:
        """``preformatted``: ``x`` is the shared per-frame stem-s2d
        tensor (see StemConv7x7s2) instead of the raw image;
        ``planar`` marks its channel-major NCHW form."""
        x = x.astype(self.dtype)
        x = StemConv7x7s2(64, dtype=self.dtype, name="Conv_0")(
            x, preformatted=preformatted, planar=planar
        )
        x = jax.nn.relu(_Norm(self.norm, self.dtype)(x, train))
        for features, stride in ((64, 1), (96, 2), (128, 2)):
            x = ResidualBlock(
                features, self.norm, stride, dtype=self.dtype
            )(x, train)
            x = ResidualBlock(features, self.norm, 1, dtype=self.dtype)(
                x, train
            )
        return nn.Conv(
            self.output_dim, (1, 1), dtype=self.dtype, name="Conv_1"
        )(x)
