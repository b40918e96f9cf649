"""Shared NN building blocks (Flax/linen, NHWC).

TPU-native equivalents of the reference layer library
(ref: atdn_vslam/layers/conv.py:7-197, layers/linear.py:5-41). Semantics
to note, preserved from the reference:

  * block ordering is conv -> activation -> batchnorm
    (ref: conv.py:37 ``bn(act(conv(x)))``), not the conventional
    conv-bn-act;
  * ``ResidualConvBlock``'s skip path is a strided 1x1 conv
    (ref: conv.py:72-76) and the sum is followed by act+bn;
  * ``LinearBlock`` is dense -> act -> [layernorm] -> [dropout 0.2]
    (ref: linear.py:35-41);
  * the default activation everywhere is Mish.

Differences by design: data layout is NHWC (TPU conv layout), and all
state (batchnorm running stats) lives in the ``batch_stats`` collection
instead of module attributes.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn


def mish(x: jax.Array) -> jax.Array:
    """Mish activation: x * tanh(softplus(x)) (ref uses nn.Mish,
    odometry/network.py:49)."""
    return x * jnp.tanh(jax.nn.softplus(x))


Activation = Callable[[jax.Array], jax.Array]


def _batch_norm(train: bool, name: str | None = None) -> nn.BatchNorm:
    # torch BatchNorm2d defaults: momentum 0.1 (-> flax 0.9), eps 1e-5.
    # dtype pinned to f32: with bf16 block chains (MappingVAE
    # compute_dtype) the batch statistics must still accumulate in f32
    # — flax otherwise infers the compute dtype from the input and a
    # bf16 mean over ~7M pixels loses most of its bits. Behavior-
    # identical for f32 inputs.
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=jnp.float32, name=name
    )


class _PlanarStem7x7s2(nn.Module):
    """7x7/s2/SAME conv lowered via one-hot-matmul space-to-depth —
    identical params ("kernel"/"bias" under this module's scope, same
    shapes as nn.Conv) and identical math (ops/stem_conv.py)."""

    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from atdn_vslam_tpu.ops.stem_conv import (
            conv7x7s2_s2d,
            stem_s2d_matmul,
        )

        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        dt = self.dtype or x.dtype
        fmt = stem_s2d_matmul(x, dtype=dt)
        return conv7x7s2_s2d(
            fmt, kernel.astype(dt),
            None if bias is None else bias.astype(dt),
            preformatted=True, planar=True,
        )


class _RawConv(nn.Module):
    """Parameter container matching nn.Conv's param names/shapes
    ("kernel"/"bias") for conv paths that lower the convolution
    themselves (width-packed conv, ops/wpack.py). Checkpoint-compatible
    with the nn.Conv it replaces."""

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _PackedBatchNorm(nn.Module):
    """BatchNorm over a width-packed tensor (B, H, Wb, p*C) with
    params/stats of shape (C,) — numerically equivalent to
    nn.BatchNorm on the unpacked tensor (statistics reduce over
    (B, H, W) = (B, H, Wb, p)), and checkpoint-compatible with it
    (same param names "scale"/"bias", same batch_stats "mean"/"var").
    Statistics accumulate in f32 like _batch_norm."""

    features: int
    p: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c, p = self.features, self.p
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if train:
            xs = x.astype(jnp.float32)
            m_pc = jnp.mean(xs, axis=(0, 1, 2)).reshape(p, c)
            m2_pc = jnp.mean(xs * xs, axis=(0, 1, 2)).reshape(p, c)
            mean = m_pc.mean(0)
            var = m2_pc.mean(0) - mean * mean
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1.0 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1.0 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = scale * jax.lax.rsqrt(var + self.epsilon)
        shift = bias - mean * inv
        inv_p = jnp.tile(inv, p).astype(x.dtype)
        shift_p = jnp.tile(shift, p).astype(x.dtype)
        return x * inv_p + shift_p


class ConvBlock(nn.Module):
    """Conv -> activation -> BatchNorm (ref: layers/conv.py:7-37)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: Any = (0, 0)
    dilation: tuple[int, int] = (1, 1)
    activation: Activation = mish
    use_bias: bool = True
    #: optional conv COMPUTE dtype (e.g. bf16 for the full-res ATDNVO
    #: stem); params stay f32 and the activation+batchnorm run in f32
    #: on the (8x smaller) conv output either way. None = f32 compute;
    #: bit-identical to the original block when ``s2d_planar`` is off —
    #: with ``s2d_planar`` (the shipped ATDNVO default) the result is
    #: exact up to f32 summation order (~1e-5), because the one-hot-
    #: matmul stem contracts the taps in a different order.
    dtype: Any = None
    #: lower a 7x7/s2/p3 conv via the one-hot-matmul space-to-depth
    #: (ops/stem_conv.py stem_s2d_matmul + planar conv). The round-1
    #: reshape/transpose s2d REGRESSED here (34.0 -> 33.5 fps: at 2
    #: input channels the input relayout outweighed the denser
    #: contraction) — the matmul form deletes that relayout. Same
    #: params/math (checkpoint-compatible; exact by construction).
    s2d_planar: bool = False
    #: dtype the activation+batchnorm chain RETURNS. None (default) =
    #: f32, the reference numerics. bf16 keeps whole block CHAINS in
    #: bf16 (MappingVAE compute_dtype: full-res small-channel stacks
    #: are bandwidth-bound, and per-block f32<->bf16 casts would eat
    #: the saving); batch statistics still accumulate in f32
    #: (_batch_norm pins its compute dtype).
    act_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        wpack: int = 0,
        wpack_in: int = 0,
    ) -> jax.Array:
        """``wpack`` (call-time, static): width-pack factor
        (ops/wpack.py). When > 0, the input and output are packed
        (B, H, W/p, p*C) and the conv lowers via the packed placement
        kernel (full MXU lanes instead of C/128). Same params
        (checkpoint-compatible: "Conv_0"/"BatchNorm_0" scopes, same
        shapes), same math up to f32 summation order; requires
        symmetric int padding and unit dilation. ``wpack_in``: input
        pack factor when it differs (entry stems: p_in = stride_w * p
        packs the small-channel input to full lanes); 0 = same as
        ``wpack``."""
        if wpack > 0:
            return self._call_packed(x, train, wpack, wpack_in)
        pad = self.padding
        if isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = tuple((p, p) for p in pad)
        if (
            self.s2d_planar
            and self.kernel_size == (7, 7)
            and self.strides == (2, 2)
            and self.padding == (3, 3)
            and self.dilation == (1, 1)
            and x.shape[-3] % 2 == 0
            and x.shape[-2] % 2 == 0
        ):
            x = _PlanarStem7x7s2(
                self.features, self.use_bias, self.dtype, name="Conv_0"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=pad,
                kernel_dilation=self.dilation,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="Conv_0",
            )(x)
        x = x.astype(self.act_dtype or jnp.float32)
        x = self.activation(x)
        out = _batch_norm(train)(x)
        if self.act_dtype is not None:
            out = out.astype(self.act_dtype)
        return out

    def _call_packed(
        self, xp: jax.Array, train: bool, wpack: int, wpack_in: int
    ) -> jax.Array:
        from atdn_vslam_tpu.ops.wpack import conv_packed

        if self.dilation != (1, 1):
            raise ValueError("wpack requires unit dilation")
        pad = self.padding
        if not (isinstance(pad, tuple) and isinstance(pad[0], int)):
            raise ValueError("wpack requires symmetric int padding")
        p = wpack
        p_in = wpack_in or p
        in_features = xp.shape[-1] // p_in
        kernel, bias = _RawConv(
            self.features, self.kernel_size, self.use_bias, name="Conv_0"
        )(in_features)
        dt = self.dtype
        if dt is not None:
            xp = xp.astype(dt)
            kernel = kernel.astype(dt)
            bias = None if bias is None else bias.astype(dt)
        y = conv_packed(xp, kernel, bias, p, self.strides, pad, p_in=p_in)
        y = y.astype(self.act_dtype or jnp.float32)
        y = self.activation(y)
        out = _PackedBatchNorm(self.features, p, name="BatchNorm_0")(
            y, train
        )
        if self.act_dtype is not None:
            out = out.astype(self.act_dtype)
        return out


class ResidualConvBlock(nn.Module):
    """Two ConvBlocks + strided 1x1 skip, then act+bn on the sum
    (ref: layers/conv.py:40-90).

    ``dtype``: optional COMPUTE dtype for the whole block (convs,
    activations, and the inter-block chain; batchnorm statistics stay
    f32). None = f32, reference numerics."""

    features: int
    strides: tuple[int, int] = (1, 1)
    activation: Activation = mish
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, wpack: int = 0
    ) -> jax.Array:
        """``wpack`` (call-time, static) — see ConvBlock.wpack. Input
        AND output are packed with this p (stride-2 stages keep p; the
        caller ensures p divides both stage widths, choose_pack)."""
        p = wpack
        in_features = x.shape[-1] // p if p > 0 else x.shape[-1]
        y = ConvBlock(
            in_features, (3, 3), (1, 1), (1, 1),
            activation=self.activation, dtype=self.dtype,
            act_dtype=self.dtype,
        )(x, train, wpack=p)
        y = ConvBlock(
            self.features, (3, 3), self.strides, (1, 1),
            activation=self.activation, dtype=self.dtype,
            act_dtype=self.dtype,
        )(y, train, wpack=p)
        if p > 0:
            from atdn_vslam_tpu.ops.wpack import conv_packed

            kernel, bias = _RawConv(
                self.features, (1, 1), True, name="Conv_0"
            )(in_features)
            dt = self.dtype
            xs = x if dt is None else x.astype(dt)
            if dt is not None:
                kernel = kernel.astype(dt)
                bias = bias.astype(dt)
            skip = conv_packed(xs, kernel, bias, p, self.strides, (0, 0))
        else:
            skip = nn.Conv(
                self.features, (1, 1), strides=self.strides,
                padding="VALID", dtype=self.dtype,
            )(x)
        out = self.activation(y + skip)
        if p > 0:
            if self.dtype is None:
                out = out.astype(jnp.float32)
            out = _PackedBatchNorm(self.features, p, name="BatchNorm_0")(
                out, train
            )
        else:
            out = _batch_norm(train)(out)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out


class TransposedConvBlock(nn.Module):
    """Conv(k3,p1) -> ConvTranspose -> act -> bn, plus a resize+1x1-conv
    skip, then act+bn on the sum (ref: layers/conv.py:93-139).

    ConvTranspose uses torch semantics: out = (in-1)*stride - 2*pad + k,
    achieved with lax-style padding (k-1-pad) on the dilated input.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (2, 2)
    padding: tuple[int, int] = (1, 1)
    activation: Activation = mish
    #: optional COMPUTE dtype for the whole block (see
    #: ResidualConvBlock); None = f32, reference numerics.
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, wpack: int = 0
    ) -> jax.Array:
        """``wpack`` (call-time, static): width-pack factor for the
        INTERNAL 3x3 ConvBlock only (ops/wpack.py) — the transposed
        conv's 2w-1 output widths rarely admit a pack factor, but the
        internal conv runs at the (packable) input width. The caller
        passes a p dividing x's width; pack/unpack happen here."""
        if wpack >= 2:
            from atdn_vslam_tpu.ops.wpack import pack_width, unpack_width

            y = ConvBlock(
                self.features, (3, 3), (1, 1), (1, 1),
                activation=self.activation, dtype=self.dtype,
                act_dtype=self.dtype,
            )(pack_width(x, wpack), train, wpack=wpack)
            y = unpack_width(y, wpack)
        else:
            y = ConvBlock(
                self.features, (3, 3), (1, 1), (1, 1),
                activation=self.activation, dtype=self.dtype,
                act_dtype=self.dtype,
            )(x, train)
        tp_pad = tuple(
            (k - 1 - p, k - 1 - p)
            for k, p in zip(self.kernel_size, self.padding)
        )
        y = nn.ConvTranspose(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=tp_pad,
            dtype=self.dtype,
        )(y)
        y = self.activation(y.astype(self.dtype or jnp.float32))
        y = _batch_norm(train)(y)
        if self.dtype is not None:
            y = y.astype(self.dtype)

        skip = jax.image.resize(
            x, (*x.shape[:-3], *y.shape[-3:-1], x.shape[-1]), method="bilinear"
        )
        skip = nn.Conv(
            self.features, (1, 1), padding="VALID", dtype=self.dtype
        )(skip)
        out = self.activation(y + skip)
        out = _batch_norm(train)(out)
        if self.dtype is not None:
            out = out.astype(self.dtype)
        return out


class DUCBlock(nn.Module):
    """Dense-upscale conv: ConvBlock(4*features) + 2x pixel shuffle
    (ref: layers/conv.py:142-174)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    activation: Activation = mish

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBlock(
            4 * self.features, self.kernel_size, self.strides, self.padding,
            activation=self.activation,
        )(x, train)
        # torch PixelShuffle channel order: c_in = c*r*r + p1*r + p2
        return rearrange(x, "... h w (c p1 p2) -> ... (h p1) (w p2) c", p1=2, p2=2)


class ConnectedDUCBlock(nn.Module):
    """Concat(direct, skip) -> ConvBlock -> DUC, for U-Net structures
    (ref: layers/conv.py:177-197)."""

    features: int

    @nn.compact
    def __call__(
        self, direct: jax.Array, skip: jax.Array, train: bool = False
    ) -> jax.Array:
        in_features = direct.shape[-1]
        x = jnp.concatenate([direct, skip], axis=-1)
        x = ConvBlock(in_features, (3, 3), padding=(1, 1))(x, train)
        return DUCBlock(self.features)(x, train)


class LinearBlock(nn.Module):
    """Dense -> activation -> [LayerNorm] -> [Dropout 0.2]
    (ref: layers/linear.py:5-41)."""

    features: int
    activation: Activation | None = mish
    use_bias: bool = True
    norm: bool = False
    dropout: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Dense(self.features, use_bias=self.use_bias)(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.norm:
            x = nn.LayerNorm()(x)
        if self.dropout:
            x = nn.Dropout(rate=0.2, deterministic=not train)(x)
        return x
