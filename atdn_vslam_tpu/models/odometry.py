"""ATDNVO — the CLVO conv+LSTM odometry regressor.

TPU-native re-design of the reference odometry network
(ref: atdn_vslam/odometry/network.py:11-162):

  * input is a batch of optical-flow windows (B, T, H, W, 2) — NHWC,
    time-major windows — normalized by the KITTI flow std
    (ref: utils/normalizations.py:8-10);
  * the CNN encoder runs once over the folded (B*T) batch (one big
    MXU-friendly conv pass) instead of the reference's per-timestep
    python loop (ref: train_odometry.py:32-38);
  * the two LSTMCells carry *explicit* state passed in and returned,
    instead of hidden module attributes (ref: network.py:95-104
    stores h/c on ``self``) — jit/scan/vmap safe;
  * rotation/translation MLP heads as in network.py:109-119.

Encoder structure (compressor variant, ref network.py:63-73):
  per-channel 1x1 depthwise conv -> Conv k7 s2 p3 (16ch)
  -> 4x ResidualConv s2 (16ch) -> Conv k3 s3 p0 -> flatten
  -> Linear(512). At 376x1232 input the flattened size is 4*13*16=832.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from atdn_vslam_tpu.models.blocks import (
    ConvBlock,
    LinearBlock,
    ResidualConvBlock,
    _RawConv,
    mish,
)

# Implicit flow normalization std (ref: utils/normalizations.py:10)
FLOW_STD = (58.1837, 17.7647)

# LSTM carry: ((c1, h1), (c2, h2)) — flax LSTMCell carry is (c, h)
Carry = tuple[tuple[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]


class _Encoder(nn.Module):
    """Flow-window feature encoder (ref: odometry/network.py:62-86)."""

    in_channels: int = 2
    compressor: bool = True
    use_dropout: bool = False
    use_layernorm: bool = False
    #: compute dtype of the full-resolution stem (the 1x1 depthwise +
    #: 7x7 s2 conv — the only ops touching the full-res flow; traced at
    #: ~0.8 ms of the 1.66 ms/frame odometry tail in f32). bf16 halves
    #: the stem's HBM traffic and doubles its MXU rate; everything from
    #: the 8x-smaller stem output on stays f32.
    stem_dtype: Any = None
    #: lower the 7x7 s2 stem via one-hot-matmul space-to-depth
    #: (ConvBlock.s2d_planar): same params, same math up to f32
    #: summation order. Measured 25.22 -> 24.64 ms/frame on the full
    #: streaming bench window (the round-1 reshape/transpose s2d
    #: REGRESSED here; the matmul form deletes the input relayout
    #: that caused it). Default on; set False for the reference's
    #: exact direct-conv summation order.
    stem_s2d_planar: bool = True
    #: optional COMPUTE dtype for the WHOLE conv encoder (stem +
    #: residual chain + final conv; params, batchnorm statistics, and
    #: everything from the flattened features on stay f32). The
    #: training-step device trace shows the encoder's 16-channel
    #: activations pay 8x lane padding on every HBM byte (16/128
    #: lanes), so bf16 halves the step's dominant traffic — see
    #: STATUS.md round-5 and tools/profiling/exp_r5_odotrain_trace.py.
    #: None = f32, the reference numerics.
    compute_dtype: Any = None
    #: lower the residual chain via width-packed convolution
    #: (ops/wpack.py): 16-channel activations otherwise pad 16 -> 128
    #: lanes, 8x-amplifying every HBM byte (the dominant train-step
    #: cost, STATUS round 5). Packing is exact up to f32 summation
    #: order; per-stage pack factors adapt to the input width and fall
    #: back to the plain path when no factor divides a stage.
    wpack: bool = False

    @nn.compact
    def __call__(self, flow: jax.Array, train: bool = False) -> jax.Array:
        stem_dt = self.compute_dtype or self.stem_dtype
        dt = self.compute_dtype
        if self.compressor:
            if self.wpack:
                from atdn_vslam_tpu.ops.wpack import (
                    choose_pack,
                    pack_width,
                    unpack_width,
                )

            w0 = flow.shape[-2]
            w1 = (w0 - 1) // 2 + 1  # stem out width (7x7 s2 SAME)
            p0 = 0
            if self.wpack and w0 % 2 == 0:
                p0 = choose_pack((w1, (w1 - 1) // 2 + 1), 16)
                p0 = p0 if p0 >= 2 else 0
            if p0:
                # fully packed entry: the padded NHWC input/stem tensors
                # never materialize. Depthwise 1x1 (groups=C) is an
                # elementwise per-channel scale+bias on the packed form;
                # the 7x7-s2 stem consumes p_in = 2*p0.
                kernel, bias = _RawConv(
                    self.in_channels, (1, 1), True, name="Conv_0"
                )(1)
                xp = pack_width(flow, 2 * p0)
                if stem_dt is not None:
                    xp = xp.astype(stem_dt)
                scale = jnp.tile(kernel[0, 0, 0], 2 * p0).astype(xp.dtype)
                shift = jnp.tile(bias, 2 * p0).astype(xp.dtype)
                x = xp * scale + shift
                x = ConvBlock(
                    16, (7, 7), (2, 2), (3, 3), activation=mish,
                    dtype=stem_dt, act_dtype=dt,
                )(x, train, wpack=p0, wpack_in=2 * p0)
            else:
                # per-channel 1x1 conv (groups=C depthwise,
                # ref network.py:64)
                x = nn.Conv(
                    self.in_channels, (1, 1),
                    feature_group_count=self.in_channels,
                    dtype=stem_dt,
                )(flow)
                x = ConvBlock(
                    16, (7, 7), (2, 2), (3, 3), activation=mish,
                    dtype=stem_dt, act_dtype=dt,
                    s2d_planar=self.stem_s2d_planar,
                )(x, train)
            if self.wpack:
                cur_p = p0
                for _ in range(4):
                    w_in = x.shape[-2] if cur_p == 0 else (
                        x.shape[-2] * cur_p
                    )
                    w_out = (w_in - 1) // 2 + 1  # 3x3 s2 SAME
                    p = choose_pack((w_in, w_out), 16)
                    if p != cur_p:
                        if cur_p > 0:
                            x = unpack_width(x, cur_p)
                        if p >= 2:
                            x = pack_width(x, p)
                        cur_p = p if p >= 2 else 0
                    x = ResidualConvBlock(
                        16, (2, 2), activation=mish, dtype=dt,
                    )(x, train, wpack=cur_p)
                if cur_p > 0:
                    x = unpack_width(x, cur_p)
            else:
                for _ in range(4):
                    x = ResidualConvBlock(
                        16, (2, 2), activation=mish, dtype=dt
                    )(x, train)
            x = ConvBlock(
                16, (3, 3), (3, 3), (0, 0), activation=mish,
                dtype=dt, act_dtype=dt,
            )(x, train)
        else:
            # "non-compressor" encoder variant (ref network.py:75-86)
            for ch in (4, 8, 16, 16, 16, 16):
                x = ResidualConvBlock(
                    ch, (2, 2), activation=mish, dtype=dt
                )(flow, train)
                flow = x
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return LinearBlock(
            512, activation=mish,
            dropout=self.use_dropout, norm=self.use_layernorm,
        )(x, train)


class ATDNVO(nn.Module):
    """Odometry network: flow window -> per-step (euler rot, translation).

    Usage:
      carry = model.init_carry(batch)
      (rots, trs), carry = model.apply(vars, flows, carry, train=...)
    with ``flows`` of shape (B, T, H, W, 2); outputs (B, T, 3) each.
    Single-step usage passes T=1.
    """

    in_channels: int = 2
    compressor: bool = True
    use_dropout: bool = False
    use_layernorm: bool = False
    lstm_size: int = 512
    #: see _Encoder.stem_dtype (accuracy/perf measured in
    #: tools/profiling/exp_bf16_stem.py; STATUS round-4 entry)
    stem_dtype: Any = None
    #: see _Encoder.stem_s2d_planar
    stem_s2d_planar: bool = True
    #: see _Encoder.compute_dtype (bf16 halves the training step's
    #: dominant lane-padded conv traffic; LSTM/heads stay f32)
    compute_dtype: Any = None
    #: see _Encoder.wpack (width-packed residual chain)
    wpack: bool = False

    def setup(self):
        self.encoder = _Encoder(
            self.in_channels, self.compressor,
            self.use_dropout, self.use_layernorm,
            stem_dtype=self.stem_dtype,
            stem_s2d_planar=self.stem_s2d_planar,
            compute_dtype=self.compute_dtype,
            wpack=self.wpack,
        )
        self.lstm1 = nn.LSTMCell(self.lstm_size)
        self.lstm_linear = LinearBlock(
            512, activation=mish,
            dropout=self.use_dropout, norm=self.use_layernorm,
        )
        self.lstm2 = nn.LSTMCell(self.lstm_size)
        self.rotation_head = _Head(self.use_dropout, self.use_layernorm)
        self.translation_head = _Head(self.use_dropout, self.use_layernorm)

    def init_carry(self, batch_size: int, dtype=jnp.float32) -> Carry:
        """Zero LSTM state (ref: network.py:149-153 ``reset_lstm``)."""
        zeros = jnp.zeros((batch_size, self.lstm_size), dtype)
        return ((zeros, zeros), (zeros, zeros))

    def __call__(
        self, flows: jax.Array, carry: Carry, train: bool = False
    ) -> tuple[tuple[jax.Array, jax.Array], Carry]:
        b, t = flows.shape[:2]
        norm = jnp.asarray(FLOW_STD, flows.dtype)
        x = flows / norm
        # fold (B, T) for one batched encoder pass
        feats = self.encoder(x.reshape(b * t, *x.shape[2:]), train)
        feats = feats.reshape(b, t, -1)

        # unrolled recurrence over the (static, small) window length
        c1, c2 = carry
        rots, trs = [], []
        for j in range(t):
            c1, h1 = self.lstm1(c1, feats[:, j])
            mid = self.lstm_linear(h1, train)
            c2, h2 = self.lstm2(c2, mid)
            rots.append(self.rotation_head(h2, train))
            trs.append(self.translation_head(h2, train))
        return (
            (jnp.stack(rots, axis=1), jnp.stack(trs, axis=1)),
            (c1, c2),
        )


class _Head(nn.Module):
    """512 -> 128 -> 64 -> 3 MLP regressor head
    (ref: odometry/network.py:109-119)."""

    use_dropout: bool = False
    use_layernorm: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = LinearBlock(
            128, activation=mish,
            dropout=self.use_dropout, norm=self.use_layernorm,
        )(x, train)
        x = LinearBlock(
            64, activation=mish,
            dropout=self.use_dropout, norm=self.use_layernorm,
        )(x, train)
        return nn.Dense(3, use_bias=False)(x)
