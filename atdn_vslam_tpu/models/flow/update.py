"""GMA update block: motion encoder, separable ConvGRU, flow/mask heads.

Re-design of ref: GMA/core/update.py:7-139 (NHWC, compute-dtype knob).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from atdn_vslam_tpu.models.flow.gma import Aggregate


def _conv(features, kernel, dtype, name=None):
    pad = tuple((k // 2, k // 2) for k in kernel)
    return nn.Conv(features, kernel, padding=pad, dtype=dtype, name=name)


class FlowHead(nn.Module):
    """conv3 -> relu -> conv3 -> delta flow (ref: update.py:7-15)."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jax.nn.relu(_conv(self.hidden, (3, 3), self.dtype)(x))
        return _conv(2, (3, 3), self.dtype)(x)


class _ConvParams(nn.Module):
    """Holds an nn.Conv-compatible {kernel, bias} pair (same tree path
    and initializers as nn.Conv) so the owner can slice the kernel —
    needed for the SepConvGRU static-input hoist."""

    kernel_shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.kernel_shape[-1],)
        )
        return kernel, bias


def _apply_conv(x, kernel, dtype):
    kh, kw = kernel.shape[:2]
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU (ref: update.py:36-63).

    Two exact FLOP optimizations over the reference:

      * the z and r gates read the same ``[h, x]`` input, so their
        convs are fused into ONE conv with 2*hidden output channels
        (block-concatenated kernels; the converter concatenates the
        reference's convz/convr weights accordingly) — one fewer pass
        over the 512-channel input per direction and a wider MXU
        output tile;
      * the first ``static_dim`` channels of ``x`` (the context
        features ``inp``) are iteration-INVARIANT, so their conv
        contributions can be hoisted out of the recurrent scan: call
        once with ``compute_static=True`` outside the loop, then pass
        the result as ``static`` each iteration. Saves 2*static_dim/
        (hidden+x) of the GRU conv FLOPs per iteration (~25% at the
        reference widths). conv(concat) == sum of channel-sliced convs
        exactly (linearity); the parameter tree (Conv_0..Conv_3) is
        unchanged.
    """

    hidden_dim: int = 128
    dtype: Any = jnp.float32
    static_dim: int = 128
    x_dim: int = 384  #: channels of x = [inp, motion, motion_global]

    @nn.compact
    def __call__(
        self,
        h: jax.Array,
        x: jax.Array,
        static: tuple[jax.Array, ...] | None = None,
        compute_static: bool = False,
    ):
        hd = self.hidden_dim
        if compute_static:
            assert x.shape[-1] == self.static_dim, x.shape
        else:
            assert x.shape[-1] == self.x_dim, x.shape
        xd = hd + self.x_dim  # conv input channels: [h, x]
        # params: fused-zr + q conv per direction, nn.Conv-compatible
        convs = []
        for i, kernel in enumerate(((1, 5), (1, 5), (5, 1), (5, 1))):
            feats = 2 * hd if i % 2 == 0 else hd
            convs.append(
                _ConvParams(
                    (*kernel, xd, feats), name=f"Conv_{i}"
                )()
            )

        if compute_static:
            sd = self.static_dim
            out = []
            for w, b in convs:
                # inp occupies channels [hd : hd+sd] of the conv input
                out.append(_apply_conv(x, w[:, :, hd:hd + sd], self.dtype))
            return tuple(out)

        for d in range(2):
            wzr, bzr = convs[2 * d]
            wq, bq = convs[2 * d + 1]
            # nn.Conv semantics: bias computes in self.dtype too
            bzr = bzr.astype(self.dtype)
            bq = bq.astype(self.dtype)
            if static is None:
                hx = jnp.concatenate([h, x], axis=-1)
                zr = _apply_conv(hx, wzr, self.dtype) + bzr
            else:
                sdim = self.static_dim
                hx = jnp.concatenate([h, x[..., sdim:]], axis=-1)
                wzr_dyn = jnp.concatenate(
                    [wzr[:, :, :hd], wzr[:, :, hd + sdim:]], axis=2
                )
                zr = (
                    _apply_conv(hx, wzr_dyn, self.dtype)
                    + static[2 * d] + bzr
                )
            z, r = jnp.split(zr, 2, axis=-1)
            z = jax.nn.sigmoid(z)
            r = jax.nn.sigmoid(r)
            if static is None:
                qin = jnp.concatenate([r * h, x], axis=-1)
                q = _apply_conv(qin, wq, self.dtype) + bq
            else:
                sdim = self.static_dim
                qin = jnp.concatenate([r * h, x[..., sdim:]], axis=-1)
                wq_dyn = jnp.concatenate(
                    [wq[:, :, :hd], wq[:, :, hd + sdim:]], axis=2
                )
                q = (
                    _apply_conv(qin, wq_dyn, self.dtype)
                    + static[2 * d + 1] + bq
                )
            q = jnp.tanh(q)
            h = (1.0 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """Fuse correlation features + current flow into 128-ch motion
    features (ref: update.py:66-84)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow: jax.Array, corr: jax.Array) -> jax.Array:
        b, h, w, _ = flow.shape
        if corr.ndim == 3:
            # token-major (B, N, C) input: 1x1 conv before the spatial
            # reshape (params identical — nn.Conv 1x1 on a (B, N, 1, C)
            # view). Kept for callers that need it, but the production
            # network passes spatial corr: the token-major route
            # MEASURED SLOWER end to end (see models/flow/network.py).
            cor = jax.nn.relu(
                _conv(256, (1, 1), self.dtype)(corr[:, :, None])
            )
            cor = cor.reshape(b, h, w, 256)
        else:
            cor = jax.nn.relu(_conv(256, (1, 1), self.dtype)(corr))
        cor = jax.nn.relu(_conv(192, (3, 3), self.dtype)(cor))
        flo = jax.nn.relu(_conv(128, (7, 7), self.dtype)(flow))
        flo = jax.nn.relu(_conv(64, (3, 3), self.dtype)(flo))
        out = jax.nn.relu(
            _conv(126, (3, 3), self.dtype)(
                jnp.concatenate([cor, flo], axis=-1)
            )
        )
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class GMAUpdateBlock(nn.Module):
    """One recurrent flow update (ref: update.py:112-139):
    motion features -> globally aggregated motion -> SepConvGRU ->
    (new hidden, upsample-mask logits, delta flow)."""

    hidden_dim: int = 128
    heads: int = 1
    dtype: Any = jnp.float32
    use_pallas: bool | None = None
    position_only: bool = False
    spatial_mesh: Any = None
    spatial_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        net: jax.Array,
        inp: jax.Array,
        corr: jax.Array,
        flow: jax.Array,
        q: jax.Array | None,
        k: jax.Array | None,
        bias: jax.Array | None = None,
        probs: jax.Array | None = None,
        compute_mask: bool = True,
        mask_only: bool = False,
        gru_static: tuple[jax.Array, ...] | None = None,
        gru_static_only: bool = False,
    ) -> tuple[jax.Array, jax.Array, jax.Array] | jax.Array:
        if gru_static_only:
            # hoist: the SepConvGRU conv contributions of the
            # iteration-invariant context features (inp), computed once
            # outside the recurrent scan (same module instance/name ->
            # shared params, like the mask_only path)
            return SepConvGRU(
                self.hidden_dim, self.dtype, name="SepConvGRU_0"
            )(None, inp, compute_static=True)
        if mask_only:
            # upsample-mask head alone, from a (final) hidden state.
            # The explicit names make the weight sharing with the
            # normal path structural rather than dependent on flax
            # auto-numbering order (advisor round-2 finding).
            mask = _conv(256, (3, 3), self.dtype, name="mask_conv1")(net)
            return 0.25 * _conv(
                64 * 9, (1, 1), self.dtype, name="mask_conv2"
            )(jax.nn.relu(mask))
        motion = BasicMotionEncoder(self.dtype)(flow, corr)
        motion_global = Aggregate(
            self.heads, 128, self.dtype, self.use_pallas,
            self.position_only, spatial_mesh=self.spatial_mesh,
            spatial_axis=self.spatial_axis,
        )(q, k, motion, bias, probs)
        cat = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = SepConvGRU(
            self.hidden_dim, self.dtype, name="SepConvGRU_0"
        )(net, cat, static=gru_static)
        delta_flow = FlowHead(256, self.dtype)(net)
        # ``compute_mask`` is a *static* flag: in test mode only the
        # final iteration's upsample mask is consumed (the reference
        # computes and discards 11 of 12, GMA/core/update.py:135-138),
        # so the scanned steps skip the two mask convs entirely. The
        # params are still created at init (``is_initializing``) so the
        # variable tree is identical in both settings.
        if compute_mask or self.is_initializing():
            mask = _conv(256, (3, 3), self.dtype, name="mask_conv1")(net)
            mask = 0.25 * _conv(
                64 * 9, (1, 1), self.dtype, name="mask_conv2"
            )(jax.nn.relu(mask))
        if not compute_mask:
            mask = jnp.zeros(net.shape[:-1] + (64 * 9,), self.dtype)
        return net, mask, delta_flow
