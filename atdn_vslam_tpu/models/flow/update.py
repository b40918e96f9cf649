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


class SepConvGRU(nn.Module):
    """Separable (1x5 then 5x1) ConvGRU (ref: update.py:36-63).

    The z and r gates read the same ``[h, x]`` input, so their convs
    are fused into ONE conv with 2*hidden output channels (exact —
    block-concatenated kernels; the converter concatenates the
    reference's convz/convr weights accordingly). One fewer pass over
    the 512-channel input per direction and a wider (256 vs 128) MXU
    output tile."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        for kernel in ((1, 5), (5, 1)):
            hx = jnp.concatenate([h, x], axis=-1)
            zr = _conv(2 * self.hidden_dim, kernel, self.dtype)(hx)
            z, r = jnp.split(zr, 2, axis=-1)
            z = jax.nn.sigmoid(z)
            r = jax.nn.sigmoid(r)
            q = jnp.tanh(
                _conv(self.hidden_dim, kernel, self.dtype)(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
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
    ) -> tuple[jax.Array, jax.Array, jax.Array] | jax.Array:
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
        net = SepConvGRU(self.hidden_dim, self.dtype)(net, cat)
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
