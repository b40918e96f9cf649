"""Global Motion Aggregation: QK projection + value aggregation.

Re-design of the reference attention (ref: GMA/core/gma.py:34-115).
The reference computes and softmaxes the full (N x N) similarity once
and returns the dense ``attn`` matrix; we return the (q, k) projections
and fuse ``softmax(q k^T) v`` per application through
``ops.attention.attend`` (flash kernel on TPU) — the matrix is never
materialized (see ops/attention.py for the rationale).

Default GMA config is content-only attention with a single head
(ref: utils/gma_parameters.py:8-10 — position_only and
position_and_content are both False; num_heads=1), so the 2-D relative
positional embedding path (gma.py:6-31) is intentionally not
replicated; it is unused by the SLAM system.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from atdn_vslam_tpu.ops.attention import attend


class AttentionQK(nn.Module):
    """1x1-conv q/k projections (ref: gma.py:50,57-59). Returns
    (q, k) shaped (B*heads, H*W, dim_head), with the 1/sqrt(d) scale
    pre-applied to q (gma.py:60)."""

    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap: jax.Array) -> tuple[jax.Array, jax.Array]:
        b, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        qk = nn.Conv(
            2 * inner, (1, 1), use_bias=False, dtype=self.dtype
        )(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = rearrange(q, "b x y (h d) -> (b h) (x y) d", h=self.heads)
        k = rearrange(k, "b x y (h d) -> (b h) (x y) d", h=self.heads)
        return q * (self.dim_head**-0.5), k


class Aggregate(nn.Module):
    """Attention-weighted aggregation of motion features with a learned
    gamma-gated residual (ref: gma.py:79-115):
    out = fmap + gamma * proj(softmax(q k^T) to_v(fmap))."""

    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32
    use_pallas: bool | None = None

    @nn.compact
    def __call__(
        self, q: jax.Array, k: jax.Array, fmap: jax.Array
    ) -> jax.Array:
        b, h, w, dim = fmap.shape
        inner = self.heads * self.dim_head
        v = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype)(fmap)
        v = rearrange(v, "b x y (h d) -> (b h) (x y) d", h=self.heads)
        # q is pre-scaled by AttentionQK -> scale=1 here
        out = attend(q, k, v, scale=1.0, use_pallas=self.use_pallas)
        out = rearrange(
            out, "(b h) (x y) d -> b x y (h d)", h=self.heads, x=h, y=w
        )
        if inner != dim:
            out = nn.Conv(dim, (1, 1), use_bias=False, dtype=self.dtype)(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma.astype(fmap.dtype) * out
