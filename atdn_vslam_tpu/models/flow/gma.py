"""Global Motion Aggregation: QK projection + value aggregation.

Re-design of the reference attention (ref: GMA/core/gma.py:34-115).
The reference computes and softmaxes the full (N x N) similarity once
and returns the dense ``attn`` matrix; we return the (q, k) projections
and fuse ``softmax(q k^T) v`` per application through
``ops.attention.attend`` (flash kernel on TPU) — the matrix is never
materialized (see ops/attention.py for the rationale).

Default GMA config is content-only attention with a single head
(ref: utils/gma_parameters.py:8-10 — position_only and
position_and_content are both False; num_heads=1). The 2-D relative
positional embedding path (gma.py:6-31) is also implemented
(``RelPosEmb``); enabling it forces the XLA attention path since the
flash kernel carries no bias.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from atdn_vslam_tpu.ops.attention import attend, apply_attention_probs


class RelPosEmb(nn.Module):
    """2-D decomposed relative positional scores (ref: gma.py:6-31):
    learned per-axis embeddings indexed by coordinate deltas, scored
    against q — returns the (B*heads, N, N) additive attention bias."""

    max_pos_size: int = 160
    dim_head: int = 128

    @nn.compact
    def __call__(self, q: jax.Array, h: int, w: int) -> jax.Array:
        # q: (B*heads, N, d) pre-scaled; treat as (BH, h, w, d)
        rel_height = self.param(
            "rel_height",
            nn.initializers.normal(1.0),
            (2 * self.max_pos_size - 1, self.dim_head),
        )
        rel_width = self.param(
            "rel_width",
            nn.initializers.normal(1.0),
            (2 * self.max_pos_size - 1, self.dim_head),
        )
        deltas = (
            jnp.arange(self.max_pos_size)[None, :]
            - jnp.arange(self.max_pos_size)[:, None]
            + self.max_pos_size
            - 1
        )
        height_emb = rel_height[deltas[:h, :h].reshape(-1)].reshape(
            h, h, self.dim_head
        )
        width_emb = rel_width[deltas[:w, :w].reshape(-1)].reshape(
            w, w, self.dim_head
        )
        qg = q.reshape(-1, h, w, q.shape[-1]).astype(jnp.float32)
        # score[x, y, u, v] = <q[x, y], height_emb[x, u]> + <q[x, y], width_emb[y, v]>
        hs = jnp.einsum("bxyd,xud->bxyu", qg, height_emb.astype(jnp.float32))
        ws = jnp.einsum("bxyd,yvd->bxyv", qg, width_emb.astype(jnp.float32))
        bias = hs[:, :, :, :, None] + ws[:, :, :, None, :]
        return bias.reshape(q.shape[0], h * w, h * w)


class AttentionQK(nn.Module):
    """1x1-conv q/k projections (ref: gma.py:50,57-59). Returns
    (q, k, bias) with q/k shaped (B*heads, H*W, dim_head), the
    1/sqrt(d) scale pre-applied to q (gma.py:60), and ``bias`` the
    optional relative-positional score matrix (None for the default
    content-only config; ref gma.py:62-71)."""

    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32
    position_only: bool = False
    position_and_content: bool = False
    max_pos_size: int = 160

    @nn.compact
    def __call__(
        self, fmap: jax.Array
    ) -> tuple[jax.Array, jax.Array, jax.Array | None]:
        b, h, w, _ = fmap.shape
        inner = self.heads * self.dim_head
        qk = nn.Conv(
            2 * inner, (1, 1), use_bias=False, dtype=self.dtype
        )(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        q = rearrange(q, "b x y (h d) -> (b h) (x y) d", h=self.heads)
        k = rearrange(k, "b x y (h d) -> (b h) (x y) d", h=self.heads)
        q = q * (self.dim_head**-0.5)
        bias = None
        if self.position_only or self.position_and_content:
            from atdn_vslam_tpu.ops.attention import _MATERIALIZE_MAX_TOKENS

            if h * w > _MATERIALIZE_MAX_TOKENS:
                # RelPosEmb materializes a (B*heads, N, N) bias — at
                # KITTI resolution (7238 tokens) that is 210 MB, the
                # exact allocation the flash path exists to avoid. The
                # positional modes are off in the reference config
                # (utils/gma_parameters.py:9-10); guard until a
                # decomposed flash-bias kernel exists.
                raise ValueError(
                    f"positional attention at {h * w} tokens would "
                    f"materialize a dense (N, N) bias (limit "
                    f"{_MATERIALIZE_MAX_TOKENS}); use content-only "
                    "attention at this resolution"
                )
            bias = RelPosEmb(self.max_pos_size, self.dim_head)(q, h, w)
        return q, k, bias


class Aggregate(nn.Module):
    """Attention-weighted aggregation of motion features with a learned
    gamma-gated residual (ref: gma.py:79-115):
    out = fmap + gamma * proj(softmax(q k^T) to_v(fmap))."""

    heads: int = 1
    dim_head: int = 128
    dtype: Any = jnp.float32
    use_pallas: bool | None = None
    position_only: bool = False
    #: optional (mesh, axis name) for GSPMD composition: the flash
    #: attention kernel runs query-row-sharded via shard_map
    #: (ops/attention.py sharded_flash_attend)
    spatial_mesh: Any = None
    spatial_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        q: jax.Array | None,
        k: jax.Array | None,
        fmap: jax.Array,
        bias: jax.Array | None = None,
        probs: jax.Array | None = None,
    ) -> jax.Array:
        b, h, w, dim = fmap.shape
        inner = self.heads * self.dim_head
        v = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype)(fmap)
        v = rearrange(v, "b x y (h d) -> (b h) (x y) d", h=self.heads)
        if probs is not None:
            # probabilities materialized once outside the update scan
            # (iteration-invariant; ops/attention.py rationale); may be
            # spatially pre-shaped (BH, x, y, m) for loop layout
            # stability, with exact-zero key-dim padding (keep_padded).
            # The P@V read stays an XLA einsum — it auto-partitions
            # under GSPMD (no shard_map needed) and measured FASTER
            # than the Pallas streaming kernel (apply_attention_probs
            # docstring); the probs MATERIALIZATION is where the Pallas
            # kernel wins.
            out = apply_attention_probs(probs, v)
            if out.ndim == 4:
                if out.shape[1] != h:
                    # keep_padded probs also carry padded ROWS (write-
                    # block multiple); the padded rows hold finite
                    # garbage — slice the small output, never the
                    # ~105 MB probs matrix
                    out = out[:, :h]
                out = out.reshape(out.shape[0], -1, out.shape[-1])
        else:
            # q is pre-scaled by AttentionQK -> scale=1 here
            out = attend(
                q, k, v, scale=1.0, use_pallas=self.use_pallas,
                bias=bias, position_only=self.position_only,
                mesh=self.spatial_mesh, axis=self.spatial_axis,
            )
        out = rearrange(
            out, "(b h) (x y) d -> b x y (h d)", h=self.heads, x=h, y=w
        )
        if inner != dim:
            out = nn.Conv(dim, (1, 1), use_bias=False, dtype=self.dtype)(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma.astype(fmap.dtype) * out
