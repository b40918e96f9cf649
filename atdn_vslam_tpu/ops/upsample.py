"""Flow upsampling: learned convex combination and bilinear fallback.

Equivalent of the reference's ``upsample_flow`` (ref: GMA/core/
network.py:59-70) and ``upflow8`` (GMA/core/utils/utils.py:111-113).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange


def _extract_3x3_patches(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W, 9, C) of 3x3 neighborhoods (zero pad),
    neighbor index = (dy+1)*3 + (dx+1) — torch unfold ordering."""
    b, h, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        padded[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)
    ]
    return jnp.stack(patches, axis=3)


def convex_upsample(
    flow: jax.Array, mask: jax.Array, factor: int = 8
) -> jax.Array:
    """Upsample (B, H, W, 2) flow to (B, 8H, 8W, 2) using a learned
    9-way convex combination per output pixel (ref: network.py:59-70).

    :param mask: (B, H, W, 9*factor*factor) logits, channel layout
        (9, factor, factor) outermost-first — matching the torch
        ``view(N, 1, 9, 8, 8, H, W)``.
    """
    b, h, w, _ = flow.shape
    # keep factor*factor merged as the minor dim: splitting it to
    # (..., 9, f, f) makes XLA re-tile the mask around the softmax
    # (traced ~0.4 ms/pair at KITTI resolution with 8x8 minor dims)
    mask = mask.reshape(b, h, w, 9, factor * factor)
    mask = jax.nn.softmax(mask, axis=3)
    patches = _extract_3x3_patches(flow * factor)  # (B, H, W, 9, 2)
    up = jnp.einsum("bhwkm,bhwkc->bhwmc", mask, patches)
    up = up.reshape(b, h, w, factor, factor, 2)
    return rearrange(up, "b h w p q c -> b (h p) (w q) c")


def upsample_flow_bilinear(flow: jax.Array, factor: int = 8) -> jax.Array:
    """factor * bilinear-resize (ref: utils.py:111-113). Uses
    align_corners=True semantics? — torch's upflow8 uses
    align_corners=True; jax.image.resize implements the
    half-pixel convention. The learned convex path is the production
    one (up_mask is always produced, network.py:119-122); this is the
    parity fallback for ``up_mask is None``."""
    b, h, w, c = flow.shape
    out = jax.image.resize(
        flow, (b, h * factor, w * factor, c), method="bilinear"
    )
    return out * factor
