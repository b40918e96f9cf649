"""Bilinear sampling with zero padding (gather-based, TPU-friendly).

Equivalent of the reference's ``bilinear_sampler`` — a wrapper over
``F.grid_sample(align_corners=True)`` with zero padding for
out-of-bounds taps (ref: GMA/core/utils/utils.py:59-73). Instead of a
normalized-grid API, this takes *pixel* coordinates directly and lowers
to four clamped gathers + masked lerp weights, which XLA fuses well on
TPU (dynamic gathers stay in-register; no scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(H, W, 2) pixel-coordinate grid, channel order (x, y) — matching
    the reference's flow convention (ref: GMA/core/utils/utils.py:76-79)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return jnp.stack([xs, ys], axis=-1).astype(dtype)


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``img`` at fractional pixel coordinates with zero padding.

    :param img: (..., H, W, C) source.
    :param coords: (..., P, 2) pixel coords, channel order (x, y); the
        leading axes of ``img``/``coords`` must match.
    :return: (..., P, C) sampled values; taps outside the image read 0.
    """
    h, w, c = img.shape[-3:]
    lead = img.shape[:-3]
    img2 = img.reshape(-1, h * w, c)
    pts = coords.reshape(img2.shape[0], -1, 2)

    x, y = pts[..., 0], pts[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def tap(yi, xi, weight):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = yc * w + xc
        vals = jnp.take_along_axis(img2, flat[..., None], axis=1)
        return vals * (weight * inb.astype(img.dtype))[..., None]

    out = (
        tap(y0, x0, (1 - fy) * (1 - fx))
        + tap(y0, x0 + 1, (1 - fy) * fx)
        + tap(y0 + 1, x0, fy * (1 - fx))
        + tap(y0 + 1, x0 + 1, fy * fx)
    )
    return out.reshape(*lead, coords.shape[-2], c)
