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


def forward_warp_flow(flow: jax.Array) -> jax.Array:
    """Forward-warp a flow field to frame t+1's pixel grid — the warm
    start for the next pair's GMA iterations.

    The reference's ``forward_interpolate`` (GMA/core/utils/
    utils.py:28-56, used by the Sintel warm start, GMA/evaluate.py)
    splats each flow vector to its target location on host and fills
    every output pixel with scipy nearest-neighbor griddata. TPU-native
    equivalent: a rounded scatter-add splat with collision averaging;
    uncovered pixels (disocclusions) get ZERO flow, which is exactly
    the cold-start init for those pixels — a conservative fill instead
    of griddata's nearest-source extrapolation (a host round trip per
    frame is not acceptable in the jitted hot loop).

    :param flow: (B, H, W, 2) flow, channel order (x, y).
    :return: (B, H, W, 2) warped flow, same dtype.
    """
    b, h, w, _ = flow.shape
    f = flow.astype(jnp.float32)
    grid = coords_grid(h, w)  # (H, W, 2) channel order (x, y)
    target = grid[None] + f
    tx = jnp.round(target[..., 0]).astype(jnp.int32)
    ty = jnp.round(target[..., 1]).astype(jnp.int32)
    valid = (tx >= 0) & (tx < w) & (ty >= 0) & (ty < h)
    # clamp for a safe flat index; invalid entries carry zero weight
    idx = (
        jnp.clip(ty, 0, h - 1) * w + jnp.clip(tx, 0, w - 1)
    ).reshape(b, h * w)
    vmask = valid.reshape(b, h * w, 1).astype(jnp.float32)

    def splat_one(idx1, val1, cnt1):
        summed = jnp.zeros((h * w, 2), jnp.float32).at[idx1].add(val1)
        count = jnp.zeros((h * w, 1), jnp.float32).at[idx1].add(cnt1)
        return summed, count

    summed, count = jax.vmap(splat_one)(
        idx, f.reshape(b, h * w, 2) * vmask, vmask
    )
    out = summed / jnp.maximum(count, 1.0)
    return out.reshape(b, h, w, 2).astype(flow.dtype)
