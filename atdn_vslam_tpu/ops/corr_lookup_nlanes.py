"""n-in-lanes correlation lookup for the small pyramid levels.

Round-4 device traces priced the per-iteration lookup stream at its
PADDED physical size: the update scan carries each level (B, N, Hl, Wl)
with (Hl, Wl) tiled, so L1-L3 are 73-93 % lane padding (~89 MB
physical vs ~27 MB logical per frame at KITTI resolution; L0 pads
154->256 lanes). This module stores the small levels TRANSPOSED —
``(B, Hl, Wl, N)`` with the 7,238 queries in the lane dimension
(7238->7296, 0.8 % waste; Wl becomes sublanes) — and samples the
(2r+1)^2 window with a Pallas VPU kernel instead of the batched-matmul
separable lookup (ops/corr_lookup.py).

Why only L1-L3 (the round-4 STATUS sizing, kept honest): with n in
lanes the per-query y-window varies per LANE, so the h-contraction
must run DENSE on the VPU — 9 FMAs per volume element (the MXU cannot
batch per-lane contractions, and Mosaic has no per-lane sublane
gather). At L0 that dense cost cancels the DMA saving; at L1-L3 the
volumes are 16.6 M elements total (vs 52 M at L0) while carrying 73-93
% padding, so the saved bandwidth exceeds the dense FMAs.

Semantics: identical to :func:`lookup_corr_pyramid` (grid_sample zero
padding falls out of the hat weights; ref: GMA/core/corr.py:32-53).
The hat weights and the row intermediate are rounded through the
volume dtype exactly like the XLA separable path, so values match it
to f32 summation order. Inference only (test_mode): training keeps the
XLA path, so no custom VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nlanes_level_kernel(
    vol_ref, yc_ref, xc_ref, out_ref, *, hl, wl, radius, scale, match_dtype
):
    span = 2 * radius + 1
    yc = yc_ref[0] * scale  # (bn,)
    xc = xc_ref[0] * scale
    bn = yc.shape[0]

    def round_like_vol(w32):
        # the XLA path computes with weights cast to the volume dtype;
        # round through it so both paths see identical products
        if match_dtype == jnp.float32:
            return w32
        return w32.astype(match_dtype).astype(jnp.float32)

    # x-tap weights: (wl, bn) per tap, w varying over sublanes
    # (tpu.iota is integer-only — build int32 and convert)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (wl, bn), 0).astype(
        jnp.float32
    )
    wx = [
        round_like_vol(
            jnp.maximum(
                0.0, 1.0 - jnp.abs(xc[None, :] + (c - radius) - iota_w)
            )
        )
        for c in range(span)
    ]

    # dense y-contraction: acc[a] = sum_h vol[h] * wy[a, h] with wy a
    # per-lane hat — 9 VPU FMAs per volume element (see module doc)
    acc = [jnp.zeros((wl, bn), jnp.float32) for _ in range(span)]
    for h in range(hl):
        v = vol_ref[h].astype(jnp.float32)  # (wl, bn)
        base = yc - float(h)
        for a in range(span):
            wya = round_like_vol(
                jnp.maximum(0.0, 1.0 - jnp.abs(base + (a - radius)))
            )
            acc[a] = acc[a] + v * wya[None, :]

    # x-contraction: 81 sublane reductions; the row intermediate is
    # rounded through the volume dtype like the XLA path's
    # rows.astype(vol.dtype)
    vals = []
    for a in range(span):
        rows = round_like_vol(acc[a])
        for c in range(span):
            vals.append(jnp.sum(rows * wx[c], axis=0))  # (bn,)
    # emit TOKEN-major (bn, 81): stack to (81, bn) and transpose in
    # registers — the consumer-side graph then matches the XLA lookup
    # exactly (per-level (B, N, 81) operands into one concatenate), so
    # XLA's layout choices for the update block are undisturbed
    win = jnp.stack(vals, axis=0).astype(out_ref.dtype)  # (81, bn)
    out_ref[...] = win.T


def nlanes_lookup_level(
    vol: jax.Array,
    coords: jax.Array,
    level: int,
    radius: int = 4,
    bn: int = 512,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
) -> jax.Array:
    """Windowed bilinear sample of one n-in-lanes level.

    :param vol: (B, Hl, Wl, N) correlation volume, queries in lanes.
    :param coords: (B, N, 2) level-0 correspondence (x, y).
    :param level: pyramid level (coords are scaled by 2^-level).
    :return: (B, N, span*span) token-major window features, dy-major
        dx-minor channels (the in-kernel register transpose keeps the
        consumer graph identical to the XLA lookup's).
    """
    if interpret is None:
        from atdn_vslam_tpu.utils.platform import is_tpu

        interpret = not is_tpu()
    b, hl, wl, n = vol.shape
    span = 2 * radius + 1
    if hl == 0 or wl == 0:
        # degenerate level (tiny inputs pooled to nothing): every tap
        # is out of bounds -> zero features, matching the XLA path's
        # empty-contraction result
        return jnp.zeros((b, n, span * span), out_dtype)
    xc = coords[..., 0].reshape(b, 1, n).astype(jnp.float32)
    yc = coords[..., 1].reshape(b, 1, n).astype(jnp.float32)
    grid = (b, pl.cdiv(n, bn))
    kernel = functools.partial(
        _nlanes_level_kernel,
        hl=hl,
        wl=wl,
        radius=radius,
        scale=1.0 / (2.0**level),
        match_dtype=vol.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (None, hl, wl, bn), lambda b_, i: (b_, 0, 0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((None, 1, bn), lambda b_, i: (b_, 0, i)),
            pl.BlockSpec((None, 1, bn), lambda b_, i: (b_, 0, i)),
        ],
        out_specs=pl.BlockSpec(
            (None, bn, span * span), lambda b_, i: (b_, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, span * span), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * hl * wl * (span + 2),
            bytes_accessed=b * n * (hl * wl * vol.dtype.itemsize
                                    + span * span * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(vol, yc, xc)


def build_corr_pyramid_nlanes(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    dtype=jnp.bfloat16,
) -> list[jax.Array]:
    """Correlation pyramid with L0 in the lookup-matmul layout
    (B, N, H0, W0, 1) and levels >= 1 transposed to (B, Hl, Wl, N).

    Level 0 keeps the XLA separable-matmul lookup (the dense VPU
    h-contraction cancels the DMA saving there — module doc); the
    small levels get the n-in-lanes layout, which is also the
    ``bnc,bhwc->bhwn`` dot's natural output orientation. Pooling
    commutes with the dot exactly as in :func:`build_corr_pyramid`.
    """
    b, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    f1 = fmap1.reshape(b, h1 * w1, c)
    inv_sqrt_c = 1.0 / float(np.sqrt(c))
    pyramid: list[jax.Array] = []
    f2l = fmap2
    hl, wl = h2, w2
    for level in range(num_levels):
        if level == 0:
            corr = jnp.einsum(
                "bnc,bhwc->bnhw", f1, f2l,
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_c
            pyramid.append(corr[..., None].astype(dtype))
        else:
            corr = jnp.einsum(
                "bnc,bhwc->bhwn", f1, f2l,
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_c
            pyramid.append(corr.astype(dtype))
        if level < num_levels - 1:
            h2_, w2_ = hl // 2, wl // 2
            f2l = f2l[:, : h2_ * 2, : w2_ * 2]
            f2l = f2l.reshape(b, h2_, 2, w2_, 2, c).astype(jnp.float32)
            f2l = f2l.mean(axis=(2, 4)).astype(fmap2.dtype)
            hl, wl = h2_, w2_
    return pyramid


def lookup_corr_pyramid_nlanes(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
    interpret: bool | None = None,
) -> jax.Array:
    """Full-pyramid lookup over a :func:`build_corr_pyramid_nlanes`
    pyramid; drop-in equivalent of :func:`lookup_corr_pyramid`
    (spatial output)."""
    from atdn_vslam_tpu.ops.corr_lookup import lookup_corr_pyramid

    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    flat = coords.reshape(b, n1, 2).astype(jnp.float32)
    outs = [
        lookup_corr_pyramid(
            pyramid[:1], coords, radius, spatial_out=False
        )
    ]
    for level, vol in enumerate(pyramid[1:], start=1):
        outs.append(
            nlanes_lookup_level(
                vol, flat, level, radius, interpret=interpret
            )  # (B, N, 81), token-major like the L0 output
        )
    tokens = jnp.concatenate(outs, axis=-1)
    return tokens.reshape(b, h1, w1, -1)
