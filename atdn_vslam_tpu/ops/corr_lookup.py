"""All-pairs correlation pyramid + windowed bilinear lookup.

TPU-native equivalent of the reference's CorrBlock
(ref: GMA/core/corr.py:15-63): one big MXU matmul builds the all-pairs
volume, 2x average pooling builds the pyramid, and the per-iteration
lookup bilinearly samples a (2r+1)^2 window around each pixel's current
correspondence at every level, concatenated to
num_levels*(2r+1)^2 channels.

The reference routes this through grid_sample on a
(B*H1*W1, 1, H2, W2) reshape (corr.py:25,48); here the lookup is
expressed as clamped gathers (ops.bilinear) over a (B, N1, Hl, Wl)
pyramid — no scatter, static shapes, fuses under jit. The optional
``alt_cuda_corr`` CUDA extension hook in the reference (corr.py:8-12)
is dormant there and needs no analogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atdn_vslam_tpu.ops.bilinear import bilinear_sample


def _corr_dot_kernel(f1_ref, f2_ref, out_ref, *, inv_sqrt_c):
    a = f1_ref[0]  # (bm, c)
    b = f2_ref[0]  # (bk, c)
    acc = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (acc * inv_sqrt_c).astype(out_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def corr_dot_rowmajor(
    f1: jax.Array,
    f2: jax.Array,
    inv_sqrt_c: float,
    out_dtype=jnp.bfloat16,
    bm: int = 512,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """``inv_sqrt_c * f1 @ f2^T`` written ROW-major — a Pallas matmul
    whose only reason to exist is the OUTPUT LAYOUT.

    XLA's own lowering of the all-pairs dot emits the (n, m) volume
    with n in the lanes (``EmitOutputBatchInLanes``), but the
    per-iteration lookup consumes it as the batched-matmul operand
    [n][h][w] (w minor) — so the while-loop carry forces a full
    relayout copy of the level-0 volume (105 MB bf16, traced at
    0.31 ms/frame; operand-order einsum spellings cannot change this,
    XLA canonicalizes them to the same dot). The Pallas grid writes
    (bm, bk) output tiles in plain row-major, eliminating the copy;
    n/m need not divide the block sizes (ragged trailing blocks are
    masked by Mosaic).

    Backward (flow TRAINING differentiates through the volume) is two
    plain XLA einsums — the streaming inference path never runs them.

    VMEM sizing: the default bm=512/bk=1024 blocking holds
    (bm + bk) * c elements of f1/f2 plus a (bm, bk) f32 output block in
    VMEM — sized for c <= ~1k (c=256 at the production shape; ~2 MB in,
    2 MB out). Larger feature dims need smaller blocks. The compiled
    Mosaic path is chip-tested by
    tests/test_ops.py::test_corr_dot_rowmajor_compiled_tpu
    (ATDN_TEST_TPU=1, -m tpu); CI covers interpret mode only.
    """
    return _corr_dot_fwd(
        f1, f2, inv_sqrt_c, out_dtype, bm, bk, interpret
    )[0]


def _corr_dot_fwd(f1, f2, inv_sqrt_c, out_dtype, bm, bk, interpret):
    b, n, c = f1.shape
    m = f2.shape[1]
    grid = (b, pl.cdiv(n, bm), pl.cdiv(m, bk))
    out = pl.pallas_call(
        functools.partial(_corr_dot_kernel, inv_sqrt_c=inv_sqrt_c),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bm, c), lambda b_, i, j: (b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, c), lambda b_, i, j: (b_, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, bk), lambda b_, i, j: (b_, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, m), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * m * c,
            bytes_accessed=2 * b * (n * c + m * c + n * m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1, f2)
    return out, (f1, f2)


def _corr_dot_bwd(inv_sqrt_c, out_dtype, bm, bk, interpret, res, g):
    f1, f2 = res
    gf = g.astype(jnp.float32) * inv_sqrt_c
    df1 = jnp.einsum(
        "bnm,bmc->bnc", gf, f2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(f1.dtype)
    df2 = jnp.einsum(
        "bnm,bnc->bmc", gf, f1.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(f2.dtype)
    return df1, df2


corr_dot_rowmajor.defvjp(_corr_dot_fwd, _corr_dot_bwd)


def build_corr_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
    dtype=jnp.float32,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> list[jax.Array]:
    """All-pairs correlation + avg-pool pyramid.

    :param fmap1: (B, H1, W1, C) features of frame 1.
    :param fmap2: (B, H2, W2, C) features of frame 2.
    :param dtype: storage dtype of the pyramid. The matmul always
        accumulates in float32 (the reference computes the volume in
        float32, network.py:88-89); storing bfloat16 halves the
        per-iteration lookup bandwidth — at KITTI resolution the
        level-0 volume alone is 210 MB f32 and is re-read every
        iteration. Numerically this matches the reference's *effective*
        precision: its motion encoder consumes the volume under
        bfloat16/fp16 autocast anyway (GMA/core/network.py:112).
    :return: list of (B, H1*W1, Hl, Wl, 1) volumes, level l pooled 2^l x
        (ref: corr.py:22-30,55-63).

    TPU formulation: the reference builds the level-0 volume and
    avg-pools IT (corr.py:28-30) — 2x2 window reads over a ~52M-entry
    array. But correlation is linear in fmap2, so pooling commutes with
    the dot product::

        avgpool(f1 . f2^T) == f1 . avgpool(f2)^T    (exactly)

    Each level is therefore ONE (N1 x C) @ (C x Nl) matmul against the
    2^l-pooled *feature map* (a few-MB array) instead of a windowed
    reduction over the volume — measured 6.5x faster on a v5e chip
    (0.22 ms vs 1.44 ms per pair at 47x154).
    """
    b, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    f1 = fmap1.reshape(b, h1 * w1, c)
    inv_sqrt_c = 1.0 / float(np.sqrt(c))
    # Auto resolves to the XLA path: the Pallas row-major dot was built
    # to kill the 105 MB carry-relayout copy after the level-0 dot, but
    # measured NEUTRAL end to end (25.83 vs 25.84 ms/frame on a v5e,
    # bit-exact) — the while-loop carries the volume in an (h, w)-tiled
    # physical layout (w padded 154->256 lanes), so XLA still inserts
    # the same relayout after the kernel's flat-lane (n, m) output.
    # Killing it for real would need the kernel to emit the tiled
    # (b, n, h, w) form directly (per-h-row write grid, ~0.2 ms/frame
    # ceiling) — not built; the kernel stays as a tested opt-in.
    if use_pallas is None:
        use_pallas = False

    pyramid = []
    f2l = fmap2
    hl, wl = h2, w2
    for level in range(num_levels):
        if use_pallas:
            # Pallas row-major dot: the XLA dot emits the volume with
            # n in lanes and the update-loop carry then relayouts all
            # ~105 MB to the lookup's [n][h][w] operand layout
            # (0.31 ms/frame traced; see corr_dot_rowmajor docstring).
            # custom_vjp: positional args only
            corr = corr_dot_rowmajor(
                f1, f2l.reshape(b, hl * wl, c), inv_sqrt_c, dtype,
                512, 1024, interpret,
            ).reshape(b, h1 * w1, hl, wl)
            pyramid.append(corr[..., None])
        else:
            # NOTE (measured): emitting the dot as (b, n, hl, wl)
            # traces as TWO volume relayout copies (0.86 ms/pair) where
            # the (b, n, m)+reshape form shows one (0.52 ms/pair) — yet
            # the full pipeline runs FASTER with this form (34.0 vs
            # 31.7 fps); the downstream layout choices it induces win
            # globally.
            corr = jnp.einsum(
                "bnc,bhwc->bnhw", f1, f2l,
                preferred_element_type=jnp.float32,
            ) * inv_sqrt_c
            pyramid.append(corr[..., None].astype(dtype))
        if level < num_levels - 1:
            h2_, w2_ = hl // 2, wl // 2
            f2l = f2l[:, : h2_ * 2, : w2_ * 2]
            f2l = f2l.reshape(b, h2_, 2, w2_, 2, c).astype(jnp.float32)
            f2l = f2l.mean(axis=(2, 4)).astype(fmap2.dtype)
            hl, wl = h2_, w2_
    return pyramid


def _interp_weights(
    centers: jax.Array, radius: int, size: int
) -> jax.Array:
    """Dense separable bilinear interpolation weights.

    :param centers: (..., ) fractional center coordinates along one
        axis.
    :return: (..., 2r+1, size) weights W with
        W[..., a, p] = max(0, 1 - |centers + (a - r) - p|) — the 1-D
        bilinear hat. Out-of-range positions get zero weight, which
        reproduces grid_sample's zero padding exactly.
    """
    offsets = jnp.arange(-radius, radius + 1, dtype=centers.dtype)
    pts = centers[..., None] + offsets  # (..., span)
    grid = jax.lax.broadcasted_iota(
        centers.dtype, (*pts.shape, size), pts.ndim
    )
    return jnp.maximum(0.0, 1.0 - jnp.abs(pts[..., None] - grid))


# NOTE (measured negative result): building the weights transposed
# (..., size, span) with einsums "bnha,bnhw->bnaw" / "bnaw,bnwc->bnac"
# to dodge the ~0.15 ms/iter layout copies of the (span, size) weights
# REGRESSED the full pipeline 34.0 -> 32.9 fps on a v5e chip — the dot
# prefers span-minor operands and re-tiles the transposed weights more
# expensively than the copies it replaced. Keep the (span, size) form.


def lookup_corr_pyramid(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
    spatial_out: bool = True,
) -> jax.Array:
    """Sample a (2r+1)^2 window at every level around ``coords``.

    TPU-native formulation: instead of gathering 4 taps per sample
    point (XLA gathers are scalar-slow on TPU — measured ~100 ms per
    iteration at KITTI resolution), the separable bilinear window
    sample is expressed as two small batched matmuls with *dense*
    interpolation-weight matrices built from iota comparisons:

        out[i] = Wy[i] @ corr[i] @ Wx[i]^T

    with Wy (span, Hl), Wx (span, Wl) having <=2 nonzeros per row.
    This runs on the MXU (~1.4 GFLOP/level at 47x154) and streams the
    correlation volume exactly once per level. Zero padding for
    out-of-bounds taps falls out of the hat-function weights —
    matching grid_sample(zeros) semantics (ref: corr.py:32-53,
    GMA/core/utils/utils.py:59-73).

    :param pyramid: from :func:`build_corr_pyramid`.
    :param coords: (B, H1, W1, 2) current correspondence in frame-2
        pixel coords (x, y) at level-0 resolution.
    :param spatial_out: return (B, H1, W1, C) when True; with False the
        token-major (B, H1*W1, C) form is returned instead — the
        query-major -> spatial re-tile of the 81-channel level outputs
        costs ~0.13 ms/iteration on a v5e chip, so the caller should
        keep tokens until after the first 1x1 conv widens the channels.
    :return: (B, H1, W1, num_levels*(2r+1)^2) float32 correlation
        features (or (B, H1*W1, ...) with ``spatial_out=False``),
        channel index = dy-major, dx-minor per level.
    """
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    flat = coords.reshape(b, n1, 2).astype(jnp.float32)

    out = []
    for level, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        scale = 1.0 / (2.0**level)
        vol = corr[..., 0]  # (B, N1, Hl, Wl)
        wy = _interp_weights(flat[..., 1] * scale, radius, hl)
        wx = _interp_weights(flat[..., 0] * scale, radius, wl)
        rows = jnp.einsum(
            "bnah,bnhw->bnaw", wy.astype(vol.dtype), vol,
            preferred_element_type=jnp.float32,
        ).astype(vol.dtype)
        window = jnp.einsum(
            "bnaw,bncw->bnac", rows, wx.astype(vol.dtype),
            preferred_element_type=jnp.float32,
        )
        out.append(window.astype(jnp.float32).reshape(b, n1, -1))
    tokens = jnp.concatenate(out, axis=-1)
    if not spatial_out:
        return tokens
    return tokens.reshape(b, h1, w1, -1)


def lookup_corr_pyramid_dynslice(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
) -> jax.Array:
    """Alternative lookup: per-query contiguous row slices + VPU lerp
    for the y axis, hat-weight matmul for x only.

    Replaces the large (span x Hl) @ (Hl x Wl) batched matmul per query
    with a vmapped ``dynamic_slice`` of span+1 contiguous rows and an
    elementwise vertical lerp — trading MXU batch overhead for XLA's
    gather-of-slices lowering. Semantics identical to
    :func:`lookup_corr_pyramid` (zero padding outside bounds).
    """
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    span = 2 * radius + 1
    flat = coords.reshape(b, n1, 2).astype(jnp.float32)

    out = []
    for level, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        scale = 1.0 / (2.0**level)
        vol = corr[..., 0]  # (B, N1, Hl, Wl)
        yc = flat[..., 1] * scale
        xc = flat[..., 0] * scale

        y0 = jnp.floor(yc - radius)
        # Clamp bounds vs the (span+1)-row padding below:
        #   lower: y0i = -(span+1) -> start = 0, the slice reads ONLY
        #     the zero padding — correct for fully-below-bounds
        #     windows (every tap is zero, fy scales zeros);
        #   upper: y0i = hl-1 -> start = hl+span, and the padded
        #     volume has hl + 2(span+1) rows, so start + (span+1)
        #     = hl+2span+2 stays in range with one row to spare —
        #     fully-above-bounds windows likewise read only padding.
        # In-range windows overlapping an edge get exact zeros for the
        # out-of-bounds taps, matching grid_sample zero padding.
        y0i = jnp.clip(y0.astype(jnp.int32), -(span + 1), hl - 1)
        fy = (yc - radius) - y0i.astype(jnp.float32)
        volp = jnp.pad(vol, ((0, 0), (0, 0), (span + 1, span + 1), (0, 0)))
        start = y0i + (span + 1)

        def slice_rows(v, s):
            return jax.lax.dynamic_slice_in_dim(v, s, span + 1, axis=0)

        rows10 = jax.vmap(jax.vmap(slice_rows))(volp, start)
        rows10 = rows10.astype(jnp.float32)
        fy_ = fy[..., None, None]
        rows9 = rows10[:, :, :span] * (1.0 - fy_) + rows10[:, :, 1:] * fy_

        wx = _interp_weights(xc, radius, wl)
        window = jnp.einsum(
            "bnaw,bncw->bnac",
            rows9.astype(vol.dtype),
            wx.astype(vol.dtype),
            preferred_element_type=jnp.float32,
        )
        out.append(window.astype(jnp.float32).reshape(b, n1, -1))
    return jnp.concatenate(out, axis=-1).reshape(b, h1, w1, -1)


def lookup_corr_pyramid_gather(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
) -> jax.Array:
    """Gather-based reference implementation (4 clamped taps per sample
    via ops.bilinear). Semantically identical to
    :func:`lookup_corr_pyramid`; kept for cross-checking. Slow on TPU."""
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    r = radius
    span = 2 * r + 1
    dx = jnp.arange(-r, r + 1, dtype=coords.dtype)
    # (span, span, 2) offsets, channel order (x, y), dy-major flattening
    delta = jnp.stack(
        jnp.meshgrid(dx, dx, indexing="xy"), axis=-1
    ).reshape(span * span, 2)

    out = []
    flat = coords.reshape(b, n1, 1, 2)
    for level, corr in enumerate(pyramid):
        centroid = flat / (2.0**level)
        pts = centroid + delta[None, None]
        sampled = bilinear_sample(corr, pts)  # (B, N1, span*span, 1)
        out.append(sampled[..., 0])
    return jnp.concatenate(out, axis=-1).reshape(b, h1, w1, -1)
