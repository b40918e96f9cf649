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

import jax
import jax.numpy as jnp

from atdn_vslam_tpu.ops.bilinear import bilinear_sample


def build_corr_pyramid(
    fmap1: jax.Array,
    fmap2: jax.Array,
    num_levels: int = 4,
) -> list[jax.Array]:
    """All-pairs correlation + avg-pool pyramid.

    :param fmap1: (B, H1, W1, C) features of frame 1.
    :param fmap2: (B, H2, W2, C) features of frame 2.
    :return: list of (B, H1*W1, Hl, Wl, 1) volumes, level l pooled 2^l x
        (ref: corr.py:22-30,55-63). Always float32 (the reference
        casts fmaps to float before correlation, network.py:88-89).
    """
    b, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    f1 = fmap1.reshape(b, h1 * w1, c).astype(jnp.float32)
    f2 = fmap2.reshape(b, h2 * w2, c).astype(jnp.float32)
    corr = jnp.einsum(
        "bnc,bmc->bnm", f1, f2, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(c, jnp.float32))
    corr = corr.reshape(b, h1 * w1, h2, w2, 1)

    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = jax.lax.reduce_window(
            corr,
            0.0,
            jax.lax.add,
            window_dimensions=(1, 1, 2, 2, 1),
            window_strides=(1, 1, 2, 2, 1),
            padding="VALID",
        ) * 0.25
        pyramid.append(corr)
    return pyramid


def lookup_corr_pyramid(
    pyramid: list[jax.Array],
    coords: jax.Array,
    radius: int = 4,
) -> jax.Array:
    """Sample a (2r+1)^2 window at every level around ``coords``.

    :param pyramid: from :func:`build_corr_pyramid`.
    :param coords: (B, H1, W1, 2) current correspondence in frame-2
        pixel coords (x, y) at level-0 resolution.
    :return: (B, H1, W1, num_levels*(2r+1)^2) float32 correlation
        features (ref: corr.py:32-53).
    """
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    r = radius
    span = 2 * r + 1
    # (span, span, 2) offsets in (x, y) order; torch builds the window
    # as meshgrid(dy, dx) stacked (dy, dx) last (corr.py:40-42) but adds
    # it to (x, y)-ordered coords — reproducing that axis swap would be
    # a bug-for-bug copy; we use consistent (x, y) everywhere. NOTE:
    # the window is symmetric (-r..r in both axes) so the sampled *set*
    # is identical; only the channel ordering differs, which only
    # matters for porting pretrained motion-encoder weights (handled in
    # tools/convert_torch_checkpoint.py).
    dx = jnp.arange(-r, r + 1, dtype=coords.dtype)
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
