"""Space-to-depth formulation of the stride-2 stem convolution.

The three encoder stems (fnet/cnet 7x7x3->64, ATDNVO 7x7x2->16) run at
full image resolution with 2-3 input channels — the MXU contraction
dim is k*k*C = 147/98, and XLA's direct lowering measures ~0.7% of
peak. Folding the stride into the channels first (space-to-depth by
the stride) turns the same arithmetic into a stride-1 4x4 conv over
4C input channels at half resolution — identical output by
construction (the kernel is re-indexed, zero-filling taps that fall
outside the 7x7 support), with a 4x denser contraction.

Derivation: for stride 2, kernel size 7, SAME padding 3,
``out[i,j] = sum_{u,v,c} x[2i+u-3, 2j+v-3, c] W[u,v,c]``. Writing
``u-3 = 2(ka-2) + p`` with parity ``p`` maps each tap to the
space-to-depth plane ``x_pq[a,b] = x[2a+p, 2b+q]`` at offset
``ka-2 in [-2, 1]`` — a 4x4 stride-1 conv with padding (2, 1) whose
kernel entry ``K[ka, kb, (p,q,c)] = W[2ka+p-1, 2kb+q-1, c]`` (zero
when the index leaves [0, 6]).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def stem_s2d_matmul(
    x: jax.Array, dtype=jnp.bfloat16
) -> jax.Array:
    """Space-to-depth via one-hot selection MATMULS: (B, H, W, C)
    float -> channel-planar (B, 4C, H/2, W/2) in ``dtype``
    (bit-identical to ``stem_s2d(x.astype(dtype), planar=True)``).

    Why matmuls: every XLA reshape/transpose expression of this
    transform materializes an intermediate with a 2- or 3-wide lane
    dimension and relayouts at ~10 GB/s (traced 0.51 ms/frame at KITTI
    resolution; a broadcast-stub ceiling test prices the whole format
    at 0.49 ms/frame). Strided-slice forms fare no better (2.8 ms
    standalone) and Mosaic rejects strided vector slices inside Pallas
    kernels ('expected strides to be confined to [1, 2)'). Expressing
    the stride-2 row/column selection as two one-hot matmuls instead
    (the same trick as the separable-bilinear corr lookup) keeps every
    intermediate lane dimension full-width (W or W/2) and runs on the
    MXU: ~4.5 GFLOP/frame, measured **24.55 -> 24.01 ms/frame**
    (bit-exact) on the full streaming window on a v5e chip.

    Each output element has exactly ONE contributing term through both
    one-hot contractions, so the result is exact in any dtype.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError("stem_s2d requires even H, W")
    # layout-free for the producer: elementwise producers take any
    # layout, so the planar transpose costs nothing in-graph
    xp = jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)  # (B, C, H, W)
    ha = jnp.arange(h)[None, None, :]
    aa = jnp.arange(h // 2)[None, :, None]
    pp = jnp.arange(2)[:, None, None]
    sel_rows = (ha == 2 * aa + pp).astype(dtype)       # (2, H/2, H)
    ww = jnp.arange(w)[None, :, None]
    bb = jnp.arange(w // 2)[None, None, :]
    qq = jnp.arange(2)[:, None, None]
    sel_cols = (ww == 2 * bb + qq).astype(dtype)       # (2, W, W/2)
    left = jnp.einsum("pah,bchw->bpcaw", sel_rows, xp)
    out = jnp.einsum("bpcaw,qwd->bpqcad", left, sel_cols)
    # (p, q, c) channel order, minor dims untouched -> free reshape
    return out.reshape(b, 4 * c, h // 2, w // 2)


def stem_s2d(x: jax.Array, planar: bool = False) -> jax.Array:
    """Space-to-depth by the stem stride: (B, H, W, C) ->
    (B, H/2, W/2, 4C), channel order (p, q, c) p-major — or, with
    ``planar``, the channel-major (B, 4C, H/2, W/2) NCHW form.

    This layout transform is NETWORK-INDEPENDENT: every 7x7 s2 stem
    consuming the same image consumes the same s2d tensor. The device
    trace prices the NHWC form at ~0.5 ms/frame at KITTI resolution
    (tiled transpose with a 3-channel minor dim — far off roofline),
    so the streaming path computes it ONCE per frame and shares it
    between fnet and cnet (each frame is image2 of one pair and
    image1 of the next; models/flow/network.py threads it through the
    frame cache).

    ``planar`` exists because the consuming conv's preferred INPUT
    layout is already channel-planar ([12][188][616] in the window
    HLO). NOTE: this XLA reshape/transpose expression of the planar
    form still relayouts at ~10 GB/s (its own intermediates carry the
    2/3-wide lane dims — trace-verified identical cost to the NHWC
    form); the fast path is :func:`stem_s2d_matmul`, which the
    network uses on TPU. This function is the CPU/reference
    implementation both paths are tested against.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError("stem_s2d requires even H, W")
    if planar:
        xp = jnp.transpose(x, (0, 3, 1, 2))          # (B, C, H, W)
        xp = xp.reshape(b, c, h // 2, 2, w // 2, 2)  # (B,C,a,p,b,q)
        xp = jnp.transpose(xp, (0, 3, 5, 1, 2, 4))   # (B,p,q,C,a,b)
        return xp.reshape(b, 4 * c, h // 2, w // 2)
    xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def conv7x7s2_s2d(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None,
    preformatted: bool = False, planar: bool = False,
) -> jax.Array:
    """Exact equivalent of ``lax.conv(x, kernel, stride 2, SAME)`` for a
    7x7 kernel on even-sized inputs, via space-to-depth.

    :param x: (B, H, W, C) with H, W even — or the precomputed
        :func:`stem_s2d` tensor (B, H/2, W/2, 4C) with ``preformatted``
        ((B, 4C, H/2, W/2) with ``planar``).
    :param kernel: (7, 7, C, O) HWIO.
    :param bias: optional (O,).
    :param planar: the s2d tensor is the channel-major NCHW form (see
        :func:`stem_s2d`); output stays NHWC either way.
    :return: (B, H/2, W/2, O).
    """
    kh, kw, cin, cout = kernel.shape
    if kh != 7 or kw != 7:
        raise ValueError("conv7x7s2_s2d requires a 7x7 kernel")
    xs = x if preformatted else stem_s2d(x, planar=planar)

    # kernel re-index: K[ka, p, kb, q] = W[2ka+p-1, 2kb+q-1] or 0
    idx = np.array([[2 * ka + p - 1 for p in range(2)] for ka in range(4)])
    valid = (idx >= 0) & (idx <= 6)
    kk = kernel[np.clip(idx, 0, 6)]            # (4, 2, 7, C, O)
    kk = kk[:, :, np.clip(idx, 0, 6)]          # (4, 2, 4, 2, C, O)
    mask = (valid[:, :, None, None] & valid[None, None]).astype(kernel.dtype)
    kk = kk * mask[..., None, None]
    kk = kk.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)

    dn = jax.lax.conv_dimension_numbers(
        xs.shape, kk.shape,
        ("NCHW" if planar else "NHWC", "HWIO", "NHWC"),
    )
    # same dtype contract as nn.Conv (XLA's bf16 conv accumulates f32
    # internally); forcing preferred_element_type=f32 breaks reverse-
    # mode AD dtype matching (f32 cotangent vs bf16 operands)
    out = jax.lax.conv_general_dilated(
        xs, kk, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
