"""Width-packed convolution — full-lane conv for small channel counts.

TPU tensor tiles are (sublane, 128-lane) with the MINOR (channel) dim
in lanes, so every NHWC activation with C < 128 is physically padded
to 128 lanes: a 16-channel tensor pays 8x HBM traffic, a 3-channel
RGB image pays ~42x. The odometry/mapping conv stacks are exactly
this shape (ref architectures: atdn_vslam/odometry/network.py:63-73,
localization/network.py:29-42), and their train steps measure 7-50x
above the unpadded bandwidth floor (STATUS.md round 5).

The fix is a LAYOUT-level reformulation, the stride-1 generalization
of the one-hot-matmul space-to-depth stem (ops/stem_conv.py): pack p
adjacent width positions into the channel dim,

    x_packed[b, h, wb, wi*C + ci] = x[b, h, wb*p + wi, ci]

(one reshape — (B, H, W, C) -> (B, H, W/p, p*C)), choosing p so that
p*C fills the 128 lanes. A (kh, kw) conv with stride s on the original
tensor is EXACTLY a (kh, D) conv on the packed tensor with a sparse
"placement" kernel

    K[kh, d, r*Cin + ci, wi*Cout + co] = W[kh, kx, ci, co]
        where s*wi + kx - pad_w = d*p + r

(D = 2-4 packed taps; built from the raw kernel by a constant one-hot
einsum, so parameters and gradients are untouched). The packed conv
runs dense on the MXU: it inflates FLOPs by ~p*D/kw but these layers
have tiny logical FLOPs and were bandwidth-bound — on chip the packed
form is MXU-bound far below the padded-layout bandwidth cost.

Same math up to f32 summation order (the placement einsum adds exact
zeros; term order inside the dot differs). Differentiable end to end
(conv + einsum only). Works under vmap/scan/shard_map like any conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def pack_width(x: jax.Array, p: int) -> jax.Array:
    """(B, H, W, C) -> (B, H, W//p, p*C). Requires W % p == 0."""
    b, h, w, c = x.shape
    if w % p:
        raise ValueError(f"width {w} not divisible by pack factor {p}")
    return x.reshape(b, h, w // p, p * c)


def unpack_width(x: jax.Array, p: int) -> jax.Array:
    """(B, H, Wb, p*C) -> (B, H, Wb*p, C)."""
    b, h, wb, pc = x.shape
    if pc % p:
        raise ValueError(f"lane dim {pc} not divisible by pack factor {p}")
    return x.reshape(b, h, wb * p, pc // p)


@functools.lru_cache(maxsize=64)
def _placement(
    p_out: int, p_in: int, kw: int, stride: int, pad_lo: int
) -> tuple[np.ndarray, int, int, int]:
    """One-hot placement tensor M[d, r, wi, kx] in {0, 1} mapping the
    raw kernel's width tap kx to packed-block offset d / in-block
    position r for packed output position wi, plus the packed conv's
    width-block padding (pad_blo, pad_bhi) and block stride.

    Index law: in_w = stride * out_w + kx - pad_lo with out_w =
    ob*p_out + wi, in_w = (bs*ob + d)*p_in + r, where the block
    stride bs = stride*p_out/p_in must be a positive integer (covers
    both same-pack chains, bs = stride, and pack-reducing stems with
    p_in = stride*p_out, bs = 1)."""
    if (stride * p_out) % p_in:
        raise ValueError(
            f"stride*p_out ({stride}*{p_out}) must be a multiple of "
            f"p_in ({p_in})"
        )
    bs = stride * p_out // p_in
    q_min = -pad_lo
    q_max = stride * (p_out - 1) + kw - 1 - pad_lo
    d_min = q_min // p_in  # floor
    d_max = q_max // p_in
    dd = d_max - d_min + 1
    m = np.zeros((dd, p_in, p_out, kw), np.float32)
    for wi in range(p_out):
        for kx in range(kw):
            q = stride * wi + kx - pad_lo
            d, r = q // p_in, q % p_in
            m[d - d_min, r, wi, kx] = 1.0
    return m, -d_min, d_max, bs


def packed_kernel(
    w: jax.Array, p: int, stride: int, pad_lo: int, p_in: int | None = None
) -> tuple[jax.Array, int, int, int]:
    """Raw (kh, kw, Cin, Cout) kernel -> packed
    (kh, D, p_in*Cin, p*Cout) kernel + width-block padding (lo, hi)
    and block stride for the packed conv."""
    kh, kw, ci, co = w.shape
    m, pb_lo, pb_hi, bs = _placement(
        p, p_in or p, kw, stride, pad_lo
    )
    mk = jnp.asarray(m, w.dtype)
    # K[kh, d, (r, ci), (wi, co)] = sum_kx M[d, r, wi, kx] W[kh, kx, ci, co]
    k = jnp.einsum("drwk,hkio->hdriwo", mk, w)
    dd = m.shape[0]
    return k.reshape(kh, dd, (p_in or p) * ci, p * co), pb_lo, pb_hi, bs


def conv_packed(
    xp: jax.Array,
    w: jax.Array,
    bias: jax.Array | None,
    p: int,
    strides: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (1, 1),
    p_in: int | None = None,
) -> jax.Array:
    """Conv on a width-packed tensor, equal to the NHWC conv on the
    unpacked tensor (up to f32 summation order).

    :param xp: packed input (B, H, Wb, p_in*Cin).
    :param w: RAW kernel (kh, kw, Cin, Cout) — the parameter as nn.Conv
        stores it; packing happens here so autodiff reaches it.
    :param p: OUTPUT pack factor.
    :param padding: symmetric (pad_h, pad_w) in ORIGINAL pixels. The
        width padding must satisfy pad_w < p_in (zero packed blocks
        cover it; true for every 1-3 pixel conv pad with p >= 4).
    :param p_in: input pack factor; defaults to ``p``. Must satisfy
        p_in | stride_w * p (same-pack chains use p_in = p; a stride-s
        entry stem uses p_in = s*p so a small-channel input fills the
        lanes too and the block stride becomes 1).
    :return: packed output (B, H', Wb', p*Cout) where the original
        out width W' = (W + 2*pad_w - kw)//s + 1 must divide by p.
    """
    kh, kw, ci, co = w.shape
    ph, pw = padding
    sh, sw = strides
    pi = p_in or p
    if pw >= pi:
        raise ValueError(f"width pad {pw} must be < input pack {pi}")
    wb = xp.shape[2]
    w_out = (wb * pi + 2 * pw - kw) // sw + 1
    if w_out % p:
        raise ValueError(
            f"packed conv output width {w_out} not divisible by p={p}; "
            "choose p with choose_pack over BOTH stage widths"
        )
    k, pb_lo, pb_hi, bs = packed_kernel(w, p, sw, pw, pi)
    out = lax.conv_general_dilated(
        xp,
        k,
        window_strides=(sh, bs),
        padding=((ph, ph), (pb_lo, pb_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # conv floor semantics can overshoot the packed block count when
    # pb_hi over-covers the right edge — slice to the true size
    out = out[:, :, : w_out // p, :]
    if bias is not None:
        out = out + jnp.tile(bias, p).astype(out.dtype)
    return out


def choose_pack(widths: tuple[int, ...], max_channels: int) -> int:
    """Largest p with p * max_channels <= 128 dividing every width in
    ``widths`` (the consecutive stage widths a packed chain must
    support). Returns 1 if no p >= 2 qualifies (packing off)."""
    cap = max(1, 128 // max(1, max_channels))
    for p in range(min(cap, max(widths, default=1)), 1, -1):
        if all(w % p == 0 for w in widths):
            return p
    return 1
