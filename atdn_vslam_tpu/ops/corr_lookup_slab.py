"""Pallas slab lookup: windowed bilinear corr sampling via per-query
dynamic VMEM row slices.

Third-generation TPU design for the RAFT correlation lookup
(ref: GMA/core/corr.py:32-53), informed by measurement:

  * XLA gathers: ~100 ms/iteration at KITTI res — dead on arrival.
  * batched tiny matmuls with dense hat weights (ops/corr_lookup.py):
    ~0.9 ms/iteration true cost — every query pays full padded
    128x128 MXU tile passes for a 9x47 @ 47x154 product.
  * per-query roll alignment (ops/corr_lookup_pallas.py): VPU-bound
    on full-width dynamic rotates.

This kernel instead:

  1. streams each query block's volume slice (Q, Hl, Wl) through VMEM
     with the ordinary auto-pipelined grid (large contiguous DMAs,
     volume read exactly once per iteration — the bandwidth floor);
  2. slices a 24-row slab per query with a *dynamic-start sublane
     slice* — Mosaic requires the start to be provably 8-aligned, so
     the start is floor(y0/8)*8 (24 aligned rows always cover the
     10-row bilinear window) and the rows the alignment dragged in are
     zeroed by the hat weights;
  3. applies the separable bilinear hat weights on the VPU; volumes
     are row-padded with zeros at build time so out-of-range taps
     contribute nothing (grid_sample zero-padding semantics, identical
     to the einsum path).

Gradient note: inference-only (pallas_call has no AD rule here); the
training path keeps the differentiable einsum lookup.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 8       # provable sublane alignment for dynamic slice starts
_SLAB = 24       # aligned rows loaded per query (covers window + align)


def _padded_rows(hl: int, span: int) -> int:
    """Rows each level is zero-padded to so any aligned 24-row slab is
    in bounds (or the whole level fits statically)."""
    rows = span + 1
    if hl <= _SLAB:
        return hl  # whole level read statically, no slicing
    max_aligned = ((hl - rows) // _ALIGN) * _ALIGN
    return max(hl, max_aligned + _SLAB)


def pad_pyramid_for_slab(pyramid, radius: int = 4):
    """Zero-pad each level's row dim for the slab kernel. Do this ONCE
    at pyramid build time — padding inside the update loop would copy
    the full volume every iteration.

    :return: (padded_pyramid, orig_rows) — pass ``orig_rows`` (a static
        tuple of the unpadded per-level row counts) to
        :func:`lookup_corr_pyramid_slab`.
    """
    span = 2 * radius + 1
    out, orig = [], []
    for corr in pyramid:
        hl = corr.shape[2]
        hp = _padded_rows(hl, span)
        orig.append(hl)
        out.append(
            jnp.pad(corr, ((0, 0), (0, 0), (0, hp - hl), (0, 0), (0, 0)))
            if hp != hl
            else corr
        )
    return tuple(out), tuple(orig)


def _level_kernel(coords_ref, vol_ref, hl, wl, radius, level):
    """One pyramid level for a (Q, hl_pad, wl) VMEM block ->
    (Q, span^2). ``hl`` is the ORIGINAL (unpadded) row count."""
    span = 2 * radius + 1
    rows = span + 1
    q_blk = vol_ref.shape[1]
    scale = 1.0 / (2.0 ** level)
    coords = coords_ref[0, 0].astype(jnp.float32)  # (Q, 2)
    yc = coords[:, 1] * scale  # (Q,)
    xc = coords[:, 0] * scale

    if hl <= _SLAB:
        rows_v = vol_ref[0].astype(jnp.float32)  # (Q, hl_pad, wl)
        n_rows = vol_ref.shape[2]
        y0f = jnp.zeros_like(yc)
    else:
        # aligned dynamic sublane slice per query; the hat weights zero
        # out the rows the alignment dragged in
        slabs = []
        for q in range(q_blk):
            ycq = coords_ref[0, 0, q, 1] * scale
            y0q = jnp.clip(
                jnp.floor(ycq).astype(jnp.int32) - radius, 0, hl - rows
            )
            y0a = pl.multiple_of((y0q // _ALIGN) * _ALIGN, _ALIGN)
            slabs.append(vol_ref[0, q, pl.ds(y0a, _SLAB), :])
        rows_v = jnp.stack(slabs).astype(jnp.float32)  # (Q, 24, wl)
        n_rows = _SLAB
        y0v = jnp.clip(
            jnp.floor(yc) - float(radius), 0.0, float(hl - rows)
        )
        y0f = jnp.floor(y0v / _ALIGN) * _ALIGN  # (Q,) aligned starts

    # y-contraction: acc[q, a, :] = sum_j hat(t_a - (y0f+j)) rows[q, j, :]
    # (rows beyond the original hl are zero by construction)
    t_a = yc[:, None] - float(radius) + jax.lax.broadcasted_iota(
        jnp.int32, (1, span), 1
    ).astype(jnp.float32)  # (Q, span)
    acc = jnp.zeros((q_blk, span, wl), jnp.float32)
    for j in range(n_rows):
        wj = jnp.maximum(0.0, 1.0 - jnp.abs(t_a - (y0f[:, None] + j)))
        acc = acc + wj[:, :, None] * rows_v[:, j:j + 1, :]

    # x-contraction: out[q, a, c] = sum_w acc[q, a, w] hat(xc + c - r - w)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wl), 2).astype(
        jnp.float32
    )
    outs = []
    for c in range(span):
        wx = jnp.maximum(
            0.0, 1.0 - jnp.abs(xc[:, None, None] + (c - radius) - w_iota)
        )  # (Q, 1, wl); iota covers exactly [0, wl) -> zero padding
        outs.append(jnp.sum(acc * wx, axis=-1))  # (Q, span)
    # (Q, span_dy, span_dx) — flattening to span^2 happens OUTSIDE the
    # kernel (Mosaic cannot reshape a non-lane-aligned minor dim)
    return jnp.stack(outs, axis=-1)


def _lookup_kernel(coords_ref, *refs, shapes, radius, q_blk):
    n_levels = len(shapes)
    vol_refs, o_ref = refs[:n_levels], refs[n_levels]
    outs = []
    for level, (hl, wl) in enumerate(shapes):
        outs.append(
            _level_kernel(coords_ref, vol_refs[level], hl, wl, radius,
                          level)
        )
    # (Q, n_levels*span, span): level-major rows, dx minor — flattened
    # by the caller into the (level, dy, dx) channel order
    o_ref[0, 0] = jnp.concatenate(outs, axis=1)


@functools.partial(
    jax.jit, static_argnames=("radius", "q_blk", "orig_rows", "interpret")
)
def lookup_corr_pyramid_slab(
    pyramid,
    coords: jax.Array,
    radius: int = 4,
    q_blk: int = 16,
    orig_rows: tuple[int, ...] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Pallas slab-slice lookup; same contract as
    :func:`atdn_vslam_tpu.ops.corr_lookup.lookup_corr_pyramid`.

    :param pyramid: list of (B, N1, Hl, Wl, 1) volumes — pass them
        through :func:`pad_pyramid_for_slab` once at build time and
        forward its ``orig_rows``. With ``orig_rows=None`` the pyramid
        is treated as unpadded and padded here (correct, but re-copies
        the volume every call).
    :param coords: (B, H1, W1, 2) level-0 correspondence (x, y).
    :return: (B, H1, W1, num_levels*(2r+1)^2) float32.
    """
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    span = 2 * radius + 1
    # q_blk must divide the query count — padding the volumes instead
    # would copy the full pyramid every call. Snap down to a divisor
    # (at KITTI res n1 = 7238 = 2*7*11*47: 14, 22, 47, ... divide).
    while n1 % q_blk:
        q_blk -= 1

    # coords/out expose q_blk as a full trailing-block dim so the
    # (sublane, lane) tiling rule is met for any q_blk
    flat = coords.reshape(b, n1 // q_blk, q_blk, 2).astype(jnp.float32)

    if orig_rows is None:
        pyramid, orig_rows = pad_pyramid_for_slab(pyramid, radius)
    vols, shapes = [], []
    for hl, corr in zip(orig_rows, pyramid):
        wl = corr.shape[3]
        vols.append(corr[..., 0])
        shapes.append((hl, wl))

    grid = (b, n1 // q_blk)
    out = pl.pallas_call(
        functools.partial(
            _lookup_kernel,
            shapes=tuple(shapes),
            radius=radius,
            q_blk=q_blk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, q_blk, 2), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ] + [
            pl.BlockSpec(
                (1, q_blk, v.shape[2], v.shape[3]),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for v in vols
        ],
        out_specs=pl.BlockSpec(
            (1, 1, q_blk, len(shapes) * span, span),
            lambda bi, i: (bi, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n1 // q_blk, q_blk, len(shapes) * span, span),
            jnp.float32,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n1 * sum(
                (_SLAB + span) * span * wl for _, wl in shapes
            ),
            bytes_accessed=sum(
                2 * b * n1 * v.shape[2] * v.shape[3] for v in vols
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, *vols)
    return out.reshape(b, h1, w1, -1)
