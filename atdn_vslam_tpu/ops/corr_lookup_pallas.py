"""Pallas TPU kernel for the correlation-window lookup (measured
alternative — NOT the production path).

Design: stream each query's correlation rows through VMEM (pipelined
DMA via the grid BlockSpec), rotate the block so the window lands at
row 0 (dynamic-start sublane loads and value-level dynamic_slice are
unimplemented in this Mosaic; ``tpu.dynamic_rotate`` is the workable
primitive and needs a tile-aligned sublane extent), lerp the y axis on
the VPU, contract the x axis against iota-built hat weights on the MXU.

Measured on v5e at KITTI resolution (scan-amortized, 40 reps):
einsum lookup 1.95 ms, this kernel 3.75 ms — the per-query full-block
rotate is VPU-bound (7238 queries x ~15k-element rotates), so the
batched-matmul einsum in ops/corr_lookup.py remains the production
implementation. Kept as a correct, tested baseline for future kernel
work (a per-query DMA-offset design would need dynamic-slice support
in the pipeline index_map).

Semantics identical to ``lookup_corr_pyramid``: zero padding outside
bounds (the volume is pre-padded with zero rows; x-taps vanish through
the hat weights).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lookup_kernel(
    coords_ref,  # SMEM (TQ, 2) float32, pixel coords at this level
    corr_ref,    # VMEM (TQ, Hp, Wl) volume rows, pre-padded (see caller)
    out_ref,     # VMEM (TQ, span*span) float32
    *,
    radius: int,
    hl: int,
    wl: int,
    pad_top: int,
    tq: int,
):
    span = 2 * radius + 1
    hp = corr_ref.shape[1]
    for qi in range(tq):
        x = coords_ref[qi, 0]
        y = coords_ref[qi, 1]
        y0f = jnp.floor(y - radius)
        y0 = jnp.clip(y0f.astype(jnp.int32), -pad_top, hl - 1)
        fy = (y - radius) - y0.astype(jnp.float32)
        start = y0 + pad_top

        # dynamic-start sublane loads are not lowerable on this Mosaic;
        # rotate the block so the window lands at row 0 instead
        # (pltpu.roll(block, hp - start) == np.roll(block, -start))
        block = corr_ref[qi].astype(jnp.float32)  # (Hp, Wl)
        rolled = pltpu.roll(block, hp - start, 0)
        top = rolled[:span]
        bot = rolled[1 : span + 1]
        rows9 = top * (1.0 - fy) + bot * fy  # (span, Wl)

        # hat weights for the x axis: wx[a, w'] = max(0, 1-|x-r+a - w'|)
        # (tpu.iota is integer-only -> build int then cast)
        a_idx = jax.lax.broadcasted_iota(
            jnp.int32, (span, wl), 0
        ).astype(jnp.float32)
        w_idx = jax.lax.broadcasted_iota(
            jnp.int32, (span, wl), 1
        ).astype(jnp.float32)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(x - radius + a_idx - w_idx))

        window = jax.lax.dot_general(
            rows9, wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (span, span): [y-offset, x-offset]
        out_ref[qi] = window  # cross-lane flatten happens outside


@functools.partial(
    jax.jit, static_argnames=("radius", "tq", "interpret")
)
def lookup_level_pallas(
    corr: jax.Array,
    coords: jax.Array,
    radius: int = 4,
    tq: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Windowed bilinear lookup for ONE pyramid level.

    :param corr: (N, Hl, Wl) per-query correlation rows (batch folded
        into N).
    :param coords: (N, 2) (x, y) pixel coords at this level's scale.
    :return: (N, (2r+1)^2) float32, dy-major dx-minor channel order.
    """
    n, hl, wl = corr.shape
    span = 2 * radius + 1
    pad_top = span + 1
    # tpu.dynamic_rotate needs a tile-aligned sublane extent — round the
    # padded height up to a multiple of 32 (covers f32 and bf16 tiles)
    hp = -(-(hl + pad_top + span + 1) // 32) * 32
    pad_bottom = hp - hl - pad_top
    corr_p = jnp.pad(corr, ((0, 0), (pad_top, pad_bottom), (0, 0)))

    n_pad = (-n) % tq
    if n_pad:
        corr_p = jnp.pad(corr_p, ((0, n_pad), (0, 0), (0, 0)))
        coords = jnp.pad(coords, ((0, n_pad), (0, 0)))

    grid = ((n + n_pad) // tq,)
    out = pl.pallas_call(
        functools.partial(
            _lookup_kernel, radius=radius, hl=hl, wl=wl,
            pad_top=pad_top, tq=tq,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tq, 2), lambda i: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (tq, hl + pad_top + pad_bottom, wl), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tq, span, span), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n + n_pad, span, span), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * span * span * wl,
            bytes_accessed=corr_p.size * corr_p.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(coords.astype(jnp.float32), corr_p)
    return out[:n].reshape(n, span * span)


def lookup_corr_pyramid_pallas(
    pyramid, coords: jax.Array, radius: int = 4, interpret: bool = False
) -> jax.Array:
    """Full-pyramid lookup via the Pallas level kernel; drop-in
    equivalent of ``lookup_corr_pyramid``."""
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    flat = coords.reshape(b * n1, 2).astype(jnp.float32)
    out = []
    for level, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        vol = corr[..., 0].reshape(b * n1, hl, wl)
        scaled = flat / (2.0**level)
        out.append(
            lookup_level_pallas(vol, scaled, radius, interpret=interpret)
        )
    return (
        jnp.concatenate(out, axis=-1)
        .reshape(b, h1, w1, -1)
        .astype(jnp.float32)
    )
