"""GMA attention-aggregation: fused softmax(q k^T) v.

The reference materializes the full token-token similarity matrix and
its softmax once, then re-multiplies it with new values every update
iteration (ref: GMA/core/gma.py:54-76 builds ``attn``; GMA/core/
update.py:125-130 applies it 12x). At KITTI resolution that matrix is
(H/8*W/8)^2 = 7238^2 ~= 52M floats (210 MB) — an HBM-bandwidth
disaster to read 12 times.

TPU-native design: never materialize it. Each iteration computes
``out = softmax(scale * q k^T) v`` with an online-softmax (flash)
Pallas kernel — q/k are loop-invariant, v changes per iteration. The
recompute costs ~27 GFLOP per call on the MXU, far cheaper than
streaming 210 MB from HBM, and VMEM holds only (bq x bk) score tiles.

``attend`` dispatches to the Pallas kernel on TPU and to the XLA
reference path elsewhere (tests, CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def attend_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    bias: jax.Array | None = None,
    position_only: bool = False,
) -> jax.Array:
    """XLA reference: out = softmax(scale * q k^T [+ bias]) v.

    :param q, k: (B, N, D); v: (B, N, Dv). float32 accumulation.
    :param bias: optional (B, N, N) additive scores (relative
        positional embeddings, ref GMA/core/gma.py:62-68).
    :param position_only: use ``bias`` alone as the similarity
        (ref gma.py:62-63).
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    if position_only:
        if bias is None:
            raise ValueError("position_only attention requires a bias")
        s = bias.astype(jnp.float32)
    else:
        s = jnp.einsum(
            "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        if bias is not None:
            s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bnm,bmd->bnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale: float, n_valid: int, bk: int
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # dots run in the input dtype (bfloat16 on TPU -> full MXU rate)
    # with float32 accumulation via preferred_element_type
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bk) float32

    # mask padded key columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scr[:]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    correction = jnp.exp(m_prev - m_new)
    l_new = correction * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * correction + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


#: image rows per probs-write block (and the row-padding multiple of
#: keep_padded probs output). Measured reason this is 1: blocking the
#: write kernel 8 image rows per dispatch regressed the full streaming
#: window 24.12 -> 25.28 ms/frame on a v5e (VMEM pressure from the
#: (8, W, bk) tiles) — the multi-row machinery below stays general but
#: the shipped constant never exercises hb > 1.
_WRITE_HB = 1


@functools.partial(
    jax.jit, static_argnames=("scale", "bq", "bk", "interpret")
)
def flash_attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    bq: int = 256,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Pallas online-softmax attention for (B, N, D) tensors.

    Handles N not a multiple of the tile sizes by zero-padding and
    masking padded keys to -inf before the softmax. q and k/v may have
    different token counts (rectangular attention — the row-sharded
    GSPMD path gives each device a q row-block against the full k/v).
    """
    b, n, d = q.shape
    n_kv = k.shape[1]
    dv = v.shape[-1]
    scale_val = d**-0.5 if scale is None else scale

    n_q = _round_up(n, bq)
    n_k = _round_up(n_kv, bk)
    qp = jnp.pad(q, ((0, 0), (0, n_q - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, n_k - n_kv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, n_k - n_kv), (0, 0)))

    grid = (b, n_q // bq, n_k // bk)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale_val, n_valid=n_kv, bk=bk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bq, d), lambda b_, i, j: (b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, d), lambda b_, i, j: (b_, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, dv), lambda b_, i, j: (b_, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, dv), lambda b_, i, j: (b_, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_q, dv), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_q * n_k * (d + dv),
            bytes_accessed=4 * b * (n_q * d + n_k * (d + dv) + n_q * dv),
            transcendentals=b * n_q * n_k,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :n]


# Above this token count the (N x N) similarity buffer XLA materializes
# stops being acceptable (bf16 sim at 16k tokens = 512 MB) and the
# flash kernel takes over. Below it, measured on v5e at the SLAM
# resolution (N=7238, D=128, bf16), XLA's own fused softmax(qk^T)v is
# slightly faster than the hand kernel (~0.45 vs ~1.3 ms), so it wins
# by default.
_FLASH_MIN_TOKENS = 16384

# Token bound for materializing the softmax probabilities ONCE and
# reusing them across the recurrent update iterations (q/k are
# iteration-invariant in GMA — only v changes). At KITTI resolution
# (N=7238) the bf16 matrix is 105 MB: twelve P@V reads are far cheaper
# than twelve QK^T+softmax recomputes. At 8192 tokens the matrix is
# 128 MB bf16; beyond that the streaming/flash recompute path wins.
_MATERIALIZE_MAX_TOKENS = 8192


def attention_probs(
    q: jax.Array,
    k: jax.Array,
    scale: float | None = None,
    bias: jax.Array | None = None,
    position_only: bool = False,
    store_dtype=None,
) -> jax.Array:
    """Materialize softmax(scale * q k^T [+ bias]) for iteration reuse.

    The reference does exactly this (GMA/core/gma.py:54-76 builds the
    dense ``attn`` once; update.py:125-130 re-applies it every
    iteration); below :data:`_MATERIALIZE_MAX_TOKENS` it is also the
    fastest TPU schedule. Returns (B, N, N) in ``store_dtype``
    (default: q's dtype — bf16 on the TPU path, halving re-read
    bandwidth)."""
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    if position_only:
        if bias is None:
            raise ValueError("position_only attention requires a bias")
        s = bias.astype(jnp.float32)
    else:
        s = jnp.einsum(
            "bnd,bmd->bnm", q, k, preferred_element_type=jnp.float32
        ) * scale
        if bias is not None:
            s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return p.astype(store_dtype or q.dtype)


def _probs_stats_kernel(q_ref, k_ref, m_ref, l_ref, m_scr, l_scr,
                        *, scale: float, n_valid: int, bk: int):
    """Row max / exp-sum over key blocks (online), one TOKEN-MAJOR
    query block (bm rows) per (b, i) grid cell.

    Big token blocks matter: the first version used one grid cell per
    image row (376 cells at KITTI resolution), which re-fetched every
    k block once per row — ~100 MB of redundant k traffic and ~400
    kernel dispatches per frame. Token-major (bm, d) blocks need no
    spatial structure because the stats are per-query scalars."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bm, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    l_scr[:] = l_scr[:] * jnp.exp(m_prev - m_new) + jnp.sum(
        jnp.exp(s - m_new), axis=-1, keepdims=True
    )
    m_scr[:] = m_new

    @pl.when(j == nk - 1)
    def _finish():
        m_ref[0] = m_scr[:]
        l_ref[0] = l_scr[:]


def _probs_write_kernel(q_ref, k_ref, m_ref, l_ref, o_ref,
                        *, scale: float, n_valid: int, bk: int,
                        hb: int, k_outer: bool):
    """Normalized probabilities for one (hb-row, key) block pair.

    ``hb`` image rows per block (unrolled 2D dots — one per row)
    instead of one: 8x fewer kernel dispatches and 8x less redundant
    k-block traffic. Out-of-range key columns write exact zeros
    (scores masked to -inf); ragged row/col edge blocks are handled by
    Pallas OOB-write masking.

    ``k_outer``: the grid iterates rows INSIDE each key block (grid
    (b, nj, rows)) so the k block stays VMEM-resident across the whole
    row sweep — with rows outside (grid (b, rows, nj)) the k blocks
    are re-fetched once per row: ~370 x 2 MB = ~750 MB of redundant k
    traffic per frame at KITTI resolution."""
    j = pl.program_id(1) if k_outer else pl.program_id(2)
    for r in range(hb):
        s = jax.lax.dot_general(
            q_ref[0, r], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
        s = jnp.where(col < n_valid, s, NEG_INF)
        p = jnp.exp(s - m_ref[0, r]) / l_ref[0, r]
        o_ref[0, r] = p.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "h", "w", "scale", "bk", "interpret", "keep_padded", "k_outer"
    ),
)
def _flash_probs_impl(
    q: jax.Array,
    k: jax.Array,
    h: int,
    w: int,
    scale: float = 1.0,
    bk: int = 1024,
    interpret: bool = False,
    keep_padded: bool = False,
    k_outer: bool = True,
) -> jax.Array:
    b, n, d = q.shape
    n_kv = k.shape[1]  # may differ from n under row sharding
    n_k = _round_up(n_kv, bk)
    qs = q.reshape(b, h, w, d)
    kp = jnp.pad(k, ((0, 0), (0, n_k - n_kv), (0, 0)))
    nj = n_k // bk

    # ---- pass 1: per-query softmax stats, token-major big blocks ----
    # bm ~1024 query rows per block: ~8x fewer kernel dispatches and
    # ~50x less redundant k traffic than one-image-row blocks (the k
    # block stream repeats once per QUERY block).
    bm = min(_round_up(n, 8), 1024)
    n_q = _round_up(n, bm)
    qp = jnp.pad(q, ((0, 0), (0, n_q - n), (0, 0))) if n_q != n else q
    m, l = pl.pallas_call(
        functools.partial(
            _probs_stats_kernel, scale=scale, n_valid=n_kv, bk=bk
        ),
        grid=(b, n_q // bm, nj),
        in_specs=[
            pl.BlockSpec(
                (1, bm, d), lambda b_, i, j: (b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, d), lambda b_, i, j: (b_, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, bm, 1), lambda b_, i, j: (b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bm, 1), lambda b_, i, j: (b_, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_q, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, n_q, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bm, 1), jnp.float32),
            pltpu.VMEM((bm, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp)
    # spatial view for the write pass (29 KB, free relayout), with the
    # image rows padded to an hb multiple (hb rows per write block)
    hb = _WRITE_HB
    h_sp = _round_up(h, hb)
    m = m[:, :n].reshape(b, h, w, 1)
    l = l[:, :n].reshape(b, h, w, 1)
    if h_sp != h:
        pad_rows = ((0, 0), (0, h_sp - h), (0, 0), (0, 0))
        qs = jnp.pad(qs, pad_rows)
        m = jnp.pad(m, pad_rows)
        # l=0 would divide by zero in padded rows; any positive value
        # gives finite garbage that is sliced off
        l = jnp.pad(l, pad_rows, constant_values=1.0)

    # keep_padded: columns pad only to the 128-lane tile (NOT the bk
    # grid multiple — at KITTI resolution that is 7296 vs 8192 columns,
    # 11% less matrix to stream every update iteration). Edge blocks
    # are written masked; the key operand is padded to full grid
    # coverage (reads beyond n_valid are masked to zero probability).
    if keep_padded:
        n_pad = _round_up(n_kv, 128)
        njj = -(-n_pad // bk)  # ceil: grid blocks covering n_pad
    else:
        n_pad, njj = n_k, nj
    if njj * bk > kp.shape[1]:
        kp = jnp.pad(kp, ((0, 0), (0, njj * bk - kp.shape[1]), (0, 0)))

    if k_outer:
        # grid (b, key-blocks, rows): k resident per outer step, q and
        # the stats stream per row (q re-streamed nj times = ~120 MB
        # vs ~750 MB of k re-fetch the other way around)
        def _qix(b_, j, i):
            return (b_, i, 0, 0)

        def _kix(b_, j, i):
            return (b_, j, 0)

        def _oix(b_, j, i):
            return (b_, i, 0, j)

        grid = (b, njj, h_sp // hb)
    else:
        def _qix(b_, i, j):
            return (b_, i, 0, 0)

        def _kix(b_, i, j):
            return (b_, j, 0)

        def _oix(b_, i, j):
            return (b_, i, 0, j)

        grid = (b, h_sp // hb, njj)

    q_spec = pl.BlockSpec((1, hb, w, d), _qix, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, bk, d), _kix, memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, hb, w, 1), _qix, memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(
            _probs_write_kernel, scale=scale, n_valid=n_kv, bk=bk,
            hb=hb, k_outer=k_outer,
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, stat_spec, stat_spec],
        out_specs=pl.BlockSpec(
            (1, hb, w, bk), _oix,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_sp, w, n_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * n_k * d,
            bytes_accessed=2 * b * (n * d + n_k * d) + 2 * b * h * w * n_k,
            transcendentals=2 * b * n * n_k,
        ),
        interpret=interpret,
    )(qs, kp, m, l)
    if keep_padded:
        # padded key columns hold EXACT zeros (their scores are masked
        # to -inf before the exp), so consumers contracting against
        # zero-padded values get bit-identical results — and skipping
        # the slice avoids a full ~105 MB relayout copy of the matrix.
        # Padded ROWS (h -> h_sp) hold finite garbage: consumers slice
        # their (small) outputs back to h rows (Aggregate does).
        return out
    return out[:, :h, :, :n_kv]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def flash_probs_spatial(
    q: jax.Array,
    k: jax.Array,
    h: int,
    w: int,
    scale: float = 1.0,
    bk: int = 1024,
    interpret: bool = False,
    keep_padded: bool = False,
) -> jax.Array:
    """Materialize softmax(scale * q k^T) directly as (B, H, W, N)
    bf16/f32 — one fused MXU+VPU pipeline instead of XLA's dot ->
    reduce -> divide+convert chain over the f32 (N, N) scores
    (three full HBM passes, traced ~1.1 ms/pair at KITTI resolution;
    this kernel recomputes the cheap QK^T dot once per pass and writes
    the probabilities exactly once).

    Differentiable: ``pallas_call`` has no autodiff rule, so a
    custom VJP supplies the analytic softmax backward
    (dS = P * (dP - sum(dP*P)); dq = dS k, dk = dS^T q) through XLA —
    flow training at materialization-eligible resolutions
    differentiates through this op.

    :param q: (B, N, D) pre-scaled queries (N = h*w).
    :param k: (B, N, D) keys.
    :param keep_padded: return the key dim padded to a multiple of the
        128-lane tile (NOT the ``bk`` grid multiple — at KITTI
        resolution that is 7296 vs 8192 columns, 11% less matrix to
        stream every iteration; the rows also stay padded to a
        ``_WRITE_HB`` multiple, a no-op at hb=1). Padded columns are
        EXACT zeros (scores masked to -inf), so downstream
        contractions are unchanged and the ~105 MB slice copy
        disappears from the graph.
    :return: (B, h, w, N) probabilities in q's dtype (key dim padded
        to a 128 multiple under ``keep_padded``).
    """
    return _flash_probs_impl(q, k, h, w, scale, bk, interpret, keep_padded)


def _flash_probs_fwd(q, k, h, w, scale, bk, interpret, keep_padded):
    p = _flash_probs_impl(q, k, h, w, scale, bk, interpret, keep_padded)
    return p, (q, k, p)


def _flash_probs_bwd(h, w, scale, bk, interpret, keep_padded, res, dp):
    q, k, p = res
    b, n, d = q.shape
    n_kv = k.shape[1]
    # under keep_padded the trailing rows/columns are padding (rows:
    # finite garbage, columns: exact zeros): slice them (and their
    # cotangents) off before the softmax backward
    pf = p.astype(jnp.float32)[:, :h, :, :n_kv].reshape(b, n, n_kv)
    dpf = dp.astype(jnp.float32)[:, :h, :, :n_kv].reshape(b, n, n_kv)
    ds = pf * (dpf - jnp.sum(dpf * pf, axis=-1, keepdims=True))
    dq = jnp.einsum(
        "bnm,bmd->bnd", ds, k.astype(jnp.float32)
    ) * scale
    dk = jnp.einsum(
        "bnm,bnd->bmd", ds, q.astype(jnp.float32)
    ) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype)


flash_probs_spatial.defvjp(_flash_probs_fwd, _flash_probs_bwd)


# ----------------------------------------------------------------------
# GSPMD composition — shard_map partitioning of the flash kernels.
#
# pallas_call does not auto-partition under GSPMD, so a Pallas kernel
# inside a sharded jit would otherwise force an all-gather of its
# operands onto every device (or be unusable, as in round 2 where every
# sharded path carried ``use_pallas=False``). The attention reduction
# runs over KEYS, and GMA's k/v are tiny ((N, 128) — ~2 MB at KITTI
# resolution), so the natural partition needs no cross-device softmax:
# shard the QUERY rows over the mesh axis, replicate k/v, and run the
# unmodified single-device kernel on each row block. The big tensors
# (q, and above all the (B, H, W, N) probabilities / (B, N, Dv) output)
# stay sharded end to end; the only ICI traffic is the k/v broadcast.
# ----------------------------------------------------------------------


def sharded_flash_probs_spatial(
    q: jax.Array,
    k: jax.Array,
    h: int,
    w: int,
    scale: float = 1.0,
    *,
    mesh,
    axis: str,
    bk: int = 1024,
    interpret: bool = False,
    keep_padded: bool = False,
) -> jax.Array:
    """:func:`flash_probs_spatial` with the query rows (and therefore
    the (B, H, W, N) output) sharded over ``mesh[axis]`` via shard_map.

    Rows are zero-padded to a multiple of the axis size (padded rows
    produce finite garbage that is sliced off — softmax of an all-zero
    score row is uniform, never NaN).
    """
    from jax.sharding import PartitionSpec as P

    b, n, d = q.shape
    size = mesh.shape[axis]
    # pad rows to a (size * hb) multiple so each shard's row count is
    # already a write-block multiple: the per-shard kernel then adds NO
    # internal row padding, keeping all global padding rows contiguous
    # at the END (consumers slice [:, :h]); per-shard padding would
    # interleave garbage rows between shards
    h_pad = _round_up(h, size * _WRITE_HB)
    qs = q.reshape(b, h, w, d)
    if h_pad != h:
        qs = jnp.pad(qs, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))

    def local(qb, kf):
        hl = qb.shape[1]
        return _flash_probs_impl(
            qb.reshape(b, hl * w, d), kf, hl, w, scale, bk, interpret,
            keep_padded,
        )

    p = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, None, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )(qs, k)
    if keep_padded:
        # keep the (end-contiguous) padded rows: slicing here would
        # copy the whole matrix — consumers slice their small outputs
        return p
    return p[:, :h] if h_pad != h else p


def sharded_flash_attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    *,
    mesh,
    axis: str,
    bq: int = 256,
    bk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """:func:`flash_attend` with query tokens sharded over
    ``mesh[axis]`` and k/v replicated (rectangular flash attention per
    shard; no cross-device softmax — the reduction is over keys)."""
    from jax.sharding import PartitionSpec as P

    b, n, d = q.shape
    size = mesh.shape[axis]
    n_pad = _round_up(n, size)
    scale_val = d**-0.5 if scale is None else scale
    qp = (
        jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
        if n_pad != n
        else q
    )

    def local(qb, kf, vf):
        return flash_attend(
            qb, kf, vf, scale=scale_val, bq=bq, bk=bk, interpret=interpret
        )

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, axis, None),
            P(None, None, None),
            P(None, None, None),
        ),
        out_specs=P(None, axis, None),
        check_vma=False,
    )(qp, k, v)
    return out[:, :n] if n_pad != n else out


def sharded_flash_apply_probs(
    probs: jax.Array,
    v: jax.Array,
    *,
    mesh,
    axis: str,
    hb: int = 8,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """:func:`flash_apply_probs` with the spatial probs rows sharded
    over ``mesh[axis]`` and v replicated — the contraction is over
    keys, so each device multiplies its row block independently."""
    from jax.sharding import PartitionSpec as P

    b, h, w, n = probs.shape
    size = mesh.shape[axis]
    h_pad = _round_up(h, size)
    pp = (
        jnp.pad(probs, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))
        if h_pad != h
        else probs
    )

    def local(pb, vf):
        # the custom-vjp wrapper, so gradients flow per-shard too
        return flash_apply_probs(pb, vf, hb, bk, interpret)

    out = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, None, None)),
        out_specs=P(None, axis, None, None),
        check_vma=False,
    )(pp, v.astype(probs.dtype))
    return out[:, :h] if h_pad != h else out


def attention_probs_spatial(
    q: jax.Array,
    k: jax.Array,
    h: int,
    w: int,
    scale: float | None = None,
    bias: jax.Array | None = None,
    position_only: bool = False,
    store_dtype=None,
    use_pallas: bool | None = None,
    mesh=None,
    axis: str | None = None,
) -> jax.Array:
    """Materialize the attention probabilities directly in the
    (B, H, W, N) spatial layout the update loop consumes.

    Computing softmax(q k^T) as (B, N, N) and reshaping afterwards
    costs a full re-tiling pass over the ~200 MB matrix (and XLA keeps
    a second copy when consumers want different layouts). Emitting the
    scores from the MXU already shaped (B, H, W, N) makes every
    consumer share one layout — no reshape of the big tensor exists in
    the graph. On TPU the content-only path uses the fused
    :func:`flash_probs_spatial` kernel (one write of the matrix
    instead of XLA's three-pass f32 chain); with ``mesh``/``axis`` the
    kernel runs row-sharded via shard_map
    (:func:`sharded_flash_probs_spatial`) so the Pallas path composes
    with GSPMD-sharded inference.
    """
    d = q.shape[-1]
    scale = d**-0.5 if scale is None else scale
    # use_pallas=False forces the XLA path (CPU tests / numerics refs)
    if (
        use_pallas is not False
        and bias is None
        and not position_only
        and store_dtype is None
    ):
        from atdn_vslam_tpu.utils.platform import is_tpu

        if is_tpu():
            # keep_padded: the trailing zero columns ride through the
            # update scan unchanged and the fused apply kernel consumes
            # them directly — no 105 MB slice/pad copy anywhere
            if mesh is not None and axis is not None:
                return sharded_flash_probs_spatial(
                    q, k, h, w, scale, mesh=mesh, axis=axis,
                    keep_padded=True,
                )
            return flash_probs_spatial(
                q, k, h, w, scale=scale, keep_padded=True
            )
    qs = q.reshape(q.shape[0], h, w, d)
    if position_only:
        if bias is None:
            raise ValueError("position_only attention requires a bias")
        s = bias.astype(jnp.float32).reshape(bias.shape[0], h, w, -1)
    else:
        s = jnp.einsum(
            "bxyd,bmd->bxym", qs, k, preferred_element_type=jnp.float32
        ) * scale
        if bias is not None:
            s = s + bias.astype(jnp.float32).reshape(
                bias.shape[0], h, w, -1
            )
    p = jax.nn.softmax(s, axis=-1)
    return p.astype(store_dtype or q.dtype)


def _apply_probs_kernel(p_ref, v_ref, o_ref, acc_scr, *, hb: int):
    """One (row-block, key-block) step of out = probs @ v.

    probs block: (1, hb, W, bk); v block: (1, bk, dv). Accumulates
    float32 in VMEM scratch; writes the (1, hb, W, dv) output block on
    the last key block. Padded key columns hold exact zeros (the probs
    writer masks scores to -inf there), so no in-kernel masking is
    needed; ragged row blocks are handled by Pallas OOB-write masking.
    """
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pb = p_ref[0]  # (hb, W, bk)
    vb = v_ref[0]  # (bk, dv)
    # (hb, W, bk) x (bk, dv) -> (hb, W, dv), f32 accumulation on MXU
    acc_scr[:] += jax.lax.dot_general(
        pb, vb, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("hb", "bk", "interpret")
)
def _flash_apply_probs_impl(
    probs: jax.Array,
    v: jax.Array,
    hb: int = 8,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Pallas streaming out = probs @ v for spatial (B, H, W, N) probs.

    The XLA einsum for this contraction measured ~52% of the HBM
    roofline on a v5e (0.27 ms/iter at KITTI resolution against a
    0.13 ms probs-stream floor); this kernel streams the ~105 MB
    probabilities through VMEM in (hb x W x bk) tiles with the value
    matrix resident per key block — the per-iteration aggregation read
    at full bandwidth.
    """
    b, h, w, n = probs.shape
    n_v = v.shape[1]
    dv = v.shape[-1]
    n_k = _round_up(n, bk)
    h_p = _round_up(h, hb)
    # key-dim padding: probs pad columns must be ZERO so they add
    # nothing (v pad rows are then free to be zeros too). NOTE:
    # keep_padded probs arrive padded to a 128-lane multiple, but this
    # kernel's grid needs a bk (default 1024) multiple — at KITTI
    # resolution (7296 vs 8192) the pad below copies the full ~105 MB
    # matrix. Irrelevant in production (the einsum path is the default;
    # this kernel measured slower end to end), but a reason this
    # kernel would need a ragged last key block before it could win.
    pp = probs
    if n_k != n:
        pp = jnp.pad(probs, ((0, 0), (0, 0), (0, 0), (0, n_k - n)))
    vp = v if n_k == n_v else jnp.pad(v, ((0, 0), (0, n_k - n_v), (0, 0)))

    grid = (b, h_p // hb, n_k // bk)
    out = pl.pallas_call(
        functools.partial(_apply_probs_kernel, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, hb, w, bk), lambda b_, i, j: (b_, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, dv), lambda b_, i, j: (b_, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, hb, w, dv), lambda b_, i, j: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_p, w, dv), v.dtype),
        scratch_shapes=[pltpu.VMEM((hb, w, dv), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h_p * w * n_k * dv,
            bytes_accessed=(
                pp.dtype.itemsize * b * h_p * w * n_k
                + v.dtype.itemsize * b * n_k * dv * (h_p // hb)
                + v.dtype.itemsize * b * h_p * w * dv
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(pp, vp)
    return out[:, :h] if h_p != h else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def flash_apply_probs(
    probs: jax.Array,
    v: jax.Array,
    hb: int = 8,
    bk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """out = probs @ v via the Pallas streaming kernel (spatial probs).

    Differentiable through a custom VJP (``pallas_call`` has no
    autodiff rule): dv = P^T dout, dP = dout v^T via XLA einsums — the
    same contractions XLA autodiff would emit for the einsum path.
    """
    return _flash_apply_probs_impl(probs, v, hb, bk, interpret)


def _flash_apply_probs_fwd(probs, v, hb, bk, interpret):
    out = _flash_apply_probs_impl(probs, v, hb, bk, interpret)
    return out, (probs, v)


def _flash_apply_probs_bwd(hb, bk, interpret, res, dout):
    probs, v = res
    b, h, w, n = probs.shape
    n_v = v.shape[1]
    df = dout.astype(jnp.float32)
    dv = jnp.einsum(
        "bxym,bxyd->bmd", probs[..., :n_v].astype(jnp.float32), df
    ).astype(v.dtype)
    dp = jnp.einsum(
        "bxyd,bmd->bxym", df, v.astype(jnp.float32)
    ).astype(probs.dtype)
    if n != n_v:
        # padded probs columns are constants (exact zeros): zero grad
        dp = jnp.pad(dp, ((0, 0), (0, 0), (0, 0), (0, n - n_v)))
    return dp, dv


flash_apply_probs.defvjp(_flash_apply_probs_fwd, _flash_apply_probs_bwd)


def apply_attention_probs(
    probs: jax.Array, v: jax.Array, use_pallas: bool | None = None
) -> jax.Array:
    """out = probs @ v with float32 accumulation (the per-iteration
    cost once the probabilities are materialized).

    ``probs`` may be (B, N, N) or spatially pre-shaped (B, H, W, N) —
    the latter is the scan-loop layout: the aggregation output feeds
    NHWC convs, and passing the (N, N) matrix into the update scan
    makes XLA re-tile all ~105 MB of it EVERY iteration (measured
    0.285 ms/iter at KITTI resolution). Pre-shaping once outside the
    loop makes the loop operand layout-stable.

    ``use_pallas=True`` forces the Pallas streaming kernel
    (:func:`flash_apply_probs`) for spatial probs. It is NOT the
    default: measured on a v5e at KITTI resolution the kernel runs at
    ~114 GB/s vs the einsum's ~170 (microbench) and regresses the full
    streaming window 24.5 -> 26.0 ms/frame — XLA's einsum schedule for
    this contraction beats the hand pipeline. Kept for
    experimentation/other-shape use.

    The spatial probs key dim may EXCEED v's token count: trailing
    columns are exact-zero padding from ``keep_padded`` probs
    materialization, and v is zero-extended to match (contributes
    nothing)."""
    if probs.ndim == 4:
        if use_pallas is True:
            return flash_apply_probs(probs, v.astype(probs.dtype))
        n, n_v = probs.shape[-1], v.shape[1]
        if n != n_v:
            v = jnp.pad(v, ((0, 0), (0, n - n_v), (0, 0)))
        return jnp.einsum(
            "bxym,bmd->bxyd", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)
    return jnp.einsum(
        "bnm,bmd->bnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float | None = None,
    use_pallas: bool | None = None,
    bias: jax.Array | None = None,
    position_only: bool = False,
    mesh=None,
    axis: str | None = None,
) -> jax.Array:
    """Dispatch between the Pallas flash kernel and the XLA path.

    ``use_pallas=None`` (auto): flash on TPU when the token count makes
    the materialized similarity matrix prohibitive, XLA otherwise.
    With ``mesh``/``axis`` the flash kernel runs query-sharded via
    shard_map (:func:`sharded_flash_attend`) so it composes with
    GSPMD-sharded inference. Positional-bias modes always take the XLA
    path (the flash kernel carries no bias support; those modes are
    off in the reference config, utils/gma_parameters.py:9-10).
    """
    if bias is not None or position_only:
        return attend_reference(q, k, v, scale, bias, position_only)
    if use_pallas is None:
        from atdn_vslam_tpu.utils.platform import is_tpu

        use_pallas = is_tpu() and q.shape[-2] >= _FLASH_MIN_TOKENS
    if use_pallas:
        if mesh is not None and axis is not None:
            return sharded_flash_attend(q, k, v, scale, mesh=mesh, axis=axis)
        return flash_attend(q, k, v, scale)
    return attend_reference(q, k, v, scale)
