"""Microbench: corr-lookup variants at KITTI resolution on the real chip.

Hypothesis: the current batched-tiny-matmul lookup (2.14 ms/iter) is
MXU-pass-bound (per-query matmuls pad M=9/K=47 to 128x128 tiles), so
block-diagonal stacking of queries along K (einsum 1) and M (einsum 2)
should cut pass count ~2x with zero Pallas risk.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.ops.corr_lookup import (
    build_corr_pyramid,
    lookup_corr_pyramid,
    _interp_weights,
)

R = 4
SPAN = 2 * R + 1


def _hat(x):
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


def lookup_xfirst(pyramid, coords, radius=R):
    """x-contraction first: V @ Wx^T then Wy @ rows — 3 MXU tile passes
    per query instead of 4."""
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    flat = coords.reshape(b, n1, 2).astype(jnp.float32)
    out = []
    for level, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        scale = 1.0 / (2.0 ** level)
        vol = corr[..., 0]
        wy = _interp_weights(flat[..., 1] * scale, radius, hl)
        wx = _interp_weights(flat[..., 0] * scale, radius, wl)
        cols = jnp.einsum(
            "bnhw,bncw->bnhc", vol, wx.astype(vol.dtype),
            preferred_element_type=jnp.float32,
        ).astype(vol.dtype)
        window = jnp.einsum(
            "bnah,bnhc->bnac", wy.astype(vol.dtype), cols,
            preferred_element_type=jnp.float32,
        )
        out.append(window.astype(jnp.float32).reshape(b, n1, -1))
    return jnp.concatenate(out, axis=-1).reshape(b, h1, w1, -1)


def lookup_blocked(pyramid, coords, radius=R):
    """Block-diagonal query stacking: qk queries share one K dim in the
    y-contraction (qk*hl <= 128), qm queries share one matmul in the
    x-contraction (qm*span <= 128)."""
    b, h1, w1, _ = coords.shape
    n1 = h1 * w1
    flat = coords.reshape(b, n1, 2).astype(jnp.float32)
    out = []
    for level, corr in enumerate(pyramid):
        hl, wl = corr.shape[2], corr.shape[3]
        scale = 1.0 / (2.0 ** level)
        vol = corr[..., 0]  # (B, N, Hl, Wl)
        yc = flat[..., 1] * scale  # (B, N)
        xc = flat[..., 0] * scale

        qk = max(1, 128 // hl)
        while n1 % qk:
            qk -= 1
        g = n1 // qk
        # Wy block-diag: (B, G, qk*span, qk*hl), row m=(i,a), col k=(j,h)
        ycg = yc.reshape(b, g, qk)
        a_off = jnp.arange(qk * SPAN) % SPAN
        i_blk = jnp.arange(qk * SPAN) // SPAN
        h_off = jnp.arange(qk * hl) % hl
        j_blk = jnp.arange(qk * hl) // hl
        t_row = jnp.repeat(ycg, SPAN, axis=-1) + (
            a_off.astype(jnp.float32) - radius
        )  # (b, g, qk*span)
        wy_blk = _hat(
            t_row[..., None] - h_off[None, None, None].astype(jnp.float32)
        ) * (i_blk[:, None] == j_blk[None, :]).astype(jnp.float32)

        vol_blk = vol.reshape(b, g, qk * hl, wl)
        rows = jnp.einsum(
            "bgmk,bgkw->bgmw", wy_blk.astype(vol.dtype), vol_blk,
            preferred_element_type=jnp.float32,
        ).astype(vol.dtype)  # (B, G, qk*span, wl)
        rows = rows.reshape(b, n1, SPAN, wl)

        qm = max(1, 128 // SPAN)
        while n1 % qm:
            qm -= 1
        g2 = n1 // qm
        rows2 = rows.reshape(b, g2, qm * SPAN, wl)
        xcg = xc.reshape(b, g2, qm)
        c_off = jnp.arange(qm * SPAN) % SPAN
        t_col = jnp.repeat(xcg, SPAN, axis=-1) + (
            c_off.astype(jnp.float32) - radius
        )  # (b, g2, qm*span)
        wpos = jnp.arange(wl, dtype=jnp.float32)
        # (b, g2, wl, qm*span); off-diagonal blocks are discarded below,
        # so no block mask is needed here
        wx_blk = _hat(t_col[..., None, :] - wpos[None, None, :, None])

        big = jnp.einsum(
            "bgmw,bgwn->bgmn", rows2, wx_blk.astype(vol.dtype),
            preferred_element_type=jnp.float32,
        )  # (B, G2, qm*span, qm*span)
        big = big.reshape(b, g2, qm, SPAN, qm, SPAN)
        diag = jnp.diagonal(big, axis1=2, axis2=4)  # (B,G2,span,span,qm)
        window = jnp.moveaxis(diag, -1, 2)  # (B,G2,qm,span,span)
        out.append(window.astype(jnp.float32).reshape(b, n1, -1))
    return jnp.concatenate(out, axis=-1).reshape(b, h1, w1, -1)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    h8, w8 = 47, 154
    n = h8 * w8
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.normal(size=(1, h8, w8, 256)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, h8, w8, 256)).astype(np.float32))
    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    pyramid = jax.jit(
        lambda a, b_: tuple(build_corr_pyramid(a, b_, 4, dtype=dtype))
    )(f1, f2)
    coords = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, w8, (1, h8, w8)),
                rng.uniform(0, h8, (1, h8, w8)),
            ],
            axis=-1,
        ).astype(np.float32)
    )

    from atdn_vslam_tpu.ops.corr_lookup_slab import (
        lookup_corr_pyramid_slab, pad_pyramid_for_slab,
    )
    import functools
    padded, orig = pad_pyramid_for_slab(list(pyramid))
    padded = jax.tree.map(jax.device_put, padded)
    def slab(q):
        def f(p, c):
            return lookup_corr_pyramid_slab(
                padded, c, q_blk=q, orig_rows=orig
            )
        return f
    fns = {
        "current": lookup_corr_pyramid,
        "slab14": slab(14),
        "slab47": slab(47),
    }
    ref = None
    for name, fn in fns.items():
        jf = jax.jit(lambda p, c, f=fn: f(p, c))
        outv = np.asarray(jf(pyramid, coords))
        if ref is None:
            ref = outv
        else:
            err = np.abs(outv - ref).max()
            print(f"{name}: max abs err vs current = {err:.2e}")
        # time: 24 lookups inside one scan to amortize dispatch
        def many(p, c, f=fn):
            def body(carry, _):
                o = f(p, c + carry * 1e-6)
                return carry + jnp.float32(1), jnp.sum(o)
            return jax.lax.scan(body, jnp.float32(0), None, length=24)[1]

        jm = jax.jit(many)
        np.asarray(jm(pyramid, coords))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jm(pyramid, coords))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / 24 * 1e3:.3f} ms/lookup")


if __name__ == "__main__":
    main()
