"""Round-5 attack 1: tiled-output correlation dot.

Round 4 proved (corr_dot_rowmajor, STATUS) that the 0.31+0.12 ms/frame
pyramid carry-relayout copies survive any FLAT-lane Pallas dot: the
update scan carries each level (B, N, Hl, Wl) with (Hl, Wl) tiled
(Wl padded to lanes), so a (n, m) row-major kernel output still gets
relayouted by XLA. This experiment writes the dot output AS the 4-D
(B, N, Hl, Wl) array directly from the kernel (grid over h-row blocks,
one (bm, c) x (c, wl) MXU dot per row), so the Pallas output layout IS
the carry layout and the copy has nothing to do.

Modes:
  eq     - equality vs the XLA einsum path (on chip or CPU interpret)
  micro  - standalone pyramid-build timing, 24x scan
  base   - full 64-frame window, stock build_corr_pyramid
  tiled  - full window with the tiled-dot pyramid build
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

H, W, N_FRAMES = 376, 1232, 64


def _tiled_dot_kernel(f1_ref, f2_ref, out_ref, *, inv_sqrt_c, bh):
    a = f1_ref[...]  # (bm, c)
    for r in range(bh):
        row = f2_ref[r][None]  # (1, wl, c)
        acc = jax.lax.dot_general(
            a, row, (((1,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bm, 1, wl)
        out_ref[:, r:r + 1, :] = (acc * inv_sqrt_c).astype(out_ref.dtype)


def corr_dot_tiled(f1, f2, inv_sqrt_c, out_dtype=jnp.bfloat16,
                   bm=512, bh=8, interpret=False):
    """inv_sqrt_c * f1 @ f2^T emitted as (B, N, Hl, Wl) — the exact
    array shape (and hence default tiled layout) the update-scan
    carries, so no relayout copy follows."""
    b, n, c = f1.shape
    hl, wl = f2.shape[1:3]
    grid = (b, pl.cdiv(hl, bh), pl.cdiv(n, bm))
    return pl.pallas_call(
        functools.partial(_tiled_dot_kernel, inv_sqrt_c=inv_sqrt_c, bh=bh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bm, c), lambda b_, hb, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bh, wl, c), lambda b_, hb, i: (b_, hb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, bm, bh, wl), lambda b_, hb, i: (b_, i, hb, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, hl, wl), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * hl * wl * c,
            bytes_accessed=2 * b * (n * c + hl * wl * c + n * hl * wl),
            transcendentals=0,
        ),
        interpret=interpret,
    )(f1, f2)


def build_pyramid_tiled(fmap1, fmap2, num_levels=4, dtype=jnp.bfloat16,
                        use_pallas=None, interpret=False):
    b, h1, w1, c = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    f1 = fmap1.reshape(b, h1 * w1, c)
    inv_sqrt_c = 1.0 / float(np.sqrt(c))
    pyramid = []
    f2l = fmap2
    hl, wl = h2, w2
    for level in range(num_levels):
        corr = corr_dot_tiled(f1, f2l, inv_sqrt_c, dtype,
                              interpret=interpret)
        pyramid.append(corr[..., None])
        if level < num_levels - 1:
            h2_, w2_ = hl // 2, wl // 2
            f2l = f2l[:, : h2_ * 2, : w2_ * 2]
            f2l = f2l.reshape(b, h2_, 2, w2_, 2, c).astype(jnp.float32)
            f2l = f2l.mean(axis=(2, 4)).astype(fmap2.dtype)
            hl, wl = h2_, w2_
    return pyramid


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "eq"
    on_tpu = jax.devices()[0].platform != "cpu"
    interp = not on_tpu

    if which in ("eq", "micro"):
        from atdn_vslam_tpu.ops.corr_lookup import build_corr_pyramid

        h8, w8 = 47, 154
        rng = np.random.default_rng(0)
        f1 = jnp.asarray(
            rng.normal(size=(1, h8, w8, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)
        f2 = jnp.asarray(
            rng.normal(size=(1, h8, w8, 256)).astype(np.float32)
        ).astype(jnp.bfloat16)
        base = jax.jit(lambda a, b_: tuple(
            build_corr_pyramid(a, b_, 4, dtype=jnp.bfloat16)))
        tiled = jax.jit(lambda a, b_: tuple(
            build_pyramid_tiled(a, b_, 4, interpret=interp)))
        pa, pb = base(f1, f2), tiled(f1, f2)
        for lv, (x, y) in enumerate(zip(pa, pb)):
            err = np.abs(np.asarray(x, np.float32)
                         - np.asarray(y, np.float32)).max()
            print(f"L{lv}: shape {y.shape} max abs err = {err:.2e}")
        if which == "micro" and on_tpu:
            for name, fn in (("xla", base), ("tiled", tiled)):
                def many(a, b_, f=fn):
                    def body(carry, _):
                        p = f(a * (1.0 + carry * 0), b_)
                        return carry + 1, sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in p)
                    return jax.lax.scan(body, jnp.bfloat16(0), None,
                                        length=24)[1]
                jm = jax.jit(many)
                np.asarray(jm(f1, f2))
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(jm(f1, f2))
                    best = min(best, time.perf_counter() - t0)
                print(f"{name}: {best / 24 * 1e3:.3f} ms/build")
        return

    # full-window A/B, both variants in ONE process (STATUS round-4
    # caveat: absolute window times drift ~1 ms between processes on
    # the shared chip; only same-process deltas are trustworthy)
    import atdn_vslam_tpu.ops.corr_lookup as cl
    import atdn_vslam_tpu.models.flow.network as net_mod
    from atdn_vslam_tpu.geometry.se3 import pose_to_matrix
    from atdn_vslam_tpu.models.flow import RAFTGMA
    from atdn_vslam_tpu.models.odometry import ATDNVO

    stock_build = cl.build_corr_pyramid
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )

    def bench_variant(tag, build_fn):
        cl.build_corr_pyramid = build_fn
        net_mod.build_corr_pyramid = build_fn
        flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
        odo_model = ATDNVO()
        flow_vars = jax.jit(flow_model.init)(
            jax.random.key(0), frames[:1], frames[1:2]
        )
        odo_vars = jax.jit(odo_model.init)(
            jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
            odo_model.init_carry(1),
        )

        @jax.jit
        def run_window(flow_vars, odo_vars, frames):
            def step(carry, pair):
                lstm_carry, pose, fmap_prev = carry
                im1, im2 = pair
                (_, flow), fmap2 = flow_model.apply(
                    flow_vars, im1[None], im2[None], test_mode=True,
                    fmap1=fmap_prev, return_features=True,
                )
                (rot, tr), lstm_carry = odo_model.apply(
                    odo_vars, flow[:, None], lstm_carry
                )
                pose = pose @ pose_to_matrix(rot[0, 0], tr[0, 0])
                return (lstm_carry, pose, fmap2), None

            pairs = (frames[:-1], frames[1:])
            fmap0 = flow_model.apply(
                flow_vars, frames[:1], encode_only=True
            )
            init = (odo_model.init_carry(1), jnp.eye(4), fmap0)
            (_, pose, _), _ = jax.lax.scan(step, init, pairs)
            return pose

        np.asarray(run_window(flow_vars, odo_vars, frames))
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(run_window(flow_vars, odo_vars, frames))
            best = min(best, (time.perf_counter() - t0) / N_FRAMES)
        print(
            f"pyramid={tag}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)",
            flush=True,
        )
        return best

    order = (
        [("base", stock_build), ("tiled", build_pyramid_tiled)]
        if which != "tiled_first"
        else [("tiled", build_pyramid_tiled), ("base", stock_build)]
    )
    for tag, fn in order:
        bench_variant(tag, fn)


if __name__ == "__main__":
    main()
