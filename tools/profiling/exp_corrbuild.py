"""Microbench: decompose build_corr_pyramid cost at KITTI res.

Times the all-pairs einsum, the pyramid pooling, and dtype casts
separately (serial-dependent scan, dispatch floor subtracted).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.ops.corr_lookup import build_corr_pyramid

H8, W8 = 47, 154
N = H8 * W8
INNER = 16


def timeit(fn, *args, reps=4):
    def many(x0, *r):
        def body(c, _):
            o = fn(x0 + c.astype(x0.dtype), *r)
            return (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(
                jnp.float32
            ), None
        return jax.lax.scan(body, jnp.float32(0), None, length=INNER)[0]

    jm = jax.jit(many)
    np.asarray(jm(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jm(*args))
        best = min(best, time.perf_counter() - t0)
    return best / INNER * 1e3


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(
            rng.normal(size=shape).astype(np.float32), dtype
        )

    floor = timeit(lambda x: x * 1.0001, jnp.ones((8, 128)))
    print(f"floor: {floor:.3f} ms")

    f1, f2 = arr(1, H8, W8, 256), arr(1, H8, W8, 256)

    def mm(a, b):
        return jnp.einsum(
            "bnc,bmc->bnm",
            a.reshape(1, N, 256),
            b.reshape(1, N, 256),
            preferred_element_type=jnp.float32,
        )

    print(f"einsum f32-out: {timeit(mm, f1, f2) - floor:.3f} ms")
    print(
        f"einsum bf16-out: "
        f"{timeit(lambda a, b: mm(a, b).astype(jnp.bfloat16), f1, f2) - floor:.3f} ms"
    )

    corr = jax.jit(mm)(f1, f2).reshape(1, N, H8, W8, 1)

    def pool(c):
        return jax.lax.reduce_window(
            c, 0.0, jax.lax.add,
            window_dimensions=(1, 1, 2, 2, 1),
            window_strides=(1, 1, 2, 2, 1),
            padding="VALID",
        ) * 0.25

    print(f"pool L0->L1 (f32 5d): {timeit(pool, corr) - floor:.3f} ms")

    corr4 = corr.reshape(1, N, H8, W8)

    def pool4(c):
        return jax.lax.reduce_window(
            c, 0.0, jax.lax.add,
            window_dimensions=(1, 1, 2, 2),
            window_strides=(1, 1, 2, 2),
            padding="VALID",
        ) * 0.25

    print(f"pool L0->L1 (f32 4d): {timeit(pool4, corr4) - floor:.3f} ms")

    def pool_slice(c):
        # manual 2x2 avg via strided slices (no reduce_window)
        a = c[:, :, : H8 - 1 : 2, : W8 - 1 : 2]
        b = c[:, :, : H8 - 1 : 2, 1::2]
        d = c[:, :, 1::2, : W8 - 1 : 2]
        e = c[:, :, 1::2, 1::2]
        return (a + b + d + e) * 0.25

    print(f"pool L0->L1 (f32 slices): {timeit(pool_slice, corr4) - floor:.3f} ms")

    def pool_reshape(c):
        # 47 odd -> drop last row, reshape-sum (contiguous averaging)
        c = c[:, :, : H8 - 1, :].reshape(1, N, (H8 - 1) // 2, 2, W8 // 2, 2)
        return c.sum((3, 5)) * 0.25

    print(f"pool L0->L1 (f32 reshape-sum): {timeit(pool_reshape, corr4) - floor:.3f} ms")

    print(f"cast f32->bf16 (210MB): {timeit(lambda c: c.astype(jnp.bfloat16), corr) - floor:.3f} ms")

    print(
        "full build_corr_pyramid bf16: "
        f"{timeit(lambda a, b: build_corr_pyramid(a, b, 4, dtype=jnp.bfloat16)[0], f1, f2) - floor:.3f} ms"
    )

    # fused alternative: bf16 volume + pool on bf16
    def build_alt(a, b):
        c = mm(a, b).astype(jnp.bfloat16).reshape(1, N, H8, W8)
        pyr = [c]
        h, w = H8, W8
        for _ in range(3):
            c = c[:, :, : h - h % 2, : w - w % 2]
            c = (
                c[:, :, ::2, ::2] + c[:, :, ::2, 1::2]
                + c[:, :, 1::2, ::2] + c[:, :, 1::2, 1::2]
            ) * 0.25
            h, w = h // 2, w // 2
            pyr.append(c)
        return pyr[0]

    print(f"alt build (bf16 pool, slices): {timeit(build_alt, f1, f2) - floor:.3f} ms")


if __name__ == "__main__":
    main()
