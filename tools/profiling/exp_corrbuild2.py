"""Force-all-levels corr pyramid timing + per-level pooling."""
import time
import jax
import jax.numpy as jnp
import numpy as np
from atdn_vslam_tpu.ops.corr_lookup import build_corr_pyramid

H8, W8 = 47, 154
N = H8 * W8
INNER = 32

def timeit(fn, *args, reps=5):
    def many(x0, *r):
        def body(c, _):
            o = fn(x0 + c.astype(x0.dtype), *r)
            return (o * 1e-30).astype(jnp.float32), None
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
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32), dtype)

    floor = timeit(lambda x: jnp.sum(x * 1.0001), jnp.ones((8, 128)))
    print(f"floor: {floor:.3f} ms")

    f1, f2 = arr(1, H8, W8, 256), arr(1, H8, W8, 256)
    print("full pyramid (all levels forced): "
          f"{timeit(lambda a, b: sum(jnp.sum(x.astype(jnp.float32)) for x in build_corr_pyramid(a, b, 4, dtype=jnp.bfloat16)), f1, f2) - floor:.3f} ms")
    print("level0 only: "
          f"{timeit(lambda a, b: jnp.sum(build_corr_pyramid(a, b, 4, dtype=jnp.bfloat16)[0].astype(jnp.float32)), f1, f2) - floor:.3f} ms")

    def pool(c):
        return jax.lax.reduce_window(
            c, 0.0, jax.lax.add,
            window_dimensions=(1, 1, 2, 2, 1),
            window_strides=(1, 1, 2, 2, 1),
            padding="VALID") * 0.25

    shapes = [(1, N, 47, 154, 1), (1, N, 23, 77, 1), (1, N, 11, 38, 1)]
    for s in shapes:
        x = arr(*s, dtype=jnp.float32)
        print(f"pool f32 {s}: {timeit(lambda c: jnp.sum(pool(c)), x) - floor:.3f} ms")
    for s in shapes:
        x = arr(*s, dtype=jnp.float32)
        xs = x.reshape(s[:4])
        def pool_pad(c, h=s[2], w=s[3]):
            c = jnp.pad(c, ((0,0),(0,0),(0,h%2),(0,w%2)))
            return (c[:, :, ::2, ::2] + c[:, :, ::2, 1::2]
                    + c[:, :, 1::2, ::2] + c[:, :, 1::2, 1::2]) * 0.25
        print(f"pool4d slices {s}: {timeit(lambda c: jnp.sum(pool_pad(c)), xs) - floor:.3f} ms")

if __name__ == "__main__":
    main()
