"""Width-packed conv (ops/wpack.py) vs plain NHWC conv on chip, at the
shapes dominating the odometry/mapping train steps. Direction check
before integration (the full-step A/B decides; same-process pairs).

CAVEAT (learned in this round): the wall-clock numbers this script
prints are dominated by tunnel RPC + fence overhead (a conv the device
trace prices at 3.25 ms walls at ~31 ms here). Use them ONLY to compare
packed vs ref within one run; for absolute numbers, device-trace the
call (see /tmp/trace_wpack pattern in STATUS round-5 (10))."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from atdn_vslam_tpu.ops.wpack import (  # noqa: E402
    choose_pack, conv_packed, pack_width,
)


def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=4):
    fence(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def bench(tag, shape, kernel, stride, pad, co, dtype):
    rng = np.random.default_rng(0)
    ci = shape[-1]
    p = choose_pack(
        (shape[2], (shape[2] + 2 * pad[1] - kernel[1]) // stride[1] + 1),
        max(ci, co),
    )
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dtype)
    w = jnp.asarray(
        rng.normal(scale=0.1, size=(*kernel, ci, co)).astype(np.float32)
    ).astype(dtype)
    xp = pack_width(x, p)

    @jax.jit
    def f_ref(x, w):
        return jax.lax.conv_general_dilated(
            x, w, stride, tuple((q, q) for q in pad),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @jax.jit
    def f_pk(xp, w):
        return conv_packed(xp, w, None, p, stride, pad)

    @jax.jit
    def g_ref(x, w):
        return jax.grad(
            lambda w: jnp.sum(f_ref(x, w).astype(jnp.float32) ** 2)
        )(w)

    @jax.jit
    def g_pk(xp, w):
        return jax.grad(
            lambda w: jnp.sum(f_pk(xp, w).astype(jnp.float32) ** 2)
        )(w)

    t_ref_f = timeit(f_ref, x, w)
    t_pk_f = timeit(f_pk, xp, w)
    t_ref_g = timeit(g_ref, x, w)
    t_pk_g = timeit(g_pk, xp, w)
    print(f"{tag} (p={p}): fwd ref {t_ref_f:7.2f} packed {t_pk_f:7.2f} ms | "
          f"fwd+dk ref {t_ref_g:7.2f} packed {t_pk_g:7.2f} ms", flush=True)


def main():
    # odometry RCB_0 conv1 at the train config (batch 144)
    bench("odo RCB0 3x3s1 16ch b144", (144, 188, 616, 16), (3, 3), (1, 1),
          (1, 1), 16, jnp.bfloat16)
    bench("odo RCB0 3x3s2 16ch b144", (144, 188, 616, 16), (3, 3), (2, 2),
          (1, 1), 16, jnp.bfloat16)
    # mapping VAE stem at the reference config (batch 16)
    bench("vae stem 7x7s1 3ch b16", (16, 376, 1232, 3), (7, 7), (1, 1),
          (3, 3), 3, jnp.bfloat16)
    # vae rcb0 3->16 s2
    bench("vae RCB0 3x3s2 3->16 b16", (16, 376, 1232, 3), (3, 3), (2, 2),
          (1, 1), 16, jnp.bfloat16)


if __name__ == "__main__":
    main()
