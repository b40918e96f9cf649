"""Isolate the 2x-res sharded-path slowdown (347 -> 2425 ms/frame).

Candidates: (a) the shard_map'd Pallas attention kernels themselves,
(b) the row-sharded enclosing jit (halo exchanges / layout changes),
(c) their interaction. Measured on the one real chip with a 1x1 mesh
(degenerate partitioning - all sharding should be a no-op).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.parallel.flow_sharding import (
    sharded_flow_infer,
    spatially_sharded_model,
)

H, W = 752, 2464


def bench(label, fn, reps=3):
    float(fn())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1e3:.1f} ms")
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model"))

    model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    vars_ = jax.jit(model.init)(jax.random.key(0), im1, im2)

    # (1) round-2 baseline: row-sharded jit, Pallas OFF (XLA attention)
    model_noflash = RAFTGMA(iters=12, dtype=jnp.bfloat16, use_pallas=False)
    def run_r2():
        low, up = sharded_flow_infer(model_noflash, vars_, im1, im2, mesh, axis="model")
        return jnp.sum(up)
    bench("(1) row-sharded jit + XLA attention (round-2 path)", run_r2)

    # (2) row-sharded jit + plain (non-shard_map) Pallas kernels
    def run_sharded_plainflash():
        low, up = sharded_flow_infer(model, vars_, im1, im2, mesh, axis="__none__") \
            if False else None
        return None
    # emulate: jit with sharded inputs but model WITHOUT spatial_mesh
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(None, "model"))
    import functools
    fn2 = jax.jit(
        functools.partial(model.apply, test_mode=True),
        in_shardings=(repl, rows, rows),
        out_shardings=(repl, repl),
    )
    def run2():
        _, up = fn2(vars_, im1, im2)
        return jnp.sum(up)
    bench("(2) row-sharded jit + plain Pallas flash", run2)

    # (3) unsharded jit + shard_map'd Pallas kernels
    model_sm = spatially_sharded_model(model, mesh, "model")
    fn3 = jax.jit(functools.partial(model_sm.apply, test_mode=True))
    def run3():
        _, up = fn3(vars_, im1, im2)
        return jnp.sum(up)
    bench("(3) unsharded jit + shard_map flash kernels", run3)

    # (4) kernels standalone at the GMA attention shape
    n, d = (H // 8) * (W // 8), 128
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32)).astype(jnp.bfloat16)
    from atdn_vslam_tpu.ops.attention import flash_attend, sharded_flash_attend

    f_plain = jax.jit(lambda a, b, c: jnp.sum(flash_attend(a, b, c)))
    bench("(4a) flash_attend standalone", lambda: f_plain(q, k, v))
    f_sm = jax.jit(
        lambda a, b, c: jnp.sum(
            sharded_flash_attend(a, b, c, mesh=mesh, axis="model")
        )
    )
    bench("(4b) sharded_flash_attend standalone", lambda: f_sm(q, k, v))


if __name__ == "__main__":
    main()
