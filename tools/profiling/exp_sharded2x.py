"""Chip measurement: 2x-KITTI-resolution flow inference with the
GSPMD sharding path ENGAGED (shard_map'd Pallas flash kernels).

One real chip is available, so the mesh is 1-wide — degenerate
partitioning, but it executes the exact sharded code path (shard_map ->
flash kernels) that multi-chip runs use, proving the kernels survive
sharding on hardware (round 2 had to force use_pallas=False here).
Compares against the unsharded auto path at the same resolution.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.parallel.flow_sharding import sharded_flow_infer

H, W = 752, 2464  # 2x KITTI -> 94*308 = 28,952 tokens (flash regime)


def bench(label, fn, reps=3):
    float(fn())  # warm-up + compile; SCALAR fetch fences the tunnel
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best * 1e3:.1f} ms/frame")
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    vars_ = jax.jit(model.init)(jax.random.key(0), im1, im2)

    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model"))

    # sharded path (shard_map'd Pallas kernels engaged)
    def run_sharded():
        low, up = sharded_flow_infer(model, vars_, im1, im2, mesh, axis="model")
        return jnp.sum(up)  # scalar fence (tunnel!)

    # unsharded auto path (plain flash kernels)
    plain = jax.jit(lambda v, a, b: model.apply(v, a, b, test_mode=True))

    def run_plain():
        _, up = plain(vars_, im1, im2)
        return jnp.sum(up)

    t_plain = bench("2x-res unsharded (flash auto)", run_plain)
    t_shard = bench("2x-res SHARDED mesh=1x1 (shard_map flash)", run_sharded)
    print(f"overhead of sharded path: {(t_shard / t_plain - 1) * 100:.1f}%")


if __name__ == "__main__":
    main()
