"""Measure the update-scan ``unroll`` factor on the real streaming
window: unroll>1 stamps several iterations per loop step, letting XLA
schedule/fuse across iteration boundaries at the cost of code size.

Usage: exp_unroll.py [unroll ...]   (default: 1 2 3 12)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA

H = int(os.environ.get("INSITU_H", 376))
W = int(os.environ.get("INSITU_W", 1232))
N_FRAMES = int(os.environ.get("INSITU_FRAMES", 64))


def bench(unroll, reps=3):
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16, scan_unroll=unroll)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    flow_vars = jax.jit(flow_model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )

    @jax.jit
    def run_window(flow_vars, frames):
        def step(carry, pair):
            acc, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = flow_model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            acc = acc + jnp.sum(flow.astype(jnp.float32)) * 1e-30
            return (acc, fmap2), None
        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        (acc, _), _ = jax.lax.scan(step, (jnp.float32(0), fmap0), pairs)
        return acc

    np.asarray(run_window(flow_vars, frames))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_window(flow_vars, frames))
        best = min(best, (time.perf_counter() - t0) / N_FRAMES)
    print(
        f"unroll={unroll}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)",
        flush=True,
    )
    return best


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    factors = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 12]
    for u in factors:
        bench(u)


if __name__ == "__main__":
    main()
