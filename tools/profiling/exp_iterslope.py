"""Iteration-slope measurement inside the real streaming window:
time the 64-frame flow-only window at several GMA iteration counts and
fit ms/iter + fixed intercept. Also times the flow+odometry window to
isolate the ATDNVO tail cost.

Usage: exp_iterslope.py [iters...]  (default 4 8 12 and odometry)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA

H, W = 376, 1232
N_FRAMES = 64


def make_frames():
    rng = np.random.default_rng(0)
    return jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )


def bench_flow(iters, frames, reps=3):
    flow_model = RAFTGMA(iters=iters, dtype=jnp.bfloat16)
    flow_vars = jax.jit(flow_model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )

    @jax.jit
    def run_window(flow_vars, frames):
        def step(carry, pair):
            pose, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = flow_model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            pose = pose + jnp.sum(flow.astype(jnp.float32)) * 1e-30
            return (pose, fmap2), None
        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        (pose, _), _ = jax.lax.scan(step, (jnp.float32(0), fmap0), pairs)
        return pose

    np.asarray(run_window(flow_vars, frames))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_window(flow_vars, frames))
        best = min(best, (time.perf_counter() - t0) / N_FRAMES)
    print(f"iters={iters}: {best*1e3:.2f} ms/frame", flush=True)
    return best


def bench_flow_odo(frames, reps=3):
    from atdn_vslam_tpu.geometry.se3 import pose_to_matrix
    from atdn_vslam_tpu.models.odometry import ATDNVO

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
                fmap1=fmap_prev, return_features=True)
            (rot, tr), lstm_carry = odo_model.apply(
                odo_vars, flow[:, None], lstm_carry
            )
            pose = pose @ pose_to_matrix(rot[0, 0], tr[0, 0])
            return (lstm_carry, pose, fmap2), None
        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        init = (odo_model.init_carry(1), jnp.eye(4), fmap0)
        (carry, pose, _), _ = jax.lax.scan(step, init, pairs)
        return pose

    np.asarray(run_window(flow_vars, odo_vars, frames))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_window(flow_vars, odo_vars, frames))
        best = min(best, (time.perf_counter() - t0) / N_FRAMES)
    print(f"flow+odometry iters=12: {best*1e3:.2f} ms/frame", flush=True)
    return best


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    frames = make_frames()
    iters_list = [int(a) for a in sys.argv[1:] if a.isdigit()] or [4, 8, 12]
    times = {}
    for it in iters_list:
        times[it] = bench_flow(it, frames)
    if len(times) >= 2:
        ks = sorted(times)
        slope = (times[ks[-1]] - times[ks[0]]) / (ks[-1] - ks[0])
        print(f"slope: {slope*1e3:.3f} ms/iter; intercept at 0 iters: "
              f"{(times[ks[-1]] - slope*ks[-1])*1e3:.2f} ms", flush=True)
    if "noodo" not in sys.argv:
        bench_flow_odo(frames)


if __name__ == "__main__":
    main()
