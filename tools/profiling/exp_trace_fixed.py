"""Definitive fixed-cost budget from the device trace: trace the real
streaming window and bucket per-op device time into the fixed-stage
components (fnet, cnet, pyramid build, probs materialization, convex
upsample) vs per-iteration and odometry work.

This replaces the stub-bisection numbers for the probs/pyramid stages:
ANY cheap stub whose value is reconstructible from small inputs (even a
rank-1 outer product) gets fused into the 12 iteration consumers, so
the stub delta includes iteration-read savings, not just the stage
cost (measured: probs stub delta 1.53 ms vs 0.39 ms actual kernel
time).
"""
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from atdn_vslam_tpu.geometry.se3 import pose_to_matrix  # noqa: E402
from atdn_vslam_tpu.models.flow import RAFTGMA  # noqa: E402
from atdn_vslam_tpu.models.odometry import ATDNVO  # noqa: E402

H, W = 376, 1232
N_FRAMES = 8


def main():
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    odo_model = ATDNVO()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
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
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        init = (odo_model.init_carry(1), jnp.eye(4), fmap0)
        (carry, pose, _), _ = jax.lax.scan(step, init, pairs)
        return pose

    np.asarray(run_window(flow_vars, odo_vars, frames))
    trace_dir = "/tmp/trace_fixed"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    np.asarray(run_window(flow_vars, odo_vars, frames))
    jax.profiler.stop_trace()

    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    ev = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            ev.extend(json.load(fh).get("traceEvents", []))

    # only the TPU op-stream events (XLA Ops pid); host python events
    # have no tf_op/args
    durs, counts, args = {}, {}, {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "args" in e:
            n = e.get("name", "?")
            durs[n] = durs.get(n, 0) + e["dur"]
            counts[n] = counts.get(n, 0) + 1
            if n not in args:
                args[n] = e["args"]

    buckets = {
        "fnet": 0.0, "cnet": 0.0, "probs": 0.0, "pyramid": 0.0,
        "upsample": 0.0, "iteration": 0.0, "odometry": 0.0,
        "other": 0.0,
    }
    per_bucket_rows = {b: [] for b in buckets}

    def bucket_of(name, tf):
        if "_flash_probs" in name or "_probs_" in name:
            return "probs"
        if "BasicEncoder_0" in tf:
            return "fnet"
        if "BasicEncoder_1" in tf:
            return "cnet"
        if "build_corr_pyramid" in tf or "corr_pyramid" in tf:
            return "pyramid"
        if "convex_upsample" in tf or "upsample" in tf:
            return "upsample"
        if ("GMAUpdateBlock" in tf or "ConvGRU" in tf or "lookup" in tf
                or "Aggregate" in tf or "MotionEncoder" in tf
                or "while" in tf or "scan" in tf.lower()):
            return "iteration"
        if ("ATDNVO" in tf or "lstm" in tf or "Head" in tf
                or "pose_to_matrix" in tf):
            return "odometry"
        return "other"

    for n, d in durs.items():
        tf = str(args.get(n, {}).get("tf_op", ""))
        b = bucket_of(n, tf)
        buckets[b] += d
        per_bucket_rows[b].append((d, n, tf))

    total = sum(buckets.values())
    print(f"device total: {total/N_FRAMES/1e3:.3f} ms/frame")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:10s} {d/N_FRAMES/1e3:7.3f} ms/frame")
    for b in ("fnet", "cnet", "other", "probs", "pyramid"):
        rows = sorted(per_bucket_rows[b], reverse=True)[:12]
        print(f"\n== top {b} ops ==")
        for d, n, tf in rows:
            short = "/".join(tf.split("/")[-3:])
            print(
                f"{d/N_FRAMES/1e3:8.4f} ms/f x{counts[n]//1:4d} "
                f"{n[:40]:40s} {short[:60]}"
            )


if __name__ == "__main__":
    main()
