"""Trace the flow+odometry bench window and tabulate the ATDNVO ops —
decomposes the ~1.66 ms/frame odometry tail (iterslope measurement).
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.geometry.se3 import pose_to_matrix
from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.models.odometry import ATDNVO

H, W = 376, 1232
N_FRAMES = 8


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    trace_dir = "/tmp/trace_odo"
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
    durs, counts, args = {}, {}, {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            n = e.get("name", "?")
            durs[n] = durs.get(n, 0) + e["dur"]
            counts[n] = counts.get(n, 0) + 1
            if n not in args and "args" in e:
                args[n] = e["args"]

    odo_total = 0.0
    rows = []
    for n, d in durs.items():
        tf = str(args.get(n, {}).get("tf_op", ""))
        if ("ATDNVO" in tf or "Encoder_0" in tf or "lstm" in tf
                or "Head" in tf or "pose_to_matrix" in tf
                or "LinearBlock" in tf):
            odo_total += d
            rows.append((d, n, tf))
    rows.sort(reverse=True)
    print(f"odometry-attributed device time: {odo_total/8e3:.3f} ms/frame "
          f"({len(rows)} distinct ops)")
    for d, n, tf in rows[:30]:
        short = "/".join(tf.split("/")[-3:])
        print(f"{d/8e3:8.4f} ms/f x{counts[n]:3d}  {n[:34]:34s} {short[:70]}")


if __name__ == "__main__":
    main()
