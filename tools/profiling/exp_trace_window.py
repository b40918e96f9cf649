"""Device-trace the production streaming window and dump the top ops
by total device self-time — quantifies the ~0.5 ms/iter of
inter-component "glue" (concats, converts, layout copies) that the
stub bisection cannot attribute, and the fixed-stage ops.

Usage: exp_trace_window.py [n_frames]  (default 8; keep small — the
trace grows ~MBs/frame)
"""
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA

H, W = 376, 1232


def top_ops(trace_dir, k=40):
    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    ev = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        ev.extend(data.get("traceEvents", []))
    durs, counts = {}, {}
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            durs[name] = durs.get(name, 0) + e["dur"]
            counts[name] = counts.get(name, 0) + 1
            total += e["dur"]
    print(f"total device-event time: {total/1e3:.1f} ms")
    for name, d in sorted(durs.items(), key=lambda x: -x[1])[:k]:
        print(f"{d/1e3:9.2f} ms  x{counts[name]:4d}  {name[:110]}",
              flush=True)


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16,
                     planar_stem="nhwc" not in sys.argv)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (n_frames + 1, H, W, 3)).astype(np.float32)
    )
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

    np.asarray(run_window(flow_vars, frames))  # compile + warm
    trace_dir = ("/tmp/trace_window_nhwc" if "nhwc" in sys.argv
             else "/tmp/trace_window")
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    np.asarray(run_window(flow_vars, frames))
    jax.profiler.stop_trace()
    top_ops(trace_dir)


if __name__ == "__main__":
    main()
