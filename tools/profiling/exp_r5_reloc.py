"""Round-5 VERDICT item 3: decompose the 40 ms relocalization refine.

The refine is a cold flow+odometry pair (`_relocalize` calls
`_odometry_step` with no fmap1, slam/runtime.py) — both frames
re-encoded, nothing cached. A streamed pair costs ~24 ms and one extra
fnet is ~2.1 ms, so ~14 ms of the 40 are unexplained. Trace it.

Modes:
  trace   - device-trace the cold refine step, bucket per-op times
  ab      - cold pair vs fmap1-cached pair (the fix), same process
"""

import glob
import gzip
import json
import os
import sys
import time

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


def build():
    rng = np.random.default_rng(0)
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    odo_model = ATDNVO()
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    flow_vars = jax.jit(flow_model.init)(jax.random.key(0), im1, im2)
    odo_vars = jax.jit(odo_model.init)(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
        odo_model.init_carry(1),
    )
    return flow_model, odo_model, flow_vars, odo_vars, im1, im2


def refine_fn(flow_model, odo_model, cached):
    def step(flow_vars, odo_vars, im1, im2, fmap1=None):
        (_, flow), _ = flow_model.apply(
            flow_vars, im1, im2, test_mode=True,
            fmap1=fmap1, return_features=True,
        )
        (rot, tr), _ = odo_model.apply(
            odo_vars, flow[:, None], odo_model.init_carry(1)
        )
        return pose_to_matrix(rot[0, 0], tr[0, 0])

    if not cached:
        def loop(flow_vars, odo_vars, im1, im2):
            def body(c, _):
                mat = step(flow_vars, odo_vars, im1 + c, im2)
                return jnp.sum(mat) * 1e-30, None

            return jax.lax.scan(body, jnp.float32(0), None, length=4)[0]
    else:
        def loop(flow_vars, odo_vars, im1, im2):
            fmap1 = flow_model.apply(flow_vars, im1, encode_only=True)

            def body(c, _):
                mat = step(
                    flow_vars, odo_vars, im1, im2 + c, fmap1=fmap1
                )
                return jnp.sum(mat) * 1e-30, None

            return jax.lax.scan(body, jnp.float32(0), None, length=4)[0]
    return jax.jit(loop)


def measure(fn, *args):
    float(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) / 4)
    return best * 1e3


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "ab"
    flow_model, odo_model, flow_vars, odo_vars, im1, im2 = build()

    if which == "ab":
        cold = measure(
            refine_fn(flow_model, odo_model, False),
            flow_vars, odo_vars, im1, im2,
        )
        warm = measure(
            refine_fn(flow_model, odo_model, True),
            flow_vars, odo_vars, im1, im2,
        )
        print(f"cold refine: {cold:.1f} ms  fmap1-cached: {warm:.1f} ms")
        return

    fn = refine_fn(flow_model, odo_model, which == "trace_cached")
    float(fn(flow_vars, odo_vars, im1, im2))
    trace_dir = "/tmp/trace_reloc"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    float(fn(flow_vars, odo_vars, im1, im2))
    jax.profiler.stop_trace()

    ev = []
    for f in glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"):
        with gzip.open(f, "rt") as fh:
            ev.extend(json.load(fh).get("traceEvents", []))
    durs, counts, args_ = {}, {}, {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "args" in e:
            n = e.get("name", "?")
            durs[n] = durs.get(n, 0) + e["dur"]
            counts[n] = counts.get(n, 0) + 1
            if n not in args_:
                args_[n] = e["args"]

    buckets = {}
    for n, d in durs.items():
        tf = str(args_.get(n, {}).get("tf_op", ""))
        if "BasicEncoder_0" in tf:
            b = "fnet"
        elif "BasicEncoder_1" in tf:
            b = "cnet"
        elif "probs" in n or "probs" in tf:
            b = "probs"
        elif "ATDNVO" in tf:
            b = "odometry"
        elif "update" in tf or "while" in tf:
            b = "iteration"
        elif "stem" in tf or "s2d" in tf:
            b = "stem_fmt"
        else:
            b = "other"
        buckets[b] = buckets.get(b, 0.0) + d
    total = sum(buckets.values())
    print(f"device total: {total/4/1e3:.2f} ms/refine")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:10s} {d/4/1e3:7.3f} ms")
    print("== top other/odometry ops ==")
    for n, d in sorted(durs.items(), key=lambda kv: -kv[1])[:18]:
        tf = str(args_.get(n, {}).get("tf_op", ""))
        print(f"  {d/4/1e3:8.4f} ms x{counts[n]:4d} {n[:36]:36s} {tf[-48:]}")


if __name__ == "__main__":
    main()
