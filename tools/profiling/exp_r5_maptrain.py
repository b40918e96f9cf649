"""Round-5 VERDICT item 2: budget the 324.6 ms MappingVAE train step.

Traces one jitted train step at the reference config (batch 16,
376x1232, neural_slam.py:305-321) and buckets per-op device time by
pipeline stage. Also prints the XLA cost-analysis FLOPs so the step
carries an MFU.

Usage: exp_r5_maptrain.py [trace|time]
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

from atdn_vslam_tpu.config import MappingTrainConfig  # noqa: E402
from atdn_vslam_tpu.models.mapping import MappingVAE  # noqa: E402
from atdn_vslam_tpu.training.mapping import (  # noqa: E402
    init_state,
    make_train_step,
)

H, W, B = 376, 1232, 16


def build(dtype=None, wpack=False):
    model = MappingVAE(dtype=dtype, wpack=wpack)
    cfg = MappingTrainConfig()
    state = init_state(model, cfg, 100, jnp.zeros((B, H, W, 3)))
    step = make_train_step(model, cfg, 100, donate=False)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (B, H, W, 3)).astype(np.float32)
    )
    key = jax.random.key(0)
    return step, state, key, imgs


def time_one(dtype, label, wpack=False):
    step, state, key, imgs = build(dtype, wpack)
    lowered = jax.jit(
        lambda s, k, im: step(s, k, im)[1]
    ).lower(state, key, imgs)
    cost = lowered.compile().cost_analysis()
    gflop = cost.get("flops", 0) / 1e9
    loss0 = float(step(state, key, imgs)[1])
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(step(state, key, imgs)[1])
        best = min(best, time.perf_counter() - t0)
    print(
        f"{label}: {best*1e3:.1f} ms/step  {gflop:.1f} GFLOP  "
        f"mfu(bf16-peak) {gflop/1e3/(best*197):.2%}  loss0 {loss0:.4f}",
        flush=True,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "trace"

    if which == "time":
        # f32 vs bf16 compute, one process (STATUS drift caveat)
        time_one(None, "f32 ")
        time_one(jnp.bfloat16, "bf16")
        return

    if which == "time_wpack":
        time_one(jnp.bfloat16, "bf16      ")
        time_one(jnp.bfloat16, "bf16+wpack", wpack=True)
        time_one(jnp.bfloat16, "bf16      ")
        time_one(jnp.bfloat16, "bf16+wpack", wpack=True)
        return

    step, state, key, imgs = build(
        jnp.bfloat16 if which.startswith("trace_bf16") else None,
        wpack=which.endswith("wpack"),
    )
    lowered = jax.jit(
        lambda s, k, im: step(s, k, im)[1]
    ).lower(state, key, imgs)
    cost = lowered.compile().cost_analysis()
    gflop = cost.get("flops", 0) / 1e9
    print(f"cost-analysis: {gflop:.1f} GFLOP/step")

    new_state, loss = step(state, key, imgs)
    float(loss)

    trace_dir = "/tmp/trace_maptrain"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    float(step(state, key, imgs)[1])
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

    def bucket_of(tf, name):
        if "jit_" in name and "(" in name:
            return "outer"
        if "color_jitter" in tf or "jitter" in tf:
            return "aug"
        if "resize" in tf or "blur" in tf or "normalize_rgb" in tf:
            return "target"
        if "stem" in tf:
            return "stem"
        if "down_" in tf or "ResidualConvBlock" in tf:
            return "encoder"
        if "up_" in tf or "Transposed" in tf or "out_conv" in tf:
            return "decoder"
        if "mean_lin" in tf:
            return "bottleneck"
        if "adamw" in tf or "transpose(jvp" in tf:
            return "opt/bwd-misc"
        return "other"

    buckets = {}
    for n, d in durs.items():
        tf = str(args_.get(n, {}).get("tf_op", ""))
        b = bucket_of(tf, n)
        buckets.setdefault(b, []).append((d, n, tf))
    print("== buckets ==")
    for b, rows in sorted(
        buckets.items(), key=lambda kv: -sum(r[0] for r in kv[1])
    ):
        tot = sum(r[0] for r in rows)
        print(f"  {b:12s} {tot/1e3:8.2f} ms")
    for b in ("other", "stem", "encoder", "decoder", "target", "aug"):
        rows = sorted(buckets.get(b, []), reverse=True)[:10]
        print(f"== top {b} ==")
        for d, n, tf in rows:
            print(f"  {d/1e3:8.3f} ms x{counts[n]:3d} {n[:36]:36s} {tf[-52:]}")


if __name__ == "__main__":
    main()
