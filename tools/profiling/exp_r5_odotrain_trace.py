"""Device-trace the odometry train step (138.8 ms/step, 5.6 % MFU at
the reference config) and bucket per-op time — the round-5 STATUS
attribution ("stem fwd+bwd ~117 of the 139 ms") was scaled from the
INFERENCE trace, never measured. Trace before attacking.

Usage: exp_r5_odotrain_trace.py [trace|time]
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


def main(dtype=None, wpack=False):
    from atdn_vslam_tpu.config import LossConfig, TrainConfig
    from atdn_vslam_tpu.models.odometry import ATDNVO
    from atdn_vslam_tpu.training.odometry import init_state, make_train_step

    B, T, H, W = 24, 6, 376, 1232
    model = ATDNVO(compute_dtype=dtype, wpack=wpack)
    tcfg, lcfg = TrainConfig(), LossConfig()
    rng = np.random.default_rng(0)
    flows = jnp.asarray(
        rng.normal(scale=20, size=(B, T, H, W, 2)).astype(np.float32)
    )
    rot = jnp.asarray(rng.normal(scale=0.01, size=(B, T, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(scale=1.0, size=(B, T, 3)).astype(np.float32))
    state = init_state(model, tcfg, 100, jnp.zeros((B, T, H, W, 2)))
    step = make_train_step(model, tcfg, lcfg, 100, donate=False)

    def fence(out):
        return float(jnp.sum(out[1]["loss"]))

    fence(step(state, flows, rot, tr))
    trace_dir = "/tmp/trace_odotrain" + ("_bf16" if dtype is not None else "") + ("_wp" if wpack else "")
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    fence(step(state, flows, rot, tr))
    jax.profiler.stop_trace()

    ev = []
    for f in glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"):
        with gzip.open(f, "rt") as fh:
            ev.extend(json.load(fh).get("traceEvents", []))
    durs, counts, args_ = {}, {}, {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e and "args" in e:
            tf = str(e["args"].get("tf_op", ""))
            if not tf:
                continue
            n = e.get("name", "?")
            durs[n] = durs.get(n, 0) + e["dur"]
            counts[n] = counts.get(n, 0) + 1
            if n not in args_:
                args_[n] = tf

    def bucket(tf):
        if "transpose" in tf and (
            "Conv_0" in tf or "ConvBlock" in tf or "conv" in tf
        ):
            return "conv_bwd:" + (
                "stem" if ("encoder/ConvBlock_0" in tf or "s2d" in tf
                           or "Conv_0/conv" in tf and "encoder/C" in tf)
                else "rcb" if "ResidualConvBlock" in tf else "other"
            )
        if "encoder/ConvBlock_0" in tf or "compressor" in tf or "s2d" in tf:
            return "stem"
        if "ResidualConvBlock" in tf:
            return "rcb"
        if any(k in tf for k in ("lstm", "head", "LinearBlock", "Dense")):
            return "lstm_mlp"
        if "adam" in tf or "opt" in tf:
            return "optimizer"
        if "loss" in tf or "clvo" in tf:
            return "loss"
        return "other"

    buckets = {}
    for n, d in durs.items():
        b = bucket(args_[n])
        buckets[b] = buckets.get(b, 0.0) + d
    total = sum(buckets.values())
    print(f"device total: {total/1e3:.1f} ms/step")
    for b, d in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {b:18s} {d/1e3:8.2f} ms")
    print("== top 25 ops ==")
    for n, d in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
        tf = args_[n]
        print(f"  {d/1e3:8.3f} ms x{counts[n]:3d} {n[:30]:30s} "
              f"{'/'.join(tf.split('/')[-4:])[:70]}")


if __name__ == "__main__":
    main(jnp.bfloat16 if "bf16" in sys.argv[1:] else None, "wpack" in sys.argv[1:])
