"""Round-5 VERDICT item 5: serving load-to-first-pose.

Round 4 measured 25 s from artifact load to first pose (deserialize +
full XLA compile + execute). Candidates:

  a) persistent compilation cache on the load path — the bench already
     uses one (bench.py), the serving loader didn't;
  b) compiled-executable serialization
     (jax.experimental.serialize_executable) — skips compilation
     entirely, at the cost of pinning jax/runtime versions and TPU
     topology.

Each measurement runs in a FRESH process (the in-process jit cache
would otherwise fake the warm numbers).

Usage:
  exp_r5_serving.py driver           # orchestrates everything
  exp_r5_serving.py export PATH      # build + save artifact
  exp_r5_serving.py load PATH CACHE  # timed: deserialize+compile+call
  exp_r5_serving.py pickle_save ART PKL CACHE
  exp_r5_serving.py pickle_load ART PKL
"""

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 376, 1232


def _models():
    import jax
    import jax.numpy as jnp

    from atdn_vslam_tpu.models.flow import RAFTGMA
    from atdn_vslam_tpu.models.odometry import ATDNVO

    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    odo_model = ATDNVO()
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    flow_vars = jax.jit(flow_model.init)(jax.random.key(0), im, im2)
    odo_vars = jax.jit(odo_model.init)(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
        odo_model.init_carry(1),
    )
    return flow_model, odo_model, flow_vars, odo_vars


def _call_args():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    im1 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    return im1, im2


def do_export(path):
    import jax

    from atdn_vslam_tpu import serving

    flow_model, odo_model, flow_vars, odo_vars = _models()
    checks = (
        jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
    )
    exported = serving.export_stream_step(
        flow_model, odo_model, flow_vars, odo_vars, H, W,
        disabled_checks=checks,
    )
    serving.save_stream_step(exported, path)
    encoder = serving.export_encoder(
        flow_model, flow_vars, H, W, disabled_checks=checks
    )
    serving.save_stream_step(encoder, path + ".enc")
    print(
        f"exported step {os.path.getsize(path)/1e6:.1f} MB + encoder "
        f"{os.path.getsize(path + '.enc')/1e6:.1f} MB",
        flush=True,
    )


def do_load(path, cache_dir):
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    if cache_dir and cache_dir != "none":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
    from atdn_vslam_tpu import serving

    t0 = time.perf_counter()
    loaded = serving.load_exported(path)
    encoder = serving.load_exported(path + ".enc")
    t1 = time.perf_counter()
    # bootstrap WITHOUT any model code: the encoder artifact encodes
    # frame 0, the step artifact's in_avals give the zero carry + pose
    im1, im2 = _call_args()
    te0 = time.perf_counter()
    enc_c = encoder.call.lower(im1).compile()
    te1 = time.perf_counter()
    fmap = enc_c(im1)
    carry = serving.zero_inputs_like(loaded.exported, 3)
    pose0 = jnp.eye(4)
    jax.block_until_ready(fmap)
    t2 = time.perf_counter()
    ts0 = time.perf_counter()
    step_c = loaded.call.lower(im1, im2, fmap, carry, pose0).compile()
    ts1 = time.perf_counter()
    pose, fmap2, carry, flow = step_c(im1, im2, fmap, carry, pose0)
    print(f"first pose[0,3] {float(pose[0, 3]):.4f}")
    t3 = time.perf_counter()
    print(
        f"load: deserialize {t1-t0:.1f}s | encoder compile {te1-te0:.1f}s"
        f" exec {t2-te1:.1f}s | step compile {ts1-ts0:.1f}s exec "
        f"{t3-ts1:.1f}s | TOTAL load-to-first-pose {t3-t0:.1f}s "
        f"(process start to pose {t3-t_start:.1f}s)",
        flush=True,
    )


def do_pickle_save(art_path, pkl_path, cache_dir):
    import pickle

    import jax

    if cache_dir and cache_dir != "none":
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    from jax.experimental import serialize_executable

    from atdn_vslam_tpu import serving

    loaded = serving.load_exported(art_path)
    encoder = serving.load_exported(art_path + ".enc")
    im1, im2 = _call_args()
    fmap = encoder.call(im1)
    carry = serving.zero_inputs_like(loaded.exported, 3)
    import jax.numpy as jnp

    pose0 = jnp.eye(4)
    lowered = loaded.call.lower(im1, im2, fmap, carry, pose0)
    compiled = lowered.compile()
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    with open(pkl_path, "wb") as f:
        pickle.dump((payload, in_tree, out_tree), f)
    print(
        f"compiled executable pickled: {os.path.getsize(pkl_path)/1e6:.1f}"
        " MB",
        flush=True,
    )


def do_pickle_load(art_path, pkl_path):
    t_start = time.perf_counter()
    import pickle

    import jax
    import jax.numpy as jnp

    from jax.experimental import serialize_executable

    t0 = time.perf_counter()
    with open(pkl_path, "rb") as f:
        payload, in_tree, out_tree = pickle.load(f)
    compiled = serialize_executable.deserialize_and_load(
        payload, in_tree, out_tree
    )
    t1 = time.perf_counter()
    from atdn_vslam_tpu import serving

    loaded = serving.load_exported(art_path)
    encoder = serving.load_exported(art_path + ".enc")
    im1, im2 = _call_args()
    fmap = encoder.call(im1)
    carry = serving.zero_inputs_like(loaded.exported, 3)
    pose0 = jnp.eye(4)
    jax.block_until_ready(fmap)
    t2 = time.perf_counter()
    pose, fmap2, carry, flow = compiled(im1, im2, fmap, carry, pose0)
    print(f"first pose[0,3] {float(pose[0, 3]):.4f}")
    t3 = time.perf_counter()
    print(
        f"pickle-load: deserialize+load {t1-t0:.1f}s  bootstrap "
        f"{t2-t1:.1f}s  first-call(exec only) {t3-t2:.1f}s  "
        f"TOTAL {t3-t0:.1f}s (process start to pose {t3-t_start:.1f}s)",
        flush=True,
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "driver"
    if mode == "export":
        do_export(sys.argv[2])
    elif mode == "load":
        do_load(sys.argv[2], sys.argv[3])
    elif mode == "pickle_save":
        do_pickle_save(sys.argv[2], sys.argv[3], sys.argv[4])
    elif mode == "pickle_load":
        do_pickle_load(sys.argv[2], sys.argv[3])
    else:
        art = "/tmp/serving_art.bin"
        cache = "/tmp/serving_cache"
        pkl = "/tmp/serving_exec.pkl"
        os.system(f"rm -rf {cache} {pkl}")
        me = os.path.abspath(__file__)

        def run(label, *args):
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, me, *args], capture_output=True,
                text=True,
            )
            out = (r.stdout + r.stderr).strip().splitlines()
            keep = [
                ln for ln in out
                if "load" in ln or "export" in ln or "pickle" in ln
                or "Error" in ln or "error" in ln
            ]
            print(f"[{label}] ({time.perf_counter()-t0:.0f}s wall)")
            for ln in keep[-4:]:
                print("   ", ln)

        if not os.path.exists(art):
            run("export", "export", art)
        run("cold load, no cache", "load", art, "none")
        run("cold load, empty cache", "load", art, cache)
        run("warm load, populated cache", "load", art, cache)
        run("pickle save", "pickle_save", art, pkl, cache)
        run("pickle load", "pickle_load", art, pkl)


if __name__ == "__main__":
    main()
