"""Trace the slow combination: row-sharded jit + shard_map flash
kernels at 2x res (2425 ms vs 347 for either alone). Dump top device
ops by self-time from the profiler trace.
"""
import functools
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.parallel.flow_sharding import spatially_sharded_model

H, W = 752, 2464


def top_ops(trace_dir, k=25):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    ev = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        ev.extend(data.get("traceEvents", []))
    # keep complete events on device lines
    durs = {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            durs[name] = durs.get(name, 0) + e["dur"]
    for name, d in sorted(durs.items(), key=lambda x: -x[1])[:k]:
        print(f"{d/1e3:10.2f} ms  {name[:120]}")


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "model"))

    model = spatially_sharded_model(
        RAFTGMA(iters=12, dtype=jnp.bfloat16), mesh, "model"
    )
    vars_ = jax.jit(model.init)(jax.random.key(0), im1, im2)
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(None, "model"))
    fn = jax.jit(
        functools.partial(model.apply, test_mode=True),
        in_shardings=(repl, rows, rows),
        out_shardings=(repl, repl),
    )
    # warm
    float(jnp.sum(fn(vars_, im1, im2)[1]))
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_combo"
    jax.profiler.start_trace(out_dir)
    float(jnp.sum(fn(vars_, im1, im2)[1]))
    jax.profiler.stop_trace()
    top_ops(out_dir)


if __name__ == "__main__":
    main()
