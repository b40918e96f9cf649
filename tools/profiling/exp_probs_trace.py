"""Trace the probs-materialization op alone and tabulate its kernels:
which of the ~1.7 ms (chip-measured, exp_probs2.py) goes to the stats
pass, the write pass, and any surrounding copies.
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

from atdn_vslam_tpu.ops.attention import _flash_probs_impl  # noqa: E402

H8, W8, D = 47, 154, 128
N = H8 * W8
REPS = 10
K_OUTER = os.environ.get("PROBS_K_OUTER", "1") == "1"


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, N, D)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, N, D)) * 0.5, jnp.bfloat16)

    @jax.jit
    def loop(q, k):
        def body(c, _):
            p = _flash_probs_impl(
                q + c, k, H8, W8, 1.0, keep_padded=True, k_outer=K_OUTER
            )
            return jnp.sum(p[0, 0, 0, :8]).astype(q.dtype) * 1e-20, None

        out, _ = jax.lax.scan(
            body, jnp.asarray(0, q.dtype), None, length=REPS
        )
        return out

    float(loop(q, k))
    trace_dir = "/tmp/trace_probs"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    float(loop(q, k))
    jax.profiler.stop_trace()

    files = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    ev = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            ev.extend(json.load(fh).get("traceEvents", []))
    durs, counts = {}, {}
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            n = e.get("name", "?")
            durs[n] = durs.get(n, 0) + e["dur"]
            counts[n] = counts.get(n, 0) + 1
    rows = sorted(durs.items(), key=lambda kv: -kv[1])
    print(f"k_outer={K_OUTER}; per-call times (us total / {REPS} reps):")
    for n, d in rows[:25]:
        print(f"{d/REPS:9.1f} us/call x{counts[n]:4d}  {n[:90]}")


if __name__ == "__main__":
    main()
