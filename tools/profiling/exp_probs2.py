"""Decompose the probs-materialization pipeline on chip (round 4).

The fixed-cost bisection charges ~1.5 ms/frame to the probs stage —
far above the analytic floor (2 x 27 GF dots ~0.28 ms + 105 MB write
~0.13 ms + exps). Hypothesis: the WRITE pass's grid iterates key
blocks INSIDE each image row, re-fetching the 2 MB key operand once
per row (~750 MB/frame of redundant HBM traffic). Variants:

  current    flash_probs_spatial keep_padded (k_outer=True default)
  rowmajor   the round-3 grid order (k innermost, re-fetch per row)
  xla        einsum+softmax spatial materialization (the non-Pallas
             path) for reference

Timing: serial-dependent loop amortizing dispatch (value-fenced).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from atdn_vslam_tpu.ops.attention import (  # noqa: E402
    _flash_probs_impl,
    attention_probs_spatial,
)

H8, W8, D = 47, 154, 128
N = H8 * W8
REPS = 20


def timeit(label, fn, *args):
    @jax.jit
    def loop(q, k):
        def body(c, _):
            # serial dependence: perturb q by a value derived from the
            # previous output so iterations cannot overlap/fold
            p = fn(q + c, k)
            return jnp.sum(p[0, 0, 0, :8]).astype(q.dtype) * 1e-20, None

        out, _ = jax.lax.scan(body, jnp.asarray(0, q.dtype), None, length=REPS)
        return out

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, N, D)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, N, D)) * 0.5, jnp.bfloat16)
    float(loop(q, k))  # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(q, k))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{label}: {best*1e3:.3f} ms/call", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "current"):
    timeit(
        "k_outer write (new)",
        lambda q, k: _flash_probs_impl(
            q, k, H8, W8, 1.0, keep_padded=True, k_outer=True
        ),
    )
if which in ("all", "rowmajor"):
    timeit(
        "row-major write (round-3)",
        lambda q, k: _flash_probs_impl(
            q, k, H8, W8, 1.0, keep_padded=True, k_outer=False
        ),
    )
if which in ("all", "xla"):
    timeit(
        "xla einsum+softmax",
        lambda q, k: attention_probs_spatial(
            q, k, H8, W8, scale=1.0, use_pallas=False
        ),
    )
