"""Round-5 VERDICT item 6: pin the pose-graph solver scaling envelope.

The dense path materializes a (6N, 6N) normal matrix (36 N^2 floats)
and pays an O(N^3) Cholesky per GN iteration; the round-4 number
(43 ms) was measured only at N=200. This harness chip-times both the
dense and the matrix-free block-Jacobi PCG solver on synthetic
chain+closure graphs at N up to a few thousand, records the dense
matrix footprint, and checks the solvers agree.

Usage: python exp_r5_posegraph.py [sizes...]   (default 200 500 1000 2000)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

from atdn_vslam_tpu.geometry.pose_graph import (  # noqa: E402
    odometry_edges,
    optimize_pose_graph,
    se3_exp,
)
from atdn_vslam_tpu.geometry.se3 import se3_inverse  # noqa: E402


def build_graph(n, closure_every=50, seed=0):
    rng = np.random.default_rng(seed)
    xi = np.concatenate(
        [
            rng.normal(scale=0.3, size=(n - 1, 3)),
            rng.normal(scale=0.02, size=(n - 1, 3)),
        ],
        axis=-1,
    ).astype(np.float32)
    steps = se3_exp(jnp.asarray(xi))
    gt = [jnp.eye(4)]
    for i in range(n - 1):
        gt.append(gt[-1] @ steps[i])
    gt = jnp.stack(gt)
    noise = np.concatenate(
        [
            rng.normal(scale=0.05, size=(n - 1, 3)),
            rng.normal(scale=0.005, size=(n - 1, 3)),
        ],
        axis=-1,
    ).astype(np.float32)
    meas = steps @ se3_exp(jnp.asarray(noise))
    init = [jnp.eye(4)]
    for i in range(n - 1):
        init.append(init[-1] @ meas[i])
    init = jnp.stack(init)
    lc_j = jnp.arange(closure_every, n, closure_every)
    lc_i = jnp.maximum(lc_j - n, 0) * 0
    lc = se3_inverse(gt[lc_i]) @ gt[lc_j]
    ei, ej = odometry_edges(n)
    edges_i = jnp.concatenate([ei, lc_i])
    edges_j = jnp.concatenate([ej, lc_j])
    measurements = jnp.concatenate([meas, lc])
    weights = jnp.concatenate(
        [jnp.ones(n - 1), 100.0 * jnp.ones(len(lc_j))]
    )
    return init, gt, edges_i, edges_j, measurements, weights


def timeit(fn, *args, reps=3, **kw):
    # Value-fence with a HOST TRANSFER, not jax.block_until_ready:
    # through the axon tunnel block_until_ready on the output tuple
    # returned instantly (measured 0.1 ms for a 1000-matvec solve)
    # while float(scalar) reports the honest 0.23 s — the remote
    # execution completes asynchronously and only a transfer waits.
    out = fn(*args, **kw)
    float(jnp.asarray(out[1]))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        float(jnp.asarray(out[1]))
        best = min(best, time.perf_counter() - t0)
    return best, out


def err(poses, gt):
    return float(
        jnp.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1).mean()
    )


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [200, 500, 1000, 2000]
    print(f"{'N':>6} {'E':>6} {'dense MB':>9} {'dense s':>9} "
          f"{'cg s':>9} {'err0':>8} {'errD':>8} {'errCG':>8}")
    for n in sizes:
        init, gt, ei, ej, meas, w = build_graph(n)
        e = int(ei.shape[0])
        dense_mb = 36 * n * n * 4 / 1e6
        e0 = err(init, gt)
        try:
            td, (od, _) = timeit(
                optimize_pose_graph, init, ei, ej, meas, w,
                iterations=10, solver="dense",
            )
            ed = err(od, gt)
        except Exception as ex:  # OOM expected at large N
            td, ed = float("nan"), float("nan")
            print(f"  dense failed at N={n}: {type(ex).__name__}")
        tc, (oc, _) = timeit(
            optimize_pose_graph, init, ei, ej, meas, w,
            iterations=10, solver="cg", cg_iterations=100,
        )
        ec = err(oc, gt)
        print(f"{n:>6} {e:>6} {dense_mb:>9.1f} {td:>9.4f} "
              f"{tc:>9.4f} {e0:>8.3f} {ed:>8.3f} {ec:>8.3f}")


if __name__ == "__main__":
    main()
