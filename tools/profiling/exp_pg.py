"""Decompose the pose-graph GN iteration on chip: edge-Jacobian +
scatter assembly vs the dense (1194^2) factorization/solve.

Variants: chol (cho_factor+cho_solve on a damped random SPD), lu
(jnp.linalg.solve), assembly (one gn_step with the solve replaced by a
diagonal scale).
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
    edge_residuals,
    se3_exp,
)
from atdn_vslam_tpu.geometry.se3 import se3_inverse  # noqa: E402

N = 200
M = (N - 1) * 6


def timeit(label, fn, *args, reps=5):
    jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:.1f} ms", flush=True)


rng = np.random.default_rng(0)
A_np = rng.normal(size=(M, M)).astype(np.float32)
A = jnp.asarray(A_np @ A_np.T + M * np.eye(M, dtype=np.float32))
b = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))

which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "chol"):
    @jax.jit
    def chol(A, b):
        L = jax.scipy.linalg.cho_factor(A, lower=True)
        return jax.scipy.linalg.cho_solve(L, b)

    timeit(f"cho_factor+solve ({M}x{M})", chol, A, b)

if which in ("all", "lu"):
    @jax.jit
    def lu(A, b):
        return jnp.linalg.solve(A, b)

    timeit(f"lu solve ({M}x{M})", lu, A, b)

if which in ("all", "assembly"):
    poses = np.tile(np.eye(4, dtype=np.float32), (N, 1, 1))
    poses[:, 2, 3] = np.arange(N)
    poses = jnp.asarray(poses)
    ei = jnp.arange(N - 1)
    ej = ei + 1
    meas = se3_inverse(poses[ei]) @ poses[ej]
    sqrt_w = jnp.ones((N - 1, 1), jnp.float32)

    def edge_res(di, dj, xi, xj, z, sw):
        from atdn_vslam_tpu.geometry.pose_graph import se3_log

        pred = se3_inverse(xi @ se3_exp(di)) @ (xj @ se3_exp(dj))
        return se3_log(se3_inverse(z) @ pred) * sw

    edge_jac = jax.vmap(
        jax.jacfwd(edge_res, argnums=(0, 1)),
        in_axes=(None, None, 0, 0, 0, 0),
    )

    @jax.jit
    def assemble(cur):
        xi, xj = cur[ei], cur[ej]
        r0 = edge_residuals(cur, ei, ej, meas) * sqrt_w
        zero6 = jnp.zeros((6,), jnp.float32)
        ji, jj = edge_jac(zero6, zero6, xi, xj, meas, sqrt_w)
        jtj = jnp.zeros((N, 6, N, 6), jnp.float32)
        jtj = jtj.at[ei, :, ei, :].add(jnp.einsum("era,erb->eab", ji, ji))
        jtj = jtj.at[ej, :, ej, :].add(jnp.einsum("era,erb->eab", jj, jj))
        jtj = jtj.at[ei, :, ej, :].add(jnp.einsum("era,erb->eab", ji, jj))
        jtj = jtj.at[ej, :, ei, :].add(jnp.einsum("era,erb->eab", jj, ji))
        rhs = jnp.zeros((N, 6), jnp.float32)
        rhs = rhs.at[ei].add(-jnp.einsum("era,er->ea", ji, r0))
        rhs = rhs.at[ej].add(-jnp.einsum("era,er->ea", jj, r0))
        return jnp.sum(jtj) + jnp.sum(rhs)

    timeit("assembly only (1 iter)", assemble, poses)
