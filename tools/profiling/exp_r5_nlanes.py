"""Round-5 VERDICT item 1: n-in-lanes L1-L3 corr lookup, full-window
A/B on one chip, both variants in one process (same-process deltas
only — STATUS round-4 drift caveat).
"""

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

H, W, N_FRAMES = 376, 1232, 64


def bench_variant(tag, frames, **flags):
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16, **flags)
    odo_model = ATDNVO()
    flow_vars = jax.jit(flow_model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )
    odo_vars = jax.jit(odo_model.init)(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
        odo_model.init_carry(1),
    )

    @jax.jit
    def run_window(flow_vars, odo_vars, frames):
        def step(carry, pair):
            lstm_carry, pose, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = flow_model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True,
            )
            (rot, tr), lstm_carry = odo_model.apply(
                odo_vars, flow[:, None], lstm_carry
            )
            pose = pose @ pose_to_matrix(rot[0, 0], tr[0, 0])
            return (lstm_carry, pose, fmap2), None

        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        init = (odo_model.init_carry(1), jnp.eye(4), fmap0)
        (_, pose, _), _ = jax.lax.scan(step, init, pairs)
        return pose

    pose = np.asarray(run_window(flow_vars, odo_vars, frames))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(run_window(flow_vars, odo_vars, frames))
        best = min(best, (time.perf_counter() - t0) / N_FRAMES)
    print(
        f"{tag}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)", flush=True
    )
    return pose, best


def main():
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    order = sys.argv[1:] or ["base", "nlanes"]
    poses = {}
    for tag in order:
        poses[tag], _ = bench_variant(
            tag, frames, corr_nlanes=(tag == "nlanes")
        )
    if len(poses) == 2:
        a, b = poses.values()
        print(f"final-pose max delta: {np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    main()
