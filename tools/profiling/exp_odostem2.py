"""A/B the ATDNVO stem lowering on the FULL bench window (round 4).

The odometry tail traces at ~1.66 ms/frame, ~0.8 ms of it the 7x7 s2
stem on the full-res f32 flow (0.56 conv + 0.25 input formatting).
The round-1 reshape/transpose s2d REGRESSED here (34.0 -> 33.5 fps) —
blamed on the input relayout, which the one-hot-matmul s2d deletes.
Variants: direct conv (production) vs ConvBlock.s2d_planar (exact to
f32 rounding, same params).
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

H, W = 376, 1232
N_FRAMES = 32


def make_window(flow_model, odo_model):
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
        (carry, pose, _), _ = jax.lax.scan(step, init, pairs)
        return pose

    return run_window


def main():
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    flow_vars = jax.jit(flow_model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )
    odo0 = ATDNVO()
    odo_vars = jax.jit(odo0.init)(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)), odo0.init_carry(1)
    )

    ref = None
    for label, odo in (
        ("direct-conv", odo0),
        ("s2d-matmul", ATDNVO(stem_s2d_planar=True)),
    ):
        run = make_window(flow_model, odo)
        pose = np.asarray(run(flow_vars, odo_vars, frames))
        if ref is None:
            ref = pose
            eq = "ref"
        else:
            eq = f"max|dpose|={float(np.max(np.abs(pose - ref))):.2e}"
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(flow_vars, odo_vars, frames))
            best = min(best, time.perf_counter() - t0)
        print(
            f"{label:12s}: {best / N_FRAMES * 1e3:7.3f} ms/frame ({eq})",
            flush=True,
        )


if __name__ == "__main__":
    main()
