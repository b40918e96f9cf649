"""A/B: stem space-to-depth via reshape+transpose (current, traced at
~0.5 ms/frame for the one remaining per-frame format) vs a one-hot
2x2-stride-2 convolution (exact same values; XLA's conv lowering may
beat its transpose lowering for the 3-channel-minor layout).

Full 64-frame window A/B (the repo's in-situ discipline).
Usage: exp_s2dconv.py [conv|base]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

import atdn_vslam_tpu.ops.stem_conv as sc  # noqa: E402

H, W, N_FRAMES = 376, 1232, 64


def stem_s2d_conv(x: jax.Array) -> jax.Array:
    """stem_s2d as a one-hot conv: out[a,b,(p,q,c)] = x[2a+p, 2b+q, c]."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError("stem_s2d requires even H, W")
    k = np.zeros((2, 2, c, 4 * c), x.dtype)
    for p in range(2):
        for q in range(2):
            for ci in range(c):
                k[p, q, ci, (p * 2 + q) * c + ci] = 1.0
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(k), (2, 2), "VALID", dimension_numbers=dn
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "conv"
    if which == "conv":
        # patch both the module global and the network import
        import atdn_vslam_tpu.models.flow.network as net_mod

        sc.stem_s2d = stem_s2d_conv
        net_mod.stem_s2d = stem_s2d_conv

    from atdn_vslam_tpu.geometry.se3 import pose_to_matrix
    from atdn_vslam_tpu.models.flow import RAFTGMA
    from atdn_vslam_tpu.models.odometry import ATDNVO

    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    odo_model = ATDNVO()
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
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

    np.asarray(run_window(flow_vars, odo_vars, frames))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_window(flow_vars, odo_vars, frames))
        best = min(best, (time.perf_counter() - t0) / N_FRAMES)
    print(f"s2d={which}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)")


if __name__ == "__main__":
    main()
