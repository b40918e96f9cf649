"""Decompose the streaming pipeline per-frame cost: vary GMA iters,
toggle odometry, and vary window length to expose the dispatch floor."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.geometry.se3 import pose_to_matrix
from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.models.odometry import ATDNVO

H, W = 376, 1232

def make_run(iters, with_odo, n_frames, frames):
    flow_model = RAFTGMA(iters=iters, dtype=jnp.bfloat16)
    odo_model = ATDNVO()
    flow_vars = jax.jit(flow_model.init)(jax.random.key(0), frames[:1], frames[1:2])
    odo_vars = jax.jit(odo_model.init)(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)), odo_model.init_carry(1))

    @jax.jit
    def run_window(flow_vars, odo_vars, frames):
        def step(carry, pair):
            lstm_carry, pose, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = flow_model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            if with_odo:
                (rot, tr), lstm_carry = odo_model.apply(
                    odo_vars, flow[:, None], lstm_carry)
                pose = pose @ pose_to_matrix(rot[0, 0], tr[0, 0])
            else:
                pose = pose + jnp.sum(flow.astype(jnp.float32)) * 1e-30
            return (lstm_carry, pose, fmap2), None

        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        init = (odo_model.init_carry(1), jnp.eye(4), fmap0)
        (c, pose, _), _ = jax.lax.scan(step, init, pairs)
        return pose

    return lambda: run_window(flow_vars, odo_vars, frames)

def bench(label, iters, with_odo, n_frames, reps=3):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (n_frames + 1, H, W, 3)).astype(np.float32))
    f = make_run(iters, with_odo, n_frames, frames)
    np.asarray(f())
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        best = min(best, (time.perf_counter() - t0) / n_frames)
    print(f"{label}: {best*1e3:.2f} ms/frame  ({1/best:.1f} fps)")
    return best

def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    t12 = bench("iters=12 +odo  n=16", 12, True, 16)
    t12b = bench("iters=12 +odo  n=64", 12, True, 64)
    t2 = bench("iters=2  +odo  n=64", 2, True, 64)
    tno = bench("iters=12 -odo  n=64", 12, False, 64)
    per_iter = (t12b - t2) / 10
    print(f"per-GMA-iteration: {per_iter*1e3:.3f} ms")
    print(f"fixed (encoders+corr+attn+upsample+odo): {(t12b - 12*per_iter)*1e3:.2f} ms")
    print(f"odometry cost: {(t12b - tno)*1e3:.2f} ms")
    print(f"dispatch floor/frame at n=16: {(t12 - t12b)*1e3:.2f} ms (approx)")

if __name__ == "__main__":
    main()
