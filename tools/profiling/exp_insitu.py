"""In-situ bisection of the per-iteration cost inside the real
streaming window: stub out components one at a time and re-measure."""
import sys
import time
import jax
import jax.numpy as jnp
import numpy as np

import atdn_vslam_tpu.models.flow.network as fnet_mod
from atdn_vslam_tpu.models.flow import RAFTGMA

H, W = 376, 1232
N_FRAMES = 64

def bench(label, reps=3):
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32))
    flow_vars = jax.jit(flow_model.init)(jax.random.key(0), frames[:1], frames[1:2])

    @jax.jit
    def run_window(flow_vars, frames):
        def step(carry, pair):
            pose, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = flow_model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            pose = pose + jnp.sum(flow.astype(jnp.float32)) * 1e-30
            return (pose, fmap2), None
        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        (pose, _), _ = jax.lax.scan(step, (jnp.float32(0), fmap0), pairs)
        return pose

    np.asarray(run_window(flow_vars, frames))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run_window(flow_vars, frames))
        best = min(best, (time.perf_counter() - t0) / N_FRAMES)
    print(f"{label}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)", flush=True)
    return best

def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    real_lookup = fnet_mod.lookup_corr_pyramid

    def stub_lookup(pyramid, coords, radius=4):
        b, h1, w1, _ = coords.shape
        span = 2 * radius + 1
        nl = len(pyramid)
        # keep a data dependence on coords + pyramid so nothing else is DCE'd
        s = sum(jnp.sum(p[:, :1].astype(jnp.float32)) for p in pyramid)
        base = jnp.zeros((b, h1, w1, nl * span * span), jnp.float32)
        return base + (jnp.sum(coords) + s) * 1e-30

    if which in ("all", "base"):
        bench("baseline (real lookup)")
    if which in ("all", "stub"):
        fnet_mod.lookup_corr_pyramid = stub_lookup
        bench("lookup stubbed")
        fnet_mod.lookup_corr_pyramid = real_lookup

if __name__ == "__main__":
    main()
