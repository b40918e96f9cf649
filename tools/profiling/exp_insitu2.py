"""In-situ bisection of the FULL per-iteration budget: stub each
update-block component (motion encoder, aggregation read, SepConvGRU,
flow head, corr lookup) out of the real 64-frame streaming window and
measure the slope. The round-2 lesson says microbenches mislead
(XLA layout propagation is global); this measures each component's
cost inside the production graph.

Usage: exp_insitu2.py [base|lookup|motenc|aggregate|gru|flowhead|all]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import atdn_vslam_tpu.models.flow.network as fnet_mod
import atdn_vslam_tpu.models.flow.update as upd_mod
from atdn_vslam_tpu.models.flow import RAFTGMA

H = int(os.environ.get("INSITU_H", 376))
W = int(os.environ.get("INSITU_W", 1232))
N_FRAMES = int(os.environ.get("INSITU_FRAMES", 64))


def bench(label, reps=3):
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    flow_vars = jax.jit(flow_model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )

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
    real_gru = upd_mod.SepConvGRU.__call__
    real_motenc = upd_mod.BasicMotionEncoder.__call__
    real_flowhead = upd_mod.FlowHead.__call__
    from atdn_vslam_tpu.models.flow import gma as gma_mod
    real_agg = gma_mod.Aggregate.__call__

    def stub_lookup(pyramid, coords, radius=4):
        b, h1, w1, _ = coords.shape
        span = 2 * radius + 1
        nl = len(pyramid)
        s = sum(jnp.sum(p[:, :1].astype(jnp.float32)) for p in pyramid)
        base = jnp.zeros((b, h1, w1, nl * span * span), jnp.float32)
        return base + (jnp.sum(coords) + s) * 1e-30

    def stub_gru(self, h, x, static=None, compute_static=False):
        # keep deps on h and x, skip all four convs
        if compute_static:
            # hoist-prologue call: return 4 scalar placeholders
            z = jnp.sum(x) * jnp.asarray(1e-30, x.dtype)
            return (z, z, z, z)
        dep = jnp.sum(x) * jnp.asarray(1e-30, h.dtype)
        if static is not None:
            for s in static:
                dep = dep + jnp.sum(s).astype(h.dtype) * jnp.asarray(
                    1e-30, h.dtype
                )
        return h + dep

    def stub_motenc(self, flow, corr):
        b, h, w, _ = flow.shape
        base = jnp.zeros(
            (b, h, w, 126),
            flow.dtype if corr.dtype == flow.dtype else corr.dtype,
        )
        dep = (jnp.sum(corr) + jnp.sum(flow)) * jnp.asarray(
            1e-30, base.dtype
        )
        return jnp.concatenate([base + dep, flow.astype(base.dtype)], -1)

    def stub_agg(self, q, k, v, bias=None, probs=None):
        dep = jnp.asarray(0.0, v.dtype)
        for t in (q, k, bias, probs):
            if t is not None:
                dep = dep + jnp.sum(t).astype(v.dtype) * jnp.asarray(
                    1e-30, v.dtype
                )
        return v + dep

    def stub_flowhead(self, x):
        return x[..., :2] * jnp.asarray(1e-3, x.dtype)

    if which in ("all", "base"):
        bench("baseline (everything real)")
    if which in ("all", "lookup"):
        fnet_mod.lookup_corr_pyramid = stub_lookup
        bench("corr lookup stubbed")
        fnet_mod.lookup_corr_pyramid = real_lookup
    if which in ("all", "motenc"):
        upd_mod.BasicMotionEncoder.__call__ = stub_motenc
        bench("motion encoder stubbed")
        upd_mod.BasicMotionEncoder.__call__ = real_motenc
    if which in ("all", "aggregate"):
        gma_mod.Aggregate.__call__ = stub_agg
        bench("aggregation (P@V read + projections) stubbed")
        gma_mod.Aggregate.__call__ = real_agg
    if which in ("all", "gru"):
        upd_mod.SepConvGRU.__call__ = stub_gru
        bench("SepConvGRU stubbed")
        upd_mod.SepConvGRU.__call__ = real_gru
    if which in ("all", "flowhead"):
        upd_mod.FlowHead.__call__ = stub_flowhead
        bench("flow head stubbed")
        upd_mod.FlowHead.__call__ = real_flowhead


if __name__ == "__main__":
    main()
