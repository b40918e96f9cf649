"""In-situ bisection of the FIXED (per-frame, iteration-independent)
cost of the streaming flow window: stub each fixed-stage component out
of the real 64-frame window and measure the drop. Complements
exp_insitu2.py (which bisects the per-iteration components).

Components: fnet (new-frame feature encode), cnet (context encode),
probs (attention QK+softmax materialization), upsample (final mask head
+ convex upsample), pyramid (correlation pyramid build).

Usage: exp_fixedcost.py [base|fnet|cnet|probs|upsample|pyramid|all]
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

import atdn_vslam_tpu.models.flow.network as net_mod
import atdn_vslam_tpu.models.flow.extractor as ext_mod
import atdn_vslam_tpu.ops.attention as attn_mod
import atdn_vslam_tpu.ops.upsample as ups_mod
import atdn_vslam_tpu.ops.corr_lookup as corr_mod
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

    real_enc_call = ext_mod.BasicEncoder.__call__
    real_probs = attn_mod.attention_probs_spatial
    real_ups = ups_mod.convex_upsample
    real_build = corr_mod.build_corr_pyramid
    # network.py imported names directly: patch its module globals too
    real_net_probs = net_mod.attention_probs_spatial
    real_net_build = net_mod.build_corr_pyramid
    real_net_ups = net_mod.convex_upsample

    def stub_enc_call(self, x, train=False, preformatted=False):
        # keep the param tree by initializing normally; at apply time
        # replace compute with a cheap projection that still depends on
        # every input pixel (sum) so nothing upstream is dead
        if self.is_initializing():
            return real_enc_call(self, x, train, preformatted)
        b = x.shape[0]
        s = 4 if preformatted else 8  # s2d input is half-res, 4C
        h8, w8 = x.shape[1] // s, x.shape[2] // s
        dep = jnp.sum(x).astype(self.dtype) * jnp.asarray(1e-30, self.dtype)
        base = x[:, ::s, ::s, :1].astype(self.dtype)
        out = jnp.zeros((b, h8, w8, self.output_dim), self.dtype)
        return out + base * jnp.asarray(1e-30, self.dtype) + dep

    def stub_probs(q, k, h, w, scale=1.0, bias=None, position_only=False,
                   use_pallas=None, mesh=None, axis=None):
        # CONFOUND WARNING (measured): a broadcast-like stub (uniform +
        # tiny dep) lets XLA compute the probs on the fly — the 12
        # per-iteration 105 MB HBM reads vanish too, so the stub slope
        # measures materialization + ALL iteration reads (~1.56
        # ms/frame), not materialization alone (~0.3). Materialize
        # NON-compressible values (outer product of the inputs) so only
        # the build cost is removed.
        bh, n, d = q.shape
        qr = q[..., :1].reshape(bh, h, w, 1).astype(jnp.bfloat16)
        kr = k[..., 0].astype(jnp.bfloat16)  # (bh, n)
        return qr * kr[:, None, None, :] * jnp.asarray(
            1e-3, jnp.bfloat16
        )

    def stub_ups(flow, mask):
        up = jax.image.resize(
            flow, (flow.shape[0], flow.shape[1] * 8, flow.shape[2] * 8, 2),
            "nearest",
        )
        return 8.0 * up + jnp.sum(mask) * 1e-30

    def stub_build(fmap1, fmap2, num_levels=4, dtype=jnp.float32):
        # CONFOUND WARNING (same as probs): zeros+scalar is broadcast-
        # compressible — the 12 per-iteration lookup reads of the
        # volume then degenerate too, so the stub slope measured ~3.2
        # ms (build + ALL iteration reads), not the build alone.
        # Materialize NON-compressible per-entry values (rank-1 outer
        # products of the real feature maps) at the true size.
        b, h1, w1, c = fmap1.shape
        out = []
        hl, wl = fmap2.shape[1], fmap2.shape[2]
        f1 = fmap1[..., 0].reshape(b, h1 * w1, 1, 1, 1)
        for level in range(num_levels):
            f2 = jax.image.resize(
                fmap2[..., :1], (b, hl, wl, 1), "nearest"
            ).reshape(b, 1, hl, wl, 1)
            vol = (f1 * f2).astype(jnp.float32) * 1e-3
            out.append(vol.astype(dtype))
            hl, wl = hl // 2, wl // 2
        return out

    if which in ("all", "base"):
        bench("baseline (everything real)")
    if which in ("all", "fnet"):
        # fnet AND cnet share BasicEncoder.__call__ — this stubs both
        ext_mod.BasicEncoder.__call__ = stub_enc_call
        bench("BOTH encoders (fnet+cnet) stubbed")
        ext_mod.BasicEncoder.__call__ = real_enc_call
    if which in ("all", "fnetonly", "split"):
        # split by norm type: fnet is instance-norm, cnet batch-norm
        def stub_fnet_only(self, x, train=False):
            if self.norm == "instance":
                return stub_enc_call(self, x, train)
            return real_enc_call(self, x, train)

        ext_mod.BasicEncoder.__call__ = stub_fnet_only
        bench("fnet (instance-norm) only stubbed")
        ext_mod.BasicEncoder.__call__ = real_enc_call
    if which in ("all", "cnetonly", "split"):
        def stub_cnet_only(self, x, train=False):
            if self.norm != "instance":
                return stub_enc_call(self, x, train)
            return real_enc_call(self, x, train)

        ext_mod.BasicEncoder.__call__ = stub_cnet_only
        bench("cnet (batch-norm) only stubbed")
        ext_mod.BasicEncoder.__call__ = real_enc_call
    if which in ("all", "probs"):
        net_mod.attention_probs_spatial = stub_probs
        bench("probs materialization stubbed")
        net_mod.attention_probs_spatial = real_net_probs
    if which in ("all", "upsample"):
        net_mod.convex_upsample = stub_ups
        bench("convex upsample stubbed")
        net_mod.convex_upsample = real_net_ups
    if which in ("all", "pyramid"):
        net_mod.build_corr_pyramid = stub_build
        bench("pyramid build stubbed")
        net_mod.build_corr_pyramid = real_net_build


if __name__ == "__main__":
    main()
