"""Glue-reduction experiments on the streaming window.

(a) token-major corr: lookup emits (B, N, 324) and the motion
    encoder's 1x1 conv consumes it before the spatial reshape —
    deletes the four (7238, 9, 9) -> (1, 47, 154, 81) relayouts
    (0.13 ms/iter traced) at the cost of one dense (B, N, 256) ->
    spatial reshape. Round 2 measured this SLOWER (34.0 -> 32.2 fps)
    under the old attention layout; re-test after the layout overhaul.
(b) scan_unroll=2: two update iterations stamped per loop step —
    bigger scheduling window for overlapping the async copies.

Usage: exp_glue.py [base|token|unroll2]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import atdn_vslam_tpu.models.flow.network as net_mod
from atdn_vslam_tpu.models.flow import RAFTGMA

H, W = 376, 1232
N_FRAMES = 64


def bench(label, model, reps=3):
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    flow_vars = jax.jit(model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )

    @jax.jit
    def run_window(flow_vars, frames):
        def step(carry, pair):
            pose, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            pose = pose + jnp.sum(flow.astype(jnp.float32)) * 1e-30
            return (pose, fmap2), None
        pairs = (frames[:-1], frames[1:])
        fmap0 = model.apply(flow_vars, frames[:1], encode_only=True)
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
    which = sys.argv[1] if len(sys.argv) > 1 else "base"

    if which == "base":
        bench("base", RAFTGMA(iters=12, dtype=jnp.bfloat16))
    elif which == "token":
        real = net_mod.lookup_corr_pyramid

        def token_lookup(pyramid, coords, radius=4):
            return real(pyramid, coords, radius, spatial_out=False)

        net_mod.lookup_corr_pyramid = token_lookup
        bench("token-major corr", RAFTGMA(iters=12, dtype=jnp.bfloat16))
        net_mod.lookup_corr_pyramid = real
    elif which == "unroll2":
        bench("scan_unroll=2",
              RAFTGMA(iters=12, dtype=jnp.bfloat16, scan_unroll=2))
    elif which == "nostem":
        # direct 7x7 s2 conv instead of space-to-depth: the trace shows
        # the s2d input formatting (reshape+transpose) costs ~0.52
        # ms/frame PER ENCODER while the stem conv itself is ~0.1
        import atdn_vslam_tpu.models.flow.extractor as ext_mod

        def direct_conv(x, kernel, bias):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            out = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=dn,
            )
            return out + bias.astype(out.dtype)

        real = ext_mod.conv7x7s2_s2d
        ext_mod.conv7x7s2_s2d = direct_conv
        bench("direct stem conv (no s2d)",
              RAFTGMA(iters=12, dtype=jnp.bfloat16))
        ext_mod.conv7x7s2_s2d = real
    elif which == "s2dslice":
        # slice-based space-to-depth: 4 strided slices + lane concat
        # instead of the 6D reshape+transpose (traced at ~0.52 ms/frame
        # per encoder of pure input formatting)
        import atdn_vslam_tpu.models.flow.extractor as ext_mod
        import numpy as np2
        from atdn_vslam_tpu.ops import stem_conv as sc

        def s2d_slice(x, kernel, bias=None):
            b, h, w, c = x.shape
            kh, kw, cin, cout = kernel.shape
            xs = jnp.concatenate(
                [x[:, p::2, q::2] for p in range(2) for q in range(2)],
                axis=-1,
            )
            idx = np2.array(
                [[2 * ka + p - 1 for p in range(2)] for ka in range(4)]
            )
            valid = (idx >= 0) & (idx <= 6)
            kk = kernel[np2.clip(idx, 0, 6)]
            kk = kk[:, :, np2.clip(idx, 0, 6)]
            mask = (
                valid[:, :, None, None] & valid[None, None]
            ).astype(kernel.dtype)
            kk = kk * mask[..., None, None]
            kk = kk.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)
            dn = jax.lax.conv_dimension_numbers(
                xs.shape, kk.shape, ("NHWC", "HWIO", "NHWC")
            )
            out = jax.lax.conv_general_dilated(
                xs, kk, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
            )
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out

        real = ext_mod.conv7x7s2_s2d
        ext_mod.conv7x7s2_s2d = s2d_slice
        bench("slice-based s2d stem",
              RAFTGMA(iters=12, dtype=jnp.bfloat16))
        ext_mod.conv7x7s2_s2d = real


if __name__ == "__main__":
    main()
