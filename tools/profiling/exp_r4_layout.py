"""Round-4 fixed-stage layout attacks, A/B'd on the full streaming
window (flow-only, 12 iters).

Trace evidence (exp_trace_window, 8 frames): the fixed stage carries
~0.96 ms/frame of PURE layout copies:

  copy.1311/1313/1314/1315  (~0.45 ms) — the pyramid build dot
      "bnc,bhwc->bnhw" emits [h][w][n] (n in lanes:
      EmitOutputBatchInLanes) but the update-loop carry wants
      [n][h][w] (w in lanes, the lookup's batched-matmul operand
      layout) -> a 105 MB relayout copy of L0 + the smaller levels.
  reshape.2606 + copy.1299   (~0.51 ms) — the stem s2d format's
      6-D reshape/transpose runs at ~10 GB/s: its intermediate
      layouts put a 2-wide or 3-wide dim in the lanes.

Variants:
  base      production code
  pyr       build the pyramid dot c-major: "bnc,bcm->bnm" on a
            pre-transposed (b, c, m) f2 — the (n, m) dot output has m
            in lanes, which IS the carry layout [n][h][w]; the
            transpose moves the 1.8 MB feature map instead of the
            105 MB volume
  stem      planar stem-format contract: stem_s2d emits (B, 4C, H/2,
            W/2) NCHW (per-plane 2-D slices, every intermediate
            lane dim full-width) and the s2d conv consumes it with
            NCHW dimension numbers — the conv's preferred input
            layout is already channel-planar ([12][188][616],
            bitcast.1437 in the window HLO)
  pyr+stem  both

Each variant is equality-checked against base (final flow) before
timing. Timing: N_FRAMES-frame scanned window, value-fenced, best of
3; reported per frame.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from atdn_vslam_tpu.models.flow import network as net_mod  # noqa: E402
from atdn_vslam_tpu.models.flow import extractor as ext_mod  # noqa: E402
from atdn_vslam_tpu.models.flow import RAFTGMA  # noqa: E402
from atdn_vslam_tpu.ops import stem_conv  # noqa: E402

H, W = 376, 1232
N_FRAMES = 32


def build_corr_pyramid_cmajor(fmap1, fmap2, num_levels=4,
                              dtype=jnp.float32):
    b, h1, w1, c = fmap1.shape
    f1 = fmap1.reshape(b, h1 * w1, c)
    inv_sqrt_c = 1.0 / float(np.sqrt(c))
    pyramid = []
    f2l = fmap2
    hl, wl = fmap2.shape[1:3]
    for level in range(num_levels):
        f2t = jnp.swapaxes(f2l.reshape(b, hl * wl, c), 1, 2)
        corr = jnp.einsum(
            "bnc,bcm->bnm", f1, f2t, preferred_element_type=jnp.float32,
        ) * inv_sqrt_c
        corr = corr.reshape(b, h1 * w1, hl, wl)
        pyramid.append(corr[..., None].astype(dtype))
        if level < num_levels - 1:
            h2_, w2_ = hl // 2, wl // 2
            f2l = f2l[:, : h2_ * 2, : w2_ * 2]
            f2l = f2l.reshape(b, h2_, 2, w2_, 2, c).astype(jnp.float32)
            f2l = f2l.mean(axis=(2, 4)).astype(fmap2.dtype)
            hl, wl = h2_, w2_
    return pyramid


def stem_s2d_planar(x):
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError("stem_s2d requires even H, W")
    xp = jnp.transpose(x, (0, 3, 1, 2))               # (B, C, H, W)
    xp = xp.reshape(b, c, h // 2, 2, w // 2, 2)       # (B,C,a,p,b,q)
    xp = jnp.transpose(xp, (0, 3, 5, 1, 2, 4))        # (B,p,q,C,a,b)
    return xp.reshape(b, 4 * c, h // 2, w // 2)


def conv7x7s2_s2d_planar(x, kernel, bias=None, preformatted=False):
    kh, kw, cin, cout = kernel.shape
    assert kh == 7 and kw == 7
    xs = x if preformatted else stem_s2d_planar(x)
    idx = np.array([[2 * ka + p - 1 for p in range(2)] for ka in range(4)])
    valid = (idx >= 0) & (idx <= 6)
    kk = kernel[np.clip(idx, 0, 6)]
    kk = kk[:, :, np.clip(idx, 0, 6)]
    mask = (valid[:, :, None, None] & valid[None, None]).astype(kernel.dtype)
    kk = kk * mask[..., None, None]
    kk = kk.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * cin, cout)
    out = jax.lax.conv_general_dilated(
        xs, kk, (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NCHW", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def make_window(flow_model):
    @jax.jit
    def run_window(flow_vars, frames):
        def step(carry, pair):
            acc, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = flow_model.apply(
                flow_vars, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            acc = acc + jnp.sum(flow.astype(jnp.float32)) * 1e-30
            return (acc, fmap2), flow[0, 0, 0]
        pairs = (frames[:-1], frames[1:])
        fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
        (acc, _), probe = jax.lax.scan(
            step, (jnp.float32(0), fmap0), pairs
        )
        return acc, probe
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

    base_pyr = net_mod.build_corr_pyramid
    base_stem = net_mod.stem_s2d
    base_conv = ext_mod.conv7x7s2_s2d

    import functools

    xla_pyr = functools.partial(base_pyr, use_pallas=False)
    pallas_pyr = functools.partial(base_pyr, use_pallas=True)
    variants = {
        "base": (xla_pyr, base_stem, base_conv),
        "pyr-pallas": (pallas_pyr, base_stem, base_conv),
        # the planar stem variants need the flagged production
        # implementation (StemConv7x7s2 infers cin from the last dim) —
        # see ops/stem_conv.py planar mode; select via argv
    }
    if "stem" in sys.argv:
        # planar stem via the production flag (RAFTGMA.planar_stem)
        def instance_norm_twopass(x, eps=1e-5):
            mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
            var = jnp.var(x, axis=(-3, -2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + eps)

        new_in = ext_mod.instance_norm
        variants = {}
        ref_probe = None
        for label, planar, in_fn in (
            ("base", False, new_in),
            ("stem-planar", True, new_in),
            ("old-2pass-in", False, instance_norm_twopass),
        ):
            ext_mod.instance_norm = in_fn
            net_mod.build_corr_pyramid = xla_pyr
            m = RAFTGMA(iters=12, dtype=jnp.bfloat16, planar_stem=planar)
            run = make_window(m)
            acc, probe = run(flow_vars, frames)
            probe = np.asarray(probe, np.float32)
            if ref_probe is None:
                ref_probe = probe
                eq = "ref"
            else:
                d = float(np.max(np.abs(probe - ref_probe)))
                eq = f"max|dflow|={d:.2e}"
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(flow_vars, frames)[0])
                best = min(best, time.perf_counter() - t0)
            print(f"{label:11s}: {best / N_FRAMES * 1e3:7.3f} ms/frame"
                  f"  ({eq})", flush=True)
        net_mod.build_corr_pyramid = base_pyr
        ext_mod.instance_norm = new_in
        return

    ref_probe = None
    for label, (pyr, stem, conv) in variants.items():
        net_mod.build_corr_pyramid = pyr
        net_mod.stem_s2d = stem
        ext_mod.conv7x7s2_s2d = conv
        run = make_window(flow_model)
        acc, probe = run(flow_vars, frames)
        probe = np.asarray(probe, np.float32)
        if ref_probe is None:
            ref_probe = probe
            eq = "ref"
        else:
            d = float(np.max(np.abs(probe - ref_probe)))
            eq = f"max|dflow|={d:.2e}"
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(flow_vars, frames)[0])
            best = min(best, time.perf_counter() - t0)
        print(
            f"{label:9s}: {best / N_FRAMES * 1e3:7.3f} ms/frame  ({eq})",
            flush=True,
        )
    net_mod.build_corr_pyramid = base_pyr
    net_mod.stem_s2d = base_stem
    ext_mod.conv7x7s2_s2d = base_conv


if __name__ == "__main__":
    main()
