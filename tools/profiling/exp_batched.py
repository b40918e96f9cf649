"""Batched-vs-streaming flow decomposition (VERDICT round-2 item 3).

Round-2 finding: batched flow (31.3 fps) loses to pairwise streaming
(34.5 fps) — backwards for offline precompute. Hypothesis H1: the
batched path double-encodes every frame (fnet over concat(im1_batch,
im2_batch) = 2B images, where the B+1 unique frames would do; the
streaming scan already reuses each frame's feature map via the carry).

Measures, flow-only (no odometry), value-fenced:
  (a) pairwise streaming scan (feature reuse via carry) — baseline;
  (b) batched B, NO feature reuse (the current precompute path);
  (c) batched B, fnet once over the B+1 unique frames, fmap1/fmap2
      shifted views (the proposed precompute path).
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.flow import RAFTGMA

H = int(os.environ.get("EXB_H", 376))
W = int(os.environ.get("EXB_W", 1232))
N_FRAMES = int(os.environ.get("EXB_FRAMES", 64))
B = int(os.environ.get("EXB_B", 8))


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    vars_ = jax.jit(model.init)(jax.random.key(0), frames[:1], frames[1:2])

    def bench(label, fn, frames_per_call, reps=3):
        float(fn())
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn())
            best = min(best, (time.perf_counter() - t0) / frames_per_call)
        print(f"{label}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)",
              flush=True)
        return best

    # (a) pairwise streaming scan
    @jax.jit
    def run_stream(v, fr):
        def step(carry, pair):
            acc, fmap_prev = carry
            im1, im2 = pair
            (_, flow), fmap2 = model.apply(
                v, im1[None], im2[None], test_mode=True,
                fmap1=fmap_prev, return_features=True)
            return (acc + jnp.sum(flow.astype(jnp.float32)) * 1e-30,
                    fmap2), None
        fmap0 = model.apply(v, fr[:1], encode_only=True)
        (acc, _), _ = jax.lax.scan(
            step, (jnp.float32(0), fmap0), (fr[:-1], fr[1:])
        )
        return acc

    bench("(a) pairwise streaming", lambda: run_stream(vars_, frames),
          N_FRAMES)

    # (b) batched, no feature reuse (current precompute path)
    fwd_plain = jax.jit(
        lambda v, a, b: jnp.sum(
            model.apply(v, a, b, test_mode=True)[1].astype(jnp.float32)
        ) * 1e-30
    )

    def run_batched_plain():
        # async dispatch, ONE fence at the end (a per-call float()
        # would serialize ~35 ms tunnel RPC into every batch)
        accs = [
            fwd_plain(vars_, frames[s:s + B], frames[s + 1:s + B + 1])
            for s in range(0, N_FRAMES, B)
        ]
        return sum(accs[1:], accs[0])

    bench(f"(b) batched B={B}, double-encode", run_batched_plain, N_FRAMES)

    # (c) batched with fnet over the B+1 unique frames
    encode = jax.jit(lambda v, ims: model.apply(v, ims, encode_only=True))
    fwd_reuse = jax.jit(
        lambda v, a, b, f1, f2: jnp.sum(
            model.apply(
                v, a, b, test_mode=True, fmap1=f1, fmap2=f2
            )[1].astype(jnp.float32)
        ) * 1e-30
    )

    def run_batched_reuse():
        accs = []
        fmap_prev = encode(vars_, frames[:1])  # (1, h8, w8, C)
        for s in range(0, N_FRAMES, B):
            new = encode(vars_, frames[s + 1:s + B + 1])  # B new frames
            f1 = jax.tree.map(
                lambda pv, nw: jnp.concatenate([pv, nw[:-1]], axis=0),
                fmap_prev, new,
            )
            accs.append(
                fwd_reuse(
                    vars_, frames[s:s + B], frames[s + 1:s + B + 1],
                    f1, new,
                )
            )
            fmap_prev = jax.tree.map(lambda nw: nw[-1:], new)
        return sum(accs[1:], accs[0])

    bench(f"(c) batched B={B}, fnet reuse", run_batched_reuse, N_FRAMES)

    # (d) chunked streaming: ONE device computation scanning over
    # chunks of B pairs (round 2 measured this collapsing to ~20 fps;
    # now with fnet reuse inside the chunk)
    @jax.jit
    def run_chunked(v, fr):
        n_chunks = N_FRAMES // B
        chunk_starts = jnp.arange(n_chunks) * B

        def chunk_step(carry, s):
            acc, fmap_prev = carry
            im1 = jax.lax.dynamic_slice_in_dim(fr, s, B)
            im2 = jax.lax.dynamic_slice_in_dim(fr, s + 1, B)
            fmaps_new = model.apply(v, im2, encode_only=True)
            f1 = jax.tree.map(
                lambda pv, nw: jnp.concatenate([pv, nw[:-1]], axis=0),
                fmap_prev, fmaps_new,
            )
            _, up = model.apply(
                v, im1, im2, test_mode=True, fmap1=f1, fmap2=fmaps_new
            )
            acc = acc + jnp.sum(up.astype(jnp.float32)) * 1e-30
            return (acc, jax.tree.map(lambda nw: nw[-1:], fmaps_new)), None

        fmap0 = model.apply(v, fr[:1], encode_only=True)
        (acc, _), _ = jax.lax.scan(
            chunk_step, (jnp.float32(0), fmap0), chunk_starts
        )
        return acc

    bench(f"(d) chunked scan B={B}, fnet reuse",
          lambda: run_chunked(vars_, frames), N_FRAMES)


if __name__ == "__main__":
    main()
