"""Microbench: where do the feature-encoder milliseconds go?

Times the full BasicEncoder at KITTI res (batch 1) and ablations:
no-norm, f32 vs bf16, and the individual conv shapes standalone.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from atdn_vslam_tpu.models.flow.extractor import BasicEncoder

H, W = 376, 1232


def timeit(fn, *args, reps=5, inner=32):
    """Serial-dependent scan: each iteration's input depends on the
    previous iteration's output, so XLA cannot hoist the body out of
    the loop (a constant-arg body is loop-invariant and measures pure
    dispatch floor)."""
    def many(*a):
        def body(c, _):
            o = fn(a[0] + c.astype(a[0].dtype), *a[1:])
            c = (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(
                jnp.float32
            )
            return c, None
        return jax.lax.scan(
            body, jnp.float32(0), None, length=inner
        )[0]

    jm = jax.jit(many)
    np.asarray(jm(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jm(*args))
        best = min(best, time.perf_counter() - t0)
    return best / inner * 1e3


def main():
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.uniform(-1, 1, (1, H, W, 3)).astype(np.float32))

    null = timeit(lambda x: x * 1.0001, jnp.ones((8, 128)))
    print(f"null op (dispatch floor/64): {null:.3f} ms")

    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        for norm in ("instance", "none"):
            enc = BasicEncoder(256, norm, dtype=dtype)
            vs = jax.jit(enc.init)(jax.random.key(0), im)
            ms = timeit(lambda x, v=vs, e=enc: e.apply(v, x), im)
            print(f"fnet {tag} norm={norm}: {ms:.2f} ms")

    # standalone convs at the three stage shapes (bf16)
    shapes = [
        ("conv7s2 3->64 @376x1232", (1, H, W, 3), 64, (7, 7), 2),
        ("conv3 64->64 @188x616", (1, H // 2, W // 2, 64), 64, (3, 3), 1),
        ("conv3 64->96 s2 @188x616", (1, H // 2, W // 2, 64), 96, (3, 3), 2),
        ("conv3 96->96 @94x308", (1, H // 4, W // 4, 96), 96, (3, 3), 1),
        ("conv3 96->128 s2 @94x308", (1, H // 4, W // 4, 96), 128, (3, 3), 2),
        ("conv3 128->128 @47x154", (1, H // 8, W // 8, 128), 128, (3, 3), 1),
        ("conv1 128->256 @47x154", (1, H // 8, W // 8, 128), 256, (1, 1), 1),
    ]
    for name, shp, feats, k, s in shapes:
        x = jnp.asarray(
            rng.normal(size=shp).astype(np.float32), jnp.bfloat16
        )
        conv = nn.Conv(feats, k, strides=(s, s), padding="SAME",
                       dtype=jnp.bfloat16)
        vs = jax.jit(conv.init)(jax.random.key(0), x)
        ms = timeit(lambda a, v=vs, c=conv: c.apply(v, a), x)
        flops = (
            2 * (shp[1] // s) * (shp[2] // s) * feats * k[0] * k[1] * shp[3]
        )
        eff = flops / (ms * 1e-3) / 197e12 * 100
        print(f"{name}: {ms:.3f} ms  ({flops/1e9:.2f} GF, {eff:.1f}% of peak)")


if __name__ == "__main__":
    main()
