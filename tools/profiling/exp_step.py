"""Per-component profile of one GMA update iteration at KITTI res,
with serial-dependent timing (defeats loop hoisting) and a null
calibration for the dispatch floor."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from atdn_vslam_tpu.ops.corr_lookup import (
    build_corr_pyramid, lookup_corr_pyramid,
)
from atdn_vslam_tpu.ops.attention import (
    attention_probs, apply_attention_probs,
)
from atdn_vslam_tpu.ops.upsample import convex_upsample
from atdn_vslam_tpu.models.flow.update import (
    GMAUpdateBlock, BasicMotionEncoder, SepConvGRU, FlowHead,
)

H8, W8 = 47, 154
N = H8 * W8
DT = jnp.bfloat16
INNER = 32


def timeit(fn, x, *rest, reps=4):
    def many(x0, *r):
        def body(c, _):
            o = fn(x0 + c.astype(x0.dtype), *r)
            return (jnp.sum(o.astype(jnp.float32)) * 1e-30).astype(
                jnp.float32
            ), None
        return jax.lax.scan(body, jnp.float32(0), None, length=INNER)[0]

    jm = jax.jit(many)
    np.asarray(jm(x, *rest))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jm(x, *rest))
        best = min(best, time.perf_counter() - t0)
    return best / INNER * 1e3


def main():
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=DT):
        return jnp.asarray(
            rng.normal(size=shape).astype(np.float32), dtype
        )

    floor = timeit(lambda x: x * 1.0001, jnp.ones((8, 128)))
    print(f"floor: {floor:.3f} ms (subtract from everything)")

    f1, f2 = arr(1, H8, W8, 256), arr(1, H8, W8, 256)
    pyr = jax.jit(
        lambda a, b: tuple(build_corr_pyramid(a, b, 4, dtype=DT))
    )(f1, f2)
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(0, W8, (1, H8, W8)),
             rng.uniform(0, H8, (1, H8, W8))], -1
        ).astype(np.float32)
    )
    # consume each level with a scalar sum — concatenating the levels
    # into one flat array costs a ~10 ms relayout of the whole volume
    # and swamps the actual build time (round-2 lesson)
    print(f"corr build: {timeit(lambda a, b: sum(jnp.sum(x.astype(jnp.float32)) for x in build_corr_pyramid(a, b, 4, dtype=DT)), f1, f2) - floor:.3f} ms")
    print(f"lookup: {timeit(lambda c, p: lookup_corr_pyramid(list(p), c), coords, pyr) - floor:.3f} ms")

    q, k = arr(1, N, 128), arr(1, N, 128)
    probs = jax.jit(lambda a, b: attention_probs(a, b, scale=1.0))(q, k)
    print(f"probs build: {timeit(lambda a, b: attention_probs(a, b, scale=1.0), q, k) - floor:.3f} ms")
    v = arr(1, N, 128)
    print(f"P@V: {timeit(lambda vv, p: apply_attention_probs(p, vv), v, probs) - floor:.3f} ms")

    # update block pieces
    net = arr(1, H8, W8, 128)
    inp = arr(1, H8, W8, 128)
    corr = arr(1, H8, W8, 324)
    flow = arr(1, H8, W8, 2)

    me = BasicMotionEncoder(DT)
    me_vars = jax.jit(me.init)(jax.random.key(0), flow, corr)
    print(f"motion encoder: {timeit(lambda c, f: me.apply(me_vars, f, c), corr, flow) - floor:.3f} ms")

    gru = SepConvGRU(128, DT)
    x256 = arr(1, H8, W8, 384)
    gru_vars = jax.jit(gru.init)(jax.random.key(0), net, x256)
    print(f"sepconv gru: {timeit(lambda h, x: gru.apply(gru_vars, h, x), net, x256) - floor:.3f} ms")

    fh = FlowHead(256, DT)
    fh_vars = jax.jit(fh.init)(jax.random.key(0), net)
    print(f"flow head: {timeit(lambda h: fh.apply(fh_vars, h), net) - floor:.3f} ms")

    ub = GMAUpdateBlock(128, 1, DT, False)
    ub_vars = jax.jit(ub.init)(
        jax.random.key(0), net, inp, corr, flow, q, k, None, probs
    )
    print(f"full update block (incl mask head, P@V): {timeit(lambda n_, i_, c_, f_, p_: ub.apply(ub_vars, n_, i_, c_, f_, None, None, None, p_)[0], net, inp, corr, flow, probs) - floor:.3f} ms")

    mask = arr(1, H8, W8, 576, dtype=jnp.float32)
    fl32 = jnp.asarray(np.asarray(flow, np.float32))
    print(f"convex upsample: {timeit(lambda f, m: convex_upsample(f, m), fl32, mask) - floor:.3f} ms")


if __name__ == "__main__":
    main()
