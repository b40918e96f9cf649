"""Can compressing the materialized attention probs beat the bf16
P@V stream? (round 4)

The aggregation P@V read is the largest remaining iteration-slope
term above roofline: 105 MB of bf16 probs re-read every one of the 12
GMA iterations (~0.27 ms/iter vs the 0.13 ms HBM floor). The probs
matrix is iteration-invariant, so compressing it at materialization
halves (fp8/int8) the per-iteration stream:

  bf16      current einsum (baseline)
  fp8e4m3   probs stored float8_e4m3fn, astype(bf16) inside the dot
            (relative quantization error ~6%% of each weight)
  fp8e5m2   probs stored float8_e5m2 (~12.5%% rel)
  int8row   probs quantized per query row against its max
            (out = scale * (int8 probs @ int8? no - bf16 v)); absolute
            error <= rowmax/254 per weight
  f32probs  control: f32 probs (210 MB stream) - calibrates whether
            the einsum is bandwidth-bound at all

Timing: serial-dependent scan over REPS iterations with v perturbed by
the previous output (probs loop-invariant, exactly like the 12-iter
update scan), value-fenced; dispatch amortized.

Also prints the aggregation ERROR of each variant vs an f64 reference
(rms over output elements, relative to output rms) so accuracy is a
number, not a guess.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

H8, W8, D = 47, 154, 128
N = H8 * W8
NPAD = 7296  # 128-lane keep_padded key dim
REPS = 24


def make_probs():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(N, D)).astype(np.float32) * (D**-0.5)
    k = rng.normal(size=(N, D)).astype(np.float32)
    s = q @ k.T
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    pp = np.zeros((1, H8, W8, NPAD), np.float32)
    pp[0, :, :, :N] = p.reshape(H8, W8, N)
    return pp


def timeit(label, fn, probs, v):
    @jax.jit
    def loop(probs, v):
        def body(c, _):
            out = fn(probs, v + c)
            return jnp.sum(out[0, 0, :8]).astype(v.dtype) * 1e-20, None

        out, _ = jax.lax.scan(
            body, jnp.asarray(0, v.dtype), None, length=REPS
        )
        return out

    float(loop(probs, v))  # compile+warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(probs, v))
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(f"{label}: {best*1e3:.3f} ms/iter", flush=True)


def main():
    pp = make_probs()
    rng = np.random.default_rng(1)
    v_np = rng.normal(size=(1, NPAD, D)).astype(np.float32)
    v_np[0, N:] = 0.0

    ref = np.einsum(
        "bxym,bmd->bxyd", pp.astype(np.float64), v_np.astype(np.float64)
    )
    ref_rms = float(np.sqrt((ref**2).mean()))

    v = jnp.asarray(v_np, jnp.bfloat16)

    def einsum_out(p, v):
        return jnp.einsum(
            "bxym,bmd->bxyd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype)

    variants = {}
    variants["bf16"] = (jnp.asarray(pp, jnp.bfloat16), einsum_out)
    variants["f32probs"] = (jnp.asarray(pp, jnp.float32), einsum_out)
    for name, dt in (
        ("fp8e4m3", jnp.float8_e4m3fn),
        ("fp8e5m2", jnp.float8_e5m2),
    ):
        try:
            variants[name] = (jnp.asarray(pp, dt), einsum_out)
        except Exception as e:  # pragma: no cover
            print(f"{name}: unavailable ({e})")

    # int8 per-row quantization
    rowmax = pp.max(axis=-1, keepdims=True)
    scale = rowmax / 127.0
    q8 = np.clip(np.rint(pp / np.maximum(scale, 1e-30)), 0, 127).astype(
        np.int8
    )

    def int8_out(pq, v, scale=jnp.asarray(scale, jnp.float32)):
        out = jnp.einsum(
            "bxym,bmd->bxyd", pq.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        return (out * scale).astype(v.dtype)

    variants["int8row"] = (jnp.asarray(q8), int8_out)

    for label, (p, fn) in variants.items():
        out = np.asarray(
            jax.jit(fn)(p, v), np.float64
        )
        err = float(np.sqrt(((out - ref) ** 2).mean())) / ref_rms
        print(f"{label}: rel rms err vs f64 = {err:.2e}")

    for label, (p, fn) in variants.items():
        timeit(label, fn, p, v)


if __name__ == "__main__":
    main()
