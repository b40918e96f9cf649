"""Unit tests for the hot-path ops: bilinear sampling, correlation
pyramid + lookup, attention (XLA vs flash-interpret), convex upsampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.ops import (
    attend_reference,
    bilinear_sample,
    build_corr_pyramid,
    convex_upsample,
    coords_grid,
    lookup_corr_pyramid,
    upsample_flow_bilinear,
)
from atdn_vslam_tpu.ops.attention import flash_attend


def test_coords_grid():
    g = np.asarray(coords_grid(3, 5))
    assert g.shape == (3, 5, 2)
    assert g[1, 4, 0] == 4  # x
    assert g[1, 4, 1] == 1  # y


def test_bilinear_exact_on_integer_coords(rng):
    img = jnp.asarray(rng.normal(size=(2, 6, 8, 3)).astype(np.float32))
    pts = jnp.asarray([[[1.0, 2.0], [0.0, 0.0], [7.0, 5.0]]] * 2)
    out = np.asarray(bilinear_sample(img, pts))
    np.testing.assert_allclose(out[0, 0], np.asarray(img[0, 2, 1]), atol=1e-6)
    np.testing.assert_allclose(out[0, 1], np.asarray(img[0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(out[1, 2], np.asarray(img[1, 5, 7]), atol=1e-6)


def test_bilinear_interpolates(rng):
    img = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
    pts = jnp.asarray([[[1.5, 2.0]]])
    out = float(bilinear_sample(img, pts)[0, 0, 0])
    expected = 0.5 * float(img[0, 2, 1, 0]) + 0.5 * float(img[0, 2, 2, 0])
    assert abs(out - expected) < 1e-6


def test_bilinear_zero_padding_outside():
    img = jnp.ones((1, 4, 4, 1))
    pts = jnp.asarray([[[-2.0, 1.0], [10.0, 1.0], [-0.5, 0.0]]])
    out = np.asarray(bilinear_sample(img, pts))[0, :, 0]
    assert out[0] == 0.0 and out[1] == 0.0
    # half-outside tap: only in-bounds half contributes
    np.testing.assert_allclose(out[2], 0.5, atol=1e-6)


def test_corr_pyramid_shapes(rng):
    f1 = jnp.asarray(rng.normal(size=(1, 8, 12, 16)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 8, 12, 16)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, num_levels=3)
    assert pyr[0].shape == (1, 96, 8, 12, 1)
    assert pyr[1].shape == (1, 96, 4, 6, 1)
    assert pyr[2].shape == (1, 96, 2, 3, 1)


def test_stem_s2d_matmul_matches_reference(rng):
    """One-hot-matmul space-to-depth (the TPU planar-stem path) is
    bit-identical to the reshape/transpose reference in f32 and bf16,
    odd-channel and 2-channel inputs included."""
    from atdn_vslam_tpu.ops.stem_conv import stem_s2d, stem_s2d_matmul

    for shape, dt in (
        ((1, 48, 64, 3), jnp.float32),
        ((2, 40, 32, 2), jnp.float32),
        ((1, 24, 16, 3), jnp.bfloat16),
    ):
        x = jnp.asarray(
            rng.uniform(-1, 1, shape).astype(np.float32)
        )
        ref = stem_s2d(x.astype(dt), planar=True)
        out = stem_s2d_matmul(x, dtype=dt)
        assert out.dtype == ref.dtype
        np.testing.assert_array_equal(
            np.asarray(out, np.float32), np.asarray(ref, np.float32)
        )


def test_corr_dot_rowmajor_matches_einsum(rng):
    """Pallas row-major pyramid dot (interpret mode): values and
    gradients equal the XLA einsum build, including ragged trailing
    blocks (n=37, m=53 vs blocks 16/32)."""
    from atdn_vslam_tpu.ops.corr_lookup import corr_dot_rowmajor

    f1 = jnp.asarray(rng.normal(size=(1, 37, 24)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 53, 24)).astype(np.float32))
    out = corr_dot_rowmajor(f1, f2, 0.5, jnp.float32, 16, 32, True)
    ref = 0.5 * jnp.einsum("bnc,bmc->bnm", f1, f2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_k(f1, f2):
        return jnp.sum(
            corr_dot_rowmajor(f1, f2, 0.5, jnp.float32, 16, 32, True) ** 2
        )

    def loss_r(f1, f2):
        return jnp.sum((0.5 * jnp.einsum("bnc,bmc->bnm", f1, f2)) ** 2)

    gk = jax.grad(loss_k, (0, 1))(f1, f2)
    gr = jax.grad(loss_r, (0, 1))(f1, f2)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs the real TPU chip (ATDN_TEST_TPU=1 pytest -m tpu)",
)
def test_corr_dot_rowmajor_compiled_tpu(rng):
    """The kernel's real Mosaic lowering (compiled, not interpret) at
    the production shape/blocking: ragged-block masking and the
    bm=512/bk=1024 VMEM fit are otherwise only covered by manual chip
    measurements — a Pallas/Mosaic regression in a JAX bump would land
    silently in the dormant opt-in (advisor round-4 finding)."""
    from atdn_vslam_tpu.ops.corr_lookup import corr_dot_rowmajor

    n = 47 * 154
    f1 = jnp.asarray(rng.normal(size=(1, n, 256)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, n, 256)).astype(np.float32))
    f1b, f2b = f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16)
    out = jax.jit(
        lambda a, b: corr_dot_rowmajor(a, b, 0.0625, jnp.bfloat16)
    )(f1b, f2b)
    ref = (
        jnp.einsum(
            "bnc,bmc->bnm", f1b, f2b, preferred_element_type=jnp.float32
        )
        * 0.0625
    ).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )


def test_corr_pyramid_pallas_matches_xla(rng):
    """build_corr_pyramid(use_pallas=True, interpret) == XLA path at
    every level."""
    f1 = jnp.asarray(rng.normal(size=(1, 8, 12, 64)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 8, 12, 64)).astype(np.float32))
    pa = build_corr_pyramid(f1, f2, 4, use_pallas=True, interpret=True)
    pb = build_corr_pyramid(f1, f2, 4, use_pallas=False)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        )


def test_corr_values_are_scaled_dots(rng):
    c = 16
    f1 = jnp.asarray(rng.normal(size=(1, 4, 5, c)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, 4, 5, c)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, 1)
    got = float(pyr[0][0, 7, 2, 3, 0])  # query pixel 7=(1,2), target (2,3)
    expected = float(jnp.dot(f1[0, 1, 2], f2[0, 2, 3]) / np.sqrt(c))
    assert abs(got - expected) < 1e-5


def test_corr_lookup_center_matches_identity(rng):
    """With coords == grid, the window center tap equals the diagonal
    correlation value."""
    f = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
    pyr = build_corr_pyramid(f, f, 1)
    coords = coords_grid(6, 6)[None]
    out = lookup_corr_pyramid(pyr, coords, radius=2)
    assert out.shape == (1, 6, 6, 25)
    center = np.asarray(out)[0, :, :, 12]  # (2r+1)^2 center index
    diag = np.asarray(pyr[0]).reshape(36, 36)[np.arange(36), np.arange(36)]
    np.testing.assert_allclose(center.reshape(36), diag, atol=1e-5)


def test_attend_reference_is_softmax_matmul(rng):
    q = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 10, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 10, 4)).astype(np.float32))
    out = np.asarray(attend_reference(q, k, v, scale=1.0))
    s = np.einsum("bnd,bmd->bnm", np.asarray(q), np.asarray(k))
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    expected = np.einsum("bnm,bmd->bnd", p, np.asarray(v))
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_materialized_probs_match_attend(rng):
    """attention_probs + apply_attention_probs (the iteration-reuse
    schedule) == fused attend_reference, with and without bias."""
    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        apply_attention_probs,
    )

    q = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 12, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 12, 4)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, 12, 12)).astype(np.float32))

    for b in (None, bias):
        ref = np.asarray(attend_reference(q, k, v, scale=1.0, bias=b))
        probs = attention_probs(q, k, scale=1.0, bias=b)
        got = np.asarray(apply_attention_probs(probs, v))
        np.testing.assert_allclose(got, ref, atol=1e-6)
    # position_only mode uses the bias alone as the similarity
    ref = np.asarray(
        attend_reference(q, k, v, bias=bias, position_only=True)
    )
    probs = attention_probs(q, k, bias=bias, position_only=True)
    got = np.asarray(apply_attention_probs(probs, v))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("n", [64, 100, 300])
def test_flash_attend_matches_reference(rng, n):
    """Pallas flash kernel (interpret mode on CPU) == XLA reference,
    including non-tile-aligned N."""
    q = jnp.asarray(rng.normal(size=(1, n, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, 32)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, n, 16)).astype(np.float32))
    ref = np.asarray(attend_reference(q, k, v))
    got = np.asarray(
        flash_attend(q, k, v, bq=64, bk=64, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_convex_upsample_constant_flow():
    """A spatially constant flow upsamples to the constant * factor for
    any mask (convex combination of equal values)."""
    flow = jnp.ones((1, 4, 6, 2)) * jnp.asarray([3.0, -2.0])
    mask = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 6, 9 * 64)).astype(np.float32)
    )
    up = np.asarray(convex_upsample(flow, mask))
    assert up.shape == (1, 32, 48, 2)
    # interior pixels: all 9 taps equal -> exactly 8x flow
    np.testing.assert_allclose(up[0, 8:24, 8:40, 0], 24.0, atol=1e-4)
    np.testing.assert_allclose(up[0, 8:24, 8:40, 1], -16.0, atol=1e-4)


def test_convex_upsample_selects_center():
    """A mask that puts all weight on the center tap reproduces
    nearest-neighbor 8x upsampling of 8*flow."""
    rng = np.random.default_rng(1)
    flow = jnp.asarray(rng.normal(size=(1, 3, 4, 2)).astype(np.float32))
    mask = np.full((1, 3, 4, 9, 8, 8), -1e9, np.float32)
    mask[:, :, :, 4] = 0.0  # center neighbor
    up = np.asarray(convex_upsample(flow, jnp.asarray(mask.reshape(1, 3, 4, -1))))
    expected = np.repeat(np.repeat(np.asarray(flow) * 8, 8, 1), 8, 2)
    np.testing.assert_allclose(up, expected, atol=1e-5)


def test_bilinear_flow_upsample():
    flow = jnp.ones((1, 4, 4, 2))
    up = upsample_flow_bilinear(flow, 8)
    assert up.shape == (1, 32, 32, 2)
    np.testing.assert_allclose(np.asarray(up), 8.0, atol=1e-5)


def test_matmul_lookup_matches_gather(rng):
    """The einsum-based lookup must equal the 4-tap gather reference,
    including out-of-bounds zero padding."""
    from atdn_vslam_tpu.ops.corr_lookup import lookup_corr_pyramid_gather

    f1 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, 3)
    # coords with fractional parts, including points near/past borders
    base = coords_grid(6, 9)[None]
    coords = jnp.concatenate([base + 0.37, base - 3.6], axis=0)
    a = np.asarray(lookup_corr_pyramid(pyr, coords, radius=2))
    b = np.asarray(lookup_corr_pyramid_gather(pyr, coords, radius=2))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_dynslice_lookup_matches_einsum(rng):
    from atdn_vslam_tpu.ops.corr_lookup import lookup_corr_pyramid_dynslice

    f1 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, 3)
    base = coords_grid(6, 9)[None]
    coords = jnp.concatenate([base + 0.37, base - 3.6], axis=0)
    a = np.asarray(lookup_corr_pyramid(pyr, coords, radius=2))
    b = np.asarray(lookup_corr_pyramid_dynslice(pyr, coords, radius=2))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_slab_lookup_matches_einsum_interpret(rng):
    """Slab-slice Pallas lookup (interpret mode) == einsum path,
    including far out-of-bounds coords (zero padding) and q_blk
    padding of a non-divisible query count."""
    from atdn_vslam_tpu.ops.corr_lookup_slab import (
        lookup_corr_pyramid_slab,
    )

    f1 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, 3)
    coords = jnp.asarray(
        np.stack(
            [
                np.random.default_rng(3).uniform(-5, 14, (2, 6, 9)),
                np.random.default_rng(4).uniform(-5, 11, (2, 6, 9)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    a = np.asarray(lookup_corr_pyramid(pyr, coords, radius=2))
    b = np.asarray(
        lookup_corr_pyramid_slab(
            tuple(pyr), coords, radius=2, q_blk=16, interpret=True
        )
    )
    assert b.shape == a.shape
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_pallas_lookup_matches_einsum_interpret(rng):
    """The Pallas lookup kernel (interpret mode) == the production
    einsum lookup, including out-of-bounds zero padding."""
    from atdn_vslam_tpu.ops.corr_lookup_pallas import (
        lookup_corr_pyramid_pallas,
    )

    f1 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(2, 6, 9, 8)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f2, 3)
    base = coords_grid(6, 9)[None]
    coords = jnp.concatenate([base + 0.37, base - 3.6], axis=0)
    a = np.asarray(lookup_corr_pyramid(pyr, coords, radius=2))
    b = np.asarray(
        lookup_corr_pyramid_pallas(pyr, coords, radius=2, interpret=True)
    )
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_stem_conv_s2d_matches_direct(rng):
    """Space-to-depth 7x7 stride-2 conv == direct strided conv
    (ops/stem_conv.py), including odd-tap zero filling."""
    import jax
    import jax.numpy as jnp
    from atdn_vslam_tpu.ops.stem_conv import conv7x7s2_s2d

    for c, o, h, w in ((3, 64, 32, 48), (2, 16, 24, 40)):
        x = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(7, 7, c, o)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NHWC", "HWIO", "NHWC")
        )
        ref = jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
        ) + b
        out = conv7x7s2_s2d(x, k, b)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4
        )


def test_attention_probs_spatial_matches_flat(rng):
    """attention_probs_spatial == attention_probs reshaped (the scan-
    loop layout variant; ops/attention.py)."""
    import jax.numpy as jnp
    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        attention_probs_spatial,
    )

    h, w, d = 6, 9, 16
    n = h * w
    q = jnp.asarray(rng.normal(size=(2, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, n, d)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, n, n)).astype(np.float32))

    for kwargs in ({}, {"bias": bias}, {"bias": bias, "position_only": True}):
        flat = attention_probs(q, k, scale=1.0, **kwargs)
        spatial = attention_probs_spatial(q, k, h, w, scale=1.0, **kwargs)
        assert spatial.shape == (2, h, w, n)
        np.testing.assert_allclose(
            np.asarray(spatial).reshape(2, n, n), np.asarray(flat),
            atol=1e-6,
        )


def test_lookup_token_output_matches_spatial(rng):
    """spatial_out=False returns the same values token-major
    (kept-but-nonproduction path; see models/flow/network.py note)."""
    import jax.numpy as jnp
    from atdn_vslam_tpu.ops.bilinear import coords_grid
    from atdn_vslam_tpu.ops.corr_lookup import (
        build_corr_pyramid,
        lookup_corr_pyramid,
    )

    h8, w8 = 8, 12
    f1 = jnp.asarray(rng.normal(size=(1, h8, w8, 32)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(1, h8, w8, 32)).astype(np.float32))
    pyr = tuple(build_corr_pyramid(f1, f2, 3))
    coords = coords_grid(h8, w8)[None] + 1.3
    spatial = lookup_corr_pyramid(pyr, coords, radius=2)
    tokens = lookup_corr_pyramid(pyr, coords, radius=2, spatial_out=False)
    np.testing.assert_array_equal(
        np.asarray(tokens).reshape(spatial.shape), np.asarray(spatial)
    )


def test_flash_probs_spatial_matches_xla(rng):
    """Fused probs-materialization kernel (interpret mode) == XLA
    softmax path, including non-multiple-of-block N padding."""
    import jax.numpy as jnp
    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        flash_probs_spatial,
    )

    h, w, d = 5, 11, 16
    n = h * w
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    ref = attention_probs(q, k, scale=1.0)
    got = flash_probs_spatial(q, k, h, w, scale=1.0, bk=32,
                              interpret=True)
    assert got.shape == (1, h, w, n)
    np.testing.assert_allclose(
        np.asarray(got).reshape(1, n, n), np.asarray(ref), atol=1e-6
    )
    # rows sum to one
    np.testing.assert_allclose(
        np.asarray(got).sum(-1), 1.0, atol=1e-5
    )


def test_flash_probs_spatial_gradients(rng):
    """custom-VJP backward of the probs kernel == autodiff through the
    XLA softmax (interpret mode)."""
    import jax
    import jax.numpy as jnp
    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        flash_probs_spatial,
    )

    h, w, d = 4, 6, 8
    n = h * w
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(1, h, w, n)).astype(np.float32))

    def loss_kernel(q, k):
        p = flash_probs_spatial(q, k, h, w, scale=0.7, bk=16,
                                interpret=True)
        return jnp.sum((p - tgt) ** 2)

    def loss_xla(q, k):
        p = attention_probs(q, k, scale=0.7).reshape(1, h, w, n)
        return jnp.sum((p - tgt) ** 2)

    gq0, gk0 = jax.grad(loss_xla, argnums=(0, 1))(q, k)
    gq1, gk1 = jax.grad(loss_kernel, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq1), np.asarray(gq0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0), atol=1e-5)


# ----------------------------------------------------------------------
# GSPMD composition of the Pallas kernels (shard_map over query rows)
# ----------------------------------------------------------------------


def _mesh8():
    from atdn_vslam_tpu.config import MeshConfig
    from atdn_vslam_tpu.parallel import make_mesh

    return make_mesh(MeshConfig(data=8, model=1))


def test_sharded_flash_probs_matches_unsharded(rng):
    """shard_map-partitioned probs kernel (8-device CPU mesh, interpret
    mode) == the XLA softmax, including h NOT divisible by the axis
    size (row padding is sliced off)."""
    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        sharded_flash_probs_spatial,
    )

    mesh = _mesh8()
    h, w, d = 11, 8, 16  # 11 rows over 8 devices -> padded to 16
    n = h * w
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    ref = attention_probs(q, k, scale=0.9)
    got = sharded_flash_probs_spatial(
        q, k, h, w, 0.9, mesh=mesh, axis="data", bk=32, interpret=True
    )
    assert got.shape == (1, h, w, n)
    np.testing.assert_allclose(
        np.asarray(got).reshape(1, n, n), np.asarray(ref), atol=1e-6
    )


def test_sharded_flash_probs_inside_sharded_jit(rng):
    """The shard_map kernel composes with an enclosing GSPMD-sharded
    jit (the sharded_flow_infer regime): row-sharded input, sharded
    output, same values."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        sharded_flash_probs_spatial,
    )

    mesh = _mesh8()
    h, w, d = 16, 8, 16
    n = h * w
    q = jnp.asarray(rng.normal(size=(1, h, w, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))

    fn = jax.jit(
        lambda qs, kf: sharded_flash_probs_spatial(
            qs.reshape(1, n, d), kf, h, w, 1.0,
            mesh=mesh, axis="data", bk=32, interpret=True,
        ),
        in_shardings=(
            NamedSharding(mesh, P(None, "data")),
            NamedSharding(mesh, P()),
        ),
    )
    got = fn(q, k)
    ref = attention_probs(q.reshape(1, n, d), k, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(got).reshape(1, n, n), np.asarray(ref), atol=1e-6
    )


def test_sharded_flash_attend_matches_reference(rng):
    """shard_map-partitioned flash attention (rectangular per-shard
    q x full k/v) == the XLA reference, N not divisible by 8."""
    from atdn_vslam_tpu.ops.attention import sharded_flash_attend

    mesh = _mesh8()
    n, d, dv = 100, 32, 16
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, n, dv)).astype(np.float32))
    ref = np.asarray(attend_reference(q, k, v))
    got = np.asarray(
        sharded_flash_attend(
            q, k, v, mesh=mesh, axis="data", bq=32, bk=32, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_attend_rectangular(rng):
    """flash_attend with q tokens != k/v tokens (the per-shard shape
    under row sharding) == the XLA reference."""
    nq, nkv, d, dv = 40, 100, 32, 16
    q = jnp.asarray(rng.normal(size=(1, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, nkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, nkv, dv)).astype(np.float32))
    s = jnp.einsum("bnd,bmd->bnm", q, k) * (d**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    ref = np.asarray(jnp.einsum("bnm,bmd->bnd", p, v))
    got = np.asarray(flash_attend(q, k, v, bq=32, bk=32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_flash_apply_probs_matches_einsum(rng):
    """Fused streaming P@V kernel (interpret mode) == the XLA einsum,
    including ragged row blocks and key padding, plus the exact-zero
    keep_padded probs roundtrip."""
    from atdn_vslam_tpu.ops.attention import (
        _flash_apply_probs_impl,
        apply_attention_probs,
        attention_probs,
        flash_probs_spatial,
    )

    h, w, d, dv = 7, 9, 16, 8  # h=7 ragged vs hb=4; n=63 ragged vs bk=32
    n = h * w
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, n, dv)).astype(np.float32))

    # keep_padded probs: key columns pad to the 128 tile with EXACT
    # zeros; image rows pad to the write-block multiple (finite
    # garbage, sliced off by consumers)
    from atdn_vslam_tpu.ops.attention import _WRITE_HB

    h_sp = -(-h // _WRITE_HB) * _WRITE_HB
    p_pad = flash_probs_spatial(
        q, k, h, w, scale=1.0, bk=32, interpret=True, keep_padded=True
    )
    assert p_pad.shape == (1, h_sp, w, 128), p_pad.shape
    assert float(jnp.max(jnp.abs(p_pad[:, :h, :, n:]))) == 0.0
    assert bool(jnp.all(jnp.isfinite(p_pad)))

    ref_p = attention_probs(q, k, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(p_pad[:, :h, :, :n]).reshape(1, n, n),
        np.asarray(ref_p), atol=1e-5,
    )
    ref = np.einsum("bnm,bmd->bnd", np.asarray(ref_p), np.asarray(v))
    ref = ref.reshape(1, h, w, dv)

    got = _flash_apply_probs_impl(p_pad, v, hb=4, bk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, :h]), ref, atol=2e-5)

    # XLA fallback consumes keep_padded probs too (v zero-extension)
    got_x = apply_attention_probs(p_pad, v, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got_x[:, :h]), ref, atol=2e-5)


def test_flash_apply_probs_gradients(rng):
    """custom-VJP backward of the fused apply kernel == autodiff of
    the einsum, including padded probs columns (zero cotangent)."""
    from atdn_vslam_tpu.ops.attention import flash_apply_probs

    h, w, dv = 4, 6, 8
    n = h * w
    n_pad = 32  # probs carry keep_padded columns
    probs = jnp.asarray(
        rng.uniform(0, 1, (1, h, w, n_pad)).astype(np.float32)
    )
    probs = probs.at[..., n:].set(0.0)
    v = jnp.asarray(rng.normal(size=(1, n, dv)).astype(np.float32))

    def loss_kernel(p, v):
        out = flash_apply_probs(p, v, 2, 16, True)
        return jnp.sum(out**2)

    def loss_xla(p, v):
        vp = jnp.pad(v, ((0, 0), (0, n_pad - n), (0, 0)))
        out = jnp.einsum("bxym,bmd->bxyd", p, vp)
        return jnp.sum(out**2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(probs, v)
    gx = jax.grad(loss_xla, argnums=(0, 1))(probs, v)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gx[1]),
                               atol=1e-5)


def test_sharded_flash_apply_probs_matches_unsharded(rng):
    """shard_map-partitioned apply kernel (8-device CPU mesh, interpret
    mode) == the XLA einsum, with h NOT divisible by the axis size."""
    from atdn_vslam_tpu.ops.attention import sharded_flash_apply_probs

    mesh = _mesh8()
    h, w, dv = 11, 8, 16  # 11 rows over 8 devices -> padded to 16
    n = h * w
    probs = jnp.asarray(
        rng.uniform(0, 1, (1, h, w, n)).astype(np.float32)
    )
    v = jnp.asarray(rng.normal(size=(1, n, dv)).astype(np.float32))
    ref = np.einsum(
        "bxym,bmd->bxyd", np.asarray(probs), np.asarray(v)
    )
    got = sharded_flash_apply_probs(
        probs, v, mesh=mesh, axis="data", hb=2, bk=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)


def test_flash_probs_keep_padded_gradients(rng):
    """Gradients through keep_padded probs (padded rows AND columns in
    the residual) == the XLA softmax autodiff."""
    from atdn_vslam_tpu.ops.attention import (
        attention_probs,
        flash_probs_spatial,
    )

    h, w, d = 5, 6, 8  # rows pad 5 -> 8, cols 30 -> 128
    n = h * w
    q = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, n, d)).astype(np.float32))

    def loss_kernel(q, k):
        p = flash_probs_spatial(q, k, h, w, 0.7, 16, True, True)
        return jnp.sum(p[:, :h, :, :n] ** 2)

    def loss_xla(q, k):
        return jnp.sum(attention_probs(q, k, scale=0.7) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(q, k)
    gx = jax.grad(loss_xla, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gx[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gx[1]),
                               atol=1e-5)


def test_forward_warp_flow_splat_semantics():
    """forward_warp_flow (the TPU-native forward_interpolate,
    GMA/core/utils/utils.py:28-56): constant integer flow translates
    the field; vacated pixels fall back to zero (per-pixel cold
    start); colliding splats average; zero flow is a fixed point."""
    from atdn_vslam_tpu.ops.bilinear import forward_warp_flow

    h, w = 6, 8
    # constant flow (2, 1): every vector lands at (x+2, y+1)
    flow = np.zeros((1, h, w, 2), np.float32)
    flow[..., 0] = 2.0
    flow[..., 1] = 1.0
    out = np.asarray(forward_warp_flow(jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 1:, 2:], flow[0, 1:, 2:])
    # vacated band: zero init
    np.testing.assert_allclose(out[0, 0, :], 0.0)
    np.testing.assert_allclose(out[0, :, :2], 0.0)

    # zero flow is a fixed point (first-pair cold start stays exact)
    z = jnp.zeros((2, h, w, 2), jnp.float32)
    np.testing.assert_array_equal(np.asarray(forward_warp_flow(z)), 0.0)

    # collisions average: two columns of flow pointing at the same
    # target column -> mean of the two vectors
    coll = np.zeros((1, 1, 4, 2), np.float32)
    coll[0, 0, 0, 0] = 2.0   # lands on x=2
    coll[0, 0, 1, 0] = 1.0   # lands on x=2 too
    coll[0, 0, 2, 0] = 1.0   # moves AWAY from x=2 (else its zero-flow
    # self-splat would join the average)
    out2 = np.asarray(forward_warp_flow(jnp.asarray(coll)))
    np.testing.assert_allclose(out2[0, 0, 2], [1.5, 0.0])
    # out-of-range splats are dropped
    oob = np.full((1, 1, 4, 2), 100.0, np.float32)
    np.testing.assert_allclose(
        np.asarray(forward_warp_flow(jnp.asarray(oob))), 0.0
    )
