"""Tests for the RAFTGMA flow network (parity target: ref
GMA/core/network.py). Small spatial sizes for CPU speed — the
architecture is resolution-agnostic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.models.flow import RAFTGMA

H, W = 64, 96  # /8 -> 8x12 = 96 tokens


@pytest.fixture(scope="module")
def model_and_vars():
    model = RAFTGMA(iters=3, use_pallas=False)
    im = jnp.zeros((1, H, W, 3))
    vars_ = model.init(jax.random.key(0), im, im)
    return model, vars_


def test_test_mode_shapes(model_and_vars):
    model, vars_ = model_and_vars
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    flow_low, flow_up = model.apply(vars_, im1, im2, test_mode=True)
    assert flow_low.shape == (1, H // 8, W // 8, 2)
    assert flow_up.shape == (1, H, W, 2)
    assert np.isfinite(np.asarray(flow_up)).all()


def test_train_mode_returns_all_iters(model_and_vars):
    model, vars_ = model_and_vars
    rng = np.random.default_rng(1)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    preds, mutated = model.apply(
        vars_, im1, im2, True, False, mutable=["batch_stats"]
    )
    assert preds.shape == (3, 1, H, W, 2)
    assert "batch_stats" in mutated


def test_identical_frames_give_small_flow(model_and_vars):
    """Zero-motion input through a random-init net should produce flow
    bounded by the correlation window dynamics (sanity, not parity)."""
    model, vars_ = model_and_vars
    rng = np.random.default_rng(2)
    im = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    _, flow_up = model.apply(vars_, im, im, test_mode=True)
    assert np.isfinite(np.asarray(flow_up)).all()


def test_flow_init_carries(model_and_vars):
    model, vars_ = model_and_vars
    rng = np.random.default_rng(3)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    init = jnp.ones((1, H // 8, W // 8, 2)) * 2.0
    low0, _ = model.apply(vars_, im1, im2, test_mode=True)
    low1, _ = model.apply(vars_, im1, im2, test_mode=True, flow_init=init)
    assert not np.allclose(np.asarray(low0), np.asarray(low1))


def test_indivisible_size_raises(model_and_vars):
    model, vars_ = model_and_vars
    im = jnp.zeros((1, 60, 96, 3))
    with pytest.raises(ValueError):
        model.apply(model_and_vars[1], im, im)


def test_gradients_flow_sequence_loss(model_and_vars):
    """RAFT-style sequence loss (gamma-decayed L1 over iterations,
    ref GMA/train.py:41-65) backprops through the scan."""
    model, vars_ = model_and_vars
    rng = np.random.default_rng(4)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(1, H, W, 2)).astype(np.float32))

    def loss_fn(params):
        preds, _ = model.apply(
            {**vars_, "params": params}, im1, im2, True, False,
            mutable=["batch_stats"],
        )
        gammas = 0.8 ** jnp.arange(preds.shape[0] - 1, -1, -1)
        return jnp.sum(
            gammas * jnp.mean(jnp.abs(preds - target[None]), axis=(1, 2, 3, 4))
        )

    grads = jax.grad(loss_fn)(vars_["params"])
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.sum(jnp.abs(g)) > 0) for g in leaves)
    assert nonzero > len(leaves) * 0.8


def test_planar_stem_format_equivalence(model_and_vars):
    """planar_stem (the default) carries the shared stem-s2d frame
    format channel-major (B, 4C, H/2, W/2); every output (joint,
    streaming, encode_only fmap) must equal the NHWC-format model
    bit-for-bit — only the cache layout differs."""
    pm, vars_ = model_and_vars
    model = pm.clone(planar_stem=False)
    rng = np.random.default_rng(17)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    low_ref, up_ref = model.apply(vars_, im1, im2, test_mode=True)
    low_p, up_p = pm.apply(vars_, im1, im2, test_mode=True)
    np.testing.assert_array_equal(np.asarray(low_p), np.asarray(low_ref))
    np.testing.assert_array_equal(np.asarray(up_p), np.asarray(up_ref))

    fmap_p, fmt_p = pm.apply(vars_, im1, encode_only=True)
    fmap_r, _ = model.apply(vars_, im1, encode_only=True)
    assert fmt_p.shape == (1, 12, H // 2, W // 2)
    np.testing.assert_array_equal(np.asarray(fmap_p), np.asarray(fmap_r))

    low_s, up_s = pm.apply(
        vars_, im1, im2, test_mode=True, fmap1=(fmap_p, fmt_p)
    )
    np.testing.assert_allclose(
        np.asarray(up_s), np.asarray(up_ref), atol=1e-5
    )


def test_feature_cache_streaming_equivalence(model_and_vars):
    """Streaming feature cache: passing image1's cached fmap
    (encode_only / return_features) must reproduce the joint-encode
    result exactly — instance norm is per-sample, so batch composition
    cannot matter. This is the video hot-path optimization (each frame
    encoded once, not twice)."""
    model, vars_ = model_and_vars
    rng = np.random.default_rng(11)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    low_ref, up_ref = model.apply(vars_, im1, im2, test_mode=True)

    # encode_only returns the frame cache (fmap, stem-s2d format)
    cache1 = model.apply(vars_, im1, encode_only=True)
    fmap1, fmt1 = cache1
    assert fmap1.shape == (1, H // 8, W // 8, 256)
    assert fmt1.shape == (1, 12, H // 2, W // 2)  # planar (default)
    (low_c, up_c), cache2 = model.apply(
        vars_, im1, im2, test_mode=True, fmap1=cache1, return_features=True
    )
    np.testing.assert_allclose(
        np.asarray(low_c), np.asarray(low_ref), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(up_c), np.asarray(up_ref), atol=1e-5)
    # the returned cache chains: it equals encode_only(im2)
    cache2_ref = model.apply(vars_, im2, encode_only=True)
    for got, ref in zip(jax.tree.leaves(cache2), jax.tree.leaves(cache2_ref)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5
        )
    # a PLAIN fmap array (no format) is still accepted (back-compat)
    (low_p, up_p), _ = model.apply(
        vars_, im1, im2, test_mode=True, fmap1=fmap1, return_features=True
    )
    np.testing.assert_allclose(
        np.asarray(up_p), np.asarray(up_ref), atol=1e-5
    )


def test_positional_attention_modes():
    """position_and_content and position_only configs (ref GMA args,
    utils/gma_parameters.py:9-10) run and differ from content-only."""
    rng = np.random.default_rng(7)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    outs = {}
    for tag, kwargs in (
        ("content", {}),
        ("pos_and_content", {"position_and_content": True}),
        ("pos_only", {"position_only": True}),
    ):
        model = RAFTGMA(iters=2, use_pallas=False, **kwargs)
        vars_ = model.init(jax.random.key(0), im1, im2)
        # the aggregation gate gamma initializes to 0 (ref gma.py:95) —
        # open it so the attention mode actually reaches the output
        vars_ = jax.tree_util.tree_map_with_path(
            lambda p, x: jnp.ones_like(x)
            if any(getattr(k, "key", None) == "gamma" for k in p)
            else x,
            vars_,
        )
        _, up = model.apply(vars_, im1, im2, test_mode=True)
        assert np.isfinite(np.asarray(up)).all(), tag
        outs[tag] = np.asarray(up)
    assert not np.allclose(outs["content"], outs["pos_and_content"])
    assert not np.allclose(outs["content"], outs["pos_only"])


def test_sharded_flow_inference_matches(model_and_vars):
    """Corr-volume / attention model-axis sharding: running the flow
    net with image rows sharded over an 8-device "model" mesh must
    reproduce the single-device result (GSPMD inserts conv halos and
    the k/v gather; each device builds only its slice of the volume)."""
    from atdn_vslam_tpu.config import MeshConfig
    from atdn_vslam_tpu.parallel import make_mesh, sharded_flow_infer

    model, vars_ = model_and_vars
    rng = np.random.default_rng(21)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))

    low_ref, up_ref = model.apply(vars_, im1, im2, test_mode=True)

    mesh = make_mesh(MeshConfig(data=1, model=8))
    low_s, up_s = sharded_flow_infer(model, vars_, im1, im2, mesh)
    np.testing.assert_allclose(
        np.asarray(low_s), np.asarray(low_ref), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(up_s), np.asarray(up_ref), atol=5e-4
    )


def test_relpos_bias_structure():
    """RelPosEmb bias: decomposed height+width scores with correct
    shape and translation structure along each axis."""
    from atdn_vslam_tpu.models.flow.gma import RelPosEmb

    h, w, d = 4, 5, 8
    m = RelPosEmb(max_pos_size=8, dim_head=d)
    q = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, h * w, d)).astype(np.float32)
    )
    vars_ = m.init(jax.random.key(0), q, h, w)
    bias = m.apply(vars_, q, h, w)
    assert bias.shape == (1, h * w, h * w)
    b = np.asarray(bias).reshape(h, w, h, w)
    # decomposition: bias[x,y,u,v] - bias[x,y,u,v'] independent of u
    diff1 = b[1, 2, 0, 3] - b[1, 2, 0, 1]
    diff2 = b[1, 2, 3, 3] - b[1, 2, 3, 1]
    np.testing.assert_allclose(diff1, diff2, atol=1e-5)


def test_remat_matches_values_and_gradients(rng):
    """remat=True changes only the autodiff schedule: training-mode
    outputs and parameter gradients are identical."""
    import jax
    import jax.numpy as jnp
    from atdn_vslam_tpu.models.flow import RAFTGMA

    h, w = 64, 96
    im1 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, h, w, 3)).astype(np.float32))
    base = RAFTGMA(iters=3, use_pallas=False)
    variables = base.init(jax.random.key(0), im1, im2)

    def loss(params, remat):
        model = RAFTGMA(iters=3, use_pallas=False, remat=remat)
        preds = model.apply(
            dict(variables, params=params), im1, im2, test_mode=False
        )
        return jnp.sum(preds**2)

    v0, g0 = jax.value_and_grad(lambda p: loss(p, False))(variables["params"])
    v1, g1 = jax.value_and_grad(lambda p: loss(p, True))(variables["params"])
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    # Gradients agree up to f32 recompute rounding — XLA fuses the
    # rematerialized forward differently, and with a random-init
    # network individual elements cancel catastrophically. Structural
    # equivalence is pinned by per-leaf direction (cosine) and norm,
    # skipping noise-scale leaves (e.g. the fnet stem BIAS: instance
    # norm makes the loss exactly invariant to it, so its "gradient"
    # is pure cancellation noise in both versions).
    global_scale = max(
        float(np.abs(np.asarray(x)).max())
        for x in jax.tree_util.tree_leaves(g0)
    )
    for (p0, a), (p1, b) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        assert p0 == p1
        a = np.asarray(a).ravel().astype(np.float64)
        b = np.asarray(b).ravel().astype(np.float64)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if max(na, nb) < 1e-7 * global_scale:
            continue
        cos = float(a @ b / (na * nb))
        assert cos > 0.999, (p0, cos)
        assert 0.97 < na / nb < 1.03, (p0, na, nb)


def test_gru_static_hoist_exact(rng):
    """The hoisted static-input contributions make SepConvGRU output
    EXACTLY equal to the fused-conv path (conv linearity in f32)."""
    import jax
    import jax.numpy as jnp

    from atdn_vslam_tpu.models.flow.update import SepConvGRU

    gru = SepConvGRU(hidden_dim=16, static_dim=8, x_dim=24)
    h = jnp.asarray(rng.normal(size=(1, 6, 9, 16)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(1, 6, 9, 24)).astype(np.float32))
    variables = gru.init(jax.random.key(0), h, x)

    ref = gru.apply(variables, h, x)
    static = gru.apply(variables, None, x[..., :8], compute_static=True)
    assert len(static) == 4
    got = gru.apply(variables, h, x, static=static)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6
    )


def test_scan_unroll_matches_rolled(model_and_vars):
    """scan_unroll only changes the compilation schedule (and makes
    cost_analysis count every iteration — bench.py relies on it); the
    values must be identical to the rolled loop."""
    model, vars_ = model_and_vars
    rng = np.random.default_rng(7)
    im1 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    unrolled = RAFTGMA(iters=3, use_pallas=False, scan_unroll=3)
    ref_low, ref_up = model.apply(vars_, im1, im2, test_mode=True)
    got_low, got_up = unrolled.apply(vars_, im1, im2, test_mode=True)
    np.testing.assert_array_equal(np.asarray(ref_low), np.asarray(got_low))
    np.testing.assert_array_equal(np.asarray(ref_up), np.asarray(got_up))
