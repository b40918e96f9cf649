"""Unit tests for the shared NN blocks (shape/semantics parity with
ref: atdn_vslam/layers/conv.py, layers/linear.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.models.blocks import (
    ConvBlock,
    DUCBlock,
    LinearBlock,
    ResidualConvBlock,
    TransposedConvBlock,
    mish,
)


def test_mish_matches_definition():
    x = jnp.linspace(-4, 4, 33)
    expected = np.asarray(x) * np.tanh(np.log1p(np.exp(np.asarray(x))))
    np.testing.assert_allclose(np.asarray(mish(x)), expected, atol=1e-5)


def test_conv_block_shapes():
    m = ConvBlock(16, (7, 7), (2, 2), (3, 3))
    x = jnp.ones((2, 376, 64, 2))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)
    # torch conv arithmetic: out = floor((in + 2p - k)/s) + 1
    assert y.shape == (2, 188, 32, 16)


def test_conv_block_stride3_nopad():
    m = ConvBlock(16, (3, 3), (3, 3), (0, 0))
    x = jnp.ones((1, 12, 39, 16))
    vars_ = m.init(jax.random.key(0), x)
    assert m.apply(vars_, x).shape == (1, 4, 13, 16)


def test_residual_block_shapes_and_batchstats():
    m = ResidualConvBlock(16, (2, 2))
    x = jnp.ones((2, 94, 308, 16))
    vars_ = m.init(jax.random.key(0), x)
    y, mutated = m.apply(vars_, x, True, mutable=["batch_stats"])
    assert y.shape == (2, 47, 154, 16)
    assert "batch_stats" in mutated


def test_transposed_conv_torch_arithmetic():
    """torch ConvTranspose2d(k=3, s=2, p=1): out = 2*in - 1."""
    m = TransposedConvBlock(8)
    x = jnp.ones((1, 6, 20, 16))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)
    assert y.shape == (1, 11, 39, 8)


def test_duc_upscales_2x():
    m = DUCBlock(8)
    x = jnp.ones((1, 12, 20, 16))
    vars_ = m.init(jax.random.key(0), x)
    assert m.apply(vars_, x).shape == (1, 24, 40, 8)


def test_linear_block_with_norm_dropout():
    m = LinearBlock(64, norm=True, dropout=True)
    x = jnp.ones((4, 32))
    vars_ = m.init(jax.random.key(0), x)
    y = m.apply(vars_, x)  # eval: dropout off
    assert y.shape == (4, 64)
    y_train = m.apply(
        vars_, x, True, rngs={"dropout": jax.random.key(1)}
    )
    assert y_train.shape == (4, 64)


def test_batchnorm_running_stats_update():
    m = ConvBlock(4, (3, 3), (1, 1), (1, 1))
    x = jax.random.normal(jax.random.key(0), (8, 16, 16, 2)) * 3 + 1
    vars_ = m.init(jax.random.key(1), x)
    _, mutated = m.apply(vars_, x, True, mutable=["batch_stats"])
    new_mean = jax.tree.leaves(mutated["batch_stats"])[0]
    old_mean = jax.tree.leaves(vars_["batch_stats"])[0]
    assert not np.allclose(np.asarray(new_mean), np.asarray(old_mean))


def test_convblock_s2d_planar_matches_direct_conv():
    """The one-hot-matmul s2d lowering of the 7x7/s2/p3 ConvBlock (the
    ATDNVO stem path) shares parameters with the direct conv and
    matches its output to f32 summation-order tolerance; odd sizes
    fall back to the direct conv exactly."""
    m0 = ConvBlock(16, (7, 7), (2, 2), (3, 3))
    m1 = ConvBlock(16, (7, 7), (2, 2), (3, 3), s2d_planar=True)
    x = jax.random.normal(jax.random.key(0), (2, 24, 32, 2)) * 5
    vars_ = m0.init(jax.random.key(1), x)
    assert jax.tree.structure(vars_) == jax.tree.structure(
        m1.init(jax.random.key(1), x)
    )
    y0 = m0.apply(vars_, x)
    y1 = m1.apply(vars_, x)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), atol=1e-5
    )
    # odd input sizes take the direct-conv fallback bit-exactly
    xo = jax.random.normal(jax.random.key(2), (1, 23, 31, 2))
    vo = m0.init(jax.random.key(3), xo)
    np.testing.assert_array_equal(
        np.asarray(m1.apply(vo, xo)), np.asarray(m0.apply(vo, xo))
    )
