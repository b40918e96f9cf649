"""Width-packed convolution (ops/wpack.py) — equality vs the plain
NHWC conv for every kernel/stride geometry the odometry and mapping
encoders use (ref shapes: atdn_vslam/odometry/network.py:63-73,
localization/network.py:29-42)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.ops.wpack import (
    choose_pack,
    conv_packed,
    pack_width,
    unpack_width,
)


def _ref_conv(x, w, b, strides, padding):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=strides,
        padding=tuple((p, p) for p in padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if b is None else out + b


def test_pack_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 24, 3)).astype(np.float32))
    assert np.array_equal(np.asarray(unpack_width(pack_width(x, 8), 8)),
                          np.asarray(x))


@pytest.mark.parametrize(
    "shape,kernel,stride,pad,p",
    [
        ((2, 12, 56, 16), (3, 3), (1, 1), (1, 1), 7),   # RCB conv1
        ((2, 12, 56, 16), (3, 3), (2, 2), (1, 1), 7),   # RCB conv2 s2
        ((2, 12, 56, 16), (1, 1), (2, 2), (0, 0), 7),   # RCB skip s2
        ((2, 13, 64, 3), (7, 7), (1, 1), (3, 3), 16),   # VAE stem 7x7 s1
        ((1, 9, 56, 3), (3, 3), (2, 2), (1, 1), 7),     # 3ch s2
        ((2, 12, 48, 16), (3, 3), (1, 1), (1, 1), 8),   # p=8
    ],
)
def test_conv_packed_matches_reference(rng, shape, kernel, stride, pad, p):
    ci = shape[-1]
    co = 16
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(
        rng.normal(scale=0.3, size=(*kernel, ci, co)).astype(np.float32)
    )
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ref = _ref_conv(x, w, b, stride, pad)
    got = unpack_width(
        conv_packed(pack_width(x, p), w, b, p, stride, pad), p
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )


def test_conv_packed_gradients_match(rng):
    """Parameter gradients flow through the placement einsum and match
    the plain conv's gradients."""
    x = jnp.asarray(rng.normal(size=(2, 8, 28, 16)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(scale=0.3, size=(3, 3, 16, 16)).astype(np.float32)
    )

    def loss_ref(w):
        return jnp.sum(_ref_conv(x, w, None, (2, 2), (1, 1)) ** 2)

    def loss_packed(w):
        return jnp.sum(
            conv_packed(pack_width(x, 7), w, None, 7, (2, 2), (1, 1)) ** 2
        )

    g_ref = jax.grad(loss_ref)(w)
    g_pk = jax.grad(loss_packed)(w)
    np.testing.assert_allclose(
        np.asarray(g_pk), np.asarray(g_ref), atol=1e-2, rtol=1e-4
    )


def test_conv_packed_rejects_bad_geometry(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 24, 16)).astype(np.float32))
    w = jnp.zeros((3, 3, 16, 16), jnp.float32)
    # out width 12 not divisible by p=8
    with pytest.raises(ValueError, match="not divisible"):
        conv_packed(pack_width(x, 8), w, None, 8, (2, 2), (1, 1))
    with pytest.raises(ValueError, match="width pad"):
        conv_packed(pack_width(x, 2), w, None, 2, (1, 1), (2, 2))


def test_choose_pack():
    # odometry chain: 616 -> 308 -> 154 -> 77, 16 channels
    assert choose_pack((616, 308, 154, 77), 16) == 7
    # test-size chain: 96 -> 48 -> 24
    assert choose_pack((96, 48, 24), 16) == 8
    # no valid p
    assert choose_pack((31, 17), 16) == 1
    # VAE stem at KITTI width, 3 channels
    p = choose_pack((1232,), 3)
    assert p >= 16 and 1232 % p == 0


@pytest.mark.parametrize(
    "shape,kernel,stride,pad,p,p_in",
    [
        ((2, 14, 64, 2), (7, 7), (2, 2), (3, 3), 8, 16),  # odo stem
        ((1, 10, 56, 3), (3, 3), (2, 2), (1, 1), 7, 14),  # 3ch s2 entry
    ],
)
def test_conv_packed_entry_stem(rng, shape, kernel, stride, pad, p, p_in):
    """Entry-stem geometry: input packed with p_in = s*p so the
    small-channel input fills lanes and the padded NHWC input tensor
    never materializes (block stride 1)."""
    ci, co = shape[-1], 16
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(
        rng.normal(scale=0.3, size=(*kernel, ci, co)).astype(np.float32)
    )
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
    ref = _ref_conv(x, w, b, stride, pad)
    got = unpack_width(
        conv_packed(pack_width(x, p_in), w, b, p, stride, pad, p_in=p_in),
        p,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-5
    )
