"""Unit tests for the ATDNVO odometry model
(parity target: ref atdn_vslam/odometry/network.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.models.odometry import ATDNVO

# small size that survives the /32 + stride-3 conv stack; the full
# 376x1232 geometry (Linear 832) is covered by test_encoder_flattened_832
H, W = 96, 192


@pytest.fixture(scope="module")
def small_model_and_vars():
    model = ATDNVO()
    flows = jnp.zeros((1, 1, H, W, 2))
    carry = model.init_carry(1)
    vars_ = model.init(jax.random.key(0), flows, carry)
    return model, vars_


def test_forward_shapes(small_model_and_vars):
    model, vars_ = small_model_and_vars
    flows = jnp.ones((1, 3, H, W, 2))
    carry = model.init_carry(1)
    (rot, tr), carry2 = model.apply(vars_, flows, carry)
    assert rot.shape == (1, 3, 3)
    assert tr.shape == (1, 3, 3)
    # carry structure: ((c1,h1),(c2,h2)) with 512-wide states
    (c1, h1), (c2, h2) = carry2
    assert c1.shape == h1.shape == c2.shape == h2.shape == (1, 512)


def test_encoder_flattened_832():
    """At 376x1232, the encoder's final conv output is 4x13x16 = 832
    features (ref: odometry/network.py:72 Linear(832, 512)). Shape-only
    init via eval_shape — no full-res compile."""
    model = ATDNVO()
    flows = jnp.zeros((1, 1, 376, 1232, 2))
    carry = model.init_carry(1)
    vars_shape = jax.eval_shape(model.init, jax.random.key(0), flows, carry)
    kernel = vars_shape["params"]["encoder"]["LinearBlock_0"]["Dense_0"]["kernel"]
    assert kernel.shape == (832, 512)


def test_carry_is_stateful(small_model_and_vars):
    """Same input twice with carried state must give different outputs,
    resetting the carry must reproduce the first output
    (ref semantics: network.py:137-140,149-153)."""
    model, vars_ = small_model_and_vars
    flows = jnp.ones((1, 1, H, W, 2)) * 5.0
    carry = model.init_carry(1)
    (r1, t1), carry2 = model.apply(vars_, flows, carry)
    (r2, _), _ = model.apply(vars_, flows, carry2)
    assert not np.allclose(np.asarray(r1), np.asarray(r2))
    (r3, t3), _ = model.apply(vars_, flows, model.init_carry(1))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t3), atol=1e-6)


def test_window_equals_stepwise(small_model_and_vars):
    """Processing a window in one call == stepping frame by frame with
    threaded carry (the lax.scan/batch-folded encoder must not change
    the recurrence semantics)."""
    model, vars_ = small_model_and_vars
    flows = jax.random.normal(jax.random.key(1), (1, 3, H, W, 2)) * 10
    carry = model.init_carry(1)
    (rot_win, tr_win), _ = model.apply(vars_, flows, carry)

    carry = model.init_carry(1)
    rots, trs = [], []
    for j in range(3):
        (r, t), carry = model.apply(vars_, flows[:, j : j + 1], carry)
        rots.append(r[:, 0])
        trs.append(t[:, 0])
    np.testing.assert_allclose(
        np.asarray(rot_win[0]), np.asarray(jnp.stack(rots, 1)[0]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tr_win[0]), np.asarray(jnp.stack(trs, 1)[0]), atol=1e-5
    )


def test_train_mode_mutates_batch_stats(small_model_and_vars):
    model, vars_ = small_model_and_vars
    flows = jax.random.normal(jax.random.key(2), (2, 2, H, W, 2))
    carry = model.init_carry(2)
    (_, _), mutated = model.apply(
        vars_, flows, carry, True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated


def test_gradients_flow(small_model_and_vars):
    model, vars_ = small_model_and_vars
    flows = jax.random.normal(jax.random.key(3), (1, 2, H, W, 2))

    def loss_fn(params):
        carry = model.init_carry(1)
        (rot, tr), _ = model.apply(
            {**vars_, "params": params}, flows, carry
        )
        return jnp.sum(rot**2) + jnp.sum(tr**2)

    grads = jax.grad(loss_fn)(vars_["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # at least the heads and lstm get nonzero grads
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_bf16_compute_encoder(small_model_and_vars):
    """ATDNVO(compute_dtype=bf16): same params, outputs f32 and close
    to the f32 path; a train-mode gradient is finite and f32. The
    train-step device trace motivating this option is in STATUS.md
    round-5 (the 16-channel encoder activations pay 8x lane padding;
    bf16 halves the dominant HBM traffic)."""
    model, vars_ = small_model_and_vars
    b16 = ATDNVO(compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    flows = jnp.asarray(
        rng.normal(scale=15.0, size=(2, 2, H, W, 2)).astype(np.float32)
    )
    carry = model.init_carry(2)
    (rot_f, tr_f), _ = model.apply(vars_, flows, carry)
    (rot_b, tr_b), _ = b16.apply(vars_, flows, carry)
    assert rot_b.dtype == jnp.float32 and tr_b.dtype == jnp.float32
    scale = float(jnp.abs(rot_f).max()) + 1e-6
    assert float(jnp.abs(rot_b - rot_f).max()) < 5e-2 * scale + 1e-3

    def loss(params):
        (r, t), _ = b16.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            flows, carry,
        )
        return jnp.sum(r**2) + jnp.sum(t**2)

    g = jax.grad(loss)(vars_["params"])
    leaves = jax.tree.leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_wpack_encoder_matches(small_model_and_vars):
    """ATDNVO(wpack=True): width-packed residual chain, same params
    (checkpoint-compatible scopes), outputs equal to the plain path up
    to f32 summation order. Train mode must also update the SAME
    batch_stats keys with matching statistics."""
    model, vars_ = small_model_and_vars
    wp = ATDNVO(wpack=True)
    rng = np.random.default_rng(5)
    flows = jnp.asarray(
        rng.normal(scale=15.0, size=(2, 2, H, W, 2)).astype(np.float32)
    )
    carry = model.init_carry(2)
    (rot_a, tr_a), _ = model.apply(vars_, flows, carry)
    (rot_b, tr_b), _ = wp.apply(vars_, flows, carry)
    np.testing.assert_allclose(
        np.asarray(rot_b), np.asarray(rot_a), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tr_b), np.asarray(tr_a), atol=1e-4, rtol=1e-4
    )

    # train mode: same batch_stats tree, statistics agree
    _, st_a = model.apply(
        vars_, flows, carry, train=True, mutable=["batch_stats"]
    )
    _, st_b = wp.apply(
        vars_, flows, carry, train=True, mutable=["batch_stats"]
    )
    fa = jax.tree.leaves(st_a["batch_stats"])
    fb = jax.tree.leaves(st_b["batch_stats"])
    assert jax.tree.structure(st_a["batch_stats"]) == jax.tree.structure(
        st_b["batch_stats"]
    )
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-3
        )
