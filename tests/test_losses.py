"""Unit tests for losses (parity target: ref atdn_vslam/odometry/loss.py,
localization/losses.py, localization/edl.py, neural_slam.py:336-340)."""

import jax
import jax.numpy as jnp
import numpy as np

from atdn_vslam_tpu.geometry.se3 import matrix_to_euler, pose_to_matrix
from atdn_vslam_tpu.training.losses import (
    clvo_loss,
    composed_pose_loss,
    embedding_distance_loss,
    mapping_reconstruction_loss,
    transform_loss,
    vae_loss,
)


def _rand_pose(rng, shape):
    rot = rng.normal(size=(*shape, 3)).astype(np.float32) * 0.05
    tr = rng.normal(size=(*shape, 3)).astype(np.float32)
    return jnp.asarray(rot), jnp.asarray(tr)


def test_transform_loss_weights(rng):
    pr, pt = _rand_pose(rng, (4, 6))
    tr_, tt = _rand_pose(rng, (4, 6))
    out = transform_loss(pr, pt, tr_, tt)
    expected = 1.0 * np.sum((np.asarray(pt) - np.asarray(tt)) ** 2, -1) + \
        100.0 * np.sum((np.asarray(pr) - np.asarray(tr_)) ** 2, -1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_clvo_zero_for_perfect_prediction(rng):
    r, t = _rand_pose(rng, (2, 6))
    assert float(clvo_loss(r, t, r, t, alpha=0.5, w=3)) < 1e-9


def test_composed_pose_loss_matches_naive(rng):
    """Prefix-product window composition == naive python chain
    (ref: loss.py:79-87)."""
    b, t, w = 2, 6, 3
    pr, pt = _rand_pose(rng, (b, t))
    tr_, tt = _rand_pose(rng, (b, t))
    ours = np.asarray(composed_pose_loss(pr, pt, tr_, tt, w=w))

    def naive_one(rot, tr, rot_t, tr_t):
        mats_p = np.asarray(pose_to_matrix(rot, tr))
        mats_t = np.asarray(pose_to_matrix(rot_t, tr_t))
        total = 0.0
        for j in range(t - w + 1):
            cp, ct = mats_p[j], mats_t[j]
            for i in range(j + 1, j + w):
                cp = cp @ mats_p[i]
                ct = ct @ mats_t[i]
            ep = np.asarray(matrix_to_euler(jnp.asarray(cp[:3, :3])))
            et = np.asarray(matrix_to_euler(jnp.asarray(ct[:3, :3])))
            total += 1.0 * np.sum((cp[:3, 3] - ct[:3, 3]) ** 2) + \
                100.0 * np.sum((ep - et) ** 2)
        return total

    expected = np.array(
        [naive_one(pr[i], pt[i], tr_[i], tt[i]) for i in range(b)]
    )
    np.testing.assert_allclose(ours, expected, rtol=1e-3, atol=1e-5)


def test_clvo_alpha_blend(rng):
    pr, pt = _rand_pose(rng, (3, 6))
    tr_, tt = _rand_pose(rng, (3, 6))
    l_rel_only = float(clvo_loss(pr, pt, tr_, tt, alpha=1.0))
    l_mix = float(clvo_loss(pr, pt, tr_, tt, alpha=0.5, w=3))
    l_com_only = float(clvo_loss(pr, pt, tr_, tt, alpha=0.0, w=3))
    np.testing.assert_allclose(
        l_mix, 0.5 * l_rel_only + 0.5 * l_com_only, rtol=1e-4
    )


def test_clvo_loss_differentiable(rng):
    pr, pt = _rand_pose(rng, (2, 6))
    tr_, tt = _rand_pose(rng, (2, 6))
    g = jax.grad(
        lambda r, t: clvo_loss(r, t, tr_, tt, alpha=0.3, w=3)
    )(pr, pt)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_vae_loss():
    mu = jnp.zeros((2, 4))
    logvar = jnp.zeros((2, 4))
    pred = jnp.ones((2, 8))
    target = jnp.zeros((2, 8))
    # KLD of N(0,1) vs N(0,1) is 0 -> loss == MSE == 1
    np.testing.assert_allclose(float(vae_loss(pred, target, mu, logvar)), 1.0, atol=1e-6)


def test_edl_zero_for_isometric_embedding(rng):
    pts = rng.normal(size=(3, 3)).astype(np.float32)
    emb = np.concatenate([pts * 2.0, np.zeros((3, 5), np.float32)], axis=1)
    out = float(embedding_distance_loss(jnp.asarray(emb), jnp.asarray(pts)))
    assert out < 1e-8


def test_mapping_reconstruction_loss(rng):
    target = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
    assert float(mapping_reconstruction_loss(target, target)) < 1e-9
    pred = target + 0.1
    # equal shift keeps saturation identical -> loss == mse == 0.01
    np.testing.assert_allclose(
        float(mapping_reconstruction_loss(pred, target)), 0.01, atol=1e-5
    )


def test_color_jitter_bounds(rng):
    import jax

    from atdn_vslam_tpu.training.mapping import color_jitter

    imgs = jnp.asarray(
        rng.uniform(0, 255, (3, 8, 8, 3)).astype(np.float32)
    )
    out = np.asarray(color_jitter(jax.random.key(0), imgs))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert not np.allclose(out, np.asarray(imgs))


def test_gaussian_blur_preserves_mean(rng):
    from atdn_vslam_tpu.training.mapping import gaussian_blur_5x5

    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    out = np.asarray(gaussian_blur_5x5(img))
    assert out.shape == (1, 16, 16, 3)
    # interior mean preserved; variance reduced
    assert abs(out[0, 4:12, 4:12].mean() - float(img[0, 4:12, 4:12].mean())) < 0.05
    assert out[0, 4:12, 4:12].std() < float(img[0, 4:12, 4:12].std())


def test_gaussian_blur_constant_invariant():
    from atdn_vslam_tpu.training.mapping import gaussian_blur_5x5

    img = jnp.ones((1, 12, 12, 3)) * 7.0
    out = np.asarray(gaussian_blur_5x5(img))
    # interior of a constant image stays constant
    np.testing.assert_allclose(out[0, 2:-2, 2:-2], 7.0, atol=1e-4)


def test_color_jitter_random_op_order(rng):
    """The jitter applies brightness/saturation in a random per-image
    ORDER with per-op clamping (torchvision ColorJitter semantics,
    ref neural_slam.py:323) — both orders must occur across a batch,
    and each image must match one of the two hand-computed orders."""
    import jax

    from atdn_vslam_tpu.training.mapping import color_jitter

    imgs = jnp.asarray(
        rng.uniform(0, 255, (64, 4, 4, 3)).astype(np.float32)
    )
    # large amplitudes make the two orders numerically distinct
    out = np.asarray(
        color_jitter(jax.random.key(3), imgs, brightness=0.9,
                     saturation=0.9)
    )

    # reproduce the draws the implementation makes
    r1, r2, r3 = jax.random.split(jax.random.key(3), 3)
    bf = np.asarray(jax.random.uniform(
        r1, (64, 1, 1, 1), minval=0.1, maxval=1.9))
    sf = np.asarray(jax.random.uniform(
        r2, (64, 1, 1, 1), minval=0.1, maxval=1.9))
    x = np.asarray(imgs)

    def bright(v):
        return np.clip(v * bf, 0, 255)

    def sat(v):
        g = v.mean(axis=-1, keepdims=True)
        return np.clip(g + sf * (v - g), 0, 255)

    bs = sat(bright(x))
    sb = bright(sat(x))
    match_bs = np.array([
        np.allclose(out[i], bs[i], atol=1e-4) for i in range(64)
    ])
    match_sb = np.array([
        np.allclose(out[i], sb[i], atol=1e-4) for i in range(64)
    ])
    assert (match_bs | match_sb).all(), "every image matches one order"
    assert match_bs.any() and (~match_bs & match_sb).any(), \
        "both orders occur across the batch"
