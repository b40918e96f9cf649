"""Loss functions.

Vectorized, differentiable re-designs of the reference losses:

  * ``clvo_loss`` — the CLVO pose loss (ref: atdn_vslam/odometry/
    loss.py:7-118): weighted relative-pose MSE plus a windowed
    composed-pose term. The reference computes the composed term with
    three nested python loops of 4x4 matmuls and gradient-breaking
    euler conversions (loss.py:47-99 + transforms.py:50); here it is a
    batched prefix-product (``lax.associative_scan``) with exact SE(3)
    window extraction — and gradients flow.
  * ``vae_loss`` — MSE + beta*KLD (ref: localization/losses.py:5-16).
  * ``embedding_distance_loss`` — pairwise distance-ratio preservation
    over triplets (ref: localization/edl.py:7-27).
  * ``mapping_reconstruction_loss`` — the mapping loss actually used by
    the SLAM runtime: reconstruction MSE + saturation L1
    (ref: slam_framework/neural_slam.py:336-340).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from atdn_vslam_tpu.geometry.se3 import (
    matrix_to_euler,
    pose_to_matrix,
    se3_inverse,
)

# CLVO loss weights (ref: odometry/loss.py:20-22)
DELTA = 1.0
KHI = 100.0


def transform_loss(
    pred_rot: jax.Array,
    pred_tr: jax.Array,
    true_rot: jax.Array,
    true_tr: jax.Array,
    delta: float = DELTA,
    khi: float = KHI,
) -> jax.Array:
    """delta*||dtr||^2 + khi*||drot||^2, reduced over the last axis
    (ref: loss.py:104-118)."""
    rot_term = jnp.sum((pred_rot - true_rot) ** 2, axis=-1)
    tr_term = jnp.sum((pred_tr - true_tr) ** 2, axis=-1)
    return delta * tr_term + khi * rot_term


def _window_compositions(rot: jax.Array, tr: jax.Array, w: int) -> jax.Array:
    """Compose every length-w window of relative transforms.

    :param rot: (B, T, 3) euler rotations, tr: (B, T, 3).
    :return: (B, T-w+1, 4, 4) composed transforms
        prod_{i=j}^{j+w-1} T_i for each window start j.

    Uses prefix products: with P_k = T_0 @ ... @ T_{k-1} (P_0 = I),
    the window product is inv(P_j) @ P_{j+w} — O(T) matmuls instead of
    the reference's O(T*w) loop (loss.py:79-87).
    """
    mats = pose_to_matrix(rot, tr)  # (B, T, 4, 4)
    prefix = jax.lax.associative_scan(jnp.matmul, mats, axis=1)
    eye = jnp.broadcast_to(
        jnp.eye(4, dtype=mats.dtype), (*mats.shape[:-3], 1, 4, 4)
    )
    prefix = jnp.concatenate([eye, prefix], axis=1)  # (B, T+1, 4, 4)
    t = rot.shape[1]
    starts = prefix[:, : t - w + 1]
    ends = prefix[:, w:]
    return se3_inverse(starts) @ ends


def composed_pose_loss(
    pred_rot: jax.Array,
    pred_tr: jax.Array,
    true_rot: jax.Array,
    true_tr: jax.Array,
    w: int = 3,
    delta: float = DELTA,
    khi: float = KHI,
) -> jax.Array:
    """Windowed composed-pose loss, summed over windows -> (B,)
    (ref: loss.py:60-101)."""
    pred_c = _window_compositions(pred_rot, pred_tr, w)
    true_c = _window_compositions(true_rot, true_tr, w)
    loss = transform_loss(
        matrix_to_euler(pred_c[..., :3, :3]),
        pred_c[..., :3, 3],
        matrix_to_euler(true_c[..., :3, :3]),
        true_c[..., :3, 3],
        delta,
        khi,
    )
    return jnp.sum(loss, axis=-1)


def clvo_loss(
    pred_rot: jax.Array,
    pred_tr: jax.Array,
    true_rot: jax.Array,
    true_tr: jax.Array,
    alpha: float = 1.0,
    w: int = 3,
    delta: float = DELTA,
    khi: float = KHI,
) -> jax.Array:
    """Total CLVO pose loss (ref: loss.py:25-57).

    All inputs (B, T, 3). Returns a scalar:
    mean_B( alpha * sum_T L_rel + (1-alpha) * sum_windows L_com ).
    When alpha == 1 the composite branch is skipped entirely (the
    reference computes it anyway and multiplies by zero, loss.py:46-55).
    """
    l_rel = jnp.sum(
        transform_loss(pred_rot, pred_tr, true_rot, true_tr, delta, khi),
        axis=-1,
    )
    if alpha == 1.0:
        return jnp.mean(l_rel)
    l_com = composed_pose_loss(
        pred_rot, pred_tr, true_rot, true_tr, w, delta, khi
    )
    return jnp.mean(alpha * l_rel + (1.0 - alpha) * l_com)


def vae_loss(
    pred: jax.Array,
    target: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    beta: float = 1.0,
) -> jax.Array:
    """MSE + beta * KL(N(mu, sigma) || N(0, 1))
    (ref: localization/losses.py:5-16)."""
    mse = jnp.mean((pred - target) ** 2)
    kld = -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))
    return mse + beta * kld


def embedding_distance_loss(
    embeddings: jax.Array, points: jax.Array
) -> jax.Array:
    """Preserve pairwise distance *ratios* of point triplets in embedding
    space (ref: localization/edl.py:7-27).

    :param embeddings: (3, D) triplet of embeddings (flattened codes).
    :param points: (3, P) triplet of reference points (e.g. positions).
    """
    e1, e2, e3 = embeddings[0], embeddings[1], embeddings[2]
    p1, p2, p3 = points[0], points[1], points[2]
    eps = 1e-8

    def ratio(a, b):
        return jnp.linalg.norm(a) / (jnp.linalg.norm(b) + eps)

    r_p12_13 = ratio(p1 - p2, p1 - p3)
    r_p12_23 = ratio(p1 - p2, p2 - p3)
    r_p13_23 = ratio(p1 - p3, p2 - p3)
    r_e12_13 = ratio(e1 - e2, e1 - e3)
    r_e12_23 = ratio(e1 - e2, e2 - e3)
    r_e13_23 = ratio(e1 - e3, e2 - e3)
    return (
        (r_p12_13 - r_e12_13) ** 2
        + (r_p12_23 - r_e12_23) ** 2
        + (r_p13_23 - r_e13_23) ** 2
    )


def mapping_reconstruction_loss(
    pred: jax.Array, target: jax.Array
) -> jax.Array:
    """Reconstruction MSE + saturation (per-pixel channel max-min) L1 —
    the map-building loss actually used by the SLAM runtime
    (ref: neural_slam.py:336-340). NHWC inputs.

    Measured NEGATIVE (round 5, do not retry): rewriting the channel
    max/min lane-reduces as unrolled elementwise max/min over sliced
    channel planes — hoping to avoid re-reading the ~42x-lane-padded
    (…, 3) tensors six times (~18 ms/step in the device trace) —
    regressed the pipelined step 117 -> 122.5 ms: XLA does not fuse
    the three lane slices into one pass, and the maximum-chain
    backward adds select/scatter passes the reduce form doesn't pay.
    """
    mse = jnp.mean((pred - target) ** 2)
    sat_true = jnp.max(target, axis=-1) - jnp.min(target, axis=-1)
    sat_pred = jnp.max(pred, axis=-1) - jnp.min(pred, axis=-1)
    sat = jnp.mean(jnp.abs(sat_true - sat_pred))
    return mse + sat
