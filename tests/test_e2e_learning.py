"""End-to-end learnability: the full train -> eval loop must actually
learn on a synthetic task where flows deterministically encode pose
deltas.

This is the hermetic stand-in for KITTI trajectory reproduction (the
reference checkpoints are stripped from the mirror): flow windows are
generated as linear spatial encodings of the (rot, tr) deltas, ATDNVO
must learn the inverse mapping through the real sharded train step, and
the resulting trajectory must beat the untrained model by a wide margin.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.config import LossConfig, TrainConfig
from atdn_vslam_tpu.geometry import accumulate_poses
from atdn_vslam_tpu.eval import ate_rmse
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.training.odometry import init_state, make_train_step

H, W = 96, 192
T = 2


def _flows_for_deltas(rot: np.ndarray, tr: np.ndarray) -> np.ndarray:
    """(..., 3), (..., 3) -> (..., H, W, 2) flows linearly encoding the
    6 dof as constant + planar gradients (decodable by a CNN)."""
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij"
    )
    base = np.stack([np.ones_like(xx), xx, yy], axis=-1)  # (H, W, 3)
    fx = 40.0 * np.einsum("hwk,...k->...hw", base, rot * 20.0)
    fy = 15.0 * np.einsum("hwk,...k->...hw", base, tr)
    return np.stack([fx, fy], axis=-1).astype(np.float32)


@pytest.mark.slow
def test_train_eval_loop_learns(rng):
    n_items = 48
    rot = rng.normal(scale=0.02, size=(n_items, T, 3)).astype(np.float32)
    tr = rng.normal(scale=0.3, size=(n_items, T, 3)).astype(np.float32)
    tr[..., 2] += 1.0  # forward motion
    flows = np.stack(
        [_flows_for_deltas(rot[i], tr[i]) for i in range(n_items)]
    )

    model = ATDNVO()
    cfg = TrainConfig(batch_size=16, sequence_length=T, lr=3e-4)
    steps = 70
    state = init_state(model, cfg, steps, jnp.zeros((16, T, H, W, 2)))
    step = make_train_step(model, cfg, LossConfig(), steps, donate=False)

    losses = []
    for i in range(steps):
        idx = rng.integers(0, n_items, 16)
        state, metrics = step(
            state,
            jnp.asarray(flows[idx]),
            jnp.asarray(rot[idx]),
            jnp.asarray(tr[idx]),
        )
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])

    # evaluate a held-out trajectory: trained vs untrained ATE
    m = 12
    ev_rot = rng.normal(scale=0.02, size=(m, 3)).astype(np.float32)
    ev_tr = rng.normal(scale=0.3, size=(m, 3)).astype(np.float32)
    ev_tr[:, 2] += 1.0
    ev_flows = _flows_for_deltas(ev_rot, ev_tr)[None]  # (1, m, H, W, 2)

    def predict(params, batch_stats):
        (pr, pt), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(ev_flows), model.init_carry(1),
        )
        return np.asarray(pr[0]), np.asarray(pt[0])

    gt_traj = np.asarray(
        accumulate_poses(jnp.asarray(ev_rot), jnp.asarray(ev_tr))
    )
    pr, pt = predict(state.params, state.batch_stats)
    pred_traj = np.asarray(
        accumulate_poses(jnp.asarray(pr), jnp.asarray(pt))
    )
    trained_ate = ate_rmse(pred_traj, gt_traj, align=False)

    fresh = init_state(model, cfg, steps, jnp.zeros((16, T, H, W, 2)), seed=7)
    pr0, pt0 = predict(fresh.params, fresh.batch_stats)
    untrained_traj = np.asarray(
        accumulate_poses(jnp.asarray(pr0), jnp.asarray(pt0))
    )
    untrained_ate = ate_rmse(untrained_traj, gt_traj, align=False)

    assert np.isfinite(trained_ate)
    assert trained_ate < untrained_ate * 0.5, (trained_ate, untrained_ate)
