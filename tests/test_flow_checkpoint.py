"""Flow-training checkpointing: full Orbax train state (params +
batch_stats + optimizer state + step) with mid-stage kill-and-resume
reproducing the uninterrupted run — the capability the reference's
weights-only saves (GMA/train.py:166-171) cannot provide.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.training.flow import (
    checkpoint_path,
    init_state,
    latest_checkpoint,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)


def _tiny_model():
    return RAFTGMA(iters=2, dtype=jnp.float32, use_pallas=False)


def _batch(rng, i):
    r = np.random.default_rng((7, i))
    im1 = jnp.asarray(r.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    im2 = jnp.asarray(r.uniform(0, 255, (1, 64, 96, 3)).astype(np.float32))
    flow = jnp.asarray(r.normal(size=(1, 64, 96, 2)).astype(np.float32))
    valid = jnp.ones((1, 64, 96), jnp.float32)
    return im1, im2, flow, valid


def test_kill_and_resume_reproduces_uninterrupted(tmp_path, rng):
    """Save the full state after step 2 of 4, restore into a fresh
    process-equivalent state, run steps 3-4: params, opt state, and
    step match the uninterrupted 4-step run exactly."""
    model = _tiny_model()
    tx = make_optimizer(1e-4, steps_total=4)
    step = make_train_step(model, tx)

    # uninterrupted run: 4 steps
    state_a = init_state(model, jnp.zeros((1, 64, 96, 3)), tx, seed=0)
    for i in range(4):
        state_a, _ = step(state_a, *_batch(rng, i))

    # interrupted run: 2 steps -> checkpoint -> "kill"
    state_b = init_state(model, jnp.zeros((1, 64, 96, 3)), tx, seed=0)
    for i in range(2):
        state_b, _ = step(state_b, *_batch(rng, i))
    ckpt = checkpoint_path(str(tmp_path), 2)
    save_checkpoint(ckpt, state_b)
    del state_b

    # resume in a "fresh process": new state skeleton, restore, finish
    assert latest_checkpoint(str(tmp_path)) == ckpt
    target = init_state(model, jnp.zeros((1, 64, 96, 3)), tx, seed=0)
    state_c = load_checkpoint(ckpt, target)
    start = int(jax.device_get(state_c.step))
    assert start == 2
    for i in range(start, 4):
        state_c, _ = step(state_c, *_batch(rng, i))

    assert int(jax.device_get(state_c.step)) == 4
    for a, c in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    # optimizer state (Adam moments) must match too — the piece a
    # weights-only save loses
    for a, c in zip(jax.tree.leaves(state_a.opt_state),
                    jax.tree.leaves(state_c.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_latest_checkpoint_ordering(tmp_path):
    assert latest_checkpoint(str(tmp_path / "missing")) is None
    model = _tiny_model()
    tx = make_optimizer(1e-4, steps_total=2)
    state = init_state(model, jnp.zeros((1, 64, 96, 3)), tx, seed=0)
    save_checkpoint(checkpoint_path(str(tmp_path), 2), state)
    save_checkpoint(checkpoint_path(str(tmp_path), 10), state)
    latest = latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("step_00000010")


def test_train_flow_cli_resumes(tmp_path, rng):
    """CLI-level: a rerun with the same --checkpoint-dir resumes from
    the saved step instead of restarting (kill simulated by a first
    run whose checkpoint survives)."""
    pytest.importorskip("cv2")
    from tests.test_flow_data import make_things_tree

    make_things_tree(tmp_path / "things", np.random.default_rng(0),
                     seqs=1, frames=3)

    from atdn_vslam_tpu.cli.train_flow import main

    common = [
        "--dataset", "things", "--root", str(tmp_path / "things"),
        "--batch-size", "1", "--crop", "56", "72", "--iters", "1",
        "--steps", "3", "--no-mesh",
        "--checkpoint-dir", str(tmp_path / "ckpts"),
        "--checkpoint-every", "2",
        "--output", str(tmp_path / "out.msgpack"),
    ]
    assert main(common) == 0
    saved = latest_checkpoint(str(tmp_path / "ckpts"))
    assert saved is not None and saved.endswith("step_00000002")

    # "resume": the rerun must pick up at step 2 (one remaining step,
    # no checkpoint rewrite at step 3 since 3 % 2 != 0)
    assert main(common) == 0
    assert latest_checkpoint(str(tmp_path / "ckpts")) == saved
