"""Sharded odometry (ATDNVO) training.

TPU-native re-design of the reference training loop
(ref: train_odometry.py:21-150):

  * the per-window python loop feeding the stateful LSTM
    (train_odometry.py:32-38) becomes one batched model call (encoder
    folded over time, explicit carry) inside a single jitted train
    step;
  * AdamW + cosine annealing to ``eta_min`` reproduces
    train_odometry.py:99-105;
  * the batch axis is sharded over the mesh "data" axis; parameters
    are replicated and gradients all-reduce implicitly (GSPMD) —
    replacing the reference's single-GPU setup (SURVEY.md 2.26);
  * checkpoints carry params + batch_stats + optimizer state + step
    (the reference saves weights only, train_odometry.py:140);
  * the stage curriculum (stage > 1 warm-starts from the previous
    stage's checkpoint, train_odometry.py:94-97) is preserved.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh

from atdn_vslam_tpu.config import Config, LossConfig, TrainConfig
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.parallel.mesh import batch_sharding, replicated, shard_batch
from atdn_vslam_tpu.training.losses import clvo_loss


class OdometryTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(train_cfg: TrainConfig, steps_total: int):
    """AdamW + cosine annealing lr -> eta_min
    (ref: train_odometry.py:99-105)."""
    schedule = optax.cosine_decay_schedule(
        init_value=train_cfg.lr,
        decay_steps=max(steps_total, 1),
        alpha=train_cfg.eta_min / train_cfg.lr,
    )
    return optax.adamw(
        schedule,
        weight_decay=train_cfg.wd,
        eps=train_cfg.epsilon,
    )


def init_state(
    model: ATDNVO,
    train_cfg: TrainConfig,
    steps_total: int,
    sample_flows: jax.Array,
    seed: int | None = None,
) -> OdometryTrainState:
    rng = jax.random.key(seed if seed is not None else train_cfg.seed)
    carry = model.init_carry(sample_flows.shape[0])
    variables = model.init(rng, sample_flows, carry)
    tx = make_optimizer(train_cfg, steps_total)
    return OdometryTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=tx.init(variables["params"]),
    )


def make_train_step(
    model: ATDNVO,
    train_cfg: TrainConfig,
    loss_cfg: LossConfig,
    steps_total: int,
    mesh: Mesh | None = None,
    donate: bool = True,
    state_sharding=None,
):
    """Build the jitted train step.

    step(state, flows, true_rot, true_tr) -> (state, metrics)
    with flows (B, T, H, W, 2) and targets (B, T, 3). The LSTM carry is
    reset to zero for every window, matching the reference's
    ``reset_lstm()`` after each batch (train_odometry.py:48).
    """
    tx = make_optimizer(train_cfg, steps_total)

    def step_fn(state: OdometryTrainState, flows, true_rot, true_tr):
        def loss_fn(params):
            carry = model.init_carry(flows.shape[0], flows.dtype)
            ((rot, tr), _carry), mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                flows,
                carry,
                True,
                mutable=["batch_stats"],
            )
            loss = clvo_loss(
                rot, tr, true_rot, true_tr,
                alpha=loss_cfg.alpha, w=loss_cfg.w,
                delta=loss_cfg.delta, khi=loss_cfg.khi,
            )
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "step": state.step,
        }
        return (
            state.replace(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
            ),
            metrics,
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = replicated(mesh)
    batch = batch_sharding(mesh)
    # optional tensor parallelism: pass a state-sharding pytree (e.g.
    # from parallel.model_parallel_sharding) to shard large kernels
    # over the "model" axis; default is replicated parameters
    state_in = repl if state_sharding is None else state_sharding
    return jax.jit(
        step_fn,
        in_shardings=(state_in, batch, batch, batch),
        out_shardings=(state_in, repl),
        donate_argnums=(0,) if donate else (),
    )


def train_epoch(
    step_fn,
    state: OdometryTrainState,
    batches: Iterable[tuple[Any, Any, Any]],
    mesh: Mesh | None = None,
    log_every: int = 50,
    log_fn=None,
) -> tuple[OdometryTrainState, list[float]]:
    """Run one epoch over an iterable of (flows, rot, tr) host batches."""
    losses = []
    for i, (flows, rot, tr) in enumerate(batches):
        if mesh is not None:
            flows, rot, tr = shard_batch(mesh, (flows, rot, tr))
        state, metrics = step_fn(state, flows, rot, tr)
        loss = float(metrics["loss"])
        losses.append(loss)
        if log_fn is not None and i % log_every == 0:
            log_fn(i, metrics)
    return state, losses


# ----------------------------------------------------------------------
# Checkpointing (Orbax) — params + batch_stats + opt state + step,
# improving on the reference's weights-only torch.save
# (train_odometry.py:138-140; SURVEY.md 5.4).
# ----------------------------------------------------------------------

def checkpoint_path(config: Config, stage: int) -> str:
    return os.path.join(
        os.path.abspath(config.checkpoint_dir), f"odometry_stage{stage}"
    )


def save_checkpoint(config: Config, stage: int, state: OdometryTrainState):
    import orbax.checkpoint as ocp

    path = checkpoint_path(config, stage)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(
    config: Config, stage: int, target: OdometryTrainState
) -> OdometryTrainState:
    import orbax.checkpoint as ocp

    path = checkpoint_path(config, stage)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(item=jax.device_get(target)),
        )
    return restored


def warm_start(
    config: Config, state: OdometryTrainState
) -> OdometryTrainState:
    """Stage curriculum: stage > 1 loads the previous stage's params and
    batch_stats but fresh optimizer state (ref: train_odometry.py:94-97
    loads weights only)."""
    stage = config.train.stage
    if stage <= 1:
        return state
    prev = load_checkpoint(config, stage - 1, state)
    return state.replace(params=prev.params, batch_stats=prev.batch_stats)
