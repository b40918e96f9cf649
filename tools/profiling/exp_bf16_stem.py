"""Settle the bf16 odometry stem with numbers (VERDICT r3 item 2).

Two measurements:

  acc  (CPU, hermetic): the synthetic learnability harness
       (tests/test_e2e_learning.py pattern) trains ATDNVO with an f32
       vs bf16 stem on identical data/seeds and reports final loss +
       held-out trajectory ATE for each — the accuracy cost of the
       dtype change, quantified without KITTI ground truth.

  perf (TPU): the full bench window (flow 12 iters + odometry,
       376x1232, 64-frame streaming scan) A/B with each stem dtype —
       the in-situ perf delta (microbenches mislead; this is the
       repo's measurement discipline).

Usage: exp_bf16_stem.py [acc|perf]
"""

import os
import sys
import time

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "acc"

if MODE.startswith("acc"):
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if MODE.startswith("acc"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from atdn_vslam_tpu.models.odometry import ATDNVO  # noqa: E402


def run_acc():
    from atdn_vslam_tpu.config import LossConfig, TrainConfig
    from atdn_vslam_tpu.eval import ate_rmse
    from atdn_vslam_tpu.geometry import accumulate_poses
    from atdn_vslam_tpu.training.odometry import init_state, make_train_step

    H, W, T = 96, 192, 2
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, H), np.linspace(-1, 1, W), indexing="ij"
    )
    base = np.stack([np.ones_like(xx), xx, yy], axis=-1)

    def flows_for(rot, tr):
        fx = 40.0 * np.einsum("hwk,...k->...hw", base, rot * 20.0)
        fy = 15.0 * np.einsum("hwk,...k->...hw", base, tr)
        return np.stack([fx, fy], axis=-1).astype(np.float32)

    rng = np.random.default_rng(0)
    n_items = 48
    rot = rng.normal(scale=0.02, size=(n_items, T, 3)).astype(np.float32)
    tr = rng.normal(scale=0.3, size=(n_items, T, 3)).astype(np.float32)
    tr[..., 2] += 1.0
    flows = np.stack([flows_for(rot[i], tr[i]) for i in range(n_items)])

    m = 12
    ev_rot = rng.normal(scale=0.02, size=(m, 3)).astype(np.float32)
    ev_tr = rng.normal(scale=0.3, size=(m, 3)).astype(np.float32)
    ev_tr[:, 2] += 1.0
    ev_flows = flows_for(ev_rot, ev_tr)[None]
    gt_traj = np.asarray(
        accumulate_poses(jnp.asarray(ev_rot), jnp.asarray(ev_tr))
    )

    seed = int(os.environ.get("STEM_SEED", "1"))
    idx_rng = np.random.default_rng(seed)
    steps = 70
    batch_idx = [idx_rng.integers(0, n_items, 16) for _ in range(steps)]

    variants = (
        (("f32 encoder", {}), ("bf16 encoder",
                               {"compute_dtype": jnp.bfloat16}))
        if MODE == "acc_full"
        else (("f32 stem", {}), ("bf16 stem", {"stem_dtype": jnp.bfloat16}))
    )
    for label, kw in variants:
        model = ATDNVO(**kw)
        cfg = TrainConfig(batch_size=16, sequence_length=T, lr=3e-4)
        state = init_state(
            model, cfg, steps, jnp.zeros((16, T, H, W, 2)), seed=seed
        )
        step = make_train_step(model, cfg, LossConfig(), steps, donate=False)
        losses = []
        for idx in batch_idx:
            state, metrics = step(
                state, jnp.asarray(flows[idx]), jnp.asarray(rot[idx]),
                jnp.asarray(tr[idx]),
            )
            losses.append(float(metrics["loss"]))
        (pr, pt), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(ev_flows), model.init_carry(1),
        )
        pred_traj = np.asarray(accumulate_poses(pr[0], pt[0]))
        ate = ate_rmse(pred_traj, gt_traj, align=False)
        print(
            f"{label}: loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
            f"held-out ATE {ate:.4f} m",
            flush=True,
        )


def run_perf():
    from atdn_vslam_tpu.geometry.se3 import pose_to_matrix
    from atdn_vslam_tpu.models.flow import RAFTGMA

    H, W, N_FRAMES = 376, 1232, 64
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(0, 255, (N_FRAMES + 1, H, W, 3)).astype(np.float32)
    )
    flow_vars = jax.jit(flow_model.init)(
        jax.random.key(0), frames[:1], frames[1:2]
    )

    for label, dt in (("f32 stem", None), ("bf16 stem", jnp.bfloat16)):
        odo_model = ATDNVO(stem_dtype=dt)
        odo_vars = jax.jit(odo_model.init)(
            jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
            odo_model.init_carry(1),
        )

        @jax.jit
        def run_window(flow_vars, odo_vars, frames, odo_model=odo_model):
            def step(carry, pair):
                lstm_carry, pose, fmap_prev = carry
                im1, im2 = pair
                (_, flow), fmap2 = flow_model.apply(
                    flow_vars, im1[None], im2[None], test_mode=True,
                    fmap1=fmap_prev, return_features=True,
                )
                (rot, tr), lstm_carry = odo_model.apply(
                    odo_vars, flow[:, None], lstm_carry
                )
                pose = pose @ pose_to_matrix(rot[0, 0], tr[0, 0])
                return (lstm_carry, pose, fmap2), None

            pairs = (frames[:-1], frames[1:])
            fmap0 = flow_model.apply(flow_vars, frames[:1], encode_only=True)
            init = (odo_model.init_carry(1), jnp.eye(4), fmap0)
            (_, pose, _), _ = jax.lax.scan(step, init, pairs)
            return pose

        np.asarray(run_window(flow_vars, odo_vars, frames))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run_window(flow_vars, odo_vars, frames))
            best = min(best, (time.perf_counter() - t0) / N_FRAMES)
        print(
            f"{label}: {best*1e3:.2f} ms/frame ({1/best:.1f} fps)",
            flush=True,
        )


if __name__ == "__main__":
    (run_acc if MODE.startswith("acc") else run_perf)()
