"""Round-5 VERDICT item 4: chip-time the two training steps at the
reference configs, with analytic FLOPs so each carries an MFU.

  odo   ATDNVO train step, batch 24, seq 6, full-res flows
        (ref: train_odometry.py:99-105, README.md:53-77)
  flow  RAFTGMA train step, batch 6, 288x960, 12 iters, remat on/off
        (ref: GMA/train.py:41-75 kitti stage)

Value-fenced scalar fetches; cost_analysis FLOPs (the flow scan body
counts once per trip at scan_unroll=1, so the flow step FLOP figure
uses full unroll for counting only — see bench.py's same trick).
Usage: exp_r5_trainsteps.py [odo|flow|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

PEAK_BF16 = 197e12  # v5e chip


def fence(tree):
    return float(
        jnp.sum(jax.tree.leaves(tree)[0].astype(jnp.float32))
    )


def run_odo(compute_dtype=None, wpack=False):
    from atdn_vslam_tpu.config import LossConfig, TrainConfig
    from atdn_vslam_tpu.models.odometry import ATDNVO
    from atdn_vslam_tpu.training.odometry import (
        init_state,
        make_train_step,
    )

    B, T, H, W = 24, 6, 376, 1232
    model = ATDNVO(compute_dtype=compute_dtype, wpack=wpack)
    tcfg, lcfg = TrainConfig(), LossConfig()
    rng = np.random.default_rng(0)
    flows = jnp.asarray(
        rng.normal(scale=20, size=(B, T, H, W, 2)).astype(np.float32)
    )
    rot = jnp.asarray(rng.normal(scale=0.01, size=(B, T, 3)).astype(np.float32))
    tr = jnp.asarray(rng.normal(scale=1.0, size=(B, T, 3)).astype(np.float32))
    state = init_state(model, tcfg, 100, jnp.zeros((B, T, H, W, 2)))
    step = make_train_step(model, tcfg, lcfg, 100, donate=False)

    # lower the FULL step (state out included): returning only the
    # loss lets XLA DCE the entire backward pass and undercounts ~3x
    cost = step.lower(state, flows, rot, tr).compile().cost_analysis()
    gflop = cost.get("flops", 0) / 1e9

    new_state, m = step(state, flows, rot, tr)
    fence(m["loss"])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fence(step(state, flows, rot, tr)[1]["loss"])
        best = min(best, time.perf_counter() - t0)
    frames = B * T
    dt = ("bf16" if compute_dtype is not None else "f32") + ("+wpack" if wpack else "")
    print(
        f"odometry train step [{dt}] (batch {B}, seq {T}, {H}x{W} flows): "
        f"{best*1e3:.1f} ms/step = {frames/best:.0f} flow-frames/s  "
        f"{gflop:.0f} GFLOP  mfu {gflop*1e9/(best*PEAK_BF16):.2%}",
        flush=True,
    )


def run_flow(remat: bool):
    import optax

    from atdn_vslam_tpu.models.flow import RAFTGMA
    from atdn_vslam_tpu.training.flow import init_state, make_train_step

    B, H, W = 6, 288, 960
    model = RAFTGMA(iters=12, dtype=jnp.bfloat16, remat=remat)
    rng = np.random.default_rng(0)
    im1 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32))
    gt = jnp.asarray(rng.normal(scale=10, size=(B, H, W, 2)).astype(np.float32))
    valid = jnp.ones((B, H, W), jnp.float32)
    tx = optax.adamw(1e-4, weight_decay=1e-5)
    state = init_state(model, im1, tx)
    step = make_train_step(model, tx)

    # FLOP counting: a rolled scan body counts ONCE regardless of trip
    # count; count with a fully-unrolled clone (params identical). The
    # unrolled BACKWARD graph at batch 6 fails to compile (the
    # one-step-per-iteration activation liveness explodes), so count
    # at batch 1 and scale linearly — every op in the step scales with
    # the batch dim.
    model_unrolled = RAFTGMA(
        iters=12, dtype=jnp.bfloat16, remat=remat, scan_unroll=12
    )
    step_u = make_train_step(model_unrolled, tx)
    state1 = init_state(model_unrolled, im1[:1], tx)
    # lower the FULL step — loss-only lowering DCEs the backward pass
    cost = (
        step_u.lower(state1, im1[:1], im2[:1], gt[:1], valid[:1])
        .compile()
        .cost_analysis()
    )
    gflop = cost.get("flops", 0) / 1e9 * B

    # the flow step donates its state arg — thread the returned state
    # through the timing loop (reusing the donated buffer is a
    # use-after-free INVALID_ARGUMENT through the tunnel)
    state, m = step(state, im1, im2, gt, valid)
    fence(m["loss"])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        state, m = step(state, im1, im2, gt, valid)
        fence(m["loss"])
        best = min(best, time.perf_counter() - t0)
    print(
        f"flow train step (batch {B}, {H}x{W}, 12 iters, "
        f"remat={'on' if remat else 'off'}): {best*1e3:.1f} ms/step = "
        f"{B/best:.1f} pairs/s  {gflop:.0f} GFLOP  "
        f"mfu {gflop*1e9/(best*PEAK_BF16):.2%}",
        flush=True,
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("odo", "all"):
        run_odo()
    if which == "odo_ab":
        # f32 vs bf16 encoder compute, both in ONE process (the only
        # trustworthy comparison on the shared chip), both orders
        run_odo()
        run_odo(jnp.bfloat16)
        run_odo()
        run_odo(jnp.bfloat16)
    if which == "odo_wpack":
        run_odo(jnp.bfloat16)
        run_odo(jnp.bfloat16, wpack=True)
        run_odo(jnp.bfloat16)
        run_odo(jnp.bfloat16, wpack=True)
        run_odo(None, wpack=True)
    if which in ("flow", "all"):
        run_flow(remat=True)
        run_flow(remat=False)
    if which == "flow_remat":
        run_flow(remat=True)
    if which == "flow_noremat":
        run_flow(remat=False)


if __name__ == "__main__":
    main()
