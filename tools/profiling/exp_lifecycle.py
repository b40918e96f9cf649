"""Chip timings for the non-odometry SLAM lifecycle (VERDICT r3 item
4): the bench covers streaming odometry; this measures the rest at the
reference working configuration.

  mapping  MappingVAE train step, batch 16 at 376x1232 (the reference's
           online map build, neural_slam.py:305-352) -> ms/step and
           s/epoch for a given keyframe count.
  embed    keyframe embedding throughput (VAE get_code, batch 8).
  reloc    relocalization query: VAE encode (single frame) + NN search
           + flow+odometry refine -> latency per stage.
  solve    pose-graph detect+solve: Gauss-Newton on a 200-keyframe
           chain with 5 closures (10 iterations).

All value-fenced; dispatch amortized with serial-dependent scans where
the per-call cost would otherwise drown in the ~35 ms tunnel RPC.
Usage: exp_lifecycle.py [mapping|embed|reloc|solve|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")

H, W = 376, 1232


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def run_mapping():
    from atdn_vslam_tpu.config import MappingTrainConfig
    from atdn_vslam_tpu.models.mapping import MappingVAE
    from atdn_vslam_tpu.training.mapping import init_state, make_train_step

    cfg = MappingTrainConfig()  # reference: batch 16, lr 1e-3
    b = cfg.batch_size
    # bf16 compute = the round-5 TPU factory default
    # (MappingModelConfig.compute_dtype; 328 -> 211 ms/step measured)
    model = MappingVAE(dtype=jnp.bfloat16, wpack=True)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (b, H, W, 3)).astype(np.float32)
    )
    state = init_state(model, cfg, 100, jnp.zeros((b, H, W, 3)))
    step = make_train_step(model, cfg, 100, donate=False)
    key = jax.random.key(0)
    state, loss = step(state, key, imgs)  # compile
    fence(loss)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        s2, loss = step(state, key, imgs)
        fence(loss)
        best = min(best, time.perf_counter() - t0)
    n_kf = 200  # a long KITTI sequence's keyframe count
    steps_per_epoch = max(n_kf // b, 1)
    print(
        f"mapping train step (batch {b}, {H}x{W}): {best*1e3:.1f} ms/step"
        f" -> {best*steps_per_epoch:.2f} s/epoch at {n_kf} keyframes"
        f" ({cfg.epochs} epochs = {best*steps_per_epoch*cfg.epochs:.1f} s"
        f" map build)",
        flush=True,
    )


def run_embed():
    from atdn_vslam_tpu.models.mapping import MappingVAE

    model = MappingVAE(dtype=jnp.bfloat16, wpack=True)  # round-5 TPU default
    b = 8
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.uniform(0, 255, (b, H, W, 3)).astype(np.float32)
    )
    variables = jax.jit(model.init)(jax.random.key(0), imgs)

    @jax.jit
    def encode_loop(variables, imgs):
        def body(c, _):
            mu = model.apply(
                variables, imgs + c, method=model.get_code
            )
            return jnp.sum(mu) * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0), None, length=8)[0]

    float(encode_loop(variables, imgs))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(encode_loop(variables, imgs))
        best = min(best, (time.perf_counter() - t0) / 8)
    print(
        f"keyframe embedding (batch {b}): {best*1e3:.1f} ms/batch = "
        f"{b/best:.0f} keyframes/s",
        flush=True,
    )


def run_reloc():
    from atdn_vslam_tpu.models.flow import RAFTGMA
    from atdn_vslam_tpu.models.mapping import MappingVAE
    from atdn_vslam_tpu.models.odometry import ATDNVO
    from atdn_vslam_tpu.geometry.se3 import pose_to_matrix

    rng = np.random.default_rng(0)
    vae = MappingVAE(dtype=jnp.bfloat16, wpack=True)  # round-5 TPU default
    img = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    vae_vars = jax.jit(vae.init)(jax.random.key(0), img)

    @jax.jit
    def encode_one_loop(variables, img):
        def body(c, _):
            mu = vae.apply(variables, img + c, method=vae.get_code)
            return jnp.sum(mu) * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0), None, length=8)[0]

    float(encode_one_loop(vae_vars, img))
    best_enc = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(encode_one_loop(vae_vars, img))
        best_enc = min(best_enc, (time.perf_counter() - t0) / 8)

    # NN search over 200 keyframes (host numpy, the production path)
    emb = rng.normal(size=(200, 128 * 6 * 20)).astype(np.float32)
    code = emb[37] + 0.01
    t0 = time.perf_counter()
    for _ in range(100):
        d = np.linalg.norm(
            emb - code.reshape(1, -1), axis=1
        )
        int(np.argmin(d))
    nn_ms = (time.perf_counter() - t0) / 100 * 1e3

    # refine = one flow+odometry step (fresh carry)
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    odo_model = ATDNVO(wpack=True)
    im2 = jnp.asarray(rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32))
    flow_vars = jax.jit(flow_model.init)(jax.random.key(0), img, im2)
    odo_vars = jax.jit(odo_model.init)(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
        odo_model.init_carry(1),
    )

    # refine with the keyframe fmap CACHED (the round-5 runtime
    # behavior, slam/runtime.py _keyframe_fmap: the keyframe side is
    # feature-encoded once per keyframe, the query side per call —
    # the streamed-pair regime). The cold pair measured 39.1 ms on the
    # device trace (batch-2 fnet ~15 ms); cached traces at 22.3 ms.
    @jax.jit
    def refine_loop(flow_vars, odo_vars, im1, im2):
        fmap1 = flow_model.apply(flow_vars, im1, encode_only=True)

        def body(c, _):
            (_, flow), _ = flow_model.apply(
                flow_vars, im1, im2 + c, test_mode=True,
                fmap1=fmap1, return_features=True,
            )
            (rot, tr), _ = odo_model.apply(
                odo_vars, flow[:, None], odo_model.init_carry(1)
            )
            mat = pose_to_matrix(rot[0, 0], tr[0, 0])
            return jnp.sum(mat) * 1e-30, None

        return jax.lax.scan(body, jnp.float32(0), None, length=4)[0]

    float(refine_loop(flow_vars, odo_vars, img, im2))
    best_ref = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(refine_loop(flow_vars, odo_vars, img, im2))
        best_ref = min(best_ref, (time.perf_counter() - t0) / 4)
    total = best_enc * 1e3 + nn_ms + best_ref * 1e3
    print(
        f"relocalization query: encode {best_enc*1e3:.1f} ms + NN(200) "
        f"{nn_ms:.2f} ms + refine(kf-cached) {best_ref*1e3:.1f} ms = "
        f"{total:.1f} ms",
        flush=True,
    )


def run_solve():
    from atdn_vslam_tpu.geometry.pose_graph import (
        odometry_edges,
        optimize_pose_graph,
        se3_exp,
    )
    from atdn_vslam_tpu.geometry.se3 import se3_inverse

    rng = np.random.default_rng(0)
    n = 200
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 2, 3] = np.arange(n)
    poses = jnp.asarray(poses)
    noise = se3_exp(
        jnp.asarray(rng.normal(size=(n, 6)).astype(np.float32) * 0.01)
    )
    poses = poses @ noise
    ei, ej = odometry_edges(n)
    meas = se3_inverse(poses[ei]) @ poses[ej]
    ci = jnp.asarray([199, 150, 120, 90, 60])
    cj = jnp.asarray([0, 10, 20, 30, 40])
    cm = se3_inverse(poses[ci]) @ poses[cj]
    w = jnp.concatenate(
        [jnp.ones((n - 1,)), jnp.full((5,), 4.0)]
    ).astype(jnp.float32)
    ei_all = jnp.concatenate([ei, ci])
    ej_all = jnp.concatenate([ej, cj])
    meas_all = jnp.concatenate([meas, cm])

    opt, mse = optimize_pose_graph(
        poses, ei_all, ej_all, meas_all, w, iterations=10
    )
    fence(opt)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        opt, mse = optimize_pose_graph(
            poses, ei_all, ej_all, meas_all, w, iterations=10
        )
        fence(opt)
        best = min(best, time.perf_counter() - t0)
    print(
        f"pose-graph solve (200 keyframes, 204 edges, 10 GN iters): "
        f"{best*1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    runs = {
        "mapping": run_mapping, "embed": run_embed,
        "reloc": run_reloc, "solve": run_solve,
    }
    for name, fn in runs.items():
        if which in ("all", name):
            fn()
