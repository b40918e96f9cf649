"""End-to-end SLAM runtime tests on tiny synthetic inputs (parity
target: ref slam_framework/neural_slam.py and test_slam.py semantics)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.config import (
    Config,
    MappingTrainConfig,
    FlowNetConfig,
    SlamConfig,
)
from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.slam import KeyframeStore, SlamRuntime

# smallest size that both the flow net (/8) and the ATDNVO encoder
# (/32 then stride-3 conv) accept
H, W = 96, 192


def tiny_config(tmp_path) -> Config:
    return Config(
        keyframes_path=str(tmp_path / "keyframes"),
        flow=FlowNetConfig(iters=2, mixed_precision=False,
                           use_pallas_attention=False),
        slam=SlamConfig(
            image_height=H, image_width=W,
            rotation_threshold_deg=0.0,  # register everything
            translation_threshold=0.0,
        ),
        mapping_train=MappingTrainConfig(epochs=2, batch_size=2),
    )


@pytest.fixture(scope="module")
def model_vars():
    flow_model = RAFTGMA(iters=2, use_pallas=False)
    im = jnp.zeros((1, H, W, 3))
    flow_vars = flow_model.init(jax.random.key(0), im, im)
    odo_model = ATDNVO()
    flows = jnp.zeros((1, 1, H, W, 2))
    odo_vars = odo_model.init(
        jax.random.key(1), flows, odo_model.init_carry(1)
    )
    return flow_vars, odo_vars


def frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(0, 255, (H, W, 3), dtype=np.uint8) for _ in range(n)
    ]


def test_keyframe_store_roundtrip(tmp_path):
    store = KeyframeStore(str(tmp_path), capacity=4)
    store.initialize_cold()
    rng = np.random.default_rng(0)
    for i in range(6):  # exceeds capacity -> growth
        store.append(
            rng.integers(0, 255, (4, 4, 3), dtype=np.uint8),
            np.eye(4) * (i + 1),
        )
    assert len(store) == 6
    store.set_embeddings(rng.normal(size=(6, 8)))
    store.save()

    store2 = KeyframeStore(str(tmp_path), capacity=4)
    store2.load(with_embeddings=True)
    assert len(store2) == 6
    np.testing.assert_allclose(store2.poses[3], np.eye(4) * 4)
    idx, d = store2.nearest(store.embeddings[4])
    assert idx == 4
    assert d.shape == (6,)


def test_store_nearest_without_embeddings_raises(tmp_path):
    store = KeyframeStore(str(tmp_path))
    with pytest.raises(RuntimeError):
        store.nearest(np.zeros(4))


def test_full_slam_lifecycle(tmp_path, model_vars):
    """idle -> odometry -> mapping -> relocalization on synthetic
    frames (the reference's test_slam.py flow, hermetic)."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    assert slam.mode() == "idle"
    with pytest.raises(RuntimeError):
        slam(frames(1)[0])

    slam.start_odometry()
    assert slam.mode() == "odometry"
    poses = [slam(f) for f in frames(5)]
    assert all(p.shape == (4, 4) for p in poses)
    np.testing.assert_allclose(poses[0], np.eye(4))
    # zero thresholds -> every frame becomes a keyframe
    assert len(slam) == 5

    slam.end_odometry()
    assert slam.mode() == "relocalization"
    assert slam.keyframes.embeddings is not None

    query = frames(5)[2]  # same generator -> same frame 2
    initial, refined, distances = slam(query)
    assert initial.shape == (4, 4) and refined.shape == (4, 4)
    assert distances.shape == (5,)
    assert np.isfinite(refined).all()


def test_relocalize_keyframe_fmap_cache(tmp_path, model_vars):
    """The refine's keyframe side is feature-encoded once and
    LRU-cached (round-5: cold pair 39.1 ms vs 22.3 cached on chip).
    Repeated queries must hit the cache and return identical poses,
    and the cap must bound the cache."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    for f in frames(4):
        slam(f)
    slam.end_odometry()

    query = frames(4, seed=3)[0]
    _, refined1, _ = slam(query)
    assert len(slam._kf_fmap_cache) == 1
    _, refined2, _ = slam(query)
    assert len(slam._kf_fmap_cache) == 1  # cache hit, no new entry
    np.testing.assert_array_equal(refined1, refined2)

    # cap bounds the cache: force distinct hits by querying each
    # keyframe's own image with a tiny cap
    slam._kf_fmap_cache_cap = 2
    slam._kf_fmap_cache.clear()
    for f in frames(4):
        slam(f)
    assert len(slam._kf_fmap_cache) <= 2


def test_warm_start_relocalization(tmp_path, model_vars):
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    for f in frames(4):
        slam(f)
    slam.end_odometry()
    map_vars = slam._map_vars

    slam2 = SlamRuntime(
        cfg, flow_vars, odo_vars,
        mapping_variables=map_vars, start_mode="relocalization",
    )
    assert slam2.mode() == "relocalization"
    assert len(slam2) == 4
    initial, refined, distances = slam2(frames(4)[1])
    assert distances.shape == (4,)


def test_relocalization_warm_start_from_disk(tmp_path, model_vars):
    """Mapping persists the trained map; a FRESH runtime (no
    mapping_variables passed — simulating a process restart) reloads it
    from disk (ref: neural_slam.py:347-348,89-106)."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    for f in frames(4):
        slam(f)
    slam.end_odometry()
    query = frames(4)[1]
    initial_ref, refined_ref, d_ref = slam(query)
    del slam  # "kill" the process

    slam2 = SlamRuntime(
        cfg, flow_vars, odo_vars, start_mode="relocalization"
    )
    assert slam2.mode() == "relocalization"
    initial, refined, distances = slam2(query)
    np.testing.assert_allclose(initial, initial_ref)
    np.testing.assert_allclose(refined, refined_ref, atol=1e-5)
    np.testing.assert_allclose(distances, d_ref, rtol=1e-5)


def test_relocalization_warm_start_missing_map_raises(tmp_path, model_vars):
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    # a store exists but no trained map was ever saved
    store = KeyframeStore(cfg.keyframes_path)
    store.initialize_cold()
    store.append(np.zeros((4, 4, 3), np.uint8), np.eye(4))
    store.set_embeddings(np.zeros((1, 8)))
    store.save()
    with pytest.raises(ValueError, match="mapping_variables"):
        SlamRuntime(cfg, flow_vars, odo_vars, start_mode="relocalization")


def test_keyframe_thresholds_respected(tmp_path, model_vars):
    """With huge thresholds only the very first frame registers
    (ref: neural_slam.py:288-302)."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    cfg = dataclasses.replace(
        cfg,
        slam=SlamConfig(
            image_height=H, image_width=W,
            rotation_threshold_deg=180.0, translation_threshold=1e9,
        ),
    )
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    for f in frames(4):
        slam(f)
    assert len(slam) == 1


def test_nearest_sharded_matches_host(tmp_path):
    """Mesh-sharded NN search == host search (GSPMD argmin over the
    data axis)."""
    import numpy as np

    from atdn_vslam_tpu.parallel import make_mesh
    from atdn_vslam_tpu.slam.keyframes import nearest_sharded

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(64, 32)).astype(np.float32)
    code = emb[41] + 0.01 * rng.normal(size=32).astype(np.float32)

    store = KeyframeStore(str(tmp_path), capacity=64)
    store.count = 64
    store.set_embeddings(emb)
    host_idx, host_d = store.nearest(code)

    mesh = make_mesh()
    idx, d = nearest_sharded(mesh, emb, code)
    assert idx == host_idx == 41
    np.testing.assert_allclose(d, host_d, rtol=1e-5)


def test_run_odometry_sequence_matches_streaming(tmp_path, model_vars):
    """Batched sequence API == frame-by-frame calls (same poses and
    keyframes)."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path / "a")
    fr = frames(6, seed=9)

    slam1 = SlamRuntime(cfg, flow_vars, odo_vars)
    slam1.start_odometry()
    poses_stream = np.stack([slam1(f) for f in fr])

    cfg2 = tiny_config(tmp_path / "b")
    slam2 = SlamRuntime(cfg2, flow_vars, odo_vars)
    slam2.start_odometry()
    # 6 frames -> 5 pairs with chunk=4: final chunk is padded; the
    # LSTM carry must NOT absorb the padded steps
    poses_batch = slam2.run_odometry_sequence(np.stack(fr), chunk=4)

    np.testing.assert_allclose(poses_batch, poses_stream, atol=1e-4)
    assert len(slam2) == len(slam1)

    # continue streaming after the batched call: both runtimes must
    # agree (catches padded-tail carry pollution)
    extra = frames(2, seed=77)
    for f in extra:
        p_stream = slam1(f)
        p_batch = slam2(f)
        np.testing.assert_allclose(p_batch, p_stream, atol=1e-4)


def test_run_odometry_sequence_requires_fresh(tmp_path, model_vars):
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    with pytest.raises(RuntimeError):
        slam.run_odometry_sequence(np.stack(frames(3)))
    slam.start_odometry()
    slam(frames(1)[0])
    with pytest.raises(RuntimeError):
        slam.run_odometry_sequence(np.stack(frames(3)))


def test_keyframe_store_async_writes(tmp_path):
    """Async RGB spill: reads/saves drain pending writes; worker errors
    propagate to the caller; sync mode unchanged."""
    store = KeyframeStore(str(tmp_path / "a"), capacity=4)
    store.initialize_cold()
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (6, 8, 3), dtype=np.uint8)
            for _ in range(12)]  # > max_pending -> exercises drain
    for i, im in enumerate(imgs):
        store.append(im, np.eye(4) * (i + 1))
    for i, im in enumerate(imgs):
        np.testing.assert_array_equal(store.read_rgb(i), im)
    store.save()
    assert not store._pending

    # error propagation: a failed background write surfaces on drain
    def boom():
        raise RuntimeError("disk full")

    store._pending.append(store._pool.submit(boom))
    with pytest.raises(RuntimeError, match="disk full"):
        store._drain()
    assert not store._pending

    # sync mode still works
    sync = KeyframeStore(str(tmp_path / "b"), capacity=2,
                         async_writes=False)
    sync.initialize_cold()
    sync.append(np.zeros((2, 2, 3), np.uint8), np.eye(4))
    assert sync.read_rgb(0).shape == (2, 2, 3)


def test_detect_closures_full_lifecycle(tmp_path, model_vars):
    """A synthetic loop (last frame revisits the first) is detected
    from the VAE embeddings and closed end-to-end with NO
    caller-provided edges (VERDICT round-2 item 5)."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    fs = frames(7, seed=3)
    fs.append(fs[0].copy())  # revisit -> identical view of frame 0
    for f in fs:
        slam(f)
    assert len(slam) == 8
    slam.end_odometry()  # mapping -> embeddings

    with pytest.raises(RuntimeError, match="embeddings"):
        SlamRuntime(tiny_config(tmp_path / "x"), flow_vars, odo_vars) \
            .detect_closure_pairs()

    pairs = slam.detect_closure_pairs(min_gap=4)
    assert pairs, "revisit of frame 0 not detected"
    i, j, dist = pairs[0]
    assert (i, j) == (7, 0)
    # identical images -> (near-)identical embeddings
    assert dist < 1e-3

    result = slam.close_loops(min_gap=4)
    assert result is not None
    opt, mse = result
    assert np.isfinite(mse) and opt.shape == (8, 4, 4)
    np.testing.assert_allclose(slam.keyframes.poses[:8], opt)


def test_close_loops_improves_drifted_trajectory(tmp_path, model_vars):
    """With an exact revisit, the auto-detected closure pulls a
    drifted chain back toward ground truth — no caller edges. GT is
    constructed consistent with the frontend's own closure
    measurement, so the only error source is the injected drift."""
    from atdn_vslam_tpu.geometry.pose_graph import se3_exp

    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    rng = np.random.default_rng(11)
    n = 8
    base = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    for i in range(n):
        rgb = base if i in (0, n - 1) else rng.integers(
            0, 255, (H, W, 3), dtype=np.uint8
        )
        slam.keyframes.append(rgb, np.eye(4))

    # embeddings: consecutive spacing 10, revisit distance 0 -> only
    # (n-1, 0) passes the default (median-consecutive) threshold
    emb = np.zeros((n, 4), np.float32)
    emb[:, 0] = 10.0 * np.arange(n)
    emb[n - 1] = emb[0]
    slam.keyframes.set_embeddings(emb)

    # GT loop consistent with the frontend's measurement for the
    # revisit pair; stored chain = GT + accumulated drift
    t_hat = slam.measure_closure(n - 1, 0)
    gt = np.stack([np.eye(4)] * n)
    gt[n - 1] = np.linalg.inv(t_hat)  # P_{n-1}^-1 P_0 == t_hat
    noise = np.asarray(
        se3_exp(np.asarray(rng.normal(size=(n - 1, 6)), np.float32) * 0.05)
    )
    noisy = [gt[0]]
    for i in range(n - 1):
        rel = np.linalg.inv(gt[i]) @ gt[i + 1] @ noise[i]
        noisy.append(noisy[-1] @ rel)
    slam.keyframes.poses[:n] = np.stack(noisy)

    err_before = np.linalg.norm(
        slam.keyframes.poses[:n, :3, 3] - gt[:, :3, 3], axis=1
    ).mean()
    result = slam.close_loops(min_gap=4, closure_weight=4.0)
    assert result is not None
    opt, _mse = result
    err_after = np.linalg.norm(
        opt[:, :3, 3] - gt[:, :3, 3], axis=1
    ).mean()
    assert err_after < err_before


def test_refine_trajectory_with_closure(tmp_path, model_vars):
    """A loop closure redistributes accumulated drift along the
    keyframe chain (new capability; geometry/pose_graph.py)."""
    from atdn_vslam_tpu.geometry.pose_graph import se3_exp

    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)

    # synthetic keyframes: ground truth is a straight line; the stored
    # trajectory integrates slightly-wrong odometry steps, so drift
    # ACCUMULATES along the chain (the situation a loop closure fixes)
    rng = np.random.default_rng(7)
    n = 8
    gt = np.stack([np.eye(4) for _ in range(n)])
    for i in range(1, n):
        gt[i] = gt[i - 1].copy()
        gt[i][:3, 3] += [0.0, 0.0, 1.0]
    step_noise = np.asarray(
        se3_exp(np.asarray(rng.normal(size=(n - 1, 6)), np.float32) * 0.03)
    )
    noisy = [gt[0]]
    for i in range(n - 1):
        rel = np.linalg.inv(gt[i]) @ gt[i + 1] @ step_noise[i]
        noisy.append(noisy[-1] @ rel)
    noisy = np.stack(noisy)
    for i in range(n):
        slam.keyframes.append(np.zeros((4, 4, 3), np.uint8), noisy[i])

    err_before = np.linalg.norm(
        slam.keyframes.poses[:n, :3, 3] - gt[:, :3, 3], axis=1
    ).mean()
    closure = np.linalg.inv(gt[0]) @ gt[n - 1]  # true relative pose
    opt, mse = slam.refine_trajectory(
        [(0, n - 1, closure)], iterations=8, closure_weight=4.0
    )
    err_after = np.linalg.norm(
        opt[:, :3, 3] - gt[:, :3, 3], axis=1
    ).mean()
    assert np.isfinite(mse)
    assert err_after < err_before
    # store updated in place and persisted
    np.testing.assert_allclose(slam.keyframes.poses[:n], opt)

    with pytest.raises(ValueError, match="closure"):
        slam.refine_trajectory([])


def test_detect_closures_edge_cases(tmp_path, model_vars):
    """Short trajectories return no candidates; an impossible distance
    threshold makes close_loops a None no-op (poses untouched)."""
    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    for f in frames(5, seed=11):
        slam(f)
    n = len(slam)
    # synthesize embeddings directly (mapping training is not what
    # this test pins): distinct vectors, no revisits
    slam.keyframes.embeddings = np.arange(
        n * 4, dtype=np.float32
    ).reshape(n, 4) * 10.0

    # n < min_gap + 2 -> no candidates at all
    assert slam.detect_closure_pairs(min_gap=10) == []
    # acceptance threshold none can pass -> close_loops is a no-op
    poses_before = slam.keyframes.poses[:n].copy()
    assert slam.close_loops(min_gap=2, max_dist=0.0) is None
    np.testing.assert_array_equal(slam.keyframes.poses[:n], poses_before)


def test_flow_warm_start(tmp_path, model_vars):
    """SlamConfig.flow_warm_start: the FIRST pair (zero flow init) is
    bit-equal to the cold start; later pairs consume the previous
    pair's low-res flow (state threads, outputs stay finite); the
    batched sequence API matches frame-by-frame streaming under warm
    start too."""
    flow_vars, odo_vars = model_vars
    fr = frames(6, seed=21)

    cold = SlamRuntime(tiny_config(tmp_path / "c"), flow_vars, odo_vars)
    cold.start_odometry()
    cold_poses = [cold(f) for f in fr[:2]]

    cfg_w = tiny_config(tmp_path / "w")
    cfg_w = dataclasses.replace(
        cfg_w, slam=dataclasses.replace(cfg_w.slam, flow_warm_start=True)
    )
    warm = SlamRuntime(cfg_w, flow_vars, odo_vars)
    warm.start_odometry()
    warm_poses = [warm(f) for f in fr[:2]]
    # pair 0: zero init == cold start exactly
    np.testing.assert_allclose(warm_poses[1], cold_poses[1], atol=1e-6)
    assert warm._stream_flow is not None

    # later pairs: warm init threads the previous low-res flow
    for f in fr[2:]:
        p = warm(f)
    assert np.isfinite(p).all()
    flow_state = np.asarray(warm._stream_flow)
    assert flow_state.shape == (1, H // 8, W // 8, 2)
    assert np.isfinite(flow_state).all()

    # batched API under warm start == frame-by-frame warm streaming
    cfg_w2 = tiny_config(tmp_path / "w2")
    cfg_w2 = dataclasses.replace(
        cfg_w2, slam=dataclasses.replace(cfg_w2.slam, flow_warm_start=True)
    )
    warm2 = SlamRuntime(cfg_w2, flow_vars, odo_vars)
    warm2.start_odometry()
    batch_poses = warm2.run_odometry_sequence(np.stack(fr), chunk=4)
    # recompute the full warm streaming trajectory for comparison
    cfg_w3 = tiny_config(tmp_path / "w3")
    cfg_w3 = dataclasses.replace(
        cfg_w3, slam=dataclasses.replace(cfg_w3.slam, flow_warm_start=True)
    )
    warm3 = SlamRuntime(cfg_w3, flow_vars, odo_vars)
    warm3.start_odometry()
    full_stream = np.stack([warm3(f) for f in fr])
    np.testing.assert_allclose(batch_poses, full_stream, atol=1e-4)


def test_closure_discrimination_rejects_aliased_embeddings(
    tmp_path, model_vars
):
    """Perceptual aliasing stress test (VERDICT r3 item 6): non-revisit
    keyframes with near-identical embeddings — the classic failure of
    embedding-NN place recognition — pass the embedding threshold but
    are rejected by the geometric-consistency gate before they can
    corrupt the trajectory through the Gauss-Newton solve."""
    from atdn_vslam_tpu.geometry.pose_graph import se3_exp
    from atdn_vslam_tpu.geometry.se3 import euler_to_matrix

    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    rng = np.random.default_rng(23)
    n = 16

    # GT: out 8 frames along z and back — frame 15 truly revisits
    # frame 0; frame 8 (z=8) is 7 m away from frame 1 (z=1)
    gt = np.stack([np.eye(4)] * n)
    zs = list(range(8)) + list(range(8, 0, -1))
    for i in range(n):
        gt[i][2, 3] = float(zs[i])

    # stored chain: GT + accumulated odometry drift
    noise = np.asarray(
        se3_exp(np.asarray(rng.normal(size=(n - 1, 6)), np.float32) * 0.03)
    )
    noisy = [gt[0]]
    for i in range(n - 1):
        rel = np.linalg.inv(gt[i]) @ gt[i + 1] @ noise[i]
        noisy.append(noisy[-1] @ rel)
    for i in range(n):
        slam.keyframes.append(np.zeros((4, 4, 3), np.uint8), noisy[i])

    # embeddings: consecutive spacing 10; TRUE revisit (15, 0) and an
    # ALIASED false match (8, 1) — different places, near-identical
    # embeddings
    emb = np.zeros((n, 4), np.float32)
    emb[:, 0] = 10.0 * np.arange(n)
    emb[15] = emb[0]
    emb[8] = emb[1] + 0.1
    slam.keyframes.set_embeddings(emb)

    # frontend stand-in: the measurement is the GT relative pose (the
    # most CHARITABLE false measurement — anything worse is rejected a
    # fortiori), with the aliased pair also carrying a 60 deg yaw
    yaw = np.eye(4)
    yaw[:3, :3] = np.asarray(
        euler_to_matrix(jnp.asarray([np.deg2rad(60.0), 0.0, 0.0]))
    )

    def fake_measure(i, j):
        t = np.linalg.inv(gt[i]) @ gt[j]
        return t @ yaw if (i, j) == (8, 1) else t

    slam.measure_closure = fake_measure

    # 1) the embedding stage alone is FOOLED: both pairs pass
    pairs = {(i, j) for i, j, _ in slam.detect_closure_pairs(min_gap=5)}
    assert (15, 0) in pairs
    assert (8, 1) in pairs, "aliased pair should pass the embedding gate"

    # 2) the translation gate rejects the aliased pair (7 m > 2 m),
    # keeps the true revisit — precision 1.0, recall 1.0
    edges = slam.detect_closures(
        min_gap=5, max_translation=2.0, max_rotation_deg=0.0
    )
    assert [(i, j) for i, j, _ in edges] == [(15, 0)]

    # 3) the rotation gate alone also rejects it (60 deg > 30 deg)
    edges_rot = slam.detect_closures(
        min_gap=5, max_translation=0.0, max_rotation_deg=30.0
    )
    assert [(i, j) for i, j, _ in edges_rot] == [(15, 0)]

    # 4) end-to-end: a FORCED false edge corrupts the trajectory;
    # the gated close_loops improves it instead
    def err(poses):
        return np.linalg.norm(
            poses[:n, :3, 3] - gt[:, :3, 3], axis=1
        ).mean()

    poses_before = slam.keyframes.poses[:n].copy()
    err_before = err(poses_before)
    forced, _ = slam.refine_trajectory(
        [(8, 1, fake_measure(8, 1))], iterations=8, closure_weight=4.0
    )
    err_false = err(forced)
    slam.keyframes.poses[:n] = poses_before  # restore

    result = slam.close_loops(
        min_gap=5, max_translation=2.0, max_rotation_deg=0.0,
        closure_weight=4.0,
    )
    assert result is not None
    err_gated = err(result[0])
    assert err_gated < err_before, "true closure should reduce drift"
    assert err_false > err_gated, "false closure corrupts; gate prevents it"


def test_relocalize_sharded_matches_host(tmp_path, model_vars):
    """With a mesh, _relocalize uses the device-sharded NN search
    (keyframe ranges over the data axis, K=5 padded to 8) and returns
    exactly what the host path returns (VERDICT r3 item 3)."""
    from atdn_vslam_tpu.parallel import make_mesh

    flow_vars, odo_vars = model_vars
    cfg = tiny_config(tmp_path)
    slam = SlamRuntime(cfg, flow_vars, odo_vars)
    slam.start_odometry()
    fr = frames(5, seed=21)
    for f in fr:
        slam(f)
    # skip mapping training: any encoder works for the NN-path A/B
    mv = slam.mapping_model.init(
        jax.random.key(2), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    slam._map_vars = mv
    slam._embed_keyframes()
    slam._mode = "relocalization"

    query = fr[3]
    init_h, ref_h, d_h = slam(query)
    slam._mesh = make_mesh()
    init_s, ref_s, d_s = slam(query)

    np.testing.assert_allclose(init_s, init_h)
    np.testing.assert_allclose(ref_s, ref_h, atol=1e-5)
    assert d_s.shape == d_h.shape == (5,)
    np.testing.assert_allclose(d_s, d_h, rtol=1e-5)
