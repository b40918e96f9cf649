"""AOT serving-export round trip: serialize the streaming SLAM step
with jax.export, reload it from bytes, and check it reproduces the
live computation (see atdn_vslam_tpu/serving.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atdn_vslam_tpu.models.flow import RAFTGMA
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu import serving

H, W = 96, 192  # smallest size the ATDNVO encoder stack supports


@pytest.fixture(scope="module")
def models_and_vars():
    flow_model = RAFTGMA(iters=2, use_pallas=False)
    odo_model = ATDNVO()
    im = jnp.zeros((1, H, W, 3))
    flow_vars = flow_model.init(jax.random.key(0), im, im)
    odo_vars = odo_model.init(
        jax.random.key(1), jnp.zeros((1, 1, H, W, 2)),
        odo_model.init_carry(1),
    )
    return flow_model, odo_model, flow_vars, odo_vars


def _frame_inputs(flow_model, flow_vars):
    rng = np.random.default_rng(3)
    im1 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    fmap = serving.encode_frame(flow_model, flow_vars, im1)
    return im1, im2, fmap


def test_export_roundtrip_baked(models_and_vars, tmp_path):
    flow_model, odo_model, flow_vars, odo_vars = models_and_vars
    im1, im2, fmap = _frame_inputs(flow_model, flow_vars)
    carry = odo_model.init_carry(1)
    pose = jnp.eye(4)

    live = serving.make_stream_step(
        flow_model, odo_model, (flow_vars, odo_vars)
    )
    want = live(im1, im2, fmap, carry, pose)

    exported = serving.export_stream_step(
        flow_model, odo_model, flow_vars, odo_vars, H, W
    )
    path = tmp_path / "slam_step.jaxexport"
    serving.save_stream_step(exported, path)
    assert path.stat().st_size > 1000

    loaded = serving.load_exported(path)
    got = loaded.call(im1, im2, fmap, carry, pose)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32),
            atol=1e-5, rtol=1e-5,
        )


def test_self_contained_bootstrap(models_and_vars, tmp_path):
    """A serving process with ONLY the two artifacts (step + encoder)
    reproduces the live step: encoder.call bootstraps the frame cache,
    zero_inputs_like builds the LSTM carry from the step artifact's
    in_avals — no model code, no checkpoint (round-5 serving fix: the
    old bootstrap rebuilt+jit-inited both models just to encode frame
    0, costing more than the step compile)."""
    flow_model, odo_model, flow_vars, odo_vars = models_and_vars
    rng = np.random.default_rng(5)
    im1 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
    im2 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))

    step_path = tmp_path / "step.jaxexport"
    enc_path = tmp_path / "encoder.jaxexport"
    serving.save_stream_step(
        serving.export_stream_step(
            flow_model, odo_model, flow_vars, odo_vars, H, W
        ),
        step_path,
    )
    serving.save_stream_step(
        serving.export_encoder(flow_model, flow_vars, H, W), enc_path
    )

    # "serving process": artifacts only
    loaded = serving.load_exported(step_path)
    encoder = serving.load_exported(enc_path)
    fmap = encoder.call(im1)
    carry = serving.zero_inputs_like(loaded.exported, 3)
    pose0 = jnp.eye(4)
    got = loaded.call(im1, im2, fmap, carry, pose0)

    # live reference
    live = serving.make_stream_step(
        flow_model, odo_model, (flow_vars, odo_vars)
    )
    fmap_live = serving.encode_frame(flow_model, flow_vars, im1)
    want = live(im1, im2, fmap_live, odo_model.init_carry(1), pose0)
    for w, g in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(
            np.asarray(w, np.float32), np.asarray(g, np.float32),
            atol=1e-4, rtol=1e-5,
        )


def test_export_weights_as_arguments(models_and_vars):
    flow_model, odo_model, flow_vars, odo_vars = models_and_vars
    im1, im2, fmap = _frame_inputs(flow_model, flow_vars)
    carry = odo_model.init_carry(1)
    pose = jnp.eye(4)

    exported = serving.export_stream_step(
        flow_model, odo_model, flow_vars, odo_vars, H, W,
        bake_weights=False,
    )
    reloaded = jax.export.deserialize(exported.serialize())
    got = reloaded.call(flow_vars, odo_vars, im1, im2, fmap, carry, pose)
    live = serving.make_stream_step(flow_model, odo_model)
    want = live(flow_vars, odo_vars, im1, im2, fmap, carry, pose)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), atol=1e-5, rtol=1e-5
    )


def test_streaming_chain_through_artifact(models_and_vars, tmp_path):
    """Three frames streamed through the loaded artifact: the fmap and
    LSTM carries thread frame-to-frame and the pose accumulates."""
    flow_model, odo_model, flow_vars, odo_vars = models_and_vars
    rng = np.random.default_rng(9)
    frames = [
        jnp.asarray(rng.uniform(0, 255, (H, W, 3)).astype(np.float32))
        for _ in range(4)
    ]
    exported = serving.export_stream_step(
        flow_model, odo_model, flow_vars, odo_vars, H, W
    )
    path = tmp_path / "step.bin"
    serving.save_stream_step(exported, path)
    step = serving.load_exported(path)

    fmap = serving.encode_frame(flow_model, flow_vars, frames[0])
    carry = odo_model.init_carry(1)
    pose = jnp.eye(4)
    for im1, im2 in zip(frames[:-1], frames[1:]):
        pose, fmap, carry, flow = step.call(im1, im2, fmap, carry, pose)
    pose = np.asarray(pose)
    assert np.isfinite(pose).all()
    # a valid SE(3): R orthonormal, last row [0,0,0,1]
    r = pose[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=1e-6)


@pytest.mark.tpu
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs the real TPU chip (ATDN_TEST_TPU=1)",
)
def test_export_tpu_working_resolution(tmp_path):
    """The deployment story on real hardware (VERDICT r3 item 5):

    (a) TPU-native artifact at the 376x1232 working resolution with
        the Pallas kernels engaged — loaded from bytes and executed on
        chip, equal to the live jitted step; artifact size and
        load-to-first-pose time recorded;
    (b) multi-platform ("tpu", "cpu") artifact (pure-XLA graph, since
        Mosaic custom calls are TPU-only) — loads and runs on chip.
    """
    import time

    Hw, Ww = 376, 1232
    flow_model = RAFTGMA(iters=12, dtype=jnp.bfloat16)
    odo_model = ATDNVO()
    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.uniform(0, 255, (1, Hw, Ww, 3)).astype(np.float32))
    flow_vars = jax.jit(flow_model.init)(jax.random.key(0), im, im)
    odo_vars = jax.jit(odo_model.init)(
        jax.random.key(1), jnp.zeros((1, 1, Hw, Ww, 2)),
        odo_model.init_carry(1),
    )
    im1 = im[0]
    im2 = jnp.asarray(
        rng.uniform(0, 255, (Hw, Ww, 3)).astype(np.float32)
    )
    fmap = serving.encode_frame(flow_model, flow_vars, im1)
    carry = odo_model.init_carry(1)
    pose = jnp.eye(4)

    # (a) TPU-native artifact, Pallas engaged
    exported = serving.export_stream_step(
        flow_model, odo_model, flow_vars, odo_vars, Hw, Ww,
        disabled_checks=(
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
        ),
    )
    path = tmp_path / "slam_step_tpu.jaxexport"
    serving.save_stream_step(exported, path)
    size_mb = path.stat().st_size / 1e6

    live = jax.jit(
        serving.make_stream_step(flow_model, odo_model,
                                 (flow_vars, odo_vars))
    )
    want = live(im1, im2, fmap, carry, pose)
    jax.block_until_ready(want)

    t0 = time.perf_counter()
    loaded = serving.load_exported(path)
    got = loaded.call(im1, im2, fmap, carry, pose)
    first_pose = np.asarray(got[0])
    load_to_pose_s = time.perf_counter() - t0

    np.testing.assert_allclose(
        first_pose, np.asarray(want[0]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got[3], np.float32), np.asarray(want[3], np.float32),
        atol=1e-2, rtol=1e-2,
    )
    print(
        f"\nTPU artifact: {size_mb:.1f} MB, load-to-first-pose "
        f"{load_to_pose_s:.1f} s"
    )

    # (b) multi-platform artifact: pure-XLA graph targets tpu AND cpu
    flow_xla = RAFTGMA(iters=12, dtype=jnp.bfloat16, use_pallas=False)
    exported_mp = serving.export_stream_step(
        flow_xla, odo_model, flow_vars, odo_vars, Hw, Ww,
        platforms=("tpu", "cpu"),
    )
    assert set(p.lower() for p in exported_mp.platforms) == {"tpu", "cpu"}
    path_mp = tmp_path / "slam_step_multi.jaxexport"
    serving.save_stream_step(exported_mp, path_mp)
    loaded_mp = serving.load_exported(path_mp)
    got_mp = loaded_mp.call(im1, im2, fmap, carry, pose)
    np.testing.assert_allclose(
        np.asarray(got_mp[0]), first_pose, atol=1e-3, rtol=1e-3
    )
    print(f"multi-platform artifact: {path_mp.stat().st_size/1e6:.1f} MB")
