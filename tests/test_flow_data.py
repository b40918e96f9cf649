"""Flow-training data layer: FlyingThings3D/HD1K loaders, the full
RAFT augmentor (photometric/eraser/scale/stretch/flips), sparse-flow
resampling, and the stage mixtures
(ref: GMA/core/datasets.py:18-305, GMA/core/utils/augmentor.py:15-246).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from atdn_vslam_tpu.data.flow_io import (  # noqa: E402
    write_kitti_png_flow,
    write_pfm,
)
from atdn_vslam_tpu.data.flow_datasets import (  # noqa: E402
    FlowAugmentor,
    FlyingThingsDataset,
    HD1KDataset,
    MixedFlowDataset,
    SparseFlowAugmentor,
    fetch_train_dataset,
)

H, W = 64, 80


def _png(path, rng):
    cv2.imwrite(str(path), rng.integers(0, 255, (H, W, 3)).astype(np.uint8))


def make_things_tree(root, rng, seqs=2, frames=3):
    """Synthetic FlyingThings3D layout (ref: datasets.py:182-205)."""
    for dstype in ("frames_cleanpass", "frames_finalpass"):
        for s in range(seqs):
            imdir = root / dstype / "TRAIN" / "A" / f"{s:04d}" / "left"
            imdir.mkdir(parents=True, exist_ok=True)
            for i in range(frames):
                _png(imdir / f"{i:04d}.png", rng)
    for s in range(seqs):
        for direction in ("into_future", "into_past"):
            fdir = (
                root / "optical_flow" / "TRAIN" / "A" / f"{s:04d}"
                / direction / "left"
            )
            fdir.mkdir(parents=True, exist_ok=True)
            for i in range(frames):
                # 3-channel PFM like the real dataset; loader drops ch 3
                write_pfm(
                    str(fdir / f"{i:04d}.pfm"),
                    rng.normal(size=(H, W, 3)).astype(np.float32),
                )
    return root


def make_hd1k_tree(root, rng, seqs=2, frames=3):
    """Synthetic HD1K layout (ref: datasets.py:252-269)."""
    (root / "hd1k_input" / "image_2").mkdir(parents=True, exist_ok=True)
    (root / "hd1k_flow_gt" / "flow_occ").mkdir(parents=True, exist_ok=True)
    for s in range(seqs):
        for i in range(frames):
            _png(root / "hd1k_input" / "image_2" / f"{s:06d}_{i:04d}.png",
                 rng)
            write_kitti_png_flow(
                str(root / "hd1k_flow_gt" / "flow_occ"
                    / f"{s:06d}_{i:04d}.png"),
                rng.normal(size=(H, W, 2)).astype(np.float32),
            )
    return root


def test_flying_things_dataset(tmp_path, rng):
    make_things_tree(tmp_path, rng, seqs=2, frames=3)
    ds = FlyingThingsDataset(str(tmp_path), dstype="frames_cleanpass")
    # 2 seqs x 2 pairs x 2 directions
    assert len(ds) == 8
    im1, im2, flow, valid = ds[0]
    assert im1.shape == (H, W, 3) and flow.shape == (H, W, 2)
    assert valid.shape == (H, W)
    # into_past pairs reverse frame order: first into_future pair and
    # the matching into_past pair share images but swapped
    fwd = ds.image_pairs[0]
    past_pairs = ds.image_pairs[4:]
    assert (fwd[1], fwd[0]) in past_pairs


def test_hd1k_dataset(tmp_path, rng):
    make_hd1k_tree(tmp_path, rng, seqs=2, frames=3)
    ds = HD1KDataset(str(tmp_path))
    assert ds.sparse
    assert len(ds) == 4  # 2 seqs x (3-1) pairs
    im1, im2, flow, valid = ds[0]
    assert flow.shape == (H, W, 2)
    assert set(np.unique(valid)) <= {0.0, 1.0}


def test_augmentor_shapes_and_range(rng):
    aug = FlowAugmentor((32, 40), seed=0)
    im = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    flow = rng.normal(size=(H, W, 2)).astype(np.float32)
    for _ in range(8):  # cover asymmetric/eraser/stretch branches
        a1, a2, af, av = aug(im, im.copy(), flow,
                             np.ones((H, W), np.float32))
        assert a1.shape == (32, 40, 3) and af.shape == (32, 40, 2)
        assert a1.min() >= 0.0 and a1.max() <= 255.0
        assert av.shape == (32, 40)


def test_augmentor_scale_rescales_flow():
    """With stretch/flips/photometric off and spatial prob 1, a
    constant flow is multiplied by the sampled scale
    (ref: augmentor.py:86-89)."""
    aug = FlowAugmentor(
        (32, 40), min_scale=0.5, max_scale=0.5, do_flip=False,
        photometric=False, eraser_aug_prob=0.0, spatial_aug_prob=1.0,
        stretch_prob=0.0, seed=0,
    )
    im = np.zeros((H, W, 3), np.float32)
    flow = np.ones((H, W, 2), np.float32)
    _, _, af, _ = aug(im, im, flow, np.ones((H, W), np.float32))
    scale = 2.0**0.5
    np.testing.assert_allclose(af, scale, rtol=1e-5)


def test_jitter_applies_ops_in_drawn_order(rng):
    """torchvision ColorJitter permutes brightness/contrast/saturation/
    hue per draw (GMA/core/utils/augmentor.py:32); the augmentor must
    honor the drawn order, and different orders must differ (the ops do
    not commute)."""
    aug = FlowAugmentor((32, 40), seed=0)
    im = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    b, c, s, h = 1.3, 0.7, 1.2, 0.1

    fwd = aug._jitter_once(im.copy(), (b, c, s, h, [0, 1, 2, 3]))
    # manual composition in the same order
    ref = np.clip(im * b, 0, 255)
    mean = ref.mean(axis=(0, 1), keepdims=True)
    ref = np.clip((ref - mean) * c + mean, 0, 255)
    gray = ref.mean(axis=-1, keepdims=True)
    ref = np.clip(gray + s * (ref - gray), 0, 255)
    from atdn_vslam_tpu.data.flow_datasets import _hsv_to_rgb, _rgb_to_hsv
    hsv = _rgb_to_hsv(ref)
    hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
    ref = np.clip(_hsv_to_rgb(hsv), 0, 255)
    np.testing.assert_allclose(fwd, ref, atol=1e-3)

    rev = aug._jitter_once(im.copy(), (b, c, s, h, [3, 2, 1, 0]))
    assert np.abs(fwd - rev).max() > 1.0  # order matters

    # the per-draw permutation is actually drawn
    orders = {tuple(aug._color_draws()[4]) for _ in range(50)}
    assert len(orders) > 5


def test_eraser_uses_mean_color(rng):
    aug = FlowAugmentor(
        (H, W), do_flip=False, photometric=False, spatial_aug_prob=0.0,
        stretch_prob=0.0, eraser_aug_prob=1.0, seed=3,
    )
    im1 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    im2 = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    mean = im2.reshape(-1, 3).mean(0)
    _, a2, _, _ = aug(
        im1, im2.copy(), np.zeros((H, W, 2), np.float32),
        np.ones((H, W), np.float32),
    )
    # some pixels were replaced by the (first) mean color
    hits = np.isclose(a2, mean[None, None]).all(-1).sum()
    assert hits > 0


def test_sparse_resample_preserves_validity(rng):
    flow = rng.normal(size=(H, W, 2)).astype(np.float32)
    valid = (rng.random((H, W)) < 0.3).astype(np.float32)
    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(
        flow, valid, fx=1.3, fy=0.9
    )
    assert f2.shape == (round(H * 0.9), round(W * 1.3), 2)
    # scatter: only valid positions populated, flow scaled by (fx, fy)
    assert v2.sum() <= valid.sum()
    nz = f2[v2 > 0]
    assert np.abs(nz[:, 0]).max() <= np.abs(flow[:, :, 0]).max() * 1.3 + 1e-5
    # invalid everywhere -> empty target
    f3, v3 = SparseFlowAugmentor.resize_sparse_flow_map(
        flow, np.zeros((H, W), np.float32), 1.3, 0.9
    )
    assert v3.sum() == 0 and np.all(f3 == 0)


def test_sparse_augmentor_call(tmp_path, rng):
    aug = SparseFlowAugmentor((32, 40), seed=1)
    im = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    flow = rng.normal(size=(H, W, 2)).astype(np.float32)
    valid = (rng.random((H, W)) < 0.5).astype(np.float32)
    for _ in range(4):
        a1, a2, af, av = aug(im, im.copy(), flow, valid)
        assert a1.shape == (32, 40, 3) and af.shape == (32, 40, 2)
        assert set(np.unique(av)) <= {0.0, 1.0}


def test_mixed_dataset_repeats():
    class Fake:
        sparse = False

        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    a, b = Fake("a", 3), Fake("b", 2)
    mix = MixedFlowDataset([(a, 2), (b, 5)])
    assert len(mix) == 3 * 2 + 2 * 5
    assert mix[0] == ("a", 0)
    assert mix[5] == ("a", 2)  # second repeat of a
    assert mix[6] == ("b", 0)
    assert mix[15] == ("b", 1)
    with pytest.raises(IndexError):
        mix[16]


def test_fetch_sintel_stage_mixture(tmp_path, rng):
    """C+T+S+K+H sintel-stage mixture with per-part augmentors
    (ref: datasets.py:285-291)."""
    sintel = tmp_path / "sintel"
    for dstype in ("clean", "final"):
        d = sintel / "training" / dstype / "alley_1"
        d.mkdir(parents=True)
        for i in range(3):
            _png(d / f"frame_{i:04d}.png", rng)
    (sintel / "training" / "flow" / "alley_1").mkdir(parents=True)

    kitti = tmp_path / "kitti"
    (kitti / "training" / "image_2").mkdir(parents=True)
    (kitti / "training" / "flow_occ").mkdir(parents=True)
    for i in range(2):
        _png(kitti / "training" / "image_2" / f"{i:06d}_10.png", rng)
        _png(kitti / "training" / "image_2" / f"{i:06d}_11.png", rng)
        write_kitti_png_flow(
            str(kitti / "training" / "flow_occ" / f"{i:06d}_10.png"),
            rng.normal(size=(H, W, 2)).astype(np.float32),
        )

    things = make_things_tree(tmp_path / "things", rng, seqs=1, frames=2)
    hd1k = make_hd1k_tree(tmp_path / "hd1k", rng, seqs=1, frames=2)

    ds = fetch_train_dataset(
        "sintel",
        {"sintel": str(sintel), "kitti": str(kitti),
         "hd1k": str(hd1k), "things": str(things)},
        crop_size=(32, 40), seed=0,
    )
    # 100*2 + 100*2 + 200*2 + 5*1 + 2 (things: 1 seq x 1 pair x 2 dirs)
    assert len(ds) == 200 + 200 + 400 + 5 + 2
    for idx in (0, 200, 400, 800, 805):
        im1, im2, flow, valid = ds[idx]
        assert im1.shape == (32, 40, 3)
        assert flow.shape == (32, 40, 2)


def _sintel_tree(tmp_path, rng, split="training", with_flow=True,
                 scenes=("alley_1",), frames=3):
    from atdn_vslam_tpu.data.flow_io import write_flo

    root = tmp_path / "sintel"
    for dstype in ("clean", "final"):
        for sc in scenes:
            d = root / split / dstype / sc
            d.mkdir(parents=True, exist_ok=True)
            for i in range(frames):
                _png(d / f"frame_{i:04d}.png", rng)
    if with_flow:
        for sc in scenes:
            d = root / split / "flow" / sc
            d.mkdir(parents=True, exist_ok=True)
            for i in range(frames - 1):
                write_flo(
                    str(d / f"frame_{i:04d}.flo"),
                    rng.normal(size=(H, W, 2)).astype(np.float32),
                )
    return root


def _kitti_tree(tmp_path, rng, split="training", n=2):
    base = tmp_path / "kitti" / split
    (base / "image_2").mkdir(parents=True, exist_ok=True)
    if split == "training":
        (base / "flow_occ").mkdir(exist_ok=True)
    for i in range(n):
        _png(base / "image_2" / f"{i:06d}_10.png", rng)
        _png(base / "image_2" / f"{i:06d}_11.png", rng)
        if split == "training":
            write_kitti_png_flow(
                str(base / "flow_occ" / f"{i:06d}_10.png"),
                rng.normal(size=(H, W, 2)).astype(np.float32),
            )
    return tmp_path / "kitti"


@pytest.fixture(scope="module")
def tiny_flow_model():
    import jax
    import jax.numpy as jnp
    from atdn_vslam_tpu.models.flow import RAFTGMA

    model = RAFTGMA(iters=2, use_pallas=False)
    z = jnp.zeros((1, H, W, 3))
    variables = jax.jit(model.init)(jax.random.key(0), z, z)
    return model, variables


def test_validate_sintel_and_kitti(tmp_path, rng, tiny_flow_model):
    """Validation protocols report finite pooled metrics
    (ref: GMA/evaluate.py:211-243,348-378)."""
    from atdn_vslam_tpu.cli.evaluate_flow import (
        validate_kitti,
        validate_sintel,
    )

    model, variables = tiny_flow_model
    sintel = _sintel_tree(tmp_path, rng)
    res = validate_sintel(model, variables, str(sintel), limit=2)
    assert set(res) == {"clean", "final"}
    assert all(np.isfinite(v) for v in res.values())

    kitti = _kitti_tree(tmp_path, rng)
    res = validate_kitti(model, variables, str(kitti), limit=2)
    assert np.isfinite(res["kitti_epe"]) and np.isfinite(res["kitti_f1"])


def test_sintel_submission_writer(tmp_path, rng, tiny_flow_model):
    """Sintel submission: .flo per test frame, warm-started
    (ref: GMA/evaluate.py:21-49)."""
    from atdn_vslam_tpu.cli.evaluate_flow import create_sintel_submission
    from atdn_vslam_tpu.data.flow_io import read_flo

    model, variables = tiny_flow_model
    root = _sintel_tree(tmp_path, rng, split="test", with_flow=False)
    out = create_sintel_submission(
        model, variables, str(root), str(tmp_path / "sub"),
        warm_start=True,
    )
    flo = read_flo(
        str(tmp_path / "sub" / "clean" / "alley_1" / "frame0001.flo")
    )
    assert flo.shape == (H, W, 2)
    assert np.isfinite(flo).all()
    assert (tmp_path / "sub" / "final" / "alley_1" / "frame0002.flo").exists()
    assert out == str(tmp_path / "sub")


def test_kitti_submission_writer(tmp_path, rng, tiny_flow_model):
    """KITTI submission: 16-bit flow pngs for the testing split
    (ref: GMA/evaluate.py:100-118)."""
    from atdn_vslam_tpu.cli.evaluate_flow import create_kitti_submission
    from atdn_vslam_tpu.data.flow_io import read_kitti_png_flow

    model, variables = tiny_flow_model
    root = _kitti_tree(tmp_path, rng, split="testing")
    create_kitti_submission(
        model, variables, str(root), str(tmp_path / "ksub")
    )
    flow, valid = read_kitti_png_flow(str(tmp_path / "ksub" / "000000_10.png"))
    assert flow.shape == (H, W, 2) and np.isfinite(flow).all()


def test_forward_interpolate_identity():
    """Zero flow forward-interpolates to (nearly) zero; constant flow
    inside bounds is preserved at interior pixels."""
    from atdn_vslam_tpu.data.flow_io import forward_interpolate

    z = np.zeros((12, 16, 2), np.float32)
    out = forward_interpolate(z)
    # zero flow scatters each pixel onto itself -> zero everywhere the
    # scatter is valid; boundary pixels fall back to nearest (also 0)
    np.testing.assert_allclose(out, 0.0)

    const = np.full((12, 16, 2), 2.0, np.float32)
    out = forward_interpolate(const)
    np.testing.assert_allclose(out[4:8, 4:12], 2.0)
