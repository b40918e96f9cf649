"""Numerical parity of the flax RAFTGMA against the reference torch
implementation (the vendored GMA wheel), through the checkpoint
converter.

This is the flow-net counterpart of test_convert.test_atdnvo_torch_flax
_parity: the wheel at /root/reference/GMA-1.0.0-py3-none-any.whl is
unpacked (a wheel is a zip — no install needed), the torch ``RAFTGMA``
(ref: GMA/core/network.py:26-129) is instantiated with the reference
args (utils/gma_parameters.py:1-34, mixed_precision off for f32
comparison), its randomly-initialized ``state_dict`` is mapped through
``convert_gma``, and outputs are compared block-by-block and end-to-end.

This covers every conversion hazard at once: conv/dense layouts, the
corr-window dx/dy-major permutation, instance/batch-norm eps and stats,
attention scale placement, convex-upsample mask channel order, and the
bilinear zero-padding semantics of the lookup.
"""

from __future__ import annotations

import sys
import zipfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_checkpoint import (  # noqa: E402
    _corr_window_perm,
    convert_gma,
)

WHEEL = "/root/reference/GMA-1.0.0-py3-none-any.whl"


@pytest.fixture(scope="session")
def gma_wheel(tmp_path_factory):
    """Unpack the reference GMA wheel and make it importable."""
    try:
        root = tmp_path_factory.mktemp("gma_wheel")
        with zipfile.ZipFile(WHEEL) as z:
            z.extractall(root)
    except FileNotFoundError:
        pytest.skip(f"reference wheel not available at {WHEEL}")
    sys.path.insert(0, str(root))
    import GMA.core.network as tnet
    import GMA.core.corr as tcorr
    import GMA.core.utils.utils as tutils

    yield tnet, tcorr, tutils
    sys.path.remove(str(root))


class _Args:
    """Stand-in for the reference GMA_Parameters
    (ref: utils/gma_parameters.py:1-34); mixed_precision disabled so the
    comparison is f32 vs f32."""

    num_heads = 1
    mixed_precision = False
    dropout = 0.0
    position_only = False
    position_and_content = False

    def __contains__(self, k):  # network.py:36 does `'dropout' in args`
        return hasattr(self, k)


def _torch_model(gma_wheel, h, w, seed=0):
    """Reference RAFTGMA with BN running stats seeded away from init
    (the cnet uses batch norm; eval-mode parity must exercise real
    running stats, not the (0, 1) initialization)."""
    tnet, _, _ = gma_wheel
    torch.manual_seed(seed)
    tm = tnet.RAFTGMA(_Args())
    tm.train()
    with torch.no_grad():
        for _ in range(2):
            tm(
                torch.rand(2, 3, h, w) * 255,
                torch.rand(2, 3, h, w) * 255,
                iters=2,
                test_mode=True,
            )
    tm.eval()
    return tm


def _convert(tm):
    # checkpoints are saved through DataParallel -> module. prefix
    # (ref: neural_slam.py:51); exercise that path too.
    sd = {f"module.{k}": v.numpy() for k, v in tm.state_dict().items()}
    return convert_gma(sd)


def _frame_pair(rng, h, w):
    im1 = rng.uniform(0, 255, (1, 3, h, w)).astype(np.float32)
    im2 = rng.uniform(0, 255, (1, 3, h, w)).astype(np.float32)
    return im1, im2


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _run_parity(gma_wheel, h, w, iters, atol):
    from atdn_vslam_tpu.models.flow.network import RAFTGMA

    tm = _torch_model(gma_wheel, 128, 192)
    variables = _convert(tm)
    rng = np.random.default_rng(0)
    im1, im2 = _frame_pair(rng, h, w)

    with torch.no_grad():
        lo_t, up_t = tm(
            torch.from_numpy(im1), torch.from_numpy(im2),
            iters=iters, test_mode=True,
        )
    lo_j, up_j = RAFTGMA(iters=iters).apply(
        variables, _nhwc(im1), _nhwc(im2), test_mode=True
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(lo_j), (0, 3, 1, 2)),
        lo_t.numpy(), atol=atol,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(up_j), (0, 3, 1, 2)),
        up_t.numpy(), atol=atol,
    )
    # sanity: the comparison is on a non-degenerate flow field
    assert float(np.abs(up_t.numpy()).max()) > 1.0


def test_gma_torch_flax_parity(gma_wheel):
    """End-to-end test-mode parity at a mid-size resolution.

    NOTE: the smallest usable size is 128x192 — below that the level-3
    corr map degenerates to 1x1 and the reference bilinear_sampler
    divides by zero (GMA/core/utils/utils.py:62-63, W-1 == 0)."""
    _run_parity(gma_wheel, 128, 192, iters=4, atol=1e-4)


@pytest.mark.slow
def test_gma_torch_flax_parity_fullres(gma_wheel):
    """Full working-resolution (376x1232, ref: neural_slam.py:54,198)
    parity at the reference's 12 iterations (gma_parameters.py:7).
    Measured max error ~3e-5 on a ~20 px flow field."""
    _run_parity(gma_wheel, 376, 1232, iters=12, atol=1e-3)


def test_gma_training_mode_parity(gma_wheel):
    """Training mode returns all ``iters`` upsampled predictions
    (ref: network.py:106-129); each must match the torch sequence."""
    from atdn_vslam_tpu.models.flow.network import RAFTGMA

    tm = _torch_model(gma_wheel, 128, 192)
    variables = _convert(tm)
    rng = np.random.default_rng(1)
    im1, im2 = _frame_pair(rng, 128, 192)

    with torch.no_grad():
        preds_t = tm(
            torch.from_numpy(im1), torch.from_numpy(im2),
            iters=3, test_mode=False,
        )
    preds_j = RAFTGMA(iters=3).apply(
        variables, _nhwc(im1), _nhwc(im2), test_mode=False,
        train=False,
    )
    assert preds_j.shape[0] == len(preds_t) == 3
    for i, p_t in enumerate(preds_t):
        np.testing.assert_allclose(
            np.transpose(np.asarray(preds_j[i]), (0, 3, 1, 2)),
            p_t.numpy(), atol=1e-4,
        )


def test_gma_training_gradient_parity(gma_wheel):
    """Gradients of the prediction sum w.r.t. flow-head weights match
    torch — this pins the per-iteration coords1 detach semantics
    (ref: network.py:108 ``coords1 = coords1.detach()``)."""
    from atdn_vslam_tpu.models.flow.network import RAFTGMA

    tm = _torch_model(gma_wheel, 128, 192)
    variables = _convert(tm)
    rng = np.random.default_rng(3)
    im1, im2 = _frame_pair(rng, 128, 192)

    tm.zero_grad()
    preds_t = tm(
        torch.from_numpy(im1), torch.from_numpy(im2),
        iters=3, test_mode=False,
    )
    sum(p.sum() for p in preds_t).backward()
    g_flow_t = tm.update_block.flow_head.conv1.weight.grad.numpy()
    g_fnet_t = tm.fnet.conv1.weight.grad.numpy()

    model = RAFTGMA(iters=3)

    def loss_fn(params):
        vars_ = dict(variables, params=params)
        preds = model.apply(vars_, _nhwc(im1), _nhwc(im2), test_mode=False)
        return jnp.sum(preds)

    grads = jax.grad(loss_fn)(variables["params"])
    g_flow_j = np.transpose(
        np.asarray(
            grads["update"]["GMAUpdateBlock_0"]["FlowHead_0"]["Conv_0"][
                "kernel"
            ]
        ),
        (3, 2, 0, 1),
    )
    g_fnet_j = np.transpose(
        np.asarray(grads["BasicEncoder_0"]["Conv_0"]["kernel"]),
        (3, 2, 0, 1),
    )
    np.testing.assert_allclose(
        g_flow_j, g_flow_t, atol=2e-2 * np.abs(g_flow_t).max()
    )
    np.testing.assert_allclose(
        g_fnet_j, g_fnet_t, atol=2e-2 * np.abs(g_fnet_t).max()
    )


@pytest.mark.parametrize("mode", ["sintel", "kitti"])
@pytest.mark.parametrize("hw", [(370, 1226), (436, 1024), (375, 1242)])
def test_input_padder_matches_torch(gma_wheel, mode, hw):
    """InputPadder pad placement + replicate semantics + unpad match
    the reference (ref: GMA/core/utils/utils.py:8-30)."""
    _, _, tutils = gma_wheel
    from atdn_vslam_tpu.ops.padding import InputPadder

    h, w = hw
    rng = np.random.default_rng(4)
    im = rng.uniform(0, 255, (1, 3, h, w)).astype(np.float32)

    tp = tutils.InputPadder(im.shape, mode=mode)
    (padded_t,) = tp.pad(torch.from_numpy(im))

    jp = InputPadder((h, w, 3), mode=mode)
    (padded_j,) = jp.pad(np.transpose(im, (0, 2, 3, 1)))

    np.testing.assert_array_equal(
        np.transpose(padded_j, (0, 3, 1, 2)), padded_t.numpy()
    )
    assert padded_j.shape[1] % 8 == 0 and padded_j.shape[2] % 8 == 0
    # unpad round-trips
    np.testing.assert_array_equal(
        jp.unpad(padded_j), np.transpose(im, (0, 2, 3, 1))
    )
    un_t = tp.unpad(padded_t[0])
    np.testing.assert_array_equal(un_t.numpy(), im[0])


def test_corr_lookup_matches_torch_grid_sample(gma_wheel):
    """The gather-free matmul lookup reproduces the reference
    grid_sample lookup (ref: GMA/core/corr.py:32-53) including its
    zero out-of-bounds padding, up to the documented dx/dy-major
    window-channel permutation (compensated in convc1 by the
    converter)."""
    _, tcorr, tutils = gma_wheel
    from atdn_vslam_tpu.ops.bilinear import coords_grid
    from atdn_vslam_tpu.ops.corr_lookup import (
        build_corr_pyramid,
        lookup_corr_pyramid,
    )

    h8, w8 = 16, 24
    rng = np.random.default_rng(2)
    f1 = rng.normal(size=(1, 256, h8, w8)).astype(np.float32)
    f2 = rng.normal(size=(1, 256, h8, w8)).astype(np.float32)
    # large offsets push some windows out of bounds -> exercises the
    # zero-padding semantics of grid_sample vs our hat-weight matmul
    off = rng.normal(scale=6.0, size=(1, 2, h8, w8)).astype(np.float32)

    with torch.no_grad():
        corr_fn = tcorr.CorrBlock(
            torch.from_numpy(f1), torch.from_numpy(f2), radius=4
        )
        base = tutils.coords_grid(1, h8, w8)
        out_t = corr_fn(base + torch.from_numpy(off))

    pyr = tuple(build_corr_pyramid(
        _nhwc(f1), _nhwc(f2), num_levels=4
    ))
    coords = coords_grid(h8, w8)[None] + _nhwc(off)
    out_j = lookup_corr_pyramid(pyr, coords, radius=4)

    perm = _corr_window_perm()
    out_j_tperm = np.transpose(np.asarray(out_j), (0, 3, 1, 2))[:, perm]
    np.testing.assert_allclose(out_j_tperm, out_t.numpy(), atol=5e-4)
