"""Convert reference PyTorch checkpoints to flax variables (msgpack).

The reference ships (well, references — the blobs are stripped from the
mirror) two checkpoint families:

  * ATDNVO odometry weights, e.g. ``11_1_atdnvo_c.pth``
    (ref: evaluate_odometry.py:38-40, test_slam.py:152);
  * GMA flow weights ``gma-kitti.pth`` saved through a DataParallel
    wrapper, so every key carries a ``module.`` prefix
    (ref: utils/gma_parameters.py:5, neural_slam.py:51-52).

This tool maps those state dicts onto our flax parameter trees,
handling:

  * conv weight layout: torch (O, I, kH, kW) -> flax (kH, kW, I, O);
  * dense layout: torch (O, I) -> flax (I, O);
  * batch-norm naming: weight/bias/running_mean/running_var ->
    scale/bias/mean/var;
  * the flatten-order permutation of the ATDNVO encoder's 832-feature
    Linear (torch flattens CHW, we flatten HWC);
  * LSTMCell gate layout: torch packed (4H, I) in (i, f, g, o) order
    with two bias vectors -> flax per-gate ii/if/ig/io + hi/hf/hg/ho
    dense kernels (h-side carries the summed bias);
  * the correlation-window channel permutation: the reference's lookup
    flattens the (2r+1)^2 window dx-major (GMA/core/corr.py:40-46 —
    its "dy" range is added to the x coordinate), ours is dy-major, so
    the motion encoder's first 1x1 conv gets its input channels
    transposed within each level's 81-channel block.

BREAKING TREE CHANGE: GMA trees converted before the test-mode loop
restructure used the param prefix ``Scan_UpdateStep_0``; the current
model tree names the step module ``update``. Re-run this tool on the
source ``.pth`` to regenerate old msgpack files (or remap the
``Scan_UpdateStep_0`` prefix to ``update`` at load time).

Usage:
  python tools/convert_torch_checkpoint.py --kind gma \
      --input gma-kitti.pth --output gma_kitti.msgpack
  python tools/convert_torch_checkpoint.py --kind atdnvo \
      --input 11_1_atdnvo_c.pth --output atdnvo.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _np(t) -> np.ndarray:
    return np.asarray(t, np.float32)


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, np.float32)


def _conv_block(sd, tkey: str, tree, fkey: str, has_bn: bool = True):
    """Reference Conv block: .conv + .bn (layers/conv.py:24-34)."""
    _set(tree, f"params/{fkey}/Conv_0/kernel", _conv(sd[f"{tkey}.conv.weight"]))
    if f"{tkey}.conv.bias" in sd:
        _set(tree, f"params/{fkey}/Conv_0/bias", _np(sd[f"{tkey}.conv.bias"]))
    if has_bn:
        _bn(sd, f"{tkey}.bn", tree, f"{fkey}/BatchNorm_0")


def _bn(sd, tkey: str, tree, fkey: str):
    _set(tree, f"params/{fkey}/scale", _np(sd[f"{tkey}.weight"]))
    _set(tree, f"params/{fkey}/bias", _np(sd[f"{tkey}.bias"]))
    _set(tree, f"batch_stats/{fkey}/mean", _np(sd[f"{tkey}.running_mean"]))
    _set(tree, f"batch_stats/{fkey}/var", _np(sd[f"{tkey}.running_var"]))


def _residual_block_atdn(sd, tkey: str, tree, fkey: str):
    """Reference ResidualConv (layers/conv.py:40-90)."""
    _conv_block(sd, f"{tkey}.conv.0", tree, f"{fkey}/ConvBlock_0")
    _conv_block(sd, f"{tkey}.conv.1", tree, f"{fkey}/ConvBlock_1")
    _set(tree, f"params/{fkey}/Conv_0/kernel", _conv(sd[f"{tkey}.skip_layer.weight"]))
    _set(tree, f"params/{fkey}/Conv_0/bias", _np(sd[f"{tkey}.skip_layer.bias"]))
    _bn(sd, f"{tkey}.out_block.1", tree, f"{fkey}/BatchNorm_0")


def _linear_block(sd, tkey: str, tree, fkey: str, perm: np.ndarray | None = None):
    w = _dense(sd[f"{tkey}.linear.weight"])
    if perm is not None:
        w = w[perm]
    _set(tree, f"params/{fkey}/Dense_0/kernel", w)
    if f"{tkey}.linear.bias" in sd:
        _set(tree, f"params/{fkey}/Dense_0/bias", _np(sd[f"{tkey}.linear.bias"]))


def _lstm_cell(sd, tkey: str, tree, fkey: str, hidden: int = 512):
    """torch LSTMCell packed gates (i, f, g, o) -> flax per-gate denses.

    flax gate formula: sigma(ii(x) + hi(h)) etc., with bias only on the
    h-side denses; torch has bias_ih + bias_hh -> summed onto h bias.
    """
    w_ih = _np(sd[f"{tkey}.weight_ih"])  # (4H, I)
    w_hh = _np(sd[f"{tkey}.weight_hh"])
    b = _np(sd[f"{tkey}.bias_ih"]) + _np(sd[f"{tkey}.bias_hh"])
    for g, name in enumerate("ifgo"):
        sl = slice(g * hidden, (g + 1) * hidden)
        _set(tree, f"params/{fkey}/i{name}/kernel", w_ih[sl].T)
        _set(tree, f"params/{fkey}/h{name}/kernel", w_hh[sl].T)
        _set(tree, f"params/{fkey}/h{name}/bias", b[sl])


def _flatten_perm(c: int, h: int, w: int) -> np.ndarray:
    """perm[flax_flat_idx] = torch_flat_idx for CHW -> HWC flattening."""
    torch_idx = np.arange(c * h * w).reshape(c, h, w)
    return np.transpose(torch_idx, (1, 2, 0)).reshape(-1)


def convert_atdnvo(sd: dict) -> dict:
    """ATDNVO state dict -> flax variables
    (architecture: ref odometry/network.py:62-119)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    tree: dict = {}
    # polar_norm (network.py:43) exists in the state dict but is unused
    # in forward — skipped.
    _set(tree, "params/encoder/Conv_0/kernel", _conv(sd["encoder_CNN.0.weight"]))
    _set(tree, "params/encoder/Conv_0/bias", _np(sd["encoder_CNN.0.bias"]))
    _conv_block(sd, "encoder_CNN.1", tree, "encoder/ConvBlock_0")
    for i in range(4):
        _residual_block_atdn(
            sd, f"encoder_CNN.{i + 2}", tree, f"encoder/ResidualConvBlock_{i}"
        )
    _conv_block(sd, "encoder_CNN.6", tree, "encoder/ConvBlock_1")
    # Linear(832 -> 512): torch flattens (C=16, H=4, W=13)
    _linear_block(
        sd, "encoder_CNN.8", tree, "encoder/LinearBlock_0",
        perm=_flatten_perm(16, 4, 13),
    )
    _lstm_cell(sd, "lstm1", tree, "lstm1")
    _linear_block(sd, "lstm_linear", tree, "lstm_linear")
    _lstm_cell(sd, "lstm2", tree, "lstm2")
    for torch_head, flax_head in (
        ("rotation_regressor", "rotation_head"),
        ("translation_regressor", "translation_head"),
    ):
        _linear_block(sd, f"{torch_head}.0", tree, f"{flax_head}/LinearBlock_0")
        _linear_block(sd, f"{torch_head}.1", tree, f"{flax_head}/LinearBlock_1")
        _set(
            tree, f"params/{flax_head}/Dense_0/kernel",
            _dense(sd[f"{torch_head}.2.weight"]),
        )
    return tree


# ---------------------------------------------------------------------
# GMA / RAFTGMA
# ---------------------------------------------------------------------

def _gma_residual_block(sd, tkey: str, tree, fkey: str, batch_norm: bool):
    _set(tree, f"params/{fkey}/Conv_0/kernel", _conv(sd[f"{tkey}.conv1.weight"]))
    _set(tree, f"params/{fkey}/Conv_0/bias", _np(sd[f"{tkey}.conv1.bias"]))
    _set(tree, f"params/{fkey}/Conv_1/kernel", _conv(sd[f"{tkey}.conv2.weight"]))
    _set(tree, f"params/{fkey}/Conv_1/bias", _np(sd[f"{tkey}.conv2.bias"]))
    if batch_norm:
        _bn(sd, f"{tkey}.norm1", tree, f"{fkey}/_Norm_0/BatchNorm_0")
        _bn(sd, f"{tkey}.norm2", tree, f"{fkey}/_Norm_1/BatchNorm_0")
    if f"{tkey}.downsample.0.weight" in sd:
        _set(tree, f"params/{fkey}/Conv_2/kernel",
             _conv(sd[f"{tkey}.downsample.0.weight"]))
        _set(tree, f"params/{fkey}/Conv_2/bias",
             _np(sd[f"{tkey}.downsample.0.bias"]))
        if batch_norm:
            _bn(sd, f"{tkey}.norm3", tree, f"{fkey}/_Norm_2/BatchNorm_0")


def _gma_encoder(sd, tkey: str, tree, fkey: str, batch_norm: bool):
    """BasicEncoder (GMA/core/extractor.py:116-189)."""
    _set(tree, f"params/{fkey}/Conv_0/kernel", _conv(sd[f"{tkey}.conv1.weight"]))
    _set(tree, f"params/{fkey}/Conv_0/bias", _np(sd[f"{tkey}.conv1.bias"]))
    if batch_norm:
        _bn(sd, f"{tkey}.norm1", tree, f"{fkey}/_Norm_0/BatchNorm_0")
    for layer in range(3):
        for j in range(2):
            _gma_residual_block(
                sd, f"{tkey}.layer{layer + 1}.{j}", tree,
                f"{fkey}/ResidualBlock_{layer * 2 + j}", batch_norm,
            )
    _set(tree, f"params/{fkey}/Conv_1/kernel", _conv(sd[f"{tkey}.conv2.weight"]))
    _set(tree, f"params/{fkey}/Conv_1/bias", _np(sd[f"{tkey}.conv2.bias"]))


def _corr_window_perm(levels: int = 4, radius: int = 4) -> np.ndarray:
    """Input-channel permutation for the motion encoder's first conv:
    perm[our_channel] = torch_channel. Per level, torch flattens the
    window dx-major (its offset pair is (dx_i, dy_j) at k = i*span+j),
    ours dy-major (k = dy_a*span + dx_b) -> transpose within the block."""
    span = 2 * radius + 1
    block = np.arange(span * span).reshape(span, span).T.reshape(-1)
    return np.concatenate(
        [block + level * span * span for level in range(levels)]
    )


def convert_gma(sd: dict) -> dict:
    """RAFTGMA state dict -> flax variables
    (architecture: ref GMA/core/network.py:26-129; keys carry the
    DataParallel ``module.`` prefix, neural_slam.py:51)."""
    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    tree: dict = {}
    _gma_encoder(sd, "fnet", tree, "BasicEncoder_0", batch_norm=False)
    _gma_encoder(sd, "cnet", tree, "BasicEncoder_1", batch_norm=True)
    _set(tree, "params/AttentionQK_0/Conv_0/kernel",
         _conv(sd["att.to_qk.weight"]))

    up = "update/GMAUpdateBlock_0"
    # motion encoder (GMA/core/update.py:66-84)
    convc1 = _conv(sd["update_block.encoder.convc1.weight"])
    perm = _corr_window_perm()
    _set(tree, f"params/{up}/BasicMotionEncoder_0/Conv_0/kernel", convc1[:, :, perm, :])
    _set(tree, f"params/{up}/BasicMotionEncoder_0/Conv_0/bias",
         _np(sd["update_block.encoder.convc1.bias"]))
    for tname, fname in (
        ("convc2", "Conv_1"), ("convf1", "Conv_2"),
        ("convf2", "Conv_3"), ("conv", "Conv_4"),
    ):
        _set(tree, f"params/{up}/BasicMotionEncoder_0/{fname}/kernel",
             _conv(sd[f"update_block.encoder.{tname}.weight"]))
        _set(tree, f"params/{up}/BasicMotionEncoder_0/{fname}/bias",
             _np(sd[f"update_block.encoder.{tname}.bias"]))
    # aggregator (GMA/core/gma.py:79-115)
    _set(tree, f"params/{up}/Aggregate_0/Conv_0/kernel",
         _conv(sd["update_block.aggregator.to_v.weight"]))
    _set(tree, f"params/{up}/Aggregate_0/gamma",
         _np(sd["update_block.aggregator.gamma"]).reshape(1))
    # SepConvGRU (GMA/core/update.py:36-63). Our GRU fuses the z and r
    # convs (same input) into one conv with block-concatenated kernels:
    # Conv_0 = [convz1 | convr1], Conv_1 = convq1,
    # Conv_2 = [convz2 | convr2], Conv_3 = convq2.
    for i, (tz, tr) in enumerate((("convz1", "convr1"), ("convz2", "convr2"))):
        kz, kr = (_conv(sd[f"update_block.gru.{t}.weight"]) for t in (tz, tr))
        bz, br = (_np(sd[f"update_block.gru.{t}.bias"]) for t in (tz, tr))
        _set(tree, f"params/{up}/SepConvGRU_0/Conv_{2 * i}/kernel",
             np.concatenate([kz, kr], axis=-1))
        _set(tree, f"params/{up}/SepConvGRU_0/Conv_{2 * i}/bias",
             np.concatenate([bz, br]))
    for i, tname in ((1, "convq1"), (3, "convq2")):
        _set(tree, f"params/{up}/SepConvGRU_0/Conv_{i}/kernel",
             _conv(sd[f"update_block.gru.{tname}.weight"]))
        _set(tree, f"params/{up}/SepConvGRU_0/Conv_{i}/bias",
             _np(sd[f"update_block.gru.{tname}.bias"]))
    # flow head + upsample mask head (update.py:7-15,120-123)
    for tname, fname in (("conv1", "Conv_0"), ("conv2", "Conv_1")):
        _set(tree, f"params/{up}/FlowHead_0/{fname}/kernel",
             _conv(sd[f"update_block.flow_head.{tname}.weight"]))
        _set(tree, f"params/{up}/FlowHead_0/{fname}/bias",
             _np(sd[f"update_block.flow_head.{tname}.bias"]))
    for i, fname in ((0, "mask_conv1"), (2, "mask_conv2")):
        _set(tree, f"params/{up}/{fname}/kernel",
             _conv(sd[f"update_block.mask.{i}.weight"]))
        _set(tree, f"params/{up}/{fname}/bias",
             _np(sd[f"update_block.mask.{i}.bias"]))
    return tree


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--kind", choices=["atdnvo", "gma"], required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    import torch
    from flax.serialization import msgpack_serialize

    sd = torch.load(args.input, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items()}

    tree = convert_atdnvo(sd) if args.kind == "atdnvo" else convert_gma(sd)
    with open(args.output, "wb") as f:
        f.write(msgpack_serialize(tree))
    n = sum(x.size for x in _leaves(tree))
    print(f"Wrote {args.output}: {n:,} parameters")
    return 0


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    raise SystemExit(main())
