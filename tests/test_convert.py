"""Cross-framework parity: torch reference-architecture modules ->
converter -> flax variables -> identical outputs.

This is the strongest hermetic evidence that (a) our model semantics
match the reference architecture and (b) tools/convert_torch_checkpoint
can port real checkpoints (the mirror's blobs are stripped, so parity
is proven on randomly-initialized torch modules instead)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tools.convert_torch_checkpoint import (  # noqa: E402
    _corr_window_perm,
    convert_atdnvo,
)

H, W = 376, 1232


def _torch_conv_block(cin, cout, k, s, p):
    m = tnn.Module()
    m.conv = tnn.Conv2d(cin, cout, k, s, padding=p)
    m.bn = tnn.BatchNorm2d(cout)
    return m


def _torch_residual(cin, cout, stride):
    m = tnn.Module()
    m.conv = tnn.Sequential(
        _torch_conv_block(cin, cin, 3, 1, 1),
        _torch_conv_block(cin, cout, 3, stride, 1),
    )
    m.skip_layer = tnn.Conv2d(cin, cout, 1, stride)
    m.out_block = tnn.Sequential(tnn.Mish(), tnn.BatchNorm2d(cout))
    return m


def _torch_linear(fin, fout):
    m = tnn.Module()
    m.linear = tnn.Linear(fin, fout)
    return m


class TorchATDNVO(tnn.Module):
    """Reference-architecture odometry net in torch
    (structure per ref odometry/network.py:62-119)."""

    def __init__(self):
        super().__init__()
        act = tnn.Mish
        self.encoder_CNN = tnn.Sequential(
            tnn.Conv2d(2, 2, 1, groups=2),
            _torch_conv_block(2, 16, 7, 2, 3),
            _torch_residual(16, 16, 2),
            _torch_residual(16, 16, 2),
            _torch_residual(16, 16, 2),
            _torch_residual(16, 16, 2),
            _torch_conv_block(16, 16, 3, 3, 0),
            tnn.Flatten(),
            _torch_linear(832, 512),
        )
        self.lstm1 = tnn.LSTMCell(512, 512)
        self.lstm_linear = _torch_linear(512, 512)
        self.lstm2 = tnn.LSTMCell(512, 512)
        self.rotation_regressor = tnn.Sequential(
            _torch_linear(512, 128), _torch_linear(128, 64),
            tnn.Linear(64, 3, bias=False),
        )
        self.translation_regressor = tnn.Sequential(
            _torch_linear(512, 128), _torch_linear(128, 64),
            tnn.Linear(64, 3, bias=False),
        )
        self.act = act()

    def _block(self, m, x):
        return m.bn(self.act(m.conv(x)))

    def _res(self, m, x):
        y = self._block(m.conv[0], x)
        y = self._block(m.conv[1], y)
        return m.out_block(y + m.skip_layer(x))

    def _lin(self, m, x):
        return self.act(m.linear(x))

    def forward(self, flows, h1, c1, h2, c2):
        norm = torch.tensor([58.1837, 17.7647]).view(1, 2, 1, 1)
        x = flows / norm
        x = self.encoder_CNN[0](x)
        x = self._block(self.encoder_CNN[1], x)
        for i in range(2, 6):
            x = self._res(self.encoder_CNN[i], x)
        x = self._block(self.encoder_CNN[6], x)
        x = self.encoder_CNN[7](x)
        x = self._lin(self.encoder_CNN[8], x)
        h1, c1 = self.lstm1(x, (h1, c1))
        mid = self._lin(self.lstm_linear, h1)
        h2, c2 = self.lstm2(mid, (h2, c2))
        rot = self.rotation_regressor[2](
            self._lin(self.rotation_regressor[1],
                      self._lin(self.rotation_regressor[0], h2))
        )
        tr = self.translation_regressor[2](
            self._lin(self.translation_regressor[1],
                      self._lin(self.translation_regressor[0], h2))
        )
        return rot, tr, h1, c1, h2, c2


@pytest.mark.slow
def test_atdnvo_torch_flax_parity():
    torch.manual_seed(0)
    tm = TorchATDNVO().eval()
    # mutate running stats away from init so the BN path is non-trivial
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(
                torch.randn(2, 2, H, W) * 20,
                torch.zeros(2, 512), torch.zeros(2, 512),
                torch.zeros(2, 512), torch.zeros(2, 512),
            )
        tm.eval()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_atdnvo(sd)

    from atdn_vslam_tpu.models.odometry import ATDNVO

    model = ATDNVO()
    rng = np.random.default_rng(0)
    flows = rng.normal(scale=20, size=(1, 2, H, W)).astype(np.float32)

    with torch.no_grad():
        h1 = torch.zeros(1, 512)
        rot_t, tr_t, *_ = tm(
            torch.from_numpy(flows), h1, h1.clone(), h1.clone(), h1.clone()
        )

    flows_nhwc = jnp.asarray(np.transpose(flows, (0, 2, 3, 1)))[:, None]
    carry = model.init_carry(1)
    (rot_j, tr_j), _ = model.apply(variables, flows_nhwc, carry)

    np.testing.assert_allclose(
        np.asarray(rot_j[0, 0]), rot_t[0].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(tr_j[0, 0]), tr_t[0].numpy(), atol=2e-4
    )


def test_corr_window_perm_is_involution():
    """dx-major <-> dy-major transpose applied twice is identity."""
    perm = _corr_window_perm(4, 4)
    assert perm.shape == (324,)
    assert np.array_equal(perm[perm], np.arange(324))


def test_lstm_gate_conversion():
    """Converted LSTM gates give torch-identical cell outputs."""
    torch.manual_seed(1)
    cell = tnn.LSTMCell(512, 512)
    sd = {f"lstm1.{k}": v.numpy() for k, v in cell.state_dict().items()}

    from tools.convert_torch_checkpoint import _lstm_cell

    tree: dict = {}
    _lstm_cell(sd, "lstm1", tree, "lstm1")

    from flax import linen as nn

    fcell = nn.LSTMCell(512)
    x = np.random.default_rng(2).normal(size=(3, 512)).astype(np.float32)
    h = np.random.default_rng(3).normal(size=(3, 512)).astype(np.float32)
    c = np.random.default_rng(4).normal(size=(3, 512)).astype(np.float32)

    with torch.no_grad():
        h_t, c_t = cell(
            torch.from_numpy(x), (torch.from_numpy(h), torch.from_numpy(c))
        )
    (c_j, h_j), out = fcell.apply(
        {"params": tree["params"]["lstm1"]},
        (jnp.asarray(c), jnp.asarray(h)),
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(h_j), h_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t.numpy(), atol=1e-5)
