"""Input padding to /8-divisible sizes for the flow network.

Parity re-implementation of the reference ``InputPadder``
(ref: GMA/core/utils/utils.py:8-30), NHWC:

  * 'sintel' mode centers the padding on both axes (width split
    left/right, height split top/bottom);
  * any other mode (the RAFT 'kitti' convention) centers the width but
    puts ALL height padding at the bottom (torch ``F.pad`` order
    [w_left, w_right, h_top, h_bottom] = [pw//2, pw-pw//2, 0, ph]);
  * padding is replicate ('edge'), matching
    ``F.pad(x, pad, mode='replicate')``.
"""

from __future__ import annotations

import numpy as np


class InputPadder:
    """Pads (..., H, W, C) images so H and W are divisible by 8.

    :param shape: image shape; the last three axes are (H, W, C).
    :param mode: 'sintel' (centered) or 'kitti' (bottom height pad).
    """

    def __init__(self, shape, mode: str = "sintel"):
        h, w = shape[-3], shape[-2]
        pad_h = (((h // 8) + 1) * 8 - h) % 8
        pad_w = (((w // 8) + 1) * 8 - w) % 8
        if mode == "sintel":
            self._pad_h = (pad_h // 2, pad_h - pad_h // 2)
        else:
            self._pad_h = (0, pad_h)
        self._pad_w = (pad_w // 2, pad_w - pad_w // 2)

    @property
    def padded(self) -> bool:
        return any(self._pad_h) or any(self._pad_w)

    def pad(self, *images):
        """Replicate-pad each (..., H, W, C) image; returns a list."""
        out = []
        for im in images:
            spec = [(0, 0)] * (im.ndim - 3) + [
                self._pad_h, self._pad_w, (0, 0)
            ]
            xp = np if isinstance(im, np.ndarray) else _jnp()
            out.append(xp.pad(im, spec, mode="edge"))
        return out

    def unpad(self, x):
        """Crop a padded (..., H, W, C) array back to the input size."""
        h0, h1 = self._pad_h
        w0, w1 = self._pad_w
        h = x.shape[-3] - h0 - h1
        w = x.shape[-2] - w0 - w1
        return x[..., h0 : h0 + h, w0 : w0 + w, :]


def _jnp():
    import jax.numpy as jnp

    return jnp
