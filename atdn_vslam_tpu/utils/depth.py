"""KITTI calibration + depth back-projection utilities.

Parity with the reference's dormant depth helpers
(ref: atdn_vslam/utils/depth.py:5-45): a calib-file reader and
depth-map -> 3D point-cloud back-projection via inverse intrinsics.
Batched and jit-friendly here.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def read_calib(data_path: str, sequence: str) -> np.ndarray:
    """Read the P2 (left color cam) 3x4 projection matrix from a KITTI
    ``calib.txt`` (ref: depth.py:5-20)."""
    path = os.path.join(
        data_path, "dataset", "sequences", sequence, "calib.txt"
    )
    with open(path) as f:
        for line in f:
            if line.startswith("P2:"):
                vals = np.fromstring(line.split(":", 1)[1], sep=" ")
                return vals.reshape(3, 4)
    raise ValueError(f"No P2 entry in {path}")


def project_depth(depth: jax.Array, intrinsics: jax.Array) -> jax.Array:
    """Back-project a depth map to camera-frame 3D points
    (ref: depth.py:23-45).

    :param depth: (H, W) metric depth.
    :param intrinsics: (3, 3) camera matrix K (e.g. P2[:, :3]).
    :return: (H, W, 3) xyz point cloud.
    """
    h, w = depth.shape
    ys = jax.lax.broadcasted_iota(depth.dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(depth.dtype, (h, w), 1)
    ones = jnp.ones_like(depth)
    pix = jnp.stack([xs, ys, ones], axis=-1)  # (H, W, 3) homogeneous
    k_inv = jnp.linalg.inv(intrinsics.astype(jnp.float32)).astype(depth.dtype)
    rays = pix @ k_inv.T
    return rays * depth[..., None]
