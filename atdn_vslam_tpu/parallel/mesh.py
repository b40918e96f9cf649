"""Mesh construction and sharding rules.

Axes:
  * "data"  — batch sharding for training and batched inference;
  * "model" — reserved for tensor sharding of large activations
    (the GMA correlation volume / attention can shard its token axis
    here at high resolutions — a designed extension, SURVEY.md 5.7).

The train step itself needs no explicit collectives: with parameters
replicated and batches sharded over "data", jit inserts the gradient
psum over ICI (GSPMD).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atdn_vslam_tpu.config import MeshConfig


def make_mesh(
    config: MeshConfig | None = None,
    devices: list[jax.Device] | None = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices.

    Axis sizes of -1 fill with the remaining devices (data first).
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = config.model if config.model > 0 else 1
    data = config.data if config.data > 0 else n // model
    if data * model > n:
        raise ValueError(
            f"Mesh {data}x{model} needs {data * model} devices, have {n}"
        )
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data", replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_parallel_sharding(
    mesh: Mesh, tree, min_size: int = 65_536
):
    """Tensor-parallel sharding rules for a parameter/optimizer pytree:
    large >=2-D leaves whose last dim divides the "model" axis shard
    that dim over "model"; everything else replicates.

    For ATDNVO this puts the 512x512 LSTM/Dense kernels (and their
    AdamW moments, which share the tree structure) across the model
    axis — matmul outputs all-gather over ICI via GSPMD.
    """
    model = mesh.shape["model"]

    def spec_for(x):
        if (
            hasattr(x, "ndim") and x.ndim >= 2
            and x.shape[-1] % model == 0 and x.size >= min_size
        ):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1)), "model")
            )
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, tree)


def shard_batch(mesh: Mesh, batch):
    """Device-put a host pytree with leading-axis sharding over "data".

    Pads nothing: callers must make batch divisible by the data-axis
    size (the data pipeline guarantees it via drop_last semantics,
    matching ref train_odometry.py:85).
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if x.shape[0] % mesh.shape["data"] != 0:
            raise ValueError(
                f"Batch axis {x.shape[0]} not divisible by data-axis "
                f"size {mesh.shape['data']}"
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
