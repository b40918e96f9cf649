"""Spatially-sharded flow inference — corr volume / attention over the
"model" mesh axis.

New capability vs the reference (which is hard-wired to one GPU at
376x1232, ref: neural_slam.py:51,198): shard the *row* dimension of the
frame pair over the mesh's "model" axis and let GSPMD propagate that
sharding through the whole flow network:

  * feature/context encoder convs: H-dim sharded, XLA inserts halo
    exchanges for the 3x3/7x7 stencils;
  * correlation volume (B, N1, Hl, Wl): the query dim N1 = H/8 * W/8
    inherits the row sharding (reshape merges the sharded-major H/8
    with W/8) — each device holds and *builds* only its slice of the
    ~(N1 x N1) volume, the piece that exceeds single-chip HBM first at
    high resolution;
  * windowed corr lookup: per-query batched matmuls, no communication;
  * GMA attention: the Pallas flash kernels run row-sharded via
    shard_map (q/probs sharded, k/v replicated — no cross-shard
    softmax since the reduction is over keys; ops/attention.py
    ``sharded_flash_probs_spatial`` / ``sharded_flash_attend``), so
    the fused path survives sharding instead of falling back to XLA;
  * update-block ConvGRU: row-sharded with halo exchanges.

Result: resolution scaling across chips with only stencil-halo and
k/v-gather traffic on ICI — there is no step in the flow network that
requires the full volume on one device.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatially_sharded_model(flow_model, mesh: Mesh, axis: str = "model"):
    """Clone a RAFTGMA with the (mesh, axis) threaded into its
    attention kernels so the Pallas paths partition via shard_map."""
    if (
        getattr(flow_model, "spatial_mesh", None) is mesh
        and getattr(flow_model, "spatial_axis", None) == axis
    ):
        return flow_model
    return flow_model.clone(spatial_mesh=mesh, spatial_axis=axis)


def sharded_flow_infer(
    flow_model,
    variables,
    image1: jax.Array,
    image2: jax.Array,
    mesh: Mesh,
    axis: str = "model",
):
    """Run ``flow_model.apply`` in test mode with the image rows (and
    therefore the corr-volume query axis) sharded over ``axis``.

    The model is cloned with ``spatial_mesh``/``spatial_axis`` set so
    its Pallas attention kernels run row-sharded (shard_map) instead of
    being disabled — ``use_pallas`` keeps its normal meaning under
    sharding.

    :param image1, image2: (B, H, W, 3); H/8 should be >= the axis size
        (GSPMD pads otherwise — still correct, just wasteful).
    :return: (flow_low, flow_up), replicated on all devices.
    """
    return _sharded_infer_fn(flow_model, mesh, axis)(
        variables, image1, image2
    )


@functools.lru_cache(maxsize=8)
def _sharded_infer_fn(flow_model, mesh: Mesh, axis: str):
    """Cached jitted row-sharded apply. Building a fresh
    ``jax.jit(functools.partial(...))`` per call would defeat jit's
    trace cache (the partial is a new callable each time) — measured
    ~2 s/call of pure retrace overhead at 2x KITTI resolution."""
    flow_model = spatially_sharded_model(flow_model, mesh, axis)
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        functools.partial(flow_model.apply, test_mode=True),
        in_shardings=(repl, rows, rows),
        out_shardings=(repl, repl),
    )
