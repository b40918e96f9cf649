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
  * GMA attention: query rows sharded, k/v all-gathered (tiny:
    N x 128);
  * update-block ConvGRU: row-sharded with halo exchanges.

Result: resolution scaling across chips with only stencil-halo and
k/v-gather traffic on ICI — there is no step in the flow network that
requires the full volume on one device.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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

    :param image1, image2: (B, H, W, 3); H/8 should be >= the axis size
        (GSPMD pads otherwise — still correct, just wasteful).
    :return: (flow_low, flow_up), replicated on all devices.

    NOTE: construct the model with ``use_pallas=False`` for sharded
    inference on real multi-chip hardware — Pallas kernels
    (flash attention / flash_probs_spatial) do not auto-partition
    under GSPMD; the XLA paths shard cleanly.
    """
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(None, axis))
    fn = jax.jit(
        functools.partial(flow_model.apply, test_mode=True),
        in_shardings=(repl, rows, rows),
        out_shardings=(repl, repl),
    )
    return fn(variables, image1, image2)
