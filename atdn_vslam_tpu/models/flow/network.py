"""RAFTGMA — recurrent optical-flow network with global motion
aggregation.

TPU-native re-design of ref: GMA/core/network.py:26-129:

  * NHWC throughout; compute dtype bfloat16 on TPU (the reference's
    torch autocast, network.py:85,93,112), correlation volume and flow
    state in float32 (network.py:88-89);
  * the 12-iteration update loop is a ``nn.scan`` (one compiled step,
    shared params) instead of a python loop (network.py:107-124);
  * the attention matrix is never materialized — q/k are computed once
    and ``softmax(q k^T) v`` is fused per iteration (see
    ops/attention.py and models/flow/gma.py);
  * in test mode the learned convex upsampling AND its mask-head convs
    run once, outside the scan, on the final hidden state/flow instead
    of every iteration (the reference computes both every iteration
    even in test mode and discards 11 of 12, network.py:116-127,
    update.py:135-138) — the update recurrence is an ``iters``-step
    ``nn.scan`` plus one mask-only call on the same shared-parameter
    step module.

Hyperparameters fixed by the reference: hidden/context dim 128,
4 correlation levels, radius 4 (network.py:31-34).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from atdn_vslam_tpu.models.flow.extractor import BasicEncoder
from atdn_vslam_tpu.models.flow.gma import AttentionQK
from atdn_vslam_tpu.ops.attention import (
    _MATERIALIZE_MAX_TOKENS,
    attention_probs_spatial,
)
from atdn_vslam_tpu.models.flow.update import GMAUpdateBlock
from atdn_vslam_tpu.ops.bilinear import coords_grid
from atdn_vslam_tpu.ops.corr_lookup import (
    build_corr_pyramid,
    lookup_corr_pyramid,
)
from atdn_vslam_tpu.ops.stem_conv import stem_s2d, stem_s2d_matmul
from atdn_vslam_tpu.ops.upsample import convex_upsample


class _UpdateStep(nn.Module):
    """One recurrence step: corr lookup -> GMA update -> flow
    integrate (ref: network.py:107-122).

    A single instance is shared between the ``iters``-step scan and one
    final mask-only call (same params, flax function-scan pattern), so
    the upsample-mask head runs exactly once per frame pair in test
    mode instead of every iteration — and it runs OUTSIDE the scan,
    from the final hidden state alone: unrolling the whole last
    iteration instead (the previous design) made XLA materialize a
    second, differently-laid-out copy of the ~105 MB level-0
    correlation volume every frame (traced at ~0.6 ms/frame)."""

    corr_radius: int
    hidden_dim: int
    heads: int
    dtype: Any
    use_pallas: bool | None
    upsample_in_scan: bool
    position_only: bool = False
    spatial_mesh: Any = None
    spatial_axis: str | None = None
    corr_nlanes: bool = False

    @nn.compact
    def __call__(self, carry, inp, q, k, bias, probs, pyramid,
                 gru_static=None, mask_only: bool = False,
                 gru_static_only: bool = False):
        net, coords1 = carry
        if mask_only or gru_static_only:
            # out-of-scan calls on the same module instance (shared
            # params): test-mode upsample-mask epilogue on the final
            # hidden state (ref computes this inside every iteration,
            # GMA/core/update.py:135-138; only the last is consumed),
            # and the SepConvGRU static-contribution hoist prologue.
            return GMAUpdateBlock(
                self.hidden_dim, self.heads, self.dtype,
                self.use_pallas, self.position_only,
                spatial_mesh=self.spatial_mesh,
                spatial_axis=self.spatial_axis,
            )(net, inp, None, None, None, None,
              mask_only=mask_only, gru_static_only=gru_static_only)
        if self.upsample_in_scan:
            # training recipe parity: the reference detaches coords1 at
            # the top of every iteration (GMA/core/network.py:108), so
            # each prediction's flow gradient reaches only its own
            # delta_flow (the hidden state still carries gradient).
            coords1 = jax.lax.stop_gradient(coords1)
        b, h, w, _ = coords1.shape
        coords0 = coords_grid(h, w)[None]
        # NOTE (measured): requesting token-major lookup output
        # (spatial_out=False, re-tiling after the motion encoder's 1x1
        # conv instead) REGRESSED the pipeline 34.0 -> 32.2 fps on a
        # v5e chip despite the per-op trace suggesting otherwise —
        # XLA's global layout propagation beats local reasoning here.
        if self.corr_nlanes:
            from atdn_vslam_tpu.ops.corr_lookup_nlanes import (
                lookup_corr_pyramid_nlanes,
            )

            corr = lookup_corr_pyramid_nlanes(
                pyramid, coords1, self.corr_radius
            )
        else:
            corr = lookup_corr_pyramid(pyramid, coords1, self.corr_radius)
        flow = coords1 - coords0

        net, up_mask, delta_flow = GMAUpdateBlock(
            self.hidden_dim, self.heads, self.dtype, self.use_pallas,
            self.position_only, spatial_mesh=self.spatial_mesh,
            spatial_axis=self.spatial_axis,
        )(
            net,
            inp,
            corr.astype(self.dtype),
            flow.astype(self.dtype),
            q,
            k,
            bias,
            probs,
            # test mode: only the final mask is consumed (computed by
            # the mask_only call above) — the scanned steps skip the
            # mask-head convs entirely (static flag).
            compute_mask=self.upsample_in_scan,
            gru_static=gru_static,
        )
        coords1 = coords1 + delta_flow.astype(jnp.float32)

        if self.upsample_in_scan:
            out = convex_upsample(
                (coords1 - coords0), up_mask.astype(jnp.float32)
            )
        else:
            out = None
        return (net, coords1), out


class RAFTGMA(nn.Module):
    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    heads: int = 1
    dtype: Any = jnp.float32
    use_pallas: bool | None = None
    position_only: bool = False
    position_and_content: bool = False
    #: rematerialize each scanned update step on the backward pass
    #: (jax.checkpoint): training memory drops from O(iters) update
    #: activations to O(1) + recompute — enables larger crops/batches
    #: for flow training on a fixed HBM budget. No effect on values or
    #: gradients (equality-tested), only on the autodiff schedule.
    remat: bool = False
    #: optional GSPMD composition: a jax.sharding.Mesh and axis name
    #: over which the spatial rows are sharded. The Pallas attention
    #: kernels then run row-sharded via shard_map instead of being
    #: disabled in sharded inference (parallel/flow_sharding.py).
    spatial_mesh: Any = None
    spatial_axis: str | None = None
    #: unroll factor for the update scan (lax.scan unroll): >1 stamps
    #: that many iterations per loop step so XLA can schedule across
    #: iteration boundaries; iters (full unroll) also makes
    #: ``cost_analysis`` count every iteration (a rolled loop body is
    #: counted once regardless of trip count — bench.py relies on this
    #: for its analytic FLOP/frame figure).
    scan_unroll: int = 1
    #: carry the shared stem-s2d frame format channel-major
    #: (B, 4C, H/2, W/2) instead of NHWC. On TPU the planar format is
    #: produced by one-hot selection matmuls (every XLA
    #: reshape/transpose expression relayouts at ~10 GB/s): measured
    #: 24.55 -> 24.01 ms/frame on the full streaming window,
    #: bit-exact (ops/stem_conv.py stem_s2d_matmul). Changes only the
    #: cache layout, never any output value (equality-tested).
    planar_stem: bool = True
    #: which lowering produces the planar stem format (both are
    #: bit-exact, perf-only): "matmul" = one-hot-matmul space-to-depth
    #: (the TPU fast path), "reshape" = XLA reshape/transpose, "auto" =
    #: matmul iff ``jax.default_backend()`` is TPU **at trace time** —
    #: a program lowered on one backend for execution on another (AOT
    #: lowering, jax export) bakes in the tracing backend's branch, so
    #: AOT users targeting TPU from a CPU host should set "matmul"
    #: explicitly.
    planar_impl: str = "auto"
    #: store correlation levels 1-3 TRANSPOSED (B, Hl, Wl, N) — queries
    #: in lanes — and sample them with the Pallas VPU window kernel
    #: instead of the separable batched matmuls: the (Hl, Wl)-tiled
    #: carry pads the small levels 73-93 % (~89 MB physical vs ~27
    #: logical per frame), which the lookup re-reads every iteration
    #: (ops/corr_lookup_nlanes.py). Inference only: training calls
    #: (test_mode=False) keep the XLA path (the kernel has no VJP).
    corr_nlanes: bool = False

    @nn.compact
    def __call__(
        self,
        image1: jax.Array,
        image2: jax.Array | None = None,
        train: bool = False,
        test_mode: bool = True,
        flow_init: jax.Array | None = None,
        fmap1: jax.Array | None = None,
        fmap2: jax.Array | None = None,
        return_features: bool = False,
        encode_only: bool = False,
    ):
        """Estimate flow between an RGB frame pair.

        :param image1, image2: (B, H, W, 3) RGB in [0, 255]; H and W
            must be multiples of 8.
        :param fmap1: optional FRAME CACHE for ``image1`` from a
            previous call's ``return_features`` output / ``encode_only``
            — a ``(feature map, stem-s2d format)`` pair (a plain
            feature-map array is also accepted). In streaming video
            each frame is image2 of one pair and image1 of the next —
            the cached fmap halves the feature-encoder cost and the
            cached s2d format lets cnet skip the ~0.5 ms/frame stem
            layout transform (trace-measured; stem_s2d is network-
            independent, so fnet and cnet share one format per frame).
            The reference re-encodes both frames every pair
            (GMA/core/network.py:86).
        :param fmap2: optional precomputed feature map (or cache pair)
            for ``image2`` (chunked streaming encodes a whole chunk of
            frames in one batched fnet pass and pairs the maps up
            shifted by one).
        :param return_features: also return ``image2``'s frame cache
            ``(fmap2, fmt2)`` for reuse as the next pair's ``fmap1``
            (test mode only).
        :param encode_only: encode ``image1`` only and return its frame
            cache ``(fmap, fmt)`` (bootstraps a streaming scan).
        :return: test_mode -> (low-res flow (B, H/8, W/8, 2),
            upsampled flow (B, H, W, 2)), matching network.py:126-127
            (plus fmap2 if ``return_features``); otherwise a
            (iters, B, H, W, 2) stack of upsampled predictions for the
            sequence loss (network.py:106-129).
        """
        if image1.shape[-3] % 8 or image1.shape[-2] % 8:
            raise ValueError(
                f"Image size {image1.shape[-3:-1]} not divisible by 8"
            )
        image1 = 2.0 * (image1 / 255.0) - 1.0
        fnet = BasicEncoder(256, "instance", dtype=self.dtype)

        # frame caches: (fmap, stem-s2d format). The s2d format is the
        # same tensor for fnet and cnet (it depends only on the
        # normalized image), so each frame is formatted exactly once
        # and the format rides the streaming carry like the fmap.
        fmt1 = fmt2 = None
        if isinstance(fmap1, (tuple, list)):
            fmap1, fmt1 = fmap1
        if isinstance(fmap2, (tuple, list)):
            fmap2, fmt2 = fmap2

        planar = self.planar_stem

        def fmt_of(img):
            # shared per-frame stem format. Planar on TPU uses the
            # one-hot-matmul space-to-depth: the reshape/transpose
            # expression relayouts at ~10 GB/s — measured 24.55 ->
            # 24.01 ms/frame on the full streaming window, bit-exact
            # (ops/stem_conv.py stem_s2d_matmul). ``planar_impl``
            # overrides the (trace-time!) backend dispatch for AOT
            # lowering — see the attribute docstring.
            if planar:
                use_matmul = self.planar_impl == "matmul"
                if self.planar_impl == "auto":
                    from atdn_vslam_tpu.utils.platform import is_tpu

                    use_matmul = is_tpu()
                if use_matmul:
                    return stem_s2d_matmul(img, dtype=self.dtype)
            return stem_s2d(img.astype(self.dtype), planar=planar)
        if encode_only:
            fmt = fmt_of(image1)
            return (
                fnet(fmt, train, preformatted=True, planar=planar), fmt
            )
        image2 = 2.0 * (image2 / 255.0) - 1.0

        if fmap1 is None:
            if fmap2 is not None:
                raise ValueError(
                    "fmap2 without fmap1 is not supported — pass both "
                    "(chunked precompute) or only fmap1 (streaming)"
                )
            # feature encoder over both frames in one batched pass
            if fmt1 is None:
                fmt1 = fmt_of(image1)
            fmt2 = fmt_of(image2)
            fmaps = fnet(
                jnp.concatenate([fmt1, fmt2], axis=0), train,
                preformatted=True, planar=planar,
            )
            fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        elif fmap2 is None:
            fmt2 = fmt_of(image2)
            fmap2 = fnet(fmt2, train, preformatted=True, planar=planar)
        corr_nlanes = self.corr_nlanes and test_mode
        if corr_nlanes:
            from atdn_vslam_tpu.ops.corr_lookup_nlanes import (
                build_corr_pyramid_nlanes,
            )

            pyramid = tuple(
                build_corr_pyramid_nlanes(
                    fmap1, fmap2, self.corr_levels, dtype=self.dtype
                )
            )
        else:
            pyramid = tuple(
                build_corr_pyramid(
                    fmap1, fmap2, self.corr_levels, dtype=self.dtype,
                    use_pallas=self.use_pallas,
                )
            )

        # context encoder + attention projections; consumes the shared
        # per-frame stem format (in streaming, image1's format comes
        # from the previous step's cache — zero stem layout cost here)
        if fmt1 is None:
            fmt1 = fmt_of(image1)
        cnet = BasicEncoder(
            self.hidden_dim + self.context_dim, "batch", dtype=self.dtype
        )(fmt1, train, preformatted=True, planar=planar)
        net, inp = jnp.split(cnet, [self.hidden_dim], axis=-1)
        net = jnp.tanh(net)
        inp = jax.nn.relu(inp)
        q, k, bias = AttentionQK(
            self.heads, 128, dtype=self.dtype,
            position_only=self.position_only,
            position_and_content=self.position_and_content,
        )(inp)

        # The attention scores are iteration-invariant (q/k come from
        # the context image; only v changes each update). Below the
        # materialization bound, softmax once and reuse the (N, N)
        # probabilities for all iterations — 12 P@V reads beat 12
        # QK^T+softmax recomputes (ops/attention.py). use_pallas=True
        # forces the streaming flash path instead.
        n_tokens = q.shape[-2]
        if self.use_pallas is not True and (
            n_tokens <= _MATERIALIZE_MAX_TOKENS
        ):
            # materialized directly in the scan-loop layout (BH, H, W,
            # N): a (N, N) probs matrix handed to the scan re-tiles
            # ~105 MB every iteration (see ops/attention.py)
            probs = attention_probs_spatial(
                q, k, inp.shape[1], inp.shape[2], scale=1.0, bias=bias,
                position_only=self.position_only,
                use_pallas=self.use_pallas,
                mesh=self.spatial_mesh, axis=self.spatial_axis,
            )
            q = k = bias = None
        else:
            probs = None

        b, h8, w8, _ = net.shape
        coords0 = coords_grid(h8, w8)[None]
        coords1 = jnp.broadcast_to(coords0, (b, h8, w8, 2))
        if flow_init is not None:
            coords1 = coords1 + flow_init

        upsample_in_scan = not test_mode
        step = _UpdateStep(
            self.corr_radius,
            self.hidden_dim,
            self.heads,
            self.dtype,
            self.use_pallas,
            upsample_in_scan,
            self.position_only,
            spatial_mesh=self.spatial_mesh,
            spatial_axis=self.spatial_axis,
            corr_nlanes=corr_nlanes,
            name="update",
        )
        carry = (net, coords1)

        # SepConvGRU contributions of the iteration-invariant context
        # features, hoisted out of the scan (exact — conv linearity;
        # saves ~25% of the GRU conv FLOPs per iteration)
        gru_static = step(
            carry, inp, q, k, bias, probs, pyramid, gru_static_only=True
        )

        # all ``iters`` steps run inside ONE scan; in test mode the
        # mask head then runs once on the final carry (same module
        # instance -> shared params, flax function-scan pattern).
        def body(mdl, carry, inp, q, k, bias, probs, pyramid, gru_static):
            return mdl(carry, inp, q, k, bias, probs, pyramid, gru_static)

        if self.remat:
            # prevent_cse=False: inside lax.scan the loop already
            # blocks the problematic CSE, and the default barriers
            # would block fusions in the hot update loop
            body = nn.remat(body, prevent_cse=False)
        scan = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast, nn.broadcast, nn.broadcast,
                     nn.broadcast),
            out_axes=0,
            length=self.iters,
            unroll=self.scan_unroll,
        )
        carry, outs = scan(
            step, carry, inp, q, k, bias, probs, pyramid, gru_static
        )
        net, coords1 = carry

        flow_low = coords1 - coords0
        if test_mode:
            final_mask = step(
                carry, inp, q, k, bias, probs, pyramid, mask_only=True
            )
            flow_up = convex_upsample(
                flow_low, final_mask.astype(jnp.float32)
            )
            if return_features:
                return (flow_low, flow_up), (fmap2, fmt2)
            return flow_low, flow_up
        return outs
