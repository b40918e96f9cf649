"""Model builders from config — the single place that maps Config to
model hyperparameters, so training, evaluation, and the SLAM runtime
always construct structurally identical networks (a checkpoint trained
with non-default knobs must restore everywhere)."""

from __future__ import annotations

import jax.numpy as jnp

from atdn_vslam_tpu.config import Config
from atdn_vslam_tpu.models.flow.network import RAFTGMA
from atdn_vslam_tpu.models.mapping import MappingVAE
from atdn_vslam_tpu.models.odometry import ATDNVO
from atdn_vslam_tpu.utils.platform import is_tpu


def build_odometry_model(
    config: Config, training: bool = False, on_tpu: bool | None = None
) -> ATDNVO:
    """``training=True`` engages the bf16 encoder compute path on TPU
    (OdometryModelConfig.train_compute_dtype; 139 -> 110 ms/step at
    the reference config). Inference builds stay f32 — the streaming
    window measured bf16 perf-neutral there (round 4), so reference
    numerics are kept. Compute dtype does not change the parameter
    structure: checkpoints restore across both."""
    if on_tpu is None:
        on_tpu = is_tpu()
    c = config.odometry
    return ATDNVO(
        in_channels=c.in_channels,
        compressor=c.compressor,
        use_dropout=c.use_dropout,
        use_layernorm=c.use_layernorm,
        lstm_size=c.lstm_size,
        compute_dtype=(
            jnp.bfloat16
            if (training and c.train_compute_dtype == "bfloat16" and on_tpu)
            else None
        ),
        wpack=bool(c.wpack and on_tpu),
    )


def build_flow_model(config: Config, on_tpu: bool | None = None) -> RAFTGMA:
    if on_tpu is None:
        on_tpu = is_tpu()
    c = config.flow
    return RAFTGMA(
        iters=c.iters,
        corr_levels=c.corr_levels,
        corr_radius=c.corr_radius,
        hidden_dim=c.hidden_dim,
        context_dim=c.context_dim,
        heads=c.num_heads,
        dtype=jnp.bfloat16 if (c.mixed_precision and on_tpu) else jnp.float32,
        use_pallas=None if (on_tpu and c.use_pallas_attention) else False,
    )


def build_mapping_model(
    config: Config, on_tpu: bool | None = None
) -> MappingVAE:
    if on_tpu is None:
        on_tpu = is_tpu()
    c = config.mapping
    return MappingVAE(
        variational=c.variational,
        channels=c.channels,
        latent_channels=c.latent_channels,
        # bf16 compute only where it pays (TPU); CPU tests/hosts keep
        # f32 (same policy as the flow net's mixed_precision knob)
        dtype=(
            jnp.bfloat16
            if (c.compute_dtype == "bfloat16" and on_tpu)
            else None
        ),
        wpack=bool(c.wpack and on_tpu),
    )
