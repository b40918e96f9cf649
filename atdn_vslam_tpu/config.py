"""Typed configuration tree.

Replaces the reference's two-tier config (unsafe ``yaml.Loader``
python-object deserialization in atdn_vslam/utils/arguments.py:25-33 and
the hardcoded ``GMA_Parameters`` class in utils/gma_parameters.py:1-34)
with plain frozen dataclasses + a safe-YAML loader. No code execution,
every knob typed and documented.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass(frozen=True)
class FlowNetConfig:
    """GMA / RAFT flow-network knobs (ref: utils/gma_parameters.py:1-34,
    GMA/core/network.py:31-34)."""

    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    num_heads: int = 1
    iters: int = 12
    mixed_precision: bool = True  # bfloat16 compute path on TPU
    use_pallas_attention: bool = True
    checkpoint_path: str = ""


@dataclass(frozen=True)
class OdometryModelConfig:
    """ATDNVO knobs (ref: odometry/network.py:20-27)."""

    in_channels: int = 2
    compressor: bool = True
    use_dropout: bool = False
    use_layernorm: bool = False
    lstm_size: int = 512
    #: TRAINING-time conv-encoder compute dtype: "float32" (reference
    #: numerics) or "bfloat16" (TPU fast path — the 16-channel encoder
    #: activations pay 8x lane padding on every HBM byte; bf16 measured
    #: 139 -> 110 ms/step at the reference config, accuracy at seed
    #: noise on the synthetic harness — STATUS.md round 5). Inference
    #: always runs f32 (perf-neutral there, measured round 4).
    train_compute_dtype: str = "bfloat16"
    #: width-packed encoder convs (ops/wpack.py; exact up to f32
    #: summation order). Measured: train step 111 -> 89 ms/step on top
    #: of bf16; inference window 24.21 -> 23.87 ms/frame (41.3 -> 41.9
    #: fps) — STATUS.md round 5. TPU-only via the factory; applies to
    #: both training and inference builds.
    wpack: bool = True


@dataclass(frozen=True)
class MappingModelConfig:
    """MappingVAE knobs (ref: localization/network.py:10-23)."""

    variational: bool = False
    channels: tuple[int, ...] = (16, 16, 32, 64, 128, 128)
    latent_channels: int = 128
    #: "float32" (reference numerics) or "bfloat16" (TPU fast path —
    #: the full-res small-channel conv stacks are bandwidth-bound;
    #: round-5 chip numbers in STATUS.md). Params, batchnorm stats,
    #: and returned mu/latent/decoded stay f32 either way.
    compute_dtype: str = "bfloat16"
    #: width-packed encoder convs (ops/wpack.py; exact up to f32
    #: summation order, 209 -> 149 ms/step on top of bf16 at the
    #: reference config — STATUS.md round 5). TPU-only via the factory.
    wpack: bool = True


@dataclass(frozen=True)
class LossConfig:
    """CLVO loss knobs (ref: odometry/loss.py:9-22; README.md:53 uses
    alpha=1)."""

    alpha: float = 1.0
    w: int = 3
    delta: float = 1.0
    khi: float = 100.0


@dataclass(frozen=True)
class TrainConfig:
    """Odometry training loop knobs (ref: README.md:51-78,
    train_odometry.py:99-105)."""

    batch_size: int = 24
    sequence_length: int = 6
    epochs: int = 1
    lr: float = 1e-2
    wd: float = 1e-3
    epsilon: float = 1e-8
    eta_min: float = 1e-9
    stage: int = 1
    augment_flow: bool = True
    train_sequences: tuple[str, ...] = (
        "00", "01", "02", "03", "04", "06", "08", "09", "10",
    )
    seed: int = 4265664478


@dataclass(frozen=True)
class MappingTrainConfig:
    """Online map-building training knobs (ref: neural_slam.py:305-321)."""

    epochs: int = 50
    batch_size: int = 16
    lr: float = 1e-3
    wd: float = 1e-3
    eta_min: float = 1e-5
    seed: int = 0


@dataclass(frozen=True)
class SlamConfig:
    """Runtime knobs (ref: neural_slam.py:54,72-74)."""

    image_height: int = 376
    image_width: int = 1232
    rotation_threshold_deg: float = 10.0
    translation_threshold: float = 15.0
    max_keyframes: int = 4096  # static capacity of the array-backed store
    #: initialize each pair's GMA iterations from the previous pair's
    #: low-res flow, forward-warped to the new frame's pixel grid
    #: (ops/bilinear.py:forward_warp_flow — the jittable equivalent of
    #: the reference's forward_interpolate splat; disocclusion holes
    #: fall back to zero = per-pixel cold start). Video motion is
    #: temporally smooth, so the solver starts near the answer. The
    #: first pair starts from zero flow, which is exactly the
    #: cold-start behavior. The reference supports ``flow_init`` only
    #: in its Sintel evaluation warm start (GMA/evaluate.py:73-77),
    #: never in its SLAM loop.
    flow_warm_start: bool = False


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout (new capability; the reference is single-GPU,
    neural_slam.py:51). Axis sizes of -1 mean 'fill with remaining
    devices'."""

    data: int = -1
    model: int = 1


@dataclass(frozen=True)
class Config:
    data_path: str = "data"
    keyframes_path: str = "keyframes"
    checkpoint_dir: str = "checkpoints"
    log_dir: str = "log"
    flow: FlowNetConfig = field(default_factory=FlowNetConfig)
    odometry: OdometryModelConfig = field(default_factory=OdometryModelConfig)
    mapping: MappingModelConfig = field(default_factory=MappingModelConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mapping_train: MappingTrainConfig = field(default_factory=MappingTrainConfig)
    slam: SlamConfig = field(default_factory=SlamConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)


def _build(cls: type, raw: dict[str, Any]) -> Any:
    kwargs: dict[str, Any] = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in raw.items():
        if key not in fields:
            raise KeyError(f"Unknown config key {key!r} for {cls.__name__}")
        ftype = fields[key].type
        nested = {
            "flow": FlowNetConfig, "odometry": OdometryModelConfig,
            "mapping": MappingModelConfig, "loss": LossConfig,
            "train": TrainConfig, "mapping_train": MappingTrainConfig,
            "slam": SlamConfig, "mesh": MeshConfig,
        }
        if key in nested and isinstance(value, dict):
            kwargs[key] = _build(nested[key], value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            del ftype
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path: str | None = None) -> Config:
    """Load a config from safe YAML, or return defaults when no path given.

    Unlike the reference (arguments.py:31 ``yaml.load(..., yaml.Loader)``
    which executes arbitrary python object tags), this uses
    ``yaml.safe_load`` and typed construction.
    """
    if path is None:
        return Config()
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return _build(Config, raw)
