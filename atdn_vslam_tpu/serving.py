"""AOT export of the SLAM hot path for deployment and serving.

The reference "deploys" by shipping the Python sources plus torch
weight files and re-tracing at startup (ref: tutorial.md, stage
scripts). A TPU-native framework can do better: :mod:`jax.export`
serializes the lowered, shape-stable computation (StableHLO) together
with its calling convention, so a serving process can load and execute
the step without the model code, the flax class definitions, or even
the Python package — and the artifact can target several platforms
(``tpu`` + ``cpu``) at once.

Exports provided:

  * :func:`make_stream_step` — the streaming odometry step used by the
    bench and the SLAM runtime hot loop: one RGB frame in, flow +
    relative pose out, feature-map and LSTM state threaded through as
    explicit carries (one frame is feature-encoded exactly once).
  * :func:`export_stream_step` / :func:`save_stream_step` /
    :func:`load_exported` — AOT export with weights baked in as
    constants (a self-contained artifact) or left as runtime arguments
    for weight-hotswap serving.

The exported artifact is validated by a round-trip equality test
(tests/test_serving.py).
"""

from __future__ import annotations

import pathlib
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export

from atdn_vslam_tpu.geometry.se3 import pose_to_matrix


def make_stream_step(
    flow_model, odo_model, bake: tuple[Any, Any] | None = None
) -> Callable:
    """Build the streaming per-frame step function.

    Signature (with ``bake=None``)::

        step(flow_vars, odo_vars, im1, im2, fmap_prev, lstm_carry, pose)
            -> (pose, fmap2, lstm_carry, flow_up)

    ``fmap_prev`` is the feature map of ``im1`` from the previous call
    (each frame is encoded once — the streaming cache the reference
    lacks, GMA/core/network.py:86); ``pose`` is the accumulated 4x4
    world pose, updated by the predicted relative transform.

    With ``bake=(flow_vars, odo_vars)`` the variables are closed over
    so the exported artifact is self-contained.
    """

    def _step(flow_vars, odo_vars, im1, im2, fmap_prev, lstm_carry, pose):
        (_, flow), fmap2 = flow_model.apply(
            flow_vars, im1[None], im2[None], test_mode=True,
            fmap1=fmap_prev, return_features=True,
        )
        (rot, tr), lstm_carry = odo_model.apply(
            odo_vars, flow[:, None], lstm_carry
        )
        pose = pose @ pose_to_matrix(rot[0, 0], tr[0, 0])
        return pose, fmap2, lstm_carry, flow[0]

    if bake is None:
        return _step
    flow_vars, odo_vars = bake

    def _baked(im1, im2, fmap_prev, lstm_carry, pose):
        return _step(
            flow_vars, odo_vars, im1, im2, fmap_prev, lstm_carry, pose
        )

    return _baked


def encode_frame(flow_model, flow_vars, image: jax.Array) -> jax.Array:
    """Feature-encode one frame (bootstraps the streaming carry)."""
    return flow_model.apply(flow_vars, image[None], encode_only=True)


def export_stream_step(
    flow_model,
    odo_model,
    flow_vars,
    odo_vars,
    height: int,
    width: int,
    platforms: tuple[str, ...] | None = None,
    bake_weights: bool = True,
    disabled_checks: tuple | None = None,
) -> jax_export.Exported:
    """AOT-export the streaming step at a fixed frame size.

    :param platforms: lowering targets, e.g. ``("tpu", "cpu")``; None
        exports for the default backend only. NOTE: a multi-platform
        artifact requires a platform-portable graph — build the flow
        model with ``use_pallas=False`` (pure XLA) for ("tpu", "cpu");
        the Pallas-kernel graph lowers to a Mosaic custom call that
        only targets TPU.
    :param bake_weights: close the variables over the graph (self-
        contained artifact). ``False`` keeps them as call arguments so
        a serving process can hot-swap checkpoints.
    :param disabled_checks: optional ``jax.export.DisabledSafetyCheck``
        list — exporting the Pallas path needs
        ``DisabledSafetyCheck.custom_call("tpu_custom_call")`` (Mosaic
        kernels carry no cross-version stability guarantee).
    :return: a :class:`jax.export.Exported`; ``.serialize()`` yields
        the portable bytes.
    """
    fmap = jax.eval_shape(
        lambda im: flow_model.apply(flow_vars, im, encode_only=True),
        jax.ShapeDtypeStruct((1, height, width, 3), jnp.float32),
    )
    im_spec = jax.ShapeDtypeStruct((height, width, 3), jnp.float32)
    carry_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        odo_model.init_carry(1),
    )
    pose_spec = jax.ShapeDtypeStruct((4, 4), jnp.float32)
    # the frame cache is a (fmap, stem-format) pytree of specs
    fmap_spec = jax.tree.map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype), fmap
    )

    if bake_weights:
        fn = make_stream_step(flow_model, odo_model, (flow_vars, odo_vars))
        args = (im_spec, im_spec, fmap_spec, carry_spec, pose_spec)
    else:
        fn = make_stream_step(flow_model, odo_model)
        var_specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            (flow_vars, odo_vars),
        )
        args = (*var_specs, im_spec, im_spec, fmap_spec, carry_spec,
                pose_spec)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if disabled_checks is not None:
        kwargs["disabled_checks"] = tuple(disabled_checks)
    return jax_export.export(jax.jit(fn), **kwargs)(*args)


def export_encoder(
    flow_model,
    flow_vars,
    height: int,
    width: int,
    platforms: tuple[str, ...] | None = None,
    disabled_checks: tuple | None = None,
) -> jax_export.Exported:
    """AOT-export the frame feature encoder (weights baked).

    A serving process bootstraps the streaming carry by feature-
    encoding the FIRST frame; without this artifact it would need the
    model code and checkpoint just for that one call (round-5 serving
    measurement: rebuilding + jit-initing the models in-process cost
    more than the step compile itself). Signature:
    ``encode.call(image (H, W, 3) f32) -> frame cache pytree`` — the
    output feeds :func:`export_stream_step`'s ``fmap_prev`` argument.
    """

    def _encode(image):
        return flow_model.apply(
            flow_vars, image[None], encode_only=True
        )

    im_spec = jax.ShapeDtypeStruct((height, width, 3), jnp.float32)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if disabled_checks is not None:
        kwargs["disabled_checks"] = tuple(disabled_checks)
    return jax_export.export(jax.jit(_encode), **kwargs)(im_spec)


def zero_inputs_like(exported: jax_export.Exported, index: int):
    """Zero-filled pytree for ``exported.call`` positional argument
    ``index`` — serving uses this to build the initial LSTM carry
    without the model classes (the artifact's in_avals carry all
    shapes/dtypes)."""
    avals = jax.tree.unflatten(
        exported.in_tree, list(exported.in_avals)
    )[0][index]
    flat, tree = jax.tree.flatten(avals)
    zeros = [jnp.zeros(a.shape, a.dtype) for a in flat]
    return jax.tree.unflatten(tree, zeros)


def save_stream_step(exported: jax_export.Exported, path) -> None:
    """Write the serialized artifact to ``path``."""
    pathlib.Path(path).write_bytes(exported.serialize())


def load_exported(path, jit: bool = True):
    """Load a serialized artifact.

    The loaded object needs only jax — no model code, no flax classes,
    no checkpoint files (when exported with ``bake_weights=True``).

    :param jit: wrap ``.call`` in ``jax.jit`` (returns the wrapped
        callable as ``.call`` via a thin proxy). Calling the exported
        module UN-jitted compiles through a path that bypasses the
        persistent compilation cache — with the wrapper, a process
        that sets ``jax_compilation_cache_dir`` pays the full XLA
        compile only on the first-ever load on a machine (round-5
        measured numbers in STATUS.md).
    """
    exported = jax_export.deserialize(pathlib.Path(path).read_bytes())
    if not jit:
        return exported

    class _Loaded:
        """Proxy exposing ``call`` (jitted) + the raw Exported."""

        def __init__(self, exported):
            self.exported = exported
            self.call = jax.jit(exported.call)
            self.in_tree = exported.in_tree
            self.in_avals = exported.in_avals

    return _Loaded(exported)
