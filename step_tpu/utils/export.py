"""AOT export of compiled inference programs for serving.

Reference parity: none — the reference deploys by shipping the Python repo
plus a checkpoint (``test.py``/``demo.py`` (recon)). On TPU the natural
serving artifact is the *compiled program itself*: ``jax.export`` lowers a
jitted ``detect_clip`` to versioned StableHLO, which a serving process
(JAX, C++ PJRT, or IFRT) can load and run without the model-building
Python, with no retrace/recompile risk and a frozen numeric contract.

The params stay separate (an orbax checkpoint) and are passed at call
time, so one exported program serves any fine-tune of the same config.

Usage:
    blob = export_detect_fn(cfg, batch_size=8)        # bytes
    Path("detect.stablehlo").write_bytes(blob)
    # serving side:
    run = load_detect_fn(Path("detect.stablehlo").read_bytes())
    out = run(variables, rgb, proposals, prop_mask)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jax_export

from step_tpu.config import StepConfig
from step_tpu.models.detector import STEPDetector


def _detect_arg_specs(cfg: StepConfig, batch_size: int):
    T = cfg.total_frames
    S = cfg.image_size
    P = cfg.max_proposals
    # Primary-input channel count follows the stream: RGB detectors take
    # 3-channel frames, flow-stream detectors (late-fusion protocol) take
    # 2-channel [-1,1] flow.
    C_in = 3 if cfg.input_stream == "rgb" else 2
    # Wire dtype follows cfg.uint8_transfer (the default): quantized frames
    # over the host->device link — 4x less PCIe/relay bandwidth — with
    # device_preprocess/_flow normalizing ON DEVICE inside the program
    # (models/detector.py). This matches the train/eval loaders' wire
    # format (data/pipeline.py::rgb_to_uint8_wire, the int8 flow wire), so
    # served pixels are bit-identical to evaluated pixels. Set
    # uint8_transfer=False for a float32-input program.
    if cfg.uint8_transfer:
        in_dtype = jnp.uint8 if cfg.input_stream == "rgb" else jnp.int8
    else:
        in_dtype = jnp.float32
    return (
        jax.ShapeDtypeStruct((batch_size, T, S, S, C_in), in_dtype),
        jax.ShapeDtypeStruct((batch_size, P, T, 4), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, P), jnp.float32),
    )


def export_detect_fn(
    cfg: StepConfig,
    batch_size: int,
    variables=None,
    model: Optional[STEPDetector] = None,
    platforms: Optional[list] = None,
) -> bytes:
    """Serialize the jitted detect program to portable bytes.

    `variables` supplies the param/batch-stat *structure* (shapes/dtypes
    only — values are not baked in). When omitted it is derived by
    `jax.eval_shape` of `model.init`, which traces but never allocates.
    `platforms` optionally pins lowering targets (e.g. ["tpu", "cpu"]);
    default is the current backend.
    """
    from step_tpu.inference import detect_clip

    if cfg.two_stream:
        raise ValueError(
            "export_detect_fn supports single-stream detectors only "
            "(input_stream='rgb' or 'flow'); two_stream=True programs take "
            "a second flow input — export each stream separately and fuse "
            "scores at serving time (detect_clip_late_fusion protocol)."
        )
    # Portability: Pallas kernels lower to backend-specific custom calls
    # (Mosaic on TPU) and their `interpret` mode is chosen at trace time
    # from the EXPORT host's backend — either way the artifact would not be
    # portable across platforms. Force the pure-XLA lowerings.
    cfg = cfg.replace(nms_impl="scan",
                      roi_impl="kron" if cfg.roi_impl == "pallas" else cfg.roi_impl)
    model = model or STEPDetector(cfg)
    rgb_s, prop_s, mask_s = _detect_arg_specs(cfg, batch_size)
    if variables is None:
        variables = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jax.ShapeDtypeStruct((1,) + rgb_s.shape[1:], rgb_s.dtype),
            jax.ShapeDtypeStruct((1,) + prop_s.shape[1:], prop_s.dtype),
            None,  # flow — only two_stream models (rejected above) take one
        )
    var_specs = jax.tree.map(
        lambda v: jax.ShapeDtypeStruct(v.shape, v.dtype), variables
    )

    fn = jax.jit(lambda v, r, p, m: detect_clip(v, r, p, m, cfg, model))
    kwargs = {"platforms": platforms} if platforms else {}
    exported = jax_export.export(fn, **kwargs)(var_specs, rgb_s, prop_s, mask_s)
    return bytes(exported.serialize())   # serialize() returns a bytearray


def _as_exported(blob):
    """bytes -> Exported (pass an already-deserialized Exported through:
    serve.py needs both the callable and the input specs and should pay
    the StableHLO deserialization once, not once per helper)."""
    return jax_export.deserialize(blob) if isinstance(blob, bytes) else blob


def load_detect_fn(blob):
    """Deserialize an exported detect program (bytes or Exported) into a
    callable ``(variables, rgb, proposals, prop_mask) -> detections dict``."""
    return jax.jit(_as_exported(blob).call)


def detect_fn_input_specs(blob):
    """(rgb, proposals, prop_mask) avals of an exported detect program
    (bytes or Exported).

    The wire dtype is frozen into the artifact at export time
    (`_detect_arg_specs` follows cfg.uint8_transfer), so a serving process
    can check its config's wire format against the blob BEFORE the first
    batch instead of surfacing an opaque dtype error mid-serve."""
    exported = _as_exported(blob)
    args, _kwargs = jax.tree.unflatten(exported.in_tree, exported.in_avals)
    _variables, rgb, props, mask = args
    return rgb, props, mask
