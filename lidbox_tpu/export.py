"""
Model persistence and deployment export.

Maps two reference surfaces:
- ``KerasWrapper.to_disk`` whole-model saving (reference:
  lidbox/models/keras_utils.py:182-185),
- the TF.js stats-pooling shim for browser deployment of trained
  x-vectors (reference: lidbox/models/xvector_stats_pooling.js) — whose
  TPU-era analogue is portable ahead-of-time export: ``export_stablehlo``
  serializes the jitted forward as StableHLO via jax.export, loadable by
  any PJRT runtime without Python model code.
"""
import json
import os

import jax
import jax.numpy as jnp
from flax import serialization

import lidbox_tpu.models as model_registry
from lidbox_tpu import get_logger

logger = get_logger("export")

SPEC_NAME = "model.json"
WEIGHTS_NAME = "variables.msgpack"
STABLEHLO_NAME = "forward.stablehlo"


def save_model(model, model_key, directory, model_kwargs=None):
    """Save a Model (architecture spec + weights) to a directory."""
    os.makedirs(directory, exist_ok=True)
    if model.variables is None:
        model.init()
    spec = {
        "model_key": model_key,
        "input_shape": list(model.input_shape),
        "name": model.name,
        "output": model.output,
        "kwargs": model_kwargs or {},
    }
    with open(os.path.join(directory, SPEC_NAME), "w", encoding="utf-8") as f:
        json.dump(spec, f, indent=2)
    with open(os.path.join(directory, WEIGHTS_NAME), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(model.variables)))
    logger.info("Saved model '%s' to %s", model_key, directory)
    return directory


def load_model(directory, num_outputs=None):
    """Rebuild a saved Model with its weights."""
    with open(os.path.join(directory, SPEC_NAME), encoding="utf-8") as f:
        spec = json.load(f)
    kwargs = dict(spec.get("kwargs", {}))
    if num_outputs is None:
        num_outputs = kwargs.pop("num_outputs", None)
    else:
        kwargs.pop("num_outputs", None)
    model = model_registry.create(spec["model_key"],
                                  tuple(spec["input_shape"]),
                                  num_outputs, **kwargs)
    model.init()
    with open(os.path.join(directory, WEIGHTS_NAME), "rb") as f:
        model.variables = serialization.from_bytes(model.variables, f.read())
    if spec.get("output") and spec["output"] != "logits":
        model = model.with_output(spec["output"])
    return model


def export_stablehlo(model, directory, batch_size=None, platforms=None):
    """AOT-export the inference forward as serialized StableHLO.

    The artifact is runnable by any PJRT plugin (TPU, CPU, GPU) or by
    jax.export.deserialize — the deployment analogue of the reference's
    tfjs-converter path (SURVEY.md §2: "its TPU-era analogue is simply
    model export").

    ``batch_size=None`` (default) exports a SYMBOLIC batch dimension: one
    artifact serves every batch size (jax.export shape polymorphism).
    Pass a concrete int for models whose lowering needs a static batch.
    ``platforms`` (e.g. ``("tpu", "cpu")``) embeds lowerings for several
    backends in one artifact, so the same file deploys to a TPU serving
    fleet and a CPU canary."""
    from jax import export as jax_export

    if model.variables is None:
        model.init()
    variables = model.variables
    output = model.output
    kwargs_apply = dict(model.apply_kwargs)
    kwargs_apply["output"] = output

    def forward(x):
        return model.module.apply(variables, x, train=False, **kwargs_apply)

    # every None (variable) input dim gets its own symbolic dimension —
    # freezing them to the init-time dummy would export an artifact that
    # only accepts that one shape. All symbolic dims must share ONE
    # symbolic_shape call (one scope), batch included.
    sym_names = ([] if batch_size is not None else ["b"]) + [
        f"d{i}" for i, d in enumerate(model.input_shape) if d is None]
    syms = dict(zip(sym_names, jax_export.symbolic_shape(
        ",".join(sym_names)))) if sym_names else {}
    shape = tuple(syms[f"d{i}"] if d is None else d
                  for i, d in enumerate(model.input_shape))
    b = syms["b"] if batch_size is None else int(batch_size)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    try:
        exported = jax_export.export(jax.jit(forward), **kwargs)(
            jax.ShapeDtypeStruct((b,) + shape, jnp.float32))
    except Exception as e:
        if batch_size is None:
            raise RuntimeError(
                f"symbolic-batch export failed ({type(e).__name__}: {e}) — "
                f"this model's lowering may need a static batch; retry "
                f"with export_stablehlo(..., batch_size=N)") from e
        raise
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, STABLEHLO_NAME)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    logger.info(
        "Exported StableHLO forward to %s (batch %s, platforms %s)", path,
        "symbolic" if batch_size is None else b,
        ",".join(kwargs.get("platforms", (jax.default_backend(),))))
    return path


def load_stablehlo(path):
    """Deserialize an exported forward into a callable."""
    from jax import export as jax_export
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
