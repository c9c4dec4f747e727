"""
Flax model zoo with the reference's per-module contract:
``create(input_shape, num_outputs, **kw) -> Model`` and optional
``as_embedding_extractor(model)`` (reference: lidbox/models/, SURVEY.md §2.5).

Models are resolved by key exactly as the reference resolves
``lidbox.models.<key>`` with importlib
(reference: lidbox/models/keras_utils.py:130-134).
"""
import importlib

MODEL_KEYS = (
    "ap_lstm",
    "bi_gru",
    "clstm",
    "cnn",
    "convnet_extractor",
    "crnn",
    "dnn",
    "lstm",
    "multilevel_attention",
    "spherespeaker",
    "xvector",
    "xvector_2d",
    "xvector_extended",
    "xvector_freq_attention",
)


def get_module(key):
    """Import the model module for a config key."""
    if key not in MODEL_KEYS:
        raise KeyError(f"unknown model key {key!r}; valid: {MODEL_KEYS}")
    return importlib.import_module(f"lidbox_tpu.models.{key}")


def create(key, input_shape, num_outputs, **kwargs):
    """Build a model by registry key."""
    # num_outputs passed by keyword: ap_lstm has no classifier head and its
    # second positional parameter is num_lstm_units (reference ap_lstm.py:23).
    return get_module(key).create(input_shape, num_outputs=num_outputs, **kwargs)


def as_embedding_extractor(key, model):
    """Apply the module's embedding-extractor transform (falls back to the
    generic pre-activation-output transform)."""
    mod = get_module(key)
    if hasattr(mod, "as_embedding_extractor"):
        return mod.as_embedding_extractor(model)
    from .model_api import as_embedding_extractor as _gen
    return _gen(model)
