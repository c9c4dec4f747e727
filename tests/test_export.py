"""
Model export tests: save/load round trip and StableHLO AOT export
(reference analogues: KerasWrapper.to_disk, the TF.js deployment shim).
"""
import numpy as np

import jax
import lidbox_tpu.models as models
from lidbox_tpu import export


def test_save_load_round_trip(tmp_path):
    model = models.create("xvector", (30, 20), 4).init()
    x = np.random.default_rng(0).normal(0, 1, (2, 30, 20)).astype(np.float32)
    ref = np.asarray(model(x))
    export.save_model(model, "xvector", str(tmp_path / "m"),
                      model_kwargs={"num_outputs": 4})
    loaded = export.load_model(str(tmp_path / "m"))
    out = np.asarray(loaded(x))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_save_load_embedding_extractor(tmp_path):
    from lidbox_tpu.models.model_api import as_embedding_extractor
    model = as_embedding_extractor(models.create("xvector", (30, 20), 4).init())
    export.save_model(model, "xvector", str(tmp_path / "m"),
                      model_kwargs={"num_outputs": 4})
    loaded = export.load_model(str(tmp_path / "m"))
    out = np.asarray(loaded(np.zeros((1, 30, 20), np.float32)))
    assert out.shape == (1, 512)


def test_stablehlo_export_round_trip(tmp_path):
    model = models.create("dnn", (10, 8), 3).init()
    x = np.random.default_rng(1).normal(0, 1, (2, 10, 8)).astype(np.float32)
    ref = np.asarray(model(x))
    path = export.export_stablehlo(model, str(tmp_path), batch_size=2)
    fn = export.load_stablehlo(path)
    out = np.asarray(fn(x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_stablehlo_symbolic_batch_serves_any_batch_size(tmp_path):
    # default export: ONE artifact, symbolic batch dim
    model = models.create("xvector", (30, 20), 4).init()
    path = export.export_stablehlo(model, str(tmp_path))
    fn = export.load_stablehlo(path)
    rng = np.random.default_rng(2)
    for b in (1, 3, 8):
        x = rng.normal(0, 1, (b, 30, 20)).astype(np.float32)
        ref = np.asarray(model(x))
        np.testing.assert_allclose(np.asarray(fn(x)), ref,
                                   rtol=1e-5, atol=1e-6)


def test_stablehlo_multi_platform_artifact(tmp_path):
    # cross-platform lowering: the artifact embeds a TPU lowering built on
    # this CPU-only host plus the CPU lowering we can actually execute
    model = models.create("dnn", (10, 8), 3).init()
    x = np.random.default_rng(3).normal(0, 1, (2, 10, 8)).astype(np.float32)
    ref = np.asarray(model(x))
    path = export.export_stablehlo(model, str(tmp_path), batch_size=2,
                                   platforms=("cpu", "tpu"))
    out = np.asarray(export.load_stablehlo(path)(x))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_stablehlo_symbolic_time_dim(tmp_path):
    """A model declared with a variable (None) time dimension must export
    an artifact accepting ANY time length, not the init-time dummy."""
    model = models.create("dnn", (None, 8), 3).init()
    path = export.export_stablehlo(model, str(tmp_path))
    fn = export.load_stablehlo(path)
    rng = np.random.default_rng(4)
    for b, t in ((2, 10), (3, 57)):
        x = rng.normal(0, 1, (b, t, 8)).astype(np.float32)
        ref = np.asarray(model(x))
        np.testing.assert_allclose(np.asarray(fn(x)), ref,
                                   rtol=1e-5, atol=1e-6)
