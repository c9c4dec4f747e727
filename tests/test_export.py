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
