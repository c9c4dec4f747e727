"""
High-level API + embedding back-end tests
(reference layers: lidbox/util.py, lidbox/embed/ — untested in the
reference; added per SURVEY.md §4).
"""
import numpy as np
import pandas as pd
import pytest

import lidbox_tpu.models as models
from lidbox_tpu import util
from lidbox_tpu.data import Dataset
from lidbox_tpu.embed import PLDA
from lidbox_tpu.embed import sklearn_utils as backend

N = 3


def _embeddings(n_per_class=60, dim=20, sep=4.0, seed=0):
    """Synthetic class-separable embeddings."""
    rng = np.random.default_rng(seed)
    X, y = [], []
    for k in range(N):
        mean = np.zeros(dim)
        mean[k] = sep
        X.append(rng.normal(mean, 1.0, (n_per_class, dim)))
        y.append(np.full(n_per_class, k))
    return np.concatenate(X).astype(np.float64), np.concatenate(y)


class TestPLDA:
    def test_fit_predict_separable(self):
        X, y = _embeddings()
        Xt, yt = _embeddings(seed=1)
        plda = PLDA().fit(X, y)
        pred, log_proba = plda.predict(Xt)
        assert (pred == yt).mean() > 0.9
        np.testing.assert_allclose(np.exp(log_proba).sum(axis=1), 1.0, rtol=1e-6)

    def test_transform_reduces_to_informative_dims(self):
        X, y = _embeddings()
        plda = PLDA().fit(X, y)
        U = plda.transform(X)
        assert U.shape[0] == len(X)
        assert 1 <= U.shape[1] <= X.shape[1]
        assert plda.get_dimensionality("U_model") == U.shape[1]

    def test_pca_preprocessing(self):
        X, y = _embeddings(dim=30)
        plda = PLDA().fit(X, y, n_components=10)
        assert plda.get_dimensionality("X") == 10
        assert "PCA preprocessing with 10" in str(plda)

    def test_degenerate_two_classes(self):
        rng = np.random.default_rng(0)
        X = rng.normal(0, 1, (40, 5))
        X[:20, 0] += 3
        y = np.array([0] * 20 + [1] * 20)
        plda = PLDA().fit(X, y)
        pred, _ = plda.predict(X)
        assert (pred == y).mean() > 0.9


class TestBackendPipeline:
    def test_fit_classifier_and_predict(self, tmp_path):
        import sklearn.naive_bayes
        X, y = _embeddings()
        Xt, yt = _embeddings(seed=1)
        train = {"X": X.copy(), "y": y}
        test = {"X": Xt.copy(), "y": yt}
        config = {"sklearn_experiment": {"cache_directory": str(tmp_path),
                                         "model": {"key": "xvector"},
                                         "name": "demo"}}
        target2label = {0: "aa", 1: "bb", 2: "cc"}
        pipeline = backend.fit_classifier(
            train, test, list(target2label.values()), config, target2label,
            sklearn.naive_bayes.GaussianNB, plot_demo=False)
        assert set(pipeline) == {"scaler", "dim_reducer", "classifier"}
        preds = backend.predict_with_trained_classifier(
            {"X": _embeddings(seed=2)[0]}, config, target2label, pipeline)
        assert preds.shape == (180, N)
        assert preds.min() >= -100
        acc = (preds.argmax(1) == _embeddings(seed=2)[1]).mean()
        assert acc > 0.9

        # joblib persistence round trip (reference sklearn_utils.py:255-277)
        backend.pipeline_to_disk(config, pipeline)
        loaded = backend.pipeline_from_disk(config)
        assert set(loaded) == set(pipeline)
        preds2 = backend.predict_with_trained_classifier(
            {"X": _embeddings(seed=2)[0]}, config, target2label, loaded)
        np.testing.assert_allclose(preds, preds2)

    def test_lda_and_gridsearch(self):
        X, y = _embeddings()
        train = {"X": X, "y": y}
        test = {"X": _embeddings(seed=1)[0], "y": _embeddings(seed=1)[1]}
        lda = backend.fit_lda(train, test)
        acc, cce = backend.get_lda_scores(lda, test)
        assert acc > 0.9 and cce < 1.0
        plda = backend.fit_plda_gridsearch(
            {"X": X.copy(), "y": y}, dict(test), grid=[5, 10])
        assert plda is not None

    def test_plot_demo_writes_figures(self, tmp_path):
        import sklearn.naive_bayes
        X, y = _embeddings(n_per_class=30, dim=10)
        train = {"X": X.copy(), "y": y}
        test = {"X": X.copy(), "y": y}
        config = {"sklearn_experiment": {"cache_directory": str(tmp_path),
                                         "model": {"key": "xvector"},
                                         "name": "demo"}}
        target2label = {0: "aa", 1: "bb", 2: "cc"}
        backend.fit_classifier(train, test, list(target2label.values()),
                               config, target2label,
                               sklearn.naive_bayes.GaussianNB, plot_demo=True)
        figs = list((tmp_path / "xvector" / "demo" / "figures").rglob("*.png"))
        assert len(figs) >= 4


class TestUtil:
    def test_merge_chunk_predictions(self):
        df = util.predictions_to_dataframe(
            ["utt1-000001", "utt1-000002", "utt2-000001"],
            [np.array([1.0, 0.0]), np.array([0.0, 1.0]), np.array([1.0, 1.0])])
        merged = util.merge_chunk_predictions(df)
        assert list(merged.index) == ["utt1", "utt2"]
        np.testing.assert_allclose(merged.loc["utt1"].prediction, [0.5, 0.5])

    def test_classification_report(self):
        rng = np.random.default_rng(0)
        true = rng.integers(0, N, 300)
        pred = np.full((300, N), -5.0)
        pred[np.arange(300), true] = -0.1
        noise_idx = rng.choice(300, 30, replace=False)
        pred[noise_idx] = rng.normal(-3, 1, (30, N))
        label2target = {"aa": 0, "bb": 1, "cc": 2}
        report = util.classification_report(true, pred, label2target)
        assert report["accuracy"] > 0.85
        assert 0 <= report["avg_detection_cost"] <= 1
        assert 0 <= report["avg_equal_error_rate"] <= 0.5
        assert report["confusion_matrix"].shape == (N, N)
        for label in label2target:
            assert "equal_error_rate" in report[label]

    def test_classification_report_absent_class_keeps_matrix_shape(self):
        """A class absent from both true and predicted labels must not
        shrink the confusion matrix (sklearn shrinks without labels=,
        silently shifting rows to the wrong language)."""
        true = np.array([0, 1, 1, 0])
        pred = np.full((4, N), -5.0)
        pred[np.arange(4), true] = -0.1  # class 2 never appears
        label2target = {"aa": 0, "bb": 1, "cc": 2}
        report = util.classification_report(true, pred, label2target)
        assert report["confusion_matrix"].shape == (N, N)
        assert report["confusion_matrix"][2].sum() == 0

    def test_predict_with_model_and_evaluate(self):
        rng = np.random.default_rng(0)
        model = models.create("dnn", (10, 4), N).init()
        elems = [{"id": f"utt{i:02d}",
                  "input": rng.normal(0, 1, (10, 4)).astype(np.float32),
                  "target": np.int32(i % N)}
                 for i in range(12)]
        ds = Dataset.from_elements(elems)
        df = util.predict_with_model(model, ds, batch_size=5)
        assert len(df) == 12
        assert df.loc["utt00"].prediction.shape == (N,)

        test_meta = pd.DataFrame(
            {"target": [i % N for i in range(12)]},
            index=[f"utt{i:02d}" for i in range(12)])
        report = util.evaluate_testset_with_model(
            model, ds, test_meta, {"aa": 0, "bb": 1, "cc": 2})
        assert "accuracy" in report

    def test_batch_predict_fn_stage_dtype(self):
        """stage_dtype=bfloat16 halves the inference feed bytes; outputs
        differ from the f32 feed only by input rounding. Integer stage
        dtypes are a waveform-path feature and must be rejected."""
        import pytest
        from lidbox_tpu import parallel
        rng = np.random.default_rng(4)
        model = models.create("dnn", (10, 4), N).init()
        x = rng.normal(0, 1, (8, 10, 4)).astype(np.float32)
        ref = util.make_batch_predict_fn(model)(x)
        for mesh in (None, parallel.get_mesh()):
            out = util.make_batch_predict_fn(
                model, batch_size=8, mesh=mesh, stage_dtype="bfloat16")(x)
            np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)
        with pytest.raises(ValueError, match="stage_dtype must be floating"):
            util.make_batch_predict_fn(model, stage_dtype="int16")

    def test_model2function(self):
        model = models.create("dnn", (10, 4), N)
        fn = util.model2function(model)
        out = fn(np.zeros((2, 10, 4), np.float32))
        assert out.shape == (2, N)

    def test_model2function_embedding_extractor(self):
        """The exported function must honor the Model's configured head:
        an embedding extractor exports embeddings, not logits."""
        from lidbox_tpu.models.model_api import as_embedding_extractor
        model = as_embedding_extractor(
            models.create("xvector", (30, 20), N).init())
        fn = util.model2function(model)
        out = fn(np.zeros((2, 30, 20), np.float32))
        assert out.shape == (2, 512)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(model(np.zeros((2, 30, 20),
                                                       np.float32))),
            rtol=1e-6, atol=1e-6)

    def test_standard_scaler(self):
        rng = np.random.default_rng(0)
        elems = [{"input": rng.normal(5, 3, (20, 4)).astype(np.float32)}
                 for _ in range(10)]
        ds = Dataset.from_elements(elems)
        scale = util.standard_scaler(ds)
        scaled = scale(ds).collect()
        allf = np.concatenate([x["input"] for x in scaled])
        np.testing.assert_allclose(allf.mean(axis=0), 0, atol=1e-2)
        np.testing.assert_allclose(allf.std(axis=0), 1, atol=1e-2)

    def test_predict_with_ragged_inputs(self):
        rng = np.random.default_rng(0)
        model = models.create("dnn", (None, 4), N).init()
        elems = [{"id": f"u{i}",
                  "input": rng.normal(0, 1, (8 + 3 * i, 4)).astype(np.float32)}
                 for i in range(4)]
        df = util.predict_with_model(model, Dataset.from_elements(elems),
                                     batch_size=4)
        assert len(df) == 4

    def test_predict_with_model_mesh_matches_single_device(self):
        """Mesh-sharded inference (params replicated, batch sharded,
        ragged tail zero-padded to one compiled shape) must reproduce the
        single-device predictions, including masked ragged batches."""
        from lidbox_tpu import parallel
        rng = np.random.default_rng(5)
        mesh = parallel.get_mesh()
        model = models.create("xvector", (None, 8), N).init()
        elems = [{"id": f"u{i:02d}",
                  "input": rng.normal(0, 1, (20 + 7 * (i % 3), 8)
                                      ).astype(np.float32)}
                 for i in range(11)]  # 11 rows: ragged + partial last batch
        ds = Dataset.from_elements(elems)
        df_single = util.predict_with_model(ds=ds, model=model, batch_size=8)
        df_mesh = util.predict_with_model(ds=ds, model=model, batch_size=8,
                                          mesh=mesh)
        assert list(df_single.index) == list(df_mesh.index)
        for pid in df_single.index:
            np.testing.assert_allclose(df_mesh.loc[pid].prediction,
                                       df_single.loc[pid].prediction,
                                       rtol=1e-4, atol=1e-5)

    def test_predict_ragged_masked_matches_per_utterance(self):
        """Padded ragged prediction must equal each utterance predicted
        alone — the mask keeps stats pooling off padding frames (ADVICE r1)."""
        rng = np.random.default_rng(3)
        model = models.create("xvector", (None, 8), N).init()
        elems = [{"id": f"u{i}",
                  "input": rng.normal(0, 1, (20 + 11 * i, 8)).astype(np.float32)}
                 for i in range(4)]
        df = util.predict_with_model(model, Dataset.from_elements(elems),
                                     batch_size=4)
        for e in elems:
            alone = np.asarray(model.apply(
                model.variables, e["input"][None], train=False))[0]
            np.testing.assert_allclose(df.loc[e["id"]].prediction, alone,
                                       rtol=1e-4, atol=1e-5)
