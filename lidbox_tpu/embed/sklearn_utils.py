"""
Embedding back-end: scaler -> PLDA dimension reduction -> L2 normalize ->
classifier, with joblib persistence and demo plotting
(reference: lidbox/embed/sklearn_utils.py).

The PLDA is this package's own implementation (lidbox_tpu.embed.plda)
instead of the external ``plda`` dependency.
"""
import collections
import os

import joblib
import numpy as np
import sklearn.decomposition
import sklearn.discriminant_analysis
import sklearn.naive_bayes
import sklearn.preprocessing

from lidbox_tpu import get_logger
from lidbox_tpu.embed.plda import PLDA

logger = get_logger("embed.sklearn")


def _sparse_cce(y_true, log_pred):
    """Mean categorical cross entropy from log-probabilities (replaces the
    reference's tf.keras.losses call at sklearn_utils.py:108-109). Log
    probabilities are clamped at -100 like the reference's prediction path
    (sklearn_utils.py:243) so degenerate classifiers score finitely."""
    picked = np.maximum(
        log_pred[np.arange(len(y_true)), np.asarray(y_true, int)], -100.0)
    return float(-picked.mean())


def get_lda_scores(lda, test):
    """(accuracy, categorical crossentropy) of a fitted back-end on a test
    dict {"X", "y"} (reference: sklearn_utils.py:103-111)."""
    if isinstance(lda, PLDA):
        pred, log_pred = lda.predict(test["X"])
    else:
        pred = lda.predict(test["X"])
        log_pred = lda.predict_log_proba(test["X"])
    accuracy = float((pred == test["y"]).mean())
    return accuracy, _sparse_cce(test["y"], log_pred)


def fit_lda(train, test):
    """(reference: sklearn_utils.py:114-122)"""
    lda = sklearn.discriminant_analysis.LinearDiscriminantAnalysis()
    lda.fit(train["X"], train["y"])
    acc, cce = get_lda_scores(lda, test)
    logger.info("Fitted LDA: accuracy %.3f, crossentropy %.3f", acc, cce)
    return lda


def fit_plda(train, test, n_components=None):
    """(reference: sklearn_utils.py:125-137)"""
    plda = PLDA()
    plda.fit(train["X"], train["y"], n_components=n_components)
    acc, cce = get_lda_scores(plda, test)
    logger.info("Fitted %s: accuracy %.3f, crossentropy %.3f", plda, acc, cce)
    return plda


def fit_plda_gridsearch(train, test, grid):
    """Grid search over PCA component counts, selecting by test
    crossentropy (reference: sklearn_utils.py:140-149)."""
    best_plda, best_loss = None, float("inf")
    for n in grid:
        plda = fit_plda(train, test, n_components=n)
        _, cce = get_lda_scores(plda, test)
        if cce < best_loss:
            best_plda, best_loss = plda, cce
    return best_plda


def reduce_dimensions(train, test, dim_reducer):
    """(reference: sklearn_utils.py:152-159)"""
    train["X"] = dim_reducer.transform(train["X"])
    test["X"] = dim_reducer.transform(test["X"])


def draw_random_sample(train, test, labels, target2label, sample_size=100,
                       seed=0):
    """Per-label random embedding samples for the demo plots
    (reference: sklearn_utils.py:162-176)."""
    rng = np.random.default_rng(seed)
    label2sample = {}
    for split, data in (("train", train), ("test", test)):
        label2vecs = collections.defaultdict(list)
        for x, y in zip(data["X"], data["y"]):
            label2vecs[target2label[int(y)]].append(x)
        sampled = {}
        for l, vecs in label2vecs.items():
            vecs = np.stack(vecs)
            take = min(sample_size, len(vecs))
            sampled[l] = vecs[rng.choice(len(vecs), size=take, replace=False)]
        label2sample[split] = collections.OrderedDict(
            (l, sampled[l]) for l in sorted(labels) if l in sampled)
    return label2sample


def pca_scatterplot_by_label(label2sample, pca):
    """2D/3D PCA scatter of embeddings (reference: sklearn_utils.py:39-58)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    assert pca.n_components in (2, 3)
    cmap = plt.get_cmap("tab20").colors
    if pca.n_components == 2:
        fig, ax = plt.subplots(figsize=(12, 12))
        for (label, vecs), color in zip(label2sample.items(), cmap):
            v = pca.transform(vecs)
            ax.scatter(v[:, 0], v[:, 1], c=[color], label=label, s=60, alpha=0.7)
        ax.set_title("Embeddings in PLDA model space, 2-dim PCA")
    else:
        fig = plt.figure(figsize=(12, 12))
        ax = fig.add_subplot(projection="3d")
        for (label, vecs), color in zip(label2sample.items(), cmap):
            v = pca.transform(vecs)
            ax.scatter3D(v[:, 0], v[:, 1], zs=v[:, 2], c=[color], label=label,
                         s=60, alpha=0.7)
        ax.set_title("Embeddings in PLDA model space, 3-dim PCA")
    ax.legend()
    return fig


def plot_embedding_demo(data, target2label, label2sample, pca=None,
                        output_figure_dir=None):
    """Embedding heatmaps per label + optional PCA scatters, written as PNG
    (reference: sklearn_utils.py:61-100)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    labels = list(label2sample.keys())
    pixel_scaler = mcolors.Normalize(data["X"].min(), data["X"].max())
    fig, axes = plt.subplots(nrows=len(labels), ncols=1, figsize=(12, 12),
                             squeeze=False)
    im = None
    for (label, vecs), ax in zip(label2sample.items(), axes[:, 0]):
        ax.set_yticks([]); ax.set_xticks([])
        ax.set_title(label)
        im = ax.imshow(vecs, cmap="RdBu_r", norm=pixel_scaler, aspect="auto")
    if im is not None:
        fig.colorbar(im, ax=axes[:, 0].tolist())
    figs = {"embeddings-PLDA-model-space.png": fig}
    if pca:
        for dim_key, p in pca.items():
            figs[f"embeddings-PCA-{dim_key}.png"] = \
                pca_scatterplot_by_label(label2sample, p)
    if output_figure_dir is not None:
        os.makedirs(output_figure_dir, exist_ok=True)
        for name, f in figs.items():
            path = os.path.join(output_figure_dir, name)
            f.savefig(path, bbox_inches="tight", dpi=100)
            logger.info("Wrote embedding demo to '%s'", path)
        plt.close("all")
    return figs


def fit_classifier(train, test, labels, config, target2label, Classifier,
                   n_plda_coefs=None, plot_demo=True):
    """Full back-end: StandardScaler -> PLDA reduce -> L2 normalize ->
    classifier (e.g. GaussianNB) (reference: sklearn_utils.py:179-227).
    Mutates train/test dicts in place like the reference."""
    scaler = sklearn.preprocessing.StandardScaler()
    scaler.fit(train["X"])
    train["X"] = scaler.transform(train["X"])
    test["X"] = scaler.transform(test["X"])

    dim_reducer = fit_plda(train, test, n_components=n_plda_coefs)
    reduce_dimensions(train, test, dim_reducer)

    train["X"] = sklearn.preprocessing.normalize(train["X"])
    test["X"] = sklearn.preprocessing.normalize(test["X"])

    if plot_demo:
        # U_model has at most (num classes - 1) informative dims, so the
        # demo PCAs are clamped to what the reduced space can support.
        max_dim = min(train["X"].shape)
        pca = {key: sklearn.decomposition.PCA(n_components=n)
               for key, n in (("2D", 2), ("3D", 3)) if n <= max_dim}
        for p in pca.values():
            p.fit(train["X"])
        label2sample = draw_random_sample(train, test, labels, target2label)
        demo_dir = os.path.join(
            config["sklearn_experiment"]["cache_directory"],
            config["sklearn_experiment"]["model"]["key"],
            config["sklearn_experiment"]["name"],
            "figures")
        plot_embedding_demo(train, target2label, label2sample["train"], pca,
                            os.path.join(demo_dir, "train"))
        plot_embedding_demo(test, target2label, label2sample["test"], pca,
                            os.path.join(demo_dir, "test"))

    classifier = Classifier()
    classifier.fit(train["X"], train["y"])
    return {"scaler": scaler, "dim_reducer": dim_reducer,
            "classifier": classifier}


def predict_with_trained_classifier(unlabeled, config, target2label, pipeline):
    """Apply a fitted back-end to unlabeled embeddings; log-probs clamped at
    -100 (reference: sklearn_utils.py:230-244)."""
    X = unlabeled["X"]
    if "scaler" in pipeline:
        X = pipeline["scaler"].transform(X)
    if "dim_reducer" in pipeline:
        X = pipeline["dim_reducer"].transform(X)
    X = sklearn.preprocessing.normalize(X)
    predictions = pipeline["classifier"].predict_log_proba(X)
    return np.maximum(predictions, -100)


def joblib_dir_from_config(config):
    """(reference: sklearn_utils.py:247-252)"""
    return os.path.join(config["sklearn_experiment"]["cache_directory"],
                        config["sklearn_experiment"]["model"]["key"],
                        config["sklearn_experiment"]["name"],
                        "sklearn_objects")


def pipeline_to_disk(config, sklearn_objects):
    """(reference: sklearn_utils.py:255-262)"""
    joblib_dir = joblib_dir_from_config(config)
    os.makedirs(joblib_dir, exist_ok=True)
    for key, obj in sklearn_objects.items():
        joblib.dump(obj, os.path.join(joblib_dir, key + ".joblib"))
    return joblib_dir


def pipeline_from_disk(config):
    """(reference: sklearn_utils.py:265-277)"""
    joblib_dir = joblib_dir_from_config(config)
    if not os.path.isdir(joblib_dir):
        logger.error("Directory '%s' does not exist", joblib_dir)
        return {}
    out = {}
    for f in os.scandir(joblib_dir):
        if f.name.endswith(".joblib"):
            out[f.name.split(".joblib")[0]] = joblib.load(f.path)
    return out
