"""
Visualization helpers: confusion matrices, dataset distributions,
signal/feature/embedding heatmaps, PCA scatter
(reference: lidbox/visualize.py).

All functions return the matplotlib figure (instead of calling plt.show())
so they compose in notebooks and headless pipelines alike.
"""
import numpy as np
import pandas as pd

try:
    import seaborn as sns
    sns.set(rc={})
except ImportError:  # pragma: no cover - seaborn is present in CI images
    sns = None

import matplotlib.pyplot as plt


def draw_confusion_matrix(cm, label_names, title="", cmap=None, no_legend=True):
    """Row-normalized confusion matrix heatmap with per-cell annotations
    (reference: visualize.py:12-45)."""
    cmap = cmap or plt.cm.Blues
    num_labels = len(label_names)
    cm = np.array(cm, dtype=np.float32)
    assert cm.shape[0] == cm.shape[1] == num_labels, (
        f"confusion matrix shape {cm.shape} must match {num_labels} labels")
    cm /= np.maximum(cm.sum(axis=1, keepdims=True), 1e-12)
    fig, ax = plt.subplots(figsize=(4, 4))
    im = ax.imshow(cm, interpolation="nearest", cmap=cmap)
    if not no_legend:
        ax.figure.colorbar(im, ax=ax)
    ax.set(xticks=np.arange(num_labels), yticks=np.arange(num_labels),
           xlim=(-0.5, num_labels - 0.5), ylim=(num_labels - 0.5, -0.5),
           xticklabels=label_names, yticklabels=label_names,
           title=title, ylabel="True label", xlabel="Predicted label")
    plt.setp(ax.get_xticklabels(), rotation=45, ha="right",
             rotation_mode="anchor")
    thresh = cm.max() / 2.0
    for row in range(num_labels):
        for col in range(num_labels):
            ax.text(col, row, format(cm[row, col], ".2f"),
                    ha="center", va="center",
                    color="white" if cm[row, col] > thresh else "black")
    fig.tight_layout()
    return fig, ax


def _require_seaborn():
    if sns is None:
        raise ImportError(
            "seaborn is required for the distribution plots "
            "(plot_sample_distribution / plot_duration_distribution)")


def _categorical_plot_kwargs(metadata):
    return {"data": metadata, "x": "split",
            "order": sorted(metadata.split.unique()),
            "hue": "label", "hue_order": sorted(metadata.label.unique())}


def plot_sample_distribution(metadata):
    """Sample counts per split/label (reference: visualize.py:60-63)."""
    _require_seaborn()
    ax = sns.countplot(**_categorical_plot_kwargs(metadata))
    ax.set_title("Total amount of samples")
    return ax.get_figure()


def plot_duration_distribution(metadata, figsize=(8, 6)):
    """Median and total audio duration per split/label
    (reference: visualize.py:66-78)."""
    _require_seaborn()
    kwargs = _categorical_plot_kwargs(metadata)
    fig1, ax1 = plt.subplots(figsize=figsize)
    sns.boxplot(**kwargs, y="duration", ax=ax1)
    ax1.set_title("Median audio file duration in seconds")
    fig2, ax2 = plt.subplots(figsize=figsize)
    sns.barplot(**kwargs, y="duration", errorbar=None, estimator=np.sum, ax=ax2)
    ax2.set_title("Total amount of audio in seconds")
    return fig1, fig2


def plot_signal(signal, figsize=(6, 0.5), **kwargs):
    """(reference: visualize.py:81-86)"""
    fig, ax = plt.subplots(figsize=figsize)
    ax.plot(np.asarray(signal), lw=0.1, **kwargs)
    ax.set_axis_off()
    ax.margins(0)
    return fig


def plot_spectrogram(S, cmap="viridis", figsize=None, ax=None):
    """Feature matrix as a heatmap, frequency upward
    (reference: visualize.py:89-97)."""
    S = np.asarray(S)
    if figsize is None:
        figsize = (max(S.shape[0] / 50, 1), max(S.shape[1] / 50, 1))
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    else:
        fig = ax.get_figure()
    ax.imshow(S.T, origin="lower", aspect="auto", cmap=cmap)
    ax.set_axis_off()
    ax.margins(0)
    return fig


def plot_cepstra(X, figsize=None):
    """(reference: visualize.py:99-102)"""
    X = np.asarray(X)
    if not figsize:
        figsize = (max(X.shape[0] / 50, 1), max(X.shape[1] / 20, 1))
    return plot_spectrogram(X, cmap="RdBu_r", figsize=figsize)


def plot_embedding_vector(v, cmap="RdBu_r", figsize=None):
    """(reference: visualize.py:105-115)"""
    v = np.asarray(v)
    if figsize is None:
        figsize = (max(v.size / 100, 1), 1)
    fig, ax = plt.subplots(figsize=figsize)
    ax.imshow(v[None, :], aspect="auto", cmap=cmap)
    ax.set_axis_off()
    ax.margins(0)
    return fig


def draw_3d_pca_scatterplot(pca_data_3d, data_labels):
    """(reference: visualize.py:118-133)"""
    df = pd.DataFrame.from_dict({
        "x": pca_data_3d[:, 0], "y": pca_data_3d[:, 1],
        "z": pca_data_3d[:, 2], "label": data_labels})
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")
    for label, group in df.groupby("label"):
        ax.scatter(group.x, group.y, group.z, label=label)
    ax.legend()
    return fig, ax
