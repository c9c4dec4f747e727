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
    rates = np.asarray(cm, np.float64)
    n = len(label_names)
    assert rates.shape == (n, n), (
        f"confusion matrix shape {rates.shape} must match {n} labels")
    rates = rates / np.maximum(rates.sum(axis=1, keepdims=True), 1e-12)
    fig, ax = plt.subplots(figsize=(4, 4))
    image = ax.imshow(rates, interpolation="nearest",
                      cmap=cmap or plt.cm.Blues)
    if not no_legend:
        fig.colorbar(image, ax=ax)
    ticks = np.arange(n)
    ax.set_xticks(ticks, labels=label_names, rotation=45, ha="right",
                  rotation_mode="anchor")
    ax.set_yticks(ticks, labels=label_names)
    # row 0 on top (true labels read downward like a table)
    ax.set_xlim(-0.5, n - 0.5)
    ax.set_ylim(n - 0.5, -0.5)
    ax.set_title(title)
    ax.set_ylabel("True label")
    ax.set_xlabel("Predicted label")
    # annotate every cell, flipping to white text once the fill is darker
    # than the colormap's midpoint
    midpoint = rates.max() / 2.0
    for (row, col), rate in np.ndenumerate(rates):
        ax.text(col, row, f"{rate:.2f}", ha="center", va="center",
                color="white" if rate > midpoint else "black")
    fig.tight_layout()
    return fig, ax


def _require_seaborn():
    if sns is None:
        raise ImportError(
            "seaborn is required for the distribution plots "
            "(plot_sample_distribution / plot_duration_distribution)")


def _categorical_plot_kwargs(metadata):
    """Shared seaborn kwargs: one bar group per split, colored by label,
    both in sorted order so figures are stable across pandas versions."""
    splits = sorted(set(metadata["split"]))
    labels = sorted(set(metadata["label"]))
    return dict(data=metadata, x="split", order=splits,
                hue="label", hue_order=labels)


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
