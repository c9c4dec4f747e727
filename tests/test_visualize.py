"""
Visualization smoke tests (headless Agg backend)
(reference layer: lidbox/visualize.py — untested in the reference).
"""
import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from lidbox_tpu import visualize


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    import matplotlib.pyplot as plt
    plt.close("all")


def test_confusion_matrix():
    cm = np.array([[8, 1, 1], [2, 7, 1], [0, 0, 10]])
    fig, ax = visualize.draw_confusion_matrix(cm, ["aa", "bb", "cc"], title="t")
    assert fig is not None
    # cells are annotated with row-normalized values
    texts = [t.get_text() for t in ax.texts]
    assert "0.80" in texts and "1.00" in texts


def test_confusion_matrix_shape_mismatch_raises():
    with pytest.raises(AssertionError):
        visualize.draw_confusion_matrix(np.eye(2), ["a", "b", "c"])


def test_distribution_plots():
    meta = pd.DataFrame({
        "split": ["train", "train", "test", "test"],
        "label": ["fi", "sv", "fi", "sv"],
        "duration": [1.0, 2.0, 1.5, 2.5]})
    assert visualize.plot_sample_distribution(meta) is not None
    fig1, fig2 = visualize.plot_duration_distribution(meta)
    assert fig1 is not None and fig2 is not None


def test_signal_and_feature_plots():
    rng = np.random.default_rng(0)
    assert visualize.plot_signal(rng.normal(0, 1, 1000)) is not None
    assert visualize.plot_spectrogram(rng.normal(0, 1, (100, 40))) is not None
    assert visualize.plot_cepstra(rng.normal(0, 1, (100, 12))) is not None
    assert visualize.plot_embedding_vector(rng.normal(0, 1, 256)) is not None


def test_3d_pca_scatter():
    rng = np.random.default_rng(0)
    data = rng.normal(0, 1, (30, 3))
    labels = ["a"] * 15 + ["b"] * 15
    fig, ax = visualize.draw_3d_pca_scatterplot(data, labels)
    assert fig is not None


def test_distribution_plots_raise_cleanly_without_seaborn(monkeypatch):
    """With seaborn absent the module imports, and the two plots that need
    it raise an informative ImportError instead of AttributeError."""
    import pandas as pd
    import pytest
    from lidbox_tpu import visualize
    monkeypatch.setattr(visualize, "sns", None)
    meta = pd.DataFrame({"split": ["train"], "label": ["aa"],
                         "duration": [1.0]})
    with pytest.raises(ImportError, match="seaborn"):
        visualize.plot_sample_distribution(meta)
    with pytest.raises(ImportError, match="seaborn"):
        visualize.plot_duration_distribution(meta)
