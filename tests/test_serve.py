"""
Inference service tests: wav files -> language decisions, with and without
chunk merging.
"""
import numpy as np

import lidbox_tpu.models as models
from lidbox_tpu import serve, testutil
from lidbox_tpu.features import io as audio_io

RATE = 16000
LABELS = ["aa", "bb", "cc"]


def _wavs(tmp_path, n=4, seconds=2.0):
    paths = []
    for i in range(n):
        sig = testutil.noisy_sinewave(150 * (i % 3 + 1), RATE, 0.1, seconds,
                                      seed=i)
        p = tmp_path / f"u{i}.wav"
        audio_io.write_mono_wav(p, sig, RATE)
        paths.append(str(p))
    return paths


def test_classify_whole_utterances(tmp_path):
    frames = 1 + (2 * RATE - 400) // 160
    model = models.create("dnn", (frames, 24), len(LABELS)).init()
    clf = serve.Classifier(model, LABELS,
                           feature_config={"type": "logmelspectrogram",
                                           "melspectrogram": {"num_mel_bins": 24}})
    paths = _wavs(tmp_path)
    out = clf.classify(paths, ids=[f"u{i}" for i in range(4)])
    assert list(out.index) == [f"u{i}" for i in range(4)]
    assert set(out.label) <= set(LABELS)
    scores = out[[f"score_{l}" for l in LABELS]].to_numpy()
    np.testing.assert_allclose(np.exp(scores).sum(axis=1), 1.0, rtol=1e-4)


def test_classify_with_chunking_merges_to_utterances(tmp_path):
    frames = 1 + (RATE - 400) // 160
    model = models.create("dnn", (frames, 24), len(LABELS)).init()
    clf = serve.Classifier(model, LABELS,
                           feature_config={"type": "logmelspectrogram",
                                           "melspectrogram": {"num_mel_bins": 24}},
                           chunk_length_ms=1000, chunk_step_ms=500)
    paths = _wavs(tmp_path, n=3, seconds=2.0)
    out = clf.scores(paths, ids=["a", "b", "c"])
    assert list(out.index) == ["a", "b", "c"]  # chunks merged back
    assert out.prediction.iloc[0].shape == (len(LABELS),)
