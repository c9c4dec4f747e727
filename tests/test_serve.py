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


def test_classify_stage_dtype_scores_close_to_f32(tmp_path):
    """Classifier(stage_dtype=bfloat16) transfers a compressed feature
    feed; decisions/scores track the exact-parity f32 feed within the
    input-rounding budget."""
    frames = 1 + (2 * RATE - 400) // 160
    model = models.create("dnn", (frames, 24), len(LABELS)).init()
    fc = {"type": "logmelspectrogram",
          "melspectrogram": {"num_mel_bins": 24}}
    paths = _wavs(tmp_path)
    ids = [f"u{i}" for i in range(4)]
    ref = serve.Classifier(model, LABELS, feature_config=fc).scores(
        paths, ids=ids)
    out = serve.Classifier(model, LABELS, feature_config=fc,
                           stage_dtype="bfloat16").scores(paths, ids=ids)
    assert list(out.index) == list(ref.index)
    np.testing.assert_allclose(np.stack(out.prediction.to_numpy()),
                               np.stack(ref.prediction.to_numpy()),
                               rtol=0.05, atol=0.05)


def test_classify_on_mesh_matches_single_device(tmp_path):
    """Classifier(mesh=...) serves batch-sharded over the device mesh and
    must produce the single-device scores."""
    from lidbox_tpu import parallel
    frames = 1 + (2 * RATE - 400) // 160
    model = models.create("xvector", (frames, 24), len(LABELS)).init()
    feature_config = {"type": "logmelspectrogram",
                      "melspectrogram": {"num_mel_bins": 24}}
    paths = _wavs(tmp_path, n=6)
    ids = [f"u{i}" for i in range(6)]
    single = serve.Classifier(model, LABELS, feature_config=feature_config,
                              batch_size=8).scores(paths, ids=ids)
    mesh = parallel.get_mesh()
    sharded = serve.Classifier(model, LABELS, feature_config=feature_config,
                               batch_size=8, mesh=mesh).scores(paths, ids=ids)
    for pid in ids:
        np.testing.assert_allclose(np.asarray(sharded.loc[pid].prediction),
                                   np.asarray(single.loc[pid].prediction),
                                   rtol=1e-4, atol=1e-5)


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


class TestStreamingClassifier:
    def _model(self, chunk_seconds=1.0):
        frames = 1 + (int(chunk_seconds * RATE) - 400) // 160
        return models.create("dnn", (frames, 24), len(LABELS)).init()

    def _config(self):
        return {"type": "logmelspectrogram",
                "melspectrogram": {"num_mel_bins": 24}}

    def test_streaming_equals_offline_chunking(self):
        """Feeding arbitrary block sizes must give exactly the mean of the
        per-chunk scores computed offline on the same chunk grid."""
        model = self._model()
        sc = serve.StreamingClassifier(model, LABELS,
                                       feature_config=self._config(),
                                       chunk_seconds=1.0, hop_seconds=0.5)
        sig = testutil.noisy_sinewave(300, RATE, 0.1, 3.3, seed=7)
        # ragged feed: prime-ish block sizes
        pos, blocks = 0, (1234, 7000, 333, 20000, 12345, 60000)
        for b in blocks:
            sc.feed(sig[pos:pos + b])
            pos += b
        got = sc.scores()
        # offline oracle: same chunk grid, batch forward, mean
        chunk, hop = RATE, RATE // 2
        chunks = [sig[i:i + chunk] for i in range(0, sig.size - chunk + 1, hop)]
        feats = sc.extractor(np.stack(chunks), RATE)
        import jax
        ref = np.asarray(jax.device_get(model.apply(
            model.variables, feats, train=False))).mean(axis=0)
        assert sc._num_chunks == len(chunks)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
        assert sc.label() in LABELS

    def test_no_scores_before_first_chunk_and_reset(self):
        sc = serve.StreamingClassifier(self._model(), LABELS,
                                       feature_config=self._config(),
                                       chunk_seconds=1.0, hop_seconds=1.0)
        assert sc.feed(np.zeros(RATE // 2, np.float32)) is None
        assert sc.label() is None
        out = sc.feed(np.zeros(RATE, np.float32))
        assert out is not None and out.shape == (len(LABELS),)
        sc.reset()
        assert sc.scores() is None and sc._buffer.size == 0

    def test_streaming_language_vector_model_with_score_fn(self):
        """A headless AP model streams through score_fn: per-chunk [B, D]
        vectors become [B, N] scores (-theta) before the running mean, so
        scores()/label() work exactly like a classifier head."""
        from lidbox_tpu.losses import AngularProximity
        frames = 1 + (RATE - 400) // 160
        model = models.create("ap_lstm", (frames, 24), len(LABELS),
                              num_lstm_units=4).init()
        loss = AngularProximity(N=len(LABELS), D=16)
        sc = serve.StreamingClassifier(model, LABELS,
                                       feature_config=self._config(),
                                       chunk_seconds=1.0, hop_seconds=1.0,
                                       score_fn=loss.predict)
        sig = testutil.noisy_sinewave(300, RATE, 0.1, 2.0, seed=3)
        out = sc.feed(sig)
        assert out is not None and out.shape == (len(LABELS),)
        assert np.all(out <= 0.0)  # -theta scores over N classes, not D
        assert sc.label() in LABELS


def test_classify_pads_sub_chunk_utterances(tmp_path):
    """An input shorter than one chunk must still be scored (padded to one
    full chunk), not silently dropped from the output."""
    frames = 1 + (2 * RATE - 400) // 160
    model = models.create("dnn", (frames, 24), len(LABELS)).init()
    clf = serve.Classifier(model, LABELS,
                           feature_config={"type": "logmelspectrogram",
                                           "melspectrogram": {"num_mel_bins": 24}},
                           chunk_length_ms=2000, chunk_step_ms=1000)
    long_paths = _wavs(tmp_path, n=1, seconds=3.0)
    short = testutil.noisy_sinewave(150, RATE, 0.1, 1.2, seed=42)
    short_path = tmp_path / "short.wav"
    audio_io.write_mono_wav(short_path, short, RATE)
    out = clf.classify(long_paths + [str(short_path)], ids=["long", "short"])
    assert list(out.index) == ["long", "short"]
    assert out.loc["short", "label"] in LABELS


def test_classifier_forwards_full_feature_config(monkeypatch, tmp_path):
    """Every field of the serving feature_config must reach the device
    feature extractor (stft_method/precision/etc. were once dropped)."""
    from lidbox_tpu.data import steps as steps_mod
    seen = {}
    real = steps_mod.DeviceFeatureExtractor

    class Recording(real):
        def __init__(self, config):
            seen.update(dict(config))
            super().__init__(config)

    monkeypatch.setattr(steps_mod, "DeviceFeatureExtractor", Recording)
    frames = 1 + (2 * RATE - 400) // 160
    model = models.create("dnn", (frames, 24), len(LABELS)).init()
    clf = serve.Classifier(
        model, LABELS,
        feature_config={"type": "logmelspectrogram",
                        "melspectrogram": {"num_mel_bins": 24},
                        "stft_method": "matmul",
                        "precision": "highest",
                        "validate_finite": True})
    clf.scores(_wavs(tmp_path, n=1), ids=["u0"])
    assert seen["stft_method"] == "matmul"
    assert seen["precision"] == "highest"
    assert seen["validate_finite"] is True
    assert seen["melspectrogram"] == {"num_mel_bins": 24}


class TestStreamingFusedChunkProgram:
    def _config(self):
        return {"type": "logmelspectrogram",
                "melspectrogram": {"num_mel_bins": 24}}

    def test_fused_matches_two_step_path(self):
        """The single fused waveform->scores chunk program must reproduce
        the extractor->forward two-step path (same chunk grid, same
        scores) — one dispatch round per chunk instead of two."""
        frames = 1 + (RATE - 400) // 160
        model = models.create("dnn", (frames, 24), len(LABELS)).init()
        sig = testutil.noisy_sinewave(300, RATE, 0.1, 3.3, seed=11)
        fused = serve.StreamingClassifier(model, LABELS,
                                          feature_config=self._config(),
                                          chunk_seconds=1.0,
                                          hop_seconds=0.5)
        assert fused._fused_chunk is not None
        two_step = serve.StreamingClassifier(
            model, LABELS,
            feature_config={**self._config(), "validate_finite": True},
            chunk_seconds=1.0, hop_seconds=0.5)
        assert two_step._fused_chunk is None  # host finite-check path
        np.testing.assert_allclose(fused.feed(sig), two_step.feed(sig),
                                   rtol=1e-5, atol=1e-6)
        assert fused._num_chunks == two_step._num_chunks > 1

    def test_validate_finite_still_raises_in_streaming(self):
        """validate_finite keeps the host check: a NaN signal raises from
        feed() instead of silently scoring garbage."""
        frames = 1 + (RATE - 400) // 160
        model = models.create("dnn", (frames, 24), len(LABELS)).init()
        sc = serve.StreamingClassifier(
            model, LABELS,
            feature_config={**self._config(), "validate_finite": True},
            chunk_seconds=1.0, hop_seconds=1.0)
        import pytest
        bad = np.full(RATE, np.nan, np.float32)
        with pytest.raises(FloatingPointError):
            sc.feed(bad)
