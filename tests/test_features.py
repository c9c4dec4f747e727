"""
Normalization + feature-dispatcher tests
(reference: tests/test_features.py; dispatcher at lidbox/data/tf_utils.py:166-195).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import lidbox_tpu.features as F
from lidbox_tpu import testutil

RATE = 16000


def _features(batch=3, t=200, f=40, scale=5.0, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0, scale, (batch, t, f)).astype(np.float32)


class TestNormalization:
    def test_cmn(self):
        X = _features()
        out = np.asarray(F.cmn(jnp.asarray(X)))
        np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)
        np.testing.assert_allclose(out, X - X.mean(axis=1, keepdims=True), rtol=1e-5, atol=1e-5)

    def test_cmvn(self):
        X = _features()
        out = np.asarray(F.cmvn(jnp.asarray(X)))
        expected = (X - X.mean(axis=1, keepdims=True)) / X.std(axis=1, keepdims=True)
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)

    def test_cmvn_zero_variance_gives_zeros(self):
        X = np.ones((2, 10, 4), np.float32)
        out = np.asarray(F.cmvn(jnp.asarray(X)))
        np.testing.assert_array_equal(out, 0.0)

    def test_cmvn_masked_matches_unpadded(self):
        X = _features(batch=1, t=100)
        Xp = np.pad(X, [(0, 0), (0, 37), (0, 0)])
        mask = (np.arange(137) < 100)[None, :, None]
        out = np.asarray(F.cmvn_masked(jnp.asarray(Xp), jnp.asarray(mask)))
        ref = np.asarray(F.cmvn(jnp.asarray(X)))
        np.testing.assert_allclose(out[:, :100], ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(out[:, 100:], 0.0)

    def test_feature_scaling(self):
        X = _features()
        out = np.asarray(F.feature_scaling(jnp.asarray(X), -1.0, 1.0, axis=1))
        np.testing.assert_allclose(out.min(axis=1), -1.0, atol=1e-5)
        np.testing.assert_allclose(out.max(axis=1), 1.0, atol=1e-5)

    @pytest.mark.parametrize("window_len", [8, 15, 32])
    @pytest.mark.parametrize("normalize_variance", [True, False])
    def test_window_normalization_matches_frame_oracle(self, window_len, normalize_variance):
        """Oracle: materialized sliding windows with reflect padding, the
        reference's formulation (lidbox/features/__init__.py:35-67)."""
        X = _features(batch=2, t=50, f=8)
        out = np.asarray(F.window_normalization(
            jnp.asarray(X), window_len=window_len, normalize_variance=normalize_variance))
        pad_l = window_len // 2
        pad_r = window_len // 2 - 1 + (window_len & 1)
        Xp = np.pad(X, [(0, 0), (pad_l, pad_r), (0, 0)], mode="reflect")
        T = X.shape[1]
        windows = np.stack([Xp[:, i:i + window_len] for i in range(T)], axis=1)
        expected = X - windows.mean(axis=2)
        if normalize_variance:
            std = windows.std(axis=2)
            expected = np.divide(expected, std, out=np.zeros_like(expected), where=std != 0)
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-3)

    def test_window_normalization_whole_tensor_fallback(self):
        X = _features(t=20)
        out = np.asarray(F.window_normalization(jnp.asarray(X), window_len=50))
        ref = np.asarray(F.cmvn(jnp.asarray(X)))
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestExtractFeatures:
    def _signals(self, batch=2):
        return np.stack([testutil.noisy_sinewave(150 * (i + 1), RATE, 0.1, 1.0, seed=i)
                         for i in range(batch)])

    @pytest.mark.parametrize("ftype,channels", [
        ("spectrogram", 257),
        ("db_spectrogram", 257),
        ("melspectrogram", 40),
        ("logmelspectrogram", 40),
        ("mfcc", 12),
    ])
    def test_types_shapes_finite(self, ftype, channels):
        x = jnp.asarray(self._signals())
        X = np.asarray(F.extract_features(
            x, RATE, feature_type=ftype,
            melspectrogram={"num_mel_bins": 40, "fmin": 20.0, "fmax": 7000.0}))
        assert X.shape[0] == 2 and X.shape[2] == channels
        assert np.all(np.isfinite(X))

    def test_minmax_and_window_norm_options(self):
        x = jnp.asarray(self._signals())
        X = np.asarray(F.extract_features(
            x, RATE, feature_type="logmelspectrogram",
            melspectrogram={"num_mel_bins": 40},
            sample_minmax_scaling={"min": 0.0, "max": 1.0}))
        assert X.min() >= -1e-5 and X.max() <= 1 + 1e-5
        Xw = np.asarray(F.extract_features(
            x, RATE, feature_type="logmelspectrogram",
            melspectrogram={"num_mel_bins": 40},
            window_normalization={"window_len": 30}))
        assert np.all(np.isfinite(Xw))

    def test_matmul_stft_path_close_to_fft(self):
        x = jnp.asarray(self._signals())
        a = np.asarray(F.extract_features(x, RATE, feature_type="logmelspectrogram",
                                          stft_method="fft"))
        b = np.asarray(F.extract_features(x, RATE, feature_type="logmelspectrogram",
                                          stft_method="matmul"))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    def test_frame_mask_from_lengths(self):
        mask = np.asarray(F.frame_mask_from_lengths(
            jnp.asarray([400, 560, 1000]), num_frames=4, frame_length=400, frame_step=160))
        np.testing.assert_array_equal(mask, [
            [True, False, False, False],
            [True, True, False, False],
            [True, True, True, True]])

    def test_num_non_finite(self):
        X = np.zeros((2, 3), np.float32)
        X[0, 0] = np.nan
        X[1, 2] = np.inf
        assert int(F.num_non_finite(jnp.asarray(X))) == 2


class TestMaskedStatsParity:
    """Padded-bucket stats must reproduce unpadded numerics exactly
    (ADVICE r1: ragged paths computed per-sample stats over padding)."""

    def test_feature_scaling_masked_matches_per_row(self):
        rng = np.random.default_rng(1)
        T, Fdim = 60, 8
        lengths = [60, 37, 12]
        X = np.zeros((3, T, Fdim), np.float32)
        rows = [rng.normal(0, 3, (n, Fdim)).astype(np.float32) for n in lengths]
        for i, r in enumerate(rows):
            X[i, :len(r)] = r
        mask = (np.arange(T)[None, :] < np.asarray(lengths)[:, None])[..., None]
        out = np.asarray(F.feature_scaling_masked(jnp.asarray(X), -1.0, 1.0,
                                                  jnp.asarray(mask)))
        for i, r in enumerate(rows):
            ref = np.asarray(F.feature_scaling(
                jnp.asarray(r[None]), -1.0, 1.0,
                axis=tuple(range(1, r[None].ndim))))
            np.testing.assert_allclose(out[i, :len(r)], ref[0], rtol=1e-5,
                                       atol=1e-5)
            np.testing.assert_array_equal(out[i, len(r):], 0.0)

    @pytest.mark.parametrize("normalize_variance", [True, False])
    def test_window_normalization_masked_matches_per_row(self, normalize_variance):
        """Rows longer than the window take the reflect-padded sliding path;
        rows shorter fall back to whole-row CMVN — both per-row exact."""
        rng = np.random.default_rng(2)
        T, Fdim, window = 64, 6, 16
        lengths = [64, 40, 17, 16, 9]  # includes the n == window boundary
        X = np.zeros((len(lengths), T, Fdim), np.float32)
        rows = [rng.normal(0, 2, (n, Fdim)).astype(np.float32) for n in lengths]
        for i, r in enumerate(rows):
            X[i, :len(r)] = r
        out = np.asarray(F.window_normalization_masked(
            jnp.asarray(X), jnp.asarray(lengths, jnp.int32),
            window_len=window, normalize_variance=normalize_variance))
        for i, r in enumerate(rows):
            ref = np.asarray(F.window_normalization(
                jnp.asarray(r[None]), window_len=window,
                normalize_variance=normalize_variance))
            np.testing.assert_allclose(out[i, :len(r)], ref[0], rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_array_equal(out[i, len(r):], 0.0)

    def test_extract_features_with_lengths_matches_unpadded(self):
        """Full dispatcher on a zero-padded batch with lengths == each
        signal extracted alone, for configs with per-sample stats."""
        sig_lens = [int(RATE * s) for s in (1.0, 0.61, 0.33)]
        signals = [testutil.noisy_sinewave(200 + 100 * i, RATE, 0.1, 1.0,
                                           seed=i)[:n]
                   for i, n in enumerate(sig_lens)]
        T = max(sig_lens)
        batch = np.zeros((len(signals), T), np.float32)
        for i, s in enumerate(signals):
            batch[i, :len(s)] = s
        kwargs = dict(feature_type="logmelspectrogram",
                      melspectrogram={"num_mel_bins": 40},
                      sample_minmax_scaling={"min": 0.0, "max": 1.0},
                      window_normalization={"window_len": 20})
        out = np.asarray(F.extract_features(
            jnp.asarray(batch), RATE, lengths=jnp.asarray(sig_lens), **kwargs))
        for i, s in enumerate(signals):
            ref = np.asarray(F.extract_features(jnp.asarray(s[None]), RATE,
                                                **kwargs))
            nf = ref.shape[1]
            np.testing.assert_allclose(out[i, :nf], ref[0], rtol=1e-4,
                                       atol=1e-4)
            np.testing.assert_array_equal(out[i, nf:], 0.0)

    def test_extract_ragged_with_stats_matches_unpadded(self):
        from lidbox_tpu.data.device_pipeline import DeviceFeatureExtractor
        config = {"type": "logmelspectrogram",
                  "melspectrogram": {"num_mel_bins": 32},
                  "sample_minmax_scaling": {"min": 0.0, "max": 1.0},
                  "window_normalization": {"window_len": 24}}
        ex = DeviceFeatureExtractor(config)
        signals = [testutil.noisy_sinewave(150 * (i + 1), RATE, 0.1, 1.0,
                                           seed=i)[:n]
                   for i, n in enumerate((16000, 9777, 4000))]
        ragged = ex.extract_ragged(signals, RATE)
        for s, got in zip(signals, ragged):
            ref = ex(s[None], RATE)[0]
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestWindowNormalizationNumpy:
    def test_interior_matches_jit_version_and_fallback(self):
        X = _features(batch=2, t=40, f=6)
        w = 8
        host = F.window_normalization_numpy(X, window_len=w)
        dev = np.asarray(F.window_normalization(jnp.asarray(X), window_len=w))
        # interior frames (full windows, no boundary handling difference)
        np.testing.assert_allclose(host[:, w:-w], dev[:, w:-w], rtol=1e-3,
                                   atol=1e-4)
        assert np.all(np.isfinite(host))
        # whole-tensor fallback == cmvn
        np.testing.assert_allclose(
            F.window_normalization_numpy(X, window_len=100),
            np.asarray(F.cmvn(jnp.asarray(X))), rtol=1e-4, atol=1e-4)
