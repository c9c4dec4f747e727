"""
On-device augmentation + fused training pipeline tests
(BASELINE.json north star: augmentation inside the same XLA program as the
model step).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

import lidbox_tpu.models as models
from lidbox_tpu import testutil
from lidbox_tpu.data import on_device
from lidbox_tpu.features import audio
from lidbox_tpu.features import io as audio_io
from lidbox_tpu.losses import nll_loss
from lidbox_tpu.train.loop import Trainer

RATE = 16000


@pytest.fixture(scope="module")
def noise_bank(tmp_path_factory):
    root = tmp_path_factory.mktemp("noise")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        sig = testutil.peak_normalize_np(
            rng.uniform(-1, 1, RATE * (i + 1)).astype(np.float32))
        p = root / f"n{i}.wav"
        audio_io.write_mono_wav(p, sig, RATE)
        paths.append(str(p))
    return on_device.build_noise_bank(paths, RATE, max_seconds=2.0)


class TestNoiseBank:
    def test_bank_shapes(self, noise_bank):
        bank, lengths = noise_bank
        assert bank.shape == (3, 2 * RATE)
        np.testing.assert_array_equal(np.asarray(lengths),
                                      [RATE, 2 * RATE, 2 * RATE])

    def test_mix_changes_signal_at_requested_level(self, noise_bank):
        bank, lengths = noise_bank
        clean = jnp.asarray(np.stack(
            [testutil.sinewave(200 * (i + 1), RATE, 1.0) for i in range(4)]))
        mixed = on_device.mix_noise_from_bank(
            jax.random.PRNGKey(0), clean, bank, lengths, (10.0, 10.0))
        mixed = np.asarray(mixed)
        assert mixed.shape == clean.shape
        assert np.all(np.isfinite(mixed))
        assert not np.allclose(mixed, np.asarray(clean))
        # mixing is deterministic given the key
        mixed2 = np.asarray(on_device.mix_noise_from_bank(
            jax.random.PRNGKey(0), clean, bank, lengths, (10.0, 10.0)))
        np.testing.assert_array_equal(mixed, mixed2)

    def test_mix_matches_reference_mixer_for_known_draw(self, noise_bank):
        """The per-example mix is exactly audio.snr_mixer on the sliced
        noise clip."""
        bank, lengths = noise_bank
        clean = jnp.asarray(testutil.sinewave(300, RATE, 1.0))[None, :]
        key = jax.random.PRNGKey(1)
        mixed = np.asarray(on_device.mix_noise_from_bank(
            key, clean, bank, lengths, (15.0, 15.0)))[0]
        # reproduce the draw: random row + contiguous random-offset slice
        k_idx, k_snr, k_off = jax.random.split(key, 3)
        idx = int(jax.random.randint(k_idx, (1,), 0, 3)[0])
        bank_T = bank.shape[1]
        off = int(jax.random.randint(k_off, (1,), 0, bank_T - RATE + 1)[0])
        noise = np.asarray(bank)[idx][off:off + RATE]
        _, _, expected = audio.snr_mixer(clean[0], jnp.asarray(noise), 15.0)
        np.testing.assert_allclose(mixed, np.asarray(expected), rtol=1e-5,
                                   atol=1e-6)


class TestAugmentOps:
    def test_random_fir_matches_per_example_convolve(self):
        rng = np.random.default_rng(0)
        signals = jnp.asarray(rng.normal(0, 0.3, (3, 2000)).astype(np.float32))
        key = jax.random.PRNGKey(2)
        out = np.asarray(on_device.random_fir(key, signals, 10))
        firs = np.asarray(jax.random.normal(key, (3, 10), jnp.float32))
        for i in range(3):
            expected = np.convolve(np.pad(np.asarray(signals)[i], (9, 0)),
                                   firs[i], mode="valid")
            np.testing.assert_allclose(out[i], expected, rtol=1e-4, atol=1e-5)

    def test_spec_augment_masks_regions(self):
        feats = jnp.ones((2, 50, 32))
        out = np.asarray(on_device.spec_augment(
            jax.random.PRNGKey(0), feats, time_masks=2, time_width=10,
            freq_masks=1, freq_width=6, mask_value=0.0))
        assert out.shape == (2, 50, 32)
        assert (out == 0).any()
        assert (out == 1).sum() > out.size // 2  # most content survives

    def test_spec_augment_disabled_is_identity(self):
        feats = jnp.ones((1, 10, 8))
        out = on_device.spec_augment(jax.random.PRNGKey(0), feats,
                                     time_masks=0, freq_masks=0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))


class TestAugmentProb:
    """augment_prob gates the stochastic stages per example — the
    static-shape analogue of the reference's
    sample_from_datasets([original] + augmented) clean/augmented
    interleaving (reference: lidbox/data/steps.py:215-229)."""

    def _signals(self, n=16):
        return jnp.asarray(np.stack(
            [testutil.noisy_sinewave(150 * (i % 3 + 1), RATE, 0.05, 1.0,
                                     seed=i) for i in range(n)]))

    def _fn(self, prob, bank, lengths, speed=None):
        return on_device.make_augmented_feature_fn(
            RATE, {"type": "logmelspectrogram",
                   "melspectrogram": {"num_mel_bins": 24}},
            on_device.AugmentConfig(
                snr_range=(5.0, 15.0), fir_coefs=5, speed_range=speed,
                specaug_time_masks=1, specaug_freq_masks=1,
                augment_prob=prob),
            noise_bank=bank, noise_lengths=lengths)

    def test_prob_zero_matches_clean_chain(self, noise_bank):
        bank, bl = noise_bank
        signals = self._signals(8)
        clean_fn = on_device.make_augmented_feature_fn(
            RATE, {"type": "logmelspectrogram",
                   "melspectrogram": {"num_mel_bins": 24}},
            on_device.AugmentConfig(snr_range=None), noise_bank=None)
        key = jax.random.PRNGKey(3)
        gated = self._fn(0.0, bank, bl)(key, signals)
        clean = clean_fn(key, signals)
        np.testing.assert_array_equal(np.asarray(gated), np.asarray(clean))

    def test_prob_zero_matches_clean_with_lengths(self, noise_bank):
        bank, bl = noise_bank
        signals = self._signals(8)
        lengths = jnp.asarray([RATE - 117 * i for i in range(8)], jnp.int32)
        clean_fn = on_device.make_augmented_feature_fn(
            RATE, {"type": "logmelspectrogram",
                   "melspectrogram": {"num_mel_bins": 24}},
            on_device.AugmentConfig(snr_range=None), noise_bank=None)
        key = jax.random.PRNGKey(4)
        gf, gm = self._fn(0.0, bank, bl, speed=(0.9, 1.1))(
            key, signals, lengths)
        cf, cm = clean_fn(key, signals, lengths)
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(cm))
        np.testing.assert_array_equal(np.asarray(gf), np.asarray(cf))

    def test_prob_half_interleaves_exact_rows(self, noise_bank):
        bank, bl = noise_bank
        signals = self._signals(16)
        key = jax.random.PRNGKey(7)
        half = np.asarray(self._fn(0.5, bank, bl)(key, signals))
        aug = np.asarray(self._fn(1.0, bank, bl)(key, signals))
        clean = np.asarray(self._fn(0.0, bank, bl)(key, signals))
        is_clean = np.array([np.array_equal(half[i], clean[i])
                             for i in range(16)])
        is_aug = np.array([np.array_equal(half[i], aug[i])
                           for i in range(16)])
        assert np.all(is_clean | is_aug)   # every row is one or the other
        assert is_clean.any() and is_aug.any()  # and both occur

    def test_config_dict_parses_augment_prob(self):
        cfg = on_device.augment_config_from_dict(
            {"snr_range": [5, 20], "augment_prob": 0.5})
        assert cfg.augment_prob == 0.5
        assert on_device.augment_config_from_dict({}).augment_prob == 1.0
        with pytest.raises(ValueError, match="augment_prob"):
            on_device.augment_config_from_dict({"augment_prob": 5})


class TestFusedTrainStep:
    def test_one_program_trains(self, noise_bank):
        bank, lengths = noise_bank
        frames = 1 + (RATE - 400) // 160
        model = models.create("dnn", (frames, 24), 3)
        trainer = Trainer(model, optax.adam(1e-3), nll_loss)
        trainer.create_state()
        feature_fn = on_device.make_augmented_feature_fn(
            RATE, {"type": "logmelspectrogram",
                   "melspectrogram": {"num_mel_bins": 24}},
            on_device.AugmentConfig(snr_range=(5.0, 15.0), fir_coefs=5,
                                    specaug_time_masks=2, specaug_freq_masks=1),
            noise_bank=bank, noise_lengths=lengths)
        step = on_device.make_fused_train_step(trainer, feature_fn)

        rng = np.random.default_rng(0)
        signals = jnp.asarray(np.stack(
            [testutil.noisy_sinewave(150 * (i % 3 + 1), RATE, 0.1, 1.0, seed=i)
             for i in range(8)]))
        targets = jnp.asarray((np.arange(8) % 3).astype(np.int32))
        state = trainer.state
        losses = []
        for i in range(10):
            state, loss = step(state, signals, targets, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]  # learns even with augmentation
        assert int(jax.device_get(state.step)) == 10


def test_fit_signals_fused_path(noise_bank):
    bank, lengths = noise_bank
    frames = 1 + (RATE - 400) // 160
    model = models.create("dnn", (frames, 24), 3)
    trainer = Trainer(model, optax.adam(2e-3), nll_loss)
    feature_fn = on_device.make_augmented_feature_fn(
        RATE, {"type": "logmelspectrogram",
               "melspectrogram": {"num_mel_bins": 24}},
        on_device.AugmentConfig(snr_range=None), noise_bank=None)
    rng = np.random.default_rng(0)
    signals = np.stack([testutil.noisy_sinewave(150 * (i % 3 + 1), RATE, 0.1,
                                                1.0, seed=i) for i in range(12)])
    targets = (np.arange(12) % 3).astype(np.int32)
    batches = [(signals[:6], targets[:6]), (signals[6:], targets[6:])]
    history = on_device.fit_signals(trainer, feature_fn, batches, epochs=6,
                                    verbose=False)
    assert len(history) == 6
    assert history[-1] < history[0]


class TestVadAndResample:
    def test_energy_vad_compact_matches_remove_silence(self):
        """Batched compaction must reproduce audio.remove_silence per row
        (reference: lidbox/features/audio.py:332-353)."""
        tone = testutil.sinewave(200, RATE, 0.6)
        sig = np.concatenate([tone, np.zeros(RATE // 2, np.float32), tone])
        T = sig.size + 1600
        batch = np.zeros((2, T), np.float32)
        batch[0, :sig.size] = sig
        batch[1, :tone.size] = tone
        lengths = jnp.asarray([sig.size, tone.size], jnp.int32)
        out, new_lengths = on_device.energy_vad_compact_batch(
            jnp.asarray(batch), lengths, RATE, min_non_speech_ms=0)
        for i, raw in enumerate((sig, tone)):
            trimmed, keep = audio.remove_silence(jnp.asarray(raw), RATE,
                                                 min_non_speech_ms=0)
            keep = int(keep)
            assert int(new_lengths[i]) == keep
            np.testing.assert_allclose(np.asarray(out)[i, :keep],
                                       np.asarray(trimmed)[:keep], atol=1e-6)
            assert not np.asarray(out)[i, keep:].any()

    def test_random_speed_change_scales_frequency(self):
        """A speed ratio r maps a tone of f Hz to r*f Hz (the reference's
        resample-to-rate/ratio semantics, lidbox/data/steps.py:331-352)."""
        tone = testutil.sinewave(400, RATE, 1.0)
        batch = jnp.asarray(np.stack([tone] * 4))
        lengths = jnp.full((4,), tone.size, jnp.int32)
        key = jax.random.PRNGKey(3)
        out, new_lengths = on_device.random_speed_change_batch(
            key, batch, lengths, (0.8, 1.25))
        out, new_lengths = np.asarray(out), np.asarray(new_lengths)
        # reproduce the ratios the function drew
        ratios = np.asarray(jax.random.uniform(key, (4,), minval=0.8,
                                               maxval=1.25))
        for i in range(4):
            n = int(new_lengths[i])
            expected_n = min(int((tone.size - 1) / ratios[i]) + 1, tone.size)
            assert n == expected_n, (n, expected_n, ratios[i])
            seg = out[i, :min(n, RATE // 2)]
            freqs = np.fft.rfftfreq(seg.size, 1.0 / RATE)
            peak_hz = freqs[np.abs(np.fft.rfft(seg)).argmax()]
            assert abs(peak_hz - 400 * ratios[i]) < 25, (peak_hz, ratios[i])
            assert not out[i, n:].any()

    def test_speed_change_matches_naive_gather_formula(self):
        """The windowed row-gather + one-hot einsum resampler must equal
        the naive per-sample take_along_axis formulation on every valid
        output sample (it's an exactness refactor, not an approximation)."""
        rng = np.random.default_rng(7)
        B, T = 4, 2000
        signals = jnp.asarray(rng.normal(0, 1, (B, T)).astype(np.float32))
        lengths = jnp.asarray([T, T, 1500, 700], jnp.int32)
        key = jax.random.PRNGKey(11)
        speed_range = (0.85, 1.3)
        out, new_lengths = on_device.random_speed_change_batch(
            key, signals, lengths, speed_range)
        # naive oracle with identical draws
        ratio = np.asarray(jax.random.uniform(
            key, (B,), minval=speed_range[0], maxval=speed_range[1]))
        pos = np.arange(T)[None, :] * ratio[:, None]
        lo = np.clip(np.floor(pos).astype(np.int64), 0, T - 1)
        hi = np.clip(lo + 1, 0, T - 1)
        f = (pos - lo).astype(np.float32)
        s = np.asarray(signals)
        oracle = (np.take_along_axis(s, lo, 1) * (1 - f)
                  + np.take_along_axis(s, hi, 1) * f)
        out, new_lengths = np.asarray(out), np.asarray(new_lengths)
        # The kernel computes interpolation positions in float32; the f64
        # numpy oracle's positions differ by <= eps*position (~3e-4 of a
        # sample), which bounds the output difference by that fraction of
        # the local signal slope — atol 5e-3 catches any structural error
        # (off-by-row/window bugs are O(1)).
        for b in range(B):
            n = int(new_lengths[b])
            np.testing.assert_allclose(out[b, :n], oracle[b, :n], atol=5e-3)
            assert not out[b, n:].any()

    def test_masked_noise_mix_matches_unpadded(self, noise_bank):
        """Mixing into a padded row with lengths == audio.snr_mixer on the
        unpadded slice with the same noise clip and SNR (reference MS-SNSD
        numerics, lidbox/features/audio.py:124-148)."""
        bank, bl = noise_bank
        sig = testutil.noisy_sinewave(220, RATE, 0.05, 1.0, seed=4)
        T = sig.size + 5000
        padded = np.zeros((1, T), np.float32)
        padded[0, :sig.size] = sig
        for seed in range(8):  # many draws: parity must hold, not get lucky
            key = jax.random.PRNGKey(9 + seed)
            mixed_pad = np.asarray(on_device.mix_noise_from_bank(
                key, jnp.asarray(padded), bank, bl, (5.0, 15.0),
                lengths=jnp.asarray([sig.size], jnp.int32)))
            # reproduce the function's draws for the per-utterance oracle
            k_idx, k_snr, k_off = jax.random.split(key, 3)
            idx = int(jax.random.randint(k_idx, (1,), 0, bank.shape[0])[0])
            snr = float(jax.random.uniform(k_snr, (1,), minval=5.0,
                                           maxval=15.0)[0])
            off = int(jax.random.randint(k_off, (1,), 0,
                                         bank.shape[1] - T + 1)[0])
            noise = np.asarray(bank)[idx, off:off + T][:sig.size]
            _, _, oracle = audio.snr_mixer(jnp.asarray(sig),
                                           jnp.asarray(noise),
                                           jnp.float32(snr))
            np.testing.assert_allclose(mixed_pad[0, :sig.size],
                                       np.asarray(oracle), atol=1e-6)
            assert not mixed_pad[0, sig.size:].any()

    def test_declarative_fused_training_from_config(self, tmp_path):
        """The BASELINE config-5 chain as pure config: a features section
        with on_device_augment stops the pipeline at raw signals, and
        ModelWrapper.fit_fused trains through the fused program."""
        from lidbox_tpu.data import from_steps
        from lidbox_tpu.data.pipelines import create_dataset
        from lidbox_tpu.features import io as audio_io
        from lidbox_tpu.models.model_utils import ModelWrapper
        from lidbox_tpu.train import signal_batches_from_dataset

        rng = np.random.default_rng(0)
        noise_path = tmp_path / "noise.wav"
        audio_io.write_mono_wav(
            noise_path, rng.normal(0, 0.1, RATE * 2).astype(np.float32), RATE)
        paths, labels_col = [], []
        freqs = {"aa": 300.0, "bb": 900.0}
        for i in range(8):
            lab = "aa" if i % 2 == 0 else "bb"
            sig = testutil.sinewave(freqs[lab], RATE, 1.0) \
                + rng.normal(0, 0.05, RATE).astype(np.float32)
            p = tmp_path / f"u{i}.wav"
            audio_io.write_mono_wav(p, sig.astype(np.float32), RATE)
            paths.append(str(p))
            labels_col.append(lab)

        config = {
            "pre_process": {"chunks": {"length_ms": 500, "step_ms": 500}},
            "features": {
                "type": "logmelspectrogram",
                "sample_rate": RATE,
                "melspectrogram": {"num_mel_bins": 24},
                "stft_method": "matmul",
                "on_device_augment": {
                    "noise_paths": [str(noise_path)],
                    "noise_max_seconds": 2.0,
                    "snr_range": [10, 20],
                    "fir_coefs": 5,
                    "speed_range": [0.9, 1.1],
                    "vad": True,
                    "vad_min_non_speech_ms": 0,
                    "specaug": {"time_masks": 1, "freq_masks": 1},
                },
            },
            "experiment": {
                "cache_directory": str(tmp_path / "cache"), "name": "fused",
                "input_shape": [None, 24], "output_shape": [2],
                "model": {"key": "xvector"},
                "optimizer": {"cls": "Adam",
                              "kwargs": {"learning_rate": 3e-3}},
                "loss": {"cls": "SparseCategoricalCrossentropy"},
            },
        }
        steps = create_dataset(
            "train", ["aa", "bb"],
            {"id": [f"u{i}" for i in range(8)], "path": paths,
             "label": labels_col}, config)
        assert not any(s.key == "extract_features" for s in steps)
        ds = from_steps(steps).cache_to_memory()
        first = next(iter(ds))
        assert "signal" in first and "input" not in first

        wrapper = ModelWrapper.from_config(config)
        batches = signal_batches_from_dataset(ds, batch_size=8)
        history = wrapper.fit_fused(batches, epochs=4, sample_rate=RATE,
                                    verbose=False)
        assert len(history) == 4
        assert history[-1] < history[0], history

    def test_full_config5_chain_trains_one_program(self, noise_bank):
        """BASELINE config 5: waveform -> VAD -> noise + resample +
        SpecAugment -> log-Mel -> train, as ONE jit program with a frame
        mask threaded to the model."""
        bank, bl = noise_bank
        frames = 1 + (RATE - 400) // 160
        model = models.create("xvector", (frames, 24), 3)
        trainer = Trainer(model, optax.adam(1e-3), nll_loss)
        trainer.create_state()
        feature_fn = on_device.make_augmented_feature_fn(
            RATE, {"type": "logmelspectrogram",
                   "melspectrogram": {"num_mel_bins": 24}},
            on_device.AugmentConfig(snr_range=(10.0, 20.0), fir_coefs=5,
                                    speed_range=(0.9, 1.1), vad=True,
                                    vad_min_non_speech_ms=0,
                                    specaug_time_masks=1,
                                    specaug_freq_masks=1),
            noise_bank=bank, noise_lengths=bl)
        feats, mask = feature_fn(jax.random.PRNGKey(0),
                                 jnp.asarray(np.zeros((2, RATE), np.float32)
                                             + 0.01))
        assert feats.shape[:2] == mask.shape
        step = on_device.make_fused_train_step(trainer, feature_fn)
        rng = np.random.default_rng(0)
        signals = jnp.asarray(np.stack(
            [testutil.noisy_sinewave(150 * (i % 3 + 1), RATE, 0.05, 1.0,
                                     seed=i) for i in range(8)]))
        targets = jnp.asarray((np.arange(8) % 3).astype(np.int32))
        state = trainer.state
        losses = []
        for i in range(6):
            state, loss = step(state, signals, targets, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert int(jax.device_get(state.step)) == 6


def test_fit_signals_rejects_exhausted_generator():
    """A one-shot generator with epochs > 1 must raise (it used to train
    on zero batches with loss=nan for every epoch after the first)."""
    import pytest
    frames = 1 + (RATE - 400) // 160
    model = models.create("dnn", (frames, 24), 3)
    trainer = Trainer(model, optax.adam(2e-3), nll_loss)
    feature_fn = on_device.make_augmented_feature_fn(
        RATE, {"type": "logmelspectrogram",
               "melspectrogram": {"num_mel_bins": 24}},
        on_device.AugmentConfig(snr_range=None), noise_bank=None)
    rng = np.random.default_rng(0)
    signals = np.stack([testutil.noisy_sinewave(200, RATE, 0.1, 1.0, seed=i)
                        for i in range(6)])
    targets = (np.arange(6) % 3).astype(np.int32)
    gen = iter([(signals, targets)])
    with pytest.raises(ValueError, match="re-iterable"):
        on_device.fit_signals(trainer, feature_fn, gen, epochs=3,
                              verbose=False)


class TestNoiseConfigValidation:
    def _features(self, **aug):
        return {"type": "logmelspectrogram",
                "melspectrogram": {"num_mel_bins": 24},
                "on_device_augment": aug}

    def test_empty_noise_datadir_raises(self, tmp_path):
        import pytest
        with pytest.raises(ValueError, match="contains no"):
            on_device.feature_fn_from_config(
                RATE, self._features(noise_datadir=str(tmp_path)))

    def test_snr_range_without_noise_source_raises(self):
        import pytest
        with pytest.raises(ValueError, match="no noise source"):
            on_device.feature_fn_from_config(
                RATE, self._features(snr_range=[5, 20]))

    def test_defaults_without_noise_are_fine(self):
        fn = on_device.feature_fn_from_config(RATE, self._features())
        assert callable(fn)
