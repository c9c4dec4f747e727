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
