"""
Feed-engineered training example: raw waveforms -> ONE XLA program per
step (on-device augmentation + log-Mel + x-vector fwd/bwd/update), fed
through the tuned host->device pipeline —

- int16 PCM staging (half the feed bytes; targets packed into the same
  transfer),
- `steps_per_dispatch`: several train steps per transfer+dispatch round,
- `cache_staged`: epochs 2+ train from device-resident waveforms with
  zero feed traffic (augmentation stays fresh per epoch).

Everything is declared in the config's `experiment.feed` section — this
is the BASELINE "config 5" augmentation chain, TPU-native.

Run on any backend (CPU works):

    python examples/fused_feed_training.py
"""
import os
import sys

import numpy as np

# runnable without installation: `python examples/fused_feed_training.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("LIDBOX_EXAMPLE_TPU"):
    # examples default to the (virtual-mesh) CPU backend so they run fast
    # and deterministically anywhere; set LIDBOX_EXAMPLE_TPU=1 to drive
    # the ambient accelerator instead
    jax.config.update("jax_platforms", "cpu")

import tempfile

from lidbox_tpu import testutil
from lidbox_tpu.data import on_device
from lidbox_tpu.models.model_utils import ModelWrapper
from lidbox_tpu.train import signal_batches_from_dataset

SR = 16000
SECONDS = 2.0
LABELS = ("fi", "et", "sv")
BATCH = 16


def synth_corpus(n_per_lang=16):
    """Class-separable synthetic waveform batches (tone + noise)."""
    batches = []
    rng = np.random.default_rng(0)
    sigs, targets = [], []
    for t, lab in enumerate(LABELS):
        for i in range(n_per_lang):
            sigs.append(testutil.noisy_sinewave(220.0 * (t + 1), SR, 0.1,
                                                SECONDS, seed=100 * t + i))
            targets.append(t)
    order = rng.permutation(len(sigs))
    for lo in range(0, len(sigs), BATCH):
        idx = order[lo:lo + BATCH]
        batches.append((np.stack([sigs[i] for i in idx]).astype(np.float32),
                        np.asarray([targets[i] for i in idx], np.int32)))
    return batches


def main():
    frames = 1 + (int(SR * SECONDS) - 400) // 160
    cache = tempfile.mkdtemp(prefix="lidbox_fused_")
    # a real noise source for the SNR-mixing stage (snr_range without one
    # is a config error — the stage would otherwise silently not run)
    from lidbox_tpu.features import io as audio_io
    noise_path = os.path.join(cache, "noise.wav")
    audio_io.write_mono_wav(
        noise_path,
        np.random.default_rng(7).normal(0, 0.1, SR).astype(np.float32), SR)
    config = {
        "features": {
            "type": "logmelspectrogram",
            "sample_rate": SR,
            "melspectrogram": {"num_mel_bins": 40},
            # the fused on-device augmentation chain (BASELINE config 5):
            # compiled INTO the train step, nothing runs on the host
            "on_device_augment": {
                "snr_range": [10, 25],
                "noise_paths": [noise_path],
                "fir_coefs": 10,
                "specaug": {"time_masks": 2, "freq_masks": 2},
            },
        },
        "experiment": {
            "cache_directory": cache, "name": "fused-feed",
            "input_shape": [frames, 40], "output_shape": [len(LABELS)],
            "model": {"key": "xvector"},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 2e-3}},
            "loss": {"cls": "SparseCategoricalCrossentropy"},
            # host->device feed tuning, fully declarative:
            "feed": {
                "prefetch": 6,             # staged transfers in flight
                "stage_dtype": "int16",    # PCM staging, targets packed in
                "steps_per_dispatch": 2,   # 2 train steps per round trip
                "cache_staged": True,      # epochs 2+ feed-free
            },
        },
    }
    wrapper = ModelWrapper.from_config(config)
    batches = synth_corpus()
    print(f"training on {sum(b[1].size for b in batches)} utterances, "
          f"{len(batches)} batches, feed={config['experiment']['feed']}")
    history = wrapper.fit_fused(lambda: batches, epochs=5)
    losses = [h if isinstance(h, float) else h["loss"] for h in history]
    print("epoch losses:", " ".join(f"{l:.4f}" for l in losses))
    assert losses[-1] < losses[0], "loss should decrease"

    # serve the trained model directly — fit_fused synced model.variables
    clean = on_device.make_augmented_feature_fn(
        SR, {"type": "logmelspectrogram",
             "melspectrogram": {"num_mel_bins": 40}},
        on_device.AugmentConfig())
    import jax
    feats = clean(jax.random.PRNGKey(0), batches[0][0])
    preds = np.asarray(wrapper.model.apply(wrapper.model.variables,
                                           np.asarray(feats), train=False))
    acc = float((preds.argmax(1) == batches[0][1]).mean())
    print(f"train-batch accuracy after 5 fused epochs: {acc:.2f}")


if __name__ == "__main__":
    main()
