"""
On-device augmentation + fused training pipeline.

BASELINE.json north star: "Augmentation (noise mixing, random resampling,
SpecAugment-style masking) runs on-device inside the same XLA program as
the model step so feature extraction never bottlenecks training."

The reference did per-element noise-file reads and scipy resampling inside
tf.data on the host (reference: lidbox/data/steps.py:235-368). Here:

- a noise bank is staged into device memory ONCE (padded [N, T] + lengths),
- each training step draws noise indices/SNRs/FIR taps from the step's
  PRNG key and mixes on the VPU (random gather from the bank instead of
  file IO — SURVEY.md §7),
- SpecAugment-style time/frequency masking runs on the feature tensor,
- waveform -> augment -> log-Mel -> model forward/backward -> optax update
  compile into ONE jit program; the host only feeds raw waveform batches.
"""
import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import lidbox_tpu.features as F
from lidbox_tpu import get_logger
from lidbox_tpu.features import audio
from lidbox_tpu.features import io as audio_io

logger = get_logger("data.on_device")


def build_noise_bank(noise_paths, sample_rate, max_seconds=10.0):
    """Decode noise files into a device-resident bank: (signals [N, T],
    lengths [N] original sample counts).

    Each clip is tiled cyclically to fill its whole row (the reference's
    tile-and-trim, lidbox/data/steps.py:296-302, done once at staging). A
    full row means the per-step mixer can take a contiguous dynamic slice
    at a random offset — a fast TPU op — instead of an arbitrary-index
    gather (which measured ~80x slower)."""
    T = int(sample_rate * max_seconds)
    signals = np.zeros((len(noise_paths), T), np.float32)
    lengths = np.zeros(len(noise_paths), np.int32)
    for i, path in enumerate(noise_paths):
        sig, rate = audio_io.read_audio(path)
        assert rate == sample_rate, (
            f"noise sample rate {rate} != speech rate {sample_rate} ({path})")
        signals[i] = np.resize(sig, T)  # cyclic tile + trim
        lengths[i] = min(len(sig), T)
    logger.info("Staged noise bank: %d files, %.1f s rows", len(noise_paths),
                max_seconds)
    return jnp.asarray(signals), jnp.asarray(lengths)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Which on-device augmentations a fused step applies."""
    snr_range: Optional[Tuple[float, float]] = (5.0, 20.0)   # None = no noise
    fir_coefs: int = 0                   # >0: random-normal FIR filtering
    specaug_time_masks: int = 0          # SpecAugment time masks
    specaug_time_width: int = 20
    specaug_freq_masks: int = 0          # SpecAugment frequency masks
    specaug_freq_width: int = 8


def mix_noise_from_bank(key, signals, noise_bank, noise_lengths, snr_range):
    """Per-example random noise clip from the bank mixed at a random SNR
    (the reference's MS-SNSD formula, audio.snr_mixer).

    The bank rows are pre-tiled full-width (build_noise_bank), so each
    example takes a contiguous random-offset dynamic slice — row gather +
    vmapped dynamic_slice, both fast on TPU.
    """
    del noise_lengths  # rows are pre-tiled full width
    B, T = signals.shape
    bank_T = noise_bank.shape[1]
    assert bank_T >= T, (
        f"noise bank rows ({bank_T} samples) shorter than signals ({T}); "
        "raise build_noise_bank(max_seconds=...)")
    k_idx, k_snr, k_off = jax.random.split(key, 3)
    idx = jax.random.randint(k_idx, (B,), 0, noise_bank.shape[0])
    snr = jax.random.uniform(k_snr, (B,), minval=snr_range[0],
                             maxval=snr_range[1])
    offsets = jax.random.randint(k_off, (B,), 0, bank_T - T + 1)
    rows = noise_bank[idx]                                          # [B, bank_T]
    noise = jax.vmap(
        lambda row, off: jax.lax.dynamic_slice(row, (off,), (T,)))(rows, offsets)
    _, _, mixed = jax.vmap(audio.snr_mixer)(signals, noise, snr)
    return mixed


def random_fir(key, signals, num_coefs):
    """Batched random-normal FIR filtering (channel simulation,
    reference: lidbox/features/audio.py:63-74): each example gets its own
    taps, vmapped causal convolution."""
    firs = jax.random.normal(key, (signals.shape[0], num_coefs), signals.dtype)

    def one(sig, fir):
        return jnp.convolve(jnp.pad(sig, (num_coefs - 1, 0)), fir, mode="valid")
    return jax.vmap(one)(signals, firs)


def spec_augment(key, feats, time_masks=2, time_width=20, freq_masks=2,
                 freq_width=8, mask_value=0.0):
    """SpecAugment-style time/frequency masking (Park et al. 2019) on
    [B, T, C] features — static shapes, pure jnp."""
    B, T, C = feats.shape
    keys = jax.random.split(key, 4)

    def apply_masks(feats, starts, widths, axis_len, axis):
        # starts/widths: [B, n_masks]
        coords = jnp.arange(axis_len)
        # [B, n_masks, L] -> any over masks -> [B, L]
        masked = ((coords[None, None, :] >= starts[..., None])
                  & (coords[None, None, :] < (starts + widths)[..., None]))
        masked = jnp.any(masked, axis=1)
        shape = [B, 1, 1]
        shape[axis] = axis_len
        return jnp.where(masked.reshape(shape), mask_value, feats)

    if time_masks > 0:
        starts = jax.random.randint(keys[0], (B, time_masks), 0, max(T - 1, 1))
        widths = jax.random.randint(keys[1], (B, time_masks), 0, time_width + 1)
        feats = apply_masks(feats, starts, widths, T, axis=1)
    if freq_masks > 0:
        starts = jax.random.randint(keys[2], (B, freq_masks), 0, max(C - 1, 1))
        widths = jax.random.randint(keys[3], (B, freq_masks), 0, freq_width + 1)
        feats = apply_masks(feats, starts, widths, C, axis=2)
    return feats


def make_augmented_feature_fn(sample_rate, feature_config, augment: AugmentConfig,
                              noise_bank=None, noise_lengths=None):
    """(key, signals [B, T]) -> features [B, frames, C], with all
    augmentations applied on device. Safe to close over in a jitted
    training step."""
    feature_config = dict(feature_config)
    feature_type = feature_config.pop("type", "logmelspectrogram")
    feature_config.pop("validate_finite", None)
    stft_method = feature_config.pop("stft_method", "matmul")
    kwargs = {k: v for k, v in feature_config.items()
              if k in ("spectrogram", "melspectrogram", "mfcc",
                       "db_spectrogram", "sample_minmax_scaling",
                       "window_normalization")}

    def fn(key, signals):
        k_noise, k_fir, k_spec = jax.random.split(key, 3)
        if augment.snr_range is not None and noise_bank is not None:
            signals = mix_noise_from_bank(k_noise, signals, noise_bank,
                                          noise_lengths, augment.snr_range)
        if augment.fir_coefs > 0:
            signals = random_fir(k_fir, signals, augment.fir_coefs)
        feats = F.extract_features(signals, sample_rate,
                                   feature_type=feature_type,
                                   stft_method=stft_method, **kwargs)
        if augment.specaug_time_masks or augment.specaug_freq_masks:
            feats = spec_augment(k_spec, feats,
                                 time_masks=augment.specaug_time_masks,
                                 time_width=augment.specaug_time_width,
                                 freq_masks=augment.specaug_freq_masks,
                                 freq_width=augment.specaug_freq_width)
        return feats
    return fn


def fit_signals(trainer, feature_fn, signal_batches, epochs=1, verbose=True):
    """Train directly from raw waveform batches through the fused on-device
    path: every step is ONE XLA program (augment -> features -> fwd/bwd ->
    update) with no per-step host readbacks.

    ``signal_batches``: callable or iterable of (signals [B, T], targets [B])
    numpy pairs. Returns per-epoch mean losses.
    """
    step = make_fused_train_step(trainer, feature_fn)
    if trainer.state is None:
        trainer.create_state()
    history = []
    for epoch in range(1, epochs + 1):
        losses = []
        it = signal_batches() if callable(signal_batches) else signal_batches
        for i, (signals, targets) in enumerate(it):
            trainer.state, loss = step(trainer.state, jnp.asarray(signals),
                                       jnp.asarray(targets), trainer.rng)
            losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
        history.append(mean_loss)
        if verbose:
            logger.info("fused epoch %d/%d: loss=%.6g", epoch, epochs, mean_loss)
    return history


def make_fused_train_step(trainer, feature_fn):
    """One jit program: raw waveforms -> on-device augmentation -> features
    -> model forward/backward -> optax update.

    Returns step(state, signals [B, T], targets [B], rng) ->
    (new_state, loss). The host loop only supplies waveform batches.
    """
    @jax.jit
    def step(state, signals, targets, rng):
        feat_key = jax.random.fold_in(rng, state.step)
        feats = feature_fn(jax.random.fold_in(feat_key, 7), signals)
        return trainer._train_step(state, {"input": feats, "target": targets},
                                   rng)
    return step
