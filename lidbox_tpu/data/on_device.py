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
    """Which on-device augmentations a fused step applies.

    The full BASELINE config-5 chain — waveform -> energy VAD ->
    noise / random resampling / SpecAugment -> log-Mel — compiles into one
    XLA program when all stages are enabled.

    ``augment_prob < 1`` gates the stochastic stages (noise, resampling,
    FIR, SpecAugment) per example with a Bernoulli draw, so each batch
    interleaves clean and augmented examples — the static-shape analogue
    of the reference's sample_from_datasets([original] + augmented)
    stream (reference: lidbox/data/steps.py:215-229), where elements are
    drawn from the clean and augmented datasets at random. Energy VAD is
    preprocessing, not augmentation, and is never gated.
    """
    snr_range: Optional[Tuple[float, float]] = (5.0, 20.0)   # None = no noise
    augment_prob: float = 1.0            # per-example P(apply augmentation)
    fir_coefs: int = 0                   # >0: random-normal FIR filtering
    speed_range: Optional[Tuple[float, float]] = None  # e.g. (0.9, 1.1)
    vad: bool = False                    # energy-VAD silence removal
    vad_frame_ms: int = 10
    vad_min_non_speech_ms: int = 300
    vad_strength: float = 0.1
    specaug_time_masks: int = 0          # SpecAugment time masks
    specaug_time_width: int = 20
    specaug_freq_masks: int = 0          # SpecAugment frequency masks
    specaug_freq_width: int = 8

    @property
    def tracks_lengths(self):
        """VAD and resampling change each example's valid sample count, so
        the fused feature fn must carry lengths and emit a frame mask."""
        return self.vad or self.speed_range is not None


def mix_noise_from_bank(key, signals, noise_bank, noise_lengths, snr_range,
                        lengths=None):
    """Per-example random noise clip from the bank mixed at a random SNR
    (the reference's MS-SNSD formula, audio.snr_mixer).

    The bank rows are pre-tiled full-width (build_noise_bank), so each
    example takes a contiguous random-offset dynamic slice — row gather +
    vmapped dynamic_slice, both fast on TPU. When ``lengths`` is given the
    clean-signal RMS is computed over valid samples only (padded rows then
    reproduce per-utterance reference numerics) and padding stays zero.
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
    if lengths is None:
        _, _, mixed = jax.vmap(audio.snr_mixer)(signals, noise, snr)
        return mixed
    # Masked path: audio.snr_mixer_batch masks BOTH clean and noise RMS
    # over the valid window, reproducing the per-utterance audio.snr_mixer
    # on the unpadded slice to ~3e-8 (an earlier inline variant left the
    # noise RMS over the full padded width and drifted past the 1e-4
    # parity budget).
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    return audio.snr_mixer_batch(signals, noise, snr, mask=valid)


def random_speed_change_batch(key, signals, lengths, speed_range):
    """Per-example random speed perturbation on [B, T] rows.

    The reference drew ratio ~ U[min, max] and FFT-resampled from
    ratio*rate to rate, i.e. output[i] = input(i * ratio) with new length
    n / ratio (reference: lidbox/data/steps.py:331-352). Device version:
    batched linear interpolation with a static output shape [B, T]; new
    valid lengths are returned alongside (slowdowns that would exceed T
    are truncated, as chunking would anyway).

    TPU formulation: a flat ``take_along_axis`` over the sample axis is a
    minor-dim gather and measures ~30 ms for [32, 48000] on v5e. Instead,
    outputs are produced a 64-sample row at a time: output row j reads a
    small contiguous window of input rows starting at floor(j*ratio) (a
    fast sublane row-gather), and the within-window 2-tap interpolation is
    an einsum against a hat-function selection tensor
    max(0, 1 - |s - o|) — algebraically identical to the one-hot
    (1-f)/f pair — that XLA fuses into the contraction. The window is
    clipped to the positions the interpolation can actually reach
    (RW + (RW-1)*r_max + 2 instead of n_win*RW lanes), and the selection
    tensor keeps the window axis minor. Interleaved A/B on v5e
    (b32 x 3 s): 0.62 ms vs 0.90 ms for the full-width one-hot layout and
    ~30 ms for the flat gather; exact (same lo/hi/frac arithmetic) on
    every valid output sample.
    """
    B, T = signals.shape
    ratio = jax.random.uniform(key, (B,), minval=speed_range[0],
                               maxval=speed_range[1])
    # Row width trades gather lane padding against selection-tensor work;
    # 64 measured fastest among {32, 64, 128} on v5e.
    RW = 64
    R = -(-T // RW)                          # output rows
    # window rows per output row: in-window positions reach
    # RW*frac(j*r) + (RW-1)*r + 1 < RW*(2 + floor(r_max))
    n_win = 2 + int(np.floor(float(speed_range[1])))
    # ... but the reachable prefix is much narrower than n_win*RW:
    width = RW + int(np.ceil((RW - 1) * float(speed_range[1]))) + 2
    width = min(-(-width // 8) * 8, n_win * RW)
    pad_to = (R + n_win) * RW
    s = jnp.pad(signals, ((0, 0), (0, pad_to - T)))
    rows = s.reshape(B, R + n_win, RW)

    j = jnp.arange(R)
    base = jnp.floor(j[None, :] * ratio[:, None]).astype(jnp.int32)  # [B, R]
    base = jnp.clip(base, 0, R + n_win - 1)
    window = jnp.concatenate(
        [jnp.take_along_axis(rows,
                             jnp.clip(base + d, 0, R + n_win - 1)[:, :, None],
                             axis=1)
         for d in range(n_win)], axis=2)[:, :, :width]   # [B, R, width]

    k = jnp.arange(RW)
    q = (j[None, :, None] * RW + k[None, None, :]) * ratio[:, None, None]
    o = q - (base * RW)[:, :, None]          # in-window position [B, R, RW]
    o = jnp.clip(o, 0.0, width - 1.0)
    sidx = jnp.arange(width)
    sel = jnp.maximum(0.0, 1.0 - jnp.abs(
        sidx[None, None, None, :] - o[:, :, :, None]))   # [B, R, RW, width]
    out = jnp.einsum("brs,brks->brk", window, sel).reshape(B, R * RW)[:, :T]

    # valid output positions: q <= lengths - 1
    new_lengths = jnp.minimum(
        (jnp.floor((lengths.astype(jnp.float32) - 1.0) / ratio) + 1.0
         ).astype(jnp.int32), T)
    new_lengths = jnp.maximum(new_lengths, 0)
    valid = jnp.arange(T)[None, :] < new_lengths[:, None]
    return jnp.where(valid, out, 0.0), new_lengths


def energy_vad_compact_batch(signals, lengths, sample_rate, frame_ms=10,
                             min_non_speech_ms=300, strength=0.1):
    """Batched on-device silence removal: energy VAD over ``frame_ms``
    windows, voiced windows compacted to the front of each row
    (static-shape form of audio.remove_silence, reference:
    lidbox/features/audio.py:332-353). Returns (signals, new_lengths)."""
    B, T = signals.shape
    decisions = audio.framewise_rms_energy_vad_decisions_batch(
        signals, lengths, sample_rate, frame_ms,
        min_non_speech_ms=min_non_speech_ms, strength=strength)
    window = audio.ms_to_frames(sample_rate, frame_ms)
    num_windows = decisions.shape[1]

    def one(sig, vad):
        windows = audio.frame(sig, window, window, axis=0)   # [F, W]
        order = jnp.argsort(jnp.where(vad, jnp.arange(num_windows),
                                      num_windows))
        compacted = windows[order]
        keep = jnp.sum(vad)
        mask = (jnp.arange(num_windows) < keep)[:, None]
        return jnp.where(mask, compacted, 0.0).reshape(-1), keep * window

    out, new_lengths = jax.vmap(one)(signals, decisions)
    if out.shape[1] < T:  # windows don't cover a partial tail; keep shape
        out = jnp.pad(out, ((0, 0), (0, T - out.shape[1])))
    return out, new_lengths.astype(jnp.int32)


def random_fir(key, signals, num_coefs):
    """Batched random-normal FIR filtering (channel simulation,
    reference: lidbox/features/audio.py:63-74): each example gets its own
    taps, vmapped causal convolution."""
    firs = jax.random.normal(key, (signals.shape[0], num_coefs), signals.dtype)
    return jax.vmap(audio.fir_filter)(signals, firs)


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


def augment_config_from_dict(d):
    """Declarative form of AugmentConfig (the ``on_device_augment``
    features-config subsection)::

        on_device_augment:
          noise_datadir: /data/musan     # or noise_paths: [...]
          snr_range: [5, 20]
          augment_prob: 0.5              # P(example is augmented)
          fir_coefs: 10
          speed_range: [0.9, 1.1]
          vad: true
          specaug: {time_masks: 2, time_width: 20, freq_masks: 2, freq_width: 8}
    """
    spec = d.get("specaug") or {}
    prob = float(d.get("augment_prob", 1.0))
    if not 0.0 <= prob <= 1.0:
        # a typo'd probability (e.g. 5 for 0.5) would silently train
        # all-augmented (bernoulli clamps) — refuse instead
        raise ValueError(
            f"on_device_augment.augment_prob must be in [0, 1], got {prob}")
    return AugmentConfig(
        snr_range=tuple(d["snr_range"]) if d.get("snr_range") else None,
        augment_prob=prob,
        fir_coefs=int(d.get("fir_coefs", 0)),
        speed_range=(tuple(d["speed_range"]) if d.get("speed_range")
                     else None),
        vad=bool(d.get("vad", False)),
        vad_frame_ms=int(d.get("vad_frame_ms", 10)),
        vad_min_non_speech_ms=int(d.get("vad_min_non_speech_ms", 300)),
        vad_strength=float(d.get("vad_strength", 0.1)),
        specaug_time_masks=int(spec.get("time_masks", 0)),
        specaug_time_width=int(spec.get("time_width", 20)),
        specaug_freq_masks=int(spec.get("freq_masks", 0)),
        specaug_freq_width=int(spec.get("freq_width", 8)))


def feature_fn_from_config(sample_rate, features_conf):
    """Build the fused on-device feature fn straight from a config dict's
    ``features`` section (with its ``on_device_augment`` subsection) —
    the declarative route to the BASELINE config-5 chain."""
    features_conf = dict(features_conf)
    aug = dict(features_conf.pop("on_device_augment", None) or {})
    noise_bank = noise_lengths = None
    paths = aug.pop("noise_paths", None)
    datadir = aug.pop("noise_datadir", None)
    max_seconds = float(aug.pop("noise_max_seconds", 10.0))
    if paths is None and datadir:
        import glob
        import os
        paths = sorted(
            p for ext in ("wav", "mp3")
            for p in glob.glob(os.path.join(datadir, "**", f"*.{ext}"),
                               recursive=True))
        if not paths:
            # a configured-but-empty noise dir must not silently train an
            # entire run without the noise augmentation the user asked for
            raise ValueError(
                f"on_device_augment.noise_datadir {datadir!r} contains no "
                "wav/mp3 files (typo in the path?)")
    if paths:
        noise_bank, noise_lengths = build_noise_bank(paths, sample_rate,
                                                     max_seconds=max_seconds)
    elif aug.get("snr_range") is not None:
        raise ValueError(
            "on_device_augment.snr_range is set but no noise source was "
            "given — configure noise_paths or noise_datadir, or remove "
            "snr_range")
    return make_augmented_feature_fn(
        sample_rate, features_conf, augment_config_from_dict(aug),
        noise_bank=noise_bank, noise_lengths=noise_lengths)


def make_augmented_feature_fn(sample_rate, feature_config, augment: AugmentConfig,
                              noise_bank=None, noise_lengths=None):
    """(key, signals [B, T], lengths=None) -> features, with every stage of
    the BASELINE config-5 chain on device: energy VAD -> noise mix / random
    resampling / FIR -> log-Mel -> SpecAugment, one XLA program. Safe to
    close over in a jitted training step.

    When the config tracks lengths (VAD or resampling enabled, or lengths
    passed), returns (features [B, frames, C], frame_mask [B, frames]);
    otherwise returns just the features (back-compatible).
    """
    feature_config = dict(feature_config)
    feature_type = feature_config.pop("type", "logmelspectrogram")
    feature_config.pop("validate_finite", None)
    stft_method = feature_config.pop("stft_method", "matmul")
    precision = feature_config.pop("precision", "highest")
    kwargs = {k: v for k, v in feature_config.items()
              if k in ("spectrogram", "melspectrogram", "mfcc",
                       "db_spectrogram", "sample_minmax_scaling",
                       "window_normalization")}

    def fn(key, signals, lengths=None):
        with_mask = augment.tracks_lengths or lengths is not None
        if lengths is None:
            lengths = jnp.full((signals.shape[0],), signals.shape[1],
                               jnp.int32)
        k_gate, k_speed, k_noise, k_fir, k_spec = jax.random.split(key, 5)
        # per-example clean/augmented interleaving, reference
        # sample_from_datasets semantics (lidbox/data/steps.py:215-229);
        # gate=None keeps the always-augment program byte-identical
        gate = None
        if augment.augment_prob < 1.0:
            gate = jax.random.bernoulli(
                k_gate, augment.augment_prob, (signals.shape[0],))
        if augment.vad:  # preprocessing, never gated
            signals, lengths = energy_vad_compact_batch(
                signals, lengths, sample_rate, frame_ms=augment.vad_frame_ms,
                min_non_speech_ms=augment.vad_min_non_speech_ms,
                strength=augment.vad_strength)
        if augment.speed_range is not None:
            sp, sp_len = random_speed_change_batch(
                k_speed, signals, lengths, augment.speed_range)
            if gate is not None:
                sp = jnp.where(gate[:, None], sp, signals)
                sp_len = jnp.where(gate, sp_len, lengths)
            signals, lengths = sp, sp_len
        if augment.snr_range is not None and noise_bank is not None:
            mixed = mix_noise_from_bank(
                k_noise, signals, noise_bank, noise_lengths,
                augment.snr_range, lengths=lengths if with_mask else None)
            signals = (mixed if gate is None
                       else jnp.where(gate[:, None], mixed, signals))
        if augment.fir_coefs > 0:
            filt = random_fir(k_fir, signals, augment.fir_coefs)
            signals = (filt if gate is None
                       else jnp.where(gate[:, None], filt, signals))
        feats = F.extract_features(signals, sample_rate,
                                   feature_type=feature_type,
                                   stft_method=stft_method,
                                   precision=precision,
                                   lengths=lengths if with_mask else None,
                                   return_mask=with_mask,
                                   **kwargs)
        frame_mask = None
        if with_mask:
            feats, frame_mask = feats  # the mask the features were masked with
        if augment.specaug_time_masks or augment.specaug_freq_masks:
            masked = spec_augment(k_spec, feats,
                                  time_masks=augment.specaug_time_masks,
                                  time_width=augment.specaug_time_width,
                                  freq_masks=augment.specaug_freq_masks,
                                  freq_width=augment.specaug_freq_width)
            feats = (masked if gate is None
                     else jnp.where(gate[:, None, None], masked, feats))
        if with_mask:
            return feats, frame_mask
        return feats
    fn.sample_rate = int(sample_rate)  # observability: fit_signals RTF
    return fn


def stage_signals(signals, stage_dtype=None):
    """Host-side waveform staging compression for the fused path.

    ``stage_dtype="int16"`` quantizes [-1, 1] float waveforms to 16-bit
    PCM — HALF the bytes over the feed link with the quantization most
    corpora already carry (wav/mp3 sources are 16-bit; loaders that read
    raw int16 can pass it straight through and skip the float conversion
    entirely). ``"bfloat16"`` halves float traffic for synthetic or
    >16-bit sources. The fused train step upcasts/rescales on device
    (make_fused_train_step).
    """
    signals = np.asarray(signals)
    if stage_dtype is None:
        return (signals if signals.dtype in (np.float32, np.int16)
                else signals.astype(np.float32))
    dt = np.dtype(jnp.dtype(stage_dtype))
    if signals.dtype == dt:
        return signals
    if dt == np.int16:
        return np.clip(np.rint(np.asarray(signals, np.float32) * 32768.0),
                       -32768, 32767).astype(np.int16)
    if signals.dtype == np.int16:
        # raw PCM -> float staging: rescale to [-1, 1] BEFORE the cast
        # (the device edge only upcasts floats; it must not see +-32767
        # magnitudes as bfloat16)
        return (signals.astype(np.float32) * (1.0 / 32768.0)).astype(dt)
    return signals.astype(dt)


def pack_targets_int16(signals, targets):
    """Append one int16 row carrying the targets to a staged [.., B, T]
    int16 waveform stack (the make_fused_train_step ``targets=None``
    layout: row B's first B slots), so signals+targets cross the feed
    link as ONE array. Returns None when the layout doesn't apply
    (non-int16 staging, B > T, or targets outside [0, 32767] — NEGATIVE
    labels such as -1 ignore-markers deliberately fall back to the
    two-transfer path) — both staging paths share these invariants
    through this single helper."""
    if signals.dtype != np.int16:
        return None
    b, t = signals.shape[-2], signals.shape[-1]
    if b > t or targets.max(initial=0) >= 32768 or targets.min(initial=0) < 0:
        return None
    packed = np.empty(signals.shape[:-2] + (b + 1, t), np.int16)
    packed[..., :b, :] = signals
    packed[..., b, :] = 0
    packed[..., b, :b] = targets
    return packed


def signals_to_float(signals):
    """Device-side decompression matching stage_signals: int16 PCM scales
    by 1/32768, any other dtype upcasts to float32."""
    if signals.dtype == jnp.int16:
        return signals.astype(jnp.float32) * (1.0 / 32768.0)
    if signals.dtype != jnp.float32:
        return signals.astype(jnp.float32)
    return signals


def fit_signals(trainer, feature_fn, signal_batches, epochs=1, verbose=True,
                val_batches=None, val_feature_fn=None,
                val_feature_batches=None, steps_per_dispatch=1,
                cache_staged=None, cache_shuffle=True):
    """Train directly from raw waveform batches through the fused on-device
    path: every step is ONE XLA program (augment -> features -> fwd/bwd ->
    update) with no per-step host readbacks. With a mesh on the trainer,
    batches shard over the data axis (ragged tails padded with an
    example mask, exactly like Trainer.fit).

    ``signal_batches``: callable or RE-ITERABLE collection of
    (signals [B, T], targets [B]) numpy pairs — with ``epochs > 1`` a
    one-shot generator raises after epoch 1 instead of silently training
    on nothing. Validation after every epoch comes from either
    ``val_batches`` (same signal-pair shape, featurized through
    ``val_feature_fn`` — default ``feature_fn``; pass a clean,
    augmentation-free fn for standard validation) or
    ``val_feature_batches`` (already-featurized dict batches, e.g. from
    train.batches_from_dataset over a clean pipeline). Epoch numbering
    resumes from ``trainer.initial_epoch`` and ``epochs`` is the absolute
    target, mirroring Trainer.fit. Returns per-epoch dicts with ``loss``
    (+ ``val_loss``/metrics when validating); plain float losses when no
    validation, back-compatible.

    ``steps_per_dispatch=K`` groups K same-shape batches into one staged
    transfer and ONE jitted program running K train steps
    (make_fused_multi_step) — on a serializing high-RTT feed link this
    amortizes the per-step transfer + dispatch rounds K-fold with
    bit-identical per-step numerics. Under a mesh the stack's scan axis
    is replicated and the batch axis sharded; ragged batches mesh-pad
    with per-step example masks.

    ``cache_staged`` (default: the trainer's setting) keeps the staged
    RAW waveform batches device-resident after epoch 1: later epochs pay
    zero feed traffic while augmentation stays fresh per epoch (it runs
    on device, keyed by the advancing step counter). ``cache_shuffle``
    re-permutes the cached batch order each epoch (seeded);
    ``cache_shuffle="rows"`` additionally re-draws batch COMPOSITION by
    permuting the cached waveform rows inside the replay scan
    (make_fused_replay_rows_step — the reference's element-level
    reshuffle, reference: lidbox/data/steps.py:997-999; degrades to
    batch-order when interleaved shapes force per-entry replay).
    """
    # fit_signals rebinds trainer.state every step (strictly linear), so
    # the donating variants apply: in-place param/opt updates halve the
    # state HBM churn per step
    step = make_fused_train_step(trainer, feature_fn, donate=True)
    spd = max(1, int(steps_per_dispatch))
    multi = (make_fused_multi_step(trainer, feature_fn, donate=True)
             if spd > 1 else None)
    if cache_staged is None:
        cache_staged = trainer.cache_staged
    staged_cache = None
    replay_groups = None  # consolidated per-shape stacks (mesh-sharded
    #                       under a mesh; None until epoch 1 completes)
    replay = None
    val_staged = None  # staged validation batches, cached alongside
    #                    (False = tried, didn't fit the HBM budget)
    cache_state = {"bytes": 0, "budget": None}  # HBM guard accounting

    def _cache_admit(entry):
        """Account one cached entry against the HBM budget; False (after a
        warning) once 2x the staged bytes — consolidation transiently
        holds originals + stacks — would exceed it. Same contract as
        Trainer.fit's guard; host-invariant under even multi-host feeds
        because the budget is agreed (min over hosts)."""
        from lidbox_tpu.train.loop import _tree_device_nbytes
        cache_state["bytes"] += _tree_device_nbytes(entry)
        if cache_state["budget"] is None:
            cache_state["budget"] = trainer._agreed_cache_budget()
        if 2.0 * cache_state["bytes"] > cache_state["budget"]:
            logger.warning(
                "cache_staged: staged signal corpus (%.0f MB so far, ~2x "
                "transient during consolidation) exceeds the HBM budget "
                "(%.0f MB) — releasing the cache and streaming every epoch",
                cache_state["bytes"] / 1e6, cache_state["budget"] / 1e6)
            return False
        return True
    if trainer.state is None:
        trainer.create_state()
    # a fresh fit starts training anew even if a previous fit on this
    # trainer was stopped early (mirrors Trainer.fit / Keras)
    trainer.stop_training = False
    validating = val_batches is not None or val_feature_batches is not None
    eval_cache = None
    if val_batches is not None:
        vfn = val_feature_fn if val_feature_fn is not None else feature_fn
        val_feats = jax.jit(lambda key, s: vfn(key, signals_to_float(s)))

    def _pad_local(signals, targets):
        """Host-side mesh padding for one batch: pad rows to the mesh's
        divisibility requirement (LOCAL device multiple for
        process-spanning meshes — each process feeds only its slice) and
        return (signals, targets, valid_mask | None)."""
        from lidbox_tpu import parallel
        if parallel.mesh_spans_processes(trainer.mesh):
            divisor = max(1, sum(
                d.process_index == jax.process_index()
                for d in trainer.mesh.devices.flat))
        else:
            divisor = trainer.mesh.devices.size
        n = targets.shape[0]
        if n % divisor:
            padded, valid = parallel.pad_batch_to(
                {"signals": signals, "targets": targets},
                -(-n // divisor) * divisor)
            return padded["signals"], padded["targets"], valid
        if parallel.mesh_spans_processes(trainer.mesh):
            # host-invariant pytree structure: whether padding occurred
            # is a LOCAL fact, so a mask leaf on one host but not another
            # would diverge the collective step's input structure (an
            # SPMD hang with no diagnostic) — attach the all-True mask
            # unconditionally under process-spanning meshes
            return signals, targets, np.ones(n, bool)
        return signals, targets, None

    def _stage(signals, targets):
        signals = stage_signals(signals, trainer.stage_dtype)
        targets = np.asarray(targets, np.int32)
        if trainer.mesh is None:
            # pack targets into one extra int16 row: ONE transfer per
            # step — on a serializing high-RTT feed link every separate
            # array pays its own full round trip
            packed = pack_targets_int16(signals, targets)
            if packed is not None:
                return jax.device_put(packed), None, None
            # start the transfer now, from the staging thread, so it
            # overlaps the device executing earlier steps (Trainer._put
            # does the same)
            return jax.device_put(signals), jax.device_put(targets), None
        from lidbox_tpu import parallel
        signals, targets, mask = _pad_local(signals, targets)
        batch = {"signals": signals, "targets": targets,
                 **({"mask": mask} if mask is not None else {})}
        if parallel.mesh_spans_processes(trainer.mesh):
            # multi-host: this process feeds its LOCAL slice, rows
            # assemble into one globally-sharded array — mirroring
            # Trainer._put (plain shard_batch would device_put to
            # non-addressable devices and raise)
            put = parallel.global_batch_from_local(batch, trainer.mesh)
        else:
            put = parallel.shard_batch(batch, trainer.mesh)
        return put["signals"], put["targets"], put.get("mask")

    def _grouped(batches):
        """Group consecutive same-shape batches into spd-stacks."""
        it = batches() if callable(batches) else batches
        buf = []
        for sig, tgt in it:
            sig = np.asarray(sig)
            if buf and sig.shape != buf[0][0].shape:
                yield list(buf)
                buf = []
            buf.append((sig, np.asarray(tgt, np.int32)))
            if len(buf) == spd:
                yield list(buf)
                buf = []
        if buf:
            yield buf

    def _stage_group(group):
        """Stage a K-group as ONE stacked transfer: (sig_k, tgt_k, mask_k).
        Single device packs targets into an extra int16 row when the
        layout applies (tgt_k=None); under a mesh each batch pads to the
        mesh multiple (same-shape group => identical padding, so mask_k is
        uniform: None or a [K, B] stack) and the stack shards with the
        scan axis replicated (stacked_batch_sharding)."""
        if trainer.mesh is None:
            sigs = stage_signals(np.stack([s for s, _ in group]),
                                 trainer.stage_dtype)
            tgts = np.stack([t for _, t in group])
            packed = pack_targets_int16(sigs, tgts)
            if packed is not None:
                return jax.device_put(packed), None, None
            return jax.device_put(sigs), jax.device_put(tgts), None
        from lidbox_tpu import parallel
        sigs, tgts, masks = [], [], []
        for s, t in group:
            s = stage_signals(s, trainer.stage_dtype)
            s, t, m = _pad_local(s, np.asarray(t, np.int32))
            sigs.append(s)
            tgts.append(t)
            masks.append(m)
        payload = {"signals": np.stack(sigs), "targets": np.stack(tgts)}
        if any(m is not None for m in masks):
            # same-shape group => identical padding, but fill defensively
            payload["mask"] = np.stack([
                np.ones(t.shape[0], bool) if m is None else m
                for m, t in zip(masks, tgts)])
        sharding = parallel.stacked_batch_sharding(trainer.mesh)
        if parallel.mesh_spans_processes(trainer.mesh):
            put = jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), payload)
        else:
            put = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), payload)
        return put["signals"], put["targets"], put.get("mask")

    for cb in trainer.callbacks:
        cb.on_train_begin(trainer)
    history = []
    for epoch in range(trainer.initial_epoch + 1, epochs + 1):
        for cb in trainer.callbacks:
            cb.on_epoch_begin(trainer, epoch)
        losses = []
        from lidbox_tpu.train.observability import ThroughputMeter
        meter = ThroughputMeter()
        # audio-seconds throughput (RTF): samples / sample_rate, with the
        # rate taken from the feature fn (make_augmented_feature_fn tags it)
        sr = float(getattr(feature_fn, "sample_rate", 0) or 0)
        if replay_groups is not None:
            # whole-epoch scan replay: zero feed traffic AND one dispatch
            # + one loss-vector readback per shape stack per epoch
            # (make_fused_replay_step); augmentation stays fresh — the
            # step RNG advances inside the scan. With cache_shuffle the
            # permutation is within-stack plus stack order (batch-
            # granular, like the per-entry replay it replaces).
            from lidbox_tpu import RANDOM_SEED
            if replay is None:
                replay = (make_fused_replay_rows_step
                          if cache_shuffle == "rows"
                          else make_fused_replay_step)(trainer, feature_fn,
                                                       donate=True)
            rng_epoch = np.random.default_rng(RANDOM_SEED + epoch)
            gorder = (rng_epoch.permutation(len(replay_groups))
                      if cache_shuffle else np.arange(len(replay_groups)))
            for gi in gorder:
                g = replay_groups[gi]
                # order/idx cross as HOST values: under a process-spanning
                # mesh a committed local array would need a cross-host
                # reshard; numpy inputs place wherever the compiled
                # program wants them (same on every host — seeded)
                if cache_shuffle == "rows":
                    K = int(g["steps"])
                    B = (g["targets"].shape[1] if g["targets"] is not None
                         else g["signals"].shape[1] - 1)
                    idx = rng_epoch.permutation(K * B).reshape(K, B)
                    trainer.state, loss_k = replay(
                        trainer.state, g["signals"], g["targets"],
                        trainer.rng, np.asarray(idx, np.int32),
                        g.get("masks"))
                else:
                    order_k = (rng_epoch.permutation(g["steps"])
                               if cache_shuffle else np.arange(g["steps"]))
                    trainer.state, loss_k = replay(
                        trainer.state, g["signals"], g["targets"],
                        trainer.rng, np.asarray(order_k, np.int32),
                        g.get("masks"))
                losses.append(loss_k)
                meter.update(g["n"], g["samples"] / sr if sr else 0.0)
            staged = iter(())
            collecting = None
        elif staged_cache is not None:
            # order-exact per-entry replay: the cache_shuffle=False
            # fallback when shape signatures interleave (consolidation
            # would reorder them); optionally with a fresh (seeded) batch
            # order each epoch
            if cache_shuffle:
                from lidbox_tpu import RANDOM_SEED
                order = np.random.default_rng(
                    RANDOM_SEED + epoch).permutation(len(staged_cache))
                staged = iter([staged_cache[i] for i in order])
            else:
                staged = iter(staged_cache)
            collecting = None
        elif spd > 1:
            staged = trainer._staged(
                lambda: _grouped(signal_batches),
                count_fn=lambda g: (
                    sum(int(np.shape(t)[0]) for _, t in g),
                    sum(np.shape(s)[0] * np.shape(s)[-1] for s, _ in g)),
                put=_stage_group)
            if trainer._multiprocess_feed():
                # grouped steps are collectives too — fail fast on uneven
                # per-host group counts instead of hanging
                staged = trainer._feed_parity_guard(staged,
                                                    what="fused training")
            collecting = [] if cache_staged else None
        else:
            staged = trainer._staged(
                signal_batches,
                count_fn=lambda b: (int(np.shape(b[1])[0]),
                                    int(np.size(b[0]))),
                put=lambda b: _stage(*b))
            if trainer._multiprocess_feed():
                # multi-host mesh: the fused train step is a collective —
                # agree on feed exhaustion before every step so uneven
                # local corpora raise a diagnostic instead of hanging
                # (Trainer._feed_parity_guard)
                staged = trainer._feed_parity_guard(staged,
                                                    what="fused training")
            collecting = [] if cache_staged else None
        if spd > 1:
            for (n, samples), (sig_k, tgt_k, mask_k) in staged:
                if collecting is not None:
                    collecting.append(((n, samples), (sig_k, tgt_k, mask_k)))
                    if not _cache_admit((sig_k, tgt_k, mask_k)):
                        collecting = None
                        cache_staged = False
                        val_staged = False
                trainer.state, loss_k = multi(trainer.state, sig_k, tgt_k,
                                              trainer.rng, mask_k)
                losses.append(loss_k)
                meter.update(n, samples / sr if sr else 0.0)
        else:
            for (n, samples), (signals, targets, mask) in staged:
                if collecting is not None:
                    collecting.append(((n, samples),
                                       (signals, targets, mask)))
                    if not _cache_admit((signals, targets, mask)):
                        collecting = None
                        cache_staged = False
                        val_staged = False
                trainer.state, loss = step(trainer.state, signals, targets,
                                           trainer.rng, mask)
                losses.append(loss)
                meter.update(n, samples / sr if sr else 0.0)
        if collecting is not None:
            # consolidate into per-shape stacks for whole-epoch scan
            # replay — mesh-sharded stacks under a mesh (None only when
            # cache_shuffle=False met interleaved shape signatures —
            # stack-major replay would reorder them)
            replay_groups = _consolidate_signal_cache(
                collecting, spd, preserve_order=not cache_shuffle,
                mesh=trainer.mesh)
            # the stacks ARE the cache once consolidation succeeds —
            # keeping the per-entry device buffers too would pin ~2x the
            # cached corpus in HBM for the whole run
            staged_cache = collecting if replay_groups is None else None
            collecting = None
        if not losses and not validating:
            # a one-shot iterator (generator) exhausts after epoch 1 and
            # would silently "train" on zero batches with loss=nan for
            # every remaining epoch
            raise ValueError(
                f"fused epoch {epoch} received no training batches — "
                "signal_batches must be a CALLABLE (or re-iterable "
                "collection) when epochs > 1; a generator is consumed by "
                "the first epoch")
        mean_loss = (float(jnp.mean(jnp.concatenate(
            [jnp.atleast_1d(l) for l in losses]))) if losses
            else float("nan"))
        if not validating:
            epoch_logs = {"loss": mean_loss, **meter.rates()}
            history.append(mean_loss)
            if trainer.metrics_logger:
                trainer.metrics_logger.log(epoch, epoch_logs)
            for cb in trainer.callbacks:
                cb.on_epoch_end(trainer, epoch, epoch_logs)
            if verbose:
                logger.info("fused epoch %d/%d: loss=%.6g", epoch, epochs,
                            mean_loss)
            if trainer.stop_training:
                break
            continue
        if cache_staged and val_staged not in (None, False):
            val_logs = trainer.evaluate(val_staged, staged=True)
        else:
            if val_feature_batches is not None:
                eval_batches = list(val_feature_batches()
                                    if callable(val_feature_batches)
                                    else val_feature_batches)
            else:
                # featurize the val set ONCE: the key is fixed, so the
                # result is identical every epoch whether the fn is the
                # clean val fn or the (then-frozen-noise) train fn —
                # re-running the chain + readback per epoch buys nothing
                if eval_cache is None:
                    eval_cache = _featurize_val(val_feats, val_batches)
                eval_batches = eval_cache
            if cache_staged and val_staged is not False:
                # stage the validation set ONCE; later epochs evaluate the
                # device-resident copy (frozen to epoch-1 contents, same
                # semantics as Trainer.fit's cache_staged). The entries
                # consolidate into per-shape stacks (mesh-sharded under a
                # mesh) so every evaluate() is one scanned program per
                # stack (Trainer._replay_eval_step) instead of one
                # dispatch round per batch.
                vsrc = trainer._staged(eval_batches)
                if trainer._multiprocess_feed():
                    # epoch-1 staging FIXES the per-host batch count for
                    # every later collective eval step — agree on it now
                    # (clear diagnostic) instead of hanging mid-epoch
                    vsrc = trainer._feed_parity_guard(vsrc,
                                                      what="validation")
                entries = list(vsrc)
                from lidbox_tpu.train.loop import _tree_device_nbytes
                vbytes = sum(_tree_device_nbytes(b) for _, b in entries)
                if cache_state["budget"] is None:
                    cache_state["budget"] = trainer._agreed_cache_budget()
                if (cache_state["bytes"] + 2.0 * vbytes
                        > cache_state["budget"]):
                    # training cache fit but validation stacks would push
                    # past the budget — keep the bigger win, stream eval
                    logger.warning(
                        "cache_staged: staged validation set (%.0f MB, "
                        "~2x transient) on top of the signal cache "
                        "(%.0f MB) exceeds the HBM budget (%.0f MB) — "
                        "streaming validation instead",
                        vbytes / 1e6, cache_state["bytes"] / 1e6,
                        cache_state["budget"] / 1e6)
                    val_staged = False
                    entries = None
                    val_logs = trainer.evaluate(eval_batches)
                else:
                    val_staged = trainer._consolidate_cache(entries,
                                                            grouped=False)
                    val_logs = trainer.evaluate(val_staged, staged=True)
            else:
                val_logs = trainer.evaluate(eval_batches)
        logs = {"loss": mean_loss, **meter.rates(), **val_logs}
        history.append(logs)
        if trainer.metrics_logger:
            trainer.metrics_logger.log(epoch, logs)
        for cb in trainer.callbacks:
            cb.on_epoch_end(trainer, epoch, logs)
        if verbose:
            logger.info("fused epoch %d/%d: %s", epoch, epochs, logs)
        if trainer.stop_training:
            break
    trainer.sync_model_variables()
    for cb in trainer.callbacks:
        cb.on_train_end(trainer)
    return history


def _featurize_val(val_feats, val_batches):
    eval_batches = []
    vit = val_batches() if callable(val_batches) else val_batches
    for i, (signals, targets) in enumerate(vit):
        # per-batch key: when the fn augments, batches must not all draw
        # the same noise/SNR pattern (clean fns ignore the key)
        out = val_feats(jax.random.fold_in(jax.random.PRNGKey(0), i),
                        jnp.asarray(signals))
        batch = {"target": np.asarray(targets)}
        if isinstance(out, tuple):
            batch["input"], batch["input_mask"] = (np.asarray(out[0]),
                                                   np.asarray(out[1]))
        else:
            batch["input"] = np.asarray(out)
        eval_batches.append(batch)
    return eval_batches


def make_fused_train_step(trainer, feature_fn, donate=False):
    """One jit program: raw waveforms -> on-device augmentation -> features
    -> model forward/backward -> optax update.

    Returns step(state, signals [B, T], targets [B], rng,
    example_mask=None) -> (new_state, loss); ``example_mask`` [B] excludes
    mesh-padding rows from the loss (fit_signals threads it). The host
    loop only supplies waveform batches.

    ``targets=None`` selects the PACKED staging layout: ``signals`` is
    [B+1, T] with the targets stored in row B's first B slots — one
    host->device transfer per step instead of two, which matters on
    high-round-trip feed links (each separate array pays its own round;
    see fit_signals' int16 staging).

    ``donate=True`` donates the incoming state's buffers (in-place param/
    opt-state updates, half the state HBM churn — same as
    Trainer._jit_train_step); only for strictly linear callers like
    fit_signals, which rebind ``trainer.state`` every step. The default
    stays non-donating because direct callers commonly hold onto the
    pre-step state.

    The returned step is cached per (trainer, feature_fn, donate):
    repeated fit_signals/fit_fused calls reuse the SAME jitted program
    instead of re-tracing.
    """
    cache = trainer.__dict__.setdefault("_fused_step_cache", {})
    key = (id(feature_fn), bool(donate))
    if key in cache:
        return cache[key][1]

    def step_fn(state, signals, targets, rng, example_mask=None):
        if targets is None:  # packed layout: last row carries the targets
            b = signals.shape[0] - 1
            targets = signals[-1, :b].astype(jnp.int32)
            signals = signals[:-1]
        signals = signals_to_float(signals)  # int16/bf16 staging decompress
        feat_key = jax.random.fold_in(rng, state.step)
        feats = feature_fn(jax.random.fold_in(feat_key, 7), signals)
        batch = {"target": targets}
        if isinstance(feats, tuple):  # length-tracking fn: (feats, mask)
            batch["input"], batch["input_mask"] = feats
        else:
            batch["input"] = feats
        if example_mask is not None:
            batch["example_mask"] = example_mask
        return trainer._train_step(state, batch, rng)
    step = jax.jit(step_fn, donate_argnums=(0,)) if donate \
        else jax.jit(step_fn)
    # hold the feature_fn reference so id() stays unique for the cache key
    cache[key] = (feature_fn, step)
    return step


def make_fused_replay_step(trainer, feature_fn, donate=False):
    """Whole-epoch cached replay for the fused path: ONE jit program scans
    ``order`` (a [K] int32 permutation) over device-resident stacked
    waveform batches — one dispatch + one loss-vector readback per epoch
    instead of one round per step or per K-group. Augmentation stays
    fresh per epoch: the per-step RNG folds in state.step, which advances
    inside the scan. The stack is NOT donated (it is reused every epoch);
    per-step batches come from dynamic_index_in_dim slices.

    step(state, signals_all [K, B(, +1), T], targets_all ([K, B] or None
    for the packed layout), rng, order [K], masks_all ([K, B] example
    masks or None — mesh-padded ragged rows)) -> (state, losses [K]).
    """
    cache = trainer.__dict__.setdefault("_fused_replay_cache", {})
    key = (id(feature_fn), bool(donate))
    if key in cache:
        return cache[key][1]
    single = make_fused_train_step(trainer, feature_fn)

    def replay_fn(state, signals_all, targets_all, rng, order,
                  masks_all=None):
        def body(st, i):
            sig = jax.lax.dynamic_index_in_dim(signals_all, i,
                                               keepdims=False)
            tgt = (None if targets_all is None
                   else jax.lax.dynamic_index_in_dim(targets_all, i,
                                                     keepdims=False))
            mask = (None if masks_all is None
                    else jax.lax.dynamic_index_in_dim(masks_all, i,
                                                      keepdims=False))
            st, loss = single(st, sig, tgt, rng, mask)
            return st, loss
        return jax.lax.scan(body, state, order)
    replay = jax.jit(replay_fn, donate_argnums=(0,)) if donate \
        else jax.jit(replay_fn)
    cache[key] = (feature_fn, replay)
    return replay


def make_fused_replay_rows_step(trainer, feature_fn, donate=False):
    """Whole-epoch cached replay with ROW-level reshuffle
    (cache_shuffle="rows") for the fused path: ``idx`` is a [K, B] int32
    permutation of the K*B cached waveform rows, so every epoch re-draws
    batch COMPOSITION — the device-resident analogue of the reference
    re-shuffling elements every epoch
    (reference: lidbox/data/steps.py:997-999), on top of the
    already-fresh per-epoch augmentation draws. Packed layouts
    ([K, B+1, T] with targets in row B) unpack once outside the scan;
    each step gathers its B rows from the flattened [K*B, T] view (a
    leading-axis sublane gather — no permuted HBM copy).

    step(state, signals_all [K, B(, +1), T], targets_all ([K, B] or None
    for the packed layout), rng, idx [K, B], masks_all) ->
    (state, losses [K]).
    """
    cache = trainer.__dict__.setdefault("_fused_replay_rows_cache", {})
    key = (id(feature_fn), bool(donate))
    if key in cache:
        return cache[key][1]
    single = make_fused_train_step(trainer, feature_fn)

    def replay_rows_fn(state, signals_all, targets_all, rng, idx,
                       masks_all=None):
        K, B = idx.shape
        if targets_all is None:  # packed: row B of each batch = targets
            tgt_flat = signals_all[:, B, :B].reshape(K * B).astype(jnp.int32)
            sig_flat = signals_all[:, :B, :].reshape(
                (K * B,) + signals_all.shape[2:])
        else:
            tgt_flat = targets_all.reshape(K * B)
            sig_flat = signals_all.reshape((K * B,) + signals_all.shape[2:])
        mask_flat = (None if masks_all is None
                     else masks_all.reshape(K * B))

        def body(st, rows):
            sig = jnp.take(sig_flat, rows, axis=0)
            tgt = jnp.take(tgt_flat, rows, axis=0)
            mask = (None if mask_flat is None
                    else jnp.take(mask_flat, rows, axis=0))
            st, loss = single(st, sig, tgt, rng, mask)
            return st, loss
        return jax.lax.scan(body, state, idx)
    replay = jax.jit(replay_rows_fn, donate_argnums=(0,)) if donate \
        else jax.jit(replay_rows_fn)
    cache[key] = (feature_fn, replay)
    return replay


_ones_mask_cache = {}


def _ones_mask_like(t):
    """All-True mask shaped like the targets, jit-compiled ONCE per
    (shape, dtype, sharding) — mixed masked/unmasked groups fill
    defensively without a throwaway XLA compile per cache entry."""
    sharding = getattr(t, "sharding", None)
    key = (tuple(t.shape), str(t.dtype), str(sharding))
    fn = _ones_mask_cache.get(key)
    if fn is None:
        fn = jax.jit(lambda x: jnp.ones(x.shape, bool),
                     out_shardings=sharding)
        _ones_mask_cache[key] = fn
    return fn(t)


def _consolidate_signal_cache(entries, spd, preserve_order=False, mesh=None):
    """Merge fit_signals' epoch-1 cache entries into per-shape device
    stacks for whole-epoch replay. Entries: ((n, samples), payload) with
    payload (signals, targets, mask) at spd == 1 or stacked
    (sig_k, tgt_k, mask_k) groups at spd > 1 (targets None = the packed
    int16 layout; mask None = no mesh-padding rows). Returns a list of
    group dicts {signals, targets, masks, n, samples, steps}, or None
    under ``preserve_order=True`` (the cache_shuffle=False contract) with
    INTERLEAVED shape signatures — stack-major replay would silently
    reorder the epoch-1 trajectory, so the caller keeps order-exact
    per-entry replay instead (Trainer._consolidate_cache has the same
    bail-out).

    With ``mesh``, entries are mesh-sharded (possibly non-addressable
    global) arrays and the stacks build through parallel.stack_on_mesh —
    scan axis replicated, batch axis keeping its sharding. Groups mixing
    masked (ragged mesh-padded) and unmasked entries fill the missing
    masks with all-True rows so one uniform [K, B] mask stack scans."""
    keys = []
    for (n, samples), payload in entries:
        sig, tgt, mask = payload
        inner = sig.shape[1:] if spd > 1 else sig.shape
        keys.append((tuple(inner), str(sig.dtype), tgt is None))
    from lidbox_tpu.train.loop import _signature_runs_contiguous
    if preserve_order and not _signature_runs_contiguous(keys):
        return None
    order, groups = [], {}
    for ((n, samples), payload), key in zip(entries, keys):
        sig, tgt, mask = payload
        if key not in groups:
            groups[key] = {"sigs": [], "tgts": [], "masks": [], "n": 0,
                           "samples": 0, "steps": 0}
            order.append(key)
        g = groups[key]
        g["sigs"].append(sig)
        if tgt is not None:
            g["tgts"].append(tgt)
        g["masks"].append(mask)
        g["n"] += int(n)
        g["samples"] += int(samples)
        g["steps"] += (sig.shape[0] if spd > 1 else 1)
    out = []
    for key in order:
        g = groups[key]
        masks = g["masks"]
        if all(m is None for m in masks):
            masks = None
        else:
            # fill unmasked entries with all-True rows (shaped like the
            # targets) so the group stacks into one uniform mask array;
            # the fill runs jitted with the target's own sharding so
            # global arrays stay where the scan wants them, compiled once
            # per (shape, sharding) — not once per entry
            masks = [m if m is not None else _ones_mask_like(t)
                     for m, t in zip(masks, g["tgts"])]
        if mesh is not None:
            trees = [{"signals": s,
                      **({"targets": t} if g["tgts"] else {}),
                      **({"masks": m} if masks is not None else {})}
                     for s, t, m in zip(
                         g["sigs"],
                         g["tgts"] or [None] * len(g["sigs"]),
                         masks or [None] * len(g["sigs"]))]
            from lidbox_tpu import parallel
            stacked = parallel.stack_on_mesh(trees, mesh, concat=spd > 1)
            sig_all = stacked["signals"]
            tgt_all = stacked.get("targets")
            mask_all = stacked.get("masks")
        else:
            cat = jnp.concatenate if spd > 1 else jnp.stack
            sig_all = cat(g["sigs"])
            tgt_all = cat(g["tgts"]) if g["tgts"] else None
            mask_all = cat(masks) if masks is not None else None
        out.append({
            "signals": sig_all, "targets": tgt_all, "masks": mask_all,
            "n": g["n"], "samples": g["samples"], "steps": g["steps"]})
    return out


def make_fused_multi_step(trainer, feature_fn, donate=False):
    """Grouped dispatch for high-round-trip feed links: ONE jit program
    runs K fused train steps (lax.scan) over a [K, ...] stack of staged
    batches, so K steps cost one host->device transfer round and one
    dispatch round instead of K of each. Per-step numerics are IDENTICAL
    to K single dispatches (the step RNG folds in state.step, which
    advances inside the scan).

    step(state, signals_k, targets_k, rng, masks_k=None) ->
    (state, losses [K]); ``targets_k=None`` selects the packed layout
    ([K, B+1, T], targets in each stack's last row); ``masks_k`` [K, B]
    excludes mesh-padding rows per step. jit re-specializes per distinct
    K (the full group size and one tail size in practice). ``donate`` as
    in make_fused_train_step (state buffers only).
    """
    cache = trainer.__dict__.setdefault("_fused_multi_cache", {})
    key = (id(feature_fn), bool(donate))
    if key in cache:
        return cache[key][1]
    single = make_fused_train_step(trainer, feature_fn)

    def multi_fn(state, signals_k, targets_k, rng, masks_k=None):
        def body(st, xs):
            st, loss = single(st, xs["sig"], xs.get("tgt"), rng,
                              xs.get("mask"))
            return st, loss
        xs = {"sig": signals_k}
        if targets_k is not None:
            xs["tgt"] = targets_k
        if masks_k is not None:
            xs["mask"] = masks_k
        return jax.lax.scan(body, state, xs)
    multi = jax.jit(multi_fn, donate_argnums=(0,)) if donate \
        else jax.jit(multi_fn)
    cache[key] = (feature_fn, multi)
    return multi
