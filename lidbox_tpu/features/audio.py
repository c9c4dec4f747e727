"""
Audio DSP kernels in pure JAX, designed for XLA on TPU.

Capability parity with the reference DSP layer
(reference: lidbox/features/audio.py), redesigned TPU-first:

- every kernel is jit-compatible with static shapes (frame counts derive from
  static signal lengths; ragged results are expressed as value + mask),
- the STFT can run either through XLA's native FFT or as a *matmul-DFT*
  (frames @ windowed-DFT basis) that maps onto the TPU MXU and fuses with the
  mel projection — see ``spectrograms(..., method=...)``,
- data-dependent constructs of the reference (boolean_mask VAD trimming,
  run-length smoothing) are reformulated as fixed-shape segment operations.

Host-side IO (wav read/write) lives in ``lidbox_tpu.features.io``.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import mel_ops


# ---------------------------------------------------------------------------
# Scalar helpers
# ---------------------------------------------------------------------------

def dBFS_to_linear(level):
    """10^(dB/20) (reference: lidbox/features/audio.py:50-52)."""
    return jnp.power(10.0, jnp.asarray(level, jnp.float32) / 20.0)


def ms_to_frames(sample_rate, ms):
    """Milliseconds to sample count (reference: lidbox/features/audio.py:185-189).

    Python-int version: sample_rate and ms are static pipeline configuration,
    so frame counts stay compile-time constants.
    """
    return int(sample_rate * 1e-3 * ms)


def log10(x):
    return jnp.log(x) / np.log(10.0).astype(np.float32)


# ---------------------------------------------------------------------------
# Amplitude utilities
# ---------------------------------------------------------------------------

def peak_normalize(signal, dBFS=0.0):
    """Scale so the peak amplitude sits at the given dBFS level
    (reference: lidbox/features/audio.py:55-60). An all-zero (silent or
    fully padded) signal returns zeros instead of 0/0 = NaN."""
    peak = jnp.max(jnp.abs(signal))
    safe = jnp.where(peak == 0, 1.0, peak)
    return dBFS_to_linear(dBFS) * jnp.where(peak == 0, 0.0, signal / safe)


def root_mean_square(x, axis=-1, keepdims=False):
    """sqrt(mean(|x|^2)) (reference: lidbox/features/audio.py:264-271)."""
    return jnp.sqrt(jnp.mean(jnp.square(jnp.abs(x)), axis=axis, keepdims=keepdims))


def _masked_rms(x, mask, axis=-1, keepdims=False):
    """RMS over elements where mask is True."""
    mask = mask.astype(x.dtype)
    total = jnp.sum(jnp.square(x) * mask, axis=axis, keepdims=keepdims)
    count = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=keepdims), 1.0)
    return jnp.sqrt(total / count)


def power_to_db(S, amin=1e-10, top_db=80.0):
    """Power/amplitude to decibel with a dynamic-range floor.

    Matches the reference exactly, including its use of 20*log10 and the
    *global* max over the whole (batched) tensor
    (reference: lidbox/features/audio.py:167-174).
    """
    amin = jnp.float32(amin)
    db = 20.0 * (log10(jnp.maximum(amin, S)) - log10(jnp.maximum(amin, jnp.max(S))))
    return jnp.maximum(db, jnp.max(db) - top_db)


def db_to_power(S):
    """(reference: lidbox/features/audio.py:177-181)"""
    return jnp.power(10.0, S / 20.0)


def fft_frequencies(sample_rate, n_fft):
    """Center frequency of each rFFT bin, equal to librosa.fft_frequencies
    (reference: lidbox/features/audio.py:151-159)."""
    return jnp.linspace(0.0, sample_rate // 2, 1 + n_fft // 2)


# ---------------------------------------------------------------------------
# Framing and windows
# ---------------------------------------------------------------------------

def frame(signal, frame_length, frame_step, axis=-1, pad_end=False):
    """Slice ``signal`` into overlapping frames along ``axis``.

    Equivalent to tf.signal.frame with static frame counts. Output inserts a
    new axis of frames at ``axis`` position, frame samples at ``axis + 1``.
    """
    axis = axis % signal.ndim
    n = signal.shape[axis]
    if pad_end:
        num_frames = -(-max(n, 0) // frame_step)
        pad = (num_frames - 1) * frame_step + frame_length - n
        widths = [(0, 0)] * signal.ndim
        widths[axis] = (0, max(pad, 0))
        signal = jnp.pad(signal, widths)
    else:
        num_frames = max(0, 1 + (n - frame_length) // frame_step)
    starts = np.arange(num_frames) * frame_step
    idx = starts[:, None] + np.arange(frame_length)[None, :]  # [F, L]
    out = jnp.take(signal, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = signal.shape[:axis] + (num_frames, frame_length) + signal.shape[axis + 1:]
    return out.reshape(new_shape)


def hann_window(window_length, periodic=True, dtype=jnp.float32):
    """Periodic Hann window, matching tf.signal.hann_window defaults used by
    tf.signal.stft (reference STFT at lidbox/features/audio.py:226-230).

    tf.signal's raised-cosine denominator is
    ``window_length + periodic * (1 - window_length % 2) - 1``: the length
    for even periodic windows, length - 1 otherwise (the same convention as
    the reference's blackman_window, lidbox/features/audio.py:206-209).
    """
    even = 1 - window_length % 2
    n = window_length + int(periodic) * even - 1
    count = np.arange(window_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * count / n)
    return jnp.asarray(w, dtype)


def blackman_window(window_length, periodic=True, alpha=0.16, dtype=jnp.float32):
    """Cosine-sum Blackman window (reference: lidbox/features/audio.py:192-216)."""
    assert window_length > 1, "unit length window not supported"
    a0, a1, a2 = (1 - alpha) / 2, 0.5, alpha / 2
    even = 1 - window_length % 2
    n = window_length + int(periodic) * even - 1
    count = np.arange(window_length, dtype=np.float64)
    w = (a0
         - a1 * np.cos(2.0 * np.pi * count / n)
         + a2 * np.cos(4.0 * np.pi * count / n))
    return jnp.asarray(w, dtype)


# ---------------------------------------------------------------------------
# STFT / spectrograms
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _windowed_dft_basis(frame_length, fft_length):
    """Real/imag DFT basis with the periodic Hann window folded in.

    rfft(w * x)[k] = sum_n x[n] * w[n] * exp(-2pi i n k / N). Returning
    cos/sin matrices of shape [frame_length, fft_length//2 + 1] lets the STFT
    run as two MXU matmuls instead of an FFT — on TPU the systolic array makes
    this faster than the generic FFT lowering for these sizes, and it fuses
    with the downstream mel projection matmul.
    """
    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(fft_length // 2 + 1, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / fft_length
    # periodic Hann with tf.signal's raised-cosine denominator (length for
    # even windows, length - 1 for odd — see hann_window)
    denom = frame_length + (1 - frame_length % 2) - 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    cos_b = np.asarray(w * np.cos(ang), np.float32)
    sin_b = np.asarray(w * np.sin(ang), np.float32)
    if fft_length < frame_length:
        # tf.signal.stft rffts only the first fft_length samples of each
        # windowed frame; zeroed basis rows reproduce that truncation
        cos_b[fft_length:] = 0.0
        sin_b[fft_length:] = 0.0
    return cos_b, sin_b


@functools.lru_cache(maxsize=16)
def _packed_dft_basis(frame_length, fft_length):
    """Windowed DFT basis packed into exactly ``fft_length`` columns.

    sin(-2pi n k / N) is identically zero at k=0 and k=N/2 (integer n), so
    those two imaginary columns are dropped: cos columns 0..N/2 plus sin
    columns 1..N/2-1 pack the full rDFT into N lanes — on the 128-lane MXU
    a 512-point rDFT then has ZERO lane padding (vs 640 effective lanes for
    the naive cos|sin concat). Bit-identical spectra: the dropped columns
    contribute imag = 0.
    """
    cos_b, sin_b = _windowed_dft_basis(frame_length, fft_length)
    return np.concatenate([cos_b, sin_b[:, 1:fft_length // 2]], axis=1)


# DSP matmul precision modes. "highest" (f32, 6 bf16 MXU passes) holds the
# 1e-4 tf.signal parity budget. "bf16_3x" (3 passes) is ~1.75x faster on the
# MXU with max log-mel error ~1.5e-3 vs float64 (measured, v5e) — fine for
# training/augmentation pipelines, NOT for parity-checked feature dumps.
# "bf16" (1 pass, Precision.DEFAULT) is the throughput ceiling: inputs
# rounded straight to bfloat16 AND the HBM intermediates stored bf16 (see
# stft) — the chain is bandwidth-bound, so storage is where the last 30%
# lives (b512x3 s log-mel: 2.06 ms bf16_3x -> 1.03 ms; full bf16 train
# step 6.5 -> 5.5 ms = 74% MFU, v5e). Measured log-mel error vs "highest"
# (white-noise input): mean 2.5e-3, p99 1.1e-2, max ~0.3 concentrated at
# low-energy bins near the log floor. Use only where downstream noise
# dominates (SpecAugment/noise-mix training pipelines).
DSP_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "bf16_3x": "BF16_BF16_F32_X3",
    "bf16_6x": "BF16_BF16_F32_X6",
    "bf16": jax.lax.Precision.DEFAULT,
}


def dsp_precision(precision):
    if precision in DSP_PRECISIONS:
        return DSP_PRECISIONS[precision]
    return precision  # already a jax Precision / algorithm name


def _segment_dft(signals, frame_length, frame_step, fft_length, prec,
                 store_dtype=None):
    """Windowed-DFT STFT as step-aligned segment matmuls — no frame tensor.

    Frames start on multiples of ``frame_step``, so viewing the signal as
    rows of ``frame_step`` samples makes frame f exactly rows
    f, f+1, ..., f+n_seg-1 (the last one partial). The DFT then runs as
    n_seg matmuls on *shifted slices of one reshape* — XLA reads the signal
    ~n_seg times but never writes the gathered [B, frames, frame_length]
    tensor to HBM, which measures faster than gather+matmul on v5e
    and dominates at long audio lengths (16x at b32 x 60 s). Same FLOPs,
    same sum order per segment (within 1e-4 of tf.signal). The basis is
    lane-packed (_packed_dft_basis): returns (real [.., K], imag_mid
    [.., K-2]) where imag[0] = imag[K-1] = 0 are implicit.

    ``store_dtype=bfloat16`` (the 1-pass "bf16" mode) stores the matmul
    INPUTS in bf16 — identical numerics to the mode's MXU input rounding,
    half the signal-read bandwidth (the signal is read n_seg times);
    accumulation stays f32 via preferred_element_type.
    """
    T = signals.shape[-1]
    num_frames = max(0, 1 + (T - frame_length) // frame_step)
    n_seg = -(-frame_length // frame_step)
    num_rows = num_frames + n_seg
    pad = num_rows * frame_step - T
    if pad > 0:
        widths = [(0, 0)] * (signals.ndim - 1) + [(0, pad)]
        signals = jnp.pad(signals, widths)
    if store_dtype is not None:
        signals = signals.astype(store_dtype)
    rows = signals.reshape(signals.shape[:-1] + (num_rows, frame_step))
    if fft_length % 2 == 0:
        # lane-packed basis: valid only for even N (sin is identically
        # zero at k=0 AND k=N/2); imag[0]=imag[N/2]=0 are implicit
        basis = _packed_dft_basis(frame_length, fft_length)  # [L, N]
    else:
        cos_b, sin_b = _windowed_dft_basis(frame_length, fft_length)
        basis = np.concatenate([cos_b, sin_b[:, 1:]], axis=1)
    acc = None
    for i in range(n_seg):
        width = min(frame_step, frame_length - i * frame_step)
        seg = rows[..., i:i + num_frames, :width]
        basis_i = jnp.asarray(basis[i * frame_step:i * frame_step + width])
        if store_dtype is not None:
            basis_i = basis_i.astype(store_dtype)
        out = jnp.matmul(seg, basis_i, precision=prec,
                         preferred_element_type=jnp.float32)
        acc = out if acc is None else acc + out
    num_bins = fft_length // 2 + 1
    return acc[..., :num_bins], acc[..., num_bins:]


def stft(signals, frame_length, frame_step, fft_length=512, method="fft",
         precision="highest"):
    """Short-time Fourier transform over the last axis.

    Matches tf.signal.stft semantics: periodic Hann window of
    ``frame_length``, frames zero-padded to ``fft_length``, no end padding.

    method="fft": XLA native rFFT (returns complex64).
    method="matmul": windowed-DFT segment matmuls on the MXU (returns
    (real, imag)) without materializing a frame tensor (_segment_dft);
    ``precision`` picks the MXU pass count (see DSP_PRECISIONS).

    A radix-4 DIT factorization (4x fewer matmul FLOPs) was built and
    measured AGAINST this path on v5e: 4.8 ms vs 1.8 ms (b256x3 s,
    highest) and 4.75 vs 1.13 ms (bf16_3x) — the decimated [.., M=L/4, 4]
    layout forces small-K batched matmuls the MXU tiles poorly, while the
    direct basis keeps one large-K contraction. Direct wins on TPU;
    docs/status.md records the experiment.
    """
    if method == "matmul":
        prec = dsp_precision(precision)
        # 1-pass "bf16" mode: the MXU rounds matmul inputs to bf16
        # regardless, so storing the HBM intermediates (frame tensor,
        # real/imag spectra) in bf16 changes numerics only by the output
        # rounding while HALVING the bandwidth the chain is bound by —
        # measured 1.41 -> 0.97 ms for the b512x3 s log-mel chain on v5e
        # (log-mel error vs highest: mean 2.2e-3 -> 2.5e-3, p99 1.0e-2 ->
        # 1.1e-2; same training-grade bucket). Keyed on the MODE NAME:
        # explicit jax Precision objects keep f32 storage.
        store = jnp.bfloat16 if precision == "bf16" else None
        T = signals.shape[-1]
        num_frames = max(0, 1 + (T - frame_length) // frame_step)
        batch = int(np.prod(signals.shape[:-1], dtype=np.int64))
        num_zero_sin = 2 if fft_length % 2 == 0 else 1  # k=0 (+ Nyquist)
        # Formulation choice, measured on v5e (min-per-leg delta timing,
        # interleaved): the gathered-frame single matmul wins only for
        # LARGE batches of SHORT clips (b128-b512 x 3 s: 5-26% faster);
        # the gather-free segment matmuls win at small batch (b32-b64:
        # 1.2-1.6x) and at long audio (b32 x 60 s: 16x, b256 x 10 s: 1.1x)
        # where the [batch, frames, frame_length] HBM frame tensor
        # dominates.
        if batch >= 128 and num_frames <= 512:
            frames = frame(signals, frame_length, frame_step, axis=-1)
            cos_b, sin_b = _windowed_dft_basis(frame_length, fft_length)
            cos_b, sin_b = jnp.asarray(cos_b), jnp.asarray(sin_b)
            if store is not None:
                frames = frames.astype(store)
                cos_b, sin_b = cos_b.astype(store), sin_b.astype(store)
            out_t = store if store is not None else jnp.float32
            real = jnp.matmul(frames, cos_b, precision=prec,
                              preferred_element_type=out_t)
            imag = jnp.matmul(frames, sin_b, precision=prec,
                              preferred_element_type=out_t)
            return real, imag
        real, imag_mid = _segment_dft(signals, frame_length, frame_step,
                                      fft_length, prec, store_dtype=store)
        zeros = jnp.zeros(real.shape[:-1] + (1,), real.dtype)
        parts = [zeros, imag_mid] + [zeros] * (num_zero_sin - 1)
        return real, jnp.concatenate(parts, axis=-1)
    frames = frame(signals, frame_length, frame_step, axis=-1)
    window = hann_window(frame_length)
    frames = frames * window
    if fft_length > frame_length:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, fft_length - frame_length)]
        frames = jnp.pad(frames, pad)
    else:
        frames = frames[..., :fft_length]
    return jnp.fft.rfft(frames, n=fft_length, axis=-1)


def spectrograms(signals, sample_rate, frame_length_ms=25, frame_step_ms=10,
                 power=2.0, fft_length=512, method="fft", precision="highest"):
    """|STFT|^power over batched signals [B, T]
    (reference: lidbox/features/audio.py:219-230).

    power=2 (default) gives power spectrograms; shape [B, frames, bins].
    """
    frame_length = ms_to_frames(sample_rate, frame_length_ms)
    frame_step = ms_to_frames(sample_rate, frame_step_ms)
    S = stft(signals, frame_length, frame_step, fft_length=fft_length,
             method=method, precision=precision)
    if method == "matmul":
        real, imag = S
        # f32 squares/sums even when the spectra are stored bf16 (the
        # 1-pass mode); the upcast fuses into the elementwise epilogue
        real = real.astype(jnp.float32)
        imag = imag.astype(jnp.float32)
        psd = real * real + imag * imag
        if power == 2.0:
            return psd
        return jnp.power(jnp.sqrt(psd), power)
    return jnp.power(jnp.abs(S), power)


def linear_to_mel(S, sample_rate, num_mel_bins=40, fmin=0.0, fmax=8000.0,
                  precision="highest"):
    """Project spectrogram bins onto the mel filterbank
    (reference: lidbox/features/audio.py:247-261)."""
    weights = jnp.asarray(mel_ops.linear_to_mel_weight_matrix(
        num_mel_bins=num_mel_bins,
        num_spectrogram_bins=S.shape[-1],
        sample_rate=sample_rate,
        lower_edge_hertz=float(fmin),
        upper_edge_hertz=float(fmax)))
    return jnp.matmul(S, weights, precision=dsp_precision(precision))


def melspectrograms(S, sample_rate, num_mel_bins=40, fmin=0.0, fmax=8000.0):
    """Alias for linear_to_mel. The reference pipeline called
    ``audio_features.melspectrograms`` which did not exist — a latent bug
    (reference: lidbox/data/tf_utils.py:175 vs lidbox/features/audio.py:253);
    this framework provides both names."""
    return linear_to_mel(S, sample_rate, num_mel_bins=num_mel_bins, fmin=fmin, fmax=fmax)


def drop_frequency_bins(S, sample_rate, fft_length, fmin, fmax):
    """Keep only fft bins inside [fmin, fmax]
    (reference: lidbox/features/audio.py:233-244). Static-shape: the band
    mask depends only on configuration, so it is computed with numpy."""
    freqs = np.linspace(0.0, sample_rate // 2, 1 + fft_length // 2)
    keep = np.flatnonzero((fmin <= freqs) & (freqs <= fmax))
    return jnp.take(S, jnp.asarray(keep), axis=2)


def mfcc(log_mel, coef_begin=1, coef_end=13):
    """MFCCs from log-mel via orthonormal DCT-II, matching
    tf.signal.mfccs_from_log_mel_spectrograms (used at
    reference lidbox/data/tf_utils.py:178-184), sliced to [coef_begin, coef_end).
    """
    num_mel = log_mel.shape[-1]
    # Orthonormal DCT-II basis as a matmul (MXU-friendly).
    n = np.arange(num_mel, dtype=np.float64)
    k = np.arange(num_mel, dtype=np.float64)
    basis = 2.0 * np.cos(np.pi * k[None, :] * (2.0 * n[:, None] + 1.0) / (2.0 * num_mel))
    # tf.signal scales the type-II DCT by 1/sqrt(2*N) and applies NO
    # sqrt(2) correction to coefficient 0 (a deliberate deviation from
    # scipy's 'ortho' norm — verified against the TF oracle; an ortho c0
    # correction here measured exactly sqrt(2) off).
    basis *= 1.0 / np.sqrt(2.0 * num_mel)
    coeffs = jnp.matmul(log_mel, jnp.asarray(basis, jnp.float32),
                        precision=jax.lax.Precision.HIGHEST)
    return coeffs[..., coef_begin:coef_end]


# ---------------------------------------------------------------------------
# Augmentation
# ---------------------------------------------------------------------------

def snr_mixer(clean, noise, snr):
    """Mix ``noise`` into ``clean`` at the given SNR (dB), MS-SNSD style:
    both normalized to -25 dBFS first (reference: lidbox/features/audio.py:124-148).

    Returns (clean_norm, noise_at_new_level, noisy_speech).
    """
    scalarclean = dBFS_to_linear(-25.0) / root_mean_square(clean)
    clean_norm = scalarclean * clean
    rmsclean = root_mean_square(clean_norm)

    scalarnoise = dBFS_to_linear(-25.0) / root_mean_square(noise)
    noise_norm = scalarnoise * noise
    rmsnoise = root_mean_square(noise_norm)

    level = dBFS_to_linear(snr)
    noisescalar = jnp.sqrt(rmsclean / level / rmsnoise)
    noisenewlevel = noisescalar * noise_norm
    return clean_norm, noisenewlevel, clean_norm + noisenewlevel


def snr_mixer_batch(clean, noise, snr, mask=None):
    """Batched, mask-aware SNR mixer over [B, T] signals.

    ``mask`` marks valid samples of ``clean``; RMS statistics ignore padding
    so padded buckets reproduce unpadded numerics. ``snr`` is [B] dB values.
    """
    if mask is None:
        mask = jnp.ones_like(clean, dtype=bool)
    rms_c = _masked_rms(clean, mask, axis=-1, keepdims=True)
    clean_norm = clean * (dBFS_to_linear(-25.0) / rms_c)
    rmsclean = _masked_rms(clean_norm, mask, axis=-1, keepdims=True)

    rms_n = _masked_rms(noise, mask, axis=-1, keepdims=True)
    noise_norm = noise * (dBFS_to_linear(-25.0) / rms_n)
    rmsnoise = _masked_rms(noise_norm, mask, axis=-1, keepdims=True)

    level = dBFS_to_linear(snr)[:, None]
    noisescalar = jnp.sqrt(rmsclean / level / rmsnoise)
    noisy = clean_norm + noisescalar * noise_norm
    return jnp.where(mask, noisy, 0.0)


def fir_filter(signal, fir):
    """Causal FIR filtering, equal to scipy.signal.lfilter(fir, 1.0, signal)
    (reference: lidbox/features/audio.py:63-74). Runs as an XLA convolution."""
    num_coefs = fir.shape[0]
    padded = jnp.pad(signal, (num_coefs - 1, 0))
    # correlate(padded, reversed fir) == causal convolution
    return jnp.convolve(padded, fir, mode="valid")


def random_gaussian_fir_filter(key, signal, num_coefs):
    """Random-normal FIR channel simulation augmentation
    (reference: lidbox/features/audio.py:63-74; Interspeech 2018 mic/channel
    simulation). Explicit PRNG key replaces tf.random global state."""
    fir = jax.random.normal(key, (num_coefs,), dtype=signal.dtype)
    return fir_filter(signal, fir)


# ---------------------------------------------------------------------------
# Run-length tools and VAD
# ---------------------------------------------------------------------------

def run_length_encoding(v):
    """Positions and lengths of equal-value runs
    (reference: lidbox/features/audio.py:274-283).

    Returns fixed-shape [T] arrays (pos, lengths, num_runs): entries at index
    >= num_runs are padding. This keeps the op jit-compatible; host callers
    can slice with num_runs.
    """
    v = jnp.asarray(v)
    t = v.shape[0]
    change = jnp.concatenate([jnp.ones((1,), bool), v[1:] != v[:-1]])
    run_id = jnp.cumsum(change) - 1                      # [T] in [0, T)
    num_runs = run_id[-1] + 1
    lengths = jax.ops.segment_sum(jnp.ones(t, jnp.int32), run_id, num_segments=t)
    pos = jnp.where(change, jnp.arange(t), t)
    pos = jnp.sort(pos)                                   # run start positions, padded with T
    pos = jnp.where(jnp.arange(t) < num_runs, pos, 0)
    return pos, lengths, num_runs


def invert_too_short_consecutive_false(mask, min_length):
    """Flip False-runs shorter than ``min_length`` to True (VAD smoothing,
    reference: lidbox/features/audio.py:286-296).

    Fixed-shape reformulation: label each run by cumsum of change points and
    broadcast each run's length back with a segment-sum + gather, instead of
    the reference's ragged RLE + tf.repeat.
    """
    if min_length <= 0:
        return mask
    t = mask.shape[0]
    change = jnp.concatenate([jnp.ones((1,), bool), mask[1:] != mask[:-1]])
    run_id = jnp.cumsum(change) - 1
    run_len = jax.ops.segment_sum(jnp.ones(t, jnp.int32), run_id, num_segments=t)
    my_run_len = run_len[run_id]
    return jnp.logical_or(mask, my_run_len < min_length)


def framewise_rms_energy_vad_decisions(signal, sample_rate, frame_step_ms,
                                       min_non_speech_ms=0, strength=0.05,
                                       min_rms_threshold=1e-3):
    """Energy VAD: True for frames whose RMS exceeds strength * mean RMS
    (reference: lidbox/features/audio.py:299-329).

    ``signal`` is a single [T] waveform; returns [num_frames] bool.
    """
    frame_step = ms_to_frames(sample_rate, frame_step_ms)
    frames = frame(signal, frame_step, frame_step, axis=0)
    rms = root_mean_square(frames, axis=1)
    mean_rms = jnp.mean(rms)
    threshold = strength * jnp.maximum(min_rms_threshold, mean_rms)
    decisions = rms > threshold
    min_non_speech_frames = ms_to_frames(sample_rate, min_non_speech_ms) // frame_step
    return invert_too_short_consecutive_false(decisions, min_non_speech_frames)


def framewise_rms_energy_vad_decisions_batch(signals, lengths, sample_rate,
                                             frame_step_ms, min_non_speech_ms=0,
                                             strength=0.05, min_rms_threshold=1e-3):
    """Batched, padding-aware energy VAD over [B, T] signals.

    Mean RMS is computed over valid frames only, so padded buckets match the
    per-utterance reference numerics. Returns [B, num_frames] bool; padded
    frames are False.
    """
    frame_step = ms_to_frames(sample_rate, frame_step_ms)
    frames = frame(signals, frame_step, frame_step, axis=-1)  # [B, F, L]
    num_frames = frames.shape[1]
    valid = (jnp.arange(num_frames)[None, :] * frame_step + frame_step) <= lengths[:, None]
    rms = root_mean_square(frames, axis=2)
    vmask = valid.astype(rms.dtype)
    mean_rms = jnp.sum(rms * vmask, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(vmask, axis=1, keepdims=True), 1.0)
    threshold = strength * jnp.maximum(min_rms_threshold, mean_rms)
    decisions = (rms > threshold) & valid
    min_non_speech_frames = ms_to_frames(sample_rate, min_non_speech_ms) // frame_step
    if min_non_speech_frames > 0:
        # Mark padding True before smoothing so a trailing short non-speech
        # run in the real signal keeps its true run length (it must not
        # merge with the padding's False run, which would stop it from
        # being inverted — per-utterance parity), then re-mask.
        smooth = jax.vmap(
            lambda m: invert_too_short_consecutive_false(m, min_non_speech_frames))
        decisions = smooth(decisions | ~valid) & valid
    return decisions


def remove_silence(signal, rate, window_ms=10, min_non_speech_ms=300):
    """Drop unvoiced 10 ms windows using the energy VAD
    (reference: lidbox/features/audio.py:332-353).

    Data-dependent output length: returns (trimmed_signal, num_valid) where
    ``trimmed_signal`` has the voiced windows compacted to the front and
    zero padding at the back, so it stays jit-compatible. Host callers can
    slice with num_valid; device pipelines carry the count as a mask.
    """
    window_frames = (window_ms * rate) // 1000
    vad = framewise_rms_energy_vad_decisions(
        signal=signal, sample_rate=rate, frame_step_ms=window_ms,
        min_non_speech_ms=min_non_speech_ms, strength=0.1)
    windows = frame(signal, window_frames, window_frames, axis=0)  # [F, W]
    num_windows = windows.shape[0]
    # Stable compaction: voiced windows keep relative order at the front.
    order = jnp.argsort(jnp.where(vad, jnp.arange(num_windows), num_windows))
    compacted = windows[order]
    keep = jnp.sum(vad)
    mask = (jnp.arange(num_windows) < keep)[:, None]
    trimmed = jnp.where(mask, compacted, 0.0).reshape(-1)
    return trimmed, keep * window_frames
