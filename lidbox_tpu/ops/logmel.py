"""
Fused waveform -> log-Mel Pallas kernel for TPU.

The hot path's memory-lean variant (reference equivalent: tf.signal.stft
+ mel matmul + log inside the tf.data graph,
lidbox/data/tf_utils.py:166-195). The DEFAULT path is the XLA
segment-matmul STFT in features.audio (gather-free, lane-packed basis);
``fused_logmel_packed`` (stft_method="pallas") is the VMEM-streaming
alternative: ONE kernel computes frames -> windowed DFT -> power -> mel
-> log per tile, so neither the [B, frames, frame_length] frame tensor
NOR the [B, frames, fft/2] power spectrogram ever materializes in HBM —
HBM traffic is 1x signal in + 1x log-mel out. That makes it the
lowest-peak-memory formulation for long audio (the XLA path must spill
the power spectrogram between its two matmuls: matmul->matmul never
fuses), at a measured ~10-25% time cost.

Kernel principles: (a) signal rows pre-packed host-side into lane-padded
interleaved streams (Mosaic rejects unaligned dynamic 1-D loads), (b)
the n_seg shifted views lane-concatenated into ONE large-K MXU matmul
with cos|sin fused into a single output (small-K accumulating dots
underutilize the systolic array), (c) 80-sample segments (640-wide
contraction vs 768 naive), (d) the zero-mel-weight Nyquist bin dropped
(exactly 2x256 output lanes, no padding).

Measurement history (TPU v5e; BENCH_r01/r02, in-process A/B):
- r01: three variants built; manual-DMA ``fused_logmel`` 3.6 ms/b256x3s,
  BlockSpec-pipelined ``fused_logmel_pipelined`` 2.8 ms, packed 2.33 ms —
  each a strict improvement, and packed beat the then-default
  frame-gather XLA path 13x at b32x60s.
- r02: the XLA segment-matmul STFT rewrite (features/audio.py) overtook
  every Pallas variant on TIME at all measured shapes (1.85 vs 2.33 ms at
  b256x3s; 9.1 vs 10.1 ms at b32x60s), so the two dominated variants were
  deleted and this file keeps only ``fused_logmel_packed`` as the
  documented low-peak-memory option (bench.py long-audio section reports
  the compiled peak-memory comparison alongside the times).
- r03: ``precision="bf16"`` added to the kernel (bf16 streams/bases,
  1-pass dots, f32 accumulation) — at LONG AUDIO it beats the
  bf16-stored XLA path on time too: 3.3/3.4 vs 5.4/5.4 ms at b32x60s
  (1.6x, two interleaved passes), because the kernel never spills the
  power spectrogram while the XLA path re-reads it around the mel
  matmul. Short-clip large batch stays with XLA (1.41 vs 1.04 ms at
  b512x3s — the per-(batch,tile) grid is too fine there). Numerics are
  distribution-identical to the XLA bf16 mode (mean 2.16e-3 vs highest,
  measured on-chip).

``logmel_conv`` (XLA strided-convolution formulation) and
``logmel_reference`` (the features.audio parity path) remain as oracle
baselines. All variants match tf.signal numerics to ~1e-4 (power
spectrum x HTK mel, periodic Hann, fft_length 512, no pad_end).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import lidbox_tpu.features.audio as audio
from lidbox_tpu.features import mel_ops

LANE = 128


def _round_up(x, m):
    return -(-x // m) * m


@functools.lru_cache(maxsize=16)
def _bases(frame_length, fft_length, num_mel_bins, sample_rate, fmin, fmax,
           mel_dtype=np.float32):
    """(Wc, Ws, M) padded for TPU lanes.

    Wc/Ws: [K_pad, NB_pad] windowed DFT cos/sin bases (K_pad >= frame_length
    zero-padded, NB_pad >= num_bins), M: [NB_pad, M_pad] mel weights with
    zero rows over the padding bins so garbage lanes never contaminate.
    """
    num_bins = fft_length // 2 + 1
    k_pad = _round_up(frame_length, LANE)
    nb_pad = _round_up(num_bins, LANE)
    m_pad = _round_up(num_mel_bins, LANE)

    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(num_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / fft_length
    # periodic Hann with tf.signal's raised-cosine denominator
    # (frame_length for even windows, frame_length - 1 for odd —
    # matches features.audio.hann_window)
    denom = frame_length + (1 - frame_length % 2) - 1
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)

    Wc = np.zeros((k_pad, nb_pad), np.float32)
    Ws = np.zeros((k_pad, nb_pad), np.float32)
    Wc[:frame_length, :num_bins] = window * np.cos(ang)
    Ws[:frame_length, :num_bins] = window * np.sin(ang)

    mel = mel_ops.linear_to_mel_weight_matrix(
        num_mel_bins=num_mel_bins, num_spectrogram_bins=num_bins,
        sample_rate=sample_rate, lower_edge_hertz=fmin, upper_edge_hertz=fmax)
    M = np.zeros((nb_pad, m_pad), mel_dtype)
    M[:num_bins, :num_mel_bins] = mel
    # numpy (not jnp): jnp arrays made inside a jit trace would leak
    # tracers through the lru_cache; callers convert at use site.
    return Wc, Ws, M


@functools.lru_cache(maxsize=16)
def _packed_bases(frame_length, seg, n_seg, fft_length, num_mel_bins,
                  sample_rate, fmin, fmax):
    """Bases for the packed kernel.

    W: [n_seg, 128, 2*NB] fused cos|sin windowed-DFT bases — segment s rows
    are sample offsets [s*seg, s*seg + seg) of the frame (remaining rows
    zero), columns [0:NB] cosine and [NB:2NB] sine. NB = fft_length // 2:
    the Nyquist bin is dropped because its HTK mel weight is identically
    zero (the mel triangles end at fmax <= rate/2), which makes the DFT
    output width exactly lane-aligned (512 for fft 512) with no padding.
    M: [NB, m_pad] mel weights.
    """
    num_bins = fft_length // 2  # drop Nyquist (zero mel weight)
    nb_pad = _round_up(num_bins, LANE)
    m_pad = _round_up(num_mel_bins, LANE)

    n = np.arange(frame_length, dtype=np.float64)[:, None]
    k = np.arange(num_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / fft_length
    # periodic Hann with tf.signal's raised-cosine denominator
    # (frame_length for even windows, frame_length - 1 for odd —
    # matches features.audio.hann_window)
    denom = frame_length + (1 - frame_length % 2) - 1
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / denom)
    Wc = (window * np.cos(ang)).astype(np.float32)
    Ws = (window * np.sin(ang)).astype(np.float32)

    # Flat basis: one [n_seg*128, 2*NB] contraction — the kernel lane-concats
    # the n_seg shifted signal views into one [F, n_seg*128] operand so the
    # whole windowed DFT is a single large-K MXU matmul.
    W = np.zeros((n_seg * 128, 2 * nb_pad), np.float32)
    for s in range(n_seg):
        lo, hi = s * seg, min((s + 1) * seg, frame_length)
        W[s * 128:s * 128 + hi - lo, :num_bins] = Wc[lo:hi]
        W[s * 128:s * 128 + hi - lo, nb_pad:nb_pad + num_bins] = Ws[lo:hi]

    mel = mel_ops.linear_to_mel_weight_matrix(
        num_mel_bins=num_mel_bins, num_spectrogram_bins=fft_length // 2 + 1,
        sample_rate=sample_rate, lower_edge_hertz=fmin, upper_edge_hertz=fmax)
    assert np.abs(mel[num_bins:]).max() == 0.0, \
        "Nyquist mel weight must be zero to drop the bin"
    M = np.zeros((nb_pad, m_pad), np.float32)
    M[:num_bins, :num_mel_bins] = mel[:num_bins]
    return W, M


def _logmel_kernel_packed(main_ref, tail_ref, w_ref, mel_ref, out_ref,
                          *, frames_per_tile, n_seg, n_streams, nb_pad,
                          bf16=False):
    """One (batch row, frame tile) cell of the packed kernel.

    The signal arrives as ``n_streams`` interleaved row streams of ``seg``
    samples (lane-padded to 128): row r = n_streams*q + j lives at
    stream[j][q]. Segment s of frame i is row n_streams*i + s, i.e. stream
    s % n_streams at index i + s // n_streams — every segment is a
    statically-shifted sublane slice of one stream. The shifted views are
    lane-concatenated into one [F, n_seg*128] operand so the whole windowed
    DFT (cos and sin fused into one output) is a SINGLE large-K MXU matmul;
    small-K accumulating dots would underutilize the systolic array.

    ``bf16``: refs arrive in bfloat16 (half the HBM/VMEM traffic), dots run
    1-pass with f32 accumulation; power stays f32 and is re-rounded to bf16
    only as the mel matmul input — the "bf16" DSP mode inside one kernel.
    """
    def dot(a, b):
        if bf16:
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    main = main_ref[0]          # [n_streams, F, 128]
    tail = tail_ref[0, 0]       # [n_streams, tail_rows, 128]
    views = []
    for s in range(n_seg):
        j, d = s % n_streams, s // n_streams
        views.append(main[j] if d == 0 else jnp.concatenate(
            [main[j][d:], tail[j][:d]], axis=0))
    X = jnp.concatenate(views, axis=1)        # [F, n_seg*128]
    P = dot(X, w_ref[:])                      # [F, 2*nb_pad]
    real, imag = P[:, :nb_pad], P[:, nb_pad:]
    power = real * real + imag * imag
    if bf16:
        power = power.astype(jnp.bfloat16)
    out_ref[0] = jnp.log(dot(power, mel_ref[:]) + 1e-6)


def fused_logmel_packed(signals, sample_rate, frame_length_ms=25,
                        frame_step_ms=10, fft_length=512, num_mel_bins=64,
                        fmin=0.0, fmax=8000.0, frames_per_tile=256,
                        precision="highest"):
    """[B, T] waveforms -> [B, num_frames, num_mel_bins] log-Mel, the
    padding-lean fused Pallas kernel.

    Same numerics as ``logmel_reference`` (f32 HIGHEST parity with
    tf.signal), with the padding waste of the earlier (deleted) kernel
    generations engineered out:

    - segments of ``seg = frame_step / ceil(frame_step/128)`` samples
      (80 for the 25/10 ms default) so each basis block wastes 48 zero rows
      instead of 96 — contraction 5x128=640 vs the old 3x256=768 for a
      400-sample frame;
    - cos and sin bases fused into one matmul output (fewer, larger MXU
      dispatches);
    - the Nyquist bin dropped (its HTK mel weight is identically zero), so
      the DFT output is exactly 2x256 lanes with no 257->384 pad.

    Requires frame_step % seg == 0 (always true by construction) and
    fmax <= sample_rate / 2. Geometries the kernel cannot tile (extreme
    frame_length/frame_step ratios) fall back to the always-correct XLA
    ``logmel_reference`` path.

    ``precision="bf16"``: the streams and bases are staged bf16 and the
    dots run 1-pass with f32 accumulation — the "bf16" DSP mode fused in
    one kernel (half the HBM traffic of the already-bf16-stored XLA path,
    and the power spectrogram never leaves VMEM at all).
    """
    bf16 = precision == "bf16"
    frame_length = audio.ms_to_frames(sample_rate, frame_length_ms)
    frame_step = audio.ms_to_frames(sample_rate, frame_step_ms)
    B, T = signals.shape
    num_frames = max(0, 1 + (T - frame_length) // frame_step)
    assert num_frames > 0, "signal shorter than one frame"

    n_streams = -(-frame_step // 128)
    seg = frame_step // n_streams
    n_seg = -(-frame_length // seg)
    # Geometry preconditions the kernel's bases assume (callers and the
    # bf16 auto-route may hold arbitrary configs): (a) tf.signal's
    # fft_length < frame_length truncation is not built into
    # _packed_bases, (b) fmax > nyquist leaves nonzero mel weight on the
    # dropped Nyquist bin (_packed_bases asserts). Both fall back to the
    # always-correct XLA path, as do (c) frame_length/frame_step ratios
    # beyond the in-kernel tail budget of 8 stream rows (e.g. 25 ms/2 ms).
    if (fft_length < frame_length or float(fmax) > sample_rate / 2
            or frame_step % n_streams or seg > 128
            or (n_seg - 1) // n_streams > 8):
        return logmel_reference(
            signals, sample_rate, frame_length_ms, frame_step_ms, fft_length,
            num_mel_bins, fmin, fmax, precision=precision)

    # bf16 min tile is (16, 128): frame tiles and the tail buffer align to
    # 16 sublanes in bf16 mode (8 suffices for f32)
    align = 16 if bf16 else 8
    tail_rows = align
    exact = _round_up(num_frames, align)
    if exact <= max(frames_per_tile, 1024):
        frames_per_tile = exact
    else:
        # caller-passed tile sizes must also hold the min-tile sublane
        # alignment (Mosaic rejects e.g. a 200-row bf16 block)
        frames_per_tile = _round_up(frames_per_tile, align)
    num_tiles = -(-num_frames // frames_per_tile)

    W, M = (jnp.asarray(a) for a in _packed_bases(
        frame_length, seg, n_seg, fft_length, num_mel_bins,
        int(sample_rate), float(fmin), float(fmax)))
    nb_pad = M.shape[0]
    m_pad = M.shape[1]
    if bf16:
        signals = signals.astype(jnp.bfloat16)
        W, M = W.astype(jnp.bfloat16), M.astype(jnp.bfloat16)

    # Row streams: row r (seg samples) = streams[r % n_streams][r // n_streams].
    # Each stream gets tail_rows extra rows so tile-boundary shifts stay
    # in bounds.
    rows_per_stream = num_tiles * frames_per_tile + tail_rows
    total_rows = rows_per_stream * n_streams
    needed = total_rows * seg
    if needed > T:
        signals = jnp.pad(signals, ((0, 0), (0, needed - T)))
    rows = signals[:, :needed].reshape(B, rows_per_stream, n_streams, seg)
    if seg < 128:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (0, 128 - seg)))
    streams = rows.transpose(0, 2, 1, 3)        # [B, n_streams, Q, 128]
    main = streams[:, :, :num_tiles * frames_per_tile]
    # Tails: rows [(t+1)*F, (t+1)*F + tail_rows) of each stream, per tile.
    tail_idx = (np.arange(num_tiles)[:, None] * frames_per_tile
                + frames_per_tile + np.arange(tail_rows)[None, :])
    tail_idx = np.minimum(tail_idx, rows_per_stream - 1)
    tails = streams[:, :, jnp.asarray(tail_idx)]  # [B, n_str, tiles, tr, 128]
    tails = tails.transpose(0, 2, 1, 3, 4)        # [B, tiles, n_str, tr, 128]

    in_bytes = 2 if bf16 else 4
    out = pl.pallas_call(
        functools.partial(_logmel_kernel_packed,
                          frames_per_tile=frames_per_tile, n_seg=n_seg,
                          n_streams=n_streams, nb_pad=nb_pad, bf16=bf16),
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec((1, n_streams, frames_per_tile, 128),
                         lambda b, t: (b, 0, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_streams, tail_rows, 128),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_seg * 128, 2 * nb_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, m_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, frames_per_tile, m_pad),
                               lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, num_tiles * frames_per_tile, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * num_tiles * frames_per_tile
            * (n_seg * 128 * 2 * nb_pad + nb_pad * m_pad),
            bytes_accessed=B * (in_bytes * T
                                + 4 * num_tiles * frames_per_tile * m_pad),
            transcendentals=B * num_tiles * frames_per_tile * m_pad),
    )(main, tails, W, M)
    return out[:, :num_frames, :num_mel_bins]


def logmel_conv(signals, sample_rate, frame_length_ms=25, frame_step_ms=10,
                fft_length=512, num_mel_bins=64, fmin=0.0, fmax=8000.0):
    """Framing + windowed DFT as ONE strided XLA convolution (stride =
    frame_step, kernel = DFT basis) — no frame tensor ever materializes in
    HBM; then mel matmul + log."""
    frame_length = audio.ms_to_frames(sample_rate, frame_length_ms)
    frame_step = audio.ms_to_frames(sample_rate, frame_step_ms)
    Wc, Ws, M = (jnp.asarray(a) for a in _bases(
        frame_length, fft_length, num_mel_bins,
        int(sample_rate), float(fmin), float(fmax)))
    kernel = jnp.concatenate([Wc[:frame_length], Ws[:frame_length]], axis=1)
    nb_pad = Wc.shape[1]

    out = jax.lax.conv_general_dilated(
        signals[:, :, None],                 # [B, T, 1]
        kernel[:, None, :],                  # [frame_length, 1, 2 * nb_pad]
        window_strides=(frame_step,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        precision=jax.lax.Precision.HIGHEST)
    real, imag = out[..., :nb_pad], out[..., nb_pad:]
    power = real * real + imag * imag
    mel = jnp.matmul(power, M, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(mel + 1e-6)[..., :num_mel_bins]


def logmel_reference(signals, sample_rate, frame_length_ms=25, frame_step_ms=10,
                     fft_length=512, num_mel_bins=64, fmin=0.0, fmax=8000.0,
                     precision="highest"):
    """Parity baseline via the features.audio gather + matmul path."""
    S = audio.spectrograms(signals, sample_rate,
                           frame_length_ms=frame_length_ms,
                           frame_step_ms=frame_step_ms,
                           fft_length=fft_length, method="matmul",
                           precision=precision)
    mel = audio.linear_to_mel(S, sample_rate, num_mel_bins=num_mel_bins,
                              fmin=fmin, fmax=fmax, precision=precision)
    return jnp.log(mel + 1e-6)
