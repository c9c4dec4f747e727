"""
Device-side batched feature extraction: the jit-compiled half of the data
pipeline.

The reference extracted features inside the tf.data graph under a
``tf.device`` scope (reference: lidbox/data/steps.py:708-736,
lidbox/data/tf_utils.py:166-195). The TPU-native design instead compiles
the whole waveform->features chain (STFT -> mel -> log -> MFCC -> CMVN ->
...) into ONE XLA program per (batch, length) bucket and feeds it padded,
statically-shaped batches; ragged reality lives at the host edges
(bucketing before, per-element slicing after). Bucket sets are small and
fixed so the number of compiled programs stays bounded (SURVEY.md §7).
"""
import functools

import jax
import numpy as np

import lidbox_tpu.features as F
from lidbox_tpu import get_logger
from lidbox_tpu.data.dataset import pick_bucket  # noqa: F401  (one shared
# bucketing policy: host padded batching and the device-program shape
# cache must agree on compiled XLA shapes)
from lidbox_tpu.features import audio

logger = get_logger("data.device")

# Signal-length buckets in samples (@16 kHz: 0.5 s .. 64 s, x2 growth)
DEFAULT_SIGNAL_BUCKETS = tuple(8000 * 2 ** i for i in range(8))
DEFAULT_BATCH_BUCKETS = (1, 8, 32, 64)

FEATURE_KWARG_KEYS = ("spectrogram", "melspectrogram", "mfcc", "db_spectrogram",
                      "sample_minmax_scaling", "window_normalization")


class DeviceFeatureExtractor:
    """Callable mapping numpy signal batches to numpy feature batches via a
    cached-jit XLA program per shape bucket."""

    def __init__(self, config):
        config = dict(config)
        self.feature_type = config.get("type", "logmelspectrogram")
        # Numeric sanitization analogue of the reference's assert_all_finite
        # after each stage (lidbox/data/tf_utils.py:173-191): opt-in host
        # check on every extracted batch.
        self.validate_finite = bool(config.get("validate_finite", False))
        # "matmul" rides the MXU (windowed-DFT as two matmuls) — the TPU
        # default; "fft" uses XLA's native FFT; "pallas" uses the fused
        # memory-lean kernel for log-mel/MFCC (ops/logmel.py).
        self.stft_method = config.get("stft_method", "matmul")
        # "highest" = f32 parity; "bf16_3x" = ~1.75x faster MXU passes with
        # ~1.5e-3 max log-mel error (training-grade, see audio.DSP_PRECISIONS)
        self.precision = config.get("precision", "highest")
        spec = config.get("spectrogram") or {}
        self.frame_length_ms = spec.get("frame_length_ms", 25)
        self.frame_step_ms = spec.get("frame_step_ms", 10)
        self.signal_buckets = tuple(config.get("signal_buckets",
                                               DEFAULT_SIGNAL_BUCKETS))
        self.batch_buckets = tuple(config.get("batch_buckets",
                                              DEFAULT_BATCH_BUCKETS))
        self.feature_kwargs = {k: dict(config[k]) for k in FEATURE_KWARG_KEYS
                               if config.get(k)}
        self._jit_by_rate = {}

    def _get_fn(self, sample_rate, masked=False):
        fn = self._jit_by_rate.get((sample_rate, masked))
        if fn is None:
            feature_type, kwargs = self.feature_type, self.feature_kwargs
            stft_method, precision = self.stft_method, self.precision

            if masked:
                @jax.jit
                def extract(signals, lengths):
                    return F.extract_features(signals, sample_rate,
                                              feature_type=feature_type,
                                              stft_method=stft_method,
                                              precision=precision,
                                              lengths=lengths, **kwargs)
            else:
                @jax.jit
                def extract(signals):
                    return F.extract_features(signals, sample_rate,
                                              feature_type=feature_type,
                                              stft_method=stft_method,
                                              precision=precision, **kwargs)
            fn = self._jit_by_rate[(sample_rate, masked)] = extract
        return fn

    def num_frames(self, num_samples, sample_rate):
        fl = audio.ms_to_frames(sample_rate, self.frame_length_ms)
        fs = audio.ms_to_frames(sample_rate, self.frame_step_ms)
        return max(0, 1 + (int(num_samples) - fl) // fs)

    def __call__(self, signals, sample_rate):
        """signals: numpy [B, T] (equal length). -> numpy [B, frames, C]."""
        fn = self._get_fn(int(sample_rate))
        out = np.asarray(fn(np.asarray(signals, np.float32)))
        if self.validate_finite and not np.all(np.isfinite(out)):
            bad = int((~np.isfinite(out)).sum())
            raise FloatingPointError(
                f"feature extraction produced {bad} non-finite values "
                f"(feature_type={self.feature_type})")
        return out

    def extract_ragged(self, signal_list, sample_rate):
        """List of 1-D numpy signals (any lengths) -> list of [frames_i, C]
        feature arrays. Signals are padded to a length bucket and the batch
        to a batch bucket, run through one XLA program with the true lengths
        threaded in (so per-sample statistics — min-max scaling, window
        normalization — see only real frames), then sliced back to each
        signal's true frame count."""
        lengths = [len(s) for s in signal_list]
        t_bucket = pick_bucket(max(lengths), self.signal_buckets)
        b_bucket = pick_bucket(len(signal_list), self.batch_buckets)
        batch = np.zeros((b_bucket, t_bucket), np.float32)
        clipped = np.zeros(b_bucket, np.int32)
        for i, s in enumerate(signal_list):
            clipped[i] = min(len(s), t_bucket)
            batch[i, :clipped[i]] = s[:t_bucket]
        fn = self._get_fn(int(sample_rate), masked=True)
        feats = np.asarray(fn(batch, clipped))
        if self.validate_finite and not np.all(np.isfinite(feats)):
            bad = int((~np.isfinite(feats)).sum())
            raise FloatingPointError(
                f"feature extraction produced {bad} non-finite values "
                f"(feature_type={self.feature_type})")
        out = []
        for i, n in enumerate(lengths):
            nf = self.num_frames(min(n, t_bucket), sample_rate)
            out.append(np.asarray(feats[i, :nf]))
        return out


@functools.lru_cache(maxsize=8)
def default_extractor(feature_type="logmelspectrogram", num_mel_bins=64):
    return DeviceFeatureExtractor({
        "type": feature_type,
        "melspectrogram": {"num_mel_bins": num_mel_bins},
    })
