"""
Synthetic audio generators and hypothesis strategies for tests
(reference: lidbox/testutil.py — librosa tone/chirp generators replaced with
numpy equivalents since librosa is not a dependency of this framework).
"""
import numpy as np


def sinewave(frequency, sample_rate, duration_sec, amplitude=1.0):
    t = np.arange(int(sample_rate * duration_sec), dtype=np.float64) / sample_rate
    return (amplitude * np.sin(2.0 * np.pi * frequency * t)).astype(np.float32)


def linear_chirp(fmin, fmax, sample_rate, duration_sec):
    t = np.arange(int(sample_rate * duration_sec), dtype=np.float64) / sample_rate
    phase = 2.0 * np.pi * (fmin * t + (fmax - fmin) * t * t / (2.0 * duration_sec))
    return np.sin(phase).astype(np.float32)


def peak_normalize_np(signal, dBFS=-3.0):
    peak = np.max(np.abs(signal))
    return (10.0 ** (dBFS / 20.0)) * signal / max(peak, 1e-12)


def noisy_sinewave(frequency, sample_rate, noise_level, duration_sec, seed=0):
    """Sine + uniform noise, peak normalized to -3 dBFS
    (reference: lidbox/testutil.py:16-21)."""
    rng = np.random.default_rng(seed)
    wave = sinewave(frequency, sample_rate, duration_sec)
    noise = noise_level * rng.uniform(-1, 1, wave.size).astype(np.float32)
    return peak_normalize_np(wave + noise)


def chirps(sample_rate, duration_sec, seed=0):
    """Noisy up/down chirps (reference: lidbox/testutil.py:22-26)."""
    rng = np.random.default_rng(seed)
    up = linear_chirp(200, sample_rate // 2 - 100, sample_rate, duration_sec)
    down = linear_chirp(sample_rate // 2 - 100, 200, sample_rate, duration_sec)
    noise = 0.1 * rng.uniform(-1, 1, up.size).astype(np.float32)
    return peak_normalize_np(up + noise), peak_normalize_np(down + noise)


def spectrogram_shapes():
    """Hypothesis strategy for random spectrogram batches, shape
    [1-10, 1-400, 1-100], values within ±1e3
    (reference: lidbox/testutil.py:29-35)."""
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as st_np
    return st_np.arrays(
        np.float32,
        st.tuples(st.integers(1, 10), st.integers(1, 400), st.integers(1, 100)),
        elements=st.floats(-1e3, 1e3, width=32))
