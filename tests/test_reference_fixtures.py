"""
Drop-in evidence: run the lidbox_tpu pipeline over the reference toolkit's
own bundled audio fixtures (/root/reference/tests/audio — noisy sines and
noise, wav+mp3) and check tf.signal numerics on that real data.

Skipped when the reference tree is not mounted.
"""
import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

import lidbox_tpu.features as F
from lidbox_tpu.data import Step, from_steps
from lidbox_tpu.features import io as audio_io

REF_AUDIO = "/root/reference/tests/audio"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF_AUDIO),
                                reason="reference fixtures unavailable")


def _ref_wavs():
    return sorted(glob.glob(os.path.join(REF_AUDIO, "*.wav")))


def test_decode_reference_wavs():
    paths = _ref_wavs()
    assert len(paths) >= 5
    for p in paths:
        sig, rate = audio_io.read_wav(p)
        assert rate == 16000
        assert sig.size > rate  # multi-second fixtures
        assert np.abs(sig).max() <= 1.0
        assert audio_io.wav_header_is_valid(p)


def test_pipeline_over_reference_fixtures():
    paths = _ref_wavs()
    labels = ["noise", "sine"]
    init = {"id": [os.path.basename(p).split(".")[0] for p in paths],
            "path": paths,
            "label": ["noise" if "noise" in p else "sine" for p in paths]}
    ds = from_steps([
        Step("initialize", {"labels": labels, "init_data": init}),
        Step("load_audio", {}),
        Step("compute_rms_vad", {"strength": 0.05, "vad_frame_length_ms": 10}),
        Step("apply_vad", {}),
        Step("drop_empty", {}),
        Step("create_signal_chunks", {"length_ms": 1000, "step_ms": 1000}),
        Step("extract_features", {"config": {
            "type": "logmelspectrogram",
            "melspectrogram": {"num_mel_bins": 40},
            "group_by_input_length": {"max_batch_size": 16}}}),
    ])
    elems = ds.collect()
    assert len(elems) >= len(paths)  # chunking multiplies
    for x in elems:
        assert x["input"].shape[1] == 40
        assert np.all(np.isfinite(x["input"]))


def test_tf_signal_parity_on_reference_audio():
    """The 1e-4 numerics budget holds on the reference's real fixtures, not
    just synthetic signals."""
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    sigs = []
    for p in _ref_wavs()[:4]:
        sig, rate = audio_io.read_wav(p)
        sigs.append(sig[:2 * rate])
    batch = np.stack(sigs)
    ours = np.asarray(F.extract_features(
        jnp.asarray(batch), 16000, feature_type="spectrogram"))
    theirs = np.square(np.abs(
        tf.signal.stft(batch, 400, 160, fft_length=512).numpy()))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_tfevents_reader_branch(tmp_path):
    """system.iter_log_events reads real TF event files
    (reference: lidbox/system.py:55-63)."""
    import tensorflow as tf
    logdir = str(tmp_path / "tb")
    writer = tf.summary.create_file_writer(logdir)
    with writer.as_default():
        tf.summary.scalar("loss", 0.25, step=3)
    writer.close()
    from lidbox_tpu.system import iter_log_events
    events = []
    for f in os.listdir(logdir):
        if "tfevents" in f:
            events.extend(iter_log_events(os.path.join(logdir, f)))
    assert any(tag == "loss" and step == 3 and abs(v - 0.25) < 1e-6
               for _, step, tag, v in events)
