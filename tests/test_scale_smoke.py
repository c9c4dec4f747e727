"""
Four-digit-element scale smoke (VERDICT r2 next-round #9): a generated
~1k-utterance corpus through the FULL config pipeline — duration-weighted
oversampling, signal cache, bucketed featurization, fused on-device
augmented training, evaluation — asserting throughput is recorded and host
memory stays bounded (the pipeline streams; it never materializes the
corpus). SURVEY §7: "host loader throughput ... won or lost".
"""
import json
import os
import resource

import numpy as np
import pytest

N_UTTS = 1000
SR = 16000
SECONDS = 1.0
LABELS = ("aa", "bb", "cc")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """~1k one-second wavs with class-separable spectra + metadata csv
    (imbalanced labels so oversampling has work to do)."""
    import pandas as pd
    from lidbox_tpu.features import io as audio_io

    root = tmp_path_factory.mktemp("scale_corpus")
    rng = np.random.default_rng(0)
    counts = {"aa": 500, "bb": 300, "cc": 200}
    t = np.arange(int(SR * SECONDS)) / SR
    rows = []
    i = 0
    for label, count in counts.items():
        tone = 300.0 * (1 + LABELS.index(label))
        for _ in range(count):
            sig = (0.25 * np.sin(2 * np.pi * tone * t)
                   + rng.normal(0, 0.05, t.size)).astype(np.float32)
            path = root / f"{label}_{i:04d}.wav"
            audio_io.write_mono_wav(str(path), sig, SR)
            rows.append({"id": f"u{i:04d}", "label": label, "path": str(path),
                         "duration": SECONDS,
                         "split": "train" if i % 5 else "test"})
            i += 1
    meta = pd.DataFrame(rows).set_index("id")
    return root, meta


@pytest.mark.slow
def test_1k_corpus_full_config_journey(tmp_path, corpus):
    from lidbox_tpu.cli import main
    from lidbox_tpu.meta import random_oversampling_on_split
    import yaml

    root, meta = corpus
    assert len(meta) == N_UTTS

    # duration-weighted oversampling balances the train split at the
    # metadata level (reference: lidbox/meta/utils.py oversampling)
    balanced = random_oversampling_on_split(meta, "train", random_state=0)
    train_counts = balanced[balanced.split == "train"].label.value_counts()
    assert train_counts.min() == train_counts.max()  # balanced
    assert len(balanced) > N_UTTS
    assert balanced.index.is_unique  # copies got _copy_<n> id suffixes
    csv = tmp_path / "meta.csv"
    balanced.reset_index().to_csv(csv, index=False)

    # a real noise source: snr_range without one is now a config error
    # (it used to silently skip the noise stage)
    from lidbox_tpu.features import io as audio_io
    noise_path = tmp_path / "noise.wav"
    audio_io.write_mono_wav(
        str(noise_path),
        np.random.default_rng(9).normal(0, 0.1, SR).astype(np.float32), SR)

    frames = 1 + (int(SR * SECONDS) - 400) // 160
    config = {
        "metadata": {"csv": str(csv)},
        "pre_process": {
            "cache": {"directory": str(tmp_path / "cache_data"),
                      "batch_size": 64, "consume": False}},
        "features": {
            "type": "logmelspectrogram",
            "sample_rate": SR,
            "melspectrogram": {"num_mel_bins": 24},
            "group_by_input_length": {"max_batch_size": 64},
            # fused on-device augmentation: train compiles augment +
            # features into the train step (BASELINE config-5 route)
            "on_device_augment": {"snr_range": [15, 30],
                                  "noise_paths": [str(noise_path)],
                                  "fir_coefs": 10,
                                  "specaug": {"time_masks": 1,
                                              "freq_masks": 1}}},
        "experiment": {
            "cache_directory": str(tmp_path / "cache"), "name": "scale",
            "input_shape": [frames, 24], "output_shape": [len(LABELS)],
            "model": {"key": "dnn"},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
            "loss": {"cls": "SparseCategoricalCrossentropy"},
            "callbacks": [{"cls": "ModelCheckpoint",
                           "kwargs": {"monitor": "val_loss", "mode": "min"}}],
            "epochs": 1,
            "data": {"train": {"split": "train", "batch_size": 64},
                     "test": {"split": "test"}}},
    }
    cfg = tmp_path / "config.yaml"
    cfg.write_text(yaml.safe_dump(config))

    assert main(["train", str(cfg)]) == 0
    rss_first = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    # bounded memory: the first run's peak includes XLA compile arenas
    # (~hundreds of MiB on CPU, one-off); with those warm, a SECOND full
    # pass over the 1.4k-element corpus must not push the peak higher —
    # i.e. the pipeline streams and frees, it does not accumulate elements
    assert main(["train", str(cfg)]) == 0
    rss_second = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert rss_second - rss_first < 128 * 1024, (
        f"peak RSS grew {rss_second - rss_first} KiB on the second "
        f"identical pass — the pipeline is accumulating, not streaming")

    # signal cache materialized on disk for the next epoch/run
    cache_files = []
    for dirpath, _, files in os.walk(tmp_path / "cache_data"):
        cache_files += [os.path.join(dirpath, f) for f in files]
    assert cache_files, "pre_process cache wrote nothing"

    # throughput was recorded by the trainer's metrics logger
    log_dir = tmp_path / "cache" / "dnn" / "scale" / "logs"
    events = []
    for dirpath, _, files in os.walk(log_dir):
        for f in files:
            if f.endswith(".jsonl"):
                with open(os.path.join(dirpath, f), encoding="utf-8") as fh:
                    events += [json.loads(line) for line in fh if line.strip()]
    assert events, "no JSONL training logs written"
    assert any(e.get("metrics", {}).get("examples_per_sec", 0) > 0
               for e in events)
    assert any(e.get("metrics", {}).get("audio_rtf", 0) > 0
               for e in events)  # audio-seconds throughput recorded too

    # evaluation over the 200-utterance test split completes with a report
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["evaluate", str(cfg)]) == 0
    report = json.loads(buf.getvalue())
    assert "accuracy" in report and "avg_detection_cost" in report
    assert np.asarray(report["confusion_matrix"]).sum() == (
        meta.split == "test").sum()
