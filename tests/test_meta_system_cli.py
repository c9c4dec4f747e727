"""
Metadata, system utilities and CLI tests
(reference layers: lidbox/meta/, lidbox/system.py, lidbox/__main__.py —
the reference CLI was a dead entry point; ours must actually run).
"""
import json
import os

import numpy as np
import pandas as pd
import pytest

from lidbox_tpu import iter_metadata_file, system
from lidbox_tpu.meta import (generate_label2target, random_oversampling,
                             random_undersampling, read_audio_durations,
                             verify_integrity)


def _meta(audio_fixtures, durations=(3.0, 3.0, 3.0, 3.0, 3.0)):
    ids = sorted(audio_fixtures)
    return pd.DataFrame({
        "path": [str(audio_fixtures[i]) for i in ids],
        "label": ["noise" if i == "noise" else
                  ("low" if i in ("sine_100", "sine_200") else "high")
                  for i in ids],
        "split": ["train", "train", "test", "test", "train"],
        "client_id": [f"spk_{i}" for i in ids],
        "duration": list(durations),
    }, index=pd.Index(ids, name="id"))


class TestMetaUtils:
    def test_verify_integrity_passes(self, audio_fixtures):
        verify_integrity(_meta(audio_fixtures))

    def test_verify_integrity_missing_column(self, audio_fixtures):
        with pytest.raises(ValueError, match="missing"):
            verify_integrity(_meta(audio_fixtures).drop(columns=["split"]))

    def test_verify_integrity_missing_file(self, audio_fixtures):
        meta = _meta(audio_fixtures)
        meta.loc[meta.index[0], "path"] = "/nonexistent.wav"
        with pytest.raises(FileNotFoundError):
            verify_integrity(meta)

    def test_verify_integrity_speaker_leak(self, audio_fixtures):
        meta = _meta(audio_fixtures)
        meta["client_id"] = "same_speaker"
        with pytest.raises(ValueError, match="share"):
            verify_integrity(meta)

    def test_read_audio_durations(self, audio_fixtures):
        durations = read_audio_durations(_meta(audio_fixtures))
        np.testing.assert_allclose(durations, 3.0, atol=0.01)

    def test_generate_label2target_lexicographic(self, audio_fixtures):
        meta, label2target = generate_label2target(_meta(audio_fixtures))
        assert list(label2target) == ["high", "low", "noise"]
        assert list(label2target.values()) == [0, 1, 2]
        assert meta.loc["noise", "target"] == 2

    def test_random_oversampling_balances_durations(self, audio_fixtures):
        meta = _meta(audio_fixtures, durations=(3, 3, 3, 3, 3))
        # make 'high' the heavy label by inflating durations
        meta.loc[meta.label == "high", "duration"] = 30.0
        out = random_oversampling(meta, random_state=0)
        assert len(out) > len(meta)
        assert out.is_copy.sum() == len(out) - len(meta)
        totals = out.groupby("label").duration.sum()
        assert totals["low"] >= 0.5 * totals["high"]
        copies = out[out.is_copy]
        assert all("_copy_" in i for i in copies.index)

    def test_random_undersampling(self, audio_fixtures):
        meta = _meta(audio_fixtures)
        # 'high' has 2 rows of 2 s (total 4 s); target 'noise' totals 3 s,
        # so 'high' is sampled down to int(3 / 2) = 1 row.
        meta.loc[meta.label == "high", "duration"] = 2.0
        out = random_undersampling(meta, "noise", random_state=0)
        assert (out.label == "high").sum() == 1
        assert (out.label == "noise").sum() == 1
        # 'low' (2 rows x 3 s = 6 s) also exceeds the 3 s target ->
        # int(3 / 3) = 1 row kept
        assert (out.label == "low").sum() == 1


class TestSystem:
    def test_run_command(self):
        code, out, err = system.run_command("echo hello")
        assert code == 0 and out.strip() == "hello"

    def test_run_for_files_batching(self, tmp_path):
        files = []
        for i in range(7):
            p = tmp_path / f"f{i}.txt"
            p.write_text(str(i))
            files.append(str(p))
        outs = list(system.run_for_files("cat", files, batch_size=3))
        assert len(outs) == 3
        assert "".join(outs) == "0123456"

    def test_md5sums(self, tmp_path):
        p1 = tmp_path / "a"; p1.write_bytes(b"hello")
        p2 = tmp_path / "b"; p2.write_bytes(b"hello")
        sums = system.all_md5sums([p1, p2])
        assert sums[0] == sums[1] == system.md5sum(p1)

    def test_md5sums_generator_input(self, tmp_path):
        """A generator argument must not be exhausted by the pool sizing
        (it once was, silently returning [])."""
        p1 = tmp_path / "a"; p1.write_bytes(b"hello")
        p2 = tmp_path / "b"; p2.write_bytes(b"world")
        sums = system.all_md5sums(p for p in (p1, p2))
        assert sums == [system.md5sum(p1), system.md5sum(p2)]

    def test_run_for_files_quotes_paths(self, tmp_path):
        """Paths with spaces/metacharacters must survive the shell."""
        p = tmp_path / "my file; echo pwned.txt"
        p.write_text("content")
        outs = list(system.run_for_files("cat", [str(p)]))
        assert "".join(outs) == "content"

    def test_total_duration(self, audio_fixtures):
        total = system.get_total_duration_sec(
            [audio_fixtures[k] for k in sorted(audio_fixtures)])
        np.testing.assert_allclose(total, 15.0, atol=0.1)

    def test_get_audio_type(self, audio_fixtures, tmp_path):
        assert system.get_audio_type(audio_fixtures["noise"]) == "wav"
        junk = tmp_path / "x.bin"; junk.write_bytes(b"\x01" * 20)
        assert system.get_audio_type(junk) == "unknown"

    def test_iter_log_events_jsonl(self, tmp_path):
        p = tmp_path / "events.jsonl"
        p.write_text(json.dumps({"wall_time": 1.0, "step": 1,
                                 "metrics": {"loss": 0.5}}) + "\n")
        events = list(system.iter_log_events(p))
        assert events == [(1.0, 1, "loss", 0.5)]

    def test_iter_metadata_file(self, tmp_path):
        p = tmp_path / "utt2path"
        p.write_text("utt1 /a/b.wav\nutt2 /c/d.wav\nbadline\n")
        rows = list(iter_metadata_file(p, 2))
        assert rows == [("utt1", "/a/b.wav"), ("utt2", "/c/d.wav")]


class TestCommonVoice:
    def _make_corpus(self, tmp_path, lang="fi"):
        d = tmp_path / lang
        (d / "clips").mkdir(parents=True)
        for split, rows in [("train", 2), ("dev", 1), ("test", 1),
                            ("validated", 4)]:
            lines = ["client_id\tpath\tsentence"]
            for i in range(rows):
                lines.append(f"spk{split}{i}\t{lang}_{split}_{i}.mp3\thello")
            (d / f"{split}.tsv").write_text("\n".join(lines) + "\n")
        return tmp_path

    def test_id_stem_not_regex(self, tmp_path):
        """'.mp3' in the filename stem must not be regex-matched away
        (pandas str.split treats multi-char patterns as regex: 'ximp3x.mp3'
        once became id 'x')."""
        from lidbox_tpu.meta import common_voice
        d = tmp_path / "fi"
        (d / "clips").mkdir(parents=True)
        (d / "train.tsv").write_text(
            "client_id\tpath\tsentence\nspk0\tximp3x.mp3\thello\n")
        df = common_voice.load_split(str(tmp_path), "fi", "train")
        assert list(df["id"]) == ["ximp3x"]

    def test_load(self, tmp_path):
        from lidbox_tpu.meta import common_voice
        corpus = self._make_corpus(tmp_path)
        meta = common_voice.load(str(corpus), "fi")
        assert len(meta) == 4
        assert set(meta.split) == {"train", "dev", "test"}
        assert all(meta.client_id.str.startswith("fi_"))
        assert all(meta.path.str.endswith(".mp3"))
        assert meta.index[0].startswith("fi_")

    def test_mp3_corpus_journey(self, tmp_path):
        """The real Common Voice shape: an mp3-clip corpus loads through
        meta -> durations -> pipeline -> features (native libmpg123
        decode), the journey the reference ran on miniaudio."""
        import os
        import shutil
        from lidbox_tpu import native
        from lidbox_tpu.meta import common_voice, read_audio_durations
        from lidbox_tpu.data import from_steps
        from lidbox_tpu.data.pipelines import create_dataset

        ref_audio = "/root/reference/tests/audio"
        if not (native.available() and native.mp3_supported()
                and os.path.isdir(ref_audio)):
            pytest.skip("native mp3 decode or reference fixtures unavailable")
        fixtures = ["noisy_100hz_sine.mp3", "noisy_200hz_sine.mp3",
                    "noisy_300hz_sine.mp3", "noisy_400hz_sine.mp3"]
        for li, lang in enumerate(("aa", "bb")):
            clips = tmp_path / lang / "clips"
            clips.mkdir(parents=True)
            rows = []
            for i, fx in enumerate(fixtures):
                name = f"{lang}_clip_{i}.mp3"
                shutil.copy(os.path.join(ref_audio, fx), clips / name)
                rows.append(f"spk{lang}{i}\t{name}\thello")
            header = "client_id\tpath\tsentence"
            (tmp_path / lang / "train.tsv").write_text(
                "\n".join([header] + rows[:3]) + "\n")
            (tmp_path / lang / "dev.tsv").write_text(
                "\n".join([header, rows[3]]) + "\n")
            (tmp_path / lang / "test.tsv").write_text(header + "\n")
        meta = common_voice.load_all(str(tmp_path), ["aa", "bb"])
        meta["label"] = [i.split("_")[0] for i in meta.index]
        assert len(meta) == 8
        durations = read_audio_durations(meta)
        np.testing.assert_allclose(durations, 3.0, atol=0.2)  # 3 s fixtures

        train = meta[meta.split == "train"]
        steps = create_dataset(
            "train", ["aa", "bb"],
            {"id": list(train.index), "path": list(train.path),
             "label": list(train.label)},
            {"features": {"type": "logmelspectrogram",
                          "melspectrogram": {"num_mel_bins": 24},
                          "batch_size": 4}})
        elems = from_steps(steps).collect()
        assert len(elems) == 6
        for e in elems:
            assert e["input"].shape[1] == 24
            assert e["input"].shape[0] > 250  # ~3 s of 10 ms frames
            assert np.all(np.isfinite(e["input"]))
            assert e["target"] in (0, 1)

    def test_load_all_validated(self, tmp_path):
        from lidbox_tpu.meta import common_voice
        corpus = self._make_corpus(tmp_path)
        meta = common_voice.load(str(corpus), "fi")
        merged = common_voice.load_all_validated_data(meta, str(corpus), "fi")
        assert len(merged) == 8  # 4 original + 4 validated (no speaker overlap)
        assert (merged.split == "train").sum() == 6


class TestCLI:
    def test_validate_config(self, tmp_path, capsys):
        from lidbox_tpu.cli import main
        cfg = tmp_path / "c.json"
        cfg.write_text(json.dumps({"metadata": {"csv": "x.csv"}}))
        assert main(["utils", "--validate-config", str(cfg)]) == 0
        assert "config ok" in capsys.readouterr().out
        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"experiment": {}}))
        assert main(["utils", "--validate-config", str(bad)]) == 1

    def test_validate_config_fused_augment_section(self):
        """Misconfigurations the fused route rejects at runtime surface at
        validate-config time too: missing sample_rate, snr_range without a
        noise source, unknown callback classes."""
        from lidbox_tpu.cli import validate_config
        config = {"metadata": {"csv": "x.csv"},
                  "features": {"on_device_augment": {"snr_range": [5, 20]}},
                  "experiment": None}
        config.pop("experiment")
        problems = validate_config(config)
        assert any("sample_rate" in p for p in problems)
        assert any("noise source" in p for p in problems)
        config["features"]["sample_rate"] = 16000
        config["features"]["on_device_augment"]["noise_paths"] = ["n.wav"]
        assert validate_config(config) == []
        config["experiment"] = {
            "cache_directory": "/c", "name": "n", "model": {},
            "input_shape": [1], "output_shape": [1],
            "optimizer": {}, "loss": {},
            "callbacks": [{"cls": "EarlyStoping"}]}  # typo
        problems = validate_config(config)
        assert any("EarlyStoping" in p for p in problems)

    def test_validate_config_feed_section(self, tmp_path, capsys):
        from lidbox_tpu.cli import validate_config
        base = {"cache_directory": "/c", "name": "n", "model": {},
                "input_shape": [1], "output_shape": [1],
                "optimizer": {}, "loss": {}}
        ok = validate_config({"metadata": {"csv": "x"},
                              "experiment": {**base, "feed": {
                                  "prefetch": 4, "stage_dtype": "bfloat16",
                                  "steps_per_dispatch": 2,
                                  "cache_staged": True}}})
        assert ok == []
        bad = validate_config({"metadata": {"csv": "x"},
                               "experiment": {**base, "feed": {
                                   "prefetsh": 4,
                                   "stage_dtype": "floatx"}}})
        assert any("prefetsh" in p for p in bad)
        assert any("floatx" in p for p in bad)

    def test_train_and_evaluate_from_config(self, tmp_path, audio_fixtures,
                                            capsys):
        from lidbox_tpu.cli import main
        meta = _meta(audio_fixtures)
        csv = tmp_path / "meta.csv"
        meta.reset_index().to_csv(csv, index=False)
        config = {
            "metadata": {"csv": str(csv)},
            "features": {"type": "logmelspectrogram",
                         "melspectrogram": {"num_mel_bins": 24},
                         "group_by_input_length": {"max_batch_size": 8}},
            "experiment": {
                "cache_directory": str(tmp_path / "cache"), "name": "t",
                "input_shape": [298, 24], "output_shape": [3],
                "model": {"key": "dnn"},
                "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
                "loss": {"cls": "SparseCategoricalCrossentropy"},
                "callbacks": [{"cls": "ModelCheckpoint",
                               "kwargs": {"monitor": "val_loss", "mode": "min"}}],
                "epochs": 2,
                "data": {"train": {"split": "train", "batch_size": 4},
                         "test": {"split": "test"}}},
        }
        cfg = tmp_path / "config.yaml"
        import yaml
        cfg.write_text(yaml.safe_dump(config))
        assert main(["train", str(cfg)]) == 0
        ckpts = list((tmp_path / "cache" / "dnn" / "t" / "checkpoints").glob("*.ckpt"))
        assert len(ckpts) == 2
        assert main(["evaluate", str(cfg)]) == 0
        report = json.loads(capsys.readouterr().out)
        assert "accuracy" in report and "avg_detection_cost" in report

    def test_export_cli_journey(self, tmp_path, audio_fixtures):
        """train -> export --stablehlo from the shell: the output directory
        holds a reloadable spec+weights model AND a symbolic-batch StableHLO
        artifact that reproduces the checkpointed model's scores."""
        from lidbox_tpu.cli import main
        import yaml
        meta = _meta(audio_fixtures)
        csv = tmp_path / "meta.csv"
        meta.reset_index().to_csv(csv, index=False)
        config = {
            "metadata": {"csv": str(csv)},
            "features": {"type": "logmelspectrogram",
                         "melspectrogram": {"num_mel_bins": 24},
                         "group_by_input_length": {"max_batch_size": 8}},
            "experiment": {
                "cache_directory": str(tmp_path / "cache"), "name": "ex",
                "input_shape": [298, 24], "output_shape": [3],
                "model": {"key": "dnn"},
                "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
                "loss": {"cls": "SparseCategoricalCrossentropy"},
                "callbacks": [{"cls": "ModelCheckpoint",
                               "kwargs": {"monitor": "val_loss",
                                          "mode": "min"}}],
                "epochs": 1,
                "data": {"train": {"split": "train", "batch_size": 4},
                         "test": {"split": "test"}}},
        }
        cfg = tmp_path / "config.yaml"
        cfg.write_text(yaml.safe_dump(config))
        assert main(["train", str(cfg)]) == 0
        out = tmp_path / "deploy"
        assert main(["export", str(cfg), str(out), "--stablehlo"]) == 0

        from lidbox_tpu import export as export_mod
        loaded = export_mod.load_model(str(out))
        x = np.random.default_rng(0).normal(
            0, 1, (3, 298, 24)).astype(np.float32)
        ref = np.asarray(loaded(x))
        assert ref.shape == (3, 3)
        fn = export_mod.load_stablehlo(
            str(out / export_mod.STABLEHLO_NAME))
        # symbolic batch: the one artifact serves other batch sizes too
        np.testing.assert_allclose(np.asarray(fn(x)), ref,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fn(x[:1])), ref[:1],
                                   rtol=1e-5, atol=1e-6)

    def test_train_orbax_backend_resumes_via_cli(self, tmp_path,
                                                 audio_fixtures):
        """CLI journey for the orbax checkpoint backend: train writes orbax
        checkpoint DIRECTORIES, `train --resume` picks up the latest one
        and continues epoch numbering, and evaluate restores from it."""
        from lidbox_tpu.cli import main
        import yaml
        meta = _meta(audio_fixtures)
        csv = tmp_path / "meta.csv"
        meta.reset_index().to_csv(csv, index=False)
        config = {
            "metadata": {"csv": str(csv)},
            "features": {"type": "logmelspectrogram",
                         "melspectrogram": {"num_mel_bins": 24},
                         "group_by_input_length": {"max_batch_size": 8}},
            "experiment": {
                "cache_directory": str(tmp_path / "cache"), "name": "ob",
                "input_shape": [298, 24], "output_shape": [3],
                "model": {"key": "dnn"},
                "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
                "loss": {"cls": "SparseCategoricalCrossentropy"},
                "callbacks": [{"cls": "ModelCheckpoint",
                               "kwargs": {"monitor": "val_loss", "mode": "min",
                                          "backend": "orbax"}}],
                "epochs": 2,
                "data": {"train": {"split": "train", "batch_size": 4},
                         "test": {"split": "test"}}},
        }
        cfg = tmp_path / "config.yaml"
        cfg.write_text(yaml.safe_dump(config))
        assert main(["train", str(cfg)]) == 0
        ckpt_dir = tmp_path / "cache" / "dnn" / "ob" / "checkpoints"
        dirs = sorted(p.name for p in ckpt_dir.iterdir() if p.is_dir())
        assert len(dirs) == 2 and dirs[-1].startswith("epoch000002")

        # resume: absolute epoch target 4 -> exactly two MORE checkpoints
        config["experiment"]["epochs"] = 4
        cfg.write_text(yaml.safe_dump(config))
        assert main(["train", str(cfg), "--resume"]) == 0
        dirs = sorted(p.name for p in ckpt_dir.iterdir() if p.is_dir())
        assert len(dirs) == 4 and dirs[-1].startswith("epoch000004")

        # evaluate restores the best orbax checkpoint
        assert main(["evaluate", str(cfg)]) == 0

    def test_train_fused_on_device_augment(self, tmp_path, audio_fixtures):
        """CLI train with features.on_device_augment runs the fused
        config-5 route (pipeline stops at signals, augmentation compiles
        into the train step)."""
        from lidbox_tpu.cli import main
        import yaml
        meta = _meta(audio_fixtures)
        csv = tmp_path / "meta.csv"
        meta.reset_index().to_csv(csv, index=False)
        config = {
            "metadata": {"csv": str(csv)},
            "pre_process": {"chunks": {"length_ms": 500, "step_ms": 500}},
            "features": {"type": "logmelspectrogram",
                         "sample_rate": 16000,
                         "melspectrogram": {"num_mel_bins": 24},
                         "stft_method": "matmul",
                         "on_device_augment": {
                             "fir_coefs": 5, "speed_range": [0.9, 1.1],
                             "vad": True, "vad_min_non_speech_ms": 0,
                             "specaug": {"time_masks": 1, "freq_masks": 1}}},
            "experiment": {
                "cache_directory": str(tmp_path / "cache"), "name": "fused",
                "input_shape": [None, 24], "output_shape": [3],
                "model": {"key": "xvector"},
                "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
                "loss": {"cls": "SparseCategoricalCrossentropy"},
                "callbacks": [{"cls": "ModelCheckpoint",
                               "kwargs": {"monitor": "val_loss",
                                          "mode": "min"}}],
                "epochs": 1,
                "data": {"train": {"split": "train", "batch_size": 4},
                         "test": {"split": "test"}}}}
        cfg = tmp_path / "config.yaml"
        cfg.write_text(yaml.safe_dump(config))
        assert main(["train", str(cfg)]) == 0
        # non-train splits featurize clean under the same config, so
        # evaluate works on the fused config too (regression: the fused
        # skip used to stop EVERY split at raw signals)
        assert main(["evaluate", str(cfg)]) == 0
        # fused training wrote metric-named checkpoints via the callbacks...
        import glob
        ckpts = glob.glob(str(tmp_path / "cache" / "xvector" / "fused"
                              / "checkpoints" / "epoch*.ckpt"))
        assert len(ckpts) == 1, ckpts
        # ...so shell-level classification serves the fused-trained model
        csv_out = tmp_path / "fused_scores.csv"
        wav = str(meta.path.iloc[0])
        assert main(["classify", str(cfg), wav,
                     "--output", str(csv_out)]) == 0
        import pandas as pd
        assert len(pd.read_csv(csv_out, index_col=0)) == 1

    def test_extract_embeddings_command(self, tmp_path, audio_fixtures):
        """Full CLI journey: train -> checkpoints -> extract-embeddings npz."""
        from lidbox_tpu.cli import main
        import yaml
        meta = _meta(audio_fixtures)
        csv = tmp_path / "meta.csv"
        meta.reset_index().to_csv(csv, index=False)
        cache = str(tmp_path / "cache")
        experiment = {
            "cache_directory": cache, "name": "t",
            "input_shape": [298, 24], "output_shape": [3],
            "model": {"key": "xvector"},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
            "loss": {"cls": "SparseCategoricalCrossentropy"},
            "callbacks": [{"cls": "ModelCheckpoint",
                           "kwargs": {"monitor": "val_loss", "mode": "min"}}],
            "epochs": 1,
            "data": {"train": {"split": "train", "batch_size": 4},
                     "test": {"split": "test"}}}
        config = {
            "metadata": {"csv": str(csv)},
            "features": {"type": "logmelspectrogram",
                         "melspectrogram": {"num_mel_bins": 24},
                         "group_by_input_length": {"max_batch_size": 8}},
            "experiment": experiment,
        }
        cfg = tmp_path / "config.yaml"
        cfg.write_text(yaml.safe_dump(config))
        assert main(["train", str(cfg)]) == 0

        config["embeddings"] = {
            "extractors": [{
                "cache_directory": cache, "model": {"key": "xvector"},
                "experiment_name": "t", "input_shape": [298, 24],
                "output_shape": [3],
                "best_checkpoint": {"monitor": "val_loss", "mode": "min"}}],
            "batch_size": 4}
        cfg.write_text(yaml.safe_dump(config))
        out = tmp_path / "emb.npz"
        assert main(["extract-embeddings", str(cfg), str(out),
                     "--split", "test"]) == 0
        data = np.load(out)
        assert data["embeddings"].shape == (2, 512)
        assert len(data["ids"]) == 2

        # mesh-sharded extraction is declarative (--data-parallel; no live
        # Mesh object in any config) and matches single-device numerics
        dp_npz = tmp_path / "emb_dp.npz"
        assert main(["extract-embeddings", str(cfg), str(dp_npz),
                     "--split", "test", "--data-parallel"]) == 0
        dp_data = np.load(dp_npz)
        assert list(dp_data["ids"]) == list(data["ids"])
        np.testing.assert_allclose(dp_data["embeddings"],
                                   data["embeddings"], atol=1e-5)

        # shell-level serving: classify wav files with the best checkpoint
        csv_out = tmp_path / "scores.csv"
        wavs = [p for p in meta.path]
        assert main(["classify", str(cfg), *wavs[:3],
                     "--output", str(csv_out)]) == 0
        import pandas as pd
        scored = pd.read_csv(csv_out, index_col=0)
        assert len(scored) == 3
        # mesh-sharded classification produces the same scores
        dp_out = tmp_path / "scores_dp.csv"
        assert main(["classify", str(cfg), *wavs[:3], "--data-parallel",
                     "--batch-size", "8", "--output", str(dp_out)]) == 0
        dp_scored = pd.read_csv(dp_out, index_col=0)
        score_cols = [c for c in scored.columns if c.startswith("score_")]
        np.testing.assert_allclose(dp_scored[score_cols].to_numpy(),
                                   scored[score_cols].to_numpy(),
                                   rtol=1e-4, atol=1e-5)
        assert set(scored.label) <= {"high", "low", "noise"}
        score_cols = [c for c in scored.columns if c.startswith("score_")]
        assert len(score_cols) == 3
        np.testing.assert_allclose(
            np.exp(scored[score_cols].to_numpy()).sum(axis=1), 1.0, rtol=1e-3)


def test_get_total_duration_and_format(tmp_path):
    """reference: lidbox/system.py:71-78."""
    from lidbox_tpu import system, testutil
    from lidbox_tpu.features import io as audio_io
    paths = []
    for i in range(3):
        p = tmp_path / f"d{i}.wav"
        audio_io.write_mono_wav(p, testutil.sinewave(100, 16000, 2.0), 16000)
        paths.append(str(p))
    assert system.get_total_duration(paths) == (0, 0, 6)
    assert system.format_duration((1, 2, 3)) == "01h 02min 03sec"
    assert system.format_duration(system.get_total_duration(paths)) == \
        "00h 00min 06sec"
