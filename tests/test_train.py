"""
Training loop tests: loss decreases on a separable toy LID task, C_avg
streams during eval, checkpoints save/restore/resume, data-parallel mesh
training matches expectations (reference had no training tests —
SURVEY.md §4 implication; Keras-fit semantics from keras_utils.py:191-203).
"""
import glob
import os

import numpy as np
import pytest

import jax
import optax

import lidbox_tpu.models as models
from lidbox_tpu import parallel
from lidbox_tpu.losses import nll_loss
from lidbox_tpu.metrics import SparseAverageDetectionCost, cavg_thresholds
from lidbox_tpu.train import (ModelCheckpoint, Trainer, batches_from_dataset,
                              get_best_checkpoint_path, optimizer_from_config)
from lidbox_tpu.train.checkpoint import parse_checkpoint_value

N_CLASSES = 3
T, F = 24, 8


def toy_batches(n_batches=6, batch=16, seed=0):
    """Separable synthetic features: class k has mean k in channel k."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        y = rng.integers(0, N_CLASSES, batch)
        x = rng.normal(0, 1, (batch, T, F)).astype(np.float32)
        for i, k in enumerate(y):
            x[i, :, k] += 2.0
        out.append({"input": x, "target": y.astype(np.int32)})
    return out


def make_trainer(tmp_path=None, mesh=None, callbacks=(), metrics=None):
    model = models.create("dnn", (T, F), N_CLASSES)
    return Trainer(model, optax.adam(5e-3), nll_loss,
                   metrics=metrics or {}, mesh=mesh, callbacks=list(callbacks),
                   lr_schedule=5e-3,
                   log_dir=str(tmp_path) if tmp_path else None)


class TestTrainer:
    def test_loss_decreases(self):
        trainer = make_trainer()
        batches = toy_batches()
        history = trainer.fit(lambda: batches, epochs=5)
        assert history[-1]["loss"] < history[0]["loss"] * 0.7

    def test_eval_metrics_and_cavg(self):
        metrics = {"C_avg": SparseAverageDetectionCost(
            N_CLASSES, cavg_thresholds(20, -5.0, 0.0))}
        trainer = make_trainer(metrics=metrics)
        batches = toy_batches()
        trainer.fit(lambda: batches, epochs=6)
        logs = trainer.evaluate(lambda: toy_batches(2, seed=9))
        assert 0.0 <= logs["val_C_avg"] <= 1.0
        assert logs["val_C_avg"] < 0.25  # separable task -> low detection cost
        assert logs["val_loss"] < 0.6

    def test_checkpoint_roundtrip_and_resume(self, tmp_path):
        ckpt_dir = str(tmp_path / "checkpoints")
        trainer = make_trainer(
            tmp_path, callbacks=[ModelCheckpoint(ckpt_dir)])
        batches = toy_batches()
        trainer.fit(lambda: batches, lambda: toy_batches(2, seed=9), epochs=3)
        files = glob.glob(os.path.join(ckpt_dir, "*.ckpt"))
        assert len(files) == 3
        best = get_best_checkpoint_path(ckpt_dir, key="val_loss", mode="min")
        assert best is not None
        assert float(parse_checkpoint_value(best, "val_loss")) == min(
            float(parse_checkpoint_value(p, "val_loss")) for p in files)

        # Resume: epoch parsed from name, state restored bit-exact
        trainer2 = make_trainer()
        trainer2.create_state()
        latest = get_best_checkpoint_path(ckpt_dir)  # greatest epoch
        trainer2.restore(latest)
        assert trainer2.initial_epoch == 3
        p1 = jax.device_get(trainer.state.params)
        p2 = jax.device_get(trainer2.state.params)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
        # continuing for 0 additional epochs is a no-op
        history = trainer2.fit(lambda: batches, epochs=3)
        assert history == []

    def test_metrics_logger_writes_jsonl(self, tmp_path):
        trainer = make_trainer(tmp_path)
        trainer.fit(lambda: toy_batches(2), epochs=2)
        from lidbox_tpu.system import iter_log_events
        events = list(iter_log_events(os.path.join(tmp_path, "events.jsonl")))
        tags = {t for _, _, t, _ in events}
        assert "loss" in tags and "examples_per_sec" in tags

    def test_predict_shapes(self):
        trainer = make_trainer()
        out = trainer.predict(lambda: toy_batches(2))
        assert out.shape == (32, N_CLASSES)
        np.testing.assert_allclose(np.exp(out).sum(axis=1), 1.0, rtol=1e-4)

    def test_predict_accepts_unlabeled_batches(self):
        # serving-style inference has no 'target' key; the staging layer
        # must size batches from 'input' instead of crashing
        trainer = make_trainer()
        labeled = toy_batches(2)
        unlabeled = [{"input": b["input"]} for b in labeled]
        out = trainer.predict(lambda: unlabeled)
        assert out.shape == (32, N_CLASSES)

    def test_save_best_only_without_monitor_warns_not_freezes(self, tmp_path):
        # a validation-free run has no val_loss: save_best_only must skip
        # with a warning (Keras semantics) — the old 0.0-placeholder
        # comparison saved epoch 1 and then silently never saved again
        ckpt_dir = str(tmp_path / "ckpts")
        trainer = make_trainer(
            tmp_path, callbacks=[ModelCheckpoint(ckpt_dir,
                                                 save_best_only=True)])
        trainer.fit(lambda: toy_batches(2), epochs=2)  # no validation
        assert glob.glob(os.path.join(ckpt_dir, "*.ckpt")) == []
        # with save_best_only=False the run still checkpoints, named by
        # the train loss
        ckpt_dir2 = str(tmp_path / "ckpts2")
        trainer2 = make_trainer(
            tmp_path, callbacks=[ModelCheckpoint(ckpt_dir2)])
        trainer2.fit(lambda: toy_batches(2), epochs=2)
        assert len(glob.glob(os.path.join(ckpt_dir2, "*.ckpt"))) == 2

    def test_stop_training_resets_on_new_fit(self):
        # a trainer stopped early must train again on the next fit() call
        trainer = make_trainer()
        trainer.fit(lambda: toy_batches(2), epochs=1)
        trainer.stop_training = True  # as EarlyStopping would leave it
        history = trainer.fit(lambda: toy_batches(2), epochs=3)
        assert len(history) == 3


class TestDataParallel:
    def test_mesh_training_runs_and_matches_single_device(self):
        """The same jit program under an 8-device mesh: batch sharded over
        'data', grads all-reduced by GSPMD. Loss trajectory should match the
        single-device run to float tolerance."""
        mesh = parallel.get_mesh()
        assert mesh.devices.size == 8
        batches = toy_batches()
        t_single = make_trainer()
        h_single = t_single.fit(lambda: batches, epochs=2)
        t_mesh = make_trainer(mesh=mesh)
        h_mesh = t_mesh.fit(lambda: batches, epochs=2)
        np.testing.assert_allclose(h_mesh[0]["loss"], h_single[0]["loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(h_mesh[-1]["loss"], h_single[-1]["loss"],
                                   rtol=1e-3)

    def test_checkpoint_restore_into_mesh_trainer(self, tmp_path):
        """A checkpoint written by a single-device run restores into a
        mesh-sharded trainer (replicated placement) and training continues."""
        ckpt_dir = str(tmp_path / "ckpts")
        single = make_trainer(callbacks=[ModelCheckpoint(ckpt_dir)])
        batches = toy_batches()
        single.fit(lambda: batches, lambda: toy_batches(2, seed=9), epochs=2)

        mesh = parallel.get_mesh()
        resumed = make_trainer(mesh=mesh)
        resumed.create_state()
        latest = get_best_checkpoint_path(ckpt_dir)
        resumed.restore(latest)
        assert resumed.initial_epoch == 2
        p1 = jax.device_get(single.state.params)
        p2 = jax.device_get(resumed.state.params)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
        history = resumed.fit(lambda: batches, epochs=4)
        assert len(history) == 2  # epochs 3 and 4
        assert np.isfinite(history[-1]["loss"])

    def test_tensor_parallel_matches_single_device(self):
        """dp+tp on a 2-D (data=4, model=2) mesh: kernels column-sharded
        over the model axis (GSPMD inserts the collectives), training
        matches the single-device trajectory."""
        from jax.sharding import PartitionSpec
        mesh2d = parallel.get_mesh_2d(data_size=4, model_size=2)
        assert mesh2d.devices.shape == (4, 2)
        batches = toy_batches()
        t_single = make_trainer()
        h_single = t_single.fit(lambda: batches, epochs=2)

        model = models.create("dnn", (T, F), N_CLASSES)
        t_tp = Trainer(model, optax.adam(5e-3), nll_loss,
                       mesh=mesh2d,
                       param_sharding=parallel.column_parallel_rule(mesh2d))
        t_tp.create_state()
        # at least the wide Dense kernels must actually be model-sharded
        specs = [leaf.sharding.spec
                 for leaf in jax.tree_util.tree_leaves(t_tp.state.params)
                 if hasattr(leaf, "sharding") and leaf.ndim >= 2]
        assert any(spec == PartitionSpec(None, parallel.MODEL_AXIS)
                   for spec in specs), specs
        h_tp = t_tp.fit(lambda: batches, epochs=2)
        np.testing.assert_allclose(h_tp[0]["loss"], h_single[0]["loss"],
                                   rtol=1e-4)
        np.testing.assert_allclose(h_tp[-1]["loss"], h_single[-1]["loss"],
                                   rtol=1e-3)
        # params stay sharded after updates (no silent re-replication)
        specs_after = [leaf.sharding.spec
                       for leaf in jax.tree_util.tree_leaves(t_tp.state.params)
                       if hasattr(leaf, "sharding") and leaf.ndim >= 2]
        assert any(spec == PartitionSpec(None, parallel.MODEL_AXIS)
                   for spec in specs_after), specs_after

    def test_restore_preserves_tensor_parallel_sharding(self, tmp_path):
        """Checkpoint restore must re-apply the model-axis param shardings
        (deserialization returns plain host arrays)."""
        from jax.sharding import PartitionSpec
        ckpt_dir = str(tmp_path / "ckpts")
        single = make_trainer(callbacks=[ModelCheckpoint(ckpt_dir)])
        batches = toy_batches()
        single.fit(lambda: batches, lambda: toy_batches(2, seed=9), epochs=1)

        mesh2d = parallel.get_mesh_2d(data_size=4, model_size=2)
        t_tp = Trainer(models.create("dnn", (T, F), N_CLASSES),
                       optax.adam(5e-3), nll_loss, mesh=mesh2d,
                       param_sharding=parallel.column_parallel_rule(mesh2d))
        t_tp.create_state()
        t_tp.restore(get_best_checkpoint_path(ckpt_dir))
        specs = [leaf.sharding.spec
                 for leaf in jax.tree_util.tree_leaves(t_tp.state.params)
                 if hasattr(leaf, "sharding") and leaf.ndim >= 2]
        assert any(spec == PartitionSpec(None, parallel.MODEL_AXIS)
                   for spec in specs), specs
        p1 = jax.device_get(single.state.params)
        p2 = jax.device_get(t_tp.state.params)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
        history = t_tp.fit(lambda: batches, epochs=2)
        assert np.isfinite(history[-1]["loss"])

    def test_mesh_embedding_extractor_matches_single_device(self, tmp_path):
        """from_config_as_embedding_extractor_fn(mesh=...) shards batches
        over the mesh (ragged tail padded to the next mesh multiple) and
        must reproduce the single-device embeddings."""
        from lidbox_tpu.models.model_utils import ModelWrapper
        from lidbox_tpu.train.checkpoint import save_checkpoint

        cache = tmp_path / "cache" / "xvector" / "exp"
        model = models.create("xvector", (T, F), N_CLASSES).init()
        save_checkpoint(str(cache / "checkpoints"),
                        {"params": jax.device_get(model.variables["params"])},
                        epoch=1, val_loss=0.5)
        config = {"cache_directory": str(tmp_path / "cache"),
                  "model": {"key": "xvector"}, "experiment_name": "exp",
                  "input_shape": [T, F], "output_shape": [N_CLASSES],
                  "best_checkpoint": {"monitor": "val_loss", "mode": "min"}}
        fn_single = ModelWrapper.from_config_as_embedding_extractor_fn(config)
        fn_mesh = ModelWrapper.from_config_as_embedding_extractor_fn(
            config, mesh=parallel.get_mesh())
        rng = np.random.default_rng(2)
        for batch in (16, 11):  # mesh-multiple and ragged tail
            x = rng.normal(0, 1, (batch, T, F)).astype(np.float32)
            np.testing.assert_allclose(np.asarray(fn_mesh(x)),
                                       np.asarray(fn_single(x)),
                                       rtol=1e-4, atol=1e-5)

    def test_embedding_extractor_stage_dtype_compresses_feed(self, tmp_path):
        """config stage_dtype=bfloat16: the extractor feed transfers half
        the bytes; embeddings differ from the f32 feed only by the input
        rounding (both mesh and single-device routes honor it)."""
        from lidbox_tpu.models.model_utils import ModelWrapper
        from lidbox_tpu.train.checkpoint import save_checkpoint

        cache = tmp_path / "cache" / "xvector" / "exp"
        model = models.create("xvector", (T, F), N_CLASSES).init()
        save_checkpoint(str(cache / "checkpoints"),
                        {"params": jax.device_get(model.variables["params"])},
                        epoch=1, val_loss=0.5)
        config = {"cache_directory": str(tmp_path / "cache"),
                  "model": {"key": "xvector"}, "experiment_name": "exp",
                  "input_shape": [T, F], "output_shape": [N_CLASSES],
                  "best_checkpoint": {"monitor": "val_loss", "mode": "min"}}
        fn_f32 = ModelWrapper.from_config_as_embedding_extractor_fn(config)
        fn_bf16 = ModelWrapper.from_config_as_embedding_extractor_fn(
            dict(config, stage_dtype="bfloat16"))
        fn_bf16_mesh = ModelWrapper.from_config_as_embedding_extractor_fn(
            dict(config, stage_dtype="bfloat16"), mesh=parallel.get_mesh())
        x = np.random.default_rng(2).normal(0, 1, (16, T, F)).astype(
            np.float32)
        ref = np.asarray(fn_f32(x))
        for fn in (fn_bf16, fn_bf16_mesh):
            out = np.asarray(fn(x))
            assert out.shape == ref.shape
            # bf16 input rounding only: ~3 decimal digits of mantissa
            np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)
            assert not np.array_equal(out, ref)  # the feed WAS compressed

    def test_extract_embeddings_num_parallel_calls(self, tmp_path):
        """embeddings config num_parallel_calls=N keeps N extractor calls
        in flight; the output must stay order-exact and bit-identical to
        the sequential default (the knob trades dispatch overlap, never
        results)."""
        from lidbox_tpu.data import steps as data_steps
        from lidbox_tpu.data.dataset import Dataset
        from lidbox_tpu.train.checkpoint import save_checkpoint

        cache = tmp_path / "cache" / "xvector" / "exp"
        model = models.create("xvector", (T, F), N_CLASSES).init()
        save_checkpoint(str(cache / "checkpoints"),
                        {"params": jax.device_get(model.variables["params"])},
                        epoch=1, val_loss=0.5)
        extractor_cfg = {
            "cache_directory": str(tmp_path / "cache"),
            "model": {"key": "xvector"}, "experiment_name": "exp",
            "input_shape": [T, F], "output_shape": [N_CLASSES],
            "best_checkpoint": {"monitor": "val_loss", "mode": "min"}}
        rng = np.random.default_rng(3)
        elements = [{"id": f"utt{i}",
                     "input": rng.normal(0, 1, (T, F)).astype(np.float32)}
                    for i in range(10)]

        def run(config):
            ds = data_steps.extract_embeddings(
                Dataset.from_elements(list(elements)), config)
            return ds.collect()

        base = {"extractors": [extractor_cfg], "batch_size": 4}
        seq = run(base)
        par = run(dict(base, num_parallel_calls=2))
        assert [e["id"] for e in par] == [e["id"] for e in seq]
        for a, b in zip(par, seq):
            np.testing.assert_array_equal(a["embedding"], b["embedding"])

    def test_mesh_eval_metric_state(self):
        mesh = parallel.get_mesh()
        metrics = {"C_avg": SparseAverageDetectionCost(
            N_CLASSES, cavg_thresholds(10, -5.0, 0.0))}
        trainer = make_trainer(mesh=mesh, metrics=metrics)
        trainer.fit(lambda: toy_batches(4), epochs=2)
        logs = trainer.evaluate(lambda: toy_batches(2, seed=5))
        assert 0.0 <= logs["val_C_avg"] <= 1.0


class TestStagedFeed:
    """The K-deep host->device feed pipeline: compression + prefetch must
    leave the training trajectory identical (up to staged-input rounding)."""

    def test_prefetch_depth_preserves_order_and_trajectory(self):
        batches = toy_batches()
        hist_ref = make_trainer().fit(lambda: batches, epochs=2)
        deep = models.create("dnn", (T, F), N_CLASSES)
        trainer = Trainer(deep, optax.adam(5e-3), nll_loss, prefetch=6)
        hist_deep = trainer.fit(lambda: batches, epochs=2)
        for a, b in zip(hist_ref, hist_deep):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_staged_batches_are_device_arrays(self):
        trainer = make_trainer()
        (n, staged), = list(trainer._staged(toy_batches(n_batches=1)))
        assert n == 16
        assert isinstance(staged["input"], jax.Array)

    def test_stage_dtype_bf16_halves_feed_bytes_and_trains(self):
        import jax.numpy as jnp
        batches = toy_batches()
        model = models.create("dnn", (T, F), N_CLASSES)
        trainer = Trainer(model, optax.adam(5e-3), nll_loss,
                          stage_dtype="bfloat16")
        (_, staged), = list(trainer._staged(batches[:1]))
        assert staged["input"].dtype == jnp.bfloat16
        assert staged["input"].nbytes == batches[0]["input"].nbytes // 2
        history = trainer.fit(lambda: batches, epochs=4)
        assert history[-1]["loss"] < history[0]["loss"] * 0.8
        # decompression happens at the device edge: eval sees f32 numerics
        logs = trainer.evaluate(batches)
        assert np.isfinite(logs["val_loss"])

    def test_int16_stage_dtype_never_truncates_feature_batches(self):
        """Integer stage dtypes are a WAVEFORM staging format; float
        feature batches must pass through _compress untouched (casting
        log-mel floats to int16 would silently corrupt training)."""
        import jax.numpy as jnp
        model = models.create("dnn", (T, F), N_CLASSES)
        trainer = Trainer(model, optax.adam(5e-3), nll_loss,
                          stage_dtype="int16")
        batches = toy_batches(n_batches=1)
        (_, staged), = list(trainer._staged(batches))
        assert staged["input"].dtype == jnp.float32
        np.testing.assert_array_equal(np.asarray(staged["input"]),
                                      batches[0]["input"])

    def test_jax_array_inputs_still_compressed_and_staged(self):
        """User batches whose input is already a jax.Array must flow
        through the same compress/pad/shard staging as numpy batches —
        only the fit()-internal cache path bypasses _put."""
        import jax.numpy as jnp
        model = models.create("dnn", (T, F), N_CLASSES)
        trainer = Trainer(model, optax.adam(5e-3), nll_loss,
                          stage_dtype="bfloat16")
        b = toy_batches(n_batches=1)[0]
        b["input"] = jnp.asarray(b["input"])
        staged = trainer._put(b)
        assert staged["input"].dtype == jnp.bfloat16

    def test_early_break_shuts_down_producer(self):
        trainer = make_trainer()
        many = toy_batches(n_batches=12)
        seen = 0
        for _, _batch in trainer._staged(lambda: many):
            seen += 1
            if seen == 3:
                break
        assert seen == 3  # no deadlock, producer unblocks via stop event

    def test_staged_propagates_loader_errors(self):
        trainer = make_trainer()

        def bad():
            yield from toy_batches(n_batches=1)
            raise RuntimeError("decoder exploded")
        with pytest.raises(RuntimeError, match="decoder exploded"):
            list(trainer._staged(bad()))


class TestCacheStaged:
    """Device-resident epoch caching: epoch 2+ reuses the staged batches
    (zero feed traffic) with an identical training trajectory."""

    def test_fit_trajectory_matches_and_loader_runs_once(self):
        batches = toy_batches()
        hist_ref = make_trainer().fit(lambda: batches, epochs=3)

        pulls = {"n": 0}

        def counting_loader():
            pulls["n"] += 1
            return batches
        model = models.create("dnn", (T, F), N_CLASSES)
        trainer = Trainer(model, optax.adam(5e-3), nll_loss,
                          cache_staged=True)
        hist = trainer.fit(counting_loader, epochs=3, cache_shuffle=False)
        assert pulls["n"] == 1  # epochs 2-3 trained from the device cache
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_cache_shuffle_reorders_but_covers_all_batches(self):
        batches = toy_batches(n_batches=5)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        hist = trainer.fit(lambda: batches, epochs=3)  # cache_shuffle on
        # every epoch ran exactly len(batches) steps from the cache
        assert int(jax.device_get(trainer.state.step)) == 15
        assert np.all(np.isfinite([h["loss"] for h in hist]))

    def test_cache_shuffle_rows_matches_streamed_recomposition(self):
        """cache_shuffle="rows" re-draws batch COMPOSITION each epoch via
        an in-scan row gather. Exactness: the trajectory must equal a
        streamed run fed the SAME row-permuted batches (reconstructed
        from the trainer's seeded epoch permutation) — proving the gather
        recomposes rows correctly, not just 'some shuffle happened'."""
        from lidbox_tpu import RANDOM_SEED
        batches = toy_batches(n_batches=4)
        corpus_x = np.concatenate([b["input"] for b in batches])
        corpus_y = np.concatenate([b["target"] for b in batches])
        K, B = len(batches), len(batches[0]["target"])

        def recomposed(epoch):
            if epoch == 1:
                return batches
            rng = np.random.default_rng(RANDOM_SEED + epoch)
            rng.permutation(1)  # the group-order draw (one shape group)
            idx = rng.permutation(K * B).reshape(K, B)
            return [{"input": corpus_x[idx[k]], "target": corpus_y[idx[k]]}
                    for k in range(K)]

        epoch_counter = {"n": 0}

        def streamed_loader():
            epoch_counter["n"] += 1
            return recomposed(epoch_counter["n"])

        hist_ref = make_trainer().fit(streamed_loader, epochs=3)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        hist = trainer.fit(lambda: batches, epochs=3, cache_shuffle="rows")
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)

    def test_validation_batches_cached_and_logs_match(self):
        batches = toy_batches()
        val = toy_batches(n_batches=2, seed=1)
        hist_ref = make_trainer().fit(lambda: batches, lambda: val, epochs=3)
        val_pulls = {"n": 0}

        def val_loader():
            val_pulls["n"] += 1
            return val
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        hist = trainer.fit(lambda: batches, val_loader, epochs=3,
                           cache_shuffle=False)
        assert val_pulls["n"] == 1  # staged val reused across epochs
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["val_loss"], b["val_loss"],
                                       rtol=1e-6)

    def test_steps_per_epoch_truncation_disables_cache(self):
        batches = toy_batches(n_batches=6)
        pulls = {"n": 0}

        def counting_loader():
            pulls["n"] += 1
            return batches
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        trainer.fit(counting_loader, epochs=2, steps_per_epoch=2)
        assert pulls["n"] == 2  # truncated epochs must not seed the cache

    def test_hbm_guard_falls_back_to_streaming(self, caplog):
        """VERDICT r4 #5: a staged corpus that cannot fit the HBM budget
        (x2 consolidation transient) must fall back to the streaming feed
        with a warning, not die in an opaque XLA OOM."""
        batches = toy_batches()
        hist_ref = make_trainer().fit(lambda: batches, epochs=3)
        pulls = {"n": 0}

        def counting_loader():
            pulls["n"] += 1
            return batches
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True,
                          cache_bytes_limit=1024)  # mocked tiny budget
        import logging
        with caplog.at_level(logging.WARNING, logger="lidbox_tpu"):
            hist = trainer.fit(counting_loader, epochs=3,
                               cache_shuffle=False)
        assert pulls["n"] == 3  # every epoch streamed — cache refused
        assert any("HBM budget" in r.message for r in caplog.records)
        # the streamed fallback trains the identical trajectory
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_hbm_guard_val_overflow_keeps_train_cache(self):
        """A budget that fits the training cache but not the staged
        validation stacks keeps the (bigger-win) training cache and
        streams validation only."""
        batches = toy_batches(n_batches=2)
        val = toy_batches(n_batches=4, seed=1)
        train_bytes = sum(a.nbytes for b in batches for a in b.values())
        pulls, val_pulls = {"n": 0}, {"n": 0}

        def loader():
            pulls["n"] += 1
            return batches

        def val_loader():
            val_pulls["n"] += 1
            return val
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True,
                          cache_bytes_limit=2 * train_bytes + 64)
        hist = trainer.fit(loader, val_loader, epochs=3,
                           cache_shuffle=False)
        assert pulls["n"] == 1  # training cache kept
        # epoch-1 staging attempt + one streamed eval per epoch
        assert val_pulls["n"] == 4
        assert np.all(np.isfinite([h["val_loss"] for h in hist]))

    def test_hbm_accounting_counts_per_device_bytes(self):
        """The cache guard's accounting unit is PER-DEVICE HBM: a
        batch-sharded array on an 8-device mesh pins 1/8 of its bytes per
        device (counting global nbytes would refuse caching at 1/8 of
        actual capacity), while a replicated array pins full size on
        every device."""
        from lidbox_tpu.train.loop import _tree_device_nbytes
        mesh = parallel.get_mesh()
        x = np.zeros((8, 16, 4), np.float32)  # 2048 B global
        sharded = jax.device_put(x, parallel.batch_sharding(mesh))
        replicated = jax.device_put(x, parallel.replicated(mesh))
        assert _tree_device_nbytes({"x": sharded}) == x.nbytes // 8
        assert _tree_device_nbytes({"x": replicated}) == x.nbytes
        # host arrays count plain nbytes; None leaves are skipped
        assert _tree_device_nbytes((x, None)) == x.nbytes

    def test_fused_hbm_guard_falls_back_to_streaming(self):
        """fit_signals honors the same budget guard on the raw-waveform
        cache path."""
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(3)
        sr, t_len, b = 16000, 4000, 8
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(2)]
        pulls = {"n": 0}

        def loader():
            pulls["n"] += 1
            return batches
        frames = 1 + (t_len - 400) // 160
        trainer = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                          optax.adam(1e-3), nll_loss, cache_staged=True,
                          cache_bytes_limit=1024)
        fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig())
        hist = on_device.fit_signals(trainer, fn, loader, epochs=3,
                                     verbose=False)
        assert pulls["n"] == 3  # cache refused, streamed every epoch
        assert np.all(np.isfinite(hist))

    def test_fused_fit_caches_staged_validation(self):
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(11)
        sr, t_len, b = 16000, 4000, 8
        train = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                  rng.integers(0, N_CLASSES, b).astype(np.int32))]
        val = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                rng.integers(0, N_CLASSES, b).astype(np.int32))]
        frames = 1 + (t_len - 400) // 160
        trainer = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                          optax.adam(1e-3), nll_loss, cache_staged=True)
        aug = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig(specaug_time_masks=1))
        clean = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig())
        calls = {"n": 0}
        orig_staged = trainer._staged

        def counting_staged(*a, **k):
            calls["n"] += 1
            return orig_staged(*a, **k)
        trainer._staged = counting_staged
        hist = on_device.fit_signals(trainer, aug, lambda: train, epochs=3,
                                     verbose=False, val_batches=lambda: val,
                                     val_feature_fn=clean)
        # one staging pass for train + one for val; epochs 2-3 reuse the
        # device-resident copies
        assert calls["n"] == 2, calls
        vals = [h["val_loss"] for h in hist]
        assert np.all(np.isfinite(vals))

    def test_fused_fit_signals_caches_raw_waveforms(self):
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(9)
        sr, t_len, b = 16000, 4000, 8
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(3)]
        pulls = {"n": 0}

        def loader():
            pulls["n"] += 1
            return batches
        frames = 1 + (t_len - 400) // 160
        trainer = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                          optax.adam(1e-3), nll_loss, stage_dtype="int16",
                          cache_staged=True)
        fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig(specaug_time_masks=1))
        hist = on_device.fit_signals(trainer, fn, loader, epochs=3,
                                     verbose=False)
        assert pulls["n"] == 1
        assert np.all(np.isfinite(hist))
        # augmentation stays fresh: per-epoch losses differ even though
        # the cached waveform batches are identical
        assert len({round(float(h), 6) for h in hist}) == 3

    def test_fused_cached_replay_is_one_dispatch_per_epoch(self,
                                                           monkeypatch):
        """fit_signals' cache replay consolidates the staged waveform
        batches and scans the whole epoch in ONE program (augmentation
        stays fresh — the step RNG advances inside the scan)."""
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(21)
        sr, t_len, b = 16000, 4000, 8
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(3)]
        frames = 1 + (t_len - 400) // 160
        trainer = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                          optax.adam(1e-3), nll_loss, stage_dtype="int16",
                          cache_staged=True)
        fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig(specaug_time_masks=1))
        calls = []
        real = on_device.make_fused_replay_step

        def wrapped(tr, ffn, donate=False):
            step = real(tr, ffn, donate=donate)

            def counting(*a, **k):
                calls.append(1)
                return step(*a, **k)
            return counting
        monkeypatch.setattr(on_device, "make_fused_replay_step", wrapped)
        hist = on_device.fit_signals(trainer, fn, lambda: batches,
                                     epochs=3, verbose=False)
        assert len(calls) == 2, calls  # one whole-epoch dispatch x 2 epochs
        assert np.all(np.isfinite(hist))
        # fresh augmentation per epoch: losses differ across epochs
        assert len({round(float(h), 6) for h in hist}) == 3
        assert int(jax.device_get(trainer.state.step)) == 9

    def test_fused_replay_rows_matches_unrolled_single_steps(self):
        """make_fused_replay_rows_step exactness: the scanned row-gather
        replay must equal K separate single fused steps fed the same
        manually-gathered row batches, for BOTH the packed int16 layout
        (targets in row B) and the explicit-targets layout."""
        import jax.numpy as jnp
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(33)
        sr, t_len, K, B = 16000, 4000, 3, 8
        sigs = rng.uniform(-0.5, 0.5, (K, B, t_len)).astype(np.float32)
        tgts = rng.integers(0, N_CLASSES, (K, B)).astype(np.int32)
        frames = 1 + (t_len - 400) // 160
        fn_cfg = ({"type": "logmelspectrogram",
                   "melspectrogram": {"num_mel_bins": 16}},
                  on_device.AugmentConfig(specaug_time_masks=1))
        idx = np.random.default_rng(7).permutation(K * B).reshape(
            K, B).astype(np.int32)
        for packed in (False, True):
            def fresh():
                tr = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                             optax.adam(1e-3), nll_loss)
                tr.create_state()
                return tr, on_device.make_augmented_feature_fn(
                    sr, fn_cfg[0], fn_cfg[1])
            if packed:
                staged = np.stack([on_device.pack_targets_int16(
                    on_device.stage_signals(sigs[k], "int16"), tgts[k])
                    for k in range(K)])
                sig_flat = staged[:, :B, :].reshape(K * B, t_len)
                args = (staged, None)
            else:
                sig_flat = sigs.reshape(K * B, t_len)
                args = (sigs, tgts)
            tgt_flat = tgts.reshape(K * B)
            tr_a, fn_a = fresh()
            replay = on_device.make_fused_replay_rows_step(tr_a, fn_a)
            state_a, losses_a = replay(tr_a.state, jnp.asarray(args[0]),
                                       None if args[1] is None
                                       else jnp.asarray(args[1]),
                                       tr_a.rng, jnp.asarray(idx))
            tr_b, fn_b = fresh()
            single = on_device.make_fused_train_step(tr_b, fn_b)
            st = tr_b.state
            losses_b = []
            for k in range(K):
                st, loss = single(st, jnp.asarray(sig_flat[idx[k]]),
                                  jnp.asarray(tgt_flat[idx[k]]), tr_b.rng)
                losses_b.append(float(loss))
            np.testing.assert_allclose(np.asarray(losses_a), losses_b,
                                       rtol=1e-5)
            a_leaves = jax.tree_util.tree_leaves(state_a.params)
            b_leaves = jax.tree_util.tree_leaves(st.params)
            for a, b in zip(a_leaves, b_leaves):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)

    def test_fused_fit_signals_cache_shuffle_rows(self):
        """fit_signals cache_shuffle="rows": epochs 2+ replay through the
        row-recomposing scan (one dispatch/epoch), losses stay finite and
        the step count is exact."""
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(41)
        sr, t_len, b = 16000, 4000, 8
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(3)]
        frames = 1 + (t_len - 400) // 160
        trainer = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                          optax.adam(1e-3), nll_loss, stage_dtype="int16",
                          cache_staged=True)
        fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig(specaug_time_masks=1))
        hist = on_device.fit_signals(trainer, fn, lambda: batches,
                                     epochs=3, verbose=False,
                                     cache_shuffle="rows")
        assert np.all(np.isfinite(hist))
        assert int(jax.device_get(trainer.state.step)) == 9

    def test_cached_replay_is_one_dispatch_per_epoch(self):
        """VERDICT r3 next-step #3: with cache_staged on a single device,
        epochs 2+ replay the WHOLE epoch in one scanned program per shape
        stack — one dispatch round instead of one per step."""
        batches = toy_batches(n_batches=5)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        calls = {"replay": 0, "single": 0}
        real_replay = trainer._jit_replay_train_step
        real_single = trainer._jit_train_step

        def counting_replay(*a, **k):
            calls["replay"] += 1
            return real_replay(*a, **k)

        def counting_single(*a, **k):
            calls["single"] += 1
            return real_single(*a, **k)
        trainer._jit_replay_train_step = counting_replay
        trainer._jit_train_step = counting_single
        trainer.fit(lambda: batches, epochs=3)
        # epoch 1 feeds 5 per-step dispatches; epochs 2-3 replay the one
        # equal-shape stack in ONE dispatch each
        assert calls["single"] == 5, calls
        assert calls["replay"] == 2, calls
        assert int(jax.device_get(trainer.state.step)) == 15

    def test_cached_validation_scans_whole_epoch(self):
        """Cached validation consolidates into per-shape stacks and each
        per-epoch evaluate() runs ONE scanned program per stack
        (_replay_eval_step) — the per-batch eval step never fires after
        staging, and the scanned logs (incl. streamed C_avg carried
        through the scan) match a plain per-batch evaluate()."""
        batches = toy_batches(n_batches=4)
        val = toy_batches(n_batches=3, seed=9) + [
            {k: v[:7] for k, v in
             toy_batches(n_batches=1, seed=11)[0].items()}]
        metrics = {"C_avg": SparseAverageDetectionCost(
            N_CLASSES, cavg_thresholds(20, -5.0, 0.0))}
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, metrics=metrics,
                          cache_staged=True)
        calls = {"replay": 0, "single": 0}
        real_replay = trainer._jit_replay_eval_step
        real_single = trainer._jit_eval_step

        def counting_replay(*a, **k):
            calls["replay"] += 1
            return real_replay(*a, **k)

        def counting_single(*a, **k):
            calls["single"] += 1
            return real_single(*a, **k)
        trainer._jit_replay_eval_step = counting_replay
        trainer._jit_eval_step = counting_single
        hist = trainer.fit(lambda: batches, validation_batches=lambda: val,
                           epochs=3, cache_shuffle=False)
        # 2 shape stacks (3 full batches + 1 ragged tail) x 3 epochs,
        # zero per-batch eval dispatches
        assert calls == {"replay": 6, "single": 0}, calls
        ref = trainer.evaluate(val)
        assert np.isclose(hist[-1]["val_loss"], ref["val_loss"], rtol=1e-5)
        assert np.isclose(hist[-1]["val_C_avg"], ref["val_C_avg"],
                          rtol=1e-5, atol=1e-7)

    def test_cached_replay_handles_ragged_tail_stacks(self):
        """A ragged final batch consolidates into its own shape stack; the
        cached trajectory with cache_shuffle off still matches the
        uncached run exactly."""
        batches = toy_batches(n_batches=4) + [
            {k: v[:7] for k, v in toy_batches(n_batches=1, seed=5)[0].items()}]
        hist_ref = make_trainer().fit(lambda: batches, epochs=3)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        hist = trainer.fit(lambda: batches, epochs=3, cache_shuffle=False)
        assert int(jax.device_get(trainer.state.step)) == 15
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_interleaved_shapes_cache_shuffle_false_preserves_order(self):
        """cache_shuffle=False promises the EXACT epoch-1 sequence.
        Interleaved shape signatures (A, B, A) cannot replay order-exact
        as stack-major scans, so consolidation bails out and the cached
        trajectory still matches the uncached run batch for batch."""
        a1, a2 = toy_batches(n_batches=2)
        b1 = {k: (v[:, :16] if k == "input" else v)
              for k, v in toy_batches(n_batches=1, seed=5)[0].items()}
        batches = [a1, b1, a2]  # A, B, A — signatures interleave
        hist_ref = make_trainer().fit(lambda: batches, epochs=3)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, cache_staged=True)
        hist = trainer.fit(lambda: batches, epochs=3, cache_shuffle=False)
        assert int(jax.device_get(trainer.state.step)) == 9
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_consolidate_cache_preserve_order_bails_on_interleaved(self):
        trainer = make_trainer()
        mk = lambda t, seed: {  # noqa: E731
            k: (v[:, :t] if k == "input" else v)
            for k, v in toy_batches(n_batches=1, seed=seed)[0].items()}
        interleaved = [(16, mk(T, 0)), (16, mk(16, 1)), (16, mk(T, 2))]
        contiguous = [(16, mk(T, 0)), (16, mk(T, 2)), (16, mk(16, 1))]
        assert trainer._consolidate_cache(
            interleaved, grouped=False, preserve_order=True) is None
        groups = trainer._consolidate_cache(
            contiguous, grouped=False, preserve_order=True)
        assert groups is not None and len(groups) == 2
        # with shuffling on, order need not be preserved — consolidate
        groups = trainer._consolidate_cache(
            interleaved, grouped=False, preserve_order=False)
        assert groups is not None and len(groups) == 2

    def test_fused_interleaved_shapes_cache_shuffle_false_preserves_order(
            self):
        """fit_signals analogue: interleaved waveform lengths with
        cache_shuffle off fall back to order-exact per-entry replay."""
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(3)
        sr, b = 16000, 8

        def wav(t_len, seed):
            r = np.random.default_rng(seed)
            return (r.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    r.integers(0, N_CLASSES, b).astype(np.int32))
        batches = [wav(4000, 0), wav(2400, 1), wav(4000, 2)]
        feat = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig())

        def run(cache):
            model = models.create("dnn", (23, 16), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(1e-3), nll_loss,
                              cache_staged=cache)
            hist = on_device.fit_signals(trainer, feat, lambda: batches,
                                         epochs=3, verbose=False,
                                         cache_shuffle=False)
            return hist, jax.device_get(trainer.state.params)

        hist_c, params_c = run(True)
        hist_u, params_u = run(False)
        np.testing.assert_allclose(hist_c, hist_u, rtol=1e-6)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               params_c, params_u)


class TestMeshCacheAndDispatch:
    """Round-4 symmetry: grouped dispatch (steps_per_dispatch) and
    whole-epoch cached scan replay work under a mesh exactly as on a
    single device — stacks carry the scan axis replicated and the batch
    axis mesh-sharded (parallel.stacked_batch_sharding), so the scanned
    programs slice per-step batches without resharding collectives."""

    def test_mesh_cached_replay_scans_and_matches(self):
        mesh = parallel.get_mesh()
        batches = toy_batches(n_batches=5)
        hist_ref = make_trainer(mesh=mesh).fit(lambda: batches, epochs=3)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, mesh=mesh,
                          cache_staged=True)
        calls = {"replay": 0, "single": 0}
        real_replay = trainer._jit_replay_train_step
        real_single = trainer._jit_train_step

        def counting_replay(*a, **k):
            calls["replay"] += 1
            return real_replay(*a, **k)

        def counting_single(*a, **k):
            calls["single"] += 1
            return real_single(*a, **k)
        trainer._jit_replay_train_step = counting_replay
        trainer._jit_train_step = counting_single
        hist = trainer.fit(lambda: batches, epochs=3, cache_shuffle=False)
        # epoch 1 feeds 5 per-step dispatches; epochs 2-3 replay the one
        # equal-shape MESH-SHARDED stack in ONE scanned dispatch each
        assert calls == {"single": 5, "replay": 2}, calls
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_mesh_cache_shuffle_rows_matches_single_device(self):
        """Row-level cached reshuffle under a mesh: the [K*B] gather
        crosses shard boundaries (XLA inserts the collective), and the
        host-seeded permutation is device-count-invariant — the mesh
        trajectory equals the single-device one."""
        mesh = parallel.get_mesh()
        batches = toy_batches(n_batches=4)
        single = Trainer(models.create("dnn", (T, F), N_CLASSES),
                         optax.adam(5e-3), nll_loss, cache_staged=True)
        hist_ref = single.fit(lambda: batches, epochs=3,
                              cache_shuffle="rows")
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, mesh=mesh,
                          cache_staged=True)
        hist = trainer.fit(lambda: batches, epochs=3, cache_shuffle="rows")
        assert int(jax.device_get(trainer.state.step)) == 12
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-5)

    def test_mesh_cached_stack_sharding(self):
        """The consolidated cache stack keeps P(None, data): scan axis
        replicated, batch axis sharded over the mesh."""
        from jax.sharding import PartitionSpec
        mesh = parallel.get_mesh()
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, mesh=mesh,
                          cache_staged=True)
        trainer.fit(lambda: toy_batches(n_batches=3), epochs=2,
                    cache_shuffle=False)
        items = [(16, trainer._put(b)) for b in toy_batches(n_batches=3)]
        groups = trainer._consolidate_cache(items, grouped=False)
        assert len(groups) == 1
        stack = groups[0]["stack"]
        assert stack["input"].shape == (3, 16, T, F)
        spec = stack["input"].sharding.spec
        assert tuple(spec)[:2] == (None, parallel.DATA_AXIS), spec

    def test_mesh_grouped_dispatch_matches_single_dispatch(self):
        mesh = parallel.get_mesh()
        batches = toy_batches(n_batches=6)
        hist_ref = make_trainer(mesh=mesh).fit(lambda: batches, epochs=2)
        trainer = make_trainer(mesh=mesh)
        calls = {"multi": 0, "single": 0}
        real_multi = trainer._jit_multi_train_step
        real_single = trainer._jit_train_step

        def counting_multi(*a, **k):
            calls["multi"] += 1
            return real_multi(*a, **k)

        def counting_single(*a, **k):
            calls["single"] += 1
            return real_single(*a, **k)
        trainer._jit_multi_train_step = counting_multi
        trainer._jit_train_step = counting_single
        hist = trainer.fit(lambda: batches, epochs=2, steps_per_dispatch=3)
        # 6 batches / 3 per dispatch = 2 scanned dispatches per epoch
        assert calls == {"multi": 4, "single": 0}, calls
        assert int(jax.device_get(trainer.state.step)) == 12
        for a, b in zip(hist_ref, hist):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)

    def test_mesh_grouped_cache_ragged_validation(self):
        """The full composition under a mesh: steps_per_dispatch, a ragged
        tail batch (mesh-padded with example_mask), cache_staged replay
        with shuffling, and cached validation — finite logs, correct step
        count, and the cached validation matches a direct evaluate()."""
        mesh = parallel.get_mesh()
        batches = toy_batches(n_batches=4) + [
            {k: v[:11] for k, v in
             toy_batches(n_batches=1, seed=5)[0].items()}]
        val = toy_batches(n_batches=2, seed=9)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss, mesh=mesh,
                          cache_staged=True)
        hist = trainer.fit(lambda: batches, lambda: val, epochs=3,
                           steps_per_dispatch=2)
        assert int(jax.device_get(trainer.state.step)) == 15
        assert all(np.isfinite(h["loss"]) and np.isfinite(h["val_loss"])
                   for h in hist)
        ref = trainer.evaluate(val)
        np.testing.assert_allclose(hist[-1]["val_loss"], ref["val_loss"],
                                   rtol=1e-5)

    def test_mesh_fused_cached_replay_matches(self):
        """fit_signals under a mesh: cached whole-epoch scan replay
        (mesh-sharded waveform stacks, make_fused_replay_step) follows the
        same trajectory as re-feeding the frozen batches each epoch."""
        from lidbox_tpu.data import on_device
        mesh = parallel.get_mesh()
        rng = np.random.default_rng(7)
        sr, t_len, b = 16000, 4000, 16
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(3)]
        frames = 1 + (t_len - 400) // 160
        feat = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig(specaug_time_masks=1))

        def run(cache):
            model = models.create("dnn", (frames, 16), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(1e-3), nll_loss, mesh=mesh,
                              cache_staged=cache)
            return on_device.fit_signals(trainer, feat, lambda: batches,
                                         epochs=3, verbose=False,
                                         cache_shuffle=False)

        np.testing.assert_allclose(run(False), run(True), rtol=1e-6)

    def test_mesh_fused_grouped_dispatch_ragged_masks(self):
        """fit_signals steps_per_dispatch under a mesh, with a ragged tail
        batch that mesh-pads into a per-step example-mask stack: identical
        trajectory to per-step dispatches."""
        from lidbox_tpu.data import on_device
        mesh = parallel.get_mesh()
        rng = np.random.default_rng(8)
        sr, t_len, b = 16000, 4000, 16
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(2)]
        batches.append((batches[0][0][:11], batches[0][1][:11]))
        frames = 1 + (t_len - 400) // 160
        feat = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig())

        def run(spd):
            model = models.create("dnn", (frames, 16), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(1e-3), nll_loss, mesh=mesh)
            return on_device.fit_signals(trainer, feat, lambda: batches,
                                         epochs=2, verbose=False,
                                         steps_per_dispatch=spd)

        np.testing.assert_allclose(run(1), run(2), rtol=1e-6)

    def test_mesh2d_tensor_parallel_cached_replay(self):
        """Whole-epoch scan replay composes with 2-D DP x TP shardings:
        column-sharded kernels train through the scanned replay program
        with the same trajectory as per-step dispatches."""
        mesh2d = parallel.get_mesh_2d(data_size=4, model_size=2)
        batches = toy_batches(n_batches=4)

        def run(cache):
            model = models.create("dnn", (T, F), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(
                model, optax.adam(5e-3), nll_loss, mesh=mesh2d,
                param_sharding=parallel.column_parallel_rule(mesh2d),
                cache_staged=cache)
            hist = trainer.fit(lambda: batches, epochs=3,
                               cache_shuffle=False)
            return hist, jax.device_get(trainer.state.params)

        hist_c, params_c = run(True)
        hist_u, params_u = run(False)
        for a, b in zip(hist_u, hist_c):
            np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(x, y, rtol=1e-6),
            params_u, params_c)


class TestFeedGuardGating:
    """The feed-parity guard (and process-local batch assembly) must key
    on the mesh SPANNING processes, never on bare jax.process_count():
    a mesh-less trainer inside a multi-process job runs purely local
    steps, and an injected allgather would deadlock or spuriously raise."""

    def test_mesh_spans_processes_false_for_local_meshes(self):
        assert not parallel.mesh_spans_processes(None)
        assert not parallel.mesh_spans_processes(parallel.get_mesh())
        assert not parallel.mesh_spans_processes(parallel.get_mesh(2))

    def test_no_guard_or_global_assembly_without_spanning_mesh(
            self, monkeypatch):
        from jax.experimental import multihost_utils

        def boom(*a, **k):
            raise AssertionError(
                "collective feed machinery invoked for a local trainer")
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(multihost_utils, "process_allgather", boom)
        monkeypatch.setattr(parallel, "global_batch_from_local", boom)
        batches = toy_batches(n_batches=2)
        # mesh-less trainer: steps are local — no guard, no allgather
        hist = make_trainer().fit(lambda: batches, epochs=1)
        assert np.isfinite(hist[0]["loss"])
        # local (single-process) mesh in a "multi-process" job: same
        trainer = make_trainer(mesh=parallel.get_mesh())
        hist = trainer.fit(lambda: batches, lambda: toy_batches(1, seed=9),
                           epochs=1)
        assert np.isfinite(hist[0]["val_loss"])


class TestFeatureGroupedDispatch:
    """steps_per_dispatch on the feature-fed Trainer.fit path (VERDICT r3
    next-step #2): K batches -> one stacked transfer + one scanned
    program, trajectory identical to single dispatch."""

    def test_matches_single_dispatch_trajectory(self):
        batches = toy_batches(n_batches=5)  # spd=2 leaves a tail of 1

        def run(spd):
            model = models.create("dnn", (T, F), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(5e-3), nll_loss)
            hist = trainer.fit(lambda: batches, epochs=2,
                               steps_per_dispatch=spd)
            return hist, jax.device_get(trainer.state.params)

        hist1, params1 = run(1)
        hist2, params2 = run(2)
        np.testing.assert_allclose([h["loss"] for h in hist1],
                                   [h["loss"] for h in hist2], rtol=1e-6)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               params1, params2)

    def test_groups_respect_shape_changes_and_masks(self):
        """Shape changes flush the group (a stacked program needs one
        shape); mask keys ride the stacked transfer."""
        b1 = toy_batches(n_batches=2)
        b2 = [{k: v[:8] for k, v in b.items()} for b in toy_batches(
            n_batches=2, seed=3)]
        for b in b1 + b2:
            b["input_mask"] = np.ones(b["input"].shape[:2], bool)
            b["input_mask"][:, -4:] = False
        batches = b1 + b2
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss)
        hist = trainer.fit(lambda: batches, epochs=1, steps_per_dispatch=4)
        assert int(jax.device_get(trainer.state.step)) == 4
        assert np.isfinite(hist[0]["loss"])

    def test_steps_per_epoch_lands_on_group_edge(self):
        batches = toy_batches(n_batches=6)
        trainer = Trainer(models.create("dnn", (T, F), N_CLASSES),
                          optax.adam(5e-3), nll_loss)
        trainer.fit(lambda: batches, epochs=1, steps_per_dispatch=4,
                    steps_per_epoch=3)
        assert int(jax.device_get(trainer.state.step)) == 3

    def test_composes_with_cache_staged(self):
        batches = toy_batches(n_batches=5)

        def run(cache):
            model = models.create("dnn", (T, F), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(5e-3), nll_loss,
                              cache_staged=cache)
            hist = trainer.fit(lambda: batches, epochs=3,
                               steps_per_dispatch=2, cache_shuffle=False)
            return hist, jax.device_get(trainer.state.params)

        hist_c, params_c = run(True)
        hist_u, params_u = run(False)
        np.testing.assert_allclose([h["loss"] for h in hist_c],
                                   [h["loss"] for h in hist_u], rtol=1e-6)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               params_c, params_u)

    def test_grouped_batches_limit_alignment(self):
        from lidbox_tpu.train.loop import Trainer as T_
        batches = [{"input": np.zeros((4, 3), np.float32),
                    "target": np.zeros(4, np.int32)} for _ in range(7)]
        groups = list(T_._grouped_batches(iter(batches), 3, limit=5))
        assert [len(g) for g in groups] == [3, 2]
        groups = list(T_._grouped_batches(iter(batches), 3))
        assert [len(g) for g in groups] == [3, 3, 1]

    def test_validation_featurized_once(self, monkeypatch):
        # the val-featurize key is fixed, so recomputing per epoch is
        # byte-identical work: _featurize_val must run exactly once per
        # fit, with or without an explicit clean val_feature_fn
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(3)
        sr, t_len, b = 16000, 4000, 8
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(2)]
        val = batches[:1]
        frames = 1 + (t_len - 400) // 160
        fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig(specaug_time_masks=1))
        calls = {"n": 0}
        real = on_device._featurize_val

        def counting(*args, **kwargs):
            calls["n"] += 1
            return real(*args, **kwargs)
        monkeypatch.setattr(on_device, "_featurize_val", counting)
        for val_fn in (None,):
            calls["n"] = 0
            trainer = Trainer(models.create("dnn", (frames, 16), N_CLASSES),
                              optax.adam(1e-3), nll_loss)
            hist = on_device.fit_signals(trainer, fn, lambda: batches,
                                         epochs=3, val_batches=val,
                                         val_feature_fn=val_fn,
                                         verbose=False)
            assert calls["n"] == 1, calls["n"]
            assert all("val_loss" in h for h in hist)


class TestSignalStaging:
    def test_raw_pcm_to_float_staging_rescales(self):
        # raw int16 PCM staged as a float dtype must land in [-1, 1]
        from lidbox_tpu.data import on_device
        pcm = np.array([[0, 16384, -32768, 32767]], np.int16)
        staged = on_device.stage_signals(pcm, "bfloat16")
        import ml_dtypes
        assert staged.dtype == ml_dtypes.bfloat16
        np.testing.assert_allclose(staged.astype(np.float32),
                                   [[0.0, 0.5, -1.0, 0.999969482]],
                                   atol=4e-3)

    def test_pack_targets_layout_property(self):
        """pack_targets_int16 round-trips exactly for any admissible
        shape, with and without a leading group axis, and declines the
        layouts it documents as out of scope."""
        from hypothesis import given, settings, strategies as st
        from lidbox_tpu.data import on_device

        @settings(max_examples=40, deadline=None)
        @given(st.integers(1, 12), st.integers(1, 4), st.booleans(),
               st.integers(0, 2 ** 31 - 1))
        def check(b, k, grouped, seed):
            rng = np.random.default_rng(seed)
            t = b + int(rng.integers(0, 20))  # b <= t by construction
            shape = (k, b, t) if grouped else (b, t)
            sigs = rng.integers(-32768, 32768, shape).astype(np.int16)
            tgts = rng.integers(0, 32768, shape[:-1]).astype(np.int32)
            packed = on_device.pack_targets_int16(sigs, tgts)
            assert packed is not None
            assert packed.shape == shape[:-2] + (b + 1, t)
            np.testing.assert_array_equal(packed[..., :b, :], sigs)
            # the fused step's unpack: last row's first B slots
            np.testing.assert_array_equal(
                packed[..., b, :b].astype(np.int32), tgts)
            # declined layouts
            assert on_device.pack_targets_int16(
                sigs.astype(np.float32), tgts) is None
            neg = tgts.copy().reshape(-1)
            neg[0] = -1
            assert on_device.pack_targets_int16(
                sigs, neg.reshape(tgts.shape)) is None
        check()

    def test_int16_round_trip_matches_f32_within_quantization(self):
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(0)
        sig = rng.uniform(-0.9, 0.9, (4, 800)).astype(np.float32)
        staged = on_device.stage_signals(sig, "int16")
        assert staged.dtype == np.int16
        back = np.asarray(on_device.signals_to_float(jax.numpy.asarray(staged)))
        np.testing.assert_allclose(back, sig, atol=1.0 / 32768.0)

    def test_int16_passthrough_no_copy_conversion(self):
        from lidbox_tpu.data import on_device
        pcm = np.array([[0, 16384, -32768]], np.int16)
        staged = on_device.stage_signals(pcm, "int16")
        assert staged is pcm  # loader-native int16 ships as-is
        f = np.asarray(on_device.signals_to_float(jax.numpy.asarray(pcm)))
        np.testing.assert_allclose(f, [[0.0, 0.5, -1.0]])

    def test_packed_staging_matches_separate_and_step_is_cached(self):
        import jax.numpy as jnp
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(3)
        sr, t_len, b = 16000, 4000, 8
        sigs = on_device.stage_signals(
            rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32), "int16")
        targets = rng.integers(0, N_CLASSES, b).astype(np.int32)
        frames = 1 + (t_len - 400) // 160
        model = models.create("dnn", (frames, 16), N_CLASSES)
        trainer = Trainer(model, optax.adam(1e-3), nll_loss)
        trainer.create_state()
        feature_fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig())
        step = on_device.make_fused_train_step(trainer, feature_fn)
        # cached per (trainer, feature_fn): no re-trace on repeated calls
        assert on_device.make_fused_train_step(trainer, feature_fn) is step

        _, loss_sep = step(trainer.state, jnp.asarray(sigs),
                           jnp.asarray(targets), trainer.rng)
        packed = np.empty((b + 1, t_len), np.int16)
        packed[:b] = sigs
        packed[b, :b] = targets
        packed[b, b:] = 0
        _, loss_packed = step(trainer.state, jnp.asarray(packed), None,
                              trainer.rng)
        np.testing.assert_allclose(np.asarray(loss_sep),
                                   np.asarray(loss_packed), rtol=1e-6)

    def test_grouped_dispatch_matches_single_step_trajectory(self):
        """steps_per_dispatch=K (one lax.scan program per K batches) must
        reproduce the single-dispatch trajectory bit-for-bit — the step
        RNG folds in state.step, which advances inside the scan."""
        import jax.numpy as jnp
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(5)
        sr, t_len, b = 16000, 4000, 8
        frames = 1 + (t_len - 400) // 160
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(5)]  # 5 batches: spd=2 leaves a tail of 1
        feature_conf = {"type": "logmelspectrogram",
                        "melspectrogram": {"num_mel_bins": 16}}

        def run(spd, stage_dtype):
            model = models.create("dnn", (frames, 16), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(1e-3), nll_loss,
                              stage_dtype=stage_dtype)
            fn = on_device.make_augmented_feature_fn(
                sr, feature_conf, on_device.AugmentConfig())
            hist = on_device.fit_signals(trainer, fn, lambda: batches,
                                         epochs=2, verbose=False,
                                         steps_per_dispatch=spd)
            return hist, jax.device_get(trainer.state.params)

        hist1, params1 = run(1, "int16")
        hist2, params2 = run(2, "int16")
        np.testing.assert_allclose(hist1, hist2, rtol=1e-6)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               params1, params2)
        # and f32 grouped (non-packed layout) also runs
        hist3, _ = run(3, None)
        assert np.all(np.isfinite(hist3))

    def test_grouped_dispatch_composes_with_cache_staged(self):
        """cache_staged replays the GROUPED device-resident entries on
        later epochs; with cache_shuffle off the trajectory must equal the
        uncached grouped run batch-for-batch."""
        import jax.numpy as jnp
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(6)
        sr, t_len, b = 16000, 4000, 8
        frames = 1 + (t_len - 400) // 160
        batches = [(rng.uniform(-0.5, 0.5, (b, t_len)).astype(np.float32),
                    rng.integers(0, N_CLASSES, b).astype(np.int32))
                   for _ in range(4)]
        feature_conf = {"type": "logmelspectrogram",
                        "melspectrogram": {"num_mel_bins": 16}}

        def run(cache_staged):
            model = models.create("dnn", (frames, 16), N_CLASSES)
            model.init(jax.random.PRNGKey(0))
            trainer = Trainer(model, optax.adam(1e-3), nll_loss,
                              stage_dtype="int16")
            fn = on_device.make_augmented_feature_fn(
                sr, feature_conf, on_device.AugmentConfig())
            hist = on_device.fit_signals(
                trainer, fn, lambda: batches, epochs=3, verbose=False,
                steps_per_dispatch=2, cache_staged=cache_staged,
                cache_shuffle=False)
            return hist, jax.device_get(trainer.state.params)

        hist_c, params_c = run(True)
        hist_u, params_u = run(False)
        np.testing.assert_allclose(hist_c, hist_u, rtol=1e-6)
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               params_c, params_u)

    def test_fused_fit_with_int16_staging_trains(self):
        import jax.numpy as jnp
        from lidbox_tpu.data import on_device
        rng = np.random.default_rng(1)
        sr = 16000
        sigs = rng.uniform(-0.5, 0.5, (16, 8000)).astype(np.float32)
        targets = rng.integers(0, N_CLASSES, 16).astype(np.int32)
        # make classes separable by amplitude
        for i, k in enumerate(targets):
            sigs[i] *= (0.2 + 0.4 * k)
        frames = 1 + (8000 - 400) // 160
        model = models.create("xvector", (frames, 16), N_CLASSES)
        trainer = Trainer(model, optax.adam(1e-3),
                          nll_loss, stage_dtype="int16")
        feature_fn = on_device.make_augmented_feature_fn(
            sr, {"type": "logmelspectrogram",
                 "melspectrogram": {"num_mel_bins": 16}},
            on_device.AugmentConfig())
        history = on_device.fit_signals(
            trainer, feature_fn, lambda: [(sigs, targets)], epochs=2)
        assert np.isfinite(history).all()


class TestBatching:
    def test_batches_from_dataset_with_buckets_and_mask(self):
        from lidbox_tpu.data import Dataset
        rng = np.random.default_rng(0)
        elems = [{"input": rng.normal(0, 1, (n, F)).astype(np.float32),
                  "target": np.int32(n % N_CLASSES), "id": str(n)}
                 for n in (10, 20, 30, 17)]
        make = batches_from_dataset(Dataset.from_elements(elems), batch_size=2,
                                    pad_buckets=(16, 32), frame_mask=True)
        batches = list(make())
        assert len(batches) == 2
        assert batches[0]["input"].shape == (2, 32, F)
        assert batches[0]["input_mask"].shape == (2, 32)
        assert batches[0]["input_mask"][0].sum() == 10


class TestOptimizerConfig:
    def test_adam_with_exponential_decay(self):
        opt, lr = optimizer_from_config({
            "cls": "Adam",
            "kwargs": {"lr_scheduler": {
                "cls": "ExponentialDecay",
                "kwargs": {"initial_learning_rate": 0.01, "decay_steps": 100,
                           "decay_rate": 0.5}}}})
        assert abs(lr(0) - 0.01) < 1e-9
        assert abs(lr(100) - 0.005) < 1e-9
        params = {"w": np.ones(3, np.float32)}
        state = opt.init(params)
        grads = {"w": np.ones(3, np.float32)}
        updates, _ = opt.update(grads, state, params)
        assert np.all(np.isfinite(updates["w"]))

    def test_unknown_names_raise(self):
        with pytest.raises(KeyError):
            optimizer_from_config({"cls": "NoSuchOpt"})


class TestConfigLossAndDecay:
    def _crnn_config(self, tmp_path, weight_decay):
        return {"experiment": {
            "cache_directory": str(tmp_path), "name": f"wd{weight_decay}",
            "input_shape": [32, 32], "output_shape": [N_CLASSES],
            "model": {"key": "crnn",
                      "kwargs": {"weight_decay": weight_decay}},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
            "loss": {"cls": "SparseCategoricalCrossentropy"}}}

    def test_loss_selection_follows_head_activation(self):
        from lidbox_tpu.losses import (cross_entropy_with_logits, nll_loss,
                                       nll_loss_from_probs)
        from lidbox_tpu.models.model_utils import init_loss_from_config
        conf = {"cls": "SparseCategoricalCrossentropy"}
        assert init_loss_from_config(conf, "log_softmax") is nll_loss
        assert init_loss_from_config(conf, "softmax") is nll_loss_from_probs
        assert init_loss_from_config(conf, None) is cross_entropy_with_logits

    def test_crnn_wrapper_trains_on_log_probs_not_neg_probs(self, tmp_path):
        """A reference-style CRNN config (softmax head + sparse CCE) must
        train on -log p, not -p (ADVICE r1)."""
        from lidbox_tpu.losses import nll_loss_from_probs
        from lidbox_tpu.models.model_utils import ModelWrapper
        wrapper = ModelWrapper.from_config(self._crnn_config(tmp_path, 0.0))
        assert wrapper.trainer.loss_fn is nll_loss_from_probs
        probs = np.asarray([[0.7, 0.2, 0.1]], np.float32)
        got = np.asarray(wrapper.trainer.loss_fn(np.asarray([0]), probs))
        np.testing.assert_allclose(got, -np.log(0.7), rtol=1e-5)

    def test_crnn_weight_decay_changes_update(self, tmp_path):
        """Reference crnn.py:30-38 applies kernel_regularizer=l2(0.001);
        the translated decay transform must actually alter conv-kernel
        updates (VERDICT r1 missing #5)."""
        from lidbox_tpu.models.model_utils import ModelWrapper

        def one_step(weight_decay):
            wrapper = ModelWrapper.from_config(
                self._crnn_config(tmp_path, weight_decay))
            rng = np.random.default_rng(0)
            batch = {"input": rng.normal(0, 1, (4, 32, 32)).astype(np.float32),
                     "target": rng.integers(0, N_CLASSES, 4).astype(np.int32)}
            wrapper.fit(lambda: [batch], None, epochs=1)
            return jax.device_get(wrapper.trainer.state.params)

        p_nodecay, p_decay = one_step(0.0), one_step(0.5)
        conv = lambda p: p["conv_1"]["kernel"]
        assert not np.allclose(conv(p_nodecay), conv(p_decay)), \
            "weight decay had no effect on conv kernels"
        # bias params are not in the decay mask: same update either way
        np.testing.assert_allclose(p_nodecay["conv_1"]["bias"],
                                   p_decay["conv_1"]["bias"], atol=1e-6)


class TestFeedConfig:
    def test_feed_section_reaches_trainer_and_fused_fit(self, tmp_path):
        """experiment.feed tunes the host->device pipeline declaratively:
        prefetch depth, staging compression, grouped dispatch."""
        import jax.numpy as jnp
        from lidbox_tpu.models.model_utils import ModelWrapper
        config = {"experiment": {
            "cache_directory": str(tmp_path), "name": "feed",
            "input_shape": [T, F], "output_shape": [N_CLASSES],
            "model": {"key": "dnn"},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 1e-3}},
            "loss": {"cls": "SparseCategoricalCrossentropy"},
            "feed": {"prefetch": 7, "stage_dtype": "bfloat16",
                     "steps_per_dispatch": 2}}}
        wrapper = ModelWrapper.from_config(config)
        assert wrapper.trainer.prefetch == 7
        assert wrapper.trainer.stage_dtype == "bfloat16"
        assert wrapper.steps_per_dispatch == 2
        batches = toy_batches(n_batches=3)
        (_, staged), *_ = list(wrapper.trainer._staged(batches))
        assert staged["input"].dtype == jnp.bfloat16
        history = wrapper.fit(lambda: batches, lambda: batches[:1], epochs=1)
        assert np.isfinite(history[-1]["loss"])


class TestAngularProximityEvaluation:
    """AP-loss language-vector models evaluate through the SAME public
    surface as log-prob heads: ModelWrapper wires loss.predict (-theta,
    reference: lidbox/losses.py:51-52) as the score_fn, so C_avg, reports
    and serving all compose with [B, D] outputs (D != N)."""

    def _ap_config(self, tmp_path):
        return {"experiment": {
            "cache_directory": str(tmp_path), "name": "ap",
            "input_shape": [T, F], "output_shape": [N_CLASSES],
            "model": {"key": "ap_lstm", "kwargs": {"num_lstm_units": 4}},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 5e-3}},
            "loss": {"cls": "SparseAngularProximity",
                     "kwargs": {"N": N_CLASSES, "D": 16}},
            "metrics": [{"cls": "SparseAverageDetectionCost", "name": "C_avg",
                         "N": N_CLASSES,
                         "threshold_linspace":
                             {"start": -3.0, "stop": 0.0, "num": 20}}]}}

    def test_train_evaluate_report_end_to_end(self, tmp_path):
        import pandas as pd
        from lidbox_tpu import util
        from lidbox_tpu.losses import AngularProximity
        from lidbox_tpu.models.model_utils import ModelWrapper

        wrapper = ModelWrapper.from_config(self._ap_config(tmp_path))
        assert isinstance(wrapper.trainer.loss_fn, AngularProximity)
        assert wrapper.score_fn is not None

        batches = toy_batches(n_batches=4)
        history = wrapper.fit(lambda: batches, lambda: batches[:2], epochs=2)
        logs = history[-1]
        # D=16 model outputs flowed through score_fn into the N=3 metric
        assert np.isfinite(logs["val_loss"])
        assert 0.0 <= logs["val_C_avg"] <= 1.0

        # full report through the public evaluation surface
        elements = []
        records = {}
        for bi, b in enumerate(batches):
            for i in range(b["target"].shape[0]):
                uid = f"utt{bi}_{i}"
                elements.append({"id": uid, "input": b["input"][i],
                                 "target": int(b["target"][i])})
                records[uid] = int(b["target"][i])
        test_meta = pd.DataFrame(
            {"target": pd.Series(records)}).rename_axis("id")
        label2target = {f"lang{k}": k for k in range(N_CLASSES)}
        report = util.evaluate_testset_with_model(
            wrapper.model, elements, test_meta, label2target,
            score_fn=wrapper.score_fn)
        assert 0.0 <= report["avg_detection_cost"] <= 1.0
        assert np.isfinite(report["avg_equal_error_rate"])
        assert report["confusion_matrix"].sum() == len(elements)

    def test_classifier_serves_language_vector_model(self, tmp_path):
        from lidbox_tpu import serve
        from lidbox_tpu.models.model_utils import ModelWrapper
        from lidbox_tpu.features import io as audio_io

        wrapper = ModelWrapper.from_config(self._ap_config(tmp_path))
        labels = [f"lang{k}" for k in range(N_CLASSES)]
        rng = np.random.default_rng(0)
        wavs = []
        for i in range(3):
            p = tmp_path / f"u{i}.wav"
            audio_io.write_mono_wav(
                str(p), rng.normal(0, 0.1, 4000).astype(np.float32), 16000)
            wavs.append(str(p))
        clf = serve.Classifier(
            wrapper.model, labels,
            feature_config={"type": "logmelspectrogram",
                            "melspectrogram": {"num_mel_bins": F}},
            score_fn=wrapper.score_fn)
        out = clf.classify(wavs)
        assert list(out["label"].isin(labels)) == [True] * 3
        # scores are -theta over N classes, not D-dim raw vectors
        assert {f"score_{l}" for l in labels} <= set(out.columns)
        assert (out[[f"score_{l}" for l in labels]].to_numpy() <= 0).all()


class TestOrbaxBackend:
    def test_save_restore_best_selection(self, tmp_path):
        from lidbox_tpu.train.checkpoint import OrbaxCheckpointer
        trainer = make_trainer()
        trainer.create_state()
        ckpt = OrbaxCheckpointer(use_async=False)
        d = str(tmp_path / "orbax")
        import jax as _jax
        state_dict = _jax.device_get({
            "params": trainer.state.params,
            "step": trainer.state.step})
        ckpt.save(d, state_dict, epoch=1, val_loss=0.9)
        ckpt.save(d, state_dict, epoch=2, val_loss=0.5)
        ckpt.save(d, state_dict, epoch=3, val_loss=0.7)
        ckpt.wait()
        best = OrbaxCheckpointer.best_checkpoint_path(d, key="val_loss", mode="min")
        assert "epoch000002" in best
        latest = OrbaxCheckpointer.best_checkpoint_path(d)
        assert "epoch000003" in latest
        restored = ckpt.restore(best, target=state_dict)
        _jax.tree_util.tree_map(np.testing.assert_array_equal,
                                restored["params"], state_dict["params"])

    def test_model_checkpoint_orbax_backend_resumes(self, tmp_path):
        """Config-path orbax: ModelCheckpoint(backend='orbax') saves async
        during fit, best-checkpoint resolution sees the orbax dirs, and
        Trainer.restore resumes epoch numbering + weights from them."""
        d = str(tmp_path / "ckpts")
        cb = ModelCheckpoint(d, backend="orbax")
        trainer = make_trainer(callbacks=[cb])
        batches = toy_batches()
        trainer.fit(lambda: batches, lambda: batches[:1], epochs=2)
        # on_train_end drained the async writes; both epochs on disk as dirs
        import os
        names = sorted(os.listdir(d))
        assert len(names) == 2 and all(os.path.isdir(os.path.join(d, n))
                                       for n in names)
        latest = get_best_checkpoint_path(d)
        assert "epoch000002" in latest

        resumed = make_trainer()
        resumed.restore(latest)
        assert resumed.initial_epoch == 2
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(resumed.state.params),
            jax.device_get(trainer.state.params))
        # epochs continue from the checkpoint: absolute target 4 runs 2 more
        hist = resumed.fit(lambda: batches, epochs=4)
        assert len(hist) == 2

    def test_selection_skips_uncommitted_orbax_tmp_dirs(self, tmp_path):
        """A run killed mid-async-save leaves an .orbax-checkpoint-tmp-*
        directory; best/latest selection must never pick it."""
        import os
        d = tmp_path / "ckpts"
        os.makedirs(d / "epoch000001__val_loss0.500000000000")
        os.makedirs(d / ("epoch000009__val_loss0.100000000000"
                         ".orbax-checkpoint-tmp-12345"))
        latest = get_best_checkpoint_path(str(d))
        assert latest.endswith("epoch000001__val_loss0.500000000000")
        best = get_best_checkpoint_path(str(d), key="val_loss", mode="min")
        assert best.endswith("epoch000001__val_loss0.500000000000")
        from lidbox_tpu.train.checkpoint import OrbaxCheckpointer
        assert OrbaxCheckpointer.best_checkpoint_path(
            str(d)).endswith("epoch000001__val_loss0.500000000000")

    def test_raw_checkpoint_loads_params_from_orbax_dir(self, tmp_path):
        from lidbox_tpu.train import checkpoint as ckpt_lib
        d = str(tmp_path / "ckpts")
        cb = ModelCheckpoint(d, backend="orbax")
        trainer = make_trainer(callbacks=[cb])
        trainer.fit(lambda: toy_batches(n_batches=2), epochs=1)
        raw = ckpt_lib.load_raw_checkpoint(get_best_checkpoint_path(d))
        assert "params" in raw
        jax.tree_util.tree_map(
            np.testing.assert_array_equal, raw["params"],
            jax.device_get(trainer.state.params))


class TestMixedPrecision:
    def test_bf16_compute_trains_and_matches_f32_trajectory(self):
        import jax.numpy as jnp
        model = models.create("dnn", (T, F), N_CLASSES)
        t_bf16 = Trainer(model, optax.adam(5e-3), nll_loss,
                         compute_dtype=jnp.bfloat16)
        batches = toy_batches()
        h = t_bf16.fit(lambda: batches, epochs=4)
        assert h[-1]["loss"] < h[0]["loss"] * 0.8
        # master params stayed float32
        leaves = jax.tree_util.tree_leaves(t_bf16.state.params)
        assert all(l.dtype == np.float32 for l in leaves)
        # predictions are float32 log-probs
        out = t_bf16.predict(lambda: toy_batches(1))
        assert out.dtype == np.float32
        np.testing.assert_allclose(np.exp(out).sum(axis=1), 1.0, rtol=1e-2)

    def test_bf16_with_batchnorm_model(self):
        import jax.numpy as jnp
        model = models.create("multilevel_attention", (T, F), N_CLASSES)
        trainer = Trainer(model, optax.adam(1e-3), nll_loss,
                          compute_dtype=jnp.bfloat16)
        h = trainer.fit(lambda: toy_batches(3), epochs=2)
        assert np.isfinite(h[-1]["loss"])
        bs_leaves = jax.tree_util.tree_leaves(trainer.state.batch_stats)
        assert all(l.dtype == np.float32 for l in bs_leaves)

    def test_config_edits_after_first_trace_retrace(self):
        """Mutating trace-time Trainer config (loss_fn, compute_dtype,
        remat) after steps have compiled must take effect on the next
        fit/evaluate/predict — the jitted steps are rebuilt when the
        config fingerprint changes (formerly a documented limitation:
        read at first trace only)."""
        import jax.numpy as jnp
        trainer = make_trainer()
        batches = toy_batches(2)
        first = trainer.evaluate(lambda: batches)
        assert first["val_loss"] > 0
        trainer.loss_fn = lambda targets, outputs: jnp.zeros(
            targets.shape[0], jnp.float32)
        second = trainer.evaluate(lambda: batches)
        assert second["val_loss"] == 0.0
        # and remat toggling retraces the TRAIN step without error
        trainer.loss_fn = nll_loss
        trainer.remat = True
        h = trainer.fit(lambda: batches, epochs=1)
        assert np.isfinite(h[-1]["loss"])

    def test_clipnorm_clipvalue(self):
        opt, _ = optimizer_from_config({
            "cls": "Adam", "kwargs": {"learning_rate": 1.0, "clipnorm": 0.1}})
        params = {"w": np.zeros(4, np.float32)}
        state = opt.init(params)
        huge = {"w": np.full(4, 1e6, np.float32)}
        updates, _ = opt.update(huge, state, params)
        # clipped global norm bounds the adam pre-normalized input
        assert np.all(np.isfinite(updates["w"]))


class TestLifecycleAndRetrace:
    def test_optimizer_rebind_retraces(self):
        """Rebinding trainer.optimizer after compiled steps must take
        effect (the fingerprint once omitted it: a same-pytree adam kept
        applying the OLD learning rate while the log showed the new)."""
        trainer = make_trainer()
        batches = toy_batches(2)
        trainer.fit(lambda: batches, epochs=1)
        before = jax.device_get(trainer.state.params)
        trainer.optimizer = optax.sgd(0.0)  # zero-lr: params must freeze
        trainer.fit(lambda: batches, epochs=1)
        after = jax.device_get(trainer.state.params)
        jax.tree_util.tree_map(np.testing.assert_array_equal, before, after)

    def test_early_stopping_resets_between_fits(self):
        """A reused trainer's second fit gets the full patience window
        (Keras resets callback state on train begin; inheriting wait/best
        used to stop the 'fresh' run after one epoch)."""
        from lidbox_tpu.train.loop import EarlyStopping
        es = EarlyStopping(monitor="loss", patience=2, min_delta=10.0)
        trainer = make_trainer(callbacks=[es])
        batches = toy_batches(2)
        trainer.fit(lambda: batches, epochs=10)
        assert es.wait >= 2  # first run exhausted its patience
        h = trainer.fit(lambda: batches, epochs=4)
        # fresh window: epochs 1..3 run before patience (2) re-triggers
        assert len(h) >= 3, len(h)

    def test_predict_empty_iterable_raises_clearly(self):
        trainer = make_trainer()
        with pytest.raises(ValueError, match="no batches"):
            trainer.predict(lambda: [])

    def test_cache_staged_empty_first_epoch_raises(self):
        trainer = make_trainer()
        with pytest.raises(ValueError, match="no\n?.*training batches|no "
                           "training batches"):
            trainer.fit(lambda: [], epochs=3, cache_staged=True)

    def test_best_checkpoint_ignores_nan_metrics(self, tmp_path):
        """Diverged epochs write val_lossnan filenames; best-by-metric
        selection must never return one (min/max against NaN is scan-order
        dependent)."""
        from lidbox_tpu.train import get_best_checkpoint_path
        from lidbox_tpu.train.checkpoint import save_checkpoint
        state = {"w": np.zeros(2, np.float32)}
        save_checkpoint(str(tmp_path), state, epoch=1, val_loss=0.5)
        save_checkpoint(str(tmp_path), state, epoch=2, val_loss=float("nan"))
        save_checkpoint(str(tmp_path), state, epoch=3, val_loss=0.4)
        best = get_best_checkpoint_path(str(tmp_path), "val_loss", "min")
        assert "0.4" in best.replace("0.400000000000", "0.4"), best
        # all-NaN directory: fall back to the greatest epoch, not NaN-pick
        nan_dir = tmp_path / "allnan"
        save_checkpoint(str(nan_dir), state, epoch=1, val_loss=float("nan"))
        save_checkpoint(str(nan_dir), state, epoch=2, val_loss=float("nan"))
        best = get_best_checkpoint_path(str(nan_dir), "val_loss", "min")
        assert "epoch000002" in best


class TestModelWrapperConfigEdges:
    def _config(self, tmp_path, **experiment_extra):
        return {
            "metadata": {"csv": "unused.csv"},
            "features": {"type": "logmelspectrogram",
                         "melspectrogram": {"num_mel_bins": 8},
                         "on_device_augment": {}},
            "experiment": {
                "cache_directory": str(tmp_path), "name": "t",
                "input_shape": [T, F], "output_shape": [N_CLASSES],
                "model": {"key": "dnn"},
                "optimizer": {"cls": "Adam",
                              "kwargs": {"learning_rate": 1e-3}},
                "loss": {"cls": "SparseCategoricalCrossentropy"},
                **experiment_extra}}

    def test_fit_fused_requires_sample_rate(self, tmp_path):
        from lidbox_tpu.models.model_utils import ModelWrapper
        wrapper = ModelWrapper.from_config(self._config(tmp_path))
        with pytest.raises(ValueError, match="sample_rate"):
            wrapper.fit_fused(lambda: [], epochs=1)

    def test_empty_feed_section_is_tolerated(self, tmp_path):
        """'feed:' with all children commented out parses to None."""
        from lidbox_tpu.models.model_utils import ModelWrapper
        wrapper = ModelWrapper.from_config(
            self._config(tmp_path, feed=None))
        assert wrapper.trainer.prefetch == 4

    def test_duplicate_metric_classes_both_kept(self, tmp_path):
        from lidbox_tpu.models.model_utils import ModelWrapper
        metrics = [{"cls": "SparseAverageDetectionCost", "N": N_CLASSES,
                    "threshold_linspace": {"start": -10.0, "stop": 0.0,
                                           "num": 20}},
                   {"cls": "SparseAverageDetectionCost", "N": N_CLASSES,
                    "threshold_linspace": {"start": -1.0, "stop": 1.0,
                                           "num": 10}}]
        wrapper = ModelWrapper.from_config(
            self._config(tmp_path, metrics=metrics))
        assert len(wrapper.trainer.metrics) == 2  # the reference kept both

    def test_unknown_callback_kwargs_raise(self, tmp_path):
        from lidbox_tpu.models.model_utils import ModelWrapper
        cbs = [{"cls": "EarlyStopping", "kwargs": {"patiense": 3}}]  # typo
        with pytest.raises(TypeError, match="patiense"):
            ModelWrapper.from_config(self._config(tmp_path, callbacks=cbs))

    def test_from_logits_config_selects_logits_loss(self, tmp_path):
        from lidbox_tpu.losses import cross_entropy_with_logits
        from lidbox_tpu.models.model_utils import init_loss_from_config
        loss = init_loss_from_config(
            {"cls": "SparseCategoricalCrossentropy",
             "kwargs": {"from_logits": True}})
        assert loss is cross_entropy_with_logits
        with pytest.raises(TypeError, match="ignore_class"):
            init_loss_from_config(
                {"cls": "SparseCategoricalCrossentropy",
                 "kwargs": {"ignore_class": 0}})

    def test_initial_epoch_proxies_trainer(self, tmp_path):
        from lidbox_tpu.models.model_utils import ModelWrapper
        wrapper = ModelWrapper.from_config(self._config(tmp_path))
        assert wrapper.initial_epoch == 0
        wrapper.trainer.initial_epoch = 7
        assert wrapper.initial_epoch == 7


class TestEarlyStoppingRestoreBest:
    def test_restore_best_weights(self):
        """When stopping, the best-monitored epoch's params come back
        (Keras restore_best_weights; previously silently dropped from
        configs)."""
        from lidbox_tpu.train.loop import EarlyStopping

        class Injector(EarlyStopping):
            """Feed a scripted metric sequence: improve, then worsen."""
            SCRIPT = [1.0, 0.5, 0.9, 0.95, 0.99]

            def on_epoch_end(self, trainer, epoch, logs):
                logs = dict(logs)
                logs[self.monitor] = self.SCRIPT[epoch - 1]
                super().on_epoch_end(trainer, epoch, logs)

        es = Injector(monitor="fake", patience=2, restore_best_weights=True)
        trainer = make_trainer(callbacks=[es])
        trainer.fit(lambda: toy_batches(2), epochs=5)
        assert trainer.stop_training
        # the restored params are the snapshot from the best (2nd) epoch
        restored = jax.device_get(trainer.state.params)
        best_params, _ = es._best_state
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               restored, best_params)
        # and they differ from what epoch 4's update would have left
        assert es.best == 0.5


class TestBatchedDeviceGet:
    def test_matches_plain_device_get(self):
        """_batched_device_get (one readback per dtype — fixed per-fit
        cost on a high-RTT link) must be value- and structure-identical
        to per-leaf jax.device_get on a mixed pytree."""
        import jax.numpy as jnp
        from lidbox_tpu.train.loop import _batched_device_get
        rng = np.random.default_rng(0)
        tree = {
            "params": {"w": jnp.asarray(rng.normal(size=(4, 3)),
                                        jnp.float32),
                       "b": jnp.asarray(rng.normal(size=(3,)),
                                        jnp.float32),
                       "scalar": jnp.float32(2.5),
                       "empty": jnp.zeros((0, 5), jnp.float32)},
            "counts": jnp.asarray([1, 2, 3], jnp.int32),
            "flag": jnp.asarray(True),
            "host_leaf": np.arange(4.0),   # non-jax leaf passes through
            "pyfloat": 1.5,
        }
        got = _batched_device_get(tree)
        want = jax.device_get(tree)
        assert (jax.tree_util.tree_structure(got)
                == jax.tree_util.tree_structure(want))
        for g, w in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(want)):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
            assert np.asarray(g).dtype == np.asarray(w).dtype
            assert np.asarray(g).shape == np.asarray(w).shape

    def test_sync_model_variables_round_trips(self):
        """fit -> sync -> the model object serves the trained params as
        host arrays equal to the train state's."""
        trainer = make_trainer()
        trainer.fit(lambda: toy_batches(2), epochs=1)
        want = jax.device_get(trainer.state.params)
        got = trainer.model.variables["params"]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), got, want)
        assert all(isinstance(leaf, np.ndarray)
                   for leaf in jax.tree_util.tree_leaves(got))
