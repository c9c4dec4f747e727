"""
Device featurizer, parallel helpers, and observability tests.
"""
import json
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lidbox_tpu import parallel, testutil
from lidbox_tpu.data.device_pipeline import DeviceFeatureExtractor, pick_bucket
from lidbox_tpu.train.observability import (MetricsLogger, ThroughputMeter,
                                            cprofile, profiler)

RATE = 16000


class TestDeviceFeatureExtractor:
    def test_bucketing_bounds_compiled_shapes(self):
        ex = DeviceFeatureExtractor({
            "type": "logmelspectrogram",
            "melspectrogram": {"num_mel_bins": 24},
            "signal_buckets": (8000, 16000, 32000),
            "batch_buckets": (2, 4)})
        rng = np.random.default_rng(0)
        sigs = [rng.normal(0, 0.3, n).astype(np.float32)
                for n in (5000, 9000, 20000)]
        feats = ex.extract_ragged(sigs, RATE)
        for sig, f in zip(sigs, feats):
            assert f.shape == (ex.num_frames(len(sig), RATE), 24)
        assert pick_bucket(5000, (8000, 16000)) == 8000
        # beyond the largest bucket: round up to a multiple of it
        assert pick_bucket(99999, (8000, 16000)) == 7 * 16000

    def test_oversized_batch_and_signal_still_work(self):
        ex = DeviceFeatureExtractor({
            "type": "logmelspectrogram",
            "melspectrogram": {"num_mel_bins": 24},
            "signal_buckets": (8000,), "batch_buckets": (2,)})
        rng = np.random.default_rng(0)
        sigs = [rng.normal(0, 0.3, 20000).astype(np.float32) for _ in range(5)]
        feats = ex.extract_ragged(sigs, RATE)
        assert len(feats) == 5
        for f in feats:
            assert f.shape == (ex.num_frames(20000, RATE), 24)

    def test_validate_finite_raises_on_nan(self):
        ex = DeviceFeatureExtractor({"type": "spectrogram",
                                     "validate_finite": True})
        sigs = np.full((2, 8000), np.nan, np.float32)
        with pytest.raises(FloatingPointError):
            ex(sigs, RATE)

    def test_mfcc_type(self):
        ex = DeviceFeatureExtractor({
            "type": "mfcc", "melspectrogram": {"num_mel_bins": 40},
            "mfcc": {"coef_begin": 1, "coef_end": 13}})
        sig = testutil.sinewave(200, RATE, 1.0)
        out = ex(np.stack([sig]), RATE)
        assert out.shape[2] == 12
        assert np.all(np.isfinite(out))


class TestParallelHelpers:
    def test_mesh_and_shardings(self):
        mesh = parallel.get_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.devices.size == 8
        batch = {"x": np.zeros((16, 4), np.float32)}
        sharded = parallel.shard_batch(batch, mesh)
        assert sharded["x"].sharding.is_equivalent_to(
            parallel.batch_sharding(mesh), 2)

    def test_sub_mesh(self):
        mesh = parallel.get_mesh(num_devices=4)
        assert mesh.devices.size == 4

    def test_pad_batch_to(self):
        batch = {"x": np.ones((5, 3), np.float32), "y": np.arange(5)}
        padded, mask = parallel.pad_batch_to(batch, 8)
        assert padded["x"].shape == (8, 3)
        assert padded["y"].shape == (8,)
        np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 0, 0, 0])

    def test_replicated_state_psum(self):
        """Gradient-style psum across the mesh via shard_map."""
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        mesh = parallel.get_mesh()
        x = np.arange(8, dtype=np.float32)

        def f(x):
            return jax.lax.psum(x, "data")
        out = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"),
                                out_specs=P("data")))(x)
        np.testing.assert_allclose(np.asarray(out), np.full(8, x.sum()))

    def test_stack_on_mesh_bounded_arity_fold(self):
        """ADVICE r4: long epochs fold in max_arity-bounded chunks so one
        XLA program never takes hundreds of parameters; the fold must be
        value-identical to the flat stack."""
        mesh = parallel.get_mesh()
        rng = np.random.default_rng(0)
        trees = [{"x": jax.device_put(
                      rng.normal(size=(8, 3)).astype(np.float32),
                      parallel.batch_sharding(mesh)),
                  "y": jax.device_put(np.int32([i] * 8),
                                      parallel.batch_sharding(mesh))}
                 for i in range(9)]
        folded = parallel.stack_on_mesh(trees, mesh, max_arity=4)
        flat = parallel.stack_on_mesh(trees, mesh, max_arity=64)
        assert folded["x"].shape == (9, 8, 3)
        np.testing.assert_array_equal(np.asarray(folded["x"]),
                                      np.asarray(flat["x"]))
        np.testing.assert_array_equal(np.asarray(folded["y"]),
                                      np.asarray(flat["y"]))
        # the stacked sharding survives the fold: leading (scan) axis
        # replicated, batch axis sharded over the data axis
        spec = folded["x"].sharding.spec
        assert tuple(spec)[:2] == (None, "data")

    def test_initialize_distributed_noop(self):
        parallel.initialize_distributed()  # no coordinator -> no-op


class TestObservability:
    def test_metrics_logger_and_reader(self, tmp_path):
        logger = MetricsLogger(str(tmp_path))
        logger.log(1, {"loss": 0.5, "acc": jnp.float32(0.9)})
        logger.log(2, {"loss": 0.4})
        logger.close()
        from lidbox_tpu.system import iter_log_events
        events = list(iter_log_events(os.path.join(tmp_path, "events.jsonl")))
        assert (1, "loss", 0.5) in [(s, t, v) for _, s, t, v in events]
        assert len(events) == 3

    def test_throughput_meter(self):
        meter = ThroughputMeter()
        meter.update(10, audio_seconds=30.0)
        time.sleep(0.01)
        rates = meter.rates()
        assert rates["examples_per_sec"] > 0
        assert rates["audio_rtf"] > 0

    def test_throughput_meter_omits_unknown_audio_rtf(self):
        # feature-batch feeds never report audio seconds; a hard 0 in the
        # epoch logs would read as a measurement, so the key is omitted
        meter = ThroughputMeter()
        meter.update(10)
        assert "audio_rtf" not in meter.rates()

    def test_cprofile_context(self, tmp_path):
        out = str(tmp_path / "prof.log")
        with cprofile(output_path=out, enabled=True):
            sum(range(1000))
        assert os.path.getsize(out) > 0

    def test_profiler_disabled_is_noop(self):
        with profiler(None, enabled=False):
            pass


class TestShardMapTrainStep:
    def test_matches_gspmd_trajectory(self):
        """Explicit pmean collectives (shard_map) and GSPMD auto-sharding
        must produce identical training trajectories."""
        import optax
        import lidbox_tpu.models as models
        from lidbox_tpu.losses import nll_loss
        from lidbox_tpu.parallel.spmd import make_shard_map_train_step
        from lidbox_tpu.train.loop import Trainer

        mesh = parallel.get_mesh()
        model = models.create("dnn", (12, 6), 3)
        rng = np.random.default_rng(0)
        batch = {"input": rng.normal(0, 1, (16, 12, 6)).astype(np.float32),
                 "target": rng.integers(0, 3, 16).astype(np.int32)}

        t_auto = Trainer(model, optax.adam(1e-2), nll_loss, mesh=mesh)
        t_auto.create_state()
        state_auto = t_auto.state
        import copy
        step_manual = make_shard_map_train_step(model, optax.adam(1e-2),
                                                nll_loss, mesh)
        state_manual = jax.device_put(
            jax.device_get(state_auto), parallel.replicated(mesh))

        losses_a, losses_m = [], []
        for i in range(3):
            state_auto, la = t_auto._jit_train_step(
                state_auto, t_auto._put(dict(batch)), t_auto.rng)
            with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _nullctx():
                state_manual, lm = step_manual(
                    state_manual, parallel.shard_batch(dict(batch), mesh),
                    t_auto.rng)
            losses_a.append(float(jax.device_get(la)))
            losses_m.append(float(jax.device_get(lm)))
        np.testing.assert_allclose(losses_m, losses_a, rtol=1e-5)
        pa = jax.device_get(state_auto.params)
        pm = jax.device_get(state_manual.params)
        # GSPMD reduces sums globally; shard_map pmeans per-shard means —
        # different reduction order gives ~1e-6 float noise through adam.
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
            pa, pm)


import contextlib


@contextlib.contextmanager
def _nullctx():
    yield
