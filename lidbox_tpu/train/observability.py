"""
Training observability: metric event logs, throughput counters, profiling.

Maps the reference's TensorBoard callback + elements/sec counters + opt-in
profilers (reference: lidbox/models/keras_utils.py:65-71,
lidbox/data/steps.py:460-484, lidbox/__main__.py:13-31) onto:

- MetricsLogger: JSONL event records readable by system.iter_log_events,
  plus optional mirroring into TensorBoard via tf.summary when tensorflow
  is importable,
- ThroughputMeter: utterances/sec and audio-seconds/sec counters,
- profiler(): context manager around jax.profiler traces (the TPU-native
  replacement for the reference's tf profiler flag).
"""
import contextlib
import json
import os
import time

from lidbox_tpu import get_logger

logger = get_logger("train.observability")


class MetricsLogger:
    """Append-only JSONL metric event log, one record per step/epoch."""

    def __init__(self, log_dir, filename="events.jsonl", tensorboard=False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a", encoding="utf-8")
        self._tb_writer = None
        if tensorboard:
            try:
                import tensorflow as tf
                tb_dir = os.path.join(log_dir, "tensorboard")
                self._tb_writer = tf.summary.create_file_writer(tb_dir)
            except ImportError:
                logger.warning("tensorflow unavailable, tensorboard mirroring off")

    def log(self, step, metrics):
        rec = {"wall_time": time.time(), "step": int(step),
               "metrics": {k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb_writer is not None:
            import tensorflow as tf
            with self._tb_writer.as_default():
                for k, v in rec["metrics"].items():
                    tf.summary.scalar(k, v, step=int(step))

    def close(self):
        self._fh.close()
        if self._tb_writer is not None:
            self._tb_writer.close()


class ThroughputMeter:
    """Streaming utterances/sec + audio-seconds/sec counter
    (reference counter: lidbox/data/steps.py:460-484)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.num_examples = 0
        self.audio_seconds = 0.0

    def update(self, batch_size, audio_seconds=0.0):
        self.num_examples += batch_size
        self.audio_seconds += audio_seconds

    @property
    def elapsed(self):
        return time.perf_counter() - self.t0

    def rates(self):
        dt = max(self.elapsed, 1e-9)
        out = {"examples_per_sec": self.num_examples / dt}
        if self.audio_seconds:
            # only meaningful when the feed reported audio durations
            # (feature-batch feeds don't know them; a hard 0 in the epoch
            # logs would read as a measurement, not a missing signal)
            out["audio_rtf"] = self.audio_seconds / dt
        return out


@contextlib.contextmanager
def profiler(log_dir=None, enabled=True):
    """jax.profiler trace scope; view with TensorBoard or Perfetto
    (TPU-native analogue of --run-tf-profiler, reference __main__.py:26-31)."""
    if not enabled or log_dir is None:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Wrote profiler trace to %s", log_dir)


@contextlib.contextmanager
def cprofile(output_path="cProfile.log", enabled=True, sort="tottime"):
    """Host-side cProfile scope (reference: lidbox/__main__.py:13-20,41-44)."""
    if not enabled:
        yield
        return
    import cProfile
    import pstats
    prof = cProfile.Profile()
    prof.enable()
    try:
        yield
    finally:
        prof.disable()
        with open(output_path, "w") as f:
            pstats.Stats(prof, stream=f).sort_stats(sort).print_stats()
        logger.info("Wrote cProfile stats to %s", output_path)
