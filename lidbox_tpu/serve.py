"""
Batched inference service: wav files in, language scores out.

The user-facing deployment surface the reference assembled by hand in
notebooks (predict_with_model + merge_chunk_predictions + report,
reference: lidbox/util.py:23-57): decode -> chunk -> features -> jitted
model forward per shape bucket -> chunk-score merge, with the model
restored from a training checkpoint or an exported artifact.
"""
import numpy as np

import jax

import lidbox_tpu.util as util
from lidbox_tpu import get_logger
from lidbox_tpu.data.dataset import Dataset
from lidbox_tpu.data.device_pipeline import DeviceFeatureExtractor
from lidbox_tpu.data import steps as steps_mod
from lidbox_tpu.features import io as audio_io

logger = get_logger("serve")


class Classifier:
    """End-to-end LId classifier over audio files."""

    def __init__(self, model, labels, feature_config=None, chunk_length_ms=None,
                 chunk_step_ms=None, batch_size=32, compute_dtype=None,
                 mesh=None, score_fn=None, stage_dtype=None):
        """Args:
            model: an initialized lidbox_tpu Model (e.g. restored via
                export.load_model or ModelWrapper).
            labels: ordered label list (index = model output).
            feature_config: features section of the config (defaults to
                64-bin log-Mel).
            chunk_length_ms/chunk_step_ms: optional utterance chunking;
                chunk scores are averaged back per utterance
                (reference merge semantics, util.py:41-57).
            mesh: optional jax.sharding.Mesh — model forwards then run
                data-parallel over its devices (params replicated, batches
                sharded over the batch axis; batch_size must divide over
                the mesh). Weight updates that REPLACE variable leaves are
                picked up automatically; after mutating array buffers
                in place, call ``classifier._predict_fn.refresh()`` to
                drop the replicated weight cache.
            stage_dtype: e.g. ``"bfloat16"`` — compress the feature feed
                on the host and upcast at the device edge (half the
                host->device bytes when the feed link bounds serving;
                scores differ only by the input rounding). None (default)
                keeps exact f32 feed parity with training numerics.
        """
        if model.variables is None:
            model.init()
        self.model = model
        self.labels = list(labels)
        # keep the FULL feature config: extract_features must see every
        # field (stft_method, precision, validate_finite, buckets, ...),
        # not a rebuilt subset — serving numerics must match training
        self.feature_config = dict(feature_config or {
            "type": "logmelspectrogram",
            "melspectrogram": {"num_mel_bins": 64}})
        self.chunk_length_ms = chunk_length_ms
        self.chunk_step_ms = chunk_step_ms
        self.batch_size = batch_size
        # score_fn: raw outputs -> [B, len(labels)] scores, for headless
        # language-vector models (pass AngularProximity.predict); log-prob
        # heads leave it None
        self._predict_fn = util.make_batch_predict_fn(
            model, batch_size=batch_size, mesh=mesh,
            compute_dtype=compute_dtype, score_fn=score_fn,
            stage_dtype=stage_dtype)

    def _dataset(self, paths, ids=None):
        ids = ids or [str(p) for p in paths]

        def gen():
            for pid, path in zip(ids, paths):
                signal, rate = audio_io.read_audio(path)
                yield {"id": pid, "signal": signal.astype(np.float32),
                       "sample_rate": np.int32(rate)}
        ds = Dataset(gen)
        if self.chunk_length_ms:
            def _pad_short(x):
                # a serving input shorter than one chunk must still be
                # scored: pad it to exactly one chunk (otherwise the
                # chunker emits nothing and the utterance silently
                # vanishes from the output)
                chunk_len = int(int(x["sample_rate"]) * 1e-3
                                * self.chunk_length_ms)
                if x["signal"].size < chunk_len:
                    x = dict(x, signal=np.pad(
                        x["signal"], (0, chunk_len - x["signal"].size)))
                return x
            ds = steps_mod.create_signal_chunks(
                ds.map(_pad_short), self.chunk_length_ms,
                self.chunk_step_ms or self.chunk_length_ms)
        return steps_mod.extract_features(
            ds, {**self.feature_config, "batch_size": self.batch_size})

    def scores(self, paths, ids=None):
        """id-indexed DataFrame of per-utterance score vectors (chunk
        scores averaged)."""
        ds = self._dataset(paths, ids)
        chunk_scores = util.predict_with_model(
            self.model, ds, predict_fn=self._predict_fn,
            batch_size=self.batch_size)
        if self.chunk_length_ms:
            return util.merge_chunk_predictions(chunk_scores)
        return chunk_scores

    def classify(self, paths, ids=None):
        """DataFrame with predicted ``label`` and per-label score columns."""
        df = self.scores(paths, ids)
        if len(df) == 0:
            raise ValueError("no utterances produced scores (empty input?)")
        scores = np.stack(list(df.prediction))
        out = df.drop(columns=["prediction"])
        out["label"] = [self.labels[i] for i in scores.argmax(axis=1)]
        for i, lab in enumerate(self.labels):
            out[f"score_{lab}"] = scores[:, i]
        return out


class StreamingClassifier:
    """Online LId over an incrementally-fed audio stream.

    Fixed-size analysis chunks with a fixed hop keep every forward pass a
    single compiled XLA program regardless of stream length; per-chunk
    scores are merged by running mean — the same utterance-level semantics
    as the offline chunk merge (reference: lidbox/util.py:41-57), so a
    stream scored online equals the same audio scored offline with
    identical chunking.

    Usage::

        sc = StreamingClassifier(model, labels)
        for block in audio_blocks:          # arbitrary block sizes
            scores = sc.feed(block)          # updated after each new chunk
        final = sc.scores()
    """

    def __init__(self, model, labels, feature_config=None, sample_rate=16000,
                 chunk_seconds=2.0, hop_seconds=1.0, score_fn=None):
        if model.variables is None:
            model.init()
        self.score_fn = score_fn  # outputs -> [B, N] (language-vector models)
        self.model = model
        self.labels = list(labels)
        self.sample_rate = int(sample_rate)
        self.chunk_len = int(chunk_seconds * sample_rate)
        self.hop = int(hop_seconds * sample_rate)
        assert 0 < self.hop <= self.chunk_len
        self.extractor = DeviceFeatureExtractor(dict(feature_config or {
            "type": "logmelspectrogram",
            "melspectrogram": {"num_mel_bins": 64}}))
        post = (lambda out: out) if score_fn is None else score_fn
        self._apply = jax.jit(
            lambda v, x: post(model.apply(v, x, train=False)))
        # One fused waveform->scores program per chunk: the chunk shape is
        # fixed, so features + forward compile together and each chunk
        # costs ONE dispatch round instead of two (halves per-chunk
        # latency on high-RTT links; same numerics — the inner jitted
        # extractor inlines during tracing). validate_finite needs the
        # intermediate features on the host, so it keeps the 2-step path.
        if self.extractor.validate_finite:
            self._fused_chunk = None
        else:
            extract = self.extractor._get_fn(self.sample_rate)
            self._fused_chunk = jax.jit(
                lambda v, sig: post(model.apply(v, extract(sig),
                                                train=False)))
        self.reset()

    def reset(self):
        self._buffer = np.zeros(0, np.float32)
        self._score_sum = None
        self._num_chunks = 0

    def feed(self, samples):
        """Append audio samples (any length); runs the model on every
        completed chunk. Returns the current running score vector, or None
        if no chunk has completed yet."""
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(samples, np.float32).ravel()])
        chunks = []
        while self._buffer.size >= self.chunk_len:
            chunks.append(self._buffer[:self.chunk_len])
            self._buffer = self._buffer[self.hop:]
        # one chunk per forward: the batch shape stays [1, chunk_len]
        # whatever the caller's block sizes, so the XLA program compiles
        # exactly once per stream (variable-count batching retraced on
        # every new chunk count — seconds per compile on a tunneled chip)
        for chunk in chunks:
            if self._fused_chunk is not None:
                out = np.asarray(jax.device_get(self._fused_chunk(
                    self.model.variables, chunk[None, :])))
            else:
                feats = self.extractor(chunk[None, :], self.sample_rate)
                out = np.asarray(jax.device_get(
                    self._apply(self.model.variables, feats)))
            s = out[0]
            self._score_sum = (s if self._score_sum is None
                               else self._score_sum + s)
            self._num_chunks += 1
        return self.scores()

    def scores(self):
        """Running mean of per-chunk score vectors (None before the first
        completed chunk)."""
        if self._num_chunks == 0:
            return None
        return self._score_sum / self._num_chunks

    def label(self):
        s = self.scores()
        return None if s is None else self.labels[int(np.argmax(s))]
