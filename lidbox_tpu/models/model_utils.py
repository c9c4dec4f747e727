"""
Config-driven model wrapper: the analogue of the reference's KerasWrapper
(reference: lidbox/models/keras_utils.py:96-214), binding the Flax model
zoo to the Trainer, optax optimizers, metric/callback factories, and the
best-by-metric checkpoint layout.

Cache layout parity: ``<cache_directory>/<model key>/<experiment name>``
(reference: keras_utils.py:19-24), checkpoints under ``checkpoints/`` with
metric-bearing filenames.

Note: the reference called ``model_module.loader(...)`` although every
model module defines ``create`` (reference keras_utils.py:134 —
a v1-refactor inconsistency, SURVEY.md §2.5); this framework standardizes
on ``create``.
"""
import os

import jax
import numpy as np
from flax import serialization

import lidbox_tpu.models as model_registry
from lidbox_tpu import get_logger
from lidbox_tpu.losses import (AngularProximity, cross_entropy_with_logits,
                               get_loss, nll_loss, nll_loss_from_probs)
from lidbox_tpu.metrics import AverageDetectionCost, SparseAverageDetectionCost
from lidbox_tpu.train import checkpoint as ckpt_lib
from lidbox_tpu.train.loop import (EarlyStopping, LearningRateDateLogger,
                                   ModelCheckpoint, Trainer)
from lidbox_tpu.train.optimizers import optimizer_from_config

logger = get_logger("models.utils")


def experiment_cache_from_config(config):
    """(reference: keras_utils.py:19-24 — sklearn_experiment takes
    precedence over experiment when both exist, reference parity)."""
    if config.get("sklearn_experiment") and config.get("experiment"):
        logger.warning(
            "config defines both 'experiment' and 'sklearn_experiment': "
            "the cache/checkpoint directory resolves under "
            "sklearn_experiment (name=%r), matching the reference's "
            "precedence — embeddings sections pointing at the experiment "
            "name will not find these checkpoints",
            config["sklearn_experiment"].get("name"))
    experiment_config = config.get("sklearn_experiment") or config["experiment"]
    return os.path.join(experiment_config["cache_directory"],
                        experiment_config["model"]["key"],
                        experiment_config["name"])


def best_model_checkpoint_from_config(config):
    """(reference: keras_utils.py:27-38)"""
    checkpoint_callbacks = [d for d in config["experiment"].get("callbacks", [])
                            if d["cls"] == "ModelCheckpoint"]
    kwargs = checkpoint_callbacks[0].get("kwargs", {}) if checkpoint_callbacks else {}
    checkpoints_dir = os.path.join(experiment_cache_from_config(config),
                                   "checkpoints")
    return ckpt_lib.get_best_checkpoint_path(
        checkpoints_dir, key=kwargs.get("monitor"), mode=kwargs.get("mode"))


def init_metric_from_config(config):
    """(reference: keras_utils.py:45-52)"""
    cls = config["cls"]
    if cls.endswith("AverageDetectionCost"):
        lin = config["threshold_linspace"]
        thresholds = np.linspace(lin["start"], lin["stop"], lin["num"]).tolist()
        metric_cls = (SparseAverageDetectionCost if cls.startswith("Sparse")
                      else AverageDetectionCost)
        return metric_cls(config["N"], tuple(thresholds),
                          **config.get("kwargs", {}))
    raise KeyError(f"unknown metric class {cls!r}")


def init_loss_from_config(config, output_activation="log_softmax"):
    """Map reference Keras loss class names onto our loss registry.

    ``output_activation`` is the model head's activation: sparse CCE on a
    log_softmax head is plain NLL, but on a softmax head (e.g. the CRNN
    default, reference crnn.py:24) the probabilities need a clipped log
    first — Keras SCC(from_logits=False) semantics — and a bare-logits
    head gets log_softmax folded into the loss."""
    cls = config["cls"]
    kwargs = dict(config.get("kwargs", {}))
    if cls in ("SparseCategoricalCrossentropy", "sparse_categorical_crossentropy"):
        # honor an explicit Keras-style from_logits directive; anything
        # else unknown must raise, not be silently swallowed (the same
        # contract as losses.LOSS_REGISTRY)
        from_logits = kwargs.pop("from_logits", None)
        if kwargs:
            raise TypeError(
                "SparseCategoricalCrossentropy only accepts from_logits, "
                f"got {sorted(kwargs)}")
        if from_logits:
            return cross_entropy_with_logits
        if output_activation == "softmax":
            return nll_loss_from_probs
        if not output_activation:  # raw logits head
            return cross_entropy_with_logits
        return nll_loss
    if cls in ("SparseAngularProximity", "AngularProximity"):
        return AngularProximity(**kwargs)
    return get_loss(cls, **kwargs)


def _conv_kernel_decay_mask(params):
    """True for conv-layer kernel leaves — the parameter set the reference
    regularizes with ``kernel_regularizer=l2`` (reference crnn.py:30-38)."""
    def is_conv_kernel(path, _):
        keys = [str(getattr(p, "key", p)) for p in path]
        return keys[-1] == "kernel" and any(k.startswith("conv") for k in keys)
    return jax.tree_util.tree_map_with_path(is_conv_kernel, params)


def init_callback_from_config(config, cache_dir):
    """(reference: keras_utils.py:55-78)"""
    cls = config["cls"]
    kwargs = dict(config.get("kwargs", {}))
    def _take(supported, cosmetic=()):
        """Split kwargs into supported / tolerated-Keras-cosmetic /
        unknown; unknown (typos, unimplemented behavior switches) RAISE
        instead of being silently dropped."""
        ignored = sorted(k for k in kwargs if k in cosmetic)
        if ignored:
            logger.warning("callback %s: ignoring Keras-only options %s",
                           cls, ignored)
        unknown = sorted(k for k in kwargs
                         if k not in supported and k not in cosmetic)
        if unknown:
            raise TypeError(f"callback {cls} got unsupported options "
                            f"{unknown} (supported: {sorted(supported)})")
        return {k: v for k, v in kwargs.items() if k in supported}

    if cls == "ModelCheckpoint":
        kwargs.setdefault("checkpoints_dir", os.path.join(cache_dir, "checkpoints"))
        kwargs.pop("filepath", None)
        return ModelCheckpoint(**_take(
            ("checkpoints_dir", "monitor", "mode", "save_best_only",
             "backend"),
            cosmetic=("verbose", "save_weights_only", "save_freq")))
    if cls == "EarlyStopping":
        return EarlyStopping(**_take(
            ("monitor", "mode", "patience", "min_delta",
             "restore_best_weights"),
            cosmetic=("verbose", "baseline")))
    if cls == "LearningRateDateLogger":
        return LearningRateDateLogger()
    if cls == "TensorBoard":
        # Handled by Trainer's MetricsLogger (JSONL + optional tf.summary).
        return None
    raise KeyError(f"unknown callback class {cls!r}")


class ModelWrapper:
    """Model + Trainer built from a config dict."""

    def __init__(self, model, model_key, trainer):
        self.model = model
        self.model_key = model_key
        self.trainer = trainer
        self.config = None  # set by from_config (fit_fused needs it)
        self.score_fn = None  # outputs -> [B, N] scores; set by from_config
        self.steps_per_dispatch = 1  # feed.steps_per_dispatch from config

    @property
    def initial_epoch(self):
        """Resume epoch, live from the Trainer (the reference's
        KerasWrapper tracked this on the wrapper, keras_utils.py:179-202;
        a detached copy here would silently read 0 after restore)."""
        return self.trainer.initial_epoch

    @initial_epoch.setter
    def initial_epoch(self, value):
        self.trainer.initial_epoch = int(value)

    @classmethod
    def from_config(cls, config, mesh=None):
        """(reference: keras_utils.py:124-149)"""
        experiment = config["experiment"]
        cache_dir = experiment_cache_from_config(config)
        os.makedirs(cache_dir, exist_ok=True)
        model_key = experiment["model"]["key"]
        input_shape = tuple(experiment["input_shape"])
        num_outputs = int(np.squeeze(experiment["output_shape"]))
        model = model_registry.create(model_key, input_shape, num_outputs,
                                      **experiment["model"].get("kwargs", {}))
        optimizer, lr_schedule = optimizer_from_config(experiment["optimizer"])
        # Keras kernel_regularizer=l2(wd) adds wd*sum(w^2) to the loss, i.e.
        # grad += 2*wd*w flowing through the optimizer — reproduced here as a
        # coupled decay transform on conv kernels (reference crnn.py:30-38).
        weight_decay = float(getattr(model.module, "weight_decay", 0.0) or 0.0)
        if weight_decay:
            import optax
            optimizer = optax.chain(
                optax.add_decayed_weights(2.0 * weight_decay,
                                          mask=_conv_kernel_decay_mask),
                optimizer)
        loss = init_loss_from_config(
            experiment["loss"],
            output_activation=getattr(model.module, "output_activation",
                                      "log_softmax"))
        metrics = {}
        for mconf in experiment.get("metrics", []):
            metric = init_metric_from_config(mconf)
            name = mconf.get("name", mconf["cls"])
            if name in metrics:  # the reference kept a LIST: never drop one
                suffix = 2
                while f"{name}_{suffix}" in metrics:
                    suffix += 1
                name = f"{name}_{suffix}"
            metrics[name] = metric
        callbacks = [c for c in
                     (init_callback_from_config(c, cache_dir)
                      for c in experiment.get("callbacks", []))
                     if c is not None]
        compute_dtype = experiment.get("compute_dtype")
        if isinstance(compute_dtype, str):
            import jax.numpy as jnp
            compute_dtype = getattr(jnp, compute_dtype)
        # host->device feed tuning, config-reachable (docs/config.md):
        # staged-transfer depth, feed compression, grouped dispatch
        feed = experiment.get("feed") or {}  # 'feed:' with no children
        # parses to None in YAML
        # Language-vector losses (AngularProximity) expose ``predict``
        # mapping [B, D] vectors -> [B, N] class scores (-theta, reference
        # losses.py:51-52); wiring it as the trainer's score_fn makes
        # C_avg/EER/reports compose with headless embedding models.
        score_fn = getattr(loss, "predict", None)
        trainer = Trainer(model, optimizer, loss, metrics=metrics, mesh=mesh,
                          callbacks=callbacks, lr_schedule=lr_schedule,
                          log_dir=os.path.join(cache_dir, "logs"),
                          compute_dtype=compute_dtype, score_fn=score_fn,
                          prefetch=feed.get("prefetch", 4),
                          stage_dtype=feed.get("stage_dtype"),
                          cache_staged=feed.get("cache_staged", False))
        wrapper = cls(model, model_key, trainer)
        wrapper.steps_per_dispatch = int(feed.get("steps_per_dispatch", 1))
        wrapper.cache_shuffle = feed.get("cache_shuffle", True)
        wrapper.score_fn = score_fn
        wrapper.config = config
        return wrapper

    @classmethod
    def from_config_as_embedding_extractor_fn(cls, config, mesh=None):
        """Restore the best checkpoint, freeze, and return a jitted
        input -> embedding function (reference: keras_utils.py:151-174).

        With ``mesh``, extraction runs data-parallel over its devices:
        parameters replicated, batches sharded over the batch axis (ragged
        tails zero-padded to the next mesh multiple and sliced back) — the
        TPU-native analogue of the reference's per-extractor tf.device
        strings (lidbox/data/steps.py:680,691-692)."""
        cache_dir = experiment_cache_from_config({"experiment": {
            "cache_directory": config["cache_directory"],
            "model": config["model"],
            "name": config["experiment_name"]}})
        model_key = config["model"]["key"]
        input_shape = tuple(config["input_shape"])
        num_outputs = int(np.squeeze(config["output_shape"]))
        model = model_registry.create(model_key, input_shape, num_outputs,
                                      **config["model"].get("kwargs", {}))
        model.init()
        best = ckpt_lib.get_best_checkpoint_path(
            os.path.join(cache_dir, "checkpoints"),
            key=config["best_checkpoint"].get("monitor"),
            mode=config["best_checkpoint"].get("mode"))
        if best is None:
            raise FileNotFoundError(
                f"no checkpoints under {cache_dir}/checkpoints")
        logger.info("Restoring extractor weights from %s", best)
        raw = ckpt_lib.load_raw_checkpoint(best)
        variables = dict(model.variables)
        variables["params"] = serialization.from_state_dict(
            variables["params"], raw["params"])
        if raw.get("batch_stats") and "batch_stats" in variables:
            variables["batch_stats"] = serialization.from_state_dict(
                variables["batch_stats"], raw["batch_stats"])
        extractor = model_registry.as_embedding_extractor(model_key,
                                                          model.with_variables(variables))

        from lidbox_tpu.util import make_batch_predict_fn
        stage_dtype = config.get("stage_dtype")
        if mesh is None:
            predict_fn = make_batch_predict_fn(
                extractor, mesh=None, apply_kwargs={"output": "embedding"},
                stage_dtype=stage_dtype)
            return lambda x: predict_fn(np.asarray(x))

        batch_size = int(config.get("batch_size", 32))
        batch_size = -(-batch_size // mesh.size) * mesh.size
        predict_fn = make_batch_predict_fn(
            extractor, batch_size=batch_size, mesh=mesh,
            apply_kwargs={"output": "embedding"}, stage_dtype=stage_dtype)
        return lambda x: predict_fn(np.asarray(x))

    def fit(self, train_batches, validation_batches, **kwargs):
        """(reference: keras_utils.py:191-203). The config's
        ``feed.steps_per_dispatch`` applies to the feature-fed path too
        (Trainer.fit grouped dispatch), overridable per call, as does
        ``feed.cache_shuffle`` (true = batch-order, "rows" = row-level
        recomposition of the cached corpus each epoch)."""
        kwargs.setdefault("steps_per_dispatch", self.steps_per_dispatch)
        kwargs.setdefault("cache_shuffle", getattr(self, "cache_shuffle",
                                                   True))
        return self.trainer.fit(train_batches, validation_batches, **kwargs)

    def fit_fused(self, signal_batches, epochs=1, sample_rate=None,
                  verbose=True, val_signal_batches=None,
                  val_feature_batches=None, steps_per_dispatch=None):
        """Train through the fused on-device augmentation chain declared in
        the config's ``features.on_device_augment`` section: every step is
        ONE XLA program (VAD/noise/resample/FIR/SpecAugment -> features ->
        fwd/bwd -> update) fed raw waveform batches
        (train.signal_batches_from_dataset). BASELINE config 5, declarative.
        Validation batches are featurized CLEAN (same features config,
        augmentation stripped) and evaluated after every epoch.
        """
        from lidbox_tpu.data import on_device
        features_conf = dict((self.config or {}).get("features") or {})
        if "on_device_augment" not in features_conf:
            raise ValueError(
                "fit_fused needs a features.on_device_augment config section")
        if sample_rate is None:
            if "sample_rate" not in features_conf:
                # a silent 16 kHz default would compute VAD windows, the
                # resampler, and the mel filterbank for the WRONG rate on
                # e.g. an 8 kHz telephone corpus — training would complete
                # with quietly broken features
                raise ValueError(
                    "fit_fused needs the audio sample rate: set "
                    "features.sample_rate in the config (the fused chain "
                    "compiles rate-dependent stages ahead of the data)")
            sample_rate = int(features_conf["sample_rate"])
        feature_fn = on_device.feature_fn_from_config(sample_rate,
                                                      features_conf)
        val_feature_fn = None
        if val_signal_batches is not None:
            clean_conf = {k: v for k, v in features_conf.items()
                          if k != "on_device_augment"}
            val_feature_fn = on_device.feature_fn_from_config(sample_rate,
                                                              clean_conf)
        return on_device.fit_signals(self.trainer, feature_fn, signal_batches,
                                     epochs=epochs, verbose=verbose,
                                     val_batches=val_signal_batches,
                                     val_feature_fn=val_feature_fn,
                                     val_feature_batches=val_feature_batches,
                                     steps_per_dispatch=(
                                         self.steps_per_dispatch
                                         if steps_per_dispatch is None
                                         else steps_per_dispatch))

    def count_params(self):
        return self.model.num_params()

    def __str__(self):
        from lidbox_tpu.models.model_api import concrete_input_shape
        shape = concrete_input_shape(self.model.input_shape)
        try:
            return self.model.module.tabulate(
                jax.random.PRNGKey(0), np.zeros((1,) + shape, np.float32),
                train=False)
        except Exception:
            return f"{self.model_key}: {self.model.module}"
