"""
The training loop: optax + jit/GSPMD data parallelism + checkpoint hooks.

Replaces the reference's Keras ``compile``/``fit`` path
(reference: lidbox/models/keras_utils.py:124-149, 191-203) with an explicit
functional loop:

- TrainState pytree (step, params, batch_stats, opt_state),
- one jit-compiled train step; under a ``jax.sharding.Mesh`` the batch is
  sharded over the ``data`` axis and XLA inserts the gradient all-reduce
  over ICI (GSPMD) — the same program runs single-chip or on a slice,
- eval steps stream the C_avg metric as a replicated counter pytree,
- Python callback hooks (ModelCheckpoint, EarlyStopping, LR logger)
  replacing Keras callbacks, with the reference's best-by-metric
  checkpoint naming and ``initial_epoch`` resume.
"""
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from lidbox_tpu import RANDOM_SEED, get_logger
from lidbox_tpu import parallel
from lidbox_tpu.data.dataset import padded_batch
from lidbox_tpu.train import checkpoint as ckpt_lib
from lidbox_tpu.train.observability import MetricsLogger, ThroughputMeter

logger = get_logger("train.loop")


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class Callback:
    """Hook protocol replacing Keras callbacks (reference
    keras_utils.py:55-78)."""

    def on_train_begin(self, trainer):
        pass

    def on_epoch_begin(self, trainer, epoch):
        pass

    def on_epoch_end(self, trainer, epoch, logs):
        pass

    def on_train_end(self, trainer):
        pass


class ModelCheckpoint(Callback):
    """Save state each epoch with metric-bearing filenames
    (reference: keras_utils.py:55-64).

    ``backend="msgpack"`` (default) writes atomic single-file ``.ckpt``
    checkpoints; ``backend="orbax"`` routes saves through
    ``OrbaxCheckpointer`` — asynchronous HBM->disk writes (training never
    blocks on serialization; ``wait()`` runs at train end) with the same
    metric-named layout, so best-checkpoint selection and resume work
    identically across backends.
    """

    def __init__(self, checkpoints_dir, monitor="val_loss", mode="min",
                 save_best_only=False, backend="msgpack"):
        self.checkpoints_dir = checkpoints_dir
        self.monitor = monitor
        self.mode = mode
        self.save_best_only = save_best_only
        self.best = None
        if backend not in ("msgpack", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r} "
                             "(expected 'msgpack' or 'orbax')")
        self.backend = backend
        self._orbax = None

    def on_epoch_end(self, trainer, epoch, logs):
        value = logs.get(self.monitor)
        if self.save_best_only:
            if value is None:
                # mirror Keras: without the monitored metric there is no
                # "best" ordering — warn and skip, rather than comparing
                # a constant placeholder (which would save epoch 1 and
                # then silently never checkpoint again)
                logger.warning(
                    "ModelCheckpoint: monitored metric %r not in epoch "
                    "logs %s; skipping save", self.monitor, sorted(logs))
                return
            if self.best is not None:
                better = (value < self.best if self.mode == "min"
                          else value > self.best)
                if not better:
                    return
            self.best = value
        # filename metric: val_loss when present, else the train loss (a
        # validation-free run still gets resumable, ordered checkpoints)
        fname_val = logs.get("val_loss", logs.get("loss", 0.0))
        if self.backend == "orbax":
            if self._orbax is None:
                self._orbax = ckpt_lib.OrbaxCheckpointer(use_async=True)
            self._orbax.save(self.checkpoints_dir, trainer.state,
                             epoch=epoch, val_loss=fname_val)
            return
        ckpt_lib.save_checkpoint(self.checkpoints_dir, trainer.state,
                                 epoch=epoch, val_loss=fname_val)

    def on_train_end(self, trainer):
        if self._orbax is not None:
            self._orbax.wait()  # drain async writes before the process moves on


class EarlyStopping(Callback):
    """Stop training when the monitored metric stops improving by
    ``min_delta`` for ``patience`` epochs (Keras EarlyStopping semantics;
    the reference exposed the Keras class through its callback config,
    reference: lidbox/models/keras_utils.py:74-78). State resets on every
    train begin, so a reused trainer gets the full patience window again
    instead of inheriting the previous run's counter.

    ``restore_best_weights``: when stopping, restore the params and
    batch_stats from the best-monitored epoch (Keras semantics; the
    snapshot is a host copy so the donated train-step buffers are never
    aliased)."""

    def __init__(self, monitor="val_loss", mode="min", patience=5,
                 min_delta=0.0, restore_best_weights=False):
        self.monitor, self.mode = monitor, mode
        self.patience, self.min_delta = patience, min_delta
        self.restore_best_weights = bool(restore_best_weights)
        self.best, self.wait = None, 0
        self._best_state = None

    def on_train_begin(self, trainer):
        self.best, self.wait = None, 0
        self._best_state = None

    def on_epoch_end(self, trainer, epoch, logs):
        value = logs.get(self.monitor)
        if value is None:
            return
        improved = (self.best is None
                    or (value < self.best - self.min_delta if self.mode == "min"
                        else value > self.best + self.min_delta))
        if improved:
            self.best, self.wait = value, 0
            if self.restore_best_weights:
                self._best_state = jax.device_get(
                    (trainer.state.params, trainer.state.batch_stats))
        else:
            self.wait += 1
            if self.wait >= self.patience:
                logger.info("EarlyStopping: no %s improvement in %d epochs",
                            self.monitor, self.patience)
                if self.restore_best_weights and self._best_state is not None:
                    params, batch_stats = self._best_state
                    # re-apply mesh/TP shardings leaf by leaf (like
                    # Trainer.restore): plain device_put would drop them
                    def _place(host, current):
                        s = getattr(current, "sharding", None)
                        return (jax.device_put(host, s) if s is not None
                                else jax.device_put(host))
                    trainer.state = trainer.state.replace(
                        params=jax.tree_util.tree_map(
                            _place, params, trainer.state.params),
                        batch_stats=jax.tree_util.tree_map(
                            _place, batch_stats, trainer.state.batch_stats))
                    logger.info("EarlyStopping: restored best weights "
                                "(%s=%s)", self.monitor, self.best)
                trainer.stop_training = True


class LearningRateDateLogger(Callback):
    """Log the decayed learning rate at each epoch start
    (reference: keras_utils.py:81-93)."""

    def on_epoch_begin(self, trainer, epoch):
        lr = trainer.current_learning_rate()
        logger.info("%s - learning rate: %.8g",
                    time.strftime("%Y-%m-%d %H:%M:%S"), lr)


def _tree_device_nbytes(tree):
    """PER-DEVICE bytes a staged pytree pins in HBM — the staged-cache
    accounting unit, comparable against the per-device budget
    (_cache_budget_bytes). Sharded leaves count their largest single-
    device footprint (sum of that device's addressable shards): a
    batch-sharded array on an N-device mesh pins 1/N of its bytes per
    device, so counting global nbytes would trip the cache guard at 1/N
    of actual capacity; replicated leaves correctly count full size
    (every device holds a copy). Host arrays count their plain nbytes."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            try:
                per_dev = {}
                for s in leaf.addressable_shards:
                    per_dev[s.device] = (per_dev.get(s.device, 0)
                                         + int(s.data.nbytes))
                if per_dev:
                    total += max(per_dev.values())
                    continue
            except Exception:
                pass
        total += int(getattr(leaf, "nbytes", 0))
    return total


def _cache_budget_bytes(limit=None):
    """HBM budget available to ``cache_staged`` on this process's first
    device. ``limit`` (Trainer.cache_bytes_limit) overrides detection;
    otherwise 90% of the device's reported ``bytes_limit`` minus what is
    already in use (params/opt state/staged buffers), or +inf where the
    backend exposes no memory stats (CPU)."""
    if limit is not None:
        return float(limit)
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        if "bytes_limit" in stats:
            in_use = float(stats.get("bytes_in_use", 0.0))
            return 0.9 * float(stats["bytes_limit"]) - in_use
    except Exception:
        pass
    return float("inf")


def _batched_device_get(tree):
    """``jax.device_get`` with ONE readback per dtype instead of one per
    leaf: device leaves are raveled and concatenated on device (cheap
    async dispatches, no round trip), fetched as a single buffer, and
    split host-side. On a high-RTT feed link a per-leaf get pays one
    round trip per leaf — the 16-leaf x-vector param sync measured ~0.4 s
    of the ~0.5 s fixed per-fit() cost on the tunneled chip
    (tools/exp_feed_attrib.py); batched it pays ~1 round trip + the
    bandwidth the bytes cost anyway. Host (non-jax.Array) leaves pass
    through unchanged."""
    import jax.numpy as jnp
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = list(leaves)
    by_dtype = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array) and leaf.is_fully_addressable:
            by_dtype.setdefault(jnp.dtype(leaf.dtype), []).append(i)
        elif isinstance(leaf, jax.Array):
            # process-spanning shardings: keep the plain get (callers that
            # need these batched allgather first, like sync_model_variables)
            out[i] = jax.device_get(leaf)
    for idxs in by_dtype.values():
        if len(idxs) == 1:
            out[idxs[0]] = jax.device_get(leaves[idxs[0]])
            continue
        flat = jnp.concatenate([leaves[i].ravel() for i in idxs])
        host = np.asarray(jax.device_get(flat))
        off = 0
        for i in idxs:
            n = int(leaves[i].size)
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def _structure_digest(item):
    """Deterministic 32-bit digest of a staged item's pytree structure and
    leaf shapes/dtypes — what every host must agree on before a collective
    step consumes it (the feed-parity guard allgathers this alongside the
    exhaustion flag). Global arrays carry GLOBAL shapes, so equal digests
    mean the hosts assembled the same program inputs."""
    import zlib
    leaves, treedef = jax.tree_util.tree_flatten(item)
    desc = str(treedef) + "|" + ";".join(
        f"{getattr(leaf, 'shape', ())}:"
        f"{getattr(leaf, 'dtype', type(leaf).__name__)}"
        for leaf in leaves)
    return zlib.crc32(desc.encode())


def _signature_runs_contiguous(sigs):
    """True when every distinct value in ``sigs`` appears as ONE
    contiguous run — the condition under which stack-major cached replay
    reproduces the original sequence exactly (shared by
    Trainer._consolidate_cache and on_device._consolidate_signal_cache)."""
    runs = 1 + sum(a != b for a, b in zip(sigs, sigs[1:]))
    return runs == len(set(sigs))


class Trainer:
    """Functional trainer binding a Model, an optax optimizer, a
    per-example loss, and streaming metrics.

    Args:
        model: lidbox_tpu.models.model_api.Model (initialized or not).
        optimizer: optax.GradientTransformation.
        loss_fn: loss_fn(targets [B], outputs) -> per-example losses [B].
        metrics: dict name -> AverageDetectionCost-like object with
            init_state/update_sparse/result.
        mesh: jax.sharding.Mesh for data parallelism (None = single device).
        lr_schedule: optax schedule or float, used only for logging.
    """

    def __init__(self, model, optimizer, loss_fn, metrics=None, mesh=None,
                 callbacks: Sequence[Callback] = (), lr_schedule=None,
                 log_dir=None, rng=None, compute_dtype=None,
                 param_sharding=None, prefetch=4, stage_dtype=None,
                 score_fn=None, cache_staged=False, cache_bytes_limit=None):
        self.model = model
        self.optimizer = optimizer
        self.loss_fn = loss_fn
        # Mixed precision: forwards run in compute_dtype (e.g. bfloat16)
        # while master params, optimizer state, loss and gradients stay
        # float32 (upcast at the loss boundary).
        self.compute_dtype = compute_dtype
        # Host->device feed: keep up to ``prefetch`` staged batches in
        # flight (transfers run in background threads and overlap both the
        # loader and device compute); ``stage_dtype`` (e.g. "bfloat16")
        # compresses float inputs on the host before the transfer and
        # upcasts on device — 2x less feed traffic, which matters whenever
        # host->device bandwidth (PCIe, or this rig's axon tunnel) is the
        # training bottleneck rather than the chip.
        self.prefetch = max(1, int(prefetch))
        self.stage_dtype = stage_dtype
        # Device-resident epoch caching: stage every training batch ONCE
        # and reuse the device arrays for all later epochs — zero feed
        # traffic after epoch 1, so slow feed links (PCIe-starved hosts,
        # this rig's tunnel) train at full device speed from epoch 2 on.
        # Requires the staged corpus to fit in HBM, and fixes the batch
        # order/content across epochs (no per-epoch reshuffle; fused
        # signal training keeps per-epoch augmentation randomness because
        # augmentation runs on device from the cached RAW waveforms).
        self.cache_staged = bool(cache_staged)
        # HBM guard for cache_staged: caching stops (with a warning, and
        # streaming takes over) once 2x the staged bytes — consolidation
        # transiently holds originals + stacks — would exceed this budget.
        # None = auto-detect from the device's memory stats (90% of
        # bytes_limit minus bytes already in use); a number caps
        # explicitly; float("inf") disables the guard.
        self.cache_bytes_limit = cache_bytes_limit
        # Maps raw model outputs -> per-class scores [B, N] for metrics.
        # Log-prob heads need nothing (None = identity); language-vector
        # models (ap_lstm + AngularProximity) pass the loss's ``predict``
        # (scores = -theta, reference: lidbox/losses.py:51-52) so C_avg &
        # co. compose with D-dim embedding outputs.
        self.score_fn = score_fn
        # Rematerialization: trade FLOPs for activation memory by
        # recomputing the forward during backprop (jax.checkpoint). Off by
        # default — the LId model family is small; enable for long-sequence
        # or large-batch training that would otherwise spill HBM.
        self.remat = False
        self.metrics = dict(metrics or {})
        self.mesh = mesh
        # Optional tensor parallelism: (path, leaf) -> Sharding applied to
        # every parameter at create_state (e.g.
        # parallel.column_parallel_rule over a parallel.get_mesh_2d mesh).
        # GSPMD then inserts the model-axis collectives; batches still
        # shard over the data axis only.
        self.param_sharding = param_sharding
        self.callbacks = list(callbacks)
        self.lr_schedule = lr_schedule
        self.stop_training = False
        self.initial_epoch = 0
        self.rng = rng if rng is not None else jax.random.PRNGKey(RANDOM_SEED)
        self.metrics_logger = MetricsLogger(log_dir) if log_dir else None
        self.state = None
        self._step_config_key = None
        self._refresh_step_fns()

    def _refresh_step_fns(self):
        """(Re)build the jitted step functions when trace-time config
        changed. The steps read remat/compute_dtype/loss_fn/score_fn/
        optimizer/metrics/model at TRACE time; without this, mutating
        those fields after the first step would silently keep the old
        compiled program. Called at every fit/evaluate/predict entry —
        cheap when nothing changed (the compiled executables live in each
        jit wrapper's cache).

        The key holds REFERENCES to the config objects (compared with ==,
        which is identity for functions/modules): storing bare id()s
        invites the id-reuse hazard where a new function allocated at a
        freed object's address compares equal and keeps a stale program.
        """
        key = (self.remat, self.compute_dtype, self.loss_fn, self.score_fn,
               self.optimizer, self.model.module,
               tuple(sorted(self.metrics.items())))
        if self._step_config_key is not None and key == self._step_config_key:
            return
        self._step_config_key = key
        self._jit_train_step = jax.jit(self._train_step, donate_argnums=0)
        self._jit_multi_train_step = jax.jit(self._multi_train_step,
                                             donate_argnums=0)
        self._jit_replay_train_step = jax.jit(self._replay_train_step,
                                              donate_argnums=0)
        self._jit_replay_rows_train_step = jax.jit(
            self._replay_rows_train_step, donate_argnums=0)
        self._jit_eval_step = jax.jit(self._eval_step)
        self._jit_replay_eval_step = jax.jit(self._replay_eval_step)
        self._jit_apply_eval = jax.jit(
            lambda params, bs, batch: self._apply(params, bs, batch, train=False))

    # -- state --------------------------------------------------------------

    def create_state(self):
        if self.model.variables is None:
            self.model.init(self.rng)
        variables = self.model.variables
        # COPY into the state: the jitted train step donates its state
        # buffers, so aliasing model.variables here would delete the
        # model's own arrays on the first step (predict/serve mid-training
        # would hit "Array has been deleted")
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        batch_stats = jax.tree_util.tree_map(
            jnp.array, variables.get("batch_stats", {}))
        if self.mesh is not None and self.param_sharding is not None:
            # tensor-parallel placement first: the optimizer moments then
            # inherit each param's sharding via zeros_like
            params = parallel.shard_params(params, self.mesh,
                                           self.param_sharding)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self.optimizer.init(params))
        if self.mesh is not None:
            if self.param_sharding is None:
                # put_replicated handles meshes spanning multiple processes
                self.state = parallel.put_replicated(self.state, self.mesh)
            else:
                repl = parallel.replicated(self.mesh)
                from jax.sharding import NamedSharding

                def _on_mesh(leaf):
                    # optimizer moments inherited the params' mesh
                    # placement via zeros_like; scalars (e.g. adam count)
                    # did not — replicate them so every state leaf lives
                    # on the same device set
                    s = getattr(leaf, "sharding", None)
                    if isinstance(s, NamedSharding) and s.mesh == self.mesh:
                        return leaf
                    return jax.device_put(leaf, repl)
                self.state = TrainState(
                    step=jax.device_put(self.state.step, repl),
                    params=self.state.params,
                    batch_stats=jax.device_put(self.state.batch_stats, repl),
                    opt_state=jax.tree_util.tree_map(_on_mesh,
                                                     self.state.opt_state))
        return self.state

    def restore(self, checkpoint_path):
        """Resume from a checkpoint; sets initial_epoch from the filename
        (reference: keras_utils.py:187-189, 202). Mesh placement (incl.
        tensor-parallel param shardings) is re-applied leaf by leaf —
        deserialization returns plain host arrays that would otherwise
        silently drop the shardings create_state installed."""
        if self.state is None:
            self.create_state()
        shardings = None
        if self.mesh is not None:
            shardings = jax.tree_util.tree_map(
                lambda leaf: getattr(leaf, "sharding", None), self.state)
        self.state = ckpt_lib.restore_checkpoint(checkpoint_path, self.state)
        if shardings is not None:
            self.state = jax.tree_util.tree_map(
                lambda leaf, s: jax.device_put(leaf, s) if s is not None
                else leaf,
                self.state, shardings)
        self.initial_epoch = ckpt_lib.initial_epoch_from_path(checkpoint_path)
        self.sync_model_variables()
        return self.state

    def sync_model_variables(self):
        """Point model.variables at the current trained weights as HOST
        arrays (device_get), so the model object is directly servable after
        fit/restore and never aliases buffers a later train step would
        donate-and-delete."""
        if self.state is None:
            return
        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        leaves = jax.tree_util.tree_leaves(variables)
        if any(isinstance(a, jax.Array) and not a.is_fully_addressable
               for a in leaves):
            # multi-process tensor-parallel shardings: some param shards
            # live on other hosts, and device_get on a non-addressable
            # array raises — allgather each leaf to every process first
            from jax.experimental import multihost_utils
            variables = jax.tree_util.tree_map(
                lambda a: multihost_utils.process_allgather(a, tiled=True)
                if isinstance(a, jax.Array) and not a.is_fully_addressable
                else a, variables)
        self.model.variables = _batched_device_get(variables)

    def current_learning_rate(self):
        if self.lr_schedule is None:
            return float("nan")
        if callable(self.lr_schedule):
            step = int(jax.device_get(self.state.step)) if self.state else 0
            return float(self.lr_schedule(step))
        return float(self.lr_schedule)

    # -- jitted steps -------------------------------------------------------

    def _apply(self, params, batch_stats, batch, train, rngs=None):
        variables = {"params": params}
        has_bn = bool(batch_stats)
        if has_bn:
            variables["batch_stats"] = batch_stats
        x = batch["input"]
        if self.compute_dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda p: p.astype(self.compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, variables)
            x = x.astype(self.compute_dtype)
        elif x.dtype != jnp.float32 and jnp.issubdtype(x.dtype, jnp.floating):
            # stage_dtype-compressed feed: decompress at the device edge
            x = x.astype(jnp.float32)
        kwargs = {}
        if "input_mask" in batch:
            kwargs["mask"] = batch["input_mask"]
        if train:
            out, updates = self.model.module.apply(
                variables, x, train=True, rngs=rngs,
                mutable=["batch_stats"] if has_bn else [], **kwargs)
            new_bs = updates.get("batch_stats", batch_stats) if has_bn else batch_stats
            if self.compute_dtype is not None:
                out = out.astype(jnp.float32)
                new_bs = jax.tree_util.tree_map(
                    lambda s: s.astype(jnp.float32), new_bs)
            return out, new_bs
        out = self.model.module.apply(variables, x, train=False, **kwargs)
        if self.compute_dtype is not None:
            out = out.astype(jnp.float32)
        return out, batch_stats

    def _train_step(self, state, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        rngs = {"dropout": step_rng, "noise": jax.random.fold_in(step_rng, 1)}

        def compute_loss(params):
            apply = self._apply
            if self.remat:
                apply = jax.checkpoint(
                    lambda p, bs, b: self._apply(p, bs, b, train=True,
                                                 rngs=rngs))
                outputs, new_bs = apply(params, state.batch_stats, batch)
            else:
                outputs, new_bs = apply(params, state.batch_stats, batch,
                                        train=True, rngs=rngs)
            losses = self.loss_fn(batch["target"], outputs)
            if "example_mask" in batch:
                m = batch["example_mask"].astype(losses.dtype)
                loss = jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)
            else:
                loss = jnp.mean(losses)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params)
        updates, new_opt_state = self.optimizer.update(grads, state.opt_state,
                                                       state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt_state)
        return new_state, loss

    def _multi_train_step(self, state, stacked, rng):
        """K train steps in ONE XLA program: lax.scan over the leading axis
        of a stacked batch dict [K, B, ...] -> (state, losses [K]). On a
        serializing high-RTT feed link this amortizes the per-step
        transfer + dispatch rounds K-fold; per-step numerics are IDENTICAL
        to K single dispatches (the step RNG folds in state.step, which
        advances inside the scan). The feature-path analogue of
        on_device.make_fused_multi_step (reference: the tf.data prefetch
        pipeline this replaces, lidbox/data/steps.py:803-818)."""
        def body(st, batch):
            return self._train_step(st, batch, rng)
        return jax.lax.scan(body, state, stacked)

    def _replay_train_step(self, state, stacked, rng, order):
        """Whole-epoch cached replay: ONE XLA program scans ``order`` (a
        [K] int32 permutation) indexing into the device-resident stacked
        batches — one dispatch and one loss-vector readback per epoch
        instead of K dispatch rounds. ``stacked`` is NOT donated (it is
        reused every epoch); per-step batches come from
        dynamic_index_in_dim slices, so no permuted copy of the cached
        corpus ever materializes in HBM."""
        def body(st, i):
            batch = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, keepdims=False),
                stacked)
            return self._train_step(st, batch, rng)
        return jax.lax.scan(body, state, order)

    def _replay_rows_train_step(self, state, stacked, rng, idx):
        """Whole-epoch cached replay with ROW-level reshuffle
        (cache_shuffle="rows"): ``idx`` is a [K, B] int32 permutation of
        the K*B cached example rows, so every epoch re-draws batch
        COMPOSITION, not just batch order — the device-resident analogue
        of the reference re-shuffling elements every epoch
        (reference: lidbox/data/steps.py:997-999). Each scan step gathers
        its B rows from the flattened [K*B, ...] view (a leading-axis
        sublane gather; the flatten of two major dims is free), so no
        permuted copy of the corpus materializes in HBM. Masks/targets
        travel with their rows. ``stacked`` is NOT donated — it is reused
        every epoch."""
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:]),
            stacked)
        def body(st, rows):
            batch = jax.tree_util.tree_map(
                lambda a: jnp.take(a, rows, axis=0), flat)
            return self._train_step(st, batch, rng)
        return jax.lax.scan(body, state, idx)

    def _eval_step(self, state, batch, metric_states):
        outputs, _ = self._apply(state.params, state.batch_stats, batch,
                                 train=False)
        losses = self.loss_fn(batch["target"], outputs)
        if "example_mask" in batch:
            m = batch["example_mask"].astype(losses.dtype)
            loss_sum = jnp.sum(losses * m)
            count = jnp.sum(m)
        else:
            loss_sum = jnp.sum(losses)
            count = jnp.float32(losses.shape[0])
        weights = batch.get("example_mask")
        scores = outputs if self.score_fn is None else self.score_fn(outputs)
        new_metric_states = {
            name: metric.update_sparse(metric_states[name], batch["target"],
                                       scores, weights=weights)
            for name, metric in self.metrics.items()}
        return loss_sum, count, new_metric_states

    def _replay_eval_step(self, state, stacked, metric_states):
        """Whole-epoch cached validation: ONE XLA program scans a stacked
        batch dict [K, B, ...], accumulating loss sum/count and metric
        states on device — one dispatch + one readback per shape stack
        per evaluate() instead of one dispatch round per batch (the eval
        analogue of _replay_train_step; no permutation needed, evaluation
        is order-independent). ``stacked`` is NOT donated — it is the
        cached validation set, reused every epoch."""
        def body(carry, batch):
            total, count, ms = carry
            loss_sum, n, ms = self._eval_step(state, batch, ms)
            return (total + loss_sum.astype(jnp.float32),
                    count + n.astype(jnp.float32), ms), None
        init = (jnp.float32(0.0), jnp.float32(0.0), metric_states)
        (total, count, ms), _ = jax.lax.scan(body, init, stacked)
        return total, count, ms

    # -- host loop ----------------------------------------------------------

    def _compress(self, batch):
        """Host-side staging compression: float inputs convert to a
        FLOATING ``stage_dtype`` (e.g. bfloat16 — half the bytes over the
        feed link); _apply upcasts on device, so numerics differ only by
        the input rounding. Integer stage dtypes (int16 PCM) apply only to
        the fused waveform route (on_device.stage_signals) — truncating
        float FEATURE batches to integers would corrupt them, so they pass
        through unchanged here."""
        if self.stage_dtype is None:
            return batch
        dt = np.dtype(jnp.dtype(self.stage_dtype))
        # jnp.issubdtype: numpy doesn't classify ml_dtypes bfloat16 as
        # floating, jax does
        if not jnp.issubdtype(dt, jnp.floating):
            return batch
        x = np.asarray(batch["input"])
        if x.dtype != dt and np.issubdtype(x.dtype, np.floating):
            batch = dict(batch)
            batch["input"] = x.astype(dt)
        return batch

    @staticmethod
    def _batch_rows(batch):
        """Leading dim of a batch dict — from ``target`` when present, else
        ``input`` (predict() feeds unlabeled batches), else any value."""
        for key in ("target", "input"):
            if key in batch:
                return int(np.shape(batch[key])[0])
        return int(np.shape(next(iter(batch.values())))[0])

    def _pad_to_mesh(self, batch):
        """Right-pad a host batch's rows to the mesh's divisibility
        requirement (LOCAL device multiple for process-spanning meshes —
        each process feeds only its slice — global device count otherwise);
        padded rows carry example_mask=False and contribute nothing to
        loss or metrics."""
        if parallel.mesh_spans_processes(self.mesh):
            divisor = max(1, sum(
                d.process_index == jax.process_index()
                for d in self.mesh.devices.flat))
        else:
            divisor = self.mesh.devices.size
        n = self._batch_rows(batch)
        if n % divisor:
            target_n = -(-n // divisor) * divisor
            batch, valid = parallel.pad_batch_to(batch, target_n)
            mask = batch.get("example_mask")
            batch["example_mask"] = (valid if mask is None
                                     else np.logical_and(mask, valid))
        return batch

    def _put(self, batch):
        """Stage a host batch onto the device/mesh. The transfer is started
        EXPLICITLY here (device_put) so _staged's background threads overlap
        it with device compute — leaving numpy batches for jit dispatch to
        transfer would serialize one feed round-trip per step. Batches whose
        leading dim does not divide the mesh size are right-padded
        (_pad_to_mesh). Under a process-spanning mesh this process feeds
        only its LOCAL slice of the global batch; rows assemble into one
        globally-sharded array with no cross-host data movement, and all
        processes must feed the same number of rows per step."""
        batch = self._compress(batch)
        if self.mesh is None:
            return jax.device_put(batch)
        batch = self._pad_to_mesh(batch)
        if parallel.mesh_spans_processes(self.mesh):
            return parallel.global_batch_from_local(batch, self.mesh)
        return parallel.shard_batch(batch, self.mesh)

    @staticmethod
    def _grouped_batches(batches, spd, limit=None):
        """Group consecutive same-signature batch dicts into lists of up
        to ``spd`` (one staged transfer + one scanned program per list).
        ``limit`` caps the total number of batches emitted and aligns
        group boundaries with the truncation point — a stacked program
        cannot run partially, so steps_per_epoch must land on a group
        edge."""
        buf, sig = [], None
        for b in batches:
            s = tuple(sorted((k, np.shape(v), np.asarray(v).dtype.str)
                             for k, v in b.items()))
            if buf and s != sig:
                yield buf
                if limit is not None:
                    limit -= len(buf)
                    if limit <= 0:
                        return
                buf = []
            sig = s
            buf.append(b)
            if len(buf) == spd or (limit is not None and len(buf) >= limit):
                yield buf
                if limit is not None:
                    limit -= len(buf)
                    if limit <= 0:
                        return
                buf = []
        if buf:
            yield buf

    def _put_group(self, group):
        """Stage a list of same-shape host batches as ONE stacked transfer
        (dict of [K, B, ...] arrays) for _multi_train_step — K steps cost
        one feed round instead of K. Under a mesh the stack's scan axis is
        replicated and the batch axis sharded (stacked_batch_sharding);
        process-spanning meshes assemble each host's local rows into the
        globally-sharded stack exactly like _put."""
        group = [self._compress(b) for b in group]
        if self.mesh is None:
            stacked = {k: np.stack([np.asarray(b[k]) for b in group])
                       for k in group[0]}
            return jax.device_put(stacked)
        group = [self._pad_to_mesh(b) for b in group]
        stacked = {k: np.stack([np.asarray(b[k]) for b in group])
                   for k in group[0]}
        sharding = parallel.stacked_batch_sharding(self.mesh)
        if parallel.mesh_spans_processes(self.mesh):
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)), stacked)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), stacked)

    def _consolidate_cache(self, items, grouped, preserve_order=False):
        """Merge epoch-1's staged cache entries into per-shape device
        stacks for whole-epoch scan replay (_replay_train_step).

        ``items``: list of (n, batch) with ``batch`` a staged device dict
        [B, ...] (grouped=False) or a stacked group dict [k, B, ...] with
        ``n`` a list of per-step row counts (grouped=True). Returns a list
        of {"stack": dict of [K, B, ...] device arrays, "ns": int64 [K]}
        groups, one per distinct per-step batch signature (typically one
        full-size group plus at most one ragged-tail group). The
        consolidation transiently holds originals + stacks (~2x the cached
        corpus in HBM); callers must release the per-batch entries
        afterwards.

        ``preserve_order=True`` (the cache_shuffle=False contract: replay
        EXACTLY the epoch-1 batch sequence): stack replay is stack-major,
        so when the signatures INTERLEAVE (e.g. padded-bucket loaders
        emitting A, B, A) consolidation would silently reorder the
        trajectory — return None instead, and the caller keeps order-exact
        per-entry replay. Contiguous signature runs (the common case: one
        shape plus a ragged tail) replay order-exact and consolidate."""
        def sig_of(batch, lead):
            return tuple(sorted((k, tuple(v.shape[lead:]), str(v.dtype))
                                for k, v in batch.items()))
        sigs = [sig_of(batch, 1 if grouped else 0) for _, batch in items]
        if preserve_order and not _signature_runs_contiguous(sigs):
            return None
        order, by_sig = [], {}
        for (n, batch), s in zip(items, sigs):
            if s not in by_sig:
                by_sig[s] = {"batches": [], "ns": []}
                order.append(s)
            e = by_sig[s]
            e["batches"].append(batch)
            e["ns"].extend(list(n) if grouped else [n])
        out = []
        for s in order:
            e = by_sig[s]
            if self.mesh is not None:
                stack = self._stack_on_mesh(e["batches"], grouped)
            elif grouped:
                stack = jax.tree_util.tree_map(
                    lambda *ls: jnp.concatenate(ls, axis=0), *e["batches"])
            else:
                stack = jax.tree_util.tree_map(
                    lambda *ls: jnp.stack(ls), *e["batches"])
            out.append({"stack": stack, "ns": np.asarray(e["ns"], np.int64)})
        return out

    def _stack_on_mesh(self, batches, grouped):
        """Stack mesh-sharded staged batches into ONE [K, B, ...] stack
        whose scan axis is replicated and batch axis keeps its mesh
        sharding (P(None, data, ...)) — parallel.stack_on_mesh, the
        device-side consolidation for whole-epoch scan replay under a
        mesh (grouped entries are already [k, B, ...] stacks and
        concatenate instead)."""
        return parallel.stack_on_mesh(batches, self.mesh, concat=grouped)

    def _staged(self, batches, buffer_size=None, count_fn=None, put=None):
        """Iterate ``batches`` with up to ``buffer_size`` (default
        ``self.prefetch``) device transfers in flight: a producer thread
        drains the (possibly slow) batch iterator and submits each batch's
        ``_put`` to a small thread pool, so padding + host->device
        transfers overlap BOTH the loader and the device executing earlier
        steps. This replaces the depth-2 single-threaded feed (and the
        tf.data prefetch the reference delegated to,
        reference: lidbox/data/steps.py:803-818); on a high-latency feed
        link the K-deep pipeline hides up to K round-trips.

        Yields ``(n, staged_batch)`` with ``n`` the true (unpadded) batch
        size as given by ``count_fn`` (default: len of ``batch["target"]``).
        """
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor
        if buffer_size is None:
            buffer_size = self.prefetch
        buffer_size = max(1, buffer_size)
        if count_fn is None:
            count_fn = self._batch_rows
        if put is None:
            put = self._put
        # the bounded queue holds futures: the producer races ahead
        # starting up to buffer_size transfers while the main thread
        # dispatches steps on already-arrived batches
        q = queue.Queue(maxsize=buffer_size)
        done = object()
        err = []
        stop = threading.Event()
        pool = ThreadPoolExecutor(max_workers=min(buffer_size, 4),
                                  thread_name_prefix="lidbox-stage")

        def _put_or_stop(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                it = batches() if callable(batches) else batches
                for b in it:
                    if not _put_or_stop((count_fn(b), pool.submit(put, b))):
                        return  # consumer closed early (e.g. steps_per_epoch)
            except BaseException as e:
                err.append(e)
            finally:
                _put_or_stop(done)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    if err:
                        raise err[0]
                    return
                n, fut = item
                yield n, fut.result()
        finally:
            stop.set()
            # drain the queue so a producer blocked in q.put wakes now
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            # cancel_futures: queued-but-unstarted transfers must not run —
            # on a serializing feed link dead device_puts would delay the
            # next consumer (e.g. validation staging) by up to
            # buffer_size transfer times
            pool.shutdown(wait=False, cancel_futures=True)
            # bounded join: the abandoned producer must stop pulling the
            # loader before the next consumer reuses it (an epoch-2
            # cache-file writer interleaving with epoch 1's still-running
            # pass corrupts the cache). Bounded so one wedged transfer
            # cannot hang the close path.
            t.join(timeout=10.0)
            if t.is_alive():
                logger.warning("staging producer did not stop within 10 s "
                               "(wedged transfer?); continuing without it")
            # detach the pool's worker threads from concurrent.futures'
            # atexit join, so a transfer wedged on a dead link cannot hang
            # PROCESS EXIT (the producer is daemon for the same reason);
            # private API, so best-effort
            try:
                from concurrent.futures import thread as _cf_thread
                for worker in pool._threads:
                    _cf_thread._threads_queues.pop(worker, None)
            except Exception:
                pass

    def _agreed_cache_budget(self):
        """The cache_staged HBM budget, agreed across processes under a
        process-spanning mesh (min over hosts): the cache/stream decision
        gates collective steps, so hosts reading different local memory
        stats must not diverge."""
        budget = _cache_budget_bytes(self.cache_bytes_limit)
        if parallel.mesh_spans_processes(self.mesh):
            from jax.experimental import multihost_utils
            vals = np.asarray(multihost_utils.process_allgather(
                np.float64(budget))).ravel()
            budget = float(np.min(vals))
        return budget

    def _multiprocess_feed(self):
        """True when this trainer's jitted steps are CROSS-HOST
        collectives (mesh spanning >1 process) — the only case where feeds
        assemble process-locally and need the feed-parity guard. Never
        gate on bare ``jax.process_count()``: a mesh-less (or
        process-local-mesh) trainer inside a multi-process job runs purely
        local steps, and injecting the guard's allgather there would
        deadlock against processes not running the same loop."""
        return parallel.mesh_spans_processes(self.mesh)

    def _feed_parity_guard(self, source, what="training"):
        """Fail fast on uneven multi-host feeds (VERDICT r3 next-step #4).

        Every jitted step under a multi-process mesh is a collective: if
        one process's loader yields more batches than another's, its extra
        step blocks forever against hosts that already left the loop — a
        classic SPMD hang surfacing as a timeout with no diagnostic.
        Before each step, all processes therefore agree whether EVERY host
        still has a batch AND on a digest of the batch's pytree structure
        + global leaf shapes/dtypes (one 2-scalar allgather per step over
        DCN, ~100 us class); a mismatch raises the same descriptive error
        on every process instead of hanging. All processes must feed the
        same number of STRUCTURALLY IDENTICAL batches per epoch — pad or
        truncate local corpora to a common batch count (meta.utils
        over/undersampling, or masked pad batches) to satisfy this.
        """
        from jax.experimental import multihost_utils
        it = iter(source)
        step = 0
        try:
            while True:
                try:
                    item = next(it)
                    have = 1
                except StopIteration:
                    item, have = None, 0
                pair = np.asarray(multihost_utils.process_allgather(
                    np.int64([have, _structure_digest(item) if have
                              else 0]))).reshape(-1, 2)
                flags, digests = pair[:, 0], pair[:, 1]
                if flags.min() != flags.max():
                    exhausted = [str(i) for i, f in enumerate(flags) if not f]
                    feeding = [str(i) for i, f in enumerate(flags) if f]
                    raise RuntimeError(
                        f"uneven multi-host {what} feed: after {step} "
                        f"batches, process(es) {', '.join(exhausted)} ran "
                        f"out while process(es) {', '.join(feeding)} still "
                        "have batches. Every process must yield the same "
                        "number of batches per epoch — pad or truncate the "
                        "local corpora to a common batch count (without "
                        "this check the extra step would hang in a "
                        "collective with no diagnostic).")
                if have and digests.min() != digests.max():
                    raise RuntimeError(
                        f"divergent multi-host {what} feed: at batch "
                        f"{step} the staged batch's pytree structure or "
                        "leaf shapes/dtypes differ across processes "
                        f"(digests {digests.tolist()}). All hosts must "
                        "stage structurally identical batches — e.g. a "
                        "padding mask present on one host but absent on "
                        "another, or unequal local batch sizes, would "
                        "hang the collective step with no diagnostic.")
                if not have:
                    return
                yield item
                step += 1
        finally:
            if hasattr(it, "close"):
                it.close()

    def fit(self, train_batches, validation_batches=None, epochs=1,
            steps_per_epoch=None, verbose=True, cache_staged=None,
            cache_shuffle=True, steps_per_dispatch=1):
        """Run the training loop.

        ``train_batches``/``validation_batches`` are callables returning an
        iterable of batch dicts (numpy) with keys ``input`` [B, T, F],
        ``target`` [B] and optional ``input_mask``/``example_mask`` — or
        plain re-iterable collections.

        ``steps_per_dispatch=K`` groups K consecutive same-shape batches
        into ONE staged transfer and ONE jitted program running K train
        steps (lax.scan) — on a serializing high-RTT feed link this
        amortizes the per-step transfer + dispatch rounds K-fold with
        per-step numerics identical to single dispatches (the fused signal
        path's grouped dispatch, on_device.fit_signals, lifted to the
        feature-fed path). Under a mesh the stack's scan axis is
        replicated and the batch axis sharded (stacked_batch_sharding);
        process-spanning meshes feed per-host local slices exactly like
        single dispatches.

        ``cache_staged`` (default: the Trainer's setting) keeps every
        staged training AND validation batch device-resident after epoch 1
        and reuses them for later epochs — no feed traffic, at the cost of
        FREEZING both sets to their epoch-1 contents (loaders that shuffle
        or rotate per epoch are only consulted once) and pinning them in
        HBM for the whole run. The cached batches are consolidated into
        per-shape stacks — mesh-sharded stacks under a mesh
        (_stack_on_mesh) — and every later epoch replays each stack in ONE
        XLA program (_replay_train_step: one dispatch + one loss-vector
        readback per epoch instead of one round per step). ``cache_shuffle``
        (default True) re-permutes the cached BATCH ORDER each epoch
        (seeded, batch-granular — the within-batch grouping stays fixed,
        and with multiple shape stacks the permutation is within-stack
        plus stack order), recovering most of the optimization benefit of
        per-epoch reshuffling at zero feed cost.
        ``cache_shuffle="rows"`` re-draws batch COMPOSITION too: each
        epoch permutes the K*B cached example ROWS across batches inside
        the replay scan (_replay_rows_train_step, a leading-axis gather —
        no feed traffic, no permuted HBM copy), matching the reference's
        per-epoch element reshuffle exactly within each shape stack
        (reference: lidbox/data/steps.py:997-999; rows cannot cross shape
        stacks, and if interleaved shapes force the per-entry fallback
        the shuffle degrades to batch-order). A
        ``steps_per_epoch``-truncated first epoch does not populate the
        cache. An HBM guard accounts staged bytes against the device's
        memory budget (``cache_bytes_limit``, default auto-detected from
        device memory stats; see _cache_budget_bytes) and falls back to
        the streaming feed with a warning — instead of an opaque XLA OOM
        during consolidation — when 2x the staged corpus (the
        consolidation transient) would not fit.
        """
        if self.state is None:
            self.create_state()
        self._refresh_step_fns()  # pick up post-construction config edits
        # a fresh fit() starts training anew even if a previous fit on this
        # trainer was stopped early (Keras resets the flag on fit entry —
        # without this a reused trainer silently trains zero epochs)
        self.stop_training = False
        if cache_staged is None:
            cache_staged = self.cache_staged
        spd = max(1, int(steps_per_dispatch))
        staged_cache = None
        val_staged = None  # staged validation batches, cached alongside
        #                    (False = tried, didn't fit the HBM budget)
        cached_bytes = 0  # staged-cache HBM accounting (see cache guard)
        cache_budget = None  # resolved lazily on first cached batch
        for cb in self.callbacks:
            cb.on_train_begin(self)
        history = []
        for epoch in range(self.initial_epoch + 1, epochs + 1):
            if self.stop_training:
                break
            for cb in self.callbacks:
                cb.on_epoch_begin(self, epoch)
            meter = ThroughputMeter()
            losses = []
            if staged_cache is not None:
                collecting = None
            else:
                batches = (train_batches() if callable(train_batches)
                           else train_batches)
                if spd > 1:
                    source = self._staged(
                        self._grouped_batches(batches, spd,
                                              limit=steps_per_epoch),
                        count_fn=lambda g: [self._batch_rows(b) for b in g],
                        put=self._put_group)
                else:
                    source = self._staged(batches)
                if self._multiprocess_feed():
                    # multi-host: agree on feed exhaustion before every
                    # step; uneven local corpora raise instead of hanging
                    source = self._feed_parity_guard(source)
                # a steps_per_epoch-truncated epoch can never populate the
                # cache (see docstring) — don't pin its batches in HBM
                # only to discard the list at truncation
                collecting = ([] if cache_staged and steps_per_epoch is None
                              else None)
            truncated = False
            if staged_cache is not None:
                # cached replay
                rng_epoch = np.random.default_rng(RANDOM_SEED + epoch)
                is_stacks = (bool(staged_cache)
                             and isinstance(staged_cache[0], dict)
                             and "stack" in staged_cache[0])
                if is_stacks:
                    # whole-epoch scan: ONE dispatch + ONE loss-vector
                    # readback per shape stack per epoch
                    n_groups = len(staged_cache)
                    gorder = (rng_epoch.permutation(n_groups) if cache_shuffle
                              else np.arange(n_groups))
                    for gi in gorder:
                        g = staged_cache[gi]
                        K = len(g["ns"])
                        # order/idx cross as HOST values: under a
                        # process-spanning mesh a committed local array
                        # would need an implicit cross-host reshard; numpy
                        # inputs are uncommitted and place wherever the
                        # compiled program wants them (same on every host —
                        # the permutation is seeded by epoch)
                        if cache_shuffle == "rows":
                            B = int(jax.tree_util.tree_leaves(
                                g["stack"])[0].shape[1])
                            idx = rng_epoch.permutation(K * B).reshape(K, B)
                            self.state, loss_k = \
                                self._jit_replay_rows_train_step(
                                    self.state, g["stack"], self.rng,
                                    np.asarray(idx, np.int32))
                        else:
                            order = (rng_epoch.permutation(K)
                                     if cache_shuffle else np.arange(K))
                            self.state, loss_k = self._jit_replay_train_step(
                                self.state, g["stack"], self.rng,
                                np.asarray(order, np.int32))
                        losses.append(loss_k)
                        meter.update(int(g["ns"].sum()))
                else:
                    # per-entry replay: the order-exact fallback when
                    # cache_shuffle=False met interleaved shape signatures
                    # (_consolidate_cache returned None)
                    if cache_shuffle:
                        order = rng_epoch.permutation(len(staged_cache))
                        replay = [staged_cache[i] for i in order]
                    else:
                        replay = staged_cache
                    for n, batch in replay:
                        if isinstance(n, (list, tuple)):
                            # grouped entry (steps_per_dispatch stacks)
                            self.state, loss = self._jit_multi_train_step(
                                self.state, batch, self.rng)
                            meter.update(int(sum(n)))
                        else:
                            self.state, loss = self._jit_train_step(
                                self.state, batch, self.rng)
                            meter.update(n)
                        losses.append(loss)
            else:
                steps_done = 0
                try:
                    for n, batch in source:
                        if (steps_per_epoch is not None
                                and steps_done >= steps_per_epoch):
                            truncated = True
                            break
                        if collecting is not None:
                            collecting.append((n, batch))
                            cached_bytes += _tree_device_nbytes(batch)
                            if cache_budget is None:
                                cache_budget = self._agreed_cache_budget()
                            # consolidation transiently holds originals +
                            # stacks, so the guard trips at 2x staged bytes
                            # (stack_on_mesh's bounded-arity fold keeps the
                            # transient within that envelope). With the
                            # feed-parity guard enforcing even multi-host
                            # feeds and the budget agreed (min over hosts),
                            # this decision is host-invariant.
                            if 2.0 * cached_bytes > cache_budget:
                                logger.warning(
                                    "cache_staged: staged corpus (%.0f MB "
                                    "so far, ~2x transient during "
                                    "consolidation) exceeds the HBM budget "
                                    "(%.0f MB) — releasing the cache and "
                                    "streaming every epoch instead",
                                    cached_bytes / 1e6, cache_budget / 1e6)
                                collecting = None
                                cache_staged = False
                                val_staged = False
                        if spd > 1:
                            self.state, loss = self._jit_multi_train_step(
                                self.state, batch, self.rng)
                            steps_done += len(n)
                            meter.update(int(sum(n)))
                        else:
                            self.state, loss = self._jit_train_step(
                                self.state, batch, self.rng)
                            steps_done += 1
                            meter.update(n)
                        losses.append(loss)
                finally:
                    if hasattr(source, "close"):
                        # close the staging generator on EVERY exit (normal,
                        # truncation, or a raising train step): its finally
                        # releases the producer thread, transfer pool, and
                        # the ~prefetch staged batches it holds — an
                        # exception path that skipped this pinned those
                        # device buffers for as long as the traceback lived
                        source.close()
            if collecting is not None and not truncated:
                if not collecting:
                    # freezing an EMPTY epoch-1 cache would make every
                    # later epoch silently train on nothing (fit_signals
                    # raises for the same condition)
                    raise ValueError(
                        "cache_staged: the first epoch produced no "
                        "training batches — train_batches must be a "
                        "callable or re-iterable collection that yields "
                        "at least one batch")
                staged_cache = self._consolidate_cache(
                    collecting, grouped=spd > 1,
                    preserve_order=not cache_shuffle)
                if staged_cache is None:
                    # interleaved shapes + cache_shuffle=False: keep
                    # order-exact per-entry replay
                    staged_cache = collecting
                else:
                    # release the per-batch device buffers NOW — the
                    # stacks hold the cache, and keeping both would
                    # pin ~2x the cached corpus in HBM through the
                    # upcoming validation staging
                    collecting = None
            train_loss = float(np.mean(jax.device_get(jnp.concatenate(
                [jnp.atleast_1d(l) for l in losses])))) \
                if losses else float("nan")
            logs = {"loss": train_loss, **meter.rates(),
                    "learning_rate": self.current_learning_rate()}
            if validation_batches is not None:
                if cache_staged and val_staged is not False:
                    if val_staged is None:
                        vsrc = self._staged(validation_batches)
                        if self._multiprocess_feed():
                            # epoch-1 staging FIXES the per-host batch
                            # count for every later collective eval step —
                            # agree on it now (clear diagnostic) instead
                            # of hanging in epoch 1's evaluate
                            vsrc = self._feed_parity_guard(
                                vsrc, what="validation")
                        entries = list(vsrc)
                        vbytes = sum(_tree_device_nbytes(b)
                                     for _, b in entries)
                        if cache_budget is None:
                            cache_budget = self._agreed_cache_budget()
                        if cached_bytes + 2.0 * vbytes > cache_budget:
                            # the training cache fit but the validation
                            # stacks would push past the budget — keep
                            # the training cache (the bigger win) and
                            # stream validation
                            logger.warning(
                                "cache_staged: staged validation set "
                                "(%.0f MB, ~2x transient) on top of the "
                                "training cache (%.0f MB) exceeds the "
                                "HBM budget (%.0f MB) — streaming "
                                "validation instead",
                                vbytes / 1e6, cached_bytes / 1e6,
                                cache_budget / 1e6)
                            val_staged = False
                            entries = None
                        else:
                            # consolidate into per-shape stacks
                            # (mesh-sharded under a mesh) so every later
                            # evaluate() is one scanned program per stack
                            # (_replay_eval_step) instead of one dispatch
                            # round per batch
                            val_staged = self._consolidate_cache(
                                entries, grouped=False)
                    if val_staged is not False:
                        logs.update(self.evaluate(val_staged, staged=True))
                if not cache_staged or val_staged is False:
                    logs.update(self.evaluate(validation_batches))
            history.append(logs)
            if self.metrics_logger:
                self.metrics_logger.log(epoch, logs)
            if verbose:
                logger.info("epoch %d/%d: %s", epoch, epochs,
                            " ".join(f"{k}={v:.6g}" for k, v in logs.items()))
            for cb in self.callbacks:
                cb.on_epoch_end(self, epoch, logs)
        self.sync_model_variables()
        for cb in self.callbacks:
            cb.on_train_end(self)
        return history

    def evaluate(self, batches, prefix="val_", staged=False):
        """Evaluate ``batches`` (host batch dicts, staged through _put
        unless ``staged=True``, in which case they are (n, batch) pairs
        already on device, or _consolidate_cache stack groups — the
        cache_staged reuse path: each stack evaluates as ONE scanned
        program (_replay_eval_step))."""
        if self.state is None:
            self.create_state()
        self._refresh_step_fns()  # pick up post-construction config edits
        metric_states = {name: m.init_state() for name, m in self.metrics.items()}
        if self.mesh is not None:
            metric_states = parallel.put_replicated(metric_states, self.mesh)
        # Loss accumulates on device (async adds) — one host readback per
        # evaluate() instead of two tunnel round-trips per batch.
        total = count = None
        it = batches() if callable(batches) else batches
        if staged and isinstance(it, (list, tuple)) and it \
                and isinstance(it[0], dict) and "stack" in it[0]:
            # consolidated cached validation: one dispatch per shape stack
            for g in it:
                total_g, count_g, metric_states = self._jit_replay_eval_step(
                    self.state, g["stack"], metric_states)
                total = total_g if total is None else total + total_g
                count = count_g if count is None else count + count_g
        else:
            source = it if staged else self._staged(it)
            if not staged and self._multiprocess_feed():
                # multi-host: eval steps are collectives too — fail fast on
                # uneven local validation corpora instead of hanging
                source = self._feed_parity_guard(source, what="validation")
            try:
                for _, batch in source:
                    loss_sum, n, metric_states = self._jit_eval_step(
                        self.state, batch, metric_states)
                    total = loss_sum if total is None else total + loss_sum
                    count = n if count is None else count + n
            finally:
                if hasattr(source, "close"):
                    source.close()  # release staging on any exit path
        results = {name: metric.result(metric_states[name])
                   for name, metric in self.metrics.items()}
        # one readback per dtype, not one round trip per metric leaf
        results, total, count = _batched_device_get((results, total, count))
        denom = max(float(count) if count is not None else 0.0, 1.0)
        logs = {prefix + "loss": (float(total) if total is not None
                                  else float("nan")) / denom}
        for name, value in results.items():
            logs[prefix + name] = float(value)
        return logs

    def predict(self, batches):
        """Model outputs for every batch, concatenated on the host.
        Transfers pipeline through _staged; each batch's device_get lags
        one step behind dispatch, so the next forward is always queued
        before the host blocks on a readback — pipelined AND bounded
        device memory (at most two result buffers live)."""
        if self.state is None:
            self.create_state()
        self._refresh_step_fns()  # pick up post-construction config edits
        outs = []
        prev = None
        source = self._staged(batches)
        try:
            for n, batch in source:
                out, _ = self._jit_apply_eval(self.state.params,
                                              self.state.batch_stats, batch)
                if prev is not None:
                    outs.append(np.asarray(jax.device_get(prev[1]))[:prev[0]])
                prev = (n, out)
        finally:
            if hasattr(source, "close"):
                source.close()  # release staging on any exit path
        if prev is not None:
            outs.append(np.asarray(jax.device_get(prev[1]))[:prev[0]])
        if not outs:
            raise ValueError(
                "predict() received no batches (empty iterable, or a "
                "one-shot generator that was already consumed)")
        return np.concatenate(outs, axis=0)


def signal_batches_from_dataset(ds, batch_size, drop_remainder=False):
    """Collect element dicts into (signals [B, T], targets [B]) numpy
    pairs for the fused on-device training path (on_device.fit_signals).
    Signals must share one length — chunk in pre_process (the fused chain
    is one statically-shaped XLA program)."""
    def make():
        pending = []
        for x in ds:
            pending.append(x)
            if len(pending) == batch_size:
                yield _finalize(pending)
                pending = []
        if pending and not drop_remainder:
            yield _finalize(pending)

    def _finalize(pending):
        lengths = {np.shape(p["signal"])[0] for p in pending}
        if len(lengths) != 1:
            raise ValueError(
                f"fused training needs equal-length signals, got {sorted(lengths)}; "
                "add pre_process chunks (create_signal_chunks) to the config")
        signals = np.stack([np.asarray(p["signal"], np.float32)
                            for p in pending])
        targets = np.asarray([p["target"] for p in pending], np.int32)
        return signals, targets
    return make


def batches_from_dataset(ds, batch_size, input_key="input", target_key="target",
                         pad_buckets=None, drop_remainder=False,
                         frame_mask=False):
    """Collect element dicts from a Dataset into padded, statically-shaped
    training batches (numpy). Returns a callable for Trainer.fit.

    Ragged time axes are right-padded to ``pad_buckets``; an
    ``input_mask`` [B, T] marks real frames when frame_mask=True.
    """
    def make():
        pending = []
        for x in ds:
            pending.append(x)
            if len(pending) == batch_size:
                yield _finalize(pending)
                pending = []
        if pending and not drop_remainder:
            yield _finalize(pending)

    def _finalize(pending):
        batch = padded_batch(pending, input_key, pad_axis=0, buckets=pad_buckets)
        out = {"input": np.asarray(batch[input_key], np.float32),
               "target": np.asarray(batch[target_key], np.int32)}
        if frame_mask:
            lengths = batch[input_key + "_length"]
            out["input_mask"] = (np.arange(out["input"].shape[1])[None, :]
                                 < lengths[:, None])
        return out
    return make
