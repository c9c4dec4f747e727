"""
High-level API: prediction, chunk merging, classification reports
(reference: lidbox/util.py).
"""
import numpy as np
import pandas as pd
import sklearn.metrics

import jax
import jax.numpy as jnp

import lidbox_tpu.data.steps as data_steps
from lidbox_tpu.data.dataset import padded_batch
from lidbox_tpu.meta.utils import set_unique_index as _set_unique_index
from lidbox_tpu.metrics import SparseAverageDetectionCost
from lidbox_tpu.metrics import equal_error_rate as metrics_eer


def predictions_to_dataframe(ids, predictions):
    """(reference: util.py:17-20)"""
    return _set_unique_index(
        pd.DataFrame.from_dict({"id": ids, "prediction": predictions})).sort_index()


def make_batch_predict_fn(model, batch_size=32, mesh=None, compute_dtype=None,
                          apply_kwargs=None, score_fn=None, stage_dtype=None):
    """Jitted ``(inputs [B, T, F], frame_mask) -> outputs [B, ...]`` forward
    (``apply_kwargs`` forwards extra model.apply options, e.g.
    ``{"output": "embedding"}``). ``score_fn`` post-maps raw outputs to
    per-class scores inside the same jit program — language-vector models
    (ap_lstm) pass ``AngularProximity.predict`` so every downstream
    consumer (C_avg, reports, Classifier) sees [B, N] scores.

    With a ``mesh``, inference runs data-parallel: parameters are
    replicated across the mesh, every batch is zero-padded to
    ``batch_size`` (one compiled program, no retraces on ragged tails;
    larger inputs are processed in ``batch_size`` chunks) and sharded over
    the batch axis, and only the valid rows are returned — multi-chip
    serving from the same API as single-chip (no reference analogue: its
    device placement was a per-step tf.device string,
    lidbox/data/steps.py:115-122). The mesh mode caches the replicated
    device copy keyed on the identities of every variable LEAF, so both
    wholesale replacement (checkpoint restore) and in-place mutation of
    nested entries are picked up; ``predict_fn.refresh()`` force-drops the
    cache for callers that mutate array buffers in place.

    ``stage_dtype`` (e.g. ``"bfloat16"``) compresses float inputs on the
    host before the device transfer and upcasts at the device edge — half
    the feed bytes whenever host->device bandwidth (PCIe, or a tunneled
    chip) bounds inference/extraction rather than the device (the serving
    analogue of Trainer's ``stage_dtype``). Outputs differ from the f32
    feed only by the input rounding; leave None for exact-parity serving.
    """
    kwargs = dict(apply_kwargs or {})
    if compute_dtype is not None:
        kwargs["compute_dtype"] = compute_dtype
    post = (lambda out: out) if score_fn is None else score_fn
    _stage_np = None
    if stage_dtype is not None:
        _stage_np = np.dtype(jnp.dtype(stage_dtype))
        if not jnp.issubdtype(_stage_np, jnp.floating):
            raise ValueError(f"stage_dtype must be floating, got {stage_dtype!r}"
                             " (integer PCM staging is a waveform-path "
                             "feature: on_device.stage_signals)")

    def _compress(inputs):
        # host-side: halve the transfer; the jitted forward upcasts at the
        # device edge (model-path numerics stay in compute_dtype/f32)
        if _stage_np is not None and np.issubdtype(
                np.asarray(inputs).dtype, np.floating):
            return np.asarray(inputs).astype(_stage_np)
        return inputs

    def _decompress(x):
        # compute_dtype set: model.apply casts the input itself
        if compute_dtype is None and jnp.issubdtype(x.dtype, jnp.floating) \
                and x.dtype != jnp.float32:
            return x.astype(jnp.float32)
        return x

    apply_jit = jax.jit(
        lambda variables, x: post(
            model.apply(variables, _decompress(x), train=False, **kwargs)))
    apply_jit_masked = jax.jit(
        lambda variables, x, m: post(
            model.apply(variables, _decompress(x), train=False, mask=m,
                        **kwargs)))
    if mesh is None:
        def predict_fn(inputs, mask=None):
            inputs = _compress(inputs)
            if mask is None:
                out = apply_jit(model.variables, inputs)
            else:
                out = apply_jit_masked(model.variables, inputs, mask)
            return np.asarray(jax.device_get(out))
        predict_fn.refresh = lambda: None  # no cache in single-device mode
        return predict_fn

    from lidbox_tpu import parallel
    assert batch_size % mesh.size == 0, (
        f"batch_size {batch_size} must divide over the {mesh.size}-device mesh")
    import threading
    repl = parallel.replicated(mesh)
    cache = {"leaves": None, "device": None}  # re-put only when weights change
    cache_lock = threading.Lock()  # predict_with_model pipelines callers

    def _variables():
        # keyed on every leaf's IDENTITY, holding references to the keyed
        # leaves: replacing ANY nested entry invalidates the replicated
        # copy, and because the cache keeps the old leaves alive, a freed
        # array's address can never be recycled into a false cache hit
        with cache_lock:
            leaves = jax.tree_util.tree_leaves(model.variables)
            prev = cache["leaves"]
            if (prev is None or len(prev) != len(leaves)
                    or any(a is not b for a, b in zip(prev, leaves))):
                cache["device"] = jax.device_put(model.variables, repl)
                cache["leaves"] = leaves
            return cache["device"]

    def predict_fn(inputs, mask=None):
        inputs = np.asarray(inputs)
        n = inputs.shape[0]
        if n > batch_size:  # chunk oversized batches through the one program
            return np.concatenate(
                [predict_fn(inputs[i:i + batch_size],
                            None if mask is None else mask[i:i + batch_size])
                 for i in range(0, n, batch_size)])
        inputs = _compress(inputs)
        variables = _variables()
        pad = batch_size - n
        inputs = np.pad(inputs, [(0, pad)] + [(0, 0)] * (inputs.ndim - 1))
        x = jax.device_put(inputs, parallel.batch_sharding(mesh))
        if mask is None:
            out = apply_jit(variables, x)
        else:
            # pad rows get an all-True mask: their (discarded) forwards
            # stay finite instead of pooling over zero valid frames
            mask = np.pad(np.asarray(mask), [(0, pad), (0, 0)],
                          constant_values=True)
            m = jax.device_put(mask, parallel.batch_sharding(mesh))
            out = apply_jit_masked(variables, x, m)
        return np.asarray(jax.device_get(out))[:n]

    def refresh():
        cache["leaves"] = cache["device"] = None
    predict_fn.refresh = refresh
    return predict_fn


def predict_with_model(model, ds, predict_fn=None, batch_size=32,
                       pad_buckets=None, mesh=None, score_fn=None):
    """Map a model over all elements of ds (dict elements with ``input``),
    returning an id-indexed prediction DataFrame
    (reference: util.py:23-38, which mapped over GPU-placed batches; here
    the forward is one jit program per shape bucket on the default device,
    or a batch-sharded program over ``mesh`` when given).

    ``model`` is a lidbox_tpu Model (or any callable taking [B, T, F]).
    A custom ``predict_fn`` must accept ``(inputs, frame_mask)`` — the mask
    is non-None when a ragged batch was padded, so stats-pooling models can
    exclude padding frames (masked numerics == unpadded numerics).
    """
    if predict_fn is None:
        predict_fn = make_batch_predict_fn(model, batch_size=batch_size,
                                           mesh=mesh, score_fn=score_fn)
    elif score_fn is not None:
        base_fn = predict_fn
        predict_fn = lambda x, m: np.asarray(
            jax.device_get(score_fn(base_fn(x, m))))

    # 2-deep batch pipeline: batch i+1's transfer + forward run on a
    # worker thread while batch i's results come back — on a
    # high-round-trip feed link this overlaps the h2d of the next batch
    # with the d2h readback of the previous one. Results drain in order.
    import collections
    from concurrent.futures import ThreadPoolExecutor
    ids, predictions = [], []
    pool = ThreadPoolExecutor(max_workers=2)
    futures = collections.deque()

    def submit(pending):
        futures.append((pending, pool.submit(_run_batch, pending,
                                             predict_fn, pad_buckets)))
        while len(futures) > 2:
            _drain_one(futures, ids, predictions)

    try:
        pending = []
        for x in ds:
            pending.append(x)
            if len(pending) == batch_size:
                submit(pending)
                pending = []
        if pending:
            submit(pending)
        while futures:
            _drain_one(futures, ids, predictions)
    finally:
        pool.shutdown(wait=False)
    return predictions_to_dataframe(ids, predictions)


def _drain_one(futures, ids, predictions):
    pending, fut = futures.popleft()
    preds = fut.result()
    for p, pred in zip(pending, preds):
        ids.append(str(p["id"]))
        predictions.append(np.asarray(pred))


def _run_batch(pending, predict_fn, pad_buckets):
    lengths = {p["input"].shape[0] for p in pending}
    mask = None
    if len(lengths) == 1:
        inputs = np.stack([p["input"] for p in pending])
    else:
        batch = padded_batch(pending, "input", buckets=pad_buckets)
        inputs = batch["input"]
        mask = (np.arange(inputs.shape[1])[None, :]
                < batch["input_length"][:, None])
    return predict_fn(np.asarray(inputs, np.float32), mask)


def chunk_parent_id(chunk_id):
    """(reference: util.py:41-42)"""
    return chunk_id.rsplit("-", 1)[0]


def stack_and_average(v):
    return np.stack(list(v)).mean(axis=0)


def merge_chunk_predictions(chunk_predictions, merge_rows_fn=None):
    """Group chunk rows by parent utterance id and merge their predictions
    (mean by default) (reference: util.py:47-57)."""
    if merge_rows_fn is None:
        merge_rows_fn = stack_and_average
    ids, predictions = [], []
    for pid, rows in chunk_predictions.groupby(chunk_parent_id):
        ids.append(pid)
        predictions.append(merge_rows_fn(rows.prediction.values))
    return predictions_to_dataframe(ids, predictions)


def classification_report(true_sparse, pred_dense, label2target,
                          dense2sparse_fn=None, num_cavg_thresholds=100,
                          eer_convention="fpr"):
    """sklearn classification report + min C_avg over a threshold grid
    spanning the score range + per-class EER from ROC + confusion matrix
    (reference: util.py:60-105).

    Per-class EER comes from ``metrics.equal_error_rate`` — the ONE EER
    implementation in the package — with ``eer_convention`` forwarded
    (default ``"fpr"``, the reference's fpr-at-closest-ROC-point
    convention; ``"midpoint"`` gives the symmetric (fnr+fpr)/2 estimate)."""
    if dense2sparse_fn is None:
        dense2sparse_fn = lambda pred: pred.argmax(axis=1)
    true_sparse = np.asarray(true_sparse)
    pred_dense = np.asarray(pred_dense)
    pred_sparse = dense2sparse_fn(pred_dense)

    report = sklearn.metrics.classification_report(
        true_sparse, pred_sparse,
        labels=list(range(len(label2target))),
        target_names=list(label2target),
        output_dict=True, zero_division=0)

    thresholds = np.linspace(pred_dense.min(), pred_dense.max(),
                             num_cavg_thresholds)
    cavg = SparseAverageDetectionCost(len(label2target),
                                      tuple(thresholds.tolist()))
    state = cavg.update_sparse(cavg.init_state(), true_sparse, pred_dense)
    report["avg_detection_cost"] = float(jax.device_get(cavg.result(state)))

    true_dense = np.eye(len(label2target))[true_sparse]
    eer = np.zeros(len(label2target))
    for l, label in enumerate(label2target):
        # equal_error_rate returns NaN for a class absent from (or covering
        # all of) the test set — the reference crashed here on nanargmin of
        # an all-NaN ROC; NaN classes are excluded from the average.
        eer[l] = metrics_eer(pred_dense[:, l], true_dense[:, l],
                             convention=eer_convention)
    report["avg_equal_error_rate"] = float(np.nanmean(eer))
    for label, i in label2target.items():
        report[label]["equal_error_rate"] = eer[i]

    # labels= keeps the matrix [N, N] and row i == class i even when a
    # class is absent from the test set (otherwise sklearn shrinks the
    # matrix and rows silently shift to the wrong language)
    report["confusion_matrix"] = sklearn.metrics.confusion_matrix(
        true_sparse, pred_sparse, labels=list(range(len(label2target))))
    return report


def evaluate_testset_with_model(model, test_ds, test_meta, lang2target,
                                score_fn=None):
    """predict + join on metadata + report (reference: util.py:108-119).
    Chunk-level predictions (ids carrying a ``-<chunknum>`` suffix from
    create_signal_chunks / create_input_chunks) are merged back to
    utterance level by averaging, the reference's merge semantics
    (util.py:41-57), before joining on the metadata index. ``score_fn``
    maps raw model outputs to [B, N] class scores first (required for
    language-vector models — pass the AngularProximity loss's
    ``predict``)."""
    utt2pred = predict_with_model(model, test_ds, score_fn=score_fn)
    if (len(utt2pred) and not utt2pred.index.isin(test_meta.index).all()
            and utt2pred.index.map(chunk_parent_id).isin(test_meta.index).all()):
        utt2pred = merge_chunk_predictions(utt2pred)
    test_meta = test_meta.join(utt2pred, how="outer")
    assert not test_meta.isna().any(axis=None), (
        "Failed to join predictions with test_meta: utterance id sets differ")
    true_sparse = test_meta.target.to_numpy(np.int32)
    pred_dense = np.stack(list(test_meta.prediction))
    return classification_report(true_sparse, pred_dense, lang2target)


def model2function(model):
    """Model -> jit-compiled inference callable, the export analogue of the
    reference's concrete tf.function (reference: util.py:122-127). The
    returned function is also AOT-lowerable via ``.lower(x).compile()``."""
    if model.variables is None:
        model.init()
    variables = model.variables
    # honor the Model's configured head and module kwargs: an
    # embedding-extractor Model must export an embedding function, not
    # fall back to the module's default logits head
    kwargs = dict(model.apply_kwargs)
    kwargs["output"] = model.output

    @jax.jit
    def model_fn(x):
        return model.module.apply(variables, x, train=False, **kwargs)
    return model_fn


def standard_scaler(dataset, axis=0, key="input"):
    """Dataset-level standardization closure from two-pass float64 moments
    (reference: util.py:130-146)."""
    _, means, variances = data_steps.unstable_reduce_features_mean_variance(
        dataset, axis=axis, key=key)
    stddevs = np.sqrt(np.maximum(1e-9, variances))

    def scale_dataset(ds):
        def _scale(x):
            scaled = (np.asarray(x[key], np.float64) - means) / stddevs
            return dict(x, **{key: scaled.astype(np.asarray(x[key]).dtype)})
        return ds.map(_scale)
    return scale_dataset
