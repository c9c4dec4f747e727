"""
Trained-quality receipts: reference Keras x-vector vs the Flax x-vector,
plus the framework's flagship training modes.

Formula-level oracles prove the metric/loss MATH matches; only
head-to-head TRAINING runs show that initializers, Adam defaults, bf16
rounding, the fused augmentation chain, and the cached-feed semantics
don't silently cost converged quality. Sections (select with
``--sections``, comma-separated; results merge into one JSON):

  a       identical pre-extracted features into both stacks with
          IDENTICAL per-epoch batch orders — isolates model/optimizer
          semantics (reference model: lidbox/models/xvector.py:46-66,
          compiled the way keras_utils.from_config does,
          lidbox/models/keras_utils.py:124-149; the reference's loss on
          log-softmax outputs is exactly nll_loss since
          softmax(log_softmax(z)) == softmax(z)). Variants:
          flax_default (lecun_normal, adam eps 1e-8) and flax_matched
          (Keras-matched glorot_uniform, eps 1e-7).
  b       each stack extracts its OWN features (reference tf.signal
          chain vs lidbox_tpu.features.extract_features) — catches
          residual DSP drift under training.
  bf16    the 74%-MFU flagship: compute_dtype=bfloat16 training on
          precision="bf16" features (1-pass matmuls + bf16-stored
          intermediates) vs the f32/highest arm, same seeds and batch
          orders — does the throughput mode cost converged quality?
  aug     the fused on-device augmentation chain (noise bank + random
          resampling + FIR + SpecAugment in ONE XLA program,
          lidbox_tpu.data.on_device; replaces the reference's tf.data
          augmentation, reference: lidbox/data/steps.py:235-368), at
          augment_prob=0.5 (the reference's sample_from_datasets
          clean/augmented interleave) and 2x epochs (step parity with
          the doubled reference-style dataset), trained from raw
          waveforms in two arms — noise-only (apples-to-apples vs the
          reference-style arm) and the full chain — vs (i) clean
          training and (ii) reference-style additive-noise augmentation
          (one offline augmented copy per utterance mixed with the
          reference's own numpy_snr_mixer,
          reference: lidbox/features/audio.py:100-121 — the reference's
          augment_by_additive_noise emits augmented elements alongside
          originals). All arms evaluate on the SAME noise-corrupted
          eval set (corrupted with the reference's numpy_snr_mixer,
          held-out noise clips) and on the clean eval set.
  cached  cache_staged feed semantics vs the streamed
          per-epoch-reshuffled feed (the reference reshuffles elements
          every epoch, reference: lidbox/data/steps.py:997-999): the
          batch-order-only reshuffle (frozen epoch-1 composition,
          cache_shuffle=True) and the row-level recomposition
          (cache_shuffle="rows", the reference's element-level semantics
          inside the replay scan) — does frozen within-batch grouping
          cost quality, and does "rows" recover it?

Every multi-arm section reports PAIRED per-seed deltas with mean and a
95% t-CI (arms share seed, corpus, and batch orders, so pairing removes
the between-seed variance that swamped the round-4 3-seed claim).

Run:  python tools/exp_quality_parity.py [--seeds 5] [--epochs 18]
      [--sections a,b,bf16,aug,cached] [--quick] [--json PATH]
      [--platform cpu|ambient]
CPU-safe; ~1.5 h for all sections at default sizes on a 1-core host.
``--platform ambient`` keeps the environment's JAX backend (the real
TPU under axon) — use it with the Flax-only sections (bf16, cached) to
measure the flagship modes on REAL MXU bf16 rounding rather than the
CPU backend's emulation (docs/quality_parity_tpu.json).
"""
import argparse
import importlib.util
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax

# --platform ambient keeps the environment's JAX backend (the tunneled
# TPU under axon) so the Flax-only sections (bf16, cached) measure REAL
# MXU bf16 rounding instead of the CPU backend's emulation; the default
# pins the deterministic CPU backend (required for the Keras-comparison
# sections' wall-clock sanity — TF runs on CPU either way). Must be
# decided before any backend initializes, hence the argv peek.
_PLATFORM = "cpu"
if "--platform" in sys.argv:
    _PLATFORM = sys.argv[sys.argv.index("--platform") + 1]
else:
    _PLATFORM = next((a.split("=", 1)[1] for a in sys.argv
                      if a.startswith("--platform=")), _PLATFORM)
if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # persistent compile cache: reruns skip the 20-40 s tunnel compiles
    _cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import lidbox_tpu.features as F  # noqa: E402
import lidbox_tpu.models as models  # noqa: E402
from lidbox_tpu import testutil  # noqa: E402
from lidbox_tpu.losses import nll_loss  # noqa: E402
from lidbox_tpu.util import classification_report  # noqa: E402

REF = "/root/reference/lidbox"
N_CLASSES = 4
SR = 16000
FEATURE_CONF = dict(feature_type="logmelspectrogram",
                    melspectrogram={"num_mel_bins": 40})
METRICS = ("accuracy", "min_cavg", "avg_eer")


def _load_ref(name, relpath):
    """Load a reference module AS PART OF ITS PACKAGE (the features
    modules use relative imports), with its optional audio-IO deps
    stubbed (not installed here; only the pure-TF/numpy DSP functions are
    exercised — same approach as tests/test_reference_oracles.py)."""
    import types
    for stub in ("miniaudio", "webrtcvad", "soundfile", "kaldiio"):
        if stub not in sys.modules:
            sys.modules[stub] = types.ModuleType(stub)
    ref_root = os.path.dirname(REF)
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    module = importlib.import_module(
        "lidbox." + relpath[:-len(".py")].replace("/", "."))
    sys.modules[name] = module
    return module


def make_corpus(n_train_per_class, n_test_per_class, seed):
    train = testutil.synthetic_lid_corpus(n_train_per_class, SR, seed=seed)
    test = testutil.synthetic_lid_corpus(n_test_per_class, SR,
                                         seed=seed + 10_000)
    return train, test


def features_jax(signals, precision="highest", stft_method=None):
    """The lidbox_tpu feature chain (f32 parity mode by default;
    precision="bf16" = the 1-pass flagship DSP mode)."""
    kwargs = dict(FEATURE_CONF)
    if stft_method is None:
        stft_method = "matmul" if precision != "highest" else "fft"
    out = []
    for i in range(0, len(signals), 64):
        feats = F.extract_features(jnp.asarray(signals[i:i + 64]), SR,
                                   precision=precision,
                                   stft_method=stft_method, **kwargs)
        out.append(np.asarray(feats.astype(jnp.float32)))
    return np.concatenate(out).astype(np.float32)


def features_tf(signals):
    """The reference tf.signal chain executed from the reference modules:
    power spectrogram -> vendored mel matrix -> log(mel + 1e-6)
    (reference: lidbox/features/audio.py:219-261 +
    lidbox/data/tf_utils.py:178; the intended behavior of the reference's
    melspectrograms dispatcher)."""
    import tensorflow as tf
    ref_audio = _load_ref("ref_audio_qp", "features/audio.py")
    out = []
    for i in range(0, len(signals), 64):
        S = ref_audio.spectrograms(tf.constant(signals[i:i + 64]), SR)
        M = ref_audio.linear_to_mel(S, SR, num_mel_bins=40)
        out.append(np.log(M.numpy() + 1e-6))
    return np.concatenate(out).astype(np.float32)


def epoch_perms(n, epochs, seed):
    rng = np.random.default_rng(seed)
    return [rng.permutation(n) for _ in range(epochs)]


def train_keras(X, y, perms, batch, lr, seed):
    """Reference Keras x-vector compiled as keras_utils.from_config would
    (Adam + cross-entropy on the log-softmax head); per-epoch fit calls
    with pre-shuffled arrays so both stacks see identical batch orders."""
    import tensorflow as tf
    ref_xvec = _load_ref("ref_xvector_qp", "models/xvector.py")
    tf.keras.utils.set_random_seed(seed)
    model = ref_xvec.create(X.shape[1:], N_CLASSES)
    model.compile(
        optimizer=tf.keras.optimizers.Adam(lr),
        loss=tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True))
    for perm in perms:
        model.fit(X[perm], y[perm], batch_size=batch, epochs=1,
                  shuffle=False, verbose=0)

    def predict(Xt):
        return model.predict(Xt, batch_size=64, verbose=0)
    return predict


def _reinit_glorot(params, key):
    """Redraw every kernel with glorot_uniform (the Keras default) over
    the same pytree — the 'matched initializer' variant without touching
    the model code. Biases stay zeros (both frameworks' default)."""
    from flax import traverse_util
    init = jax.nn.initializers.glorot_uniform()
    flat = traverse_util.flatten_dict(params)
    out = {}
    for i, (path, leaf) in enumerate(sorted(flat.items())):
        if path[-1] == "kernel":
            out[path] = init(jax.random.fold_in(key, i), leaf.shape,
                             leaf.dtype)
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)


def _make_trainer(input_shape, lr, seed, matched=False, compute_dtype=None):
    import optax
    from lidbox_tpu.train import Trainer
    model = models.create("xvector", input_shape, N_CLASSES)
    model.init(jax.random.PRNGKey(seed))
    if matched:
        variables = dict(model.variables)
        variables["params"] = _reinit_glorot(
            variables["params"], jax.random.PRNGKey(seed + 7))
        model.variables = variables
    eps = 1e-7 if matched else 1e-8  # Keras Adam default is 1e-7
    return Trainer(model, optax.adam(lr, eps=eps), nll_loss,
                   rng=jax.random.PRNGKey(seed), compute_dtype=compute_dtype)


def _predictor(trainer):
    def predict(Xt):
        return trainer.predict([{"input": Xt[i:i + 64]}
                                for i in range(0, len(Xt), 64)])
    return predict


def train_flax(X, y, perms, batch, lr, seed, matched=False,
               compute_dtype=None):
    trainer = _make_trainer(X.shape[1:], lr, seed, matched=matched,
                            compute_dtype=compute_dtype)
    state = {"i": 0}

    def feeder():
        perm = perms[state["i"]]
        state["i"] += 1
        return [{"input": X[perm[j:j + batch]],
                 "target": y[perm[j:j + batch]]}
                for j in range(0, len(perm), batch)]

    trainer.fit(feeder, epochs=len(perms), verbose=False)
    return _predictor(trainer)


def train_flax_cached(X, y, epochs, batch, lr, seed, shuffle=True,
                      real_replay=False):
    """Flax x-vector trained with cache_staged's feed SEMANTICS.
    ``shuffle=True``: epoch-1 batch COMPOSITION frozen, per-epoch
    batch-order reshuffle only. ``shuffle="rows"``: per-epoch row-level
    recomposition within each shape stack (the reference's element-level
    reshuffle, Trainer._replay_rows_train_step).

    By default the arm STREAMS batches with exactly these composition
    policies instead of running the device replay scan: the replay is
    proven trajectory-identical to streaming the same recomposed batches
    (tests/test_train.py::TestCacheStaged::
    test_cache_shuffle_rows_matches_streamed_recomposition and
    test_fit_trajectory_matches_and_loader_runs_once), and compiling the
    whole-epoch x-vector scan on this 1-core CPU host takes tens of
    minutes per arm — the semantics are what this section measures.
    ``real_replay=True`` (the --platform ambient TPU run, where the scan
    compiles normally) runs the SHIPPED device path instead:
    Trainer.fit(cache_staged=True, cache_shuffle=shuffle)."""
    trainer = _make_trainer(X.shape[1:], lr, seed)
    if real_replay:
        perm = np.random.default_rng(seed).permutation(len(y))
        batches = [{"input": X[perm[j:j + batch]],
                    "target": y[perm[j:j + batch]]}
                   for j in range(0, len(perm), batch)]
        trainer.fit(lambda: list(batches), epochs=epochs, verbose=False,
                    cache_staged=True, cache_shuffle=shuffle)
        return _predictor(trainer)
    perm = np.random.default_rng(seed).permutation(len(y))
    K = -(-len(perm) // batch)
    frozen = [perm[j * batch:(j + 1) * batch] for j in range(K)]
    epoch_no = {"n": 0}

    def feeder():
        epoch_no["n"] += 1
        e = epoch_no["n"]
        if e == 1:
            idxs = frozen
        else:
            rng_e = np.random.default_rng(seed + 1000 * e)
            if shuffle == "rows":
                # rows permute within same-shape stacks (the tail batch
                # is its own stack), stacks in permuted order
                groups = {}
                for bidx in frozen:
                    groups.setdefault(len(bidx), []).append(bidx)
                keys = [list(groups)[i]
                        for i in rng_e.permutation(len(groups))]
                idxs = []
                for k in keys:
                    flat = np.concatenate(groups[k])
                    flat = flat[rng_e.permutation(len(flat))]
                    idxs.extend(flat[j * k:(j + 1) * k]
                                for j in range(len(groups[k])))
            else:
                idxs = [frozen[i] for i in rng_e.permutation(K)]
        return [{"input": X[i], "target": y[i]} for i in idxs]

    trainer.fit(feeder, epochs=epochs, verbose=False)
    return _predictor(trainer)


# -- aug section helpers ------------------------------------------------


def make_noise_clips(n, seconds, seed):
    """Synthetic non-speech noise clips: white noise shaped by a random
    smoothing FIR per clip (each clip gets its own spectral tilt), peak
    level 0.5."""
    rng = np.random.default_rng(seed)
    T = int(SR * seconds)
    clips = []
    for _ in range(n):
        w = rng.normal(size=T + 64).astype(np.float32)
        k = int(rng.integers(2, 32))
        kern = np.hanning(k + 2)[1:-1].astype(np.float32)
        c = np.convolve(w, kern / kern.sum(), mode="same")[:T]
        clips.append((0.5 * c / np.max(np.abs(c))).astype(np.float32))
    return np.stack(clips)


def corrupt_signals_ref(signals, clips, seed, snr_lo=5.0, snr_hi=15.0):
    """Noise-corrupt a signal batch with the REFERENCE's own
    numpy_snr_mixer executed from /root/reference (neutral oracle for the
    eval condition; reference: lidbox/features/audio.py:100-121): per
    utterance, one random clip tiled to length and one SNR ~ U[lo, hi]."""
    ref_audio = _load_ref("ref_audio_qp", "features/audio.py")
    rng = np.random.default_rng(seed)
    out = np.empty_like(signals)
    T = signals.shape[1]
    for i, sig in enumerate(signals):
        noise = np.resize(clips[rng.integers(len(clips))], T)
        snr = float(rng.uniform(snr_lo, snr_hi))
        _, _, mixed = ref_audio.numpy_snr_mixer(
            sig.astype(np.float64), noise.astype(np.float64), snr)
        out[i] = mixed.astype(np.float32)
    return out


def train_flax_fused_aug(train_sig, y, input_shape, epochs, batch, lr, seed,
                         bank, full_chain=True):
    """The flagship fused-augmentation arm: raw waveforms through the
    fused on-device chain (noise bank mix [-> random resampling -> FIR ->
    SpecAugment] in ONE XLA program, on_device.make_augmented_feature_fn)
    with fresh augmentation draws every epoch (fit_signals).

    ``augment_prob=0.5`` reproduces the reference's
    sample_from_datasets([original] + augmented) clean/augmented
    interleaving (reference: lidbox/data/steps.py:215-229). The
    reference-style arm trains on 2N elements per epoch (originals +
    augmented copies), so this arm runs 2*epochs for the same step count
    and the same expected clean/augmented visits per utterance — with
    FRESH noise/SNR draws each epoch where the offline copy is frozen.
    Energy VAD stays off: the synthetic corpus carries no silence and
    the shared eval features are extracted without VAD, so enabling it
    would train on a compacted distribution the eval never shows (an
    experiment-design artifact, not a chain property).
    ``full_chain=False`` leaves only the additive-noise stage — the
    apples-to-apples comparison against train_keras_ref_aug.
    f32/highest DSP so the section isolates AUGMENTATION semantics (the
    bf16 section isolates precision)."""
    from lidbox_tpu.data import on_device
    trainer = _make_trainer(input_shape, lr, seed)
    if full_chain:
        cfg = on_device.AugmentConfig(
            snr_range=(5.0, 20.0), augment_prob=0.5, fir_coefs=10,
            speed_range=(0.9, 1.1),
            specaug_time_masks=2, specaug_freq_masks=2)
    else:
        cfg = on_device.AugmentConfig(snr_range=(5.0, 20.0),
                                      augment_prob=0.5)
    feature_fn = on_device.make_augmented_feature_fn(
        SR, {"type": "logmelspectrogram",
             "melspectrogram": {"num_mel_bins": 40},
             "stft_method": "matmul"}, cfg,
        noise_bank=jnp.asarray(bank),
        noise_lengths=jnp.full((len(bank),), bank.shape[1], jnp.int32))
    rng_perm = np.random.default_rng(seed)

    def batches():
        perm = rng_perm.permutation(len(y))
        for j in range(0, len(perm), batch):
            idx = perm[j:j + batch]
            yield train_sig[idx], y[idx]

    on_device.fit_signals(trainer, feature_fn, batches, epochs=2 * epochs,
                          verbose=False)
    return _predictor(trainer)


def train_keras_ref_aug(train_sig, y, clips, epochs, batch, lr, seed):
    """Reference-style augmentation arm: the corpus plus ONE offline
    augmented copy per utterance (the reference's
    augment_by_additive_noise emits augmented elements alongside
    originals, reference: lidbox/data/steps.py:235-328), mixed with the
    reference's own numpy_snr_mixer at SNR ~ U[5, 20] from the TRAINING
    noise clips; features via the shared chain; Keras training."""
    ref_audio = _load_ref("ref_audio_qp", "features/audio.py")
    rng = np.random.default_rng(seed + 5000)
    T = train_sig.shape[1]
    aug = np.empty_like(train_sig)
    for i, sig in enumerate(train_sig):
        noise = np.resize(clips[rng.integers(len(clips))], T)
        snr = float(rng.uniform(5.0, 20.0))
        _, _, mixed = ref_audio.numpy_snr_mixer(
            sig.astype(np.float64), noise.astype(np.float64), snr)
        aug[i] = mixed.astype(np.float32)
    X2 = features_jax(np.concatenate([train_sig, aug]))
    y2 = np.concatenate([y, y])
    perms = epoch_perms(len(y2), epochs, seed)
    return train_keras(X2, y2, perms, batch, lr, seed)


# -- evaluation + statistics ---------------------------------------------


def evaluate(predict, Xt, yt):
    scores = np.asarray(predict(Xt))
    label2target = {f"lang{i}": i for i in range(N_CLASSES)}
    report = classification_report(yt, scores, label2target)
    return {"accuracy": float(report["accuracy"]),
            "min_cavg": float(report["avg_detection_cost"]),
            "avg_eer": float(report["avg_equal_error_rate"])}


def paired_delta(rows, arm, base, metrics=METRICS, get=None):
    """Per-seed paired deltas arm - base with mean and a 95% t-CI.
    ``get(row, name, metric)`` extracts a metric (default: row[name][m]).
    Pairing (same seed/corpus/batch orders in both arms) removes the
    between-seed variance, so the CI bounds |delta| directly."""
    if get is None:
        def get(row, name, m):
            return row[name][m]
    out = {}
    for m in metrics:
        d = np.asarray([get(r, arm, m) - get(r, base, m) for r in rows],
                       np.float64)
        n = len(d)
        entry = {"deltas": [round(float(x), 4) for x in d],
                 "mean": round(float(d.mean()), 4)}
        if n > 1:
            from scipy import stats
            half = float(stats.t.ppf(0.975, n - 1) * d.std(ddof=1)
                         / np.sqrt(n))
            entry["ci95"] = [round(float(d.mean() - half), 4),
                             round(float(d.mean() + half), 4)]
        out[m] = entry
    return out


def summarize(rows, keys):
    out = {}
    for k in keys:
        for metric in METRICS:
            vals = [r[k][metric] for r in rows]
            out[f"{k}.{metric}"] = {
                "mean": round(float(np.mean(vals)), 4),
                "min": round(float(np.min(vals)), 4),
                "max": round(float(np.max(vals)), 4)}
    return out


def _write(results, path):
    if not path:
        return
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--aug-seeds", type=int, default=3,
                    help="seeds for the (slower) aug section")
    ap.add_argument("--epochs", type=int, default=18)
    ap.add_argument("--train-per-class", type=int, default=60)
    ap.add_argument("--test-per-class", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--sections", default="a,b,bf16,aug,cached")
    ap.add_argument("--platform", choices=("cpu", "ambient"), default="cpu",
                    help="ambient = keep the environment's JAX backend "
                         "(real TPU under axon) for the Flax-only "
                         "sections; consumed at import time")
    ap.add_argument("--quick", action="store_true",
                    help="reduced sizes (slow-test harness)")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.quick:
        args.seeds, args.aug_seeds, args.epochs = 1, 1, 8
        args.train_per_class, args.test_per_class = 24, 24
    sections = {s.strip() for s in args.sections.split(",") if s.strip()}

    t0 = time.time()
    results = {}
    if args.json and os.path.exists(args.json):
        with open(args.json) as f:
            results = json.load(f)  # merge: sections accumulate
    results["config"] = vars(args)

    (train_sig, train_y), (test_sig, test_y) = make_corpus(
        args.train_per_class, args.test_per_class, seed=100)
    Xj, Xjt = features_jax(train_sig), features_jax(test_sig)
    print(f"corpus: {len(train_y)} train / {len(test_y)} test utterances, "
          f"features {Xj.shape[1:]}, sections {sorted(sections)}",
          flush=True)

    # ---- section a: shared features, Keras vs Flax ---------------------
    if "a" in sections:
        rows = []
        for seed in range(args.seeds):
            perms = epoch_perms(len(train_y), args.epochs, seed=seed)
            row = {"seed": seed}
            for name, fn in [
                    ("keras", lambda: train_keras(Xj, train_y, perms,
                                                  args.batch, args.lr, seed)),
                    ("flax_default", lambda: train_flax(
                        Xj, train_y, perms, args.batch, args.lr, seed)),
                    ("flax_matched", lambda: train_flax(
                        Xj, train_y, perms, args.batch, args.lr, seed,
                        matched=True))]:
                t = time.time()
                row[name] = evaluate(fn(), Xjt, test_y)
                row[name]["train_sec"] = round(time.time() - t, 1)
                print(f"  a/seed{seed}/{name}: {row[name]}", flush=True)
            rows.append(row)
        results["protocol_a"] = rows
        results["summary_a"] = summarize(rows, ["keras", "flax_default",
                                                "flax_matched"])
        results["summary_a"]["paired_delta_flax_default_vs_keras"] = \
            paired_delta(rows, "flax_default", "keras")
        results["summary_a"]["paired_delta_flax_matched_vs_keras"] = \
            paired_delta(rows, "flax_matched", "keras")
        _write(results, args.json)

    # ---- section b: each stack's own features ---------------------------
    if "b" in sections:
        try:
            Xt_tf, Xtt_tf = features_tf(train_sig), features_tf(test_sig)
            results["feature_drift_max_abs"] = float(
                np.max(np.abs(Xt_tf - Xj)))
            print(f"feature drift |tf - jax| max: "
                  f"{results['feature_drift_max_abs']:.2e}", flush=True)
            rows = []
            for seed in range(args.seeds):
                perms = epoch_perms(len(train_y), args.epochs, seed=seed)
                row = {"seed": seed}
                row["keras_tf_feats"] = evaluate(
                    train_keras(Xt_tf, train_y, perms, args.batch, args.lr,
                                seed), Xtt_tf, test_y)
                row["flax_jax_feats"] = evaluate(
                    train_flax(Xj, train_y, perms, args.batch, args.lr,
                               seed), Xjt, test_y)
                print(f"  b/seed{seed}: {row}", flush=True)
                rows.append(row)
            results["protocol_b"] = rows
            results["summary_b"] = summarize(rows, ["keras_tf_feats",
                                                    "flax_jax_feats"])
            results["summary_b"]["paired_delta_flax_vs_keras"] = \
                paired_delta(rows, "flax_jax_feats", "keras_tf_feats")
        except Exception as e:  # other sections must still be written
            results["protocol_b_error"] = f"{type(e).__name__}: {e}"
            print(f"protocol (b) failed: {results['protocol_b_error']}",
                  flush=True)
        _write(results, args.json)

    # ---- section bf16: the 74%-MFU flagship vs f32 ----------------------
    if "bf16" in sections:
        Xb = features_jax(train_sig, precision="bf16")
        Xbt = features_jax(test_sig, precision="bf16")
        results["bf16_feature_delta_max_abs"] = float(
            np.max(np.abs(Xb - features_jax(train_sig, precision="highest",
                                            stft_method="matmul"))))
        print(f"bf16 feature delta vs highest: "
              f"{results['bf16_feature_delta_max_abs']:.2e}", flush=True)
        rows = []
        for seed in range(args.seeds):
            perms = epoch_perms(len(train_y), args.epochs, seed=seed)
            row = {"seed": seed}
            for name, fn in [
                    ("flax_f32", lambda: train_flax(
                        Xj, train_y, perms, args.batch, args.lr, seed)),
                    ("flax_bf16", lambda: train_flax(
                        Xb, train_y, perms, args.batch, args.lr, seed,
                        compute_dtype=jnp.bfloat16))]:
                Xeval = Xjt if name == "flax_f32" else Xbt
                t = time.time()
                row[name] = evaluate(fn(), Xeval, test_y)
                row[name]["train_sec"] = round(time.time() - t, 1)
                print(f"  bf16/seed{seed}/{name}: {row[name]}", flush=True)
            rows.append(row)
        results["flagship_bf16"] = rows
        results["summary_bf16"] = summarize(rows, ["flax_f32", "flax_bf16"])
        results["summary_bf16"]["paired_delta_bf16_vs_f32"] = \
            paired_delta(rows, "flax_bf16", "flax_f32")
        _write(results, args.json)

    # ---- section aug: fused config-5 chain vs clean vs reference-style --
    if "aug" in sections:
        train_bank = make_noise_clips(12, 4.0, seed=777)
        eval_clips = make_noise_clips(12, 4.0, seed=888)  # held-out noise
        test_noisy = corrupt_signals_ref(test_sig, eval_clips, seed=999)
        Xjt_noisy = features_jax(test_noisy)
        rows = []
        for seed in range(args.aug_seeds):
            perms = epoch_perms(len(train_y), args.epochs, seed=seed)
            row = {"seed": seed}
            for name, fn in [
                    ("flax_clean", lambda: train_flax(
                        Xj, train_y, perms, args.batch, args.lr, seed)),
                    ("flax_noise_aug", lambda: train_flax_fused_aug(
                        train_sig, train_y, Xj.shape[1:], args.epochs,
                        args.batch, args.lr, seed, train_bank,
                        full_chain=False)),
                    ("flax_fused_aug", lambda: train_flax_fused_aug(
                        train_sig, train_y, Xj.shape[1:], args.epochs,
                        args.batch, args.lr, seed, train_bank)),
                    ("keras_ref_aug", lambda: train_keras_ref_aug(
                        train_sig, train_y, train_bank, args.epochs,
                        args.batch, args.lr, seed))]:
                t = time.time()
                predict = fn()
                row[name] = {
                    "noisy": evaluate(predict, Xjt_noisy, test_y),
                    "clean": evaluate(predict, Xjt, test_y),
                    "train_sec": round(time.time() - t, 1)}
                print(f"  aug/seed{seed}/{name}: {row[name]}", flush=True)
            rows.append(row)
        results["augmented"] = rows

        def get_eval(cond):
            def get(row, name, m):
                return row[name][cond][m]
            return get
        results["summary_aug"] = {
            cond: {
                f"{k}.{m}": {
                    "mean": round(float(np.mean(
                        [r[k][cond][m] for r in rows])), 4),
                    "min": round(float(np.min(
                        [r[k][cond][m] for r in rows])), 4),
                    "max": round(float(np.max(
                        [r[k][cond][m] for r in rows])), 4)}
                for k in ("flax_clean", "flax_noise_aug", "flax_fused_aug",
                          "keras_ref_aug")
                for m in METRICS}
            for cond in ("noisy", "clean")}
        for cond in ("noisy", "clean"):
            results["summary_aug"][cond]["paired_delta_noise_vs_ref_aug"] = \
                paired_delta(rows, "flax_noise_aug", "keras_ref_aug",
                             get=get_eval(cond))
            results["summary_aug"][cond]["paired_delta_fused_vs_clean"] = \
                paired_delta(rows, "flax_fused_aug", "flax_clean",
                             get=get_eval(cond))
            results["summary_aug"][cond]["paired_delta_fused_vs_ref_aug"] = \
                paired_delta(rows, "flax_fused_aug", "keras_ref_aug",
                             get=get_eval(cond))
        _write(results, args.json)

    # ---- section cached: frozen-composition cache_staged vs streamed ----
    if "cached" in sections:
        rows = []
        for seed in range(args.seeds):
            perms = epoch_perms(len(train_y), args.epochs, seed=seed)
            row = {"seed": seed}
            for name, fn in [
                    ("streamed", lambda: train_flax(
                        Xj, train_y, perms, args.batch, args.lr, seed)),
                    ("cached_frozen", lambda: train_flax_cached(
                        Xj, train_y, args.epochs, args.batch, args.lr,
                        seed, real_replay=args.platform != "cpu")),
                    ("cached_rows", lambda: train_flax_cached(
                        Xj, train_y, args.epochs, args.batch, args.lr,
                        seed, shuffle="rows",
                        real_replay=args.platform != "cpu"))]:
                t = time.time()
                row[name] = evaluate(fn(), Xjt, test_y)
                row[name]["train_sec"] = round(time.time() - t, 1)
                print(f"  cached/seed{seed}/{name}: {row[name]}", flush=True)
            rows.append(row)
        results["cached_feed"] = rows
        results["summary_cached"] = summarize(
            rows, ["streamed", "cached_frozen", "cached_rows"])
        results["summary_cached"]["paired_delta_cached_vs_streamed"] = \
            paired_delta(rows, "cached_frozen", "streamed")
        results["summary_cached"]["paired_delta_rows_vs_streamed"] = \
            paired_delta(rows, "cached_rows", "streamed")
        _write(results, args.json)

    results["wall_sec"] = round(time.time() - t0, 1)
    for key in ("summary_a", "summary_b", "summary_bf16", "summary_aug",
                "summary_cached"):
        if key in results:
            print(key, json.dumps(results[key], indent=2), flush=True)
    _write(results, args.json)


if __name__ == "__main__":
    main()
