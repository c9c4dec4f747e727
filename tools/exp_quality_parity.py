"""
Trained-quality parity: reference Keras x-vector vs the Flax x-vector.

The last BASELINE target ("C_avg parity on a held-out LID eval",
VERDICT r3 next-step #1): formula-level oracles prove the metric/loss
MATH matches, but only a head-to-head TRAINING run can show that
initializer choice, Adam defaults, loss handling and schedule semantics
don't silently cost converged quality. This experiment trains both
stacks to convergence on the same synthetic multi-language corpus and
compares held-out accuracy / min-C_avg / EER over multiple seeds.

Protocols:
  (a) identical pre-extracted features into both stacks with IDENTICAL
      per-epoch batch orders — isolates model/optimizer semantics
      (reference model: /root/reference/lidbox/models/xvector.py:46-66,
      compiled the way keras_utils.from_config does,
      /root/reference/lidbox/models/keras_utils.py:124-149; the
      reference's loss on log-softmax outputs is exactly nll_loss since
      softmax(log_softmax(z)) == softmax(z)).
  (b) each stack extracts its OWN features (reference tf.signal chain
      vs lidbox_tpu.features.extract_features) — catches residual DSP
      drift under training.

Variants on the Flax side attribute any gap:
  flax-default  — package defaults (lecun_normal kernels, adam eps 1e-8)
  flax-matched  — Keras-matched semantics (glorot_uniform kernels,
                  adam eps 1e-7)

Run:  python tools/exp_quality_parity.py [--seeds 3] [--epochs 18]
      [--quick] [--json PATH]
CPU-safe; ~25 min at default sizes on a 1-core host.
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

jax.config.update("jax_platforms", "cpu")

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


def _load_ref(name, relpath):
    """Load a reference module AS PART OF ITS PACKAGE (the features
    modules use relative imports), with its optional audio-IO deps
    stubbed (not installed here; only the pure-TF DSP functions are
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


def features_jax(signals):
    """The lidbox_tpu feature chain (f32 parity mode)."""
    out = []
    for i in range(0, len(signals), 64):
        out.append(np.asarray(F.extract_features(
            jnp.asarray(signals[i:i + 64]), SR, **FEATURE_CONF)))
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


def train_flax(X, y, perms, batch, lr, seed, matched=False):
    import optax
    from lidbox_tpu.train import Trainer
    model = models.create("xvector", X.shape[1:], N_CLASSES)
    model.init(jax.random.PRNGKey(seed))
    if matched:
        variables = dict(model.variables)
        variables["params"] = _reinit_glorot(
            variables["params"], jax.random.PRNGKey(seed + 7))
        model.variables = variables
    eps = 1e-7 if matched else 1e-8  # Keras Adam default is 1e-7
    trainer = Trainer(model, optax.adam(lr, eps=eps), nll_loss,
                      rng=jax.random.PRNGKey(seed))

    state = {"i": 0}

    def feeder():
        perm = perms[state["i"]]
        state["i"] += 1
        return [{"input": X[perm[j:j + batch]],
                 "target": y[perm[j:j + batch]]}
                for j in range(0, len(perm), batch)]

    trainer.fit(feeder, epochs=len(perms), verbose=False)

    def predict(Xt):
        return trainer.predict([{"input": Xt[i:i + 64]}
                                for i in range(0, len(Xt), 64)])
    return predict


def evaluate(predict, Xt, yt):
    scores = np.asarray(predict(Xt))
    label2target = {f"lang{i}": i for i in range(N_CLASSES)}
    report = classification_report(yt, scores, label2target)
    return {"accuracy": float(report["accuracy"]),
            "min_cavg": float(report["avg_detection_cost"]),
            "avg_eer": float(report["avg_equal_error_rate"])}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=18)
    ap.add_argument("--train-per-class", type=int, default=60)
    ap.add_argument("--test-per-class", type=int, default=50)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--quick", action="store_true",
                    help="reduced sizes (slow-test harness)")
    ap.add_argument("--skip-end-to-end", action="store_true",
                    help="protocol (a) only")
    ap.add_argument("--skip-protocol-a", action="store_true",
                    help="protocol (b) only")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.quick:
        args.seeds, args.epochs = 1, 8
        args.train_per_class, args.test_per_class = 24, 24

    t0 = time.time()
    (train_sig, train_y), (test_sig, test_y) = make_corpus(
        args.train_per_class, args.test_per_class, seed=100)
    Xj, Xjt = features_jax(train_sig), features_jax(test_sig)
    results = {"config": vars(args), "protocol_a": [], "protocol_b": []}
    print(f"corpus: {len(train_y)} train / {len(test_y)} test utterances, "
          f"features {Xj.shape[1:]}", flush=True)

    seeds_a = [] if args.skip_protocol_a else range(args.seeds)
    for seed in seeds_a:
        perms = epoch_perms(len(train_y), args.epochs, seed=seed)
        row = {"seed": seed}
        for name, fn in [
                ("keras", lambda: train_keras(Xj, train_y, perms, args.batch,
                                              args.lr, seed)),
                ("flax_default", lambda: train_flax(Xj, train_y, perms,
                                                    args.batch, args.lr,
                                                    seed)),
                ("flax_matched", lambda: train_flax(Xj, train_y, perms,
                                                    args.batch, args.lr,
                                                    seed, matched=True))]:
            t = time.time()
            row[name] = evaluate(fn(), Xjt, test_y)
            row[name]["train_sec"] = round(time.time() - t, 1)
            print(f"  a/seed{seed}/{name}: {row[name]}", flush=True)
        results["protocol_a"].append(row)

    if not args.skip_end_to_end:
        try:
            Xt_tf, Xtt_tf = features_tf(train_sig), features_tf(test_sig)
            drift = float(np.max(np.abs(Xt_tf - Xj)))
            results["feature_drift_max_abs"] = drift
            print(f"feature drift |tf - jax| max: {drift:.2e}", flush=True)
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
                results["protocol_b"].append(row)
        except Exception as e:  # protocol (a) results must still be written
            results["protocol_b_error"] = f"{type(e).__name__}: {e}"
            print(f"protocol (b) failed: {results['protocol_b_error']}",
                  flush=True)

    def summarize(rows, keys):
        out = {}
        for k in keys:
            for metric in ("accuracy", "min_cavg", "avg_eer"):
                vals = [r[k][metric] for r in rows]
                out[f"{k}.{metric}"] = {
                    "mean": round(float(np.mean(vals)), 4),
                    "min": round(float(np.min(vals)), 4),
                    "max": round(float(np.max(vals)), 4)}
        return out

    if results["protocol_a"]:
        results["summary_a"] = summarize(results["protocol_a"],
                                         ["keras", "flax_default",
                                          "flax_matched"])
    if results["protocol_b"]:
        results["summary_b"] = summarize(results["protocol_b"],
                                         ["keras_tf_feats",
                                          "flax_jax_feats"])
    results["wall_sec"] = round(time.time() - t0, 1)
    if "summary_a" in results:
        print(json.dumps(results["summary_a"], indent=2))
    if "summary_b" in results:
        print(json.dumps(results["summary_b"], indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
