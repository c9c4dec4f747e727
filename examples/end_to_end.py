"""
End-to-end example: synthetic 3-language corpus -> config-driven pipeline
-> x-vector training with C_avg -> checkpoints -> embedding extraction ->
PLDA back-end -> classification report.

Run on any backend (CPU works; forces the virtual mesh when no TPU):

    python examples/end_to_end.py
"""
import glob
import os
import sys
import tempfile

# runnable without installation: `python examples/end_to_end.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

if not os.environ.get("LIDBOX_EXAMPLE_TPU"):
    # examples default to the (virtual-mesh) CPU backend so they run fast
    # and deterministically anywhere; set LIDBOX_EXAMPLE_TPU=1 to drive
    # the ambient accelerator instead
    jax.config.update("jax_platforms", "cpu")

import lidbox_tpu.parallel as parallel
from lidbox_tpu import testutil, util
from lidbox_tpu.data import from_steps, steps as steps_mod
from lidbox_tpu.data.pipelines import create_dataset
from lidbox_tpu.embed import sklearn_utils as backend
from lidbox_tpu.features import io as audio_io
from lidbox_tpu.models.model_utils import ModelWrapper
from lidbox_tpu.train import batches_from_dataset

RATE = 16000
LABELS = ["aa", "bb", "cc"]


def make_corpus(root):
    """Synthetic 'languages' = distinct dominant frequencies."""
    rng = np.random.default_rng(0)
    rows = []
    for lang, freq in zip(LABELS, (120, 300, 520)):
        for i in range(10):
            sig = testutil.noisy_sinewave(freq + int(rng.integers(-25, 25)),
                                          RATE, 0.2, 2.0, seed=i)
            path = os.path.join(root, f"{lang}_{i}.wav")
            audio_io.write_mono_wav(path, sig, RATE)
            rows.append((f"{lang}_{i}", path, lang,
                         "train" if i < 7 else "test"))
    return rows


def main():
    workdir = tempfile.mkdtemp(prefix="lidbox_tpu_example_")
    corpus = os.path.join(workdir, "corpus")
    os.makedirs(corpus)
    rows = make_corpus(corpus)

    config = {
        "pre_process": {
            "rms_vad": {"strength": 0.05, "vad_frame_length_ms": 10},
            "chunks": {"length_ms": 1000, "step_ms": 500},
        },
        "features": {"type": "logmelspectrogram",
                     "melspectrogram": {"num_mel_bins": 40},
                     "group_by_input_length": {"max_batch_size": 32}},
        "post_process": {"normalize": {"key": "input"}},
        "experiment": {
            "cache_directory": os.path.join(workdir, "cache"),
            "name": "demo",
            "input_shape": [98, 40], "output_shape": [len(LABELS)],
            "model": {"key": "xvector"},
            "optimizer": {"cls": "Adam", "kwargs": {"learning_rate": 2e-3}},
            "loss": {"cls": "SparseCategoricalCrossentropy"},
            "metrics": [{"cls": "SparseAverageDetectionCost", "N": len(LABELS),
                         "threshold_linspace": {"start": -5.0, "stop": 0.0,
                                                "num": 50}}],
            "callbacks": [{"cls": "ModelCheckpoint",
                           "kwargs": {"monitor": "val_loss", "mode": "min"}}],
            "data": {"train": {"split": "train", "shuffle_buffer_size": 128},
                     "test": {"split": "test"}}},
    }

    def split_ds(split):
        init = {"id": [r[0] for r in rows if r[3] == split],
                "path": [r[1] for r in rows if r[3] == split],
                "label": [r[2] for r in rows if r[3] == split]}
        return from_steps(create_dataset(split, LABELS, init, config))

    train_ds, test_ds = split_ds("train"), split_ds("test")

    mesh = parallel.get_mesh()
    print(f"devices: {mesh.devices.size} x {jax.devices()[0].platform}")
    wrapper = ModelWrapper.from_config(config, mesh=mesh)
    print(f"model: x-vector, {wrapper.count_params():,} params")
    history = wrapper.fit(batches_from_dataset(train_ds, 32),
                          batches_from_dataset(test_ds, 32), epochs=10)
    print("final epoch:", {k: round(v, 4) for k, v in history[-1].items()})

    ckpts = glob.glob(os.path.join(workdir, "cache/xvector/demo/checkpoints/*"))
    print(f"checkpoints: {len(ckpts)}")

    # Embeddings from the best checkpoint, then the PLDA back-end.
    emb_conf = {"cache_directory": os.path.join(workdir, "cache"),
                "model": {"key": "xvector"}, "experiment_name": "demo",
                "input_shape": [98, 40], "output_shape": [len(LABELS)],
                "best_checkpoint": {"monitor": "val_loss", "mode": "min"}}
    emb_train = steps_mod.extract_embeddings(
        train_ds, {"extractors": [emb_conf], "batch_size": 32}).collect()
    emb_test = steps_mod.extract_embeddings(
        test_ds, {"extractors": [emb_conf], "batch_size": 32}).collect()
    label2target = {l: i for i, l in enumerate(LABELS)}

    def as_xy(elems):
        return {"X": np.stack([e["embedding"] for e in elems]),
                "y": np.asarray([label2target[e["label"]] for e in elems])}

    import sklearn.naive_bayes
    pipeline = backend.fit_classifier(
        as_xy(emb_train), as_xy(emb_test), LABELS,
        {"sklearn_experiment": {"cache_directory": os.path.join(workdir, "cache"),
                                "model": {"key": "xvector"}, "name": "demo"}},
        {v: k for k, v in label2target.items()},
        sklearn.naive_bayes.GaussianNB, plot_demo=False)
    preds = backend.predict_with_trained_classifier(
        as_xy(emb_test), None, None, pipeline)
    report = util.classification_report(as_xy(emb_test)["y"], preds, label2target)
    print(f"back-end accuracy: {report['accuracy']:.3f}, "
          f"C_avg: {report['avg_detection_cost']:.3f}")

    # Deployment export: spec+weights plus an AOT StableHLO forward with
    # a SYMBOLIC batch dim (one artifact serves every batch size) —
    # reloaded and checked against the live model.
    from lidbox_tpu import export as export_mod
    deploy = os.path.join(workdir, "deploy")
    export_mod.save_model(wrapper.model, "xvector", deploy,
                          model_kwargs={"num_outputs": len(LABELS)})
    hlo_path = export_mod.export_stablehlo(wrapper.model, deploy)
    fn = export_mod.load_stablehlo(hlo_path)
    x = np.zeros((2, 98, 40), np.float32)
    np.testing.assert_allclose(
        np.asarray(fn(x)),
        np.asarray(wrapper.model.apply(wrapper.model.variables, x,
                                       train=False)),
        rtol=1e-5, atol=1e-6)
    print(f"exported deployment artifacts to {deploy} "
          f"(StableHLO forward verified against the live model)")
    print("done; artifacts in", workdir)


if __name__ == "__main__":
    sys.exit(main())
