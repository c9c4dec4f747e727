"""
Trained-quality parity vs the reference Keras x-vector (slow; the last
BASELINE target, "C_avg parity on a held-out LID eval" — VERDICT r3
next-step #1).

A reduced single-seed head-to-head: identical pre-extracted features and
identical per-epoch batch orders into the reference Keras x-vector
(reference: lidbox/models/xvector.py:46-66, compiled per
keras_utils.py:124-149) and the Flax x-vector. The full 3-seed
experiment with the end-to-end-features protocol lives in
tools/exp_quality_parity.py; its results are recorded in
docs/quality_parity.json + docs/performance.md.
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

pytest.importorskip("tensorflow")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_experiment():
    spec = importlib.util.spec_from_file_location(
        "exp_quality_parity", os.path.join(REPO, "tools",
                                           "exp_quality_parity.py"))
    module = importlib.util.module_from_spec(spec)
    sys.modules["exp_quality_parity"] = module
    spec.loader.exec_module(module)
    return module


@pytest.mark.slow
def test_flax_xvector_matches_keras_reference_quality():
    exp = _load_experiment()
    (train_sig, train_y), (test_sig, test_y) = exp.make_corpus(24, 24,
                                                               seed=100)
    X = exp.features_jax(train_sig)
    Xt = exp.features_jax(test_sig)
    perms = exp.epoch_perms(len(train_y), epochs=8, seed=0)
    keras = exp.evaluate(
        exp.train_keras(X, train_y, perms, batch=32, lr=1e-3, seed=0),
        Xt, test_y)
    flax = exp.evaluate(
        exp.train_flax(X, train_y, perms, batch=32, lr=1e-3, seed=0),
        Xt, test_y)
    # the task is mid-difficulty by design: both stacks must learn it...
    assert keras["accuracy"] > 0.5 and flax["accuracy"] > 0.5, (keras, flax)
    # ...and the Flax stack must not trail the reference beyond seed noise
    # (tolerances bracket the measured single-seed spread; the 3-seed
    # experiment in docs/quality_parity.json pins the means)
    assert flax["accuracy"] >= keras["accuracy"] - 0.08, (keras, flax)
    assert flax["min_cavg"] <= keras["min_cavg"] + 0.05, (keras, flax)


@pytest.mark.slow
def test_bf16_flagship_mode_matches_f32_quality():
    """The 74%-MFU configuration (bfloat16 model compute on
    precision="bf16" features) must not trail the f32/highest arm beyond
    seed noise at convergence — reduced single-seed arm of
    tools/exp_quality_parity.py section bf16 (full receipts with paired
    per-seed deltas in docs/quality_parity.json)."""
    import jax.numpy as jnp
    exp = _load_experiment()
    (train_sig, train_y), (test_sig, test_y) = exp.make_corpus(24, 24,
                                                               seed=100)
    X = exp.features_jax(train_sig)
    Xt = exp.features_jax(test_sig)
    Xb = exp.features_jax(train_sig, precision="bf16")
    Xbt = exp.features_jax(test_sig, precision="bf16")
    perms = exp.epoch_perms(len(train_y), epochs=8, seed=0)
    f32 = exp.evaluate(
        exp.train_flax(X, train_y, perms, batch=32, lr=1e-3, seed=0),
        Xt, test_y)
    bf16 = exp.evaluate(
        exp.train_flax(Xb, train_y, perms, batch=32, lr=1e-3, seed=0,
                       compute_dtype=jnp.bfloat16),
        Xbt, test_y)
    assert f32["accuracy"] > 0.5 and bf16["accuracy"] > 0.5, (f32, bf16)
    assert bf16["accuracy"] >= f32["accuracy"] - 0.09, (f32, bf16)
    assert bf16["min_cavg"] <= f32["min_cavg"] + 0.06, (f32, bf16)


@pytest.mark.slow
def test_cached_frozen_feed_matches_streamed_quality():
    """cache_staged's frozen epoch-1 batch composition (batch-order
    reshuffle only) must not cost converged quality vs the streamed
    per-epoch-reshuffled feed — reduced arm of section `cached`."""
    exp = _load_experiment()
    (train_sig, train_y), (test_sig, test_y) = exp.make_corpus(24, 24,
                                                               seed=100)
    X = exp.features_jax(train_sig)
    Xt = exp.features_jax(test_sig)
    perms = exp.epoch_perms(len(train_y), epochs=8, seed=0)
    streamed = exp.evaluate(
        exp.train_flax(X, train_y, perms, batch=32, lr=1e-3, seed=0),
        Xt, test_y)
    cached = exp.evaluate(
        exp.train_flax_cached(X, train_y, epochs=8, batch=32, lr=1e-3,
                              seed=0),
        Xt, test_y)
    # single reduced seed (96 train utts, 8 epochs): the arms must LEARN
    # and stay within the reduced config's seed spread (measured ~0.12
    # between composition policies at this size — seed-0 rows landed
    # 0.115 below streamed while the full-size 5-seed PAIRED receipt has
    # rows at +0.029 [+0.011, +0.047] ABOVE streamed,
    # docs/quality_parity.json); this test catches divergence, the
    # receipt pins the quality claim
    assert cached["accuracy"] > 0.5, cached
    assert cached["accuracy"] >= streamed["accuracy"] - 0.15, (streamed,
                                                               cached)
    rows_mode = exp.evaluate(
        exp.train_flax_cached(X, train_y, epochs=8, batch=32, lr=1e-3,
                              seed=0, shuffle="rows"),
        Xt, test_y)
    assert rows_mode["accuracy"] > 0.5, rows_mode
    assert rows_mode["accuracy"] >= streamed["accuracy"] - 0.15, (
        streamed, rows_mode)


@pytest.mark.slow
def test_fused_augmentation_training_beats_clean_on_noisy_eval():
    """The fused on-device config-5 augmentation chain trained from raw
    waveforms must at least hold quality on a noise-corrupted eval set
    vs clean training (full 3-seed receipts in docs/quality_parity.json,
    section aug)."""
    import jax.numpy as jnp
    exp = _load_experiment()
    (train_sig, train_y), (test_sig, test_y) = exp.make_corpus(24, 24,
                                                               seed=100)
    X = exp.features_jax(train_sig)
    Xt = exp.features_jax(test_sig)
    bank = exp.make_noise_clips(6, 4.0, seed=777)
    eval_clips = exp.make_noise_clips(6, 4.0, seed=888)
    test_noisy = exp.corrupt_signals_ref(test_sig, eval_clips, seed=999)
    Xt_noisy = exp.features_jax(test_noisy)
    clean = exp.evaluate(
        exp.train_flax(X, train_y,
                       exp.epoch_perms(len(train_y), epochs=8, seed=0),
                       batch=32, lr=1e-3, seed=0),
        Xt_noisy, test_y)
    aug = exp.evaluate(
        exp.train_flax_fused_aug(train_sig, train_y, X.shape[1:],
                                 epochs=8, batch=32, lr=1e-3, seed=0,
                                 bank=jnp.asarray(bank)),
        Xt_noisy, test_y)
    # single reduced seed: the fused chain must train (not diverge) and
    # stay within noise of clean on the corrupted eval; the full-size
    # 3-seed experiment pins whether it WINS
    assert aug["accuracy"] > 0.4, aug
    assert aug["accuracy"] >= clean["accuracy"] - 0.12, (clean, aug)
