"""
Golden-oracle tests that EXECUTE the reference implementation directly
(VERDICT r1 missing #4): C_avg, the angular-proximity loss, and window
normalization are compared against /root/reference/lidbox run under the
installed TensorFlow, on randomized inputs. This removes the
"both re-derivations share the same misreading" failure mode that
hand-rederived numpy oracles cannot catch.

The reference modules are loaded from file paths (not installed); the
kaldiio import in lidbox/features/__init__.py is stubbed since only the
pure-TF functions are exercised.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

import lidbox_tpu.features as F
from lidbox_tpu.losses import AngularProximity
from lidbox_tpu.metrics import SparseAverageDetectionCost

REF = "/root/reference/lidbox"

tf = pytest.importorskip("tensorflow")


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def ref_metrics():
    return _load("ref_metrics", f"{REF}/metrics.py")


@pytest.fixture(scope="module")
def ref_cavg_classes(ref_metrics):
    """The reference targets TF 2.3, where Keras metric weights were plain
    tf.Variables with scatter_nd_add. Under Keras 3 add_weight returns a
    KerasVariable without that method, so allocation (and only allocation)
    is shimmed — every formula in update_state/result runs verbatim."""

    def _tf_variable_add_weight(self, name=None, shape=None,
                                initializer="zeros", **kwargs):
        return tf.Variable(tf.zeros(shape, tf.float32), name=name,
                           trainable=False)

    class RefDense(ref_metrics.AverageDetectionCost):
        add_weight = _tf_variable_add_weight

    class RefSparse(ref_metrics.SparseAverageDetectionCost):
        add_weight = _tf_variable_add_weight

    return RefDense, RefSparse


@pytest.fixture(scope="module")
def ref_losses():
    return _load("ref_losses", f"{REF}/losses.py")


@pytest.fixture(scope="module")
def ref_features():
    if "kaldiio" not in sys.modules:
        try:
            import kaldiio  # noqa: F401
        except ImportError:
            sys.modules["kaldiio"] = types.ModuleType("kaldiio")
    return _load("ref_features", f"{REF}/features/__init__.py")


class TestCavgOracle:
    """reference: lidbox/metrics.py:6-119 executed directly."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_streaming_cavg_matches_reference(self, ref_cavg_classes, seed):
        N, B, T = 4, 48, 11
        rng = np.random.default_rng(seed)
        thresholds = np.linspace(-4.0, 0.0, T).astype(np.float32)
        y = rng.integers(0, N, B).astype(np.int32)
        # log-softmax-like scores
        scores = np.log(rng.dirichlet(np.ones(N), B).astype(np.float32) + 1e-8)

        ref = ref_cavg_classes[1](N, thresholds.tolist())
        ours = SparseAverageDetectionCost(N, tuple(thresholds.tolist()))
        state = ours.init_state()
        # stream in 3 uneven batches through both implementations
        for lo, hi in ((0, 10), (10, 31), (31, B)):
            ref.update_state(y[lo:hi], scores[lo:hi])
            state = ours.update_sparse(state, y[lo:hi], scores[lo:hi])
        np.testing.assert_allclose(float(ours.result(state)),
                                   float(ref.result()), atol=1e-6)

    def test_perfect_and_worst_scores(self, ref_cavg_classes):
        N, B = 3, 30
        rng = np.random.default_rng(9)
        y = rng.integers(0, N, B).astype(np.int32)
        thresholds = np.linspace(-1.0, 1.0, 7).astype(np.float32)
        perfect = (np.eye(N)[y] * 2.0 - 1.0).astype(np.float32)
        ref = ref_cavg_classes[1](N, thresholds.tolist())
        ref.update_state(y, perfect)
        ours = SparseAverageDetectionCost(N, tuple(thresholds.tolist()))
        state = ours.update_sparse(ours.init_state(), y, perfect)
        np.testing.assert_allclose(float(ours.result(state)),
                                   float(ref.result()), atol=1e-6)
        assert float(ref.result()) < 1e-6

    def test_dense_onehot_update_matches(self, ref_cavg_classes):
        N, B = 3, 24
        rng = np.random.default_rng(3)
        y = rng.integers(0, N, B)
        onehot = np.eye(N, dtype=np.float32)[y]
        scores = rng.normal(0, 1, (B, N)).astype(np.float32)
        thresholds = np.linspace(-2.0, 2.0, 9).astype(np.float32)
        ref = ref_cavg_classes[0](N, thresholds.tolist())
        ref.update_state(onehot, scores)
        from lidbox_tpu.metrics import AverageDetectionCost
        ours = AverageDetectionCost(N, tuple(thresholds.tolist()))
        state = ours.update(ours.init_state(), onehot, scores)
        np.testing.assert_allclose(float(ours.result(state)),
                                   float(ref.result()), atol=1e-6)


class TestAngularProximityOracle:
    """reference: lidbox/losses.py:4-52 executed directly."""

    @pytest.mark.parametrize("N,D,seed", [(3, 8, 0), (5, 5, 1), (4, 64, 2)])
    def test_loss_matches_reference(self, ref_losses, N, D, seed):
        rng = np.random.default_rng(seed)
        B = 16
        z = rng.normal(size=(B, D)).astype(np.float32)
        z /= np.linalg.norm(z, axis=1, keepdims=True)
        y = rng.integers(0, N, B).astype(np.int32)
        ref_loss = ref_losses.SparseAngularProximity(N, D)
        # .call bypasses Keras 3's y_true float cast in Loss.__call__
        ref_vals = ref_loss.call(tf.constant(y), tf.constant(z)).numpy()
        ours = AngularProximity(N=N, D=D)
        got = np.asarray(ours(jnp.asarray(y), jnp.asarray(z)))
        np.testing.assert_allclose(got, ref_vals, rtol=1e-5, atol=1e-6)

    def test_predict_scores_match(self, ref_losses):
        rng = np.random.default_rng(5)
        z = rng.normal(size=(8, 16)).astype(np.float32)
        z /= np.linalg.norm(z, axis=1, keepdims=True)
        ref_loss = ref_losses.SparseAngularProximity(4, 16)
        ref_scores = ref_loss.predict(tf.constant(z)).numpy()
        ours = AngularProximity(N=4, D=16)
        np.testing.assert_allclose(np.asarray(ours.predict(jnp.asarray(z))),
                                   ref_scores, rtol=1e-5, atol=1e-5)


class TestWindowNormalizationOracle:
    """reference: lidbox/features/__init__.py:35-67 executed directly."""

    @pytest.mark.parametrize("window_len,normalize_variance",
                             [(-1, True), (16, True), (16, False),
                              (31, True), (200, True)])
    def test_matches_reference(self, ref_features, window_len,
                               normalize_variance):
        rng = np.random.default_rng(window_len + 7)
        X = rng.normal(0, 4, (3, 50, 12)).astype(np.float32)
        ref = ref_features.window_normalization(
            tf.constant(X), tf.constant(1), tf.constant(window_len),
            tf.constant(normalize_variance)).numpy()
        got = np.asarray(F.window_normalization(
            jnp.asarray(X), window_len=window_len,
            normalize_variance=normalize_variance))
        np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

    def test_cmvn_and_scaling_match(self, ref_features):
        rng = np.random.default_rng(11)
        X = rng.normal(2, 3, (2, 30, 8)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(F.cmvn(jnp.asarray(X))),
            ref_features.cmvn(tf.constant(X)).numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(F.cmn(jnp.asarray(X))),
            ref_features.cmn(tf.constant(X)).numpy(), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(F.feature_scaling(jnp.asarray(X), -1.0, 1.0, axis=1)),
            ref_features.feature_scaling(tf.constant(X), tf.constant(-1.0),
                                         tf.constant(1.0), axis=1).numpy(),
            rtol=1e-5, atol=1e-5)
