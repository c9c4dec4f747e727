"""
Property-based model tests with hypothesis, mirroring the reference's
random-spectrogram strategy (reference: tests/test_models.py:30-122,
lidbox/testutil.py:29-35): NaN-free [B, num_outputs] outputs for random
batch/time/channel shapes, in eval and train modes.

Kept to the cheap feed-forward models so the suite stays fast; recurrent
and conv2d models get fixed-shape coverage in tests/test_models.py.
"""
import numpy as np
from hypothesis import given, settings, strategies as st

import jax
import lidbox_tpu.models as models

NUM_OUTPUTS = 4


def batches(min_t=12, min_f=12, max_f=80):
    return st.tuples(
        st.integers(1, 6),              # batch
        st.integers(min_t, 80),         # time
        st.integers(min_f, max_f),      # channels
        st.integers(0, 2 ** 31 - 1),    # seed
    )


def _make(shape_seed):
    b, t, f, seed = shape_seed
    rng = np.random.default_rng(seed)
    return rng.normal(0, 100, (b, t, f)).astype(np.float32)


@given(batches())
@settings(max_examples=10, deadline=None)
def test_dnn_properties(shape_seed):
    x = _make(shape_seed)
    model = models.create("dnn", x.shape[1:], NUM_OUTPUTS).init()
    for train in (False, True):
        out = model(x, train=train, rngs={"dropout": jax.random.PRNGKey(0)})
        out = out[0] if isinstance(out, tuple) else out
        assert out.shape == (x.shape[0], NUM_OUTPUTS)
        assert np.all(np.isfinite(np.asarray(out)))


@given(batches(min_t=8))
@settings(max_examples=10, deadline=None)
def test_xvector_properties(shape_seed):
    x = _make(shape_seed)
    model = models.create("xvector", x.shape[1:], NUM_OUTPUTS).init()
    for train in (False, True):
        out = model(x, train=train, rngs={"dropout": jax.random.PRNGKey(0)})
        out = out[0] if isinstance(out, tuple) else out
        assert out.shape == (x.shape[0], NUM_OUTPUTS)
        assert np.all(np.isfinite(np.asarray(out)))


@given(batches())
@settings(max_examples=10, deadline=None)
def test_multilevel_attention_properties(shape_seed):
    x = _make(shape_seed)
    model = models.create("multilevel_attention", x.shape[1:], NUM_OUTPUTS).init()
    out, _ = model(x, train=True, rngs={"dropout": jax.random.PRNGKey(0)})
    assert out.shape == (x.shape[0], NUM_OUTPUTS)
    assert np.all(np.isfinite(np.asarray(out)))
