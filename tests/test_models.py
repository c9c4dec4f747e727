"""
Model zoo contract tests: every architecture produces finite [B, num_outputs]
outputs in eval and train modes, and embedding extractors produce the
documented embedding dims (reference: tests/test_models.py, SURVEY.md §4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lidbox_tpu.models as models
from lidbox_tpu.models.model_api import as_embedding_extractor

NUM_OUTPUTS = 5

# (key, (T, F), create kwargs)
MODEL_CASES = [
    ("xvector", (40, 30), {}),
    ("xvector", (40, 30), {"channel_dropout_rate": 0.5}),
    ("xvector_extended", (48, 30), {}),
    ("xvector_2d", (40, 30), {}),
    ("xvector_freq_attention", (40, 30), {}),
    ("clstm", (40, 30), {}),
    ("clstm", (40, 30), {"use_attention": True, "use_lstm": True}),
    ("clstm", (40, 36), {"use_conv2d": True}),
    ("bi_gru", (20, 30), {}),
    ("cnn", (40, 30), {}),
    ("crnn", (64, 64), {}),
    ("dnn", (40, 30), {}),
    ("lstm", (20, 30), {}),
    ("multilevel_attention", (40, 30), {}),
    ("spherespeaker", (20, 30), {}),
    ("convnet_extractor", (64, 64), {"core": "mobilenet_v2"}),
]

EMBEDDING_DIMS = {
    "xvector": 512,
    "xvector_extended": 512,
    "bi_gru": 1024,
    "cnn": 1500,
    "spherespeaker": 1000,
}


def _batch(shape, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (batch,) + shape).astype(np.float32))


@pytest.mark.parametrize("key,shape,kwargs", MODEL_CASES,
                         ids=[f"{k}-{i}" for i, (k, _, _) in enumerate(MODEL_CASES)])
def test_forward_shapes_and_finiteness(key, shape, kwargs):
    model = models.create(key, shape, NUM_OUTPUTS, **kwargs).init()
    x = _batch(shape)
    out_eval = model(x, train=False)
    expected_dim = NUM_OUTPUTS if key != "ap_lstm" else None
    assert out_eval.shape == (2, expected_dim or out_eval.shape[1])
    assert out_eval.shape[0] == 2
    if key != "ap_lstm":
        assert out_eval.shape == (2, NUM_OUTPUTS)
    assert np.all(np.isfinite(np.asarray(out_eval)))
    out_train, updates = model(x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_train.shape == out_eval.shape
    assert np.all(np.isfinite(np.asarray(out_train)))


def test_ap_lstm_language_vectors_are_l2_normalized():
    model = models.create("ap_lstm", (20, 30), NUM_OUTPUTS, num_lstm_units=16).init()
    out = model(_batch((20, 30)), train=False)
    assert out.shape == (2, 4 * 16)
    norms = np.linalg.norm(np.asarray(out), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


@pytest.mark.parametrize("key", sorted(EMBEDDING_DIMS))
def test_embedding_extractors(key):
    shape = (48, 30)
    model = models.create(key, shape, NUM_OUTPUTS).init()
    extractor = as_embedding_extractor(model)
    emb = extractor(_batch(shape), train=False)
    assert emb.shape == (2, EMBEDDING_DIMS[key])
    assert np.all(np.isfinite(np.asarray(emb)))
    if key != "spherespeaker":
        # Embeddings are pre-activation: not all-nonnegative in general
        # (spherespeaker's embedding is its relu-fed L2-normalized output,
        # reference spherespeaker.py:23-26, so it is excluded).
        assert np.asarray(emb).min() < 0


def test_log_softmax_outputs_are_log_probabilities():
    model = models.create("xvector", (40, 30), NUM_OUTPUTS).init()
    out = np.asarray(model(_batch((40, 30)), train=False))
    np.testing.assert_allclose(np.exp(out).sum(axis=1), 1.0, rtol=1e-4)


def test_masked_pooling_matches_unpadded_forward():
    """Padded bucket + frame mask reproduces the unpadded forward (causal
    convs do not leak right padding; masked stats pooling excludes it)."""
    key = "xvector"
    T, F = 60, 30
    model = models.create(key, (T, F), NUM_OUTPUTS).init()
    x = _batch((T, F), batch=1)
    ref = np.asarray(model(x, train=False))
    pad_T = 96
    xp = jnp.pad(x, ((0, 0), (0, pad_T - T), (0, 0)))
    mask = jnp.arange(pad_T)[None, :] < T
    out = np.asarray(model(xp, train=False, mask=mask))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_channel_dropout_drops_whole_channels():
    model = models.create("xvector", (30, 16), NUM_OUTPUTS,
                          channel_dropout_rate=0.99).init()
    # Access the dropout behavior indirectly: train output differs from eval.
    x = _batch((30, 16))
    out_eval = np.asarray(model(x, train=False))
    out_train, _ = model(x, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(out_eval, np.asarray(out_train))


def test_model_registry_rejects_unknown_keys():
    with pytest.raises(KeyError):
        models.get_module("nonexistent_model")


def test_num_params_xvector_magnitude():
    """x-vector should be in the ~4-6M parameter range (SURVEY.md §5)."""
    model = models.create("xvector", (100, 40), 10).init()
    n = model.num_params()
    assert 3e6 < n < 8e6, n


TRAIN_STEP_CASES = [
    ("xvector", (40, 30), {}),
    ("xvector_extended", (48, 30), {}),
    ("xvector_2d", (40, 30), {}),
    ("xvector_freq_attention", (40, 30), {}),
    ("clstm", (40, 30), {"use_attention": True}),
    ("bi_gru", (16, 20), {}),
    ("cnn", (40, 30), {}),
    ("crnn", (64, 64), {}),
    ("dnn", (40, 30), {}),
    ("lstm", (16, 20), {}),
    ("multilevel_attention", (40, 30), {}),
    ("spherespeaker", (16, 20), {}),
    ("convnet_extractor", (64, 64), {"core": "mobilenet_v2"}),
]


@pytest.mark.parametrize("key,shape,kwargs", TRAIN_STEP_CASES,
                         ids=[c[0] for c in TRAIN_STEP_CASES])
def test_one_real_train_step_per_model(key, shape, kwargs):
    """Gradient flow: every classifier survives one full optimizer step
    (forward + backward + BN updates + adam) with finite loss and params."""
    import optax
    from lidbox_tpu.losses import nll_loss, cross_entropy_with_logits
    from lidbox_tpu.train.loop import Trainer
    model = models.create(key, shape, NUM_OUTPUTS, **kwargs)
    # crnn's default head is plain softmax (reference crnn.py:24); train it
    # through log-space cross entropy on the probabilities.
    loss = (lambda y, out: cross_entropy_with_logits(y, jnp.log(out + 1e-9))) \
        if key == "crnn" else nll_loss
    trainer = Trainer(model, optax.adam(1e-3), loss)
    trainer.create_state()
    batch = {"input": np.asarray(_batch(shape, batch=2)),
             "target": np.asarray([0, 1], np.int32)}
    state, l = trainer._jit_train_step(trainer.state, batch, trainer.rng)
    assert np.isfinite(float(l))
    leaves = jax.tree_util.tree_leaves(jax.device_get(state.params))
    assert all(np.all(np.isfinite(p)) for p in leaves)


def test_ap_lstm_trains_with_angular_proximity():
    import optax
    from lidbox_tpu.losses import AngularProximity
    from lidbox_tpu.train.loop import Trainer
    model = models.create("ap_lstm", (16, 20), NUM_OUTPUTS, num_lstm_units=8)
    ap = AngularProximity(N=NUM_OUTPUTS, D=4 * 8)
    trainer = Trainer(model, optax.adam(1e-3), ap)
    trainer.create_state()
    batch = {"input": np.asarray(_batch((16, 20), batch=4)),
             "target": np.asarray([0, 1, 2, 3], np.int32)}
    losses = []
    state = trainer.state
    for _ in range(8):
        state, l = trainer._jit_train_step(state, batch, trainer.rng)
        losses.append(float(l))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_remat_training_matches_plain():
    import optax
    from lidbox_tpu.losses import nll_loss
    from lidbox_tpu.train.loop import Trainer
    batch = {"input": np.asarray(_batch((40, 30), batch=4)),
             "target": np.asarray([0, 1, 2, 0], np.int32)}
    losses = {}
    for remat in (False, True):
        model = models.create("xvector", (40, 30), NUM_OUTPUTS)
        trainer = Trainer(model, optax.adam(1e-3), nll_loss)
        trainer.remat = remat
        trainer.create_state()
        _, l = trainer._jit_train_step(trainer.state, batch, trainer.rng)
        losses[remat] = float(l)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-6)


@pytest.mark.parametrize("key,max_t,feat", [("xvector", 37, 12),
                                            ("cnn", 25, 12),
                                            ("xvector_extended", 52, 12)])
def test_mask_subsampling_exhaustive_lengths(key, max_t, feat):
    """Proof by exhaustion of the derived strided-conv mask mapping
    (layers.subsample_frame_mask, VERDICT r1 weak #6): for EVERY valid
    length n in 1..max_t, the padded forward with a prefix mask equals the
    unpadded forward on the first n frames. One jitted padded program is
    reused across lengths (mask is data, not shape)."""
    import jax
    model = models.create(key, (max_t, feat), NUM_OUTPUTS).init()
    rng = np.random.default_rng(42)
    x_full = rng.normal(0, 1, (1, max_t, feat)).astype(np.float32)

    padded_fwd = jax.jit(lambda v, xp, m: model.module.apply(
        v, xp, train=False, mask=m))
    for n in range(1, max_t + 1):
        trimmed = np.asarray(model.apply(
            model.variables, jnp.asarray(x_full[:, :n]), train=False))
        xp = np.zeros_like(x_full)
        xp[:, :n] = x_full[:, :n]
        mask = jnp.arange(max_t)[None, :] < n
        out = np.asarray(padded_fwd(model.variables, jnp.asarray(xp), mask))
        np.testing.assert_allclose(
            out, trimmed, rtol=1e-4, atol=1e-5,
            err_msg=f"{key}: masked-vs-trimmed mismatch at length {n}")


@pytest.mark.parametrize("key,T,F", [
    ("xvector", 60, 30), ("xvector_extended", 60, 30), ("xvector_2d", 48, 30),
    ("xvector_freq_attention", 48, 30), ("clstm", 48, 30), ("cnn", 40, 20),
    ("dnn", 30, 12), ("lstm", 30, 12), ("bi_gru", 30, 12),
    ("spherespeaker", 30, 12), ("ap_lstm", 30, 12),
    ("multilevel_attention", 30, 12), ("crnn", 96, 64),
])
def test_zoo_masked_forward_matches_trimmed(key, T, F):
    """Every maskable model must reproduce the unpadded (trimmed) forward
    exactly under a prefix frame mask — including bidirectional RNNs
    (seq_lengths flips only the valid prefix), last-valid-step selection,
    masked attention renormalization, and the CRNN image stack's
    per-stage zeroing (round-2 fix: bi_gru/lstm/ap_lstm/crnn/
    multilevel_attention previously diverged by 1e-2..2e-1)."""
    import jax.numpy as jnp
    model = models.create(key, (T, F), NUM_OUTPUTS).init()
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, T, F)).astype(np.float32)
    for n in (T - 7, T // 2 + 1):
        trimmed = np.asarray(model.apply(model.variables,
                                         jnp.asarray(x[:, :n]), train=False))
        xp = np.zeros_like(x)
        xp[:, :n] = x[:, :n]
        mask = jnp.arange(T)[None, :] < n
        out = np.asarray(model.apply(model.variables, jnp.asarray(xp),
                                     train=False, mask=mask))
        np.testing.assert_allclose(out, trimmed, rtol=1e-4, atol=1e-5,
                                   err_msg=f"{key} at length {n}")


def test_clstm_conv2d_masked_forward_matches_trimmed():
    """The SAME-padded Conv2D front-end re-zeroes invalid time columns
    between stages (bias/BN/relu of zero input is nonzero, and the next
    SAME kernel reads it at the valid boundary)."""
    import jax.numpy as jnp
    T, F = 48, 36
    model = models.create("clstm", (T, F), NUM_OUTPUTS, use_conv2d=True).init()
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (2, T, F)).astype(np.float32)
    for n in (T - 7, T // 2 + 1):
        trimmed = np.asarray(model.apply(model.variables,
                                         jnp.asarray(x[:, :n]), train=False))
        xp = np.zeros_like(x)
        xp[:, :n] = x[:, :n]
        mask = jnp.arange(T)[None, :] < n
        out = np.asarray(model.apply(model.variables, jnp.asarray(xp),
                                     train=False, mask=mask))
        np.testing.assert_allclose(out, trimmed, rtol=1e-4, atol=1e-5,
                                   err_msg=f"length {n}")


def test_multilevel_attention_all_false_mask_row_is_finite():
    """A silent clip (all-False mask row, e.g. a ragged mesh pad row) must
    yield finite outputs, not 0/0 = NaN that poisons the batch loss."""
    import jax.numpy as jnp
    model = models.create("multilevel_attention", (20, 12), NUM_OUTPUTS).init()
    x = np.random.default_rng(0).normal(0, 1, (3, 20, 12)).astype(np.float32)
    mask = np.ones((3, 20), bool)
    mask[1] = False
    out = np.asarray(model.apply(model.variables, jnp.asarray(x),
                                 train=False, mask=jnp.asarray(mask)))
    assert np.all(np.isfinite(out))


def test_cnn_same_padding_rejects_mask():
    import pytest
    model = models.create("cnn", (40, 20), NUM_OUTPUTS, padding="same").init()
    x = np.zeros((2, 40, 20), np.float32)
    with pytest.raises(ValueError, match="CAUSAL"):
        model.apply(model.variables, x, train=False,
                    mask=np.ones((2, 40), bool))


def test_convnet_extractor_mask_excludes_padding():
    """The image-trunk model's mask support is approximate (SAME trunk),
    but the dominant error — pooling over pure padding — must be gone:
    growing the padding changes the masked output far less than the
    unmasked one."""
    import jax.numpy as jnp
    T, F = 64, 32
    model = models.create("convnet_extractor", (None, F), NUM_OUTPUTS,
                          core="mobilenet_v2").init()
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, T, F)).astype(np.float32)
    n = 33

    def fwd(pad_value, masked):
        xp = np.full((2, T, F), pad_value, np.float32)
        xp[:, :n] = x[:, :n]
        mask = (jnp.arange(T)[None, :] < n) if masked else None
        return np.asarray(model.apply(model.variables, jnp.asarray(xp),
                                      train=False, mask=mask,
                                      output="embedding"))

    # with a mask, padding CONTENT cannot leak (input frames are zeroed):
    # garbage-padded == zero-padded exactly
    np.testing.assert_allclose(fwd(0.0, True), fwd(100.0, True),
                               rtol=1e-6, atol=1e-6)
    assert np.all(np.isfinite(fwd(0.0, True)))
    # without a mask the garbage dominates the pooled output
    assert np.abs(fwd(100.0, False) - fwd(0.0, True)).max() > 1e-2


def test_masked_pooling_count_is_exact_in_bf16():
    """The valid-frame count must accumulate in f32: a bf16 sum of ones
    saturates at 256, skewing masked means ~17% on 300-frame clips."""
    import jax.numpy as jnp
    from lidbox_tpu.models.layers import global_avg_pool_1d
    T = 300
    x32 = np.random.default_rng(7).normal(0, 1, (2, T, 8)).astype(np.float32)
    mask = jnp.ones((2, T), bool)
    ref = np.asarray(global_avg_pool_1d(jnp.asarray(x32), mask))
    out = np.asarray(global_avg_pool_1d(
        jnp.asarray(x32, jnp.bfloat16), mask).astype(jnp.float32))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.02)


def test_model_apply_bf16_keeps_batch_stats_f32():
    """Model.apply(train=True, compute_dtype=bf16) must return f32
    batch_stats updates (bf16 EMA increments below the mantissa vanish) —
    same semantics as Trainer._apply."""
    import jax
    import jax.numpy as jnp
    model = models.create("multilevel_attention", (20, 12), NUM_OUTPUTS).init()
    x = np.random.default_rng(0).normal(0, 1, (4, 20, 12)).astype(np.float32)
    out, updates = model.apply(model.variables, x, train=True,
                               compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    leaves = jax.tree_util.tree_leaves(updates.get("batch_stats", {}))
    assert leaves and all(l.dtype == jnp.float32 for l in leaves)
