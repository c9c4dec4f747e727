"""
Model contract shared by every architecture in lidbox_tpu.models.

The reference contract is per-module ``create(input_shape, num_outputs, **kw)
-> tf.keras.Model`` plus optional ``as_embedding_extractor(model)``
(reference: lidbox/models/xvector.py:46-73). Here ``create`` returns a
:class:`Model` — a thin functional wrapper around a Flax module:

- ``model.init(rng)`` initializes parameters from the declared input shape,
- ``model(x, train=...)`` applies the module (handles BatchNorm running
  stats and dropout RNGs),
- ``as_embedding_extractor(model)`` returns a Model whose forward emits the
  pre-activation embedding instead of logits — each Flax module implements
  this with an ``output="embedding"`` fast exit, the TPU-native equivalent
  of the reference's "cut the Keras graph at a layer and strip its
  activation" pattern.

All forwards are pure functions of (variables, inputs, rngs) and jit/pjit
compatible; an optional boolean frame ``mask`` argument makes the pooling
layers exact on padded buckets (SURVEY.md §5 long-context notes).
"""
import dataclasses
from typing import Any, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp

from lidbox_tpu import RANDOM_SEED


def concrete_input_shape(input_shape, placeholder=16):
    """Substitute variable (None) dims with a dummy extent for init /
    tabulate — the ONE place this policy lives."""
    return tuple(d if d is not None else placeholder for d in input_shape)


@dataclasses.dataclass
class Model:
    """A Flax module bound to an input signature and (optionally) variables."""

    module: Any
    input_shape: Tuple[int, ...]          # per-example shape, e.g. (T, F)
    name: str
    variables: Optional[Mapping] = None
    output: str = "logits"                # or "embedding"
    apply_kwargs: Mapping = dataclasses.field(default_factory=dict)

    def init(self, rng=None):
        """Initialize variables from a dummy batch of the declared shape."""
        if rng is None:
            rng = jax.random.PRNGKey(RANDOM_SEED)
        shape = concrete_input_shape(self.input_shape)
        dummy = jnp.zeros((1,) + shape, jnp.float32)
        self.variables = self.module.init(
            {"params": rng, "dropout": rng, "noise": rng},
            dummy, train=False, **self.apply_kwargs)
        return self

    @property
    def params(self):
        if self.variables is None:
            self.init()
        return self.variables["params"]

    def num_params(self):
        return sum(x.size for x in jax.tree_util.tree_leaves(self.params))

    def apply(self, variables, x, train=False, mask=None, rngs=None, output=None,
              compute_dtype=None):
        """Pure functional forward — safe to close over in jit/pjit.

        ``compute_dtype`` (e.g. jnp.bfloat16) casts parameters and inputs
        for the forward — master parameters stay float32 in the caller's
        state; outputs are upcast back to float32. On TPU this roughly
        halves activation bandwidth and runs single-pass MXU matmuls
        (~1.3x end-to-end on the x-vector at identical argmax).
        """
        if compute_dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda p: p.astype(compute_dtype)
                if jnp.issubdtype(p.dtype, jnp.floating) else p, variables)
            x = x.astype(compute_dtype)
        kwargs = dict(self.apply_kwargs)
        kwargs["output"] = output or self.output
        if mask is not None:
            kwargs["mask"] = mask
        def upcast(out):
            return (out.astype(jnp.float32)
                    if compute_dtype is not None else out)

        if train:
            if rngs is None:
                rngs = {"dropout": jax.random.PRNGKey(0)}
            rngs.setdefault("noise", rngs.get("dropout", jax.random.PRNGKey(0)))
            out, updates = self.module.apply(
                variables, x, train=True, rngs=rngs,
                mutable=["batch_stats"], **kwargs)
            if compute_dtype is not None:
                # keep running BatchNorm stats in f32, like Trainer._apply:
                # bf16 EMA increments below the mantissa are silently lost
                updates = jax.tree_util.tree_map(
                    lambda s: s.astype(jnp.float32), updates)
            return upcast(out), updates
        return upcast(self.module.apply(variables, x, train=False, **kwargs))

    def __call__(self, x, train=False, mask=None, rngs=None):
        if self.variables is None:
            self.init()
        return self.apply(self.variables, x, train=train, mask=mask, rngs=rngs)

    def with_output(self, output):
        return dataclasses.replace(self, output=output)

    def with_variables(self, variables):
        return dataclasses.replace(self, variables=variables)


def as_embedding_extractor(model: Model) -> Model:
    """Generic embedding-extractor transform: same module and weights, the
    forward returns the pre-activation embedding layer output."""
    return model.with_output("embedding")
