"""
Multi-level attention, Yu et al. (2018) "Multi-level attention model for
weakly supervised audio classification", DCASE 2018 Workshop.
(reference: lidbox/models/multilevel_attention.py)
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import DenseBlock
from .model_api import Model


class Attention(nn.Module):
    """Softmax-query x sigmoid-value attention summed over time
    (reference multilevel_attention.py:21-42): the query distribution is
    clipped to [1e-7, 1 - 1e-7] and renormalized before weighting."""
    num_units: int

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        x = nn.Dense(self.num_units, name="fc")(x)
        query = nn.softmax(x, axis=-1)
        query = jnp.clip(query, 1e-7, 1.0 - 1e-7)
        if mask is not None:
            # zero padded frames BEFORE the over-time renormalization, so
            # padded buckets reproduce trimmed numerics exactly
            query = query * mask[..., None].astype(query.dtype)
        # clamped denominator: an all-False mask row (silent clip, ragged
        # mesh pad row) must yield zeros, not 0/0 = NaN that poisons the
        # whole batch loss through sum(losses * example_mask)
        query = query / jnp.maximum(jnp.sum(query, axis=1, keepdims=True),
                                    1e-9)
        value = nn.sigmoid(x)
        return jnp.sum(query * value, axis=1)


class MultilevelAttention(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"
    L: int = 2
    H: int = 512

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        attention_outputs = []
        for level in range(1, self.L + 1):
            x = DenseBlock(self.H, 0.4, name=f"dense_block{level}")(x, train=train)
            attention_outputs.append(
                Attention(self.num_outputs, name=f"attention{level}")(x, mask=mask))
        concat = jnp.concatenate(attention_outputs, axis=-1)
        if output == "embedding":
            return concat
        out = nn.Dense(self.num_outputs, name="outputs")(concat)
        if self.output_activation:
            out = getattr(nn, self.output_activation)(out)
        return out


def create(input_shape, num_outputs, output_activation="log_softmax", L=2, H=512):
    return Model(
        module=MultilevelAttention(num_outputs=num_outputs,
                                   output_activation=output_activation, L=L, H=H),
        input_shape=tuple(input_shape),
        name="DNN_multilevel_attention")
