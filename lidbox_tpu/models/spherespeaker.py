"""
SphereSpeaker, Kaseva, Rouhe, Kurimo (2019) "SphereDiar: an effective
speaker diarization system for meeting data", ASRU 2019.
(reference: lidbox/models/spherespeaker.py — VLAD replaced by mean pooling)
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import BidirectionalRNN, batch_norm, global_avg_pool_1d, l2_normalize
from .model_api import Model, as_embedding_extractor  # noqa: F401


class SphereSpeaker(nn.Module):
    num_outputs: int
    embedding_dim: int = 1000
    output_activation: str = "log_softmax"

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        from .layers import mask_to_lengths
        lengths = mask_to_lengths(mask)
        blstm_1 = BidirectionalRNN(250, name="blstm_1")(x, lengths=lengths)
        blstm_2 = BidirectionalRNN(250, name="blstm_2")(blstm_1, lengths=lengths)
        blstm_3 = BidirectionalRNN(250, name="blstm_3")(blstm_2, lengths=lengths)
        x = jnp.concatenate([blstm_1, blstm_2, blstm_3], axis=-1)
        x = batch_norm(train, name="blstm_bn")(x)
        x = nn.relu(nn.Dense(self.embedding_dim, name="fc_relu")(x))
        x = global_avg_pool_1d(x, mask=mask)
        x = batch_norm(train, name="pool_bn")(x)
        x = l2_normalize(x, axis=1)
        # Embedding = the L2-normalized output itself (reference
        # spherespeaker.py:23-26).
        if output == "embedding":
            return x
        x = nn.Dense(self.num_outputs, name="outputs")(x)
        if self.output_activation:
            x = getattr(nn, self.output_activation)(x)
        return x


def create(input_shape, num_outputs, embedding_dim=1000,
           output_activation="log_softmax"):
    return Model(
        module=SphereSpeaker(num_outputs=num_outputs, embedding_dim=embedding_dim,
                             output_activation=output_activation),
        input_shape=tuple(input_shape),
        name="spherespeaker")
