"""
Bi-GRU classifier, Mateju et al. (2018) "Using Deep Neural Networks for
Identification of Slavic Languages from Acoustic Signal", Proc. Interspeech
2018. (reference: lidbox/models/bi_gru.py)
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import (BidirectionalRNN, SpatialDropout1D, batch_norm,
                     mask_to_lengths)
from .model_api import Model, as_embedding_extractor  # noqa: F401


class BiGRU(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"
    channel_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        if self.channel_dropout_rate > 0:
            x = SpatialDropout1D(self.channel_dropout_rate,
                                 name="channel_dropout")(x, train=train)
        lengths = mask_to_lengths(mask)
        x = BidirectionalRNN(512, cell="gru", name="BGRU_1")(x, lengths=lengths)
        x = BidirectionalRNN(512, cell="gru", return_sequences=False,
                             name="BGRU_2")(x, lengths=lengths)
        x = batch_norm(train, name="BGRU_2_bn")(x)
        # Embedding = fc_relu_1 pre-activation (reference bi_gru.py:20-24).
        x = nn.Dense(1024, name="fc_relu_1")(x)
        if output == "embedding":
            return x
        x = nn.relu(x)
        x = batch_norm(train, name="fc_relu_1_bn")(x)
        x = nn.relu(nn.Dense(1024, name="fc_relu_2")(x))
        x = batch_norm(train, name="fc_relu_2_bn")(x)
        x = nn.Dense(self.num_outputs, name="output")(x)
        if self.output_activation:
            x = getattr(nn, self.output_activation)(x)
        return x


def create(input_shape, num_outputs, output_activation="log_softmax",
           channel_dropout_rate=0):
    return Model(
        module=BiGRU(num_outputs=num_outputs, output_activation=output_activation,
                     channel_dropout_rate=channel_dropout_rate),
        input_shape=tuple(input_shape),
        name="BGRU")
