"""
Single-layer LSTM classifier (reference: lidbox/models/lstm.py).
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import LSTMLayer, mask_to_lengths
from .model_api import Model


class LSTM(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"
    num_units: int = 1024

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        x = LSTMLayer(self.num_units, return_sequences=False,
                      name="lstm")(x, lengths=mask_to_lengths(mask))
        if output == "embedding":
            return x
        x = nn.Dense(self.num_outputs, name="output")(x)
        if self.output_activation:
            x = getattr(nn, self.output_activation)(x)
        return x


def create(input_shape, num_outputs, output_activation="log_softmax", num_units=1024):
    return Model(
        module=LSTM(num_outputs=num_outputs, output_activation=output_activation,
                    num_units=num_units),
        input_shape=tuple(input_shape),
        name="lstm")
