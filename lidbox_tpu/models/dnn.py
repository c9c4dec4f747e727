"""
Simple time-distributed DNN (reference: lidbox/models/dnn.py).
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import global_avg_pool_1d
from .model_api import Model


class DNN(nn.Module):
    num_outputs: int

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        x = nn.relu(nn.Dense(200, name="fc_1")(x))
        x = nn.relu(nn.Dense(400, name="fc_2")(x))
        x = nn.relu(nn.Dense(600, name="fc_3")(x))
        x = nn.relu(nn.Dense(800, name="fc_4")(x))
        x = global_avg_pool_1d(x, mask=mask)
        if output == "embedding":
            return x
        x = nn.Dense(self.num_outputs, name="output")(x)
        return nn.log_softmax(x)


def create(input_shape, num_outputs):
    return Model(module=DNN(num_outputs=num_outputs),
                 input_shape=tuple(input_shape), name="DNN")
