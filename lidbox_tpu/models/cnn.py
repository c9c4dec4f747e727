"""
MGB-3 dialect CNN with average pooling, Shon, Ali, Glass (2018)
"Convolutional Neural Network and Language Embeddings for End-to-End
Dialect Recognition". (reference: lidbox/models/cnn.py)
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import SpatialDropout1D, global_avg_pool_1d, subsample_frame_mask
from .model_api import Model, as_embedding_extractor  # noqa: F401


class CNN(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"
    padding: str = "CAUSAL"
    channel_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        if mask is not None and self.padding != "CAUSAL":
            # subsample_frame_mask's validity derivation only holds for
            # causal left-padding (layers.py:63-79); SAME convs read past
            # the valid prefix and would contaminate "valid" frames
            raise ValueError(
                "CNN masked forwards require padding='CAUSAL' "
                f"(got {self.padding!r})")
        if self.channel_dropout_rate > 0:
            x = SpatialDropout1D(self.channel_dropout_rate,
                                 name="channel_dropout")(x, train=train)
        x = nn.relu(nn.Conv(500, (5,), (1,), padding=self.padding, name="conv_1")(x))
        x = nn.relu(nn.Conv(500, (7,), (2,), padding=self.padding, name="conv_2")(x))
        x = nn.relu(nn.Conv(500, (1,), (1,), padding=self.padding, name="conv_3")(x))
        x = nn.relu(nn.Conv(3000, (1,), (1,), padding=self.padding, name="conv_4")(x))
        if mask is not None:
            mask = subsample_frame_mask(mask, 2, x.shape[1])
        x = global_avg_pool_1d(x, mask=mask)
        # Embedding = fc_1 pre-activation (reference cnn.py:19-22).
        x = nn.Dense(1500, name="fc_1")(x)
        if output == "embedding":
            return x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(600, name="fc_2")(x))
        x = nn.Dense(self.num_outputs, name="output")(x)
        if self.output_activation:
            x = getattr(nn, self.output_activation)(x)
        return x


def create(input_shape, num_outputs, output_activation="log_softmax",
           padding="CAUSAL", channel_dropout_rate=0):
    return Model(
        module=CNN(num_outputs=num_outputs, output_activation=output_activation,
                   padding=padding.upper(),
                   channel_dropout_rate=channel_dropout_rate),
        input_shape=tuple(input_shape),
        name="MGB-3_CNN")
