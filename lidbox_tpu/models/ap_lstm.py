"""
BLSTM angular-proximity language-vector extractor, Gelly & Gauvain (2017)
"Spoken Language Identification Using LSTM-Based Angular Proximity",
Proc. Interspeech 2017. (reference: lidbox/models/ap_lstm.py)

No classifier head: outputs L2-normalized language vectors of dim 4*units,
to be trained with losses.AngularProximity.
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import BidirectionalRNN, SpatialDropout1D, global_avg_pool_1d, l2_normalize
from .model_api import Model


class APLSTM(nn.Module):
    num_lstm_units: int = 62
    alpha1: float = 1.0
    alpha2: float = 1.0
    channel_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        if self.channel_dropout_rate > 0:
            x = SpatialDropout1D(self.channel_dropout_rate,
                                 name="channel_dropout")(x, train=train)
        from .layers import mask_to_lengths
        lengths = mask_to_lengths(mask)
        blstm_1 = BidirectionalRNN(self.num_lstm_units,
                                   name="blstm_1")(x, lengths=lengths)
        blstm_2 = BidirectionalRNN(self.num_lstm_units,
                                   name="blstm_2")(blstm_1, lengths=lengths)
        concat = jnp.concatenate([self.alpha1 * blstm_1,
                                  self.alpha2 * blstm_2], axis=-1)
        avg = global_avg_pool_1d(concat, mask=mask)
        return l2_normalize(avg, axis=1)


def create(input_shape, num_lstm_units=62, alpha1=1.0, alpha2=1.0,
           channel_dropout_rate=0, num_outputs=None):
    # num_outputs accepted for registry uniformity; the extractor has no head.
    return Model(
        module=APLSTM(num_lstm_units=num_lstm_units, alpha1=alpha1,
                      alpha2=alpha2, channel_dropout_rate=channel_dropout_rate),
        input_shape=tuple(input_shape),
        name="angular_proximity_lstm")
