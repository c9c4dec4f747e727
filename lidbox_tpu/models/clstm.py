"""
CNN-LSTM-TDNN with time-frequency attention, Miao, McLoughlin, Yan (2019)
"A New Time-Frequency Attention Mechanism for TDNN and CNN-LSTM-TDNN, with
Application to Language Identification", Proc. Interspeech 2019.
(reference: lidbox/models/clstm.py)
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (FrameLayer, FrequencyAttention, GaussianNoise,
                     GlobalMeanStddevPooling1D, LSTMLayer, batch_norm,
                     subsample_frame_mask)
from .model_api import Model, as_embedding_extractor  # noqa: F401


class CLSTM(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"
    use_attention: bool = False
    use_conv2d: bool = False
    use_lstm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        x = GaussianNoise(0.01, name="input_noise")(x, train=train)
        # Channel dropout with noise shape [B, 1, F] (reference clstm.py:49).
        x = nn.Dropout(0.4, broadcast_dims=(1,), deterministic=not train,
                       name="channel_dropout")(x)

        if self.use_conv2d:
            # Conv2D front-end: [B, T, F, 1] -> stride (1, 6) twice, then max
            # over the frequency axis (reference clstm.py:51-60). The time
            # kernel is SAME (non-causal), so invalid time columns must be
            # re-zeroed around every stage — bias/BN/relu of a zero input is
            # nonzero, and the next SAME kernel would read that garbage at
            # the valid boundary (the same fix crnn applies per conv).
            tmask = (None if mask is None
                     else mask[:, :, None, None].astype(x.dtype))
            img = x[..., None]
            if tmask is not None:
                img = img * tmask
            img = nn.Conv(128, (3, 9), strides=(1, 6), padding="SAME",
                          name="conv2d_1")(img)
            img = batch_norm(train, name="conv2d_1_bn")(img)
            img = nn.relu(img)
            if tmask is not None:
                img = img * tmask
            img = nn.Conv(256, (3, 9), strides=(1, 6), padding="SAME",
                          name="conv2d_2")(img)
            img = batch_norm(train, name="conv2d_2_bn")(img)
            img = nn.relu(img)
            if tmask is not None:
                img = img * tmask
            x = jnp.max(img, axis=2)

        x = FrameLayer(512, 5, 1, name="frame1")(x)
        x = FrameLayer(512, 3, 2, name="frame2")(x)
        x = FrameLayer(512, 3, 3, name="frame3")(x)
        if self.use_lstm:
            x = LSTMLayer(512, name="lstm")(x)
        x = FrameLayer(512, 1, 1, name="frame4")(x)
        x = FrameLayer(1500, 1, 1, name="frame5")(x)
        if self.use_attention:
            x = FrequencyAttention(d_f=60, name="freq_attention")(x)
        if mask is not None:
            mask = subsample_frame_mask(mask, 6, x.shape[1])
        x = GlobalMeanStddevPooling1D(name="stats_pooling")(x, mask=mask)
        x = nn.Dense(512, name="segment1")(x)
        if output == "embedding":
            return x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(512, name="segment2")(x))
        x = nn.Dense(self.num_outputs, name="output")(x)
        if self.output_activation:
            x = getattr(nn, self.output_activation)(x)
        return x


def create(input_shape, num_outputs, output_activation="log_softmax",
           use_attention=False, use_conv2d=False, use_lstm=False):
    return Model(
        module=CLSTM(num_outputs=num_outputs, output_activation=output_activation,
                     use_attention=use_attention, use_conv2d=use_conv2d,
                     use_lstm=use_lstm),
        input_shape=tuple(input_shape),
        name="CLSTM")
