"""
X-vector with frequency attention after frame5
(reference: lidbox/models/xvector_freq_attention.py).
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import FrameLayer, FrequencyAttention, GlobalMeanStddevPooling1D, subsample_frame_mask
from .model_api import Model, as_embedding_extractor  # noqa: F401


class XVectorFreqAttention(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"
    freq_attention_bins: int = 60

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        x = FrameLayer(512, 5, 1, name="frame1")(x)
        x = FrameLayer(512, 3, 2, name="frame2")(x)
        x = FrameLayer(512, 3, 3, name="frame3")(x)
        x = FrameLayer(512, 1, 1, name="frame4")(x)
        x = FrameLayer(1500, 1, 1, name="frame5")(x)
        x = FrequencyAttention(d_f=self.freq_attention_bins,
                               name="freq_attention")(x)
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
           freq_attention_bins=60):
    return Model(
        module=XVectorFreqAttention(num_outputs=num_outputs,
                                    output_activation=output_activation,
                                    freq_attention_bins=freq_attention_bins),
        input_shape=tuple(input_shape),
        name="x-vector-frequency-attention")
