"""
X-Vector TDNN: five temporal convolutions, stats pooling, two segment
layers. Snyder et al. (2018) "Spoken Language Recognition using X-vectors",
Proc. Odyssey 2018. (reference: lidbox/models/xvector.py)

Flax/TPU rebuild: the causal Conv1D frame stack and dense segments map onto
the MXU; stats pooling is the shared masked implementation so padded buckets
match variable-length inference.
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import FrameLayer, GlobalMeanStddevPooling1D, SpatialDropout1D, subsample_frame_mask
from .model_api import Model, as_embedding_extractor  # noqa: F401


class XVector(nn.Module):
    num_outputs: int
    channel_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        if self.channel_dropout_rate > 0:
            x = SpatialDropout1D(self.channel_dropout_rate,
                                 name="channel_dropout")(x, train=train)
        # Frame-layer geometry from reference lidbox/models/xvector.py:53-57.
        x = FrameLayer(512, 5, 1, name="frame1")(x)
        x = FrameLayer(512, 3, 2, name="frame2")(x)
        x = FrameLayer(512, 3, 3, name="frame3")(x)
        x = FrameLayer(512, 1, 1, name="frame4")(x)
        x = FrameLayer(1500, 1, 1, name="frame5")(x)
        if mask is not None:
            # Strided convs shrink the time axis; subsample the frame mask
            # to match (ceil semantics of causal/stride convs).
            mask = subsample_frame_mask(mask, 6, x.shape[1])
        x = GlobalMeanStddevPooling1D(name="stats_pooling")(x, mask=mask)
        # Embedding = segment1 pre-activation (reference xvector.py:70-73).
        x = nn.Dense(512, name="segment1")(x)
        if output == "embedding":
            return x
        x = nn.relu(x)
        x = nn.relu(nn.Dense(512, name="segment2")(x))
        x = nn.Dense(self.num_outputs, name="outputs")(x)
        return nn.log_softmax(x)


def create(input_shape, num_outputs, channel_dropout_rate=0, name="x-vector"):
    return Model(
        module=XVector(num_outputs=num_outputs,
                       channel_dropout_rate=channel_dropout_rate),
        input_shape=tuple(input_shape),
        name=name)
