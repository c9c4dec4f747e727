"""
Extended x-vector, Villalba et al. (2018) "The JHU-MIT System Description
for NIST SRE18". (reference: lidbox/models/xvector_extended.py)
"""
from typing import Optional

import flax.linen as nn
import jax

from .layers import FrameLayer, GlobalMeanStddevPooling1D, subsample_frame_mask
from .model_api import Model, as_embedding_extractor  # noqa: F401


class XVectorExtended(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        # 10 frame layers (reference xvector_extended.py:25-34).
        x = FrameLayer(512, 5, 1, name="frame1")(x)
        x = FrameLayer(512, 1, 1, name="frame2")(x)
        x = FrameLayer(512, 3, 2, name="frame3")(x)
        x = FrameLayer(512, 1, 1, name="frame4")(x)
        x = FrameLayer(512, 3, 3, name="frame5")(x)
        x = FrameLayer(512, 1, 1, name="frame6")(x)
        x = FrameLayer(512, 3, 4, name="frame7")(x)
        x = FrameLayer(512, 1, 1, name="frame8")(x)
        x = FrameLayer(512, 1, 1, name="frame9")(x)
        x = FrameLayer(1500, 1, 1, name="frame10")(x)
        if mask is not None:
            mask = subsample_frame_mask(mask, 24, x.shape[1])
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


def create(input_shape, num_outputs, output_activation="log_softmax"):
    return Model(
        module=XVectorExtended(num_outputs=num_outputs,
                               output_activation=output_activation),
        input_shape=tuple(input_shape),
        name="x-vector-extended")
