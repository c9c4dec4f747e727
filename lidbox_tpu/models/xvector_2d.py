"""
X-vector with a 2D CNN frequency front-end
(reference: lidbox/models/xvector_2d.py).
"""
from typing import Optional, Tuple

import flax.linen as nn
import jax

from .layers import FrameLayer, GlobalMeanStddevPooling1D, batch_norm, subsample_frame_mask
from .model_api import Model, as_embedding_extractor  # noqa: F401


class FrameLayer2D(nn.Module):
    """Conv2D + BN (+ dropout) block (reference xvector_2d.py:24-62)."""
    filters: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.filters, self.kernel_size, strides=self.strides,
                    padding="VALID", name="conv")(x)
        x = nn.relu(x)
        x = batch_norm(train, name="bn")(x)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class XVector2D(nn.Module):
    num_outputs: int
    output_activation: str = "log_softmax"

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        img = x[..., None]
        img = FrameLayer2D(256, (1, 5), (1, 1), name="frame2d_1")(img, train=train)
        img = FrameLayer2D(128, (1, 3), (1, 2), name="frame2d_2")(img, train=train)
        img = FrameLayer2D(64, (1, 3), (1, 3), name="frame2d_3")(img, train=train)
        img = FrameLayer2D(32, (1, 3), (1, 3), name="frame2d_4")(img, train=train)
        b, t, f, c = img.shape
        x = img.reshape(b, t, f * c)
        x = FrameLayer(512, 5, 1, name="frame1")(x)
        x = FrameLayer(512, 3, 2, name="frame2")(x)
        x = FrameLayer(512, 3, 3, name="frame3")(x)
        x = FrameLayer(512, 1, 1, name="frame4")(x)
        x = FrameLayer(1500, 1, 1, name="frame5")(x)
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


def create(input_shape, num_outputs, output_activation="log_softmax"):
    return Model(
        module=XVector2D(num_outputs=num_outputs,
                         output_activation=output_activation),
        input_shape=tuple(input_shape),
        name="x-vector-2D")
