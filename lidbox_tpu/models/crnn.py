"""
CRNN, Bartz et al. (2017) "Language identification using deep convolutional
recurrent neural networks". (reference: lidbox/models/crnn.py)

Note the reference default output activation is plain softmax, not
log_softmax (reference crnn.py:24).
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import BidirectionalRNN, batch_norm, mask_to_lengths
from .model_api import Model


class CRNN(nn.Module):
    num_outputs: int
    output_activation: str = "softmax"
    # Matches reference kernel_regularizer=l2(0.001) on the conv stack
    # (crnn.py:30-38); ModelWrapper.from_config translates this into a
    # coupled optax.add_decayed_weights transform on conv kernels.
    weight_decay: float = 0.001

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        # [B, T, F] -> image [B, F, T, 1] (freq bins first, reference crnn.py:27-29)
        img = x.transpose(0, 2, 1)[..., None]
        # Valid time-column count per stage: SAME convs keep it, VALID 2x2
        # pools halve it. Zeroing the invalid columns before every conv
        # makes each stage see exactly what a trimmed input's SAME zero
        # padding would provide, so valid outputs reproduce trimmed
        # numerics (eval mode; train-mode batch-norm stats still see the
        # zeroed columns, like the reference's padded batches would).
        lengths = mask_to_lengths(mask)
        for i, (f, k) in enumerate(zip((16, 32, 64, 128, 256), (7, 5, 3, 3, 3)), start=1):
            if lengths is not None:
                tmask = jnp.arange(img.shape[2])[None, :] < lengths[:, None]
                img = img * tmask[:, None, :, None].astype(img.dtype)
            img = nn.relu(nn.Conv(f, (k, k), padding="SAME", name=f"conv_{i}")(img))
            img = batch_norm(train, name=f"conv_{i}_bn")(img)
            img = nn.max_pool(img, (2, 2), strides=(2, 2))
            if lengths is not None:
                lengths = lengths // 2
        # [B, F', T', C] -> timesteps first, flatten channels (crnn.py:43-46)
        b, fr, t, c = img.shape
        seq = img.transpose(0, 2, 1, 3).reshape(b, t, fr * c)
        if lengths is not None:
            lengths = jnp.maximum(lengths, 1)
        x = BidirectionalRNN(256, return_sequences=False,
                             name="blstm")(seq, lengths=lengths)
        if output == "embedding":
            return x
        x = nn.Dense(self.num_outputs, name="output")(x)
        if self.output_activation:
            x = getattr(nn, self.output_activation)(x)
        return x


def create(input_shape, num_outputs, output_activation="softmax", weight_decay=0.001):
    return Model(
        module=CRNN(num_outputs=num_outputs, output_activation=output_activation,
                    weight_decay=weight_decay),
        input_shape=tuple(input_shape),
        name="CRNN")
