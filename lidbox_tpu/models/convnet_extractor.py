"""
ResNet50V2 / MobileNetV2 trunk over spectrogram-as-image for training
embedding spaces (reference: lidbox/models/convnet_extractor.py).

The trunks are compact Flax implementations of the Keras architectures the
reference instantiates with ``weights=None`` (random init — so architecture
shape, not pretrained weights, is the contract):

- ResNet50V2: pre-activation bottleneck ResNet, stage depths (3, 4, 6, 3)
  (He et al. 2016, "Identity Mappings in Deep Residual Networks").
- MobileNetV2: inverted residual bottlenecks with expansion 6
  (Sandler et al. 2018).
"""
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import batch_norm, global_avg_pool_1d
from .model_api import Model


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck: BN-relu -> 1x1 -> 3x3 -> 1x1, identity or
    projection shortcut."""
    filters: int
    stride: int = 1
    project: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pre = nn.relu(batch_norm(train, name="preact_bn")(x))
        if self.project or self.stride > 1 or x.shape[-1] != 4 * self.filters:
            shortcut = nn.Conv(4 * self.filters, (1, 1), strides=(self.stride,) * 2,
                               name="shortcut")(pre)
        else:
            shortcut = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="conv1")(pre)
        y = nn.relu(batch_norm(train, name="bn1")(y))
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, name="conv2")(y)
        y = nn.relu(batch_norm(train, name="bn2")(y))
        y = nn.Conv(4 * self.filters, (1, 1), name="conv3")(y)
        return shortcut + y


class ResNet50V2(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME", name="stem_conv")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for stage, blocks in enumerate(self.stage_sizes):
            filters = 64 * 2 ** stage
            for block in range(blocks):
                stride = 2 if (block == blocks - 1 and stage < 3) else 1
                x = BottleneckV2(filters, stride=stride, project=(block == 0),
                                 name=f"stage{stage + 1}_block{block + 1}")(x, train=train)
        x = nn.relu(batch_norm(train, name="post_bn")(x))
        return x


class InvertedResidual(nn.Module):
    filters: int
    stride: int = 1
    expansion: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = x
        if self.expansion != 1:
            y = nn.Conv(self.expansion * in_ch, (1, 1), use_bias=False, name="expand")(y)
            y = nn.relu6(batch_norm(train, name="expand_bn")(y))
        y = nn.Conv(self.expansion * in_ch if self.expansion != 1 else in_ch,
                    (3, 3), strides=(self.stride,) * 2, padding="SAME",
                    feature_group_count=y.shape[-1], use_bias=False,
                    name="depthwise")(y)
        y = nn.relu6(batch_norm(train, name="depthwise_bn")(y))
        y = nn.Conv(self.filters, (1, 1), use_bias=False, name="project")(y)
        y = batch_norm(train, name="project_bn")(y)
        if self.stride == 1 and in_ch == self.filters:
            y = x + y
        return y


class MobileNetV2(nn.Module):
    # (expansion, filters, repeats, first-stride)
    config: Sequence = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                        (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                        (6, 320, 1, 1))

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                    name="stem_conv")(x)
        x = nn.relu6(batch_norm(train, name="stem_bn")(x))
        for i, (t, c, n, s) in enumerate(self.config):
            for j in range(n):
                x = InvertedResidual(c, stride=s if j == 0 else 1, expansion=t,
                                     name=f"block{i + 1}_{j + 1}")(x, train=train)
        x = nn.Conv(1280, (1, 1), use_bias=False, name="head_conv")(x)
        x = nn.relu6(batch_norm(train, name="head_bn")(x))
        return x


class ConvnetExtractor(nn.Module):
    num_outputs: int
    core: str = "resnet50_v2"
    embedding_dim: int = 512
    output_activation: str = "log_softmax"
    channel_dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False, mask: Optional[jax.Array] = None,
                 output: str = "logits"):
        """``mask`` support is APPROXIMATE for this model (unlike the
        causal zoo, which is masked-vs-trimmed exact): the image trunks
        use SAME-padded 2-D convs, so boundary frames within one receptive
        field of the pad edge differ from a trimmed forward. The input's
        padded frames are zeroed and the final pooling runs over a
        stride-subsampled mask, which removes the dominant error (pooling
        over pure padding) — it used to be silently ignored entirely."""
        if self.channel_dropout_rate > 0:
            x = nn.Dropout(self.channel_dropout_rate, broadcast_dims=(1,),
                           deterministic=not train, name="channel_dropout")(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        img = x[..., None]
        trunk = {"resnet50_v2": ResNet50V2, "mobilenet_v2": MobileNetV2}[self.core]
        img = trunk(name=self.core)(img, train=train)
        b, t, f, c = img.shape
        seq = img.reshape(b, t, f * c)
        pooled_mask = None
        if mask is not None:
            # both trunks downsample time by 32 (SAME/ceil); a coarse
            # frame is valid iff any of its input frames is valid
            t_in = mask.shape[-1]
            pad = t * 32 - t_in
            m = jnp.broadcast_to(mask, (b, t_in)).astype(jnp.int32)
            m = jnp.pad(m, ((0, 0), (0, max(pad, 0))))
            pooled_mask = m[:, :t * 32].reshape(b, t, 32).max(axis=2) > 0
        # Time-distributed embedding layer (reference convnet_extractor.py:38-42).
        emb = nn.Dense(self.embedding_dim, name="embedding")(seq)
        if output == "embedding":
            # Reference extract_embeddings cuts at the "embedding" layer
            # output, keeping the timesteps (convnet_extractor.py:52-54);
            # we pool it for a fixed-size vector.
            return global_avg_pool_1d(emb, mask=pooled_mask)
        emb = nn.relu(emb)
        emb = batch_norm(train, name="embedding_bn")(emb)
        pooled = global_avg_pool_1d(emb, mask=pooled_mask)
        out = nn.Dense(self.num_outputs, name="output")(pooled)
        if self.output_activation:
            out = getattr(nn, self.output_activation)(out)
        return out


def create(input_shape, num_outputs, core="resnet50_v2", embedding_dim=512,
           output_activation="log_softmax", channel_dropout_rate=0):
    return Model(
        module=ConvnetExtractor(num_outputs=num_outputs, core=core,
                                embedding_dim=embedding_dim,
                                output_activation=output_activation,
                                channel_dropout_rate=channel_dropout_rate),
        input_shape=tuple(input_shape),
        name=f"{core}_extractor")


def as_embedding_extractor(model):
    from .model_api import as_embedding_extractor as _gen
    return _gen(model)
