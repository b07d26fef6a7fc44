"""Inference-only CNN backbones (ResNet / VGG16) in flax, NHWC layout.

These replace the torchvision backbones the reference loads
(``cslam/vpr/cosplace_utils/network.py:38-68``, ``cslam/vpr/netvlad.py:162-171``).
NHWC + bfloat16-friendly convs map straight onto the MXU; BatchNorm runs in
inference mode (folded running statistics), since the framework — like the
reference — is inference-only with downloaded checkpoints.

The module structure intentionally matches the torch graphs one-to-one so
``cslam_tpu.models.convert`` can map torchvision-style state_dicts onto the
flax parameter tree.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax

FEATURES_DIM = {
    "resnet18": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "vgg16": 512,
}

_RESNET_LAYERS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
    "resnet152": ((3, 8, 36, 3), True),
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with stored statistics only (inference mode)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale * jax.lax.rsqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(self.features,
                                       name="downsample_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_features = self.features * 4
        identity = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(self.features, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv2")(y)
        y = FrozenBatchNorm(self.features, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_features, (1, 1), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(out_features, name="bn3")(y)
        if self.stride != 1 or x.shape[-1] != out_features:
            identity = nn.Conv(out_features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(out_features,
                                       name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetFeatures(nn.Module):
    """ResNet trunk without avgpool/fc (what CosPlace keeps,
    ``network.py:55``). Input NHWC float, output ``[N, H/32, W/32, C]``."""

    variant: str = "resnet18"

    @nn.compact
    def __call__(self, x):
        blocks, bottleneck = _RESNET_LAYERS[self.variant]
        block_cls = Bottleneck if bottleneck else BasicBlock
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for stage, (n_blocks, feats) in enumerate(
                zip(blocks, (64, 128, 256, 512))):
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(feats, stride,
                              name=f"layer{stage + 1}_{b}")(x)
        return x


# VGG16 'features' conv plan (torchvision indices); 'M' = maxpool.
_VGG16_PLAN: Sequence[Any] = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                              512, 512, 512, "M", 512, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 convolutional trunk truncated like the reference: both NetVLAD
    and CosPlace drop the last ReLU + maxpool (``netvlad.py:164-165``,
    ``network.py:57-59``), ending at conv5_3 *pre-activation*."""

    @nn.compact
    def __call__(self, x):
        conv_idx = 0
        for item in _VGG16_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(item, (3, 3), padding=1, name=f"conv{conv_idx}")(x)
                conv_idx += 1
                if conv_idx < 13:  # last conv keeps no ReLU (truncated [:-2])
                    x = nn.relu(x)
        return x


def make_backbone(name: str) -> Tuple[nn.Module, int]:
    """(module, feature channels) for a backbone name
    (reference ``network.py:38-68``)."""
    name = name.lower()
    if name.startswith("resnet"):
        return ResNetFeatures(variant=name), FEATURES_DIM[name]
    if name == "vgg16":
        return VGG16Features(), FEATURES_DIM[name]
    raise ValueError(f"unknown backbone: {name}")
