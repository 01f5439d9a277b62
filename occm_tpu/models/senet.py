"""SE-ResNet34/12 dual-head backend in Flax (reference: models/senet.py).

Consumes XLSR feature maps as NHWC [B, frames, 1024, 1] and returns
(com [B,128], des [B,2]) — the compactness embedding and descriptiveness
logits (reference: models/senet.py:120-142).

Parity notes:
- SELayer (reference: models/senet.py:13-28): global avg pool -> channel//16
  bottleneck (no bias) -> sigmoid channel gate.
- SEBasicBlock (l.31-61): conv3x3-bn-relu-conv3x3-bn-SE + residual, relu.
- Stem: conv7x7 s2 p3 (no bias), bn, relu, maxpool3x3 s2 p1 (l.73-76).
- Stages [3,4,6,3] with channels [16,16,32,64,128] and stride-2 downsample
  1x1-conv+bn shortcuts (l.95-110).
- Heads: embedding Linear(128,128), classifier Linear(128,2) (l.85-86).
- Conv weights use kaiming-normal fan_out/relu, BN gamma=1 beta=0 (l.88-93).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from occm_tpu.ops import global_avg_pool2d, max_pool2d

# torch kaiming_normal_(mode='fan_out', nonlinearity='relu') for conv kernels
_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


def _bn(train: bool, name: str):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class SELayer(nn.Module):
    """Squeeze-and-excitation gate (reference: models/senet.py:13-28)."""

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = global_avg_pool2d(x)  # [B, C]
        y = nn.relu(
            nn.Dense(self.channel // self.reduction, use_bias=False,
                     name="fc1")(y)
        )
        y = nn.sigmoid(
            nn.Dense(self.channel, use_bias=False, name="fc2")(y)
        )
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """reference: models/senet.py:31-61."""

    planes: int
    stride: int = 1
    downsample: bool = False
    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = nn.Conv(
            self.planes, (3, 3), strides=self.stride, padding=1,
            use_bias=False, kernel_init=_conv_init, name="conv1",
        )(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=1, padding=1, use_bias=False,
            kernel_init=_conv_init, name="conv2",
        )(out)
        out = _bn(train, "bn2")(out)
        out = SELayer(self.planes, self.reduction, name="se")(out)

        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=self.stride, use_bias=False,
                kernel_init=_conv_init, name="downsample_conv",
            )(x)
            residual = _bn(train, "downsample_bn")(residual)

        return nn.relu(out + residual)


class SEResNet(nn.Module):
    """Dual-head SE-ResNet (reference: models/senet.py:64-152).

    Input NHWC [B, H, W, 1]; returns (com [B,128], des [B,num_classes]).
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    channels: Sequence[int] = (16, 16, 32, 64, 128)
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(
            self.channels[0], (7, 7), strides=2, padding=3, use_bias=False,
            kernel_init=_conv_init, name="conv1",
        )(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = max_pool2d(x, kernel=3, stride=2, padding=1)

        inplanes = self.channels[0]
        for stage, (planes, blocks) in enumerate(
            zip(self.channels[1:], self.layers), start=1
        ):
            stride = 1 if stage == 1 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                down = b == 0 and (s != 1 or inplanes != planes)
                x = SEBasicBlock(
                    planes, stride=s, downsample=down,
                    name=f"layer{stage}_{b}",
                )(x, train=train)
                inplanes = planes

        x = global_avg_pool2d(x)  # [B, 128]
        com = nn.Dense(128, name="embedding")(x)
        des = nn.Dense(self.num_classes, name="classifier")(x)
        return com, des


def se_resnet34(**kwargs) -> SEResNet:
    """reference: models/senet.py:154-156."""
    return SEResNet(layers=(3, 4, 6, 3), **kwargs)


def se_resnet12(**kwargs) -> SEResNet:
    """reference: models/senet.py:158-160."""
    return SEResNet(layers=(1, 2, 3, 1), **kwargs)
