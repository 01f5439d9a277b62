"""Plain CNN spectrogram-map backends in Flax (reference: models/cnn.py).

Four small classifiers over XLSR feature maps. Layout is NHWC (TPU-native):
inputs are [B, frames, feat, C] where the reference uses [B, C, frames, feat].

Parity notes:
- cnn_net (reference: models/cnn.py:149-189): conv(1->8->16->32, k3, p1) with
  BN after each ReLU'd conv, 2x2 max pools after the first two, adaptive avg
  pool to (1, 256), then 8192->128->64->2 MLP with dropout 0.5.
- cnn_net_basic (l.117-148): no BN, adaptive width 4096.
- cnn_net_complex (l.69-116): 2 input channels, widths 4/8/16.
- cnn_net_with_attention (l.20-66): SpatialAttention (1x1 conv -> sigmoid
  gate, l.5-18) after conv1 and conv3.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from occm_tpu.ops import adaptive_avg_pool2d, max_pool2d


class SpatialAttention(nn.Module):
    """1x1-conv sigmoid spatial gate (reference: models/cnn.py:5-18)."""

    @nn.compact
    def __call__(self, x):
        w = nn.Conv(1, kernel_size=(1, 1), name="conv")(x)
        return x * nn.sigmoid(w)


class CNNNet(nn.Module):
    """cnn_net (reference: models/cnn.py:149-189)."""

    desired_width: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        x = nn.relu(nn.Conv(8, (3, 3), padding=1, name="conv1")(x))
        x = bn("bn1")(x)
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(16, (3, 3), padding=1, name="conv2")(x))
        x = bn("bn2")(x)
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(32, (3, 3), padding=1, name="conv3")(x))
        x = bn("bn3")(x)

        x = adaptive_avg_pool2d(x, (1, self.desired_width))
        # reference flattens NCHW [B, 32, 1, W] -> [B, 32*W]; transpose so the
        # flattened order matches channel-major
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(64, name="fc2")(x))
        return nn.Dense(2, name="fc3")(x)


class CNNNetBasic(nn.Module):
    """cnn_net_basic (reference: models/cnn.py:117-148)."""

    desired_width: int = 4096

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Conv(8, (3, 3), padding=1, name="conv1")(x))
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(16, (3, 3), padding=1, name="conv2")(x))
        x = max_pool2d(x, 2)
        x = adaptive_avg_pool2d(x, (1, self.desired_width))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        x = nn.relu(nn.Dense(64, name="fc2")(x))
        return nn.Dense(2, name="fc3")(x)


class CNNNetComplex(nn.Module):
    """cnn_net_complex, 2-channel input (reference: models/cnn.py:69-116)."""

    desired_width: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        x = nn.relu(nn.Conv(4, (3, 3), padding=1, name="conv1")(x))
        x = bn("bn1")(x)
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(8, (3, 3), padding=1, name="conv2")(x))
        x = bn("bn2")(x)
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(16, (3, 3), padding=1, name="conv3")(x))
        x = bn("bn3")(x)
        x = adaptive_avg_pool2d(x, (1, self.desired_width))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(64, name="fc2")(x))
        return nn.Dense(2, name="fc3")(x)


class CNNNetWithAttention(nn.Module):
    """cnn_net_with_attention (reference: models/cnn.py:20-66)."""

    desired_width: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=name,
        )
        x = nn.relu(nn.Conv(8, (3, 3), padding=1, name="conv1")(x))
        x = bn("bn1")(x)
        x = SpatialAttention(name="attention1")(x)
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(16, (3, 3), padding=1, name="conv2")(x))
        x = bn("bn2")(x)
        x = max_pool2d(x, 2)
        x = nn.relu(nn.Conv(32, (3, 3), padding=1, name="conv3")(x))
        x = bn("bn3")(x)
        x = SpatialAttention(name="attention3")(x)
        x = adaptive_avg_pool2d(x, (1, self.desired_width))
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(128, name="fc1")(x))
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.relu(nn.Dense(64, name="fc2")(x))
        return nn.Dense(2, name="fc3")(x)
