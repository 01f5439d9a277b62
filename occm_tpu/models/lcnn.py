"""Light CNN (Max-Feature-Map) backend with A-softmax head in Flax
(reference: models/lcnn.py).

Consumes XLSR feature maps as NHWC [B, frames, 1024, 1]; returns class logits
[B, 2], or the (cos_theta, psi_theta) pair when the A-softmax head is active
(reference: models/lcnn.py:66).

Parity notes:
- mfm (reference: models/lcnn.py:121-136): type 1 = conv emitting 2*out
  channels; type 0 = dense emitting 2*out features followed by dropout
  *before* the max (reference applies Dropout inside the filter Sequential).
- group (l.139-149): mfm(in->in, 1x1) then mfm(in->out, kxk); note the BN
  member defined at l.143 is never applied in forward — mirrored here by not
  creating it.
- LCNN (l.151-217): channels c_s=[128,64,32,16,8,4,2]; layer1 uses c_s[5]=4,
  layer2 c_s[4]=8, layer3 c_s[3]=16; 2x2 max pools; BN after pools in
  layer2/3; AdaptiveAvgPool2d((1,64)); MFM-MLP 1024->32->32->8; final head
  AngleLinear(8,2) or Dense(8,2).
- AngleLinear (l.23-83): column-normalised weight, Chebyshev cos(m*theta)
  with m=4, psi = (-1)^k cos(m theta) - 2k.
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from occm_tpu.ops import adaptive_avg_pool2d, max_pool2d, mfm_max

# reference init_weight (models/lcnn.py:219-229)
_conv_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
_dense_init = nn.initializers.xavier_normal()


class MFMConv(nn.Module):
    """mfm type=1 (reference: models/lcnn.py:123-127,133-136)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            2 * self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=self.padding,
            kernel_init=_conv_init,
            name="filter",
        )(x)
        return mfm_max(x, self.out_channels)


class MFMDense(nn.Module):
    """mfm type=0: dense + dropout, then feature-halving max
    (reference: models/lcnn.py:128-131)."""

    out_features: int
    dp_out: float = 0.75

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(
            2 * self.out_features, kernel_init=_dense_init, name="filter"
        )(x)
        if self.dp_out > 0:
            x = nn.Dropout(self.dp_out, deterministic=not train)(x)
        return mfm_max(x, self.out_features)


class MFMGroup(nn.Module):
    """group = 1x1 MFM then kxk MFM (reference: models/lcnn.py:139-149)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):
        x = MFMConv(self.in_channels, 1, 1, 0, name="conv_a")(x)
        x = MFMConv(
            self.out_channels, self.kernel_size, self.stride, self.padding,
            name="conv",
        )(x)
        return x


class AngleLinear(nn.Module):
    """SphereFace angular-margin head (reference: models/lcnn.py:23-83)."""

    out_features: int
    m: int = 4
    phiflag: bool = True

    @nn.compact
    def __call__(self, x, eval_mode: bool = False):
        in_features = x.shape[-1]
        def _init(key, shape, dtype=jnp.float32):
            # weight.uniform_(-1,1) (reference: models/lcnn.py:29)
            return jax.random.uniform(key, shape, dtype, -1.0, 1.0)

        w = self.param("weight", _init, (in_features, self.out_features))

        # renorm(2,1,1e-5).mul(1e5): columns with norm > 1e-5 become unit norm
        col_norm = jnp.linalg.norm(w, axis=0, keepdims=True)
        ww = jnp.where(col_norm > 1e-5, w / jnp.maximum(col_norm, 1e-20),
                       w * 1e5)

        wlen = jnp.linalg.norm(ww, axis=0)  # ~1
        if eval_mode:
            # forward_eval (reference: models/lcnn.py:69-83)
            return (x @ ww) / wlen[None, :]

        xlen = jnp.linalg.norm(x, axis=1)
        cos_theta = (x @ ww) / xlen[:, None] / wlen[None, :]
        cos_theta = jnp.clip(cos_theta, -1.0, 1.0)

        if self.phiflag:
            # mlambda[4] Chebyshev (reference: models/lcnn.py:32-39)
            c = cos_theta
            cos_m_theta = 8 * c**4 - 8 * c**2 + 1
            # theta is detached in torch (Variable(cos_theta.data).acos())
            theta = jnp.arccos(jax.lax.stop_gradient(cos_theta))
            k = jnp.floor(self.m * theta / 3.14159265)
            psi_theta = ((-1.0) ** k) * cos_m_theta - 2.0 * k
        else:
            theta = jnp.arccos(cos_theta)
            x_m = theta * self.m
            psi_theta = (
                1 - x_m**2 / math.factorial(2) + x_m**4 / math.factorial(4)
                - x_m**6 / math.factorial(6) + x_m**8 / math.factorial(8)
                - x_m**9 / math.factorial(9)
            )
            psi_theta = jnp.clip(psi_theta, -1.0 * self.m, 1.0)

        cos_theta = cos_theta * xlen[:, None]
        psi_theta = psi_theta * xlen[:, None]
        return cos_theta, psi_theta


class LCNN(nn.Module):
    """reference: models/lcnn.py:151-217. Input NHWC [B, H, W, 1]."""

    c_s: Tuple[int, ...] = (128, 64, 32, 16, 8, 4, 2)
    asoftmax: bool = True
    phiflag: bool = True
    num_classes: int = 2
    desired_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False, eval_mode: bool = False
                 ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            scale_init=nn.initializers.ones, name=name,
        )
        c = self.c_s
        # layer1: mfm(1->c_s[5], 5x5 p2) + maxpool2
        x = MFMConv(c[5], 5, 1, 2, name="layer1_mfm")(x)
        x = max_pool2d(x, 2)
        # layer2: group(c5->c4) + pool + BN
        x = MFMGroup(c[5], c[4], 3, 1, 1, name="layer2_group")(x)
        x = max_pool2d(x, 2)
        x = bn("layer2_bn")(x)
        # layer3: group(c4->c3) + pool + BN
        x = MFMGroup(c[4], c[3], 3, 1, 1, name="layer3_group")(x)
        x = max_pool2d(x, 2)
        x = bn("layer3_bn")(x)

        x = adaptive_avg_pool2d(x, (1, self.desired_width))
        # flatten in torch NCHW order: [B, C, 1, W] -> [B, C*W]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)

        x = MFMDense(32, dp_out=0.75, name="fc0")(x, train=train)
        x = MFMDense(32, dp_out=0.75, name="fc1")(x, train=train)
        x = MFMDense(8, dp_out=0.0, name="fc2")(x, train=train)

        if self.asoftmax:
            return AngleLinear(
                self.num_classes, phiflag=self.phiflag, name="fc3"
            )(x, eval_mode=eval_mode)
        return nn.Dense(
            self.num_classes, kernel_init=_dense_init, name="fc3"
        )(x)


def lcnn_net(**kwargs) -> LCNN:
    """reference: models/lcnn.py:239-241."""
    return LCNN(**kwargs)
