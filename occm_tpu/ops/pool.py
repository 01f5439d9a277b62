"""Pooling ops with exact PyTorch semantics, NHWC layout.

The reference backends rely on three torch pooling behaviours that differ
from the obvious JAX one-liners:

- `nn.AdaptiveAvgPool2d((oh, ow))` (reference: models/lcnn.py:172,
  models/cnn.py:35,81,124, models/senet.py:16,82): variable-size windows
  start=floor(i*H/oh), end=ceil((i+1)*H/oh). Implemented with an integral
  image (cumsum + static gathers) so any (H, oh) pair stays one fused XLA
  program with static shapes.
- `F.max_pool2d` / `nn.MaxPool2d` default stride=kernel, floor mode
  (reference: models/sslassist.py:514, models/lcnn.py:159) and -inf padding
  when padding>0 (reference: models/senet.py:76).
- global average pool = AdaptiveAvgPool2d(1) (reference: models/senet.py:16).

All functions take NHWC (TPU-native layout).
"""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _adaptive_bounds(in_size: int, out_size: int):
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int64)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(
        np.int64
    )
    return starts, ends


def _adaptive_pool_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    starts, ends = _adaptive_bounds(in_size, out_size)
    # integral image along `axis` with a leading zero slab
    cs = jnp.cumsum(x, axis=axis)
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (1, 0)
    cs = jnp.pad(cs, pad_widths)
    window_sums = jnp.take(cs, ends, axis=axis) - jnp.take(cs, starts, axis=axis)
    counts = (ends - starts).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_size
    return window_sums / jnp.asarray(counts).reshape(shape)


def adaptive_avg_pool2d(x: jnp.ndarray,
                        output_size: Union[int, Tuple[int, int]]) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d on NHWC input [..., H, W, C]."""
    oh, ow = _pair(output_size)
    x = _adaptive_pool_axis(x, oh, axis=-3)
    x = _adaptive_pool_axis(x, ow, axis=-2)
    return x


def global_avg_pool2d(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) + flatten: [..., H, W, C] -> [..., C]."""
    return jnp.mean(x, axis=(-3, -2))


def max_pool2d(x: jnp.ndarray, kernel, stride=None, padding=0) -> jnp.ndarray:
    """torch F.max_pool2d on NHWC input (floor mode, -inf padding)."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    ph, pw = _pair(padding)

    if ph or pw:
        neg = (
            jnp.finfo(x.dtype).min
            if jnp.issubdtype(x.dtype, jnp.floating)
            else jnp.iinfo(x.dtype).min
        )
        pad_widths = [(0, 0)] * (x.ndim - 3) + [(ph, ph), (pw, pw), (0, 0)]
        x = jnp.pad(x, pad_widths, constant_values=neg)

    h, w = x.shape[-3], x.shape[-2]
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    # crop so VALID reduce_window reproduces torch's floor mode
    x = x[..., : (oh - 1) * sh + kh, : (ow - 1) * sw + kw, :]

    import jax.lax as lax

    window = (1,) * (x.ndim - 3) + (kh, kw, 1)
    strides = (1,) * (x.ndim - 3) + (sh, sw, 1)
    neg = (
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
        else jnp.iinfo(x.dtype).min
    )
    return lax.reduce_window(x, neg, lax.max, window, strides, "VALID")


def avg_pool2d(x: jnp.ndarray, kernel, stride=None) -> jnp.ndarray:
    """torch F.avg_pool2d (no padding, floor mode) on NHWC."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride) if stride is not None else (kh, kw)
    h, w = x.shape[-3], x.shape[-2]
    oh = (h - kh) // sh + 1
    ow = (w - kw) // sw + 1
    x = x[..., : (oh - 1) * sh + kh, : (ow - 1) * sw + kw, :]

    import jax.lax as lax

    window = (1,) * (x.ndim - 3) + (kh, kw, 1)
    strides = (1,) * (x.ndim - 3) + (sh, sw, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, "VALID")
    return summed / (kh * kw)
