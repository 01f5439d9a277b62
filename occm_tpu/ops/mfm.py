"""Max-Feature-Map activation (reference: models/lcnn.py:121-136).

The producing layer emits 2*out features; MFM takes the elementwise max of
the two halves. torch splits on the channel dim of NCHW; here features live
on the last axis (NHWC / dense outputs), so the split is on axis -1.
"""

from __future__ import annotations

import jax.numpy as jnp


def mfm_max(x: jnp.ndarray, out_features: int) -> jnp.ndarray:
    """x[..., 2*out_features] -> max(x[..., :out], x[..., out:])."""
    a = x[..., :out_features]
    b = x[..., out_features: 2 * out_features]
    return jnp.maximum(a, b)
