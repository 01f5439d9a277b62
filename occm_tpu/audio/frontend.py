"""Device-resident audio batching frontend.

The reference bounds sequence length instead of scaling it: every training
utterance is repeat-padded / cropped to 64600 samples (~4 s at 16 kHz) on the
host with np.tile (reference: data_utils_SSL.py:47-54), and the meta-batch
path zero-pads to the in-group maximum (reference: oc_training.py:244-249).

Here the repeat-pad/crop is a jittable gather — `out[i] = x[i mod length]` —
so a whole batch of raw decoded buffers moves to the device once and is
shaped there, keeping XLA shapes static (one compile per `max_len` bucket).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def pad(x: np.ndarray, max_len: int = 64600) -> np.ndarray:
    """Host-side repeat-pad/crop, bit-compatible with the reference
    (reference: data_utils_SSL.py:47-54)."""
    x_len = x.shape[0]
    if x_len >= max_len:
        return x[:max_len]
    num_repeats = int(max_len / x_len) + 1
    return np.tile(x, num_repeats)[:max_len]


@partial(jax.jit, static_argnames=("max_len",))
def repeat_pad_crop(x: jnp.ndarray, length: jnp.ndarray, max_len: int = 64600
                    ) -> jnp.ndarray:
    """Jittable repeat-pad/crop of a single buffer.

    x: [T_buf] zero-padded storage with `length` valid leading samples
    (length may be a traced scalar). Returns [max_len] where
    out[i] = x[i mod length] — identical semantics to np.tile-then-crop for
    any length, including length > max_len (crop).
    """
    idx = jnp.arange(max_len, dtype=jnp.int32)
    idx = jnp.remainder(idx, jnp.maximum(length, 1).astype(jnp.int32))
    return jnp.take(x, idx, axis=0)


@partial(jax.jit, static_argnames=("max_len",))
def batch_repeat_pad_crop(x: jnp.ndarray, lengths: jnp.ndarray,
                          max_len: int = 64600) -> jnp.ndarray:
    """Batched repeat-pad/crop: x [B, T_buf], lengths [B] -> [B, max_len]."""
    return jax.vmap(lambda xi, li: repeat_pad_crop(xi, li, max_len))(
        x, lengths
    )


def zero_pad_to_max(features: Sequence[np.ndarray]) -> np.ndarray:
    """Host-side trailing zero-pad to the in-group maximum length, as the
    meta-batch assembly does (reference: oc_training.py:244-249).
    Returns [len(features), max_len] float32."""
    max_length = max(int(f.shape[0]) for f in features)
    out = np.zeros((len(features), max_length), dtype=np.float32)
    for i, f in enumerate(features):
        out[i, : f.shape[0]] = f
    return out
