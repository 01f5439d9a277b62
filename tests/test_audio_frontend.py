"""Repeat-pad/crop parity tests (reference: data_utils_SSL.py:47-54,
oc_training.py:244-249)."""

import numpy as np
import jax.numpy as jnp

from occm_tpu.audio import (
    batch_repeat_pad_crop,
    pad_numpy,
    repeat_pad_crop,
    zero_pad_to_max,
)


def _reference_pad(x, max_len=64600):
    # literal np.tile formulation from the reference for oracle purposes
    x_len = x.shape[0]
    if x_len >= max_len:
        return x[:max_len]
    num_repeats = int(max_len / x_len) + 1
    return np.tile(x, (1, num_repeats))[:, :max_len][0]


def test_pad_numpy_matches_reference_short_and_long():
    rng = np.random.default_rng(0)
    for n in [1, 7, 100, 64599, 64600, 64601, 120000]:
        x = rng.normal(size=n).astype(np.float32)
        np.testing.assert_array_equal(pad_numpy(x, 64600), _reference_pad(x))


def test_jit_repeat_pad_crop_matches_numpy():
    rng = np.random.default_rng(1)
    max_len = 700
    for n in [3, 123, 699, 700, 701, 1500]:
        x = rng.normal(size=n).astype(np.float32)
        buf_len = max(n, max_len)
        buf = np.zeros(buf_len, dtype=np.float32)
        buf[:n] = x
        out = np.asarray(repeat_pad_crop(jnp.array(buf), jnp.int32(n), max_len))
        np.testing.assert_array_equal(out, pad_numpy(x, max_len))


def test_batched_repeat_pad_crop():
    rng = np.random.default_rng(2)
    max_len = 320
    lens = np.array([10, 320, 500], dtype=np.int32)
    buf = np.zeros((3, 500), dtype=np.float32)
    for i, n in enumerate(lens):
        buf[i, :n] = rng.normal(size=n)
    out = np.asarray(batch_repeat_pad_crop(jnp.array(buf), jnp.array(lens), max_len))
    assert out.shape == (3, max_len)
    for i, n in enumerate(lens):
        np.testing.assert_array_equal(out[i], pad_numpy(buf[i, :n], max_len))


def test_zero_pad_to_max():
    xs = [np.ones(3, np.float32), np.ones(5, np.float32) * 2]
    out = zero_pad_to_max(xs)
    assert out.shape == (2, 5)
    np.testing.assert_array_equal(out[0], [1, 1, 1, 0, 0])
    np.testing.assert_array_equal(out[1], [2, 2, 2, 2, 2])
