"""Pooling-op parity tests against torch functional ops (the reference's
backends depend on exact torch pooling semantics)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from occm_tpu.ops import adaptive_avg_pool2d, max_pool2d, mfm_max


def _nchw(x_nhwc):
    return torch.tensor(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _to_nhwc(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "hw,out", [((25, 128), (1, 64)), ((201, 1024), (1, 256)),
               ((7, 13), (3, 5)), ((10, 10), (10, 10))]
)
def test_adaptive_avg_pool2d_matches_torch(hw, out):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, *hw, 3)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.array(x), out))
    theirs = _to_nhwc(F.adaptive_avg_pool2d(_nchw(x), out))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize(
    "kernel,stride,padding,hw",
    [(3, None, 0, (128, 201)), (2, None, 0, (41, 33)),
     (3, 2, 1, (101, 512)), ((3, 3), (3, 3), 0, (128, 67))],
)
def test_max_pool2d_matches_torch(kernel, stride, padding, hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, *hw, 4)).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.array(x), kernel, stride, padding))
    theirs = _to_nhwc(
        F.max_pool2d(_nchw(x), kernel, stride=stride, padding=padding)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_mfm_max():
    x = jnp.arange(8.0).reshape(1, 8)
    out = mfm_max(x, 4)
    np.testing.assert_array_equal(np.asarray(out)[0], [4, 5, 6, 7])
