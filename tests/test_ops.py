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


class TestFusedFFN:
    """Pallas fused FFN (occm_tpu.ops.ffn) vs the XLA reference path.

    Runs the kernel in interpret mode on CPU; real-dtype (bf16) numerics
    are exercised on TPU by the bench and tests/test_fast_numerics.py."""

    def _inputs(self, m=300, d=1024, f=4096, dtype=np.float32):
        import jax

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, m // 2, d)) * 0.1, dtype)
        w1 = jnp.asarray(rng.normal(size=(d, f)) * 0.02, dtype)
        b1 = jnp.asarray(rng.normal(size=(f,)) * 0.01, dtype)
        w2 = jnp.asarray(rng.normal(size=(f, d)) * 0.02, dtype)
        b2 = jnp.asarray(rng.normal(size=(d,)) * 0.01, dtype)
        return x, w1, b1, w2, b2

    def test_forward_matches_xla(self):
        from occm_tpu.ops.ffn import _xla_ffn, fused_ffn

        x, w1, b1, w2, b2 = self._inputs()
        y = fused_ffn(x, w1, b1, w2, b2, approximate=True, interpret=True)
        ref = _xla_ffn(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                       approximate=True)
        assert y.shape == x.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_gradients_match_xla(self):
        import jax

        from occm_tpu.ops.ffn import _xla_ffn, fused_ffn

        x, w1, b1, w2, b2 = self._inputs(m=128)

        def loss_fused(args):
            return jnp.sum(fused_ffn(*args, approximate=True,
                                     interpret=True) ** 2)

        def loss_xla(args):
            x, w1, b1, w2, b2 = args
            return jnp.sum(_xla_ffn(x, w1, b1.reshape(1, -1), w2,
                                    b2.reshape(1, -1), True) ** 2)

        g1 = jax.grad(loss_fused)((x, w1, b1, w2, b2))
        g2 = jax.grad(loss_xla)((x, w1, b1, w2, b2))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a),
                                       np.asarray(b).reshape(a.shape),
                                       rtol=1e-3, atol=1e-4)

    def test_small_dims_fall_back_to_xla(self):
        from occm_tpu.ops.ffn import fused_ffn

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 10, 16)), np.float32)
        w1 = jnp.asarray(rng.normal(size=(16, 32)) * 0.1, np.float32)
        b1 = jnp.zeros((32,), np.float32)
        w2 = jnp.asarray(rng.normal(size=(32, 16)) * 0.1, np.float32)
        b2 = jnp.zeros((16,), np.float32)
        y = fused_ffn(x, w1, b1, w2, b2)
        assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()


class TestFastLayerNorm:
    """fast_layer_norm (fused Pallas backward) vs flax nn.LayerNorm /
    XLA autodiff. Kernel runs in interpret mode on CPU."""

    def _inputs(self, m=300, d=1024, dtype=np.float32):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(3, m, d)) * 1.5 + 0.3, dtype)
        gamma = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), np.float32)
        beta = jnp.asarray(0.05 * rng.normal(size=(d,)), np.float32)
        return x, gamma, beta

    def test_forward_matches_flax(self):
        import flax.linen as nn
        import jax

        from occm_tpu.ops.layernorm import fast_layer_norm

        x, gamma, beta = self._inputs()
        y = fast_layer_norm(x, gamma, beta, 1e-6, True)
        ln = nn.LayerNorm(epsilon=1e-6)
        ref = ln.apply({"params": {"scale": gamma, "bias": beta}}, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla_autodiff(self):
        import jax

        from occm_tpu.ops.layernorm import _fwd_math, fast_layer_norm

        x, gamma, beta = self._inputs(m=128)

        def loss_fast(args):
            x, g, b = args
            return jnp.sum(fast_layer_norm(x, g, b, 1e-6, True) ** 2)

        def loss_ref(args):
            x, g, b = args
            return jnp.sum(_fwd_math(x, g, b, 1e-6) ** 2)

        gf = jax.grad(loss_fast)((x, gamma, beta))
        gr = jax.grad(loss_ref)((x, gamma, beta))
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)

    def test_small_dim_fallback_gradients(self):
        import jax

        from occm_tpu.ops.layernorm import _fwd_math, fast_layer_norm

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(4, 10, 48)), np.float32)
        gamma = jnp.ones((48,), np.float32)
        beta = jnp.zeros((48,), np.float32)
        gf = jax.grad(lambda x: jnp.sum(
            fast_layer_norm(x, gamma, beta, 1e-6, True) ** 2))(x)
        gr = jax.grad(lambda x: jnp.sum(
            _fwd_math(x, gamma, beta, 1e-6) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)
