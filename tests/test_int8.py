"""W8A8 int8 serving path tests (occm_tpu/ops/int8.py + Int8Dense).

The accuracy methodology follows the round-2 weight-only experiment
(tools/exp_int8_scoring.py: cosine 0.9996 at tiny scale); here the full
W8A8 path — dynamic activation quant + int8 MXU dots — must stay close to
the fp32 forward and keep one-class decisions stable."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from occm_tpu.config import XLSRConfig
from occm_tpu.models import XLSREncoder
from occm_tpu.ops.int8 import (
    int8_matmul,
    quantize_params_int8,
    quantize_weight_int8,
)


def test_quantize_weight_shapes_and_roundtrip():
    gen = np.random.default_rng(0)
    w = gen.normal(size=(4, 8, 16)).astype(np.float32)  # stacked [L,in,out]
    q, s = quantize_weight_int8(w)
    assert q.shape == w.shape and q.dtype == np.int8
    assert s.shape == (4, 16)
    deq = q.astype(np.float32) * s[:, None, :]
    rel = np.linalg.norm(deq - w) / np.linalg.norm(w)
    assert rel < 0.005
    # max magnitude per output channel hits 127 exactly (symmetric scale)
    assert np.abs(q).max() == 127


def test_int8_matmul_matches_dequantized_reference():
    gen = np.random.default_rng(1)
    x = gen.normal(size=(6, 32)).astype(np.float32)
    w = gen.normal(size=(32, 24)).astype(np.float32)
    b = gen.normal(size=(24,)).astype(np.float32)
    q, s = quantize_weight_int8(w)

    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(q),
                                 jnp.asarray(s), jnp.asarray(b)))

    # reference: quantise activations the same way, exact int32 accumulate
    amax = np.abs(x).max(axis=-1, keepdims=True)
    sx = np.maximum(amax, 1e-12) / 127.0
    xq = np.clip(np.round(x / sx), -127, 127).astype(np.int32)
    ref = (xq @ q.astype(np.int32)).astype(np.float32) * sx * s + b
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-5)

    # and it approximates the fp32 matmul
    exact = x @ w + b
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.02


def test_int8_encoder_close_to_fp32():
    """Full tiny encoder: quantize_params_int8 tree -> quant_int8=True
    forward stays close (cosine) to the fp32 forward."""
    cfg = dataclasses.replace(XLSRConfig.tiny())
    gen = np.random.default_rng(2)
    x = jnp.asarray(gen.normal(size=(4, 3200)).astype(np.float32) * 0.1)

    enc = XLSREncoder(cfg)
    params = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        x,
    )["params"]
    ref = np.asarray(enc.apply({"params": params}, x))

    qparams = quantize_params_int8(params)
    # layout check: stacked transformer kernels became int8 + scales
    fc1 = qparams["layers"]["layer"]["fc1"]
    assert fc1["kernel_q"].dtype == jnp.int8
    assert fc1["scale"].shape == (cfg.encoder_layers, cfg.encoder_ffn_dim)
    assert "kernel" not in fc1
    # conv stem untouched
    assert "kernel" in qparams["feature_extractor"]["conv_0"]

    qenc = XLSREncoder(dataclasses.replace(cfg, quant_int8=True))
    got = np.asarray(qenc.apply({"params": qparams}, x))
    assert got.shape == ref.shape

    cos = float(
        np.vdot(got.ravel(), ref.ravel())
        / (np.linalg.norm(got) * np.linalg.norm(ref) + 1e-20)
    )
    assert cos > 0.99, f"int8 encoder cosine {cos}"
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.15, f"int8 encoder rel L2 {rel}"
