"""Shape/dtype smoke tests for every Flax model family (SURVEY.md §4b).

Tiny inputs mirror the reference's smoke blocks
(reference: models/sslassist.py:599-607, models/senet.py:188-195,
models/lcnn.py:270-277, models/occm.py:69-78, models/cnn.py:213-222),
but run on synthetic tensors instead of hard-coded wav paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.config import AASISTConfig, XLSRConfig
from occm_tpu.models import (
    AASISTBackend,
    AModel,
    CNNNet,
    CNNNetBasic,
    CNNNetComplex,
    CNNNetWithAttention,
    LCNN,
    OCCM,
    SSLLCNN,
    SSLResNet34,
    TotalCNNNet,
    se_resnet12,
    se_resnet34,
)

KEY = jax.random.PRNGKey(0)


def _feat_map(b=2, frames=60, feat=96, c=1):
    rng = np.random.default_rng(0)
    return jnp.array(rng.normal(size=(b, frames, feat, c)), jnp.float32)


def _init_apply(model, x, **kwargs):
    variables = model.init({"params": KEY, "dropout": KEY}, x, **kwargs)
    return model.apply(variables, x, **kwargs), variables


def test_cnn_net_shapes():
    out, _ = _init_apply(CNNNet(), _feat_map())
    assert out.shape == (2, 2)


def test_cnn_net_basic_shapes():
    out, _ = _init_apply(CNNNetBasic(), _feat_map())
    assert out.shape == (2, 2)


def test_cnn_net_complex_shapes():
    out, _ = _init_apply(CNNNetComplex(), _feat_map(c=2))
    assert out.shape == (2, 2)


def test_cnn_net_attention_shapes():
    out, _ = _init_apply(CNNNetWithAttention(), _feat_map())
    assert out.shape == (2, 2)


def test_se_resnet34_dual_head():
    (com, des), _ = _init_apply(se_resnet34(), _feat_map())
    assert com.shape == (2, 128)
    assert des.shape == (2, 2)


def test_se_resnet12_dual_head():
    (com, des), _ = _init_apply(se_resnet12(), _feat_map())
    assert com.shape == (2, 128)
    assert des.shape == (2, 2)


def test_lcnn_plain_head():
    out, _ = _init_apply(LCNN(asoftmax=False), _feat_map())
    assert out.shape == (2, 2)


def test_lcnn_asoftmax_heads():
    model = LCNN(asoftmax=True)
    x = _feat_map()
    (cos_t, psi_t), variables = _init_apply(model, x)
    assert cos_t.shape == (2, 2)
    assert psi_t.shape == (2, 2)
    # psi <= cos for theta in [0, pi/2) region can be violated; just check
    # the eval head returns a single tensor
    ev = model.apply(variables, x, eval_mode=True)
    assert ev.shape == (2, 2)


def test_aasist_backend_shapes_201_frames():
    # 201 frames = 64600 samples through the stride-320 XLSR conv stack
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(2, 201, 1024)), jnp.float32)
    model = AASISTBackend(AASISTConfig())
    (emb, logits), variables = _init_apply(model, x)
    assert emb.shape == (2, 160)
    assert logits.shape == (2, 2)

    # train mode keeps the same shapes and updates batch stats
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": KEY},
    )
    assert out[0].shape == (2, 160)
    assert "batch_stats" in mutated


def test_xlsr_tiny_frame_math():
    from occm_tpu.models import XLSREncoder

    cfg = XLSRConfig.tiny()
    # conv stack: k10s5, k3s2, k2s2 -> (3200-10)/5+1=639 -> 319 -> 159
    wave = jnp.array(
        np.random.default_rng(2).normal(size=(2, 3200)), jnp.float32
    )
    model = XLSREncoder(cfg)
    variables = model.init({"params": KEY, "dropout": KEY}, wave)
    feats = model.apply(variables, wave)
    assert feats.shape == (2, 159, cfg.out_dim)
    assert feats.dtype == jnp.float32
    # scan stacks the layer params: [L, ...]
    stacked = jax.tree_util.tree_leaves(
        variables["params"]["layers"]
    )[0]
    assert stacked.shape[0] == cfg.encoder_layers


def test_amodel_end_to_end_tiny():
    cfg = XLSRConfig.tiny()
    wave = jnp.array(
        np.random.default_rng(3).normal(size=(2, 3200)), jnp.float32
    )
    # pos_S is always 42 nodes: LL emits 128 features and maxpool(3,3)
    # reduces that axis to 42 regardless of the XLSR width
    model = AModel(AASISTConfig(), xlsr_cfg=cfg)
    variables = model.init({"params": KEY, "dropout": KEY}, wave)
    emb, logits = model.apply(variables, wave)
    assert emb.shape == (2, 160)
    assert logits.shape == (2, 2)


def test_combined_models_tiny():
    cfg = XLSRConfig.tiny()
    wave = jnp.array(
        np.random.default_rng(4).normal(size=(2, 3200)), jnp.float32
    )
    (com, des), _ = _init_apply(SSLResNet34(xlsr_cfg=cfg), wave)
    assert com.shape == (2, 128) and des.shape == (2, 2)

    out, _ = _init_apply(SSLLCNN(xlsr_cfg=cfg), wave)
    assert out.shape == (2, 2)

    out, _ = _init_apply(TotalCNNNet(xlsr_cfg=cfg), wave)
    assert out.shape == (2, 2)

    ((com, des), lcnn_out), _ = _init_apply(OCCM(xlsr_cfg=cfg), wave)
    assert com.shape == (2, 128) and des.shape == (2, 2)
    assert lcnn_out.shape == (2, 2)
