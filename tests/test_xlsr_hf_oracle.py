"""Independent third-party oracle for the XLSR encoder + converter.

The existing parity tests (tests/test_xlsr_convert.py) check the Flax
model against a torch-functional oracle written in this repo — careful,
but both sides could share a misreading of fairseq. Here the oracle is
HuggingFace `transformers.Wav2Vec2Model` — an independent, widely-used
implementation of the same architecture the reference loads through
fairseq (reference: models/xlsr.py:29-30 loads `xlsr2_300m.pt`; HF ships
the identical weights as `facebook/wav2vec2-xls-r-300m`).

A randomly-initialised HF model's state dict is converted through
`convert_hf_state_dict` and the Flax forward must match HF's
`last_hidden_state` — so a shared misreading is now ruled out unless the
HF authors made it too.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from occm_tpu.config import XLSRConfig
from occm_tpu.models import XLSREncoder
from occm_tpu.models.convert_xlsr import (
    convert_hf_state_dict,
    detect_format,
)

transformers = pytest.importorskip("transformers")


def _hf_config(cfg: XLSRConfig):
    """Build the transformers Wav2Vec2Config equivalent of an XLSRConfig.
    XLS-R layout = layer_norm extractor + pre-norm encoder
    (feat_extract_norm='layer', do_stable_layer_norm=True); the base
    wav2vec2 layout = group-norm extractor + post-norm encoder."""
    dims = tuple(d for d, _, _ in cfg.conv_layers)
    kernels = tuple(k for _, k, _ in cfg.conv_layers)
    strides = tuple(s for _, _, s in cfg.conv_layers)
    layer_norm_mode = cfg.extractor_mode == "layer_norm"
    return transformers.Wav2Vec2Config(
        vocab_size=4,
        hidden_size=cfg.encoder_embed_dim,
        num_hidden_layers=cfg.encoder_layers,
        num_attention_heads=cfg.encoder_heads,
        intermediate_size=cfg.encoder_ffn_dim,
        conv_dim=dims,
        conv_kernel=kernels,
        conv_stride=strides,
        num_feat_extract_layers=len(dims),
        conv_bias=layer_norm_mode,
        feat_extract_norm="layer" if layer_norm_mode else "group",
        do_stable_layer_norm=cfg.layer_norm_first,
        num_conv_pos_embeddings=cfg.conv_pos,
        num_conv_pos_embedding_groups=cfg.conv_pos_groups,
        hidden_act="gelu",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


def _run_parity(cfg: XLSRConfig, wave: np.ndarray, atol: float):
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(_hf_config(cfg)).eval()
    sd = hf.state_dict()
    assert detect_format(sd) == "hf"

    params = convert_hf_state_dict(sd, cfg)
    ours = np.asarray(
        XLSREncoder(cfg).apply({"params": params}, jnp.asarray(wave))
    )
    with torch.no_grad():
        theirs = hf(torch.tensor(wave)).last_hidden_state.numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=atol)


def test_hf_oracle_tiny():
    cfg = XLSRConfig.tiny()
    rng = np.random.default_rng(0)
    wave = (rng.normal(size=(2, 3200)) * 0.1).astype(np.float32)
    _run_parity(cfg, wave, atol=2e-4)


@pytest.mark.slow
def test_hf_oracle_real_dims():
    """Full XLS-R 300M dimensions (24 layers, d=1024, 7-conv stem) against
    the HF torch implementation — the exact architecture the real
    `xlsr2_300m.pt` checkpoint needs, so the converter's stacking and
    weight-norm fold are proven at the deployment shape."""
    cfg = XLSRConfig(remat=False, dtype="float32")
    rng = np.random.default_rng(1)
    wave = (rng.normal(size=(1, 16000)) * 0.1).astype(np.float32)
    # random-init 300M params accumulate more fp error over 24 layers
    _run_parity(cfg, wave, atol=5e-3)


def test_hf_oracle_base_layout_tiny():
    """The base wav2vec2 layout — group-norm extractor (conv_bias=False)
    + post-norm encoder (do_stable_layer_norm=False) — against the HF
    oracle. This exercises the `extractor_mode='default'` and
    `layer_norm_first=False` branches, which the XLS-R tests never touch,
    and proves the converter on wav2vec2-base-style checkpoints."""
    import dataclasses

    cfg = dataclasses.replace(
        XLSRConfig.tiny(), extractor_mode="default", layer_norm_first=False
    )
    rng = np.random.default_rng(4)
    wave = (rng.normal(size=(2, 3200)) * 0.1).astype(np.float32)
    _run_parity(cfg, wave, atol=2e-4)


def test_base_preset_consistent():
    """XLSRConfig.base() matches the HF wav2vec2-base architecture
    constants (the layout test above proves the math at tiny dims)."""
    cfg = XLSRConfig.base()
    hf_cfg = transformers.Wav2Vec2Config()  # defaults ARE wav2vec2-base
    assert cfg.encoder_embed_dim == hf_cfg.hidden_size
    assert cfg.encoder_layers == hf_cfg.num_hidden_layers
    assert cfg.encoder_heads == hf_cfg.num_attention_heads
    assert cfg.encoder_ffn_dim == hf_cfg.intermediate_size
    assert cfg.extractor_mode == "default"          # group-norm block 0
    assert hf_cfg.feat_extract_norm == "group"
    assert cfg.layer_norm_first is hf_cfg.do_stable_layer_norm is False
    assert tuple(d for d, _, _ in cfg.conv_layers) == tuple(hf_cfg.conv_dim)
    assert tuple(k for _, k, _ in cfg.conv_layers) == tuple(hf_cfg.conv_kernel)
    assert tuple(s for _, _, s in cfg.conv_layers) == tuple(hf_cfg.conv_stride)
    assert cfg.conv_pos == hf_cfg.num_conv_pos_embeddings
    assert cfg.conv_pos_groups == hf_cfg.num_conv_pos_embedding_groups


def test_base_preset_traces_in_bf16():
    """Regression: the post-norm branch must cast the fp32 LayerNorm
    output back to the bf16 compute dtype or the scan carry dtypes
    mismatch (caught tracing XLSRConfig.base(), whose default dtype is
    bfloat16 — the fp32 tiny tests never hit it). eval_shape-only: no
    FLOPs."""
    import jax

    cfg = XLSRConfig.base()
    m = __import__("occm_tpu.models", fromlist=["XLSREncoder"]).XLSREncoder(cfg)
    shapes = jax.eval_shape(
        lambda r: m.init({"params": r, "dropout": r},
                         jnp.zeros((1, 16000))),
        __import__("jax").random.PRNGKey(0),
    )
    out = jax.eval_shape(
        lambda p, x: m.apply(p, x), shapes,
        jax.ShapeDtypeStruct((2, 16000), jnp.float32),
    )
    assert out.shape == (2, 49, 768)


def test_hf_oracle_input_gradient_tiny():
    """Backward-pass parity against the HF torch implementation: the
    gradient of a fixed scalar readout w.r.t. the input waveform must
    match, exercising the full autodiff chain (conv stem, pos-conv,
    attention, FFN, every LayerNorm backward) — the path the one-class
    training loss differentiates (reference: oc_training.py:384)."""
    import jax

    cfg = XLSRConfig.tiny()
    torch.manual_seed(2)
    hf = transformers.Wav2Vec2Model(_hf_config(cfg)).eval()
    params = convert_hf_state_dict(hf.state_dict(), cfg)

    rng = np.random.default_rng(3)
    wave = (rng.normal(size=(2, 3200)) * 0.1).astype(np.float32)
    # fixed projection so the scalar weights every output coordinate
    proj = rng.normal(size=(cfg.encoder_embed_dim,)).astype(np.float32)

    def scalar(w):
        out = XLSREncoder(cfg).apply({"params": params}, w)
        return jnp.mean(out @ jnp.asarray(proj))

    ours = np.asarray(jax.grad(scalar)(jnp.asarray(wave)))

    wave_t = torch.tensor(wave, requires_grad=True)
    out_t = hf(wave_t).last_hidden_state
    (out_t @ torch.tensor(proj)).mean().backward()
    theirs = wave_t.grad.numpy()

    assert ours.shape == theirs.shape
    scale = np.abs(theirs).max()
    np.testing.assert_allclose(ours / scale, theirs / scale, atol=5e-4)


def test_hf_ctc_wrapper_prefix_stripped():
    """Fine-tuned HF checkpoints wrap the encoder under `wav2vec2.`
    (Wav2Vec2ForCTC); the converter must strip the prefix and drop the
    lm_head."""
    cfg = XLSRConfig.tiny()
    torch.manual_seed(1)
    hf = transformers.Wav2Vec2ForCTC(_hf_config(cfg)).eval()
    sd = hf.state_dict()
    assert detect_format(sd) == "hf"
    params = convert_hf_state_dict(sd, cfg)

    rng = np.random.default_rng(2)
    wave = (rng.normal(size=(1, 3200)) * 0.1).astype(np.float32)
    ours = np.asarray(
        XLSREncoder(cfg).apply({"params": params}, jnp.asarray(wave))
    )
    with torch.no_grad():
        theirs = hf.wav2vec2(torch.tensor(wave)).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)
