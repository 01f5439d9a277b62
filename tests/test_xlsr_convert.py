"""XLSR converter + numerical parity tests.

Without the real `xlsr2_300m.pt` (not shipped in this environment), parity
is proven structurally + numerically against a torch-functional oracle that
implements wav2vec2 semantics (conv extractor with per-block LayerNorm,
feature LN + projection, weight-normed positional conv with SamePad trim,
pre-norm transformer, final LN) on a tiny random checkpoint in fairseq's
state-dict naming. The same converter then applies unchanged to the 300M
checkpoint (SURVEY.md §7 step 3)."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occm_tpu.config import XLSRConfig
from occm_tpu.models import XLSREncoder
from occm_tpu.models.convert_xlsr import (
    convert_fairseq_state_dict,
    fold_weight_norm,
)

CFG = XLSRConfig.tiny()
C = CFG.conv_layers[-1][0]  # conv dim
D = CFG.encoder_embed_dim
H = CFG.encoder_heads
FFN = CFG.encoder_ffn_dim
L = CFG.encoder_layers
KPOS = CFG.conv_pos
GROUPS = CFG.conv_pos_groups


def _tiny_fairseq_sd(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def r(*shape, scale=0.2):
        return torch.randn(*shape, generator=g) * scale

    in_ch = 1
    for i, (dim, k, s) in enumerate(CFG.conv_layers):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = r(dim, in_ch, k)
        sd[f"feature_extractor.conv_layers.{i}.0.bias"] = r(dim)
        sd[f"feature_extractor.conv_layers.{i}.2.1.weight"] = 1 + r(dim, scale=0.05)
        sd[f"feature_extractor.conv_layers.{i}.2.1.bias"] = r(dim, scale=0.05)
        in_ch = dim

    sd["layer_norm.weight"] = 1 + r(C, scale=0.05)
    sd["layer_norm.bias"] = r(C, scale=0.05)
    if C != D:
        sd["post_extract_proj.weight"] = r(D, C)
        sd["post_extract_proj.bias"] = r(D)

    sd["encoder.pos_conv.0.weight_g"] = 1 + r(1, 1, KPOS, scale=0.05)
    sd["encoder.pos_conv.0.weight_v"] = r(D, D // GROUPS, KPOS)
    sd["encoder.pos_conv.0.bias"] = r(D)

    for l in range(L):
        pre = f"encoder.layers.{l}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{pre}.self_attn.{name}.weight"] = r(D, D)
            sd[f"{pre}.self_attn.{name}.bias"] = r(D)
        sd[f"{pre}.self_attn_layer_norm.weight"] = 1 + r(D, scale=0.05)
        sd[f"{pre}.self_attn_layer_norm.bias"] = r(D, scale=0.05)
        sd[f"{pre}.fc1.weight"] = r(FFN, D)
        sd[f"{pre}.fc1.bias"] = r(FFN)
        sd[f"{pre}.fc2.weight"] = r(D, FFN)
        sd[f"{pre}.fc2.bias"] = r(D)
        sd[f"{pre}.final_layer_norm.weight"] = 1 + r(D, scale=0.05)
        sd[f"{pre}.final_layer_norm.bias"] = r(D, scale=0.05)

    sd["encoder.layer_norm.weight"] = 1 + r(D, scale=0.05)
    sd["encoder.layer_norm.bias"] = r(D, scale=0.05)
    # pretraining-only tensors the converter must ignore
    sd["mask_emb"] = r(D)
    sd["quantizer.vars"] = r(1, 640, 128)
    return sd


def _torch_oracle(sd, x):
    """wav2vec2 features_only forward in torch functional ops."""
    h = torch.tensor(x)[:, None, :]
    for i, (dim, k, s) in enumerate(CFG.conv_layers):
        h = F.conv1d(
            h, sd[f"feature_extractor.conv_layers.{i}.0.weight"],
            sd[f"feature_extractor.conv_layers.{i}.0.bias"], stride=s,
        )
        h = h.transpose(1, 2)
        h = F.layer_norm(
            h, (dim,), sd[f"feature_extractor.conv_layers.{i}.2.1.weight"],
            sd[f"feature_extractor.conv_layers.{i}.2.1.bias"],
        )
        h = h.transpose(1, 2)
        h = F.gelu(h)
    h = h.transpose(1, 2)  # [B,T,C]
    h = F.layer_norm(h, (C,), sd["layer_norm.weight"], sd["layer_norm.bias"])
    if C != D:
        h = h @ sd["post_extract_proj.weight"].T + sd["post_extract_proj.bias"]

    w = torch.tensor(
        fold_weight_norm(
            sd["encoder.pos_conv.0.weight_g"].numpy(),
            sd["encoder.pos_conv.0.weight_v"].numpy(),
        )
    )
    pos = F.conv1d(
        h.transpose(1, 2), w, sd["encoder.pos_conv.0.bias"],
        padding=KPOS // 2, groups=GROUPS,
    )
    if KPOS % 2 == 0:
        pos = pos[..., :-1]  # SamePad
    pos = F.gelu(pos).transpose(1, 2)
    x_t = h + pos

    hd = D // H
    for l in range(L):
        pre = f"encoder.layers.{l}"
        res = x_t
        z = F.layer_norm(
            x_t, (D,), sd[f"{pre}.self_attn_layer_norm.weight"],
            sd[f"{pre}.self_attn_layer_norm.bias"],
        )
        q = z @ sd[f"{pre}.self_attn.q_proj.weight"].T + sd[f"{pre}.self_attn.q_proj.bias"]
        k = z @ sd[f"{pre}.self_attn.k_proj.weight"].T + sd[f"{pre}.self_attn.k_proj.bias"]
        v = z @ sd[f"{pre}.self_attn.v_proj.weight"].T + sd[f"{pre}.self_attn.v_proj.bias"]
        B, T, _ = z.shape
        q = q.view(B, T, H, hd).transpose(1, 2) * (hd ** -0.5)
        k = k.view(B, T, H, hd).transpose(1, 2)
        v = v.view(B, T, H, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
        z = (att @ v).transpose(1, 2).reshape(B, T, D)
        z = z @ sd[f"{pre}.self_attn.out_proj.weight"].T + sd[f"{pre}.self_attn.out_proj.bias"]
        x_t = res + z

        res = x_t
        z = F.layer_norm(
            x_t, (D,), sd[f"{pre}.final_layer_norm.weight"],
            sd[f"{pre}.final_layer_norm.bias"],
        )
        z = F.gelu(z @ sd[f"{pre}.fc1.weight"].T + sd[f"{pre}.fc1.bias"])
        z = z @ sd[f"{pre}.fc2.weight"].T + sd[f"{pre}.fc2.bias"]
        x_t = res + z

    x_t = F.layer_norm(
        x_t, (D,), sd["encoder.layer_norm.weight"],
        sd["encoder.layer_norm.bias"],
    )
    return x_t.numpy()


def test_fold_weight_norm_matches_torch():
    g = torch.Generator().manual_seed(1)
    v = torch.randn(8, 4, 16, generator=g)
    gw = torch.randn(1, 1, 16, generator=g).abs() + 0.5
    ours = fold_weight_norm(gw.numpy(), v.numpy(), dim=2)
    theirs = torch._weight_norm(v, gw, 2).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_converted_params_drive_flax_model_to_torch_parity():
    sd = _tiny_fairseq_sd()
    params = convert_fairseq_state_dict(sd, CFG)

    rng = np.random.default_rng(0)
    wave = (rng.normal(size=(2, 3200)) * 0.1).astype(np.float32)

    model = XLSREncoder(CFG)
    # validate the tree structurally against a fresh init
    init_params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.asarray(wave),
    )["params"]
    init_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(init_params)
    }
    conv_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(params)
    }
    assert init_paths == conv_paths

    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(wave))
    )
    oracle = _torch_oracle({k: v.float() for k, v in sd.items()}, wave)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=2e-4)


def test_generalised_tool_oracle_matches_flax_on_tiny():
    """The tools/verify_xlsr_parity.py oracle (used against the real 300M
    checkpoint) must agree with the Flax model on the tiny config too."""
    from tools.verify_xlsr_parity import torch_wav2vec2_oracle

    sd = _tiny_fairseq_sd(seed=7)
    params = convert_fairseq_state_dict(sd, CFG)
    rng = np.random.default_rng(7)
    wave = (rng.normal(size=(1, 3200)) * 0.1).astype(np.float32)

    oracle = torch_wav2vec2_oracle(sd, wave, CFG)
    ours = np.asarray(
        XLSREncoder(CFG).apply({"params": params}, jnp.asarray(wave))
    )
    np.testing.assert_allclose(ours, oracle, atol=2e-4)


def test_safetensors_checkpoint_converts(tmp_path):
    """A .safetensors checkpoint file converts byte-identically to the
    in-memory dict path: the pure-numpy reader (convert_xlsr.
    load_safetensors) + convert_checkpoint_file end-to-end. HF XLS-R
    snapshots often ship only model.safetensors — this is the torch-free
    unblock path for the real checkpoint (VERDICT r2 item 1)."""
    from safetensors.numpy import save_file

    import orbax.checkpoint as ocp

    from occm_tpu.models.convert_xlsr import (
        convert_checkpoint_file, load_safetensors)

    sd = {k: np.ascontiguousarray(v.numpy())
          for k, v in _tiny_fairseq_sd(seed=11).items()}
    st_path = tmp_path / "ckpt.safetensors"
    save_file(sd, str(st_path))

    # reader roundtrip is exact
    loaded = load_safetensors(str(st_path))
    assert set(loaded) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(loaded[k], sd[k])

    # file-level conversion (auto-detects fairseq naming) == dict-level
    out = tmp_path / "params"
    convert_checkpoint_file(str(st_path), str(out), cfg=CFG)
    restored = ocp.StandardCheckpointer().restore(str(out))
    expected = convert_fairseq_state_dict(sd, CFG)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, expected)
