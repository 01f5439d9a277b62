"""Pure torch-functional wav2vec2 forward (features_only) — the
independent oracle the XLSR checkpoint converter is verified against.

No fairseq dependency: the same semantics the converter targets (conv
extractor with per-block LayerNorm, feature LN + projection, weight-normed
positional conv with SamePad trim, pre-norm transformer, final LN;
reference: models/xlsr.py:29-52 wraps the fairseq model this reproduces).
Consumed by tools/verify_xlsr_parity.py and occm_tpu.cli.parity_gate;
exercised against random tiny checkpoints in tests/test_xlsr_convert.py.

torch imports stay function-local-free here on purpose: this module is only
imported by verification paths that already require torch.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from occm_tpu.config import XLSRConfig
from occm_tpu.models.convert_xlsr import fold_weight_norm


def torch_wav2vec2_oracle(sd: dict, wave: np.ndarray, cfg: XLSRConfig
                          ) -> np.ndarray:
    """features_only wav2vec2 forward in torch functional ops (fp32)."""
    sd = {k: (v.float() if hasattr(v, "float") else torch.tensor(v))
          for k, v in sd.items()}
    C = cfg.conv_layers[-1][0]
    D = cfg.encoder_embed_dim
    H = cfg.encoder_heads
    hd = D // H

    h = torch.tensor(np.asarray(wave, np.float32))[:, None, :]
    for i, (dim, k, s) in enumerate(cfg.conv_layers):
        h = F.conv1d(
            h, sd[f"feature_extractor.conv_layers.{i}.0.weight"],
            sd.get(f"feature_extractor.conv_layers.{i}.0.bias"), stride=s,
        )
        if cfg.extractor_mode == "layer_norm":
            h = h.transpose(1, 2)
            h = F.layer_norm(
                h, (dim,),
                sd[f"feature_extractor.conv_layers.{i}.2.1.weight"],
                sd[f"feature_extractor.conv_layers.{i}.2.1.bias"],
            )
            h = h.transpose(1, 2)
        elif i == 0:
            h = F.group_norm(
                h, dim, sd["feature_extractor.conv_layers.0.2.weight"],
                sd["feature_extractor.conv_layers.0.2.bias"],
            )
        h = F.gelu(h)
    h = h.transpose(1, 2)
    h = F.layer_norm(h, (C,), sd["layer_norm.weight"], sd["layer_norm.bias"])
    if "post_extract_proj.weight" in sd:
        h = h @ sd["post_extract_proj.weight"].T + sd["post_extract_proj.bias"]

    w = torch.tensor(
        fold_weight_norm(
            sd["encoder.pos_conv.0.weight_g"].numpy(),
            sd["encoder.pos_conv.0.weight_v"].numpy(),
        )
    )
    pos = F.conv1d(
        h.transpose(1, 2), w, sd["encoder.pos_conv.0.bias"],
        padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups,
    )
    if cfg.conv_pos % 2 == 0:
        pos = pos[..., :-1]
    x = h + F.gelu(pos).transpose(1, 2)

    if not cfg.layer_norm_first:
        x = F.layer_norm(x, (D,), sd["encoder.layer_norm.weight"],
                         sd["encoder.layer_norm.bias"])

    for l in range(cfg.encoder_layers):
        pre = f"encoder.layers.{l}"
        res = x
        z = F.layer_norm(
            x, (D,), sd[f"{pre}.self_attn_layer_norm.weight"],
            sd[f"{pre}.self_attn_layer_norm.bias"],
        ) if cfg.layer_norm_first else x
        q = z @ sd[f"{pre}.self_attn.q_proj.weight"].T + \
            sd[f"{pre}.self_attn.q_proj.bias"]
        k = z @ sd[f"{pre}.self_attn.k_proj.weight"].T + \
            sd[f"{pre}.self_attn.k_proj.bias"]
        v = z @ sd[f"{pre}.self_attn.v_proj.weight"].T + \
            sd[f"{pre}.self_attn.v_proj.bias"]
        B, T, _ = z.shape
        q = q.view(B, T, H, hd).transpose(1, 2) * (hd ** -0.5)
        k = k.view(B, T, H, hd).transpose(1, 2)
        v = v.view(B, T, H, hd).transpose(1, 2)
        att = torch.softmax(q @ k.transpose(-2, -1), dim=-1)
        z = (att @ v).transpose(1, 2).reshape(B, T, D)
        z = z @ sd[f"{pre}.self_attn.out_proj.weight"].T + \
            sd[f"{pre}.self_attn.out_proj.bias"]
        x = res + z
        if not cfg.layer_norm_first:
            x = F.layer_norm(x, (D,), sd[f"{pre}.self_attn_layer_norm.weight"],
                             sd[f"{pre}.self_attn_layer_norm.bias"])

        res = x
        z = F.layer_norm(
            x, (D,), sd[f"{pre}.final_layer_norm.weight"],
            sd[f"{pre}.final_layer_norm.bias"],
        ) if cfg.layer_norm_first else x
        z = F.gelu(z @ sd[f"{pre}.fc1.weight"].T + sd[f"{pre}.fc1.bias"])
        z = z @ sd[f"{pre}.fc2.weight"].T + sd[f"{pre}.fc2.bias"]
        x = res + z
        if not cfg.layer_norm_first:
            x = F.layer_norm(x, (D,), sd[f"{pre}.final_layer_norm.weight"],
                             sd[f"{pre}.final_layer_norm.bias"])

    if cfg.layer_norm_first:
        x = F.layer_norm(x, (D,), sd["encoder.layer_norm.weight"],
                         sd["encoder.layer_norm.bias"])
    return x.numpy()
