"""Reference-trained checkpoint importer/exporter for the backend models.

The reference saves bare torch ``state_dict`` files per epoch:
``aasist_vocoded_{epoch}.pt`` — the full ``AModel`` (XLSR SSL frontend +
AASIST backend, reference: oc_training.py:401), and the separate pair
``ssl_vocoded_{epoch}.pt`` / ``senet34_vocoded_{epoch}.pt`` saved by the
alternative trainer (reference: test_dataloader_v2.py:144-145). A user
switching frameworks holds exactly these files; this module converts them
into the occm_tpu Flax variable trees (``{"params", "batch_stats"}``) — and
back, so checkpoints trained here can be consumed by reference tooling.

Key-name sources (names are read off the reference model definitions;
layouts are converted, never copied):
- AModel / AASIST backend: reference models/sslassist.py:58-504
- SE-ResNet34:             reference models/senet.py:13-162
- LCNN:                    reference models/lcnn.py:121-241

Layout rules:
- torch ``nn.Linear.weight`` is [out, in]   -> Flax ``kernel`` [in, out]
- torch ``nn.Conv2d.weight`` is OIHW        -> Flax ``kernel`` HWIO
- BatchNorm weight/bias -> params scale/bias; running_mean/var ->
  batch_stats mean/var; ``num_batches_tracked`` is dropped on import and
  written as 0 on export.
- Parameters the reference declares but never uses in ``forward``
  (Residual_block's ``bn1`` pre-activation whose output is discarded,
  reference models/sslassist.py:406-415; LCNN ``group.bn``, reference
  models/lcnn.py:141 declared / l.145-147 unused) have no Flax
  counterpart: dropped on import, emitted at torch defaults on export.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from occm_tpu.config import AASISTConfig, XLSRConfig
from occm_tpu.models.convert_xlsr import convert_fairseq_state_dict


def _np(v) -> np.ndarray:
    return np.asarray(
        v.detach().cpu().numpy() if hasattr(v, "detach") else v,
        dtype=np.float32,
    )


def _strip_prefix(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    if any(k.startswith(prefix) for k in sd):
        return {
            (k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()
        }
    return dict(sd)


class _SD:
    """State-dict view that tracks which keys were consumed."""

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k: _np(v) for k, v in sd.items()}
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.sd[key]

    def has(self, key: str) -> bool:
        return key in self.sd

    def unused(self, ignore_substrings: Tuple[str, ...] = ()) -> list:
        return sorted(
            k for k in self.sd
            if k not in self.used
            and not any(s in k for s in ignore_substrings)
            and not k.endswith("num_batches_tracked")
        )


def _linear(sd: _SD, key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": sd.take(f"{key}.weight").T}
    if sd.has(f"{key}.bias"):
        out["bias"] = sd.take(f"{key}.bias")
    return out


def _conv2d(sd: _SD, key: str) -> Dict[str, np.ndarray]:
    out = {"kernel": sd.take(f"{key}.weight").transpose(2, 3, 1, 0)}
    if sd.has(f"{key}.bias"):
        out["bias"] = sd.take(f"{key}.bias")
    return out


def _bn(sd: _SD, key: str) -> Tuple[Dict, Dict]:
    """(params, batch_stats) for one BatchNorm1d/2d."""
    params = {"scale": sd.take(f"{key}.weight"), "bias": sd.take(f"{key}.bias")}
    stats = {
        "mean": sd.take(f"{key}.running_mean"),
        "var": sd.take(f"{key}.running_var"),
    }
    return params, stats


# --------------------------------------------------------------------------
# AASIST backend (reference models/sslassist.py:432-504)
# --------------------------------------------------------------------------

def _gat_layer(sd: _SD, key: str) -> Tuple[Dict, Dict]:
    """GraphAttentionLayer (reference models/sslassist.py:58-77)."""
    bn_p, bn_s = _bn(sd, f"{key}.bn")
    params = {
        "att_proj": _linear(sd, f"{key}.att_proj"),
        "att_weight": sd.take(f"{key}.att_weight"),
        "proj_with_att": _linear(sd, f"{key}.proj_with_att"),
        "proj_without_att": _linear(sd, f"{key}.proj_without_att"),
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def _htrg_layer(sd: _SD, key: str) -> Tuple[Dict, Dict]:
    """HtrgGraphAttentionLayer (reference models/sslassist.py:158-178)."""
    bn_p, bn_s = _bn(sd, f"{key}.bn")
    params = {
        "proj_type1": _linear(sd, f"{key}.proj_type1"),
        "proj_type2": _linear(sd, f"{key}.proj_type2"),
        "att_proj": _linear(sd, f"{key}.att_proj"),
        "att_projM": _linear(sd, f"{key}.att_projM"),
        "att_weight11": sd.take(f"{key}.att_weight11"),
        "att_weight22": sd.take(f"{key}.att_weight22"),
        "att_weight12": sd.take(f"{key}.att_weight12"),
        "att_weightM": sd.take(f"{key}.att_weightM"),
        "proj_with_att": _linear(sd, f"{key}.proj_with_att"),
        "proj_without_att": _linear(sd, f"{key}.proj_without_att"),
        "proj_with_attM": _linear(sd, f"{key}.proj_with_attM"),
        "proj_without_attM": _linear(sd, f"{key}.proj_without_attM"),
        "bn": bn_p,
    }
    return params, {"bn": bn_s}


def convert_aasist_backend(sd: _SD) -> Tuple[Dict, Dict]:
    """AASIST backend keys (everything but the SSL frontend) ->
    (params, batch_stats) for ``AASISTBackend``."""
    params: Dict = {}
    stats: Dict = {}

    params["LL"] = _linear(sd, "LL")
    params["first_bn"], stats["first_bn"] = _bn(sd, "first_bn")
    params["first_bn1"], stats["first_bn1"] = _bn(sd, "first_bn1")

    # RawNet2 encoder: nn.Sequential(nn.Sequential(Residual_block)) x6
    # (reference models/sslassist.py:457-463) -> encoder_{i}. The dead
    # pre-activation bn1 (present for i>=1) is dropped (module docstring).
    for i in range(6):
        base = f"encoder.{i}.0"
        block: Dict = {"conv1": _conv2d(sd, f"{base}.conv1")}
        bn_p, bn_s = _bn(sd, f"{base}.bn2")
        block["bn2"] = bn_p
        block["conv2"] = _conv2d(sd, f"{base}.conv2")
        if sd.has(f"{base}.conv_downsample.weight"):
            block["conv_downsample"] = _conv2d(sd, f"{base}.conv_downsample")
        params[f"encoder_{i}"] = block
        stats[f"encoder_{i}"] = {"bn2": bn_s}

    # attention stack Conv-SELU-BN-Conv (reference l.465-471)
    params["att_conv1"] = _conv2d(sd, "attention.0")
    att_bn_p, att_bn_s = _bn(sd, "attention.2")
    params["att_bn"] = att_bn_p
    stats["att_bn"] = att_bn_s
    params["att_conv2"] = _conv2d(sd, "attention.3")

    params["pos_S"] = sd.take("pos_S")
    params["master1"] = sd.take("master1")
    params["master2"] = sd.take("master2")

    for name in ("GAT_layer_S", "GAT_layer_T"):
        params[name], stats[name] = _gat_layer(sd, name)
    for name in ("HtrgGAT_layer_ST11", "HtrgGAT_layer_ST12",
                 "HtrgGAT_layer_ST21", "HtrgGAT_layer_ST22"):
        params[name], stats[name] = _htrg_layer(sd, name)
    for name in ("pool_S", "pool_T", "pool_hS1", "pool_hT1",
                 "pool_hS2", "pool_hT2"):
        params[name] = {"proj": _linear(sd, f"{name}.proj")}

    params["out_layer"] = _linear(sd, "out_layer")
    return params, stats


def convert_amodel_state_dict(
    sd: Mapping[str, Any],
    xlsr_cfg: Optional[XLSRConfig] = None,
    cfg: AASISTConfig = AASISTConfig(),
) -> Dict:
    """Full ``AModel`` checkpoint (``aasist_vocoded_{epoch}.pt``) ->
    ``{"params", "batch_stats"}`` for ``occm_tpu.models.AModel``.

    The SSL half (keys ``ssl_model.model.*``) goes through the fairseq
    XLSR converter; the rest is the AASIST backend."""
    xlsr_cfg = xlsr_cfg or XLSRConfig()
    sd = _strip_prefix(sd, "module.")  # DataParallel-wrapped saves
    ssl_sd = {
        k[len("ssl_model.model."):]: v
        for k, v in sd.items() if k.startswith("ssl_model.model.")
    }
    back_sd = _SD({
        k: v for k, v in sd.items() if not k.startswith("ssl_model.")
    })
    ssl_params = convert_fairseq_state_dict(ssl_sd, xlsr_cfg)
    back_params, back_stats = convert_aasist_backend(back_sd)
    unused = back_sd.unused(ignore_substrings=(".bn1.",))
    if unused:
        raise ValueError(f"unconverted AModel keys: {unused[:8]}")
    return {
        "params": {"ssl_model": ssl_params, "backend": back_params},
        "batch_stats": {"backend": back_stats},
    }


# --------------------------------------------------------------------------
# SE-ResNet (reference models/senet.py:13-162)
# --------------------------------------------------------------------------

def _se_block(sd: _SD, key: str) -> Tuple[Dict, Dict]:
    params: Dict = {"conv1": _conv2d(sd, f"{key}.conv1")}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(sd, f"{key}.bn1")
    params["conv2"] = _conv2d(sd, f"{key}.conv2")
    params["bn2"], stats["bn2"] = _bn(sd, f"{key}.bn2")
    params["se"] = {
        "fc1": _linear(sd, f"{key}.se.fc.0"),
        "fc2": _linear(sd, f"{key}.se.fc.2"),
    }
    if sd.has(f"{key}.downsample.0.weight"):
        params["downsample_conv"] = _conv2d(sd, f"{key}.downsample.0")
        params["downsample_bn"], stats["downsample_bn"] = _bn(
            sd, f"{key}.downsample.1"
        )
    return params, stats


def convert_senet_state_dict(
    sd: Mapping[str, Any], layers: Optional[Tuple[int, ...]] = None
) -> Dict:
    """SE-ResNet checkpoint (``senet34_vocoded_{epoch}.pt``) ->
    ``{"params", "batch_stats"}`` for ``occm_tpu.models.senet.SEResNet``.

    Stage depths default to what the checkpoint actually contains (so
    se_resnet34 [3,4,6,3] and se_resnet12 [1,2,3,1] both convert)."""
    sd = _strip_prefix(sd, "module.")
    if layers is None:
        layers = tuple(
            1 + max(
                int(k.split(".")[1]) for k in sd
                if k.startswith(f"layer{s}.")
            )
            for s in range(1, 5)
        )
    v = _SD(sd)
    params: Dict = {"conv1": _conv2d(v, "conv1")}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn(v, "bn1")
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            p, s = _se_block(v, f"layer{stage}.{b}")
            params[f"layer{stage}_{b}"] = p
            stats[f"layer{stage}_{b}"] = s
    params["embedding"] = _linear(v, "embedding")
    params["classifier"] = _linear(v, "classifier")
    unused = v.unused()
    if unused:
        raise ValueError(f"unconverted SE-ResNet keys: {unused[:8]}")
    return {"params": params, "batch_stats": stats}


def convert_ssl_resnet34_state_dict(
    sd: Mapping[str, Any], xlsr_cfg: Optional[XLSRConfig] = None
) -> Dict:
    """Fused ``ssl_resnet34`` module state dict (keys ``frontend.model.*``
    + ``resnet34.*``, reference: models/senet.py:162-170) ->
    ``{"params", "batch_stats"}`` for ``occm_tpu.models.SSLResNet34``
    (same submodule names: ``frontend`` / ``resnet34``)."""
    sd = _strip_prefix(sd, "module.")
    ssl_sd = {
        k[len("frontend.model."):]: v
        for k, v in sd.items() if k.startswith("frontend.model.")
    }
    resnet_sd = {
        k[len("resnet34."):]: v
        for k, v in sd.items() if k.startswith("resnet34.")
    }
    if len(ssl_sd) + len(resnet_sd) != len(sd):
        extra = [k for k in sd if not k.startswith(("frontend.model.",
                                                    "resnet34."))]
        raise ValueError(f"unconverted ssl_resnet34 keys: {extra[:8]}")
    resnet = convert_senet_state_dict(resnet_sd)
    return {
        "params": {
            "frontend": convert_fairseq_state_dict(
                ssl_sd, xlsr_cfg or XLSRConfig()),
            "resnet34": resnet["params"],
        },
        "batch_stats": {"resnet34": resnet["batch_stats"]},
    }


def convert_ssl_state_dict(
    sd: Mapping[str, Any], xlsr_cfg: Optional[XLSRConfig] = None
) -> Dict:
    """``SSLModel`` checkpoint (``ssl_vocoded_{epoch}.pt``; keys
    ``model.<fairseq>``) -> bare ``XLSREncoder`` params (the tree
    oc_classifier's separate path loads under ``frontend``)."""
    return {
        "params": convert_fairseq_state_dict(
            dict(_strip_prefix(sd, "module.")), xlsr_cfg or XLSRConfig()
        ),
        "batch_stats": {},
    }


# --------------------------------------------------------------------------
# LCNN (reference models/lcnn.py:121-241)
# --------------------------------------------------------------------------

def _mfm_conv(sd: _SD, key: str) -> Dict:
    return {"filter": _conv2d(sd, f"{key}.filter")}


def _mfm_dense(sd: _SD, key: str) -> Dict:
    # mfm type=0 wraps the Linear in Sequential(Linear, Dropout) -> .filter.0
    return {"filter": _linear(sd, f"{key}.filter.0")}


def convert_lcnn_state_dict(sd: Mapping[str, Any]) -> Dict:
    """LCNN checkpoint -> ``{"params", "batch_stats"}`` for
    ``occm_tpu.models.lcnn.LCNN``. The dead ``group.bn`` (declared at
    reference models/lcnn.py:141, unused in forward) is dropped."""
    sd = _strip_prefix(sd, "module.")
    v = _SD(sd)
    params: Dict = {"layer1_mfm": _mfm_conv(v, "layer1.0")}
    stats: Dict = {}
    for i, name in ((2, "layer2"), (3, "layer3")):
        params[f"{name}_group"] = {
            "conv_a": _mfm_conv(v, f"{name}.0.conv_a"),
            "conv": _mfm_conv(v, f"{name}.0.conv"),
        }
        bn_p, bn_s = _bn(v, f"{name}.2")
        params[f"{name}_bn"] = bn_p
        stats[f"{name}_bn"] = bn_s
    for name in ("fc0", "fc1", "fc2"):
        params[name] = _mfm_dense(v, f"{name}.0")
    if v.has("fc3.weight") and not v.has("fc3.bias"):
        # AngleLinear: Parameter [in, out], no transpose, no bias
        # (reference models/lcnn.py:28)
        params["fc3"] = {"weight": v.take("fc3.weight")}
    else:
        params["fc3"] = _linear(v, "fc3")
    unused = v.unused(ignore_substrings=(".0.bn.",))
    if unused:
        raise ValueError(f"unconverted LCNN keys: {unused[:8]}")
    return {"params": params, "batch_stats": stats}


# --------------------------------------------------------------------------
# Export: Flax variables -> reference-named torch state dicts
# --------------------------------------------------------------------------

def _x_linear(out: Dict, key: str, p: Mapping) -> None:
    out[f"{key}.weight"] = np.asarray(p["kernel"]).T
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"])


def _x_conv2d(out: Dict, key: str, p: Mapping) -> None:
    out[f"{key}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        out[f"{key}.bias"] = np.asarray(p["bias"])


def _x_bn(out: Dict, key: str, p: Mapping, s: Mapping) -> None:
    out[f"{key}.weight"] = np.asarray(p["scale"])
    out[f"{key}.bias"] = np.asarray(p["bias"])
    out[f"{key}.running_mean"] = np.asarray(s["mean"])
    out[f"{key}.running_var"] = np.asarray(s["var"])
    out[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)


def _x_bn_default(out: Dict, key: str, n: int) -> None:
    """Emit a functionally-dead reference BatchNorm at torch defaults."""
    out[f"{key}.weight"] = np.ones(n, np.float32)
    out[f"{key}.bias"] = np.zeros(n, np.float32)
    out[f"{key}.running_mean"] = np.zeros(n, np.float32)
    out[f"{key}.running_var"] = np.ones(n, np.float32)
    out[f"{key}.num_batches_tracked"] = np.asarray(0, np.int64)


def export_xlsr_state_dict(params: Mapping, cfg: XLSRConfig) -> Dict:
    """XLSREncoder params -> fairseq wav2vec2 state-dict naming (the exact
    inverse of convert_fairseq_state_dict; weight-norm is re-split with
    g = per-out-channel norm so folding reproduces the kernel exactly)."""
    out: Dict = {}
    fe = params["feature_extractor"]
    for i in range(len(cfg.conv_layers)):
        out[f"feature_extractor.conv_layers.{i}.0.weight"] = np.asarray(
            fe[f"conv_{i}"]["kernel"]).transpose(2, 1, 0)
        if "bias" in fe[f"conv_{i}"]:
            b = np.asarray(fe[f"conv_{i}"]["bias"])
            if np.any(b):  # zero-filled bias ~ bias-free reference ckpt
                out[f"feature_extractor.conv_layers.{i}.0.bias"] = b
        if cfg.extractor_mode == "layer_norm":
            out[f"feature_extractor.conv_layers.{i}.2.1.weight"] = (
                np.asarray(fe[f"ln_{i}"]["scale"]))
            out[f"feature_extractor.conv_layers.{i}.2.1.bias"] = (
                np.asarray(fe[f"ln_{i}"]["bias"]))
        elif i == 0:
            out["feature_extractor.conv_layers.0.2.weight"] = np.asarray(
                fe["gn_0"]["scale"])
            out["feature_extractor.conv_layers.0.2.bias"] = np.asarray(
                fe["gn_0"]["bias"])

    out["layer_norm.weight"] = np.asarray(params["layer_norm"]["scale"])
    out["layer_norm.bias"] = np.asarray(params["layer_norm"]["bias"])
    if "post_extract_proj" in params:
        _x_linear(out, "post_extract_proj", params["post_extract_proj"])

    w = np.asarray(params["pos_conv"]["kernel"]).transpose(2, 1, 0)
    g = np.sqrt(np.sum(w**2, axis=(0, 1), keepdims=True))
    out["encoder.pos_conv.0.weight_g"] = g
    out["encoder.pos_conv.0.weight_v"] = w
    out["encoder.pos_conv.0.bias"] = np.asarray(params["pos_conv"]["bias"])

    layer = params["layers"]["layer"]
    L = cfg.encoder_layers
    for l in range(L):
        base = f"encoder.layers.{l}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            p = layer["self_attn"][name]
            out[f"{base}.self_attn.{name}.weight"] = np.asarray(
                p["kernel"][l]).T
            out[f"{base}.self_attn.{name}.bias"] = np.asarray(p["bias"][l])
        for src, dst in (("self_attn_layer_norm", "self_attn_layer_norm"),
                         ("final_layer_norm", "final_layer_norm")):
            out[f"{base}.{dst}.weight"] = np.asarray(layer[src]["scale"][l])
            out[f"{base}.{dst}.bias"] = np.asarray(layer[src]["bias"][l])
        for fc in ("fc1", "fc2"):
            out[f"{base}.{fc}.weight"] = np.asarray(
                layer[fc]["kernel"][l]).T
            out[f"{base}.{fc}.bias"] = np.asarray(layer[fc]["bias"][l])

    out["encoder.layer_norm.weight"] = np.asarray(
        params["encoder_layer_norm"]["scale"])
    out["encoder.layer_norm.bias"] = np.asarray(
        params["encoder_layer_norm"]["bias"])
    return out


def _x_gat(out: Dict, key: str, p: Mapping, s: Mapping) -> None:
    for name in ("att_proj", "proj_with_att", "proj_without_att"):
        _x_linear(out, f"{key}.{name}", p[name])
    out[f"{key}.att_weight"] = np.asarray(p["att_weight"])
    _x_bn(out, f"{key}.bn", p["bn"], s["bn"])


def _x_htrg(out: Dict, key: str, p: Mapping, s: Mapping) -> None:
    for name in ("proj_type1", "proj_type2", "att_proj", "att_projM",
                 "proj_with_att", "proj_without_att", "proj_with_attM",
                 "proj_without_attM"):
        _x_linear(out, f"{key}.{name}", p[name])
    for name in ("att_weight11", "att_weight22", "att_weight12",
                 "att_weightM"):
        out[f"{key}.{name}"] = np.asarray(p[name])
    _x_bn(out, f"{key}.bn", p["bn"], s["bn"])


def export_amodel_state_dict(variables: Mapping,
                             xlsr_cfg: Optional[XLSRConfig] = None) -> Dict:
    """``AModel`` Flax variables -> the reference's full torch state-dict
    naming (loadable by reference oc_classifier after torch.save). Dead
    reference parameters (encoder bn1 pre-activations) are emitted at
    torch BatchNorm defaults — the reference forward discards their
    output, so any values are functionally identical."""
    xlsr_cfg = xlsr_cfg or XLSRConfig()
    p = variables["params"]["backend"]
    s = variables.get("batch_stats", {}).get("backend", {})
    out: Dict = {}

    for k, v in export_xlsr_state_dict(
            variables["params"]["ssl_model"], xlsr_cfg).items():
        out[f"ssl_model.model.{k}"] = v

    _x_linear(out, "LL", p["LL"])
    _x_bn(out, "first_bn", p["first_bn"], s["first_bn"])
    _x_bn(out, "first_bn1", p["first_bn1"], s["first_bn1"])

    for i in range(6):
        base = f"encoder.{i}.0"
        blk, bst = p[f"encoder_{i}"], s[f"encoder_{i}"]
        if i > 0:  # dead pre-activation bn1 over the block's input channels
            _x_bn_default(out, f"{base}.bn1",
                          blk["conv1"]["kernel"].shape[2])
        _x_conv2d(out, f"{base}.conv1", blk["conv1"])
        _x_bn(out, f"{base}.bn2", blk["bn2"], bst["bn2"])
        _x_conv2d(out, f"{base}.conv2", blk["conv2"])
        if "conv_downsample" in blk:
            _x_conv2d(out, f"{base}.conv_downsample", blk["conv_downsample"])

    _x_conv2d(out, "attention.0", p["att_conv1"])
    _x_bn(out, "attention.2", p["att_bn"], s["att_bn"])
    _x_conv2d(out, "attention.3", p["att_conv2"])

    out["pos_S"] = np.asarray(p["pos_S"])
    out["master1"] = np.asarray(p["master1"])
    out["master2"] = np.asarray(p["master2"])

    for name in ("GAT_layer_S", "GAT_layer_T"):
        _x_gat(out, name, p[name], s[name])
    for name in ("HtrgGAT_layer_ST11", "HtrgGAT_layer_ST12",
                 "HtrgGAT_layer_ST21", "HtrgGAT_layer_ST22"):
        _x_htrg(out, name, p[name], s[name])
    for name in ("pool_S", "pool_T", "pool_hS1", "pool_hT1",
                 "pool_hS2", "pool_hT2"):
        _x_linear(out, f"{name}.proj", p[name]["proj"])
    _x_linear(out, "out_layer", p["out_layer"])
    return out


def export_senet_state_dict(variables: Mapping,
                            layers: Tuple[int, ...] = (3, 4, 6, 3)) -> Dict:
    """SEResNet Flax variables -> reference models/senet.py naming."""
    p, s = variables["params"], variables.get("batch_stats", {})
    out: Dict = {}
    _x_conv2d(out, "conv1", p["conv1"])
    _x_bn(out, "bn1", p["bn1"], s["bn1"])
    for stage, blocks in enumerate(layers, start=1):
        for b in range(blocks):
            key, fk = f"layer{stage}.{b}", f"layer{stage}_{b}"
            blk, bst = p[fk], s[fk]
            _x_conv2d(out, f"{key}.conv1", blk["conv1"])
            _x_bn(out, f"{key}.bn1", blk["bn1"], bst["bn1"])
            _x_conv2d(out, f"{key}.conv2", blk["conv2"])
            _x_bn(out, f"{key}.bn2", blk["bn2"], bst["bn2"])
            _x_linear(out, f"{key}.se.fc.0", blk["se"]["fc1"])
            _x_linear(out, f"{key}.se.fc.2", blk["se"]["fc2"])
            if "downsample_conv" in blk:
                _x_conv2d(out, f"{key}.downsample.0", blk["downsample_conv"])
                _x_bn(out, f"{key}.downsample.1", blk["downsample_bn"],
                      bst["downsample_bn"])
    _x_linear(out, "embedding", p["embedding"])
    _x_linear(out, "classifier", p["classifier"])
    return out


def export_lcnn_state_dict(variables: Mapping) -> Dict:
    """LCNN Flax variables -> reference models/lcnn.py naming (the dead
    ``group.bn`` modules are emitted at torch defaults)."""
    p, s = variables["params"], variables.get("batch_stats", {})
    out: Dict = {}
    _x_conv2d(out, "layer1.0.filter", p["layer1_mfm"]["filter"])
    for name in ("layer2", "layer3"):
        grp = p[f"{name}_group"]
        _x_conv2d(out, f"{name}.0.conv_a.filter", grp["conv_a"]["filter"])
        _x_bn_default(out, f"{name}.0.bn",
                      grp["conv_a"]["filter"]["kernel"].shape[2])
        _x_conv2d(out, f"{name}.0.conv.filter", grp["conv"]["filter"])
        _x_bn(out, f"{name}.2", p[f"{name}_bn"], s[f"{name}_bn"])
    for name in ("fc0", "fc1", "fc2"):
        _x_linear(out, f"{name}.0.filter.0", p[name]["filter"])
    if "weight" in p["fc3"]:
        out["fc3.weight"] = np.asarray(p["fc3"]["weight"])
    else:
        _x_linear(out, "fc3", p["fc3"])
    return out


# --------------------------------------------------------------------------
# Auto-detection + file-level entry points
# --------------------------------------------------------------------------

def detect_model_kind(sd: Mapping[str, Any]) -> str:
    """Which reference checkpoint family a state dict belongs to."""
    keys = set(sd)
    probe = {k.split("module.", 1)[-1] for k in keys}
    if any(k.startswith("ssl_model.") for k in probe) or "pos_S" in probe:
        return "amodel"
    if any(k.startswith("frontend.model.") for k in probe) and any(
            k.startswith("resnet34.") for k in probe):
        return "ssl_resnet34"
    if any(k.startswith("layer4.") for k in probe) and "embedding.weight" in probe:
        return "senet"
    if any(k.startswith("fc3.") for k in probe) and any(
            k.startswith("layer1.0.filter") for k in probe):
        return "lcnn"
    if any(k.startswith("model.") or k.startswith("feature_extractor.")
           for k in probe):
        return "ssl"
    raise ValueError(
        "unrecognised checkpoint: expected reference AModel "
        "(aasist_vocoded_*.pt), SE-ResNet (senet34_vocoded_*.pt), LCNN, or "
        "SSLModel (ssl_vocoded_*.pt) key names"
    )


def convert_model_state_dict(sd: Mapping[str, Any],
                             kind: str = "auto",
                             xlsr_cfg: Optional[XLSRConfig] = None) -> Dict:
    """Dispatch a reference torch state dict to the right converter;
    returns ``{"params", "batch_stats"}`` (plus the detected kind under
    ``"_kind"`` when auto-detected)."""
    if kind == "auto":
        kind = detect_model_kind(sd)
    fn = {
        "amodel": lambda: convert_amodel_state_dict(sd, xlsr_cfg=xlsr_cfg),
        "senet": lambda: convert_senet_state_dict(sd),
        "lcnn": lambda: convert_lcnn_state_dict(sd),
        "ssl": lambda: convert_ssl_state_dict(sd, xlsr_cfg=xlsr_cfg),
        "ssl_resnet34": lambda: convert_ssl_resnet34_state_dict(
            sd, xlsr_cfg=xlsr_cfg),
    }[kind]
    out = fn()
    out["_kind"] = kind
    return out


def load_torch_state_dict(path: str) -> Dict[str, Any]:
    state = _torch_load(path)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    if isinstance(state, dict) and "model" in state and isinstance(
            state["model"], dict):
        state = state["model"]
    return state


def _torch_load(path: str):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def convert_model_file(pt_path: str, out_path: str, kind: str = "auto",
                       xlsr_cfg: Optional[XLSRConfig] = None) -> str:
    """Load a reference ``.pt`` state dict, convert, save as an orbax
    checkpoint holding ``{"params", "batch_stats"}``. Returns the kind."""
    sd = load_torch_state_dict(pt_path)
    out = convert_model_state_dict(sd, kind=kind, xlsr_cfg=xlsr_cfg)
    kind = out.pop("_kind")

    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out_path), out, force=True)
    ckptr.wait_until_finished()
    return kind


def detect_params_kind(params: Mapping[str, Any]) -> str:
    """Which exporter a Flax params tree belongs to (top-level names)."""
    keys = set(params)
    if {"ssl_model", "backend"} <= keys:
        return "amodel"
    if {"frontend", "resnet34"} <= keys:
        return "ssl_resnet34"
    if "layer1_mfm" in keys:
        return "lcnn"
    if "embedding" in keys and "classifier" in keys:
        return "senet"
    raise ValueError(
        f"unrecognised params tree (top-level: {sorted(keys)[:8]})"
    )


def export_model_file(ckpt_path: str, out_pt: str, kind: str = "auto",
                      xlsr_cfg: Optional[XLSRConfig] = None) -> str:
    """Restore an orbax checkpoint (a converter save, a bare param tree,
    or a full trainer checkpoint with params/batch_stats/opt_state) and
    torch.save it under the reference's exact state-dict naming. Returns
    the kind."""
    import os

    import orbax.checkpoint as ocp
    import torch

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
    if isinstance(restored, dict) and "params" in restored:
        variables = {"params": restored["params"],
                     "batch_stats": restored.get("batch_stats", {})}
    else:
        variables = {"params": restored, "batch_stats": {}}
    if kind == "auto":
        kind = detect_params_kind(variables["params"])
    xlsr_cfg = xlsr_cfg or XLSRConfig()
    if kind == "amodel":
        sd = export_amodel_state_dict(variables, xlsr_cfg)
    elif kind == "senet":
        layers = tuple(
            1 + max(int(k.split("_")[1]) for k in variables["params"]
                    if k.startswith(f"layer{s}_"))
            for s in range(1, 5)
        )
        sd = export_senet_state_dict(variables, layers=layers)
    elif kind == "lcnn":
        sd = export_lcnn_state_dict(variables)
    elif kind == "ssl_resnet34":
        sd = {}
        for k, v in export_xlsr_state_dict(
                variables["params"]["frontend"], xlsr_cfg).items():
            sd[f"frontend.model.{k}"] = v
        resnet_p = variables["params"]["resnet34"]
        layers = tuple(
            1 + max(int(k.split("_")[1]) for k in resnet_p
                    if k.startswith(f"layer{s}_"))
            for s in range(1, 5)
        )
        for k, v in export_senet_state_dict(
                {"params": resnet_p,
                 "batch_stats": variables["batch_stats"].get("resnet34", {})},
                layers=layers).items():
            sd[f"resnet34.{k}"] = v
    else:
        raise ValueError(f"unknown kind {kind!r}")
    import numpy as _np

    torch.save(
        {k: torch.from_numpy(_np.ascontiguousarray(_np.asarray(v)))
         for k, v in sd.items()},
        out_pt,
    )
    return kind


def main_export(argv=None):  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(
        description="Export an occm_tpu orbax checkpoint (trainer epoch dir "
        "or converter output) to a reference-named torch .pt state dict"
    )
    ap.add_argument("ckpt_path")
    ap.add_argument("out_pt")
    ap.add_argument("--kind", default="auto",
                    choices=("auto", "amodel", "senet", "lcnn",
                             "ssl_resnet34"))
    ap.add_argument("--tiny", action="store_true",
                    help="export against XLSRConfig.tiny() (test ckpts)")
    args = ap.parse_args(argv)
    xlsr_cfg = XLSRConfig.tiny() if args.tiny else XLSRConfig()
    kind = export_model_file(args.ckpt_path, args.out_pt, kind=args.kind,
                             xlsr_cfg=xlsr_cfg)
    print(f"exported {args.ckpt_path} ({kind}) -> {args.out_pt}")


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(
        description="Convert a reference-trained torch checkpoint "
        "(aasist_vocoded_*.pt / senet34_vocoded_*.pt / ssl_vocoded_*.pt / "
        "LCNN) into an occm_tpu orbax checkpoint"
    )
    ap.add_argument("pt_path")
    ap.add_argument("out_path")
    ap.add_argument("--kind", default="auto",
                    choices=("auto", "amodel", "senet", "lcnn", "ssl",
                             "ssl_resnet34"))
    ap.add_argument("--tiny", action="store_true",
                    help="convert against XLSRConfig.tiny() (test ckpts)")
    args = ap.parse_args(argv)
    xlsr_cfg = XLSRConfig.tiny() if args.tiny else XLSRConfig()
    kind = convert_model_file(args.pt_path, args.out_path, kind=args.kind,
                              xlsr_cfg=xlsr_cfg)
    print(f"converted {args.pt_path} ({kind}) -> {args.out_path}")


if __name__ == "__main__":  # pragma: no cover
    main()
