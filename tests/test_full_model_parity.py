"""FULL-MODEL numerical parity against torch-functional oracles.

Round-1 parity evidence was sub-block granular; these tests assemble the
complete forward graphs in torch, following the reference wiring
line-for-line, with weights copied from the Flax modules:

- AASIST backend (reference: models/sslassist.py:506-597): LL ->
  max_pool2d(3,3) -> 6 residual blocks -> attention stack -> two
  softmax-pooled branches -> GAT/pool -> two HtrgGAT inference paths ->
  element-wise max fusion -> readout concat order -> out_layer.
- SE-ResNet34 (reference: models/senet.py:120-142): stem -> 4 stages of
  SEBasicBlocks with downsample shortcuts -> avgpool -> dual heads.
- LCNN (reference: models/lcnn.py:193-217): 3 MFM conv stages with pools
  and BNs -> adaptive pool (1,64) -> NCHW flatten -> MFM-MLP -> head.

BatchNorm running stats and affine parameters are randomised (identically
on both sides) so a misplaced or missing BN cannot hide behind the
at-init identity transform. A transposed softmax axis, swapped readout
order, or NHWC translation slip fails these tests.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

import flax

KEY = jax.random.PRNGKey(0)


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _conv_w(p):  # flax HWIO -> torch OIHW
    return _t(p).permute(3, 2, 0, 1)


def randomize_bn(variables, seed=0):
    """Random running stats + affine for every BatchNorm, on the Flax side.
    Returns (variables, lookup) where lookup(path tuple) -> dict of torch
    tensors {mean, var, scale, bias} for the oracle."""
    gen = np.random.default_rng(seed)
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables["batch_stats"])
    table = {}

    def walk(sd, pd, path):
        if "mean" in sd and "var" in sd:
            shape = np.asarray(sd["mean"]).shape
            mean = gen.normal(size=shape).astype(np.float32) * 0.1
            var = gen.uniform(0.5, 1.5, size=shape).astype(np.float32)
            scale = gen.uniform(0.5, 1.5, size=shape).astype(np.float32)
            bias = gen.normal(size=shape).astype(np.float32) * 0.1
            sd["mean"], sd["var"] = jnp.asarray(mean), jnp.asarray(var)
            pd["scale"], pd["bias"] = jnp.asarray(scale), jnp.asarray(bias)
            table[path] = dict(mean=_t(mean), var=_t(var),
                               scale=_t(scale), bias=_t(bias))
            return
        for k in sd:
            walk(sd[k], pd[k], path + (k,))

    walk(stats, params, ())
    return {"params": params, "batch_stats": stats}, table


def bn_eval(h, e, dims):
    """torch BN eval with the injected stats; dims broadcasts per layout."""
    view = [1] * h.dim()
    view[dims] = -1
    return ((h - e["mean"].view(view)) / torch.sqrt(e["var"].view(view)
                                                    + 1e-5)
            ) * e["scale"].view(view) + e["bias"].view(view)


# --------------------------------------------------------------------------
# torch-functional oracle pieces (shared with tests/test_aasist_parity.py
# semantics, here with injected BN stats)
# --------------------------------------------------------------------------

def gat_oracle(x, p, bnp, temperature):
    """reference models/sslassist.py:102-151 (eval: dropout off)."""
    att = torch.tanh(
        (x.unsqueeze(2) * x.unsqueeze(1)) @ _t(p["att_proj"]["kernel"])
        + _t(p["att_proj"]["bias"])
    )
    att = F.softmax((att @ _t(p["att_weight"])) / temperature, dim=-2)
    x1 = (att.squeeze(-1) @ x) @ _t(p["proj_with_att"]["kernel"]) + \
        _t(p["proj_with_att"]["bias"])
    x2 = x @ _t(p["proj_without_att"]["kernel"]) + \
        _t(p["proj_without_att"]["bias"])
    return F.selu(bn_eval(x1 + x2, bnp, -1))


def htrg_oracle(x1, x2, master, p, bnp, temperature):
    """reference models/sslassist.py:202-329 (eval)."""
    n1 = x1.size(1)
    t1 = x1 @ _t(p["proj_type1"]["kernel"]) + _t(p["proj_type1"]["bias"])
    t2 = x2 @ _t(p["proj_type2"]["kernel"]) + _t(p["proj_type2"]["bias"])
    x = torch.cat([t1, t2], dim=1)
    if master is None:
        master = x.mean(dim=1, keepdim=True)

    att = torch.tanh(
        (x.unsqueeze(2) * x.unsqueeze(1)) @ _t(p["att_proj"]["kernel"])
        + _t(p["att_proj"]["bias"])
    )
    board = torch.zeros(att.shape[:3]).unsqueeze(-1)
    board[:, :n1, :n1] = att[:, :n1, :n1] @ _t(p["att_weight11"])
    board[:, n1:, n1:] = att[:, n1:, n1:] @ _t(p["att_weight22"])
    board[:, :n1, n1:] = att[:, :n1, n1:] @ _t(p["att_weight12"])
    board[:, n1:, :n1] = att[:, n1:, :n1] @ _t(p["att_weight12"])
    att_map = F.softmax(board / temperature, dim=-2)

    attm = torch.tanh((x * master) @ _t(p["att_projM"]["kernel"])
                      + _t(p["att_projM"]["bias"]))
    attm = F.softmax((attm @ _t(p["att_weightM"])) / temperature, dim=-2)
    m1 = (attm.squeeze(-1).unsqueeze(1) @ x) @ \
        _t(p["proj_with_attM"]["kernel"]) + _t(p["proj_with_attM"]["bias"])
    m2 = master @ _t(p["proj_without_attM"]["kernel"]) + \
        _t(p["proj_without_attM"]["bias"])
    new_master = m1 + m2

    h1 = (att_map.squeeze(-1) @ x) @ _t(p["proj_with_att"]["kernel"]) + \
        _t(p["proj_with_att"]["bias"])
    h2 = x @ _t(p["proj_without_att"]["kernel"]) + \
        _t(p["proj_without_att"]["bias"])
    h = F.selu(bn_eval(h1 + h2, bnp, -1))
    return h[:, :n1], h[:, n1:], new_master


def pool_oracle(h, p, k):
    """reference models/sslassist.py:341-368 (eval: dropout off)."""
    scores = torch.sigmoid(h @ _t(p["proj"]["kernel"]) + _t(p["proj"]["bias"]))
    n_keep = max(int(h.size(1) * k), 1)
    _, idx = torch.topk(scores, n_keep, dim=1)
    return torch.gather(h * scores, 1, idx.expand(-1, -1, h.size(2)))


def resblock_oracle(x, p, bnt, path, out_ch):
    """reference models/sslassist.py:406-429 (NCHW input)."""
    out = F.conv2d(x, _conv_w(p["conv1"]["kernel"]), _t(p["conv1"]["bias"]),
                   padding=(1, 1))
    out = bn_eval(out, bnt[path + ("bn2",)], 1)
    out = F.selu(out)
    out = F.conv2d(out, _conv_w(p["conv2"]["kernel"]), _t(p["conv2"]["bias"]),
                   padding=(0, 1))
    identity = x
    if x.size(1) != out_ch:
        identity = F.conv2d(
            x, _conv_w(p["conv_downsample"]["kernel"]),
            _t(p["conv_downsample"]["bias"]), padding=(0, 1),
        )
    return out + identity


# --------------------------------------------------------------------------
# 1. Full AASIST backend
# --------------------------------------------------------------------------

def test_full_aasist_backend_matches_torch_oracle():
    from occm_tpu.config import AASISTConfig
    from occm_tpu.models.aasist import AASISTBackend

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 24, 1024)).astype(np.float32)

    model = AASISTBackend(AASISTConfig())
    variables = model.init({"params": KEY, "dropout": KEY},
                           jnp.asarray(feats))
    variables, bnt = randomize_bn(variables, seed=1)
    ours_emb, ours_logits = model.apply(variables, jnp.asarray(feats))

    p = variables["params"]
    x = _t(feats)
    # reference models/sslassist.py:509-516
    x = x @ _t(p["LL"]["kernel"]) + _t(p["LL"]["bias"])     # [B,F,128]
    x = x.transpose(1, 2).unsqueeze(1)                      # [B,1,128,F]
    x = F.max_pool2d(x, (3, 3))                             # [B,1,42,8]
    x = F.selu(bn_eval(x, bnt[("first_bn",)], 1))

    # 6 residual blocks (reference l.457-463,519)
    for i, ch in enumerate([32, 32, 64, 64, 64, 64]):
        x = resblock_oracle(x, p[f"encoder_{i}"], bnt, (f"encoder_{i}",), ch)
    x = F.selu(bn_eval(x, bnt[("first_bn1",)], 1))          # [B,64,42,8]

    # attention stack (reference l.465-471,523)
    w = F.conv2d(x, _conv_w(p["att_conv1"]["kernel"]),
                 _t(p["att_conv1"]["bias"]))
    w = F.selu(w)
    w = bn_eval(w, bnt[("att_bn",)], 1)
    w = F.conv2d(w, _conv_w(p["att_conv2"]["kernel"]),
                 _t(p["att_conv2"]["bias"]))                # [B,64,42,8]

    # spectral branch (reference l.526-532)
    w1 = F.softmax(w, dim=-1)
    e_S = torch.sum(x * w1, dim=-1).transpose(1, 2) + _t(p["pos_S"])
    gat_S = gat_oracle(e_S, p["GAT_layer_S"], bnt[("GAT_layer_S", "bn")], 2.0)
    out_S = pool_oracle(gat_S, p["pool_S"], 0.5)

    # temporal branch (reference l.535-542)
    w2 = F.softmax(w, dim=-2)
    e_T = torch.sum(x * w2, dim=-2).transpose(1, 2)
    gat_T = gat_oracle(e_T, p["GAT_layer_T"], bnt[("GAT_layer_T", "bn")], 2.0)
    out_T = pool_oracle(gat_T, p["pool_T"], 0.5)

    def inference(tag, master):
        o_T, o_S, m = htrg_oracle(
            out_T, out_S, master, p[f"HtrgGAT_layer_ST{tag}1"],
            bnt[(f"HtrgGAT_layer_ST{tag}1", "bn")], 100.0,
        )
        o_S = pool_oracle(o_S, p[f"pool_hS{tag}"], 0.5)
        o_T = pool_oracle(o_T, p[f"pool_hT{tag}"], 0.5)
        oTa, oSa, ma = htrg_oracle(
            o_T, o_S, m, p[f"HtrgGAT_layer_ST{tag}2"],
            bnt[(f"HtrgGAT_layer_ST{tag}2", "bn")], 100.0,
        )
        return o_T + oTa, o_S + oSa, m + ma

    out_T1, out_S1, m1 = inference("1", _t(p["master1"]))
    out_T2, out_S2, m2 = inference("2", _t(p["master2"]))

    # max fusion + readout (reference l.580-595)
    fT = torch.max(out_T1, out_T2)
    fS = torch.max(out_S1, out_S2)
    fm = torch.max(m1, m2)
    emb = torch.cat(
        [torch.abs(fT).max(dim=1).values, fT.mean(dim=1),
         torch.abs(fS).max(dim=1).values, fS.mean(dim=1), fm.squeeze(1)],
        dim=1,
    )
    logits = emb @ _t(p["out_layer"]["kernel"]) + _t(p["out_layer"]["bias"])

    np.testing.assert_allclose(np.asarray(ours_emb), emb.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_logits), logits.numpy(),
                               atol=3e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# 2. Full SE-ResNet34
# --------------------------------------------------------------------------

def test_full_se_resnet34_matches_torch_oracle():
    from occm_tpu.models.senet import SEResNet

    rng = np.random.default_rng(2)
    feats = rng.normal(size=(2, 24, 96, 1)).astype(np.float32)  # NHWC

    model = SEResNet(layers=(3, 4, 6, 3))
    variables = model.init({"params": KEY}, jnp.asarray(feats))
    variables, bnt = randomize_bn(variables, seed=3)
    ours_com, ours_des = model.apply(variables, jnp.asarray(feats))

    p = variables["params"]
    x = _t(np.transpose(feats, (0, 3, 1, 2)))               # NCHW [B,1,24,96]

    # stem (reference models/senet.py:122-125)
    x = F.conv2d(x, _conv_w(p["conv1"]["kernel"]), stride=2, padding=3)
    x = F.relu(bn_eval(x, bnt[("bn1",)], 1))
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    def se_block(x, bp, bnt, path, stride, down):
        """reference models/senet.py:45-61."""
        residual = x
        out = F.conv2d(x, _conv_w(bp["conv1"]["kernel"]), stride=stride,
                       padding=1)
        out = F.relu(bn_eval(out, bnt[path + ("bn1",)], 1))
        out = F.conv2d(out, _conv_w(bp["conv2"]["kernel"]), padding=1)
        out = bn_eval(out, bnt[path + ("bn2",)], 1)
        # SELayer (reference l.24-28)
        b, c = out.size(0), out.size(1)
        y = F.adaptive_avg_pool2d(out, 1).view(b, c)
        y = torch.relu(y @ _t(bp["se"]["fc1"]["kernel"]))
        y = torch.sigmoid(y @ _t(bp["se"]["fc2"]["kernel"]))
        out = out * y.view(b, c, 1, 1)
        if down:
            residual = F.conv2d(x, _conv_w(bp["downsample_conv"]["kernel"]),
                                stride=stride)
            residual = bn_eval(residual, bnt[path + ("downsample_bn",)], 1)
        return F.relu(out + residual)

    inplanes = 16
    for stage, (planes, blocks) in enumerate(
        zip((16, 32, 64, 128), (3, 4, 6, 3)), start=1
    ):
        stride = 1 if stage == 1 else 2
        for b in range(blocks):
            s = stride if b == 0 else 1
            down = b == 0 and (s != 1 or inplanes != planes)
            name = f"layer{stage}_{b}"
            x = se_block(x, p[name], bnt, (name,), s, down)
            inplanes = planes

    x = F.adaptive_avg_pool2d(x, 1).view(x.size(0), -1)
    com = x @ _t(p["embedding"]["kernel"]) + _t(p["embedding"]["bias"])
    des = x @ _t(p["classifier"]["kernel"]) + _t(p["classifier"]["bias"])

    np.testing.assert_allclose(np.asarray(ours_com), com.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_des), des.numpy(),
                               atol=3e-5, rtol=1e-4)


# --------------------------------------------------------------------------
# 3. Full LCNN (plain head; AngleLinear has its own oracle tests)
# --------------------------------------------------------------------------

def test_full_lcnn_matches_torch_oracle():
    from occm_tpu.models.lcnn import LCNN

    rng = np.random.default_rng(4)
    feats = rng.normal(size=(2, 24, 256, 1)).astype(np.float32)  # NHWC

    model = LCNN(asoftmax=False)
    variables = model.init({"params": KEY, "dropout": KEY},
                           jnp.asarray(feats))
    variables, bnt = randomize_bn(variables, seed=5)
    ours = model.apply(variables, jnp.asarray(feats))

    p = variables["params"]
    x = _t(np.transpose(feats, (0, 3, 1, 2)))               # NCHW [B,1,24,256]

    def mfm_conv(x, cp, k, pad):
        """reference models/lcnn.py:121-136 type=1."""
        h = F.conv2d(x, _conv_w(cp["filter"]["kernel"]),
                     _t(cp["filter"]["bias"]), padding=pad)
        a, b = torch.split(h, h.size(1) // 2, 1)
        return torch.max(a, b)

    def mfm_dense(x, dp):
        """type=0, eval: dropout off."""
        h = x @ _t(dp["filter"]["kernel"]) + _t(dp["filter"]["bias"])
        a, b = torch.split(h, h.size(1) // 2, 1)
        return torch.max(a, b)

    # layer1 (reference l.157-159)
    x = mfm_conv(x, p["layer1_mfm"], 5, 2)
    x = F.max_pool2d(x, 2, 2)
    # layer2 (l.161-164): group (1x1 mfm then 3x3 mfm), pool, BN
    x = mfm_conv(x, p["layer2_group"]["conv_a"], 1, 0)
    x = mfm_conv(x, p["layer2_group"]["conv"], 3, 1)
    x = F.max_pool2d(x, 2, 2)
    x = bn_eval(x, bnt[("layer2_bn",)], 1)
    # layer3 (l.166-169)
    x = mfm_conv(x, p["layer3_group"]["conv_a"], 1, 0)
    x = mfm_conv(x, p["layer3_group"]["conv"], 3, 1)
    x = F.max_pool2d(x, 2, 2)
    x = bn_eval(x, bnt[("layer3_bn",)], 1)

    # adaptive pool + NCHW flatten + MFM MLP (l.171-215)
    x = F.adaptive_avg_pool2d(x, (1, 64))
    x = x.reshape(x.size(0), -1)
    x = mfm_dense(x, p["fc0"])
    x = mfm_dense(x, p["fc1"])
    x = mfm_dense(x, p["fc2"])
    logits = x @ _t(p["fc3"]["kernel"]) + _t(p["fc3"]["bias"])

    np.testing.assert_allclose(np.asarray(ours), logits.numpy(),
                               atol=3e-5, rtol=1e-4)
