"""AASIST sub-block numerical parity against torch-functional oracles.

Each oracle follows the reference's torch ops line-for-line
(reference: models/sslassist.py) with weights copied from the Flax modules,
so axis conventions (softmax dim=-2, matmul orientation, top-k gather
order, conv padding) are checked against torch itself.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occm_tpu.models.aasist import (
    GraphAttentionLayer,
    GraphPool,
    HtrgGraphAttentionLayer,
    ResidualBlock,
)

KEY = jax.random.PRNGKey(0)


def _t(a):
    return torch.tensor(np.asarray(a, np.float32))


def _bn_eval(h):
    # flax/torch BatchNorm eval with default stats: (h - 0)/sqrt(1+eps)
    return h / torch.sqrt(torch.tensor(1.0 + 1e-5))


def test_graph_attention_layer_matches_torch_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 12, 24)).astype(np.float32)
    layer = GraphAttentionLayer(out_dim=16, temperature=2.0)
    variables = layer.init({"params": KEY, "dropout": KEY}, jnp.asarray(x))
    ours = np.asarray(layer.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    xt = _t(x)
    # reference models/sslassist.py:102-132
    nb = xt.size(1)
    pair = xt.unsqueeze(2).expand(-1, -1, nb, -1) * \
        xt.unsqueeze(2).expand(-1, -1, nb, -1).transpose(1, 2)
    att = torch.tanh(pair @ _t(p["att_proj"]["kernel"]) +
                     _t(p["att_proj"]["bias"]))
    att = att @ _t(p["att_weight"])
    att = att / 2.0
    att = F.softmax(att, dim=-2)
    # reference models/sslassist.py:134-138
    x1 = (att.squeeze(-1) @ xt) @ _t(p["proj_with_att"]["kernel"]) + \
        _t(p["proj_with_att"]["bias"])
    x2 = xt @ _t(p["proj_without_att"]["kernel"]) + \
        _t(p["proj_without_att"]["bias"])
    h = _bn_eval(x1 + x2)
    oracle = F.selu(h).numpy()
    np.testing.assert_allclose(ours, oracle, atol=2e-5)


def test_htrg_graph_attention_matches_torch_oracle():
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(2, 7, 20)).astype(np.float32)
    x2 = rng.normal(size=(2, 5, 20)).astype(np.float32)
    master = rng.normal(size=(1, 1, 20)).astype(np.float32)

    layer = HtrgGraphAttentionLayer(in_dim=20, out_dim=16, temperature=100.0)
    variables = layer.init(
        {"params": KEY, "dropout": KEY}, jnp.asarray(x1), jnp.asarray(x2),
        master=jnp.asarray(master),
    )
    o1, o2, om = layer.apply(
        variables, jnp.asarray(x1), jnp.asarray(x2),
        master=jnp.asarray(master),
    )

    p = variables["params"]
    t1, t2, tm = _t(x1), _t(x2), _t(master)
    n1, n2 = t1.size(1), t2.size(1)
    # reference models/sslassist.py:202-232
    t1p = t1 @ _t(p["proj_type1"]["kernel"]) + _t(p["proj_type1"]["bias"])
    t2p = t2 @ _t(p["proj_type2"]["kernel"]) + _t(p["proj_type2"]["bias"])
    x = torch.cat([t1p, t2p], dim=1)

    nb = x.size(1)
    pair = x.unsqueeze(2).expand(-1, -1, nb, -1) * \
        x.unsqueeze(2).expand(-1, -1, nb, -1).transpose(1, 2)
    att = torch.tanh(pair @ _t(p["att_proj"]["kernel"]) +
                     _t(p["att_proj"]["bias"]))
    board = torch.zeros_like(att[:, :, :, 0]).unsqueeze(-1)
    w11, w22, w12 = (_t(p["att_weight11"]), _t(p["att_weight22"]),
                     _t(p["att_weight12"]))
    board[:, :n1, :n1, :] = att[:, :n1, :n1, :] @ w11
    board[:, n1:, n1:, :] = att[:, n1:, n1:, :] @ w22
    board[:, :n1, n1:, :] = att[:, :n1, n1:, :] @ w12
    board[:, n1:, :n1, :] = att[:, n1:, :n1, :] @ w12
    att_map = F.softmax(board / 100.0, dim=-2)

    # master update (reference models/sslassist.py:255-270,310-316)
    attm = torch.tanh((x * tm) @ _t(p["att_projM"]["kernel"]) +
                      _t(p["att_projM"]["bias"]))
    attm = F.softmax((attm @ _t(p["att_weightM"])) / 100.0, dim=-2)
    m1 = (attm.squeeze(-1).unsqueeze(1) @ x) @ \
        _t(p["proj_with_attM"]["kernel"]) + _t(p["proj_with_attM"]["bias"])
    m2 = tm @ _t(p["proj_without_attM"]["kernel"]) + \
        _t(p["proj_without_attM"]["bias"])
    new_master = m1 + m2

    h1 = (att_map.squeeze(-1) @ x) @ _t(p["proj_with_att"]["kernel"]) + \
        _t(p["proj_with_att"]["bias"])
    h2 = x @ _t(p["proj_without_att"]["kernel"]) + \
        _t(p["proj_without_att"]["bias"])
    h = F.selu(_bn_eval(h1 + h2))

    np.testing.assert_allclose(np.asarray(o1), h[:, :n1].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o2), h[:, n1:].numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(om), new_master.numpy(), atol=2e-5)


def test_graph_pool_matches_torch_topk_gather():
    rng = np.random.default_rng(2)
    h = rng.normal(size=(3, 10, 8)).astype(np.float32)
    pool = GraphPool(k=0.5, p=0.3)
    variables = pool.init({"params": KEY, "dropout": KEY}, jnp.asarray(h))
    ours = np.asarray(pool.apply(variables, jnp.asarray(h)))

    p = variables["params"]
    ht = _t(h)
    # reference models/sslassist.py:341-368
    scores = torch.sigmoid(ht @ _t(p["proj"]["kernel"]) + _t(p["proj"]["bias"]))
    n_keep = max(int(10 * 0.5), 1)
    _, idx = torch.topk(scores, n_keep, dim=1)
    idx = idx.expand(-1, -1, 8)
    oracle = torch.gather(ht * scores, 1, idx).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


@pytest.mark.parametrize("first,in_ch,out_ch", [(True, 1, 32), (False, 32, 32),
                                                (False, 32, 64)])
def test_residual_block_matches_torch_conv_semantics(first, in_ch, out_ch):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 13, 17, in_ch)).astype(np.float32)
    block = ResidualBlock(out_ch, first=first)
    variables = block.init({"params": KEY}, jnp.asarray(x))
    ours = np.asarray(block.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    xt = _t(np.transpose(x, (0, 3, 1, 2)))  # NCHW

    def conv(h, name, padding):
        w = _t(p[name]["kernel"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
        return F.conv2d(h, w, _t(p[name]["bias"]), padding=padding)

    # reference models/sslassist.py:406-429: conv1 consumes the RAW input
    # (the bn1+selu result is discarded)
    out = conv(xt, "conv1", (1, 1))
    out = _bn_eval(out)
    out = F.selu(out)
    out = conv(out, "conv2", (0, 1))
    identity = xt
    if in_ch != out_ch:
        identity = conv(xt, "conv_downsample", (0, 1))
    oracle = (out + identity).numpy()
    np.testing.assert_allclose(
        ours, np.transpose(oracle, (0, 2, 3, 1)), atol=2e-5
    )
