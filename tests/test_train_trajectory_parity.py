"""Cross-framework TRAINING-DYNAMICS parity: N steps of torch Adam vs the
JAX/optax train step at identical weights and identical data.

Forward and input-gradient parity are already oracle-proven
(tests/test_xlsr_hf_oracle.py, tests/test_full_model_parity.py), but those
can't catch a wrong Adam epsilon placement, a bias-correction slip, or a
label-order bug in the update actually applied at
reference: oc_training.py:324,380-385 (optim.Adam(lr) + loss.backward() +
optimizer.step() on cw*compactness + dw*descriptiveness). This test runs
the whole loop on both frameworks:

  torch side: HF `transformers.Wav2Vec2Model` (independent implementation
  of the XLSR encoder) + a mirrored pooling/embedding/classifier head +
  torch.nn.functional.pairwise_distance-based compactness + F.cross_entropy
  + torch.optim.Adam.

  JAX side: our XLSREncoder (weights converted from the HF state dict via
  convert_hf_state_dict) + the same head + occm_tpu.losses +
  occm_tpu.train.loop.make_train_step with optax.adam.

Dropout/layerdrop off, fp32, identical per-step batches. Gates: per-step
losses agree and final parameters stay close after N steps — the update
rule itself is cross-checked, not just one gradient.
"""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from occm_tpu.config import MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig
from occm_tpu.models import XLSREncoder
from occm_tpu.models.convert_xlsr import convert_hf_state_dict
from occm_tpu.train.loop import make_train_step
from occm_tpu.train.state import TrainState

transformers = pytest.importorskip("transformers")

from test_xlsr_hf_oracle import _hf_config  # noqa: E402

CUT = 3200
EMB_DIM = 16
N_STEPS = 12
LR = 1e-3
CW, DW = 0.1, 0.9  # the alternate trainer's weights (test_dataloader_v2.py)


def _cfg() -> XLSRConfig:
    return dataclasses.replace(
        XLSRConfig.tiny(), dropout=0.0, layerdrop=0.0,
        dtype="float32", norm_dtype="float32",
        gelu_approximate=False, conv_gelu_approximate=False,
    )


class TrajModel(nn.Module):
    """XLSR encoder -> mean pool -> SELU embedding -> 2-class head,
    returning (emb, logits) like the dual-head backends."""

    cfg: XLSRConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = XLSREncoder(self.cfg, name="ssl")(x, train=train)
        pooled = jnp.mean(feats, axis=1)
        emb = jax.nn.selu(nn.Dense(EMB_DIM, name="emb")(pooled))
        logits = nn.Dense(2, name="head")(emb)
        return emb, logits


class TorchTraj(torch.nn.Module):
    def __init__(self, hf_model, d_model):
        super().__init__()
        self.ssl = hf_model
        self.emb = torch.nn.Linear(d_model, EMB_DIM)
        self.head = torch.nn.Linear(EMB_DIM, 2)

    def forward(self, x):
        feats = self.ssl(x).last_hidden_state
        pooled = feats.mean(dim=1)
        emb = F.selu(self.emb(pooled))
        return emb, self.head(emb)


def _torch_compactness(emb):
    """reference: losses/custom_loss.py:4-29 (leave-one-out closed form)."""
    bona = emb[:6]
    others = (bona.sum(dim=0, keepdim=True) - bona) / 5.0
    return F.pairwise_distance(bona, others).mean()


def _batches():
    gen = np.random.default_rng(7)
    for i in range(N_STEPS):
        x = (gen.normal(size=(12, CUT)) * 0.1).astype(np.float32)
        labels = np.array([0] * 6 + [1] * 6, np.int64)
        yield x, labels


def _run_torch(model):
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    losses = []
    for x, labels in _batches():
        emb, logits = model(torch.tensor(x))
        loss = CW * _torch_compactness(emb) + F.cross_entropy(
            logits, torch.tensor(labels)
        ) * DW
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return np.asarray(losses)


def _run_jax(params, model):
    cfg = TrainConfig(
        lr=LR, cut=CUT, groups_per_step=1,
        compactness_weight=CW, descriptiveness_weight=DW,
        rawboost=RawBoostConfig(algo=0), mesh=MeshConfig(dp=1, tp=1),
    )
    tx = optax.adam(LR)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
        opt_state=tx.init(params), tx=tx, apply_fn=model.apply,
    )
    step = make_train_step(cfg, output_kind="dual")
    losses = []
    for i, (x, labels) in enumerate(_batches()):
        state, m = step(
            state, (jnp.asarray(x), jnp.asarray(labels.astype(np.int32))),
            jax.random.PRNGKey(i),  # unused: all dropout is off
        )
        losses.append(float(m["loss"]))
    return np.asarray(losses), state


@pytest.mark.slow
def test_training_trajectory_matches_torch_adam():
    cfg = _cfg()
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(_hf_config(cfg))
    tmodel = TorchTraj(hf, cfg.encoder_embed_dim)

    # identical initial weights: convert HF -> our encoder tree; copy the
    # two head linears
    ssl_params = convert_hf_state_dict(hf.state_dict(), cfg)
    params = {
        "ssl": ssl_params,
        "emb": {
            "kernel": jnp.asarray(
                tmodel.emb.weight.detach().numpy().T),
            "bias": jnp.asarray(tmodel.emb.bias.detach().numpy()),
        },
        "head": {
            "kernel": jnp.asarray(
                tmodel.head.weight.detach().numpy().T),
            "bias": jnp.asarray(tmodel.head.bias.detach().numpy()),
        },
    }
    # deep-copy: converted leaves can alias the torch parameter storage
    # (state_dict tensors -> numpy views); torch Adam updates in-place and
    # would silently mutate the "initial" JAX params mid-test
    params = jax.tree_util.tree_map(
        lambda a: jnp.array(np.array(a, copy=True)), params
    )
    jmodel = TrajModel(cfg)

    # sanity: identical forward before any update
    x0, lab0 = next(iter(_batches()))
    with torch.no_grad():
        temb, tlog = tmodel(torch.tensor(x0))
    jemb, jlog = jmodel.apply({"params": params}, jnp.asarray(x0))
    np.testing.assert_allclose(np.asarray(jlog), tlog.numpy(),
                               atol=2e-4, rtol=0)

    t_losses = _run_torch(tmodel)
    j_losses, state = _run_jax(params, jmodel)

    # per-step losses: the same numbers through both frameworks
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-3, atol=2e-4)
    # the trajectory must actually move (a frozen model would pass above)
    assert abs(t_losses[0] - t_losses[-1]) > 1e-3

    # final parameters after N optimizer steps stay together. (No flat
    # whole-tree compare: torch carries 80 params we deliberately don't —
    # the unused masked_spec_embed and the pos_conv weight-norm `g`, which
    # the converter folds into one kernel. Compare per-leaf instead.)
    head_t = tmodel.head.weight.detach().numpy().T
    head_j = np.asarray(state.params["head"]["kernel"])
    np.testing.assert_allclose(head_j, head_t, rtol=0, atol=5e-4)
    emb_t = tmodel.emb.weight.detach().numpy().T
    emb_j = np.asarray(state.params["emb"]["kernel"])
    np.testing.assert_allclose(emb_j, emb_t, rtol=0, atol=5e-4)
    # one deep encoder leaf: fc1 kernel of the scanned stack, layer 0
    fc1_j = np.asarray(
        state.params["ssl"]["layers"]["layer"]["fc1"]["kernel"][0]
    )
    fc1_t = hf.encoder.layers[0].feed_forward.intermediate_dense.weight \
        .detach().numpy().T
    np.testing.assert_allclose(fc1_j, fc1_t, rtol=0, atol=5e-4)


def test_adam_update_matches_torch_exactly():
    """The bare optimizer on a fixed synthetic gradient stream: optax.adam
    must reproduce torch.optim.Adam bit-for-fp32-bit over 25 steps
    (epsilon placement, bias correction, lr schedule constant)."""
    gen = np.random.default_rng(3)
    p0 = gen.normal(size=(7, 5)).astype(np.float32)
    grads = [gen.normal(size=(7, 5)).astype(np.float32) for _ in range(25)]

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    topt = torch.optim.Adam([tp], lr=1e-3)
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.tensor(g)
        topt.step()

    jp = jnp.asarray(p0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(jp)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, jp)
        jp = optax.apply_updates(jp, updates)

    np.testing.assert_allclose(
        np.asarray(jp), tp.detach().numpy(), rtol=0, atol=1e-6
    )
