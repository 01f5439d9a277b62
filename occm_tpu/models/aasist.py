"""AASIST spectro-temporal graph-attention backend in Flax
(reference: models/sslassist.py:58-597).

Layout is TPU-native NHWC throughout: the RawNet2 encoder sees
[B, spectral=42, temporal, C] where the reference uses NCHW
[B, C, 42, temporal]. Graph tensors are [B, nodes, dim] as in the reference.

Functional-JAX rewrites of reference quirks (SURVEY.md §7):
- HtrgGraphAttentionLayer's in-place `att_board[...] = ...` block writes
  (reference: models/sslassist.py:282-293) become block concatenation —
  scatter-free and fusible.
- GraphPool's torch.topk+gather (reference: models/sslassist.py:349-368)
  becomes jax.lax.top_k + take_along_axis (same descending-score node order).
- Residual_block computes bn1+SELU but discards the result, convolving the
  raw input instead (`out = self.conv1(x)`, reference:
  models/sslassist.py:406-415). The discarded computation has no effect on
  the function, so it is simply not performed here; bn1 parameters are not
  materialised.
- The master-node expands at reference models/sslassist.py:545-546 are dead
  code (the raw [1,1,D] parameters are what is actually passed at l.549-563);
  we pass the parameters and let broadcasting do the rest, identically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occm_tpu.config import AASISTConfig
from occm_tpu.ops import max_pool2d

_xavier = nn.initializers.xavier_normal()


def _bn_feat(train: bool, name: str):
    """BatchNorm over all leading axes, per trailing feature — equivalent to
    the reference's view(-1, D) + BatchNorm1d (models/sslassist.py:140-146)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
    )


class GraphAttentionLayer(nn.Module):
    """reference: models/sslassist.py:58-151."""

    out_dim: int
    temperature: float = 1.0
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x, train: bool = False):
        # input dropout (reference p=0.2)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # attention map over pairwise node products
        pair = x[:, :, None, :] * x[:, None, :, :]        # [B,N,N,D]
        att = jnp.tanh(nn.Dense(self.out_dim, name="att_proj")(pair))
        att_weight = self.param("att_weight", _xavier, (self.out_dim, 1))
        att = att @ att_weight                            # [B,N,N,1]
        att = att / self.temperature
        att = jax.nn.softmax(att, axis=-2)

        x1 = nn.Dense(self.out_dim, name="proj_with_att")(
            jnp.einsum("bij,bjd->bid", att[..., 0], x)
        )
        x2 = nn.Dense(self.out_dim, name="proj_without_att")(x)
        x = x1 + x2
        x = _bn_feat(train, "bn")(x)
        return nn.selu(x)


class HtrgGraphAttentionLayer(nn.Module):
    """Heterogeneous GAT with a master node
    (reference: models/sslassist.py:154-329)."""

    in_dim: int
    out_dim: int
    temperature: float = 1.0
    dropout: float = 0.2

    @nn.compact
    def __call__(self, x1, x2, master: Optional[jnp.ndarray] = None,
                 train: bool = False):
        num_type1 = x1.shape[1]
        num_type2 = x2.shape[1]

        x1 = nn.Dense(self.in_dim, name="proj_type1")(x1)
        x2 = nn.Dense(self.in_dim, name="proj_type2")(x2)
        x = jnp.concatenate([x1, x2], axis=1)             # [B,N,D]

        if master is None:
            master = jnp.mean(x, axis=1, keepdims=True)

        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        # ---- heterogeneous attention map (block att_weights) ----
        pair = x[:, :, None, :] * x[:, None, :, :]        # [B,N,N,D]
        att = jnp.tanh(nn.Dense(self.out_dim, name="att_proj")(pair))

        w11 = self.param("att_weight11", _xavier, (self.out_dim, 1))
        w22 = self.param("att_weight22", _xavier, (self.out_dim, 1))
        w12 = self.param("att_weight12", _xavier, (self.out_dim, 1))

        a11 = att[:, :num_type1, :num_type1, :] @ w11
        a12 = att[:, :num_type1, num_type1:, :] @ w12
        a21 = att[:, num_type1:, :num_type1, :] @ w12
        a22 = att[:, num_type1:, num_type1:, :] @ w22
        att_board = jnp.concatenate(
            [
                jnp.concatenate([a11, a12], axis=2),
                jnp.concatenate([a21, a22], axis=2),
            ],
            axis=1,
        )                                                  # [B,N,N,1]
        att_map = jax.nn.softmax(att_board / self.temperature, axis=-2)

        # ---- directional master-node update ----
        attm = jnp.tanh(nn.Dense(self.out_dim, name="att_projM")(x * master))
        wM = self.param("att_weightM", _xavier, (self.out_dim, 1))
        attm = jax.nn.softmax((attm @ wM) / self.temperature, axis=-2)
        m1 = nn.Dense(self.out_dim, name="proj_with_attM")(
            jnp.einsum("bn,bnd->bd", attm[..., 0], x)[:, None, :]
        )
        m2 = nn.Dense(self.out_dim, name="proj_without_attM")(master)
        master = m1 + m2

        # ---- node projection ----
        h1 = nn.Dense(self.out_dim, name="proj_with_att")(
            jnp.einsum("bij,bjd->bid", att_map[..., 0], x)
        )
        h2 = nn.Dense(self.out_dim, name="proj_without_att")(x)
        h = h1 + h2
        h = _bn_feat(train, "bn")(h)
        h = nn.selu(h)

        return h[:, :num_type1], h[:, num_type1:], master


class GraphPool(nn.Module):
    """Top-k node pooling (reference: models/sslassist.py:332-368)."""

    k: float
    p: float

    @nn.compact
    def __call__(self, h, train: bool = False):
        z = nn.Dropout(self.p, deterministic=not train)(h) if self.p > 0 else h
        scores = nn.sigmoid(nn.Dense(1, name="proj")(z))   # [B,N,1]
        n_keep = max(int(h.shape[1] * self.k), 1)
        _, idx = jax.lax.top_k(scores[..., 0], n_keep)     # descending
        weighted = h * scores
        return jnp.take_along_axis(weighted, idx[..., None], axis=1)


class ResidualBlock(nn.Module):
    """RawNet2-style residual conv block
    (reference: models/sslassist.py:373-429). NHWC input."""

    out_channels: int
    first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        # NOTE: the reference's pre-activation (bn1+SELU) result is discarded
        # — conv1 consumes the raw input (models/sslassist.py:415). We mirror
        # the *function* and skip the dead computation entirely.
        out = nn.Conv(
            self.out_channels, (2, 3), padding=((1, 1), (1, 1)), name="conv1"
        )(x)
        out = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn2",
        )(out)
        out = nn.selu(out)
        out = nn.Conv(
            self.out_channels, (2, 3), padding=((0, 0), (1, 1)), name="conv2"
        )(out)

        if x.shape[-1] != self.out_channels:
            identity = nn.Conv(
                self.out_channels, (1, 3), padding=((0, 0), (1, 1)),
                name="conv_downsample",
            )(identity)
        return out + identity


class AASISTBackend(nn.Module):
    """AASIST over pre-extracted SSL features
    (reference: models/sslassist.py:432-597, minus the SSL frontend).

    Input: x_ssl [B, frames, ssl_dim]. Returns (emb [B,160], logits [B,2]).
    """

    cfg: AASISTConfig = AASISTConfig()

    @nn.compact
    def __call__(self, x_ssl, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        gat0, gat1 = cfg.gat_dims
        t0, t1, t2, _t3 = cfg.temperatures

        x = nn.Dense(cfg.ll_dim, name="LL")(x_ssl)         # [B,F,128]
        # NCHW [B,1,128,F] == NHWC [B,128,F,1]
        x = jnp.transpose(x, (0, 2, 1))[..., None]
        x = max_pool2d(x, (3, 3))                          # [B,42,F//3,1]
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="first_bn",
        )(x)
        x = nn.selu(x)

        # RawNet2 encoder: 6 residual blocks (reference l.457-463)
        chans = [f[1] if isinstance(f, (tuple, list)) else f
                 for f in cfg.filts[1:]]
        blocks = [chans[0], chans[1], chans[2], chans[3], chans[3], chans[3]]
        for i, ch in enumerate(blocks):
            x = ResidualBlock(ch, first=(i == 0), name=f"encoder_{i}")(
                x, train=train
            )
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="first_bn1",
        )(x)
        x = nn.selu(x)                                     # [B,42,F',64]

        # attention stack (reference l.465-471; its hard-coded 128/64 widths
        # are ll_dim and the last encoder channel count)
        w = nn.Conv(cfg.ll_dim, (1, 1), name="att_conv1")(x)
        w = nn.selu(w)
        w = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="att_bn",
        )(w)
        w = nn.Conv(chans[-1], (1, 1), name="att_conv2")(w)  # [B,42,F',64]

        # spectral branch: softmax over the temporal axis (reference l.526-532)
        w1 = jax.nn.softmax(w, axis=2)
        e_S = jnp.sum(x * w1, axis=2)                      # [B,42,64]
        pos_S = self.param(
            "pos_S", nn.initializers.normal(1.0),
            (1, cfg.pos_s_nodes, chans[-1]),
        )
        e_S = e_S + pos_S
        gat_S = GraphAttentionLayer(
            gat0, temperature=t0, dropout=cfg.dropout, name="GAT_layer_S"
        )(e_S, train=train)
        out_S = GraphPool(cfg.pool_ratios[0], cfg.pool_dropout,
                          name="pool_S")(gat_S, train=train)

        # temporal branch: softmax over the spectral axis (reference l.535-542)
        w2 = jax.nn.softmax(w, axis=1)
        e_T = jnp.sum(x * w2, axis=1)                      # [B,F',64]
        gat_T = GraphAttentionLayer(
            gat0, temperature=t1, dropout=cfg.dropout, name="GAT_layer_T"
        )(e_T, train=train)
        out_T = GraphPool(cfg.pool_ratios[1], cfg.pool_dropout,
                          name="pool_T")(gat_T, train=train)

        # learnable master nodes — the raw [1,1,D] params are passed, as the
        # reference effectively does (models/sslassist.py:549,563)
        master1 = self.param("master1", nn.initializers.normal(1.0),
                             (1, 1, gat0))
        master2 = self.param("master2", nn.initializers.normal(1.0),
                             (1, 1, gat0))

        def inference(out_T_in, out_S_in, master, tag):
            ht1 = HtrgGraphAttentionLayer(
                gat0, gat1, temperature=t2, dropout=cfg.dropout,
                name=f"HtrgGAT_layer_ST{tag}1"
            )
            ht2 = HtrgGraphAttentionLayer(
                gat1, gat1, temperature=t2, dropout=cfg.dropout,
                name=f"HtrgGAT_layer_ST{tag}2"
            )
            pool_s = GraphPool(cfg.pool_ratios[2], cfg.pool_dropout,
                               name=f"pool_hS{tag}")
            pool_t = GraphPool(cfg.pool_ratios[3], cfg.pool_dropout,
                               name=f"pool_hT{tag}")

            o_T, o_S, m = ht1(out_T_in, out_S_in, master=master, train=train)
            o_S = pool_s(o_S, train=train)
            o_T = pool_t(o_T, train=train)
            o_T_aug, o_S_aug, m_aug = ht2(o_T, o_S, master=m, train=train)
            return o_T + o_T_aug, o_S + o_S_aug, m + m_aug

        out_T1, out_S1, m1 = inference(out_T, out_S, master1, "1")
        out_T2, out_S2, m2 = inference(out_T, out_S, master2, "2")

        drop_way = nn.Dropout(cfg.dropout, deterministic=not train)
        out_T1 = drop_way(out_T1)
        out_T2 = drop_way(out_T2)
        out_S1 = drop_way(out_S1)
        out_S2 = drop_way(out_S2)
        m1 = drop_way(m1)
        m2 = drop_way(m2)

        out_T = jnp.maximum(out_T1, out_T2)
        out_S = jnp.maximum(out_S1, out_S2)
        master = jnp.maximum(m1, m2)

        T_max = jnp.max(jnp.abs(out_T), axis=1)
        T_avg = jnp.mean(out_T, axis=1)
        S_max = jnp.max(jnp.abs(out_S), axis=1)
        S_avg = jnp.mean(out_S, axis=1)

        emb = jnp.concatenate(
            [T_max, T_avg, S_max, S_avg, master[:, 0, :]], axis=1
        )                                                  # [B,160]
        hidden = nn.Dropout(cfg.head_dropout, deterministic=not train)(emb)
        logits = nn.Dense(2, name="out_layer")(hidden)
        return emb, logits


class AModel(nn.Module):
    """Full XLSR + AASIST model (reference: models/sslassist.py:432-597).

    Input: raw waveform [B, T]. Returns (emb [B,160], logits [B,2]).
    """

    cfg: AASISTConfig = AASISTConfig()
    xlsr_cfg: Optional[object] = None  # XLSRConfig; default 300M

    @nn.compact
    def __call__(self, x, train: bool = False):
        from occm_tpu.config import XLSRConfig
        from occm_tpu.models.xlsr import XLSREncoder

        xlsr_cfg = self.xlsr_cfg or XLSRConfig()
        feats = XLSREncoder(xlsr_cfg, name="ssl_model")(x, train=train)
        return AASISTBackend(self.cfg, name="backend")(feats, train=train)
