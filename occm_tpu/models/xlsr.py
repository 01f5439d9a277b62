"""XLSR wav2vec2 encoder in Flax — the TPU-native replacement for the
fairseq frontend the reference loads from `xlsr2_300m.pt`
(reference: models/xlsr.py:25-52, models/sslassist.py:20-49:
`SSLModel.extract_feat(wave[B,T]) -> [B, frames, 1024]` with
features_only=True, mask=False).

Architecture (XLSR-R 300M):
- 7-layer conv feature encoder, overall stride 320 / receptive field 400
  (64600 samples -> 201 frames), layer-norm extractor mode, GELU.
- feature LayerNorm + 512->1024 projection.
- grouped conv relative positional embedding (k=128, groups=16, SamePad).
- 24 pre-norm transformer layers, d=1024, 16 heads, FFN 4096, GELU,
  final LayerNorm (layer_norm_first=True semantics).

TPU-first design decisions:
- layers are folded with `nn.scan` (single compiled block, stacked [L, ...]
  params — fast XLA compiles) and rematerialised with `nn.remat` so the
  64600-sample batch fits HBM during fine-tuning.
- matmuls run in bf16 (`cfg.dtype`) against fp32 parameters; layer norms and
  softmax stay fp32 (MXU-friendly, numerically safe).
- attention logits/softmax computed at fp32 via preferred_element_type.

The PyTorch->JAX checkpoint converter for fairseq weights lives in
`occm_tpu.models.convert_xlsr` (weight-norm on pos_conv is folded there).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from occm_tpu.config import XLSRConfig


def _dtype(cfg: XLSRConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def _norm_dtype(cfg: XLSRConfig):
    return jnp.bfloat16 if cfg.norm_dtype == "bfloat16" else jnp.float32


def _sp_constrain(x):
    """Megatron-style sequence parallelism, expressed purely as a GSPMD
    constraint: pin the frames axis (axis -2 of [B, T, D]) to the mesh's
    "tp" axis on the residual-path activations. XLA then decomposes the
    TP all-reduces into reduce-scatter + all-gather pairs and runs the
    LayerNorms/dropout/residual adds on 1/tp of the sequence per device.

    The mesh comes from the framework's own registry
    (parallel.compute_mesh — JAX exposes no public in-trace read of the
    legacy `with mesh:` context, and the old jax._src answer could
    silently no-op after an upgrade; r4 verdict item 6). The constraint
    is an explicit NamedSharding, so it binds with or without an ambient
    mesh context. No-op when no compute_mesh is active or its tp axis is
    1 (single-device tests run the same graph unsharded);
    tests/test_parallel.py asserts the reduce-scatter actually appears
    in the compiled HLO when tp > 1. The batch axis keeps whatever data
    axes the mesh has so this composes with dp/fsdp."""
    from jax.sharding import NamedSharding, PartitionSpec

    from occm_tpu.parallel.mesh import current_mesh

    m = current_mesh()
    if m is None or m.shape.get("tp", 1) <= 1:
        return x
    data = tuple(a for a in ("dp", "fsdp") if m.shape.get(a, 1) > 1)
    batch_part = data[0] if len(data) == 1 else (data or None)
    spec = [None] * x.ndim
    spec[-3] = batch_part
    spec[-2] = "tp"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(m, PartitionSpec(*spec)))


def _pp_constrain(x):
    """Pin a pipeline buffer's stage axis (axis 0) to the mesh's "pp"
    axis when tracing under a compute_mesh that has one; no-op otherwise
    so single-device CPU tests exercise the same schedule unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec

    from occm_tpu.parallel.mesh import current_mesh

    m = current_mesh()
    if m is not None and m.shape.get("pp", 1) > 1:
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(m, PartitionSpec("pp")))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def grad_multiply(x, mult: float):
    """fairseq GradMultiply: identity forward, gradient scaled by `mult`."""
    return x


def _gm_fwd(x, mult):
    return x, None


def _gm_bwd(mult, _, g):
    return (g * mult,)


grad_multiply.defvjp(_gm_fwd, _gm_bwd)


class ConvFeatureExtractor(nn.Module):
    """wav2vec2 conv subsampler (fairseq ConvFeatureExtractionModel
    equivalent). Input [B, T] waveform, output [B, frames, conv_dim]."""

    cfg: XLSRConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = _dtype(self.cfg)
        h = x[..., None].astype(dt)  # [B, T, 1]
        for i, (dim, k, s) in enumerate(self.cfg.conv_layers):
            h = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID", use_bias=True,
                dtype=dt, name=f"conv_{i}",
            )(h)
            if self.cfg.extractor_mode == "layer_norm":
                ndt = _norm_dtype(self.cfg)
                h = nn.LayerNorm(dtype=ndt, epsilon=1e-5, name=f"ln_{i}")(
                    h.astype(ndt)
                ).astype(dt)
            elif i == 0:
                h = nn.GroupNorm(
                    num_groups=dim, dtype=jnp.float32, epsilon=1e-5,
                    name="gn_0",
                )(h.astype(jnp.float32)).astype(dt)
            h = jax.nn.gelu(h, approximate=self.cfg.conv_gelu_approximate)
        return h


class PosConv(nn.Module):
    """Relative positional conv embedding (fairseq SamePad grouped conv,
    k=128, groups=16). Declares the identical {kernel, bias} tree as the
    nn.Conv it replaces, and dispatches the layout by cfg.pos_conv_impl
    (occm_tpu.ops.pos_conv: grouped | batched | s2d — same math,
    parity-tested; measured ledger in DESIGN.md). Callers crop the output
    to the input length (SamePad drops the trailing element for even k)."""

    cfg: XLSRConfig

    @nn.compact
    def __call__(self, x):
        from occm_tpu.ops.pos_conv import POS_CONV_IMPLS

        cfg = self.cfg
        dt = _dtype(cfg)
        c = cfg.encoder_embed_dim
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (cfg.conv_pos, c // cfg.conv_pos_groups, c), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        impl = POS_CONV_IMPLS[cfg.pos_conv_impl]
        out = impl(x.astype(dt), kernel.astype(dt), cfg.conv_pos_groups)
        return out + bias.astype(dt)


class ProjParams(nn.Module):
    """Parameter-only twin of nn.Dense: declares the same {kernel, bias}
    tree but leaves the matmul to the caller, so q/k/v projections can be
    fused into one wide dot while the checkpoint keeps separate q_proj/
    k_proj/v_proj names (converter + TP sharding rules unchanged)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32,
        )
        return kernel, bias


class Int8Dense(nn.Module):
    """Dense layer in the `quant_int8` serving layout: offline per-channel
    int8 weights + dynamic per-row int8 activations on the int8 MXU path
    (occm_tpu/ops/int8.py; 2x the bf16 MXU rate on v5e). Checkpoint tree:
    {kernel_q int8 [in, out], scale fp32 [out], bias fp32 [out]} — produced
    from a trained fp32 tree by `quantize_params_int8`."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self, x):
        from occm_tpu.ops.int8 import int8_matmul

        wq = self.param(
            "kernel_q", nn.initializers.zeros,
            (self.in_features, self.features), jnp.int8,
        )
        scale = self.param(
            "scale", nn.initializers.ones, (self.features,), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32,
        )
        return int8_matmul(x, wq, scale, bias, out_dtype=x.dtype)


class FastLayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm ({scale,bias} params, same init/eps) with
    fp32 statistics and a fused Pallas backward (occm_tpu.ops.layernorm).
    Output keeps the input dtype (the bf16 norm path)."""

    epsilon: float = 1e-5  # torch.nn.LayerNorm default (fairseq wav2vec2)

    @nn.compact
    def __call__(self, x):
        from occm_tpu.ops.layernorm import fast_layer_norm

        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        return fast_layer_norm(x, scale, bias, self.epsilon)


class SelfAttention(nn.Module):
    """Multi-head self-attention, fp32 softmax, bf16 matmuls."""

    cfg: XLSRConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = _dtype(cfg)
        d = cfg.encoder_embed_dim
        h = cfg.encoder_heads
        hd = d // h
        B, T, _ = x.shape

        if cfg.quant_int8:
            # W8A8 serving path: int8 MXU projections, bf16 attention math
            mk = lambda name: Int8Dense(d, d, name=name)
            q = mk("q_proj")(x)
            k = mk("k_proj")(x)
            v = mk("v_proj")(x)
        elif cfg.fused_qkv:
            # one [d, 3d] dot instead of three [d, d] dots: measured 3x
            # higher MXU rate on v5e for the N=1024 projections (the
            # emitter runs wide-N dots near peak, narrow-N at ~20%)
            wq, bq = ProjParams(d, d, name="q_proj")()
            wk, bk = ProjParams(d, d, name="k_proj")()
            wv, bv = ProjParams(d, d, name="v_proj")()
            w = jnp.concatenate([wq, wk, wv], axis=1).astype(dt)
            b = jnp.concatenate([bq, bk, bv]).astype(dt)
            qkv = jnp.dot(x.astype(dt), w) + b
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = nn.Dense(d, dtype=dt, name="q_proj")(x)
            k = nn.Dense(d, dtype=dt, name="k_proj")(x)
            v = nn.Dense(d, dtype=dt, name="v_proj")(x)

        from jax.ad_checkpoint import checkpoint_name

        q = q.reshape(B, T, h, hd)
        k = k.reshape(B, T, h, hd)
        v = v.reshape(B, T, h, hd)
        # named so the "attn_all" remat policy can save the projections:
        # the backward recompute then skips the three q/k/v dots
        q = checkpoint_name(q, "attn_q")
        k = checkpoint_name(k, "attn_k")
        v = checkpoint_name(v, "attn_v")

        # fairseq applies dropout to the softmax'd attention probabilities
        # (attention_dropout; live during reference training — the SSL
        # frontend runs in train mode, reference models/sslassist.py:24-48)
        pdrop = lambda p: nn.Dropout(
            cfg.attention_dropout, deterministic=not train)(p)

        if cfg.attention_impl == "flash":
            from occm_tpu.ops.attention import flash_attention

            if train and cfg.attention_dropout > 0.0:
                raise ValueError(
                    'attention_impl="flash" cannot apply attention_dropout '
                    "(the probabilities never materialise); train with an "
                    "xla-family impl or zero the rate")
            out = flash_attention(q, k, v).astype(dt)
        elif cfg.attention_impl == "skip":
            # NOT a real attention: passes V through untouched. Exists only
            # for perf attribution (bench A/B: step time without the
            # softmax(QK^T)V math bounds what any attention kernel can
            # recover). Never a valid training/serving config.
            out = v
        elif cfg.attention_impl.startswith("packed"):
            # head-GROUP block-diagonal packing: the MXU contracts 128 deep
            # natively, so a 64-deep QK^T contraction idles half the array
            # and the cost at this shape is per-dot issue overhead (the r3
            # post-mortem, DESIGN.md). Packing q of g heads into a
            # block-diagonal [gT, g*hd] against the group's depth-
            # concatenated k computes ALL g heads' score matrices in ONE
            # full-depth dot — exact same math, 1/g the dot instances at
            # g x the (negligible at this shape) dot FLOPs. PV is packed
            # the same way ([T, gT] probs x blockdiag(v) -> [T, g*hd]).
            # "packed" == pack width 2; "packed4"/"packed8" pack deeper.
            g = int(cfg.attention_impl[len("packed"):] or 2)
            if g < 2 or h % g:
                raise ValueError(
                    f"attention_impl={cfg.attention_impl!r}: pack width"
                    f" {g} must be >=2 and divide num_heads={h}"
                )
            P = h // g
            q = q * (hd ** -0.5)
            qh = q.transpose(0, 2, 1, 3).reshape(B, P, g, T, hd)
            kh = k.transpose(0, 2, 1, 3).reshape(B, P, g, T, hd)
            vh = v.transpose(0, 2, 1, 3).reshape(B, P, g, T, hd)
            kc = kh.transpose(0, 1, 3, 2, 4).reshape(B, P, T, g * hd)
            # block-diagonal via outer product with I_g:
            # [B,P,g,T,hd] x [g,1,g,1] -> [B,P,g,T,g,hd] -> [B,P,gT,g*hd]
            eye = jnp.eye(g, dtype=qh.dtype)[:, None, :, None]
            qp = (qh[:, :, :, :, None, :] * eye).reshape(
                B, P, g * T, g * hd)
            logits = jnp.einsum(
                "bpqd,bpkd->bpqk", qp, kc,
                preferred_element_type=_norm_dtype(cfg),
            )
            probs = pdrop(checkpoint_name(
                jax.nn.softmax(logits, axis=-1), "attn_probs"
            ).astype(dt))
            pc = probs.reshape(B, P, g, T, T).transpose(0, 1, 3, 2, 4)
            pc = pc.reshape(B, P, T, g * T)
            vp = (vh[:, :, :, :, None, :] * eye).reshape(
                B, P, g * T, g * hd)
            out = jnp.einsum("bpqk,bpkd->bpqd", pc, vp)
            out = out.reshape(B, P, T, g, hd).transpose(0, 2, 1, 3, 4)
            out = out.reshape(B, T, h, hd)
        elif cfg.attention_impl == "pad128":
            # T padded to the next multiple of 128 for the attention dot
            # chain only (key mask keeps the math exact, pad rows sliced
            # off): the emitter's odd-shape tiling penalty vs its
            # clean-shape rate, measured end-to-end. Dot-level A/B
            # (tools/repro_attn_bwd.py): the [256,256]x[256,64]-class
            # backward dots run at 28 vs 20 TF/s but the 62% extra FLOPs
            # lose more than the tiling wins — recorded NEGATIVE, kept as
            # a knob so the measurement stays reproducible in-program.
            Tp = -(-T // 128) * 128
            pad = ((0, 0), (0, Tp - T), (0, 0), (0, 0))
            qp = jnp.pad(q * (hd ** -0.5), pad)
            kp = jnp.pad(k, pad)
            vp = jnp.pad(v, pad)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qp, kp,
                preferred_element_type=_norm_dtype(cfg),
            )
            keymask = jnp.arange(Tp) < T
            logits = jnp.where(
                keymask[None, None, None, :], logits,
                jnp.asarray(-1e30, logits.dtype),
            )
            probs = pdrop(checkpoint_name(
                jax.nn.softmax(logits, axis=-1), "attn_probs"
            ).astype(dt))
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vp)[:, :T]
        elif cfg.attention_impl == "xla_merged":
            # same math as "xla" but with (B, H) flattened into ONE batch
            # dim for the two attention dots — gives XLA's convolution
            # emitter a single deep batch dimension (B·H=1536 at the bench
            # shape) instead of two nested ones, which changes its tiling
            # choices for the T=201/D=64 small-dot shapes
            q = (q * (hd ** -0.5)).transpose(0, 2, 1, 3).reshape(B * h, T, hd)
            km = k.transpose(0, 2, 1, 3).reshape(B * h, T, hd)
            vm = v.transpose(0, 2, 1, 3).reshape(B * h, T, hd)
            logits = jnp.einsum(
                "zqd,zkd->zqk", q, km,
                preferred_element_type=_norm_dtype(cfg),
            )
            probs = pdrop(checkpoint_name(
                jax.nn.softmax(logits, axis=-1), "attn_probs"
            ).astype(dt))
            out = jnp.einsum("zqk,zkd->zqd", probs, vm)
            out = out.reshape(B, h, T, hd).transpose(0, 2, 1, 3)
        else:
            q = q * (hd ** -0.5)
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k,
                preferred_element_type=_norm_dtype(cfg),
            )
            # named BEFORE the compute-dtype cast so the softmax VJP can
            # consume the saved value directly: with "attn_probs" saved the
            # backward needs neither the QK^T dot nor the softmax re-run
            # (d_logits = p*(dp - sum(dp*p)) needs only p, do, q, k, v)
            probs = pdrop(checkpoint_name(
                jax.nn.softmax(logits, axis=-1), "attn_probs"
            ).astype(dt))
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(B, T, d)
        # named so remat_policy="attn_out_inner" can save the pre-out_proj
        # attention output: the backward then never re-runs the attention
        # math (softmax(QK^T)V) — only the cheap q/k/v projection dots are
        # recomputed to feed the attention backward itself
        out = checkpoint_name(out, "attn_inner")
        if cfg.quant_int8:
            return Int8Dense(d, d, name="out_proj")(out)
        return nn.Dense(d, dtype=dt, name="out_proj")(out)


class TransformerLayer(nn.Module):
    """Pre-/post-norm transformer block (fairseq
    TransformerSentenceEncoderLayer equivalent)."""

    cfg: XLSRConfig
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        train = self.train
        dt = _dtype(cfg)
        drop = lambda: nn.Dropout(cfg.dropout, deterministic=not train)
        if cfg.ln_impl == "pallas":
            # fused-backward LayerNorm (fp32 stats, bf16 in/out) — same
            # {scale,bias} checkpoint tree as nn.LayerNorm
            ln = lambda name: FastLayerNorm(name=name)
        else:
            ln = lambda name: nn.LayerNorm(dtype=_norm_dtype(cfg),
                                           epsilon=1e-5, name=name)

        if cfg.seq_parallel:
            # sequence-shard the residual path over "tp": LNs, dropout
            # and residual adds run on 1/tp of the frames; GSPMD inserts
            # the all-gather feeding attention/FFN and turns their output
            # all-reduces into reduce-scatters (Megatron-SP)
            x = _sp_constrain(x)

        residual = x
        h = ln("self_attn_layer_norm")(x) if cfg.layer_norm_first else x
        h = SelfAttention(cfg, name="self_attn")(h, train=train)
        # named so remat_policy="attn_out" can save it: the backward pass
        # then skips recomputing QKV dots + attention + out_proj (~43% of
        # the forward FLOPs) for 39.5 MB/layer at the bench batch
        from jax.ad_checkpoint import checkpoint_name

        h = checkpoint_name(h, "attn_out")
        if cfg.seq_parallel:
            h = _sp_constrain(h)
        h = drop()(h)
        x = residual + h
        if not cfg.layer_norm_first:
            # post-norm: cast back to the compute dtype so the scan carry
            # dtype is stable (the LN itself runs at norm_dtype)
            x = ln("self_attn_layer_norm")(x).astype(dt)

        residual = x
        h = ln("final_layer_norm")(x) if cfg.layer_norm_first else x
        # fairseq's post-activation dropout (activation_dropout, fairseq
        # dropout2) sits between the GELU and fc2
        adrop = lambda: nn.Dropout(cfg.activation_dropout,
                                   deterministic=not train)
        if train and cfg.activation_dropout > 0.0 and (
                cfg.quant_int8 or cfg.ffn_impl == "pallas"):
            raise ValueError(
                "activation_dropout needs the hidden FFN activation "
                'materialised: train with ffn_impl="xla" and without '
                "quant_int8, or zero the rate")
        if cfg.quant_int8:
            h = Int8Dense(cfg.encoder_embed_dim, cfg.encoder_ffn_dim,
                          name="fc1")(h)
            h = jax.nn.gelu(h, approximate=cfg.gelu_approximate)
            h = Int8Dense(cfg.encoder_ffn_dim, cfg.encoder_embed_dim,
                          name="fc2")(h)
        elif cfg.ffn_impl == "pallas":
            # fused fc1+GELU+fc2 kernel: hidden [M,4096] activation stays
            # in VMEM (occm_tpu.ops.ffn; measured 122 vs 99 TF/s XLA).
            # Same checkpoint tree: parameters declared via ProjParams.
            from occm_tpu.ops.ffn import fused_ffn

            w1, b1 = ProjParams(cfg.encoder_embed_dim,
                                cfg.encoder_ffn_dim, name="fc1")()
            w2, b2 = ProjParams(cfg.encoder_ffn_dim,
                                cfg.encoder_embed_dim, name="fc2")()
            h = fused_ffn(h.astype(dt), w1.astype(dt), b1.astype(dt),
                          w2.astype(dt), b2.astype(dt),
                          approximate=cfg.gelu_approximate)
        else:
            h = nn.Dense(cfg.encoder_ffn_dim, dtype=dt, name="fc1")(h)
            h = jax.nn.gelu(h, approximate=cfg.gelu_approximate)
            h = adrop()(h)
            h = nn.Dense(cfg.encoder_embed_dim, dtype=dt, name="fc2")(h)
        if cfg.seq_parallel:
            h = _sp_constrain(h)
        h = drop()(h)
        x = residual + h
        if not cfg.layer_norm_first:
            x = ln("final_layer_norm")(x).astype(dt)
        return x


class XLSREncoder(nn.Module):
    """Full wav2vec2/XLSR feature extractor: raw wave -> contextual features.

    Drop-in for the reference's `SSLModel.extract_feat`
    (reference: models/xlsr.py:35-49): [B, T] -> [B, frames, out_dim].
    """

    cfg: XLSRConfig = XLSRConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        dt = _dtype(cfg)
        if x.ndim == 3:  # reference squeezes a trailing channel dim
            x = x[:, :, 0]

        conv_cls = ConvFeatureExtractor
        if cfg.conv_remat:
            conv_cls = nn.remat(conv_cls, prevent_cse=False)
        feats = conv_cls(cfg, name="feature_extractor")(x, train=train)
        # fairseq GradMultiply: scale (or stop) the gradient into the conv
        # stack; 0 skips the conv backward entirely
        if cfg.feature_grad_mult == 0.0:
            feats = jax.lax.stop_gradient(feats)
        elif cfg.feature_grad_mult != 1.0:
            feats = grad_multiply(feats, cfg.feature_grad_mult)
        conv_dim = cfg.conv_layers[-1][0]

        feats = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                             name="layer_norm")(
            feats.astype(jnp.float32)
        ).astype(dt)
        if conv_dim != cfg.encoder_embed_dim:
            feats = nn.Dense(
                cfg.encoder_embed_dim, dtype=dt, name="post_extract_proj"
            )(feats)
        # fairseq dropout_input: on the projected features entering the
        # encoder (wav2vec2.forward applies it before self.encoder)
        feats = nn.Dropout(cfg.dropout_input,
                           deterministic=not train)(feats)

        # relative positional conv embedding (SamePad: even kernel drops the
        # trailing element), grouped conv + GELU. pos_conv_impl picks the
        # layout (same math, same checkpoint tree — occm_tpu.ops.pos_conv)
        pos = PosConv(cfg, name="pos_conv")(feats)
        pos = pos[:, : feats.shape[1], :]
        pos = jax.nn.gelu(pos, approximate=cfg.conv_gelu_approximate)
        x = feats + pos

        if not cfg.layer_norm_first:
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                             name="encoder_layer_norm")(
                x.astype(jnp.float32)
            ).astype(dt)
        # fairseq TransformerEncoder input dropout (rate `dropout`),
        # after pos-conv add (+ the post-norm LN when layer_norm_first
        # is False)
        x = nn.Dropout(cfg.dropout, deterministic=not train)(x)

        # scan + remat over the transformer stack: stacked [L, ...] params,
        # one compiled block, recompute activations on the backward pass
        block_cls = TransformerLayer
        if cfg.remat:
            if cfg.remat_policy == "dots":
                policy = jax.checkpoint_policies.dots_saveable
            elif cfg.remat_policy == "attn_out":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out"
                )
            elif cfg.remat_policy == "attn_out_inner":
                # additionally saves the pre-out_proj attention output
                # (39.5 MB/layer at batch 96) so the backward recompute
                # skips the attention math entirely
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_inner"
                )
            elif cfg.remat_policy == "attn_probs":
                # + the softmax probabilities (124 MB/layer at batch 96,
                # norm_dtype): backward skips the QK^T dot AND the softmax
                # re-run — the probs feed the softmax VJP directly
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_inner", "attn_probs"
                )
            elif cfg.remat_policy == "attn_all":
                # + q/k/v (3x39.5 MB/layer): backward recomputes only the
                # layer norms and fc1+GELU; everything attention-side is
                # saved. HBM-hungry — pair with conv_remat at batch 96
                policy = jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_inner", "attn_probs",
                    "attn_q", "attn_k", "attn_v",
                )
            else:
                policy = None
            block_cls = nn.remat(block_cls, prevent_cse=False, policy=policy)

        class ScannedStack(nn.Module):
            cfg: XLSRConfig
            train: bool

            @nn.compact
            def __call__(self, carry, _):
                y = block_cls(self.cfg, self.train, name="layer")(carry)
                if self.train and self.cfg.layerdrop > 0.0:
                    # fairseq encoder_layerdrop: skip the whole layer with
                    # probability p (scan gives each step its own rng)
                    keep = jax.random.bernoulli(
                        self.make_rng("dropout"), 1.0 - self.cfg.layerdrop
                    )
                    y = jnp.where(keep, y, carry)
                return y, None

        if cfg.pp_stages > 1:
            x = self._pp_stack(cfg, train, ScannedStack, x)
            if cfg.layer_norm_first:
                x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                                 name="encoder_layer_norm")(
                    x.astype(jnp.float32)
                )
            return x.astype(jnp.float32)

        stack_cls = nn.scan(
            ScannedStack,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=cfg.encoder_layers,
            unroll=cfg.scan_unroll,
        )
        if cfg.bf16_param_mirror:
            # one bf16 cast of the whole stacked [L, ...] parameter tree
            # per step (hoisted out of the scan by XLA) instead of a
            # per-layer-per-use fp32->bf16 cast inside the scan body
            def _mirror(tree):
                return jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.bfloat16)
                    if hasattr(v, "dtype") and v.dtype == jnp.float32 else v,
                    tree,
                )

            stack_cls = nn.map_variables(
                stack_cls, "params", trans_in_fn=_mirror,
                init=self.is_initializing(),
            )
        stack = stack_cls(cfg, train, name="layers")
        x, _ = stack(x, None)

        if cfg.layer_norm_first:
            x = nn.LayerNorm(dtype=jnp.float32, epsilon=1e-5,
                             name="encoder_layer_norm")(
                x.astype(jnp.float32)
            )
        return x.astype(jnp.float32)

    def _pp_stack(self, cfg, train, scanned_stack_cls, x):
        """GPipe pipeline over the transformer stack (cfg.pp_stages > 1).

        Same math and the SAME parameter tree as the sequential nn.scan
        path: storage stays {layers/layer: [L, ...]} (checkpoints are
        interchangeable); an nn.map_variables view reshapes each leaf to
        [S, L/S, ...] and re-nests it under the per-stage vmap. One
        lax.scan runs M + S - 1 ticks of the classic fill/steady/drain
        schedule; the carry is the per-stage activation buffer [S, mb,
        F, D], rolled one stage per tick — under a mesh with a "pp" axis
        the roll lowers to an ICI collective-permute and each device
        computes only its own stage's layer chunk. Deterministic forward
        equals the sequential path exactly (tests/test_pipeline_pp.py);
        the pipeline bubble wastes (S-1)/(M+S-1) of stage compute.
        TPU-native capability beyond the reference (whose only
        parallelism is single-host DataParallel, oc_training.py:328).
        """
        S = cfg.pp_stages
        L = cfg.encoder_layers
        if cfg.seq_parallel:
            raise ValueError(
                "seq_parallel composes with dp/fsdp/tp but not with "
                "pp_stages > 1 (the sequence constraint's rank differs "
                "inside the stage vmap)")
        if L % S:
            raise ValueError(
                f"pp_stages={S} must divide encoder_layers={L}")
        chunk_len = L // S
        M = cfg.pp_microbatches or S
        B, F, D = x.shape
        if B % M:
            raise ValueError(
                f"pp_microbatches={M} must divide batch size {B}")
        mb = B // M
        dt = x.dtype
        unroll = cfg.scan_unroll

        class PPTick(nn.Module):
            cfg: XLSRConfig
            train: bool

            @nn.compact
            def __call__(self, buf, x_t):
                # shift each stage's output to the next stage, feed the
                # fresh microbatch (zeros during drain) into stage 0
                buf = jnp.roll(buf, 1, axis=0).at[0].set(x_t)
                buf = _pp_constrain(buf)
                chunk = nn.scan(
                    scanned_stack_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    length=chunk_len,
                    unroll=unroll,
                )
                stages = nn.vmap(
                    chunk,
                    in_axes=(0, None),
                    out_axes=0,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                )
                y, _ = stages(self.cfg, self.train, name="stk")(buf, None)
                y = _pp_constrain(y)
                return y, y[-1]

        tick_cls = nn.scan(
            PPTick,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            length=M + S - 1,
        )

        mirror = cfg.bf16_param_mirror

        def _to_view(tree):
            # storage {"params": {"layer": [L, ...]}} -> module view
            # {"params": {"stk": {"layer": [S, L/S, ...]}}} (+ the
            # one-shot bf16 mirror cast, same as the sequential path)
            if not tree or not tree.get("params"):
                return tree
            leaves = jax.tree_util.tree_map(
                lambda v: v.reshape((S, chunk_len) + v.shape[1:]),
                tree["params"]["layer"],
            )
            if mirror:
                leaves = jax.tree_util.tree_map(
                    lambda v: v.astype(jnp.bfloat16)
                    if hasattr(v, "dtype") and v.dtype == jnp.float32
                    else v,
                    leaves,
                )
            return {"params": {"stk": {"layer": leaves}}}

        def _from_view(tree):
            if not tree or not tree.get("params"):
                return tree
            inner = tree["params"]["stk"]["layer"]
            return {"params": {"layer": jax.tree_util.tree_map(
                lambda v: v.reshape((L,) + v.shape[2:]), inner
            )}}

        tick_cls = nn.map_variables(
            tick_cls, "params", trans_in_fn=_to_view,
            trans_out_fn=_from_view, init=self.is_initializing(),
        )

        x_mb = x.reshape(M, mb, F, D)
        xs = jnp.concatenate(
            [x_mb, jnp.zeros((S - 1, mb, F, D), dt)], axis=0
        )
        buf0 = _pp_constrain(jnp.zeros((S, mb, F, D), dt))
        _, ys = tick_cls(cfg, train, name="layers")(buf0, xs)
        # microbatch m drains from the last stage at tick m + S - 1
        return ys[S - 1:].reshape(B, F, D)


class SSLModel(nn.Module):
    """API-compatible alias for the reference's SSLModel wrapper
    (reference: models/xlsr.py:25-52): `extract_feat(wave) -> [B,F,out_dim]`.

    Parameters live under the `model` scope, mirroring the reference's
    `self.model` attribute holding the fairseq encoder.
    """

    cfg: XLSRConfig = XLSRConfig()

    @property
    def out_dim(self) -> int:
        return self.cfg.out_dim

    @nn.compact
    def __call__(self, input_data, train: bool = False):
        return XLSREncoder(self.cfg, name="model")(input_data, train=train)

    def extract_feat(self, input_data, train: bool = False):
        return self(input_data, train=train)
