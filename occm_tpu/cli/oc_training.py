"""One-class training CLI — flag-compatible with the reference trainer
(reference: oc_training.py:279-290), plus first-class knobs for what the
reference toggled by commenting code in/out (model choice, loss weights,
RawBoost; reference: oc_training.py:320-332,380-381).

Usage:
    python -m occm_tpu.cli.oc_training \
        --train_protocol_file ... --train_dataset_dir ... --model aasist
"""

from __future__ import annotations

import argparse
import dataclasses

import optax

from occm_tpu.config import (
    AASISTConfig,
    MeshConfig,
    RawBoostConfig,
    TrainConfig,
    XLSRConfig,
)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Train a model on a dataset")
    # reference flags (oc_training.py:279-290)
    parser.add_argument(
        "--train_dataset_dir", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof2019_LA_train/wav",
    )
    parser.add_argument(
        "--test_dataset_dir", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof2019_LA_eval/flac",
    )
    parser.add_argument("--model", type=str, default="aasist",
                        choices=["aasist", "ssl_resnet34", "ssl_lcnn",
                                 "ssl_lcnn_asoftmax", "occm", "cnn"])
    parser.add_argument("--finetuned", action="store_true", default=False)
    parser.add_argument(
        "--train_protocol_file", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof_LA_cm_protocols/"
                "ASVspoof2019.LA.cm.train.trn.txt",
    )
    parser.add_argument(
        "--test_protocol_file", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof_LA_cm_protocols/"
                "ASVspoof2019.LA.cm.eval.trl.txt",
    )
    # framework knobs (defaults = reference shipped config,
    # oc_training.py:324,342,380-382)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--num_epochs", type=int, default=100)
    parser.add_argument("--compactness_weight", type=float, default=0.0)
    parser.add_argument("--descriptiveness_weight", type=float, default=1.0)
    parser.add_argument("--groups_per_step", type=int, default=1)
    parser.add_argument("--cut", type=int, default=64600)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--vocoded_dir", type=str, default=None)
    parser.add_argument("--checkpoint_dir", type=str, default=".")
    parser.add_argument("--dp", type=int, default=-1)
    parser.add_argument("--fsdp", type=int, default=1,
                        help="ZeRO-3 degree: params + Adam moments "
                             "shard over this many devices (batch "
                             "shards over dp*fsdp)")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument(
        "--pp", type=int, default=1,
        help="pipeline stages: GPipe schedule over the transformer "
             "stack (stacked layer params shard stage-wise on the "
             "mesh's pp axis; must divide encoder_layers)")
    parser.add_argument(
        "--seq_parallel", action="store_true", default=False,
        help="Megatron-style sequence parallelism over the tp axis: the "
             "residual path (LNs/dropout/residual adds) runs sequence-"
             "sharded; GSPMD decomposes the TP all-reduces into "
             "reduce-scatter + all-gather. Requires --tp > 1; not "
             "composable with --pp")
    parser.add_argument(
        "--pp_microbatches", type=int, default=0,
        help="microbatches for the pipeline schedule (0 = pp). More "
             "microbatches shrink the (pp-1)/(M+pp-1) bubble; must "
             "divide the batch")
    parser.add_argument("--rawboost_algo", type=int, default=0,
                        help="0 disables (matches the reference's "
                             "commented-out call); 1-8 enable on-device "
                             "RawBoost")
    parser.add_argument("--wandb_project", type=str, default=None)
    parser.add_argument("--xlsr_tiny", action="store_true",
                        help="tiny XLSR config (CPU smoke runs)")
    parser.add_argument(
        "--pretrained_xlsr", type=str, default=None,
        help="orbax params dir from occm-convert-xlsr (xlsr2_300m), or the "
             "raw fairseq/HF checkpoint itself (.pt/.safetensors — "
             "converted in-memory); grafted into the SSL frontend before "
             "training",
    )
    parser.add_argument(
        "--init_from", type=str, default=None,
        help="full-model warm start: an orbax checkpoint (trainer epoch "
             "dir or occm-convert-model output) or a reference-trained "
             "torch .pt (aasist_vocoded_*.pt etc.); params AND BatchNorm "
             "stats are grafted, the optimizer starts fresh",
    )
    parser.add_argument(
        "--fast_numerics", action="store_true", default=False,
        help="bench-validated TPU-fast config: bf16 norms + tanh GELU "
             "(transformer AND conv extractor), bf16 parameter mirror, "
             "'attn_out_inner' remat — +32%% measured on v5e, trajectory-"
             "equivalent at tiny scale (tests/test_fast_numerics.py)")
    parser.add_argument(
        "--pos_conv_impl", type=str, default="grouped",
        choices=("grouped", "batched", "s2d"),
        help="layout of the positional conv (same math, same checkpoint "
             "tree — occm_tpu.ops.pos_conv; measured ledger in DESIGN.md)")
    parser.add_argument(
        "--attention_impl", type=str, default="auto",
        help='attention layout for training: "auto" (default) resolves '
             "from --cut and the numerics config via the measured long-"
             "cut tables (occm_tpu.classify.impl_select / DESIGN.md: "
             "Pallas kernels win exact-numerics cuts >=5 s, +10-15% "
             "fwd+bwd; XLA wins the 4 s reference cut and bf16-norm "
             "configs); or pin xla | xla_merged | packed[N] | flash")
    parser.add_argument(
        "--steps_per_dispatch", type=int, default=1,
        help="scan k optimizer steps per device dispatch (amortises the "
             "fixed dispatch cost; ragged tails are flushed)")
    parser.add_argument(
        "--feature_grad_mult", type=float, default=1.0,
        help="scale (0 stops) the gradient into the conv feature "
             "extractor — fairseq's GradMultiply fine-tune knob. 0 is "
             "the fairseq-style frozen-extractor fine-tune (skips the "
             "conv backward entirely; measured 225.8 utt/s vs 207.1 on "
             "v5e). Default 1.0 matches the reference's end-to-end "
             "fine-tune semantics")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint (epoch, "
                             "or a newer mid-epoch step checkpoint — the "
                             "epoch is replayed deterministically up to "
                             "it)")
    parser.add_argument(
        "--checkpoint_every_steps", type=int, default=0,
        help="preemption safety: save a mid-epoch step checkpoint every "
             "N optimizer steps (and on SIGTERM); --resume continues "
             "bit-identically from it. 0 = per-epoch only")
    parser.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (fail fast on NaNs)")
    parser.add_argument(
        "--grad_accum", type=int, default=1,
        help="accumulate gradients over N micro-batches (whole "
             "meta-batches each) before ONE optimizer update — "
             "numerically equivalent to the single big-batch update "
             "(global-denominator scaling; tests/test_grad_accum.py) "
             "while peak activation HBM drops ~N-fold. "
             "groups_per_step must be divisible by N")
    parser.add_argument(
        "--lr_schedule", type=str, default="constant",
        choices=["constant", "cosine", "linear"],
        help="learning-rate schedule over optimizer steps (constant = "
             "the reference's fixed lr, oc_training.py:324; cosine/"
             "linear: warmup over --warmup_steps then decay over "
             "--decay_steps to lr*--lr_end_ratio)")
    parser.add_argument("--warmup_steps", type=int, default=0)
    parser.add_argument("--decay_steps", type=int, default=0)
    parser.add_argument("--lr_end_ratio", type=float, default=0.0)
    return parser


def make_model(name: str, xlsr_cfg: XLSRConfig):
    from occm_tpu.models import AModel, OCCM, SSLLCNN, SSLResNet34, TotalCNNNet

    if name == "aasist":
        return AModel(AASISTConfig(), xlsr_cfg=xlsr_cfg), "dual"
    if name == "ssl_resnet34":
        return SSLResNet34(xlsr_cfg=xlsr_cfg), "dual"
    if name == "ssl_lcnn":
        return SSLLCNN(xlsr_cfg=xlsr_cfg), "logits"
    if name == "ssl_lcnn_asoftmax":
        # reference: oc_training.py:334-335 (AngleLoss criterion)
        return SSLLCNN(xlsr_cfg=xlsr_cfg, asoftmax=True), "angle"
    if name == "cnn":
        return TotalCNNNet(xlsr_cfg=xlsr_cfg), "logits"
    if name == "occm":
        return OCCM(xlsr_cfg=xlsr_cfg), "occm"
    raise ValueError(name)


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    cfg = TrainConfig(
        model=args.model,
        checkpoint_prefix=f"{args.model}_vocoded",
        lr=args.lr,
        num_epochs=args.num_epochs,
        compactness_weight=args.compactness_weight,
        descriptiveness_weight=args.descriptiveness_weight,
        seed=args.seed,
        cut=args.cut,
        groups_per_step=args.groups_per_step,
        rawboost=RawBoostConfig(algo=args.rawboost_algo),
        mesh=MeshConfig(dp=args.dp, fsdp=args.fsdp, tp=args.tp,
                        pp=args.pp),
        checkpoint_dir=args.checkpoint_dir,
        wandb_project=args.wandb_project,
        steps_per_dispatch=args.steps_per_dispatch,
        checkpoint_every_steps=args.checkpoint_every_steps,
        grad_accum=args.grad_accum,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        decay_steps=args.decay_steps,
        lr_end_ratio=args.lr_end_ratio,
    )

    print("*************************************************")
    print(f"Train dataset dir = {args.train_dataset_dir}")
    print(f"Test dataset dir = {args.test_dataset_dir}")
    print(f"model = {args.model}")
    print(f"finetuned = {args.finetuned}")
    print(f"train_protocol_file = {args.train_protocol_file}")
    print(f"test_protocol_file = {args.test_protocol_file}")
    print("*************************************************")

    from occm_tpu.data import MetaBatchPipeline, PFDataset
    from occm_tpu.train.checkpoint import save_checkpoint
    from occm_tpu.train.loop import train

    dataset = PFDataset(
        args.train_protocol_file,
        dataset_dir=args.train_dataset_dir,
        vocoded_dir=args.vocoded_dir,
        cut=cfg.cut,
        seed=cfg.seed,
    )
    # the pipeline shards its epoch by the mesh's DATA axes, not raw
    # process index: on a pod where tp/pp cross host boundaries, hosts
    # replicating the same batch shard must load identical data
    # (parallel.data_shard_for_process)
    from occm_tpu.parallel import make_mesh

    mesh = make_mesh(cfg.mesh)
    pipeline = MetaBatchPipeline(
        dataset, groups_per_step=cfg.groups_per_step, seed=cfg.seed,
        mesh=mesh,
    )

    xlsr_cfg = XLSRConfig.tiny() if args.xlsr_tiny else XLSRConfig()
    if args.fast_numerics:
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, norm_dtype="bfloat16", gelu_approximate=True,
            conv_gelu_approximate=True, bf16_param_mirror=True,
            remat_policy="attn_out_inner",
        )
    if args.pos_conv_impl != "grouped":
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, pos_conv_impl=args.pos_conv_impl
        )
    if args.feature_grad_mult != 1.0:
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, feature_grad_mult=args.feature_grad_mult
        )
    if args.pp > 1:
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, pp_stages=args.pp,
            pp_microbatches=args.pp_microbatches,
        )
    if args.seq_parallel:
        xlsr_cfg = dataclasses.replace(xlsr_cfg, seq_parallel=True)
    # training-side attention layout: same measured policy as scoring
    # (impl_select), keyed on the fixed training cut and numerics — the
    # 4 s reference cut stays on the XLA path, exact-numerics long-cut
    # fine-tunes get the flash kernels (+10-15% fwd+bwd, DESIGN.md)
    from occm_tpu.classify.impl_select import select_attention_impl

    impl = select_attention_impl(cfg.cut, args.attention_impl,
                                 norm_dtype=xlsr_cfg.norm_dtype)
    if impl != xlsr_cfg.attention_impl:
        xlsr_cfg = dataclasses.replace(xlsr_cfg, attention_impl=impl)
    model, output_kind = make_model(args.model, xlsr_cfg)

    prefix = cfg.checkpoint_prefix  # reference naming: aasist_vocoded_{e}

    def checkpoint_fn(state, epoch):
        print("Saving the models...")
        save_checkpoint(state, cfg.checkpoint_dir, prefix, epoch)

    param_graft = None
    stats_graft = None
    if args.pretrained_xlsr:
        import os

        frontend_scope = "ssl_model" if args.model == "aasist" else "frontend"
        if args.pretrained_xlsr.endswith((".pt", ".safetensors")):
            # raw fairseq/HF checkpoint: convert in-memory
            from occm_tpu.models.convert_xlsr import (
                convert_fairseq_state_dict, convert_hf_state_dict,
                detect_format, load_safetensors)

            if args.pretrained_xlsr.endswith(".safetensors"):
                sd = load_safetensors(args.pretrained_xlsr)
            else:
                import torch

                st = torch.load(args.pretrained_xlsr, map_location="cpu",
                                weights_only=False)
                sd = st.get("model", st)
                if hasattr(sd, "state_dict"):
                    sd = sd.state_dict()
            conv = (convert_hf_state_dict if detect_format(sd) == "hf"
                    else convert_fairseq_state_dict)
            xlsr_params = conv(sd, xlsr_cfg)
        else:
            import orbax.checkpoint as ocp

            xlsr_params = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.pretrained_xlsr)
            )

        def param_graft(params):
            params = dict(params)
            params[frontend_scope] = xlsr_params
            print(f"Grafted pretrained XLSR into '{frontend_scope}'")
            return params

    elif args.init_from:
        # full-model warm start (orbax dir or reference-trained .pt)
        import os

        if args.init_from.endswith(".pt"):
            from occm_tpu.models.convert_backend import (
                convert_model_state_dict, load_torch_state_dict)

            restored = convert_model_state_dict(
                load_torch_state_dict(args.init_from), xlsr_cfg=xlsr_cfg
            )
        else:
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.init_from)
            )

        def param_graft(params):
            print(f"Warm start from {args.init_from}")
            return restored["params"]

        if restored.get("batch_stats"):
            def stats_graft(batch_stats):
                return restored["batch_stats"]

    print("Training starts...")
    train(
        model, pipeline, cfg, mesh=mesh,
        checkpoint_fn=checkpoint_fn, output_kind=output_kind,
        param_graft=param_graft, stats_graft=stats_graft,
        resume=args.resume,
    )


if __name__ == "__main__":
    main()
