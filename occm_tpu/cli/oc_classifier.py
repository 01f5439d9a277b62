"""One-class classifier / scoring CLI — flag-compatible with the reference
(reference: oc_classifier.py:316-331).

Phase 1 builds the bonafide reference embedding + threshold (cached);
phase 2 scores the eval set with the selected mode (1c2 default, matching
reference: oc_classifier.py:358).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="One-class classifier")
    parser.add_argument("--pretrained-sslaasist", type=str,
                        default="aasist_vocoded_1",
                        help="orbax checkpoint dir from oc_training")
    parser.add_argument("--pretrained-ssl", type=str, default=None)
    parser.add_argument("--pretrained-senet", type=str, default=None)
    parser.add_argument(
        "--protocol_file", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof_LA_cm_protocols/"
                "ASVspoof2019.LA.cm.train.trn.txt",
    )
    parser.add_argument(
        "--dataset_dir", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof2019_LA_train/flac",
    )
    parser.add_argument(
        "--eval_protocol_file", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof_LA_cm_protocols/"
                "ASVspoof2019.LA.cm.eval.trl.txt",
    )
    parser.add_argument(
        "--eval_dataset_dir", type=str,
        default="/datab/Dataset/ASVspoof/LA/ASVspoof2019_LA_eval/flac",
    )
    parser.add_argument("--mode", type=str, default="1c2",
                        choices=["1c1", "1c2", "2c1", "2c2"],
                        help="scoring mode (reference: "
                             "oc_classifier.py:206-312)")
    parser.add_argument("--score_file", type=str, default="scores.txt")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--bucket_step", type=int, default=16000)
    parser.add_argument(
        "--decode_threads", type=int, default=8,
        help="C++ decode threads for the path-based scoring fast lane "
             "(match the eval host's cores)")
    parser.add_argument(
        "--data_parallel", type=int, default=0, metavar="N",
        help="shard scoring batches over N local devices (-1 = all) — the "
             "TPU equivalent of the reference's DataParallel(aasist) at "
             "inference (reference: oc_classifier.py:343). batch_size is "
             "rounded up to a multiple of N. Default 0 = single device.")
    parser.add_argument("--xlsr_tiny", action="store_true")
    parser.add_argument(
        "--attention_impl", type=str, default="auto",
        help='attention layout for scoring: "auto" (default) resolves '
             "PER LENGTH BUCKET from the measured v5e table — xla wins "
             "short utterances, the Pallas flash kernels win long ones "
             "(occm_tpu.classify.impl_select, DESIGN.md long-T lane); or "
             "pin one of xla | xla_merged | packed[N] | pad128 | flash "
             "for every bucket. The reference scores full-length audio "
             "(oc_classifier.py:93-94), so eval sweeps span both regimes.")
    parser.add_argument(
        "--fast_numerics", action="store_true", default=False,
        help="bf16 norms + tanh GELU scoring (same knobs as training's "
             "--fast_numerics; encoder features within 2%% of the exact "
             "path — validate EER impact on your eval set before "
             "production use; default stays exact)")
    parser.add_argument(
        "--quant_int8", action="store_true", default=False,
        help="W8A8 int8 scoring: quantise the XLSR transformer "
             "projections to per-channel int8 weights + dynamic per-row "
             "int8 activations on the MXU (occm_tpu.ops.int8). Scoring "
             "only — the checkpoint stays fp32 and is transformed at "
             "load time. Accuracy evidence so far is tiny-scale/random-"
             "weights only (cosine ≈0.9996, tools/exp_int8_scoring.py); "
             "occm-parity-gate's int8 stage checks the EER delta on real "
             "trained weights — run it before production use")
    parser.add_argument(
        "--allow_random_init", action="store_true",
        help="proceed with random weights if checkpoint restore fails "
             "(testing only — a real scoring run must hard-fail)",
    )
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)

    import dataclasses

    from occm_tpu.classify import BucketedEmbedder, OneClassScorer
    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.data import ASVDataset
    from occm_tpu.models import AModel, SSLResNet34

    xlsr_cfg = XLSRConfig.tiny() if args.xlsr_tiny else XLSRConfig()
    if args.fast_numerics:
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, norm_dtype="bfloat16", gelu_approximate=True,
            conv_gelu_approximate=True, bf16_param_mirror=True,
        )
    separate = args.mode in ("1c1", "2c1")
    if separate:
        # separate (extractor, encoder) pair == ssl + se_resnet34 path
        model = SSLResNet34(xlsr_cfg=xlsr_cfg)
        ckpt = args.pretrained_ssl or args.pretrained_sslaasist
    else:
        model = AModel(AASISTConfig(), xlsr_cfg=xlsr_cfg)
        ckpt = args.pretrained_sslaasist

    # init to build the template, then restore
    import os

    import orbax.checkpoint as ocp

    # fail fast on a missing checkpoint before paying for model init
    if not args.allow_random_init:
        to_check = (
            [args.pretrained_ssl, args.pretrained_senet]
            if separate and args.pretrained_ssl and args.pretrained_senet
            else [ckpt]
        )
        for path in to_check:
            if not (os.path.isdir(path) or
                    (path.endswith(".pt") and os.path.isfile(path))):
                raise SystemExit(
                    f"ERROR: could not restore pretrained weights: "
                    f"checkpoint {path!r} does not exist.\n"
                    "Pass --allow_random_init to score with random "
                    "weights (testing only)."
                )

    # host-fabricated restore template: the real init's values are
    # replaced by the restore, and tracing a 300M init through a remote
    # TPU costs minutes (utils/init_template.py)
    from occm_tpu.utils.init_template import fabricate_template_variables

    sample = jnp.zeros((1, 64600), jnp.float32)
    variables = fabricate_template_variables(model, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    def _restore(path):
        """orbax dir, or a reference-trained torch .pt state dict
        (aasist_vocoded_*.pt / ssl_vocoded_*.pt / senet34_vocoded_*.pt,
        reference: oc_training.py:401, test_dataloader_v2.py:144-145) —
        converted on load via models/convert_backend.py."""
        if path.endswith(".pt") and os.path.isfile(path):
            from occm_tpu.models.convert_backend import (
                convert_model_state_dict, load_torch_state_dict)

            out = convert_model_state_dict(
                load_torch_state_dict(path), xlsr_cfg=xlsr_cfg
            )
            out.pop("_kind", None)
            return out
        return ocp.StandardCheckpointer().restore(os.path.abspath(path))

    try:
        if separate and args.pretrained_ssl and args.pretrained_senet:
            # reference loads the two modules separately
            # (oc_classifier.py:340-342): XLSR params -> `frontend`,
            # SE-ResNet params -> `resnet34`. Restores may be bare param
            # trees or {"params","batch_stats"} dicts (torch imports).
            def _split(restored):
                if isinstance(restored, dict) and "params" in restored:
                    return restored["params"], restored.get("batch_stats", {})
                return restored, {}

            params = dict(params)
            batch_stats = dict(batch_stats) if batch_stats else {}
            params["frontend"], _ = _split(_restore(args.pretrained_ssl))
            params["resnet34"], senet_stats = _split(
                _restore(args.pretrained_senet))
            if senet_stats:
                batch_stats["resnet34"] = senet_stats
            print("Pretrained weights loaded")
        else:
            restored = _restore(ckpt)
            params = restored["params"]
            batch_stats = restored.get("batch_stats", {})
            print("Pretrained weights loaded")
    except Exception as e:
        if not args.allow_random_init:
            # scoring with random weights writes garbage scores.txt —
            # hard-fail unless the caller explicitly opted in (test flows)
            raise SystemExit(
                f"ERROR: could not restore pretrained weights from "
                f"{ckpt!r}: {e}\n"
                "Pass --allow_random_init to score with random weights "
                "(testing only)."
            )
        print(f"WARNING: could not restore pretrained weights ({e}); "
              "using random init (--allow_random_init)")

    if args.quant_int8:
        # transform the restored fp32 tree into the quant_int8 layout and
        # rebuild the model to match (init/restore above used the fp32
        # layout — checkpoints are always fp32)
        from occm_tpu.ops.int8 import quantize_params_int8

        params = quantize_params_int8(params)
        xlsr_cfg = dataclasses.replace(xlsr_cfg, quant_int8=True)
        if separate:
            model = SSLResNet34(xlsr_cfg=xlsr_cfg)
        else:
            model = AModel(AASISTConfig(), xlsr_cfg=xlsr_cfg)

    def build_model(xcfg):
        if separate:
            return SSLResNet34(xlsr_cfg=xcfg)
        return AModel(AASISTConfig(), xlsr_cfg=xcfg)

    # weights travel as a jit ARGUMENT (BucketedEmbedder variables=...):
    # closure-captured 300M trees serialize into the compiled program
    # and break remote-compile transports
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def embed_fn_for(m):
        def embed_fn(v, x):
            out = m.apply(v, x, train=False)
            if isinstance(out, tuple):
                emb, logits = out
            else:
                emb = logits = out
            return emb, logits

        return embed_fn

    mesh = None
    if args.data_parallel:
        from occm_tpu.classify import make_dp_mesh

        n = None if args.data_parallel == -1 else args.data_parallel
        mesh = make_dp_mesh(n)
        print(f"scoring data-parallel over {mesh.devices.size} devices")

    # per-bucket attention-impl selection: each length bucket runs the
    # layout that wins at its shape (classify.impl_select policy; a
    # pinned --attention_impl passes through unchanged for every bucket)
    from occm_tpu.classify.impl_select import select_attention_impl

    def embed_fn_factory(bucket_samples):
        impl = select_attention_impl(bucket_samples, args.attention_impl,
                                     norm_dtype=xlsr_cfg.norm_dtype)
        return embed_fn_for(build_model(
            dataclasses.replace(xlsr_cfg, attention_impl=impl)))

    embedder = BucketedEmbedder(
        embed_fn_factory=embed_fn_factory, bucket_step=args.bucket_step,
        batch_size=args.batch_size, mesh=mesh, variables=variables,
        decode_threads=args.decode_threads,
    )
    scorer = OneClassScorer(embedder)

    train_dataset = ASVDataset(args.protocol_file, args.dataset_dir)
    eval_dataset = ASVDataset(
        args.eval_protocol_file, args.eval_dataset_dir, eval=True
    )

    if args.mode in ("1c1", "1c2"):
        reference, threshold = scorer.create_reference_embedding(
            train_dataset, verbose=True
        )
        scorer.score_eval_set_1c(
            eval_dataset, reference, threshold,
            score_file=args.score_file, verbose=True,
        )
        print(f"threshold = {threshold}")
    else:
        scorer.score_eval_set_2c(
            eval_dataset, score_file=args.score_file, verbose=True
        )


if __name__ == "__main__":
    main()
