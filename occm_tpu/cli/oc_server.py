"""One-class scoring HTTP server CLI.

Serves a trained XLSR+AASIST one-class model over HTTP (POST /score with
WAV/FLAC/raw-PCM bytes -> {"score", "prediction", "label"}). The model
checkpoint comes from oc_training; the reference embedding + threshold
artifacts come from a prior oc_classifier run (reference_embedding.npy /
threshold.npy — the cached artefacts of reference: oc_classifier.py:169-201).

The serving stack is occm_tpu.serve (AOT per-bucket executables + dynamic
batching) behind occm_tpu.serve_http (threaded stdlib HTTP front-end).

Usage:
    python -m occm_tpu.cli.oc_server \
        --pretrained-sslaasist aasist_vocoded_99 --artifacts_dir . \
        --port 8080
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="One-class scoring HTTP server"
    )
    parser.add_argument("--pretrained-sslaasist", type=str,
                        default="aasist_vocoded_1",
                        help="orbax checkpoint dir from oc_training")
    parser.add_argument("--artifacts_dir", type=str, default=".",
                        help="dir holding reference_embedding.npy + "
                             "threshold.npy (from oc_classifier)")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--buckets", type=int, nargs="+",
                        default=[16000, 48000, 64600, 96000],
                        help="utterance-length buckets (samples) to "
                             "AOT-compile at startup")
    parser.add_argument("--max_wait_ms", type=float, default=5.0,
                        help="dynamic-batching wait bound")
    parser.add_argument(
        "--data_parallel", type=int, default=0, metavar="N",
        help="shard serving batches over N local devices (-1 = all) — the "
             "TPU equivalent of the reference's DataParallel at inference "
             "(reference: oc_classifier.py:343). batch_size is rounded up "
             "to a multiple of N. Default 0 = single device.")
    parser.add_argument("--xlsr_tiny", action="store_true")
    parser.add_argument(
        "--fast_numerics", action="store_true", default=False,
        help="bf16 norms + tanh GELU scoring (+50%% measured throughput; "
             "validate EER impact before production use)")
    parser.add_argument(
        "--quant_int8", action="store_true", default=False,
        help="W8A8 int8 scoring: per-channel int8 weights + dynamic "
             "per-row int8 activations on the MXU for the XLSR "
             "transformer projections (occm_tpu.ops.int8). The fp32 "
             "checkpoint is transformed at load time; embedding cosine "
             "vs exact ≈0.9996 at tiny scale — real-weight EER delta is "
             "checked by occm-parity-gate's int8 stage; run it first")
    parser.add_argument(
        "--attention_impl", type=str, default="auto",
        help='attention layout per bucket executable: "auto" (default) '
             "resolves per bucket length from the measured v5e table "
             "(occm_tpu.classify.impl_select — xla short, flash kernels "
             "long); or pin one impl for every bucket.")
    parser.add_argument("--allow_random_init", action="store_true",
                        help="serve random weights (testing only)")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip AOT bucket compilation at startup")
    parser.add_argument("--verbose", action="store_true")
    return parser


def main(argv=None, started_event=None):
    """started_event: optional threading.Event set once serving (tests)."""
    args = build_parser().parse_args(argv)

    import dataclasses
    import os

    import numpy as np

    import jax
    import jax.numpy as jnp

    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel
    from occm_tpu.serve import BatchingQueue, ScoringService
    from occm_tpu.serve_http import ScoringHTTPServer

    ref_path = os.path.join(args.artifacts_dir, "reference_embedding.npy")
    thr_path = os.path.join(args.artifacts_dir, "threshold.npy")
    for p in (ref_path, thr_path):
        if not os.path.exists(p):
            raise SystemExit(
                f"ERROR: missing artifact {p!r} — run oc_classifier "
                "against the train protocol first to build the reference "
                "embedding + threshold."
            )
    reference = np.load(ref_path)
    threshold = float(np.load(thr_path))

    xlsr_cfg = XLSRConfig.tiny() if args.xlsr_tiny else XLSRConfig()
    if args.fast_numerics:
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, norm_dtype="bfloat16", gelu_approximate=True,
            conv_gelu_approximate=True, bf16_param_mirror=True,
        )
    model = AModel(AASISTConfig(), xlsr_cfg=xlsr_cfg)

    ckpt = args.pretrained_sslaasist
    if not args.allow_random_init and not os.path.isdir(ckpt):
        raise SystemExit(
            f"ERROR: checkpoint {ckpt!r} does not exist. Pass "
            "--allow_random_init to serve random weights (testing only)."
        )

    # host-fabricated restore template (utils/init_template.py): no
    # 300M init trace through the tunnel at server startup
    from occm_tpu.utils.init_template import fabricate_template_variables

    sample = jnp.zeros((1, min(args.buckets)), jnp.float32)
    variables = fabricate_template_variables(model, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    try:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt))
        params = restored["params"]
        batch_stats = restored.get("batch_stats", {})
        print("Pretrained weights loaded")
    except Exception as e:
        if not args.allow_random_init:
            raise SystemExit(
                f"ERROR: could not restore pretrained weights from "
                f"{ckpt!r}: {e}"
            )
        print(f"WARNING: serving random init ({e}; --allow_random_init)")

    if args.quant_int8:
        # transform the restored fp32 tree into the quant_int8 layout and
        # rebuild the model to match (init/restore above used fp32)
        from occm_tpu.ops.int8 import quantize_params_int8

        params = quantize_params_int8(params)
        model = AModel(
            AASISTConfig(),
            xlsr_cfg=dataclasses.replace(xlsr_cfg, quant_int8=True),
        )

    mesh = None
    if args.data_parallel:
        from occm_tpu.classify import make_dp_mesh

        n = None if args.data_parallel == -1 else args.data_parallel
        mesh = make_dp_mesh(n)
        print(f"serving data-parallel over {mesh.devices.size} devices")

    # per-bucket attention-impl auto-selection (classify.impl_select):
    # each bucket executable is AOT-compiled from the layout that wins at
    # its length (xla short, flash kernels long; --attention_impl pins
    # one). Weights travel as a jit argument (variables=...), never as
    # closure-baked program constants.
    from occm_tpu.classify.impl_select import select_attention_impl
    from occm_tpu.serve import make_score_fn_v

    final_cfg = model.xlsr_cfg
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def score_fn_factory(bucket_samples):
        impl = select_attention_impl(bucket_samples, args.attention_impl,
                                     norm_dtype=final_cfg.norm_dtype)
        m = AModel(AASISTConfig(),
                   xlsr_cfg=dataclasses.replace(
                       final_cfg, attention_impl=impl))
        return make_score_fn_v(m)

    service = ScoringService(
        score_fn_factory=score_fn_factory,
        reference_embedding=reference, threshold=threshold,
        buckets=tuple(args.buckets), batch=args.batch_size,
        mesh=mesh, variables=variables,
    )
    if not args.no_warmup:
        print(f"AOT-compiling {len(args.buckets)} bucket executables...")
        service.warmup()

    with BatchingQueue(service, max_wait_ms=args.max_wait_ms) as batcher:
        server = ScoringHTTPServer(
            batcher, host=args.host, port=args.port, verbose=args.verbose
        )
        server.start()
        print(f"Serving on {args.host}:{server.port} "
              f"(threshold={threshold:.4f}, batch={args.batch_size})")
        try:
            if started_event is not None:
                started_event.server = server  # expose for tests
                started_event.set()
                started_event.stop.wait()  # tests drive shutdown
            else:  # pragma: no cover - interactive serving
                import signal

                signal.sigwait({signal.SIGINT, signal.SIGTERM})
        finally:
            server.shutdown()


if __name__ == "__main__":
    main()
