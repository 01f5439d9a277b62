"""occm-embed: dump model embeddings for downstream classifiers.

The reference's Linear-SVM baseline consumes *precomputed* embeddings
(reference: models/linearsvc.py:6-19 fits StandardScaler+SGDClassifier on
arrays the user prepared elsewhere), and its embedding producer is the
inner loop of oc_classifier (reference: oc_classifier.py:182-186: per
utterance `emb, out = model(data)`). The reference never ships the glue;
this CLI is it: checkpoint + protocol in, one `.npz` out with utterance
ids, embeddings, logits, and labels — ready for
`occm_tpu.models.linearsvc.SGD` or any sklearn-style estimator.

Labels follow the PFDataset convention bonafide=0 / spoof=1 (reference:
oc_training.py:225); eval-mode (bare-utterance) protocols have no labels
and get -1.
"""

from __future__ import annotations

import argparse
import dataclasses


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Dump embeddings + logits for every utterance in a "
                    "protocol to an .npz (keys: utts, embeddings, logits, "
                    "labels)."
    )
    parser.add_argument("--protocol_file", type=str, required=True,
                        help="train-format (5-column) or, with --eval, "
                             "bare-utterance-list protocol")
    parser.add_argument("--dataset_dir", type=str, required=True)
    parser.add_argument("--out", type=str, default="embeddings.npz")
    parser.add_argument("--eval", action="store_true",
                        help="protocol is a bare utterance list (labels "
                             "are written as -1)")
    parser.add_argument("--pretrained-sslaasist", type=str,
                        dest="pretrained_sslaasist",
                        default="aasist_vocoded_1",
                        help="orbax checkpoint dir, or a reference-trained "
                             "torch .pt (converted on load)")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--bucket_step", type=int, default=16000)
    parser.add_argument(
        "--decode_threads", type=int, default=8,
        help="C++ decode threads for the path-based scoring fast lane "
             "(match the eval host's cores)")
    parser.add_argument(
        "--data_parallel", type=int, default=0, metavar="N",
        help="shard embedding batches over N local devices (-1 = all); "
             "see oc_classifier --data_parallel")
    parser.add_argument("--xlsr_tiny", action="store_true")
    parser.add_argument(
        "--fast_numerics", action="store_true", default=False,
        help="bf16 norms + tanh GELU (see oc_classifier --fast_numerics)")
    parser.add_argument(
        "--attention_impl", type=str, default="auto",
        help='"auto" (default) picks the attention layout per length '
             "bucket (see oc_classifier --attention_impl); or pin one")
    parser.add_argument("--allow_random_init", action="store_true",
                        help="proceed with random weights if the "
                             "checkpoint is missing (testing only)")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from occm_tpu.classify import BucketedEmbedder
    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.io.protocols import (
        parse_eval_protocol, parse_train_protocol)
    from occm_tpu.models import AModel

    xlsr_cfg = XLSRConfig.tiny() if args.xlsr_tiny else XLSRConfig()
    if args.fast_numerics:
        xlsr_cfg = dataclasses.replace(
            xlsr_cfg, norm_dtype="bfloat16", gelu_approximate=True,
            conv_gelu_approximate=True, bf16_param_mirror=True,
        )
    model = AModel(AASISTConfig(), xlsr_cfg=xlsr_cfg)
    ckpt = args.pretrained_sslaasist

    if not args.allow_random_init:
        if not (os.path.isdir(ckpt) or
                (ckpt.endswith(".pt") and os.path.isfile(ckpt))):
            raise SystemExit(
                f"ERROR: checkpoint {ckpt!r} does not exist.\n"
                "Pass --allow_random_init to embed with random weights "
                "(testing only).")

    # host-fabricated restore template (utils/init_template.py): no
    # 300M init trace through the tunnel before the restore
    from occm_tpu.utils.init_template import fabricate_template_variables

    sample = jnp.zeros((1, 64600), jnp.float32)
    variables = fabricate_template_variables(model, sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    try:
        if ckpt.endswith(".pt") and os.path.isfile(ckpt):
            from occm_tpu.models.convert_backend import (
                convert_model_state_dict, load_torch_state_dict)

            restored = convert_model_state_dict(
                load_torch_state_dict(ckpt), xlsr_cfg=xlsr_cfg)
            restored.pop("_kind", None)
        else:
            restored = ocp.StandardCheckpointer().restore(
                os.path.abspath(ckpt))
        params = restored["params"]
        batch_stats = restored.get("batch_stats", {})
        print("Pretrained weights loaded")
    except Exception as e:
        if not args.allow_random_init:
            raise SystemExit(
                f"ERROR: could not restore pretrained weights from "
                f"{ckpt!r}: {e}\n"
                "Pass --allow_random_init to embed with random weights "
                "(testing only).")
        print(f"WARNING: embedding with random init ({e}; "
              "--allow_random_init)")

    mesh = None
    if args.data_parallel:
        from occm_tpu.classify import make_dp_mesh

        n = None if args.data_parallel == -1 else args.data_parallel
        mesh = make_dp_mesh(n)
        print(f"embedding data-parallel over {mesh.devices.size} devices")

    # per-bucket attention-impl selection (classify.impl_select);
    # weights travel as a jit argument (variables=...), never as
    # closure-baked program constants
    from occm_tpu.classify.impl_select import select_attention_impl

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    def embed_fn_factory(bucket_samples):
        impl = select_attention_impl(bucket_samples, args.attention_impl,
                                     norm_dtype=xlsr_cfg.norm_dtype)
        m = AModel(AASISTConfig(),
                   xlsr_cfg=dataclasses.replace(xlsr_cfg,
                                                attention_impl=impl))

        def embed_fn(v, x):
            emb, logits = m.apply(v, x, train=False)
            return emb, logits

        return embed_fn

    embedder = BucketedEmbedder(
        embed_fn_factory=embed_fn_factory, bucket_step=args.bucket_step,
        batch_size=args.batch_size, mesh=mesh, variables=variables,
        decode_threads=args.decode_threads,
    )

    if args.eval:
        utts = parse_eval_protocol(args.protocol_file)
        labels = np.full(len(utts), -1, np.int32)
    else:
        utts, label_strs = parse_train_protocol(args.protocol_file)
        # PFDataset label map bona=0/spoof=1 (reference: oc_training.py:225)
        labels = np.asarray(
            [0 if s == "bonafide" else 1 for s in label_strs], np.int32)

    from occm_tpu.data.datasets import _resolve

    # threaded native batch decode + prefetch feeds the device
    # (embed_paths falls back to Python decode when libocmio is unbuilt)
    paths = [_resolve(args.dataset_dir, u, exts=(".flac", ".wav"))
             for u in utts]
    embs, logits = embedder.embed_paths(
        paths,
        progress=(lambda n: print(f"embedded {n} ..."))
        if args.verbose else None,
    )
    np.savez(args.out, utts=np.asarray(utts), embeddings=embs,
             logits=logits, labels=labels)
    print(f"wrote {len(utts)} embeddings ({embs.shape[1]}-d) to {args.out}")


if __name__ == "__main__":
    main()
