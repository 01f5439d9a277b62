"""One-command real-asset parity gate (BASELINE.md north star: EER within
0.1% absolute of the PyTorch reference on ASVspoof2019-LA).

    occm-parity-gate --xlsr /path/xlsr2_300m.pt --la /path/LA \\
        [--ref_eer 0.0032] [--epochs 100] [--fast_numerics]

Collapses the 3-step manual recipe (ROADMAP item 1) into one tested
command. Stages, each printing a ``GATE <stage> PASS/FAIL`` line (exit
code 1 if any stage fails):

  convert — fairseq/HF checkpoint (torch pickle or .safetensors, format
            auto-detected) -> Flax params, saved to <workdir>/xlsr_params
            (reference consumes this checkpoint at models/xlsr.py:29-30)
  verify  — converted encoder vs the independent torch-functional
            wav2vec2 oracle on random audio (max|diff| <= --verify_tol)
  train   — oc_training on the LA train partition from the converted
            frontend (reference: oc_training.py:320-401)
  score   — oc_classifier mode 1c2 on the dev partition
            (reference: oc_classifier.py:159-202)
  eer     — compute_eer over the dev labels; with --ref_eer given,
            |EER - ref| <= --gate (0.001 = the 0.1%-absolute gate)
  int8    — rescore with --quant_int8; |EER_int8 - EER| <= --int8_gate
            (the W8A8 serving path's accuracy check on REAL weights —
            skipped with --skip_int8)

The LA directory is expected in the standard ASVspoof2019 layout
(ASVspoof2019_LA_{train,dev}/flac + ASVspoof2019_LA_cm_protocols/); every
path can be overridden individually, so non-standard trees (or the test
fixture tree) work too. The command itself is CI-proven end-to-end on a
synthetic stand-in (tiny fairseq-format .pt + fixture tree):
tests/test_parity_gate.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Convert + verify + train + score + EER-gate an XLSR "
        "checkpoint against ASVspoof2019-LA in one command")
    p.add_argument("--xlsr", required=True,
                   help="fairseq xlsr2_300m.pt or HF wav2vec2-xls-r-300m "
                        "checkpoint (.pt/.safetensors, auto-detected)")
    p.add_argument("--la", default=None,
                   help="ASVspoof2019 LA root (standard layout); every "
                        "derived path has an individual override")
    p.add_argument("--train_dir", default=None)
    p.add_argument("--dev_dir", default=None)
    p.add_argument("--train_protocol", default=None)
    p.add_argument("--dev_protocol", default=None)
    p.add_argument("--vocoded_dir", default=None,
                   help="vocoded spoof wav dir for the PF meta-batch "
                        "sampler (reference: oc_training.py:174)")
    p.add_argument("--workdir", default="parity_gate_out")
    p.add_argument("--epochs", type=int, default=100,
                   help="reference shipped config trains 100 "
                        "(oc_training.py:342)")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--cut", type=int, default=64600)
    p.add_argument("--groups_per_step", type=int, default=1)
    p.add_argument("--compactness_weight", type=float, default=0.0)
    p.add_argument("--descriptiveness_weight", type=float, default=1.0)
    p.add_argument("--ref_eer", type=float, default=None,
                   help="the reference run's EER on the same dev set; "
                        "enables the |EER - ref| gate")
    p.add_argument("--gate", type=float, default=0.001,
                   help="max |EER - ref_eer|, absolute (0.001 = 0.1%%)")
    p.add_argument("--int8_gate", type=float, default=0.002,
                   help="max |EER_int8 - EER| for the W8A8 serving path")
    p.add_argument("--skip_int8", action="store_true")
    p.add_argument("--skip_train", action="store_true",
                   help="reuse <workdir>'s existing trained checkpoint")
    p.add_argument("--verify_seconds", type=float, default=1.0)
    p.add_argument("--verify_tol", type=float, default=1e-3)
    p.add_argument("--xlsr_tiny", action="store_true",
                   help="tiny XLSR config (CI / synthetic stand-ins)")
    p.add_argument("--fast_numerics", action="store_true",
                   help="bench-validated bf16 training/scoring knobs")
    p.add_argument("--steps_per_dispatch", type=int, default=1)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--bucket_step", type=int, default=16000)
    return p


def _derive_paths(args) -> dict:
    la = args.la
    std = {
        "train_dir": ("ASVspoof2019_LA_train", "flac"),
        "dev_dir": ("ASVspoof2019_LA_dev", "flac"),
        "train_protocol": ("ASVspoof2019_LA_cm_protocols",
                           "ASVspoof2019.LA.cm.train.trn.txt"),
        "dev_protocol": ("ASVspoof2019_LA_cm_protocols",
                         "ASVspoof2019.LA.cm.dev.trl.txt"),
    }
    out = {}
    for key, parts in std.items():
        given = getattr(args, key)
        if given is not None:
            out[key] = given
        elif la is not None:
            out[key] = os.path.join(la, *parts)
        else:
            raise SystemExit(f"ERROR: pass --la or --{key}")
    for key, path in out.items():
        if not os.path.exists(path):
            raise SystemExit(
                f"ERROR: {key} {path!r} does not exist (standard "
                "ASVspoof2019-LA layout assumed; override --" + key + ")"
            )
    return out


def _parse_cm_labels(protocol_path: str):
    """(utts, labels) from a cm protocol: utt = 2nd token, label = last
    (handles both the 5-column 2019 and 6-column 2021 formats;
    reference: evaluate.py:50-68 label map)."""
    utts, labels = [], []
    with open(protocol_path) as f:
        for line in f:
            parts = line.strip().split(" ")
            if len(parts) < 2:
                continue
            utts.append(parts[1])
            labels.append(parts[-1])
    return utts, labels


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    paths = _derive_paths(args)
    os.makedirs(args.workdir, exist_ok=True)
    results, failed = {}, []

    def stage(name: str, ok: bool, detail: str):
        results[name] = {"ok": bool(ok), "detail": detail}
        print(f"GATE {name} {'PASS' if ok else 'FAIL'}: {detail}",
              flush=True)
        if not ok:
            failed.append(name)

    import dataclasses

    import numpy as np

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models.convert_xlsr import (
        convert_fairseq_state_dict, detect_format, hf_to_fairseq_names,
        load_checkpoint_state_dict,
    )
    from occm_tpu.train.checkpoint import save_params

    cfg = XLSRConfig.tiny() if args.xlsr_tiny else XLSRConfig()
    fp32_cfg = dataclasses.replace(cfg, dtype="float32", remat=False)

    # ---- convert -----------------------------------------------------
    xlsr_params_dir = os.path.abspath(
        os.path.join(args.workdir, "xlsr_params"))
    try:
        sd = load_checkpoint_state_dict(args.xlsr)
        fmt = detect_format(sd)
        if fmt == "hf":
            sd = hf_to_fairseq_names(sd, fp32_cfg)
        params = convert_fairseq_state_dict(sd, fp32_cfg)
        save_params(params, xlsr_params_dir)
        n = sum(np.prod(x.shape) for x in
                __import__("jax").tree_util.tree_leaves(params))
        stage("convert", True,
              f"{fmt} checkpoint -> {xlsr_params_dir} ({int(n):,} params)")
    except Exception as e:  # noqa: BLE001 — every failure is a gate FAIL
        stage("convert", False, f"{type(e).__name__}: {e}")
        print(json.dumps({"stages": results, "ok": False}))
        return 1

    # ---- verify vs the independent torch oracle ----------------------
    try:
        import jax.numpy as jnp

        from occm_tpu.models import XLSREncoder
        from occm_tpu.models.torch_oracle import torch_wav2vec2_oracle

        rng = np.random.default_rng(0)
        wave = (rng.normal(size=(1, int(16000 * args.verify_seconds)))
                * 0.1).astype(np.float32)
        oracle = torch_wav2vec2_oracle(sd, wave, fp32_cfg)
        ours = np.asarray(
            XLSREncoder(fp32_cfg).apply({"params": params},
                                        jnp.asarray(wave)))
        diff = float(np.max(np.abs(ours - oracle)))
        stage("verify", diff <= args.verify_tol,
              f"max|encoder diff| = {diff:.3e} (tol {args.verify_tol:g})")
    except Exception as e:  # noqa: BLE001
        stage("verify", False, f"{type(e).__name__}: {e}")
    del sd, params

    # ---- train --------------------------------------------------------
    ckpt_dir = os.path.join(args.workdir, f"aasist_vocoded_{args.epochs - 1}")
    if not (args.skip_train and os.path.isdir(ckpt_dir)):
        from occm_tpu.cli import oc_training

        train_argv = [
            "--train_protocol_file", paths["train_protocol"],
            "--train_dataset_dir", paths["train_dir"],
            "--model", "aasist",
            "--num_epochs", str(args.epochs),
            "--lr", str(args.lr),
            "--cut", str(args.cut),
            "--groups_per_step", str(args.groups_per_step),
            "--compactness_weight", str(args.compactness_weight),
            "--descriptiveness_weight", str(args.descriptiveness_weight),
            "--checkpoint_dir", args.workdir,
            "--pretrained_xlsr", xlsr_params_dir,
            "--steps_per_dispatch", str(args.steps_per_dispatch),
        ]
        if args.vocoded_dir:
            train_argv += ["--vocoded_dir", args.vocoded_dir]
        if args.xlsr_tiny:
            train_argv.append("--xlsr_tiny")
        if args.fast_numerics:
            train_argv.append("--fast_numerics")
        try:
            oc_training.main(train_argv)
            ok = os.path.isdir(ckpt_dir)
            stage("train", ok, f"checkpoint {ckpt_dir}"
                  if ok else f"no checkpoint at {ckpt_dir}")
        except Exception as e:  # noqa: BLE001
            stage("train", False, f"{type(e).__name__}: {e}")
    else:
        stage("train", True, f"reused existing {ckpt_dir} (--skip_train)")
    if not os.path.isdir(ckpt_dir):
        print(json.dumps({"stages": results, "ok": False}))
        return 1

    # ---- score + eer (fp32/fast, then int8) ---------------------------
    # the dev cm protocol carries labels; oc_classifier's eval parser
    # takes token 0 per line, so write the bare utt list alongside
    utts, labels = _parse_cm_labels(paths["dev_protocol"])
    dev_utts = os.path.join(args.workdir, "dev_utts.txt")
    with open(dev_utts, "w") as f:
        f.write("\n".join(utts) + "\n")

    from occm_tpu.cli import oc_classifier
    from occm_tpu.evaluate import calculate_eer_from_labels
    from occm_tpu.io.scorefiles import read_comma_scores

    def score_and_eer(tag: str, extra_flags):
        score_file = os.path.join(args.workdir, f"scores_{tag}.txt")
        argv = [
            "--pretrained-sslaasist", ckpt_dir,
            "--protocol_file", paths["train_protocol"],
            "--dataset_dir", paths["train_dir"],
            "--eval_protocol_file", dev_utts,
            "--eval_dataset_dir", paths["dev_dir"],
            "--mode", "1c2",
            "--score_file", score_file,
            "--batch_size", str(args.batch_size),
            "--bucket_step", str(args.bucket_step),
        ] + list(extra_flags)
        if args.xlsr_tiny:
            argv.append("--xlsr_tiny")
        oc_classifier.main(argv)
        scores = read_comma_scores(score_file)
        eer, _ = calculate_eer_from_labels(scores, labels)
        return float(eer)

    flags = ["--fast_numerics"] if args.fast_numerics else []
    # measured values sit at the summary's TOP level, beside "stages"
    # (stage entries are {ok, detail} records; mixing scalars in broke
    # consumers — tests/test_parity_gate.py reads summary["eer_value"])
    values = {}
    try:
        eer = score_and_eer("fp32", flags)
        if args.ref_eer is not None:
            delta = abs(eer - args.ref_eer)
            stage("eer", delta <= args.gate,
                  f"EER {eer:.4f} vs reference {args.ref_eer:.4f} "
                  f"(|delta| {delta:.4f} <= {args.gate:g}?)")
        else:
            stage("eer", True, f"EER {eer:.4f} (no --ref_eer given: "
                               "recorded, not gated)")
        values["eer_value"] = eer
    except Exception as e:  # noqa: BLE001
        stage("eer", False, f"{type(e).__name__}: {e}")
        eer = None

    if not args.skip_int8 and eer is not None:
        try:
            eer_i8 = score_and_eer("int8", flags + ["--quant_int8"])
            delta = abs(eer_i8 - eer)
            stage("int8", delta <= args.int8_gate,
                  f"int8 EER {eer_i8:.4f} vs fp EER {eer:.4f} "
                  f"(|delta| {delta:.4f} <= {args.int8_gate:g}?)")
            values["eer_int8_value"] = eer_i8
        except Exception as e:  # noqa: BLE001
            stage("int8", False, f"{type(e).__name__}: {e}")

    ok = not failed
    print(json.dumps({"stages": results, "ok": ok, **values}))
    return 0 if ok else 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
