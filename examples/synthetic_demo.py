"""End-to-end demo on synthetic data — no ASVspoof download needed.

Generates a tiny protocol + WAV tree (bonafide tones, spoof noise, vocoded
copies), trains a tiny-XLSR AASIST for one epoch with the one-class loss,
builds the reference embedding + threshold, scores an eval set, and prints
the EER. Runs on CPU in a few minutes; same code paths as the real CLIs.

    python examples/synthetic_demo.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def make_tree(root: str, sr: int = 16000):
    from occm_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    train_dir = os.path.join(root, "train")
    vocoded_dir = os.path.join(root, "vocoded")
    eval_dir = os.path.join(root, "eval")
    for d in (train_dir, vocoded_dir, eval_dir):
        os.makedirs(d, exist_ok=True)

    lines = []
    for i in range(8):
        utt = f"LA_T_b{i:04d}"
        t = np.arange(2500 + 100 * i) / sr
        wave = 0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)
        write_wav(os.path.join(train_dir, f"{utt}.wav"), wave, sr)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
        for voc in ("hifigan", "hn-sinc-nsf-hifi", "hn-sinc-nsf", "melgan",
                    "waveglow"):
            write_wav(
                os.path.join(vocoded_dir, f"{voc}_{utt}.wav"),
                wave + 0.05 * rng.normal(size=wave.shape), sr,
            )
    for i in range(4):
        utt = f"LA_T_s{i:04d}"
        write_wav(os.path.join(train_dir, f"{utt}.wav"),
                  0.3 * rng.normal(size=2800), sr)
        lines.append(f"LA_{100 + i:04d} {utt} - A0{i} spoof")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    eval_proto, labels = [], []
    for i in range(3):
        utt = f"LA_E_b{i:04d}"
        t = np.arange(2600) / sr
        write_wav(os.path.join(eval_dir, f"{utt}.wav"),
                  0.3 * np.sin(2 * np.pi * 260 * t), sr)
        eval_proto.append(utt)
        labels.append("bonafide")
    for i in range(3):
        utt = f"LA_E_s{i:04d}"
        write_wav(os.path.join(eval_dir, f"{utt}.wav"),
                  0.3 * rng.normal(size=2600), sr)
        eval_proto.append(utt)
        labels.append("spoof")
    with open(os.path.join(root, "eval_proto.txt"), "w") as f:
        f.write("\n".join(eval_proto) + "\n")
    return labels


def main():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="occm_demo_"
    )
    print(f"workdir: {root}")
    labels = make_tree(root)

    from occm_tpu.classify import BucketedEmbedder, OneClassScorer
    from occm_tpu.config import (
        AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.data import ASVDataset, MetaBatchPipeline, PFDataset
    from occm_tpu.evaluate import calculate_eer_from_labels
    from occm_tpu.io.scorefiles import read_comma_scores
    from occm_tpu.models import AModel
    from occm_tpu.train.loop import train

    cut = 3200
    cfg = TrainConfig(
        lr=1e-4, num_epochs=1, compactness_weight=0.1,
        descriptiveness_weight=0.9, cut=cut, groups_per_step=2,
        rawboost=RawBoostConfig(algo=0), mesh=MeshConfig(dp=-1, tp=1),
        log_every=2, loss_txt=os.path.join(root, "loss.txt"),
        checkpoint_dir=root,
    )
    ds = PFDataset(
        os.path.join(root, "train.txt"), os.path.join(root, "train"),
        vocoded_dir=os.path.join(root, "vocoded"), cut=cut,
    )
    pipeline = MetaBatchPipeline(ds, groups_per_step=2)
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())

    print("training 1 epoch ...")
    state = train(model, pipeline, cfg, output_kind="dual")

    def embed_fn(x):
        v = {"params": state.params}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        return model.apply(v, x, train=False)

    scorer = OneClassScorer(
        BucketedEmbedder(embed_fn, bucket_step=cut, max_len=cut, batch_size=4),
        cache_dir=root,
    )
    train_ds = ASVDataset(os.path.join(root, "train.txt"),
                          os.path.join(root, "train"))
    ref, thr = scorer.create_reference_embedding(train_ds)
    print(f"threshold = {thr}")

    eval_ds = ASVDataset(os.path.join(root, "eval_proto.txt"),
                         os.path.join(root, "eval"), eval=True)
    score_file = os.path.join(root, "scores.txt")
    scorer.score_eval_set_1c(eval_ds, ref, thr, score_file=score_file)
    scores = read_comma_scores(score_file)
    eer, eer_thr = calculate_eer_from_labels(scores, labels)
    print(f"EER = {eer * 100.0}, threshold = {eer_thr}")


if __name__ == "__main__":
    main()
