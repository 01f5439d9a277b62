"""Input-pipeline throughput benchmark (host side only, no TPU).

Generates a synthetic ASVspoof-shaped tree of 4 s utterances, then measures
MetaBatchPipeline end-to-end decode throughput (native C++ threaded batch
path and the per-item Python fallback). The done-criterion from round 1:
input-side utt/s must exceed the device-side training throughput at G=8
(bench.py, ~183 utt/s) so the pipeline never starves the chip.

Usage: python tools/bench_input.py [--files 64] [--groups 8] [--format wav|flac]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from occm_tpu.data import MetaBatchPipeline, PFDataset  # noqa: E402
from occm_tpu.io.wav import write_wav  # noqa: E402

SR = 16000
CUT = 64600
VOCODERS = ("hifigan", "hn-sinc-nsf-hifi", "hn-sinc-nsf", "melgan", "waveglow")


def build_tree(root: str, n_bona: int, n_spoof: int) -> str:
    train = os.path.join(root, "train")
    voc = os.path.join(root, "vocoded")
    os.makedirs(train), os.makedirs(voc)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n_bona):
        utt = f"LA_T_b{i:04d}"
        wave = (0.1 * rng.normal(size=CUT)).astype(np.float32)
        write_wav(os.path.join(train, f"{utt}.wav"), wave, SR)
        for v in VOCODERS:
            write_wav(os.path.join(voc, f"{v}_{utt}.wav"), wave, SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
    for i in range(n_spoof):
        utt = f"LA_T_s{i:04d}"
        wave = (0.1 * rng.normal(size=CUT)).astype(np.float32)
        write_wav(os.path.join(train, f"{utt}.wav"), wave, SR)
        lines.append(f"LA_{900 + i:04d} {utt} - A01 spoof")
    proto = os.path.join(root, "train.txt")
    with open(proto, "w") as f:
        f.write("\n".join(lines) + "\n")
    return proto


def measure(pipe: MetaBatchPipeline, epochs: int = 3) -> float:
    # warm once (page cache), then time
    for _ in pipe.epoch(0):
        pass
    n_utt = 0
    t0 = time.perf_counter()
    for e in range(1, 1 + epochs):
        for x, _ in pipe.epoch(e):
            n_utt += x.shape[0]
    return n_utt / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=48,
                    help="bonafide count (each adds 5 vocoded + shares spoof)")
    ap.add_argument("--groups", type=int, default=8)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        proto = build_tree(root, args.files, max(4, args.files // 8))
        print(f"tree: {args.files} bona x (1+5 vocoded) + spoof, 4 s each")
        for native in (True, False):
            ds = PFDataset(proto, os.path.join(root, "train"),
                           vocoded_dir=os.path.join(root, "vocoded"), cut=CUT)
            pipe = MetaBatchPipeline(ds, groups_per_step=args.groups,
                                     shuffle=True, seed=0)
            if native and not pipe._native:
                print("native: UNAVAILABLE (make -C native)")
                continue
            pipe._native = native
            rate = measure(pipe)
            print(f"{'native batch' if native else 'python per-item'}: "
                  f"{rate:.0f} utt/s")


if __name__ == "__main__":
    main()
