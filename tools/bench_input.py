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


def bench_scoring(n_files: int, record) -> None:
    """Eval-side host pipeline (r4 verdict item 2): BucketedEmbedder's
    embed_paths lane — threaded header probe + bucket + threaded batch
    decode + prefetch — vs the per-item Python decode loop it replaced,
    on VARIABLE-length files (the scoring workload shape,
    reference: oc_classifier.py:93-94). embed_fn is a trivial reduction
    so the measurement is host-side decode/assembly, not model compute."""
    import jax

    # host-side bench: never compile the toy embed_fn through a remote
    # TPU tunnel (per-bucket compiles would dominate the measurement)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from occm_tpu.classify import BucketedEmbedder
    from occm_tpu.io import native
    from occm_tpu.io.wav import load_audio

    def embed_fn(x):
        return x[:, :8], jnp.stack(
            [jnp.sum(x, axis=1), jnp.max(x, axis=1)], axis=1)

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        paths = []
        for i in range(n_files):
            # 1-8 s at 16 kHz: the ASVspoof eval length mix
            n = int(rng.integers(SR, 8 * SR))
            w = (0.1 * rng.normal(size=n)).astype(np.float32)
            p = os.path.join(root, f"e{i:05d}.wav")
            write_wav(p, w, SR)
            paths.append(p)

        emb = BucketedEmbedder(embed_fn, bucket_step=16000, batch_size=32)
        # warm (page cache + jit per bucket), then time
        emb.embed_paths(paths)
        t0 = time.perf_counter()
        emb.embed_paths(paths)
        fast = n_files / (time.perf_counter() - t0)
        record("scoring_host_native", fast)

        emb.embed_all([load_audio(p, sr=None)[0] for p in paths])
        t0 = time.perf_counter()
        emb.embed_all((load_audio(p, sr=None)[0] for p in paths))
        slow = n_files / (time.perf_counter() - t0)
        record("scoring_host_python", slow)
        print(f"speedup: {fast / slow:.1f}x"
              + ("" if native.available() else "  (native UNBUILT)"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=48,
                    help="bonafide count (each adds 5 vocoded + shares spoof)")
    ap.add_argument("--groups", type=int, default=8)
    ap.add_argument("--scoring", action="store_true",
                    help="bench the eval-side embed_paths host lane "
                    "instead of the training MetaBatchPipeline")
    ap.add_argument("--metrics_jsonl", default=None,
                    help="append input_bench events to this file")
    args = ap.parse_args()

    records = []

    def record(name, utt):
        print(f"RESULT {name}: {utt:.0f} utt/s", flush=True)
        records.append({"event": "input_bench", "config": name,
                        "utt_per_s": round(utt, 1), "time": time.time()})

    if args.scoring:
        bench_scoring(max(args.files, 256), record)
        if args.metrics_jsonl:
            import json

            with open(args.metrics_jsonl, "a") as f:
                for r in records:
                    f.write(json.dumps(r) + "\n")
        return

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
