"""RawBoost device-throughput bench: standalone kernels + in-step tax.

The blueprint's north star moves RawBoost (reference: RawBoost.py:59-97,
dispatched at data_utils_SSL.py:111-173) from per-utterance NumPy/scipy on
a dataloader worker to fused on-device kernels. This tool measures what
that costs on the real chip, two ways:

1. Standalone ``batch_rawboost`` per algo at the training shape [96, 64600]
   (algos 1/2/3 are the LnL/ISD/SSI components, so this doubles as the
   per-component profile), dispatch-free via lax.scan over distinct keys.
2. The full train step (XLSR-300M + AASIST fwd+bwd+Adam, bench config)
   with RawBoost algo 0 (off) vs --algo (default 5, the reference's
   dispatcher default) fused in-step — the honest "tax" number.

Usage:
  python tools/bench_rawboost.py              # standalone kernels only
  python tools/bench_rawboost.py --train      # + the two full train steps
  python tools/bench_rawboost.py --batch 96 --scan 8 --algos 1 2 3 5
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_standalone(batch: int, cut: int, scan: int, reps: int, algos):
    import jax
    import jax.numpy as jnp

    from occm_tpu.augment import batch_rawboost
    from occm_tpu.config import RawBoostConfig

    gen = np.random.default_rng(0)
    x = jnp.asarray(gen.normal(size=(batch, cut)).astype(np.float32) * 0.1)
    keys = jax.random.split(jax.random.PRNGKey(0), scan)

    for algo in algos:
        cfg = RawBoostConfig(algo=algo)

        # scan over distinct keys: one dispatch = scan× the augmentation,
        # scalar carry so nothing is DCE'd (same methodology as
        # tools/bench_int8_serving.py / exp_int8_conv.py)
        @jax.jit
        def scanned(ks, xx, _cfg=cfg):
            def step(c, k):
                y = batch_rawboost(k, xx, _cfg)
                return c + jnp.sum(y), None

            s, _ = jax.lax.scan(step, jnp.float32(0.0), ks)
            return s

        float(scanned(keys, x))  # compile + first run
        t0 = time.perf_counter()
        for _ in range(reps):
            s = scanned(keys, x)
        float(s)
        dt = time.perf_counter() - t0
        n = batch * scan * reps
        print(f"RESULT algo{algo}_standalone: {n / dt:.0f} utt/s "
              f"({dt / reps / scan * 1e3:.2f} ms/batch{batch})", flush=True)


def bench_train(algo: int):
    import bench

    for name, a in (("off", 0), (f"algo{algo}", algo)):
        utt, _ = bench.run(8, rawboost_algo=a)
        print(f"RESULT train_rawboost_{name}: {utt:.1f} utt/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--cut", type=int, default=64600)
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--algos", type=int, nargs="+", default=[1, 2, 3, 5])
    ap.add_argument("--train", action="store_true",
                    help="also run the full train step off-vs-on")
    ap.add_argument("--algo", type=int, default=5,
                    help="algo for the in-step train measurement")
    args = ap.parse_args()

    bench_standalone(args.batch, args.cut, args.scan, args.reps, args.algos)
    if args.train:
        bench_train(args.algo)


if __name__ == "__main__":
    main()
