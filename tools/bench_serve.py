"""Serving latency/throughput benchmark for the BatchingQueue.

Simulates Poisson arrivals of single-utterance scoring requests against
the AOT-compiled ScoringService behind the dynamic batcher and reports
throughput + latency percentiles (p50/p95/p99). The reference has no
serving path at all (batch=1 offline eval loop, reference:
oc_classifier.py:243-265), so there is no baseline to compare — this
records the framework's own SLO numbers.

Usage:
  python tools/bench_serve.py                 # tiny model (any host)
  python tools/bench_serve.py --full          # XLSR-300M+AASIST (TPU)
  python tools/bench_serve.py --rate 200 --requests 500 --batch 16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full-size XLSR-300M + AASIST (needs TPU)")
    ap.add_argument("--rate", type=float, default=100.0,
                    help="mean arrival rate, requests/s")
    ap.add_argument("--requests", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    ap.add_argument("--cut", type=int, default=64600)
    args = ap.parse_args()

    import jax.numpy as jnp
    import jax

    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel
    from occm_tpu.serve import BatchingQueue, ScoringService, make_score_fn

    cut = args.cut
    if args.full:
        model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig())
    else:
        model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
        cut = min(cut, 16000)

    # shape-only init + zeros: jitting the real 300M init through the
    # remote tunnel takes many minutes; latency numbers don't depend on
    # the weight values
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, cut), jnp.float32))
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
    fn = make_score_fn(model, variables["params"],
                       variables.get("batch_stats", {}))

    svc = ScoringService(fn, np.zeros(160, np.float32), threshold=5.0,
                         buckets=(cut,), batch=args.batch)
    t0 = time.perf_counter()
    svc.warmup()
    print(f"warmup (AOT compile): {time.perf_counter() - t0:.1f} s")

    gen = np.random.default_rng(0)
    waves = [gen.normal(size=cut).astype(np.float32) * 0.1
             for _ in range(8)]
    gaps = gen.exponential(1.0 / args.rate, size=args.requests)

    lat = np.empty(args.requests)
    with BatchingQueue(svc, max_wait_ms=args.max_wait_ms) as q:
        # warm the whole dispatch path once
        q.score_sync(waves[0])
        pending = []
        t_start = time.perf_counter()
        for i in range(args.requests):
            time.sleep(gaps[i])
            pending.append((i, time.perf_counter(),
                            q.submit(waves[i % len(waves)])))
        for i, t_sub, fut in pending:
            fut.result(timeout=300)
            lat[i] = time.perf_counter() - t_sub
        wall = time.perf_counter() - t_start

    # completion-time latency includes queueing + batching + device time
    print(f"rate {args.rate:.0f} req/s, batch {args.batch}, "
          f"max_wait {args.max_wait_ms} ms")
    print(f"served {args.requests} in {wall:.2f} s "
          f"({args.requests / wall:.1f} req/s)")
    for p in (50, 95, 99):
        print(f"p{p} latency: {np.percentile(lat, p) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
