"""Measure the W8A8 int8 scoring path on the real chip, two ways.

Round 2 banked the accuracy half (tools/exp_int8_scoring.py: weight-only
cosine 0.9996); round 3 added the speed half — dynamic activation quant +
int8 MXU dots (occm_tpu/ops/int8.py, XLSRConfig.quant_int8). This tool
records the utt/s of the full XLSR-300M+AASIST scoring forward — bf16
exact vs fast-numerics vs int8(+fast) — plus the int8-vs-bf16 embedding
cosine at the full model, batch 32.

Two numbers per config (r3 verdict: e2e alone is tunnel-bound and not
comparable across runs):

- ``device`` (PRIMARY): dispatch-free on-chip compute throughput. The
  forward runs inside one ``lax.scan`` over ``--scan`` distinct input
  batches reduced to a scalar, so one host dispatch covers scan×batch
  utterances and the per-dispatch tunnel cost (~100 ms here) is
  amortised to noise. Same methodology as tools/exp_int8_conv.py.
  Distinct per-step inputs stop XLA hoisting the forward out of the
  loop; the scalar carry stops DCE while keeping the output transfer
  tiny.
- ``e2e``: eager jit-call loop including dispatch — the number a
  directly-attached serving host would NOT pay, kept as the secondary
  tunnel-bound figure.

Each RESULT is also appended to metrics.jsonl (``serving_bench`` events)
so rounds can be compared (r4 verdict item 6).

Usage: python tools/bench_int8_serving.py [--batch 32] [--tiny]
Prints one RESULT line per (config, methodology).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scan", type=int, default=8,
                    help="scan length for the dispatch-free measurement")
    ap.add_argument("--jsonl", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics.jsonl"))
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel
    from occm_tpu.ops.int8 import quantize_params_int8

    cut = 64600 if not args.tiny else 3200
    if args.tiny:
        base_xlsr = XLSRConfig.tiny()
        acfg = AASISTConfig.tiny()
    else:
        base_xlsr = XLSRConfig()
        acfg = AASISTConfig()

    def make_cfg(fast: bool, int8: bool):
        return dataclasses.replace(
            base_xlsr,
            norm_dtype="bfloat16" if fast else base_xlsr.norm_dtype,
            gelu_approximate=fast,
            conv_gelu_approximate=fast,
            quant_int8=int8,
            # keep the default remat: forward-only cost is identical, and
            # the non-remat 24-layer graph is heavy enough to break the
            # remote compile tunnel (measured r3)
        )

    # shape-correct zero params (cheap; throughput is params-independent,
    # and the cosine check uses one random-params tiny run below)
    model0 = AModel(acfg, xlsr_cfg=make_cfg(False, False))
    x = jnp.zeros((args.batch, cut), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model0.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            x,
        )
    )
    # fabricate params on the HOST (numpy): per-leaf jax.random on the
    # device is hundreds of eager ~100 ms tunnel dispatches plus a 1.2 GB
    # device_get before quantisation — numpy keeps it all local
    gen_p = np.random.default_rng(1)
    leaves, treedef = jax.tree_util.tree_flatten(shapes["params"])
    params = jax.tree_util.tree_unflatten(treedef, [
        (gen_p.standard_normal(s.shape) * 0.02).astype(s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else np.zeros(s.shape, s.dtype)
        for s in leaves
    ])
    # batch_stats must stay VALID statistics, not noise: BatchNorm's
    # eval forward takes rsqrt(var + eps), so random zero-mean "variances"
    # are negative half the time and the whole bench would print NaN
    stats = jax.tree_util.tree_map_with_path(
        lambda path, s: jnp.ones(s.shape, s.dtype)
        if path and getattr(path[-1], "key", "") == "var"
        else jnp.zeros(s.shape, s.dtype),
        shapes.get("batch_stats", {}),
    )

    # quantise the XLSR transformer projections (walks the whole AModel
    # tree; only q/k/v/out_proj/fc1/fc2 modules are transformed)
    qtree = quantize_params_int8(params)

    gen = np.random.default_rng(0)
    wave = jnp.asarray(gen.normal(size=(args.batch, cut)).astype(np.float32)
                       * 0.1)
    # distinct input per scan step, or XLA hoists the loop-invariant
    # forward and the "measurement" reads above hardware peak
    waves_scan = jnp.asarray(
        gen.normal(size=(args.scan, args.batch, cut)).astype(np.float32)
        * 0.1)

    embs = {}
    records = []

    def record(name, methodology, utt):
        print(f"RESULT {name}_{methodology}: {utt:.1f} utt/s", flush=True)
        records.append({
            "event": "serving_bench", "config": name,
            "methodology": methodology, "utt_per_s": round(utt, 1),
            "batch": args.batch, "cut": cut, "scan": args.scan,
            "time": time.time(),
        })

    def bench(name, fast, int8):
        cfg = make_cfg(fast, int8)
        model = AModel(acfg, xlsr_cfg=cfg)
        p = qtree if int8 else params
        v = {"params": p}
        if stats:
            v["batch_stats"] = stats

        # variables must be jit ARGUMENTS, not closure captures: captured
        # trees are baked into the HLO as constants, and shipping a 1.2 GB
        # program through the remote-compile tunnel breaks the pipe.
        # device_put once so the reps don't re-upload the numpy tree.
        v = jax.device_put(v)
        fn = jax.jit(lambda vv, w: model.apply(vv, w, train=False))
        emb, logits = fn(v, wave)
        np.asarray(emb)  # force host read: compile + first run
        t0 = time.perf_counter()
        for _ in range(args.reps):
            emb, logits = fn(v, wave)
        emb_h = np.asarray(emb)
        dt = time.perf_counter() - t0
        record(name, "e2e", args.batch * args.reps / dt)
        embs[name] = emb_h

        # PRIMARY: dispatch-free on-device throughput. One dispatch runs
        # the forward scan× inside lax.scan; the scalar carry keeps the
        # whole forward live while the host transfer stays 4 bytes.
        def scanned(vv, ws):
            def step(c, w):
                e, _ = model.apply(vv, w, train=False)
                return c + jnp.sum(e.astype(jnp.float32)), None

            s, _ = jax.lax.scan(step, jnp.float32(0.0), ws)
            return s

        sfn = jax.jit(scanned)
        float(sfn(v, waves_scan))  # compile + first run
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = sfn(v, waves_scan)
        float(s)
        dt = time.perf_counter() - t0
        record(name, "device", args.batch * args.scan * args.reps / dt)

    bench("bf16_exact", False, False)
    bench("bf16_fast", True, False)
    bench("int8_fast", True, True)

    a, b = embs["bf16_exact"].ravel(), embs["int8_fast"].ravel()
    cos = float(np.vdot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                                 + 1e-20))
    print(f"RESULT int8_vs_exact_cosine: {cos:.5f}")
    records.append({"event": "serving_bench", "config": "int8_vs_exact",
                    "methodology": "cosine", "value": round(cos, 5),
                    "time": time.time()})
    with open(args.jsonl, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
