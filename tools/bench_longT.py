"""Long-utterance (full-length eval) scoring bench: bucket sweep x
attention-impl A/B on the real chip (r4 verdict item 1).

The reference's scoring workload is FULL-LENGTH audio (reference:
oc_classifier.py:93-94 loads without truncation; ASVspoof2021-DF clips run
to tens of seconds), but every prior perf number stopped at the 4 s
training shape (T=201 frames). This tool measures the XLSR-300M+AASIST
scoring forward at audio lengths {4, 10, 20, 40} s — transformer lengths
T = {201, 501, 1001, 2001} — for attention_impl in {xla, packed4, flash}:
"xla" is the short-shape winner from rounds 2-4, "flash" routes through
the whole-T kernel at T<=512 and the r5 blocked online-softmax kernel
above it (occm_tpu/ops/attention.py), where DESIGN.md's r3 post-mortem
predicts kernels start winning (PV/dS contractions >= 512 deep).

Methodology: dispatch-free on-chip throughput (PRIMARY) — the forward
runs inside one lax.scan over --scan distinct batches reduced to a
scalar, so per-dispatch tunnel cost is amortised to noise (same as
tools/bench_int8_serving.py). Batch sizes scale inversely with length to
hold the per-dispatch audio roughly constant.

Each RESULT appends a ``longT_bench`` event to metrics.jsonl. The
measured table lives in DESIGN.md; the per-bucket auto-selection policy
derived from it is occm_tpu/classify/impl_select.py.

Usage: python tools/bench_longT.py [--tiny] [--impls xla,packed4,flash]
       [--seconds 4,10,20,40] [--scan 4] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR = 16000
# batch per audio-seconds: ~96 s of audio per dispatch, XLSR-300M scale
BATCH_FOR_SECONDS = {4: 24, 10: 10, 20: 5, 40: 2}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--impls", default="xla,packed4,flash")
    ap.add_argument("--seconds", default="4,10,20,40")
    ap.add_argument("--scan", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fast", action="store_true",
                    help="fast numerics (bf16 norms + tanh GELU + bf16 "
                    "param mirror) — the --fast_numerics serving config")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 transformer projections "
                    "(--quant_int8 serving config)")
    ap.add_argument("--jsonl", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics.jsonl"))
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel

    if args.tiny:
        base_xlsr = XLSRConfig.tiny()
        acfg = AASISTConfig.tiny()
    else:
        base_xlsr = XLSRConfig()
        acfg = AASISTConfig()
    suffix = ""
    if args.fast:
        base_xlsr = dataclasses.replace(
            base_xlsr, norm_dtype="bfloat16", gelu_approximate=True,
            conv_gelu_approximate=True, bf16_param_mirror=True)
        suffix += "_fast"
    if args.int8:
        base_xlsr = dataclasses.replace(base_xlsr, quant_int8=True)
        suffix += "_int8"

    records = []

    def record(name, utt_s, audio_s):
        print(f"RESULT {name}: {utt_s:.1f} utt/s ({audio_s:.0f} s-audio/s)",
              flush=True)
        records.append({
            "event": "longT_bench", "config": name,
            "utt_per_s": round(utt_s, 1),
            "audio_s_per_s": round(audio_s, 1), "time": time.time(),
        })

    # fabricate shape-correct params once at the LONGEST shape (params are
    # length-independent); numpy on host — per-leaf device RNG through the
    # tunnel costs minutes (bench_int8_serving note)
    model0 = AModel(acfg, xlsr_cfg=base_xlsr)
    probe = jnp.zeros((1, 4 * SR), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model0.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(0)}, probe)
    )
    gen_p = np.random.default_rng(1)
    leaves, treedef = jax.tree_util.tree_flatten(shapes["params"])
    params = jax.tree_util.tree_unflatten(treedef, [
        (gen_p.standard_normal(s.shape) * 0.02).astype(s.dtype)
        if jnp.issubdtype(s.dtype, jnp.floating)
        else np.zeros(s.shape, s.dtype)
        for s in leaves
    ])
    stats = jax.tree_util.tree_map_with_path(
        lambda path, s: jnp.ones(s.shape, s.dtype)
        if path and getattr(path[-1], "key", "") == "var"
        else np.zeros(s.shape, s.dtype),
        shapes.get("batch_stats", {}),
    )

    gen = np.random.default_rng(0)
    for sec in [int(s) for s in args.seconds.split(",")]:
        samples = sec * SR + 600  # odd tail like real utterances
        batch = BATCH_FOR_SECONDS.get(sec, max(1, 96 // sec))
        waves_scan = jnp.asarray(
            gen.normal(size=(args.scan, batch, samples)).astype(np.float32)
            * 0.1)
        for impl in args.impls.split(","):
            cfg = dataclasses.replace(base_xlsr, attention_impl=impl)
            model = AModel(acfg, xlsr_cfg=cfg)
            v = {"params": params}
            if stats:
                v["batch_stats"] = stats
            v = jax.device_put(v)

            def scanned(vv, ws):
                def step(c, w):
                    e, _ = model.apply(vv, w, train=False)
                    return c + jnp.sum(e.astype(jnp.float32)), None

                s, _ = jax.lax.scan(step, jnp.float32(0.0), ws)
                return s

            sfn = jax.jit(scanned)
            t0 = time.perf_counter()
            float(sfn(v, waves_scan))  # compile + first run
            print(f"[{sec}s {impl}] compile+first {time.perf_counter()-t0:.0f}s",
                  flush=True)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                s = sfn(v, waves_scan)
            float(s)
            dt = time.perf_counter() - t0
            utt = batch * args.scan * args.reps / dt
            record(f"longT_{sec}s_{impl}{suffix}", utt, utt * sec)
            del sfn

    with open(args.jsonl, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
