"""Long-cut TRAINING bench: fwd+bwd+Adam at 10 s / 20 s cuts, attention
impl A/B (r5 blocked flash backward).

The reference trains at a fixed 4 s crop (data_utils_SSL.py:67), but
long-cut fine-tuning is the natural extension once eval runs full-length
audio — and it changes the attention regime: at T=501+ the backward's
PV/dS dots contract >=512 deep, where the r3 post-mortem predicts Pallas
kernels beat the XLA emitter. "flash" routes through the whole-T kernel
with its Pallas backward at T<=512 and the r5 blocked flash
forward+backward pair above (occm_tpu/ops/attention.py) — the [T, T]
probability matrix never exists in either direction, which also cuts
activation HBM at T=2001 from ~1 GB/layer-direction to nothing.

Methodology: full XLSR-300M + AASIST train step (make_train_step:
fwd+bwd+Adam, donated state), batch scaled to hold per-step audio
roughly constant, dispatch-free via steps_per_dispatch-style scan
(make_multi_step). Appends ``longcut_train_bench`` events to
metrics.jsonl.

Usage: python tools/bench_longcut_train.py [--seconds 10,20]
       [--impls xla,flash] [--scan 2] [--reps 2]
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
# meta-batch groups per step by cut seconds: ~96-120 s audio per step
GROUPS_FOR_SECONDS = {4: 2, 10: 1, 20: 1}
BATCH_FOR_SECONDS = {4: 24, 10: 12, 20: 6}  # utterances per step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", default="10,20")
    ap.add_argument("--impls", default="xla,flash")
    ap.add_argument("--scan", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--exact", action="store_true",
                    help="exact numerics (fp32 norms/softmax, erf GELU) "
                    "instead of the bench fast-numerics config — the "
                    "regime where the Pallas kernels' fp32 softmax is "
                    "no longer a handicap")
    ap.add_argument("--jsonl", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "metrics.jsonl"))
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from occm_tpu.config import (
        AASISTConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.models import AModel
    from occm_tpu.train.loop import make_multi_step
    from occm_tpu.train.state import TrainState

    if args.tiny:
        base_xlsr = XLSRConfig.tiny()
        acfg = AASISTConfig.tiny()
    elif args.exact:
        base_xlsr = dataclasses.replace(
            XLSRConfig(), remat_policy="attn_out_inner", conv_remat=True,
        )
        acfg = AASISTConfig()
    else:
        # bench numerics (bench.py config): fast norms + remat ladder
        base_xlsr = dataclasses.replace(
            XLSRConfig(), norm_dtype="bfloat16", gelu_approximate=True,
            conv_gelu_approximate=True, bf16_param_mirror=True,
            remat_policy="attn_out_inner", conv_remat=True,
        )
        acfg = AASISTConfig()

    records = []

    def record(name, utt_s, audio_s):
        print(f"RESULT {name}: {utt_s:.1f} utt/s ({audio_s:.0f} "
              "s-audio/s)", flush=True)
        records.append({
            "event": "longcut_train_bench", "config": name,
            "utt_per_s": round(utt_s, 2),
            "audio_s_per_s": round(audio_s, 1), "time": time.time(),
        })

    gen = np.random.default_rng(0)
    for sec in [int(s) for s in args.seconds.split(",")]:
        cut = sec * SR + 600
        batch = BATCH_FOR_SECONDS.get(sec, max(12, 96 // sec))
        groups = max(1, batch // 12)
        batch = groups * 12
        xs = jnp.asarray(
            gen.normal(size=(args.scan, batch, cut)).astype(np.float32)
            * 0.1)
        labels = jnp.asarray(np.tile(
            np.tile(np.array([0] * 6 + [1] * 6, np.int32), groups),
            (args.scan, 1)))
        for impl in args.impls.split(","):
            xcfg = dataclasses.replace(base_xlsr, attention_impl=impl)
            cfg = TrainConfig(
                lr=1e-5, cut=cut, groups_per_step=groups,
                compactness_weight=0.1, descriptiveness_weight=0.9,
                rawboost=RawBoostConfig(algo=0),
            )
            model = AModel(acfg, xlsr_cfg=xcfg)

            # host-fabricated params (bench_int8_serving pattern)
            shapes = jax.eval_shape(
                lambda m=model: m.init(
                    {"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(0)},
                    jnp.zeros((12, cut), jnp.float32)))
            gen_p = np.random.default_rng(1)
            leaves, treedef = jax.tree_util.tree_flatten(shapes["params"])
            params = jax.tree_util.tree_unflatten(treedef, [
                (gen_p.standard_normal(s.shape) * 0.02).astype(s.dtype)
                if jnp.issubdtype(s.dtype, jnp.floating)
                else np.zeros(s.shape, s.dtype)
                for s in leaves
            ])
            stats = jax.tree_util.tree_map_with_path(
                lambda path, s: np.ones(s.shape, s.dtype)
                if path and getattr(path[-1], "key", "") == "var"
                else np.zeros(s.shape, s.dtype),
                shapes.get("batch_stats", {}),
            )
            tx = optax.adam(cfg.lr)
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                apply_fn=model.apply,
                params=jax.device_put(params),
                batch_stats=jax.device_put(stats),
                tx=tx,
                opt_state=jax.device_put(tx.init(params)),
            )
            multi = make_multi_step(cfg, args.scan, output_kind="dual")
            rng = jax.random.PRNGKey(0)
            t0 = time.perf_counter()
            state, m = multi(state, (xs, labels), rng)
            float(m["loss"])  # compile + first run
            print(f"[{sec}s {impl}] compile+first "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                state, m = multi(state, (xs, labels), rng)
            float(m["loss"])
            dt = time.perf_counter() - t0
            utt = batch * args.scan * args.reps / dt
            record(f"longcut_{sec}s_{impl}"
       + ("_exact" if args.exact else ""), utt, utt * sec)
            del multi, state

    with open(args.jsonl, "a") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
