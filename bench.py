"""Benchmark: XLSR-300M + AASIST one-class fine-tune train step on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: 4-second utterances (64600 samples @16 kHz) per second per chip for
the full forward+backward+Adam step of the flagship model (the reference's
shipped config: XLSR wav2vec2-300M + AASIST, meta-batch 12, loss =
descriptiveness; reference: oc_training.py:320-401).

vs_baseline: the reference publishes no numbers (BASELINE.md). The divisor
17.0 utt/s is an estimate of the reference PyTorch stack's single-GPU
fine-tuning throughput (SSL-AASIST lineage repos: ~25k train utterances at
batch 14 in ~25 min/epoch on a 24 GB-class CUDA GPU). Recorded here so the
ratio stays interpretable; update when a measured reference number exists.
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_UTT_PER_SEC = 17.0


def run(groups_per_step: int, k_dispatch: int = 16, chunks: int = 3,
        warmup: int = 1, rawboost_algo: int = 0, **xlsr_overrides):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from occm_tpu.config import (
        AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.models import AModel
    from occm_tpu.train.loop import make_multi_step
    from occm_tpu.train.state import create_train_state

    cut = 64600
    meta = 12
    batch = groups_per_step * meta
    cfg = TrainConfig(
        lr=1e-5,
        cut=cut,
        groups_per_step=groups_per_step,
        steps_per_dispatch=k_dispatch,
        compactness_weight=0.0,
        descriptiveness_weight=1.0,
        rawboost=RawBoostConfig(algo=rawboost_algo),
        mesh=MeshConfig(dp=1, tp=1),
    )
    # fast numerics: bf16 layer norms/softmax + tanh GELU, validated
    # equivalent to the fp32-norm/exact-GELU path at tiny scale
    # (tests/test_fast_numerics.py) — measured +15% on v5e.
    # bf16_param_mirror casts transformer weights to bf16 once per step
    # instead of per use — numerically identical (same cast, same values),
    # measured +2.6 utt/s (182.7 vs 180.1). remat_policy="attn_out" saves
    # the attention block output AND the pre-out_proj attention output
    # per layer (2 x 39.5 MB/layer) so the backward never re-runs the
    # softmax(QK^T)V chain — identical math (parity test in
    # tests/test_xlsr_extras.py), 208.5 vs 207.0 utt/s. Saving MORE
    # (attn_probs/attn_all) measured slower: HBM ledger in DESIGN.md.
    # conv_gelu_approximate: +10% measured (exact-erf over the big conv
    # activations); gated by the encoder-feature + trajectory tests
    xlsr_kw = dict(norm_dtype="bfloat16", gelu_approximate=True,
                   conv_gelu_approximate=True,
                   bf16_param_mirror=True, remat_policy="attn_out_inner")
    xlsr_kw.update(xlsr_overrides)
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig(**xlsr_kw))

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, cut), jnp.float32)
    state = create_train_state(model, rng, sample, optax.adam(cfg.lr))
    # k full optimizer steps per dispatch, scanned on device
    step_fn = make_multi_step(
        cfg, k_dispatch, apply_rawboost=cfg.rawboost.algo != 0,
        output_kind="dual",
    )

    xs = jnp.asarray(
        (np.random.default_rng(0).normal(size=(k_dispatch, batch, cut))
         * 0.1).astype(np.float32)
    )
    labels = jnp.asarray(
        np.tile(np.array([0] * 6 + [1] * 6, np.int32),
                (k_dispatch, groups_per_step))
    )

    # warmup (includes compile); float() forces a host read because the
    # axon tunnel's block_until_ready does not await remote execution
    for i in range(warmup):
        state, metrics = step_fn(state, (xs, labels),
                                 jax.random.fold_in(rng, i))
        float(metrics["loss"])

    t0 = time.perf_counter()
    loss = 0.0
    for i in range(chunks):
        state, metrics = step_fn(
            state, (xs, labels), jax.random.fold_in(rng, 100 + i)
        )
        loss = float(metrics["loss"])  # per-chunk host sync: honest timing
    dt = time.perf_counter() - t0

    utt_per_sec = batch * k_dispatch * chunks / dt
    return utt_per_sec, loss


def main():
    # G=8 (batch 96) measured best on v5e: amortises the ~33 ms fixed
    # per-step cost; marginal cost ~6.3 ms/utt (see PROGRESS notes)
    groups = 8
    if len(sys.argv) > 1:
        groups = int(sys.argv[1])
    try:
        utt_per_sec, loss = run(groups)
    except Exception:
        # fall back to a single meta-batch if the big batch OOMs
        utt_per_sec, loss = run(1)
    print(
        json.dumps(
            {
                "metric": "xlsr300m_aasist_train_step_throughput",
                "value": round(utt_per_sec, 3),
                "unit": "4s-utterances/sec/chip",
                "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
