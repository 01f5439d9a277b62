"""Measure whether an int8 conv path could speed the serving conv extractor.

Context: after the W8A8 transformer path landed (+37% end-to-end serving,
DESIGN.md), the conv feature extractor is the next-largest share of the
int8 scoring forward (~5.7 ms of ~19 ms on-device at batch 32 — measured
by the amortized-scan timing in this file's --share mode). ROADMAP item 4
asked whether per-channel int8 weights + dynamic activation quant on the
convs buys anything.

A/B on the heaviest conv layer (wav2vec2 L1: [B=32, T=6459, 512] -> k=3
s=2 -> 512, 162.6 GFLOP), scan-varied inputs so XLA cannot hoist the conv
out of the timing loop (a loop-invariant body gets CSE'd and the "result"
reads 280+ TF/s — above bf16 peak — which is how you know it happened):

    bf16 conv: 1.915 ms/conv  84.9 TF/s
    int8 conv: 2.064 ms/conv  78.7 TF/s   (v5e, 2026-08-19)

Verdict: NEGATIVE — XLA's TPU conv emitter runs int8 convs through the
same pipeline at the same (slightly worse, after the quantize VPU pass)
rate; it does not engage the 2x int8 MXU rate the way `lax.dot_general`
does (occm_tpu/ops/int8.py). The im2col reformulation to dot_general
(strided tap slices concatenated into a [B, T_out, K*C] operand, one
512*3-deep int8 dot) is benchmarked here as `int8 im2col dot` so the
full verdict is reproducible from this script alone: it also fails to
beat the bf16 conv at these shapes (the K*C=1536-deep dot pays the
concat's HBM round-trip). The conv extractor therefore stays bf16 under
`--quant_int8`; the XLSRConfig.quant_int8 docstring and DESIGN.md
record this.

Usage: python tools/exp_int8_conv.py [--share]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ab_layer1():
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, T, C, K = 32, 6459, 512, 3
    R = 8
    gen = np.random.default_rng(0)
    x0 = jnp.asarray(gen.normal(size=(B, T, C)).astype(np.float32) * 0.1)
    w = jnp.asarray(gen.normal(size=(K, C, C)).astype(np.float32) * 0.05)
    # scan over per-iteration scales: tiny upload, defeats loop-invariant
    # hoisting (feeding a stacked [R,B,T,C] operand would be a 2 GB H2D)
    scales = jnp.asarray(np.linspace(0.9, 1.1, R).astype(np.float32))
    dn = lax.conv_dimension_numbers((B, T, C), w.shape, ("NWC", "WIO", "NWC"))

    def bench(fn):
        out = fn(x0, w, scales)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(x0, w, scales)
        np.asarray(out)
        return (time.perf_counter() - t0) / (3 * R)

    @jax.jit
    def conv_bf16(x0, w, scales):
        wb = w.astype(jnp.bfloat16)

        def body(c, s):
            x = (x0 * s).astype(jnp.bfloat16)
            o = lax.conv_general_dilated(x, wb, (2,), "VALID",
                                         dimension_numbers=dn)
            return c + o.astype(jnp.float32).mean(), None

        return lax.scan(body, 0.0, scales)[0]

    @jax.jit
    def conv_int8(x0, w, scales):
        wq = jnp.clip(jnp.round(w * 100), -127, 127).astype(jnp.int8)

        def body(c, s):
            xq = jnp.clip(jnp.round(x0 * (s * 100)), -127, 127).astype(jnp.int8)
            o = lax.conv_general_dilated(xq, wq, (2,), "VALID",
                                         dimension_numbers=dn,
                                         preferred_element_type=jnp.int32)
            return c + o.astype(jnp.float32).mean(), None

        return lax.scan(body, 0.0, scales)[0]

    @jax.jit
    def conv_int8_im2col(x0, w, scales):
        # (K, C_in, C_out) -> (K*C_in, C_out), tap-major to match the
        # tap-major channel concat below
        wq = jnp.clip(jnp.round(w * 100), -127, 127).astype(jnp.int8)
        wq2 = wq.reshape(K * C, C)
        T_out = (T - K) // 2 + 1

        def body(c, s):
            xq = jnp.clip(jnp.round(x0 * (s * 100)), -127,
                          127).astype(jnp.int8)
            cols = jnp.concatenate(
                [lax.slice_in_dim(xq, k, k + 2 * (T_out - 1) + 1, 2, axis=1)
                 for k in range(K)],
                axis=-1)  # [B, T_out, K*C]
            o = lax.dot_general(cols, wq2, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return c + o.astype(jnp.float32).mean(), None

        return lax.scan(body, 0.0, scales)[0]

    flops = B * ((T - K) // 2 + 1) * K * C * C * 2
    for name, fn in [("bf16 conv", conv_bf16), ("int8 conv", conv_int8),
                     ("int8 im2col dot", conv_int8_im2col)]:
        dt = bench(fn)
        print(f"RESULT {name}: {dt * 1e3:.3f} ms/conv  {flops / dt / 1e12:.1f} TF/s")


def conv_share():
    """Amortized full conv-extractor forward (serving config, batch 32)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models.xlsr import ConvFeatureExtractor

    cut, batch, K = 64600, 32, 16
    cfg = dataclasses.replace(XLSRConfig(), conv_gelu_approximate=True,
                              norm_dtype="bfloat16")
    mod = ConvFeatureExtractor(cfg)
    gen = np.random.default_rng(0)
    xs = jnp.asarray(gen.normal(size=(K, batch, cut)).astype(np.float32))
    params = jax.device_put(mod.init(jax.random.PRNGKey(0), xs[0]))

    @jax.jit
    def many(p, xs):
        def body(c, x):
            o = mod.apply(p, x)
            return c + o.astype(jnp.float32).mean(), None

        return lax.scan(body, 0.0, xs)[0]

    out = many(params, xs)
    np.asarray(out)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = many(params, xs)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / (reps * K)
    print(f"RESULT conv extractor fwd: {dt * 1e3:.2f} ms/batch{batch} "
          f"({batch / dt:.1f} utt/s-eq)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--share", action="store_true",
                    help="measure the full extractor's amortized cost "
                         "instead of the int8 A/B")
    args = ap.parse_args()
    if args.share:
        conv_share()
    else:
        ab_layer1()
