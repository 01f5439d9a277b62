"""Microbench: upstream JAX Pallas TPU attention kernels at the bench shape.

The r3 post-mortems (DESIGN.md) closed every HAND-WRITTEN attention line:
at T=201/D=64 Mosaic's per-small-dot issue overhead floors any custom
kernel below XLA's emitter. One line remained open: the *upstream*
`jax.experimental.pallas.ops.tpu.flash_attention` kernel, tuned by the
JAX/TPU team with its own pipelining. This tool times it (fwd and
fwd+bwd) against the XLA einsum attention at the exact bench shape
(B=96, H=16, T=201 padded to 256, D=64; reference compute being compared:
/root/reference/models/xlsr.py multi-head self-attention).

Usage: python tools/exp_upstream_attention.py [--reps 20]
Prints one RESULT line per config.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--seq", type=int, default=201)
    ap.add_argument("--dim", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    B, H, T, D = args.batch, args.heads, args.seq, args.dim
    Tp = ((T + 127) // 128) * 128  # kernels want 128-multiple seq blocks

    gen = np.random.default_rng(0)
    q = jnp.asarray(gen.normal(size=(B, H, T, D)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    k = jnp.asarray(gen.normal(size=(B, H, T, D)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    v = jnp.asarray(gen.normal(size=(B, H, T, D)).astype(np.float32) * 0.1,
                    jnp.bfloat16)

    def xla_attn(q, k, v):
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * (D ** -0.5), k,
                            preferred_element_type=jnp.bfloat16)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(jnp.bfloat16), v)

    # pad T -> Tp with -inf-masked keys so results stay exact for real rows
    def padded(fn):
        def run(q, k, v):
            pad = [(0, 0), (0, 0), (0, Tp - T), (0, 0)]
            qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
            out = fn(qp, kp, vp)
            return out[:, :, :T, :]
        return run

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    def upstream_flash(qp, kp, vp, block=128):
        bs = BlockSizes(
            block_q=min(block, Tp), block_k_major=min(block, Tp),
            block_k=min(block, Tp), block_b=1,
            block_q_major_dkv=min(block, Tp), block_k_major_dkv=min(block, Tp),
            block_k_dkv=min(block, Tp), block_q_dkv=min(block, Tp),
            block_k_major_dq=min(block, Tp), block_k_dq=min(block, Tp),
            block_q_dq=min(block, Tp),
        )
        return flash_attention(qp, kp, vp, causal=False,
                               sm_scale=D ** -0.5, block_sizes=bs)

    def bench(name, fn, grad=False):
        if grad:
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            f = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        else:
            f = jax.jit(fn)
        try:
            out = f(q, k, v)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x[(0,) * x.ndim]), out)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(q, k, v)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x[(0,) * x.ndim]), out)
            dt = (time.perf_counter() - t0) / args.reps
            print(f"RESULT {name}: {dt * 1e3:.3f} ms", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"RESULT {name}: FAILED {type(e).__name__}: {msg}",
                  flush=True)

    bench("xla_fwd", xla_attn)
    bench("xla_fwd_bwd", xla_attn, grad=True)
    for blk in (128, 256):
        bench(f"upstream_flash{blk}_fwd",
              padded(functools.partial(upstream_flash, block=blk)))
        bench(f"upstream_flash{blk}_fwd_bwd",
              padded(functools.partial(upstream_flash, block=blk)),
              grad=True)


if __name__ == "__main__":
    main()
