"""Microbench: block-diagonal head-PAIR packing of the attention dots.

The r3 post-mortem (DESIGN.md) pinned the remaining attention cost on a
per-small-dot issue floor: at the bench shape (B=96, H=16, T=201, D=64)
both XLA's emitter and every Pallas formulation pay ~5x over dot
speed-of-light on the [T,T]x[T,64]-class dots, and the cost scales with
the NUMBER of dot instances, not their FLOPs. The MXU contracts 128 deep
natively, so a 64-deep QK^T contraction wastes half the array — a dot
with a 128-deep contraction of the same output size costs the same MXU
cycles.

This experiment packs each pair of heads into ONE dot per attention op:

  QK^T   Q' = blockdiag(q_a, q_b)  [2T, 2D]   (zeros off-diagonal)
         K' = concat(k_a, k_b, -1) [T, 2D]    (pure reshape, heads adjacent)
         S' = Q' K'^T = [s_a ; s_b]  [2T, T]  — exact, zero waste in output
  PV     P' = concat(p_a, p_b, -1) [T, 2T]
         V' = blockdiag(v_a, v_b)  [2T, 2D]
         O' = P' V' = [o_a , o_b]  [T, 2D]    — exact

Same useful FLOPs, same MXU cycles (the zero blocks ride the lanes the
64-deep form idles anyway), HALF the dot instances. If the floor really
is per-instance issue overhead, this recovers up to 2x of the ~82 ms
attention cost. Reference compute being attacked: fairseq MHA inside
wav2vec2 (reference models/xlsr.py:46 loads it).

Usage:
  JAX_PLATFORMS=cpu python tools/exp_packed_attention.py --parity
  python tools/exp_packed_attention.py --bench [--batch 96] [--T 201]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--parity" in sys.argv:
    # the env var does NOT beat the axon plugin; this does (must run
    # before the first JAX op)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def attn_xla(q, k, v):
    """Baseline: the bench-default einsum pair ([B,T,H,D] layout)."""
    hd = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q * hd ** -0.5, k,
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def attn_packed(q, k, v):
    """Head-pair block-diagonal packing ([B,T,H,D] in/out)."""
    B, T, h, hd = q.shape
    P = h // 2
    q = q * hd ** -0.5
    # head-major pairs [B,P,2,T,hd]
    qh = q.transpose(0, 2, 1, 3).reshape(B, P, 2, T, hd)
    kh = k.transpose(0, 2, 1, 3).reshape(B, P, 2, T, hd)
    vh = v.transpose(0, 2, 1, 3).reshape(B, P, 2, T, hd)
    # K': per-position concat of the two heads' features [B,P,T,2hd]
    kc = kh.transpose(0, 1, 3, 2, 4).reshape(B, P, T, 2 * hd)
    # Q': block-diagonal [B,P,2T,2hd]
    qa = jnp.pad(qh[:, :, 0], ((0, 0), (0, 0), (0, 0), (0, hd)))
    qb = jnp.pad(qh[:, :, 1], ((0, 0), (0, 0), (0, 0), (hd, 0)))
    qp = jnp.concatenate([qa, qb], axis=2)
    # one 128-deep dot per head pair: [B,P,2T,T]
    logits = jnp.einsum(
        "bpqd,bpkd->bpqk", qp, kc, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    # PV, also packed: P' [B,P,T,2T] x blockdiag(V) [B,P,2T,2hd]
    pc = probs.reshape(B, P, 2, T, T).transpose(0, 1, 3, 2, 4)
    pc = pc.reshape(B, P, T, 2 * T)
    va = jnp.pad(vh[:, :, 0], ((0, 0), (0, 0), (0, 0), (0, hd)))
    vb = jnp.pad(vh[:, :, 1], ((0, 0), (0, 0), (0, 0), (hd, 0)))
    vp = jnp.concatenate([va, vb], axis=2)  # [B,P,2T,2hd]
    out = jnp.einsum("bpqk,bpkd->bpqd", pc, vp)  # [B,P,T,2hd]
    out = out.reshape(B, P, T, 2, hd).transpose(0, 2, 1, 3, 4)
    return out.reshape(B, T, h, hd)


def attn_packed_qk_only(q, k, v):
    """Packing only QK^T (PV kept as the baseline batched dot)."""
    B, T, h, hd = q.shape
    P = h // 2
    q = q * hd ** -0.5
    qh = q.transpose(0, 2, 1, 3).reshape(B, P, 2, T, hd)
    kh = k.transpose(0, 2, 1, 3).reshape(B, P, 2, T, hd)
    kc = kh.transpose(0, 1, 3, 2, 4).reshape(B, P, T, 2 * hd)
    qa = jnp.pad(qh[:, :, 0], ((0, 0), (0, 0), (0, 0), (0, hd)))
    qb = jnp.pad(qh[:, :, 1], ((0, 0), (0, 0), (0, 0), (hd, 0)))
    qp = jnp.concatenate([qa, qb], axis=2)
    logits = jnp.einsum(
        "bpqd,bpkd->bpqk", qp, kc, preferred_element_type=jnp.float32
    )
    logits = logits.reshape(B, P, 2, T, T).reshape(B, h, T, T)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


IMPLS = {
    "xla": attn_xla,
    "packed": attn_packed,
    "packed_qk": attn_packed_qk_only,
}


def make_inputs(batch, T, h, hd, dtype):
    rng = np.random.default_rng(0)
    shp = (batch, T, h, hd)
    return tuple(
        jnp.asarray(rng.normal(size=shp).astype(np.float32) * 0.1, dtype)
        for _ in range(3)
    )


def parity():
    q, k, v = make_inputs(2, 17, 4, 8, jnp.float32)
    ref = attn_xla(q, k, v)
    for name in ("packed", "packed_qk"):
        got = IMPLS[name](q, k, v)
        err = float(jnp.max(jnp.abs(got - ref)))
        print(f"{name}: max|diff| = {err:.2e}")
        assert err < 1e-5, (name, err)
    print("parity OK")


def bench(batch, T, h, hd, iters=20):
    q, k, v = make_inputs(batch, T, h, hd, jnp.bfloat16)

    for name, fn in IMPLS.items():
        fwd = jax.jit(fn)

        def loss(q, k, v, fn=fn):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        for tag, f in (("fwd", lambda: fwd(q, k, v)),
                       ("fwd+bwd", lambda: fb(q, k, v))):
            r = f()
            jax.block_until_ready(r)
            # remote-tunnel honest sync: force a host read
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f()
            leaf = jax.tree_util.tree_leaves(r)[0]
            float(jnp.sum(leaf.astype(jnp.float32)))
            dt = (time.perf_counter() - t0) / iters * 1e3
            print(f"{name:10s} {tag:8s} {dt:7.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--T", type=int, default=201)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--hd", type=int, default=64)
    args = ap.parse_args()
    if args.parity:
        parity()
    if args.bench:
        bench(args.batch, args.T, args.heads, args.hd)


if __name__ == "__main__":
    main()
