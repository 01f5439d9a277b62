"""Microbench alternative formulations of the wav2vec2 positional conv.

The r3 full-step audit (DESIGN.md) left pos_conv as the one sizeable op
still far below its roof: ~12 ms/step fwd+bwd at ~63 TF/s through XLA's
grouped-conv emitter (k=128, groups=16 -> 64-deep per-group contraction,
half the MXU lanes idle). Reference compute being attacked:
fairseq's `pos_conv` inside wav2vec2 (reference: models/xlsr.py:46 loads
it; the conv itself lives in the fairseq dependency).

Three formulations of the SAME math (parity-checked here with --parity):

  grouped   lax grouped conv, feature_group_count=16 (the baseline)
  batched   groups folded into the BATCH dim via batch_group_count=16:
            input [G*B, T, 64] group-major, same kernel layout
  s2d       space-to-depth: T -> T/8 positions x 8-tap channel blocks, so
            each of the 17 taps contracts 512 channels per group instead
            of 64 (the classic TPU stem-conv trick; 6% more FLOPs, full
            MXU lane occupancy). Kernel is regathered [17,512,8192] from
            the canonical [128,64,1024] every call (it must be - the
            weights train), so the gather + its scatter-add VJP are
            charged to the formulation.

Usage:
  JAX_PLATFORMS=cpu python tools/exp_pos_conv.py --parity
  python tools/exp_pos_conv.py --bench [--batch 96] [--T 201]
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
import jax.numpy as jnp

from occm_tpu.ops.pos_conv import (  # noqa: E402
    pos_conv_batched, pos_conv_grouped, pos_conv_s2d)

K = 128      # conv_pos
G = 16       # conv_pos_groups


def pos_grouped(x, w):
    return pos_conv_grouped(x, w, G)[:, : x.shape[1], :]


def pos_batched(x, w):
    return pos_conv_batched(x, w, G)[:, : x.shape[1], :]


def pos_s2d(x, w):
    return pos_conv_s2d(x, w, G)[:, : x.shape[1], :]


FORMS = {"grouped": pos_grouped, "batched": pos_batched, "s2d": pos_s2d}


def parity():
    rng = np.random.default_rng(0)
    for B, T, C in [(2, 37, 64), (2, 201, 256)]:
        if C % G or (C // G) < 1:
            continue
        x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(K, C // G, C)).astype(np.float32) * 0.05)
        ref = np.asarray(pos_grouped(x, w))
        for name in ("batched", "s2d"):
            got = np.asarray(FORMS[name](x, w))
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"PARITY {name} B={B} T={T} C={C}: rel_max_err {err:.2e}")
            assert err < 1e-5, (name, err)
    # gradients agree too (the s2d gather has a custom-shaped VJP path)
    B, T, C = 2, 51, 128
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, C // G, C)).astype(np.float32) * 0.05)

    def loss(fn, x, w):
        return jnp.sum(jnp.sin(fn(x, w)))

    gx_ref, gw_ref = jax.grad(functools.partial(loss, pos_grouped),
                              argnums=(0, 1))(x, w)
    for name in ("batched", "s2d"):
        gx, gw = jax.grad(functools.partial(loss, FORMS[name]),
                          argnums=(0, 1))(x, w)
        ex = np.abs(np.asarray(gx - gx_ref)).max()
        ew = np.abs(np.asarray(gw - gw_ref)).max()
        print(f"PARITY-GRAD {name}: dx {ex:.2e} dw {ew:.2e}")
        assert ex < 1e-4 and ew < 1e-4, (name, ex, ew)
    print("PARITY OK")


def bench(batch: int, T: int, reps: int):
    rng = np.random.default_rng(0)
    C = 1024
    x = jnp.asarray(rng.normal(size=(batch, T, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray((rng.normal(size=(K, C // G, C)) * 0.05
                     ).astype(np.float32)).astype(jnp.bfloat16)
    gflop = 2 * batch * T * K * (C // G) * C / 1e9

    for name, fn in FORMS.items():
        fwd = jax.jit(fn)

        def lossfn(x, w, fn=fn):
            return jnp.sum(fn(x, w).astype(jnp.float32))

        fb = jax.jit(jax.grad(lossfn, argnums=(0, 1)))

        def timeit(f, *a):
            r = f(*a)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(*a)
            jax.block_until_ready(r)
            return (time.perf_counter() - t0) / reps * 1e3

        tf_ = timeit(fwd, x, w)
        tb = timeit(fb, x, w)
        print(f"RESULT {name}: fwd {tf_:.2f} ms ({gflop/tf_:.0f} TF/s)  "
              f"fwd+bwd-as-grad {tb:.2f} ms ({3*gflop/tb:.0f} TF/s eq)",
              flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--T", type=int, default=201)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    if args.parity:
        # force CPU BEFORE the backend initialises: the axon TPU plugin
        # wins over JAX_PLATFORMS=cpu, and the tunnel is single-client
        jax.config.update("jax_platforms", "cpu")
        parity()
    if args.bench:
        bench(args.batch, args.T, args.reps)
