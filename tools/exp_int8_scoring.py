"""Experiment: weight-only int8 quantisation of the scoring path.

Quantises the XLSR transformer matmul kernels (the ~95% of scoring-path
weights) to per-output-channel symmetric int8 and measures the embedding
drift against the bf16 baseline on synthetic audio — the accuracy half of
an int8 serving path. The speed half (int8 MXU dots, which double the MXU
rate on v5e) needs activation quantisation and is future work; weight-only
dequantised-to-bf16 wins nothing at these batch sizes because scoring is
MXU-bound, not weight-traffic-bound (DESIGN.md).

Usage: python tools/exp_int8_scoring.py [--full]   (tiny model by default)
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quantize_tree_int8(params, path_filter):
    """Per-output-channel symmetric int8 for selected kernels; returns
    (new_params, report: list of (path, rel_err))."""
    import jax
    import jax.numpy as jnp

    report = []

    def visit(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if not path_filter(name) or leaf.ndim < 2:
            return leaf
        w = np.asarray(leaf, np.float32)
        # scale per output channel (last axis)
        scale = np.abs(w).max(axis=tuple(range(w.ndim - 1)), keepdims=True)
        scale = np.maximum(scale, 1e-12) / 127.0
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        deq = q.astype(np.float32) * scale
        rel = float(np.linalg.norm(deq - w) / (np.linalg.norm(w) + 1e-12))
        report.append((name, rel))
        return jnp.asarray(deq, leaf.dtype)

    new_params = jax.tree_util.tree_map_with_path(visit, params)
    return new_params, report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel

    cut = 64600 if args.full else 16000
    xcfg = XLSRConfig() if args.full else XLSRConfig.tiny()
    acfg = AASISTConfig() if args.full else AASISTConfig.tiny()
    model = AModel(acfg, xlsr_cfg=xcfg)

    rng = jax.random.PRNGKey(0)
    init = jax.jit(lambda r, x: model.init({"params": r, "dropout": r}, x))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(args.batch, cut))
        .astype(np.float32) * 0.1
    )
    variables = init(rng, x)
    params = variables["params"]

    # transformer matmul kernels only (q/k/v/out/fc1/fc2 within the
    # scanned stack) — the LN/bias/conv parameters stay bf16/fp32
    def is_transformer_kernel(name: str) -> bool:
        return ("layers" in name and name.endswith("kernel")
                and not "conv" in name)

    qparams, report = quantize_tree_int8(params, is_transformer_kernel)
    n_q = len(report)
    worst = max(report, key=lambda kv: kv[1]) if report else ("-", 0.0)

    fwd = jax.jit(lambda p, x: model.apply(
        {"params": p, **{k: v for k, v in variables.items()
                         if k != "params"}}, x, train=False))
    emb_ref, logits_ref = fwd(params, x)
    emb_q, logits_q = fwd(qparams, x)

    emb_ref = np.asarray(emb_ref, np.float32)
    emb_q = np.asarray(emb_q, np.float32)
    drift = float(np.linalg.norm(emb_q - emb_ref)
                  / (np.linalg.norm(emb_ref) + 1e-12))
    cos = float(
        (emb_ref * emb_q).sum()
        / (np.linalg.norm(emb_ref) * np.linalg.norm(emb_q) + 1e-12)
    )
    logit_flip = int(
        (np.asarray(logits_ref).argmax(-1)
         != np.asarray(logits_q).argmax(-1)).sum()
    )
    print(f"quantised {n_q} kernels to int8 (per-output-channel)")
    print(f"worst per-kernel weight rel err: {worst[1]:.4f} ({worst[0]})")
    print(f"embedding drift rel L2: {drift:.4f}  cosine: {cos:.6f}")
    print(f"argmax logit flips: {logit_flip}/{args.batch}")


if __name__ == "__main__":
    main()
