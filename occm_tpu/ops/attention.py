"""Fused multi-head attention for the XLSR transformer — Pallas TPU kernel
with custom VJP, plus an XLA einsum fallback.

Why a kernel: the XLSR stack runs 24 layers x 16 heads over ~201 frames per
utterance. The naive path materialises the [B, H, T, T] probability tensor
in HBM for forward AND stashes it for backward; at meta-batch 24 that is
~150 MB of HBM traffic per layer per direction. Here the whole per-(batch,
head) attention lives in VMEM (T<=512 fits easily), nothing round-trips to
HBM, and the backward pass recomputes probabilities flash-style instead of
saving them.

Layout: q,k,v [B, H, T, D] with T padded to a multiple of 128 by the
wrapper; a static key mask handles the padded tail. D is the per-head dim
(64 for XLSR) — lanes pad to 128 internally, acceptable at this size.

See /opt/skills/guides/pallas_guide.md for the kernel-authoring rules used
here (grid/BlockSpec, fp32 softmax on the VPU, jnp.dot on the MXU with
preferred_element_type, custom-VJP pattern).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/CPU-interpret capable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# --------------------------------------------------------------- kernels

def _fwd_kernel(q_ref, kt_ref, v_ref, o_ref, *, t_valid: int, scale: float):
    # Three hard-won rules shape this kernel (DESIGN.md r2/r3 ledger):
    # - MXU dots stay in the input dtype (bf16): fp32 MXU matmuls cost a
    #   3-pass decomposition on v5e (the all-fp32 r2 kernel measured 143
    #   utt/s end-to-end vs 207 XLA). Accumulation/softmax are fp32.
    # - G (batch, head) pairs per grid step: with one pair per step the
    #   1536-step grid is bound by ~2.6 us/step of fixed Mosaic overhead
    #   (4.45 ms/layer measured vs 0.5 ms of math).
    # - every dot is in canonical [M,K]@[K,N] form: K arrives
    #   pre-transposed ([D, T]) because a non-canonical contraction makes
    #   Mosaic relayout the operand in-kernel on the VPU.
    g, t, _ = q_ref.shape
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        if t_valid < t else None
    )  # key mask, hoisted: identical for every (b,h) pair in the block
    for i in range(g):  # static unroll over the grouped (b,h) pairs
        # fold the softmax scale into q: one [T, D] multiply instead of a
        # [T, T] multiply on the logits
        q = (q_ref[i].astype(jnp.float32) * scale).astype(q_ref.dtype)
        kt = kt_ref[i]                                   # [D, T]
        v = v_ref[i]

        logits = jnp.dot(
            q, kt, preferred_element_type=jnp.float32,
        )                                                # [T, T] fp32
        if col is not None:
            logits = jnp.where(col < t_valid, logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        o_ref[i] = jnp.dot(
            probs, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, kt_ref, vt_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, t_valid: int, scale: float):
    # bf16 MXU dots, fp32 accumulators/softmax, G pairs per grid step,
    # canonical dot layouts (see _fwd_kernel note). k arrives in BOTH
    # layouts: kt [D, T] for the logits recompute, k [T, D] for dq.
    g, t, _ = q_ref.shape
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        if t_valid < t else None
    )
    for i in range(g):
        q = q_ref[i]
        k = k_ref[i]
        kt = kt_ref[i]                                   # [D, T]
        vt = vt_ref[i]                                   # [D, T]
        do = do_ref[i]

        logits = jnp.dot(
            q, kt, preferred_element_type=jnp.float32,
        ) * scale
        if col is not None:
            logits = jnp.where(col < t_valid, logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1)              # [T, T] fp32
        p_lo = p.astype(q.dtype)

        # dv = p^T @ do and dk = ds^T @ q, but contracting dim 0 of the
        # BIG [T, T] matrix forces Mosaic to relayout it in-kernel.
        # Compute the transposed results instead — dv^T = do^T @ p,
        # dk^T = q^T @ ds — so the only dim-0 contractions are on the
        # small [T, D] operands, then un-transpose the [D, T] results.
        dvT = jax.lax.dot_general(
            do, p_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                # [D, T]
        dp = jnp.dot(
            do, vt, preferred_element_type=jnp.float32,
        )                                                # [T, T]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lo = ds.astype(q.dtype)
        dq = jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
        dkT = jax.lax.dot_general(
            q, ds_lo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                        # [D, T]

        # dk/dv leave the kernel in [D, T] layout — the un-transpose is a
        # cheap fusable XLA op outside, not a Mosaic relayout inside
        dq_ref[i] = dq.astype(dq_ref.dtype)
        dk_ref[i] = dkT.astype(dk_ref.dtype)
        dv_ref[i] = dvT.astype(dv_ref.dtype)


def _group(n: int) -> int:
    """(b,h) pairs per grid step: largest divisor of n up to 8 — big
    enough to amortise the fixed per-step cost, small enough to keep the
    block VMEM-resident."""
    for g in (8, 6, 4, 3, 2):
        if n % g == 0:
            return g
    return 1


def _bh_spec(g: int, t: int, d: int):
    return pl.BlockSpec(
        (g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
    )


def _run_fwd(q, k, v, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    g = _group(B * H)
    qf = q.reshape(B * H, T, D)
    # k transposed OUTSIDE the kernel: XLA's HBM transpose is cheap and
    # fusable; Mosaic's in-kernel relayout of a non-canonical dot operand
    # is not (see _fwd_kernel note)
    ktf = jnp.swapaxes(k.reshape(B * H, T, D), 1, 2)      # [BH, D, T]
    vf = v.reshape(B * H, T, D)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t_valid=t_valid, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        grid=(B * H // g,),
        in_specs=[_bh_spec(g, T, D), _bh_spec(g, D, T), _bh_spec(g, T, D)],
        out_specs=_bh_spec(g, T, D),
        # without dimension_semantics Mosaic does not pipeline the grid on
        # this toolchain (measured ~10x slowdown on the FFN kernel)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qf, ktf, vf)
    return out.reshape(B, H, T, D)


def _run_bwd(q, k, v, do, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    g = _group(B * H)
    flat = lambda x: x.reshape(B * H, T, D)
    flat_t = lambda x: jnp.swapaxes(x.reshape(B * H, T, D), 1, 2)
    td = _bh_spec(g, T, D)
    dt_ = _bh_spec(g, D, T)
    dq, dkT, dvT = pl.pallas_call(
        functools.partial(_bwd_kernel, t_valid=t_valid, scale=scale),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, D, T), q.dtype),
            jax.ShapeDtypeStruct((B * H, D, T), q.dtype),
        ],
        grid=(B * H // g,),
        in_specs=[td, td, dt_, dt_, td],
        out_specs=[td, dt_, dt_],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat_t(k), flat_t(v), flat(do))
    unflat = lambda x: x.reshape(B, H, T, D)
    unflat_t = lambda x: jnp.swapaxes(x, 1, 2).reshape(B, H, T, D)
    return unflat(dq), unflat_t(dkT), unflat_t(dvT)


# ------------------------------------------------------------ public op

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_attention_padded(q, k, v, t_valid: int, interpret: bool):
    scale = 1.0 / math.sqrt(q.shape[-1])
    return _run_fwd(q, k, v, t_valid, scale, interpret)


def _fa_fwd(q, k, v, t_valid, interpret):
    return _flash_attention_padded(q, k, v, t_valid, interpret), (q, k, v)


def _fa_bwd(t_valid, interpret, res, g):
    q, k, v = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    dq, dk, dv = _run_bwd(q, k, v, g, t_valid, scale, interpret)
    return dq, dk, dv


_flash_attention_padded.defvjp(_fa_fwd, _fa_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Fused MHA: q,k,v [B, T, H, D] (unscaled q) -> [B, T, H, D].

    Pads T to a multiple of 128, masks the padded keys, and drops the pad on
    the way out. Set interpret=True to run the kernel on CPU (tests).
    """
    if not _HAS_PALLAS:  # environment without pallas: XLA fallback
        return reference_attention(q, k, v)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    Tp = _round_up(max(T, 128), 128)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B,H,T,D]
        if Tp != T:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        return x

    out = _flash_attention_padded(prep(q), prep(k), prep(v), T, interpret)
    out = out[:, :, :T, :]
    return jnp.transpose(out, (0, 2, 1, 3))


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                        ) -> jnp.ndarray:
    """XLA einsum fallback, same signature/semantics as flash_attention."""
    D = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(D))
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
