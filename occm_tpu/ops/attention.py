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


def _group(n: int, t: int = 256, n_live_tt: int = 1) -> int:
    """(b,h) pairs per grid step: largest divisor of n up to 8 — big
    enough to amortise the fixed per-step cost, small enough to keep the
    block VMEM-resident. VMEM-aware (r5 long-T lane): the whole-T kernel
    holds `n_live_tt` live [T, T] fp32 tensors per pair (1 forward:
    logits/probs reuse; 3 backward: p, dp, ds), so the group shrinks as
    T grows — an 8 MB budget keeps the bench shape (T=256 padded) at
    g=8, unchanged."""
    budget = 8 * 1024 * 1024
    per_pair = n_live_tt * t * t * 4
    max_g = max(1, budget // max(per_pair, 1))
    for g in (8, 6, 4, 3, 2):
        if g <= max_g and n % g == 0:
            return g
    return 1


def _bh_spec(g: int, t: int, d: int):
    return pl.BlockSpec(
        (g, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
    )


def _run_fwd(q, k, v, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    g = _group(B * H, T, n_live_tt=1)
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
    g = _group(B * H, T, n_live_tt=3)
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


# ------------------------------------------- blocked kernel (long T)

# Tile edge for the online-softmax kernel: [512, 512] fp32 logits tile is
# 1 MB VMEM; the PV dot contracts 512 deep (full MXU depth, the regime
# DESIGN.md's r3 post-mortem predicts kernels start winning in).
_BLK = 512


def _blocked_fwd_kernel(q_ref, kt_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                        *, t_valid: int, scale: float, nk: int):
    """Classic flash forward: grid (BH, nq, nk) with the kv dimension
    sequential; running (max, sum, acc) per query row live in VMEM
    scratch across the kv sweep. Whole-T VMEM residency no longer bounds
    T — the [T, T] matrix never exists (the whole-T kernel above tops out
    at T≈1400 where its fp32 logits tile alone fills VMEM)."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr[...], -1e30)
        l_scr[...] = jnp.zeros_like(l_scr[...])
        acc_scr[...] = jnp.zeros_like(acc_scr[...])

    # fold the softmax scale into q (same as the whole-T kernel)
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    logits = jnp.dot(
        q, kt_ref[0], preferred_element_type=jnp.float32
    )                                                    # [Bq, Bk] fp32
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) \
        + ik * logits.shape[1]
    logits = jnp.where(col < t_valid, logits, -1e30)

    m_prev = m_scr[:, :1]                                # [Bq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new)                          # fp32
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0],
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = (
            acc_scr[...] / l_scr[:, :1]
        ).astype(o_ref.dtype)


def _run_blocked_fwd(q, k, v, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    assert T % _BLK == 0, (T, _BLK)
    nq = nk = T // _BLK
    qf = q.reshape(B * H, T, D)
    ktf = jnp.swapaxes(k.reshape(B * H, T, D), 1, 2)     # [BH, D, T]
    vf = v.reshape(B * H, T, D)
    out = pl.pallas_call(
        functools.partial(_blocked_fwd_kernel, t_valid=t_valid,
                          scale=scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, _BLK, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, _BLK), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLK, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLK, D), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_BLK, 128), jnp.float32),   # running max
            pltpu.VMEM((_BLK, 128), jnp.float32),   # running sum
            pltpu.VMEM((_BLK, D), jnp.float32),     # output accumulator
        ],
        # kv dim is a running reduction -> sequential ("arbitrary")
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, ktf, vf)
    return out.reshape(B, H, T, D)


def _masked_reference(q, k, v, t_valid: int):
    """XLA attention over [B, H, T, D] with padded keys masked — the
    differentiation target for the blocked kernel's backward (training at
    long T is off the critical path; serving is forward-only)."""
    D = q.shape[-1]
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(D))
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
    logits = jnp.where(col < t_valid, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _blocked_flash_padded(q, k, v, t_valid: int, interpret: bool):
    scale = 1.0 / math.sqrt(q.shape[-1])
    return _run_blocked_fwd(q, k, v, t_valid, scale, interpret)


def _bf_fwd(q, k, v, t_valid, interpret):
    return _blocked_flash_padded(q, k, v, t_valid, interpret), (q, k, v)


def _bf_bwd(t_valid, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _masked_reference(q, k, v, t_valid), q, k, v
    )
    return vjp(g)


_blocked_flash_padded.defvjp(_bf_fwd, _bf_bwd)


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

    Dispatch by sequence length (r5 long-T lane):
    - T (padded to 128) <= 512: whole-T kernel — each (batch, head)
      pair's attention lives entirely in VMEM, custom Pallas backward.
    - longer: blocked online-softmax kernel (tiles of 512, T padded to a
      multiple of 512) — the full-length-audio scoring regime
      (reference: oc_classifier.py:93-94 scores unbounded utterances);
      backward differentiates the XLA reference (serving is fwd-only).

    Masks padded keys, drops the pad on the way out. interpret=True runs
    the kernels on CPU (tests).
    """
    if not _HAS_PALLAS:  # environment without pallas: XLA fallback
        return reference_attention(q, k, v)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, H, D = q.shape
    Tp = _round_up(max(T, 128), 128)
    blocked = Tp > 512
    if blocked:
        Tp = _round_up(T, _BLK)

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # [B,H,T,D]
        if Tp != T:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        return x

    fn = _blocked_flash_padded if blocked else _flash_attention_padded
    out = fn(prep(q), prep(k), prep(v), T, interpret)
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
