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

# Tile edge for the online-softmax kernel, chosen PER CALL: the largest
# of (1024, 512) that does not increase padding. Bigger tiles amortise
# the fixed per-grid-step cost — measured at T=2048 on v5e: 1024-tiles
# run the forward in 2.55 vs 4.00 ms (-36%) and fwd+bwd in 13.4 vs 15.4
# ms (-13%) — but padding a non-multiple T to 1024 (e.g. T=1500 -> 2048
# instead of 1536) costs more FLOPs than the tiling wins, so alignment
# decides. VMEM bounds both: the backward holds ~3 fp32 [blk, blk]
# tensors (12 MB at 1024 — fits). OCM_FLASH_BLK pins a tile size for
# experiments.
import os as _os

_BLK_ENV = _os.environ.get("OCM_FLASH_BLK")


def _pick_blk(t: int) -> int:
    if _BLK_ENV:
        return int(_BLK_ENV)
    pad1024 = -(-t // 1024) * 1024
    pad512 = -(-t // 512) * 512
    return 1024 if pad1024 == pad512 else 512


# default tile for wrappers that need a static reference (tests)
_BLK = 512


def _blocked_fwd_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref,
                        m_scr, l_scr, acc_scr,
                        *, t_valid: int, scale: float, nk: int):
    """Classic flash forward: grid (BH, nq, nk) with the kv dimension
    sequential; running (max, sum, acc) per query row live in VMEM
    scratch across the kv sweep. Whole-T VMEM residency no longer bounds
    T — the [T, T] matrix never exists (the whole-T kernel above tops out
    at T≈1400 where its fp32 logits tile alone fills VMEM). Also emits
    the log-sum-exp per query row, which the backward kernels consume to
    rebuild probabilities block-by-block."""
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
        l_fin = l_scr[:, :1]
        o_ref[0] = (acc_scr[...] / l_fin).astype(o_ref.dtype)
        # per-row lse replicated across the 128 lanes of its block (the
        # in-tree TPU flash kernel's layout: Mosaic rejects blocks whose
        # second-to-last dim is neither divisible by 8 nor the array dim,
        # so a (1, Bq) row-block cannot exist)
        lse_ref[0] = jnp.broadcast_to(
            m_scr[:, :1] + jnp.log(jnp.maximum(l_fin, 1e-30)),
            lse_ref.shape[1:],
        )


def _run_blocked_fwd(q, k, v, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    blk = _pick_blk(t_valid)
    assert T % blk == 0, (T, blk)
    nq = nk = T // blk
    qf = q.reshape(B * H, T, D)
    ktf = jnp.swapaxes(k.reshape(B * H, T, D), 1, 2)     # [BH, D, T]
    vf = v.reshape(B * H, T, D)
    out, lse = pl.pallas_call(
        functools.partial(_blocked_fwd_kernel, t_valid=t_valid,
                          scale=scale, nk=nk),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B * H, T, 128), jnp.float32),
        ],
        grid=(B * H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, blk, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, blk), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, D), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blk, D), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, 128), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, 128), jnp.float32),    # running max
            pltpu.VMEM((blk, 128), jnp.float32),    # running sum
            pltpu.VMEM((blk, D), jnp.float32),      # output accumulator
        ],
        # kv dim is a running reduction -> sequential ("arbitrary")
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, ktf, vf)
    return out.reshape(B, H, T, D), lse


def _blocked_p_ds(q_ref, kt_ref, vt_ref, do_ref, lse_ref, delta_ref,
                  t_valid: int, scale: float, ik: int):
    """Shared backward recompute for one (q-block, kv-block) pair:
    p = exp(scale·qkᵀ − lse) and ds = p·(do·vᵀ − delta), both [Bq, Bk]
    fp32. Canonical dot layouts throughout; per-query lse/delta arrive
    lane-replicated ((1, Bq, 128) blocks, the in-tree layout) and slice
    to (Bq, 1) columns for free."""
    q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    logits = jnp.dot(q, kt_ref[0], preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) \
        + ik * logits.shape[1]
    logits = jnp.where(col < t_valid, logits, -1e30)
    p = jnp.exp(logits - lse_ref[0][:, :1])
    dp = jnp.dot(do_ref[0], vt_ref[0],
                 preferred_element_type=jnp.float32)     # [Bq, Bk]
    ds = p * (dp - delta_ref[0][:, :1])
    return p, ds


def _blocked_dq_kernel(q_ref, kt_ref, k_ref, vt_ref, do_ref, lse_ref,
                       delta_ref, dq_ref, dq_scr,
                       *, t_valid: int, scale: float, nk: int):
    """dq = scale · Σ_j ds_ij @ k_j — grid (BH, nq, nk), kv sequential,
    fp32 accumulator in VMEM scratch."""
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr[...])

    _, ds = _blocked_p_ds(q_ref, kt_ref, vt_ref, do_ref, lse_ref,
                          delta_ref, t_valid, scale, ik)
    dq_scr[...] += jnp.dot(
        ds.astype(q_ref.dtype), k_ref[0],
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(ik == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _blocked_dkv_kernel(q_ref, kt_ref, vt_ref, do_ref, lse_ref, delta_ref,
                        dkT_ref, dvT_ref, dkT_scr, dvT_scr,
                        *, t_valid: int, scale: float, nq: int):
    """dkᵀ = scale · Σ_i qᵀ_i @ ds_ij, dvᵀ = Σ_i doᵀ_i @ p_ij — grid
    (BH, nk, nq), q sequential. Transposed accumulators so the only
    dim-0 contractions are on the small [Bq, D] operands (the whole-T
    backward's layout rule); results un-transpose outside in XLA."""
    iq = pl.program_id(2)
    ik = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dkT_scr[...] = jnp.zeros_like(dkT_scr[...])
        dvT_scr[...] = jnp.zeros_like(dvT_scr[...])

    p, ds = _blocked_p_ds(q_ref, kt_ref, vt_ref, do_ref, lse_ref,
                          delta_ref, t_valid, scale, ik)
    dvT_scr[...] += jax.lax.dot_general(
        do_ref[0], p.astype(do_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [D, Bk]
    dkT_scr[...] += jax.lax.dot_general(
        q_ref[0], ds.astype(q_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                            # [D, Bk]

    @pl.when(iq == nq - 1)
    def _finish():
        dkT_ref[0] = dkT_scr[...].astype(dkT_ref.dtype)
        dvT_ref[0] = dvT_scr[...].astype(dvT_ref.dtype)


def _run_blocked_bwd(q, k, v, o, lse, do, t_valid: int, scale: float,
                     interpret: bool):
    B, H, T, D = q.shape
    blk = _pick_blk(t_valid)
    assert T % blk == 0, (T, blk)
    nq = nk = T // blk
    flat = lambda x: x.reshape(B * H, T, D)
    flat_t = lambda x: jnp.swapaxes(x.reshape(B * H, T, D), 1, 2)
    qf, kf, dof = flat(q), flat(k), flat(do)
    ktf, vtf = flat_t(k), flat_t(v)
    # delta_i = rowsum(do * o), lane-replicated to the (1, Bq, 128)
    # block layout the kernels read (in-tree flash layout)
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                axis=-1).reshape(B * H, T)[..., None],
        (B * H, T, 128),
    )

    td = pl.BlockSpec((1, blk, D), lambda b, i, j: (b, i, 0),
                      memory_space=pltpu.VMEM)
    ktb = pl.BlockSpec((1, D, blk), lambda b, i, j: (b, 0, j),
                       memory_space=pltpu.VMEM)
    kb = pl.BlockSpec((1, blk, D), lambda b, i, j: (b, j, 0),
                      memory_space=pltpu.VMEM)
    rowq = pl.BlockSpec((1, blk, 128), lambda b, i, j: (b, i, 0),
                        memory_space=pltpu.VMEM)
    seq = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"))

    dq = pl.pallas_call(
        functools.partial(_blocked_dq_kernel, t_valid=t_valid,
                          scale=scale, nk=nk),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        grid=(B * H, nq, nk),
        in_specs=[td, ktb, kb, ktb, td, rowq, rowq],
        out_specs=td,
        scratch_shapes=[pltpu.VMEM((blk, D), jnp.float32)],
        compiler_params=seq,
        interpret=interpret,
    )(qf, ktf, kf, vtf, dof, lse, delta)

    # dkv: grid dim 1 indexes the KV block, dim 2 sweeps q blocks
    tdq = pl.BlockSpec((1, blk, D), lambda b, j, i: (b, i, 0),
                       memory_space=pltpu.VMEM)
    ktbq = pl.BlockSpec((1, D, blk), lambda b, j, i: (b, 0, j),
                        memory_space=pltpu.VMEM)
    rowq2 = pl.BlockSpec((1, blk, 128), lambda b, j, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    dtb = pl.BlockSpec((1, D, blk), lambda b, j, i: (b, 0, j),
                       memory_space=pltpu.VMEM)
    dkT, dvT = pl.pallas_call(
        functools.partial(_blocked_dkv_kernel, t_valid=t_valid,
                          scale=scale, nq=nq),
        out_shape=[
            jax.ShapeDtypeStruct((B * H, D, T), q.dtype),
            jax.ShapeDtypeStruct((B * H, D, T), q.dtype),
        ],
        grid=(B * H, nk, nq),
        in_specs=[tdq, ktbq, ktbq, tdq, rowq2, rowq2],
        out_specs=[dtb, dtb],
        scratch_shapes=[
            pltpu.VMEM((D, blk), jnp.float32),
            pltpu.VMEM((D, blk), jnp.float32),
        ],
        compiler_params=seq,
        interpret=interpret,
    )(qf, ktf, vtf, dof, lse, delta)

    unflat = lambda x: x.reshape(B, H, T, D)
    unflat_t = lambda x: jnp.swapaxes(x, 1, 2).reshape(B, H, T, D)
    return unflat(dq), unflat_t(dkT), unflat_t(dvT)


def _masked_reference(q, k, v, t_valid: int):
    """XLA attention over [B, H, T, D] with padded keys masked — the
    independent oracle the blocked kernels are parity-tested against
    (tests/test_attention.py)."""
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
    return _run_blocked_fwd(q, k, v, t_valid, scale, interpret)[0]


def _bf_fwd(q, k, v, t_valid, interpret):
    scale = 1.0 / math.sqrt(q.shape[-1])
    o, lse = _run_blocked_fwd(q, k, v, t_valid, scale, interpret)
    # residual stores one lane of the lane-replicated lse (128x smaller);
    # the backward re-broadcasts it into the kernel block layout
    return o, (q, k, v, o, lse[:, :, 0])


def _bf_bwd(t_valid, interpret, res, g):
    # flash-style blocked backward: probabilities rebuilt block-by-block
    # from the saved log-sum-exp — the [T, T] matrix never exists in
    # either direction (the r5-initial XLA-reference backward
    # materialised [B, H, T, T] in HBM; long-cut fine-tuning pays that
    # at T=2048). Padded-q-row contributions vanish automatically: their
    # upstream gradient rows are zero (the wrapper's output slice), so
    # ds = p·(0 − 0) = 0 and dv sees p·0.
    q, k, v, o, lse = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    lse = jnp.broadcast_to(lse[..., None], lse.shape + (128,))
    return _run_blocked_bwd(q, k, v, o, lse, g, t_valid, scale, interpret)


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
      multiple of 512) — the full-length-audio regime (reference:
      oc_classifier.py:93-94 scores unbounded utterances); backward is
      the flash-style blocked pair (dq over a kv sweep, dkᵀ/dvᵀ over a
      q sweep) rebuilding probabilities from the saved log-sum-exp, so
      long-cut fine-tuning never materialises [T, T] either.

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
        Tp = _round_up(T, _pick_blk(T))

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
