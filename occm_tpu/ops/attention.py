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

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, t_valid: int, scale: float):
    # keep the MXU dots in the input dtype (bf16): fp32 MXU matmuls cost a
    # 3-pass decomposition on v5e — the r2 all-fp32 version of this kernel
    # measured 143 utt/s end-to-end vs 207 XLA for exactly that reason.
    # Accumulation and softmax stay fp32 via preferred_element_type.
    q = q_ref[0]  # [T, D]
    k = k_ref[0]
    v = v_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                            # [T, T] fp32
    t = logits.shape[-1]
    if t_valid < t:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t_valid, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o_ref[0] = jnp.dot(
        probs, v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                t_valid: int, scale: float):
    # bf16 MXU dots, fp32 accumulators/softmax (see _fwd_kernel note)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    t = logits.shape[-1]
    if t_valid < t:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t_valid, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)                  # [T, T] fp32
    p_lo = p.astype(q.dtype)

    dv = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [T, D]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [T, T]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lo = ds.astype(q.dtype)
    dq = jnp.dot(ds_lo, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        ds_lo, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bh_spec(t: int, d: int):
    return pl.BlockSpec(
        (1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM,
    )


def _run_fwd(q, k, v, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, T, D)
    vf = v.reshape(B * H, T, D)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, t_valid=t_valid, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), q.dtype),
        grid=(B * H,),
        in_specs=[_bh_spec(T, D)] * 3,
        out_specs=_bh_spec(T, D),
        # without dimension_semantics Mosaic does not pipeline the grid on
        # this toolchain (measured ~10x slowdown on the FFN kernel)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, T, D)


def _run_bwd(q, k, v, do, t_valid: int, scale: float, interpret: bool):
    B, H, T, D = q.shape
    flat = lambda x: x.reshape(B * H, T, D)
    shapes = [jax.ShapeDtypeStruct((B * H, T, D), q.dtype)] * 3
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, t_valid=t_valid, scale=scale),
        out_shape=shapes,
        grid=(B * H,),
        in_specs=[_bh_spec(T, D)] * 4,
        out_specs=[_bh_spec(T, D)] * 3,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), flat(do))
    unflat = lambda x: x.reshape(B, H, T, D)
    return unflat(dq), unflat(dk), unflat(dv)


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
