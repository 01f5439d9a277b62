"""Fused transformer FFN (fc1 + GELU + fc2) — Pallas TPU kernel.

The XLSR scan body's FFN is the largest dense block per layer
(x[M,1024] @ W1[1024,4096] -> GELU -> @ W2[4096,1024]; reference compute:
fairseq TransformerSentenceEncoderLayer behind /root/reference/models/
xlsr.py:46). XLA runs the pair at ~99 TF/s on v5e because the fc2 dot is
narrow-N (N=1024, ~86 TF/s through the Mosaic batch-in-sublanes emitter)
and the [M,4096] GELU activation round-trips HBM between the dots. This
kernel keeps the hidden activation in VMEM, computes GELU on the VPU
between the two MXU dots, and accumulates fc2 partial products in an fp32
scratch tile — measured 122 TF/s (2.75 ms vs 3.15 ms XLA for the bench
shape M=19456).

Grid: (M/tm, F/tf) with `dimension_semantics=("parallel", "arbitrary")` —
the f dimension carries the fc2 accumulation. CRITICAL toolchain note:
without dimension_semantics Mosaic does not pipeline the grid on this
toolchain and the same kernel runs at ~7 TF/s.

Backward stays in XLA (custom VJP below): the dW dots run at ~184 TF/s
there already, and a recompute-based backward matches the remat policy of
the surrounding scan.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas import is TPU/CPU-interpret capable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# tile sizes chosen by microbench (tm=1024 needs vmem_limit 32M; tm=512
# fits the default 16M scoped limit at ~119 TF/s vs 122 — keep the safe one)
_TM = 512
_TF = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc,
            *, approximate: bool):
    f = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(f == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = jnp.dot(x_ref[:], w1_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1_ref[:].astype(jnp.float32),
                    approximate=approximate)
    acc[:] += jnp.dot(h.astype(x_ref.dtype), w2_ref[:],
                      preferred_element_type=jnp.float32)

    @pl.when(f == nf - 1)
    def _():
        o_ref[:] = (acc[:] + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _run_fwd(x2d, w1, b1, w2, b2, approximate: bool, interpret: bool):
    m, d = x2d.shape
    f = w1.shape[1]
    kern = functools.partial(_kernel, approximate=approximate)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((m, d), x2d.dtype),
        grid=(m // _TM, f // _TF),
        in_specs=[
            pl.BlockSpec((_TM, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, _TF), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TF), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TF, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, d), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((_TM, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2d, w1, b1, w2, b2)


def _xla_ffn(x, w1, b1, w2, b2, approximate: bool):
    h = jnp.dot(x, w1, preferred_element_type=jnp.float32)
    h = jax.nn.gelu(h + b1.astype(jnp.float32), approximate=approximate)
    return (jnp.dot(h.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32)
            + b2.astype(jnp.float32)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _fused_ffn(x2d, w1, b1, w2, b2, approximate: bool, interpret: bool):
    return _run_fwd(x2d, w1, b1, w2, b2, approximate, interpret)


def _ffn_fwd(x2d, w1, b1, w2, b2, approximate, interpret):
    out = _fused_ffn(x2d, w1, b1, w2, b2, approximate, interpret)
    return out, (x2d, w1, b1, w2, b2)


def _ffn_bwd(approximate, interpret, res, g):
    """Manual backward (XLA ops, fp32 accumulators) that recomputes ONLY
    the fc1 pre-activation — not the whole forward. jax.vjp of the
    forward would run both dots again (6 dots total); this runs 5:
    pre-recompute, dh, dx, dW1, dW2. The dW dots run at ~184 TF/s in XLA
    already, so no backward kernel is needed for them."""
    x2d, w1, b1, w2, b2 = res
    dt = x2d.dtype
    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)

    # keep every [M, F] intermediate in the compute dtype (bf16): fp32
    # copies of pre/h/dpre cost ~1 GB of HBM traffic per layer and were
    # measured to erase the fused-forward win end-to-end. Dots still
    # accumulate fp32; the per-element GELU' math runs fp32 inside the
    # fused elementwise pass.
    pre = (jnp.dot(x2d, w1, preferred_element_type=jnp.float32)
           + b1.astype(jnp.float32)).astype(dt)            # [M, F] bf16
    h, gelu_vjp = jax.vjp(
        lambda p: jax.nn.gelu(p.astype(jnp.float32),
                              approximate=approximate).astype(dt), pre
    )
    g_ = g.astype(dt)
    # dh = g @ w2^T : contract D of g [M,D] with D of w2 [F,D]
    dh = dot(g_, w2, (((1,), (1,)), ((), ()))).astype(dt)  # [M, F] bf16
    (dpre,) = gelu_vjp(dh)                                 # [M, F] bf16
    # dx = dpre @ w1^T : contract F with F of w1 [D, F]
    dx = dot(dpre, w1, (((1,), (1,)), ((), ()))).astype(dt)    # [M, D]
    # dW1 = x^T @ dpre : contract M
    dw1 = dot(x2d, dpre, (((0,), (0,)), ((), ()))).astype(w1.dtype)
    db1 = jnp.sum(dpre.astype(jnp.float32), axis=0,
                  keepdims=True).astype(b1.dtype)
    # dW2 = h^T @ g : contract M
    dw2 = dot(h, g_, (((0,), (0,)), ((), ()))).astype(w2.dtype)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0,
                  keepdims=True).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


_fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def fused_ffn(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray, b2: jnp.ndarray,
              approximate: bool = True,
              interpret: Optional[bool] = None) -> jnp.ndarray:
    """y = GELU(x @ w1 + b1) @ w2 + b2, hidden activation kept in VMEM.

    x [..., D]; w1 [D, F]; w2 [F, D]. Rows are padded to the tile size and
    cropped on the way out. Falls back to plain XLA when pallas is
    unavailable. Set interpret=True to run on CPU (tests).
    """
    d = x.shape[-1]
    f = w1.shape[1]
    # tiny/odd dims (tests, reduced configs): the tiled kernel needs
    # lane-aligned D and a TF-divisible hidden dim — use XLA there
    if not _HAS_PALLAS or f % _TF != 0 or d % 128 != 0:
        return _xla_ffn(x, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                        approximate)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    x2d = x.reshape(m, d)
    mp = _round_up(max(m, _TM), _TM)
    if mp != m:
        x2d = jnp.pad(x2d, ((0, mp - m), (0, 0)))
    assert f % _TF == 0, f"ffn dim {f} not a multiple of {_TF}"
    out = _fused_ffn(x2d, w1, b1.reshape(1, f), w2, b2.reshape(1, d),
                     approximate, interpret)
    if mp != m:
        out = out[:m]
    return out.reshape(*lead, d)
