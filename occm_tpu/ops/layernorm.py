"""LayerNorm with a fused Pallas backward — targets the ~46 ms/step of
LayerNorm-backward reductions XLA emits inside the transformer backward
scan (DESIGN.md round-2 profile: multiply_reduce fusions at ~6x the HBM
speed-of-light for the [M,1024] tensors).

Forward stays plain XLA (it fuses with the surrounding residual adds);
the custom VJP saves only (x, gamma) and the backward runs ONE pass over
the data in a Pallas kernel, recomputing the row statistics from the x
tile already in VMEM:

    mu, rstd = stats(x);  x_hat = (x - mu) * rstd;  gg = g * gamma
    dx     = rstd * (gg - mean_D(gg) - x_hat * mean_D(gg * x_hat))
    dgamma = sum_M g * x_hat     (accumulated across row tiles in VMEM)
    dbeta  = sum_M g

Matches fairseq's fp32 LayerNorm statistics in both norm_dtype modes
(occm_tpu/models/xlsr.py). The grid iterates row tiles with
dimension_semantics=("arbitrary",) because dgamma/dbeta accumulate
across steps — see the toolchain note in DESIGN.md (kernels run
unpipelined without dimension_semantics).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_TM = 512  # row tile (1024 OOMs the 16M scoped VMEM with the fp32 temporaries)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bwd_kernel(x_ref, gamma_ref, g_ref, dx_ref, dgamma_ref, dbeta_ref,
                *, d_valid: int, eps: float):
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    gamma = gamma_ref[:].astype(jnp.float32)

    inv_d = 1.0 / float(d_valid)
    mu = jnp.sum(x, axis=-1, keepdims=True) * inv_d
    xc = x - mu
    var = jnp.sum(xc * xc, axis=-1, keepdims=True) * inv_d
    rstd = jax.lax.rsqrt(var + eps)
    x_hat = xc * rstd

    gg = g * gamma
    m1 = jnp.sum(gg, axis=-1, keepdims=True) * inv_d
    m2 = jnp.sum(gg * x_hat, axis=-1, keepdims=True) * inv_d
    dx_ref[:] = (rstd * (gg - m1 - x_hat * m2)).astype(dx_ref.dtype)
    # per-tile partials (summed by the caller) keep every grid dim
    # "parallel" — an accumulated [1,d] output serializes the grid on
    # this toolchain (measured 26.6 ms vs 1.45 ms XLA). Blocks are 8 rows
    # (min sublane tile); row 0 carries the partial, rows 1-7 are zero.
    d = x.shape[-1]
    zeros7 = jnp.zeros((7, d), jnp.float32)
    dgamma_ref[:] = jnp.concatenate(
        [jnp.sum(g * x_hat, axis=0, keepdims=True), zeros7])
    dbeta_ref[:] = jnp.concatenate(
        [jnp.sum(g, axis=0, keepdims=True), zeros7])


def _run_bwd(x2d, gamma, g2d, eps: float, interpret: bool):
    m, d = x2d.shape
    kern = functools.partial(_bwd_kernel, d_valid=d, eps=eps)
    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    n_tiles = m // _TM
    dx, dgamma, dbeta = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((m, d), x2d.dtype),
            jax.ShapeDtypeStruct((8 * n_tiles, d), jnp.float32),
            jax.ShapeDtypeStruct((8 * n_tiles, d), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TM, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, d), row, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TM, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), row, memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2d, gamma, g2d)
    return dx, jnp.sum(dgamma, axis=0, keepdims=True), \
        jnp.sum(dbeta, axis=0, keepdims=True)


def _fwd_math(x, gamma, beta, eps: float):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mu) * rstd * gamma.astype(jnp.float32) \
        + beta.astype(jnp.float32)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fast_layer_norm(x, gamma, beta, eps: float = 1e-5,
                    interpret: Optional[bool] = None):
    """LayerNorm over the last axis; same math as flax nn.LayerNorm with
    fp32 statistics, backward fused into one Pallas pass."""
    return _fwd_math(x, gamma, beta, eps)


def _fln_fwd(x, gamma, beta, eps, interpret):
    return _fwd_math(x, gamma, beta, eps), (x, gamma)


def _fln_bwd(eps, interpret, res, g):
    x, gamma = res
    d = x.shape[-1]
    lead = x.shape[:-1]
    m = 1
    for s in lead:
        m *= s
    xf2 = x.reshape(m, d)
    gf2 = g.reshape(m, d)
    if not _HAS_PALLAS or d % 128 != 0:
        # XLA fallback (tiny dims / no pallas): same math, plain jnp
        xf = xf2.astype(jnp.float32)
        gf = gf2.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + eps)
        x_hat = xc * rstd
        gg = gf * gamma.astype(jnp.float32)
        m1 = jnp.mean(gg, axis=-1, keepdims=True)
        m2 = jnp.mean(gg * x_hat, axis=-1, keepdims=True)
        dx = (rstd * (gg - m1 - x_hat * m2)).astype(x.dtype)
        dgamma = jnp.sum(gf * x_hat, axis=0)
        dbeta = jnp.sum(gf, axis=0)
        return (dx.reshape(x.shape), dgamma.astype(gamma.dtype),
                dbeta.astype(gamma.dtype))
    interp = interpret
    if interp is None:
        interp = jax.default_backend() != "tpu"
    g2d = gf2.astype(x.dtype)
    mp = _round_up(max(m, _TM), _TM)
    if mp != m:
        # padded rows: x=0 -> x_hat=0; g=0 -> contribute nothing
        xf2 = jnp.pad(xf2, ((0, mp - m), (0, 0)))
        g2d = jnp.pad(g2d, ((0, mp - m), (0, 0)))
    dx, dgamma, dbeta = _run_bwd(
        xf2, gamma.reshape(1, d).astype(jnp.float32), g2d, eps, interp,
    )
    if mp != m:
        dx = dx[:m]
    return (dx.reshape(x.shape), dgamma[0].astype(gamma.dtype),
            dbeta[0].astype(gamma.dtype))


fast_layer_norm.defvjp(_fln_fwd, _fln_bwd)
