"""Fused Adam update as a Pallas TPU kernel.

optax's Adam lowers to a chain of elementwise passes over every parameter
(scale-by-adam, update transform, apply_updates) — each one a full HBM
round trip over the 300M-parameter tree. This kernel computes

    m <- b1*m + (1-b1)*g
    v <- b2*v + (1-b2)*g^2
    p <- p - lr * (m/(1-b1^t)) / (sqrt(v/(1-b2^t)) + eps)

in ONE pass per parameter: read p,m,v,g once, write p,m,v once (the
bandwidth lower bound). Leaves whose size is not lane-aligned fall back to
the identical jnp formula (they are tiny: biases, norms).

Used through `FusedAdam`, a drop-in optimizer object for
occm_tpu.train.state.TrainState (select with TrainConfig.optimizer =
"fused_adam").
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_LANES = 128
_BLOCK_ROWS = 512


def _adam_math(p, m, v, g, inv_bc1, inv_bc2, lr, b1, b2, eps):
    new_m = b1 * m + (1.0 - b1) * g
    new_v = b2 * v + (1.0 - b2) * g * g
    mhat = new_m * inv_bc1
    vhat = new_v * inv_bc2
    new_p = p - lr * mhat / (jnp.sqrt(vhat) + eps)
    return new_p, new_m, new_v


def _bias_corrections(t, b1, b2):
    """Scalar 1/(1-b^t) factors — computed OUTSIDE the kernel (Mosaic has
    no powf legalisation for traced exponents)."""
    tf = t.astype(jnp.float32)
    inv_bc1 = 1.0 / (1.0 - b1 ** tf)
    inv_bc2 = 1.0 / (1.0 - b2 ** tf)
    return inv_bc1, inv_bc2


def _kernel(bc_ref, p_ref, m_ref, v_ref, g_ref, op_ref, om_ref, ov_ref, *,
            lr: float, b1: float, b2: float, eps: float):
    inv_bc1 = bc_ref[0, 0]
    inv_bc2 = bc_ref[0, 1]
    new_p, new_m, new_v = _adam_math(
        p_ref[:], m_ref[:], v_ref[:], g_ref[:], inv_bc1, inv_bc2,
        lr, b1, b2, eps,
    )
    op_ref[:] = new_p
    om_ref[:] = new_m
    ov_ref[:] = new_v


def _fused_leaf(p, m, v, g, t, lr, b1, b2, eps, interpret):
    shape = p.shape
    n = p.size
    inv_bc1, inv_bc2 = _bias_corrections(t, b1, b2)
    if (
        not _HAS_PALLAS
        or p.dtype != jnp.float32
        or n % _LANES != 0
        or n < _LANES * 8
    ):
        return _adam_math(p, m, v, g, inv_bc1, inv_bc2, lr, b1, b2, eps)

    rows = n // _LANES
    br = min(_BLOCK_ROWS, rows)
    flat = lambda x: x.reshape(rows, _LANES)
    bc = jnp.stack([inv_bc1, inv_bc2]).astype(jnp.float32).reshape(1, 2)

    grid = pl.cdiv(rows, br)
    block = pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, _LANES), jnp.float32)] * 3

    new_p, new_m, new_v = pl.pallas_call(
        functools.partial(_kernel, lr=lr, b1=b1, b2=b2, eps=eps),
        out_shape=out_shape,
        grid=(grid,),
        in_specs=[smem, block, block, block, block],
        out_specs=[block] * 3,
        interpret=interpret,
    )(bc, flat(p), flat(m), flat(v), flat(g))
    unflat = lambda x: x.reshape(shape)
    return unflat(new_p), unflat(new_m), unflat(new_v)


class FusedAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


class FusedAdam:
    """Single-pass Adam. TrainState detects this type and applies it via
    `apply(params, grads, state)` instead of the optax update/apply split."""

    def __init__(self, learning_rate: float, b1: float = 0.9,
                 b2: float = 0.999, eps: float = 1e-8,
                 interpret: bool | None = None):
        self.lr = float(learning_rate)
        self.b1 = float(b1)
        self.b2 = float(b2)
        self.eps = float(eps)
        self.interpret = interpret

    def init(self, params) -> FusedAdamState:
        zeros = lambda p: jnp.zeros_like(p)
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def apply(self, params, grads, state: FusedAdamState
              ) -> Tuple[Any, FusedAdamState]:
        interpret = self.interpret
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        t = state.count + 1

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_g = treedef.flatten_up_to(grads)

        new_p, new_m, new_v = [], [], []
        for p, m, v, g in zip(flat_p, flat_m, flat_v, flat_g):
            np_, nm, nv = _fused_leaf(
                p, m, v, g.astype(p.dtype), t, self.lr, self.b1, self.b2,
                self.eps, interpret,
            )
            new_p.append(np_)
            new_m.append(nm)
            new_v.append(nv)

        return (
            jax.tree_util.tree_unflatten(treedef, new_p),
            FusedAdamState(
                count=t,
                mu=jax.tree_util.tree_unflatten(treedef, new_m),
                nu=jax.tree_util.tree_unflatten(treedef, new_v),
            ),
        )
