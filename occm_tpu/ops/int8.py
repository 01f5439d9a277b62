"""W8A8 int8 matmul path for the serving/scoring forward.

The v5e MXU runs int8 x int8 -> int32 at twice the bf16 rate. The scoring
forward is MXU-bound in the XLSR transformer projections (q/k/v/out, fc1,
fc2 — ~95% of scoring FLOPs), so quantising BOTH weights and activations
to int8 doubles the roofline where it matters. Accuracy evidence for the
weight side was banked in round 2 (tools/exp_int8_scoring.py: worst
per-kernel weight error 0.5%, embedding cosine 0.9996); this module adds
the speed side:

- weights: offline per-output-channel symmetric int8
  (`quantize_params_int8` transforms a trained fp32 tree into the
  `quant_int8=True` checkpoint layout),
- activations: dynamic per-row symmetric int8 at runtime (one abs-max per
  token — cheap VPU work fused around the dot),
- the dot itself: `lax.dot_general(int8, int8, preferred_element_type=
  int32)` — the native int8 MXU path.

Training never uses this path (round/clip are non-differentiable);
it is a serving transform, like the reference's eval-mode scoring
(reference: oc_classifier.py:182-186) but quantised.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight_int8(w: np.ndarray):
    """Per-output-channel symmetric int8: w [.., in, out] ->
    (q int8 same shape, scale fp32 [.., out])."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=-2)  # reduce the input-feature axis
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale[..., None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=jnp.float32) -> jnp.ndarray:
    """y = dequant(quant(x) @ w_q) + bias.

    x [..., in] float; w_q [in, out] int8; w_scale [out] fp32.
    Dynamic per-row activation scale: s_x = max|x| / 127 along the feature
    axis. The accumulator is int32 (exact); the result is rescaled by
    s_x * w_scale."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s_x = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * s_x * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------- params

# module names whose `kernel` is quantised in the quant_int8 checkpoint
# layout (the XLSR transformer projections; everything else — conv stem,
# norms, pos-conv, backends — stays fp32)
QUANTIZED_MODULES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")


def quantize_params_int8(params):
    """Transform a trained fp32/bf16 XLSR param tree into the
    `XLSRConfig(quant_int8=True)` layout: each transformer projection's
    {kernel, bias} becomes {kernel_q int8, scale fp32, bias}. Works on the
    scan-stacked [L, in, out] kernels and on unstacked ones.

    The walk only quantises QUANTIZED_MODULES found INSIDE the encoder's
    scanned transformer subtree (a `layers` scope) — backend classifiers
    reuse generic names like fc1/fc2 (e.g. SELayer, the CNN heads) and
    must stay fp32 with their original {kernel} layout."""

    def walk(node, in_layers=False):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            if (
                in_layers
                and name in QUANTIZED_MODULES
                and isinstance(child, dict)
                and "kernel" in child
                and getattr(child["kernel"], "ndim", 0) >= 2
            ):
                q, scale = quantize_weight_int8(np.asarray(child["kernel"]))
                new_child = {
                    "kernel_q": jnp.asarray(q),
                    "scale": jnp.asarray(scale),
                }
                if "bias" in child:
                    new_child["bias"] = jnp.asarray(
                        np.asarray(child["bias"], np.float32))
                out[name] = new_child
            else:
                out[name] = walk(child, in_layers or name == "layers")
        return out

    return walk(jax.device_get(params))
