"""Host-fabricated restore templates — CLI startup without tracing init.

The scoring/serving CLIs only need a SHAPE template to restore a
checkpoint into; tracing the real `model.init` at 300M scale costs
minutes through a remote-compile tunnel (and its values are immediately
overwritten by the restore). `jax.eval_shape` gives the tree for free,
and host numpy fabricates values: normal(0.02) for floating params (only
ever used under --allow_random_init test flows), ones for BatchNorm
variances (rsqrt(var+eps) must stay real), zeros elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fabricate_template_variables(model, sample, seed: int = 0) -> dict:
    """{'params': ..., 'batch_stats': ...} with correct shapes/dtypes,
    fabricated on host — no device compile, no tracing beyond
    eval_shape."""
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(seed),
             "dropout": jax.random.PRNGKey(seed)},
            sample,
        )
    )
    gen = np.random.default_rng(seed)

    def fab_param(s):
        if jnp.issubdtype(s.dtype, jnp.floating):
            return (gen.standard_normal(s.shape) * 0.02).astype(s.dtype)
        return np.zeros(s.shape, s.dtype)

    out = {
        "params": jax.tree_util.tree_map(fab_param, shapes["params"]),
    }
    if "batch_stats" in shapes:
        out["batch_stats"] = jax.tree_util.tree_map_with_path(
            lambda path, s: np.ones(s.shape, s.dtype)
            if path and getattr(path[-1], "key", "") == "var"
            else np.zeros(s.shape, s.dtype),
            shapes["batch_stats"],
        )
    return out
