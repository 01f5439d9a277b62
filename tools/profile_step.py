"""Capture a jax.profiler trace of the flagship train step.

Usage: python tools/profile_step.py [logdir] [groups_per_step]
View with TensorBoard's profile plugin. (SURVEY.md §5.1 — the reference has
no profiling story at all.)
"""

from __future__ import annotations

import sys


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/occm_tb"
    groups = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from occm_tpu.config import (
        AASISTConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.models import AModel
    from occm_tpu.train.loop import make_train_step
    from occm_tpu.train.state import create_train_state
    from occm_tpu.utils.profiling import profile_trace

    cut = 64600
    batch = groups * 12
    cfg = TrainConfig(groups_per_step=groups, rawboost=RawBoostConfig(algo=0))
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig())
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, rng, jnp.zeros((batch, cut), jnp.float32), optax.adam(1e-5)
    )
    step_fn = make_train_step(cfg, output_kind="dual")
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, cut)).astype(np.float32)
    )
    labels = jnp.asarray(np.tile(np.array([0] * 6 + [1] * 6, np.int32),
                                 groups))

    # compile outside the trace
    state, m = step_fn(state, (x, labels), jax.random.fold_in(rng, 0))
    float(m["loss"])

    with profile_trace(logdir):
        for i in range(3):
            state, m = step_fn(state, (x, labels),
                               jax.random.fold_in(rng, i + 1))
            float(m["loss"])
    print(f"trace written to {logdir}")


if __name__ == "__main__":
    main()
