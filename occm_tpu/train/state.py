"""Train state: params + BN stats + optimizer state + step counter.

The reference checkpoints bare model weights only — no optimizer state, no
step counter, no resume logic (reference: oc_training.py:398-401, SURVEY.md
§5.4). Here the full state is a pytree checkpointed with orbax
(occm_tpu.train.checkpoint).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        from occm_tpu.ops.fused_adam import FusedAdam

        if isinstance(self.tx, FusedAdam):
            # single-pass Pallas update: p/m/v read+written once
            params, new_opt_state = self.tx.apply(
                self.params, grads, self.opt_state
            )
        else:
            updates, new_opt_state = self.tx.update(
                grads, self.opt_state, self.params
            )
            params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )


def create_train_state(model, rng, sample_input, tx, train: bool = False
                       ) -> TrainState:
    """Initialise model variables and optimizer state.

    The init is jitted: linen's eager init dispatches every tiny op
    separately, which is pathologically slow over a remote-TPU tunnel; one
    compiled program initialises in a single round trip.
    """
    import jax.numpy as jnp

    init_fn = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=train)
    )
    variables = init_fn(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
