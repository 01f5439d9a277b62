"""Fused Adam kernel parity against optax.adam (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from occm_tpu.ops.fused_adam import FusedAdam


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "big": jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32)),
        "mid": jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32)),
        "bias": jnp.asarray(rng.normal(size=(7,)).astype(np.float32)),
    }


def test_fused_adam_matches_optax_over_steps():
    params = _tree(0)
    lr = 1e-3
    fused = FusedAdam(lr, interpret=True)
    ref_tx = optax.adam(lr)

    f_state = fused.init(params)
    r_state = ref_tx.init(params)
    p_f = params
    p_r = params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                np.random.default_rng(step).normal(size=p.shape)
                .astype(np.float32)
            ),
            params,
        )
        p_f, f_state = fused.apply(p_f, grads, f_state)
        updates, r_state = ref_tx.update(grads, r_state, p_r)
        p_r = optax.apply_updates(p_r, updates)

    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_f[k]), np.asarray(p_r[k]), atol=1e-6, rtol=1e-5
        )
    assert int(f_state.count) == 5


def test_fused_adam_in_train_state():
    import flax.linen as nn

    from occm_tpu.train.state import create_train_state

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(128)(x)

    model = Toy()
    x = jnp.ones((4, 256))
    fused = FusedAdam(1e-2, interpret=True)
    state = create_train_state(model, jax.random.PRNGKey(0), x, fused)

    def loss_fn(p):
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    grads = jax.grad(loss_fn)(state.params)
    new_state = state.apply_gradients(grads, state.batch_stats)
    assert int(new_state.step) == 1
    moved = np.max(np.abs(
        np.asarray(new_state.params["Dense_0"]["kernel"])
        - np.asarray(state.params["Dense_0"]["kernel"])
    ))
    assert moved > 0
