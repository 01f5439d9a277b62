"""One optimizer across chained models — gradient-flow pattern test
(reference: test_model_merge.py:1-61 trains 3 chained toy Linear nets with a
single optimizer). In JAX this is a single param pytree through optax."""

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class Chain(nn.Module):
    """Three chained toy linears, one param tree."""

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(16, name="net1")(x)
        x = nn.relu(x)
        x = nn.Dense(8, name="net2")(x)
        x = nn.relu(x)
        return nn.Dense(2, name="net3")(x)


def test_single_optimizer_trains_all_chained_nets():
    model = Chain()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    y = jnp.asarray((rng.normal(size=32) > 0).astype(np.int32))

    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        logits = model.apply({"params": p}, x)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))

    @jax.jit
    def step(p, s):
        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss, grads

    losses = []
    p0 = jax.tree_util.tree_map(np.asarray, params)
    for _ in range(30):
        params, opt_state, loss, grads = step(params, opt_state)
        losses.append(float(loss))

    # loss decreases and EVERY sub-net received nonzero gradient updates
    assert losses[-1] < losses[0]
    for name in ("net1", "net2", "net3"):
        moved = np.max(
            np.abs(np.asarray(params[name]["kernel"]) - p0[name]["kernel"])
        )
        assert moved > 1e-5, f"{name} did not train"
        g = np.max(np.abs(np.asarray(grads[name]["kernel"])))
        assert g > 0, f"{name} got zero gradient"
