"""Gradient accumulation and lr-schedule tests.

Grad accumulation (TrainConfig.grad_accum) must be numerically equivalent
to the single big-batch update — the accumulated gradient is the exact
big-batch gradient up to fp32 summation order (train/loop.py scales each
micro-batch gradient by its share of the global weighted denominator
before summing). The reference has no equivalent feature; it exists here
as HBM headroom for 300M-scale fine-tuning (SURVEY.md §7 hard part 1).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from occm_tpu.config import TrainConfig
from occm_tpu.train.loop import make_optimizer, make_train_step
from occm_tpu.train.state import create_train_state


class TinyDual(nn.Module):
    """BN/dropout-free (emb, logits) model so accumulation is exactly
    comparable to the big-batch step (BatchNorm batch statistics are
    per-micro-batch by design, like torch grad accumulation)."""

    dim: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.dim)(x.reshape(x.shape[0], -1))
        h = nn.tanh(h)
        emb = nn.Dense(self.dim)(h)
        logits = nn.Dense(2)(h)
        return emb, logits


def _batch(groups, cut=400, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(groups * 12, cut).astype(np.float32)
    labels = np.tile(np.array([0] * 6 + [1] * 6, np.int32), groups)
    return jnp.asarray(x), jnp.asarray(labels)


def _run_step(cfg, batch, seed=0, tx=None):
    import optax

    model = TinyDual()
    if tx is None:
        tx, _ = make_optimizer(cfg)
    state = create_train_state(model, jax.random.PRNGKey(seed), batch[0], tx)
    step = make_train_step(cfg, output_kind="dual")
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    return new_state, jax.device_get(metrics)


def _base_cfg(**kw):
    kw.setdefault("lr", 1e-3)
    kw.setdefault("cut", 400)
    kw.setdefault("compactness_weight", 0.3)
    kw.setdefault("descriptiveness_weight", 0.7)
    return TrainConfig(**kw)


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_equals_big_batch(accum):
    # SGD: the param delta is -lr * grad, so the comparison reflects the
    # accumulated gradient directly (Adam's m/sqrt(v) normalisation blows
    # fp summation-order noise up to O(lr) on near-zero gradient elements)
    import optax

    batch = _batch(groups=4)
    tx = optax.sgd(1e-2)
    s1, m1 = _run_step(_base_cfg(groups_per_step=4), batch, tx=tx)
    s2, m2 = _run_step(_base_cfg(groups_per_step=4, grad_accum=accum), batch,
                       tx=tx)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_accum_equals_big_batch_weighted():
    # ragged multi-host tail semantics: the last meta-batch is padding
    # (weight 0, constant within the meta-batch) — the accumulated update
    # must still equal the big weighted-batch update even though one
    # micro-batch is entirely padding (its share r_i = 0)
    import optax

    x, labels = _batch(groups=4)
    w = jnp.concatenate([jnp.ones(36, jnp.float32), jnp.zeros(12, jnp.float32)])
    tx = optax.sgd(1e-2)
    s1, m1 = _run_step(_base_cfg(groups_per_step=4), (x, labels, w), tx=tx)
    s2, m2 = _run_step(
        _base_cfg(groups_per_step=4, grad_accum=4), (x, labels, w), tx=tx)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-7),
        jax.device_get(s1.params), jax.device_get(s2.params))


@pytest.mark.parametrize("tail_groups", [1, 3, 5])
def test_accum_ragged_tail_falls_back(tail_groups):
    # The pipeline's drop_remainder=False yields a last batch with fewer
    # groups than TrainConfig validated. grad_accum must fall back to the
    # single-pass gradient for that shape (r4 advisor, high): without the
    # fallback, tail_groups=1 with accum=2 fails at trace time and
    # tail_groups=5 silently splits meta-batches across micro-batches.
    import optax

    tx = optax.sgd(1e-2)
    cfg_big = _base_cfg(groups_per_step=6)
    cfg_accum = _base_cfg(groups_per_step=6, grad_accum=2)
    batch = _batch(groups=tail_groups)
    s1, m1 = _run_step(cfg_big, batch, tx=tx)
    s2, m2 = _run_step(cfg_accum, batch, tx=tx)
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-6, atol=0)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        jax.device_get(s1.params), jax.device_get(s2.params))


def test_accum_validation():
    with pytest.raises(ValueError, match="divisible"):
        _base_cfg(groups_per_step=3, grad_accum=2)
    with pytest.raises(ValueError, match="grad_accum"):
        _base_cfg(grad_accum=0)


def test_accum_real_model_smoke():
    # the real tiny AModel (BN + dropout): accumulation compiles and the
    # BN running stats advance (semantics, not equality — batch stats are
    # per-micro-batch like torch grad accumulation)
    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel

    cfg = _base_cfg(groups_per_step=2, grad_accum=2, cut=3200)
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    x, labels = _batch(groups=2, cut=3200)
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), x, tx)
    stats_before = jax.device_get(state.batch_stats)  # before donation
    step = make_train_step(cfg, output_kind="dual")
    new_state, metrics = step(state, (x, labels), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # at least one BN running stat leaf moved
    leaves = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
        stats_before, jax.device_get(new_state.batch_stats)))
    assert any(bool(v) for v in leaves)


def test_lr_schedule_values():
    cfg = _base_cfg(lr=1e-3, lr_schedule="cosine", warmup_steps=10,
                    decay_steps=90, lr_end_ratio=0.1)
    _, sched = make_optimizer(cfg)
    assert float(sched(0)) == pytest.approx(0.0, abs=1e-9)
    assert float(sched(10)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(100)) == pytest.approx(1e-4, rel=1e-3)
    cfg = _base_cfg(lr=1e-3, lr_schedule="linear", warmup_steps=4,
                    decay_steps=8, lr_end_ratio=0.5)
    _, sched = make_optimizer(cfg)
    assert float(sched(2)) == pytest.approx(5e-4, rel=1e-6)
    assert float(sched(4)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(12)) == pytest.approx(5e-4, rel=1e-6)


def test_lr_schedule_drives_update():
    # warmup makes the step-0 lr exactly 0: the first update is a no-op,
    # the second moves the params — proves the schedule actually threads
    # through the optimizer the train step applies
    cfg = _base_cfg(groups_per_step=1, lr_schedule="cosine",
                    warmup_steps=1, decay_steps=10)
    batch = _batch(groups=1)
    model = TinyDual()
    tx, _ = make_optimizer(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0), batch[0], tx)
    p0 = jax.device_get(state.params)  # before donation
    step = make_train_step(cfg, output_kind="dual")
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    p1 = jax.device_get(s1.params)
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(p1)))
    s2, _ = step(s1, batch, jax.random.PRNGKey(2))
    p2 = jax.device_get(s2.params)
    assert any(not np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)))


def test_lr_schedule_validation():
    with pytest.raises(ValueError, match="decay_steps"):
        _base_cfg(lr_schedule="cosine")
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        _base_cfg(lr_schedule="step")
    with pytest.raises(ValueError, match="fused_adam"):
        _base_cfg(lr_schedule="cosine", decay_steps=10,
                  optimizer="fused_adam")
