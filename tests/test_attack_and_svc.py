"""PGD attack + linear SVM baseline tests (reference: oc_training.py:123-127,
models/linearsvc.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.attack import pgd_attack
from occm_tpu.models.linearsvc import SGD


def test_pgd_moves_toward_target_within_ball():
    # toy differentiable "model": logit 1 grows with mean(x)
    def logits_fn(x):
        m = jnp.mean(x, axis=1, keepdims=True)
        return jnp.concatenate([-m, m], axis=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 256)).astype(np.float32) * 0.1)
    target = jnp.array([1, 1, 1])
    eps = 8 / 255

    x_adv = pgd_attack(logits_fn, x, target, jax.random.PRNGKey(0), eps=eps)
    # stays in the eps ball and in [-1, 1]
    assert float(jnp.max(jnp.abs(x_adv - x))) <= eps + 1e-6
    assert float(jnp.max(jnp.abs(x_adv))) <= 1.0
    # target logit increased
    before = logits_fn(x)[:, 1]
    after = logits_fn(x_adv)[:, 1]
    assert np.all(np.asarray(after) > np.asarray(before))


def test_pgd_no_random_start_deterministic():
    def logits_fn(x):
        m = jnp.sum(x, axis=1, keepdims=True)
        return jnp.concatenate([m, -m], axis=1)

    x = jnp.zeros((1, 64))
    a1 = pgd_attack(logits_fn, x, jnp.array([0]), jax.random.PRNGKey(0),
                    random_start=False)
    a2 = pgd_attack(logits_fn, x, jnp.array([0]), jax.random.PRNGKey(9),
                    random_start=False)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_linear_svc_separable():
    rng = np.random.default_rng(0)
    X0 = rng.normal(size=(200, 16)) - 2.0
    X1 = rng.normal(size=(200, 16)) + 2.0
    X = np.concatenate([X0, X1]).astype(np.float32)
    y = np.array([0] * 200 + [1] * 200)
    clf = SGD(X, y, epochs=20)
    assert clf.evaluate(X, y) > 0.97
    preds = clf.predict(np.array([[-2.0] * 16, [2.0] * 16], np.float32))
    np.testing.assert_array_equal(preds, [0, 1])


def test_linear_svc_matches_sklearn_accuracy_ballpark():
    from sklearn.linear_model import SGDClassifier
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    rng = np.random.default_rng(1)
    n = 300
    X = rng.normal(size=(n, 8)).astype(np.float32)
    w_true = rng.normal(size=8)
    y = (X @ w_true + 0.5 * rng.normal(size=n) > 0).astype(int)

    ours = SGD(X, y, epochs=30).evaluate(X, y)
    sk = make_pipeline(
        StandardScaler(), SGDClassifier(max_iter=1000, tol=1e-3)
    ).fit(X, y).score(X, y)
    assert ours >= sk - 0.05
