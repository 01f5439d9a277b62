"""Linear SVM baseline over precomputed embeddings, in JAX.

Parity target: reference models/linearsvc.py:6-19 — an sklearn pipeline of
StandardScaler + SGDClassifier (defaults: hinge loss, L2 alpha=1e-4,
max_iter=1000, tol=1e-3). Here the same estimator is a jitted JAX SGD on
the hinge objective with built-in standardisation, so the baseline runs
on-device next to the embeddings that feed it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("epochs",))
def _fit_hinge(X, y, key, alpha: float, lr0: float, epochs: int):
    n, d = X.shape
    w = jnp.zeros((d,))
    b = jnp.zeros(())

    def epoch_body(e, carry):
        w, b, key = carry
        key, sub = jax.random.split(key)
        order = jax.random.permutation(sub, n)

        def sample_body(i, wb):
            w, b = wb
            idx = order[i]
            t = e * n + i + 1
            lr = lr0 / (1.0 + lr0 * alpha * t)  # sklearn 'optimal'-style decay
            margin = y[idx] * (X[idx] @ w + b)
            viol = margin < 1.0
            gw = alpha * w - jnp.where(viol, y[idx], 0.0) * X[idx]
            gb = -jnp.where(viol, y[idx], 0.0)
            return w - lr * gw, b - lr * gb

        w, b = jax.lax.fori_loop(0, n, sample_body, (w, b))
        return w, b, key

    w, b, _ = jax.lax.fori_loop(0, epochs, epoch_body, (w, b, key))
    return w, b


class SGD:
    """Drop-in for the reference SGD class (train / predict / evaluate)."""

    def __init__(self, X, y, alpha: float = 1e-4, lr0: float = 1.0,
                 epochs: int = 50, seed: int = 0):
        X = np.asarray(X, np.float32)
        y = np.asarray(y)
        self.classes_ = np.unique(y)
        assert len(self.classes_) == 2, "binary baseline"
        self._mu = X.mean(axis=0)
        self._sd = np.maximum(X.std(axis=0), 1e-8)
        Xs = (X - self._mu) / self._sd
        ypm = np.where(y == self.classes_[1], 1.0, -1.0).astype(np.float32)
        w, b = _fit_hinge(
            jnp.asarray(Xs), jnp.asarray(ypm), jax.random.PRNGKey(seed),
            alpha, lr0, epochs,
        )
        self._w = np.asarray(w)
        self._b = float(b)

    def decision_function(self, X):
        Xs = (np.asarray(X, np.float32) - self._mu) / self._sd
        return Xs @ self._w + self._b

    def predict(self, X):
        return np.where(
            self.decision_function(X) >= 0, self.classes_[1], self.classes_[0]
        )

    def evaluate(self, X, y):
        return float(np.mean(self.predict(X) == np.asarray(y)))
