"""One-class training losses.

Numerical-parity targets (reference: losses/custom_loss.py):
- compactness_loss (l.4-29): mean leave-one-out Euclidean distance over the
  first 6 (bonafide) embeddings. Here it is the vectorised closed form — the
  mean of the other five embeddings equals (sum - x_i) / 5 — instead of the
  reference's Python loop, so it stays a single fused XLA computation.
- descriptiveness_loss (l.78-99): mean cross-entropy over all logits.
- triplet_loss (l.32-57) and euclidean_distance_loss (l.59-74).

All distances reproduce `torch.nn.functional.pairwise_distance` semantics,
which adds eps=1e-6 to the *difference* before the norm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_distance(x: jnp.ndarray, y: jnp.ndarray, p: float = 2.0,
                      eps: float = 1e-6) -> jnp.ndarray:
    """L_p distance along the last axis with torch's eps-on-difference
    convention: ||x - y + eps||_p."""
    diff = x - y + eps
    if p == 2.0:
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return jnp.sum(jnp.abs(diff) ** p, axis=-1) ** (1.0 / p)


def compactness_loss(batch_embeddings: jnp.ndarray, num_bona: int = 6
                     ) -> jnp.ndarray:
    """Mean distance of each bonafide embedding to the mean of the others.

    batch_embeddings: [B, D] with the first `num_bona` rows bonafide
    (reference: losses/custom_loss.py:4-29 iterates i in range(6)).
    """
    bona = batch_embeddings[:num_bona]                      # [n, D]
    total = jnp.sum(bona, axis=0, keepdims=True)            # [1, D]
    others_mean = (total - bona) / (num_bona - 1)           # [n, D]
    dists = pairwise_distance(bona, others_mean)            # [n]
    return jnp.mean(dists)


def descriptiveness_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                         weights: jnp.ndarray = None) -> jnp.ndarray:
    """Mean cross-entropy over the batch
    (reference: losses/custom_loss.py:78-99: sum of per-sample CE / batch).

    weights: optional [B] 0/1 sample mask — the weighted mean equals the
    plain mean over the weight-1 samples. Used by the multi-host tail
    padding (train/loop.py) so padded utterances contribute nothing."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if weights is None:
        return jnp.sum(nll) / logits.shape[0]
    w = weights.astype(nll.dtype)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def triplet_loss(batch_embeddings: jnp.ndarray, margin: float = 9.0
                 ) -> jnp.ndarray:
    """relu(d(bona1,bona2) - d(bona1,spoof1) + margin)
    (reference: losses/custom_loss.py:32-57; rows are [bona1,bona2,spoof1])."""
    bona2bona = pairwise_distance(batch_embeddings[0], batch_embeddings[1])
    bona2spoof = pairwise_distance(batch_embeddings[0], batch_embeddings[2])
    return jax.nn.relu(bona2bona - bona2spoof + margin)


def euclidean_distance_loss(batch_embeddings: jnp.ndarray) -> jnp.ndarray:
    """Mean distance over the fixed index pairs
    [(0,1),(0,2),(0,3),(2,1),(2,3)] (reference: losses/custom_loss.py:59-74)."""
    idx_a = jnp.array([0, 0, 0, 2, 2])
    idx_b = jnp.array([1, 2, 3, 1, 3])
    dists = pairwise_distance(
        batch_embeddings[idx_a], batch_embeddings[idx_b]
    )
    return jnp.mean(dists)


def one_class_loss(embeddings: jnp.ndarray, logits: jnp.ndarray,
                   labels: jnp.ndarray, compactness_weight: float,
                   descriptiveness_weight: float):
    """Weighted one-class objective, returning (loss, (c_loss, d_loss)).

    The shipped config is 0.0 * compactness + 1.0 * descriptiveness
    (reference: oc_training.py:380-382); the alt trainer uses 0.1 / 0.9
    (reference: test_dataloader_v2.py:125-127).
    """
    c_loss = compactness_loss(embeddings)
    d_loss = descriptiveness_loss(logits, labels)
    loss = compactness_weight * c_loss + descriptiveness_weight * d_loss
    return loss, (c_loss, d_loss)
