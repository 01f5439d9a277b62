"""A-softmax (SphereFace) angular-margin loss for the LCNN head.

Parity target: reference models/lcnn.py:86-118 (AngleLoss). The reference
keeps a mutable iteration counter on the module (`self.it`) to anneal lambda;
here the counter is explicit functional state (AngleLossState) so the loss
stays pure and jittable.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AngleLossState(NamedTuple):
    it: jnp.ndarray  # int32 scalar iteration counter

    @staticmethod
    def create() -> "AngleLossState":
        return AngleLossState(it=jnp.zeros((), jnp.int32))


def angle_loss(
    cos_psi: Tuple[jnp.ndarray, jnp.ndarray],
    target: jnp.ndarray,
    state: AngleLossState,
    gamma: float = 0.0,
    lambda_min: float = 5.0,
    lambda_max: float = 1500.0,
    weights: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, AngleLossState]:
    """Annealed angular-margin cross entropy.

    cos_psi: (cos_theta, psi_theta), each [B, C] — the AngleLinear head output
    (reference: models/lcnn.py:66). Returns (loss, new_state).

    lamb = max(lambda_min, lambda_max / (1 + 0.1 * it)) with it pre-incremented
    (reference: models/lcnn.py:105).
    """
    cos_theta, psi_theta = cos_psi
    it = state.it + 1
    lamb = jnp.maximum(lambda_min, lambda_max / (1.0 + 0.1 * it))

    onehot = jax.nn.one_hot(target, cos_theta.shape[-1], dtype=cos_theta.dtype)
    # output = cos_theta everywhere, blended with psi_theta at the target class
    # (reference: models/lcnn.py:106-108).
    output = cos_theta + onehot * (psi_theta - cos_theta) / (1.0 + lamb)

    logpt = jax.nn.log_softmax(output, axis=1)
    logpt = jnp.take_along_axis(logpt, target[:, None], axis=1)[:, 0]
    pt = jax.lax.stop_gradient(jnp.exp(logpt))

    per_sample = -((1.0 - pt) ** gamma) * logpt
    if weights is None:
        loss = jnp.mean(per_sample)
    else:
        # 0/1 sample mask (multi-host tail padding): weighted mean equals
        # the plain mean over the weight-1 samples
        w = weights.astype(per_sample.dtype)
        loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
    return loss, AngleLossState(it=it)
