"""PGD adversarial attack via jax.grad.

Parity target: the reference's torchattacks hook
(reference: oc_training.py:123-127): PGD(eps=8/255, alpha=2/225, steps=10,
random_start=True) targeted at the spoof class — defined but never wired
into the loop (SURVEY.md §2 C17). Here it is a pure jittable function with
lax.fori_loop instead of a Python autograd loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("logits_fn", "eps", "alpha", "steps",
                                   "random_start"))
def pgd_attack(
    logits_fn: Callable,
    x: jnp.ndarray,
    target: jnp.ndarray,
    key,
    eps: float = 8 / 255,
    alpha: float = 2 / 225,
    steps: int = 10,
    random_start: bool = True,
) -> jnp.ndarray:
    """L-inf PGD toward `target` labels.

    logits_fn(x) -> [B, C]; x [B, T] waveform; target [B] int labels.
    torchattacks semantics: random start in the eps-ball, per-step
    sign-gradient *descent* on CE toward the target class, projection onto
    the ball, clip to [-1, 1] (torchattacks clips to [0,1] for images; audio
    here is [-1, 1]).
    """

    def ce_to_target(xx):
        logits = logits_fn(xx)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logp, target[:, None], axis=-1)
        )

    grad_fn = jax.grad(ce_to_target)

    if random_start:
        x_adv = x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps)
    else:
        x_adv = x

    def body(_, x_adv):
        g = grad_fn(x_adv)
        # targeted: move DOWN the loss toward the target class
        x_adv = x_adv - alpha * jnp.sign(g)
        x_adv = x + jnp.clip(x_adv - x, -eps, eps)
        return jnp.clip(x_adv, -1.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, x_adv)
