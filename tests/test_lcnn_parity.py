"""AngleLinear (A-softmax head) parity against a torch oracle implementing
the reference formulas (reference: models/lcnn.py:41-83)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from occm_tpu.models.lcnn import AngleLinear

KEY = jax.random.PRNGKey(0)


def _oracle(w, x):
    """reference models/lcnn.py:41-67 with m=4, phiflag=True."""
    x = torch.tensor(x)
    w = torch.tensor(w)
    ww = w.renorm(2, 1, 1e-5).mul(1e5)
    xlen = x.pow(2).sum(1).pow(0.5)
    wlen = ww.pow(2).sum(0).pow(0.5)
    cos_theta = (x @ ww) / xlen.view(-1, 1) / wlen.view(1, -1)
    cos_theta = cos_theta.clamp(-1, 1)
    cos_m_theta = 8 * cos_theta**4 - 8 * cos_theta**2 + 1
    theta = cos_theta.acos()
    k = (4 * theta / 3.14159265).floor()
    psi_theta = ((-1.0) ** k) * cos_m_theta - 2 * k
    return (cos_theta * xlen.view(-1, 1)).numpy(), \
        (psi_theta * xlen.view(-1, 1)).numpy()


def _oracle_eval(w, x):
    """reference models/lcnn.py:69-83."""
    x = torch.tensor(x)
    w = torch.tensor(w)
    ww = w.renorm(2, 1, 1e-5).mul(1e5)
    wlen = ww.pow(2).sum(0).pow(0.5)
    return ((x @ ww) / wlen.view(1, -1)).numpy()


def test_angle_linear_train_and_eval_match_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 8)).astype(np.float32)

    layer = AngleLinear(out_features=2)
    variables = layer.init({"params": KEY}, jnp.asarray(x))
    w = np.asarray(variables["params"]["weight"])

    cos_t, psi_t = layer.apply(variables, jnp.asarray(x))
    o_cos, o_psi = _oracle(w, x)
    np.testing.assert_allclose(np.asarray(cos_t), o_cos, atol=2e-5)
    np.testing.assert_allclose(np.asarray(psi_t), o_psi, atol=2e-4)

    ev = layer.apply(variables, jnp.asarray(x), eval_mode=True)
    np.testing.assert_allclose(
        np.asarray(ev), _oracle_eval(w, x), atol=2e-5
    )
