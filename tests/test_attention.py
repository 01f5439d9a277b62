"""Pallas flash-attention parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.ops.attention import flash_attention, reference_attention


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    shape = (2, 201, 4, 64)  # [B, T, H, D] with XLSR-like T
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    return q, k, v


def test_forward_matches_reference(qkv):
    q, k, v = qkv
    ours = np.asarray(flash_attention(q, k, v, interpret=True))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_padding_mask_excludes_tail(qkv):
    # identical first-T outputs regardless of what sits in the padded tail —
    # guaranteed by construction, but verify numerics with T != multiple 128
    q, k, v = qkv
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    assert out.shape == (2, 201, 4, 64)
    assert np.all(np.isfinite(out))


def test_gradients_match_reference(qkv):
    q, k, v = qkv

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_xlsr_with_flash_attention_matches_xla_impl():
    import dataclasses

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    rng = np.random.default_rng(1)
    wave = jnp.asarray(rng.normal(size=(1, 3200)).astype(np.float32) * 0.1)

    cfg_xla = XLSRConfig.tiny()
    cfg_flash = dataclasses.replace(cfg_xla, attention_impl="flash")

    m1 = XLSREncoder(cfg_xla)
    variables = m1.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        wave,
    )
    out_xla = m1.apply(variables, wave)
    out_flash = XLSREncoder(cfg_flash).apply(variables, wave)
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_flash), atol=5e-4
    )


# ------------------------- blocked online-softmax kernel (long T, r5) ---

@pytest.mark.parametrize("T", [600, 1024, 1500])
def test_blocked_forward_matches_reference(T):
    """T past the whole-T kernel's 512 cutoff routes through the blocked
    online-softmax kernel (tiles of 512, padded keys masked); outputs
    must match the XLA reference at every length, including non-tile
    multiples."""
    rng = np.random.default_rng(2)
    shape = (1, T, 4, 64)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)
        for _ in range(3)
    )
    ours = np.asarray(flash_attention(q, k, v, interpret=True))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_blocked_gradients_match_reference():
    T = 700  # > 512 -> blocked path; backward is the masked XLA reference
    rng = np.random.default_rng(3)
    shape = (1, T, 2, 64)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)
        for _ in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )


def test_blocked_online_softmax_stability():
    # large-magnitude logits: the running-max rescale must stay finite
    # where a naive sum-of-exp overflows
    T = 1024
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=(1, T, 2, 64)).astype(np.float32) * 8)
    k = jnp.asarray(rng.normal(size=(1, T, 2, 64)).astype(np.float32) * 8)
    v = jnp.asarray(rng.normal(size=(1, T, 2, 64)).astype(np.float32))
    out = np.asarray(flash_attention(q, k, v, interpret=True))
    assert np.all(np.isfinite(out))
    ref = np.asarray(reference_attention(q, k, v))
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_blocked_gradients_multiblock_match_reference():
    # T=1024 = 2x2 blocks: exercises both accumulator sweeps (dq over kv,
    # dkv over q) across MULTIPLE blocks, through the Pallas backward
    T = 1024
    rng = np.random.default_rng(5)
    shape = (1, T, 2, 64)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.5)
        for _ in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )
