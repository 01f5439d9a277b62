"""Loss parity tests against a torch-functional oracle implementing the
reference formulas (reference: losses/custom_loss.py)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from occm_tpu.losses import (
    angle_loss,
    AngleLossState,
    compactness_loss,
    descriptiveness_loss,
    euclidean_distance_loss,
    pairwise_distance,
    triplet_loss,
)


@pytest.fixture
def emb12():
    rng = np.random.default_rng(0)
    return rng.normal(size=(12, 160)).astype(np.float32)


def test_pairwise_distance_matches_torch(emb12):
    a, b = emb12[:4], emb12[4:8]
    ours = np.asarray(pairwise_distance(jnp.array(a), jnp.array(b)))
    theirs = F.pairwise_distance(torch.tensor(a), torch.tensor(b), p=2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_compactness_matches_loop_oracle(emb12):
    # oracle: literal leave-one-out loop per the reference docstring
    t = torch.tensor(emb12[:6])
    dists = []
    for i in range(6):
        others = torch.cat([t[:i], t[i + 1:]], dim=0).mean(0, keepdim=True)
        dists.append(F.pairwise_distance(t[i:i + 1], others, p=2))
    oracle = torch.cat(dists).mean().item()

    ours = float(compactness_loss(jnp.array(emb12)))
    assert ours == pytest.approx(oracle, rel=1e-6)


def test_descriptiveness_matches_torch_ce(emb12):
    logits = emb12[:, :2]
    labels = np.array([0] * 6 + [1] * 6)
    oracle = (
        F.cross_entropy(torch.tensor(logits), torch.tensor(labels),
                        reduction="none").sum() / 12
    ).item()
    ours = float(descriptiveness_loss(jnp.array(logits), jnp.array(labels)))
    assert ours == pytest.approx(oracle, rel=1e-4)


def test_triplet_matches_torch(emb12):
    t = torch.tensor(emb12[:3])
    d_bb = F.pairwise_distance(t[0:1], t[1:2], p=2)
    d_bs = F.pairwise_distance(t[0:1], t[2:3], p=2)
    oracle = F.relu(d_bb - d_bs + 9.0).item()
    ours = float(triplet_loss(jnp.array(emb12[:3])))
    assert ours == pytest.approx(oracle, rel=1e-6)


def test_euclidean_pairs_matches_torch(emb12):
    t = torch.tensor(emb12)
    pairs = [(0, 1), (0, 2), (0, 3), (2, 1), (2, 3)]
    oracle = sum(
        F.pairwise_distance(t[i:i + 1], t[j:j + 1], p=2) for i, j in pairs
    ).item() / len(pairs)
    ours = float(euclidean_distance_loss(jnp.array(emb12)))
    assert ours == pytest.approx(oracle, rel=1e-6)


def test_angle_loss_annealing_and_value():
    rng = np.random.default_rng(3)
    cos_theta = rng.uniform(-1, 1, size=(8, 2)).astype(np.float32)
    psi_theta = rng.uniform(-4, 1, size=(8, 2)).astype(np.float32)
    target = rng.integers(0, 2, size=(8,))

    state = AngleLossState.create()
    loss, state = angle_loss(
        (jnp.array(cos_theta), jnp.array(psi_theta)), jnp.array(target), state
    )
    assert int(state.it) == 1

    # oracle with it=1: lamb = max(5, 1500/1.1)
    lamb = max(5.0, 1500.0 / (1 + 0.1 * 1))
    out = torch.tensor(cos_theta).clone()
    idx = torch.zeros_like(out, dtype=torch.bool)
    idx.scatter_(1, torch.tensor(target).view(-1, 1), True)
    ct = torch.tensor(cos_theta)
    pt_ = torch.tensor(psi_theta)
    out[idx] -= ct[idx] / (1 + lamb)
    out[idx] += pt_[idx] / (1 + lamb)
    logpt = F.log_softmax(out, dim=1).gather(
        1, torch.tensor(target).view(-1, 1)
    ).view(-1)
    oracle = (-logpt).mean().item()  # gamma=0 -> plain mean NLL
    assert float(loss) == pytest.approx(oracle, rel=1e-5)
