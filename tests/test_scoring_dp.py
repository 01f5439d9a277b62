"""Data-parallel scoring over a ("dp",) mesh.

The reference wraps the inference model in torch.nn.DataParallel so eval
batches scatter over every local GPU (reference: oc_classifier.py:343).
The TPU-native equivalent is a 1-axis jax.sharding.Mesh over the local
chips with the batch axis of every bucket executable sharded over it
(occm_tpu/classify/scoring.py::make_dp_mesh / BucketedEmbedder(mesh=...),
occm_tpu/serve.py::ScoringService(mesh=...)).

These tests run on the conftest-forced 8-device virtual CPU mesh and
assert the sharded path returns the same embeddings/scores as the
single-device path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from occm_tpu.classify import BucketedEmbedder, make_dp_mesh
from occm_tpu.serve import ScoringService, aot_compile


class _TinyEmbed(nn.Module):
    """Frame-mean -> Dense head; stands in for the real scorer so the
    sharding semantics compile in milliseconds."""
    dim: int = 16

    @nn.compact
    def __call__(self, x, train=False):
        # [B, T] -> [B, T//100, 100]: Dense over the fixed 100-sample
        # frame axis, mean over the length-dependent frame count
        b, t = x.shape
        frames = x.reshape(b, t // 100, 100)
        h = nn.Dense(32)(jnp.tanh(frames))
        emb = nn.Dense(self.dim)(jnp.tanh(h.mean(axis=1)))
        logits = nn.Dense(2)(emb)
        return emb, logits


def _make_embed_fn():
    model = _TinyEmbed()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 800), jnp.float32))

    def embed_fn(x):
        return model.apply(params, x)

    return embed_fn


def _waves(n=13, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.normal(size=rng.integers(300, 1500)).astype(np.float32)
            for _ in range(n)]


def test_make_dp_mesh_sizes():
    assert make_dp_mesh().devices.size == len(jax.devices())
    assert make_dp_mesh(2).devices.size == 2
    with pytest.raises(ValueError):
        make_dp_mesh(len(jax.devices()) + 1)


def test_embedder_dp_matches_single_device():
    embed_fn = _make_embed_fn()
    waves = _waves()
    single = BucketedEmbedder(embed_fn, bucket_step=800, batch_size=8)
    dp = BucketedEmbedder(embed_fn, bucket_step=800, batch_size=8,
                          mesh=make_dp_mesh(8))
    e1, l1 = single.embed_all(waves)
    e2, l2 = dp.embed_all(waves)
    np.testing.assert_allclose(e1, e2, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(l1, l2, rtol=1e-6, atol=1e-6)


def test_embedder_dp_rounds_batch_up():
    emb = BucketedEmbedder(_make_embed_fn(), bucket_step=800,
                           batch_size=5, mesh=make_dp_mesh(4))
    assert emb.batch_size == 8  # next multiple of 4 >= 5
    # and it still embeds correctly with the padded batch
    waves = _waves(3, seed=1)
    e, lg = emb.embed_all(waves)
    assert e.shape[0] == 3 and lg.shape[0] == 3


def test_embedder_rejects_multi_axis_mesh():
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    with pytest.raises(ValueError):
        BucketedEmbedder(_make_embed_fn(),
                         mesh=Mesh(devs, ("a", "b")))


def test_scoring_service_dp_matches_single_device():
    embed_fn = _make_embed_fn()
    reference = np.linspace(-1, 1, 16).astype(np.float32)
    waves = _waves(9, seed=2)

    single = ScoringService(embed_fn, reference, threshold=0.5,
                            buckets=(800, 1600), batch=8)
    dp = ScoringService(embed_fn, reference, threshold=0.5,
                        buckets=(800, 1600), batch=8, mesh=make_dp_mesh(8))
    s1, p1 = single.score(waves)
    s2, p2 = dp.score(waves)
    np.testing.assert_allclose(s1, s2, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(p1, p2)


def test_scoring_service_dp_rounds_batch_up():
    svc = ScoringService(_make_embed_fn(), np.zeros(16, np.float32),
                         threshold=0.5, buckets=(800,), batch=3,
                         mesh=make_dp_mesh(8))
    assert svc.batch == 8


def test_aot_compile_dp_executable_shards_batch():
    embed_fn = _make_embed_fn()
    mesh = make_dp_mesh(8)
    exe = aot_compile(embed_fn, batch=8, length=800, mesh=mesh)
    x = np.random.default_rng(3).normal(size=(8, 800)).astype(np.float32)
    emb, logits = exe(x)
    # output really is sharded over the mesh
    assert len(emb.sharding.device_set) == 8
    ref_emb, ref_logits = jax.jit(embed_fn)(x)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref_emb),
                               rtol=1e-6, atol=1e-6)
