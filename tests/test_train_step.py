"""Train-step unit tests: loss weights, on-device RawBoost, group loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from occm_tpu.config import (
    AASISTConfig,
    RawBoostConfig,
    TrainConfig,
    XLSRConfig,
)
from occm_tpu.losses import compactness_loss, descriptiveness_loss
from occm_tpu.models import AModel
from occm_tpu.train.loop import group_one_class_loss, make_train_step
from occm_tpu.train.state import create_train_state

pytestmark = pytest.mark.slow

CUT = 3200


def _setup(cfg):
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, rng, jnp.zeros((12, CUT), jnp.float32), optax.adam(1e-4)
    )
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(12, CUT)).astype(np.float32)
        * 0.1
    )
    labels = jnp.asarray(np.array([0] * 6 + [1] * 6, np.int32))
    return model, state, x, labels


def test_group_one_class_loss_matches_single_group():
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(12, 160)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(12, 2)).astype(np.float32))
    labels = jnp.asarray(np.array([0] * 6 + [1] * 6, np.int32))
    loss, (c, d) = group_one_class_loss(emb, logits, labels, 0.1, 0.9)
    assert float(c) == pytest.approx(float(compactness_loss(emb)), rel=1e-6)
    assert float(d) == pytest.approx(
        float(descriptiveness_loss(logits, labels)), rel=1e-6
    )
    assert float(loss) == pytest.approx(0.1 * float(c) + 0.9 * float(d),
                                        rel=1e-6)

    # two identical groups -> identical per-group means
    emb2 = jnp.concatenate([emb, emb])
    logits2 = jnp.concatenate([logits, logits])
    labels2 = jnp.concatenate([labels, labels])
    loss2, (c2, d2) = group_one_class_loss(emb2, logits2, labels2, 0.1, 0.9)
    assert float(loss2) == pytest.approx(float(loss), rel=1e-6)


def test_train_step_descriptiveness_only_ignores_compactness_grad():
    # shipped config: 0.0*compactness (reference: oc_training.py:380) — the
    # step must still run and report closs without it entering the gradient
    cfg = TrainConfig(
        compactness_weight=0.0, descriptiveness_weight=1.0, cut=CUT,
        rawboost=RawBoostConfig(algo=0),
    )
    model, state, x, labels = _setup(cfg)
    step = make_train_step(cfg, output_kind="dual")
    new_state, metrics = step(state, (x, labels), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["closs"]) > 0  # reported
    assert int(new_state.step) == 1


def test_train_step_with_on_device_rawboost():
    cfg = TrainConfig(
        compactness_weight=0.1, descriptiveness_weight=0.9, cut=CUT,
        rawboost=RawBoostConfig(algo=2),  # ISD: cheap to compile
    )
    model, state, x, labels = _setup(cfg)
    step_rb = make_train_step(cfg, apply_rawboost=True, output_kind="dual")
    step_plain = make_train_step(cfg, apply_rawboost=False,
                                 output_kind="dual")

    s1, m1 = step_rb(state, (x, labels), jax.random.PRNGKey(1))
    state2 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((12, CUT), jnp.float32),
        optax.adam(1e-4),
    )
    s2, m2 = step_plain(state2, (x, labels), jax.random.PRNGKey(1))
    # augmentation changes the loss for identical init/batch/rng
    assert float(m1["loss"]) != pytest.approx(float(m2["loss"]), rel=1e-6)
    assert np.isfinite(float(m1["loss"]))


def test_train_step_angle_head():
    from occm_tpu.models.combined import SSLLCNN

    cfg = TrainConfig(
        descriptiveness_weight=1.0, cut=CUT, rawboost=RawBoostConfig(algo=0),
    )
    model = SSLLCNN(xlsr_cfg=XLSRConfig.tiny(), asoftmax=True)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, rng, jnp.zeros((12, CUT), jnp.float32), optax.adam(1e-4)
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(12, CUT)).astype(np.float32)
        * 0.1
    )
    labels = jnp.asarray(np.array([0] * 6 + [1] * 6, np.int32))
    step = make_train_step(cfg, output_kind="angle")
    new_state, metrics = step(state, (x, labels), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_train_step_occm_dual_branch():
    """--model occm trains: compactness on the SE-ResNet embedding,
    descriptiveness averaged over both heads (VERDICT r1 #7)."""
    from occm_tpu.models.combined import OCCM

    cfg = TrainConfig(
        compactness_weight=0.1, descriptiveness_weight=0.9, cut=CUT,
        rawboost=RawBoostConfig(algo=0),
    )
    model = OCCM(xlsr_cfg=XLSRConfig.tiny())
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, rng, jnp.zeros((12, CUT), jnp.float32), optax.adam(1e-4)
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(12, CUT)).astype(np.float32)
        * 0.1
    )
    labels = jnp.asarray(np.array([0] * 6 + [1] * 6, np.int32))
    before = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    step = make_train_step(cfg, output_kind="occm")
    new_state, metrics = step(state, (x, labels), jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["closs"]) > 0
    assert float(metrics["dloss"]) > 0
    assert int(new_state.step) == 1
    # params actually moved
    after = np.asarray(jax.tree_util.tree_leaves(new_state.params)[0])
    assert not np.allclose(before, after)


def test_multi_step_matches_sequential_single_steps():
    from occm_tpu.train.loop import make_multi_step

    cfg = TrainConfig(
        compactness_weight=0.1, descriptiveness_weight=0.9, cut=CUT,
        rawboost=RawBoostConfig(algo=0),
    )
    model, state, x, labels = _setup(cfg)
    k = 2
    rng = jax.random.PRNGKey(7)
    xs = jnp.stack([x, x * 0.9])
    ls = jnp.stack([labels, labels])

    ms = make_multi_step(cfg, k, output_kind="dual")
    state_chunk, metrics = ms(state, (xs, ls), rng)
    assert int(state_chunk.step) == k
    assert np.isfinite(float(metrics["loss"]))

    # sequential reference with the same rng folding as the scan body
    state_seq = _setup(cfg)[1]
    step = make_train_step(cfg, output_kind="dual")
    r = rng
    for i in range(k):
        r, sr = jax.random.split(r)
        state_seq, m = step(state_seq, (xs[i], ls[i]), sr)
    # scanned vs separately-jitted steps differ only by fp32 fusion
    # reordering; params must agree to ~1e-4 after two Adam steps
    a = np.asarray(jax.tree_util.tree_leaves(state_chunk.params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(state_seq.params)[0])
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=1e-2)
    assert np.isfinite(float(m["loss"]))


def test_multi_dispatch_flushes_ragged_tail():
    """With steps_per_dispatch=2 and 3 batches in the epoch, the trailing
    batch must still be trained on (VERDICT r1 item 8) -> step == 3."""
    from occm_tpu.config import MeshConfig
    from occm_tpu.parallel import make_mesh
    from occm_tpu.train.loop import train

    class FakePipeline:
        def epoch(self, epoch):
            gen = np.random.default_rng(epoch)
            for _ in range(3):
                x = gen.normal(size=(12, CUT)).astype(np.float32) * 0.1
                labels = np.array([0] * 6 + [1] * 6, np.int32)
                yield x, labels

    cfg = TrainConfig(
        lr=1e-4, cut=CUT, groups_per_step=1, steps_per_dispatch=2,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0), mesh=MeshConfig(dp=1, tp=1),
        log_every=100,
    )
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:1])
    state = train(model, FakePipeline(), cfg, mesh=mesh, num_epochs=1,
                  sample_input=jnp.zeros((12, CUT), jnp.float32))
    assert int(state.step) == 3


def test_chunk_batches_preserves_data_order():
    """A ragged batch arriving while full batches are buffered must flush
    the buffer FIRST: optimizer updates stay in data order (reference
    steps strictly per meta-batch)."""
    from occm_tpu.train.loop import chunk_batches

    full = 12

    def stream(sizes):
        for i, n in enumerate(sizes):
            x = np.full((n, 4), i, np.float32)
            yield x, np.zeros((n,), np.int32)

    # 3 full + ragged + 2 full with k=2:
    #   chunk(0,1) -> single(2) -> single(ragged 3) -> chunk(4,5)
    out = list(chunk_batches(stream([12, 12, 12, 7, 12, 12]), full, 2))
    kinds = [k for k, _, _ in out]
    assert kinds == ["chunk", "single", "single", "chunk"]
    order = []
    for kind, x, _ in out:
        if kind == "chunk":
            order.extend(int(x[j, 0, 0]) for j in range(x.shape[0]))
        else:
            order.append(int(x[0, 0]))
    assert order == [0, 1, 2, 3, 4, 5]
    # the ragged one is the 7-row batch
    assert out[2][1].shape[0] == 7


def test_weighted_group_loss_equals_plain_over_real_groups():
    """The 0/1 weight mask (multi-host ragged-tail padding) must make the
    weighted means equal the plain means over the weight-1 groups only."""
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.normal(size=(24, 160)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(24, 2)).astype(np.float32))
    labels = jnp.asarray(np.tile(np.array([0] * 6 + [1] * 6, np.int32), 2))
    w = jnp.asarray(np.array([1.0] * 12 + [0.0] * 12, np.float32))

    loss_w, (c_w, d_w) = group_one_class_loss(
        emb, logits, labels, 0.1, 0.9, weights=w
    )
    loss_1, (c_1, d_1) = group_one_class_loss(
        emb[:12], logits[:12], labels[:12], 0.1, 0.9
    )
    assert float(c_w) == pytest.approx(float(c_1), rel=1e-6)
    assert float(d_w) == pytest.approx(float(d_1), rel=1e-6)
    assert float(loss_w) == pytest.approx(float(loss_1), rel=1e-6)

    # all-ones weights == no weights
    ones = jnp.ones((24,), jnp.float32)
    loss_o, _ = group_one_class_loss(emb, logits, labels, 0.1, 0.9,
                                     weights=ones)
    loss_p, _ = group_one_class_loss(emb, logits, labels, 0.1, 0.9)
    assert float(loss_o) == pytest.approx(float(loss_p), rel=1e-6)


def test_padded_tail_step_equals_ragged_step_without_bn():
    """A repeat-padded + zero-weighted tail batch must produce the exact
    same update as the plain ragged batch for a BatchNorm-free model (for
    BN models the running stats see the repeated samples — the documented
    multi-host deviation in DESIGN.md)."""
    import flax.linen as nn

    from occm_tpu.models import XLSREncoder

    xcfg = XLSRConfig.tiny()

    class DualHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = XLSREncoder(xcfg, name="ssl")(x, train=train)
            pooled = jnp.mean(feats, axis=1)
            emb = nn.Dense(16, name="emb")(pooled)
            return emb, nn.Dense(2, name="head")(emb)

    cfg = TrainConfig(
        lr=1e-3, cut=CUT, compactness_weight=0.1,
        descriptiveness_weight=0.9, rawboost=RawBoostConfig(algo=0),
    )
    model = DualHead()
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(5)
    x = jnp.asarray(gen.normal(size=(12, CUT)).astype(np.float32) * 0.1)
    labels = jnp.asarray(np.array([0] * 6 + [1] * 6, np.int32))
    step = make_train_step(cfg, output_kind="dual")

    # ragged single-group batch
    state_a = create_train_state(model, rng, x, optax.adam(cfg.lr))
    state_a, m_a = step(state_a, (x, labels), jax.random.PRNGKey(2))

    # repeat-padded to two groups, second group zero-weighted
    x_pad = jnp.concatenate([x, x])
    lab_pad = jnp.concatenate([labels, labels])
    w = jnp.asarray(np.array([1.0] * 12 + [0.0] * 12, np.float32))
    state_b = create_train_state(model, rng, x, optax.adam(cfg.lr))
    state_b, m_b = step(state_b, (x_pad, lab_pad, w), jax.random.PRNGKey(2))

    assert float(m_b["loss"]) == pytest.approx(float(m_a["loss"]), rel=1e-5)
    for la, lb in zip(jax.tree_util.tree_leaves(state_a.params),
                      jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   rtol=1e-4, atol=1e-6)
