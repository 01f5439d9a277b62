"""Per-bucket attention-impl auto-selection (r4 verdict item 1).

The switching MACHINERY must not change results: an embedder whose
factory picks impl X for a bucket produces byte-identical outputs to a
plain fixed-impl-X embedder for the utterances of that bucket. (Impl
equivalence itself — xla vs packed vs flash numerics — is covered by
tests/test_attention.py and tests/test_xlsr_extras.py at tolerance;
bucketing plumbing must add exactly nothing on top.)
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.classify import BucketedEmbedder
from occm_tpu.classify.impl_select import (
    AUTO_FLASH_MIN_SAMPLES,
    select_attention_impl,
)
from occm_tpu.config import XLSRConfig
from occm_tpu.models import XLSREncoder


def test_policy():
    assert select_attention_impl(64600, "auto") == "xla"
    assert select_attention_impl(AUTO_FLASH_MIN_SAMPLES, "auto") == "flash"
    assert select_attention_impl(40 * 16000, "auto") == "flash"
    # fast numerics (bf16 softmax): xla wins every bucket (measured
    # fast+int8 sweep, DESIGN.md) — auto must resolve to xla throughout
    for n in (64600, AUTO_FLASH_MIN_SAMPLES, 40 * 16000):
        assert select_attention_impl(n, "auto",
                                     norm_dtype="bfloat16") == "xla"
    # explicit impls pass through for every length and numerics
    for impl in ("xla", "packed4", "flash"):
        assert select_attention_impl(64600, impl) == impl
        assert select_attention_impl(10 ** 6, impl,
                                     norm_dtype="bfloat16") == impl


def _embed_fn_for(impl: str):
    cfg = dataclasses.replace(XLSRConfig.tiny(), attention_impl=impl)
    enc = XLSREncoder(cfg)
    params = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 3200), jnp.float32),
    )

    def fn(x):
        h = enc.apply(params, x)
        return jnp.mean(h, axis=1), jnp.sum(h, axis=(1, 2))[:, None]

    return fn


@pytest.fixture(scope="module")
def waves():
    rng = np.random.default_rng(5)
    # two buckets at bucket_step=3200: short (<=3200) and long (<=6400)
    return [
        (0.2 * rng.normal(size=n)).astype(np.float32)
        for n in (1800, 3200, 4000, 6000, 2500, 5500)
    ]


def test_factory_constant_impl_is_byte_identical(waves):
    plain = BucketedEmbedder(_embed_fn_for("xla"), bucket_step=3200,
                             batch_size=2)
    via_factory = BucketedEmbedder(
        embed_fn_factory=lambda blen: _embed_fn_for("xla"),
        bucket_step=3200, batch_size=2)
    e1, l1 = plain.embed_all(waves)
    e2, l2 = via_factory.embed_all(waves)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(l1, l2)


def test_factory_per_bucket_switch_matches_fixed_impl_per_bucket(waves):
    """Bucket <=3200 runs xla, bucket 6400 runs xla_merged: each
    utterance's output must be byte-identical to the fixed-impl embedder
    of ITS bucket's impl."""
    def pick(blen):
        return "xla" if blen <= 3200 else "xla_merged"

    switching = BucketedEmbedder(
        embed_fn_factory=lambda blen: _embed_fn_for(pick(blen)),
        bucket_step=3200, batch_size=2)
    e_sw, _ = switching.embed_all(waves)

    for impl in ("xla", "xla_merged"):
        fixed = BucketedEmbedder(_embed_fn_for(impl), bucket_step=3200,
                                 batch_size=2)
        e_fx, _ = fixed.embed_all(waves)
        for i, w in enumerate(waves):
            blen = 3200 if len(w) <= 3200 else 6400
            if pick(blen) == impl:
                np.testing.assert_array_equal(
                    e_sw[i], e_fx[i],
                    err_msg=f"utt {i} (bucket {blen}, impl {impl})")


def test_embedder_rejects_both_or_neither():
    with pytest.raises(ValueError, match="exactly one"):
        BucketedEmbedder()
    with pytest.raises(ValueError, match="exactly one"):
        BucketedEmbedder(_embed_fn_for("xla"),
                         embed_fn_factory=lambda b: _embed_fn_for("xla"))


def test_scoring_service_factory_matches_plain():
    from occm_tpu.serve import ScoringService

    fn = _embed_fn_for("xla")
    rng = np.random.default_rng(6)
    waves = [(0.2 * rng.normal(size=n)).astype(np.float32)
             for n in (1500, 3000, 5000)]
    ref = np.zeros(64, np.float32)
    plain = ScoringService(fn, ref, 1.0, buckets=(3200, 6400), batch=2)
    via = ScoringService(score_fn_factory=lambda b: fn,
                         reference_embedding=ref, threshold=1.0,
                         buckets=(3200, 6400), batch=2)
    s1, p1 = plain.score(waves)
    s2, p2 = via.score(waves)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(p1, p2)


def test_variables_as_args_byte_identical():
    """BucketedEmbedder(variables=...) passes the weight tree as a jit
    ARGUMENT instead of a closure capture (closure-baked 300M constants
    serialize into the program and break remote-compile transports —
    hit for real by the scoring CLI through the TPU tunnel). Results
    must be byte-identical to the closure path, with and without a dp
    mesh."""
    from occm_tpu.classify import make_dp_mesh

    enc = XLSREncoder(XLSRConfig.tiny())
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 3200), jnp.float32),
    )

    def fn_closure(x):
        h = enc.apply(variables, x)
        return jnp.mean(h, axis=1), jnp.sum(h, axis=(1, 2))[:, None]

    def fn_args(v, x):
        h = enc.apply(v, x)
        return jnp.mean(h, axis=1), jnp.sum(h, axis=(1, 2))[:, None]

    rng = np.random.default_rng(8)
    waves = [(0.2 * rng.normal(size=n)).astype(np.float32)
             for n in (1500, 3200, 5000, 2800)]

    plain = BucketedEmbedder(fn_closure, bucket_step=3200, batch_size=2)
    via_vars = BucketedEmbedder(fn_args, bucket_step=3200, batch_size=2,
                                variables=variables)
    e1, l1 = plain.embed_all(waves)
    e2, l2 = via_vars.embed_all(waves)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(l1, l2)

    # dp mesh: same batch size so the program shape matches; fp-level
    # tolerance like tests/test_scoring_dp.py (the partitioner's fusion
    # choices differ from the single-device program)
    plain8 = BucketedEmbedder(fn_closure, bucket_step=3200, batch_size=8)
    e8, _ = plain8.embed_all(waves)
    mesh = make_dp_mesh()
    dp = BucketedEmbedder(fn_args, bucket_step=3200, batch_size=8,
                          mesh=mesh, variables=variables)
    e3, _ = dp.embed_all(waves)
    np.testing.assert_allclose(e8, e3, rtol=1e-6, atol=1e-6)


def test_scoring_service_variables_as_args():
    from occm_tpu.serve import ScoringService

    enc = XLSREncoder(XLSRConfig.tiny())
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 3200), jnp.float32),
    )

    def fn_closure(x):
        h = enc.apply(variables, x)
        return jnp.mean(h, axis=1), jnp.sum(h, axis=(1, 2))[:, None]

    def fn_args(v, x):
        h = enc.apply(v, x)
        return jnp.mean(h, axis=1), jnp.sum(h, axis=(1, 2))[:, None]

    rng = np.random.default_rng(9)
    waves = [(0.2 * rng.normal(size=n)).astype(np.float32)
             for n in (1500, 3000, 5000)]
    ref = np.zeros(64, np.float32)
    plain = ScoringService(fn_closure, ref, 1.0, buckets=(3200, 6400),
                           batch=2)
    via = ScoringService(score_fn_factory=lambda b: fn_args,
                         reference_embedding=ref, threshold=1.0,
                         buckets=(3200, 6400), batch=2,
                         variables=variables)
    s1, p1 = plain.score(waves)
    s2, p2 = via.score(waves)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(p1, p2)
