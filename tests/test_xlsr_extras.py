"""XLSR fine-tuning knobs: feature_grad_mult (fairseq GradMultiply)."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from occm_tpu.config import XLSRConfig
from occm_tpu.models import XLSREncoder


def _grads(cfg, wave):
    model = XLSREncoder(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        wave,
    )["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, wave) ** 2)

    return params, jax.grad(loss)(params)


def test_feature_grad_mult_zero_freezes_conv_stack():
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 3200)).astype(np.float32)
    )
    cfg = dataclasses.replace(XLSRConfig.tiny(), feature_grad_mult=0.0)
    _, grads = _grads(cfg, wave)
    conv_g = jax.tree_util.tree_leaves(grads["feature_extractor"])
    assert all(float(jnp.max(jnp.abs(g))) == 0.0 for g in conv_g)
    # transformer still gets gradient
    tr_g = jax.tree_util.tree_leaves(grads["layers"])
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in tr_g)


def test_feature_grad_mult_scales_conv_grads():
    wave = jnp.asarray(
        np.random.default_rng(1).normal(size=(1, 3200)).astype(np.float32)
    )
    cfg1 = XLSRConfig.tiny()
    cfg01 = dataclasses.replace(cfg1, feature_grad_mult=0.1)
    _, g_full = _grads(cfg1, wave)
    _, g_scaled = _grads(cfg01, wave)
    a = np.asarray(g_full["feature_extractor"]["conv_0"]["kernel"])
    b = np.asarray(g_scaled["feature_extractor"]["conv_0"]["kernel"])
    np.testing.assert_allclose(b, 0.1 * a, rtol=1e-3, atol=1e-6)


def test_layerdrop_zero_matches_and_training_path_runs():
    import dataclasses

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    wave = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 3200)).astype(np.float32)
    )
    cfg = dataclasses.replace(XLSRConfig.tiny(), layerdrop=0.5)
    model = XLSREncoder(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        wave,
    )
    # eval: layerdrop inactive -> deterministic
    a = model.apply(variables, wave)
    b = model.apply(variables, wave)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train: runs with per-layer rng; different keys give different outputs
    t1 = model.apply(variables, wave, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    t2 = model.apply(variables, wave, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_fused_qkv_matches_separate_projections():
    """fused_qkv concatenates the q/k/v kernels into one wide dot at apply
    time; the parameter tree (q_proj/k_proj/v_proj {kernel,bias}) and the
    math are unchanged, so outputs must agree and checkpoints stay
    interchangeable."""
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3200)).astype(np.float32)
    )
    cfg_sep = XLSRConfig.tiny()
    cfg_fused = dataclasses.replace(cfg_sep, fused_qkv=True)

    m_sep = XLSREncoder(cfg_sep)
    m_fused = XLSREncoder(cfg_fused)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}
    p_sep = m_sep.init(rngs, wave)
    p_fused = m_fused.init(rngs, wave)

    # identical parameter trees: same names, shapes, dtypes
    flat_sep = jax.tree_util.tree_flatten_with_path(p_sep)[0]
    flat_fused = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    assert [(k, v.shape, v.dtype) for k, v in flat_sep] == [
        (k, v.shape, v.dtype) for k, v in flat_fused
    ]

    # same params -> same output (one wide dot vs three narrow dots)
    y_sep = m_sep.apply(p_sep, wave)
    y_fused = m_fused.apply(p_sep, wave)
    np.testing.assert_allclose(
        np.asarray(y_sep, np.float32), np.asarray(y_fused, np.float32),
        rtol=2e-2, atol=2e-4,
    )
    rel = float(
        jnp.linalg.norm(y_sep - y_fused) / (jnp.linalg.norm(y_sep) + 1e-20)
    )
    assert rel < 2e-3, f"fused-qkv relative L2 {rel}"


def test_ffn_impl_pallas_same_tree_and_output():
    """ffn_impl="pallas" keeps the fc1/fc2 {kernel,bias} checkpoint tree
    and the same math (tiny dims route through the op's XLA fallback; the
    real kernel path is parity-tested in tests/test_ops.py and exercised
    on TPU by the bench)."""
    wave = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3200)).astype(np.float32)
    )
    cfg_xla = XLSRConfig.tiny()
    cfg_pl = dataclasses.replace(cfg_xla, ffn_impl="pallas")
    m_xla, m_pl = XLSREncoder(cfg_xla), XLSREncoder(cfg_pl)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}
    p_xla = m_xla.init(rngs, wave)
    p_pl = m_pl.init(rngs, wave)
    flat_a = jax.tree_util.tree_flatten_with_path(p_xla)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(p_pl)[0]
    assert [(k, v.shape) for k, v in flat_a] == [
        (k, v.shape) for k, v in flat_b
    ]
    y_a = m_xla.apply(p_xla, wave)
    y_b = m_pl.apply(p_xla, wave)
    np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_b),
                               rtol=2e-3, atol=2e-5)


def test_conv_remat_identical_forward_and_grad():
    """conv_remat recomputes the conv extractor in backward — identical
    math, only an HBM/FLOP trade (XLSRConfig.conv_remat)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3200)).astype(np.float32))
    outs, grads = [], []
    for remat in (False, True):
        cfg = dataclasses.replace(XLSRConfig.tiny(), conv_remat=remat)
        enc = XLSREncoder(cfg)
        p = enc.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0)}, x)
        outs.append(np.asarray(enc.apply(p, x)))
        g = jax.grad(lambda p: jnp.sum(jnp.square(enc.apply(p, x))))(p)
        grads.append(np.asarray(jax.tree_util.tree_leaves(g)[0]))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-6, atol=1e-8)


def test_remat_policies_identical_forward_and_grad():
    """Every remat policy is an HBM-vs-recompute trade only: identical
    forward and gradients (XLSRConfig.remat_policy ladder)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 3200)).astype(np.float32))
    results = {}
    for policy in ("nothing", "attn_out", "attn_out_inner", "attn_probs",
                   "attn_all"):
        cfg = dataclasses.replace(XLSRConfig.tiny(), remat_policy=policy)
        enc = XLSREncoder(cfg)
        p = enc.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0)}, x)
        out = np.asarray(enc.apply(p, x))
        g = jax.grad(lambda p: jnp.sum(jnp.square(enc.apply(p, x))))(p)
        results[policy] = (out, np.asarray(jax.tree_util.tree_leaves(g)[0]))
    ref_out, ref_g = results["nothing"]
    for policy, (out, g) in results.items():
        np.testing.assert_allclose(ref_out, out, rtol=1e-6, atol=1e-7,
                                   err_msg=policy)
        np.testing.assert_allclose(ref_g, g, rtol=1e-5, atol=1e-7,
                                   err_msg=policy)


def test_attention_layouts_identical():
    """attention_impl in {"xla_merged", "packed", "packed4", "pad128"} are
    layout-only changes: xla_merged flattens (B,H) into one batch dim;
    packed/packedN compute each g-head GROUP's scores/PV in one
    block-diagonal full-depth dot (tools/exp_packed_attention.py); pad128
    pads T to a multiple of 128 with masked keys
    (tools/repro_attn_bwd.py). Same math as "xla" in all cases."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 3200)).astype(np.float32))
    results = {}
    for impl in ("xla", "xla_merged", "packed", "packed4", "pad128"):
        cfg = dataclasses.replace(XLSRConfig.tiny(), attention_impl=impl)
        enc = XLSREncoder(cfg)
        p = enc.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0)}, x)
        out = np.asarray(enc.apply(p, x))
        g = jax.grad(lambda p: jnp.sum(jnp.square(enc.apply(p, x))))(p)
        results[impl] = (out, np.asarray(jax.tree_util.tree_leaves(g)[0]))
    # layout-only change, but a different contraction layout reassociates
    # the fp accumulation — tolerances cover reassociation, not math drift
    for impl in ("xla_merged", "packed", "packed4", "pad128"):
        np.testing.assert_allclose(results["xla"][0], results[impl][0],
                                   rtol=1e-4, atol=1e-5, err_msg=impl)
        np.testing.assert_allclose(results["xla"][1], results[impl][1],
                                   rtol=1e-4, atol=1e-5, err_msg=impl)


def test_packed8_attention_parity():
    """packed8 needs num_heads % 8 == 0 (tiny has 4): run the g=8 edge at
    an 8-head variant of tiny, and check the invalid-width error path."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(2, 3200)).astype(np.float32))
    results = {}
    for impl in ("xla", "packed8"):
        cfg = dataclasses.replace(
            XLSRConfig.tiny(), encoder_heads=8, attention_impl=impl)
        enc = XLSREncoder(cfg)
        p = enc.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0)}, x)
        results[impl] = np.asarray(enc.apply(p, x))
    np.testing.assert_allclose(results["xla"], results["packed8"],
                               rtol=1e-4, atol=1e-5)

    bad = dataclasses.replace(XLSRConfig.tiny(), attention_impl="packed8")
    enc = XLSREncoder(bad)  # tiny has 4 heads: 8 does not divide 4
    with pytest.raises(ValueError, match="pack width"):
        enc.init({"params": jax.random.PRNGKey(0),
                  "dropout": jax.random.PRNGKey(0)}, x)


def test_impl_knobs_validated_at_config():
    """Impl knobs are validated at construction (r4 verdict weak #5:
    attention_impl="skip" — V passed through untouched — was accepted by
    every entry point, enforced only by a comment; typos fell through to
    the plain xla path silently)."""
    import dataclasses

    import pytest

    from occm_tpu.config import XLSRConfig

    with pytest.raises(ValueError, match="allow_debug_impls"):
        dataclasses.replace(XLSRConfig.tiny(), attention_impl="skip")
    # the A/B escape hatch still works
    cfg = dataclasses.replace(XLSRConfig.tiny(), attention_impl="skip",
                              allow_debug_impls=True)
    assert cfg.attention_impl == "skip"
    with pytest.raises(ValueError, match="unknown attention_impl"):
        dataclasses.replace(XLSRConfig.tiny(), attention_impl="falsh")
    with pytest.raises(ValueError, match="unknown attention_impl"):
        dataclasses.replace(XLSRConfig.tiny(), attention_impl="packedX")
    with pytest.raises(ValueError, match="unknown ffn_impl"):
        dataclasses.replace(XLSRConfig.tiny(), ffn_impl="fused")
    with pytest.raises(ValueError, match="unknown remat_policy"):
        dataclasses.replace(XLSRConfig.tiny(), remat_policy="everything")
    with pytest.raises(ValueError, match="unknown dtype"):
        dataclasses.replace(XLSRConfig.tiny(), dtype="float16")


def test_pos_conv_impls_identical():
    """pos_conv_impl in {grouped, batched, s2d} is a layout-only change:
    same checkpoint tree, same forward and gradients (ops/pos_conv.py)."""
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3200)).astype(np.float32))
    results = {}
    trees = {}
    for impl in ("grouped", "batched", "s2d"):
        cfg = dataclasses.replace(XLSRConfig.tiny(), pos_conv_impl=impl)
        enc = XLSREncoder(cfg)
        p = enc.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(0)}, x)
        out = np.asarray(enc.apply(p, x))
        g = jax.grad(lambda p: jnp.sum(jnp.square(enc.apply(p, x))))(p)
        results[impl] = (out, np.asarray(
            g["params"]["pos_conv"]["kernel"]))
        trees[impl] = jax.tree_util.tree_structure(p)
    assert trees["grouped"] == trees["batched"] == trees["s2d"]
    for impl in ("batched", "s2d"):
        # layout-only: tolerances cover fp reassociation of the contraction
        np.testing.assert_allclose(results["grouped"][0], results[impl][0],
                                   rtol=1e-4, atol=1e-5)
        # the kernel grad accumulates the whole backward in a different
        # association order; wrong MATH would show O(1) relative errors
        np.testing.assert_allclose(results["grouped"][1], results[impl][1],
                                   rtol=1e-3, atol=1e-4)


def test_dropout_sites_all_fire_and_are_distinct():
    """fairseq wav2vec2 has five distinct dropout sites, all live during
    reference training (models/sslassist.py:24-48 runs the SSL frontend in
    train mode; r4 verdict missing #4): residual `dropout`, attention-probs
    `attention_dropout`, post-GELU `activation_dropout`, encoder-input
    `dropout_input`. For each site: (a) the rng actually fires under
    nn.scan (same params, different dropout rngs -> different outputs),
    (b) the sites are distinguishable (two different single-site configs
    with the SAME rng differ from each other and from the no-dropout
    run)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 3200)).astype(np.float32))
    base = XLSRConfig.tiny()
    enc0 = XLSREncoder(base)
    variables = enc0.init({"params": jax.random.PRNGKey(0),
                           "dropout": jax.random.PRNGKey(0)}, x)
    clean = np.asarray(enc0.apply(variables, x, train=True,
                                  rngs={"dropout": jax.random.PRNGKey(1)}))

    outs = {}
    for field in ("dropout", "attention_dropout", "activation_dropout",
                  "dropout_input"):
        cfg = dataclasses.replace(base, **{field: 0.5})
        enc = XLSREncoder(cfg)
        a = np.asarray(enc.apply(variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(1)}))
        b = np.asarray(enc.apply(variables, x, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(2)}))
        assert not np.allclose(a, b), f"{field}: rng does not fire"
        assert not np.allclose(a, clean), f"{field}: site is a no-op"
        # eval mode (train=False) must be deterministic and rate-free
        e = np.asarray(enc.apply(variables, x))
        np.testing.assert_allclose(
            e, np.asarray(enc0.apply(variables, x)), atol=0,
            err_msg=f"{field}: leaks into eval mode")
        outs[field] = a
    # distinguishable: same rng, different single-site configs differ
    fields = list(outs)
    for i in range(len(fields)):
        for j in range(i + 1, len(fields)):
            assert not np.allclose(outs[fields[i]], outs[fields[j]]), (
                f"{fields[i]} and {fields[j]} apply at the same site")


def test_dropout_incompatible_impls_raise():
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models import XLSREncoder

    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 3200)).astype(np.float32))
    base = XLSRConfig.tiny()
    variables = XLSREncoder(base).init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(0)}, x)

    flash = XLSREncoder(dataclasses.replace(
        base, attention_impl="flash", attention_dropout=0.1))
    with pytest.raises(ValueError, match="flash"):
        flash.apply(variables, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})

    pallas_ffn = XLSREncoder(dataclasses.replace(
        base, ffn_impl="pallas", activation_dropout=0.1))
    with pytest.raises(ValueError, match="activation_dropout"):
        pallas_ffn.apply(variables, x, train=True,
                         rngs={"dropout": jax.random.PRNGKey(1)})


def test_converter_reads_fairseq_dropout_rates():
    """convert_xlsr reads the live dropout rates out of the fairseq
    checkpoint wrapper (both the modern cfg.model and legacy args
    layouts) so a reference-matching fine-tune can reproduce the
    train-mode SSL regularization."""
    import argparse

    from occm_tpu.models.convert_xlsr import read_fairseq_dropout_rates

    modern = {"cfg": {"model": {
        "dropout": 0.1, "attention_dropout": 0.05,
        "activation_dropout": 0.0, "dropout_input": 0.1,
        "encoder_layerdrop": 0.05,
    }}, "model": {}}
    rates = read_fairseq_dropout_rates(modern)
    assert rates == {"dropout": 0.1, "attention_dropout": 0.05,
                     "activation_dropout": 0.0, "dropout_input": 0.1,
                     "layerdrop": 0.05}

    legacy = {"args": argparse.Namespace(
        dropout=0.2, attention_dropout=0.1, activation_dropout=0.05,
        dropout_input=0.0, encoder_layerdrop=0.0), "model": {}}
    rates = read_fairseq_dropout_rates(legacy)
    assert rates == {"dropout": 0.2, "attention_dropout": 0.1,
                     "activation_dropout": 0.05, "dropout_input": 0.0,
                     "layerdrop": 0.0}

    assert read_fairseq_dropout_rates({"model": {}}) is None
