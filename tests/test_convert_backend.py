"""Reference-checkpoint importer/exporter (models/convert_backend.py).

The reference ships trained models as bare torch state dicts
(``aasist_vocoded_{epoch}.pt`` — reference: oc_training.py:401;
``ssl_vocoded_*.pt``/``senet34_vocoded_*.pt`` — test_dataloader_v2.py:144-145).
These tests pin:

1. structure — import produces EXACTLY the tree ``model.init`` builds
   (params and batch_stats), so ``model.apply`` works on converted
   reference checkpoints;
2. roundtrip — export∘import is the identity (bit-exact except the
   pos_conv weight-norm refactorisation w -> (g, v) -> g*v/||v||, which
   rounds at 1-2 fp32 ulp), and the exported key set is the reference
   state dict's key set (hand-derived from the reference model
   definitions, frozen here);
3. orientation — the Linear/Conv2d transposes match torch semantics, via
   torch.nn.functional on single layers (immune to the double-transpose
   blindspot a pure roundtrip has).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.config import AASISTConfig, XLSRConfig
from occm_tpu.models import AModel, LCNN, se_resnet34
from occm_tpu.models.convert_backend import (
    convert_amodel_state_dict,
    convert_lcnn_state_dict,
    convert_model_state_dict,
    convert_senet_state_dict,
    detect_model_kind,
    export_amodel_state_dict,
    export_lcnn_state_dict,
    export_senet_state_dict,
)


def _tree_eq(a, b):
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb, f"tree structure differs:\n{ta}\nvs\n{tb}"
    for x, y in zip(la, lb):
        # 2-ulp fp32 headroom for the pos_conv weight-norm resplit
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=3e-7, atol=1e-7)


def _randomized(variables, seed=0):
    """Fill every leaf with random values so roundtrip equality is
    non-trivial (init gives zeros/ones for many leaves)."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    rng = np.random.default_rng(seed)
    out = [
        np.asarray(rng.normal(size=np.shape(l)) * 0.1 + 0.5, np.float32)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.fixture(scope="module")
def amodel_and_vars():
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    x = jnp.zeros((2, 3200), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    return model, _randomized(variables)


def test_amodel_roundtrip_and_structure(amodel_and_vars):
    model, variables = amodel_and_vars
    cfg = XLSRConfig.tiny()
    sd = export_amodel_state_dict(variables, cfg)

    # representative reference keys must exist with reference naming
    for key in (
        "ssl_model.model.encoder.layers.0.self_attn.q_proj.weight",
        "ssl_model.model.encoder.pos_conv.0.weight_g",
        "LL.weight",
        "encoder.0.0.conv1.weight",
        "encoder.2.0.conv_downsample.weight",
        "encoder.3.0.bn1.running_mean",  # dead pre-activation, emitted
        "attention.2.running_var",
        "pos_S", "master1", "master2",
        "GAT_layer_S.att_weight",
        "HtrgGAT_layer_ST21.att_weightM",
        "HtrgGAT_layer_ST12.proj_without_attM.bias",
        "pool_hT2.proj.weight",
        "out_layer.bias",
    ):
        assert key in sd, key
    # first=True block has no bn1 (reference models/sslassist.py:378-379)
    assert "encoder.0.0.bn1.weight" not in sd
    # non-downsample blocks have no conv_downsample (l.394-400)
    assert "encoder.1.0.conv_downsample.weight" not in sd

    back = convert_amodel_state_dict(sd, xlsr_cfg=cfg)
    _tree_eq(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        back,
    )


def test_amodel_import_matches_init_structure(amodel_and_vars):
    """The converted tree must be apply-able: same structure as init."""
    model, variables = amodel_and_vars
    cfg = XLSRConfig.tiny()
    sd = export_amodel_state_dict(variables, cfg)
    back = convert_amodel_state_dict(sd, xlsr_cfg=cfg)
    x = jnp.zeros((2, 3200), jnp.float32)
    emb, logits = model.apply(
        {"params": back["params"], "batch_stats": back["batch_stats"]},
        x, train=False,
    )
    emb_dim = 5 * AASISTConfig.tiny().gat_dims[1]
    assert emb.shape == (2, emb_dim) and logits.shape == (2, 2)


def test_amodel_import_accepts_dataparallel_prefix(amodel_and_vars):
    _, variables = amodel_and_vars
    cfg = XLSRConfig.tiny()
    sd = {f"module.{k}": v
          for k, v in export_amodel_state_dict(variables, cfg).items()}
    back = convert_amodel_state_dict(sd, xlsr_cfg=cfg)
    _tree_eq(variables["params"], back["params"])


def test_senet_roundtrip_and_structure():
    model = se_resnet34()
    x = jnp.zeros((2, 33, 64, 1), jnp.float32)
    variables = _randomized(model.init(jax.random.PRNGKey(0), x))
    sd = export_senet_state_dict(variables)
    for key in (
        "conv1.weight", "bn1.running_mean",
        "layer1.0.conv1.weight", "layer1.0.se.fc.0.weight",
        "layer2.0.downsample.0.weight", "layer2.0.downsample.1.running_var",
        "layer4.2.se.fc.2.weight", "embedding.bias", "classifier.weight",
    ):
        assert key in sd, key
    # stage-1 blocks don't downsample (16->16, stride 1)
    assert "layer1.0.downsample.0.weight" not in sd
    # SE bottleneck Linears are bias-free (reference models/senet.py:18-20)
    assert "layer1.0.se.fc.0.bias" not in sd

    back = convert_senet_state_dict(sd)
    _tree_eq(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        back,
    )
    com, des = model.apply(
        {"params": back["params"], "batch_stats": back["batch_stats"]},
        x, train=False,
    )
    assert com.shape == (2, 128) and des.shape == (2, 2)


def test_senet12_layers_inferred_from_checkpoint():
    from occm_tpu.models import se_resnet12

    model = se_resnet12()
    x = jnp.zeros((1, 33, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = export_senet_state_dict(variables, layers=(1, 2, 3, 1))
    back = convert_senet_state_dict(sd)  # depths inferred from keys
    _tree_eq(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        back,
    )


def test_lcnn_roundtrip_and_structure():
    model = LCNN(asoftmax=True)
    x = jnp.zeros((2, 40, 64, 1), jnp.float32)
    variables = _randomized(
        model.init({"params": jax.random.PRNGKey(0)}, x)
    )
    sd = export_lcnn_state_dict(variables)
    for key in (
        "layer1.0.filter.weight",
        "layer2.0.conv_a.filter.weight",
        "layer2.0.bn.running_mean",  # dead group.bn, emitted at defaults
        "layer2.2.weight",
        "layer3.0.conv.filter.bias",
        "fc0.0.filter.0.weight",
        "fc3.weight",
    ):
        assert key in sd, key
    assert "fc3.bias" not in sd  # AngleLinear has no bias

    back = convert_lcnn_state_dict(sd)
    _tree_eq(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        back,
    )


def test_detect_model_kind():
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    x = jnp.zeros((1, 3200), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x)
    sd = export_amodel_state_dict(v, XLSRConfig.tiny())
    assert detect_model_kind(sd) == "amodel"

    sn = se_resnet34()
    v2 = sn.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 64, 1)))
    sd2 = export_senet_state_dict(v2)
    assert detect_model_kind(sd2) == "senet"

    lc = LCNN(asoftmax=True)
    v3 = lc.init({"params": jax.random.PRNGKey(0)},
                 jnp.zeros((1, 40, 64, 1)))
    sd3 = export_lcnn_state_dict(v3)
    assert detect_model_kind(sd3) == "lcnn"

    assert detect_model_kind(
        {"model.feature_extractor.conv_layers.0.0.weight": 0}) == "ssl"
    with pytest.raises(ValueError):
        detect_model_kind({"foo.bar": 0})

    out = convert_model_state_dict(sd2)
    assert out["_kind"] == "senet"


def test_ssl_resnet34_fused_import_matches_init_structure():
    """Fused ssl_resnet34 state dict (frontend.model.* + resnet34.*,
    reference models/senet.py:162-170) -> SSLResNet34 variables."""
    from occm_tpu.models import SSLResNet34
    from occm_tpu.models.convert_backend import (
        convert_ssl_resnet34_state_dict, export_xlsr_state_dict)

    cfg = XLSRConfig.tiny()
    model = SSLResNet34(xlsr_cfg=cfg)
    x = jnp.zeros((1, 3200), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    sd = {}
    for k, v in export_xlsr_state_dict(
            variables["params"]["frontend"], cfg).items():
        sd[f"frontend.model.{k}"] = v
    for k, v in export_senet_state_dict(
            {"params": variables["params"]["resnet34"],
             "batch_stats": variables["batch_stats"]["resnet34"]}).items():
        sd[f"resnet34.{k}"] = v

    assert detect_model_kind(sd) == "ssl_resnet34"
    back = convert_ssl_resnet34_state_dict(sd, xlsr_cfg=cfg)
    _tree_eq(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        back,
    )


def test_linear_orientation_matches_torch():
    """_linear/_conv2d transposes must match torch F.linear/F.conv2d —
    a pure roundtrip can't catch a matched pair of wrong transposes."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn

    from occm_tpu.models.convert_backend import _SD, _conv2d, _linear

    rng = np.random.default_rng(0)
    w = rng.normal(size=(5, 3)).astype(np.float32)   # torch [out, in]
    b = rng.normal(size=(5,)).astype(np.float32)
    x = rng.normal(size=(2, 3)).astype(np.float32)
    want = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()
    p = _linear(_SD({"lin.weight": w, "lin.bias": b}), "lin")
    got = np.asarray(
        nn.Dense(5).apply({"params": p}, jnp.asarray(x))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # conv2d: torch NCHW/OIHW vs flax NHWC/HWIO
    wc = rng.normal(size=(4, 2, 3, 3)).astype(np.float32)  # OIHW
    bc = rng.normal(size=(4,)).astype(np.float32)
    xc = rng.normal(size=(1, 2, 8, 9)).astype(np.float32)  # NCHW
    want_c = torch.nn.functional.conv2d(
        torch.from_numpy(xc), torch.from_numpy(wc), torch.from_numpy(bc),
        padding=1,
    ).numpy()                                              # [1,4,8,9]
    pc = _conv2d(_SD({"c.weight": wc, "c.bias": bc}), "c")
    got_c = np.asarray(
        nn.Conv(4, (3, 3), padding=1).apply(
            {"params": pc}, jnp.asarray(xc.transpose(0, 2, 3, 1))
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_c, want_c, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_classifier_cli_scores_from_reference_pt(tmp_path, monkeypatch):
    """oc_classifier end-to-end from a reference-named torch .pt
    (``aasist_vocoded_{epoch}.pt``) — the exact file a reference user
    holds (reference: oc_training.py:401 save / oc_classifier.py:340
    load)."""
    torch = pytest.importorskip("torch")

    from occm_tpu.io.scorefiles import read_comma_scores
    from occm_tpu.io.wav import write_wav

    sr = 16000
    train_dir = tmp_path / "train"
    eval_dir = tmp_path / "eval"
    train_dir.mkdir()
    eval_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        utt = f"LA_T_{i:04d}"
        t = np.arange(2400) / sr
        write_wav(str(train_dir / f"{utt}.wav"),
                  0.3 * np.sin(2 * np.pi * (250 + 30 * i) * t), sr)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    for i in range(2):
        write_wav(str(eval_dir / f"LA_E_{i:04d}.wav"),
                  0.2 * rng.normal(size=2600), sr)
    (tmp_path / "eval.txt").write_text("LA_E_0000\nLA_E_0001\n")

    # the checkpoint a reference user holds: full AASIST dims (the CLI
    # builds AModel(AASISTConfig()) with the tiny XLSR under --xlsr_tiny)
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    # properly-scaled init weights (the conversion math itself is pinned
    # by the roundtrip/orientation tests; this pins the CLI plumbing)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 3200), jnp.float32))
    sd = export_amodel_state_dict(variables, XLSRConfig.tiny())
    pt = tmp_path / "aasist_vocoded_3.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pt))

    monkeypatch.chdir(tmp_path)
    from occm_tpu.cli import oc_classifier

    score_file = str(tmp_path / "scores.txt")
    oc_classifier.main(
        [
            "--pretrained-sslaasist", str(pt),
            "--protocol_file", str(tmp_path / "train.txt"),
            "--dataset_dir", str(train_dir),
            "--eval_protocol_file", str(tmp_path / "eval.txt"),
            "--eval_dataset_dir", str(eval_dir),
            "--mode", "1c2",
            "--score_file", score_file,
            "--batch_size", "2",
            "--bucket_step", "3200",
            "--xlsr_tiny",
        ]
    )
    scores = read_comma_scores(score_file)
    assert len(scores) == 2 and all(np.isfinite(scores))


def test_export_model_file_roundtrips_trainer_checkpoint(tmp_path):
    """occm-export-model: a TRAINER orbax epoch checkpoint (params +
    batch_stats + opt_state + step, train/checkpoint.py) exports to a
    reference-named .pt that re-imports to the identical tree — the
    train-here / deploy-with-reference-tooling path."""
    torch = pytest.importorskip("torch")
    import optax

    from occm_tpu.models.convert_backend import (
        convert_model_state_dict, export_model_file, load_torch_state_dict)
    from occm_tpu.train.checkpoint import save_checkpoint
    from occm_tpu.train.state import create_train_state

    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 3200), jnp.float32),
        optax.adam(1e-4),
    )
    ckpt = save_checkpoint(state, str(tmp_path), "aasist_vocoded", 7)

    pt = str(tmp_path / "exported.pt")
    kind = export_model_file(ckpt, pt, xlsr_cfg=XLSRConfig.tiny())
    assert kind == "amodel"

    back = convert_model_state_dict(
        load_torch_state_dict(pt), xlsr_cfg=XLSRConfig.tiny())
    _tree_eq(
        {"params": state.params, "batch_stats": state.batch_stats},
        {"params": back["params"], "batch_stats": back["batch_stats"]},
    )


def test_convert_model_file_and_classifier_pt_load(tmp_path):
    """File-level: torch.save a reference-named AModel state dict, convert
    via the CLI entry, and load the same .pt directly in oc_classifier."""
    torch = pytest.importorskip("torch")

    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    x = jnp.zeros((1, 3200), jnp.float32)
    variables = _randomized(
        model.init({"params": jax.random.PRNGKey(0)}, x)
    )
    sd = export_amodel_state_dict(variables, XLSRConfig.tiny())
    pt = tmp_path / "aasist_vocoded_9.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(pt))

    from occm_tpu.models.convert_backend import (
        convert_model_state_dict, load_torch_state_dict)

    out = convert_model_state_dict(
        load_torch_state_dict(str(pt)), xlsr_cfg=XLSRConfig.tiny()
    )
    assert out["_kind"] == "amodel"
    _tree_eq(variables["params"], out["params"])

    from occm_tpu.models.convert_backend import convert_model_file

    dst = tmp_path / "converted"
    kind = convert_model_file(str(pt), str(dst), xlsr_cfg=XLSRConfig.tiny())
    assert kind == "amodel"
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(str(dst))
    _tree_eq(variables["params"], restored["params"])
