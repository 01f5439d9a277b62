"""Per-utterance dataset tests (reference: data_utils_SSL.py:57-104)."""

import numpy as np

from occm_tpu.data import ASVspoof2019TrainDataset, ASVspoof2021EvalDataset
from occm_tpu.io.wav import write_wav

SR = 16000


def _make_tree(tmp_path):
    flac_dir = tmp_path / "flac"
    flac_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    utts = []
    for i, lab in enumerate(["bonafide", "spoof", "bonafide"]):
        utt = f"LA_T_{i:07d}"
        utts.append(utt)
        write_wav(str(flac_dir / f"{utt}.wav"),
                  rng.normal(size=2000 + i * 500).astype(np.float32) * 0.2,
                  SR)
        lines.append(f"LA_{i:04d} {utt} - - {lab}")
    (tmp_path / "proto.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "eval.txt").write_text("\n".join(utts) + "\n")
    return utts


def test_train_dataset_labels_and_pad(tmp_path):
    utts = _make_tree(tmp_path)
    ds = ASVspoof2019TrainDataset(
        str(tmp_path / "proto.txt"), str(tmp_path), cut=3200
    )
    assert len(ds) == 3
    x, y = ds[0]
    assert x.shape == (3200,)
    # genSpoof_list convention: bonafide=1, spoof=0
    assert y == 1
    assert ds[1][1] == 0
    # repeat-pad: the 2000-sample wave tiles
    np.testing.assert_array_equal(x[:1200], x[2000:3200])


def test_eval_dataset_returns_utt_ids(tmp_path):
    utts = _make_tree(tmp_path)
    ds = ASVspoof2021EvalDataset(
        str(tmp_path / "eval.txt"), str(tmp_path), cut=3200
    )
    assert len(ds) == 3
    x, utt = ds[2]
    assert x.shape == (3200,)
    assert utt == utts[2]


def test_ssl_model_alias():
    import jax
    import jax.numpy as jnp

    from occm_tpu.config import XLSRConfig
    from occm_tpu.models.xlsr import SSLModel

    cfg = XLSRConfig.tiny()
    m = SSLModel(cfg)
    wave = jnp.zeros((1, 3200), jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(0)}, wave)
    out = m.apply(v, wave)
    assert out.shape == (1, 159, cfg.out_dim)
    assert "model" in v["params"]  # fairseq-style `model` scope
