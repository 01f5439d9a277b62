"""oc_training CLI integration: full main() on a synthetic fixture tree
(reference: oc_training.py:273-401 flow)."""

import os

import numpy as np
import pytest

from occm_tpu.io.wav import write_wav

SR = 16000


@pytest.mark.slow
def test_oc_training_cli_end_to_end(tmp_path, monkeypatch):
    train_dir = tmp_path / "train"
    vocoded_dir = tmp_path / "vocoded"
    train_dir.mkdir()
    vocoded_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        utt = f"LA_T_b{i:04d}"
        t = np.arange(2400) / SR
        wave = 0.3 * np.sin(2 * np.pi * (220 + 20 * i) * t)
        write_wav(str(train_dir / f"{utt}.wav"), wave, SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
        for voc in ("hifigan", "hn-sinc-nsf-hifi", "hn-sinc-nsf", "melgan",
                    "waveglow"):
            write_wav(str(vocoded_dir / f"{voc}_{utt}.wav"),
                      wave + 0.05 * rng.normal(size=wave.shape), SR)
    for i in range(2):
        utt = f"LA_T_s{i:04d}"
        write_wav(str(train_dir / f"{utt}.wav"),
                  0.2 * rng.normal(size=2400), SR)
        lines.append(f"LA_{100 + i:04d} {utt} - A01 spoof")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")

    monkeypatch.chdir(tmp_path)
    from occm_tpu.cli import oc_training

    oc_training.main(
        [
            "--train_protocol_file", str(tmp_path / "train.txt"),
            "--train_dataset_dir", str(train_dir),
            "--vocoded_dir", str(vocoded_dir),
            "--model", "aasist",
            "--xlsr_tiny",
            "--num_epochs", "1",
            "--groups_per_step", "2",
            "--cut", "3200",
            "--lr", "1e-4",
            "--compactness_weight", "0.1",
            "--descriptiveness_weight", "0.9",
            "--checkpoint_dir", str(tmp_path),
            # bench-validated fast numerics + multi-step dispatch with a
            # ragged tail (4 step-batches, k=3 -> one chunk + one single)
            "--fast_numerics",
            "--steps_per_dispatch", "3",
        ]
    )
    # per-epoch checkpoint with the reference naming scheme
    assert os.path.isdir(tmp_path / "aasist_vocoded_0")


@pytest.mark.slow
def test_oc_training_init_from_reference_pt(tmp_path, monkeypatch):
    """--init_from a reference-named torch .pt: params AND BatchNorm stats
    are grafted before training (continued fine-tuning of a
    reference-trained model — reference has no such path; its fine-tune
    always starts from fairseq weights, oc_training.py:324)."""
    torch = pytest.importorskip("torch")

    import jax
    import jax.numpy as jnp

    from occm_tpu.config import AASISTConfig, XLSRConfig
    from occm_tpu.models import AModel
    from occm_tpu.models.convert_backend import export_amodel_state_dict
    from occm_tpu.train.checkpoint import restore_checkpoint
    from occm_tpu.train.state import create_train_state

    train_dir = tmp_path / "train"
    vocoded_dir = tmp_path / "vocoded"
    train_dir.mkdir()
    vocoded_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        utt = f"LA_T_b{i:04d}"
        t = np.arange(2400) / SR
        wave = 0.3 * np.sin(2 * np.pi * (220 + 20 * i) * t)
        write_wav(str(train_dir / f"{utt}.wav"), wave, SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
        for voc in ("hifigan", "hn-sinc-nsf-hifi", "hn-sinc-nsf", "melgan",
                    "waveglow"):
            write_wav(str(vocoded_dir / f"{voc}_{utt}.wav"),
                      wave + 0.05 * rng.normal(size=wave.shape), SR)
    lines.append("LA_0100 LA_T_s0000 - A01 spoof")
    write_wav(str(train_dir / "LA_T_s0000.wav"),
              0.2 * rng.normal(size=2400), SR)
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")

    # reference-named .pt with sentinel values: out_layer bias = 7,
    # first_bn running_mean = 3 (checks the stats graft too)
    # the CLI builds the FULL AASIST backend (only the XLSR is tiny)
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    import optax

    state0 = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 3200), jnp.float32),
        optax.adam(1e-4),
    )
    params = jax.tree_util.tree_map(lambda x: x, state0.params)
    params["backend"]["out_layer"]["bias"] = jnp.full((2,), 7.0)
    stats = jax.tree_util.tree_map(lambda x: x, state0.batch_stats)
    stats["backend"]["first_bn"]["mean"] = jnp.full((1,), 3.0)
    sd = export_amodel_state_dict(
        {"params": params, "batch_stats": stats}, XLSRConfig.tiny()
    )
    pt = tmp_path / "aasist_vocoded_42.pt"
    torch.save(
        {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
         for k, v in sd.items()},
        str(pt),
    )

    monkeypatch.chdir(tmp_path)
    from occm_tpu.cli import oc_training

    oc_training.main(
        [
            "--train_protocol_file", str(tmp_path / "train.txt"),
            "--train_dataset_dir", str(train_dir),
            "--vocoded_dir", str(vocoded_dir),
            "--model", "aasist",
            "--xlsr_tiny",
            "--num_epochs", "1",
            "--groups_per_step", "1",
            "--cut", "3200",
            "--lr", "1e-9",  # Adam moves params ~lr/step: sentinel survives
            "--compactness_weight", "0.1",
            "--descriptiveness_weight", "0.9",
            "--checkpoint_dir", str(tmp_path),
            "--init_from", str(pt),
        ]
    )
    state1, _ = restore_checkpoint(state0, str(tmp_path), "aasist_vocoded", 0)
    bias = np.asarray(state1.params["backend"]["out_layer"]["bias"])
    np.testing.assert_allclose(bias, 7.0, atol=1e-4)
    # BN stats were grafted then updated with momentum 0.9 over 2 steps:
    # still dominated by the sentinel 3.0, far from the random-init 0.0
    mean = float(np.asarray(state1.batch_stats["backend"]["first_bn"]["mean"]))
    assert mean > 1.5, mean
