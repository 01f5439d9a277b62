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
