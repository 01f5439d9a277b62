"""oc_classifier CLI integration: checkpoint restore -> reference embedding
-> eval scoring (reference: oc_classifier.py:315-361 flow)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from occm_tpu.config import AASISTConfig, XLSRConfig
from occm_tpu.io.scorefiles import read_comma_scores
from occm_tpu.io.wav import write_wav
from occm_tpu.models import AModel
from occm_tpu.train.checkpoint import save_checkpoint
from occm_tpu.train.state import create_train_state

SR = 16000


@pytest.mark.slow
def test_oc_classifier_cli_end_to_end(tmp_path, monkeypatch):
    # --- fixture tree: 3 bonafide train rows + 4 eval utts ---
    train_dir = tmp_path / "train"
    eval_dir = tmp_path / "eval"
    train_dir.mkdir()
    eval_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        utt = f"LA_T_{i:04d}"
        t = np.arange(2400) / SR
        write_wav(str(train_dir / f"{utt}.wav"),
                  0.3 * np.sin(2 * np.pi * (250 + 30 * i) * t), SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
    lines.append("LA_9999 LA_T_9999 - A01 spoof")  # filtered out (spoof)
    write_wav(str(train_dir / "LA_T_9999.wav"),
              0.2 * rng.normal(size=2400), SR)
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")

    eval_utts = []
    for i in range(4):
        utt = f"LA_E_{i:04d}"
        write_wav(str(eval_dir / f"{utt}.wav"),
                  0.2 * rng.normal(size=2600), SR)
        eval_utts.append(utt)
    (tmp_path / "eval.txt").write_text("\n".join(eval_utts) + "\n")

    # --- checkpoint in the trainer's format ---
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((2, 64600), jnp.float32),
        optax.adam(1e-5),
    )
    ckpt = save_checkpoint(state, str(tmp_path), "aasist_vocoded", 1)

    monkeypatch.chdir(tmp_path)  # reference_embedding.npy etc. land here
    from occm_tpu.cli import oc_classifier

    score_file = str(tmp_path / "scores.txt")
    oc_classifier.main(
        [
            "--pretrained-sslaasist", ckpt,
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
    assert os.path.exists(tmp_path / "reference_embedding.npy")
    assert os.path.exists(tmp_path / "threshold.npy")
    scores = read_comma_scores(score_file)
    assert len(scores) == 4
    assert all(np.isfinite(scores))

    # 2c2 mode writes bare logits
    score_file2 = str(tmp_path / "scores2.txt")
    oc_classifier.main(
        [
            "--pretrained-sslaasist", ckpt,
            "--protocol_file", str(tmp_path / "train.txt"),
            "--dataset_dir", str(train_dir),
            "--eval_protocol_file", str(tmp_path / "eval.txt"),
            "--eval_dataset_dir", str(eval_dir),
            "--mode", "2c2",
            "--score_file", score_file2,
            "--batch_size", "2",
            "--bucket_step", "3200",
            "--xlsr_tiny",
            # scoring-side fast numerics (bf16 norms + tanh GELU): same
            # checkpoint loads, scores stay finite
            "--fast_numerics",
        ]
    )
    assert len(read_comma_scores(score_file2)) == 4

    # --quant_int8: same fp32 checkpoint, transformed to the W8A8 layout
    # at load time (occm_tpu.ops.int8); scores stay finite and track the
    # exact path (numerical accuracy itself is pinned in test_int8.py)
    score_file3 = str(tmp_path / "scores3.txt")
    oc_classifier.main(
        [
            "--pretrained-sslaasist", ckpt,
            "--protocol_file", str(tmp_path / "train.txt"),
            "--dataset_dir", str(train_dir),
            "--eval_protocol_file", str(tmp_path / "eval.txt"),
            "--eval_dataset_dir", str(eval_dir),
            "--mode", "1c2",
            "--score_file", score_file3,
            "--batch_size", "2",
            "--bucket_step", "3200",
            "--xlsr_tiny",
            "--quant_int8",
        ]
    )
    scores_int8 = read_comma_scores(score_file3)
    assert len(scores_int8) == 4
    assert all(np.isfinite(scores_int8))
