"""CLI coverage: evaluate / calculate_eer mains (reference: evaluate.py:148-198,
calculate_eer.py:28-39), plus trainer argparse defaults."""

import numpy as np
import pytest

from occm_tpu.cli import calculate_eer as cli_eer
from occm_tpu.cli import evaluate as cli_eval
from occm_tpu.cli import oc_training as cli_train


def test_evaluate_cli_end_to_end(tmp_path, capsys):
    # 4 utts: two spoof (high distance scores), two bonafide (low)
    (tmp_path / "proto.txt").write_text(
        "DF_E_1\nDF_E_2\nDF_E_3\nDF_E_4\n"
    )
    meta = "\n".join(
        [
            "LA_0001 DF_E_1 m a A09 spoof notrim eval tv - - - -",
            "LA_0002 DF_E_2 m a - bonafide notrim eval - - - - -",
            "LA_0003 DF_E_3 m a A09 spoof notrim eval tv - - - -",
            "LA_0004 DF_E_4 m a - bonafide notrim eval - - - - -",
        ]
    )
    (tmp_path / "meta.txt").write_text(meta + "\n")
    (tmp_path / "scores.txt").write_text(
        "0.9, 1 \n0.1, 0 \n0.8, 1 \n0.2, 0 \n"
    )
    cli_eval.main(
        [
            "--score_file", str(tmp_path / "scores.txt"),
            "--protocol_file", str(tmp_path / "proto.txt"),
            "--metadata_file", str(tmp_path / "meta.txt"),
            "--threshold", "0.5",
        ]
    )
    out = capsys.readouterr().out
    assert "bona fide = 2" in out
    assert "spoof = 2" in out
    assert "EER = 0.0" in out  # perfectly separable


def test_calculate_eer_cli(tmp_path, capsys):
    proto = "\n".join(
        [
            "LA_0001 utt1 - - bonafide",
            "LA_0002 utt2 - A01 spoof",
            "LA_0003 utt3 - - bonafide",
            "LA_0004 utt4 - A02 spoof",
        ]
    )
    (tmp_path / "proto.txt").write_text(proto + "\n")
    # bonafide-likeness scores: bonafide high, spoof low -> EER 0
    (tmp_path / "scores.txt").write_text(
        "utt1 0.9\nutt2 0.1\nutt3 0.8\nutt4 0.2\n"
    )
    cli_eer.main(
        [
            "--eval_protocol_file", str(tmp_path / "proto.txt"),
            "--score_file", str(tmp_path / "scores.txt"),
        ]
    )
    out = capsys.readouterr().out
    assert "EER = 0.0" in out


def test_trainer_parser_reference_defaults():
    p = cli_train.build_parser()
    args = p.parse_args([])
    # reference argparse defaults (oc_training.py:279-290)
    assert args.train_dataset_dir.endswith("ASVspoof2019_LA_train/wav")
    assert args.train_protocol_file.endswith(
        "ASVspoof2019.LA.cm.train.trn.txt"
    )
    assert args.finetuned is False
    # shipped training config (oc_training.py:324,342,380-382)
    assert args.lr == 1e-5
    assert args.num_epochs == 100
    assert args.compactness_weight == 0.0
    assert args.descriptiveness_weight == 1.0


def test_trainer_make_model_kinds():
    from occm_tpu.config import XLSRConfig

    cfg = XLSRConfig.tiny()
    for name, kind in [("aasist", "dual"), ("ssl_resnet34", "dual"),
                       ("ssl_lcnn", "logits"), ("cnn", "logits"),
                       ("occm", "occm")]:
        model, output_kind = cli_train.make_model(name, cfg)
        assert output_kind == kind
