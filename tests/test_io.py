"""Protocol and score-file format tests (reference: data_utils_SSL.py:17-43,
oc_classifier.py:238-241, evaluate.py:85-101, calculate_eer.py:18-19)."""

import io

from occm_tpu.io import (
    gen_spoof_list,
    parse_eval_protocol,
    parse_metadata_dict,
    parse_metadata_labels,
    parse_train_protocol,
    read_comma_scores,
    read_utt_scores,
    write_score_line_1c,
    write_score_line_2c,
    write_utt_score_line,
)
from occm_tpu.io.protocols import metadata_labels_for_protocol

TRAIN_PROTO = """\
LA_0079 LA_T_1138215 - - bonafide
LA_0079 LA_T_1271820 - A01 spoof
LA_0081 LA_T_1331748 - - bonafide
"""

EVAL_PROTO = """\
LA_E_2834763
LA_E_1000147
"""

METADATA = """\
LA_0043 DF_E_2000026 mp3m4a asvspoof A09 spoof notrim eval traditional_vocoder - - - -
LA_0044 DF_E_2000027 mp3m4a asvspoof - bonafide notrim eval - - - - -
"""


def test_parse_train_protocol(tmp_path):
    p = tmp_path / "train.txt"
    p.write_text(TRAIN_PROTO)
    files, labels = parse_train_protocol(str(p))
    assert files == ["LA_T_1138215", "LA_T_1271820", "LA_T_1331748"]
    assert labels == ["bonafide", "spoof", "bonafide"]


def test_gen_spoof_list_train_label_convention(tmp_path):
    # genSpoof_list maps bonafide=1 / spoof=0 — the OPPOSITE of PFDataset
    p = tmp_path / "train.txt"
    p.write_text(TRAIN_PROTO)
    d_meta, files = gen_spoof_list(str(p), is_train=True)
    assert d_meta["LA_T_1138215"] == 1
    assert d_meta["LA_T_1271820"] == 0
    assert files[0] == "LA_T_1138215"


def test_gen_spoof_list_eval(tmp_path):
    p = tmp_path / "eval.txt"
    p.write_text(EVAL_PROTO)
    files = gen_spoof_list(str(p), is_eval=True)
    assert files == ["LA_E_2834763", "LA_E_1000147"]


def test_parse_eval_protocol(tmp_path):
    p = tmp_path / "eval.txt"
    p.write_text(EVAL_PROTO)
    assert parse_eval_protocol(str(p)) == ["LA_E_2834763", "LA_E_1000147"]


def test_metadata_parsers(tmp_path):
    p = tmp_path / "meta.txt"
    p.write_text(METADATA)
    assert parse_metadata_labels(str(p)) == ["spoof", "bonafide"]
    d = parse_metadata_dict(str(p))
    assert d == {"DF_E_2000026": "spoof", "DF_E_2000027": "bonafide"}


def test_metadata_labels_for_protocol(tmp_path):
    meta = tmp_path / "meta.txt"
    meta.write_text(METADATA)
    proto = tmp_path / "proto.txt"
    # reversed order + one unknown utt (keeps empty label like the reference)
    proto.write_text("DF_E_2000027\nDF_E_9999999\nDF_E_2000026\n")
    labels = metadata_labels_for_protocol(str(meta), str(proto))
    assert labels == ["bonafide", "", "spoof"]


def test_score_line_1c_bytes_exact():
    buf = io.StringIO()
    write_score_line_1c(buf, 0.02207140438258648, threshold=0.01)
    write_score_line_1c(buf, 0.005, threshold=0.01)
    # exact reference byte layout incl. trailing space (oc_classifier.py:239)
    assert buf.getvalue() == "0.02207140438258648, 1 \n0.005, 0 \n"


def test_score_roundtrip(tmp_path):
    p = tmp_path / "scores.txt"
    with open(p, "w") as f:
        write_score_line_1c(f, 0.25, threshold=0.5)
        write_score_line_1c(f, 0.75, threshold=0.5)
    assert read_comma_scores(str(p)) == [0.25, 0.75]

    p2 = tmp_path / "scores2c.txt"
    with open(p2, "w") as f:
        write_score_line_2c(f, -1.5)
    assert read_comma_scores(str(p2)) == [-1.5]

    p3 = tmp_path / "utt_scores.txt"
    with open(p3, "w") as f:
        write_utt_score_line(f, "LA_E_1", 0.125)
        write_utt_score_line(f, "LA_E_2", -3.0)
    utts, scores = read_utt_scores(str(p3))
    assert utts == ["LA_E_1", "LA_E_2"]
    assert scores == [0.125, -3.0]
