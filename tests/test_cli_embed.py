"""occm-embed CLI: protocol -> embeddings.npz -> LinearSVC baseline.

Closes the reference's missing glue between the scoring model and the
Linear-SVM baseline (reference: models/linearsvc.py:6-19 consumes
precomputed embeddings; oc_classifier.py:182-186 is the embedding loop)."""

import numpy as np
import pytest

from occm_tpu.io.wav import write_wav

SR = 16000


@pytest.mark.slow
def test_embed_cli_end_to_end(tmp_path):
    train_dir = tmp_path / "wav"
    train_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        utt = f"LA_T_{i:04d}"
        t = np.arange(2400) / SR
        write_wav(str(train_dir / f"{utt}.wav"),
                  0.3 * np.sin(2 * np.pi * (250 + 30 * i) * t), SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
    for i in range(4, 7):
        utt = f"LA_T_{i:04d}"
        write_wav(str(train_dir / f"{utt}.wav"),
                  0.2 * rng.normal(size=2400), SR)
        lines.append(f"LA_{i:04d} {utt} - A01 spoof")
    proto = tmp_path / "train.txt"
    proto.write_text("\n".join(lines) + "\n")

    out = tmp_path / "emb.npz"
    from occm_tpu.cli.embed import main
    main([
        "--protocol_file", str(proto),
        "--dataset_dir", str(train_dir),
        "--out", str(out),
        "--xlsr_tiny", "--allow_random_init",
        "--batch_size", "4", "--data_parallel", "2",
    ])

    z = np.load(out, allow_pickle=False)
    assert set(z.files) == {"utts", "embeddings", "logits", "labels"}
    assert z["embeddings"].shape == (7, 160)
    assert z["logits"].shape == (7, 2)
    # PFDataset label map: bona=0 / spoof=1 (reference: oc_training.py:225)
    np.testing.assert_array_equal(z["labels"],
                                  [0, 0, 0, 0, 1, 1, 1])
    assert list(z["utts"]) == [f"LA_T_{i:04d}" for i in range(7)]
    assert np.isfinite(z["embeddings"]).all()

    # the .npz feeds the reference's LinearSVC baseline directly
    from occm_tpu.models.linearsvc import SGD
    clf = SGD(z["embeddings"], z["labels"], epochs=5)
    acc = clf.evaluate(z["embeddings"], z["labels"])
    assert 0.0 <= acc <= 1.0

    # eval-mode protocol: bare list, labels -1
    eproto = tmp_path / "eval.txt"
    eproto.write_text("\n".join(f"LA_T_{i:04d}" for i in range(3)) + "\n")
    eout = tmp_path / "emb_eval.npz"
    main([
        "--protocol_file", str(eproto),
        "--dataset_dir", str(train_dir),
        "--out", str(eout),
        "--eval", "--xlsr_tiny", "--allow_random_init",
        "--batch_size", "4",
    ])
    ze = np.load(eout, allow_pickle=False)
    np.testing.assert_array_equal(ze["labels"], [-1, -1, -1])
    # same utterances, same weights -> same embeddings as the train dump
    np.testing.assert_allclose(ze["embeddings"], z["embeddings"][:3],
                               rtol=1e-5, atol=1e-5)
