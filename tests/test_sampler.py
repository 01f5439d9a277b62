"""Meta-batch sampling scheme tests on an in-memory fake file list —
the reference's only true-mock test (reference: test_sampler.py:50-68),
extended to the actual PFDataset scheme (reference: oc_training.py:129-196).
"""

import numpy as np
import pytest

from occm_tpu.data import PFSampler, VOCODER_NAMES

FILES = [f"file{i}" for i in range(8)]
LABELS = ["spoof", "bonafide", "spoof", "bonafide",
          "spoof", "bonafide", "spoof", "bonafide"]


def test_label_index_caching():
    s = PFSampler(FILES, LABELS)
    assert s.spoof_indices == [0, 2, 4, 6]
    assert s.bonafide_indices == [1, 3, 5, 7]
    assert len(s) == 4  # one meta-batch per bonafide


def test_sample_structure():
    # need >= 6 bonafide for the real scheme
    files = [f"b{i}" for i in range(7)] + [f"s{i}" for i in range(2)]
    labels = ["bonafide"] * 7 + ["spoof"] * 2
    s = PFSampler(files, labels)
    rng = np.random.default_rng(0)
    main, vocoded, lab = s.sample(2, rng)

    assert len(main) == 7 and len(vocoded) == 5 and len(lab) == 12
    # anchor is bona1
    assert main[0] == "b2"
    # 5 other bonafides, excluding the anchor, no duplicates
    assert len(set(main[1:6])) == 5
    assert "b2" not in main[1:6]
    assert all(m.startswith("b") for m in main[:6])
    assert main[6].startswith("s")
    # vocoded names prefix the anchor (reference: oc_training.py:174-175)
    assert vocoded == [f"{v}_b2" for v in VOCODER_NAMES]
    # labels: bona=0 x6 then spoof=1 x6 (reference: oc_training.py:225,240)
    assert lab == [0] * 6 + [1] * 6


def test_sample_raises_when_not_enough_files():
    s = PFSampler(["a", "b"], ["bonafide", "spoof"])
    with pytest.raises(ValueError, match="Not enough files"):
        s.sample(0, np.random.default_rng(0))


def test_sampling_reproducible_with_seed():
    files = [f"b{i}" for i in range(10)] + ["s0", "s1"]
    labels = ["bonafide"] * 10 + ["spoof"] * 2
    s = PFSampler(files, labels)
    a = s.sample(3, np.random.default_rng(42))
    b = s.sample(3, np.random.default_rng(42))
    assert a == b


def test_anchor_always_bonafide_on_interleaved_protocol():
    """Pins the deliberate deviation from the reference (DESIGN.md):
    the reference anchors meta-batch idx directly into file_list
    (reference: oc_training.py:186-196 — "idx always points to a bonafide
    file" is FALSE on interleaved protocols, where it silently anchors on
    spoof rows); here idx maps through bonafide_indices so every anchor is
    bonafide regardless of protocol row order."""
    # interleaved: bona rows at odd positions — reference file_list[idx]
    # with idx in [0, len(bonafide)) would anchor on s0/b0/s1/... and pick
    # spoof anchors for idx 0, 2
    files = ["s0", "b0", "s1", "b1", "s2", "b2", "s3", "b3",
             "s4", "b4", "s5", "b5", "s6", "b6"]
    labels = ["spoof", "bonafide"] * 7
    s = PFSampler(files, labels)
    rng = np.random.default_rng(0)
    for idx in range(len(s)):
        main, vocoded, lab = s.sample(idx, rng)
        assert main[0] == f"b{idx}"            # anchor is the idx-th bonafide
        assert all(m.startswith("b") for m in main[:6])
        assert main[6].startswith("s")
        assert vocoded == [f"{v}_b{idx}" for v in VOCODER_NAMES]
