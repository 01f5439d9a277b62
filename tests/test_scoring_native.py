"""Scoring fast lane: threaded native batch decode + prefetch
(BucketedEmbedder.embed_paths) must be BYTE-IDENTICAL to the per-item
Python decode path (r4 verdict item 2 — the reference's per-utterance
librosa loop, oc_classifier.py:180-196, is the host bottleneck this lane
replaces; "identical scores" is the gate that makes the replacement
safe)."""

import os

import numpy as np
import pytest

from occm_tpu.classify import BucketedEmbedder, OneClassScorer
from occm_tpu.data import ASVDataset
from occm_tpu.io import native
from occm_tpu.io.wav import load_audio, write_wav

SR = 16000


def _toy_embed_fn(x):
    """Cheap deterministic stand-in for a model: fixed projections of the
    waveform so any decode/pad/bucket difference shows up in the output."""
    import jax.numpy as jnp

    t = jnp.arange(x.shape[1], dtype=jnp.float32)
    basis = jnp.stack([
        jnp.sin(0.001 * (k + 1) * t) for k in range(6)
    ], axis=1)  # [T, 6]
    emb = x @ basis / x.shape[1]
    logits = jnp.stack([jnp.sum(x, axis=1), jnp.sum(jnp.abs(x), axis=1)],
                       axis=1)
    return emb, logits


@pytest.fixture(scope="module")
def audio_tree(tmp_path_factory):
    """Mixed-length WAVs spanning several buckets + a protocol pair."""
    root = tmp_path_factory.mktemp("scoring_native")
    rng = np.random.default_rng(3)
    lines, utts = [], []
    lens = [1700, 3000, 3001, 6400, 9900, 12100, 3000, 800]
    for i, n in enumerate(lens):
        utt = f"LA_T_n{i:04d}"
        w = (0.3 * rng.normal(size=n)).astype(np.float32)
        write_wav(str(root / f"{utt}.wav"), w, SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
        utts.append(utt)
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    (root / "eval.txt").write_text("\n".join(utts) + "\n")
    return root


@pytest.mark.skipif(not native.available(),
                    reason="native library not built (make -C native)")
def test_audio_len_probe_matches_decode(audio_tree):
    paths = sorted(str(p) for p in audio_tree.glob("*.wav"))
    lens, srs = native.native_audio_len_batch(paths)
    for p, n, sr in zip(paths, lens, srs):
        wave, sr2 = load_audio(p, sr=None)
        assert n == len(wave) and sr == sr2


@pytest.mark.skipif(not native.available(),
                    reason="native library not built (make -C native)")
def test_embed_paths_byte_identical_to_embed_all(audio_tree):
    paths = sorted(str(p) for p in audio_tree.glob("*.wav"))
    waves = [load_audio(p, sr=None)[0] for p in paths]
    emb = BucketedEmbedder(_toy_embed_fn, bucket_step=3200, batch_size=3)
    e1, l1 = emb.embed_all(waves)
    e2, l2 = emb.embed_paths(paths)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(l1, l2)


@pytest.mark.skipif(not native.available(),
                    reason="native library not built (make -C native)")
def test_embed_paths_with_max_len_crop(audio_tree):
    # max_len forces a crop bucket: both lanes must crop identically
    paths = sorted(str(p) for p in audio_tree.glob("*.wav"))
    waves = [load_audio(p, sr=None)[0] for p in paths]
    emb = BucketedEmbedder(_toy_embed_fn, bucket_step=3200, max_len=6400,
                           batch_size=4)
    e1, l1 = emb.embed_all(waves)
    e2, l2 = emb.embed_paths(paths)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(l1, l2)


def test_scorer_scores_identical_through_fast_lane(audio_tree, tmp_path):
    """End-to-end: OneClassScorer via the dataset path lane writes the
    same scores.txt bytes as the per-item wave lane."""
    emb = BucketedEmbedder(_toy_embed_fn, bucket_step=3200, batch_size=3)

    train_ds = ASVDataset(str(audio_tree / "train.txt"), str(audio_tree))
    eval_ds = ASVDataset(str(audio_tree / "eval.txt"), str(audio_tree),
                         eval=True)

    d_fast = tmp_path / "fast"
    d_slow = tmp_path / "slow"
    d_fast.mkdir()
    d_slow.mkdir()

    s_fast = OneClassScorer(emb, cache_dir=str(d_fast))
    ref, thr = s_fast.create_reference_embedding(train_ds)
    s_fast.score_eval_set_1c(eval_ds, ref, thr,
                             score_file=str(d_fast / "scores.txt"))

    # slow lane: hide file_paths so the scorer uses the per-item loop
    class NoPaths:
        def __init__(self, ds):
            self._ds = ds

        def __len__(self):
            return len(self._ds)

        def __getitem__(self, i):
            return self._ds[i]

    s_slow = OneClassScorer(emb, cache_dir=str(d_slow))
    ref2, thr2 = s_slow.create_reference_embedding(NoPaths(train_ds))
    s_slow.score_eval_set_1c(NoPaths(eval_ds), ref2, thr2,
                             score_file=str(d_slow / "scores.txt"))

    np.testing.assert_array_equal(ref, ref2)
    assert thr == thr2
    assert (d_fast / "scores.txt").read_bytes() == \
        (d_slow / "scores.txt").read_bytes()


def test_embed_paths_python_fallback(audio_tree, monkeypatch):
    """With the native library reported unavailable, embed_paths falls
    back to Python decode and still matches embed_all."""
    paths = sorted(str(p) for p in audio_tree.glob("*.wav"))
    waves = [load_audio(p, sr=None)[0] for p in paths]
    emb = BucketedEmbedder(_toy_embed_fn, bucket_step=3200, batch_size=3)
    expected, _ = emb.embed_all(waves)
    monkeypatch.setattr(native, "available", lambda: False)
    got, _ = emb.embed_paths(paths)
    np.testing.assert_array_equal(expected, got)
