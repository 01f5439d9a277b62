"""End-to-end integration: synthetic protocol+wav tree -> meta-batch
training -> checkpoint -> one-class scoring -> EER (SURVEY.md §4e).

Replaces the reference's hard-coded /datab paths with a tiny generated
fixture tree and runs the tiny-XLSR AASIST through the whole pipeline on
the 8-device CPU mesh.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.config import (
    AASISTConfig,
    MeshConfig,
    RawBoostConfig,
    TrainConfig,
    XLSRConfig,
)
from occm_tpu.data import ASVDataset, MetaBatchPipeline, PFDataset
from occm_tpu.io.wav import write_wav

SR = 16000
CUT = 3200


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    """8 bonafide + 4 spoof train utts, vocoded dir, eval set of 6."""
    root = tmp_path_factory.mktemp("asvspoof")
    train_dir = root / "train"
    vocoded_dir = root / "vocoded"
    eval_dir = root / "eval"
    for d in (train_dir, vocoded_dir, eval_dir):
        d.mkdir()

    rng = np.random.default_rng(0)
    lines = []
    bona, spoof = [], []
    for i in range(8):
        utt = f"LA_T_b{i:04d}"
        bona.append(utt)
        # bonafide: soft tones
        t = np.arange(2500 + 100 * i) / SR
        wave = 0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)
        write_wav(str(train_dir / f"{utt}.wav"), wave, SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
        for voc in ("hifigan", "hn-sinc-nsf-hifi", "hn-sinc-nsf", "melgan",
                    "waveglow"):
            vwave = wave + 0.05 * rng.normal(size=wave.shape)
            write_wav(str(vocoded_dir / f"{voc}_{utt}.wav"), vwave, SR)
    for i in range(4):
        utt = f"LA_T_s{i:04d}"
        spoof.append(utt)
        wave = 0.3 * rng.normal(size=2800)  # spoof: noise
        write_wav(str(train_dir / f"{utt}.wav"), wave, SR)
        lines.append(f"LA_{100 + i:04d} {utt} - A0{i} spoof")
    (root / "train.txt").write_text("\n".join(lines) + "\n")

    # eval: 3 "bonafide"-like + 3 "spoof"-like
    eval_lines, eval_proto_lines = [], []
    for i in range(3):
        utt = f"LA_E_b{i:04d}"
        t = np.arange(2600) / SR
        write_wav(str(eval_dir / f"{utt}.wav"),
                  0.3 * np.sin(2 * np.pi * 260 * t), SR)
        eval_proto_lines.append(utt)
        eval_lines.append(f"LA_{i:04d} {utt} - - bonafide")
    for i in range(3):
        utt = f"LA_E_s{i:04d}"
        write_wav(str(eval_dir / f"{utt}.wav"),
                  0.3 * rng.normal(size=2600), SR)
        eval_proto_lines.append(utt)
        eval_lines.append(f"LA_{200 + i:04d} {utt} - A09 spoof")
    (root / "eval_proto.txt").write_text("\n".join(eval_proto_lines) + "\n")
    (root / "eval_labels.txt").write_text("\n".join(eval_lines) + "\n")
    return root


def test_pfdataset_meta_batch_shape(fixture_tree):
    ds = PFDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
        vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
    )
    assert len(ds) == 8  # one meta-batch per bonafide
    feats, labels = ds[0]
    assert feats.shape == (12, CUT)
    np.testing.assert_array_equal(labels, [0] * 6 + [1] * 6)


def test_pfdataset_group_max_mode(fixture_tree):
    ds = PFDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
        vocoded_dir=str(fixture_tree / "vocoded"), pad_mode="group_max",
    )
    feats, labels = ds[1]
    assert feats.shape[0] == 12
    # group max = longest utterance in the meta-batch (reference layout)
    assert feats.shape[1] >= 2500


@pytest.mark.slow
def test_train_classify_evaluate_pipeline(fixture_tree, tmp_path):
    """Train 1 epoch of tiny AASIST on the dp mesh, checkpoint, score."""
    from occm_tpu.classify import BucketedEmbedder, OneClassScorer
    from occm_tpu.evaluate import calculate_eer_from_labels
    from occm_tpu.io.scorefiles import read_comma_scores
    from occm_tpu.models import AModel
    from occm_tpu.parallel import make_mesh
    from occm_tpu.train.checkpoint import (
        latest_epoch,
        restore_checkpoint,
        save_checkpoint,
    )
    from occm_tpu.train.loop import train

    os.chdir(tmp_path)  # loss.txt etc. land here

    cfg = TrainConfig(
        lr=1e-4,
        num_epochs=1,
        compactness_weight=0.1,
        descriptiveness_weight=0.9,
        cut=CUT,
        groups_per_step=2,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=8, tp=1),
        log_every=2,
        loss_txt=str(tmp_path / "loss.txt"),
        checkpoint_dir=str(tmp_path),
        checkpoint_prefix="aasist_vocoded",
    )
    ds = PFDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
        vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
    )
    pipeline = MetaBatchPipeline(ds, groups_per_step=2, seed=0)
    model = AModel(AASISTConfig(), xlsr_cfg=XLSRConfig.tiny())
    mesh = make_mesh(cfg.mesh)

    saved = {}

    def ckpt_fn(state, epoch):
        saved["path"] = save_checkpoint(
            state, str(tmp_path), "aasist_vocoded", epoch
        )
        saved["state"] = state

    state = train(
        model, pipeline, cfg, mesh=mesh, checkpoint_fn=ckpt_fn,
        output_kind="dual",
    )
    assert int(state.step) == 4  # 8 meta-batches / groups_per_step=2
    assert os.path.exists(cfg.loss_txt)
    line = open(cfg.loss_txt).readline()
    assert line.startswith("epoch = 1, i = 2, loss = ")

    # checkpoint roundtrip
    assert latest_epoch(str(tmp_path), "aasist_vocoded") == 0
    restored, epoch = restore_checkpoint(
        state, str(tmp_path), "aasist_vocoded"
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )

    # resume-from-latest: epoch 0 restored, only epoch 1 trains (4 steps)
    import dataclasses as _dc

    cfg2 = _dc.replace(cfg, num_epochs=2)
    state2 = train(
        model, pipeline, cfg2, mesh=mesh, checkpoint_fn=ckpt_fn,
        output_kind="dual", resume=True,
    )
    assert int(state2.step) == 8
    assert latest_epoch(str(tmp_path), "aasist_vocoded") == 1

    # ---- one-class scoring ----
    params, stats = state.params, state.batch_stats

    def embed_fn(x):
        v = {"params": params}
        if stats:
            v["batch_stats"] = stats
        return model.apply(v, x, train=False)

    embedder = BucketedEmbedder(embed_fn, bucket_step=CUT, max_len=CUT * 2,
                                batch_size=4)
    scorer = OneClassScorer(embedder, cache_dir=str(tmp_path))

    train_ds = ASVDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "train")
    )
    assert len(train_ds) == 8  # bonafide rows only
    ref, thr = scorer.create_reference_embedding(train_ds)
    assert ref.shape == (160,)
    assert thr > 0
    # artefact cache resume (reference: oc_classifier.py:169-174)
    ref2, thr2 = scorer.create_reference_embedding(train_ds)
    np.testing.assert_array_equal(ref, ref2)
    assert thr == thr2
    assert os.path.exists(tmp_path / "distances.txt")

    eval_ds = ASVDataset(
        str(fixture_tree / "eval_proto.txt"), str(fixture_tree / "eval"),
        eval=True,
    )
    score_file = str(tmp_path / "scores.txt")
    scorer.score_eval_set_1c(eval_ds, ref, thr, score_file=score_file)
    scores = read_comma_scores(score_file)
    assert len(scores) == 6

    # evaluate both conventions run end to end
    labels = ["bonafide"] * 3 + ["spoof"] * 3
    eer, _ = calculate_eer_from_labels(scores, labels)
    assert 0.0 <= eer <= 1.0

    # 2c scoring writes bare logits
    score_file2 = str(tmp_path / "scores2.txt")
    scorer.score_eval_set_2c(eval_ds, score_file=score_file2)
    assert len(read_comma_scores(score_file2)) == 6


def test_native_batch_pipeline_matches_python_path(fixture_tree):
    """The C++ threaded batch-decode fast path yields byte-identical
    meta-batches (features AND labels, same RNG stream) to the per-item
    Python path."""
    from occm_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")

    def make_pipe():
        ds = PFDataset(
            str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
            vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
        )
        return MetaBatchPipeline(ds, groups_per_step=2, shuffle=True, seed=3)

    fast = make_pipe()
    assert fast._native
    slow = make_pipe()
    slow._native = False

    fast_batches = list(fast.epoch(1))
    slow_batches = list(slow.epoch(1))
    assert len(fast_batches) == len(slow_batches) == 4
    for (xf, lf), (xs, ls) in zip(fast_batches, slow_batches):
        assert xf.shape == (24, CUT) and xf.dtype == np.float32
        np.testing.assert_array_equal(lf, ls)
        np.testing.assert_array_equal(xf, xs)


def test_pipeline_host_sharding_partitions_epoch(fixture_tree):
    """Two shards with the same seed cover every meta-batch exactly once
    (multi-host input sharding: same shuffle, disjoint strided slices)."""
    def make(si, sc):
        ds = PFDataset(
            str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
            vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
        )
        return MetaBatchPipeline(ds, groups_per_step=1, shuffle=True,
                                 seed=7, shard_index=si, shard_count=sc)

    full = make(0, 1)
    s0, s1 = make(0, 2), make(1, 2)
    assert s0.steps_per_epoch() + s1.steps_per_epoch() == \
        full.steps_per_epoch() == 8

    def keys(pipe):
        return [x.tobytes() for x, _ in pipe.epoch(2)]

    k_full, k0, k1 = keys(full), keys(s0), keys(s1)
    assert len(k0) == len(k1) == 4
    # disjoint and jointly covering the full epoch's batches
    assert set(k0).isdisjoint(k1)
    assert set(k0) | set(k1) == set(k_full)


def test_native_pipeline_tail_and_missing_file(fixture_tree):
    """drop_remainder=False exercises the native tail decode; a missing
    audio file surfaces as an IOError, not silent garbage."""
    from occm_tpu.io import native

    if not native.available():
        pytest.skip("native IO library not built")
    ds = PFDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
        vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
    )
    pipe = MetaBatchPipeline(ds, groups_per_step=3, shuffle=False,
                             drop_remainder=False)
    assert pipe._native
    batches = list(pipe.epoch(0))
    # 8 meta-batches, groups=3 -> 2 chunks of 36 + tail of 24
    assert [b[0].shape[0] for b in batches] == [36, 36, 24]

    bad = PFDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "missing"),
        vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
    )
    bad_pipe = MetaBatchPipeline(bad, groups_per_step=1)
    with pytest.raises(IOError):
        list(bad_pipe.epoch(0))


def test_pipeline_host_sharding_uneven_counts_equal(fixture_tree):
    """len(dataset) % shard_count != 0: every host still yields the SAME
    number of batches (epoch order truncated to a multiple of shard_count
    before the strided slice) — unequal per-host step counts would deadlock
    multi-host SPMD collectives (ADVICE r2, pipeline.py)."""
    def make(si, sc):
        ds = PFDataset(
            str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
            vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
        )
        return MetaBatchPipeline(ds, groups_per_step=1, shuffle=True,
                                 seed=7, shard_index=si, shard_count=sc)

    shards = [make(i, 3) for i in range(3)]  # 8 items over 3 hosts
    keys = [[x.tobytes() for x, _ in s.epoch(0)] for s in shards]
    assert [len(k) for k in keys] == [2, 2, 2]
    assert [s.steps_per_epoch() for s in shards] == [2, 2, 2]
    flat = [k for ks in keys for k in ks]
    assert len(set(flat)) == 6  # disjoint coverage of the truncated epoch


def test_train_multidispatch_accounting_and_tail(fixture_tree, tmp_path):
    """steps_per_dispatch=2 + groups_per_step=3 over 8 meta-batches:
    - the ragged pipeline tail (2 meta-batches) is NOT dropped
      (drop_remainder defaults to False; VERDICT r2 weak #3),
    - loss.txt `i` counts OPTIMIZER steps, not dispatches
      (VERDICT r2 weak #4; reference: oc_training.py:363,391-395)."""
    from occm_tpu.models import AModel
    from occm_tpu.parallel import make_mesh
    from occm_tpu.train.loop import train

    cfg = TrainConfig(
        lr=1e-4, num_epochs=1, compactness_weight=0.1,
        descriptiveness_weight=0.9, cut=CUT,
        groups_per_step=3, steps_per_dispatch=2,
        rawboost=RawBoostConfig(algo=0), mesh=MeshConfig(dp=1, tp=1),
        log_every=2, loss_txt=str(tmp_path / "loss.txt"),
    )
    ds = PFDataset(
        str(fixture_tree / "train.txt"), str(fixture_tree / "train"),
        vocoded_dir=str(fixture_tree / "vocoded"), cut=CUT,
    )
    pipeline = MetaBatchPipeline(ds, groups_per_step=3, seed=0)
    # 8 metas, G=3 -> pipeline batches [36, 36, 24(tail)]
    assert [x.shape[0] for x, _ in pipeline.epoch(0)] == [36, 36, 24]

    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    from occm_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(loss_txt=str(tmp_path / "loss.txt"), jsonl=None)
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:1])
    state = train(model, pipeline, cfg, mesh=mesh,
                  logger=logger, output_kind="dual")
    # 2 full groups through one 2-step chunk + the tail through the single
    # path = 3 optimizer steps; nothing dropped
    assert int(state.step) == 3
    lines = open(tmp_path / "loss.txt").read().splitlines()
    # the chunk crosses opt-step 2 -> one line with i = 2 (not i = 1)
    assert len(lines) == 1 and lines[0].startswith("epoch = 1, i = 2, ")
