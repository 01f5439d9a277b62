"""Preemption-safe mid-epoch checkpointing (TrainConfig.checkpoint_every_steps).

The reference saves per-epoch only and cannot resume at all
(reference: oc_training.py:401); on preemptible TPU pods that loses up to a
full epoch. Here a step checkpoint saves the full TrainState + epoch
progress every N optimizer steps (and on SIGTERM), and --resume replays the
epoch deterministically up to it — the resumed trajectory must be
BIT-IDENTICAL to an uninterrupted run, which these tests assert.
"""

import os
import signal

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occm_tpu.config import (
    AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
)
from occm_tpu.models import AModel
from occm_tpu.parallel import make_mesh
from occm_tpu.train.loop import train

CUT = 3200
BATCH = 24  # groups_per_step=2 x meta_batch 12


class FakePipeline:
    """Deterministic per-epoch synthetic meta-batch stream; optionally
    injects a crash or a SIGTERM after `disturb_after` yields."""

    def __init__(self, n_batches, seed=0, disturb_after=None, disturb=None):
        self.n = n_batches
        self.seed = seed
        self.disturb_after = disturb_after
        self.disturb = disturb

    def epoch(self, epoch):
        gen = np.random.default_rng(self.seed * 1000 + epoch)
        labels = np.tile(np.array([0] * 6 + [1] * 6, np.int32), 2)
        for i in range(self.n):
            if self.disturb_after is not None and i == self.disturb_after:
                if self.disturb == "crash":
                    raise RuntimeError("synthetic preemption")
                if self.disturb == "sigterm":
                    os.kill(os.getpid(), signal.SIGTERM)
                    self.disturb_after = None  # deliver once
            yield (gen.normal(size=(BATCH, CUT)).astype(np.float32) * 0.1,
                   labels)


def _cfg(tmp_path, tag, every=2):
    return TrainConfig(
        lr=1e-3, num_epochs=1, compactness_weight=0.1,
        descriptiveness_weight=0.9, cut=CUT, groups_per_step=2,
        rawboost=RawBoostConfig(algo=0), mesh=MeshConfig(dp=8, tp=1),
        checkpoint_dir=str(tmp_path / tag), checkpoint_prefix="aasist_vocoded",
        loss_txt=str(tmp_path / f"loss_{tag}.txt"), log_every=100,
        checkpoint_every_steps=every,
    )


def _model():
    return AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())


def _run(cfg, pipeline, resume=False):
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    mesh = make_mesh(cfg.mesh)
    return train(_model(), pipeline, cfg, mesh=mesh, output_kind="dual",
                 resume=resume)


def _assert_states_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert int(a.step) == int(b.step)


@pytest.mark.slow
def test_crash_resume_is_bit_identical(tmp_path):
    """Kill after 3 of 5 dispatches (step checkpoint exists at opt step 2);
    --resume replays the epoch and the final state equals the
    uninterrupted run's, bit for bit."""
    from occm_tpu.train.checkpoint import latest_step_checkpoint

    ref_state = _run(_cfg(tmp_path, "ref"), FakePipeline(5))

    cfg_b = _cfg(tmp_path, "pre")
    with pytest.raises(RuntimeError, match="synthetic preemption"):
        _run(cfg_b, FakePipeline(5, disturb_after=3, disturb="crash"))
    assert latest_step_checkpoint(cfg_b.checkpoint_dir,
                                  cfg_b.checkpoint_prefix) == 2

    resumed = _run(cfg_b, FakePipeline(5), resume=True)
    _assert_states_equal(resumed, ref_state)


@pytest.mark.slow
def test_sigterm_saves_and_resume_is_bit_identical(tmp_path):
    """A real SIGTERM mid-epoch triggers one final step checkpoint at the
    next dispatch boundary (even off the every-N grid) and train()
    returns; --resume then finishes the epoch bit-identically."""
    from occm_tpu.train.checkpoint import latest_step_checkpoint

    ref_state = _run(_cfg(tmp_path, "ref2", every=100), FakePipeline(5))

    cfg_b = _cfg(tmp_path, "sig", every=100)  # never on the grid
    _run(cfg_b, FakePipeline(5, disturb_after=3, disturb="sigterm"))
    saved_at = latest_step_checkpoint(cfg_b.checkpoint_dir,
                                      cfg_b.checkpoint_prefix)
    assert saved_at is not None and 1 <= saved_at <= 4

    resumed = _run(cfg_b, FakePipeline(5), resume=True)
    _assert_states_equal(resumed, ref_state)


def test_step_checkpoint_keeps_only_newest(tmp_path):
    """Older step checkpoints are pruned only after a newer save succeeds;
    epoch-level resume still wins once the epoch checkpoint exists."""
    from occm_tpu.train.checkpoint import (
        latest_step_checkpoint, save_checkpoint,
    )

    cfg = _cfg(tmp_path, "prune", every=1)
    state = _run(cfg, FakePipeline(4))
    # 4 dispatches, every=1 -> saves at 1,2,3,4; only 4 remains
    names = [n for n in os.listdir(cfg.checkpoint_dir) if "_step_" in n]
    assert names == ["aasist_vocoded_step_4"]
    assert latest_step_checkpoint(cfg.checkpoint_dir,
                                  cfg.checkpoint_prefix) == 4

    # after the epoch checkpoint exists, a stale step checkpoint from the
    # finished epoch is ignored on resume (start_epoch advances past it)
    save_checkpoint(state, cfg.checkpoint_dir, cfg.checkpoint_prefix, 0)
    resumed = _run(cfg, FakePipeline(4), resume=True)
    _assert_states_equal(resumed, state)
