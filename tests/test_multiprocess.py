"""True multi-process SPMD validation over a localhost jax.distributed
"pod": 2 processes x 4 virtual CPU devices = 8 global devices with Gloo
collectives between the processes.

This is the missing half of the multi-host story (SURVEY.md §5.8): the
8-virtual-device single-process tests exercise the SPMD math, but only a
real multi-process run exercises non-addressable devices — global-array
assembly from per-host pipeline shards (make_global_batch), state
placement via put_global, the driver's multi-host ragged-tail padding,
and cross-process collectives. The reference's DataParallel never leaves
one host (reference: oc_training.py:328); this validates the pod superset.

The parent (this process, 8 local devices) replays the identical global
batches single-process. Comparison semantics (each pinned below):
(a) worker vs worker — bit-deterministic, exact;
(b) worker vs parent, single step — fp tolerance only: Gloo's reduction
    order differs from single-process at ulp level, and AASIST's top-k /
    Adam's normalized update amplify ulps (see the per-test docstrings);
(c) worker vs parent, multi-step — smooth model + SGD, fp tolerance.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from occm_tpu.io.wav import write_wav
from occm_tpu.parallel import compute_mesh

pytestmark = pytest.mark.slow  # 2 worker processes x many CPU compiles

SR = 16000
CUT = 3200
META = 12
N_PROC = 2
N_LOCAL_DEV = 4


def _make_fixture(root):
    """11 bonafide + 2 spoof: shard_len 5/host -> 2 full G=2 groups + a
    ragged tail group, covering the chunked dispatch AND the padded-tail
    path inside one worker epoch."""
    train_dir = root / "train"
    vocoded_dir = root / "vocoded"
    train_dir.mkdir()
    vocoded_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(11):
        utt = f"LA_T_b{i:04d}"
        t = np.arange(2500 + 100 * i) / SR
        wave = 0.3 * np.sin(2 * np.pi * (200 + 20 * i) * t)
        write_wav(str(train_dir / f"{utt}.wav"), wave, SR)
        lines.append(f"LA_{i:04d} {utt} - - bonafide")
        for voc in ("hifigan", "hn-sinc-nsf-hifi", "hn-sinc-nsf", "melgan",
                    "waveglow"):
            vwave = wave + 0.05 * rng.normal(size=wave.shape)
            write_wav(str(vocoded_dir / f"{voc}_{utt}.wav"), vwave, SR)
    for i in range(2):
        utt = f"LA_T_s{i:04d}"
        write_wav(str(train_dir / f"{utt}.wav"),
                  0.3 * rng.normal(size=2800), SR)
        lines.append(f"LA_{100 + i:04d} {utt} - A0{i} spoof")
    (root / "train.txt").write_text("\n".join(lines) + "\n")


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp")
    _make_fixture(root)
    outdir = root / "out"
    outdir.mkdir()

    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(N_PROC), "12421",
             str(outdir), str(root), str(N_LOCAL_DEV)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(N_PROC)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    results = []
    for i in range(N_PROC):
        with open(outdir / f"result_{i}.json") as f:
            results.append(json.load(f))
    return results, root


def _parent_state_and_step(cfg_lr=1e-3):
    import optax

    from occm_tpu.config import (
        AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.models import AModel
    from occm_tpu.parallel import compute_mesh, make_mesh, place_state_on_mesh
    from occm_tpu.train.loop import make_multi_step, make_train_step
    from occm_tpu.train.state import create_train_state

    cfg = TrainConfig(
        lr=cfg_lr, cut=CUT, groups_per_step=1,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=N_PROC * N_LOCAL_DEV, tp=1),
    )
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((META, CUT), jnp.float32)
    mesh = make_mesh(cfg.mesh)

    def fresh_state():
        state = create_train_state(model, rng, sample,
                                   optax.adam(cfg.lr))
        return place_state_on_mesh(state, mesh)

    return (cfg, mesh, fresh_state,
            make_train_step(cfg, output_kind="dual"),
            make_multi_step(cfg, 2, output_kind="dual"))


def _fingerprint(tree):
    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        total += float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    return total


def test_workers_agree_with_each_other(worker_results):
    results, _ = worker_results
    a, b = results
    assert a["n_devices"] == b["n_devices"] == N_PROC * N_LOCAL_DEV
    for key in ("step_loss", "chunk_loss", "tail_loss", "step_fp",
                "chunk_fp", "tail_fp", "driver_fp"):
        assert a[key] == pytest.approx(b[key], rel=1e-6), key
    # 2 chunked optimizer steps + 1 padded-tail step
    assert a["driver_opt_steps"] == b["driver_opt_steps"] == 3
    assert a["steps_per_epoch"] == 3


def test_multiprocess_step_matches_single_process(worker_results):
    """The 2-process global step must equal the same step run
    single-process on 8 local devices (same SPMD program)."""
    results, _ = worker_results
    cfg, mesh, fresh_state, step, multi = _parent_state_and_step()
    from occm_tpu.parallel.sharding import make_global_batch

    gen = np.random.default_rng(0)
    x = (gen.normal(size=(N_PROC * META, CUT)) * 0.1).astype(np.float32)
    labels = np.tile(np.array([0] * 6 + [1] * 6, np.int32), N_PROC)

    state = fresh_state()
    with compute_mesh(mesh):
        batch = make_global_batch((x, labels), mesh, P("dp"))
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert results[0]["step_loss"] == pytest.approx(
        float(metrics["loss"]), rel=1e-5)
    # cross-topology tolerance: Gloo's allreduce order differs from the
    # single-process reduction, and Adam's normalized update flips sign on
    # near-zero-gradient elements under ulp-level grad perturbations
    # (observed rel ~4e-6 on the abs-sum fingerprint after one step)
    assert results[0]["step_fp"] == pytest.approx(
        _fingerprint(state.params), rel=5e-5)


def test_multiprocess_chunk_matches_single_process(worker_results):
    """Two scanned optimizer steps, cross-topology. Smooth model + SGD,
    matching the worker: multi-step cross-topology equivalence requires
    every op's gradient to be continuous (AASIST's GraphPool top-k flips
    node routing on ulp-level score ties — measured 1.5% step-2 loss
    divergence) and an optimizer whose update is Lipschitz in the gradient
    (Adam's normalized update sign-flips near zero). With both removed,
    the trajectories agree to fp tolerance."""
    import optax

    import mp_worker
    from occm_tpu.parallel import place_state_on_mesh
    from occm_tpu.parallel.sharding import make_global_batch
    from occm_tpu.train.state import create_train_state

    results, _ = worker_results
    cfg, mesh, fresh_state, step, multi = _parent_state_and_step()

    gen = np.random.default_rng(0)
    x = (gen.normal(size=(N_PROC * META, CUT)) * 0.1).astype(np.float32)
    labels = np.tile(np.array([0] * 6 + [1] * 6, np.int32), N_PROC)
    # the worker stacks [x_local, x_local[::-1]] per host: reproduce the
    # same GLOBAL chunk layout (concat per host along the batch axis)
    xs = np.stack([x, np.concatenate(
        [x[i * META:(i + 1) * META][::-1] for i in range(N_PROC)])])
    ls = np.stack([labels, labels])

    from occm_tpu.config import XLSRConfig

    smodel = mp_worker.make_smooth_model(XLSRConfig.tiny())
    state = place_state_on_mesh(
        create_train_state(smodel, jax.random.PRNGKey(0),
                           jnp.zeros((META, CUT), jnp.float32),
                           optax.sgd(cfg.lr)),
        mesh,
    )
    with compute_mesh(mesh):
        chunk = make_global_batch((xs, ls), mesh, P(None, "dp"))
        state, m = multi(state, chunk, jax.random.PRNGKey(9))
    assert results[0]["chunk_loss"] == pytest.approx(float(m["loss"]),
                                                     rel=1e-5)
    assert results[0]["chunk_fp"] == pytest.approx(
        _fingerprint(state.params), rel=1e-5)


def test_multiprocess_weighted_tail_matches_single_process(worker_results):
    results, _ = worker_results
    cfg, mesh, fresh_state, step, multi = _parent_state_and_step()
    from occm_tpu.parallel.sharding import make_global_batch

    gen = np.random.default_rng(0)
    x = (gen.normal(size=(N_PROC * META, CUT)) * 0.1).astype(np.float32)
    labels = np.tile(np.array([0] * 6 + [1] * 6, np.int32), N_PROC)
    w = np.concatenate([np.ones((META,), np.float32),
                        np.zeros(((N_PROC - 1) * META,), np.float32)])

    state = fresh_state()
    with compute_mesh(mesh):
        batch = make_global_batch((x, labels, w), mesh, P("dp"))
        state, m = step(state, batch, jax.random.PRNGKey(11))
    assert results[0]["tail_loss"] == pytest.approx(float(m["loss"]),
                                                    rel=1e-5)
    assert results[0]["tail_fp"] == pytest.approx(
        _fingerprint(state.params), rel=5e-5)  # see step_fp comment


# ---------------- 4-process pod with MODEL-sharding axes (r4 item 9) ----

N_PROC_MS = 4


@pytest.fixture(scope="module")
def model_shard_results(tmp_path_factory):
    """4 processes x 1 local device, mesh dp=1 x fsdp=2 x tp=2: every
    axis crosses a process boundary, so the tp all-reduces, the fsdp
    all-gather/reduce-scatter pairs AND the data-shard replication all
    ride Gloo between processes."""
    root = tmp_path_factory.mktemp("mp_ms")
    _make_fixture(root)
    outdir = root / "out"
    outdir.mkdir()

    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(N_PROC_MS), "12431",
             str(outdir), str(root), "1", "model_shard"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(N_PROC_MS)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=2400)
        outs.append(out.decode())
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i][-4000:]}"

    results = []
    for i in range(N_PROC_MS):
        with open(outdir / f"result_{i}.json") as f:
            results.append(json.load(f))
    return results, root


def _parent_model_shard(cfg_lr=1e-3):
    import optax

    from occm_tpu.config import (
        AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.models import AModel
    from occm_tpu.parallel import make_mesh, place_state_on_mesh
    from occm_tpu.train.loop import make_multi_step, make_train_step
    from occm_tpu.train.state import create_train_state

    cfg = TrainConfig(
        lr=cfg_lr, cut=CUT, groups_per_step=1,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=1, fsdp=2, tp=2),
    )
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    mesh = make_mesh(cfg.mesh, devices=jax.devices()[:4])

    def fresh_state():
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((META, CUT), jnp.float32), optax.adam(cfg.lr))
        return place_state_on_mesh(state, mesh)

    return (cfg, mesh, fresh_state,
            make_train_step(cfg, output_kind="dual"),
            make_multi_step(cfg, 2, output_kind="dual"))


def _ms_global_batch():
    gen = np.random.default_rng(0)
    x = (gen.normal(size=(2 * META, CUT)) * 0.1).astype(np.float32)
    labels = np.tile(np.array([0] * 6 + [1] * 6, np.int32), 2)
    return x, labels


def test_model_shard_workers_agree(model_shard_results):
    results, _ = model_shard_results
    for i, r in enumerate(results):
        assert r["n_devices"] == N_PROC_MS
        # tp-paired processes {0,1} / {2,3} map onto data shards 0 / 1
        assert r["data_shard"] == [i // 2, 2]
    a = results[0]
    for b in results[1:]:
        for key in ("step_loss", "chunk_loss", "tail_loss", "step_fp",
                    "chunk_fp", "tail_fp", "driver_fp"):
            assert a[key] == pytest.approx(b[key], rel=1e-6), key
    # 11 bona over 2 data shards -> shard_len 5 -> 2 full G=2 + ragged 1
    assert a["steps_per_epoch"] == 3
    assert a["driver_opt_steps"] == 3


def test_model_shard_step_matches_single_process(model_shard_results):
    """fsdp x tp global step over 4 processes == the same step on one
    process (4 local devices of the parent's 8)."""
    results, _ = model_shard_results
    cfg, mesh, fresh_state, step, multi = _parent_model_shard()
    from occm_tpu.parallel import compute_mesh
    from occm_tpu.parallel.sharding import make_global_batch

    x, labels = _ms_global_batch()
    state = fresh_state()
    with compute_mesh(mesh):
        batch = make_global_batch((x, labels), mesh, P("fsdp"))
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
    assert results[0]["step_loss"] == pytest.approx(
        float(metrics["loss"]), rel=1e-5)
    assert results[0]["step_fp"] == pytest.approx(
        _fingerprint(state.params), rel=5e-5)


def test_model_shard_chunk_matches_single_process(model_shard_results):
    import optax

    import mp_worker
    from occm_tpu.config import XLSRConfig
    from occm_tpu.parallel import compute_mesh, place_state_on_mesh
    from occm_tpu.parallel.sharding import make_global_batch
    from occm_tpu.train.state import create_train_state

    results, _ = model_shard_results
    cfg, mesh, fresh_state, step, multi = _parent_model_shard()

    x, labels = _ms_global_batch()
    # worker chunk layout: per data shard, step 2 reverses the shard rows
    xs = np.stack([x, np.concatenate(
        [x[s * META:(s + 1) * META][::-1] for s in range(2)])])
    ls = np.stack([labels, labels])

    smodel = mp_worker.make_smooth_model(XLSRConfig.tiny())
    state = place_state_on_mesh(
        create_train_state(smodel, jax.random.PRNGKey(0),
                           jnp.zeros((META, CUT), jnp.float32),
                           optax.sgd(cfg.lr)),
        mesh,
    )
    with compute_mesh(mesh):
        chunk = make_global_batch((xs, ls), mesh, P(None, "fsdp"))
        state, m = multi(state, chunk, jax.random.PRNGKey(9))
    assert results[0]["chunk_loss"] == pytest.approx(float(m["loss"]),
                                                     rel=1e-5)
    assert results[0]["chunk_fp"] == pytest.approx(
        _fingerprint(state.params), rel=1e-5)


def test_model_shard_weighted_tail_matches_single_process(
        model_shard_results):
    results, _ = model_shard_results
    cfg, mesh, fresh_state, step, multi = _parent_model_shard()
    from occm_tpu.parallel import compute_mesh
    from occm_tpu.parallel.sharding import make_global_batch

    x, labels = _ms_global_batch()
    w = np.concatenate([np.ones((META,), np.float32),
                        np.zeros((META,), np.float32)])
    state = fresh_state()
    with compute_mesh(mesh):
        batch = make_global_batch((x, labels, w), mesh, P("fsdp"))
        state, m = step(state, batch, jax.random.PRNGKey(11))
    assert results[0]["tail_loss"] == pytest.approx(float(m["loss"]),
                                                    rel=1e-5)
    assert results[0]["tail_fp"] == pytest.approx(
        _fingerprint(state.params), rel=5e-5)
