"""Multi-process SPMD worker: one process of an N-process CPU "pod".

Launched by tests/test_multiprocess.py with jax.distributed over a
localhost coordinator — the closest this environment gets to a real TPU
pod slice (multiple processes, each owning a subset of the global devices,
Gloo collectives between them). Validates what the 8-virtual-device
single-process tests cannot: global-array assembly from per-host shards
(parallel/sharding.py make_global_batch / put_global), state placement on
a mesh whose devices are mostly non-addressable, the input pipeline's
per-host sharding, and the train driver's multi-host tail padding.

The reference never leaves one host (torch DataParallel,
reference: oc_training.py:328); this is the pod superset SURVEY.md §5.8
calls for.
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def fingerprint(tree):
    import jax
    import numpy as np

    total = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "is_fully_addressable") and \
                not leaf.is_fully_addressable:
            # model-sharded leaf spanning non-addressable devices
            # (fsdp/tp across processes): gather the global value so the
            # fp64 host sum matches the single-process parent exactly
            from jax.experimental import multihost_utils

            leaf = multihost_utils.process_allgather(leaf, tiled=True)
        total += float(np.sum(np.abs(np.asarray(leaf, np.float64))))
    return total


def make_smooth_model(xlsr_cfg):
    """XLSR encoder + Dense dual head: every op is smooth (no BatchNorm,
    no top-k), so cross-topology reduction-order ulps stay at ulp scale
    through multiple optimizer steps. AASIST cannot be used for multi-step
    cross-topology comparisons: its GraphPool lax.top_k routes gradients
    discontinuously, and an ulp-level score tie flip produces a FINITE
    gradient difference (measured: step-1 losses agree to 1e-7, step-2
    loss after one SGD step differs 1.5%)."""
    import flax.linen as nn

    import jax.numpy as jnp
    from occm_tpu.models import XLSREncoder

    class DualHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            feats = XLSREncoder(xlsr_cfg, name="ssl")(x, train=train)
            pooled = jnp.mean(feats, axis=1)
            emb = nn.Dense(16, name="emb")(pooled)
            return emb, nn.Dense(2, name="head")(emb)

    return DualHead()


def main_model_shard(proc_id, n_proc, outdir, fixture):
    """4-process pod with MODEL-sharding axes crossing process
    boundaries: 1 local device each, mesh dp=1 x fsdp=2 x tp=2 over the
    4 global devices (r4 verdict item 9). Every collective — the tp
    all-reduces inside the forward, the fsdp all-gathers/reduce-scatters,
    the gradient reduction — runs cross-process over Gloo; the batch
    shards over fsdp only, so processes {0,1} hold replicas of batch
    shard 0 and {2,3} of shard 1 (their pipelines must load IDENTICAL
    data — parallel.data_shard_for_process). Exercises put_global /
    make_array_from_process_local_data under non-data axes."""
    import numpy as np
    import optax

    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from occm_tpu.config import (
        AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.data import MetaBatchPipeline, PFDataset
    from occm_tpu.models import AModel
    from occm_tpu.parallel import (
        compute_mesh, data_shard_for_process, make_mesh,
        place_state_on_mesh,
    )
    from occm_tpu.parallel.sharding import make_global_batch
    from occm_tpu.train.loop import make_multi_step, make_train_step, train
    from occm_tpu.train.state import create_train_state
    from occm_tpu.utils.logging import MetricsLogger

    cut = 3200
    meta = 12
    results = {"proc": proc_id, "n_devices": len(jax.devices())}

    cfg = TrainConfig(
        lr=1e-3, cut=cut, groups_per_step=1,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=1, fsdp=2, tp=2),
    )
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((meta, cut), jnp.float32)
    mesh = make_mesh(cfg.mesh)

    shard_idx, shard_cnt = data_shard_for_process(mesh)
    results["data_shard"] = [shard_idx, shard_cnt]
    assert shard_cnt == 2 and shard_idx == proc_id // 2, (
        shard_idx, shard_cnt)

    # global batch: 2 meta-batches sharded over fsdp; this process loads
    # the half its devices replicate (same data as its tp pair)
    gen = np.random.default_rng(0)
    x_global = (gen.normal(size=(2 * meta, cut)) * 0.1).astype(np.float32)
    lab_global = np.tile(np.array([0] * 6 + [1] * 6, np.int32), 2)
    x_local = x_global[shard_idx * meta:(shard_idx + 1) * meta]
    lab_local = lab_global[shard_idx * meta:(shard_idx + 1) * meta]

    step = make_train_step(cfg, output_kind="dual")
    state = create_train_state(model, rng, sample, optax.adam(cfg.lr))
    state = place_state_on_mesh(state, mesh)
    # params really are model-sharded across processes: some shards of a
    # TP-split kernel live on non-addressable devices
    qk = state.params["ssl_model"]["layers"]["layer"]["self_attn"][
        "q_proj"]["kernel"]
    assert not qk.is_fully_addressable
    with compute_mesh(mesh):
        batch = make_global_batch((x_local, lab_local), mesh, P("fsdp"))
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
    results["step_loss"] = float(metrics["loss"])
    results["step_fp"] = fingerprint(state.params)

    # chunk-level (smooth model + SGD — see make_smooth_model)
    k = 2
    xs_local = np.stack([x_local, x_local[::-1].copy()])
    ls_local = np.stack([lab_local, lab_local])
    smodel = make_smooth_model(XLSRConfig.tiny())
    state2 = create_train_state(smodel, rng, sample, optax.sgd(cfg.lr))
    state2 = place_state_on_mesh(state2, mesh)
    multi = make_multi_step(cfg, k, output_kind="dual")
    with compute_mesh(mesh):
        chunk = make_global_batch((xs_local, ls_local), mesh,
                                  P(None, "fsdp"))
        state2, m2 = multi(state2, chunk, jax.random.PRNGKey(9))
    results["chunk_loss"] = float(m2["loss"])
    results["chunk_fp"] = fingerprint(state2.params)

    # weighted-tail program: shard 0 real, shard 1 zero-weight padding
    w_local = np.full((meta,), 1.0 if shard_idx == 0 else 0.0, np.float32)
    state3 = create_train_state(model, rng, sample, optax.adam(cfg.lr))
    state3 = place_state_on_mesh(state3, mesh)
    with compute_mesh(mesh):
        batch3 = make_global_batch((x_local, lab_local, w_local), mesh,
                                   P("fsdp"))
        state3, m3 = step(state3, batch3, jax.random.PRNGKey(11))
    results["tail_loss"] = float(m3["loss"])
    results["tail_fp"] = fingerprint(state3.params)

    # driver-level: full train() with the mesh-aware pipeline sharding
    # (2 data shards over 4 processes)
    ds = PFDataset(
        os.path.join(fixture, "train.txt"),
        os.path.join(fixture, "train"),
        vocoded_dir=os.path.join(fixture, "vocoded"),
        cut=cut,
    )
    dcfg = TrainConfig(
        lr=1e-3, cut=cut, groups_per_step=2, steps_per_dispatch=2,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=1, fsdp=2, tp=2),
        loss_txt=os.path.join(outdir, f"loss_{proc_id}.txt"),
    )
    pipe = MetaBatchPipeline(
        ds, groups_per_step=dcfg.groups_per_step, shuffle=True, seed=0,
        decode_threads=2, mesh=mesh,
    )
    assert pipe.shard_count == 2 and pipe.shard_index == proc_id // 2
    results["steps_per_epoch"] = pipe.steps_per_epoch()
    dmodel = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    logger = MetricsLogger(
        loss_txt=dcfg.loss_txt,
        jsonl=os.path.join(outdir, f"metrics_{proc_id}.jsonl"),
    )
    final = train(dmodel, pipe, dcfg, mesh=make_mesh(dcfg.mesh),
                  logger=logger, output_kind="dual", num_epochs=1)
    results["driver_fp"] = fingerprint(final.params)
    results["driver_opt_steps"] = int(final.step)

    with open(os.path.join(outdir, f"result_{proc_id}.json"), "w") as f:
        json.dump(results, f)
    print(f"proc {proc_id} done", flush=True)


def main():
    proc_id = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]
    fixture = sys.argv[5]
    n_local_dev = int(sys.argv[6])
    mode = sys.argv[7] if len(sys.argv) > 7 else "dp"

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_dev}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NOTE: deliberately NO persistent compile cache here. Sharing the
    # suite's cache (tests/conftest.py) looked like an easy speedup, but
    # XLA:CPU AOT cache loads under jax.distributed crash workers on this
    # host (machine-feature-stamp mismatch -> one worker dies -> the
    # others' Gloo context init times out at 30 s; measured r5).
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc,
        process_id=proc_id,
    )
    assert jax.process_count() == n_proc
    n_global = n_proc * n_local_dev

    if mode == "model_shard":
        main_model_shard(proc_id, n_proc, outdir, fixture)
        return

    import numpy as np
    import optax

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from occm_tpu.config import (
        AASISTConfig, MeshConfig, RawBoostConfig, TrainConfig, XLSRConfig,
    )
    from occm_tpu.data import MetaBatchPipeline, PFDataset
    from occm_tpu.models import AModel
    from occm_tpu.parallel import compute_mesh, make_mesh, place_state_on_mesh
    from occm_tpu.parallel.sharding import make_global_batch
    from occm_tpu.train.loop import make_multi_step, make_train_step, train
    from occm_tpu.train.state import create_train_state
    from occm_tpu.utils.logging import MetricsLogger

    cut = 3200
    meta = 12
    results = {"proc": proc_id, "n_devices": len(jax.devices())}

    cfg = TrainConfig(
        lr=1e-3, cut=cut, groups_per_step=1,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=n_global, tp=1),
    )
    model = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((meta, cut), jnp.float32)
    mesh = make_mesh(cfg.mesh)

    # ---- step-level: global batch of n_proc meta-batches, one per host.
    # The parent runs the IDENTICAL global batch single-process; losses and
    # updated params must agree (same SPMD program, Gloo vs local copies).
    gen = np.random.default_rng(0)
    x_global = (gen.normal(size=(n_proc * meta, cut)) * 0.1).astype(np.float32)
    lab_global = np.tile(np.array([0] * 6 + [1] * 6, np.int32), n_proc)
    x_local = x_global[proc_id * meta:(proc_id + 1) * meta]
    lab_local = lab_global[proc_id * meta:(proc_id + 1) * meta]

    state = create_train_state(model, rng, sample, optax.adam(cfg.lr))
    state = place_state_on_mesh(state, mesh)
    step = make_train_step(cfg, output_kind="dual")
    with compute_mesh(mesh):
        batch = make_global_batch((x_local, lab_local), mesh, P("dp"))
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
    results["step_loss"] = float(metrics["loss"])
    results["step_fp"] = fingerprint(state.params)

    # ---- chunk-level: [k, B, T] stacked dispatch through the scanned
    # multi-step, chunk sharding P(None, "dp") assembled from local shards.
    # Smooth model + SGD: multi-step cross-topology equivalence is only
    # meaningful when ulps stay ulps — AASIST's top-k gradient routing and
    # Adam's sign-sensitive update each amplify reduction-order ulps into
    # finite divergence by step 2 (see make_smooth_model docstring).
    k = 2
    xs_local = np.stack([x_local, x_local[::-1].copy()])
    ls_local = np.stack([lab_local, lab_local])
    smodel = make_smooth_model(XLSRConfig.tiny())
    state2 = create_train_state(smodel, rng, sample, optax.sgd(cfg.lr))
    state2 = place_state_on_mesh(state2, mesh)
    multi = make_multi_step(cfg, k, output_kind="dual")
    with compute_mesh(mesh):
        chunk = make_global_batch((xs_local, ls_local), mesh, P(None, "dp"))
        state2, m2 = multi(state2, chunk, jax.random.PRNGKey(9))
    results["chunk_loss"] = float(m2["loss"])
    results["chunk_fp"] = fingerprint(state2.params)

    # ---- weighted-tail program (the multi-host ragged-tail path): host 0
    # contributes a real meta-batch with weight 1, every other host a
    # zero-weight padding group. The parent replays the identical padded
    # global batch + weights single-process.
    x_tail, lab_tail = x_local, lab_local
    w_tail = np.full((meta,), 1.0 if proc_id == 0 else 0.0, np.float32)
    state3 = create_train_state(model, rng, sample, optax.adam(cfg.lr))
    state3 = place_state_on_mesh(state3, mesh)
    with compute_mesh(mesh):
        batch3 = make_global_batch(
            (x_tail, lab_tail, w_tail), mesh, P("dp")
        )
        state3, m3 = step(state3, batch3, jax.random.PRNGKey(11))
    results["tail_loss"] = float(m3["loss"])
    results["tail_fp"] = fingerprint(state3.params)

    # ---- driver-level: the full train() loop over the fixture tree with
    # the pipeline's per-host input sharding (shard defaults come from
    # jax.process_index()/process_count()) and the padded-tail path.
    # 11 bonafide -> shard_len 5/host -> 2 full groups of 2 + ragged 1:
    # covers chunked dispatch AND the 3-tuple padded tail in one epoch.
    ds = PFDataset(
        os.path.join(fixture, "train.txt"),
        os.path.join(fixture, "train"),
        vocoded_dir=os.path.join(fixture, "vocoded"),
        cut=cut,
    )
    dcfg = TrainConfig(
        lr=1e-3, cut=cut, groups_per_step=2, steps_per_dispatch=2,
        compactness_weight=0.1, descriptiveness_weight=0.9,
        rawboost=RawBoostConfig(algo=0),
        mesh=MeshConfig(dp=n_global, tp=1),
        loss_txt=os.path.join(outdir, f"loss_{proc_id}.txt"),
    )
    pipe = MetaBatchPipeline(
        ds, groups_per_step=dcfg.groups_per_step, shuffle=True, seed=0,
        decode_threads=2,
    )
    assert pipe.shard_count == n_proc and pipe.shard_index == proc_id
    results["steps_per_epoch"] = pipe.steps_per_epoch()
    dmodel = AModel(AASISTConfig.tiny(), xlsr_cfg=XLSRConfig.tiny())
    logger = MetricsLogger(
        loss_txt=dcfg.loss_txt,
        jsonl=os.path.join(outdir, f"metrics_{proc_id}.jsonl"),
    )
    final = train(dmodel, pipe, dcfg, mesh=make_mesh(dcfg.mesh),
                  logger=logger, output_kind="dual", num_epochs=1)
    results["driver_fp"] = fingerprint(final.params)
    results["driver_opt_steps"] = int(final.step)

    with open(os.path.join(outdir, f"result_{proc_id}.json"), "w") as f:
        json.dump(results, f)
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
