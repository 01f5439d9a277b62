"""pjit data-parallel one-class training loop.

Semantics parity (reference: oc_training.py:344-401):
- meta-batches of 12 (6 bona + 1 spoof + 5 vocoded),
- loss = cw * compactness(emb[:6]) + dw * descriptiveness(logits, labels)
  per meta-batch (reference: oc_training.py:380-382),
- Adam, per-epoch checkpoints, loss.txt/wandb running averages.

TPU-first differences:
- G meta-batches are stacked [G*12, T] and shard over the dp mesh axis;
  compactness is computed per group and averaged (G=1 reproduces the
  reference exactly). Gradients all-reduce over ICI via GSPMD.
- everything in one jitted step with donated state (no per-step host sync
  except the scalar metrics fetch).
- optional on-device fused RawBoost inside the step (the reference left its
  RawBoost call commented out at oc_training.py:221,238 — default off, knob
  preserved).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from occm_tpu.augment import batch_rawboost
from occm_tpu.config import TrainConfig
from occm_tpu.losses import compactness_loss, descriptiveness_loss
from occm_tpu.parallel import (
    compute_mesh, make_mesh, place_state_on_mesh, shard_batch,
    train_state_shardings,
)
from occm_tpu.train.state import TrainState, create_train_state
from occm_tpu.utils.logging import MetricsLogger


def group_one_class_loss(emb, logits, labels, cw: float, dw: float,
                         meta_batch: int = 12, weights=None):
    """Per-meta-batch compactness + global descriptiveness.

    emb [G*12, D], logits [G*12, 2], labels [G*12].

    weights: optional [G*12] 0/1 utterance mask, constant within each
    meta-batch — masks out the repeat-padded groups of a multi-host ragged
    tail so the weighted means equal the plain means over the real groups."""
    g = emb.shape[0] // meta_batch
    emb_g = emb.reshape(g, meta_batch, -1)
    c_per_group = jax.vmap(compactness_loss)(emb_g)
    if weights is None:
        c_loss = jnp.mean(c_per_group)
    else:
        w_g = weights.reshape(g, meta_batch)[:, 0].astype(c_per_group.dtype)
        c_loss = jnp.sum(c_per_group * w_g) / jnp.maximum(jnp.sum(w_g), 1.0)
    d_loss = descriptiveness_loss(logits, labels, weights)
    return cw * c_loss + dw * d_loss, (c_loss, d_loss)


def _jit_step(fn: Callable, state_shardings) -> Callable:
    """jit with donated state; when `state_shardings` (a TrainState-shaped
    NamedSharding tree from parallel.train_state_shardings) is given, pin
    the output state to it via out_shardings — otherwise GSPMD propagation
    may legally emit a different output placement, breaking the
    opt-state-stays-sharded invariant and recompiling on the next step
    when the donated input sharding no longer matches the compiled one.
    Metrics (scalars) are replicated."""
    if state_shardings is None:
        return partial(jax.jit, donate_argnums=(0,))(fn)
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = next(
        s.mesh for s in jax.tree_util.tree_leaves(state_shardings)
        if hasattr(s, "mesh")
    )
    rep = NamedSharding(mesh, PartitionSpec())
    return jax.jit(fn, donate_argnums=(0,),
                   out_shardings=(state_shardings, rep))


def make_multi_step(cfg: TrainConfig, n_steps: int,
                    apply_rawboost: bool = False,
                    output_kind: str = "dual",
                    state_shardings=None) -> Callable:
    """lax.scan over n_steps stacked batches — the whole chunk runs on
    device with zero host round trips between steps.

    batches: (x [n_steps, B, T], labels [n_steps, B]). Returns
    (state, metrics) with metrics averaged over the chunk. Amortises the
    fixed per-step dispatch cost (~33 ms measured through the remote-TPU
    tunnel) that a Python step loop pays every iteration.
    """
    step_body = _train_step_body(cfg, apply_rawboost, output_kind)

    def multi_step(state: TrainState, batches, rng):
        # batches: (xs, labels) or (xs, labels, weights), each [n_steps, ...]

        def body(carry, inp):
            state, rng = carry
            rng, step_rng = jax.random.split(rng)
            state, metrics = step_body(state, inp, step_rng)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(
            body, (state, rng), tuple(batches)
        )
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    return _jit_step(multi_step, state_shardings)


def make_train_step(cfg: TrainConfig, apply_rawboost: bool = False,
                    output_kind: str = "dual",
                    state_shardings=None) -> Callable:
    """Build the jitted train step.

    output_kind: "dual" for models returning (emb, logits) (AASIST,
    SE-ResNet dual head); "logits" for plain classifiers (no compactness);
    "angle" for the A-softmax (cos, psi) head + AngleLoss.
    state_shardings: optional TrainState-shaped NamedSharding tree
    (parallel.train_state_shardings) pinning the output state placement.
    """
    return _jit_step(
        _train_step_body(cfg, apply_rawboost, output_kind), state_shardings
    )


def make_optimizer(cfg: TrainConfig):
    """Build the optimizer from cfg: optax Adam under the configured lr
    schedule ("constant" reproduces the reference's fixed lr,
    oc_training.py:324), or the single-pass Pallas FusedAdam.

    Returns (tx, schedule_fn) — schedule_fn(step)->lr for logging (None for
    fused_adam, whose lr is a fixed scalar; cfg validation rejects
    non-constant schedules with it)."""
    if cfg.optimizer == "fused_adam":
        from occm_tpu.ops.fused_adam import FusedAdam

        return FusedAdam(cfg.lr), None
    if cfg.lr_schedule == "constant":
        # plain scalar adam, NOT adam(constant_schedule(lr)): a schedule
        # callable swaps optax's trailing EmptyState for a
        # ScaleByScheduleState, silently changing the checkpoint tree —
        # restores against a plain-adam template then fail structurally
        # (caught by tests/test_cli_training.py). Scalar lr reproduces
        # the reference exactly (oc_training.py:324) and keeps the
        # checkpoint layout stable.
        return optax.adam(cfg.lr), optax.constant_schedule(cfg.lr)
    if cfg.lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.lr,
            warmup_steps=cfg.warmup_steps,
            decay_steps=cfg.warmup_steps + cfg.decay_steps,
            end_value=cfg.lr * cfg.lr_end_ratio,
        )
    else:  # linear
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr, max(cfg.warmup_steps, 1)),
             optax.linear_schedule(cfg.lr, cfg.lr * cfg.lr_end_ratio,
                                   cfg.decay_steps)],
            boundaries=[cfg.warmup_steps],
        )
    return optax.adam(sched), sched


def _train_step_body(cfg: TrainConfig, apply_rawboost: bool,
                     output_kind: str) -> Callable:
    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, dict]:
        # batch: (x, labels) or (x, labels, weights) — weights is the 0/1
        # utterance mask of a repeat-padded multi-host ragged tail
        x, labels = batch[0], batch[1]
        weights = batch[2] if len(batch) == 3 else None
        rb_rng, drop_rng = jax.random.split(rng)
        if apply_rawboost and cfg.rawboost.algo != 0:
            x = batch_rawboost(rb_rng, x, cfg.rawboost)

        def loss_fn(params, batch_stats, x, labels, weights, drop_rng):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out, mutated = state.apply_fn(
                variables, x, train=True,
                rngs={"dropout": drop_rng},
                mutable=["batch_stats"] if batch_stats else [],
            )
            if output_kind == "dual":
                emb, logits = out
                loss, (c_loss, d_loss) = group_one_class_loss(
                    emb, logits, labels,
                    cfg.compactness_weight, cfg.descriptiveness_weight,
                    cfg.meta_batch, weights,
                )
            elif output_kind == "occm":
                # dual-branch OCCM (reference: models/occm.py:48-67 returns
                # (senet34_output, lcnn_output); the reference ships no OCCM
                # trainer, so the loss composes its formulas: compactness on
                # the SE-ResNet embedding, descriptiveness averaged over
                # both classifier heads)
                (emb, senet_logits), lcnn_logits = out
                loss_s, (c_loss, d_s) = group_one_class_loss(
                    emb, senet_logits, labels,
                    cfg.compactness_weight, cfg.descriptiveness_weight,
                    cfg.meta_batch, weights,
                )
                d_l = descriptiveness_loss(lcnn_logits, labels, weights)
                d_loss = 0.5 * (d_s + d_l)
                loss = (cfg.compactness_weight * c_loss
                        + cfg.descriptiveness_weight * d_loss)
            elif output_kind == "angle":
                # A-softmax head: (cos_theta, psi_theta) + AngleLoss with
                # the step counter as the annealing iteration
                # (reference: models/lcnn.py:86-118, oc_training.py:334-335)
                from occm_tpu.losses import AngleLossState, angle_loss

                d_loss, _ = angle_loss(
                    out, labels,
                    AngleLossState(it=state.step.astype(jnp.int32)),
                    weights=weights,
                )
                c_loss = jnp.zeros(())
                loss = cfg.descriptiveness_weight * d_loss
            else:
                logits = out
                d_loss = descriptiveness_loss(logits, labels, weights)
                c_loss = jnp.zeros(())
                loss = cfg.descriptiveness_weight * d_loss
            new_stats = mutated.get("batch_stats", batch_stats) \
                if isinstance(mutated, dict) else batch_stats
            return loss, (c_loss, d_loss, new_stats)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        accum = max(1, cfg.grad_accum)
        if accum > 1 and (x.shape[0] // cfg.meta_batch) % accum != 0:
            # Ragged tail batch (pipeline drop_remainder=False yields a
            # last batch with fewer groups than TrainConfig validated).
            # Shapes are static at trace time, so fall back to the
            # single-pass gradient here — exact by construction, since
            # accumulation is DEFINED to equal the big-batch update.
            # Without this, the reshape below either fails at trace time
            # or silently splits meta-batches across micro-batches and
            # computes a wrong compactness gradient (r4 advisor, high).
            accum = 1
        if accum == 1:
            (loss, (c_loss, d_loss, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, x, labels, weights, drop_rng
            )
        else:
            # Micro-batched accumulation: scan the forward+backward over
            # `accum` equal micro-batches (whole meta-batches each —
            # enforced by TrainConfig.__post_init__) and sum gradients
            # pre-scaled by each micro-batch's share r_i of the global
            # weighted denominator. Both loss terms are ratios of weighted
            # sums whose weights are constant within a meta-batch, so
            # r_i = sum(w_micro)/sum(w_global) makes
            # sum_i r_i * grad(micro_loss_i) EXACTLY the big-batch
            # gradient (and sum_i r_i * micro_loss_i the big-batch loss) —
            # ragged multi-host tails included (tests/test_grad_accum.py).
            # BatchNorm running stats chain sequentially micro->micro.
            mb = x.shape[0] // accum
            xs = x.reshape((accum, mb) + x.shape[1:])
            ls = labels.reshape(accum, mb)
            drop_rngs = jax.random.split(drop_rng, accum)
            if weights is None:
                ws = None
                rs = jnp.full((accum,), 1.0 / accum, jnp.float32)
            else:
                # INVARIANT: weights is a 0/1 mask, constant within each
                # meta-batch (multi-host ragged-tail padding). The r_i
                # scaling is exactly equivalent to the big-batch update
                # only because of this — the max(sum(w),1) guards in rs,
                # descriptiveness_loss and the group compactness
                # denominator cancel only for integer masks; fractional
                # weights would silently diverge (r4 advisor).
                ws = weights.reshape(accum, mb)
                rs = jnp.sum(ws, axis=1) / jnp.maximum(
                    jnp.sum(weights), 1.0)

            def accum_body(carry, inp):
                acc, stats = carry
                if ws is None:
                    xi, li, ri, ki = inp
                    wi = None
                else:
                    xi, li, wi, ri, ki = inp
                (loss_i, (c_i, d_i, stats_i)), g_i = grad_fn(
                    state.params, stats, xi, li, wi, ki)
                acc = jax.tree_util.tree_map(
                    lambda a, g: a + ri * g, acc, g_i)
                return (acc, stats_i), (ri * loss_i, ri * c_i, ri * d_i)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            inputs = (xs, ls, rs, drop_rngs) if ws is None else \
                (xs, ls, ws, rs, drop_rngs)
            (grads, new_stats), (losses, closses, dlosses) = jax.lax.scan(
                accum_body, (zero, state.batch_stats), inputs)
            loss = jnp.sum(losses)
            c_loss = jnp.sum(closses)
            d_loss = jnp.sum(dlosses)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {"loss": loss, "closs": c_loss, "dloss": d_loss}
        return new_state, metrics

    return train_step


def chunk_batches(batch_iter, full_batch: int, k_dispatch: int):
    """Group an epoch's (x, labels) stream into ("chunk", xs, ls) stacks of
    k_dispatch for the scanned multi-step dispatch, flushing everything that
    can't fill a fixed-shape chunk through ("single", x, l) items so no
    batch is ever dropped (VERDICT r1 item 8) AND optimizer updates stay in
    data order (the reference steps strictly per meta-batch,
    oc_training.py:363): a ragged smaller-shape batch flushes the buffered
    full batches before itself, never ahead of them."""
    import numpy as np

    if k_dispatch == 1:
        for x, labels in batch_iter:
            yield "single", x, jnp.asarray(labels, jnp.int32)
        return
    xs, ls = [], []
    for x, labels in batch_iter:
        if x.shape[0] != full_batch:
            for xb, lb in zip(xs, ls):
                yield "single", xb, lb
            xs, ls = [], []
            yield "single", np.asarray(x), np.asarray(labels, np.int32)
            continue
        xs.append(np.asarray(x))
        ls.append(np.asarray(labels, np.int32))
        if len(xs) == k_dispatch:
            # stack on host: a single device_put then shards the chunk
            yield "chunk", np.stack(xs), np.stack(ls)
            xs, ls = [], []
    for x, l in zip(xs, ls):
        yield "single", x, l


def train(
    model,
    pipeline,
    cfg: TrainConfig,
    mesh=None,
    logger: Optional[MetricsLogger] = None,
    checkpoint_fn: Optional[Callable] = None,
    output_kind: str = "dual",
    num_epochs: Optional[int] = None,
    sample_input=None,
    param_graft: Optional[Callable] = None,
    stats_graft: Optional[Callable] = None,
    resume: bool = False,
):
    """Full training driver (reference: oc_training.py:344-401 semantics).

    param_graft(params) -> params runs once after init — e.g. to graft the
    converted xlsr2_300m weights into the `ssl_model`/`frontend` scope (the
    reference instead loads fairseq weights at model construction,
    models/xlsr.py:29-30). stats_graft(batch_stats) -> batch_stats does the
    same for BatchNorm running stats (full-model warm starts, --init_from).

    resume=True restores the latest `{cfg.checkpoint_prefix}_{epoch}` orbax
    checkpoint from cfg.checkpoint_dir and continues at the next epoch —
    the resume logic the reference lacks (SURVEY.md §5.4).
    """
    mesh = mesh or make_mesh(cfg.mesh)
    logger = logger or MetricsLogger(loss_txt=cfg.loss_txt,
                                     wandb_project=cfg.wandb_project)
    rng = jax.random.PRNGKey(cfg.seed)

    if sample_input is None:
        sample_input = jnp.zeros(
            (cfg.groups_per_step * cfg.meta_batch, cfg.cut), jnp.float32
        )
    tx, _ = make_optimizer(cfg)
    rng, init_rng = jax.random.split(rng)
    state = create_train_state(model, init_rng, sample_input, tx)
    if param_graft is not None:
        new_params = param_graft(state.params)
        state = state.replace(
            params=new_params, opt_state=tx.init(new_params)
        )
    if stats_graft is not None:
        state = state.replace(batch_stats=stats_graft(state.batch_stats))

    start_epoch = 0
    resume_progress = None
    if resume:
        from occm_tpu.train.checkpoint import (
            latest_epoch, latest_step_checkpoint, restore_checkpoint,
            restore_step_checkpoint,
        )

        last = latest_epoch(cfg.checkpoint_dir, cfg.checkpoint_prefix)
        if last is not None:
            state, last = restore_checkpoint(
                state, cfg.checkpoint_dir, cfg.checkpoint_prefix, last
            )
            start_epoch = last + 1
            logger.log_jsonl(event="resume", epoch=start_epoch)
        # a mid-epoch step checkpoint NEWER than the last epoch checkpoint
        # wins: restore it and replay the epoch deterministically up to it
        s_opt = latest_step_checkpoint(cfg.checkpoint_dir,
                                       cfg.checkpoint_prefix)
        if s_opt is not None:
            cand, prog = restore_step_checkpoint(
                state, cfg.checkpoint_dir, cfg.checkpoint_prefix, s_opt
            )
            if prog["epoch"] >= start_epoch:
                state = cand
                start_epoch = int(prog["epoch"])
                resume_progress = prog
                logger.log_jsonl(event="resume_step",
                                 epoch=start_epoch,
                                 opt_steps=int(prog["opt_steps"]))

    # place params/opt state on the mesh (TP/fsdp-sharded or replicated;
    # Adam moments inherit the param shardings — parallel/sharding.py);
    # the same sharding tree pins the step outputs (out_shardings)
    state_sh = train_state_shardings(state, mesh)
    state = place_state_on_mesh(state, mesh)

    k_dispatch = max(1, cfg.steps_per_dispatch)
    single_step_fn = make_train_step(
        cfg, apply_rawboost=cfg.rawboost.algo != 0, output_kind=output_kind,
        state_shardings=state_sh,
    )
    if k_dispatch > 1:
        step_fn = make_multi_step(
            cfg, k_dispatch, apply_rawboost=cfg.rawboost.algo != 0,
            output_kind=output_kind, state_shardings=state_sh,
        )
    else:
        step_fn = single_step_fn

    def _batches(epoch):
        return chunk_batches(pipeline.epoch(epoch),
                             cfg.groups_per_step * cfg.meta_batch,
                             k_dispatch)

    def _device_batches(epoch):
        """Double-buffer the host->device upload: issue the (async)
        device_put for batch i+1 before the consumer dispatches the step on
        batch i, so the H2D transfer rides under device compute.

        Multi-process (pod) mode: every host feeds its local pipeline shard
        into global arrays (parallel/sharding.py make_global_batch). Ragged
        tails are repeat-padded to the full local shape with a 0/1 weight
        mask instead of replicated — per-host tails hold DIFFERENT data, so
        single-host replication semantics cannot apply, and fixed shapes
        keep every host on one compiled program."""
        import numpy as np
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from occm_tpu.parallel.mesh import data_parallel_size, data_spec
        from occm_tpu.parallel.sharding import make_global_batch

        dp_size = data_parallel_size(mesh)
        n_proc = jax.process_count()
        local_full = (cfg.groups_per_step * cfg.meta_batch) \
            if n_proc > 1 else None
        pending_item = None
        for kind, x, labels in _batches(epoch):
            if skip_dispatches[0] > 0:
                # mid-epoch resume replay: the data order is already
                # reproduced by the seeded pipeline; consume the item
                # without uploading it (the caller burns the matching
                # rng split so the remaining trajectory is bit-identical)
                skip_dispatches[0] -= 1
                continue
            if kind == "chunk":
                # chunked [k, B, T]: batch/data axes start at axis 1
                item = kind, make_global_batch((x, labels), mesh,
                                               data_spec(mesh, 1))
            elif n_proc > 1:
                x = np.asarray(x)
                labels = np.asarray(labels, np.int32)
                m = x.shape[0]
                w = np.ones((m,), np.float32)
                if m != local_full:
                    # repeat whole meta-batches (12-row blocks) to the full
                    # local shape; weights zero-out the padding so the
                    # update equals the mean over the real groups
                    reps = -(-local_full // m)
                    x = np.concatenate([x] * reps)[:local_full]
                    labels = np.concatenate([labels] * reps)[:local_full]
                    w = np.concatenate(
                        [w, np.zeros((local_full - m,), np.float32)]
                    )
                item = kind, make_global_batch((x, labels, w), mesh,
                                               data_spec(mesh))
            elif x.shape[0] % dp_size:
                # ragged tail smaller than the data axes: replicate instead
                # of shard — every device computes the same gradients, the
                # all-reduce mean is unchanged, and no meta-batch is dropped
                item = kind, jax.tree_util.tree_map(
                    lambda a: jax.device_put(a, NamedSharding(mesh, P())),
                    (x, labels),
                )
            else:
                item = kind, shard_batch((x, labels), mesh)
            if pending_item is not None:
                yield pending_item
            pending_item = item
        if pending_item is not None:
            yield pending_item

    # mid-epoch (preemption-safe) checkpointing: a one-element list so the
    # _device_batches generator can consume the replay count in place
    skip_dispatches = [0]
    sigterm = [False]
    prev_handler = None
    if cfg.checkpoint_every_steps > 0:
        import signal

        try:
            prev_handler = signal.signal(
                signal.SIGTERM, lambda *_: sigterm.__setitem__(0, True)
            )
        except ValueError:
            pass  # not the main thread (tests) — no handler, knob still works

    def _fold(pending, running):
        for m, mw in pending:
            for k in running:
                running[k] += float(m[k]) * mw
        pending.clear()

    def _save_step(epoch, dispatches, opt_steps, running):
        from occm_tpu.train.checkpoint import save_step_checkpoint

        save_step_checkpoint(
            state, cfg.checkpoint_dir, cfg.checkpoint_prefix,
            {"epoch": epoch, "dispatches": dispatches,
             "opt_steps": opt_steps,
             "running_loss": running["loss"],
             "running_closs": running["closs"],
             "running_dloss": running["dloss"]},
        )

    epochs = num_epochs if num_epochs is not None else cfg.num_epochs
    try:
        with compute_mesh(mesh):
            for epoch in range(start_epoch, epochs):
                # metrics stay device-side between log points — no per-step
                # host sync (a host round trip per step throttles remote
                # TPUs). `opt_steps` counts OPTIMIZER steps: a k-dispatch
                # chunk is k of them (its metrics are chunk means, so they
                # enter the running sums with weight k) — loss.txt's `i`
                # matches the reference's per-update counter whatever
                # steps_per_dispatch is (reference: oc_training.py:363,391-395).
                pending = []  # (metrics, weight) not yet folded into running
                running = {"loss": 0.0, "closs": 0.0, "dloss": 0.0}
                opt_steps = 0
                dispatches = 0
                if resume_progress is not None and \
                        int(resume_progress["epoch"]) == epoch:
                    # replay this epoch up to the step checkpoint: skip the
                    # consumed dispatches (no upload) but burn the SAME rng
                    # splits so the tail trajectory is bit-identical
                    dispatches = int(resume_progress["dispatches"])
                    opt_steps = int(resume_progress["opt_steps"])
                    running = {
                        "loss": resume_progress["running_loss"],
                        "closs": resume_progress["running_closs"],
                        "dloss": resume_progress["running_dloss"],
                    }
                    skip_dispatches[0] = dispatches
                    for _ in range(dispatches):
                        rng, _ = jax.random.split(rng)
                    resume_progress = None
                for kind, batch in _device_batches(epoch):
                    rng, step_rng = jax.random.split(rng)
                    state, metrics = (step_fn if kind == "chunk"
                                      else single_step_fn)(state, batch,
                                                           step_rng)
                    w = k_dispatch if kind == "chunk" else 1
                    prev = opt_steps
                    opt_steps += w
                    dispatches += 1
                    pending.append((metrics, w))
                    if prev // cfg.log_every != opt_steps // cfg.log_every:
                        _fold(pending, running)
                        logger.log_running(
                            epoch, opt_steps - 1, running["loss"],
                            running["closs"], running["dloss"],
                        )
                        logger.log_jsonl(
                            epoch=epoch, step=opt_steps - 1, **{
                                k: running[k] / opt_steps for k in running
                            }
                        )
                    every = cfg.checkpoint_every_steps
                    if every > 0 and (sigterm[0] or
                                      prev // every != opt_steps // every):
                        _fold(pending, running)
                        _save_step(epoch, dispatches, opt_steps, running)
                        if sigterm[0]:
                            logger.log_jsonl(event="preempt_save",
                                             epoch=epoch,
                                             opt_steps=opt_steps)
                            return state
                _fold(pending, running)
                if checkpoint_fn is not None:
                    checkpoint_fn(state, epoch)
    finally:
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)
    return state
