"""Checkpoint / resume via orbax (SURVEY.md §5.3-5.4).

The reference saves bare `state_dict` per epoch with name-versioned files
(`aasist_vocoded_{epoch}.pt`, reference: oc_training.py:401) and has no
resume logic. Here the full TrainState (params + BN stats + optimizer state
+ step) is checkpointed per epoch under `<dir>/<prefix>_<epoch>/`, with
`latest_epoch` discovery for resume-from-latest.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def _ckpt_path(directory: str, prefix: str, epoch: int) -> str:
    return os.path.abspath(os.path.join(directory, f"{prefix}_{epoch}"))


def save_checkpoint(state, directory: str, prefix: str, epoch: int) -> str:
    """Save params/batch_stats/opt_state/step for one epoch
    (filename scheme mapped from reference oc_training.py:401)."""
    path = _ckpt_path(directory, prefix, epoch)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def latest_epoch(directory: str, prefix: str) -> Optional[int]:
    pat = re.compile(re.escape(prefix) + r"_(\d+)$")
    best = None
    if not os.path.isdir(directory):
        return None
    for name in os.listdir(directory):
        m = pat.match(name)
        if m and os.path.isdir(os.path.join(directory, name)):
            e = int(m.group(1))
            best = e if best is None else max(best, e)
    return best


def restore_checkpoint(state, directory: str, prefix: str,
                       epoch: Optional[int] = None) -> Tuple[Any, int]:
    """Restore into an abstract/state template; returns (state, epoch)."""
    if epoch is None:
        epoch = latest_epoch(directory, prefix)
        if epoch is None:
            raise FileNotFoundError(
                f"no checkpoints matching {prefix}_* in {directory}"
            )
    path = _ckpt_path(directory, prefix, epoch)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = ckptr.restore(path, template)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return state, epoch


def _step_ckpt_re(prefix: str):
    return re.compile(re.escape(prefix) + r"_step_(\d+)$")


def save_step_checkpoint(state, directory: str, prefix: str,
                         progress: dict) -> str:
    """Mid-epoch (preemption-safe) checkpoint: full TrainState + epoch
    progress (epoch, dispatches consumed, optimizer steps, running loss
    sums). Saved under `{prefix}_step_{opt_steps}`; older step
    checkpoints are deleted only AFTER the save succeeds, so a kill
    mid-save always leaves the previous one restorable (orbax itself
    finalises atomically via tmp + rename)."""
    import jax.numpy as jnp

    path = os.path.abspath(
        os.path.join(directory, f"{prefix}_step_{progress['opt_steps']}")
    )
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "progress": {k: jnp.asarray(v) for k, v in progress.items()},
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    pat = _step_ckpt_re(prefix)
    for name in os.listdir(directory):
        m = pat.match(name)
        if m and int(m.group(1)) != progress["opt_steps"]:
            import shutil

            shutil.rmtree(os.path.join(directory, name),
                          ignore_errors=True)
    return path


def latest_step_checkpoint(directory: str, prefix: str) -> Optional[int]:
    """opt_steps of the newest `{prefix}_step_*` checkpoint, or None."""
    if not os.path.isdir(directory):
        return None
    pat = _step_ckpt_re(prefix)
    best = None
    for name in os.listdir(directory):
        m = pat.match(name)
        if m and os.path.isdir(os.path.join(directory, name)):
            n = int(m.group(1))
            best = n if best is None else max(best, n)
    return best


def restore_step_checkpoint(state, directory: str, prefix: str,
                            opt_steps: int) -> Tuple[Any, dict]:
    """Restore a mid-epoch checkpoint; returns (state, progress)."""
    import jax.numpy as jnp

    path = os.path.abspath(
        os.path.join(directory, f"{prefix}_step_{opt_steps}")
    )
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "progress": {
            "epoch": jnp.zeros((), jnp.int32),
            "dispatches": jnp.zeros((), jnp.int32),
            "opt_steps": jnp.zeros((), jnp.int32),
            "running_loss": jnp.zeros(()),
            "running_closs": jnp.zeros(()),
            "running_dloss": jnp.zeros(()),
        },
    }
    restored = ckptr.restore(path, template)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    progress = {k: v.item() for k, v in restored["progress"].items()}
    return state, progress


def save_params(params, path: str) -> None:
    """Save a bare param tree (inference artefacts)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(template, path: str):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
