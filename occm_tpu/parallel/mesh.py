"""Device mesh construction.

The reference's only parallelism is single-host torch DataParallel
(reference: oc_training.py:328, oc_classifier.py:343,
test_dataloader_v2.py:77-78) — replicate + scatter/gather over NCCL.

TPU-native superset: one `jax.sharding.Mesh` with axes ("dp", "tp").
- dp: meta-batch groups shard over chips; pjit-inserted all-reduce over ICI
  takes the role of DataParallel's gradient gather.
- tp: optional tensor parallelism over the XLSR transformer (heads/FFN) —
  additive, not a rewrite (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from occm_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = max(1, cfg.tp)
    dp = cfg.dp if cfg.dp > 0 else n // tp
    if dp * tp != n:
        raise ValueError(
            f"mesh {dp}x{tp} does not cover {n} devices; "
            "set MeshConfig.dp/tp to factor the device count"
        )
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over dp, replicated over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
