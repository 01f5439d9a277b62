"""Serving utilities: AOT compilation + a one-class scoring service.

The reference has no serving story (scoring is a batch=1 eval-loop CLI,
reference: oc_classifier.py:243-265). For production deployment:

- `aot_compile` lowers + compiles the scoring function ahead of time for a
  fixed (batch, length) so the first request pays no compile.
- `export_stablehlo` serialises the lowered module (StableHLO text) for
  inspection or external runtimes.
- `ScoringService` wraps compiled per-bucket executables with the
  reference-embedding decision rule (distance > threshold -> spoof).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from occm_tpu.audio import pad_numpy
from occm_tpu.losses import pairwise_distance


def make_score_fn(model, params, batch_stats=None) -> Callable:
    """wave [B, T] -> (emb [B, D], logits [B, C])."""

    def fn(x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, x, train=False)
        if isinstance(out, tuple):
            return out
        return out, out

    return fn


def aot_compile(fn: Callable, batch: int, length: int):
    """Ahead-of-time compile for a fixed input shape."""
    x = jax.ShapeDtypeStruct((batch, length), jnp.float32)
    return jax.jit(fn).lower(x).compile()


def export_stablehlo(fn: Callable, batch: int, length: int,
                     path: Optional[str] = None) -> str:
    """Serialise the lowered StableHLO module text."""
    x = jax.ShapeDtypeStruct((batch, length), jnp.float32)
    text = jax.jit(fn).lower(x).as_text()
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


class ScoringService:
    """One-class scoring with AOT-compiled bucket executables.

    Decision rule parity: score = ||emb - reference||2 (torch eps
    semantics), pred = score > threshold (reference: oc_classifier.py:262).
    """

    def __init__(
        self,
        score_fn: Callable,
        reference_embedding: np.ndarray,
        threshold: float,
        buckets: Sequence[int] = (16000, 48000, 64600, 96000),
        batch: int = 8,
    ):
        self._fn = score_fn
        self.reference = jnp.asarray(reference_embedding)
        self.threshold = float(threshold)
        self.batch = batch
        self.buckets = sorted(buckets)
        self._compiled: Dict[int, Callable] = {}

    def warmup(self) -> None:
        for b in self.buckets:
            self._get(b)

    def _get(self, bucket: int):
        if bucket not in self._compiled:
            self._compiled[bucket] = aot_compile(self._fn, self.batch, bucket)
        return self._compiled[bucket]

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        # longer than every warm bucket: open a new exact-size bucket
        # (compiled on first use) rather than silently truncating — the
        # reference scores full-length audio (oc_classifier.py:93-94)
        step = self.buckets[0]
        b = ((n + step - 1) // step) * step
        if b not in self.buckets:
            self.buckets.append(b)
            self.buckets.sort()
        return b

    def score(self, waves: Sequence[np.ndarray]
              ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (distances, predictions) for a list of waveforms."""
        out_scores = np.empty(len(waves), np.float64)
        by_bucket: Dict[int, list] = {}
        for i, w in enumerate(waves):
            by_bucket.setdefault(self._bucket_for(len(w)), []).append(i)
        for bucket, idxs in by_bucket.items():
            exe = self._get(bucket)
            for start in range(0, len(idxs), self.batch):
                chunk = idxs[start: start + self.batch]
                batch_arr = np.zeros((self.batch, bucket), np.float32)
                for j, i in enumerate(chunk):
                    batch_arr[j] = pad_numpy(waves[i], bucket)
                emb, _ = exe(jnp.asarray(batch_arr))
                d = np.asarray(
                    pairwise_distance(emb, self.reference)
                )
                for j, i in enumerate(chunk):
                    out_scores[i] = d[j]
        preds = (out_scores > self.threshold).astype(np.int32)
        return out_scores, preds
