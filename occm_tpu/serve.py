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

import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from occm_tpu.audio import pad_numpy
from occm_tpu.losses import pairwise_distance


def make_score_fn(model, params, batch_stats=None) -> Callable:
    """wave [B, T] -> (emb [B, D], logits [B, C]).

    NOTE: the returned fn closes over the weights, which bakes them into
    the compiled program as constants — fine locally, but a serialized
    1.2 GB program breaks remote-compile transports at 300M scale.
    Production paths use make_score_fn_v + ScoringService(variables=...),
    which pass the tree as a jit argument instead."""

    def fn(x):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        out = model.apply(variables, x, train=False)
        if isinstance(out, tuple):
            return out
        return out, out

    return fn


def make_score_fn_v(model) -> Callable:
    """(variables, wave [B, T]) -> (emb, logits) — the weights arrive as
    a jit ARGUMENT (see make_score_fn note)."""

    def fn(variables, x):
        out = model.apply(variables, x, train=False)
        if isinstance(out, tuple):
            return out
        return out, out

    return fn


def aot_compile(fn: Callable, batch: int, length: int, mesh=None,
                variables=None):
    """Ahead-of-time compile for a fixed input shape.

    mesh: optional 1-axis data-parallel jax.sharding.Mesh
    (occm_tpu.classify.make_dp_mesh) — the batch axis of the compiled
    executable is sharded over it, the TPU equivalent of the reference's
    DataParallel at inference (reference: oc_classifier.py:343). `batch`
    must be a multiple of the mesh size.

    variables: optional model-variable tree (already device_put by the
    caller or host arrays). When given, `fn` takes (variables, x); the
    tree ships to the device ONCE as data and the compiled callable
    still takes just the wave batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.ShapeDtypeStruct((batch, length), jnp.float32)
    if variables is None:
        if mesh is None:
            return jax.jit(fn).lower(x).compile()
        (ax,) = mesh.axis_names
        sh = NamedSharding(mesh, P(ax))
        return jax.jit(fn, in_shardings=sh,
                       out_shardings=sh).lower(x).compile()
    if mesh is None:
        v = jax.device_put(variables)
        exe = jax.jit(fn).lower(v, x).compile()
    else:
        (ax,) = mesh.axis_names
        sh = NamedSharding(mesh, P(ax))
        rep = NamedSharding(mesh, P())
        v = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, rep), variables)
        v_sh = jax.tree_util.tree_map(lambda a: rep, v)
        exe = jax.jit(fn, in_shardings=(v_sh, sh),
                      out_shardings=sh).lower(v, x).compile()
    return lambda b: exe(v, b)


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
        score_fn: Optional[Callable] = None,
        reference_embedding: np.ndarray = None,
        threshold: float = 0.0,
        buckets: Sequence[int] = (16000, 48000, 64600, 96000),
        batch: int = 8,
        mesh=None,
        score_fn_factory: Optional[Callable[[int], Callable]] = None,
        variables=None,
    ):
        """mesh: optional 1-axis dp mesh (occm_tpu.classify.make_dp_mesh);
        bucket executables shard their batch axis over it and `batch` is
        rounded up to a multiple of the mesh size.

        score_fn_factory(bucket_samples) -> score_fn: per-bucket scoring
        functions (mutually exclusive with score_fn) — the serving side of
        attention_impl="auto" (occm_tpu.classify.impl_select): each bucket
        executable is AOT-compiled from the impl that wins at its length.

        variables: optional model-variable tree; score fns then take
        (variables, x) and the tree is device_put ONCE and passed as a
        jit argument (see aot_compile — closure-captured 300M weights
        serialize into the program and break remote-compile
        transports)."""
        if (score_fn is None) == (score_fn_factory is None):
            raise ValueError(
                "pass exactly one of score_fn / score_fn_factory")
        self._fn = score_fn
        self._factory = score_fn_factory
        self.reference = jnp.asarray(reference_embedding)
        self.threshold = float(threshold)
        self.mesh = mesh
        if mesh is not None:
            n = mesh.devices.size
            batch = ((batch + n - 1) // n) * n
        if variables is None:
            self._vars = None
        elif mesh is None:
            self._vars = jax.device_put(variables)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self._vars = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, rep), variables)
        self.batch = batch
        self.buckets = sorted(buckets)
        self._compiled: Dict[int, Callable] = {}

    def warmup(self) -> None:
        for b in self.buckets:
            self._get(b)

    def _get(self, bucket: int):
        if bucket not in self._compiled:
            fn = self._fn if self._factory is None else self._factory(bucket)
            self._compiled[bucket] = aot_compile(
                fn, self.batch, bucket, mesh=self.mesh,
                variables=self._vars)
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
                # numpy in: the compiled executable shards it per its
                # in_shardings (over the dp mesh when one is configured)
                emb, _ = exe(batch_arr)
                d = np.asarray(
                    pairwise_distance(emb, self.reference)
                )
                for j, i in enumerate(chunk):
                    out_scores[i] = d[j]
        preds = (out_scores > self.threshold).astype(np.int32)
        return out_scores, preds


class BatchingQueue:
    """Dynamic batcher in front of a ScoringService.

    Single-utterance requests are grouped until the service batch size is
    reached or `max_wait_ms` elapses since the oldest queued request, then
    scored in one device call (the reference's batch=1 eval loop leaves
    the accelerator idle between utterances; this keeps real batches on
    the MXU under concurrent load while bounding tail latency).

    submit() returns a Future resolving to (score, prediction);
    score_sync() is the blocking convenience wrapper.
    """

    def __init__(self, service: ScoringService, max_wait_ms: float = 5.0):
        self.service = service
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # serialises submit's check-then-put against close's stop flag:
        # without it a submit racing close() can enqueue its Future after
        # the worker's final drain, leaving the caller blocked forever
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, wave: np.ndarray) -> "Future":
        fut: Future = Future()
        with self._lock:
            if self._stop.is_set():
                raise RuntimeError("BatchingQueue is closed")
            self._q.put((np.asarray(wave, np.float32), fut))
        return fut

    def score_sync(self, wave: np.ndarray,
                   timeout: Optional[float] = None) -> Tuple[float, int]:
        return self.submit(wave).result(timeout=timeout)

    def close(self) -> None:
        with self._lock:
            self._stop.set()
        self._q.put(None)  # wake the worker
        self._thread.join()

    def __enter__(self) -> "BatchingQueue":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------ worker

    def _collect(self) -> List[Tuple[np.ndarray, Future]]:
        """Block for the first request, then fill the batch until the
        service batch size or the wait deadline."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.service.batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                item = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if item is None:
                break
            batch.append(item)
        return batch

    def _run(self) -> None:
        while not self._stop.is_set():
            batch = self._collect()
            if not batch:
                continue
            waves = [w for w, _ in batch]
            try:
                scores, preds = self.service.score(waves)
            except Exception as e:  # propagate to all waiting callers
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            for i, (_, fut) in enumerate(batch):
                fut.set_result((float(scores[i]), int(preds[i])))
        # drain: fail anything still queued after close()
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[1].set_exception(RuntimeError("queue closed"))
