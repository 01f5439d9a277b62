"""Host input pipeline: shuffled meta-batch assembly + background prefetch.

The reference's DataLoader runs with num_workers=0 and batch_size=1
(reference: oc_training.py:313) — decode latency lands on the training
thread. Here a background thread decodes and assembles the next G
meta-batches ([G*12, cut]) while the device steps, and the arrays are
fixed-shape so every step hits the same compiled program.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from occm_tpu.data.datasets import PFDataset


class Prefetcher:
    """Wrap any iterator with a depth-N background prefetch thread.

    Exceptions raised by the wrapped iterator (e.g. a failed decode) are
    captured and re-raised in the consumer — a worker crash must fail the
    epoch loudly, never truncate it silently."""

    def __init__(self, it: Iterator, depth: int = 2):
        self._it = it
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            self._error = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


class MetaBatchPipeline:
    """Epoch iterator over PFDataset yielding ([G*12, cut], [G*12]) arrays.

    G = groups_per_step meta-batches are stacked so the global batch shards
    evenly over the dp mesh axis (SURVEY.md §2.3).
    """

    def __init__(
        self,
        dataset: PFDataset,
        groups_per_step: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
        prefetch_depth: int = 2,
        decode_threads: int = 8,
        shard_index: Optional[int] = None,
        shard_count: Optional[int] = None,
        mesh=None,
    ):
        self.dataset = dataset
        self.groups = groups_per_step
        self.shuffle = shuffle
        self.seed = seed
        # False by default: the reference sees every meta-batch every epoch
        # (batch_size=1, reference: oc_training.py:313,363). A ragged tail
        # group is yielded at its natural (smaller) size; the train loop
        # flushes it through the single-step path.
        self.drop_remainder = drop_remainder
        self.prefetch_depth = prefetch_depth
        self.decode_threads = decode_threads
        # multi-host data sharding: every host shuffles with the same seed
        # then takes a disjoint strided slice of the epoch order, so the
        # global batch = concat of per-host batches with no overlap.
        # Defaults: with `mesh`, shards follow the mesh's DATA axes
        # (parallel.data_shard_for_process) — processes whose devices
        # replicate the same batch shard (tp/pp crossing host boundaries)
        # load IDENTICAL data; without a mesh, one shard per process
        # (pure-dp pods; single-host = identity).
        if shard_index is None or shard_count is None:
            if mesh is not None:
                from occm_tpu.parallel.mesh import data_shard_for_process

                shard_index, shard_count = data_shard_for_process(mesh)
            else:
                import jax

                shard_index = jax.process_index()
                shard_count = jax.process_count()
        if not 0 <= shard_index < shard_count:
            raise ValueError(
                f"shard_index {shard_index} not in [0, {shard_count})"
            )
        self.shard_index = shard_index
        self.shard_count = shard_count
        # one C++ threaded decode per G-group step instead of 12*G
        # per-file ctypes calls (VERDICT r1 item 8); falls back to the
        # per-item path for custom loaders / group_max padding
        self._native = (
            hasattr(dataset, "supports_native_batch")
            and dataset.supports_native_batch()
        )

    def _shard_len(self) -> int:
        # Epoch order is truncated to a multiple of shard_count before the
        # strided slice so every host sees the SAME number of items: with
        # unequal shards each host would run a different step count per
        # epoch and multi-host SPMD collectives would deadlock.
        return len(self.dataset) // self.shard_count

    def steps_per_epoch(self) -> int:
        n = self._shard_len() // self.groups
        if not self.drop_remainder and self._shard_len() % self.groups:
            n += 1
        return n

    def _epoch_iter(self, epoch: int):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        if self.shard_count > 1:
            usable = (len(order) // self.shard_count) * self.shard_count
            order = order[:usable][self.shard_index::self.shard_count]
        self.dataset.reseed(self.seed * 1_000_003 + epoch)
        if self._native:
            yield from self._native_epoch_iter(order)
            return

        group_feats, group_labels = [], []
        for idx in order:
            f, l = self.dataset[int(idx)]
            group_feats.append(f)
            group_labels.append(l)
            if len(group_feats) == self.groups:
                yield (
                    np.concatenate(group_feats, axis=0),
                    np.concatenate(group_labels, axis=0),
                )
                group_feats, group_labels = [], []
        if group_feats and not self.drop_remainder:
            yield (
                np.concatenate(group_feats, axis=0),
                np.concatenate(group_labels, axis=0),
            )

    def _native_epoch_iter(self, order: np.ndarray):
        """Fast path: resolve 12*G paths per step, decode them with ONE
        threaded C++ call (WAV/FLAC by magic), repeat-padded to `cut`
        directly into the output buffer — no per-file Python in the loop."""
        from occm_tpu.io.native import native_read_batch_padded

        n_groups = len(order) // self.groups
        tail = len(order) % self.groups
        for g in range(n_groups):
            idxs = order[g * self.groups:(g + 1) * self.groups]
            paths, labels = [], []
            for idx in idxs:
                p, l = self.dataset.sample_paths(int(idx))
                paths += p
                labels.append(l)
            feats, _, _ = native_read_batch_padded(
                paths, self.dataset.cut, n_threads=self.decode_threads
            )
            yield feats, np.concatenate(labels)
        if tail and not self.drop_remainder:
            paths, labels = [], []
            for idx in order[n_groups * self.groups:]:
                p, l = self.dataset.sample_paths(int(idx))
                paths += p
                labels.append(l)
            feats, _, _ = native_read_batch_padded(
                paths, self.dataset.cut, n_threads=self.decode_threads
            )
            yield feats, np.concatenate(labels)

    def epoch(self, epoch: int = 0) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return Prefetcher(self._epoch_iter(epoch), depth=self.prefetch_depth)
