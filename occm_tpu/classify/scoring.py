"""One-class reference-embedding scoring (reference: oc_classifier.py).

Pipeline parity:
- PHASE 1 (reference: oc_classifier.py:159-202): embed every bonafide train
  utterance, reference embedding = mean, threshold = max distance to the
  mean; artefacts cached with an exists-check (`reference_embedding.npy` /
  `threshold.npy` here, .pt in the reference), distances appended to
  `distances.txt`.
- PHASE 2, four scoring modes (reference: oc_classifier.py:206-312):
  1c: score = Euclidean distance to the reference embedding, written as
      "{distance}, {1 if > threshold else 0} \n";
  2c: score = bonafide logit, written bare.
  The x-c-1 variants (separate extractor+encoder) and x-c-2 variants (fused
  model) differ only in the embed function the caller passes in.

TPU-first: where the reference loops batch=1 full-length utterances through
DataParallel, utterances here are repeat-padded to a small set of length
buckets and embedded in batches — one compiled program per bucket, MXU fed
with real batches. distances use torch pairwise_distance eps semantics.

Multi-chip scoring: the reference wraps the inference model in
``torch.nn.DataParallel`` (reference: oc_classifier.py:343) so eval batches
scatter over every local GPU. The TPU-native equivalent is a ``("dp",)``
`jax.sharding.Mesh` over the local chips: pass ``mesh=`` (see
:func:`make_dp_mesh`) and every bucket executable is compiled with its batch
axis sharded over the mesh — GSPMD replicates the weights and each chip
embeds ``batch_size / n_dev`` utterances per dispatch.
"""

from __future__ import annotations

import os
from typing import Callable, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from occm_tpu.audio import pad_numpy
from occm_tpu.io.scorefiles import write_score_line_1c, write_score_line_2c
from occm_tpu.losses import pairwise_distance


def make_dp_mesh(num_devices: Optional[int] = None,
                 axis: str = "dp") -> Mesh:
    """A 1-D data-parallel mesh over the first `num_devices` local devices
    (all of them by default) — the TPU-native stand-in for the reference's
    `DataParallel(aasist)` at inference (reference: oc_classifier.py:343)."""
    devs = jax.devices()
    if num_devices is not None:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devs)} present")
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis,))


class BucketedEmbedder:
    """Batch variable-length utterances through a fixed-shape embed fn.

    embed_fn(x [B, T]) -> (emb [B, D], logits [B, C]); jitted per bucket.
    Buckets are multiples of `bucket_step` samples; utterances are
    repeat-padded (reference pad semantics) up to the bucket boundary.
    """

    def __init__(self, embed_fn: Optional[Callable] = None,
                 bucket_step: int = 16000,
                 max_len: Optional[int] = None, batch_size: int = 8,
                 mesh: Optional[Mesh] = None,
                 embed_fn_factory: Optional[Callable[[int], Callable]] = None,
                 variables=None, decode_threads: int = 8):
        """max_len=None (default) never truncates: every utterance gets a
        bucket at least its own length, exactly like the reference's
        full-length batch=1 scoring (reference: oc_classifier.py:93-94).
        Set max_len only to deliberately cap compile-cache growth, accepting
        an EER-affecting crop of longer utterances.

        mesh: optional 1-axis data-parallel mesh (make_dp_mesh()); the batch
        axis of every bucket program is sharded over it and batch_size is
        rounded up to a multiple of the mesh size.

        embed_fn_factory(bucket_samples) -> embed_fn: per-bucket embed
        functions (mutually exclusive with embed_fn) — the plumbing behind
        attention_impl="auto" (classify.impl_select): each length bucket
        can run the attention layout that wins at its shape. jit re-traces
        per shape either way, so per-bucket functions add no compiles.

        variables: optional model-variable tree. When given, embed fns
        take (variables, x) and the tree is device_put ONCE and passed as
        a jit ARGUMENT; without it, fns take (x) and any weights they
        close over are baked into the program as constants — at 300M
        scale a serialized 1.2 GB program breaks remote-compile
        transports (the bench_int8_serving gotcha, hit for real by the
        scoring CLI through the TPU tunnel)."""
        if (embed_fn is None) == (embed_fn_factory is None):
            raise ValueError(
                "pass exactly one of embed_fn / embed_fn_factory")
        self.mesh = mesh
        if mesh is not None:
            if len(mesh.axis_names) != 1:
                raise ValueError(
                    f"scoring mesh must have exactly one axis, got "
                    f"{mesh.axis_names}")
            n = mesh.devices.size
            batch_size = ((batch_size + n - 1) // n) * n
        if variables is None:
            self._vars = None
        elif mesh is None:
            self._vars = jax.device_put(variables)
        else:
            rep = NamedSharding(mesh, P())
            self._vars = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, rep), variables)
        self._factory = embed_fn_factory
        self._embed = None if embed_fn is None else self._jit(embed_fn)
        self._per_bucket: dict = {}
        self.bucket_step = bucket_step
        self.max_len = max_len
        self.batch_size = batch_size
        # default thread count for the native batch decode in embed_paths
        # (match it to the eval host's cores; the 1-core CI host still
        # overlaps decode with device compute through the prefetcher)
        self.decode_threads = decode_threads

    def _jit(self, fn: Callable) -> Callable:
        if self.mesh is None:
            jf = jax.jit(fn)
        else:
            (ax,) = self.mesh.axis_names
            sh = NamedSharding(self.mesh, P(ax))
            if self._vars is None:
                jf = jax.jit(fn, in_shardings=sh, out_shardings=sh)
            else:
                rep = NamedSharding(self.mesh, P())
                v_sh = jax.tree_util.tree_map(lambda a: rep, self._vars)
                jf = jax.jit(fn, in_shardings=(v_sh, sh),
                             out_shardings=sh)
        if self._vars is None:
            return jf
        v = self._vars
        return lambda batch: jf(v, batch)

    def _embed_for(self, blen: int) -> Callable:
        """The jitted embed fn for a bucket length (factory mode compiles
        one per bucket, cached; plain mode shares the single fn)."""
        if self._factory is None:
            return self._embed
        if blen not in self._per_bucket:
            self._per_bucket[blen] = self._jit(self._factory(blen))
        return self._per_bucket[blen]

    def _bucket_len(self, n: int) -> int:
        b = ((n + self.bucket_step - 1) // self.bucket_step) * self.bucket_step
        b = max(b, self.bucket_step)
        return b if self.max_len is None else min(b, self.max_len)

    def _run_batches(self, batch_iter, n: int,
                     progress: Optional[Callable[[int], None]],
                     prefetch_depth: int = 2
                     ) -> Tuple[np.ndarray, np.ndarray]:
        """Device loop over (chunk_indices, batch [B, blen]) items: host
        batch assembly (decode/pad/stack) runs in a background thread via
        Prefetcher so it overlaps the device compute of the previous
        batch."""
        from occm_tpu.data.pipeline import Prefetcher

        embs: List[Optional[np.ndarray]] = [None] * n
        logits_all: List[Optional[np.ndarray]] = [None] * n
        done = 0
        for chunk, batch in Prefetcher(batch_iter, depth=prefetch_depth):
            # numpy in: jit places it per in_shardings (sharded over
            # the dp mesh when one is configured)
            emb, logits = self._embed_for(batch.shape[1])(batch)
            emb = np.asarray(emb)
            logits = np.asarray(logits)
            for j, i in enumerate(chunk):
                embs[i] = emb[j]
                logits_all[i] = logits[j]
            done += len(chunk)
            if progress:
                progress(done)
        return np.stack(embs), np.stack(logits_all)  # type: ignore[arg-type]

    def _pad_batch_rows(self, batch: np.ndarray) -> np.ndarray:
        """Pad the batch dim to the full batch size to keep one compiled
        program per bucket."""
        pad_rows = self.batch_size - batch.shape[0]
        if pad_rows:
            batch = np.concatenate(
                [batch, np.zeros((pad_rows, batch.shape[1]), np.float32)]
            )
        return batch

    def embed_all(self, waves: Iterable[np.ndarray],
                  progress: Optional[Callable[[int], None]] = None
                  ) -> Tuple[np.ndarray, np.ndarray]:
        """Embed every waveform, preserving input order.
        Returns (embeddings [N, D], logits [N, C])."""
        waves = list(waves)
        by_bucket = {}
        for i, w in enumerate(waves):
            by_bucket.setdefault(self._bucket_len(len(w)), []).append(i)

        def batches():
            for blen, idxs in sorted(by_bucket.items()):
                for start in range(0, len(idxs), self.batch_size):
                    chunk = idxs[start: start + self.batch_size]
                    batch = np.stack(
                        [pad_numpy(waves[i], blen) for i in chunk]
                    ).astype(np.float32)
                    yield chunk, self._pad_batch_rows(batch)

        return self._run_batches(batches(), len(waves), progress)

    def embed_paths(self, paths: List[str],
                    progress: Optional[Callable[[int], None]] = None,
                    decode_threads: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Scoring fast lane (r4 verdict item 2): embed files by path with
        the C++ threaded batch decoder feeding the device.

        Where :meth:`embed_all` receives one Python-decoded waveform per
        `dataset[i]` call (the reference's per-utterance librosa loop,
        oc_classifier.py:180-196, is the same anti-pattern), this lane
        (1) probes every file's true length from its WAV/FLAC headers in
        one threaded native call — no decode, (2) buckets by that length,
        (3) decodes each bucket batch with ONE threaded C++ call whose
        repeat-pad lands directly in the batch buffer, and (4) prefetches
        the next batch's decode under the device compute of the current
        one. Scores are byte-identical to the embed_all path
        (tests/test_scoring_native.py): the native decoder and repeat-pad
        are bit-exact vs the Python reader, and bucket assignment uses
        the same true lengths.

        Falls back to Python decode per file when the native library is
        unavailable (same results, host-bound)."""
        from occm_tpu.io import native

        if decode_threads is None:
            decode_threads = self.decode_threads

        if not native.available():
            from occm_tpu.io.wav import load_audio

            return self.embed_all(
                (load_audio(p, sr=None)[0] for p in paths), progress)

        lens, _ = native.native_audio_len_batch(paths, decode_threads)
        for i in np.nonzero(lens < 0)[0]:
            # length not probeable from headers (e.g. FLAC with
            # total_samples=0): decode to measure — rare, loud on error
            wave, _ = native.native_read_wav(paths[int(i)])
            lens[int(i)] = len(wave)

        by_bucket = {}
        for i, n in enumerate(lens):
            by_bucket.setdefault(self._bucket_len(int(n)), []).append(i)

        def batches():
            for blen, idxs in sorted(by_bucket.items()):
                for start in range(0, len(idxs), self.batch_size):
                    chunk = idxs[start: start + self.batch_size]
                    batch, _, _ = native.native_read_batch_padded(
                        [paths[i] for i in chunk], blen,
                        n_threads=decode_threads,
                    )
                    yield chunk, self._pad_batch_rows(batch)

        return self._run_batches(batches(), len(paths), progress)


class OneClassScorer:
    """Reference-embedding one-class scorer (reference: oc_classifier.py)."""

    def __init__(self, embedder: BucketedEmbedder, cache_dir: str = "."):
        self.embedder = embedder
        self.cache_dir = cache_dir

    def _embed_dataset(self, dataset, progress):
        """Embed a dataset, taking the threaded-native-decode fast lane
        when the dataset exposes plain file paths (ASVDataset with the
        stock loader) — otherwise the per-item decode loop. Identical
        results either way (tests/test_scoring_native.py)."""
        paths = None
        if hasattr(dataset, "file_paths"):
            paths = dataset.file_paths()
        if paths is not None:
            return self.embedder.embed_paths(paths, progress=progress)
        waves = (dataset[i][0] for i in range(len(dataset)))
        return self.embedder.embed_all(waves, progress=progress)

    # ---- phase 1 ----
    def create_reference_embedding(
        self, dataset, distances_txt: Optional[str] = "distances.txt",
        verbose: bool = False,
    ) -> Tuple[np.ndarray, float]:
        """Mean bonafide embedding + max-distance threshold with artefact
        cache resume (reference: oc_classifier.py:159-202)."""
        ref_path = os.path.join(self.cache_dir, "reference_embedding.npy")
        thr_path = os.path.join(self.cache_dir, "threshold.npy")
        if os.path.exists(ref_path) and os.path.exists(thr_path):
            return np.load(ref_path), float(np.load(thr_path))

        embs, _ = self._embed_dataset(
            dataset,
            progress=(lambda n: print(f"embedded {n} ...")) if verbose else None,
        )
        reference = embs.mean(axis=0)

        dists = np.asarray(
            pairwise_distance(jnp.asarray(embs), jnp.asarray(reference))
        )
        if distances_txt:
            with open(os.path.join(self.cache_dir, distances_txt), "a") as f:
                for d in dists:
                    f.write(f"{float(d)}\n")
        threshold = float(dists.max())

        np.save(ref_path, reference)
        np.save(thr_path, np.float32(threshold))
        return reference, threshold

    # ---- phase 2 ----
    def score_eval_set_1c(
        self, dataset, reference: np.ndarray, threshold: float,
        score_file: str = "scores.txt", verbose: bool = False,
    ) -> None:
        """One-class scoring: distance + thresholded prediction per line
        (reference: oc_classifier.py:243-265)."""
        embs, _ = self._embed_dataset(
            dataset,
            progress=(lambda n: print(f"Processing file counts: {n} ..."))
            if verbose else None,
        )
        dists = np.asarray(
            pairwise_distance(jnp.asarray(embs), jnp.asarray(reference))
        )
        with open(score_file, "w") as f:
            for d in dists:
                write_score_line_1c(f, float(d), threshold)

    def score_eval_set_2c(
        self, dataset, score_file: str = "scores.txt",
        verbose: bool = False,
    ) -> None:
        """Two-class scoring: bare bonafide logit per line
        (reference: oc_classifier.py:293-312 writes out[0][0])."""
        _, logits = self._embed_dataset(
            dataset,
            progress=(lambda n: print(f"Processing file counts: {n} ..."))
            if verbose else None,
        )
        with open(score_file, "w") as f:
            for lg in logits:
                write_score_line_2c(f, float(lg[0]))  # bonafide logit
