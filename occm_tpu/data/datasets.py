"""Map-style datasets over ASVspoof protocol trees.

TPU-first reshape of the reference's torch Datasets:
- PFDataset (reference: oc_training.py:31-256): 12-utterance meta-batches.
  The reference zero-pads each group to its own max length (dynamic shapes);
  here the default is repeat-pad/crop to a fixed `cut` so every batch has one
  static shape and XLA compiles once (`pad_mode="group_max"` reproduces the
  reference layout for parity work on CPU).
- ASVDataset (reference: oc_classifier.py:27-110): bonafide-only rows for
  reference-embedding building, bare-list rows for eval. Full-length audio is
  repeat-padded up to a bucket boundary to bound the number of XLA programs.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from occm_tpu.audio import pad_numpy, zero_pad_to_max
from occm_tpu.data.sampler import PFSampler
from occm_tpu.io.protocols import parse_eval_protocol, parse_train_protocol
from occm_tpu.io.wav import load_audio

AudioLoader = Callable[[str], Tuple[np.ndarray, int]]


def _default_loader(path: str) -> Tuple[np.ndarray, int]:
    return load_audio(path, sr=None)


def _resolve(base_dir: str, name: str, exts=(".wav", ".flac")) -> str:
    """Try extensions like the reference's exists-fallback
    (reference: oc_classifier.py:89-91)."""
    for ext in exts:
        p = os.path.join(base_dir, name + ext)
        if os.path.exists(p):
            return p
    return os.path.join(base_dir, name + exts[0])


class PFDataset:
    """One-class meta-batch dataset (reference: oc_training.py:31-256)."""

    def __init__(
        self,
        protocol_file: str,
        dataset_dir: str,
        vocoded_dir: Optional[str] = None,
        cut: int = 64600,
        pad_mode: str = "repeat",           # "repeat" | "group_max"
        loader: AudioLoader = _default_loader,
        seed: int = 0,
    ):
        files, labels = parse_train_protocol(protocol_file)
        self.sampler = PFSampler(files, labels)
        self.dataset_dir = dataset_dir
        # reference hard-codes the vocoded dir (oc_training.py:72)
        self.vocoded_dir = vocoded_dir or os.path.join(
            os.path.dirname(dataset_dir.rstrip("/")), "ASVspoof2019_LA_vocoded"
        )
        self.cut = cut
        self.pad_mode = pad_mode
        self.loader = loader
        self._seed = seed

    def __len__(self) -> int:
        return len(self.sampler)

    def reseed(self, seed: int) -> None:
        self._seed = seed

    def _rng_for(self, idx: int) -> np.random.Generator:
        """Per-index RNG: the random picks inside a meta-batch depend only
        on (seed, idx), not on iteration order — so multi-host shards and
        resumed epochs sample identically to a single-host run."""
        return np.random.default_rng((self._seed, idx))

    def sample_paths(self, idx: int) -> Tuple[List[str], np.ndarray]:
        """Resolve the 12 file paths + labels for meta-batch `idx` WITHOUT
        decoding — the batch-decode fast path (native threaded C++ reader)
        gathers paths for several meta-batches and decodes them in one
        call. Uses the same per-index RNG as __getitem__, so both paths
        sample identical meta-batches in any iteration order."""
        main, vocoded, labels = self.sampler.sample(idx, self._rng_for(idx))
        paths = [_resolve(self.dataset_dir, n) for n in main]
        paths += [_resolve(self.vocoded_dir, n) for n in vocoded]
        return paths, np.asarray(labels, np.int64)

    def supports_native_batch(self) -> bool:
        """True when meta-batches can be decoded by the C++ threaded batch
        reader: fixed-cut repeat padding with the stock WAV/FLAC loader."""
        from occm_tpu.io import native

        return (
            self.pad_mode == "repeat"
            and self.loader is _default_loader
            and native.available()
        )

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (features [12, T], labels [12]) with T = cut (repeat mode)
        or the group max (group_max mode, reference parity)."""
        main, vocoded, labels = self.sampler.sample(idx, self._rng_for(idx))
        waves: List[np.ndarray] = []
        for name in main:
            wave, _ = self.loader(_resolve(self.dataset_dir, name))
            waves.append(wave)
        for name in vocoded:
            wave, _ = self.loader(_resolve(self.vocoded_dir, name))
            waves.append(wave)

        if self.pad_mode == "group_max":
            feats = zero_pad_to_max(waves)
        else:
            feats = np.stack([pad_numpy(w, self.cut) for w in waves])
        return feats.astype(np.float32), np.asarray(labels, np.int64)


class ASVspoof2019TrainDataset:
    """Per-utterance LA train dataset (reference: data_utils_SSL.py:57-82).

    Labels follow genSpoof_list's convention: **bonafide=1 / spoof=0**
    (reference: data_utils_SSL.py:29 — the opposite of PFDataset).
    RawBoost runs on-device in the training step (occm_tpu.augment), so this
    dataset returns the clean repeat-padded waveform plus the configured
    algo id for the step to apply (the reference augments per-utterance on
    the host at data_utils_SSL.py:77).
    """

    def __init__(self, protocol_file: str, base_dir: str, algo: int = 0,
                 cut: int = 64600, loader: AudioLoader = _default_loader):
        from occm_tpu.io.protocols import gen_spoof_list

        self.labels, self.list_IDs = gen_spoof_list(
            protocol_file, is_train=True
        )
        self.base_dir = base_dir
        self.algo = algo
        self.cut = cut
        self.loader = loader

    def __len__(self) -> int:
        return len(self.list_IDs)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        utt_id = self.list_IDs[index]
        wave, _ = self.loader(
            _resolve(os.path.join(self.base_dir, "flac"), utt_id,
                     exts=(".flac", ".wav"))
        )
        return pad_numpy(wave, self.cut).astype(np.float32), \
            self.labels[utt_id]


class ASVspoof2021EvalDataset:
    """Bare-list eval dataset (reference: data_utils_SSL.py:85-104):
    returns (repeat-padded waveform, utt_id)."""

    def __init__(self, protocol_file: str, base_dir: str, cut: int = 64600,
                 loader: AudioLoader = _default_loader):
        from occm_tpu.io.protocols import gen_spoof_list

        self.list_IDs = gen_spoof_list(protocol_file, is_eval=True)
        self.base_dir = base_dir
        self.cut = cut
        self.loader = loader

    def __len__(self) -> int:
        return len(self.list_IDs)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, str]:
        utt_id = self.list_IDs[index]
        wave, _ = self.loader(
            _resolve(os.path.join(self.base_dir, "flac"), utt_id,
                     exts=(".flac", ".wav"))
        )
        return pad_numpy(wave, self.cut).astype(np.float32), utt_id


class ASVDataset:
    """Scoring dataset (reference: oc_classifier.py:27-110).

    eval=False: bonafide protocol rows only (reference: oc_classifier.py:69-78)
    eval=True:  bare-utterance list (reference: oc_classifier.py:58-67)
    """

    def __init__(
        self,
        protocol_file: str,
        dataset_dir: str,
        eval: bool = False,  # noqa: A002 - mirrors the reference kwarg
        loader: AudioLoader = _default_loader,
    ):
        self.dataset_dir = dataset_dir
        self.eval = eval
        self.loader = loader
        if eval:
            self.file_list = parse_eval_protocol(protocol_file)
            self.label_list = ["unknown"] * len(self.file_list)
        else:
            files, labels = parse_train_protocol(protocol_file)
            self.file_list = [
                f for f, l in zip(files, labels) if l == "bonafide"
            ]
            self.label_list = ["bonafide"] * len(self.file_list)

    def __len__(self) -> int:
        return len(self.file_list)

    def file_paths(self) -> Optional[List[str]]:
        """Resolved audio paths in dataset order — the scoring fast lane
        (BucketedEmbedder.embed_paths: threaded native batch decode +
        prefetch) consumes paths instead of per-item Python decodes.
        None when a custom loader is installed (its decode semantics
        would be bypassed)."""
        if self.loader is not _default_loader:
            return None
        return [
            _resolve(self.dataset_dir, name, exts=(".flac", ".wav"))
            for name in self.file_list
        ]

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int]:
        path = _resolve(self.dataset_dir, self.file_list[idx],
                        exts=(".flac", ".wav"))
        wave, _ = self.loader(path)
        label = 1 if self.label_list[idx] == "spoof" else 0
        return wave.astype(np.float32), label
