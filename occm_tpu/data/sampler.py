"""Meta-batch sampling for one-class training.

Parity target: PFDataset's sampling scheme (reference: oc_training.py:129-256):
each bonafide anchor yields a 12-utterance meta-batch —

  [bona1..bona6, spoof1] in sorted-key order (reference: oc_training.py:215
  iterates sorted(file_assignments.items())), then 5 vocoded spoofs of bona1
  (reference: oc_training.py:233-242). Labels: bona=0, spoof/vocoded=1
  (reference: oc_training.py:225,240 — note this is the opposite of
  genSpoof_list's map).

The reference draws from the *global* unseeded `random` module; here draws
come from an explicit numpy Generator so epochs are reproducible and
shardable across data-parallel hosts.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

# reference: oc_training.py:174
VOCODER_NAMES = (
    "hifigan",
    "hn-sinc-nsf-hifi",
    "hn-sinc-nsf",
    "melgan",
    "waveglow",
)


class PFSampler:
    """Draws the 6-bona + 1-spoof + 5-vocoded meta-batch file lists."""

    def __init__(self, file_list: Sequence[str], label_list: Sequence[str]):
        self.file_list = list(file_list)
        self.label_list = list(label_list)
        # cached label indices (reference: oc_training.py:68-70)
        self.spoof_indices = [
            i for i, lab in enumerate(self.label_list) if lab == "spoof"
        ]
        self.bonafide_indices = [
            i for i, lab in enumerate(self.label_list) if lab == "bonafide"
        ]

    def __len__(self) -> int:
        # one meta-batch per bonafide utterance (reference: oc_training.py:70)
        return len(self.bonafide_indices)

    def _random_files(self, rng: np.random.Generator,
                      indices: Sequence[int], exclude_idx, n: int
                      ) -> List[str]:
        """random.sample equivalent (reference: oc_training.py:129-150)."""
        pool = [i for i in indices if i != exclude_idx]
        if len(pool) < n:
            raise ValueError("Not enough files to select from.")
        chosen = rng.choice(len(pool), size=n, replace=False)
        return [self.file_list[pool[int(c)]] for c in chosen]

    def sample(self, idx: int, rng: np.random.Generator
               ) -> Tuple[List[str], List[str], List[int]]:
        """Returns (main_files, vocoded_names, labels).

        idx indexes the bonafide list; the anchor is bona1
        (reference: oc_training.py:177-196).
        main_files: [bona1..bona6, spoof1] (sorted-key order);
        vocoded_names: 5 '<vocoder>_<bona1>' names; labels: 12 ints.
        """
        anchor = self.bonafide_indices[idx]
        bona = self._random_files(rng, self.bonafide_indices, anchor, 5)
        spoof = self._random_files(rng, self.spoof_indices, None, 1)
        # sorted(dict) order: bona1..bona6 < spoof1 lexicographically
        main = [self.file_list[anchor]] + bona + spoof
        vocoded = [f"{v}_{self.file_list[anchor]}" for v in VOCODER_NAMES]
        labels = [0] * 6 + [1] + [1] * 5
        return main, vocoded, labels
