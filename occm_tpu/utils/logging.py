"""Training observability.

Preserves the reference's artefacts byte-for-byte:
- `loss.txt` running-average lines every `log_every` steps
  (reference: oc_training.py:391-395),
- optional wandb logging with the same metric names
  (reference: oc_training.py:396),
and adds a structured JSONL stream (metrics.jsonl) the reference lacks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(
        self,
        loss_txt: Optional[str] = "loss.txt",
        jsonl: Optional[str] = "metrics.jsonl",
        wandb_project: Optional[str] = None,
        wandb_entity: Optional[str] = None,
    ):
        self.loss_txt = loss_txt
        self.jsonl = jsonl
        self._wandb = None
        if wandb_project:
            try:
                import wandb  # optional dependency, absent in this image

                wandb.init(project=wandb_project, entity=wandb_entity)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log_running(self, epoch: int, i: int, running_loss: float,
                    running_closs: float, running_dloss: float) -> None:
        """Running-average line, format-exact with reference
        oc_training.py:393-395 (note the trailing space before newline)."""
        denom = i + 1
        if self.loss_txt:
            with open(self.loss_txt, "a") as f:
                f.write(
                    f"epoch = {epoch + 1}, i = {i + 1}, "
                    f"loss = {running_loss / denom:.3f}, "
                    f"closs = {running_closs / denom:.3f}, "
                    f"dloss = {running_dloss / denom:.3f} \n"
                )
        if self._wandb:
            self._wandb.log(
                {
                    "Epoch": epoch,
                    "Train Loss": running_loss / denom,
                    "Train Compactness Loss": running_closs / denom,
                    "Train Descriptiveness Loss": running_dloss / denom,
                }
            )

    def log_jsonl(self, **record) -> None:
        if not self.jsonl:
            return
        record.setdefault("time", time.time())
        with open(self.jsonl, "a") as f:
            f.write(json.dumps(record) + "\n")
