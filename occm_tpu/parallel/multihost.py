"""Multi-host / multi-slice initialisation (SURVEY.md §5.8).

The reference never leaves one host (torch DataParallel). TPU pods need one
call to jax.distributed.initialize before any jax use; after that the same
("dp","tp") mesh code in occm_tpu.parallel.mesh spans all hosts — lay dp/tp
so collectives ride ICI within a slice and only dp crosses DCN.
"""

from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent jax.distributed.initialize wrapper.

    With no arguments, relies on the TPU environment's auto-detection
    (the standard path on Cloud TPU pods).
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialised
        if "already" not in str(e).lower():
            raise


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
