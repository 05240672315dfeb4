"""Multi-host / pod runtime initialization.

The reference has no distributed runtime (SURVEY.md §2.2). Here the comm
backend is JAX's: `jax.distributed.initialize` connects hosts, XLA
collectives ride ICI within a slice and DCN across slices. This wrapper
standardizes env-driven initialization (JAX_COORDINATOR_ADDRESS, etc.) and
is a no-op on single-host so every entry point can call it unconditionally.

Pod-scale layout guidance (BASELINE.json:5 "gallery sharded over ICI"):
put the ``gallery`` mesh axis on the ICI-contiguous device dimension so the
per-query (k scores, k indices) all-gather never crosses DCN; replicate
queries per slice and batch them over ``data`` across slices.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or environment. Returns True if
    multi-process mode was initialized, False for single-host."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if not coordinator_address or not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    import jax

    return jax.process_index() == 0
