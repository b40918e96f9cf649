"""Multi-host bootstrap + helpers.

The reference has no distributed backend at all (SURVEY.md 2.26/5.8);
this is new capability. One ``initialize()`` call bootstraps
``jax.distributed`` (DCN), after which ``make_mesh`` spans all hosts'
devices and pjit shards over ICI+DCN transparently.

Host-local data policy: each host loads only its shard of the KITTI
sequence list (``host_shard``), and eval gathers are done with
``multihost_utils.process_allgather``.

``initialize`` MUST run before anything touches the XLA backend, so the
"is this a multi-process run?" decision is made purely from its
arguments and the environment — calling into jax (even
``jax.process_count()``) before ``jax.distributed.initialize`` would
initialize the backend and make the real bootstrap impossible.
"""

from __future__ import annotations

import os

import numpy as np

#: environment variables that request a multi-process run (the same
#: triple jax.distributed.initialize takes as arguments)
ENV_COORDINATOR = "ATDN_COORDINATOR_ADDRESS"
ENV_NUM_PROCESSES = "ATDN_NUM_PROCESSES"
ENV_PROCESS_ID = "ATDN_PROCESS_ID"

_initialized = False


def multiprocess_config(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[str, int, int] | None:
    """Resolve the (coordinator, num_processes, process_id) triple from
    explicit arguments, falling back to the environment. Returns None
    for a single-process run.

    Pure argument/env inspection — deliberately touches no jax state
    (see module docstring).
    """
    coordinator_address = coordinator_address or os.environ.get(
        ENV_COORDINATOR
    )
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])
    if coordinator_address is None and num_processes is None:
        return None
    if coordinator_address is None or num_processes is None or (
        process_id is None
    ):
        raise ValueError(
            "multi-process bootstrap needs all three of "
            "coordinator_address, num_processes, process_id "
            f"(got {coordinator_address!r}, {num_processes!r}, "
            f"{process_id!r})"
        )
    return coordinator_address, int(num_processes), int(process_id)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Bootstrap multi-host JAX. No-op (returns False) on a single
    process without coordinator env/args; returns True after a real
    ``jax.distributed.initialize``.

    Idempotent: a second call on an already-bootstrapped process is a
    no-op.
    """
    global _initialized
    cfg = multiprocess_config(
        coordinator_address, num_processes, process_id
    )
    if cfg is None:
        return False
    if _initialized:
        return True
    import jax

    jax.distributed.initialize(
        coordinator_address=cfg[0],
        num_processes=cfg[1],
        process_id=cfg[2],
    )
    _initialized = True
    return True


def host_shard(items: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Partition a work list (sequences, keyframe ranges) across hosts,
    round-robin for balance."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]


def allgather_host_arrays(x: np.ndarray):
    """Gather per-host numpy arrays onto every host (eval collection).

    Single-process: identity (wrapped in a list)."""
    import jax

    if jax.process_count() == 1:
        return [x]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(x)
    return list(gathered)
