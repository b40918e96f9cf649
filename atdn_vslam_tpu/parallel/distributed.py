"""Multi-host bootstrap + helpers.

The reference has no distributed backend at all (SURVEY.md 2.26/5.8);
this is new capability. One ``initialize()`` call bootstraps
``jax.distributed`` (DCN), after which ``make_mesh`` spans all hosts'
devices and pjit shards over ICI+DCN transparently.

Host-local data policy: each host loads only its shard of the KITTI
sequence list (``host_shard``), and eval gathers are done with
``multihost_utils.process_allgather``.
"""

from __future__ import annotations

import jax
import numpy as np


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bootstrap multi-host JAX. No-op on a single process without
    coordinator env/args."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is None and num_processes is None:
        return  # single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(items: list, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Partition a work list (sequences, keyframe ranges) across hosts,
    round-robin for balance."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]


def allgather_host_arrays(x: np.ndarray):
    """Gather per-host numpy arrays onto every host (eval collection).

    Single-process: identity (wrapped in a list)."""
    if jax.process_count() == 1:
        return [x]
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(x)
    return list(gathered)
