"""Multi-host orchestration.

The reference scaled out by launching independent seeded processes on an
HPC cluster (SURVEY.md §2.3).  The TPU-native replacement is a single
SPMD program over all hosts of a pod slice: ``initialize()`` wires up
``jax.distributed``, after which ``jax.devices()`` spans every chip, a
``Mesh`` built by ``bp_osd_tpu.parallel.make_mesh`` covers the slice, and
the batched decode / Monte-Carlo harness shard the syndrome batch over
ICI + DCN with no further code changes.
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "is_multi_host", "host_batch_slice"]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize JAX's distributed runtime (no-op on a single host).

    On TPU pods launched through standard tooling the arguments are
    auto-detected; pass them explicitly for manual setups.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-host / already-initialized environments
        pass


def is_multi_host() -> bool:
    return jax.process_count() > 1


def host_batch_slice(total_batch: int) -> tuple[int, int]:
    """(start, size) of this host's slice of a globally sharded batch."""
    per_host = total_batch // jax.process_count()
    start = jax.process_index() * per_host
    return start, per_host
