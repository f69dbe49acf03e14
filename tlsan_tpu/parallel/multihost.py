"""Multi-host runtime glue.

The reference is a single process (SURVEY.md §2.8); here scaling past one
host is `jax.distributed.initialize` + the same (dp, mp) mesh program —
XLA collectives ride ICI within a slice and DCN across hosts.  The trainer's
device-resident data design already shards per-host work: each host feeds
only its local dp shard of the batch gather.

Usage (one call per host process, before any jax op):

    from tlsan_tpu.parallel.multihost import init_distributed
    init_distributed(coordinator="host0:1234", num_processes=2, process_id=i)

On a single host this is a no-op.  This environment exposes one chip, so the
multi-host path is exercised structurally (virtual mesh in tests +
__graft_entry__.dryrun_multichip); the code path below is the standard JAX
multi-controller bring-up and carries no app-specific logic to get wrong.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the JAX multi-controller runtime; returns process count.

    With no arguments relies on the cluster environment (TPU pod metadata);
    no-op when running single-process.
    """
    if num_processes in (None, 0, 1) and coordinator is None:
        return 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count()


def local_batch_slice(global_batch: int) -> slice:
    """The rows of a globally-indexed batch owned by this host (contiguous
    per-process sharding of the dp axis)."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (
        f"global batch {global_batch} must divide evenly over "
        f"{n_proc} processes — remainder rows would be fed by no host")
    per = global_batch // n_proc
    start = jax.process_index() * per
    return slice(start, start + per)
