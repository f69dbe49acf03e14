"""shard_map composition for the Pallas kernels under a (dp, mp) mesh.

pallas_call has no GSPMD partitioning rule, so a sharded operand would be
replicated (or fail to lower).  Both attention kernels are purely
batch-parallel, so the composition is mechanical: shard_map the kernel over
the dp axis (each device runs the kernel on its local batch rows), with the
small weight operands replicated.  Differentiation passes through shard_map
into the kernels' custom VJPs unchanged.

This removes round-1's "Pallas XOR mesh" restriction (the trainer used to
force the XLA path whenever dp·mp > 1).
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from tlsan_tpu.parallel.mesh import DP_AXIS


def shard_map_batch_op(mesh, fn, x, lengths, *weights):
    """Run ``fn(x, lengths, *weights) -> [B, ...]`` per-dp-shard.

    x/lengths are batch-leading (sharded over dp); weights replicate.
    """
    wrapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(DP_AXIS), P(DP_AXIS)) + tuple(P() for _ in weights),
        out_specs=P(DP_AXIS),
        check_vma=False,
    )
    return wrapped(x, lengths, *weights)


def mha_sharded(mesh, q, k, ql, kl, num_heads, p):
    """ATRank MHA kernel per-dp-shard (weights pytree replicated)."""
    from tlsan_tpu.ops.pallas.mha import mha_pallas

    p_specs = jax.tree_util.tree_map(lambda _: P(), p)
    wrapped = jax.shard_map(
        lambda q, k, ql, kl, p: mha_pallas(q, k, ql, kl, num_heads, p),
        mesh=mesh,
        in_specs=(P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), P(DP_AXIS), p_specs),
        out_specs=P(DP_AXIS),
        check_vma=False,
    )
    return wrapped(q, k, ql, kl, p)
