"""Row-sharded embedding tables with explicit collective gathers.

TPU-native replacement for the reference's single-device
`tf.nn.embedding_lookup` (TLSAN/model.py:84-113): each mp shard holds a
contiguous row range of the table; a lookup computes the local masked gather
and psums partial rows over the mp axis (each id lives on exactly one shard,
so the psum is an exchange, riding the ICI).  The backward pass is the
transpose — a local masked scatter-add of the psum'd cotangent — which
shard_map's autodiff derives automatically.

For the catalogs in BASELINE.md (≤40K users / ≤28K items) one shard easily
holds a full table; sharding exists for the scale story (multi-host pods,
catalog growth) and is validated on a virtual 8-device mesh in
tests/test_parallel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tlsan_tpu.parallel.mesh import DP_AXIS, MP_AXIS


def _local_masked_gather(table_shard, ids, axis_name: str):
    """Gather rows of a row-sharded table for global ids; zero rows for ids
    owned by other shards, then psum to materialize the full gather."""
    vloc = table_shard.shape[0]
    shard = jax.lax.axis_index(axis_name)
    local = ids - shard * vloc
    inrange = (local >= 0) & (local < vloc)
    safe = jnp.clip(local, 0, vloc - 1)
    rows = jnp.take(table_shard, safe, axis=0)
    if rows.ndim > inrange.ndim:
        inrange = inrange[..., None]
    rows = rows * inrange.astype(rows.dtype)
    return jax.lax.psum(rows, axis_name)


def sharded_lookup(mesh: Mesh, table, ids, batch_sharded: bool = True):
    """Embedding lookup on a vocab-sharded table under a (dp, mp) mesh.

    table: [V, D] (or [V] for biases), sharded P(mp, ...);
    ids:   int32 [...], sharded P(dp) on the leading dim (replicated over mp).
    Returns rows [..., D] sharded like ids.
    """
    ids_spec = P(DP_AXIS) if batch_sharded else P()
    table_spec = P(MP_AXIS, *([None] * (table.ndim - 1)))
    out_rank = ids.ndim + table.ndim - 1
    out_spec = (P(DP_AXIS, *([None] * (out_rank - 1)))
                if batch_sharded else P(*([None] * out_rank)))

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(table_spec, ids_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    def _lookup(table_shard, ids_local):
        return _local_masked_gather(table_shard, ids_local, MP_AXIS)

    return _lookup(table, ids)


def dense_lookup(table, ids):
    """Single-device / replicated fast path: plain gather."""
    return jnp.take(table, ids, axis=0)
