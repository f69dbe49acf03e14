"""Distributed full-catalog scoring + top-k over a vocab-sharded item table.

TPU-native replacement for the reference's single-device eval matmul +
streaming tf.metrics top-k (TLSAN/model.py:140-156): each mp shard scores its
row range of the catalog ([B, D] × [D, V/mp] on the MXU), takes a local
top-k, then the k·mp candidates are all-gathered over the mp axis and
reduced to the global top-k.  Communication is k·mp (value, index) pairs per
query instead of the full [B, V] score matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tlsan_tpu.parallel.mesh import DP_AXIS, MP_AXIS


def sharded_topk_scores(mesh: Mesh, u_repr, all_emb, all_b, k: int,
                        catalog_items: int | None = None):
    """Global top-k (values, indices) of u_repr @ all_emb.T + all_b.

    u_repr [B, D] sharded P(dp); all_emb [V, D] sharded P(mp); all_b [V] or
    None.  Returns (values [B, k], indices [B, k]) sharded P(dp).
    `catalog_items` masks the mp-padding catalog rows (global row id ≥
    catalog_items) out of the ranking.
    """
    has_bias = all_b is not None
    bias_spec = (P(MP_AXIS),) if has_bias else ()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(DP_AXIS, None), P(MP_AXIS, None)) + bias_spec,
        out_specs=(P(DP_AXIS, None), P(DP_AXIS, None)),
        check_vma=False,
    )
    def _topk(u_local, emb_shard, *maybe_bias):
        vloc = emb_shard.shape[0]
        shard = jax.lax.axis_index(MP_AXIS)
        scores = jax.lax.dot_general(
            u_local, emb_shard,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision="highest")              # [B_local, V/mp]
        if maybe_bias:
            scores = scores + maybe_bias[0]
        if catalog_items is not None:
            gids = shard * vloc + jnp.arange(vloc)
            scores = jnp.where(gids[None, :] < catalog_items,
                               scores, -jnp.inf)
        k_local = min(k, vloc)
        vals, idx = jax.lax.top_k(scores, k_local)
        idx = idx + shard * vloc              # globalize indices
        # gather the candidate sets of every shard: [B, k_local * mp]
        vals_all = jax.lax.all_gather(vals, MP_AXIS, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, MP_AXIS, axis=1, tiled=True)
        vals_g, pos = jax.lax.top_k(vals_all, k)
        idx_g = jnp.take_along_axis(idx_all, pos, axis=1)
        return vals_g, idx_g

    args = (u_repr, all_emb) + ((all_b,) if has_bias else ())
    return _topk(*args)
