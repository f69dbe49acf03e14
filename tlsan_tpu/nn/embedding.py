"""Embedding lookup with two backends (SURVEY.md §2.7 plan):

  - replicated fast path: plain jnp.take (small catalogs, single chip);
  - row-sharded path: explicit shard_map gather with psum over the mp axis
    (parallel/sharded_embedding.py), engaged by the `vocab_sharded` context.

Models call `lookup(table, ids)`; the trainer decides the backend once, at
trace time, by entering `vocab_sharded(mesh)` around jit tracing.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp

_state = threading.local()


@contextmanager
def mesh_context(mesh, vocab_is_sharded: bool = True):
    """Declare the active device mesh for trace time.  With
    ``vocab_is_sharded`` lookups on vocab tables run the explicit shard_map
    gather over the mp axis; either way ``current_batch_mesh()`` lets
    batch-level ops (the Pallas kernels) shard_map themselves over dp."""
    prev = getattr(_state, "ctx", (None, False))
    _state.ctx = (mesh, vocab_is_sharded)
    try:
        yield
    finally:
        _state.ctx = prev


def vocab_sharded(mesh):
    """Back-compat alias: mesh with mp-sharded vocab tables."""
    return mesh_context(mesh, True)


def current_mesh():
    """Mesh for vocab-table lookups (None unless tables are mp-sharded)."""
    mesh, vs = getattr(_state, "ctx", (None, False))
    return mesh if vs else None


def current_batch_mesh():
    """Mesh for batch-dim ops (set whenever ANY mesh is active)."""
    return getattr(_state, "ctx", (None, False))[0]


# --- matmul-backward gather -------------------------------------------------
#
# TPU row-gather runs on the scalar/vector units; its VJP (scatter-add into
# zeros_like(table)) is the single most expensive part of the small-model
# train step (measured: 213 us of a 316 us fwd+bwd gather at b512xT90 into a
# [1583, 64] table vs 172 us TOTAL for the one-hot-matmul form -
# runs/r3/bench_gather_v1583b.txt).  `lookup` therefore keeps jnp.take for
# the FORWARD (fastest and bit-exact; eval/serving never differentiates) and
# replaces only the backward scatter with dtable = onehot(ids)^T @ dy on the
# MXU at HIGHEST precision.  The replacement is exact up to f32 summation
# order (measured max rel diff 3e-7, the same class of reorder noise XLA's
# unordered scatter-add already carries).
#
# Cost model: the matmul backward is O(R*V*D) FLOPs vs the scatter's ~O(R*D)
# bytes, so it only wins for small vocabularies; the auto threshold below
# comes from the on-chip V-sweep (runs/r3/bench_gather_v*.txt).  Large-vocab
# regimes are exactly where the touched-row sparse path (train/sparse.py)
# takes over anyway.

# engage the matmul backward when V <= this (on-chip crossover sweep)
ONEHOT_BWD_MAX_V = 8192
# and when the gather is big enough for the MXU to matter
ONEHOT_BWD_MIN_ROWS = 1024


def _accel() -> bool:
    """True when tracing for a backend where the one-hot matmul backward is
    a measured win (TPU — the MXU services it; on CPU it's a measured 60×
    LOSS at the same shapes, so 'auto' never engages there).  Tests that
    need the engaged path on CPU monkeypatch this or force 'onehot'."""
    import jax

    return jax.default_backend() == "tpu"


@contextmanager
def gather_bwd(mode: str):
    """Force the gather-backward strategy at trace time: 'auto' (default),
    'take' (always scatter-add - bitwise-reproducible vs round-2 traces),
    or 'onehot' (always matmul, ignoring the size heuristic)."""
    assert mode in ("auto", "take", "onehot"), mode
    prev = getattr(_state, "gather_bwd", "auto")
    _state.gather_bwd = mode
    try:
        yield
    finally:
        _state.gather_bwd = prev


def gather_bwd_mode() -> str:
    return getattr(_state, "gather_bwd", "auto")


@jax.custom_vjp
def _take_matmul_bwd(table, ids):
    return jnp.take(table, ids, axis=0)


def _take_matmul_bwd_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape[0])


def _take_matmul_bwd_bwd(res, ct):
    ids, V = res
    flat = ids.reshape(-1)
    ct2 = ct.reshape(flat.shape[0], ct.shape[-1])
    # one-hot 0/1 entries and the bf16x6 split of the f32 cotangent make the
    # product exact per term; only cross-row accumulation order differs from
    # the scatter-add.  Under bf16 compute the one-hot is still exact and the
    # accumulation stays f32 (preferred_element_type); the result is cast
    # back to the table's dtype — which is ct's dtype, since take preserves
    # dtype (custom_vjp cotangents must match the primal)
    oh = jax.nn.one_hot(flat, V, dtype=ct2.dtype)
    dtable = jax.lax.dot_general(
        oh, ct2, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return dtable.astype(ct2.dtype), None


_take_matmul_bwd.defvjp(_take_matmul_bwd_fwd, _take_matmul_bwd_bwd)


def lookup(table, ids):
    """Gather rows of an embedding table ([V, D] or [V] bias)."""
    mesh = current_mesh()
    if mesh is not None:
        from tlsan_tpu.parallel.sharded_embedding import sharded_lookup

        return sharded_lookup(mesh, table, ids)
    mode = gather_bwd_mode()
    ids = jnp.asarray(ids)
    if (table.ndim == 2 and mode != "take"
            and (mode == "onehot"
                 or (_accel()
                     and table.shape[0] <= ONEHOT_BWD_MAX_V
                     and ids.size >= ONEHOT_BWD_MIN_ROWS))):
        return _take_matmul_bwd(table, ids)
    return jnp.take(table, ids, axis=0)


# item vocab above which building the fused [V, Di+Dc] table each step costs
# more HBM traffic than the gather dispatches it eliminates (~2·V·512 B per
# step vs ~3 gather-op latencies; crossover measured on chip — RESULTS.md)
FUSED_ITEM_CATE_MAX_V = 24576


def item_cate_lookup(item_emb, cate_emb, ids, cate_list):
    """item⊕cate embedding of an id tensor: rows ``concat(item_emb[ids],
    cate_emb[cate_list[ids]])`` — the pattern every model family uses for
    history and candidate items (reference: TLSAN/model.py:84-87).

    The naive form is 2 row-gathers + an index-gather + a concat PER CALL
    SITE, and TLSAN has three sites (long history, short history, candidate
    items): ~9 scalar-unit gather dispatches per step, the dominant stage of
    the latency-bound b32 step (roofline: 139 µs of 240 µs).  For small item
    vocabularies this instead builds the fused table
    ``concat(item_emb, cate_emb[cate_list])`` — identical at every site, so
    XLA CSEs the build across sites — and does ONE gather per site.  Forward
    values are bitwise-identical (gather∘concat commute exactly); the
    backward accumulates through the fused table (slice → item_emb; a
    one-hot matmul over the static cate_list → cate_emb), so grads differ
    from the per-site path only by f32 summation order.

    Falls back to the per-site form under a vocab-sharded mesh (the fused
    build would gather the full item vocab through the exchange), for large
    vocabularies, and in gather_bwd('take') mode (the bitwise-frozen path
    the transplant harnesses pin)."""
    if (current_mesh() is None and gather_bwd_mode() != "take"
            and item_emb.ndim == 2
            and item_emb.shape[0] <= FUSED_ITEM_CATE_MAX_V):
        fused = jnp.concatenate(
            [item_emb, lookup(cate_emb, cate_list)], axis=-1)
        return lookup(fused, ids)
    ie = lookup(item_emb, ids)
    ce = lookup(cate_emb, cate_list[ids])
    return jnp.concatenate([ie, ce], axis=-1)
