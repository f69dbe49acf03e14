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


def lookup(table, ids):
    """Gather rows of an embedding table ([V, D] or [V] bias)."""
    mesh = current_mesh()
    if mesh is not None:
        from tlsan_tpu.parallel.sharded_embedding import sharded_lookup

        return sharded_lookup(mesh, table, ids)
    return jnp.take(table, ids, axis=0)
