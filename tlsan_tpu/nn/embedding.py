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
def vocab_sharded(mesh):
    """Within this context, lookups on vocab tables run the explicit
    shard_map gather over `mesh`'s mp axis."""
    prev = getattr(_state, "mesh", None)
    _state.mesh = mesh
    try:
        yield
    finally:
        _state.mesh = prev


def current_mesh():
    return getattr(_state, "mesh", None)


def lookup(table, ids):
    """Gather rows of an embedding table ([V, D] or [V] bias)."""
    mesh = current_mesh()
    if mesh is not None:
        from tlsan_tpu.parallel.sharded_embedding import sharded_lookup

        return sharded_lookup(mesh, table, ids)
    return jnp.take(table, ids, axis=0)
