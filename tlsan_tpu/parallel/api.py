"""Sharded training API: place state on a (dp, mp) mesh and build the jitted
multi-chip train step.

Data-parallel over dp (batch sharded, XLA psums the grads), vocab-sharded
tables over mp with the explicit shard_map gather (nn/embedding.py context).
Single-chip training uses train/loop.py; this module is the multi-chip path,
validated on a virtual CPU mesh (tests/test_parallel.py, __graft_entry__.py).
"""

from __future__ import annotations

from contextlib import nullcontext
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.nn import embedding
from tlsan_tpu.parallel.mesh import data_shardings, param_shardings, replicated
from tlsan_tpu.train.state import make_optimizer


def pad_config_for_mp(cfg: ModelConfig, mp: int) -> ModelConfig:
    """Round the vocab sizes up to multiples of mp (shard_map requires even
    row shards); record the true item count for eval-time catalog masking."""
    import dataclasses

    if mp <= 1:
        return cfg
    up = lambda n: ((n + mp - 1) // mp) * mp
    return dataclasses.replace(
        cfg,
        catalog_items=cfg.catalog_items or cfg.item_count,
        item_count=up(cfg.item_count),
        user_count=up(cfg.user_count),
        cate_count=up(cfg.cate_count),
    )


def pad_cate_list(cate_list, cfg: ModelConfig):
    """Extend item→cate map to the padded item count (pad rows map to 0)."""
    import numpy as np

    n = cfg.item_count - len(cate_list)
    if n <= 0:
        return cate_list
    return np.concatenate([np.asarray(cate_list),
                           np.zeros(n, dtype=np.asarray(cate_list).dtype)])


def pad_vocab_rows(params, counts_true, counts_padded):
    """Zero-pad the vocab dimension of every table from its true size to the
    mp-padded size.  Params are initialized at the TRUE shapes first, so the
    sharded run is bit-identical to the single-device run (same init draw,
    same L2 — pad rows are zero and carry no signal)."""
    tu, ti, tc = counts_true
    pu, pi, pc = counts_padded
    pad_of = {"item_emb": (ti, pi), "item_b": (ti, pi),
              "user_emb": (tu, pu), "usert_emb": (tu, pu),
              "cate_emb": (tc, pc),
              "short_w": (ti, pi), "long_w": (tu, pu)}

    def fix(path, leaf):
        name = str(getattr(path[-1], "key", ""))
        if name in pad_of and hasattr(leaf, "shape") and leaf.ndim >= 1:
            true_n, pad_n = pad_of[name]
            if leaf.shape[0] == true_n and pad_n > true_n:
                widths = [(0, pad_n - true_n)] + [(0, 0)] * (leaf.ndim - 1)
                return jnp.pad(leaf, widths)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, params)


def unpad_vocab_rows(tree, counts_true):
    """Inverse of pad_vocab_rows: slice every vocab-named leaf (params OR
    optimizer-moment trees — matched by leaf name) back to its TRUE row
    count.  Checkpoints are always written in this canonical unpadded form,
    so a single-device checkpoint restores into an mp>1 run and vice versa
    (cross-topology restore)."""
    tu, ti, tc = counts_true
    true_of = {"item_emb": ti, "item_b": ti, "user_emb": tu,
               "usert_emb": tu, "cate_emb": tc,
               "short_w": ti, "long_w": tu}

    def fix(path, leaf):
        name = str(getattr(path[-1], "key", ""))
        if name in true_of and hasattr(leaf, "shape") and leaf.ndim >= 1:
            n = true_of[name]
            if leaf.shape[0] > n:
                return leaf[:n]
        return leaf

    return jax.tree_util.tree_map_with_path(fix, tree)


def shard_train_state(mesh, params, opt_state, vocab_sharded: bool = True):
    """Place params/opt_state on the mesh: tables row-sharded over mp, dense
    weights replicated; opt_state mirrors params leaf-for-leaf."""
    p_sh = param_shardings(mesh, params, vocab_sharded)
    params = jax.device_put(params, p_sh)
    # optimizer-state subtrees that mirror the params STRUCTURE (adam/rmsprop
    # moments) inherit the params shardings wholesale; everything else
    # (clip/schedule counters) replicates.  Structure matching — not shape
    # matching — so same-shaped sharded/replicated tables (e.g. LSPM's
    # item_emb vs short_w) can never pick up each other's layout.
    pdef = jax.tree_util.tree_structure(params)

    def place(node):
        if jax.tree_util.tree_structure(node) == pdef:
            return p_sh
        return jax.tree_util.tree_map(lambda _: replicated(mesh), node)

    o_sh = jax.tree_util.tree_map(
        place, opt_state,
        is_leaf=lambda n: jax.tree_util.tree_structure(n) == pdef)
    opt_state = jax.device_put(opt_state, o_sh)
    return params, opt_state


def shard_batch(mesh, batch):
    return jax.device_put(batch, data_shardings(mesh, batch))


def make_sharded_train_step(model, cfg: ModelConfig, tc: TrainConfig,
                            cate_list, mesh, vocab_sharded: bool = True,
                            use_pallas: bool = False):
    """Returns step(params, opt_state, batch) -> (params, opt_state, loss),
    jitted over the mesh.  Call with state placed by shard_train_state and
    batches by shard_batch; XLA SPMD inserts dp-psums for replicated-param
    grads, and the embedding gathers run the explicit mp collectives."""
    opt = make_optimizer(tc)
    cate_list = jax.device_put(jnp.asarray(cate_list), replicated(mesh))

    def loss_fn(params, batch):
        return model.loss(params, batch, cate_list, cfg, use_pallas)

    @partial(jax.jit, donate_argnums=(0, 1))
    def _step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, batch):
        ctx = embedding.vocab_sharded(mesh) if vocab_sharded else nullcontext()
        with ctx:  # context governs trace-time lookup dispatch
            return _step(params, opt_state, batch)

    return step
