"""Sparse (touched-row) SGD updates for the vocab embedding tables.

The reference gets row-sparse embedding gradients from TF's
``tf.nn.embedding_lookup`` → ``IndexedSlices`` (TLSAN/model.py:84-113) and
applies them with the optimizer's sparse path (TLSAN/model.py:197-205).  A
naive JAX train step instead materializes dense ``[V, D]`` gradients (the
gather VJP is a scatter-add into ``zeros_like(table)``), so every step pays
~5 full-table HBM passes (grad zeros+scatter, global-norm read, SGD
update, apply) — the measured 4× throughput collapse at Electronics scale
(RESULTS.md round-1 stress test).

One measured caveat to the "TF is sparse" story: for 6 of the 9 families
(TLSAN/SHAN/PACA/CSAN/CNN/Bi-LSTM) the reference's L2 term is over the FULL
table variables (e.g. ``tf.nn.l2_loss(user_emb)`` — TLSAN/model.py:164-168),
which makes even TF's aggregated gradient dense there.  This module keeps
the exact same semantics while staying sparse:

  * the model computes its L2 over the *gathered row block* (the rows it
    touched) — giving exactly the dense gradient restricted to touched rows;
  * the untouched-row part of the L2 gradient is ``rr·T`` — applied
    analytically as ONE fused multiplicative decay pass
    ``T ← (1 − lr·clip·rr)·T`` plus a sparse correction on touched rows;
  * the global-norm clip needs ‖grad‖ over the whole tree — the untouched
    contribution is ``rr²·(‖T‖² − ‖T_rows‖²)``, tracked by a carried scalar
    ``q = ‖T‖²`` with an exact sparse recurrence (re-read densely once per
    fused chunk, so float drift is bounded to steps_per_call steps).

Net per-step cost: one fused elementwise decay pass over tables with
full-table L2 (skipped entirely for row-L2 models: ATRank/LSPM/BPR) plus
O(touched rows) gather/scatter — instead of ~5 dense passes.

Exactness: for optimizer='sgd' + clip_by_global_norm + the piecewise LR
schedule, the update equals the dense optax step up to float associativity
(tests/test_sparse.py drives both paths over real data and asserts
tolerance-level parity on every parameter).

Adam (``make_sparse_adam_chunk``) keeps the exact dense-Adam semantics the
reference's sparse path has — TF's AdamOptimizer._apply_sparse does a DENSE
``m *= b1`` / ``v *= b2`` decay plus a sparse scatter-add, then a dense var
update — so the moments are updated by scatter at touched rows over a fused
elementwise decay, never materializing the dense [V, D] gradient (zeros +
scatter + global-norm read are all skipped).  Exact vs optax.adam to float
associativity; ~half the dense HBM passes, not the 40x of sparse SGD
(Adam's own m/v/var elementwise passes are irreducible under its exact
semantics — untouched rows keep moving while their moments decay).

Mesh composition: under a (dp, mp) mesh the batch is dp-sharded, unique
ids are replicated, the row gather of an mp-sharded table is the masked
gather + psum exchange (parallel/sharded_embedding.py), and the touched-row
scatter runs shard_mapped on each mp shard's local row range.  Engaged by
the Trainer for optimizer in {'sgd', 'adam'} in single- AND multi-process
mode: a multi-controller pod builds the chunk with ``assembled=True`` —
each host contributes only its local dp shard of every batch
(Trainer._global_batches) and the chunk consumes global [K, B, ...]
arrays directly, so a 2M-row vocab gets touched-row updates on real pods
too (VERDICT r3 #4; 2-process Gloo parity in tests/test_multihost.py).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from tlsan_tpu.train.state import bf16_cast, wants_bf16

# id spaces: which batch keys hold ids of a space, and which param tables
# are indexed by that space (models use the subset present in their params)
ITEM_KEYS: Tuple[str, ...] = ("hist_i", "hist_i_new", "i", "j")
ITEM_TABLES: Tuple[str, ...] = ("item_emb", "item_b", "short_w")
USER_KEYS: Tuple[str, ...] = ("u",)
USER_TABLES: Tuple[str, ...] = ("user_emb", "usert_emb", "long_w")


class SpaceSpec:
    """One id space: batch keys, table names, static unique-capacity K."""

    def __init__(self, keys: List[str], tables: List[str], size: int,
                 vocab: int):
        self.keys = keys
        self.tables = tables
        self.size = size        # K = total id slots in one batch (static)
        self.vocab = vocab      # sentinel id for padding (> every real id)


def build_spaces(params: Dict, data: Dict, batch_size: int) -> List[SpaceSpec]:
    """Decide which id spaces can be sparsified for this model + dataset.

    `data` holds the full packed arrays ([N, ...]); per-example slot counts
    come from their trailing dims.
    """

    def slots(key):
        n = 1
        for d in data[key].shape[1:]:
            n *= int(d)
        return n

    spaces = []
    item_keys = [k for k in ITEM_KEYS if k in data]
    item_tabs = [t for t in ITEM_TABLES if t in params]
    if item_keys and item_tabs:
        K = batch_size * sum(slots(k) for k in item_keys)
        spaces.append(SpaceSpec(item_keys, item_tabs, K,
                                int(params[item_tabs[0]].shape[0])))
    user_keys = [k for k in USER_KEYS if k in data]
    user_tabs = [t for t in USER_TABLES if t in params]
    if user_keys and user_tabs:
        K = batch_size * sum(slots(k) for k in user_keys)
        spaces.append(SpaceSpec(user_keys, user_tabs, K,
                                int(params[user_tabs[0]].shape[0])))
    return spaces


def sparsifiable(params: Dict, data: Dict) -> bool:
    return bool(build_spaces(params, data, 1))


def _sq(x) -> jnp.ndarray:
    return jnp.sum(jnp.square(x))


def make_table_ops(mesh, vocab_sharded: bool):
    """(gather, scatter_add) for vocab tables, mesh-aware.

    Single-device / replicated: plain take (OOB sentinel → zero row) and
    ``.at[].add(mode="drop")``.  Under a (dp, mp) mesh with mp-sharded
    tables: the gather is the masked-gather + psum exchange
    (parallel/sharded_embedding.py) with replicated ids, and the scatter
    runs shard_mapped — each mp shard scatters only the rows in its local
    range (ids are shifted into shard-local space; out-of-range rows drop).
    """
    if mesh is None or not vocab_sharded:
        def gather(name, table, uids):
            return jnp.take(table, uids, axis=0, mode="fill", fill_value=0)

        def scatter_add(name, table, uids, delta):
            return table.at[uids].add(delta, mode="drop")

        return gather, scatter_add

    from functools import partial

    from jax.sharding import PartitionSpec as P

    from tlsan_tpu.parallel.mesh import MP_AXIS, VOCAB_SHARDED_PARAMS
    from tlsan_tpu.parallel.sharded_embedding import sharded_lookup

    def gather(name, table, uids):
        if name not in VOCAB_SHARDED_PARAMS:
            return jnp.take(table, uids, axis=0, mode="fill", fill_value=0)
        return sharded_lookup(mesh, table, uids, batch_sharded=False)

    def scatter_add(name, table, uids, delta):
        if name not in VOCAB_SHARDED_PARAMS:
            return table.at[uids].add(delta, mode="drop")
        spec_t = P(MP_AXIS, *([None] * (table.ndim - 1)))

        @partial(jax.shard_map, mesh=mesh, in_specs=(spec_t, P(), P()),
                 out_specs=spec_t, check_vma=False)
        def _scat(tab, u, d):
            vloc = tab.shape[0]
            local = u - jax.lax.axis_index(MP_AXIS) * vloc
            ok = (local >= 0) & (local < vloc)
            # any out-of-shard (or sentinel) id maps to vloc → dropped
            safe = jnp.where(ok, local, vloc)
            return tab.at[safe].add(d, mode="drop")

        return _scat(table, uids, delta)

    return gather, scatter_add


def make_batch_constrain(mesh):
    """Shard the chunk's pre-gathered [K, B, ...] batch arrays over dp on
    the batch dim (mirrors the dense mesh path)."""
    if mesh is None:
        return lambda batches, lead_dims=2: batches
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tlsan_tpu.parallel.mesh import DP_AXIS

    def constrain(batches, lead_dims=2):
        out = {}
        for k, v in batches.items():
            lead = [None] * (lead_dims - 1) + [DP_AXIS]
            spec = P(*lead, *([None] * (v.ndim - lead_dims)))
            out[k] = jax.lax.with_sharding_constraint(
                v, NamedSharding(mesh, spec))
        return out

    return constrain


def make_gather_space(mesh, gather):
    """Per-space prep: unique ids (sentinel-padded, sorted), masked row
    blocks, remapped batch keys.  Under a mesh the ids are constrained
    replicated so the row blocks land replicated on every device."""

    def gather_space(params, batch, sp: SpaceSpec):
        flat = jnp.concatenate(
            [batch[k].reshape(-1).astype(jnp.int32) for k in sp.keys])
        # fill_value=vocab keeps the padded array sorted (sentinel > all
        # real ids), so searchsorted stays exact; the sentinel slots gather
        # zero rows (OOB fill), so they are inert in the model's row-L2
        uids = jnp.unique(flat, size=sp.size, fill_value=sp.vocab)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            uids = jax.lax.with_sharding_constraint(
                uids, NamedSharding(mesh, P()))
        rows = {t: gather(t, params[t], uids) for t in sp.tables}
        remapped = {k: jnp.searchsorted(uids, batch[k].astype(jnp.int32))
                    for k in sp.keys}
        return uids, rows, remapped

    return gather_space


def make_sparse_chunk(model, cfg, tc, cate_list, data, params, use_pallas,
                      schedule, mesh=None, vocab_sharded: bool = False,
                      assembled: bool = False):
    """Build the jitted fused-scan train chunk with sparse table updates.

    Returns ``chunk(params, step0, idx, rng, data) -> (params, rng,
    mean_loss)``
    semantically interchangeable with the dense optax chunk in
    train/loop.py (same carry contract minus opt_state, which SGD doesn't
    need beyond the step count — passed explicitly as ``step0``).

    assembled=True (the multi-PROCESS path, VERDICT r3 #4): the chunk takes
    pre-assembled global dp-sharded ``[K, B, ...]`` batch arrays instead of
    ``(idx, data)`` — each controller only holds its host shard of the
    dataset, so Trainer._global_batches does the per-host slice assembly
    and the chunk signature becomes ``chunk(params, step0, batches, rng)``.
    """
    spaces = build_spaces(params, data, tc.train_batch_size)
    assert spaces, "model/batch has no sparsifiable id space"
    # tables whose L2 is over the FULL table in the reference: their
    # untouched rows decay by (1 - lr*clip*rr) each step
    full_l2 = set(getattr(model, "l2_full_tables", ()))
    sparse_names = {t for sp in spaces for t in sp.tables}
    decay_names = sorted(sparse_names & full_l2)
    rr = cfg.regulation_rate
    max_norm = tc.max_gradient_norm
    use_dropout = cfg.dropout > 0.0
    gather, scatter_add = make_table_ops(mesh, vocab_sharded)
    constrain = make_batch_constrain(mesh)
    gather_space = make_gather_space(mesh, gather)
    bf16 = wants_bf16(tc)

    def loss_fn(sub_params, batch, local_cate):
        # mixed precision composes with the touched-row machinery by casting
        # ONLY here: the network runs bf16, the cast's VJP returns f32
        # cotangents, and the analytic L2/clip recurrence outside stays on
        # the f32 master rows (same discipline as the dense path)
        if bf16:
            sub_params = bf16_cast(sub_params)
            batch = bf16_cast(batch)
        return model.loss(sub_params, batch, local_cate, cfg, use_pallas)

    def make_step():
      def step(carry, batch):
        # scale: lazy L2-decay factor per full-L2 table — the stored array W
        # relates to the true table as T = scale·W, so the per-step decay is
        # O(1) instead of an O(V·D) multiply pass; folded back once per
        # chunk.  q tracks ‖T‖² (true values) for the global-norm clip.
        params, scale, q, step_no, rng = carry
        batch = dict(batch)
        if use_dropout:
            rng, sub = jax.random.split(rng)
            batch["dropout_rng"] = sub

        uids_by_space, rows_all = [], {}
        sub_params = dict(params)
        sub_batch = dict(batch)
        local_cate = cate_list
        for sp in spaces:
            uids, rows, remapped = gather_space(params, batch, sp)
            for t in sp.tables:
                if t in decay_names:  # rescale to TRUE row values
                    rows[t] = rows[t] * scale[t]
            uids_by_space.append(uids)
            rows_all.update(rows)
            sub_params.update(rows)
            sub_batch.update(remapped)
            if "item_emb" in sp.tables:
                # models resolve item→cate through cate_list[ids]; ids are
                # now local row indices, so hand them a local cate view
                local_cate = jnp.take(cate_list, uids, axis=0,
                                       mode="fill", fill_value=0)

        loss, grads = jax.value_and_grad(loss_fn)(
            sub_params, sub_batch, local_cate)

        # global-norm over the whole (dense ∪ sparse-rows) tree, plus the
        # analytic untouched-row L2 contribution rr²·(q_t − ‖rows_t‖²)
        gsq = sum(_sq(g) for g in jax.tree_util.tree_leaves(grads))
        untouched_sq = {t: jnp.maximum(q[t] - _sq(rows_all[t]), 0.0)
                        for t in decay_names}
        gsq = gsq + sum(rr * rr * untouched_sq[t] for t in decay_names)
        gnorm = jnp.sqrt(gsq)
        clip = jnp.where(gnorm < max_norm, 1.0, max_norm / gnorm)
        a = schedule(step_no) * clip  # effective step size (optax parity)

        new_params = dict(params)
        # dense leaves (possibly nested subtrees): plain SGD
        for name, g in grads.items():
            if name not in sparse_names:
                new_params[name] = jax.tree_util.tree_map(
                    lambda p, gg: p - a * gg, params[name], g)
        # sparsified tables: the untouched-row L2 decay folds into `scale`
        # (T' = d·T + scatter(δ) = scale'·(W + scatter(δ/scale'))); only the
        # touched rows are written.  Sentinel slots carry zero deltas and
        # OOB scatter indices are dropped.
        new_q, new_scale = {}, {}
        for sp, uids in zip(spaces, uids_by_space):
            for t in sp.tables:
                g_rows, r_rows = grads[t], rows_all[t]
                if t in decay_names:
                    d = 1.0 - a * rr
                    s_new = scale[t] * d
                    delta = a * rr * r_rows - a * g_rows
                    new_params[t] = scatter_add(t, params[t], uids,
                                                delta / s_new)
                    new_scale[t] = s_new
                    new_q[t] = (d * d * untouched_sq[t]
                                + _sq(r_rows - a * g_rows))
                else:
                    new_params[t] = scatter_add(t, params[t], uids,
                                                -a * g_rows)
        # reported loss: add back the L2 mass of untouched rows the row-L2
        # can't see, for display parity with the dense path
        loss = loss + 0.5 * rr * sum(untouched_sq[t] for t in decay_names)
        return (new_params, new_scale, new_q, step_no + 1, rng), loss
      return step

    from functools import partial

    # the dataset is an ARGUMENT (same device buffers every call, zero
    # copy) — closure constants get baked into the executable and thrash
    # the device program cache (see train/loop.py note)
    # same measured hoist gate as the dense chunk (train/loop.py): the
    # materialized [K, B, ...] chunk wins in the latency-bound small-batch
    # regime (+5% at b32) but costs extra HBM round-trips at large batches
    # (−9% at b512, runs/r3/bench_hoist_*) — large batches gather in-scan
    hoist = tc.train_batch_size <= 128

    if assembled:
        @partial(jax.jit, donate_argnums=(0,))
        def chunk(params, step0, batches, rng):
            step = make_step()
            q0 = {t: _sq(params[t]) for t in decay_names}
            s0 = {t: jnp.float32(1.0) for t in decay_names}
            (params, scale, _, _, rng), losses = jax.lax.scan(
                step, (params, s0, q0, step0, rng), batches)
            for t in decay_names:
                params[t] = params[t] * scale[t]
            return params, rng, jnp.mean(losses)

        return chunk

    @partial(jax.jit, donate_argnums=(0,))
    def chunk(params, step0, idx, rng, data):
        # batch assembly hoisted out of the scan (one gather per array per
        # chunk; the scan slices [K, B, ...] xs — see train/loop.py)
        step = make_step()
        if hoist:
            xs, body = constrain({k: v[idx] for k, v in data.items()}), step
        else:
            xs = idx

            def body(carry, ib):
                return step(carry, constrain(
                    {k: v[ib] for k, v in data.items()}, lead_dims=1))
        # q = ‖T‖² per decaying table; ONE dense read per fused chunk keeps
        # the in-scan recurrence drift bounded to steps_per_call steps.
        # scale starts at 1 and the accumulated decay is folded back into
        # the stored tables with ONE multiply pass after the scan.
        q0 = {t: _sq(params[t]) for t in decay_names}
        s0 = {t: jnp.float32(1.0) for t in decay_names}
        (params, scale, _, _, rng), losses = jax.lax.scan(
            body, (params, s0, q0, step0, rng), xs)
        for t in decay_names:
            params[t] = params[t] * scale[t]
        return params, rng, jnp.mean(losses)

    return chunk


# optax.adam defaults (train/state.py builds optax.adam(schedule))
ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def make_sparse_adam_chunk(model, cfg, tc, cate_list, data, params,
                           use_pallas, schedule, mesh=None,
                           vocab_sharded: bool = False,
                           assembled: bool = False):
    """Fused-scan train chunk with scatter-based Adam moments.

    Exact dense-Adam semantics (= optax.chain(clip_by_global_norm,
    optax.adam(schedule)), which itself matches the reference's
    TF-AdamOptimizer sparse path — TLSAN/model.py:197-205 — up to TF's
    epsilon placement): the [V, D] gradient of a vocab table is never
    materialized; the moments take a fused elementwise decay plus a
    touched-row scatter, and the table/moment update passes are the only
    dense work.  For full-table-L2 models the untouched-row gradient field
    is analytic (rr·T) and folds into the same elementwise passes.

    Returns ``chunk(params, mu, nu, step0, idx, rng, data) ->
    (params, mu, nu, rng, mean_loss)``; mu/nu are pytrees congruent with
    ``params`` (the live ScaleByAdamState moments).
    """
    spaces = build_spaces(params, data, tc.train_batch_size)
    assert spaces, "model/batch has no sparsifiable id space"
    full_l2 = set(getattr(model, "l2_full_tables", ()))
    sparse_names = {t for sp in spaces for t in sp.tables}
    decay_names = sorted(sparse_names & full_l2)
    rr = cfg.regulation_rate
    max_norm = tc.max_gradient_norm
    use_dropout = cfg.dropout > 0.0
    b1, b2, eps = ADAM_B1, ADAM_B2, ADAM_EPS
    gather, scatter_add = make_table_ops(mesh, vocab_sharded)
    constrain = make_batch_constrain(mesh)
    gather_space = make_gather_space(mesh, gather)
    bf16 = wants_bf16(tc)

    def loss_fn(sub_params, batch, local_cate):
        # bf16 network compute, f32 master rows/moments (see the SGD chunk)
        if bf16:
            sub_params = bf16_cast(sub_params)
            batch = bf16_cast(batch)
        return model.loss(sub_params, batch, local_cate, cfg, use_pallas)

    def make_step():
      def step(carry, batch):
        params, mu, nu, step_no, rng = carry
        batch = dict(batch)
        if use_dropout:
            rng, sub = jax.random.split(rng)
            batch["dropout_rng"] = sub

        uids_by_space, rows_all = [], {}
        sub_params = dict(params)
        sub_batch = dict(batch)
        local_cate = cate_list
        for sp in spaces:
            uids, rows, remapped = gather_space(params, batch, sp)
            uids_by_space.append(uids)
            rows_all.update(rows)
            sub_params.update(rows)
            sub_batch.update(remapped)
            if "item_emb" in sp.tables:
                local_cate = jnp.take(cate_list, uids, axis=0,
                                      mode="fill", fill_value=0)

        loss, grads = jax.value_and_grad(loss_fn)(
            sub_params, sub_batch, local_cate)

        # global-norm clip over (dense ∪ touched-row) grads + the analytic
        # untouched full-L2 contribution rr²·(‖T‖² − ‖rows‖²).  ‖T‖² is a
        # dense reduction, but Adam's own elementwise passes already read
        # every table row this step — XLA fuses the reduction into them.
        untouched_sq = {t: jnp.maximum(_sq(params[t]) - _sq(rows_all[t]), 0.0)
                        for t in decay_names}
        gsq = sum(_sq(g) for g in jax.tree_util.tree_leaves(grads))
        gsq = gsq + sum(rr * rr * untouched_sq[t] for t in decay_names)
        gnorm = jnp.sqrt(gsq)
        c = jnp.where(gnorm < max_norm, 1.0, max_norm / gnorm)

        # optax.scale_by_adam bias correction uses count+1; the schedule
        # multiplier (scale_by_learning_rate) uses its own count = step
        t1 = (step_no + 1).astype(jnp.float32)
        b1c = 1.0 - b1 ** t1
        b2c = 1.0 - b2 ** t1
        lr = schedule(step_no)

        def adam_apply(p, m, n):
            return p - lr * (m / b1c) / (jnp.sqrt(n / b2c) + eps)

        new_params = dict(params)
        new_mu = dict(mu)
        new_nu = dict(nu)
        # dense leaves (possibly nested subtrees): standard Adam
        for name, g in grads.items():
            if name not in sparse_names:
                m2 = jax.tree_util.tree_map(
                    lambda m_, g_: b1 * m_ + (1 - b1) * (c * g_),
                    mu[name], g)
                n2 = jax.tree_util.tree_map(
                    lambda n_, g_: b2 * n_ + (1 - b2) * jnp.square(c * g_),
                    nu[name], g)
                new_mu[name], new_nu[name] = m2, n2
                new_params[name] = jax.tree_util.tree_map(
                    adam_apply, params[name], m2, n2)
        # sparsified tables: elementwise moment decay (+ the analytic
        # untouched grad field rr·T for full-L2 tables) with a touched-row
        # scatter correction; then the dense var-update pass
        for sp, uids in zip(spaces, uids_by_space):
            for t in sp.tables:
                g_r, r_rows, T = grads[t], rows_all[t], params[t]
                if t in decay_names:
                    gu = c * rr  # untouched grad = gu·T, elementwise
                    m2 = b1 * mu[t] + (1 - b1) * gu * T
                    m2 = scatter_add(t, m2, uids,
                                     (1 - b1) * (c * g_r - gu * r_rows))
                    n2 = b2 * nu[t] + (1 - b2) * jnp.square(gu * T)
                    n2 = scatter_add(
                        t, n2, uids,
                        (1 - b2) * (jnp.square(c * g_r)
                                    - jnp.square(gu * r_rows)))
                else:
                    m2 = scatter_add(t, b1 * mu[t], uids,
                                     (1 - b1) * c * g_r)
                    n2 = scatter_add(t, b2 * nu[t], uids,
                                     (1 - b2) * jnp.square(c * g_r))
                new_mu[t], new_nu[t] = m2, n2
                new_params[t] = adam_apply(T, m2, n2)

        loss = loss + 0.5 * rr * sum(untouched_sq[t] for t in decay_names)
        return (new_params, new_mu, new_nu, step_no + 1, rng), loss
      return step

    from functools import partial

    hoist = tc.train_batch_size <= 128  # same measured gate as above

    if assembled:  # multi-process: pre-assembled global batches (see
        # make_sparse_chunk docstring)
        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def chunk(params, mu, nu, step0, batches, rng):
            (params, mu, nu, _, rng), losses = jax.lax.scan(
                make_step(), (params, mu, nu, step0, rng), batches)
            return params, mu, nu, rng, jnp.mean(losses)

        return chunk

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def chunk(params, mu, nu, step0, idx, rng, data):
        step = make_step()
        if hoist:
            xs, body = constrain({k: v[idx] for k, v in data.items()}), step
        else:
            xs = idx

            def body(carry, ib):
                return step(carry, constrain(
                    {k: v[ib] for k, v in data.items()}, lead_dims=1))
        (params, mu, nu, _, rng), losses = jax.lax.scan(
            body, (params, mu, nu, step0, rng), xs)
        return params, mu, nu, rng, jnp.mean(losses)

    return chunk


def find_adam_state(opt_state):
    """The ScaleByAdamState inside an optax.chain state tree."""
    import optax
    found = []
    jax.tree_util.tree_map(
        lambda x: found.append(x) if isinstance(x, optax.ScaleByAdamState)
        else None,
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    assert len(found) == 1, f"expected 1 ScaleByAdamState, got {len(found)}"
    return found[0]


def replace_adam_state(opt_state, mu, nu, step):
    """Write live moments + step counts back into the optax state tree so
    checkpoints stay interchangeable with the dense path."""
    import optax
    st = jax.tree_util.tree_map(
        lambda x: (optax.ScaleByAdamState(
            count=jnp.asarray(step, jnp.int32), mu=mu, nu=nu)
            if isinstance(x, optax.ScaleByAdamState) else x),
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
    # the schedule transform keeps its own integer count
    return jax.tree_util.tree_map(
        lambda x: (jnp.asarray(step, x.dtype)
                   if (hasattr(x, "dtype") and getattr(x, "ndim", None) == 0
                       and jnp.issubdtype(x.dtype, jnp.integer))
                   else x),
        st)


def opt_state_with_count(opt, params, step):
    """An optax state whose schedule counters equal `step`, so checkpoints
    written by the sparse path restore seamlessly into the dense path."""
    st = opt.init(params)
    return jax.tree_util.tree_map(
        lambda x: (jnp.asarray(step, x.dtype)
                   if (hasattr(x, "dtype") and x.ndim == 0
                       and jnp.issubdtype(x.dtype, jnp.integer))
                   else x),
        st)
