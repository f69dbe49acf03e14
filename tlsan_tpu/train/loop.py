"""The training loop: device-resident data, fused multi-step scan, eval cadence.

Reproduces the reference trainer flow (TLSAN/train.py:121-239): initial eval,
epoch loop with per-epoch shuffle, loss prints every display_freq steps, AUC +
P@k/R@k eval every eval_freq steps, best-metric tracking after
best_after_step, AUC-gated checkpointing, and the LR step schedule — but
TPU-native:

  - the packed dataset lives in device HBM; each scan step gathers its batch
    by a permutation index, so the steady-state input pipeline does zero
    host↔device transfers (the reference re-pads every batch in python and
    feeds it through feed_dict — TLSAN/input.py:35-52, model.py:229);
  - `steps_per_call` optimizer steps run inside ONE jitted lax.scan dispatch,
    amortizing launch overhead that dominates at the reference's batch 32.
"""

from __future__ import annotations

import time
from contextlib import nullcontext
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding

from tlsan_tpu.core.config import ModelConfig, TrainConfig
from tlsan_tpu.data.batcher import Batches, epoch_index
from tlsan_tpu.nn import embedding
from tlsan_tpu.train import checkpoint as ckpt
from tlsan_tpu.train.evaluate import Evaluator
from tlsan_tpu.train.metrics import MetricWriter
from tlsan_tpu.train.state import make_optimizer
from tlsan_tpu.train.state import bf16_cast as _bf16_cast
from tlsan_tpu.train.state import wants_bf16 as _wants_bf16


class _NullWriter:
    """Non-host-0 ranks: metric/checkpoint output is host 0's job."""

    def write(self, *a, **k):
        pass

    def write_histograms(self, *a, **k):
        pass

    def close(self):
        pass


class Trainer:
    def __init__(
        self,
        model,
        cfg: ModelConfig,
        tc: TrainConfig,
        cate_list: np.ndarray,
        train_batches: Batches,
        test_batches: Batches,
        use_pallas: bool = True,
    ):
        self.model = model
        self.tc = tc
        self.opt = make_optimizer(tc)

        # optional (dp, mp) mesh: dp shards the batch, mp row-shards the
        # vocab tables with explicit collectives (docs/design.md)
        self.mesh = None
        counts_true = (cfg.user_count, cfg.item_count, cfg.cate_count)
        # pallas_call has no GSPMD partitioning rule, but the kernels are
        # batch-parallel: under a mesh they run shard_mapped over dp
        # (ops/pallas/sharded.py), so --pallas composes with dp/mp now
        self.use_pallas = use_pallas
        if tc.dp * tc.mp > 1:
            from tlsan_tpu.parallel.api import pad_cate_list, pad_config_for_mp
            from tlsan_tpu.parallel.mesh import make_mesh
            self.mesh = make_mesh(dp=tc.dp, mp=tc.mp)
            assert tc.train_batch_size % tc.dp == 0, "batch % dp != 0"
            assert tc.test_batch_size % tc.dp == 0, "test batch % dp != 0"
            cfg = pad_config_for_mp(cfg, tc.mp)
            cate_list = pad_cate_list(cate_list, cfg)
        self.cfg = cfg
        # multi-process (multi-host) mode: one Trainer per controller
        # process over a global (dp, mp) mesh; each host FEEDS only its
        # local dp shard of every batch (parallel/multihost.py), and only
        # host 0 writes checkpoints/metrics.
        self.n_proc = jax.process_count()
        if self.n_proc > 1:
            assert self.mesh is not None, (
                "multi-process training requires a (dp, mp) mesh "
                "(set tc.dp/tc.mp)")
            assert tc.dp % self.n_proc == 0, (
                f"dp={tc.dp} must divide over {self.n_proc} processes")
        self.is_host0 = jax.process_index() == 0
        self.cate_list = jnp.asarray(cate_list)
        if self.n_proc > 1:
            # dataset stays HOST-resident; batches are assembled per chunk
            # from each host's local rows (see _build_train_chunk_multihost)
            self.train_data = {k: np.asarray(v)
                               for k, v in train_batches.arrays.items()}
        else:
            self.train_data = {k: jnp.asarray(v)
                               for k, v in train_batches.arrays.items()}
        self.n_train = train_batches.n

        # restore-or-init (reference: TLSAN/train.py:59-84).  Init AND
        # restore at the TRUE vocab shapes — checkpoints are canonically
        # unpadded, so they round-trip across topologies (mp=1 ↔ mp>1) —
        # then zero-pad rows, so a sharded run draws the exact same
        # parameters as the single-device run.
        if self.is_host0:
            ckpt.maybe_wipe(tc.model_dir, tc.from_scratch)
        if self.n_proc > 1:  # no host may restore before host 0 wipes
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("tlsan:model_dir_ready")
        import dataclasses
        cfg_true = dataclasses.replace(
            cfg, user_count=counts_true[0], item_count=counts_true[1],
            cate_count=counts_true[2], catalog_items=0)
        self._cfg_true, self._counts_true = cfg_true, counts_true
        params = model.init_params(jax.random.PRNGKey(tc.seed), cfg_true)
        opt_state = self.opt.init(params)
        self.step = 0
        latest = ckpt.latest_checkpoint(tc.model_dir)
        if latest is not None:
            self.step, params, opt_state = ckpt.restore(latest, params, opt_state)
            print(f"restored from {latest} at step {self.step}", flush=True)
        if tc.mp > 1:
            from tlsan_tpu.parallel.api import pad_vocab_rows
            counts_padded = (cfg.user_count, cfg.item_count, cfg.cate_count)
            params = pad_vocab_rows(params, counts_true, counts_padded)
            opt_state = pad_vocab_rows(opt_state, counts_true, counts_padded)
        if self.mesh is not None:
            from tlsan_tpu.parallel.api import shard_train_state
            params, opt_state = shard_train_state(
                self.mesh, params, opt_state, vocab_sharded=tc.mp > 1)
        self.params, self.opt_state = params, opt_state

        self.evaluator = Evaluator(
            model, cfg, self.cate_list, test_batches, tc.test_batch_size,
            use_pallas, mesh=self.mesh, vocab_sharded=tc.mp > 1)
        # host 0 owns all on-disk output (checkpoints, metrics, events);
        # other ranks still run every jitted computation (global arrays
        # require all processes to participate) but write nothing
        self.writer = (MetricWriter(tc.model_dir) if self.is_host0
                       else _NullWriter())
        self._train_chunk = self._build_train_chunk()
        self._summary_fn = self._summary_from_idx = None
        if tc.tb_histograms:
            self._summary_fn, self._summary_from_idx = \
                self._build_summary_fn()

    # ------------------------------------------------------------------

    def _build_train_chunk(self):
        model, cfg, cate_list = self.model, self.cfg, self.cate_list
        opt, data, use_pallas = self.opt, self.train_data, self.use_pallas
        mesh = self.mesh

        # sparse touched-row table updates (train/sparse.py): exact SGD
        # semantics at O(touched rows) instead of dense [V, D] passes —
        # the reference's IndexedSlices behavior, TPU-native
        from tlsan_tpu.train import sparse as sparse_mod
        from tlsan_tpu.train.state import lr_schedule
        bf16 = _wants_bf16(self.tc)
        want_sparse = self.tc.sparse_updates
        if want_sparse is None:  # auto: by total vocab rows (measured
            # crossover ~100k rows on v5e — RESULTS.md round-2 study)
            rows = self.cfg.item_count + self.cfg.user_count
            want_sparse = rows >= self.tc.sparse_auto_rows
            # Adam exception (round-4 2M-row A/B, runs/r4/synth2m_adam_*):
            # exact optax semantics force dense per-step moment-decay
            # passes, so sparse-Adam only wins in the small-batch latency
            # regime (+31% at b32) and LOSES at large batch (−23% at b512)
            # single-chip.  Auto keeps dense there; forcing --sparse stays
            # available for multi-host runs, where touched-row updates cut
            # the grad collective 264 MB → 35 MB/step (design.md).
            if self.tc.optimizer == "adam" and self.tc.train_batch_size > 128:
                want_sparse = False
        self._use_sparse = (
            self.tc.optimizer in ("sgd", "adam")
            and want_sparse
            and sparse_mod.sparsifiable(self.params, data))
        # sparse × bf16 composes: the chunk casts the gathered rows + dense
        # leaves to bf16 only inside loss_fn (grads land f32 via the cast's
        # VJP), while the analytic L2-decay/clip-norm recurrence runs on the
        # f32 master rows — the same master-weight discipline as the dense
        # mixed-precision path (tests/test_sparse.py::test_sparse_bf16_*)
        if self._use_sparse:
            self._dropout_rng = jax.random.PRNGKey(self.tc.seed + 1)
            # multi-PROCESS composition (VERDICT r3 #4): each controller
            # holds only its host shard of the dataset, so the chunk takes
            # pre-assembled global dp-sharded batches (_global_batches)
            # instead of (idx, data); scalars/rng ride in replicated.
            assembled = self.n_proc > 1
            mesh_kw = dict(mesh=mesh, vocab_sharded=self.tc.mp > 1,
                           assembled=assembled)

            def repl(x):
                from jax.sharding import PartitionSpec as P
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P()), np.asarray(x))

            def sparse_ctx():
                # model lookups act on gathered row blocks (plain takes), so
                # the vocab-sharded lookup context stays OFF even at mp>1
                # (the chunk's own gather/scatter do the mp exchange); the
                # batch mesh stays visible for dp-shard_mapped Pallas kernels
                return (embedding.mesh_context(mesh, False)
                        if mesh is not None else nullcontext())

            if self.tc.optimizer == "adam":
                chunk = sparse_mod.make_sparse_adam_chunk(
                    model, cfg, self.tc, cate_list, data, self.params,
                    use_pallas, lr_schedule(self.tc), **mesh_kw)

                def run_sparse(params, opt_state, idx):
                    st = sparse_mod.find_adam_state(opt_state)
                    with sparse_ctx():
                        if assembled:
                            params, mu, nu, self._dropout_rng, loss = chunk(
                                params, st.mu, st.nu,
                                repl(np.int32(self.step)),
                                self._global_batches(np.asarray(idx)),
                                repl(self._dropout_rng))
                        else:
                            params, mu, nu, self._dropout_rng, loss = chunk(
                                params, st.mu, st.nu,
                                jnp.asarray(self.step, jnp.int32), idx,
                                self._dropout_rng, data)
                    opt_state = sparse_mod.replace_adam_state(
                        opt_state, mu, nu, self.step + len(idx))
                    return params, opt_state, loss

                return run_sparse

            chunk = sparse_mod.make_sparse_chunk(
                model, cfg, self.tc, cate_list, data, self.params,
                use_pallas, lr_schedule(self.tc), **mesh_kw)

            def run_sparse(params, opt_state, idx):
                with sparse_ctx():
                    if assembled:
                        params, self._dropout_rng, loss = chunk(
                            params, repl(np.int32(self.step)),
                            self._global_batches(np.asarray(idx)),
                            repl(self._dropout_rng))
                    else:
                        params, self._dropout_rng, loss = chunk(
                            params, jnp.asarray(self.step, jnp.int32), idx,
                            self._dropout_rng, data)
                return params, opt_state, loss

            return run_sparse

        if self.n_proc > 1:
            return self._build_train_chunk_multihost()

        def constrain_k(batches, lead_dims=2):
            """Shard batch arrays over dp on the batch dim (dataset stays
            replicated): [K, B, ...] chunks (lead_dims=2) or single [B, ...]
            batches (lead_dims=1)."""
            if mesh is None:
                return batches
            from jax.sharding import PartitionSpec as P

            from tlsan_tpu.parallel.mesh import DP_AXIS
            out = {}
            for k, v in batches.items():
                lead = [None] * (lead_dims - 1) + [DP_AXIS]
                spec = P(*lead, *([None] * (v.ndim - lead_dims)))
                out[k] = jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, spec))
            return out

        def loss_fn(params, batch):
            if bf16:  # mixed precision: bf16 network compute, f32 loss head
                params, batch = _bf16_cast(params), _bf16_cast(batch)
            return model.loss(params, batch, cate_list, cfg, use_pallas)

        use_dropout = cfg.dropout > 0.0
        base_rng = jax.random.PRNGKey(self.tc.seed + 1)

        # NOTE: the dataset is an ARGUMENT, not a closure — closed-over
        # device arrays get baked into the executable as constants, and a
        # second big-constant executable (summaries/eval) then thrashes
        # the device program cache with multi-second re-uploads through
        # the tunnel (measured: a 5 ms summary program took 4.5 s to load)
        # Hoisting the batch assembly out of the scan (one [K, B, ...]
        # gather per array; the scan slices contiguous xs) removes ~9
        # per-step gathers from the sequential critical path — measured
        # +5% at b32 (289.5k ex/s, latency-bound regime).  At b512 the
        # materialized chunk costs extra HBM round-trips and measured −9%,
        # so large batches keep the in-scan gathers (runs/r3/bench_hoist_*).
        hoist = self.tc.train_batch_size <= 128

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_chunk(params, opt_state, idx, rng, data):  # idx: [K, B]
            xs = (constrain_k({k: v[idx] for k, v in data.items()})
                  if hoist else idx)

            def step(carry, x):
                params, opt_state, rng = carry
                batch = (dict(x) if hoist
                         else constrain_k({k: v[x] for k, v in data.items()},
                                          lead_dims=1))
                if use_dropout:
                    rng, sub = jax.random.split(rng)
                    batch = dict(batch, dropout_rng=sub)
                loss, grads = jax.value_and_grad(loss_fn)(params, batch)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), xs)
            return params, opt_state, rng, jnp.mean(losses)

        self._dropout_rng = base_rng

        def run(params, opt_state, idx):
            # trace-time mesh context: mp-sharded lookups + dp-shard_mapped
            # pallas kernels
            ctx = (embedding.mesh_context(mesh, self.tc.mp > 1)
                   if mesh is not None else nullcontext())
            with ctx:
                params, opt_state, self._dropout_rng, loss = train_chunk(
                    params, opt_state, idx, self._dropout_rng, data)
            return params, opt_state, loss

        return run

    def _build_train_chunk_multihost(self):
        """Multi-process train chunk: the dataset is host-resident and each
        host feeds ONLY its local dp shard of every batch
        (parallel/multihost.local_batch_slice); the per-host slices are
        assembled into global dp-sharded arrays and the jitted scan runs
        over them on the global mesh."""
        model, cfg, cate_list = self.model, self.cfg, self.cate_list
        opt, use_pallas = self.opt, self.use_pallas
        use_dropout = cfg.dropout > 0.0
        bf16 = _wants_bf16(self.tc)
        self._dropout_rng = jax.random.PRNGKey(self.tc.seed + 1)

        def loss_fn(params, batch):
            if bf16:  # mixed precision: bf16 network compute, f32 loss head
                params, batch = _bf16_cast(params), _bf16_cast(batch)
            return model.loss(params, batch, cate_list, cfg, use_pallas)

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_chunk(params, opt_state, batches, rng):
            def step(carry, batch):
                params, opt_state, rng = carry
                if use_dropout:
                    rng, sub = jax.random.split(rng)
                    batch = dict(batch, dropout_rng=sub)
                loss, grads = jax.value_and_grad(loss_fn)(params, batch)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, rng), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), batches)
            return params, opt_state, rng, jnp.mean(losses)

        def run(params, opt_state, idx):
            from jax.sharding import PartitionSpec as P
            batches = self._global_batches(np.asarray(idx))
            # the rng must be a GLOBAL (replicated) array in multi-process
            # jit; it is identical on every rank by construction
            rng = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P()), np.asarray(self._dropout_rng))
            ctx = embedding.mesh_context(self.mesh, self.tc.mp > 1)
            with ctx:
                params, opt_state, self._dropout_rng, loss = train_chunk(
                    params, opt_state, batches, rng)
            return params, opt_state, loss

        return run

    def _global_batches(self, idx: np.ndarray) -> Dict:
        """[K, B] global batch-index matrix → dict of [K, B, ...] global
        dp-sharded device arrays, this host contributing only its
        local_batch_slice rows."""
        from jax.sharding import PartitionSpec as P
        from tlsan_tpu.parallel.mesh import DP_AXIS
        from tlsan_tpu.parallel.multihost import local_batch_slice
        sl = local_batch_slice(idx.shape[1])
        local_idx = idx[:, sl]
        out = {}
        for k, v in self.train_data.items():
            local = v[local_idx]  # [K, B_local, ...]
            spec = P(None, DP_AXIS, *([None] * (local.ndim - 2)))
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, spec), local)
        return out

    def _save(self, best: bool = False):
        params, opt_state = self._ckpt_params(), self._ckpt_opt_state()
        if self.n_proc > 1:
            # materialize full (host-local) values on every rank — the
            # conversion is a collective, so all ranks run it; only host 0
            # then writes
            from jax.experimental import multihost_utils
            from jax.sharding import PartitionSpec as P
            params, opt_state = jax.tree_util.tree_map(
                lambda x: multihost_utils.global_array_to_host_local_array(
                    x, self.mesh, P()),
                (params, opt_state))
        if self.is_host0:
            ckpt.save(self.tc.model_dir, self.model.name, self.step,
                      params, opt_state, self._cfg_true, self.tc, best=best)

    def _build_summary_fn(self):
        """Device-side histogram digests of the reference's train-summary
        set (TLSAN/model.py:173-183): the vocab tables, gamma, the attention
        output of the current batch, and the L2_norm_user_item scalar.  Only
        ~6 small (min/max/sum/sumsq/bucket-counts) digests cross the wire,
        not the tables."""
        from tlsan_tpu.train import tensorboard as tb
        model, cfg, cate_list, use_pallas = (
            self.model, self.cfg, self.cate_list, self.use_pallas)
        limits = jnp.asarray(tb.tf_bucket_limits(), jnp.float32)

        def digest(x):
            # sort + cumulative searchsorted: a large scatter-bincount runs
            # ~1.4 s on-chip for a 2.4M-element table; sorting is ms-level
            x = x.astype(jnp.float32).reshape(-1)
            s = jnp.sort(x)
            cum = jnp.searchsorted(s, limits, side="right")
            counts = jnp.concatenate(
                [cum[:1], cum[1:] - cum[:-1]]).astype(jnp.float32)
            return (s[0], s[-1], jnp.float32(x.size),
                    jnp.sum(x), jnp.sum(x * x), counts)

        # reference tag names for TLSAN; generic embedding/<name> otherwise
        tlsan_tags = {"item_emb": "embedding/1_item_emb",
                      "user_emb": "embedding/2_user_emb",
                      "cate_emb": "embedding/3_cate_emb",
                      "usert_emb": "embedding/4_usert_emb"}
        tables = [n for n in ("item_emb", "user_emb", "cate_emb", "usert_emb",
                              "item_b", "short_w", "long_w", "position_w")
                  if n in self.params]
        l2_names = [n for n in getattr(model, "l2_full_tables", ())
                    if n in self.params]

        # static tag order; every digest is ONE row of a single packed
        # array (min, max, num, sum, sumsq, counts...) so the host pulls
        # ONE array + one scalar per summary instead of ~8 separate D2H
        # round trips (each is an RPC through the tunnel)
        tags = []
        for n in tables:
            tags.append(tlsan_tags.get(n, f"embedding/{n}")
                        if model.name == "tlsan" else f"embedding/{n}")
        if "gamma" in self.params:
            tags.append("gamma")
        tags.append("attention_output")
        self._summary_tags = tags

        def summaries_core(params, batch):
            rows = [jnp.concatenate([jnp.stack(d[:5]), d[5]])
                    for d in (digest(params[n]) for n in tables)]
            if "gamma" in params:
                d = digest(params["gamma"])
                rows.append(jnp.concatenate([jnp.stack(d[:5]), d[5]]))
            u_t = model.user_repr(params, batch, cate_list, cfg, use_pallas)
            d = digest(u_t)
            rows.append(jnp.concatenate([jnp.stack(d[:5]), d[5]]))
            l2 = sum((0.5 * jnp.sum(jnp.square(params[n])) for n in l2_names),
                     jnp.float32(0.0))
            return jnp.stack(rows), l2

        @jax.jit
        def summaries_from_idx(params, ib, data):
            # batch gather fused into the SAME dispatch; data passed as an
            # argument (see the train_chunk note — closure constants thrash
            # the device program cache)
            return summaries_core(params, {k: v[ib] for k, v in data.items()})

        return jax.jit(summaries_core), summaries_from_idx

    def _summary_dispatch(self, chunk_idx):
        """Dispatch the device-side histogram digests for the last batch of
        a chunk; returns (histos, l2) DEVICE trees — no host sync (the
        train loop buffers and materializes them at flush points)."""
        ctx = (embedding.mesh_context(self.mesh, self.tc.mp > 1)
               if self.mesh is not None else nullcontext())
        if self.n_proc > 1:
            gb = self._global_batches(np.asarray(chunk_idx[-1:]))
            batch = {k: v[0] for k, v in gb.items()}
            with ctx:
                return self._summary_fn(self.params, batch)
        with ctx:
            return self._summary_from_idx(
                self.params, jnp.asarray(chunk_idx[-1]), self.train_data)

    def _epoch_index(self, epoch: int) -> np.ndarray:
        """Shuffled [n_chunks, K, B] batch-index tensor (data/batcher.py
        epoch_index — shared with the replica fan-out)."""
        return epoch_index(self.n_train, self.tc.train_batch_size,
                           self.tc.steps_per_call, epoch, self.tc.seed)

    # ------------------------------------------------------------------

    def evaluate(self) -> Dict[str, float]:
        metrics = {"auc": self.evaluator.auc(self.params)}
        metrics.update(self.evaluator.topk(self.params))
        return metrics

    def _ckpt_params(self):
        """Params to persist: canonically UNPADDED (true vocab rows), so a
        checkpoint written under any (dp, mp) restores under any other."""
        if self.tc.mp > 1:
            from tlsan_tpu.parallel.api import unpad_vocab_rows
            return unpad_vocab_rows(self.params, self._counts_true)
        return self.params

    def _ckpt_opt_state(self):
        """Optimizer state to persist: unpadded like params; the sparse-SGD
        path keeps no live optax state, so rebuild one with schedule
        counters = step (restores seamlessly into the dense path and vice
        versa).  Sparse-ADAM keeps live moments in self.opt_state
        (replace_adam_state), so it falls through to the normal branches."""
        if getattr(self, "_use_sparse", False) and self.tc.optimizer == "sgd":
            from tlsan_tpu.train import sparse as sparse_mod
            return sparse_mod.opt_state_with_count(
                self.opt, self._ckpt_params(), self.step)
        if self.tc.mp > 1:
            from tlsan_tpu.parallel.api import unpad_vocab_rows
            return unpad_vocab_rows(self.opt_state, self._counts_true)
        return self.opt_state

    def profile_trace(self, n_chunks: int = 3, out_dir: Optional[str] = None):
        """Capture a jax.profiler device trace over a few train chunks
        (replaces the reference's wall-clock-only timing,
        TLSAN/train.py:162,235-237)."""
        out_dir = out_dir or f"{self.tc.model_dir}/profile"
        idx = self._epoch_index(0)[:n_chunks]
        # run on CLONES: _train_chunk donates its inputs and the optimizer
        # schedule counts steps, so profiling must not perturb the real run
        params = jax.tree_util.tree_map(jnp.copy, self.params)
        opt_state = jax.tree_util.tree_map(jnp.copy, self.opt_state)
        rng_before = self._dropout_rng
        with jax.profiler.trace(out_dir):
            for chunk in idx:
                params, opt_state, _ = self._train_chunk(
                    params, opt_state, jnp.asarray(chunk))
            jax.block_until_ready(params)
        self._dropout_rng = rng_before
        return out_dir

    def train(self) -> Dict[str, float]:
        tc = self.tc
        best = {"auc": 0.0, "step": 0}
        init_metrics = self.evaluate()
        self.writer.write("eval", self.step, init_metrics)

        examples_seen = 0
        t_start = time.time()
        steps_since_eval = 0
        steps_since_display = 0
        steps_since_summary = 0
        # display records are DEFERRED: materializing a loss scalar
        # (float()) blocks on the device and serializes chunk dispatches —
        # measured 2.8× wall-clock at Electronics scale through the RPC
        # tunnel.  Loss/digest device arrays are buffered and converted at
        # eval/epoch boundaries, so dispatches pipeline back-to-back.
        pending = []  # (step, loss_arr, (histos, l2) device trees or None)

        def flush_display():
            for s, l, h in pending:
                self.writer.write("train", s, {"loss": float(l)})
                if h is not None:
                    packed, l2 = np.asarray(h[0]), float(h[1])
                    histos = {
                        tag: (row[0], row[1], row[2], row[3], row[4], row[5:])
                        for tag, row in zip(self._summary_tags, packed)}
                    scalars = {"Training Loss": float(l)}
                    if l2 > 0.0:
                        scalars["L2_norm_user_item"] = l2
                    self.writer.write_histograms(s, histos, scalars)
            pending.clear()

        for epoch in range(tc.max_epochs):
            t_epoch = time.time()
            examples_at_epoch_start = examples_seen
            for chunk_idx in self._epoch_index(epoch):
                self.params, self.opt_state, loss = self._train_chunk(
                    self.params, self.opt_state, jnp.asarray(chunk_idx))
                self.step += chunk_idx.shape[0]
                steps_since_eval += chunk_idx.shape[0]
                steps_since_display += chunk_idx.shape[0]
                steps_since_summary += chunk_idx.shape[0]
                examples_seen += chunk_idx.size
                # loss granularity is one fused chunk (its mean); display at
                # display_freq boundaries like the reference's loss prints;
                # histogram digests at the (cheaper) summary_freq cadence
                if steps_since_display >= tc.display_freq:
                    steps_since_display = 0
                    h = None
                    if (self._summary_fn is not None
                            and steps_since_summary >= tc.summary_freq):
                        steps_since_summary = 0
                        h = self._summary_dispatch(chunk_idx)
                    pending.append((self.step, loss, h))

                if steps_since_eval >= tc.eval_freq:
                    steps_since_eval = 0
                    flush_display()
                    metrics = self.evaluate()
                    self.writer.write("eval", self.step, metrics)
                    # best tracking + gated save (reference: TLSAN/train.py:222-230)
                    if self.step > tc.best_after_step and metrics["auc"] > best["auc"]:
                        best = {**metrics, "step": self.step}
                        if metrics["auc"] > tc.save_auc_gate:
                            self._save(best=True)
            flush_display()
            dt = time.time() - t_epoch
            epoch_examples = examples_seen - examples_at_epoch_start
            self.writer.write("epoch", self.step, {
                "epoch": epoch, "epoch_s": dt,
                # steady-state rate for THIS epoch (excludes eval/compile of
                # earlier epochs) + cumulative including first-epoch compile
                "examples_per_s": epoch_examples / max(dt, 1e-9),
                "cum_examples_per_s":
                    examples_seen / max(time.time() - t_start, 1e-9),
            })

        final = self.evaluate()
        self.writer.write("final", self.step, final)
        if final["auc"] > best["auc"]:
            best = {**final, "step": self.step}
        self._save()
        return best
