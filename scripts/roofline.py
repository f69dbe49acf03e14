"""Whole-step roofline for the TLSAN train step (VERDICT r2 #4).

Answers "how far from the chip's ceiling is the measured examples/s?" by
decomposing the fused train step into stages, timing each on the real chip
(amortized over a K-step fused scan exactly like the trainer), and comparing
the measured whole-step time against the step's minimal algorithmic HBM
traffic at the chip's published bandwidth.

Stages (differences of nested jitted programs):
  gathers    — batch index + embedding-row gathers only
  fwd rest   — attention towers + logits + loss (fwd − gathers)
  backward   — grad computation (fwd+bwd − fwd)
  optimizer  — clip + SGD + dense table-grad materialization (full − fwd+bwd)
  digest     — one histogram-summary digest (amortized per summary_freq)

Bytes model (dense path): the [V, D] table grads are materialized by the
gather's scatter-add VJP, read by the global-norm clip, and read+written by
the SGD update (≈5 dense table passes/step); the sparse path replaces those
with O(touched rows).  Activations at these shapes live in VMEM between
fused ops and are not HBM traffic.

v5e public specs used: HBM ≈ 819 GB/s, bf16 MXU ≈ 197 TFLOP/s.

Usage:
  python scripts/roofline.py [--dataset Digital_Music] [--batch 32]
      [--steps_per_call 200] [--sparse]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBS = 819.0       # v5e HBM bandwidth, GB/s
PEAK_BF16_TFLOPS = 197.0


def time_at(fn, reps=3):
    """Best-of-reps wall time of fn() (fn must block internally)."""
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Digital_Music")
    p.add_argument("--data_dir", default="/root/reference/Data")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps_per_call", type=int, default=200)
    p.add_argument("--sparse", action="store_true",
                   help="also time the sparse touched-row chunk")
    p.add_argument("--platform", default=None, choices=["cpu", "default"])
    p.add_argument("--compute_dtype", choices=["f32", "bf16"], default="f32",
                   help="A/B: bf16 mixed-precision network compute")
    args = p.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("TLSAN_COMPILE_CACHE",
                                     os.path.expanduser("~/.cache/tlsan_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models import base
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.nn.embedding import lookup
    from tlsan_tpu.train.state import lr_schedule, make_optimizer

    from bench import load_packed  # repo-root bench.py cache
    arrays, cate_list_np = load_packed(args.dataset, args.data_dir)
    n = len(arrays["u"])
    counts = dict(user_count=int(arrays["u"].max()) + 1,
                  item_count=len(cate_list_np),
                  cate_count=int(cate_list_np.max()) + 1)
    cfg = ModelConfig(model="tlsan", Ls=arrays["hist_i"].shape[1],
                      Ts=arrays["hist_i_new"].shape[1], **counts)
    tc = TrainConfig(steps_per_call=args.steps_per_call,
                     train_batch_size=args.batch)
    K, B = args.steps_per_call, args.batch
    print(f"# roofline: {args.dataset} b{B} K={K} "
          f"backend={jax.default_backend()} {counts}", flush=True)

    data = {k: jnp.asarray(v) for k, v in arrays.items()}
    cate_list = jnp.asarray(cate_list_np)
    opt = make_optimizer(tc)
    params0 = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, n, (K, B)), jnp.int32)

    if args.compute_dtype == "bf16":
        from tlsan_tpu.train.loop import _bf16_cast

        def loss_fn(p, b):
            return TLSAN.loss(_bf16_cast(p), _bf16_cast(b), cate_list, cfg,
                              False)
    else:
        def loss_fn(p, b):
            return TLSAN.loss(p, b, cate_list, cfg, False)

    # ---- stage programs, each a K-step fused scan like the trainer ----
    @jax.jit
    def chunk_gather(params, idx, data):
        def step(acc, ib):
            b = {k: v[ib] for k, v in data.items()}
            s = (jnp.sum(lookup(params["item_emb"], b["hist_i"]))
                 + jnp.sum(lookup(params["item_emb"], b["hist_i_new"]))
                 + jnp.sum(lookup(params["item_emb"], b["i"]))
                 + jnp.sum(lookup(params["user_emb"], b["u"]))
                 + jnp.sum(lookup(params["usert_emb"], b["u"]))
                 + jnp.sum(lookup(params["cate_emb"],
                                  cate_list[b["hist_i"]])))
            return acc + s, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return acc

    @jax.jit
    def chunk_fwd(params, idx, data):
        def step(acc, ib):
            b = {k: v[ib] for k, v in data.items()}
            return acc + loss_fn(params, b), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return acc

    @jax.jit
    def chunk_fwd_bwd(params, idx, data):
        def step(carry, ib):
            b = {k: v[ib] for k, v in data.items()}
            loss, g = jax.value_and_grad(loss_fn)(params, b)
            gs = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g))
            return (carry[0] + loss, carry[1] + gs), None
        acc, _ = jax.lax.scan(step, (jnp.float32(0), jnp.float32(0)), idx)
        return acc

    # production rule (train/loop.py): batch assembly hoisted out of the
    # scan at B<=128 (latency-bound), in-scan at large B (bandwidth-bound)
    hoist = B <= 128

    @partial(jax.jit, donate_argnums=(0, 1))
    def chunk_full(params, opt_state, idx, data):
        xs = {k: v[idx] for k, v in data.items()} if hoist else idx

        def step(carry, x):
            params, opt_state = carry
            b = x if hoist else {k: v[x] for k, v in data.items()}
            loss, grads = jax.value_and_grad(loss_fn)(params, b)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), xs)
        return params, opt_state, losses[-1]

    # Per-step times from the SLOPE over two chunk lengths: t(K) = a + b·K.
    # The intercept a (tunnel dispatch RPC ≈ 25 ms/chunk here, param-copy
    # setup, host sync) cancels out of b, so stage times are true on-device
    # per-step costs — the single-K version inflated every absolute stage
    # by ~a/K (VERDICT r2 #4 follow-up).
    K1, K2 = K, 3 * K
    idx1 = idx
    idx2 = jnp.asarray(rng.integers(0, n, (K2, B)), jnp.int32)

    def slope(run):
        t1 = time_at(lambda: run(idx1))
        t2 = time_at(lambda: run(idx2))
        b = (t2 - t1) / (K2 - K1)
        return b, t1 - b * K1

    t_gather, fix_g = slope(lambda i: jax.block_until_ready(
        chunk_gather(params0, i, data)))
    t_fwd, _ = slope(lambda i: jax.block_until_ready(
        chunk_fwd(params0, i, data)))
    t_fwdbwd, _ = slope(lambda i: jax.block_until_ready(
        chunk_fwd_bwd(params0, i, data)))

    def run_full(i):
        params = jax.tree_util.tree_map(jnp.copy, params0)
        opt_state = opt.init(params)
        params, opt_state, _ = chunk_full(params, opt_state, i, data)
        jax.block_until_ready(params)

    t_full, fix_full = slope(run_full)

    t_sparse = None
    if args.sparse:
        from tlsan_tpu.train import sparse as sparse_mod
        chunk_sp = sparse_mod.make_sparse_chunk(
            TLSAN, cfg, tc, cate_list, data, params0, False, lr_schedule(tc))

        def run_sparse(i):
            params = jax.tree_util.tree_map(jnp.copy, params0)
            out = chunk_sp(params, jnp.int32(0), i, jax.random.PRNGKey(0),
                           data)
            jax.block_until_ready(out[0])

        t_sparse, _ = slope(run_sparse)
    print(f"# fixed per-chunk overhead (dispatch RPC + setup): "
          f"{fix_full*1e3:.1f} ms full / {fix_g*1e3:.1f} ms gather-only",
          flush=True)

    # ---- analytic bytes per step ----
    D = cfg.itemid_embedding_size
    table_bytes = 4 * (cfg.item_count * (D + 1)          # item_emb + item_b
                       + cfg.user_count * D * 2          # user_emb + usert_emb
                       + cfg.cate_count * D)
    dense_w_bytes = sum(
        x.size * 4 for pth, x in jax.tree_util.tree_leaves_with_path(params0)
        if not any(t in jax.tree_util.keystr(pth) for t in
                   ("item_emb", "item_b", "user_emb", "usert_emb",
                    "cate_emb")))
    touched_slots = B * (arrays["hist_i"].shape[1]
                         + arrays["hist_i_new"].shape[1] + 1) + B
    touched_bytes = touched_slots * (D + 1) * 4 + B * D * 2 * 4
    batch_bytes = sum(4 * B * int(np.prod(v.shape[1:] or (1,)))
                      for v in arrays.values())
    act_bytes = 4 * B * (arrays["hist_i"].shape[1]
                         + arrays["hist_i_new"].shape[1]) * (2 * D) * 6

    # dense step HBM floor: gathers read touched rows; the table-grad
    # scatter materializes [V,D] (write), clip reads it, update reads
    # grad+param and writes param -> 5 dense table passes + dense weights
    dense_step_bytes = (5 * table_bytes + 4 * dense_w_bytes
                        + touched_bytes + batch_bytes)
    # sparse/minimal floor: touched rows read+write (+grad), dense weights
    minimal_step_bytes = (3 * touched_bytes + 4 * dense_w_bytes
                          + batch_bytes + act_bytes)

    def row(name, t_step, bytes_per_step=None):
        out = f"| {name} | {t_step*1e6:8.1f} |"
        if bytes_per_step is not None:
            sol = bytes_per_step / t_step / (HBM_GBS * 1e9) * 100
            out += f" {bytes_per_step/1e6:7.3f} | {sol:5.1f}% |"
        else:
            out += " — | — |"
        return out

    eps = B / t_full
    print(f"\n## whole-step roofline — {args.dataset} b{B} "
          f"({eps:,.0f} ex/s full step)\n")
    print("| stage | µs/step | MB/step (algorithmic) | % HBM SoL |")
    print("|---|---|---|---|")
    print(row("embedding gathers", t_gather, touched_bytes + batch_bytes))
    print(row("attention + logits fwd (Δ)", t_fwd - t_gather))
    print(row("backward (Δ)", t_fwdbwd - t_fwd))
    print(row("optimizer + dense table grads (Δ)", t_full - t_fwdbwd,
              5 * table_bytes + 4 * dense_w_bytes))
    print(row("FULL dense step", t_full, dense_step_bytes))
    if t_sparse is not None:
        print(row("FULL sparse step", t_sparse, minimal_step_bytes))
    sol_s = minimal_step_bytes / (HBM_GBS * 1e9)
    print(f"\nminimal algorithmic bytes/step (sparse floor): "
          f"{minimal_step_bytes/1e6:.3f} MB -> speed-of-light "
          f"{sol_s*1e6:.2f} µs/step ({B/sol_s:,.0f} ex/s SoL)")
    print(json.dumps({
        "metric": f"roofline_{args.dataset}_b{B}",
        "full_us_per_step": round(t_full * 1e6, 2),
        "gather_us": round(t_gather * 1e6, 2),
        "fwd_delta_us": round((t_fwd - t_gather) * 1e6, 2),
        "bwd_delta_us": round((t_fwdbwd - t_fwd) * 1e6, 2),
        "opt_delta_us": round((t_full - t_fwdbwd) * 1e6, 2),
        "sparse_us_per_step": (round(t_sparse * 1e6, 2)
                               if t_sparse else None),
        "dense_bytes_mb": round(dense_step_bytes / 1e6, 3),
        "minimal_bytes_mb": round(minimal_step_bytes / 1e6, 3),
        "full_pct_hbm_sol": round(
            dense_step_bytes / t_full / (HBM_GBS * 1e9) * 100, 1),
        "examples_per_s": round(eps, 0),
    }), flush=True)


if __name__ == "__main__":
    main()
