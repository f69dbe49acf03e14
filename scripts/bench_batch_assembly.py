"""Batch-assembly micro-benchmark: random row-gather vs contiguous slice.

The b512 roofline (runs/r3/roofline_r3b_b512_bf16.txt) attributes ~100 us/step
to the "embedding gathers" stage, 30x above its bandwidth floor.  That stage
contains two distinct gather kinds:

  (a) batch assembly: v[ib] for ~9 packed dataset arrays with random row
      indices (the per-epoch shuffle), done in-scan at B>128
      (train/loop.py:283-294);
  (b) the model's embedding-table lookups (inherently random).

If (a) dominates, a once-per-epoch device-side permutation of the dataset
(one large gather, amortized over n/B steps) followed by contiguous
lax.dynamic_slice assembly would produce bitwise-identical batches at near
zero per-step cost.  This script measures (a) random-gather assembly,
(c) contiguous dynamic-slice assembly, and (b) embedding lookups alone, at
the trainer's Digital_Music b512 shapes, using the K-slope protocol from
scripts/roofline.py (cancels the ~25 ms tunnel dispatch RPC).

Usage: python scripts/bench_batch_assembly.py [--batch 512] [--K 200]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_at(fn, reps=3):
    fn()
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
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--K", type=int, default=200)
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/tlsan_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tlsan_tpu.core.config import ModelConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.nn.embedding import lookup

    from bench import load_packed
    arrays, cate_list_np = load_packed(args.dataset, args.data_dir)
    n = len(arrays["u"])
    counts = dict(user_count=int(arrays["u"].max()) + 1,
                  item_count=len(cate_list_np),
                  cate_count=int(cate_list_np.max()) + 1)
    cfg = ModelConfig(model="tlsan", Ls=arrays["hist_i"].shape[1],
                      Ts=arrays["hist_i_new"].shape[1], **counts)
    B, K = args.batch, args.K
    data = {k: jnp.asarray(v) for k, v in arrays.items()}
    cate_list = jnp.asarray(cate_list_np)
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    print(f"# batch-assembly bench: {args.dataset} b{B} K={K} n={n} "
          f"backend={jax.default_backend()}", flush=True)

    rng = np.random.default_rng(0)
    K2 = 3 * K
    idx1 = jnp.asarray(rng.integers(0, n, (K, B)), jnp.int32)
    idx2 = jnp.asarray(rng.integers(0, n, (K2, B)), jnp.int32)
    # contiguous starts (step s reads rows [s*B, s*B+B) mod n, like a
    # pre-permuted epoch)
    st1 = jnp.asarray((np.arange(K) * B) % max(n - B, 1), jnp.int32)
    st2 = jnp.asarray((np.arange(K2) * B) % max(n - B, 1), jnp.int32)

    @jax.jit
    def chunk_random(idx, data):
        def step(acc, ib):
            b = {k: v[ib] for k, v in data.items()}
            return acc + sum(jnp.sum(v) for v in b.values()), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return acc

    @jax.jit
    def chunk_contig(starts, data):
        def step(acc, s):
            b = {k: jax.lax.dynamic_slice_in_dim(v, s, B)
                 for k, v in data.items()}
            return acc + sum(jnp.sum(v) for v in b.values()), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), starts)
        return acc

    @jax.jit
    def chunk_embed(idx, data):
        # embedding lookups on a CONTIGUOUS batch (isolates table gathers)
        def step(acc, s):
            b = {k: jax.lax.dynamic_slice_in_dim(v, s, B)
                 for k, v in data.items()}
            s_ = (jnp.sum(lookup(params["item_emb"], b["hist_i"]))
                  + jnp.sum(lookup(params["item_emb"], b["hist_i_new"]))
                  + jnp.sum(lookup(params["item_emb"], b["i"]))
                  + jnp.sum(lookup(params["user_emb"], b["u"]))
                  + jnp.sum(lookup(params["usert_emb"], b["u"]))
                  + jnp.sum(lookup(params["cate_emb"],
                                   cate_list[b["hist_i"]])))
            return acc + s_, None
        acc, _ = jax.lax.scan(step, jnp.float32(0), idx)
        return acc

    @jax.jit
    def permute(data, perm):
        return {k: v[perm] for k, v in data.items()}

    def slope(run, a1, a2):
        t1 = time_at(lambda: jax.block_until_ready(run(a1, data)))
        t2 = time_at(lambda: jax.block_until_ready(run(a2, data)))
        return (t2 - t1) / (K2 - K)

    t_rand = slope(chunk_random, idx1, idx2)
    t_cont = slope(chunk_contig, st1, st2)
    t_emb = slope(chunk_embed, st1, st2)
    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    t_perm = time_at(
        lambda: jax.block_until_ready(permute(data, perm)))
    steps_per_epoch = max(n // B, 1)

    batch_mb = sum(4 * B * int(np.prod(v.shape[1:] or (1,)))
                   for v in arrays.values()) / 1e6
    print(f"batch bytes/step: {batch_mb:.3f} MB")
    print(f"random-gather assembly : {t_rand*1e6:8.1f} us/step")
    print(f"contiguous-slice asm   : {t_cont*1e6:8.1f} us/step")
    print(f"embedding lookups      : {t_emb*1e6:8.1f} us/step")
    print(f"full permutation       : {t_perm*1e3:8.2f} ms/epoch "
          f"(= {t_perm/steps_per_epoch*1e6:.1f} us/step amortized over "
          f"{steps_per_epoch} steps)")
    print(json.dumps({
        "metric": f"batch_assembly_{args.dataset}_b{B}",
        "random_us": round(t_rand * 1e6, 2),
        "contig_us": round(t_cont * 1e6, 2),
        "embed_us": round(t_emb * 1e6, 2),
        "permute_ms_per_epoch": round(t_perm * 1e3, 3),
        "permute_us_per_step": round(t_perm / steps_per_epoch * 1e6, 2),
        "batch_mb_per_step": round(batch_mb, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
