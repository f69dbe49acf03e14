"""Benchmark: TLSAN training throughput (examples/s) on the default backend.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "examples/s", "vs_baseline": N}

`vs_baseline` compares against a reference-architecture emulation measured on
the same machine's host CPU: one optimizer step per dispatch with per-step
host→device batch feeds — the TF1.8 feed_dict execution model of
TLSAN/model.py:229 (sess.run per batch) — since the reference publishes no
throughput numbers (BASELINE.md).  The TPU path runs the same model/optimizer
with the framework's fused multi-step scan and device-resident data.

Usage: python bench.py [--dataset Digital_Music] [--batch 32] [--steps 2000]
"""

import argparse
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_packed(dataset: str, data_dir: str):
    """Build + pack the TLSAN train set, cached as npz next to the repo."""
    import numpy as np

    cache = f".bench_cache_{dataset}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return {k: z[k] for k in z.files if k != "cate_list"}, z["cate_list"]

    from tlsan_tpu.core.config import ModelConfig
    from tlsan_tpu.train.cli import prepare

    cfg = ModelConfig(model="tlsan")
    train_b, _, cate_list, cfg = prepare(
        "tlsan", os.path.join(data_dir, f"{dataset}.pkl"), cfg)
    np.savez(cache, cate_list=cate_list, **train_b.arrays)
    return train_b.arrays, cate_list


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Digital_Music")
    p.add_argument("--data_dir", default="/root/reference/Data")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--steps_per_call", type=int, default=200)
    p.add_argument("--baseline_steps", type=int, default=200)
    p.add_argument("--pallas", action="store_true",
                   help="A/B: run the fused path with the Pallas kernels "
                        "(measured slower than XLA at these shapes)")
    p.add_argument("--unroll", type=int, default=1,
                   help="lax.scan unroll factor for the train chunk")
    p.add_argument("--compute_dtype", choices=["f32", "bf16"], default="f32",
                   help="A/B: bf16 mixed-precision network compute "
                        "(f32 master params/opt state — train/loop.py)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train.state import make_optimizer

    arrays, cate_list_np = load_packed(args.dataset, args.data_dir)
    n = len(arrays["u"])
    counts = dict(
        user_count=int(arrays["u"].max()) + 1,
        item_count=len(cate_list_np),
        cate_count=int(cate_list_np.max()) + 1,
    )
    cfg = ModelConfig(model="tlsan", Ls=arrays["hist_i"].shape[1],
                      Ts=arrays["hist_i_new"].shape[1], **counts)
    tc = TrainConfig(steps_per_call=args.steps_per_call,
                     train_batch_size=args.batch)
    log(f"dataset={args.dataset} n={n} {counts} backend={jax.default_backend()}")

    use_pallas = jax.default_backend() == "tpu" and args.pallas
    rng = np.random.default_rng(0)

    # ---------------- fused TPU path: device-resident data + scan ----------
    data = {k: jnp.asarray(v) for k, v in arrays.items()}
    cate_list = jnp.asarray(cate_list_np)
    opt = make_optimizer(tc)
    params = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)

    if args.compute_dtype == "bf16":
        from tlsan_tpu.train.loop import _bf16_cast

        def loss_fn(p, b):
            return TLSAN.loss(_bf16_cast(p), _bf16_cast(b), cate_list, cfg,
                              use_pallas)
    else:
        def loss_fn(p, b):
            return TLSAN.loss(p, b, cate_list, cfg, use_pallas)

    from functools import partial

    # batch assembly hoisted out of the scan at small batches (latency-bound:
    # measured +5% at b32); large batches keep in-scan gathers (the
    # materialized [K, B, ...] chunk cost −9% at b512) — mirrors train/loop.py
    hoist = args.batch <= 128

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_chunk(params, opt_state, idx):
        xs = {k: v[idx] for k, v in data.items()} if hoist else idx

        def step(carry, x):
            params, opt_state = carry
            batch = x if hoist else {k: v[x] for k, v in data.items()}
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), xs, unroll=args.unroll)
        return params, opt_state, losses[-1]

    K, B = args.steps_per_call, args.batch
    idx = jnp.asarray(rng.integers(0, n, (K, B)), jnp.int32)
    # warmup/compile
    params, opt_state, _ = train_chunk(params, opt_state, idx)
    jax.block_until_ready(params)
    # best-of-3 repeats: the tunnel adds run-to-run jitter
    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        done = 0
        while done < args.steps:
            params, opt_state, l = train_chunk(params, opt_state, idx)
            done += K
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0
        rates.append(done * B / dt)
        log(f"fused rep{rep}: {done} steps in {dt:.3f}s -> "
            f"{rates[-1]:,.0f} examples/s (loss {float(l):.4f})")
    fused_eps = max(rates)

    # ------------- baseline: reference-architecture emulation on CPU -------
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_c = TLSAN.init_params(jax.random.PRNGKey(0), cfg)
        opt_state_c = opt.init(params_c)
        cate_list_c = jnp.asarray(cate_list_np)

        def loss_fn_c(p, b):
            return TLSAN.loss(p, b, cate_list_c, cfg, use_pallas=False)

        @jax.jit
        def one_step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn_c)(params, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        host = {k: np.asarray(v) for k, v in arrays.items()}

        def feed(step_i):
            sl = slice((step_i * B) % (n - B), (step_i * B) % (n - B) + B)
            # per-step host batch materialization + transfer ≙ feed_dict
            return {k: jnp.asarray(v[sl]) for k, v in host.items()}

        params_c, opt_state_c, _ = one_step(params_c, opt_state_c, feed(0))
        jax.block_until_ready(params_c)
        t0 = time.perf_counter()
        for s in range(args.baseline_steps):
            params_c, opt_state_c, _ = one_step(params_c, opt_state_c, feed(s))
        jax.block_until_ready(params_c)
        dt = time.perf_counter() - t0
    base_eps = args.baseline_steps * B / dt
    log(f"baseline (per-step CPU): {args.baseline_steps} steps in {dt:.3f}s "
        f"-> {base_eps:,.0f} examples/s")

    # measured anchor: the reference's OWN TF program (tf.compat.v1,
    # scripts/ref_tf_run.py) sustains ≈5.0k examples/s in this environment
    # (TLSAN/Home-Kitchen, median epoch 30.5 s — RESULTS.md round 2)
    REF_MEASURED_EPS = 4994.0
    print(json.dumps({
        "metric": (f"tlsan_train_examples_per_sec_{args.dataset}_b{B}"
                   + ("_bf16" if args.compute_dtype == "bf16" else "")),
        "value": round(fused_eps, 1),
        "unit": "examples/s",
        "vs_baseline": round(fused_eps / base_eps, 2),
        "vs_reference_measured": round(fused_eps / REF_MEASURED_EPS, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
