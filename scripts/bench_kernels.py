"""Kernel microbenchmarks: Pallas vs jnp, with speed-of-light comparison.

Measures the two fused attention kernels (ops/pallas/fwa.py, mha.py) against
their jnp oracles at TLSAN/ATRank shapes, forward and forward+backward, and
reports achieved HBM bandwidth as a fraction of speed-of-light.  Both ops are
strongly memory-bound at these shapes (D=64, S≤90: arithmetic intensity
≈ D/num_heads·amortized ≪ MXU roofline), so bytes/s is the right roofline.

Usage: python scripts/bench_kernels.py [--sol_gbps 819]
  (819 GB/s = TPU v5e HBM; pass your chip's number for other generations)
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, x, reps=64, chain=None, ident=None):
    """Per-iteration time with `reps` iterations fused into ONE dispatch,
    CORRECTED for the chaining overhead.

    The axon tunnel adds ~0.6 ms per dispatch — timing individual jitted
    calls measures the RPC, not the kernel.  A lax.scan chains `reps`
    data-dependent iterations inside one jit; `chain(x, out)` must produce
    the next x from the output so XLA cannot elide or overlap iterations.

    The chain itself moves a full x worth of HBM traffic per iteration —
    comparable to the op's own traffic at these shapes — so a second scan
    with `ident` (an out-shaped cheap slice of x) in place of the op
    measures the chain-only floor, which is subtracted.  (Round-1 numbers
    lacked this correction and understated SoL fractions ~2-3×.)
    """
    def make(f):
        @jax.jit
        def many(x):
            def body(c, _):
                return chain(c, f(c)), None
            c, _ = jax.lax.scan(body, x, None, length=reps)
            return c
        return many

    def run(many):
        out = many(x)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(many(x))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    dt = run(make(fn))
    dt_chain = run(make(ident)) if ident is not None else 0.0
    return max(dt - dt_chain, 1e-9), dt


def bench_fwa(B, S, D, H, sol_gbps):
    from tlsan_tpu.ops import feature_attention as FA
    from tlsan_tpu.ops.pallas import fwa as F

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, D)), jnp.float32)
    lengths = jnp.asarray(rng.integers(1, S + 1, B), jnp.int32)
    dh = D // H
    w1 = jnp.asarray(rng.standard_normal((dh, dh)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((dh, dh)) * 0.1, jnp.float32)
    b1 = jnp.zeros((dh,), jnp.float32)
    b2 = jnp.zeros((dh,), jnp.float32)

    pallas_f = jax.jit(lambda x: F.fwa_pallas(x, lengths, H, w1, b1, w2, b2))
    jnp_f = jax.jit(lambda x: FA.feature_wise_attention_reference(
        x, lengths, H, w1, b1, w2, b2))
    pallas_g = jax.jit(jax.grad(lambda x: pallas_f(x).sum()))
    jnp_g = jax.jit(jax.grad(lambda x: jnp_f(x).sum()))

    np.testing.assert_allclose(np.asarray(pallas_f(x)), np.asarray(jnp_f(x)),
                               atol=2e-5, rtol=2e-5)

    # fwd traffic: read x [B,S,D] + write out [B,D] (weights negligible)
    bytes_fwd = 4 * (B * S * D + B * D)
    # fwd chains out [B,D] back into x [B,S,D]; bwd's grad is x-shaped
    chain_f = lambda c, out: c * 0.5 + 1e-3 * out[:, None, :]
    chain_g = lambda c, g: c * 0.5 + 1e-3 * g
    ident_f = lambda c: c[:, 0, :]      # out-shaped, negligible traffic
    ident_g = lambda c: c * 1.0
    rows = []
    for tag, fn, byt, ch, idf in (
            ("fwa.fwd.pallas", pallas_f, bytes_fwd, chain_f, ident_f),
            ("fwa.fwd.jnp", jnp_f, bytes_fwd, chain_f, ident_f),
            ("fwa.bwd.pallas", pallas_g, 3 * bytes_fwd, chain_g, ident_g),
            ("fwa.bwd.jnp", jnp_g, 3 * bytes_fwd, chain_g, ident_g)):
        dt, raw = timeit(fn, x, chain=ch, ident=idf)
        rows.append({"kernel": tag, "B": B, "S": S, "D": D, "us": dt * 1e6,
                     "raw_us": raw * 1e6,
                     "gbps": byt / dt / 1e9,
                     "sol_frac": byt / dt / 1e9 / sol_gbps})
    return rows


def bench_mha(B, T, D, H, sol_gbps):
    from tlsan_tpu.ops import multihead_attention as MO
    from tlsan_tpu.ops.pallas import mha as M

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    ql = jnp.asarray(rng.integers(1, T + 1, B), jnp.int32)
    p = {}
    for nm in ("wq", "wk", "wv"):
        p[nm] = jnp.asarray(rng.standard_normal((D, D)) * 0.1, jnp.float32)
        p["b" + nm[1]] = jnp.zeros((D,), jnp.float32)
    p["ln_gamma"], p["ln_beta"] = jnp.ones((D,)), jnp.zeros((D,))

    pallas_f = jax.jit(lambda q: M.mha_pallas(q, q, ql, ql, H, p))
    jnp_f = jax.jit(lambda q: MO.multihead_attention(q, ql, q, ql, H, p)[0])
    pallas_g = jax.jit(jax.grad(lambda q: pallas_f(q).sum()))
    jnp_g = jax.jit(jax.grad(lambda q: jnp_f(q).sum()))

    np.testing.assert_allclose(np.asarray(pallas_f(q)), np.asarray(jnp_f(q)),
                               atol=3e-5, rtol=3e-5)

    bytes_fwd = 4 * (B * T * D * 2 + 3 * D * D)
    chain = lambda c, out: c * 0.5 + 1e-3 * out  # out/grad are q-shaped
    ident = lambda c: c * 1.0
    rows = []
    for tag, fn, byt in (("mha.fwd.pallas", pallas_f, bytes_fwd),
                         ("mha.fwd.jnp", jnp_f, bytes_fwd),
                         ("mha.bwd.pallas", pallas_g, 3 * bytes_fwd),
                         ("mha.bwd.jnp", jnp_g, 3 * bytes_fwd)):
        dt, raw = timeit(fn, q, chain=chain, ident=ident)
        rows.append({"kernel": tag, "B": B, "T": T, "D": D, "us": dt * 1e6,
                     "raw_us": raw * 1e6,
                     "gbps": byt / dt / 1e9,
                     "sol_frac": byt / dt / 1e9 / sol_gbps})
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sol_gbps", type=float, default=819.0,
                    help="HBM speed-of-light GB/s (819 = v5e)")
    ap.add_argument("--big_batch", type=int, default=8192)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}", flush=True)
    rows = []
    # TLSAN long-term window: train batch and the large-batch mode sweep
    # (VERDICT r1 #4: B in {512, 2048, 8192}, fwd+bwd)
    for b in (32, 512, 2048, args.big_batch):
        rows += bench_fwa(b, 10, 64, 8, args.sol_gbps)
    rows += bench_fwa(args.big_batch, 90, 64, 8, args.sol_gbps)
    # ATRank self-attention over the behavior sequence
    for b in (32, 512, 2048):
        rows += bench_mha(b, 90, 64, 8, args.sol_gbps)
    for r in rows:
        print(json.dumps(r), flush=True)
    hdr = f"{'kernel':18s} {'shape':>16s} {'us':>9s} {'GB/s':>8s} {'SoL':>6s}"
    print("\n" + hdr)
    for r in rows:
        shape = f"B{r['B']}xS{r.get('S', r.get('T'))}xD{r['D']}"
        print(f"{r['kernel']:18s} {shape:>16s} {r['us']:9.1f} "
              f"{r['gbps']:8.1f} {r['sol_frac']:5.1%}")


if __name__ == "__main__":
    main()
