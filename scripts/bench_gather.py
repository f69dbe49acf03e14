"""Gather-strategy micro-benchmark (round-3 perf follow-up).

The b512 whole-step roofline (runs/r3/roofline_b512_quiet.txt) shows the
embedding gathers running at ~1.4% HBM SoL (226 us for 2.7 MB): TPU
row-gather is serviced by the scalar/vector units, not the MXU.  The
classic TPU alternative for small vocabularies is gather-as-one-hot-matmul
(y = onehot(ids) @ table), whose VJP (dtable = onehot^T @ dy) also replaces
the backward scatter-add.  This script measures both strategies, fwd and
fwd+bwd, on the real chip at the trainer's shapes before any code changes.

Timing protocol: each variant runs inside a lax.scan of K iterations with
ids rotated by the iteration index (defeats loop-invariant hoisting); the
per-iteration time is the SLOPE between K1 and K2 (cancels the ~25 ms
tunnel dispatch RPC, see RESULTS.md roofline notes).

Usage: python scripts/bench_gather.py [--V 1583] [--D 64] [--rows 46080]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_call(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--V", type=int, default=1583)
    p.add_argument("--D", type=int, default=64)
    p.add_argument("--rows", type=int, default=512 * 90,
                   help="total gathered rows per step (b512 x T90)")
    p.add_argument("--K1", type=int, default=50)
    p.add_argument("--K2", type=int, default=200)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--platform", default=None, choices=["cpu", "default"])
    p.add_argument("--variants", default=None,
                   help="comma-separated variant subset (each scan is a "
                        "fresh multi-minute remote-AOT compile — trim to "
                        "what the question needs)")
    p.add_argument("--modes", default="fwd,fwd+bwd",
                   help="comma-separated subset of {fwd,fwd+bwd}")
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

    V, D, R = args.V, args.D, args.rows
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=R), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((R, D)), jnp.float32)

    def g_take(t, i):
        return jnp.take(t, i, axis=0)

    def g_onehot_hi(t, i):
        oh = jax.nn.one_hot(i, V, dtype=jnp.float32)
        return jax.lax.dot_general(oh, t, (((1,), (0,)), ((), ())),
                                   precision="highest",
                                   preferred_element_type=jnp.float32)

    def g_onehot_default(t, i):
        oh = jax.nn.one_hot(i, V, dtype=jnp.float32)
        return jax.lax.dot_general(oh, t, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def g_onehot_dh(t, i):
        # one-hot entries (0/1) are exact in ONE bf16 pass; the table operand
        # at HIGH = bf16x3 (3x8 mantissa bits = exact f32 split) -> the
        # product should be bit-exact at 3 total passes instead of HIGHEST's 6
        oh = jax.nn.one_hot(i, V, dtype=jnp.float32)
        return jax.lax.dot_general(
            oh, t, (((1,), (0,)), ((), ())),
            precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGH),
            preferred_element_type=jnp.float32)

    def g_onehot_hh(t, i):
        oh = jax.nn.one_hot(i, V, dtype=jnp.float32)
        return jax.lax.dot_general(
            oh, t, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    def _custom(bwd_precision):
        # the shipped lookup path (nn/embedding.py): take forward, one-hot
        # matmul backward at the given precision
        @jax.custom_vjp
        def f(t, i):
            return jnp.take(t, i, axis=0)

        def fwd(t, i):
            return jnp.take(t, i, axis=0), i

        def bwd(i, ct):
            oh = jax.nn.one_hot(i, V, dtype=jnp.float32)
            dt = jax.lax.dot_general(
                oh, ct, (((0,), (0,)), ((), ())),
                precision=bwd_precision,
                preferred_element_type=jnp.float32)
            return dt, None

        f.defvjp(fwd, bwd)
        return f

    variants = {"take": g_take, "onehot_hi": g_onehot_hi,
                "onehot_def": g_onehot_default, "onehot_dh": g_onehot_dh,
                "onehot_hh": g_onehot_hh,
                "custom_hi": _custom(jax.lax.Precision.HIGHEST),
                # one-hot 0/1 entries are exact in a single bf16 pass and
                # the bf16x3 split of the f32 cotangent is an exact split →
                # per-term-exact at half HIGHEST's passes
                "custom_dh": _custom((jax.lax.Precision.DEFAULT,
                                      jax.lax.Precision.HIGH))}

    if args.variants:
        keep = args.variants.split(",")
        unknown = [k for k in keep if k not in variants]
        assert not unknown, f"unknown variants: {unknown}"
        variants = {k: variants[k] for k in keep}

    # exactness check (fwd values AND table grads vs the gather/scatter path)
    ref = np.asarray(g_take(table, ids))
    gref = np.asarray(jax.jit(jax.grad(
        lambda t: jnp.sum(g_take(t, ids) * cot)))(table))
    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(table, ids))
        g = np.asarray(jax.jit(jax.grad(
            lambda t: jnp.sum(fn(t, ids) * cot)))(table))
        print(f"exact[{name}]: fwd_bitwise={bool((got == ref).all())} "
              f"fwd_max={float(np.abs(got - ref).max()):.3e} "
              f"grad_max={float(np.abs(g - gref).max()):.3e} "
              f"grad_rel={float(np.abs(g - gref).max() / (np.abs(gref).max() + 1e-30)):.3e}")

    def fwd_scan(fn, K):
        @jax.jit
        def run(t, i0):
            def body(carry, k):
                i = (i0 + k) % V
                y = fn(t, i)
                return carry + jnp.sum(y), None
            s, _ = jax.lax.scan(body, 0.0, jnp.arange(K))
            return s
        return lambda: jax.block_until_ready(run(table, ids))

    def bwd_scan(fn, K):
        @jax.jit
        def run(t, i0):
            def loss(tt, i):
                return jnp.sum(fn(tt, i) * cot)
            def body(t_carry, k):
                i = (i0 + k) % V
                g = jax.grad(loss)(t_carry, i)
                return t_carry - 1e-9 * g, None
            t_out, _ = jax.lax.scan(body, t, jnp.arange(K))
            return jnp.sum(t_out)
        return lambda: jax.block_until_ready(run(table, ids))

    out = {"V": V, "D": D, "rows": R,
           "backend": jax.devices()[0].platform}
    print(f"# V={V} D={D} rows={R} backend={jax.devices()[0].platform}")
    modes = [(m, {"fwd": fwd_scan, "fwd+bwd": bwd_scan}[m])
             for m in args.modes.split(",")]
    for mode, mk in modes:
        for name, fn in variants.items():
            t1 = time_call(mk(fn, args.K1), args.reps)
            t2 = time_call(mk(fn, args.K2), args.reps)
            us = (t2 - t1) / (args.K2 - args.K1) * 1e6
            out[f"{mode}:{name}_us"] = round(us, 2)
            print(f"{mode:8s} {name:12s} {us:10.1f} us/iter")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
