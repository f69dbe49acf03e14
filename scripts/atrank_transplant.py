"""ATRank param-transplant experiment (VERDICT r2 #1 — the last open
modeling delta, a ~0.02 mean-AUC shift vs the reference run in-env).

Settles the cause BY MEASUREMENT instead of inference:

  dump   — build the REFERENCE's own TF graph (the patched workdir that
           scripts/ref_tf_run.py prepares), initialize at a given train
           seed, and dump: every trainable variable's initial value, the
           exact first training batch (post random.shuffle), forward
           logits + loss on that batch, per-variable gradients + global
           norm, and every variable's value after ONE SGD step.
  check  — load the dump into models/atrank.py (TF variable names map 1:1
           onto our param tree) and diff: (a) forward logits, (b) loss,
           (c) per-variable grads + global norm, (d) the post-step
           variables after our optimizer applies one clipped-SGD update.
  train  — matched-init training: run OUR full Trainer on Clothing from
           the reference's dumped initial variables (same 10-epoch
           protocol).  If the final AUC lands in the reference's in-env
           seed envelope (0.6731-0.6910), the shift is init-draw
           distribution only.

Reference graph: ATRank/model.py:46-174 (variables), train.py:14-16
(seeds), 179-184 (shuffle + first batch), input.py:3-42 (batch layout).

Usage:
  python scripts/ref_tf_run.py --model ATRank \
      --dataset Clothing_Shoes_and_Jewelry --build-only   # once
  python scripts/atrank_transplant.py dump  [--train_seed 1234]
  python scripts/atrank_transplant.py check [--train_seed 1234]
  python scripts/atrank_transplant.py train [--train_seed 1234] [--max_epochs 10]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORKDIR = os.path.join(REPO, "runs", "ref_tf",
                       "ATRank_Clothing_Shoes_and_Jewelry")

# ---------------------------------------------------------------------------
# TF side: runs inside the patched reference workdir (its own subprocess,
# because TF and JAX fight over threads); writes transplant_<seed>.npz
# ---------------------------------------------------------------------------

DUMP_SRC = '''\
"""Dump the reference ATRank graph's init/batch/forward/grads/post-step
state for the transplant experiment (written by scripts/atrank_transplant.py)."""
import os, pickle, random, sys
import numpy as np
from tf1shim import tf
from model import Model
from input import DataInput

SEED = int(sys.argv[1])
OUT = sys.argv[2]

random.seed(SEED)
np.random.seed(SEED)
tf.set_random_seed(SEED)

with open("dataset.pkl", "rb") as f:
    train_set = pickle.load(f)
    test_set = pickle.load(f)
    cate_list = pickle.load(f)
    user_count, item_count, cate_count = pickle.load(f)

# the reference train.py flag defaults (ATRank/train.py:24-44)
config = dict(hidden_units=64, num_blocks=1, num_heads=8, dropout=0.0,
              regulation_rate=5e-5, itemid_embedding_size=32,
              cateid_embedding_size=32, concat_time_emb=True,
              optimizer="sgd", learning_rate=1.0, max_gradient_norm=5.0,
              model_dir="dump_model_dir",
              user_count=user_count, item_count=item_count,
              cate_count=cate_count)
os.makedirs(config["model_dir"], exist_ok=True)

with tf.Session() as sess:
    model = Model(config, cate_list)
    sess.run(tf.global_variables_initializer())
    sess.run(tf.local_variables_initializer())
    tvars = tf.trainable_variables()
    payload = {"meta:counts": np.array([user_count, item_count, cate_count]),
               "meta:cate_list": np.asarray(cate_list, np.int64)}
    for v in tvars:
        payload["var:" + v.name] = sess.run(v)

    # the exact first training batch train.py:179-184 would feed
    random.shuffle(train_set)
    _, uij = next(iter(DataInput(train_set, 32)))
    u, i, y, hist_i, hist_t, sl = uij
    batch = dict(u=np.asarray(u, np.int32), i=np.asarray(i, np.int32),
                 y=np.asarray(y, np.float32),
                 hist_i=np.asarray(hist_i, np.int32),
                 hist_t=np.asarray(hist_t, np.int32),
                 sl=np.asarray(sl, np.int32))
    for k, v in batch.items():
        payload["batch:" + k] = v

    feed = {model.u: batch["u"], model.i: batch["i"], model.y: batch["y"],
            model.hist_i: batch["hist_i"], model.hist_t: batch["hist_t"],
            model.sl: batch["sl"], model.is_training: False}
    logits, loss = sess.run([model.logits, model.loss], feed)
    payload["out:logits"] = logits
    payload["out:loss"] = np.float32(loss)

    grads = tf.gradients(model.loss, tvars)
    # embedding grads come back as IndexedSlices; store them DENSE.
    # NOTE: tf.clip_by_global_norm (model.py:169-170) computes the norm
    # over the raw IndexedSlices VALUES — duplicate rows are NOT summed
    # first — so the clip norm TF actually uses can differ from the true
    # dense-gradient norm.  Dump both so the check can quantify it.
    dense_grads = [tf.convert_to_tensor(g) for g in grads]
    vals = sess.run(dense_grads + [tf.global_norm(grads),
                                   tf.global_norm(dense_grads)], feed)
    for v, g in zip(tvars, vals[:-2]):
        payload["grad:" + v.name] = g
    payload["out:global_norm"] = np.float32(vals[-2])        # what TF clips by
    payload["out:global_norm_dense"] = np.float32(vals[-1])  # true dense norm

    feed[model.lr] = 1.0
    feed[model.is_training] = True
    sess.run(model.train_op, feed)
    for v in tvars:
        payload["post:" + v.name] = sess.run(v)

    np.savez(OUT, **payload)
    print("dumped %s  loss=%.6f  gnorm=%.4f" % (OUT, loss, vals[-1]),
          flush=True)
'''


def dump(seed: int) -> str:
    out = os.path.join(WORKDIR, f"transplant_{seed}.npz")
    with open(os.path.join(WORKDIR, "dump_init.py"), "w") as f:
        f.write(DUMP_SRC)
    env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3", TF_USE_LEGACY_KERAS="1",
               JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "dump_init.py", str(seed), out],
                   cwd=WORKDIR, check=True, env=env)
    return out


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------

def load_tf_tree(z, prefix="var", num_blocks=1):
    """Build our param tree from the dump at the given prefix
    (``var`` = initial values, ``post`` = after one reference SGD step),
    and verify every dumped variable was consumed."""
    import jax.numpy as jnp

    used = set()

    def g(name):
        key = f"{prefix}:{name}:0"
        used.add(f"var:{name}:0")
        return jnp.asarray(z[key])

    def attn(scope):
        return {
            "wq": g(f"{scope}/dense/kernel"), "bq": g(f"{scope}/dense/bias"),
            "wk": g(f"{scope}/dense_1/kernel"), "bk": g(f"{scope}/dense_1/bias"),
            "wv": g(f"{scope}/dense_2/kernel"), "bv": g(f"{scope}/dense_2/bias"),
            "ln_beta": g(f"{scope}/ln/Variable"),
            "ln_gamma": g(f"{scope}/ln/Variable_1"),
        }

    def ffn(scope):
        return {
            "w1": g(f"{scope}/conv1d/kernel")[0], "b1": g(f"{scope}/conv1d/bias"),
            "w2": g(f"{scope}/conv1d_1/kernel")[0], "b2": g(f"{scope}/conv1d_1/bias"),
            "ln_beta": g(f"{scope}/ln/Variable"),
            "ln_gamma": g(f"{scope}/ln/Variable_1"),
        }

    p = {
        "item_emb": g("item_emb_w"), "item_b": g("item_b"),
        "cate_emb": g("cate_emb_w"),
        "time_w": g("dense/kernel"), "time_b": g("dense/bias"),
        "self_blocks": [], "vanilla_blocks": [],
    }
    for b in range(num_blocks):
        s = f"all/user_hist_group/num_blocks_{b}"
        p["self_blocks"].append({"attn": attn(f"{s}/self_attention"),
                                 "ffn": ffn(f"{s}/feed_forward")})
        s = f"all/item_feature_group/num_blocks_{b}"
        p["vanilla_blocks"].append({"attn": attn(f"{s}/vanilla_attention"),
                                    "ffn": ffn(f"{s}/feed_forward")})
    have = {k for k in z.files if k.startswith("var:")}
    unmatched = sorted(have - used)
    if unmatched:
        raise SystemExit(f"unmatched TF variables: {unmatched}")
    return p


def _grads_tree(z, num_blocks=1):
    return load_tf_tree(z, prefix="grad", num_blocks=num_blocks)


def _cfg_and_batch(z):
    import jax.numpy as jnp
    from tlsan_tpu.core.config import ModelConfig
    uc, ic, cc = (int(x) for x in z["meta:counts"])
    cfg = ModelConfig(model="atrank", user_count=uc, item_count=ic,
                      cate_count=cc, hidden_units=64, num_blocks=1,
                      num_heads=8, dropout=0.0, regulation_rate=5e-5)
    batch = {k[len("batch:"):]: jnp.asarray(z[k]) for k in z.files
             if k.startswith("batch:")}
    cate_list = jnp.asarray(z["meta:cate_list"].astype("int32"))
    return cfg, batch, cate_list


def check(seed: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    import numpy as np
    import optax
    from tlsan_tpu.models.atrank import ATRank

    z = np.load(os.path.join(WORKDIR, f"transplant_{seed}.npz"))
    params = load_tf_tree(z, "var")
    cfg, batch, cate_list = _cfg_and_batch(z)

    # exactness harness: pin the bitwise scatter VJP (the default one-hot
    # matmul backward carries ~1e-6 f32 reorder noise — nn/embedding.py)
    from tlsan_tpu.nn import embedding as emb
    _gb = emb.gather_bwd("take")
    _gb.__enter__()

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.max(np.abs(b)), 1e-12)
        return float(np.max(np.abs(a - b)) / denom)

    # (a) forward logits
    ours = ATRank.user_repr(params, batch, cate_list, cfg, use_pallas=False)
    ie, ib = ATRank.item_repr(params, batch["i"], cate_list, cfg)
    from tlsan_tpu.models import base
    logits = base.pointwise_logits(ours, ie, ib)
    r_logits = rel(logits, z["out:logits"])
    print(f"forward logits   max rel diff = {r_logits:.3e}")

    # (b) loss
    loss = ATRank.loss(params, batch, cate_list, cfg, use_pallas=False)
    r_loss = abs(float(loss) - float(z["out:loss"])) / abs(float(z["out:loss"]))
    print(f"loss             ours={float(loss):.6f} "
          f"ref={float(z['out:loss']):.6f} rel diff = {r_loss:.3e}")

    # (c) grads + global norm
    g = jax.grad(lambda p: ATRank.loss(p, batch, cate_list, cfg,
                                       use_pallas=False))(params)
    g_ref = _grads_tree(z)
    leaves, _ = jax.tree_util.tree_flatten(g)
    leaves_ref, _ = jax.tree_util.tree_flatten(g_ref)
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves)))
    gd = float(z["out:global_norm_dense"])
    gi = float(z["out:global_norm"])
    r_gnorm = abs(gnorm - gd) / gd
    worst = max(rel(a, b) for a, b in zip(leaves, leaves_ref))
    print(f"grad global norm ours={gnorm:.5f} ref(dense)={gd:.5f} "
          f"rel diff = {r_gnorm:.3e}")
    print(f"  [semantic note] TF clips by the NON-deduped IndexedSlices "
          f"norm = {gi:.5f} ({abs(gi - gd) / gd * 100:.2f}% off the true "
          f"dense norm; only matters when the norm exceeds the clip "
          f"threshold 5.0)")
    print(f"per-var grads    worst max rel diff = {worst:.3e}")

    # (d) one clipped-SGD step -> post-step variables
    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.sgd(1.0))
    upd, _ = opt.update(g, opt.init(params), params)
    stepped = optax.apply_updates(params, upd)
    post_ref = load_tf_tree(z, "post")
    s_leaves, _ = jax.tree_util.tree_flatten(stepped)
    p_leaves, _ = jax.tree_util.tree_flatten(post_ref)
    worst_post = max(rel(a, b) for a, b in zip(s_leaves, p_leaves))
    print(f"post-step vars   worst max rel diff = {worst_post:.3e}")

    ok = (r_logits < 1e-4 and r_loss < 1e-4 and r_gnorm < 1e-3
          and worst < 1e-2 and worst_post < 1e-3)
    print("TRANSPLANT CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def train(seed: int, max_epochs: int, platform: str = "default",
          ref_stream: bool = False):
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.atrank import ATRank
    from tlsan_tpu.train.cli import prepare
    from tlsan_tpu.train.loop import Trainer

    z = np.load(os.path.join(WORKDIR, f"transplant_{seed}.npz"))
    params = load_tf_tree(z, "var")
    cfg = ModelConfig(model="atrank")
    data = "/root/reference/Data/Clothing_Shoes_and_Jewelry.pkl"
    train_b, test_b, cate_list, cfg = prepare("atrank", data, cfg, 1234)
    tc = TrainConfig(model_dir=f"runs/atrank_transplant_s{seed}",
                     optimizer="sgd", learning_rate=1.0,
                     lr_drop_step=270_000, max_epochs=max_epochs,
                     train_batch_size=32, test_batch_size=128,
                     eval_freq=1000, seed=seed, save_auc_gate=0.8,
                     best_after_step=0, tb_histograms=False)
    tr = Trainer(ATRank, cfg, tc, cate_list, train_b, test_b,
                 use_pallas=False)
    # transplant: replace the JAX init draw with the reference's TF draw
    tr.params = jax.device_put(params)
    tr.opt_state = tr.opt.init(tr.params)
    # matched-init curves compare against scatter-VJP-era measurements:
    # keep them bitwise-reproducible (nn/embedding.py gather_bwd)
    from tlsan_tpu.nn import embedding as emb
    _gb = emb.gather_bwd("take")
    _gb.__enter__()
    if not ref_stream:
        best = tr.train()
        print(f"matched-init (TF seed {seed}) best: {best}")
        return

    # TF init + the REFERENCE'S OWN BATCH STREAM: replicate the cumulative
    # per-epoch random.shuffle(train_set) (ATRank/train.py:14,180) on the
    # example indices (our builder is bit-exact vs its dataset.pkl, so
    # index order == its example order) and feed consecutive 32-slices;
    # the ragged final batch per epoch (<0.2% of examples) is dropped.
    import random as pyrandom
    rng = pyrandom.Random(seed)
    n, B, K = train_b.n, 32, 100
    order = list(range(n))
    best_auc, step = 0.0, 0
    for _ in range(max_epochs):
        rng.shuffle(order)
        steps = n // B
        idx = np.asarray(order[: steps * B], np.int32).reshape(steps, B)
        for c0 in range(0, steps, K):
            chunk = idx[c0: c0 + K]
            tr.params, tr.opt_state, _ = tr._train_chunk(
                tr.params, tr.opt_state, jnp.asarray(chunk))
            step += len(chunk)
            if (step // 1000) > ((step - len(chunk)) // 1000):
                auc = tr.evaluator.auc(tr.params)
                best_auc = max(best_auc, auc)
                print(f"[ref-stream] step={step} auc={auc:.4f}", flush=True)
    print(f"matched-init+ref-stream (TF seed {seed}) best_auc: "
          f"{best_auc:.4f}")


def dump_jax(seed: int):
    """REVERSE transplant, step 1: write OUR JAX init draw (models/atrank.py
    init_params at the given seed) into the TF workdir under the reference's
    variable names, shapes matching the reference graph exactly."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from tlsan_tpu.core.config import ModelConfig
    from tlsan_tpu.models.atrank import ATRank

    z = np.load(os.path.join(WORKDIR, "transplant_1234.npz"))
    uc, ic, cc = (int(x) for x in z["meta:counts"])
    cfg = ModelConfig(model="atrank", user_count=uc, item_count=ic,
                      cate_count=cc)
    params = ATRank.init_params(jax.random.PRNGKey(seed), cfg)

    out = {}

    def put(name, arr):
        out["var:" + name + ":0"] = np.asarray(arr)

    put("item_emb_w", params["item_emb"])
    put("item_b", params["item_b"])
    put("cate_emb_w", params["cate_emb"])
    put("dense/kernel", params["time_w"])
    put("dense/bias", params["time_b"])

    def put_attn(scope, a):
        put(f"{scope}/dense/kernel", a["wq"]); put(f"{scope}/dense/bias", a["bq"])
        put(f"{scope}/dense_1/kernel", a["wk"]); put(f"{scope}/dense_1/bias", a["bk"])
        put(f"{scope}/dense_2/kernel", a["wv"]); put(f"{scope}/dense_2/bias", a["bv"])
        put(f"{scope}/ln/Variable", a["ln_beta"])
        put(f"{scope}/ln/Variable_1", a["ln_gamma"])

    def put_ffn(scope, f):
        put(f"{scope}/conv1d/kernel", np.asarray(f["w1"])[None])
        put(f"{scope}/conv1d/bias", f["b1"])
        put(f"{scope}/conv1d_1/kernel", np.asarray(f["w2"])[None])
        put(f"{scope}/conv1d_1/bias", f["b2"])
        put(f"{scope}/ln/Variable", f["ln_beta"])
        put(f"{scope}/ln/Variable_1", f["ln_gamma"])

    for b, blk in enumerate(params["self_blocks"]):
        s = f"all/user_hist_group/num_blocks_{b}"
        put_attn(f"{s}/self_attention", blk["attn"])
        put_ffn(f"{s}/feed_forward", blk["ffn"])
    for b, blk in enumerate(params["vanilla_blocks"]):
        s = f"all/item_feature_group/num_blocks_{b}"
        put_attn(f"{s}/vanilla_attention", blk["attn"])
        put_ffn(f"{s}/feed_forward", blk["ffn"])

    path = os.path.join(WORKDIR, f"jax_init_{seed}.npz")
    np.savez(path, **out)
    print(f"wrote {path} ({len(out)} variables)")


REF_LOADER = '''\
    sess.run(tf.global_variables_initializer())
    sess.run(tf.local_variables_initializer())
    import numpy as _np
    _z = _np.load(__import__("os").environ["JAX_INIT_NPZ"])
    _n = 0
    for _v in tf.trainable_variables():
      _key = "var:" + _v.name
      assert _key in _z.files, "missing transplant value for " + _v.name
      sess.run(tf.assign(_v, _z[_key]))
      _n += 1
    print("loaded %d variables from jax init npz" % _n, flush=True)
'''


def reftrain(seed: int):
    """REVERSE transplant, step 2: run the REFERENCE'S OWN training loop
    (patched workdir, --fast evals) but with our JAX init draw assigned
    over the TF init.  If its best AUC falls to our JAX-init envelope, the
    ~0.01 residual is init-draw + trajectory noise on both sides."""
    import re
    src = open(os.path.join(WORKDIR, "train.py")).read()
    target = ("    sess.run(tf.global_variables_initializer())\n"
              "    sess.run(tf.local_variables_initializer())\n")
    assert target in src, "train.py anchor not found"
    src = src.replace(target, REF_LOADER)
    # stub the streaming P@k/R@k evals (AUC untouched — 3x faster run;
    # ATRank's eval_* signature differs from ref_tf_run.patch_fast's)
    src = re.sub(r"(prec|recall) = eval_\1\(sess, test_set, model\)",
                 r"\1 = [0.0] * 6  # fast: top-k eval stubbed", src)
    # train seeds: keep the reference's own (they only drive shuffle now —
    # the init is overwritten) unless a different stream is requested
    if seed != 1234:
        for pat in ("random.seed(1234)", "np.random.seed(1234)",
                    "tf.set_random_seed(1234)"):
            src = src.replace(pat, pat.replace("1234", str(seed)))
    with open(os.path.join(WORKDIR, "train_jaxinit.py"), "w") as f:
        f.write(src)
    env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3", TF_USE_LEGACY_KERAS="1",
               JAX_PLATFORMS="cpu",
               JAX_INIT_NPZ=os.path.join(WORKDIR, f"jax_init_{seed}.npz"))
    r = subprocess.run([sys.executable, "train_jaxinit.py"],
                       cwd=WORKDIR, env=env)
    sys.exit(r.returncode)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["dump", "check", "train", "dump_jax",
                                   "reftrain"])
    p.add_argument("--train_seed", type=int, default=1234)
    p.add_argument("--max_epochs", type=int, default=10)
    p.add_argument("--platform", default="default", choices=["cpu", "default"])
    p.add_argument("--ref_stream", action="store_true",
                   help="train: feed the reference's exact shuffle stream")
    args = p.parse_args()
    if args.cmd == "dump":
        dump(args.train_seed)
    elif args.cmd == "check":
        sys.exit(check(args.train_seed))
    elif args.cmd == "dump_jax":
        dump_jax(args.train_seed)
    elif args.cmd == "reftrain":
        reftrain(args.train_seed)
    else:
        train(args.train_seed, args.max_epochs, args.platform,
              args.ref_stream)


if __name__ == "__main__":
    main()
