"""SHAN param-transplant experiment (VERDICT r3 #8 — the step-exactness
proof behind the round-4 SHAN settlement).

Round 4 found and fixed the real defect (models/shan.py: the unmasked
softmax must be limited to the reference's per-batch dynamic-padding width,
SHAN/input.py:31-43).  This harness then proves the fixed model is the
reference's model to float tolerance, the same way scripts/atrank_transplant.py
settled ATRank:

  dump   — build the REFERENCE's own TF SHAN graph in the patched workdir
           that scripts/ref_tf_run.py prepares (runs/ref_tf/SHAN_<dataset>),
           initialize at a given train seed, and dump: all 7 trainable
           variables, the exact first training batch (post random.shuffle),
           forward logits + loss, per-variable dense gradients + global
           norm, and every variable after ONE clipped-SGD step.
  check  — load the dump into models/shan.py (TF names map 1:1 onto our
           param tree) and diff forward / loss / grads / post-step vars.
           The TF batch is fed verbatim: its per-batch-max padding makes
           our n_cols limit equal the full width, i.e. the no-mask softmax.
  train  — matched-init training: our full Trainer from the reference's
           dumped initial variables at the published 40-epoch protocol;
           the resulting best AUC lands in the reference's own in-env
           envelope (runs/ref_tf/shan_<dataset>*.log) if the remaining
           difference is init-draw + shuffle-order noise only.

Reference graph: SHAN/model.py:52-136 (variables, loss), train.py:15-17
(seeds), input.py:16-45 (batch layout).

Usage:
  python scripts/ref_tf_run.py --model SHAN --dataset Video_Games --build-only
  python scripts/shan_transplant.py dump  [--dataset Video_Games]
  python scripts/shan_transplant.py check [--dataset Video_Games]
  python scripts/shan_transplant.py train [--dataset Video_Games] [--max_epochs 40]
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VAR_NAMES = ("item_emb", "item_b", "user_emb",
             "layer1_w", "layer2_w", "layer1_b", "layer2_b")

DUMP_SRC = '''\
"""Dump the reference SHAN graph's init/batch/forward/grads/post-step state
(written by scripts/shan_transplant.py)."""
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

# SHAN's dataset.pkl carries no cate_list (SHAN/train.py:116-118)
with open("dataset.pkl", "rb") as f:
    train_set = pickle.load(f)
    test_set = pickle.load(f)
    user_count, item_count = pickle.load(f)
cate_count = 0

# the reference train.py flag defaults (SHAN/train.py:27-49)
config = dict(dropout=0.0, regulation_rate=5e-5, embedding_size=32,
              optimizer="sgd", learning_rate=1.0, max_gradient_norm=5.0,
              model_dir="dump_model_dir",
              user_count=user_count, item_count=item_count,
              cate_count=cate_count)
os.makedirs(config["model_dir"], exist_ok=True)

with tf.Session() as sess:
    model = Model(config)
    sess.run(tf.global_variables_initializer())
    sess.run(tf.local_variables_initializer())
    tvars = tf.trainable_variables()
    payload = {"meta:counts": np.array([user_count, item_count, cate_count])}
    for v in tvars:
        payload["var:" + v.name] = sess.run(v)

    # the exact first training batch train.py would feed post-shuffle
    random.shuffle(train_set)
    _, uij = next(iter(DataInput(train_set, 32)))
    u, i, y, hist_i, hist_i_new, sl, sl_new = uij
    batch = dict(u=np.asarray(u, np.int32), i=np.asarray(i, np.int32),
                 y=np.asarray(y, np.float32),
                 hist_i=np.asarray(hist_i, np.int32),
                 hist_i_new=np.asarray(hist_i_new, np.int32),
                 sl=np.asarray(sl, np.int32),
                 sl_new=np.asarray(sl_new, np.int32))
    for k, v in batch.items():
        payload["batch:" + k] = v

    feed = {model.u: batch["u"], model.i: batch["i"], model.y: batch["y"],
            model.hist_i: batch["hist_i"],
            model.hist_i_new: batch["hist_i_new"],
            model.sl: batch["sl"], model.sl_new: batch["sl_new"],
            model.is_training: False}
    logits, loss = sess.run([model.logits, model.loss], feed)
    payload["out:logits"] = logits
    payload["out:loss"] = np.float32(loss)

    grads = tf.gradients(model.loss, tvars)
    dense_grads = [tf.convert_to_tensor(g) for g in grads]
    vals = sess.run(dense_grads + [tf.global_norm(grads),
                                   tf.global_norm(dense_grads)], feed)
    for v, g in zip(tvars, vals[:-2]):
        payload["grad:" + v.name] = g
    payload["out:global_norm"] = np.float32(vals[-2])
    payload["out:global_norm_dense"] = np.float32(vals[-1])

    feed[model.lr] = 1.0
    feed[model.is_training] = True
    sess.run(model.train_op, feed)
    for v in tvars:
        payload["post:" + v.name] = sess.run(v)

    np.savez(OUT, **payload)
    print("dumped %s  loss=%.6f  gnorm=%.4f" % (OUT, loss, vals[-1]),
          flush=True)
'''


def workdir(dataset):
    return os.path.join(REPO, "runs", "ref_tf", f"SHAN_{dataset}")


def dump(dataset, seed):
    wd = workdir(dataset)
    assert os.path.exists(os.path.join(wd, "dataset.pkl")), (
        f"run scripts/ref_tf_run.py --model SHAN --dataset {dataset} "
        f"--build-only first")
    out = os.path.join(wd, f"transplant_{seed}.npz")
    with open(os.path.join(wd, "dump_init.py"), "w") as f:
        f.write(DUMP_SRC)
    env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="3", TF_USE_LEGACY_KERAS="1",
               JAX_PLATFORMS="cpu")
    subprocess.run([sys.executable, "dump_init.py", str(seed), out],
                   cwd=wd, check=True, env=env)
    return out


def load_tf_tree(z, prefix="var"):
    """TF variable names → our param tree (1:1; models/shan.py init_params)."""
    import jax.numpy as jnp
    return {name: jnp.asarray(z[f"{prefix}:{name}:0"]) for name in VAR_NAMES}


def _cfg_and_batch(z):
    import jax.numpy as jnp
    from tlsan_tpu.core.config import ModelConfig
    uc, ic, cc = (int(x) for x in z["meta:counts"])
    cfg = ModelConfig(model="shan", user_count=uc, item_count=ic,
                      cate_count=cc, regulation_rate=5e-5)
    batch = {k[len("batch:"):]: jnp.asarray(z[k]) for k in z.files
             if k.startswith("batch:")}
    return cfg, batch


def check(dataset, seed):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax
    from tlsan_tpu.models.shan import SHAN
    from tlsan_tpu.models import base
    from tlsan_tpu.nn import embedding as emb

    z = np.load(os.path.join(workdir(dataset), f"transplant_{seed}.npz"))
    params = load_tf_tree(z, "var")
    cfg, batch = _cfg_and_batch(z)

    # pin the bitwise scatter VJP (same exactness harness as ATRank's)
    emb.gather_bwd("take").__enter__()

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12))

    u_t = SHAN.user_repr(params, batch, None, cfg)
    ie, ib = SHAN.item_repr(params, batch["i"], None, cfg)
    logits = base.pointwise_logits(u_t, ie, ib)
    r_logits = rel(logits, z["out:logits"])
    print(f"forward logits   max rel diff = {r_logits:.3e}")

    loss = SHAN.loss(params, batch, None, cfg)
    r_loss = abs(float(loss) - float(z["out:loss"])) / abs(float(z["out:loss"]))
    print(f"loss             ours={float(loss):.6f} "
          f"ref={float(z['out:loss']):.6f} rel diff = {r_loss:.3e}")

    g = jax.grad(lambda p: SHAN.loss(p, batch, None, cfg))(params)
    g_ref = load_tf_tree(z, "grad")
    gnorm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g[n])) for n in VAR_NAMES)))
    gd = float(z["out:global_norm_dense"])
    gi = float(z["out:global_norm"])
    r_gnorm = abs(gnorm - gd) / gd
    worst = max(rel(g[n], g_ref[n]) for n in VAR_NAMES)
    print(f"grad global norm ours={gnorm:.5f} ref(dense)={gd:.5f} "
          f"rel diff = {r_gnorm:.3e} (TF IndexedSlices norm {gi:.5f})")
    print(f"per-var grads    worst max rel diff = {worst:.3e}")

    opt = optax.chain(optax.clip_by_global_norm(5.0), optax.sgd(1.0))
    upd, _ = opt.update(g, opt.init(params), params)
    stepped = optax.apply_updates(params, upd)
    post_ref = load_tf_tree(z, "post")
    worst_post = max(rel(stepped[n], post_ref[n]) for n in VAR_NAMES)
    print(f"post-step vars   worst max rel diff = {worst_post:.3e}")

    ok = (r_logits < 1e-4 and r_loss < 1e-4 and r_gnorm < 1e-3
          and worst < 1e-2 and worst_post < 1e-3)
    print("TRANSPLANT CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def train(dataset, seed, max_epochs):
    import jax
    import numpy as np
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.shan import SHAN
    from tlsan_tpu.train.cli import prepare
    from tlsan_tpu.train.loop import Trainer
    from tlsan_tpu.nn import embedding as emb

    z = np.load(os.path.join(workdir(dataset), f"transplant_{seed}.npz"))
    params = load_tf_tree(z, "var")
    cfg = ModelConfig(model="shan")
    data = f"/root/reference/Data/{dataset}.pkl"
    train_b, test_b, cate_list, cfg = prepare("shan", data, cfg, 1234)
    tc = TrainConfig(model_dir=f"runs/shan_transplant_{dataset}_s{seed}",
                     optimizer="sgd", learning_rate=1.0,
                     lr_drop_step=150_000, max_epochs=max_epochs,
                     train_batch_size=32, test_batch_size=128,
                     eval_freq=1000, seed=seed, save_auc_gate=2.0,
                     best_after_step=0, tb_histograms=False)
    tr = Trainer(SHAN, cfg, tc, cate_list, train_b, test_b, use_pallas=False)
    tr.params = jax.device_put(params)
    tr.opt_state = tr.opt.init(tr.params)
    emb.gather_bwd("take").__enter__()
    best = tr.train()
    print(f"matched-init (TF seed {seed}) best: {best}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["dump", "check", "train"])
    p.add_argument("--dataset", default="Video_Games")
    p.add_argument("--train_seed", type=int, default=1234)
    p.add_argument("--max_epochs", type=int, default=40)
    args = p.parse_args()
    if args.cmd == "dump":
        dump(args.dataset, args.train_seed)
    elif args.cmd == "check":
        sys.exit(check(args.dataset, args.train_seed))
    else:
        train(args.dataset, args.train_seed, args.max_epochs)


if __name__ == "__main__":
    main()
