"""Run the REFERENCE'S OWN TensorFlow code in this environment (VERDICT r1 #1).

The reference is plain TF-1.x graph-mode Python (e.g.
/root/reference/TLSAN/train.py:26-57, TLSAN/model.py:13-313).  This script
copies the reference's 4 files for one model into a scratch dir under
runs/ref_tf/ (NEVER committed - runs/ is gitignored), applies the minimal
patches needed to execute on the modern TF wheel via tf.compat.v1, builds
dataset.pkl with the reference's own builder, and runs the reference's own
train.py with its published flags.

Purpose: measure what the reference code actually scores in this
environment on the two open-gap configs (TLSAN/Home_and_Kitchen published
0.8950; LSPM/Clothing published 0.6443) so the parity question is settled
by measurement, not inference (RESULTS.md round-1 studies).

Patches applied (and nothing else):
  * import tensorflow as tf            -> tf.compat.v1 shim (tf1shim.py)
  * FLAGS.__flags access               -> FLAGS.flag_values_dict() (absl)
  * '../Data/Digital_Music.pkl'        -> requested category (abs path)
  * pd.value_counts                    -> pandas-2.x shim (same as
                                          scripts/verify_vs_reference_builder.py)
  * [--fast] P@k/R@k eval calls        -> stubbed [0]*6 (AUC untouched; the
                                          streaming top-k evals triple eval
                                          cost and feed nothing back)

Usage:
  python scripts/ref_tf_run.py --model TLSAN --dataset Home_and_Kitchen \
      [--fast] [--workdir runs/ref_tf] [-- --max_epochs=20 ...]
"""

import argparse
import os
import re
import subprocess
import sys

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TF1SHIM = '''\
"""tf.compat.v1 shim so reference TF-1.x graph code runs on the TF-2 wheel."""
import tensorflow.compat.v1 as tf

tf.disable_v2_behavior()


class _ContribLayers:
    def batch_norm(self, *a, **k):
        raise RuntimeError(
            "tf.contrib.layers.batch_norm reached - reference calls "
            "bn_dense_layer with enable_bn=False everywhere; investigate")


class _Contrib:
    layers = _ContribLayers()


if not hasattr(tf, "contrib"):
    tf.contrib = _Contrib()
'''


def patch_common(src: str) -> str:
    src = src.replace("import tensorflow as tf",
                      "from tf1shim import tf")
    # ATRank/train.py:124 loads a 5th pickle object its own build_dataset
    # never writes (ATRank/build_dataset.py:49-52) and never uses — the
    # shipped code cannot run without this fix
    src = src.replace(
        "    test_items = pickle.load(f)",
        "    test_items = None  # patched: object never written nor used")
    # absl FlagValues has no __flags dict attribute access from module scope
    src = src.replace("FLAGS.__flags.items()",
                      "FLAGS.flag_values_dict().items()")
    src = re.sub(r"config\[k\] = v\.value\b", "config[k] = v", src)
    return src


def patch_fast(src: str) -> str:
    """Stub the streaming P@k/R@k evals; AUC eval is untouched.
    (ATRank's eval_* take (sess, test_set, model) without config.)"""
    src = re.sub(
        r"(prec|recall) = eval_\1\(sess, (?:test_set, )?model(?:, config)?\)",
        r"\1 = [0.0] * 6  # --fast: top-k eval stubbed", src)
    return src


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="TLSAN",
                   help="reference model dir name (TLSAN, LSPM, ...)")
    p.add_argument("--dataset", default="Home_and_Kitchen")
    p.add_argument("--workdir", default=os.path.join(REPO, "runs", "ref_tf"))
    p.add_argument("--fast", action="store_true",
                   help="stub P@k/R@k evals (3x faster eval, same AUC)")
    p.add_argument("--train_seed", type=int, default=None,
                   help="override the hard-coded 1234 TRAIN seeds (init + "
                        "shuffle); the dataset builder seed stays 1234")
    p.add_argument("--set_max_epochs", type=int, default=None,
                   help="cap training epochs uniformly: appended as "
                        "--max_epochs for flag-style train.py, patched into "
                        "the module constant for BPR/Bi-LSTM")
    p.add_argument("--save_every_eval", action="store_true",
                   help="drop the best-AUC save gate (e.g. TLSAN/train.py:"
                        "228 `test_auc > 0.8 and ...`) so EVERY eval step "
                        "writes a checkpoint — anchor harness use, pairs "
                        "each saved step with its logged Eval_AUC line")
    p.add_argument("--build-only", action="store_true")
    p.add_argument("train_flags", nargs="*",
                   help="passed through to the reference train.py")
    args = p.parse_args()

    mdir = os.path.join(args.workdir, f"{args.model}_{args.dataset}")
    os.makedirs(mdir, exist_ok=True)

    with open(os.path.join(mdir, "tf1shim.py"), "w") as f:
        f.write(TF1SHIM)

    for fname in ("build_dataset.py", "input.py", "model.py", "train.py"):
        src = open(os.path.join(REF, args.model, fname)).read()
        src = patch_common(src)
        if fname == "build_dataset.py":
            src = src.replace(
                "'../Data/Digital_Music.pkl'",
                repr(os.path.join(REF, "Data", f"{args.dataset}.pkl")))
            src = src.replace(
                "import pandas as pd",
                "import pandas as pd\n"
                "pd.value_counts = lambda x: pd.Series(x).value_counts()")
        if fname == "train.py" and args.fast:
            src = patch_fast(src)
        if fname == "train.py" and args.save_every_eval:
            src, n = re.subn(
                r"if test_auc > [\d.]+ and test_auc > best_auc:|"
                r"if best_auc < test_auc:",
                "if True:  # --save_every_eval", src)
            if n != 1:
                print(f"[ref_tf_run] save gate not patched (n={n}) — "
                      f"{args.model} saves on its own schedule", flush=True)
        if fname == "train.py" and args.set_max_epochs is not None:
            if "DEFINE_integer('max_epochs'" in src:
                args.train_flags.append(f"--max_epochs={args.set_max_epochs}")
            else:  # BPR/Bi-LSTM module-level constant
                src, n = re.subn(r"^max_epochs = \d+",
                                 f"max_epochs = {args.set_max_epochs}",
                                 src, flags=re.M)
                assert n == 1, "max_epochs constant not found"
        if fname == "train.py" and args.train_seed is not None:
            for pat in ("random.seed(1234)", "np.random.seed(1234)",
                        "tf.set_random_seed(1234)"):
                src = src.replace(pat, pat.replace("1234",
                                                   str(args.train_seed)))
        with open(os.path.join(mdir, fname), "w") as f:
            f.write(src)

    # TF_USE_LEGACY_KERAS: keras-3 removed tf.compat.v1.layers.*; the
    # installed tf_keras wheel restores them
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               TF_CPP_MIN_LOG_LEVEL="3", TF_USE_LEGACY_KERAS="1")
    if not os.path.exists(os.path.join(mdir, "dataset.pkl")):
        print(f"[ref_tf_run] building dataset.pkl in {mdir}", flush=True)
        subprocess.run([sys.executable, "build_dataset.py"],
                       cwd=mdir, check=True, env=env)
    if args.build_only:
        return

    cmd = [sys.executable, "train.py"] + args.train_flags
    print(f"[ref_tf_run] {' '.join(cmd)}  (cwd={mdir})", flush=True)
    r = subprocess.run(cmd, cwd=mdir, env=env)
    sys.exit(r.returncode)


if __name__ == "__main__":
    main()
