"""Export a framework checkpoint AS a reference TF checkpoint (migration,
reverse direction of tools/tf_import.py).

The written file is a plain ``tf.train.Saver`` checkpoint whose variable
names are exactly the reference graph's (per-family maps in tf_import.py),
so the reference's own ``model.restore(sess, path)`` (TLSAN/model.py:309-313)
loads it unchanged — a user can train here (fast) and keep serving or
fine-tuning with the reference's TF stack.  TF is needed only to WRITE the
file; loading the framework checkpoint is template-free msgpack, so no
model code runs and no accelerator is touched.

Usage:
  python -m tlsan_tpu.tools.tf_export --model shan \
      --ckpt save_shan_beauty            # model_dir (best→latest pointer)
      --out runs/export/save_path/shan   # TF checkpoint prefix
"""

from __future__ import annotations

import argparse

import flax.serialization as fser

from tlsan_tpu.tools.tf_import import to_tf_vars, write_tf_checkpoint
from tlsan_tpu.train import checkpoint as ckpt


def _listify(tree):
    """Undo flax's list→{"0": ...} state-dict encoding (template-free load)."""
    if isinstance(tree, dict):
        sub = {k: _listify(v) for k, v in tree.items()}
        if sub and all(k.isdigit() for k in sub):
            idx = sorted(sub, key=int)
            if [int(k) for k in idx] == list(range(len(idx))):
                return [sub[k] for k in idx]
        return sub
    return tree


def load_params_raw(path_or_dir: str):
    """(params tree, step) from a framework .ckpt file or a model_dir
    (best→latest pointer), without needing model/optimizer templates."""
    path = path_or_dir
    if not path.endswith(".ckpt"):
        resolved = ckpt.best_checkpoint(path_or_dir)
        if resolved is None:
            raise SystemExit(f"[tf_export] no checkpoint under {path_or_dir}")
        path = resolved
    with open(path, "rb") as f:
        payload = fser.msgpack_restore(f.read())
    return _listify(payload["params"]), int(payload.get("step", 0))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="export a framework checkpoint as a reference TF "
                    "checkpoint")
    p.add_argument("--model", required=True)
    p.add_argument("--ckpt", required=True,
                   help="framework .ckpt path or model_dir (best→latest)")
    p.add_argument("--out", required=True,
                   help="TF checkpoint prefix to write (e.g. save_path/shan)")
    args = p.parse_args(argv)

    params, step = load_params_raw(args.ckpt)
    tf_vars = to_tf_vars(args.model, params)
    path = write_tf_checkpoint(args.out, tf_vars, step=step)
    print(f"[tf_export] wrote {path} ({len(tf_vars)} variables, step {step})")
    return path


if __name__ == "__main__":
    main()
