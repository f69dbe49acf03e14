"""Restore a tf_export'd checkpoint into the ACTUAL reference graph and
evaluate it with the reference's OWN eval loop (VERDICT r4 #1b).

Run with cwd = a ref_tf_run scratch dir (patched reference 4-file copy +
dataset.pkl, e.g. runs/ref_tf/import_anchors/TLSAN_Digital_Music).  The
restore goes through the reference's own path — `create_model` →
`tf.train.get_checkpoint_state(FLAGS.model_dir)` → `model.restore(sess,
path)` (reference TLSAN/train.py:59-84, TLSAN/model.py:310-313) — and the
AUC through the reference's own `eval_auc` (TLSAN/train.py:86-96; BPR uses
`model.eval_auc(sess, test_set)` whole-set, BPR/train.py:57).

Prints ONE JSON line: {"family", "restored_step", "ref_auc", "n_test"}.

Usage (spawned by scripts/export_anchors.py):
  cd <scratch> && python <repo>/scripts/ref_restore_eval.py \
      --family tlsan --ckpt_dir <dir with exported Saver ckpt>
"""

import argparse
import json
import os
import pickle
import sys
from collections import OrderedDict


def load_pickles(f, n):
    return [pickle.load(f) for _ in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["tlsan", "shan", "bpr", "atrank", "lspm",
                             "paca", "csan", "cnn", "bilstm"])
    ap.add_argument("--ckpt_dir", required=True,
                    help="directory containing the tf_export'd Saver "
                         "checkpoint (+ its `checkpoint` state file)")
    args = ap.parse_args()
    scratch = os.getcwd()
    sys.path.insert(0, scratch)
    ckpt_dir = os.path.abspath(args.ckpt_dir)

    if args.family == "bpr":
        # BPR has no flags/create_model; mirror BPR/train.py:20-35,57
        from tf1shim import tf  # the scratch dir's compat shim
        import model as M
        with open("dataset.pkl", "rb") as f:
            _train, test_set, cate_list, counts = load_pickles(f, 4)
        user_count, item_count, cate_count = counts
        with tf.Session() as sess:
            m = M.Model(user_count, item_count, cate_count, cate_list)
            sess.run(tf.global_variables_initializer())
            sess.run(tf.local_variables_initializer())
            state = tf.train.get_checkpoint_state(ckpt_dir)
            assert state, f"no checkpoint state in {ckpt_dir}"
            m.restore(sess, state.model_checkpoint_path)  # BPR/model.py:124
            auc = float(m.eval_auc(sess, test_set))
        print(json.dumps({"family": "bpr", "restored_step": None,
                          "ref_auc": round(auc, 6),
                          "n_test": int(len(test_set))}))
        return

    if args.family == "bilstm":
        # Bi-LSTM's train.py trains at MODULE level (reference
        # Bi-LSTM/train.py:87-119) so it cannot be imported; replicate its
        # create_model restore path + eval loop (train.py:48-52,64-68)
        # against the scratch dir's model.py / input.py directly.
        from tf1shim import tf  # noqa: F811 — scratch dir's compat shim
        from input import DataInputTest
        import model as M
        with open("dataset.pkl", "rb") as f:
            _train, test_set, cate_list, counts = load_pickles(f, 4)
        user_count, item_count, cate_count = counts
        with tf.Session() as sess:
            m = M.Model(user_count, item_count, cate_count, cate_list)
            state = tf.train.get_checkpoint_state(ckpt_dir)
            assert state, f"no Saver checkpoint state under {ckpt_dir}"
            m.restore(sess, state.model_checkpoint_path)
            sess.run(tf.local_variables_initializer())
            auc_sum = 0.0
            for _, uij in DataInputTest(test_set, 128):
                auc_sum += m.eval_auc(sess, uij) * len(uij[0])
            auc = auc_sum / len(test_set)
            step = int(sess.run(m.global_step))
        print(json.dumps({"family": "bilstm", "restored_step": step,
                          "ref_auc": round(float(auc), 6),
                          "n_test": int(len(test_set))}))
        return

    import train as T  # the scratch dir's patched reference train.py
    T.FLAGS(["ref_restore_eval", f"--model_dir={ckpt_dir}"])
    # Fail loudly if the exported checkpoint is not found: create_model
    # silently falls back to fresh init (reference TLSAN/train.py:77-82),
    # which would "pass" with a random-params AUC ~0.5.
    assert T.tf.train.get_checkpoint_state(ckpt_dir), \
        f"no Saver checkpoint state under {ckpt_dir}"

    with open("dataset.pkl", "rb") as f:
        if args.family in ("tlsan",):
            _train, test_set, counts, item_cate_list = load_pickles(f, 4)
            user_count, item_count, cate_count = counts
        elif args.family in ("atrank", "cnn"):
            _train, test_set, cate_list, counts = load_pickles(f, 4)
            user_count, item_count, cate_count = counts
        else:  # shan, lspm, paca, csan: no category axis in dataset.pkl
            _train, test_set, counts = load_pickles(f, 3)
            user_count, item_count = counts[0], counts[1]

    config = OrderedDict(sorted(T.FLAGS.flag_values_dict().items()))
    config["user_count"] = user_count
    config["item_count"] = item_count
    if args.family in ("tlsan", "atrank", "cnn"):
        config["cate_count"] = cate_count

    tf = T.tf
    with tf.Session() as sess:
        if args.family == "tlsan":
            model = T.create_model(sess, config, item_cate_list)
            auc = T.eval_auc(sess, test_set, model, config)
        elif args.family in ("atrank", "cnn"):
            model = T.create_model(sess, config, cate_list)
            auc = T.eval_auc(sess, test_set, model)
        elif args.family == "lspm":
            model = T.create_model(sess, config)
            auc = T.eval_auc(sess, test_set, model, config)
        else:
            model = T.create_model(sess, config)
            auc = T.eval_auc(sess, test_set, model)
        step = int(sess.run(model.global_step))
    print(json.dumps({"family": args.family, "restored_step": step,
                      "ref_auc": round(float(auc), 6),
                      "n_test": int(len(test_set))}))


if __name__ == "__main__":
    main()
