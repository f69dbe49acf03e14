"""Execute the REFERENCE's own build_dataset.py and diff it against ours.

The strongest possible dataset-parity check: copies the reference script to
a temp dir (patching only the dataset name and a pandas-2.x
`pd.value_counts` shim), runs it on a shipped category pickle, and compares
every emitted tuple against `tlsan_tpu.data.builders`.

Round-1 result (recorded in RESULTS.md): Home_and_Kitchen — 152,310 train +
11,567 test tuples, ZERO mismatches; Clothing_Shoes_and_Jewelry likewise.

Usage: python scripts/verify_vs_reference_builder.py \
           [--dataset Home_and_Kitchen] [--model tlsan]
"""

import argparse
import os
import pickle
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference"


def run_reference_builder(model_dir: str, dataset: str, workdir: str) -> str:
    src = open(os.path.join(REF, model_dir, "build_dataset.py")).read()
    src = src.replace("Digital_Music", dataset)
    src = src.replace(
        "import pandas as pd",
        "import pandas as pd\n"
        "pd.value_counts = lambda x: pd.Series(x).value_counts()")
    mdir = os.path.join(workdir, model_dir)
    ddir = os.path.join(workdir, "Data")
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(ddir, exist_ok=True)
    with open(os.path.join(mdir, "build_dataset.py"), "w") as f:
        f.write(src)
    dst = os.path.join(ddir, f"{dataset}.pkl")
    if not os.path.exists(dst):
        os.symlink(os.path.join(REF, "Data", f"{dataset}.pkl"), dst)
    subprocess.run([sys.executable, "build_dataset.py"], cwd=mdir, check=True)
    return os.path.join(mdir, "dataset.pkl")


def tuples_equal(a, b) -> bool:
    if type(a) in (int, np.int64, float) or isinstance(a, str):
        return a == b
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(tuples_equal(x, y) for x, y in zip(a, b))
    return np.allclose(a, b)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="Home_and_Kitchen")
    p.add_argument("--model", default="tlsan",
                   choices=["tlsan", "shan", "atrank", "lspm", "bilstm",
                            "paca", "cnn", "csan", "bpr"])
    args = p.parse_args()

    ref_dirs = {"tlsan": "TLSAN", "shan": "SHAN", "atrank": "ATRank",
                "lspm": "LSPM", "bilstm": "Bi-LSTM", "paca": "PACA",
                "cnn": "CNN", "csan": "CSAN", "bpr": "BPR"}
    with tempfile.TemporaryDirectory() as wd:
        pkl = run_reference_builder(ref_dirs[args.model], args.dataset, wd)
        with open(pkl, "rb") as f:
            ref_train = pickle.load(f)
            ref_test = pickle.load(f)

    from tlsan_tpu.data import (
        build_pairwise_examples,
        build_prefix_examples,
        build_session_examples,
        load_category,
    )

    reviews_df, _, cate_list, c = load_category(
        os.path.join(REF, "Data", f"{args.dataset}.pkl"))
    if args.model in ("tlsan", "shan", "paca"):
        train, test = build_session_examples(
            reviews_df, cate_list, c.item_count, args.model)
    elif args.model == "bpr":
        train, test = build_pairwise_examples(reviews_df, c.item_count)
        train, test = train.tolist(), test.tolist()
        ref_train = [list(map(int, t)) for t in np.asarray(ref_train)]
        ref_test = [list(map(int, t)) for t in np.asarray(ref_test)]
    else:
        time_mode = {"atrank": "bucket", "lspm": "none", "bilstm": "none",
                     "cnn": "bucket", "csan": "raw"}[args.model]
        train, test = build_prefix_examples(
            reviews_df, c.item_count, time_mode=time_mode,
            max_length=80 if args.model == "cnn" else 90,
            pack_pos_neg=args.model == "lspm")

    assert len(ref_train) == len(train), (len(ref_train), len(train))
    assert len(ref_test) == len(test), (len(ref_test), len(test))
    bad = sum(not tuples_equal(a, b) for a, b in zip(ref_train, train))
    bad += sum(not tuples_equal(a, b) for a, b in zip(ref_test, test))
    print(f"{args.model}/{args.dataset}: {len(train)} train + {len(test)} "
          f"test tuples, {bad} mismatches")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
