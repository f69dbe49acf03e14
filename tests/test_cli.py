"""End-to-end CLI surfaces: train → serve round trip, data convert/remap."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory, reference_data_dir):
    """A tiny real training run via the trainer CLI (1 epoch BPR)."""
    from tlsan_tpu.train import cli as tcli

    out = str(tmp_path_factory.mktemp("cli_run"))
    tcli.main([
        "--model", "bpr", "--dataset", "Clothing_Shoes_and_Jewelry",
        "--data_dir", reference_data_dir, "--max_epochs", "1",
        "--eval_freq", "200", "--best_after_step", "0",
        "--model_dir", out, "--compile_cache", "",
    ])
    return out


def test_train_cli_artifacts(trained_dir):
    files = os.listdir(trained_dir)
    assert "latest" in files and "best" in files
    assert "metrics.jsonl" in files
    assert any(f.endswith(".ckpt") for f in files)
    assert any(f.endswith(".json") for f in files)  # config sidecar
    assert os.path.isdir(os.path.join(trained_dir, "train"))  # tfevents
    assert os.path.isdir(os.path.join(trained_dir, "eval"))
    evals = [json.loads(l) for l in open(os.path.join(trained_dir, "metrics.jsonl"))
             if json.loads(l).get("kind") == "eval"]
    assert evals and all(0.0 <= e["auc"] <= 1.0 for e in evals)


def test_serve_cli_from_trained_dir(trained_dir, reference_data_dir, capsys):
    from tlsan_tpu.serve import cli as scli

    scli.main([
        "--model_dir", trained_dir, "--dataset", "Clothing_Shoes_and_Jewelry",
        "--data_dir", reference_data_dir, "--k", "5", "--show", "2",
    ])
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3  # 2 users + 1 throughput record
    for rec in lines[:2]:
        assert len(rec["items"]) == 5
        assert all(0 <= i < 1723 for i in rec["items"])
        assert rec["scores"] == sorted(rec["scores"], reverse=True)
    assert lines[2]["metric"] == "serve_users_per_s" and lines[2]["value"] > 0


def test_data_cli_convert_and_remap(tmp_path):
    from tlsan_tpu.data import cli as dcli

    # synthetic raw dumps: 3 users × enough interactions to pass the filters
    # would be heavy; instead test the convert path + remap's error-free run
    # on data passing relaxed thresholds via the library (CLI convert only)
    reviews = tmp_path / "reviews_X.json"
    meta = tmp_path / "meta_X.json"
    with open(reviews, "w") as f:
        for u in range(3):
            for i in range(4):
                f.write(repr({"reviewerID": f"u{u}", "asin": f"a{i}",
                              "unixReviewTime": 86400 * (10 * u + i)}) + "\n")
    with open(meta, "w") as f:
        for i in range(4):
            f.write(repr({"asin": f"a{i}",
                          "categories": [["Root", f"c{i % 2}"]]}) + "\n")
    rc = dcli.main(["convert", "--reviews", str(reviews), "--meta", str(meta),
                    "--out", str(tmp_path)])
    assert not rc
    import pickle
    with open(tmp_path / "reviews.pkl", "rb") as f:
        rdf = pickle.load(f)
    with open(tmp_path / "meta.pkl", "rb") as f:
        mdf = pickle.load(f)
    assert len(rdf) == 12 and len(mdf) == 4
    assert set(mdf["asin"]) == {"a0", "a1", "a2", "a3"}


def test_serve_cli_out_file(trained_dir, reference_data_dir, tmp_path):
    from tlsan_tpu.serve import cli as scli

    out = tmp_path / "recs.jsonl"
    scli.main([
        "--model_dir", trained_dir, "--dataset", "Clothing_Shoes_and_Jewelry",
        "--data_dir", reference_data_dir, "--k", "3", "--show", "0",
        "--out", str(out),
    ])
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 2010  # one row per test user
    assert all(len(r["items"]) == 3 for r in recs[:20])
