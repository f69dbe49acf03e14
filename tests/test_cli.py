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


def test_raw_pipeline_end_to_end_via_file_urls(tmp_path):
    """download → convert → remap → build+pack, fully exercised without
    network egress: the SNAP host is swapped for file:// fixture dumps
    (--base_url), closing the last untested leg of the §2.1 pipeline."""
    import gzip
    import numpy as np

    from tlsan_tpu.core.config import ModelConfig
    from tlsan_tpu.data import cli as dcli
    from tlsan_tpu.train.cli import prepare

    # fixture dumps under the exact SNAP filenames for a real category
    fixtures = tmp_path / "snap"
    fixtures.mkdir()
    rng = np.random.default_rng(0)
    with gzip.open(fixtures / "reviews_Digital_Music_5.json.gz", "wt") as f:
        for u in range(12):
            # 12 interactions over 6 distinct days (sessions of 2)
            items = rng.integers(0, 10, 12)
            for k, i in enumerate(items):
                f.write(repr({"reviewerID": f"u{u:02d}", "asin": f"a{i}",
                              "unixReviewTime": 86400 * (100 * u + k // 2)})
                        + "\n")
    with gzip.open(fixtures / "meta_Digital_Music.json.gz", "wt") as f:
        for i in range(10):
            f.write(repr({"asin": f"a{i}",
                          "categories": [["Root", f"c{i % 3}"]]}) + "\n")

    raw = tmp_path / "raw"
    rc = dcli.main(["download", "--category", "Digital_Music",
                    "--out", str(raw), "--base_url", fixtures.as_uri()])
    assert not rc
    assert (raw / "reviews_Digital_Music_5.json.gz").exists()

    rc = dcli.main(["convert",
                    "--reviews", str(raw / "reviews_Digital_Music_5.json.gz"),
                    "--meta", str(raw / "meta_Digital_Music.json.gz"),
                    "--out", str(raw)])
    assert not rc

    out_pkl = tmp_path / "Data" / "Digital_Music.pkl"
    out_pkl.parent.mkdir()
    rc = dcli.main(["remap", "--reviews", str(raw / "reviews.pkl"),
                    "--meta", str(raw / "meta.pkl"), "--out", str(out_pkl),
                    "--min_item", "2", "--min_user", "4",
                    "--min_sessions", "4"])
    assert not rc

    train_b, test_b, cate_list, cfg = prepare(
        "tlsan", str(out_pkl), ModelConfig(model="tlsan"), use_cache=False)
    assert train_b.n > 0 and test_b.n == cfg.user_count > 0
    assert cfg.item_count == len(cate_list)


def test_auto_steps_per_call():
    from tlsan_tpu.train.cli import auto_steps_per_call
    # small dataset (Clothing: 9888/32 = 309 steps/epoch) -> 100
    assert auto_steps_per_call(9_888, 32, 1000) == 100
    # Electronics scale (365k/32 = 11.4k steps/epoch) -> 500 (K-sweep)
    assert auto_steps_per_call(365_668, 32, 1000) == 500
    # never exceeds eval_freq (eval cadence checks at chunk boundaries)
    assert auto_steps_per_call(365_668, 32, 200) == 200
    assert auto_steps_per_call(10, 32, 1000) == 100
