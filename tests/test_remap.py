"""ETL tests: convert + remap semantics on synthetic raw data, and the
round-trip through the reference-compatible pickle format."""

import numpy as np
import pandas as pd
import pytest

from tlsan_tpu.core.config import DataCounts
from tlsan_tpu.data.remap import (
    convert_raw_lines,
    load_category,
    remap_ids,
    save_category,
)


def synthetic_raw(n_users=30, seed=0):
    """Users with controllable interaction/session counts."""
    rng = np.random.default_rng(seed)
    rows = []
    for u in range(n_users):
        n_days = rng.integers(1, 12)          # sessions
        per_day = rng.integers(1, 4)
        base = 1_400_000_000 + int(rng.integers(0, 100)) * 86400
        for d in range(n_days):
            for _ in range(per_day):
                rows.append({
                    "reviewerID": f"U{u:03d}",
                    "asin": f"A{int(rng.integers(0, 40)):03d}",
                    "unixReviewTime": base + d * 86400,
                })
    reviews = pd.DataFrame(rows)
    asins = sorted(reviews["asin"].unique())
    meta = pd.DataFrame({
        "asin": asins,
        "categories": [[["Root", f"Cat{int(rng.integers(0, 5))}"]] for _ in asins],
    })
    return reviews, meta


def test_remap_filters_and_density():
    reviews, meta = synthetic_raw()
    out_reviews, out_meta, cate_list, counts = remap_ids(
        reviews, meta, min_item_interactions=2, min_user_interactions=4,
        min_sessions=2, max_sessions=90)

    # dense id spaces
    assert out_reviews["reviewerID"].max() == counts.user_count - 1
    assert out_reviews["asin"].max() == counts.item_count - 1
    assert set(out_meta["asin"]) == set(range(counts.item_count))
    assert len(cate_list) == counts.item_count
    assert counts.example_count == len(out_reviews)

    # time is in days
    assert out_reviews["unixReviewTime"].max() < 1_400_000_000 // 86400 + 200

    # filters honored: every remaining user has >= min interactions and
    # sessions within bounds
    per_user = out_reviews.groupby("reviewerID")
    assert (per_user.size() >= 4).all()
    nsess = per_user["unixReviewTime"].nunique()
    assert ((nsess >= 2) & (nsess <= 90)).all()

    # sorted by (user, time) — required by the session builders
    assert out_reviews.equals(
        out_reviews.sort_values(["reviewerID", "unixReviewTime"]).reset_index(drop=True))


def test_remap_category_is_last_leaf():
    reviews, meta = synthetic_raw()
    _, out_meta, cate_list, counts = remap_ids(
        reviews, meta, min_item_interactions=1, min_user_interactions=1,
        min_sessions=1)
    assert cate_list.dtype == np.int32
    assert cate_list.max() == counts.cate_count - 1


def test_pickle_roundtrip(tmp_path):
    reviews, meta = synthetic_raw()
    r, m, cl, counts = remap_ids(reviews, meta, 1, 1, 1, 90)
    path = str(tmp_path / "Synth.pkl")
    save_category(path, r, m, cl, counts)
    r2, m2, cl2, counts2 = load_category(path)
    assert counts2 == counts
    np.testing.assert_array_equal(cl, cl2)
    assert r.equals(r2)


def test_convert_raw_lines():
    review_lines = [
        "{'reviewerID': 'U1', 'asin': 'A1', 'unixReviewTime': 1400000000, 'overall': 5.0}",
        "{'reviewerID': 'U2', 'asin': 'A2', 'unixReviewTime': 1400086400, 'overall': 3.0}",
    ]
    meta_lines = [
        "{'asin': 'A1', 'categories': [['Root', 'X']]}",
        "{'asin': 'A2', 'categories': [['Root', 'Y']]}",
        "{'asin': 'A3', 'categories': [['Root', 'Z']]}",  # unreviewed → dropped
    ]
    reviews_df, meta_df = convert_raw_lines(review_lines, meta_lines)
    assert len(reviews_df) == 2
    assert set(meta_df["asin"]) == {"A1", "A2"}


def test_raw_urls_cover_reference_download_script():
    """All 11 categories of utils/0_download_raw.sh resolve to SNAP URLs."""
    from tlsan_tpu.data.remap import CATEGORIES, raw_urls

    assert len(CATEGORIES) == 11
    for c in CATEGORIES:
        rev, meta = raw_urls(c)
        assert rev.endswith(f"reviews_{c}_5.json.gz")
        assert meta.endswith(f"meta_{c}.json.gz")
        assert rev.startswith("http://snap.stanford.edu/")
