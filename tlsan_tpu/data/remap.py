"""Raw-data ETL: Amazon review JSON → filtered, densely remapped ID space.

Reimplements (vectorized, no O(n²) scans) the behavior of the reference ETL:
  - line-dict → DataFrame conversion (reference: utils/1_convert_pd.py:8-26)
  - filtering + dense ID remap     (reference: utils/2_remap_id.py:19-101)

Output contract (identical to the reference `Data/<Category>.pkl`):
  pickle stream of three objects:
    (reviews_df[reviewerID, asin, unixReviewTime], meta_df[asin, categories])
    item_cate_list : int32[item_count]    # item id → category id
    (user_count, item_count, cate_count, example_count)
with unixReviewTime already converted to *days*, ids dense in [0, count).
"""

from __future__ import annotations

import ast
import pickle
from typing import Iterable, List, Tuple

import numpy as np
import pandas as pd

from tlsan_tpu.core.config import DataCounts

# Amazon SNAP per-category dump names (reference: utils/0_download_raw.sh:4-47)
CATEGORIES = [
    "Electronics",
    "CDs_and_Vinyl",
    "Clothing_Shoes_and_Jewelry",
    "Digital_Music",
    "Office_Products",
    "Movies_and_TV",
    "Beauty",
    "Home_and_Kitchen",
    "Video_Games",
    "Toys_and_Games",
    # downloaded by the reference script but unused in its experiments
    # (utils/0_download_raw.sh:44-46)
    "Books",
]

SNAP_URL = "http://snap.stanford.edu/data/amazon/productGraph/categoryFiles"


def raw_urls(category: str) -> Tuple[str, str]:
    """(reviews_url, meta_url) for one category (reference: utils/0_download_raw.sh)."""
    return (
        f"{SNAP_URL}/reviews_{category}_5.json.gz",
        f"{SNAP_URL}/meta_{category}.json.gz",
    )


def convert_raw_lines(
    review_lines: Iterable[str], meta_lines: Iterable[str]
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Parse python-dict-per-line dumps into (reviews_df, meta_df).

    The reference `eval()`s each line (utils/1_convert_pd.py:10-13); we use
    ast.literal_eval (safe, same grammar).  Meta is filtered to reviewed asins
    (utils/1_convert_pd.py:19-22).
    """
    reviews = [ast.literal_eval(line) for line in review_lines if line.strip()]
    reviews_df = pd.DataFrame(reviews)
    metas = [ast.literal_eval(line) for line in meta_lines if line.strip()]
    meta_df = pd.DataFrame(metas)
    meta_df = meta_df[meta_df["asin"].isin(reviews_df["asin"].unique())]
    meta_df = meta_df.reset_index(drop=True)
    return reviews_df, meta_df


def remap_ids(
    reviews_df: pd.DataFrame,
    meta_df: pd.DataFrame,
    min_item_interactions: int = 8,
    min_user_interactions: int = 10,
    min_sessions: int = 4,
    max_sessions: int = 90,
) -> Tuple[pd.DataFrame, pd.DataFrame, np.ndarray, DataCounts]:
    """Filter + dense-remap, matching utils/2_remap_id.py semantics.

    - time → days (``//3600//24``, :19)
    - category = last leaf of the nested list (:23)
    - drop items with <8 interactions (:27-31, note the call at :64 overrides
      the 5-default with 8) and users with <10 (:33-37)
    - keep users whose distinct review-day count ("sessions") is in [4, 90]
      (:40-56 — reimplemented with a groupby nunique instead of the
      reference's sleep-per-user progress loop)
    - dense remap via sorted unique keys (:71-80)
    - item_cate_list[item_id] → cate_id (:94-95)
    """
    reviews_df = reviews_df[["reviewerID", "asin", "unixReviewTime"]].copy()
    reviews_df["unixReviewTime"] = reviews_df["unixReviewTime"] // 3600 // 24
    meta_df = meta_df[["asin", "categories"]].copy()
    meta_df["categories"] = meta_df["categories"].map(lambda x: x[-1][-1])

    # item/user frequency filters — order matters (users filtered after items
    # in the reference main flow: utils/2_remap_id.py:63-64 applies users
    # first, then items; we match that order exactly)
    ucounts = reviews_df["reviewerID"].value_counts()
    reviews_df = reviews_df[
        reviews_df["reviewerID"].isin(ucounts[ucounts >= min_user_interactions].index)
    ]
    icounts = reviews_df["asin"].value_counts()
    reviews_df = reviews_df[
        reviews_df["asin"].isin(icounts[icounts >= min_item_interactions].index)
    ]

    # session-count filter: distinct review days per user in [mins, maxs]
    nsess = reviews_df.groupby("reviewerID")["unixReviewTime"].nunique()
    keep = nsess[(nsess >= min_sessions) & (nsess <= max_sessions)].index
    reviews_df = reviews_df[reviews_df["reviewerID"].isin(keep)]

    meta_df = meta_df[meta_df["asin"].isin(reviews_df["asin"].unique())]

    # the asin id space is built from meta (reference: 2_remap_id.py:71-80);
    # a review whose asin has NO meta row would map to NaN and silently
    # poison every downstream id array — drop such rows loudly, BEFORE the
    # id maps are built, so user/item/cate/example counts are all computed
    # on the final row set (a user losing all rows must not leave a hole in
    # the dense user id space: builders rely on len(test_set) == user_count).
    # Cannot happen with the reference-converted dumps, where meta is
    # filtered TO reviewed asins, but raw dumps are not guaranteed complete.
    unmapped = ~reviews_df["asin"].isin(set(meta_df["asin"]))
    if unmapped.any():
        import warnings
        warnings.warn(
            f"dropping {int(unmapped.sum())} review rows whose asin has no "
            f"metadata entry (no category available)")
        reviews_df = reviews_df[~unmapped]
        meta_df = meta_df[meta_df["asin"].isin(reviews_df["asin"].unique())]

    def build_map(df: pd.DataFrame, col: str) -> dict:
        key = sorted(df[col].unique().tolist())
        m = dict(zip(key, range(len(key))))
        df[col] = df[col].map(m)
        return m

    meta_df = meta_df.copy()
    asin_map = build_map(meta_df, "asin")
    cate_map = build_map(meta_df, "categories")
    reviews_df = reviews_df.copy()
    revi_map = build_map(reviews_df, "reviewerID")

    counts = DataCounts(
        user_count=len(revi_map),
        item_count=len(asin_map),
        cate_count=len(cate_map),
        example_count=int(reviews_df.shape[0]),
    )

    meta_df = meta_df.sort_values("asin").reset_index(drop=True)
    reviews_df["asin"] = reviews_df["asin"].map(asin_map)
    reviews_df = reviews_df.sort_values(["reviewerID", "unixReviewTime"]).reset_index(
        drop=True
    )

    item_cate_list = meta_df["categories"].to_numpy(dtype=np.int32)
    return reviews_df, meta_df, item_cate_list, counts


def save_category(
    path: str,
    reviews_df: pd.DataFrame,
    meta_df: pd.DataFrame,
    item_cate_list: np.ndarray,
    counts: DataCounts,
) -> None:
    """Write the reference-compatible 3-object pickle stream."""
    with open(path, "wb") as f:
        pickle.dump((reviews_df, meta_df), f, pickle.HIGHEST_PROTOCOL)
        pickle.dump(item_cate_list, f, pickle.HIGHEST_PROTOCOL)
        pickle.dump(
            (counts.user_count, counts.item_count, counts.cate_count, counts.example_count),
            f,
            pickle.HIGHEST_PROTOCOL,
        )


def load_category(path: str):
    """Load a preprocessed category pickle (reference Data/<Category>.pkl format).

    Returns (reviews_df, meta_df, item_cate_list, DataCounts).
    """
    with open(path, "rb") as f:
        reviews_df, meta_df = pickle.load(f)
        item_cate_list = pickle.load(f)
        user_count, item_count, cate_count, example_count = pickle.load(f)
    return (
        reviews_df,
        meta_df,
        np.asarray(item_cate_list, dtype=np.int32),
        DataCounts(user_count, item_count, cate_count, example_count),
    )
