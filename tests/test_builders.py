"""Dataset-builder tests: structural invariants the reference enforces at
runtime (TLSAN/build_dataset.py:78 assert) plus determinism and negative-
sampling correctness, run against the shipped Clothing-Shoes pickle."""

import numpy as np
import pytest

from tlsan_tpu.data import (
    build_pairwise_examples,
    build_prefix_examples,
    build_session_examples,
    load_category,
)
from tlsan_tpu.data.builders import bucket_time, reciprocal_time


@pytest.fixture(scope="module")
def clothing(reference_data_dir):
    return load_category(f"{reference_data_dir}/Clothing_Shoes_and_Jewelry.pkl")


def test_session_tlsan_invariants(clothing):
    reviews_df, _, cate_list, counts = clothing
    train, test = build_session_examples(
        reviews_df, cate_list, counts.item_count, variant="tlsan")
    # one test example per user (reference: TLSAN/build_dataset.py:78)
    assert len(test) == counts.user_count
    # tuple structure
    uid, pre, new, emb, item, label, now_cate = train[0]
    assert isinstance(pre, list) and isinstance(new, list)
    assert len(emb) == len(pre)
    assert label in (0, 1)
    assert 0 <= now_cate < counts.cate_count
    # pos/neg pairs alternate labels before the shuffle; after the shuffle
    # exactly half the examples are positive
    labels = np.array([t[5] for t in train])
    assert labels.sum() * 2 == len(labels)
    # time embeddings are reciprocal buckets in (0, 1]
    for t in train[:50]:
        for w in t[3]:
            assert 0 < w <= 1.0


def test_session_negative_sampling_rejects_positives(clothing):
    reviews_df, _, cate_list, counts = clothing
    train, test = build_session_examples(
        reviews_df, cate_list, counts.item_count, variant="tlsan")
    pos_by_user = {
        uid: set(g["asin"].tolist()) for uid, g in reviews_df.groupby("reviewerID")}
    for t in train[:500]:
        if t[5] == 0:
            assert t[4] not in pos_by_user[t[0]]


def test_session_determinism(clothing):
    reviews_df, _, cate_list, counts = clothing
    a = build_session_examples(reviews_df, cate_list, counts.item_count, variant="tlsan")
    b = build_session_examples(reviews_df, cate_list, counts.item_count, variant="tlsan")
    assert a[0][:5] == b[0][:5] and a[1][:5] == b[1][:5]


def test_session_variants_share_structure(clothing):
    """SHAN/PACA walk the identical session split and random sequence, so
    their test sets pair the same (pos, neg) items as TLSAN's."""
    reviews_df, _, cate_list, counts = clothing
    _, t_tlsan = build_session_examples(reviews_df, cate_list, counts.item_count, "tlsan")
    _, t_shan = build_session_examples(reviews_df, cate_list, counts.item_count, "shan")
    _, t_paca = build_session_examples(reviews_df, cate_list, counts.item_count, "paca")
    assert sorted(t[4] for t in t_tlsan) == sorted(t[3] for t in t_shan)
    assert sorted(t[4] for t in t_tlsan) == sorted(t[1] for t in t_paca)


def test_prefix_invariants(clothing):
    reviews_df, _, _, counts = clothing
    train, test = build_prefix_examples(
        reviews_df, counts.item_count, time_mode="bucket")
    assert len(test) == counts.user_count
    uid, hist, ht, item, label = train[0]
    assert len(hist) == len(ht)
    assert all(0 <= b <= 12 for b in ht)  # 12 gap boundaries
    # histories are strict prefixes: monotone growth per user not required
    # after shuffle, but each history is non-empty and < 90
    assert 1 <= len(hist) < 90


def test_prefix_lspm_packs_pairs(clothing):
    reviews_df, _, _, counts = clothing
    train, test = build_prefix_examples(
        reviews_df, counts.item_count, time_mode="none", pack_pos_neg=True)
    uid, hist, pair = train[0]
    assert len(pair) == 2


def test_pairwise_bpr(clothing):
    reviews_df, _, _, counts = clothing
    train, test = build_pairwise_examples(reviews_df, counts.item_count)
    assert test.shape == (counts.user_count, 3)
    # every interaction becomes exactly one triple
    assert len(train) + len(test) == counts.example_count
    assert train.dtype == np.int32


def test_time_featurization():
    # delta = cur - t + 1; buckets count gaps <= delta
    assert bucket_time([0], 10) == [int(np.sum(11 >= np.array(
        [2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096])))]
    assert bucket_time([0], 10) == [3]  # 11 >= {2,4,8}
    assert reciprocal_time([0], 10) == [1.0 / 3]
