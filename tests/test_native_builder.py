"""Native (C++) TLSAN builder vs the pure-Python pipeline: every packed
array must be bit-identical (same Python-`random` sequence, same padding)."""

import numpy as np
import pytest

from tlsan_tpu.data import build_session_examples, load_category
from tlsan_tpu.data.batcher import pack_session_test, pack_session_train

native = pytest.importorskip("tlsan_tpu.data.native")


@pytest.fixture(scope="module")
def clothing(reference_data_dir):
    return load_category(f"{reference_data_dir}/Clothing_Shoes_and_Jewelry.pkl")


@pytest.mark.skipif(not native.available(), reason="g++ not available")
def test_native_matches_python_bit_exact(clothing):
    reviews_df, _, cate_list, counts = clothing
    tr_n, te_n, Ts = native.build_tlsan_packed(
        reviews_df, cate_list, counts.item_count)

    train, test = build_session_examples(
        reviews_df, cate_list, counts.item_count, "tlsan")
    tr_p = pack_session_train(train, 10, Ts, "tlsan")
    te_p = pack_session_test(test, 10, Ts, "tlsan")

    assert tr_n.n == tr_p.n and te_n.n == te_p.n == counts.user_count
    for k in tr_p.arrays:
        np.testing.assert_array_equal(tr_p[k], tr_n[k], err_msg=f"train {k}")
    for k in te_p.arrays:
        np.testing.assert_array_equal(te_p[k], te_n[k], err_msg=f"test {k}")


@pytest.mark.skipif(not native.available(), reason="g++ not available")
def test_native_seed_sensitivity(clothing):
    reviews_df, _, cate_list, counts = clothing
    a, _, _ = native.build_tlsan_packed(reviews_df, cate_list,
                                        counts.item_count, seed=1234)
    b, _, _ = native.build_tlsan_packed(reviews_df, cate_list,
                                        counts.item_count, seed=99)
    # negatives and shuffles differ under a different seed
    assert not np.array_equal(a["i"], b["i"])


@pytest.mark.skipif(not native.available(), reason="g++ not available")
@pytest.mark.parametrize("model,time_mode,max_length,pack_pair,align,T_fixed", [
    ("atrank", "bucket", 90, False, "left", None),
    ("cnn", "bucket", 80, False, "left", None),
    ("csan", "raw", 90, False, "left", None),
    ("bilstm", "none", 90, False, "left", None),
    ("lspm", "none", 90, True, "right", 5),
])
def test_native_prefix_matches_python(clothing, model, time_mode, max_length,
                                      pack_pair, align, T_fixed):
    from tlsan_tpu.data import build_prefix_examples
    from tlsan_tpu.data.batcher import pack_prefix_test, pack_prefix_train

    reviews_df, _, cate_list, counts = clothing
    tr_n, te_n, T = native.build_prefix_packed(
        reviews_df, counts.item_count, time_mode=time_mode,
        max_length=max_length, pack_pos_neg=pack_pair, align=align, T=T_fixed)

    train, test = build_prefix_examples(
        reviews_df, counts.item_count, time_mode=time_mode,
        max_length=max_length, pack_pos_neg=pack_pair)
    with_time = time_mode != "none"
    tdt = np.float32 if time_mode == "raw" else np.int32
    tr_p = pack_prefix_train(train, T, with_time=with_time,
                             pack_pos_neg=pack_pair, align=align, time_dtype=tdt)
    te_p = pack_prefix_test(test, T, with_time=with_time, align=align,
                            time_dtype=tdt)

    assert tr_n.n == tr_p.n and te_n.n == te_p.n == counts.user_count
    assert set(tr_n.arrays) == set(tr_p.arrays)
    assert set(te_n.arrays) == set(te_p.arrays)
    for k in tr_p.arrays:
        assert tr_n[k].dtype == tr_p[k].dtype, f"train {k} dtype"
        np.testing.assert_array_equal(tr_p[k], tr_n[k], err_msg=f"train {k}")
    for k in te_p.arrays:
        np.testing.assert_array_equal(te_p[k], te_n[k], err_msg=f"test {k}")


@pytest.mark.skipif(not native.available(), reason="g++ not available")
@pytest.mark.parametrize("variant", ["shan", "paca"])
def test_native_session_basic_matches_python(clothing, variant):
    reviews_df, _, cate_list, counts = clothing
    tr_n, te_n, Ls, Ts = native.build_session_basic_packed(
        reviews_df, cate_list, counts.item_count, variant,
        Ls_cap=90 if variant == "paca" else None)

    train, test = build_session_examples(
        reviews_df, cate_list, counts.item_count, variant)
    tr_p = pack_session_train(train, Ls, Ts, variant)
    te_p = pack_session_test(test, Ls, Ts, variant)

    assert tr_n.n == tr_p.n and te_n.n == te_p.n
    assert set(tr_n.arrays) == set(tr_p.arrays)
    for k in tr_p.arrays:
        np.testing.assert_array_equal(tr_p[k], tr_n[k], err_msg=f"train {k}")
    for k in te_p.arrays:
        np.testing.assert_array_equal(te_p[k], te_n[k], err_msg=f"test {k}")


@pytest.mark.skipif(not native.available(), reason="g++ not available")
def test_native_bpr_matches_python(clothing):
    from tlsan_tpu.data import build_pairwise_examples

    reviews_df, _, _, counts = clothing
    tr_n, te_n = native.build_bpr_packed(reviews_df, counts.item_count)
    tr_p, te_p = build_pairwise_examples(reviews_df, counts.item_count)
    np.testing.assert_array_equal(tr_p, tr_n)
    np.testing.assert_array_equal(te_p, te_n)


@pytest.mark.skipif(not native.available(), reason="g++ not available")
def test_native_session_shapes_match_cli_python_path(clothing):
    """Ls/Ts emitted by the native path must equal what train/cli.py's
    Python fallback would compute (they land in the config sidecar)."""
    reviews_df, _, cate_list, counts = clothing
    # paca: Python pins Ts = _round8(1) = 8 (no short session in the batch)
    _, _, _, Ts = native.build_session_basic_packed(
        reviews_df, cate_list, counts.item_count, "paca", Ls_cap=90)
    assert Ts == 8
    # shan: Ls = round8(max pre), Ts = round8(max new) over train+test
    _, _, Ls_n, Ts_n = native.build_session_basic_packed(
        reviews_df, cate_list, counts.item_count, "shan")
    train, test = build_session_examples(
        reviews_df, cate_list, counts.item_count, "shan")
    r8 = lambda n: max(8, ((n + 7) // 8) * 8)
    Ls_p = r8(max(max(len(t[1]) for t in train), max(len(t[1]) for t in test)))
    Ts_p = r8(max(max(len(t[2]) for t in train), max(len(t[2]) for t in test)))
    assert (Ls_n, Ts_n) == (Ls_p, Ts_p)


@pytest.mark.skipif(not native.available(), reason="g++ not available")
def test_native_duplicate_item_in_final_session():
    """Python removes the FIRST value-equal occurrence of the test target
    from the final session (list.remove); sessions that repeat an item must
    still pack bit-identically.  Also exercises the empty-train edge (users
    with only 2 sessions contribute 0-2 train rows)."""
    import pandas as pd

    rows = []
    # user 0: two sessions; final session [3, 4, 3] repeats item 3
    for item, day in [(1, 1), (2, 1), (3, 5), (4, 5), (3, 5)]:
        rows.append((0, item, day))
    # user 1: minimal two-session user
    for item, day in [(2, 2), (4, 2), (1, 9)]:
        rows.append((1, item, day))
    reviews_df = pd.DataFrame(
        rows, columns=["reviewerID", "asin", "unixReviewTime"])
    cate_list = np.array([0, 1, 0, 1, 0], np.int32)

    for seed in (1234, 7, 99, 123):
        tr_n, te_n, Ts = native.build_tlsan_packed(
            reviews_df, cate_list, 5, Ls=10, seed=seed)
        train, test = build_session_examples(reviews_df, cate_list, 5,
                                             "tlsan", seed=seed)
        tr_p = pack_session_train(train, 10, Ts, "tlsan")
        te_p = pack_session_test(test, 10, Ts, "tlsan")
        assert tr_n.n == tr_p.n and te_n.n == te_p.n
        for k in te_p.arrays:
            np.testing.assert_array_equal(te_p[k], te_n[k],
                                          err_msg=f"seed {seed} test {k}")
        for k in tr_p.arrays:
            np.testing.assert_array_equal(tr_p[k], tr_n[k],
                                          err_msg=f"seed {seed} train {k}")
