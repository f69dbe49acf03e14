"""Online featurization (serve/featurize.py) golden parity: featurizing a
user's raw (item, day) events must reproduce the OFFLINE-built test batch
row bit-for-bit, for the session scheme (TLSAN), the prefix scheme with
time buckets (ATRank), and the right-aligned fixed window (LSPM)."""

import numpy as np
import pytest

from tlsan_tpu.core.config import ModelConfig
from tlsan_tpu.data import load_category
from tlsan_tpu.data.builders import build_prefix_examples, build_session_examples
from tlsan_tpu.data.batcher import pack_prefix_test, pack_session_test, round8
from tlsan_tpu.serve.featurize import featurize, featurize_many

DATA = "/root/reference/Data/Clothing_Shoes_and_Jewelry.pkl"


@pytest.fixture(scope="module")
def category():
    reviews_df, meta_df, cate_list, counts = load_category(DATA)
    events_by_user = {
        int(uid): list(zip(h["asin"].tolist(), h["unixReviewTime"].tolist()))
        for uid, h in reviews_df.groupby("reviewerID")
    }
    return reviews_df, cate_list, counts, events_by_user


def test_tlsan_featurize_matches_offline_test_row(category):
    reviews_df, cate_list, counts, events_by_user = category
    _, test_set = build_session_examples(
        reviews_df, cate_list, counts.item_count, variant="tlsan")
    Ls = 10
    Ts = round8(max(len(t[2]) for t in test_set))
    cfg = ModelConfig(model="tlsan", Ls=Ls, Ts=Ts)

    def builder_final_session(events, max_length=90):
        """Replay the offline session walk (build_session_examples) to find
        the session the builder treats as final — NOT necessarily the
        calendar-last day (max_length truncation ends the walk early)."""
        tim = [d for _, d in events]
        valid = min(len(tim), max_length)
        days = sorted(set(tim))
        i = 0
        for t in days:
            count = tim.count(t)
            if t != days[0] and i + count >= valid - 1:
                return t, i, count
            i += count
        raise AssertionError("no final session found")

    checked = 0
    for tup in test_set[:50]:
        uid, pre, new, emb, (pos, neg), now_cate = tup
        all_events = list(events_by_user[uid])
        final_day, start, count = builder_final_session(all_events)
        events = all_events[: start + count]  # builder never sees later days
        if pos not in new:
            # the offline builder removed the chosen target from the final
            # session (count > 1 case) — drop that one event instance
            k = next(i for i, (it, d) in enumerate(events)
                     if it == pos and d == final_day)
            events = events[:k] + events[k + 1:]
        got = featurize("tlsan", cfg, events, user_id=uid,
                        now=final_day, cate_list=cate_list)
        want = pack_session_test([tup], Ls, Ts, "tlsan")
        for key in ("u", "c", "hist_i", "hist_t", "hist_i_new", "sl",
                    "sl_new"):
            np.testing.assert_array_equal(
                got[key][0], want.arrays[key][0],
                err_msg=f"uid={uid} key={key}")
        checked += 1
    assert checked == 50


def test_atrank_featurize_matches_offline_test_row(category):
    reviews_df, cate_list, counts, events_by_user = category
    _, test_set = build_prefix_examples(
        reviews_df, counts.item_count, time_mode="bucket", max_length=90)
    T = round8(max(len(t[1]) for t in test_set))
    cfg = ModelConfig(model="atrank", max_length=T)

    for tup in test_set[:50]:
        uid, hist_i, hist_t, (pos, neg) = tup
        events = events_by_user[uid][: len(hist_i)]
        target_time = events_by_user[uid][len(hist_i)][1]
        got = featurize("atrank", cfg, events, user_id=uid, now=target_time)
        want = pack_prefix_test([tup], T, with_time=True)
        for key in ("u", "hist_i", "hist_t", "sl"):
            np.testing.assert_array_equal(
                got[key][0], want.arrays[key][0],
                err_msg=f"uid={uid} key={key}")
        # serving conditions the query tower on the latest history item
        assert int(got["i"][0]) == hist_i[-1]


def test_lspm_featurize_right_aligned_window(category):
    reviews_df, cate_list, counts, events_by_user = category
    cfg = ModelConfig(model="lspm", lspm_k=5)
    uid = next(iter(events_by_user))
    events = events_by_user[uid]
    got = featurize("lspm", cfg, events, user_id=uid)
    want = np.zeros(5, np.int32)
    win = [i for i, _ in events][-5:]
    want[5 - len(win):] = win
    np.testing.assert_array_equal(got["hist_i"][0], want)
    assert int(got["sl"][0]) == min(len(win), 5)


@pytest.mark.parametrize("model_name", ["tlsan", "atrank", "shan", "csan",
                                        "lspm", "paca", "cnn", "bilstm",
                                        "bpr"])
def test_featurize_all_families_shapes(model_name):
    """Every family featurizes a raw request into its iterator layout."""
    cfg = ModelConfig(model=model_name, Ls=10, Ts=8, max_length=16,
                      lspm_k=5)
    cate_list = np.arange(50, dtype=np.int32) % 5
    events = [(3, 10), (7, 10), (11, 12), (4, 15), (9, 15)]
    b = featurize(model_name, cfg, events, user_id=2, cate_list=cate_list)
    assert all(v.shape[0] == 1 for v in b.values())
    if model_name == "bpr":
        assert set(b) == {"u"}
        return
    assert "hist_i" in b and "sl" in b
    if model_name in ("tlsan", "shan"):
        assert int(b["sl_new"][0]) == 2      # two items on the last day
        assert int(b["sl"][0]) == 3          # three before it
    if model_name in ("atrank", "csan"):
        assert int(b["i"][0]) == 9           # query = latest item
    if model_name == "tlsan":
        assert b["hist_t"].shape == (1, 10)
        assert 0.0 < b["hist_t"][0, 0] <= 1.0   # reciprocal buckets


def test_featurize_many_batches_rows(category):
    _, cate_list, _, events_by_user = category
    cfg = ModelConfig(model="tlsan", Ls=10, Ts=16)
    uids = list(events_by_user)[:4]
    reqs = [{"user": u, "events": events_by_user[u]} for u in uids]
    batch = featurize_many("tlsan", cfg, reqs, cate_list=cate_list)
    assert batch["u"].shape == (4,) and batch["hist_i"].shape == (4, 10)
    for r, u in enumerate(uids):
        single = featurize("tlsan", cfg, events_by_user[u], user_id=u,
                           cate_list=cate_list)
        np.testing.assert_array_equal(batch["hist_i"][r], single["hist_i"][0])


def test_tlsan_single_day_history_is_finite():
    """Single-session fallback: all events on one day must yield finite
    hist_t (same-day deltas clamp to the max-recency weight 1.0, not inf —
    offline, cur_t is always a later session so this only arises online)."""
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    cate_list = np.zeros(30, np.int32)
    row = featurize("tlsan", cfg, [(3, 100), (7, 100), (11, 100)],
                    user_id=5, cate_list=cate_list)
    assert np.isfinite(row["hist_t"]).all()
    # the clamped same-day events carry the max-recency weight 1.0
    assert row["hist_t"].max() == 1.0


def test_featurize_many_empty_requests_raises():
    cfg = ModelConfig(model="tlsan", user_count=20, item_count=30,
                      cate_count=5, Ls=10, Ts=8)
    with pytest.raises(ValueError, match="empty requests"):
        featurize_many("tlsan", cfg, [], cate_list=np.zeros(30, np.int32))
