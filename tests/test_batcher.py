"""Static-shape packing tests against hand-written padding loops that mirror
the reference input iterators (TLSAN/input.py:35-52, LSPM/input.py:30-37)."""

import numpy as np

from tlsan_tpu.data.batcher import (
    Batches,
    _scatter_pad,
    epoch_permutation,
    pack_session_train,
    pad_to_multiple,
)


def _reference_pad_last_k(seqs, k, dtype=np.int32):
    """The TLSAN iterator's loop, verbatim semantics (TLSAN/input.py:40-49)."""
    out = np.zeros((len(seqs), k), dtype)
    for row, s in enumerate(seqs):
        length = len(s)
        if length > k:
            for l in range(k):
                out[row][l] = s[length - k + l]
        else:
            for l in range(length):
                out[row][l] = s[l]
    return out


def test_scatter_pad_matches_reference_loop():
    rng = np.random.default_rng(0)
    seqs = [list(rng.integers(1, 100, size=n)) for n in [3, 10, 17, 1, 9, 25]]
    k = 10
    got = _scatter_pad(seqs, k, np.int32)  # default: window="last", left-align
    want = _reference_pad_last_k(seqs, k)
    np.testing.assert_array_equal(got, want)


def test_scatter_pad_right_align():
    """LSPM right-aligns the last-k window (LSPM/input.py:30-37)."""
    seqs = [[1, 2, 3], [4, 5, 6, 7, 8, 9]]
    got = _scatter_pad(seqs, 5, np.int32, align="right")
    np.testing.assert_array_equal(got, [[0, 0, 1, 2, 3], [5, 6, 7, 8, 9]])


def test_scatter_pad_window_first():
    seqs = [[1, 2, 3, 4, 5]]
    got = _scatter_pad(seqs, 3, np.int32, window="first")
    np.testing.assert_array_equal(got, [[1, 2, 3]])


def test_scatter_pad_empty():
    got = _scatter_pad([[], [1]], 4, np.int32)
    np.testing.assert_array_equal(got, [[0, 0, 0, 0], [1, 0, 0, 0]])


def test_pack_session_train_tlsan():
    train = [
        (7, [1, 2, 3], [4, 5], [0.5, 0.25, 1.0], 9, 1, 3),
        (8, list(range(1, 15)), [6], [0.1] * 14, 10, 0, 4),
    ]
    b = pack_session_train(train, Ls=10, Ts=4, variant="tlsan")
    assert b["hist_i"].shape == (2, 10)
    assert b["hist_i_new"].shape == (2, 4)
    np.testing.assert_array_equal(b["sl"], [3, 10])
    np.testing.assert_array_equal(b["sl_new"], [2, 1])
    # second row: last-10 window of 1..14 → 5..14
    np.testing.assert_array_equal(b["hist_i"][1], np.arange(5, 15))
    np.testing.assert_array_equal(b["u"], [7, 8])
    np.testing.assert_array_equal(b["y"], [1.0, 0.0])
    np.testing.assert_array_equal(b["c"], [3, 4])


def test_pad_to_multiple():
    b = Batches({"x": np.arange(10, dtype=np.int32)}, 10)
    p = pad_to_multiple(b, 4)
    assert p.n == 12
    assert p["valid"].sum() == 10
    np.testing.assert_array_equal(p["x"][10:], [0, 0])


def test_epoch_permutation_deterministic():
    a = epoch_permutation(100, 3)
    b = epoch_permutation(100, 3)
    c = epoch_permutation(100, 4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert sorted(a) == list(range(100))
