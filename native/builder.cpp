// Native data-loader: TLSAN session-grouped example builder + packer.
//
// Reimplements tlsan_tpu/data/builders.py::build_session_examples("tlsan")
// (which mirrors the reference TLSAN/build_dataset.py:23-73) at C++ speed,
// reproducing Python's random.Random(1234) call sequence BIT-EXACTLY via
// pyrandom.h — same rejection-sampled negatives, same random.choice test
// targets, same final shuffles — and fuses the packing stage
// (data/batcher.py::pack_session_train/_test: fixed last-Ls long window,
// left-aligned short session).  Output arrays are written straight into
// caller-provided numpy buffers (ctypes, no pybind11).
//
// Key memory trick: a pre_session at example time is always a PREFIX of the
// user's pos_list, so an example is 10 scalars, not a copied list.
//
// Exact-parity contract is enforced by tests/test_native_builder.py, which
// compares every packed array against the pure-Python pipeline.

#include <array>
#include <cstdint>
#include <cstring>
#include <vector>

#include "pyrandom.h"

namespace {

constexpr int64_t kGaps[12] = {2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096};

inline float reciprocal_bucket(int64_t t, int64_t cur_t) {
  // 1 / sum((cur - t + 1) >= gaps)  (TLSAN/build_dataset.py:16-21)
  int64_t delta = cur_t - t + 1;
  int k = 0;
  for (int g = 0; g < 12; ++g) k += (delta >= kGaps[g]);
  return static_cast<float>(1.0 / static_cast<double>(k));
}

struct Example {
  int64_t user_start;   // row index of the user's first interaction
  int32_t uid;
  int32_t pre_len;      // pre_session = pos_list[0:pre_len]
  int32_t new_start;    // new_session = pos_list[new_start : new_start+new_count]
  int32_t new_count;
  int32_t removed;      // index within new_session removed for test, or -1
  int64_t cur_t;        // reference day for the reciprocal time embedding
  int32_t target;       // item id (train) / positive item (test)
  int32_t neg;          // negative item (test only; train uses target+label)
  float label;          // train only
  int32_t now_cate;     // user-dominant category at example time
};

struct Handle {
  const int32_t* asins;
  const int64_t* times;
  std::vector<Example> train, test;
  int64_t ts_max = 1;
};

// most frequent value, ties by first appearance (Counter.most_common order)
struct CateCounter {
  std::vector<std::pair<int32_t, int32_t>> order;  // (cate, count) first-seen
  std::vector<int32_t> slot;                       // cate -> index+1 (0 = none)
  explicit CateCounter(int64_t cate_capacity) : slot(cate_capacity + 1, 0) {}
  void add(int32_t c) {
    if (slot[c] == 0) {
      order.emplace_back(c, 1);
      slot[c] = static_cast<int32_t>(order.size());
    } else {
      order[slot[c] - 1].second++;
    }
  }
  int32_t top() const {
    int32_t best_c = 0, best_n = -1;
    for (const auto& p : order)
      if (p.second > best_n) { best_n = p.second; best_c = p.first; }
    return best_c;
  }
  void reset() {
    for (const auto& p : order) slot[p.first] = 0;
    order.clear();
  }
};

}  // namespace

extern "C" {

void* tlsan_build(const int32_t* uids, const int32_t* asins,
                  const int64_t* times, int64_t n_rows,
                  const int32_t* item_cate, int64_t item_count,
                  int64_t cate_count, int64_t max_length, uint64_t seed) {
  auto* h = new Handle{asins, times, {}, {}, 1};
  PyRandom rng(seed);
  std::vector<uint8_t> in_pos(item_count, 0);
  CateCounter cates(cate_count);
  std::vector<int32_t> negs;

  int64_t row = 0;
  while (row < n_rows) {
    const int32_t uid = uids[row];
    int64_t start = row;
    while (row < n_rows && uids[row] == uid) ++row;
    const int64_t len = row - start;

    // neg_list: rejection sampling, one per position (identical sequence to
    // `while neg in pos_list: neg = random.randint(...)`)
    for (int64_t k = 0; k < len; ++k) in_pos[asins[start + k]] = 1;
    negs.clear();
    for (int64_t k = 0; k < len; ++k) {
      int64_t neg = asins[start];  // first candidate always rejects
      while (in_pos[neg]) neg = rng.randint(0, item_count - 1);
      negs.push_back(static_cast<int32_t>(neg));
    }

    const int64_t valid_length = len < max_length ? len : max_length;
    cates.reset();
    int64_t i = 0;
    bool first_session = true;
    while (i < len) {
      // session = run of identical review days
      int64_t count = 1;
      while (i + count < len && times[start + i + count] == times[start + i])
        ++count;

      if (first_session) {
        for (int64_t k = 0; k < count; ++k)
          cates.add(item_cate[asins[start + i + k]]);
        first_session = false;
      } else if (i + count < valid_length - 1) {
        Example e{};
        e.user_start = start;
        e.uid = uid;
        e.pre_len = static_cast<int32_t>(i);
        e.new_start = static_cast<int32_t>(i);
        e.new_count = static_cast<int32_t>(count);
        e.removed = -1;
        e.cur_t = times[start + i];
        e.now_cate = cates.top();
        e.label = 1.0f;
        e.target = asins[start + i + count];
        h->train.push_back(e);
        e.label = 0.0f;
        e.target = negs[i + count];
        h->train.push_back(e);
        if (count > h->ts_max) h->ts_max = count;
        for (int64_t k = 0; k < count; ++k)
          cates.add(item_cate[asins[start + i + k]]);
      } else {
        // final session → test (TLSAN/build_dataset.py:64-71)
        int64_t pos_off = 0;  // offset of the positive within the session
        if (count > 1) pos_off = rng.choice_index(count);
        const int32_t pos_item = asins[start + i + pos_off];
        // Python removes the FIRST value-equal occurrence from the session
        // (list.remove, builders.py), not the randomly chosen index — they
        // differ when a session repeats an item
        int64_t rem_off = 0;
        while (asins[start + i + rem_off] != pos_item) ++rem_off;
        pos_off = rem_off;
        // neg index = FIRST occurrence of pos_item in pos_list
        int64_t neg_index = 0;
        while (asins[start + neg_index] != pos_item) ++neg_index;
        Example e{};
        e.user_start = start;
        e.uid = uid;
        e.pre_len = static_cast<int32_t>(i);
        e.new_start = static_cast<int32_t>(i);
        e.new_count = static_cast<int32_t>(count - (count > 1 ? 1 : 0));
        e.removed = count > 1 ? static_cast<int32_t>(pos_off) : -1;
        e.cur_t = times[start + i];
        e.now_cate = cates.top();
        e.target = pos_item;
        e.neg = negs[neg_index];
        h->test.push_back(e);
        if (e.new_count > h->ts_max) h->ts_max = e.new_count;
        break;
      }
      i += count;
    }
    for (int64_t k = 0; k < len; ++k) in_pos[asins[start + k]] = 0;
  }

  rng.shuffle(h->train);
  rng.shuffle(h->test);
  return h;
}

void tlsan_counts(void* hp, int64_t* train_n, int64_t* test_n, int64_t* ts_max) {
  auto* h = static_cast<Handle*>(hp);
  *train_n = static_cast<int64_t>(h->train.size());
  *test_n = static_cast<int64_t>(h->test.size());
  *ts_max = h->ts_max;
}

static void pack_common(const Handle* h, const Example& e, int64_t Ls,
                        int64_t Ts, int64_t r, int32_t* hist_i, float* hist_t,
                        int32_t* hist_i_new, int32_t* sl, int32_t* sl_new) {
  const int64_t s = e.user_start;
  // long window: LAST Ls of the prefix, left-aligned when shorter
  const int64_t L = e.pre_len;
  const int64_t w = L > Ls ? Ls : L;
  const int64_t off = L > Ls ? L - Ls : 0;
  for (int64_t k = 0; k < w; ++k) {
    hist_i[r * Ls + k] = h->asins[s + off + k];
    hist_t[r * Ls + k] = reciprocal_bucket(h->times[s + off + k], e.cur_t);
  }
  for (int64_t k = w; k < Ls; ++k) {
    hist_i[r * Ls + k] = 0;
    hist_t[r * Ls + k] = 0.0f;
  }
  // short session, left-aligned, test target removed in place; bound by Ts
  // (a caller-pinned Ts < session length truncates like the Python packer's
  // window="first"; sl_new stays the unclamped count, also like Python)
  int64_t out = 0;
  for (int64_t k = 0; k < e.new_count + (e.removed >= 0 ? 1 : 0)
                      && out < Ts; ++k) {
    if (k == e.removed) continue;
    hist_i_new[r * Ts + out++] = h->asins[s + e.new_start + k];
  }
  for (; out < Ts; ++out) hist_i_new[r * Ts + out] = 0;
  sl[r] = static_cast<int32_t>(w);
  sl_new[r] = e.new_count;
}

void tlsan_pack_train(void* hp, int64_t Ls, int64_t Ts, int32_t* u,
                      int32_t* i, float* y, int32_t* c, int32_t* hist_i,
                      float* hist_t, int32_t* hist_i_new, int32_t* sl,
                      int32_t* sl_new) {
  auto* h = static_cast<Handle*>(hp);
  for (size_t r = 0; r < h->train.size(); ++r) {
    const Example& e = h->train[r];
    u[r] = e.uid;
    i[r] = e.target;
    y[r] = e.label;
    c[r] = e.now_cate;
    pack_common(h, e, Ls, Ts, static_cast<int64_t>(r), hist_i, hist_t,
                hist_i_new, sl, sl_new);
  }
}

void tlsan_pack_test(void* hp, int64_t Ls, int64_t Ts, int32_t* u, int32_t* i,
                     int32_t* j, int32_t* c, int32_t* hist_i, float* hist_t,
                     int32_t* hist_i_new, int32_t* sl, int32_t* sl_new) {
  auto* h = static_cast<Handle*>(hp);
  for (size_t r = 0; r < h->test.size(); ++r) {
    const Example& e = h->test[r];
    u[r] = e.uid;
    i[r] = e.target;
    j[r] = e.neg;
    c[r] = e.now_cate;
    pack_common(h, e, Ls, Ts, static_cast<int64_t>(r), hist_i, hist_t,
                hist_i_new, sl, sl_new);
  }
}

void tlsan_free(void* hp) { delete static_cast<Handle*>(hp); }

// ------------------------------------------------------------------------
// SHAN / PACA: same session walk and RNG sequence as TLSAN (verified by the
// Python builder — builders.py::build_session_examples branches only on the
// emitted tuple format), packed without time embeddings; PACA also drops the
// uid (PACA/build_dataset.py:43-44).
// ------------------------------------------------------------------------

void tlsan_max_pre(void* hp, int64_t* max_pre) {
  auto* h = static_cast<Handle*>(hp);
  int64_t m = 1;
  for (const auto& e : h->train) m = e.pre_len > m ? e.pre_len : m;
  for (const auto& e : h->test) m = e.pre_len > m ? e.pre_len : m;
  *max_pre = m;
}

static void pack_basic_common(const Handle* h, const Example& e, int64_t Ls,
                              int64_t Ts, int64_t r, int32_t* hist_i,
                              int32_t* hist_i_new, int32_t* sl,
                              int32_t* sl_new) {
  const int64_t s = e.user_start;
  const int64_t L = e.pre_len;
  const int64_t w = L > Ls ? Ls : L;          // window = last Ls
  const int64_t off = L > Ls ? L - Ls : 0;
  for (int64_t k = 0; k < w; ++k) hist_i[r * Ls + k] = h->asins[s + off + k];
  for (int64_t k = w; k < Ls; ++k) hist_i[r * Ls + k] = 0;
  sl[r] = static_cast<int32_t>(w);
  if (hist_i_new) {
    int64_t out = 0;
    for (int64_t k = 0; k < e.new_count + (e.removed >= 0 ? 1 : 0)
                        && out < Ts; ++k) {
      if (k == e.removed) continue;
      hist_i_new[r * Ts + out++] = h->asins[s + e.new_start + k];
    }
    for (; out < Ts; ++out) hist_i_new[r * Ts + out] = 0;
    sl_new[r] = e.new_count;
  }
}

// u/hist_i_new/sl_new are nullptr for PACA.
void session_pack_basic_train(void* hp, int64_t Ls, int64_t Ts, int32_t* u,
                              int32_t* i, float* y, int32_t* hist_i,
                              int32_t* hist_i_new, int32_t* sl,
                              int32_t* sl_new) {
  auto* h = static_cast<Handle*>(hp);
  for (size_t r = 0; r < h->train.size(); ++r) {
    const Example& e = h->train[r];
    if (u) u[r] = e.uid;
    i[r] = e.target;
    y[r] = e.label;
    pack_basic_common(h, e, Ls, Ts, static_cast<int64_t>(r), hist_i,
                      hist_i_new, sl, sl_new);
  }
}

void session_pack_basic_test(void* hp, int64_t Ls, int64_t Ts, int32_t* u,
                             int32_t* i, int32_t* j, int32_t* hist_i,
                             int32_t* hist_i_new, int32_t* sl,
                             int32_t* sl_new) {
  auto* h = static_cast<Handle*>(hp);
  for (size_t r = 0; r < h->test.size(); ++r) {
    const Example& e = h->test[r];
    if (u) u[r] = e.uid;
    i[r] = e.target;
    j[r] = e.neg;
    pack_basic_common(h, e, Ls, Ts, static_cast<int64_t>(r), hist_i,
                      hist_i_new, sl, sl_new);
  }
}

// ------------------------------------------------------------------------
// BPR pairwise scheme (BPR/build_dataset.py:12-35): every interaction is a
// (uid, pos, neg) triple; the last per user is the test triple.
// ------------------------------------------------------------------------

void bpr_build(const int32_t* uids, const int32_t* asins, int64_t n_rows,
               int64_t item_count, uint64_t seed, int64_t* train_n,
               int64_t* test_n, int32_t* train_out /* [n_rows*3] cap */,
               int32_t* test_out /* [n_users*3] cap */) {
  PyRandom rng(seed);
  std::vector<uint8_t> in_pos(item_count, 0);
  std::vector<std::array<int32_t, 3>> train, test;
  train.reserve(n_rows);

  int64_t row = 0;
  while (row < n_rows) {
    const int32_t uid = uids[row];
    int64_t start = row;
    while (row < n_rows && uids[row] == uid) ++row;
    const int64_t len = row - start;
    for (int64_t k = 0; k < len; ++k) in_pos[asins[start + k]] = 1;
    for (int64_t k = 0; k < len; ++k) {
      int64_t neg = asins[start];
      while (in_pos[neg]) neg = rng.randint(0, item_count - 1);
      auto& dst = (k == len - 1) ? test : train;
      dst.push_back({uid, asins[start + k], static_cast<int32_t>(neg)});
    }
    for (int64_t k = 0; k < len; ++k) in_pos[asins[start + k]] = 0;
  }
  rng.shuffle(train);
  rng.shuffle(test);
  *train_n = static_cast<int64_t>(train.size());
  *test_n = static_cast<int64_t>(test.size());
  std::memcpy(train_out, train.data(), train.size() * 3 * sizeof(int32_t));
  std::memcpy(test_out, test.data(), test.size() * 3 * sizeof(int32_t));
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Prefix sliding-window scheme (ATRank/CNN/CSAN/Bi-LSTM/LSPM)
//
// Mirrors tlsan_tpu/data/builders.py::build_prefix_examples (reference:
// ATRank/build_dataset.py:32-41 and clones) + batcher.pack_prefix_train/_test
// with the same bit-exact PyRandom call sequence.  An example is (user_start,
// prefix_len) — prefixes are never copied.
// ---------------------------------------------------------------------------

namespace {

struct PrefixExample {
  int64_t user_start;
  int32_t uid;
  int32_t plen;     // history = pos_list[0:plen]
  int64_t cur_t;    // time of the target position (time features)
  int32_t a;        // item (train) / pos (test & packed-pair)
  int32_t b;        // neg (test & packed-pair); unused otherwise
  float label;      // train label (non-packed mode)
};

struct PrefixHandle {
  const int32_t* asins;
  const int64_t* times;
  std::vector<PrefixExample> train, test;
  int64_t max_hist = 1;
};

inline int32_t bucket_index(int64_t t, int64_t cur_t) {
  // sum((cur - t + 1) >= gaps), integer 0..12 (ATRank/build_dataset.py:15-18)
  int64_t delta = cur_t - t + 1;
  int32_t k = 0;
  for (int g = 0; g < 12; ++g) k += (delta >= kGaps[g]);
  return k;
}

}  // namespace

extern "C" {

// time_mode: 0 = none (Bi-LSTM/LSPM), 1 = bucket (ATRank/CNN), 2 = raw (CSAN)
void* prefix_build(const int32_t* uids, const int32_t* asins,
                   const int64_t* times, int64_t n_rows, int64_t item_count,
                   int64_t max_length, int32_t pack_pos_neg, uint64_t seed) {
  auto* h = new PrefixHandle{asins, times, {}, {}, 1};
  PyRandom rng(seed);
  std::vector<uint8_t> in_pos(item_count, 0);
  std::vector<int32_t> negs;

  int64_t row = 0;
  while (row < n_rows) {
    const int32_t uid = uids[row];
    int64_t start = row;
    while (row < n_rows && uids[row] == uid) ++row;
    const int64_t len = row - start;

    for (int64_t k = 0; k < len; ++k) in_pos[asins[start + k]] = 1;
    negs.clear();
    for (int64_t k = 0; k < len; ++k) {
      int64_t neg = asins[start];
      while (in_pos[neg]) neg = rng.randint(0, item_count - 1);
      negs.push_back(static_cast<int32_t>(neg));
    }

    const int64_t valid_length = len < max_length ? len : max_length;
    for (int64_t i = 1; i < valid_length; ++i) {
      PrefixExample e{};
      e.user_start = start;
      e.uid = uid;
      e.plen = static_cast<int32_t>(i);
      e.cur_t = times[start + i];
      if (i > h->max_hist) h->max_hist = i;
      if (i != valid_length - 1) {
        if (pack_pos_neg) {  // LSPM: one (pos, neg) tuple per position
          e.a = asins[start + i];
          e.b = negs[i];
          h->train.push_back(e);
        } else {             // two labeled examples, pos then neg
          e.a = asins[start + i];
          e.label = 1.0f;
          h->train.push_back(e);
          e.a = negs[i];
          e.label = 0.0f;
          h->train.push_back(e);
        }
      } else {
        e.a = asins[start + i];
        e.b = negs[i];
        h->test.push_back(e);
      }
    }
    for (int64_t k = 0; k < len; ++k) in_pos[asins[start + k]] = 0;
  }

  rng.shuffle(h->train);
  rng.shuffle(h->test);
  return h;
}

void prefix_counts(void* hp, int64_t* train_n, int64_t* test_n,
                   int64_t* max_hist) {
  auto* h = static_cast<PrefixHandle*>(hp);
  *train_n = static_cast<int64_t>(h->train.size());
  *test_n = static_cast<int64_t>(h->test.size());
  *max_hist = h->max_hist;
}

namespace {

// window = "last": keep trailing T items; align right shifts to [T-w, T)
void pack_prefix_common(const PrefixHandle* h, const PrefixExample& e,
                        int64_t T, int32_t align_right, int32_t time_mode,
                        int64_t r, int32_t* hist_i, float* hist_t,
                        int32_t* sl) {
  const int64_t s = e.user_start;
  const int64_t L = e.plen;
  const int64_t w = L > T ? T : L;
  const int64_t off = L > T ? L - T : 0;
  const int64_t base = align_right ? T - w : 0;
  for (int64_t k = 0; k < T; ++k) hist_i[r * T + k] = 0;
  if (hist_t) for (int64_t k = 0; k < T; ++k) hist_t[r * T + k] = 0.0f;
  for (int64_t k = 0; k < w; ++k) {
    hist_i[r * T + base + k] = h->asins[s + off + k];
    if (time_mode == 1)
      hist_t[r * T + base + k] =
          static_cast<float>(bucket_index(h->times[s + off + k], e.cur_t));
    else if (time_mode == 2)
      hist_t[r * T + base + k] =
          static_cast<float>(e.cur_t - h->times[s + off + k] + 1);
  }
  sl[r] = static_cast<int32_t>(w);
}

}  // namespace

// hist_t may be nullptr when time_mode == 0.
// pack_pos_neg mode: y is nullptr, j receives the negatives.
void prefix_pack_train(void* hp, int64_t T, int32_t align_right,
                       int32_t time_mode, int32_t pack_pos_neg, int32_t* u,
                       int32_t* i, int32_t* j, float* y, int32_t* hist_i,
                       float* hist_t, int32_t* sl) {
  auto* h = static_cast<PrefixHandle*>(hp);
  for (size_t r = 0; r < h->train.size(); ++r) {
    const PrefixExample& e = h->train[r];
    u[r] = e.uid;
    i[r] = e.a;
    if (pack_pos_neg) j[r] = e.b; else y[r] = e.label;
    pack_prefix_common(h, e, T, align_right, time_mode,
                       static_cast<int64_t>(r), hist_i, hist_t, sl);
  }
}

void prefix_pack_test(void* hp, int64_t T, int32_t align_right,
                      int32_t time_mode, int32_t* u, int32_t* i, int32_t* j,
                      int32_t* hist_i, float* hist_t, int32_t* sl) {
  auto* h = static_cast<PrefixHandle*>(hp);
  for (size_t r = 0; r < h->test.size(); ++r) {
    const PrefixExample& e = h->test[r];
    u[r] = e.uid;
    i[r] = e.a;
    j[r] = e.b;
    pack_prefix_common(h, e, T, align_right, time_mode,
                       static_cast<int64_t>(r), hist_i, hist_t, sl);
  }
}

void prefix_free(void* hp) { delete static_cast<PrefixHandle*>(hp); }

}  // extern "C"
