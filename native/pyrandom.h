// CPython-compatible Mersenne Twister (random.Random semantics).
//
// Reproduces, bit for bit, the call sequence of Python's `random` module as
// used by the reference dataset builders (random.seed(1234), randint,
// choice, shuffle — e.g. TLSAN/build_dataset.py:8,31,66,75-76):
//   - seed(int): init_by_array over the integer's 32-bit limbs (CPython
//     random_seed);
//   - getrandbits(k<=32): genrand_uint32() >> (32-k);
//   - _randbelow(n): k=bit_length(n); draw getrandbits(k) until < n;
//   - randint(a,b) = a + _randbelow(b-a+1);
//   - choice(seq) = seq[_randbelow(len)];
//   - shuffle: Fisher-Yates from the top with _randbelow(i+1).
#pragma once
#include <cstddef>
#include <cstdint>
#include <utility>
#include <vector>

using std::size_t;

class PyRandom {
 public:
  explicit PyRandom(uint64_t seed) { seed_with_int(seed); }

  void seed_with_int(uint64_t value) {
    std::vector<uint32_t> key;
    if (value == 0) key.push_back(0);
    while (value) {
      key.push_back(static_cast<uint32_t>(value & 0xffffffffu));
      value >>= 32;
    }
    init_by_array(key.data(), key.size());
  }

  uint32_t genrand_uint32() {
    uint32_t y;
    static const uint32_t mag01[2] = {0x0u, 0x9908b0dfu};
    if (mti_ >= N) {
      int kk;
      for (kk = 0; kk < N - M; kk++) {
        y = (mt_[kk] & UPPER_MASK) | (mt_[kk + 1] & LOWER_MASK);
        mt_[kk] = mt_[kk + M] ^ (y >> 1) ^ mag01[y & 0x1u];
      }
      for (; kk < N - 1; kk++) {
        y = (mt_[kk] & UPPER_MASK) | (mt_[kk + 1] & LOWER_MASK);
        mt_[kk] = mt_[kk + (M - N)] ^ (y >> 1) ^ mag01[y & 0x1u];
      }
      y = (mt_[N - 1] & UPPER_MASK) | (mt_[0] & LOWER_MASK);
      mt_[N - 1] = mt_[M - 1] ^ (y >> 1) ^ mag01[y & 0x1u];
      mti_ = 0;
    }
    y = mt_[mti_++];
    y ^= (y >> 11);
    y ^= (y << 7) & 0x9d2c5680u;
    y ^= (y << 15) & 0xefc60000u;
    y ^= (y >> 18);
    return y;
  }

  // getrandbits for k in [1, 32]
  uint32_t getrandbits(int k) { return genrand_uint32() >> (32 - k); }

  // CPython Random._randbelow_with_getrandbits
  uint64_t randbelow(uint64_t n) {
    if (n == 0) return 0;
    int k = bit_length(n);
    uint64_t r = getrandbits64(k);
    while (r >= n) r = getrandbits64(k);
    return r;
  }

  // randint(a, b) inclusive
  int64_t randint(int64_t a, int64_t b) {
    return a + static_cast<int64_t>(randbelow(static_cast<uint64_t>(b - a + 1)));
  }

  template <typename T>
  void shuffle(std::vector<T>& x) {
    if (x.size() < 2) return;  // random.shuffle([]) is a no-op
    for (size_t i = x.size() - 1; i >= 1; --i) {
      size_t j = static_cast<size_t>(randbelow(i + 1));
      std::swap(x[i], x[j]);
    }
  }

  // choice index for a sequence of length n
  size_t choice_index(size_t n) { return static_cast<size_t>(randbelow(n)); }

 private:
  static const int N = 624, M = 397;
  static const uint32_t UPPER_MASK = 0x80000000u, LOWER_MASK = 0x7fffffffu;
  uint32_t mt_[624];
  int mti_ = N + 1;

  static int bit_length(uint64_t n) {
    int k = 0;
    while (n) { ++k; n >>= 1; }
    return k;
  }

  // getrandbits for k up to 64 (CPython builds big ints from 32-bit chunks,
  // least-significant first; the last chunk keeps its TOP bits)
  uint64_t getrandbits64(int k) {
    if (k <= 32) return getrandbits(k);
    uint64_t lo = genrand_uint32();
    uint64_t hi = genrand_uint32() >> (64 - k);
    return lo | (hi << 32);
  }

  void init_genrand(uint32_t s) {
    mt_[0] = s;
    for (mti_ = 1; mti_ < N; mti_++) {
      mt_[mti_] =
          1812433253u * (mt_[mti_ - 1] ^ (mt_[mti_ - 1] >> 30)) + mti_;
    }
  }

  void init_by_array(const uint32_t* key, size_t key_length) {
    init_genrand(19650218u);
    size_t i = 1, j = 0;
    size_t k = (static_cast<size_t>(N) > key_length) ? N : key_length;
    for (; k; k--) {
      mt_[i] = (mt_[i] ^ ((mt_[i - 1] ^ (mt_[i - 1] >> 30)) * 1664525u)) +
               key[j] + static_cast<uint32_t>(j);
      i++; j++;
      if (i >= N) { mt_[0] = mt_[N - 1]; i = 1; }
      if (j >= key_length) j = 0;
    }
    for (k = N - 1; k; k--) {
      mt_[i] = (mt_[i] ^ ((mt_[i - 1] ^ (mt_[i - 1] >> 30)) * 1566083941u)) -
               static_cast<uint32_t>(i);
      i++;
      if (i >= N) { mt_[0] = mt_[N - 1]; i = 1; }
    }
    mt_[0] = 0x80000000u;
    mti_ = N;
  }
};
