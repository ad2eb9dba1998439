// Native host-side accelerators for pixel_heal_thyself_tpu.
//
// The reference's only CPU-heavy host compute is importance-sampled patch
// extraction (reference pht/models/afgsa/preprocessing.py:179-322): dart
// throwing is an O(num_patches^2 * tries) Python loop per image. This
// library reimplements that hot path in C++ with a CPython-compatible
// MT19937 (init_by_array seeding, getrandbits-based randint, 53-bit
// random()) so the native path produces byte-identical patch sets to the
// Python fallback — determinism parity is testable, not hoped for.
//
// Build: g++ -O3 -shared -fPIC -o libpht_native.so pht_native.cpp
// (loaded via ctypes; no pybind11 in this image)

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

// ---------------------------------------------------------------------
// MT19937 (Matsumoto & Nishimura reference algorithm, as used by CPython)

class MT19937 {
 public:
  void init_genrand(uint32_t s) {
    mt_[0] = s;
    for (mti_ = 1; mti_ < N; mti_++) {
      mt_[mti_] = 1812433253u * (mt_[mti_ - 1] ^ (mt_[mti_ - 1] >> 30)) + mti_;
    }
  }

  // CPython seeds int objects through init_by_array of their 32-bit limbs
  void init_by_array(const uint32_t* key, size_t key_length) {
    init_genrand(19650218u);
    size_t i = 1, j = 0;
    size_t k = std::max<size_t>(N, key_length);
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
  }

  uint32_t genrand() {
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

  // Python random.getrandbits(k) for k <= 32
  uint32_t getrandbits(int k) { return genrand() >> (32 - k); }

  // Python random._randbelow (rejection sampling over bit_length bits)
  uint64_t randbelow(uint64_t n) {
    if (n == 0) return 0;
    int k = 0;
    for (uint64_t t = n; t; t >>= 1) k++;
    if (k <= 32) {
      uint32_t r = getrandbits(k);
      while (r >= n) r = getrandbits(k);
      return r;
    }
    // k in (32, 64]: CPython getrandbits assembles 32-bit words low-first
    for (;;) {
      uint64_t lo = genrand();
      uint64_t hi = genrand() >> (64 - k);
      uint64_t r = lo | (hi << 32);
      if (r < n) return r;
    }
  }

  // Python random.randint(a, b) == randrange(a, b+1)
  int64_t randint(int64_t a, int64_t b) {
    return a + static_cast<int64_t>(randbelow(static_cast<uint64_t>(b - a + 1)));
  }

  // Python random.random(): 53-bit resolution
  double random() {
    uint32_t a = genrand() >> 5, b = genrand() >> 6;
    return (a * 67108864.0 + b) * (1.0 / 9007199254740992.0);
  }

  // interop with Python random.getstate()/setstate(): 624 words + index
  void load_state(const uint32_t* mt, int32_t pos) {
    std::memcpy(mt_, mt, sizeof(mt_));
    mti_ = pos;
  }
  void store_state(uint32_t* mt, int32_t* pos) const {
    std::memcpy(mt, mt_, sizeof(mt_));
    *pos = mti_;
  }

 private:
  static const int N = 624;
  static const int M = 397;
  static const uint32_t UPPER_MASK = 0x80000000u;
  static const uint32_t LOWER_MASK = 0x7fffffffu;
  uint32_t mt_[N];
  int mti_ = N + 1;
};

void seed_from_words(MT19937& rng, const uint32_t* words, int n_words) {
  if (n_words <= 0) {
    uint32_t zero = 0;
    rng.init_by_array(&zero, 1);
  } else {
    rng.init_by_array(words, static_cast<size_t>(n_words));
  }
}

}  // namespace

extern "C" {

// Dart throwing + error-diffusion pruning in one call (the Python flow
// threads ONE rng through both stages — preprocessing.py:283-322 — so the
// native path must too, to keep the random stream identical).
//
// imp_map: row-major [h, w] importance map. out_xy: int64 buffer of
// capacity 2*num_patches receiving pruned (x, y) pairs (already padded
// back like importance_sampling's +pad). Returns the pruned count.
int64_t importance_sample(
    int64_t img_h, int64_t img_w, int64_t patch_size, int64_t num_patches,
    int64_t max_iter,
    uint32_t* mt_state /* 624, updated in place */,
    int32_t* mt_pos /* updated in place */,
    const float* imp_map,
    int64_t* out_xy) {
  MT19937 rng;
  rng.load_state(mt_state, *mt_pos);

  // --- dart throwing (preprocessing.py:179-213) -----------------------
  const double full_area = static_cast<double>(img_h) * img_w;
  const double sample_area = full_area / num_patches;
  double radius = std::sqrt(sample_area / M_PI);
  double min_sq = (2.0 * radius) * (2.0 * radius);
  const double rate = 0.96;
  const int64_t x_min = 0, x_max = img_w - patch_size - 1;
  const int64_t y_min = 0, y_max = img_h - patch_size - 1;

  std::vector<int64_t> px(num_patches), py(num_patches);
  for (int64_t i = 0; i < num_patches; i++) {
    bool done = false;
    while (!done) {
      for (int64_t it = 0; it < max_iter; it++) {
        int64_t x = rng.randint(x_min, x_max);
        int64_t y = rng.randint(y_min, y_max);
        double sq = 1e300;
        for (int64_t j = 0; j < i; j++) {
          double dx = static_cast<double>(px[j] - x);
          double dy = static_cast<double>(py[j] - y);
          double d = dx * dx + dy * dy;
          if (d < sq) sq = d;
        }
        if (i == 0) sq = 1e300;
        if (sq > min_sq) {
          px[i] = x; py[i] = y;
          done = true;
          break;
        }
      }
      if (!done) {
        radius *= rate;
        min_sq = (2.0 * radius) * (2.0 * radius);
      }
    }
  }

  // --- pruning against the importance map (preprocessing.py:223-280) ---
  const int64_t pad = patch_size / 2;
  const int64_t step = 4 * patch_size;
  std::vector<int64_t> cx(num_patches), cy(num_patches);
  std::vector<bool> used(num_patches, false);
  for (int64_t i = 0; i < num_patches; i++) {
    cx[i] = px[i] + pad;
    cy[i] = py[i] + pad;
  }

  int64_t count = 0;
  double error = 0.0;
  // boustrophedon region sweep over the (unpadded) image extent
  int64_t row = 0;
  for (int64_t y0 = 0; y0 < img_h; y0 += step, row++) {
    const bool forward = (row % 2 == 0);
    const int64_t nx = (img_w + step - 1) / step;
    for (int64_t c = 0; c < nx; c++) {
      const int64_t x0 = forward ? c * step : (nx - 1 - c) * step;
      const int64_t x1 = x0 + step, y1 = y0 + step;
      // split_patches keeps input order within the region
      for (int64_t i = 0; i < num_patches; i++) {
        if (used[i]) continue;
        if (cx[i] >= x0 && cx[i] <= x1 && cy[i] >= y0 && cy[i] <= y1) {
          used[i] = true;
          const float imp = imp_map[cy[i] * img_w + cx[i]];
          if (static_cast<double>(imp) - error > rng.random()) {
            int64_t ox = cx[i] - pad;
            int64_t oy = cy[i] - pad;
            if (ox < 0) ox = 0;
            if (oy < 0) oy = 0;
            out_xy[2 * count] = ox + pad;
            out_xy[2 * count + 1] = oy + pad;
            count++;
            error += 1.0 - imp;
          } else {
            error += 0.0 - imp;
          }
        }
      }
    }
  }
  rng.store_state(mt_state, mt_pos);
  return count;
}

// Raw RNG hooks for parity testing against Python's random module.
void mt_random_doubles(uint32_t* mt_state, int32_t* mt_pos,
                       int64_t n, double* out) {
  MT19937 rng;
  rng.load_state(mt_state, *mt_pos);
  for (int64_t i = 0; i < n; i++) out[i] = rng.random();
  rng.store_state(mt_state, mt_pos);
}

void mt_randints(uint32_t* mt_state, int32_t* mt_pos,
                 int64_t a, int64_t b, int64_t n, int64_t* out) {
  MT19937 rng;
  rng.load_state(mt_state, *mt_pos);
  for (int64_t i = 0; i < n; i++) out[i] = rng.randint(a, b);
  rng.store_state(mt_state, mt_pos);
}

// init_by_array path kept for standalone seeding parity checks
void mt_seed_and_store(const uint32_t* seed_words, int32_t n_seed_words,
                       uint32_t* mt_state, int32_t* mt_pos) {
  MT19937 rng;
  seed_from_words(rng, seed_words, n_seed_words);
  rng.store_state(mt_state, mt_pos);
}

}  // extern "C"
