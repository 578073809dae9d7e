// coldrec_tpu native data plane.
//
// Host-side hot paths of the training pipeline, in C++ (the reference keeps
// these in python: next_batch_pairwise's rejection loop utils.py:123-157 and
// the csv loader loader.py:22-33). The TPU does the math; this keeps the
// feeding side off the python interpreter:
//   * parse_interactions: zero-copy-ish CSV parse of "user,item[,...]" files
//   * sample_negatives: per-row uniform rejection sampling against the
//     training CSR (binary-search membership), xoshiro-seeded
//   * shuffled epoch permutations (Fisher-Yates)
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 dependency).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------- RNG
// splitmix64 + xoshiro256** — deterministic, seedable, fast.
struct Rng {
  uint64_t s[4];
};

static uint64_t splitmix64(uint64_t *x) {
  uint64_t z = (*x += 0x9E3779B97f4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

static void rng_seed(Rng *r, uint64_t seed) {
  for (int i = 0; i < 4; i++) r->s[i] = splitmix64(&seed);
}

static inline uint64_t rotl(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

static inline uint64_t rng_next(Rng *r) {
  uint64_t *s = r->s;
  const uint64_t result = rotl(s[1] * 5, 7) * 9;
  const uint64_t t = s[1] << 17;
  s[2] ^= s[0];
  s[3] ^= s[1];
  s[1] ^= s[2];
  s[0] ^= s[3];
  s[2] ^= t;
  s[3] = rotl(s[3], 45);
  return result;
}

static inline int64_t rng_below(Rng *r, int64_t n) {
  // Lemire's nearly-divisionless bounded rand
  return (int64_t)(((__uint128_t)rng_next(r) * (uint64_t)n) >> 64);
}

// ------------------------------------------------------------- membership
static inline int contains(const int64_t *arr, int64_t lo, int64_t hi,
                           int64_t key) {
  while (lo < hi) {
    int64_t mid = lo + ((hi - lo) >> 1);
    if (arr[mid] < key)
      lo = mid + 1;
    else if (arr[mid] > key)
      hi = mid;
    else
      return 1;
  }
  return 0;
}

// Uniform negatives in [0, n_candidates) (or pool[0..pool_n)) rejecting
// training positives. users: (n,) mapped ids; out: (n,) item ids.
void sample_negatives(const int64_t *indptr, const int64_t *items_sorted,
                      const int64_t *users, int64_t n, int64_t n_candidates,
                      const int64_t *pool, int64_t pool_n, uint64_t seed,
                      int64_t *out) {
  Rng rng;
  rng_seed(&rng, seed);
  for (int64_t i = 0; i < n; i++) {
    int64_t u = users[i];
    int64_t lo = indptr[u], hi = indptr[u + 1];
    int64_t cand;
    int tries = 0;
    do {
      if (pool_n > 0)
        cand = pool[rng_below(&rng, pool_n)];
      else
        cand = rng_below(&rng, n_candidates);
      if (++tries > 10000) break;  // degenerate pool; caller validates
    } while (contains(items_sorted, lo, hi, cand));
    out[i] = cand;
  }
}

// Fisher-Yates permutation of [0, n)
void permutation(int64_t n, uint64_t seed, int64_t *out) {
  for (int64_t i = 0; i < n; i++) out[i] = i;
  Rng rng;
  rng_seed(&rng, seed);
  for (int64_t i = n - 1; i > 0; i--) {
    int64_t j = rng_below(&rng, i + 1);
    int64_t t = out[i];
    out[i] = out[j];
    out[j] = t;
  }
}

// Count data lines (excluding the header) of a csv file; returns -1 on error.
int64_t count_csv_rows(const char *path) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  static const size_t BUF = 1 << 20;
  char *buf = (char *)malloc(BUF);
  int64_t lines = 0;
  size_t got;
  char last = '\n';
  while ((got = fread(buf, 1, BUF, f)) > 0) {
    for (size_t i = 0; i < got; i++)
      if (buf[i] == '\n') lines++;
    last = buf[got - 1];
  }
  if (last != '\n') lines++;  // unterminated final line
  free(buf);
  fclose(f);
  return lines > 0 ? lines - 1 : 0;  // minus header
}

// Parse "user,item[,...]" csv (header skipped) into out (n rows x 2 int64).
// Returns rows parsed, or -1 on IO error.
int64_t parse_interactions(const char *path, int64_t *out, int64_t max_rows) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  static const size_t BUF = 1 << 20;
  char *buf = (char *)malloc(BUF + 1);
  size_t got;
  int64_t row = 0;
  int col = 0;       // 0 = user, 1 = item, 2+ = ignored
  int64_t val = 0;
  int in_num = 0;
  int header = 1;  // skip first line
  while ((got = fread(buf, 1, BUF, f)) > 0) {
    for (size_t i = 0; i < got; i++) {
      char c = buf[i];
      if (header) {
        if (c == '\n') header = 0;
        continue;
      }
      if (c >= '0' && c <= '9') {
        val = val * 10 + (c - '0');
        in_num = 1;
      } else if (c == ',') {
        if (in_num && col < 2 && row < max_rows) out[row * 2 + col] = val;
        col++;
        val = 0;
        in_num = 0;
      } else if (c == '\n') {
        if (in_num && col < 2 && row < max_rows) out[row * 2 + col] = val;
        if (col >= 1 && row < max_rows) row++;
        col = 0;
        val = 0;
        in_num = 0;
      }
    }
  }
  // unterminated final line
  if (in_num && col < 2 && row < max_rows) {
    out[row * 2 + col] = val;
    if (col >= 1) row++;
  }
  free(buf);
  fclose(f);
  return row;
}

}  // extern "C"
