// Independent C++ mirror of the rand-0.9.2 shuffle stack used by the
// reference's RAA permutations (StdRng::seed_from_u64 + slice::shuffle,
// /root/reference/src/zip/utils.rs:139-142).
//
// Written separately from zinc_tpu/rng.py, directly from the documented
// algorithms (docs/RAND_PARITY.md layers 1-4: SplitMix64 seeding, ChaCha12
// with djb layout, IncreasingUniform batched draws, Canon's method with the
// Lemire early-out).  tests/test_rng_external.py cross-runs this binary
// against the Python implementation at the production codeword sizes — an
// independent-implementation check that catches transcription errors in
// either copy (the strongest cross-validation available in this image:
// no cargo, zero egress; see docs/RAND_PARITY.md "Verification status").
//
// Usage: rand09_mirror <seed-u64> <length>   -> permutation, space-separated.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <utility>
#include <vector>

static inline uint32_t rotl(uint32_t v, int s) { return (v << s) | (v >> (32 - s)); }

struct ChaCha12 {
  uint32_t key[8];
  uint64_t counter = 0;
  uint32_t buf[16];
  int pos = 16;

  void block(uint64_t ctr, uint32_t out[16]) {
    uint32_t st[16] = {0x61707865u, 0x3320646Eu, 0x79622D32u, 0x6B206574u,
                       key[0], key[1], key[2], key[3],
                       key[4], key[5], key[6], key[7],
                       (uint32_t)ctr, (uint32_t)(ctr >> 32), 0, 0};
    uint32_t x[16];
    for (int i = 0; i < 16; i++) x[i] = st[i];
    auto qr = [&](int a, int b, int c, int d) {
      x[a] += x[b]; x[d] ^= x[a]; x[d] = rotl(x[d], 16);
      x[c] += x[d]; x[b] ^= x[c]; x[b] = rotl(x[b], 12);
      x[a] += x[b]; x[d] ^= x[a]; x[d] = rotl(x[d], 8);
      x[c] += x[d]; x[b] ^= x[c]; x[b] = rotl(x[b], 7);
    };
    for (int r = 0; r < 6; r++) {  // 12 rounds = 6 double rounds
      qr(0, 4, 8, 12); qr(1, 5, 9, 13); qr(2, 6, 10, 14); qr(3, 7, 11, 15);
      qr(0, 5, 10, 15); qr(1, 6, 11, 12); qr(2, 7, 8, 13); qr(3, 4, 9, 14);
    }
    for (int i = 0; i < 16; i++) out[i] = x[i] + st[i];
  }

  uint32_t next_u32() {
    if (pos == 16) { block(counter++, buf); pos = 0; }
    return buf[pos++];
  }

  // rand 0.9 sample_single_inclusive(0, n-1), default features:
  // Canon's method with the Lemire-style early-out.
  uint32_t next_below(uint32_t n) {
    uint64_t m = (uint64_t)next_u32() * n;
    uint32_t result = (uint32_t)(m >> 32), lo = (uint32_t)m;
    if (lo > (uint32_t)(0u - n)) {
      uint32_t hi2 = (uint32_t)(((uint64_t)next_u32() * n) >> 32);
      if ((uint64_t)lo + hi2 > 0xFFFFFFFFull) result++;
    }
    return result;
  }
};

// rand_core seed_from_u64: SplitMix64, low 32 bits of each output, LE.
static void seed_from_u64(uint64_t state, uint32_t key[8]) {
  for (int i = 0; i < 8; i++) {
    state += 0x9E3779B97F4A7C15ull;
    uint64_t z = state;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    z = z ^ (z >> 31);
    key[i] = (uint32_t)z;
  }
}

// rand calculate_bound_u32: longest product of consecutive factors
// m*(m+1)*...*(m+r-1) fitting in u32.
static void calc_bound(uint32_t m, uint32_t* bound, int* r) {
  uint64_t product = m;
  uint32_t current = m + 1;
  while (product * current < (1ull << 32)) { product *= current; current++; }
  *bound = (uint32_t)product;
  *r = (int)(current - m);
}

int main(int argc, char** argv) {
  if (argc != 3) { fprintf(stderr, "usage: %s <seed-u64> <length>\n", argv[0]); return 2; }
  uint64_t seed = strtoull(argv[1], nullptr, 10);
  long length = strtol(argv[2], nullptr, 10);
  ChaCha12 rng;
  seed_from_u64(seed, rng.key);
  std::vector<long> arr((size_t)length);
  for (long i = 0; i < length; i++) arr[(size_t)i] = i;
  // partial_shuffle(rng, len): forward growing-region Durstenfeld walk
  // driven by IncreasingUniform (new(rng, 0) => chunk_remaining = 1).
  uint32_t n = 0, chunk = 0;
  int chunk_remaining = 1;
  for (long i = 0; i < length; i++) {
    uint32_t next_n = n + 1;
    if (chunk_remaining == 0) {
      uint32_t bound; int rem;
      calc_bound(next_n, &bound, &rem);
      chunk = rng.next_below(bound);
      chunk_remaining = rem - 1;
    } else {
      chunk_remaining--;
    }
    uint32_t j = next_n > 1 ? chunk % next_n : 0;
    chunk /= next_n;
    n = next_n;
    std::swap(arr[(size_t)i], arr[j]);
  }
  for (long k = 0; k < length; k++)
    printf("%ld%c", arr[(size_t)k], k + 1 == length ? '\n' : ' ');
  return 0;
}
