// CPU baseline minting for BASELINE.md — reference-semantics mirrors.
//
// The Rust reference (NethermindEth/zinc) publishes no numbers and cargo is
// not in this image, so this binary re-implements the five BASELINE.json
// workloads at reference semantics in portable C++ and measures them on the
// host CPU.  It is deliberately a STRONG baseline: 4x64-bit CIOS Montgomery
// multiplication (the canonical fast form arkworks-class fields use), the
// repo's own 16-lane AVX-512 BLAKE3 for hashing, and embarrassingly-parallel
// std::thread partitioning identical to where the reference puts Rayon
// (par_iter over pairs: /root/reference/src/sumcheck/prover.rs:126-176,
// par rows: /root/reference/src/zip/pcs/commit.rs:164-180).
//
// Workloads (shapes = the 2^20 production configuration):
//   sumcheck_round  one fold+eval round, 4 MLEs x 2^20, 256-bit field, deg 3
//   raa_encode      RAA encode_rows: 1024 rows x 1024, rep 2 -> cw 2048
//   merkle_root     BLAKE3 tree over the 1024x2048 codeword (2^21 leaves)
//   commit          raa_encode + leaf serialization + merkle_root
//   open            1 proximity combination + 1000 column openings assembly
//
// Build: g++ -O3 -march=native -std=c++17 -pthread \
//            -o cpu_baseline cpu_baseline.cpp zinc_native_impl.cpp
// Run:   ./cpu_baseline [--threads N] [--iters K] [workload ...]

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <random>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void zn_blake3_batch(const uint8_t* data, uint64_t n, uint64_t msg_len, uint8_t* out);
void zn_blake3_merge_batch(const uint8_t* pairs, uint64_t n, uint8_t* out);
}

using u64 = uint64_t;
using u128 = unsigned __int128;

// ---------------------------------------------------------------------------
// 256-bit Montgomery field (4x64 CIOS) — the 2^20 production prime.
// q = 2^255 + 95 (FieldConfig((1<<255)+95, 4)); q' = -q^{-1} mod 2^64.
// ---------------------------------------------------------------------------

struct Fp4 { u64 v[4]; };

static const Fp4 Q = {{95ULL, 0ULL, 0ULL, 0x8000000000000000ULL}};
static u64 QINV;  // -q^{-1} mod 2^64, computed at startup

static u64 inv64(u64 a) {  // a odd: Newton iteration for a^{-1} mod 2^64
    u64 x = a;
    for (int i = 0; i < 5; ++i) x *= 2 - a * x;
    return x;
}

static inline bool geq_q(const Fp4& a) {
    for (int i = 3; i >= 0; --i) {
        if (a.v[i] > Q.v[i]) return true;
        if (a.v[i] < Q.v[i]) return false;
    }
    return true;
}

static inline void sub_q(Fp4& a) {
    u128 brw = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - Q.v[i] - (u64)brw;
        a.v[i] = (u64)d;
        brw = (d >> 64) & 1;
    }
}

static inline Fp4 mont_mul(const Fp4& a, const Fp4& b) {
    // CIOS: t has 6 words (q < 2^256 so carries fit)
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; ++i) {
        u128 c = 0;
        for (int j = 0; j < 4; ++j) {
            u128 s = (u128)a.v[j] * b.v[i] + t[j] + (u64)c;
            t[j] = (u64)s;
            c = s >> 64;
        }
        u128 s4 = (u128)t[4] + (u64)c;
        t[4] = (u64)s4;
        t[5] = (u64)(s4 >> 64);
        u64 m = t[0] * QINV;
        c = ((u128)m * Q.v[0] + t[0]) >> 64;
        for (int j = 1; j < 4; ++j) {
            u128 s = (u128)m * Q.v[j] + t[j] + (u64)c;
            t[j - 1] = (u64)s;
            c = s >> 64;
        }
        s4 = (u128)t[4] + (u64)c;
        t[3] = (u64)s4;
        t[4] = t[5] + (u64)(s4 >> 64);
        t[5] = 0;
    }
    Fp4 r = {{t[0], t[1], t[2], t[3]}};
    if (t[4] || geq_q(r)) sub_q(r);
    return r;
}

static inline Fp4 add_f(const Fp4& a, const Fp4& b) {
    Fp4 r;
    u128 c = 0;
    for (int i = 0; i < 4; ++i) {
        u128 s = (u128)a.v[i] + b.v[i] + (u64)c;
        r.v[i] = (u64)s;
        c = s >> 64;
    }
    if (c || geq_q(r)) sub_q(r);
    return r;
}

static inline Fp4 sub_f(const Fp4& a, const Fp4& b) {
    Fp4 r;
    u128 brw = 0;
    for (int i = 0; i < 4; ++i) {
        u128 d = (u128)a.v[i] - b.v[i] - (u64)brw;
        r.v[i] = (u64)d;
        brw = (d >> 64) & 1;
    }
    if (brw) {  // add q back
        u128 c = 0;
        for (int i = 0; i < 4; ++i) {
            u128 s = (u128)r.v[i] + Q.v[i] + (u64)c;
            r.v[i] = (u64)s;
            c = s >> 64;
        }
    }
    return r;
}

// ---------------------------------------------------------------------------
// Harness utilities
// ---------------------------------------------------------------------------

static int g_threads = (int)std::thread::hardware_concurrency();

template <typename F>
static void par_for(u64 n, F body) {  // static row partition, like par_iter
    int t = g_threads;
    if (t <= 1 || n < 2) { body((u64)0, n); return; }
    std::vector<std::thread> th;
    u64 chunk = (n + t - 1) / t;
    for (int i = 0; i < t; ++i) {
        u64 lo = chunk * i, hi = lo + chunk > n ? n : lo + chunk;
        if (lo >= hi) break;
        th.emplace_back(body, lo, hi);
    }
    for (auto& x : th) x.join();
}

static double now_s() {
    using namespace std::chrono;
    return duration<double>(steady_clock::now().time_since_epoch()).count();
}

static std::mt19937_64 RNG(12345);

static Fp4 rand_f() {
    Fp4 r;
    for (int i = 0; i < 4; ++i) r.v[i] = RNG();
    r.v[3] &= 0x7FFFFFFFFFFFFFFFULL;  // < 2^255 <= q: canonical enough
    return r;
}

// ---------------------------------------------------------------------------
// Workload 1: one sumcheck round, 4 MLEs x 2^20, degree 3,
// comb = c0*(M0*M1*eq) + c1*(M2*eq)  (the Spartan sumcheck-1 shape).
// Work mirrors /root/reference/src/sumcheck/prover.rs:126-176: per pair,
// evaluate each MLE at t=0..3 by repeated-difference extrapolation, multiply
// per-term factors, then fold every table by r.
// ---------------------------------------------------------------------------

static double bench_sumcheck_round(int nv) {
    const u64 b = 1ULL << nv, half = b / 2;
    static std::vector<Fp4> tabs[4];
    for (int m = 0; m < 4; ++m) {
        tabs[m].resize(b);
        for (u64 i = 0; i < b; ++i) tabs[m][i] = rand_f();
    }
    Fp4 r = rand_f();
    std::vector<Fp4> acc_t(g_threads * 4 * 2);  // [thread][point][term]

    double t0 = now_s();
    // --- evaluate s(t), t = 0..3 ---
    par_for(half, [&](u64 lo, u64 hi) {
        int tid = (int)((lo * (u64)g_threads) / half);
        if (tid >= g_threads) tid = g_threads - 1;
        Fp4 acc[4][2];
        std::memset(acc, 0, sizeof(acc));
        for (u64 p = lo; p < hi; ++p) {
            Fp4 v[4], d[4];
            for (int m = 0; m < 4; ++m) {
                v[m] = tabs[m][p];
                d[m] = sub_f(tabs[m][p + half], tabs[m][p]);
            }
            for (int t = 0; t < 4; ++t) {
                // term 0: M0*M1*eq ; term 1: M2*eq
                acc[t][0] = add_f(acc[t][0], mont_mul(mont_mul(v[0], v[1]), v[3]));
                acc[t][1] = add_f(acc[t][1], mont_mul(v[2], v[3]));
                if (t < 3)
                    for (int m = 0; m < 4; ++m) v[m] = add_f(v[m], d[m]);
            }
        }
        for (int t = 0; t < 4; ++t)
            for (int k = 0; k < 2; ++k) acc_t[tid * 8 + t * 2 + k] = acc[t][k];
    });
    // --- fold all 4 tables by r ---
    par_for(half, [&](u64 lo, u64 hi) {
        for (int m = 0; m < 4; ++m)
            for (u64 p = lo; p < hi; ++p)
                tabs[m][p] = add_f(tabs[m][p],
                                   mont_mul(r, sub_f(tabs[m][p + half], tabs[m][p])));
    });
    double dt = now_s() - t0;
    volatile u64 sink = acc_t[0].v[0] ^ tabs[0][0].v[0];
    (void)sink;
    return dt;
}

// ---------------------------------------------------------------------------
// Workload 2: RAA encode_rows — 1024 rows x row_len 1024, repetition 2,
// K-width (128-bit here; production K ~ 87 bits) accumulate/permute chain:
// repeat -> perm1 -> cumsum -> perm2 -> cumsum.
// Mirrors /root/reference/src/zip/code.rs encode_rows + commit.rs:164-180.
// ---------------------------------------------------------------------------

struct RaaOut { double secs; std::vector<u128> enc; u64 rows, cw; };

static RaaOut bench_raa_encode(int rows_log2, int row_log2) {
    const u64 rows = 1ULL << rows_log2, row_len = 1ULL << row_log2;
    const u64 cw = 2 * row_len;  // repetition factor 2
    std::vector<u128> z(rows * row_len);
    for (auto& x : z) x = (u128)RNG();
    std::vector<uint32_t> p1(cw), p2(cw);
    for (u64 i = 0; i < cw; ++i) p1[i] = (uint32_t)i, p2[i] = (uint32_t)i;
    std::shuffle(p1.begin(), p1.end(), RNG);
    std::shuffle(p2.begin(), p2.end(), RNG);

    RaaOut out;
    out.enc.resize(rows * cw);
    out.rows = rows;
    out.cw = cw;
    double t0 = now_s();
    par_for(rows, [&](u64 lo, u64 hi) {
        std::vector<u128> buf(cw), buf2(cw);
        for (u64 r = lo; r < hi; ++r) {
            const u128* src = &z[r * row_len];
            for (u64 i = 0; i < cw; ++i) buf[i] = src[p1[i] % row_len];  // repeat+perm1
            u128 acc = 0;
            for (u64 i = 0; i < cw; ++i) { acc += buf[i]; buf[i] = acc; }  // cumsum
            for (u64 i = 0; i < cw; ++i) buf2[i] = buf[p2[i]];  // perm2
            acc = 0;
            u128* dst = &out.enc[r * cw];
            for (u64 i = 0; i < cw; ++i) { acc += buf2[i]; dst[i] = acc; }  // cumsum
        }
    });
    out.secs = now_s() - t0;
    return out;
}

// ---------------------------------------------------------------------------
// Workload 3: BLAKE3 Merkle tree over the codeword matrix (rows x cw leaves
// of 16 bytes), per-row trees like the reference (pcs/utils.rs:87-118) —
// leaves then log2(cw) merge levels.  Uses the repo's 16-lane BLAKE3.
// ---------------------------------------------------------------------------

static double bench_merkle(const std::vector<u128>& enc, u64 rows, u64 cw) {
    std::vector<uint8_t> digests(rows * cw * 32), next(rows * cw * 16);
    double t0 = now_s();
    par_for(rows, [&](u64 lo, u64 hi) {
        for (u64 r = lo; r < hi; ++r)
            zn_blake3_batch((const uint8_t*)&enc[r * cw], cw, 16, &digests[r * cw * 32]);
    });
    u64 level = cw;
    while (level > 1) {
        u64 half = level / 2;
        par_for(rows, [&](u64 lo, u64 hi) {
            for (u64 r = lo; r < hi; ++r)
                zn_blake3_merge_batch(&digests[r * level * 32], half, &next[r * half * 32]);
        });
        std::swap(digests, next);
        level = half;
    }
    double dt = now_s() - t0;
    volatile uint8_t sink = digests[0];
    (void)sink;
    return dt;
}

// ---------------------------------------------------------------------------
// Workload 5: open — one proximity combination (coeff x row multiply-
// accumulate over 1024 rows, 256-bit x 128-bit products) plus assembly of
// 1000 column-opening records (values + per-row Merkle paths), mirroring
// /root/reference/src/zip/pcs/open_z.rs:93-143.
// ---------------------------------------------------------------------------

static double bench_open(const std::vector<u128>& enc, u64 rows, u64 cw, u64 row_len) {
    const u64 n_open = 1000, depth = 64 - __builtin_clzll(cw - 1);
    // proximity: combined[j] = sum_r c_r * z[r][j] over the raw rows (width M)
    std::vector<u128> z(rows * row_len);
    for (auto& x : z) x = (u128)RNG();
    std::vector<Fp4> coeffs(rows);
    for (auto& c : coeffs) c = rand_f();
    std::vector<Fp4> combined(row_len);
    // fake per-level digest storage for path assembly (values don't matter
    // for timing; gather/memcpy traffic does)
    std::vector<std::vector<uint8_t>> layers;
    u64 lv = cw;
    while (lv >= 1) {
        layers.emplace_back(rows * lv * 32, 0xAB);
        if (lv == 1) break;
        lv /= 2;
    }

    double t0 = now_s();
    par_for(row_len, [&](u64 lo, u64 hi) {
        for (u64 j = lo; j < hi; ++j) {
            Fp4 acc = {{0, 0, 0, 0}};
            for (u64 r = 0; r < rows; ++r) {
                // 4x2-limb schoolbook product + lazy add (mod-q fold at end)
                const Fp4& c = coeffs[r];
                u128 zl = z[r * row_len + j];
                u64 z0 = (u64)zl, z1 = (u64)(zl >> 64);
                Fp4 p = {{0, 0, 0, 0}};
                u128 carry = 0;
                for (int i = 0; i < 4; ++i) {
                    u128 s = (u128)c.v[i] * z0 + p.v[i] + (u64)carry;
                    p.v[i] = (u64)s;
                    carry = s >> 64;
                }
                carry = 0;
                for (int i = 0; i < 3; ++i) {
                    u128 s = (u128)c.v[i] * z1 + p.v[i + 1] + (u64)carry;
                    p.v[i + 1] = (u64)s;
                    carry = s >> 64;
                }
                acc = add_f(acc, p);
            }
            combined[j] = acc;
        }
    });
    // column openings: gather 1000 columns x rows values + depth siblings
    std::mt19937_64 crng(777);
    std::vector<u64> cols(n_open);
    for (auto& c : cols) c = crng() % cw;
    u64 rec = rows * (16 + 8 + depth * 32);
    std::vector<uint8_t> recs(n_open * rec);
    par_for(n_open, [&](u64 lo, u64 hi) {
        for (u64 o = lo; o < hi; ++o) {
            uint8_t* dst = &recs[o * rec];
            for (u64 r = 0; r < rows; ++r) {
                std::memcpy(dst, &enc[r * cw + cols[o]], 16);
                dst += 16;
            }
            for (u64 r = 0; r < rows; ++r) {
                std::memcpy(dst, &depth, 8);
                dst += 8;
                u64 idx = cols[o];
                for (u64 l = 0; l < depth; ++l) {
                    std::memcpy(dst, &layers[l][(r * (cw >> l) + (idx ^ 1)) * 32], 32);
                    dst += 32;
                    idx >>= 1;
                }
            }
        }
    });
    double dt = now_s() - t0;
    volatile uint8_t sink = recs[0] ^ (uint8_t)combined[0].v[0];
    (void)sink;
    return dt;
}

// ---------------------------------------------------------------------------

int main(int argc, char** argv) {
    QINV = (u64)(0 - inv64(Q.v[0]));
    int iters = 3;
    std::vector<std::string> want;
    for (int i = 1; i < argc; ++i) {
        std::string a = argv[i];
        if (a == "--threads" && i + 1 < argc) g_threads = atoi(argv[++i]);
        else if (a == "--iters" && i + 1 < argc) iters = atoi(argv[++i]);
        else want.push_back(a);
    }
    if (g_threads < 1) g_threads = 1;
    auto wants = [&](const char* n) {
        return want.empty() ||
               std::find(want.begin(), want.end(), n) != want.end();
    };
    if (!want.empty() && want[0] == "selftest") {
        // print mont_mul(a, b) = a*b*2^-256 mod q and a+b, a-b for external
        // verification (tests/test_native.py pins these against Python ints)
        Fp4 a = {{0x1111111111111111ULL, 0x2222222222222222ULL,
                  0x3333333333333333ULL, 0x4444444444444444ULL}};
        Fp4 b = {{0xDEADBEEFCAFEF00DULL, 0x0123456789ABCDEFULL,
                  0xFEDCBA9876543210ULL, 0x7FFFFFFFFFFFFFFFULL}};
        Fp4 m = mont_mul(a, b), s = add_f(a, b), d = sub_f(a, b);
        for (int i = 0; i < 4; ++i) printf("%016llx ", (unsigned long long)m.v[i]);
        printf("\n");
        for (int i = 0; i < 4; ++i) printf("%016llx ", (unsigned long long)s.v[i]);
        printf("\n");
        for (int i = 0; i < 4; ++i) printf("%016llx ", (unsigned long long)d.v[i]);
        printf("\n");
        return 0;
    }
    printf("{\"threads\": %d, \"host\": \"1-vCPU Xeon 2.10GHz (this VM)\"", g_threads);

    auto best = [&](auto fn) {
        double b = 1e30;
        for (int i = 0; i < iters; ++i) { double d = fn(); if (d < b) b = d; }
        return b;
    };

    if (wants("sumcheck_round"))
        printf(", \"sumcheck_round_2p20_s\": %.3f", best([] { return bench_sumcheck_round(20); }));

    RaaOut raa;
    if (wants("raa_encode") || wants("merkle_root") || wants("commit") || wants("open")) {
        double enc_s = 1e30;
        for (int i = 0; i < iters; ++i) {
            raa = bench_raa_encode(10, 10);
            if (raa.secs < enc_s) enc_s = raa.secs;
        }
        if (wants("raa_encode")) printf(", \"raa_encode_2p20_s\": %.3f", enc_s);
        if (wants("merkle_root") || wants("commit")) {
            double mk = best([&] { return bench_merkle(raa.enc, raa.rows, raa.cw); });
            if (wants("merkle_root")) printf(", \"merkle_2p21_leaves_s\": %.3f", mk);
            if (wants("commit")) printf(", \"commit_2p20_s\": %.3f", enc_s + mk);
        }
        if (wants("open"))
            printf(", \"open_2p20_s\": %.3f",
                   best([&] { return bench_open(raa.enc, raa.rows, raa.cw, 1024); }));
    }
    printf("}\n");
    return 0;
}
