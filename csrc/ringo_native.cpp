// Native host kernels for ringo_tpu: exact CRT reconstruction and l2-norm
// accumulation over balanced big integers.
//
// The verifier's norm checks (reference jindo/verifier.go:262-282) walk every
// RNS coefficient, reconstruct the balanced big integer, and accumulate its
// square — a Python big-int loop on the host path.  This module does the
// same math in fixed-width u64 words with __int128 intermediates:
//
//   y_l  = r_l * (Q/q_l)^{-1} mod q_l          (exact fast base conversion)
//   acc  = sum_l y_l * (Q/q_l)                 (< L*Q, multiword)
//   acc mod Q, balanced to (-Q/2, Q/2]
//   norm_acc += acc^2
//
// Compiled on first use by ringo_tpu.native (g++ -O3 -shared); a pure-Python
// fallback keeps the library dependency-free.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

// a[0..W) -= b[0..W); returns borrow
inline u64 sub_words(u64* a, const u64* b, int64_t W) {
    u64 borrow = 0;
    for (int64_t i = 0; i < W; i++) {
        u64 bi = b[i] + borrow;
        borrow = (bi < borrow) || (a[i] < bi);
        a[i] -= bi;
    }
    return borrow;
}

// compare a >= b
inline bool geq_words(const u64* a, const u64* b, int64_t W) {
    for (int64_t i = W - 1; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

// balanced CRT reconstruction of one coefficient: residues r_l at stride
// `stride`, result magnitude in acc[0..W) (acc has W+1 words of scratch),
// returns the sign.  Same math as crt_norm_sq's inner loop.
inline bool reconstruct_one(const u64* res, int64_t stride, int64_t L,
                            const u64* primes, const u64* tinv,
                            const u64* qdiv, const u64* Qw, const u64* Qhalf,
                            int64_t W, u64* acc) {
    std::memset(acc, 0, sizeof(u64) * (W + 1));
    for (int64_t l = 0; l < L; l++) {
        u64 r = res[l * stride];
        u64 y = (u64)(((u128)r * tinv[l]) % primes[l]);
        const u64* g = qdiv + l * W;
        u128 carry = 0;
        for (int64_t j = 0; j < W; j++) {
            u128 t = (u128)y * g[j] + acc[j] + carry;
            acc[j] = (u64)t;
            carry = t >> 64;
        }
        acc[W] += (u64)carry;
    }
    while (acc[W] != 0 || geq_words(acc, Qw, W)) {
        u64 borrow = sub_words(acc, Qw, W);
        acc[W] -= borrow;
    }
    bool neg = geq_words(acc, Qhalf, W);
    if (neg) {
        u64 tmp[72];
        std::memcpy(tmp, Qw, sizeof(u64) * W);
        sub_words(tmp, acc, W);
        std::memcpy(acc, tmp, sizeof(u64) * W);
    }
    return neg;
}

// dst[0..Wd) += a[0..Wa) * b[0..Wb) (schoolbook; caller guarantees
// Wa + Wb <= Wd and no overflow of the top word)
inline void mac_words(u64* dst, const u64* a, int64_t Wa,
                      const u64* b, int64_t Wb, int64_t Wd) {
    for (int64_t i = 0; i < Wa; i++) {
        if (a[i] == 0) continue;
        u128 carry = 0;
        for (int64_t j = 0; j < Wb; j++) {
            u128 t = (u128)a[i] * b[j] + dst[i + j] + carry;
            dst[i + j] = (u64)t;
            carry = t >> 64;
        }
        int64_t j = i + Wb;
        while (carry && j < Wd) {
            u128 t = (u128)dst[j] + (u64)carry;
            dst[j] = (u64)t;
            carry = (carry >> 64) + (t >> 64);
            j++;
        }
    }
}

}  // namespace

extern "C" {

// residues: [L][n] row-major; qdiv: [L][W] words of Q/q_l; tinv: [L];
// primes: [L]; Qw, Qhalf: [W]; out_mag: [n][W] or null; out_neg: [n] or
// null; norm_acc: [2W+2] (caller-owned, accumulated into).
// Returns 0 on success.
int crt_norm_sq(const u64* residues, int64_t L, int64_t n,
                const u64* primes, const u64* tinv, const u64* qdiv,
                const u64* Qw, const u64* Qhalf, int64_t W,
                u64* out_mag, uint8_t* out_neg, u64* norm_acc) {
    u64 acc[72];
    u64 sq[146];
    if (W > 64) return -1;
    for (int64_t i = 0; i < n; i++) {
        std::memset(acc, 0, sizeof(u64) * (W + 1));
        for (int64_t l = 0; l < L; l++) {
            u64 r = residues[l * n + i];
            u64 y = (u64)(((u128)r * tinv[l]) % primes[l]);
            // acc += y * qdiv[l]
            const u64* g = qdiv + l * W;
            u128 carry = 0;
            for (int64_t j = 0; j < W; j++) {
                u128 t = (u128)y * g[j] + acc[j] + carry;
                acc[j] = (u64)t;
                carry = t >> 64;
            }
            acc[W] += (u64)carry;
        }
        // reduce mod Q: acc < L*Q, subtract Q while acc >= Q
        while (acc[W] != 0 || geq_words(acc, Qw, W)) {
            u64 borrow = sub_words(acc, Qw, W);
            acc[W] -= borrow;
        }
        // balanced: negative iff acc >= floor(Q/2), matching
        // RnsReconstructor.reconstruct (rings/rns.py)
        bool neg = geq_words(acc, Qhalf, W);
        if (neg) {
            u64 tmp[72];
            std::memcpy(tmp, Qw, sizeof(u64) * W);
            sub_words(tmp, acc, W);
            std::memcpy(acc, tmp, sizeof(u64) * W);
        }
        if (out_mag) std::memcpy(out_mag + i * W, acc, sizeof(u64) * W);
        if (out_neg) out_neg[i] = neg ? 1 : 0;
        // norm_acc += acc^2 (schoolbook)
        for (int64_t a = 0; a < W; a++) {
            if (acc[a] == 0) continue;
            u128 carry = 0;
            for (int64_t b = 0; b < W; b++) {
                u128 t = (u128)acc[a] * acc[b] + norm_acc[a + b] + carry;
                norm_acc[a + b] = (u64)t;
                carry = t >> 64;
            }
            int64_t j = a + W;
            while (carry) {
                u128 t = (u128)norm_acc[j] + (u64)carry;
                norm_acc[j] = (u64)t;
                carry = (carry >> 64) + (t >> 64);
                j++;
            }
        }
        (void)sq;
    }
    return 0;
}

// Decoded-evaluation accumulation for the verifier's fourth check
// (reference verifyEval, jindo/verifier.go:224-259): for every column i of
// the partial products, reconstruct the balanced coefficients c_j, decode
// slot s as val[i][s] = sum_jd c[jd*slots+s] * b^jd (exact, unreduced),
// and accumulate right[i*slots+s] * val[i][s] into a positive and a
// negative multiword accumulator.  The caller finishes with one
// (pos - neg) mod p in Python.
//
// residues: [L][cols*d] row-major plain residues; bpow: [k][Wp] words of
// b^jd; right: [cols*slots][Wp] words (values reduced mod p, so < p);
// acc_pos/acc_neg: [WA] caller-zeroed.
int decode_eval_acc(const u64* residues, int64_t L, int64_t cols, int64_t d,
                    const u64* primes, const u64* tinv, const u64* qdiv,
                    const u64* Qw, const u64* Qhalf, int64_t W,
                    const u64* bpow, int64_t k, int64_t Wp, int64_t slots,
                    const u64* right, u64* acc_pos, u64* acc_neg,
                    int64_t WA) {
    if (W > 64 || k * slots != d) return -1;
    const int64_t Wv = W + Wp + 1;  // |val| <= k * (Q/2) * b^(k-1) < k*Q*p
    if (Wv + Wp + 1 > WA) return -2;
    std::vector<u64> val(2 * slots * Wv);
    u64 acc[72];
    for (int64_t i = 0; i < cols; i++) {
        std::memset(val.data(), 0, sizeof(u64) * val.size());
        for (int64_t j = 0; j < d; j++) {
            bool neg = reconstruct_one(residues + i * d + j, cols * d, L,
                                       primes, tinv, qdiv, Qw, Qhalf, W, acc);
            int64_t jd = j / slots, s = j % slots;
            u64* dst = val.data() + ((neg ? slots : 0) + s) * Wv;
            mac_words(dst, acc, W, bpow + jd * Wp, Wp, Wv);
        }
        for (int64_t s = 0; s < slots; s++) {
            const u64* r = right + (i * slots + s) * Wp;
            mac_words(acc_pos, val.data() + s * Wv, Wv, r, Wp, WA);
            mac_words(acc_neg, val.data() + (slots + s) * Wv, Wv, r, Wp, WA);
        }
    }
    return 0;
}

}  // extern "C"
