// mm2tpu native runtime: exact host-side kernels for the paths that stay
// on CPU (the reference's "software path"). Semantics follow the Python
// reference implementations in mm2tpu/ops/chain_ref.py and
// mm2tpu/index/sketch.py, which are parity-tested against the reference
// binary (chain.c:184-238, sketch.c:77-143).
//
// Build: make -C native   (produces libmm2tpu.so, loaded via ctypes)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <utility>
#include <thread>
#include <atomic>
#if defined(__BMI2__) || defined(__AVX512BW__)
#include <immintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Exact anchor-chaining DP with max_skip/max_iter heuristics.
// a_x/a_y: packed anchors (sorted by unsigned a_x). Outputs f/p/v sized n.
// ---------------------------------------------------------------------------
void mm2_chain_exact(int64_t n, int32_t max_dist_x, int32_t max_dist_y,
                     int32_t bw, int32_t max_skip, int32_t max_iter,
                     float gap_scale, int32_t is_cdna, int32_t n_segs,
                     const uint64_t *a_x, const uint64_t *a_y,
                     int32_t *f, int32_t *p, int32_t *v) {
    if (n <= 0) return;
    uint64_t sum_qspan = 0;
    for (int64_t i = 0; i < n; ++i) sum_qspan += (a_y[i] >> 32) & 0xff;
    float avg_qspan = (float)(0.01 * (double)(float)sum_qspan / (double)n);

    std::vector<int64_t> t(n, 0);
    const bool multi_other = (n_segs > 1) && !is_cdna;
#if defined(__AVX512F__) && defined(__AVX512CD__)
    // Vector fast path for the hot regime (uniseg, non-cDNA, unit gap
    // scale — the map/ava presets): predecessor scores for 16 j's are
    // computed branch-free in AVX-512 (the ~20-op scoring body), then a
    // short scalar pass applies the order-dependent max_skip/t[]
    // bookkeeping (chain.c:150-159) on the buffered scores — identical
    // results, including which j's the heuristic visits.
    if (!is_cdna && n_segs == 1 && gap_scale == 1.0f) {
        std::vector<int32_t> axl((size_t)n), qyl((size_t)n);
        for (int64_t k2 = 0; k2 < n; ++k2) {
            axl[(size_t)k2] = (int32_t)(uint32_t)a_x[k2];
            qyl[(size_t)k2] = (int32_t)a_y[k2];
        }
        const __m512i vzero = _mm512_setzero_si512();
        const __m512i vNEG = _mm512_set1_epi32(INT32_MIN);
        const __m512 vavg = _mm512_set1_ps(avg_qspan);
        const __m512i vmdy = _mm512_set1_epi32(max_dist_y);
        const __m512i vmdx = _mm512_set1_epi32(max_dist_x);
        const __m512i vbw = _mm512_set1_epi32(bw);
        int32_t scbuf[16];
        int64_t st_v = 0;
        for (int64_t i = 0; i < n; ++i) {
            const int32_t axi = (int32_t)(uint32_t)a_x[i];
            const uint64_t ri = a_x[i];
            const int32_t qi = qyl[(size_t)i];
            const int32_t q_span = (int32_t)((a_y[i] >> 32) & 0xff);
            int32_t max_f = q_span, n_skip = 0;
            int64_t max_j = -1;
            while (st_v < i && ri > a_x[st_v] + (uint64_t)max_dist_x)
                ++st_v;
            int64_t lo = st_v;
            if (i - lo > max_iter) lo = i - max_iter;
            const __m512i vaxi = _mm512_set1_epi32(axi);
            const __m512i vqi = _mm512_set1_epi32(qi);
            const __m512i vspan = _mm512_set1_epi32(q_span);
            bool stop = false;
            for (int64_t b_hi = i; b_hi > lo && !stop;) {
                int64_t b_lo = b_hi - 16 > lo ? b_hi - 16 : lo;
                const int w = (int)(b_hi - b_lo);
                const __mmask16 km =
                    (__mmask16)((w >= 16) ? 0xFFFF : ((1u << w) - 1));
                const __m512i axv = _mm512_maskz_loadu_epi32(
                    km, &axl[(size_t)b_lo]);
                const __m512i qyv = _mm512_maskz_loadu_epi32(
                    km, &qyl[(size_t)b_lo]);
                const __m512i dr = _mm512_sub_epi32(vaxi, axv);
                const __m512i dq = _mm512_sub_epi32(vqi, qyv);
                // dr==0 or dq<=0 skips (same-seg rules): require both > 0
                __mmask16 ok = km & _mm512_cmpgt_epi32_mask(dr, vzero) &
                               _mm512_cmpgt_epi32_mask(dq, vzero);
                ok &= ~_mm512_cmpgt_epi32_mask(dq, vmdy);
                ok &= ~_mm512_cmpgt_epi32_mask(dq, vmdx);
                const __m512i dd = _mm512_abs_epi32(_mm512_sub_epi32(dr, dq));
                ok &= ~_mm512_cmpgt_epi32_mask(dd, vbw);
                // sc = min(min(dq, dr), q_span) - (dd*avg + (log2(dd)>>1))
                __m512i sc = _mm512_min_epi32(_mm512_min_epi32(dq, dr),
                                              vspan);
                const __m512i c_lin = _mm512_cvttps_epi32(
                    _mm512_mul_ps(_mm512_cvtepi32_ps(dd), vavg));
                // log_dd = dd ? 31 - lzcnt(dd) : 0
                const __m512i lz = _mm512_lzcnt_epi32(dd);
                const __m512i log_dd = _mm512_maskz_sub_epi32(
                    _mm512_cmpgt_epi32_mask(dd, vzero),
                    _mm512_set1_epi32(31), lz);
                sc = _mm512_sub_epi32(
                    sc, _mm512_add_epi32(c_lin,
                                         _mm512_srli_epi32(log_dd, 1)));
                sc = _mm512_add_epi32(
                    sc, _mm512_maskz_loadu_epi32(km, &f[b_lo]));
                sc = _mm512_mask_mov_epi32(vNEG, ok, sc);
                _mm512_storeu_si512(scbuf, sc);
                for (int64_t j = b_hi - 1; j >= b_lo; --j) {
                    const int32_t scj = scbuf[j - b_lo];
                    if (scj == INT32_MIN) continue;
                    if (scj > max_f) {
                        max_f = scj;
                        max_j = j;
                        if (n_skip > 0) --n_skip;
                    } else if (t[j] == i) {
                        if (++n_skip > max_skip) {
                            stop = true;
                            break;
                        }
                    }
                    if (p[j] >= 0) t[p[j]] = i;
                }
                b_hi = b_lo;
            }
            f[i] = max_f;
            p[i] = (int32_t)max_j;
            v[i] = (max_j >= 0 && v[max_j] > max_f) ? v[max_j] : max_f;
        }
        return;
    }
#endif
    int64_t st = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t ri = a_x[i];
        int32_t qi = (int32_t)a_y[i];
        int32_t q_span = (int32_t)((a_y[i] >> 32) & 0xff);
        int32_t sidi = (int32_t)((a_y[i] >> 48) & 0xff);
        int32_t max_f = q_span, n_skip = 0;
        int64_t max_j = -1;
        while (st < i && ri > a_x[st] + (uint64_t)max_dist_x) ++st;
        int64_t lo = st;
        if (i - lo > max_iter) lo = i - max_iter;
        for (int64_t j = i - 1; j >= lo; --j) {
            int64_t dr = (int64_t)(ri - a_x[j]);
            int32_t dq = qi - (int32_t)a_y[j];
            int32_t sidj = (int32_t)((a_y[j] >> 48) & 0xff);
            bool same = sidi == sidj;
            if ((same && dr == 0) || dq <= 0) continue;
            if ((same && dq > max_dist_y) || dq > max_dist_x) continue;
            int32_t dd = (int32_t)(dr > dq ? dr - dq : dq - dr);
            if (same && dd > bw) continue;
            if (multi_other && same && dr > max_dist_y) continue;
            int32_t min_d = dq < dr ? dq : (int32_t)dr;
            int32_t sc = min_d > q_span ? q_span : min_d;
            int32_t log_dd = dd ? 31 - __builtin_clz((uint32_t)dd) : 0;
            int32_t gap_cost;
            if (is_cdna || !same) {
                int32_t c_lin = (int32_t)((float)dd * avg_qspan);
                int32_t c_log = log_dd;
                if (!same && dr == 0) { ++sc; gap_cost = 0; }
                else if (dr > dq || !same) gap_cost = c_lin < c_log ? c_lin : c_log;
                else gap_cost = c_lin + (c_log >> 1);
            } else {
                gap_cost = (int32_t)((float)dd * avg_qspan) + (log_dd >> 1);
            }
            sc -= (int32_t)((double)gap_cost * gap_scale + .499);
            sc += f[j];
            if (sc > max_f) {
                max_f = sc; max_j = j;
                if (n_skip > 0) --n_skip;
            } else if (t[j] == i) {
                if (++n_skip > max_skip) break;
            }
            if (p[j] >= 0) t[p[j]] = i;
        }
        f[i] = max_f;
        p[i] = (int32_t)max_j;
        v[i] = (max_j >= 0 && v[max_j] > max_f) ? v[max_j] : max_f;
    }
}

// Interleaved-anchor entry: `a` is the (n,2) x,y array exactly as the
// mapping layer holds it, so the Python side ships one raw pointer
// instead of materializing two strided-column copies per read. The
// split into x/y planes happens here, in one cache-friendly pass.
void mm2_chain_exact2(int64_t n, int32_t max_dist_x, int32_t max_dist_y,
                      int32_t bw, int32_t max_skip, int32_t max_iter,
                      float gap_scale, int32_t is_cdna, int32_t n_segs,
                      const uint64_t *a, int32_t *f, int32_t *p,
                      int32_t *v) {
    if (n <= 0) return;
    static thread_local std::vector<uint64_t> ax, ay;
    ax.resize((size_t)n);
    ay.resize((size_t)n);
    for (int64_t i = 0; i < n; ++i) {
        ax[(size_t)i] = a[2 * i];
        ay[(size_t)i] = a[2 * i + 1];
    }
    mm2_chain_exact(n, max_dist_x, max_dist_y, bw, max_skip, max_iter,
                    gap_scale, is_cdna, n_segs, ax.data(), ay.data(), f, p,
                    v);
}

// ---------------------------------------------------------------------------
// v[] peak-score carry for device-produced (f, p) arrays (chain.c:110).
// ---------------------------------------------------------------------------
void mm2_v_carry(int64_t n, const int32_t *f, const int32_t *p, int32_t *v) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t pi = p[i];
        v[i] = (pi >= 0 && v[pi] > f[i]) ? v[pi] : f[i];
    }
}

// ---------------------------------------------------------------------------
// (w,k)-minimizer sketch over nt4 codes (0-4). Exact emission semantics of
// mm2tpu/index/sketch.py. Writes (x, y) pairs; returns count (or -needed
// if cap is too small).
// ---------------------------------------------------------------------------
static inline uint64_t hash64(uint64_t key, uint64_t mask) {
    key = (~key + (key << 21)) & mask;
    key = key ^ key >> 24;
    key = ((key + (key << 3)) + (key << 8)) & mask;
    key = key ^ key >> 14;
    key = ((key + (key << 2)) + (key << 4)) & mask;
    key = key ^ key >> 28;
    key = (key + (key << 31)) & mask;
    return key;
}

int64_t mm2_sketch(const uint8_t *codes, int64_t len, int32_t w, int32_t k,
                   uint32_t rid, int32_t is_hpc, uint64_t *out_x,
                   uint64_t *out_y, int64_t cap) {
    if (len <= 0 || w <= 0 || w >= 256 || k <= 0 || k > 28) return -1;
    const uint64_t U64MAX = ~0ULL;
    const int shift1 = 2 * (k - 1);
    const uint64_t mask = (1ULL << (2 * k)) - 1;
    uint64_t kmer0 = 0, kmer1 = 0;
    struct Entry { uint64_t x, y; };
    std::vector<Entry> buf(w, {U64MAX, U64MAX});
    int tq[32]; int tq_front = 0, tq_count = 0;
    int64_t n_out = 0;
    auto emit = [&](uint64_t x, uint64_t y) {
        if (n_out < cap) { out_x[n_out] = x; out_y[n_out] = y; }
        ++n_out;
    };
    int l = 0, buf_pos = 0, min_pos = 0, kmer_span = 0;
    Entry mn = {U64MAX, U64MAX};
    uint64_t rid_hi = ((uint64_t)rid) << 32;
    for (int64_t i = 0; i < len; ++i) {
        int c = codes[i];
        Entry info = {U64MAX, U64MAX};
        if (c < 4) {
            if (is_hpc) {
                int skip_len = 1;
                if (i + 1 < len && codes[i + 1] == c) {
                    skip_len = 2;
                    while (i + skip_len < len && codes[i + skip_len] == c)
                        ++skip_len;
                    i += skip_len - 1;
                }
                tq[(tq_front + tq_count++) & 0x1f] = skip_len;
                kmer_span += skip_len;
                if (tq_count > k) {
                    kmer_span -= tq[tq_front++];
                    tq_front &= 0x1f;
                    --tq_count;
                }
            } else {
                kmer_span = l + 1 < k ? l + 1 : k;
            }
            kmer0 = ((kmer0 << 2) | (uint64_t)c) & mask;
            kmer1 = (kmer1 >> 2) | (((uint64_t)(3 ^ c)) << shift1);
            if (kmer0 == kmer1) continue;  // symmetric k-mer
            int z = kmer0 < kmer1 ? 0 : 1;
            ++l;
            if (l >= k && kmer_span < 256) {
                info.x = hash64(z ? kmer1 : kmer0, mask) << 8 | (uint64_t)kmer_span;
                info.y = rid_hi | ((uint64_t)(uint32_t)i << 1) | (uint64_t)z;
            }
        } else {
            l = 0; tq_front = tq_count = 0; kmer_span = 0;
        }
        buf[buf_pos] = info;
        if (l == w + k - 1 && mn.x != U64MAX) {
            for (int j = buf_pos + 1; j < w; ++j)
                if (mn.x == buf[j].x && buf[j].y != mn.y) emit(buf[j].x, buf[j].y);
            for (int j = 0; j < buf_pos; ++j)
                if (mn.x == buf[j].x && buf[j].y != mn.y) emit(buf[j].x, buf[j].y);
        }
        if (info.x <= mn.x) {
            if (l >= w + k && mn.x != U64MAX) emit(mn.x, mn.y);
            mn = info; min_pos = buf_pos;
        } else if (buf_pos == min_pos) {
            if (l >= w + k - 1 && mn.x != U64MAX) emit(mn.x, mn.y);
            mn.x = U64MAX;
            for (int j = buf_pos + 1; j < w; ++j)
                if (mn.x >= buf[j].x) { mn = buf[j]; min_pos = j; }
            for (int j = 0; j <= buf_pos; ++j)
                if (mn.x >= buf[j].x) { mn = buf[j]; min_pos = j; }
            if (l >= w + k - 1 && mn.x != U64MAX) {
                for (int j = buf_pos + 1; j < w; ++j)
                    if (mn.x == buf[j].x && mn.y != buf[j].y) emit(buf[j].x, buf[j].y);
                for (int j = 0; j <= buf_pos; ++j)
                    if (mn.x == buf[j].x && mn.y != buf[j].y) emit(buf[j].x, buf[j].y);
            }
        }
        if (++buf_pos == w) buf_pos = 0;
    }
    if (mn.x != U64MAX) emit(mn.x, mn.y);
    return n_out <= cap ? n_out : -n_out;
}

// ---------------------------------------------------------------------
// ksw2 extd2 (dual affine) extension DP — scalar C++ with the exact
// observable semantics of the SSE4.1 build (see ops/ksw2_ref.py, which
// this mirrors line for line; the numpy port is the tested oracle).
// Covers extz2 too via the equal-cost identity (q2=q, e2=e).

static const int32_t MM2_NEG_INF = -0x40000000;

enum {
    EZ_SCORE_ONLY = 0x01, EZ_RIGHT = 0x02, EZ_GENERIC_SC = 0x04,
    EZ_APPROX_MAX = 0x08, EZ_APPROX_DROP = 0x10, EZ_EXTZ_ONLY = 0x40,
    EZ_REV_CIGAR = 0x80,
};

struct Ez {
    int64_t max_;
    int32_t zdropped, max_q, max_t;
    int64_t mqe;
    int32_t mqe_t;
    int64_t mte;
    int32_t mte_q;
    int64_t score;
    int32_t reach_end;
};

// The SIMD exact-max update over one anti-diagonal, including the SSE
// build's 4-lane tie-breaking (extd2 l.326-358; shared with exts2).
// (exact_max_scan moved below: templated over the row element type)


static bool apply_zdrop(Ez &ez, int64_t H, int32_t r, int32_t t,
                        int32_t zdrop, int32_t e) {
    if (H > ez.max_) {
        ez.max_ = H;
        ez.max_t = t;
        ez.max_q = r - t;
    } else if (t >= ez.max_t && r - t >= ez.max_q) {
        int32_t tl = t - ez.max_t, ql = (r - t) - ez.max_q;
        int32_t l = tl > ql ? tl - ql : ql - tl;
        if (zdrop >= 0 && ez.max_ - H > zdrop + (int64_t)l * e) {
            ez.zdropped = 1;
            return true;
        }
    }
    return false;
}

static void push_cigar(uint32_t *&cig, int32_t &n, int32_t &cap,
                       int32_t op, int32_t len) {
    if (n == 0 || op != (int32_t)(cig[n - 1] & 0xF)) {
        if (n == cap) {
            cap = cap ? cap << 1 : 64;
            cig = (uint32_t *)realloc(cig, cap * sizeof(uint32_t));
        }
        cig[n++] = (uint32_t)len << 4 | op;
    } else {
        cig[n - 1] += (uint32_t)len << 4;
    }
}

}  // extern "C" (template below needs C++ linkage)

template <typename T>
static void exact_max_scan(int64_t *H, const T *u, const T *v,
                           int32_t st0, int32_t en0, int64_t *out_H,
                           int32_t *out_t) {
    if (en0 > 0)
        H[en0] = H[en0 - 1] + u[en0];
    else
        H[en0] = H[en0] + v[en0];
    int64_t max_H = H[en0];
    int32_t max_t = en0;
    int32_t en1 = st0 + (en0 - st0) / 4 * 4;
    int64_t lane_best[4];
    int32_t lane_t[4];
    for (int l = 0; l < 4; ++l) {
        lane_best[l] = max_H;
        lane_t[l] = max_t;
    }
    for (int32_t t = st0; t < en1; ++t) H[t] += v[t];
    for (int l = 0; l < 4; ++l) {
        int64_t best = MM2_NEG_INF;
        int32_t bt = -1;
        for (int32_t t = st0 + l; t < en1; t += 4)
            if (H[t] > best) {
                best = H[t];
                bt = t;
            }
        if (bt >= 0 && best > lane_best[l]) {
            lane_best[l] = best;
            lane_t[l] = bt;
        }
    }
    for (int l = 0; l < 4; ++l)
        if (max_H < lane_best[l]) {
            max_H = lane_best[l];
            max_t = lane_t[l];
        }
    for (int32_t t = en1; t < en0; ++t) {
        H[t] += v[t];
        if (H[t] > max_H) {
            max_H = H[t];
            max_t = t;
        }
    }
    *out_H = max_H;
    *out_t = max_t;
}


// band score-profile row s[t] = score(sf[t], qr[qoff+t]) with N handling.
// int8 uses masked 64-byte AVX-512 blocks (the varying-trip-count fix of
// extd2_row_i8_avx512: loads overrun into padded scratch, stores masked);
// other widths keep the auto-vectorized form.
template <typename T>
__attribute__((always_inline)) static inline void profile_row(
    int32_t st0, int32_t en0, const T *__restrict sfp,
    const T *__restrict qrq, T *__restrict sp, T nval, T sN, T sM, T sX) {
#if defined(__AVX512BW__)
    if constexpr (sizeof(T) == 1) {
        const __m512i vn_ = _mm512_set1_epi8((int8_t)nval);
        const __m512i vN = _mm512_set1_epi8((int8_t)sN);
        const __m512i vM = _mm512_set1_epi8((int8_t)sM);
        const __m512i vX = _mm512_set1_epi8((int8_t)sX);
        for (int32_t t = st0; t <= en0; t += 64) {
            const int32_t rem = en0 - t + 1;
            const __mmask64 k = rem >= 64
                                    ? ~(__mmask64)0
                                    : (~(__mmask64)0 >> (64 - rem));
            const __m512i sq = _mm512_loadu_si512((const int8_t *)sfp + t);
            const __m512i stq = _mm512_loadu_si512((const int8_t *)qrq + t);
            const __mmask64 isn = _mm512_cmpeq_epi8_mask(sq, vn_) |
                                  _mm512_cmpeq_epi8_mask(stq, vn_);
            const __mmask64 eq = _mm512_cmpeq_epi8_mask(sq, stq);
            __m512i val = _mm512_mask_mov_epi8(vX, eq, vM);
            val = _mm512_mask_mov_epi8(val, isn, vN);
            _mm512_mask_storeu_epi8((int8_t *)sp + t, k, val);
        }
        return;
    }
#endif
    int32_t en16 = (en0 - st0) / 16 * 16 + st0 + 15;
    for (int32_t t = st0; t <= en16; ++t) {
        T sq = sfp[t];
        T stq = qrq[t];
        T isn = (T)-(int32_t)((sq == nval) | (stq == nval));
        T eq = (T)-(int32_t)(sq == stq);
        sp[t] = (T)((isn & sN) | (T)(~isn & (T)((eq & sM) | (T)(~eq & sX))));
    }
}

// One anti-diagonal of the extd2 difference DP, elementwise over the band.
// Old-row values arrive via scratch copies (xs/vs/x2s are shifted by one:
// index i holds the t-1 slot, with the band-edge boundary in slot 0), so
// in-place writes to u/v/x/y/x2/y2 keep the exact stale-lane semantics of
// the 16-lane SSE build. The loop body is branch-free; with __restrict
// the compiler vectorizes it (AVX-512: 16 cells/iteration).
template <bool WITH_CIGAR, bool RIGHT, typename T = int32_t>
__attribute__((always_inline)) static inline void extd2_row(int32_t W, const T *__restrict sr,
                      const T *__restrict xs,
                      const T *__restrict vs,
                      const T *__restrict x2s,
                      const T *__restrict uo,
                      const T *__restrict yo,
                      const T *__restrict y2o,
                      T *__restrict un, T *__restrict vn,
                      T *__restrict xn, T *__restrict yn,
                      T *__restrict x2n, T *__restrict y2n,
                      uint8_t *__restrict pr, T sc_mch, T q,
                      T e, T q2, T e2) {
    // all arithmetic stays in T: with T=int8_t the compiler emits byte
    // vectors (4x the lane width of int32). The int8 variant is only
    // selected when the scoring parameters bound every value/sum away
    // from the int8 limits (see ksw_extd2_impl's dispatch), so wrapping
    // -vs- the SSE build's saturating ops can never be observed.
    for (int32_t i = 0; i < W; ++i) {
        T z = sr[i];
        T a = (T)(xs[i] + vs[i]), b = (T)(yo[i] + uo[i]);
        T a2 = (T)(x2s[i] + vs[i]), b2 = (T)(y2o[i] + uo[i]);
        T d = 0;
        if (WITH_CIGAR) {
            if (!RIGHT) {
                d = a > z ? 1 : 0;
                z = a > z ? a : z;
                d = b > z ? 2 : d;
                z = b > z ? b : z;
                d = a2 > z ? 3 : d;
                z = a2 > z ? a2 : z;
                d = b2 > z ? 4 : d;
                z = b2 > z ? b2 : z;
            } else {
                d = z > a ? 0 : 1;
                z = z > a ? z : a;
                d = z > b ? d : 2;
                z = z > b ? z : b;
                d = z > a2 ? d : 3;
                z = z > a2 ? z : a2;
                d = z > b2 ? d : 4;
                z = z > b2 ? z : b2;
            }
        } else {
            z = a > z ? a : z;
            z = b > z ? b : z;
            z = a2 > z ? a2 : z;
            z = b2 > z ? b2 : z;
        }
        z = z < sc_mch ? z : sc_mch;
        un[i] = (T)(z - vs[i]);
        vn[i] = (T)(z - uo[i]);
        T t1 = (T)(z - q), t2 = (T)(z - q2);
        a = (T)(a - t1);
        b = (T)(b - t1);
        a2 = (T)(a2 - t2);
        b2 = (T)(b2 - t2);
        bool ga, gb, ga2, gb2;
        if (!RIGHT) {
            ga = a > 0;
            gb = b > 0;
            ga2 = a2 > 0;
            gb2 = b2 > 0;
        } else {
            ga = a >= 0;
            gb = b >= 0;
            ga2 = a2 >= 0;
            gb2 = b2 >= 0;
        }
        xn[i] = (T)((ga ? a : 0) - (q + e));
        yn[i] = (T)((gb ? b : 0) - (q + e));
        x2n[i] = (T)((ga2 ? a2 : 0) - (q2 + e2));
        y2n[i] = (T)((gb2 ? b2 : 0) - (q2 + e2));
        if (WITH_CIGAR)
            pr[i] = (uint8_t)(d | (ga ? 0x08 : 0) | (gb ? 0x10 : 0) |
                              (ga2 ? 0x20 : 0) | (gb2 ? 0x40 : 0));
    }
}

#if defined(__AVX512BW__)
// AVX-512BW int8 row: fixed 64-byte blocks with a masked tail store.
// The auto-vectorized template above is fast only at a CONSTANT trip
// count; in a real fill the band width changes every row and its
// prologue/epilogue branches mispredict (~200 ns/row measured vs 18 ns
// at constant width). Masked stores make the trip count uniform per
// block: loads may read up to 63 B past W into adjacent arena scratch
// (reserve() keeps tail slack), every store is masked. Semantics are
// bit-identical to extd2_row<.,.,int8_t> (wrapping int8 arithmetic,
// envelope-guarded by the caller's datapath selection).
template <bool WITH_CIGAR, bool RIGHT>
static inline void extd2_row_i8_avx512(
    int32_t W, const int8_t *__restrict sr, const int8_t *__restrict xs,
    const int8_t *__restrict vs, const int8_t *__restrict x2s,
    const int8_t *__restrict uo, const int8_t *__restrict yo,
    const int8_t *__restrict y2o, int8_t *__restrict un,
    int8_t *__restrict vn, int8_t *__restrict xn, int8_t *__restrict yn,
    int8_t *__restrict x2n, int8_t *__restrict y2n,
    uint8_t *__restrict pr, int8_t sc_mch, int8_t q, int8_t e, int8_t q2,
    int8_t e2) {
    const __m512i vsc = _mm512_set1_epi8(sc_mch);
    const __m512i vq = _mm512_set1_epi8(q);
    const __m512i vq2 = _mm512_set1_epi8(q2);
    const __m512i vqe = _mm512_set1_epi8((int8_t)(q + e));
    const __m512i vq2e2 = _mm512_set1_epi8((int8_t)(q2 + e2));
    const __m512i zero = _mm512_setzero_si512();
    const __m512i one = _mm512_set1_epi8(1), two = _mm512_set1_epi8(2);
    const __m512i three = _mm512_set1_epi8(3), four = _mm512_set1_epi8(4);
    const __m512i f08 = _mm512_set1_epi8(0x08), f10 = _mm512_set1_epi8(0x10);
    const __m512i f20 = _mm512_set1_epi8(0x20), f40 = _mm512_set1_epi8(0x40);
    // ties: !RIGHT keeps the current state (new wins only on >, NLE);
    // RIGHT prefers the later state (new wins on >=, NLT)
    const int CMP = RIGHT ? _MM_CMPINT_NLT : _MM_CMPINT_NLE;
    for (int32_t i = 0; i < W; i += 64) {
        const __mmask64 k =
            (W - i >= 64) ? ~(__mmask64)0
                          : (~(__mmask64)0 >> (64 - (W - i)));
        __m512i z = _mm512_loadu_si512(sr + i);
        const __m512i xv = _mm512_loadu_si512(xs + i);
        const __m512i vv = _mm512_loadu_si512(vs + i);
        const __m512i x2v = _mm512_loadu_si512(x2s + i);
        const __m512i uv = _mm512_loadu_si512(uo + i);
        const __m512i yv = _mm512_loadu_si512(yo + i);
        const __m512i y2v = _mm512_loadu_si512(y2o + i);
        __m512i a = _mm512_add_epi8(xv, vv);
        __m512i b = _mm512_add_epi8(yv, uv);
        __m512i a2 = _mm512_add_epi8(x2v, vv);
        __m512i b2 = _mm512_add_epi8(y2v, uv);
        __m512i dv = zero;
        {
            const __mmask64 m1 = _mm512_cmp_epi8_mask(a, z, CMP);
            z = _mm512_mask_mov_epi8(z, m1, a);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m1, one);
            const __mmask64 m2 = _mm512_cmp_epi8_mask(b, z, CMP);
            z = _mm512_mask_mov_epi8(z, m2, b);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m2, two);
            const __mmask64 m3 = _mm512_cmp_epi8_mask(a2, z, CMP);
            z = _mm512_mask_mov_epi8(z, m3, a2);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m3, three);
            const __mmask64 m4 = _mm512_cmp_epi8_mask(b2, z, CMP);
            z = _mm512_mask_mov_epi8(z, m4, b2);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m4, four);
        }
        z = _mm512_min_epi8(z, vsc);
        _mm512_mask_storeu_epi8(un + i, k, _mm512_sub_epi8(z, vv));
        _mm512_mask_storeu_epi8(vn + i, k, _mm512_sub_epi8(z, uv));
        const __m512i t1 = _mm512_sub_epi8(z, vq);
        const __m512i t2 = _mm512_sub_epi8(z, vq2);
        a = _mm512_sub_epi8(a, t1);
        b = _mm512_sub_epi8(b, t1);
        a2 = _mm512_sub_epi8(a2, t2);
        b2 = _mm512_sub_epi8(b2, t2);
        // gap-open gates: !RIGHT keeps the gap only on > 0, RIGHT on >= 0
        const int GC = RIGHT ? _MM_CMPINT_NLT : _MM_CMPINT_NLE;
        const __mmask64 ga = _mm512_cmp_epi8_mask(a, zero, GC);
        const __mmask64 gb = _mm512_cmp_epi8_mask(b, zero, GC);
        const __mmask64 ga2 = _mm512_cmp_epi8_mask(a2, zero, GC);
        const __mmask64 gb2 = _mm512_cmp_epi8_mask(b2, zero, GC);
        _mm512_mask_storeu_epi8(
            xn + i, k,
            _mm512_sub_epi8(_mm512_maskz_mov_epi8(ga, a), vqe));
        _mm512_mask_storeu_epi8(
            yn + i, k,
            _mm512_sub_epi8(_mm512_maskz_mov_epi8(gb, b), vqe));
        _mm512_mask_storeu_epi8(
            x2n + i, k,
            _mm512_sub_epi8(_mm512_maskz_mov_epi8(ga2, a2), vq2e2));
        _mm512_mask_storeu_epi8(
            y2n + i, k,
            _mm512_sub_epi8(_mm512_maskz_mov_epi8(gb2, b2), vq2e2));
        if (WITH_CIGAR) {
            __m512i p8 = _mm512_or_si512(dv, _mm512_maskz_mov_epi8(ga, f08));
            p8 = _mm512_or_si512(p8, _mm512_maskz_mov_epi8(gb, f10));
            p8 = _mm512_or_si512(p8, _mm512_maskz_mov_epi8(ga2, f20));
            p8 = _mm512_or_si512(p8, _mm512_maskz_mov_epi8(gb2, f40));
            _mm512_mask_storeu_epi8(pr + i, k, p8);
        }
    }
}
#endif  // __AVX512BW__

// dispatch: int8 rows take the masked-store AVX-512 kernel when the
// build has it; everything else uses the generic template
template <bool WITH_CIGAR, bool RIGHT, typename T>
__attribute__((always_inline)) static inline void extd2_row_d(
    int32_t W, const T *sr, const T *xs, const T *vs, const T *x2s,
    const T *uo, const T *yo, const T *y2o, T *un, T *vn, T *xn, T *yn,
    T *x2n, T *y2n, uint8_t *pr, T sc_mch, T q, T e, T q2, T e2) {
#if defined(__AVX512BW__)
    if constexpr (sizeof(T) == 1) {
        extd2_row_i8_avx512<WITH_CIGAR, RIGHT>(
            W, (const int8_t *)sr, (const int8_t *)xs, (const int8_t *)vs,
            (const int8_t *)x2s, (const int8_t *)uo, (const int8_t *)yo,
            (const int8_t *)y2o, (int8_t *)un, (int8_t *)vn, (int8_t *)xn,
            (int8_t *)yn, (int8_t *)x2n, (int8_t *)y2n, pr, (int8_t)sc_mch,
            (int8_t)q, (int8_t)e, (int8_t)q2, (int8_t)e2);
        return;
    }
#endif
    extd2_row<WITH_CIGAR, RIGHT, T>(W, sr, xs, vs, x2s, uo, yo, y2o, un,
                                    vn, xn, yn, x2n, y2n, pr, sc_mch, q, e,
                                    q2, e2);
}

#if defined(__AVX512BW__)
// AVX-512BW int8 splice row — same uniform-block/masked-store rationale
// as extd2_row_i8_avx512 (the band moves every row; auto-vectorized
// prologue/epilogue branches mispredict on the varying trip count).
// Bit-identical to exts2_row<.,.,int8_t>.
template <bool WITH_CIGAR, bool RIGHT>
static inline void exts2_row_i8_avx512(
    int32_t W, const int8_t *__restrict sr, const int8_t *__restrict xs,
    const int8_t *__restrict vs, const int8_t *__restrict x2s,
    const int8_t *__restrict uo, const int8_t *__restrict yo,
    const int8_t *__restrict dn, const int8_t *__restrict ac,
    int8_t *__restrict un, int8_t *__restrict vn, int8_t *__restrict xn,
    int8_t *__restrict yn, int8_t *__restrict x2n,
    uint8_t *__restrict pr, int8_t q, int8_t e, int8_t q2) {
    const __m512i vq = _mm512_set1_epi8(q);
    const __m512i vq2 = _mm512_set1_epi8(q2);
    const __m512i vqe = _mm512_set1_epi8((int8_t)(q + e));
    const __m512i zero = _mm512_setzero_si512();
    const __m512i one = _mm512_set1_epi8(1), two = _mm512_set1_epi8(2);
    const __m512i three = _mm512_set1_epi8(3);
    const __m512i f08 = _mm512_set1_epi8(0x08), f10 = _mm512_set1_epi8(0x10);
    const __m512i f20 = _mm512_set1_epi8(0x20);
    const int CMP = RIGHT ? _MM_CMPINT_NLT : _MM_CMPINT_NLE;
    for (int32_t i = 0; i < W; i += 64) {
        const __mmask64 k =
            (W - i >= 64) ? ~(__mmask64)0
                          : (~(__mmask64)0 >> (64 - (W - i)));
        __m512i z = _mm512_loadu_si512(sr + i);
        const __m512i xv = _mm512_loadu_si512(xs + i);
        const __m512i vv = _mm512_loadu_si512(vs + i);
        const __m512i x2v = _mm512_loadu_si512(x2s + i);
        const __m512i uv = _mm512_loadu_si512(uo + i);
        const __m512i yv = _mm512_loadu_si512(yo + i);
        const __m512i dnv = _mm512_loadu_si512(dn + i);
        const __m512i acv = _mm512_loadu_si512(ac + i);
        __m512i a = _mm512_add_epi8(xv, vv);
        __m512i b = _mm512_add_epi8(yv, uv);
        __m512i a2 = _mm512_add_epi8(x2v, vv);
        const __m512i a2a = _mm512_add_epi8(a2, acv);
        __m512i dv = zero;
        {
            const __mmask64 m1 = _mm512_cmp_epi8_mask(a, z, CMP);
            z = _mm512_mask_mov_epi8(z, m1, a);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m1, one);
            const __mmask64 m2 = _mm512_cmp_epi8_mask(b, z, CMP);
            z = _mm512_mask_mov_epi8(z, m2, b);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m2, two);
            const __mmask64 m3 = _mm512_cmp_epi8_mask(a2a, z, CMP);
            z = _mm512_mask_mov_epi8(z, m3, a2a);
            if (WITH_CIGAR) dv = _mm512_mask_mov_epi8(dv, m3, three);
        }
        _mm512_mask_storeu_epi8(un + i, k, _mm512_sub_epi8(z, vv));
        _mm512_mask_storeu_epi8(vn + i, k, _mm512_sub_epi8(z, uv));
        const __m512i t1 = _mm512_sub_epi8(z, vq);
        a = _mm512_sub_epi8(a, t1);
        b = _mm512_sub_epi8(b, t1);
        a2 = _mm512_sub_epi8(a2, _mm512_sub_epi8(z, vq2));
        const int GC = RIGHT ? _MM_CMPINT_NLT : _MM_CMPINT_NLE;
        const __mmask64 ga = _mm512_cmp_epi8_mask(a, zero, GC);
        const __mmask64 gb = _mm512_cmp_epi8_mask(b, zero, GC);
        const __mmask64 ga2 = _mm512_cmp_epi8_mask(a2, dnv, GC);
        _mm512_mask_storeu_epi8(
            xn + i, k,
            _mm512_sub_epi8(_mm512_maskz_mov_epi8(ga, a), vqe));
        _mm512_mask_storeu_epi8(
            yn + i, k,
            _mm512_sub_epi8(_mm512_maskz_mov_epi8(gb, b), vqe));
        // x2n = max(a2, dn) - q2; the keep-gap flag is a2 > dn (or >= on
        // RIGHT), but the stored value uses plain max in both variants
        _mm512_mask_storeu_epi8(
            x2n + i, k,
            _mm512_sub_epi8(
                _mm512_mask_mov_epi8(
                    dnv, _mm512_cmpgt_epi8_mask(a2, dnv), a2),
                vq2));
        if (WITH_CIGAR) {
            __m512i p8 = _mm512_or_si512(dv, _mm512_maskz_mov_epi8(ga, f08));
            p8 = _mm512_or_si512(p8, _mm512_maskz_mov_epi8(gb, f10));
            p8 = _mm512_or_si512(p8, _mm512_maskz_mov_epi8(ga2, f20));
            _mm512_mask_storeu_epi8(pr + i, k, p8);
        }
    }
}
#endif  // __AVX512BW__

// One anti-diagonal of the exts2 (splice) difference DP. Same snapshot
// scheme as extd2_row; the second gap state is the intron: opening pays
// q2 at donor sites, closing adds the acceptor score, extension is free,
// and there is no score clip (ksw2_exts2_sse.c semantics, mirrored from
// ops/ksw2_splice_ref.py).
template <bool WITH_CIGAR, bool RIGHT, typename T = int32_t>
__attribute__((always_inline)) static inline void exts2_row(int32_t W, const T *__restrict sr,
                      const T *__restrict xs,
                      const T *__restrict vs,
                      const T *__restrict x2s,
                      const T *__restrict uo,
                      const T *__restrict yo,
                      const T *__restrict dn,
                      const T *__restrict ac,
                      T *__restrict un, T *__restrict vn,
                      T *__restrict xn, T *__restrict yn,
                      T *__restrict x2n, uint8_t *__restrict pr,
                      T q, T e, T q2) {
    for (int32_t i = 0; i < W; ++i) {
        T z = sr[i];
        T a = (T)(xs[i] + vs[i]), b = (T)(yo[i] + uo[i]);
        T a2 = (T)(x2s[i] + vs[i]);
        T a2a = (T)(a2 + ac[i]);
        T d = 0;
        if (WITH_CIGAR) {
            if (!RIGHT) {
                d = a > z ? 1 : 0;
                z = a > z ? a : z;
                d = b > z ? 2 : d;
                z = b > z ? b : z;
                d = a2a > z ? 3 : d;
                z = a2a > z ? a2a : z;
            } else {
                d = z > a ? 0 : 1;
                z = z > a ? z : a;
                d = z > b ? d : 2;
                z = z > b ? z : b;
                d = z > a2a ? d : 3;
                z = z > a2a ? z : a2a;
            }
        } else {
            z = a > z ? a : z;
            z = b > z ? b : z;
            z = a2a > z ? a2a : z;
        }
        un[i] = (T)(z - vs[i]);
        vn[i] = (T)(z - uo[i]);
        T t1 = (T)(z - q);
        a = (T)(a - t1);
        b = (T)(b - t1);
        a2 = (T)(a2 - (T)(z - q2));
        bool ga, gb, ga2;
        if (!RIGHT) {
            ga = a > 0;
            gb = b > 0;
            ga2 = a2 > dn[i];
        } else {
            ga = a >= 0;
            gb = b >= 0;
            ga2 = a2 >= dn[i];
        }
        xn[i] = (T)((ga ? a : 0) - (q + e));
        yn[i] = (T)((gb ? b : 0) - (q + e));
        x2n[i] = (T)((a2 > dn[i] ? a2 : dn[i]) - q2);
        if (WITH_CIGAR)
            pr[i] = (uint8_t)(d | (ga ? 0x08 : 0) | (gb ? 0x10 : 0) |
                              (ga2 ? 0x20 : 0));
    }
}

// dispatch: int8 splice rows take the masked-store AVX-512 kernel
template <bool WITH_CIGAR, bool RIGHT, typename T>
__attribute__((always_inline)) static inline void exts2_row_d(
    int32_t W, const T *sr, const T *xs, const T *vs, const T *x2s,
    const T *uo, const T *yo, const T *dn, const T *ac, T *un, T *vn,
    T *xn, T *yn, T *x2n, uint8_t *pr, T q, T e, T q2) {
#if defined(__AVX512BW__)
    if constexpr (sizeof(T) == 1) {
        exts2_row_i8_avx512<WITH_CIGAR, RIGHT>(
            W, (const int8_t *)sr, (const int8_t *)xs, (const int8_t *)vs,
            (const int8_t *)x2s, (const int8_t *)uo, (const int8_t *)yo,
            (const int8_t *)dn, (const int8_t *)ac, (int8_t *)un,
            (int8_t *)vn, (int8_t *)xn, (int8_t *)yn, (int8_t *)x2n, pr,
            (int8_t)q, (int8_t)e, (int8_t)q2);
        return;
    }
#endif
    exts2_row<WITH_CIGAR, RIGHT, T>(W, sr, xs, vs, x2s, uo, yo, dn, ac,
                                    un, vn, xn, yn, x2n, pr, q, e, q2);
}

extern "C" {

static uint32_t *backtrack(const uint8_t *p, const int64_t *poff,
                           const int32_t *off, const int32_t *off_end,
                           int32_t i0, int32_t j0, bool rev_cigar,
                           int32_t *n_out, int32_t min_intron_len = 0) {
    uint32_t *cig = nullptr;
    int32_t n = 0, cap = 0;
    int32_t i = i0, j = j0, state = 0;
    while (i >= 0 && j >= 0) {
        int32_t r = i + j;
        int32_t force_state = -1;
        if (i < off[r]) force_state = 2;
        if (i > off_end[r]) force_state = 1;
        int32_t tmp = force_state < 0 ? p[poff[r] + (i - off[r])] : 0;
        if (state == 0) state = tmp & 7;
        else if (!((tmp >> (state + 2)) & 1)) state = 0;
        if (state == 0) state = tmp & 7;
        if (force_state >= 0) state = force_state;
        if (state == 0) {
            push_cigar(cig, n, cap, 0, 1);
            --i;
            --j;
        } else if (state == 1 || (state == 3 && min_intron_len <= 0)) {
            push_cigar(cig, n, cap, 2, 1);
            --i;
        } else if (state == 3) {
            push_cigar(cig, n, cap, 3, 1);  // intron (N)
            --i;
        } else {
            push_cigar(cig, n, cap, 1, 1);
            --j;
        }
    }
    if (i >= 0)
        push_cigar(cig, n, cap,
                   (min_intron_len > 0 && i >= min_intron_len) ? 3 : 2, i + 1);
    if (j >= 0) push_cigar(cig, n, cap, 1, j + 1);
    if (!rev_cigar)
        for (int32_t k = 0; k < n >> 1; ++k) {
            uint32_t t = cig[k];
            cig[k] = cig[n - 1 - k];
            cig[n - 1 - k] = t;
        }
    *n_out = n;
    return cig;
}

// ez_out layout: [max, zdropped, max_q, max_t, mqe, mqe_t, mte, mte_q,
// score, reach_end]. Returns 0, or -1 on allocation failure.
// Thread-local grow-only scratch arena for the DP buffers: the reference
// reuses per-thread kalloc arenas across fills (kalloc.c, mm_tbuf_t) for
// the same reason — malloc/free dominates small banded fills (a ~60us
// floor per call on this host). Peak size is bounded by the largest fill.
struct KswArena {
    uint8_t *buf = nullptr;
    size_t cap = 0;
    size_t used = 0;
    // reserve() must cover every carve() of the call: growing mid-call
    // would realloc and invalidate already-carved pointers.
    bool reserve(size_t total) {
        used = 0;
        total = (total + 4095) & ~(size_t)4095;
        if (total <= cap) return true;
        size_t ncap = cap ? cap : (size_t)1 << 20;
        while (ncap < total) ncap <<= 1;
        uint8_t *nb = (uint8_t *)realloc(buf, ncap);
        if (!nb) return false;
        buf = nb;
        cap = ncap;
        return true;
    }
    void *carve(size_t n) {
        n = (n + 63) & ~(size_t)63;
        if (used + n > cap) return nullptr;  // reserve() was too small
        void *p_ = buf + used;
        used += n;
        return p_;
    }
};
static thread_local KswArena g_ksw_arena;

}  // close extern "C": the templated impl needs C++ linkage

template <typename T>
static int ksw_extd2_impl(int32_t qlen, const uint8_t *query, int32_t tlen,
                  const uint8_t *target, const int8_t *mat /*5x5*/,
                  int32_t q, int32_t e, int32_t q2, int32_t e2, int32_t w,
                  int32_t zdrop, int32_t end_bonus, int32_t flag,
                  int64_t *ez_out, uint32_t **cigar_out,
                  int32_t *n_cigar_out) {
    // ksw_reset_extz: max starts at 0 (ksw2.h:101-108)
    Ez ez = {0, 0, -1, -1, MM2_NEG_INF, -1, MM2_NEG_INF, -1,
             MM2_NEG_INF, 0};
    *cigar_out = nullptr;
    *n_cigar_out = 0;
    bool with_cigar = !(flag & EZ_SCORE_ONLY);
    bool approx_max = flag & EZ_APPROX_MAX;
    bool right = flag & EZ_RIGHT;
    const int m = 5;
    auto finish = [&](void) {
        ez_out[0] = ez.max_;
        ez_out[1] = ez.zdropped;
        ez_out[2] = ez.max_q;
        ez_out[3] = ez.max_t;
        ez_out[4] = ez.mqe;
        ez_out[5] = ez.mqe_t;
        ez_out[6] = ez.mte;
        ez_out[7] = ez.mte_q;
        ez_out[8] = ez.score;
        ez_out[9] = ez.reach_end;
    };
    if (qlen <= 0 || tlen <= 0) {
        finish();
        return 0;
    }
    if (q2 + e2 < q + e) {
        int32_t t = q;
        q = q2;
        q2 = t;
        t = e;
        e = e2;
        e2 = t;
    }
    int32_t sc_mch = mat[0], sc_mis = mat[1];
    int32_t sc_N = mat[m * m - 1] == 0 ? -e2 : mat[m * m - 1];
    if (w < 0) w = tlen > qlen ? tlen : qlen;
    int32_t wl = w, wr = w;
    int32_t tlen_ = (tlen + 15) / 16;
    int32_t n_col_ = qlen < tlen ? qlen : tlen;
    n_col_ = ((n_col_ < w + 1 ? n_col_ : w + 1) + 15) / 16 + 1;
    int32_t qlen_ = (qlen + 15) / 16;
    int32_t min_sc = mat[1];
    for (int i = 2; i < m * m; ++i)
        if (mat[i] < min_sc) min_sc = mat[i];
    if (-min_sc > 2 * (q + e)) {
        finish();
        return 0;
    }
    int32_t long_thres = e != e2 ? (q2 - q) / (e - e2) - 1 : 0;
    if (q2 + e2 + long_thres * e2 > q + e + long_thres * e) ++long_thres;
    int32_t long_diff = long_thres * (e - e2) - (q2 - q) - e2;

    int32_t tpad = tlen_ * 16;
    int32_t R = qlen + tlen - 1;
    int32_t width_cap = n_col_ * 16;
    KswArena &ar = g_ksw_arena;
    {
        size_t total = sizeof(T) * ((size_t)tpad + 1) * 12 +
                       sizeof(T) * (tpad + 16) +
                       sizeof(int64_t) * (size_t)tpad +
                       sizeof(T) * (qlen_ * 16 + 16) +
                       sizeof(T) * ((size_t)tpad + qlen_ * 16 + 16) +
                       sizeof(int32_t) * (size_t)R * 2 +
                       sizeof(int64_t) * (size_t)R +
                       (with_cigar ? (size_t)R * width_cap : 0) +
                       64 * 16;
        if (!ar.reserve(total)) {
            finish();
            return -1;
        }
    }
    // Two DP generations (double-buffered rows): row r reads generation
    // `cur`, writes `cur^1`, then swaps — the old-row snapshot copies of
    // the round-2 port (needed there so the vector row could write in
    // place) disappear entirely. Band starts/ends are monotone in r, so
    // a position entering the band holds its init value in BOTH
    // generations and every in-band position was written by the previous
    // row; stale lanes are never read. Stripe stride is tpad+1 with a +1
    // base offset so the band-edge slot t = -1 exists (patched with the
    // x1/v1/x21 boundary value each row).
    size_t dstride = (size_t)tpad + 1;
    T *dpb = (T *)ar.carve(sizeof(T) * dstride * 12);
    T *U[2], *V[2], *X[2], *Y[2], *X2[2], *Y2[2];
    for (int g = 0; g < 2; ++g) {
        T *base = dpb ? dpb + (size_t)g * 6 * dstride + 1 : nullptr;
        U[g] = base;
        V[g] = base ? base + dstride : nullptr;
        X[g] = base ? base + 2 * dstride : nullptr;
        Y[g] = base ? base + 3 * dstride : nullptr;
        X2[g] = base ? base + 4 * dstride : nullptr;
        Y2[g] = base ? base + 5 * dstride : nullptr;
    }
    T *s = (T *)ar.carve(sizeof(T) * (tpad + 16));
    int64_t *H = approx_max ? nullptr
                            : (int64_t *)ar.carve(sizeof(int64_t) * tpad);
    T *qr = (T *)ar.carve(sizeof(T) * (qlen_ * 16 + 16));
    T *sf = (T *)ar.carve(
        sizeof(T) * ((size_t)tpad + qlen_ * 16 + 16));
    int32_t *off = (int32_t *)ar.carve(sizeof(int32_t) * (size_t)R * 2);
    int32_t *off_end = off ? off + R : nullptr;
    int64_t *poff = nullptr;
    uint8_t *p = nullptr;
    if (with_cigar) {
        poff = (int64_t *)ar.carve(sizeof(int64_t) * R);
        p = (uint8_t *)ar.carve((size_t)R * width_cap);
    }
    if (!dpb || !s || (!approx_max && !H) || !qr || !sf || !off ||
        (with_cigar && (!poff || !p))) {
        finish();
        return -1;
    }
    memset(s, 0, sizeof(T) * (tpad + 16));
    memset(qr, 0, sizeof(T) * (qlen_ * 16 + 16));
    memset(sf, 0, sizeof(T) * ((size_t)tpad + qlen_ * 16 + 16));
    for (int g = 0; g < 2; ++g) {
        // stripes are contiguous (base-1, dstride apart): two fills
        // instead of a 6-way interleaved scalar loop
        std::fill(U[g] - 1, U[g] - 1 + 4 * dstride, (T)(-q - e));
        std::fill(X2[g] - 1, X2[g] - 1 + 2 * dstride, (T)(-q2 - e2));
    }
    if (H)
        for (int32_t t = 0; t < tpad; ++t) H[t] = MM2_NEG_INF;
    int cur = 0;
    for (int32_t i = 0; i < qlen; ++i) qr[i] = query[qlen - 1 - i];
    for (int32_t t = 0; t < tlen; ++t) sf[t] = target[t];
    for (int32_t i = 0; i < qlen_ * 16 + 16; ++i) sf[tpad + i] = qr[i];

    int64_t H0 = 0;
    int32_t last_H0_t = 0, last_st = -1, last_en = -1;
    for (int32_t r = 0; r < R; ++r) {
        int32_t st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        if (st < (r - wr + 1) >> 1) st = (r - wr + 1) >> 1;
        if (en > (r + wl) >> 1) en = (r + wl) >> 1;
        if (st > en) {
            ez.zdropped = 1;
            break;
        }
        int32_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        T *u_o = U[cur], *v_o = V[cur], *x_o = X[cur], *y_o = Y[cur];
        T *x2_o = X2[cur], *y2_o = Y2[cur];
        T *u_n = U[cur ^ 1], *v_n = V[cur ^ 1], *x_n = X[cur ^ 1];
        T *y_n = Y[cur ^ 1], *x2_n = X2[cur ^ 1], *y2_n = Y2[cur ^ 1];
        int32_t x1, x21, v1;
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = x_o[st - 1];
                x21 = x2_o[st - 1];
                v1 = v_o[st - 1];
            } else {
                x1 = -q - e;
                x21 = -q2 - e2;
                v1 = -q - e;
            }
        } else {
            x1 = -q - e;
            x21 = -q2 - e2;
            v1 = r == 0 ? -q - e
                        : r < long_thres ? -e
                                         : r == long_thres ? long_diff : -e2;
        }
        if (en >= r) {
            y_o[r] = (T)(-q - e);
            y2_o[r] = (T)(-q2 - e2);
            u_o[r] = (T)(r == 0 ? -q - e
                                : r < long_thres
                                      ? -e
                                      : r == long_thres ? long_diff : -e2);
        }
        int32_t qoff = qlen - 1 - r;
        if (!(flag & EZ_GENERIC_SC)) {
            // branchless so the compiler vectorizes (this profile loop was
            // most of the per-row cost on narrow bands). qoff+t >= 0 holds
            // for every iterated t: t >= st0 >= r-qlen+1 gives qoff+t >= 0,
            // tail lanes only move t upward, and the upper bound
            // qoff+en0+15 <= qlen+14 stays inside qr's padded extent.
            // __restrict + all-T arithmetic: without them gcc sees a
            // possible alias between s and sf/qr and leaves this loop
            // scalar (~100 ns/row on narrow bands — the dominant cost)
            profile_row<T>(st0, en0, sf, qr + qoff, s, (T)(m - 1),
                           (T)sc_N, (T)sc_mch, (T)sc_mis);
        } else {
            for (int32_t t = st0; t <= en0; ++t)
                s[t] = mat[sf[t] * m + (qoff + t >= 0 ? qr[qoff + t] : 0)];
        }
        uint8_t *pr = nullptr;
        if (with_cigar) {
            off[r] = st;
            off_end[r] = en;
            poff[r] = (int64_t)r * width_cap;
            pr = p + poff[r];
        }
        {
            int32_t W = en - st + 1;
            // band-edge boundary: slot st-1 of the read generation (the
            // +1 base offset makes st == 0 safe). Patches land in the
            // generation the NEXT row overwrites, so they are never
            // observed stale.
            x_o[st - 1] = (T)x1;
            v_o[st - 1] = (T)v1;
            x2_o[st - 1] = (T)x21;
            if (with_cigar && !right)
                extd2_row_d<true, false, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                       x2_o + st - 1, u_o + st, y_o + st,
                                       y2_o + st, u_n + st, v_n + st, x_n + st,
                                       y_n + st, x2_n + st, y2_n + st, pr,
                                       (T)sc_mch, (T)q, (T)e, (T)q2, (T)e2);
            else if (with_cigar)
                extd2_row_d<true, true, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                      x2_o + st - 1, u_o + st, y_o + st,
                                      y2_o + st, u_n + st, v_n + st, x_n + st,
                                      y_n + st, x2_n + st, y2_n + st, pr,
                                      (T)sc_mch, (T)q, (T)e, (T)q2, (T)e2);
            else if (!right)
                extd2_row_d<false, false, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                        x2_o + st - 1, u_o + st, y_o + st,
                                        y2_o + st, u_n + st, v_n + st, x_n + st,
                                        y_n + st, x2_n + st, y2_n + st, nullptr,
                                        (T)sc_mch, (T)q, (T)e, (T)q2, (T)e2);
            else
                extd2_row_d<false, true, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                       x2_o + st - 1, u_o + st, y_o + st,
                                       y2_o + st, u_n + st, v_n + st, x_n + st,
                                       y_n + st, x2_n + st, y2_n + st, nullptr,
                                       (T)sc_mch, (T)q, (T)e, (T)q2, (T)e2);
        }
        if (!approx_max) {
            int64_t max_H;
            int32_t max_t;
            if (r > 0) {
                exact_max_scan(H, u_n, v_n, st0, en0, &max_H, &max_t);
            } else {
                H[0] = v_n[0] - (q + e);
                max_H = H[0];
                max_t = 0;
            }
            if (en0 == tlen - 1 && H[en0] > ez.mte) {
                ez.mte = H[en0];
                ez.mte_q = r - en;
            }
            if (r - st0 == qlen - 1 && H[st0] > ez.mqe) {
                ez.mqe = H[st0];
                ez.mqe_t = st0;
            }
            if (apply_zdrop(ez, max_H, r, max_t, zdrop, e2)) break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1)
                ez.score = H[tlen - 1];
        } else {
            if (r > 0) {
                if (last_H0_t >= st0 && last_H0_t <= en0 &&
                    last_H0_t + 1 >= st0 && last_H0_t + 1 <= en0) {
                    int32_t d0 = v_n[last_H0_t], d1 = u_n[last_H0_t + 1];
                    if (d0 > d1)
                        H0 += d0;
                    else {
                        H0 += d1;
                        ++last_H0_t;
                    }
                } else if (last_H0_t >= st0 && last_H0_t <= en0) {
                    H0 += v_n[last_H0_t];
                } else {
                    ++last_H0_t;
                    H0 += u_n[last_H0_t];
                }
            } else {
                H0 = v_n[0] - (q + e);
                last_H0_t = 0;
            }
            if ((flag & EZ_APPROX_DROP) &&
                apply_zdrop(ez, H0, r, last_H0_t, zdrop, e2))
                break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1) ez.score = H0;
        }
        last_st = st;
        last_en = en;
        cur ^= 1;
    }

    if (with_cigar) {
        bool rev_cigar = flag & EZ_REV_CIGAR;
        if (!ez.zdropped && !(flag & EZ_EXTZ_ONLY)) {
            *cigar_out = backtrack(p, poff, off, off_end, tlen - 1,
                                   qlen - 1, rev_cigar, n_cigar_out);
        } else if (!ez.zdropped && (flag & EZ_EXTZ_ONLY) &&
                   ez.mqe + end_bonus > ez.max_) {
            ez.reach_end = 1;
            *cigar_out = backtrack(p, poff, off, off_end, ez.mqe_t,
                                   qlen - 1, rev_cigar, n_cigar_out);
        } else if (ez.max_t >= 0 && ez.max_q >= 0) {
            *cigar_out = backtrack(p, poff, off, off_end, ez.max_t,
                                   ez.max_q, rev_cigar, n_cigar_out);
        }
    }
    finish();
    return 0;
}

extern "C" {


int mm2_ksw_extd2(int32_t qlen, const uint8_t *query, int32_t tlen,
                  const uint8_t *target, const int8_t *mat /*5x5*/,
                  int32_t q, int32_t e, int32_t q2, int32_t e2, int32_t w,
                  int32_t zdrop, int32_t end_bonus, int32_t flag,
                  int64_t *ez_out, uint32_t **cigar_out,
                  int32_t *n_cigar_out) {
    // int8 rows (4x vector lanes) when the scoring envelope provably
    // keeps every stored difference and intermediate sum inside int8 —
    // then wrapping arithmetic equals the SSE build's saturating ops
    // bit-for-bit. Otherwise (asm5-class penalties) the int32 rows run.
    int32_t mx = 0;
    for (int i = 0; i < 25; ++i) {
        int32_t v = mat[i] < 0 ? -mat[i] : mat[i];
        if (v > mx) mx = v;
    }
    int32_t hi_q = q > q2 ? q : q2, hi_e = e > e2 ? e : e2;
    if ((q2 + e2) + (q + e) + (hi_q + hi_e) + 2 * mx + 4 <= 124)
        return ksw_extd2_impl<int8_t>(qlen, query, tlen, target, mat, q, e,
                                      q2, e2, w, zdrop, end_bonus, flag,
                                      ez_out, cigar_out, n_cigar_out);
    return ksw_extd2_impl<int32_t>(qlen, query, tlen, target, mat, q, e,
                                   q2, e2, w, zdrop, end_bonus, flag,
                                   ez_out, cigar_out, n_cigar_out);
}


// Donor/acceptor site score arrays (ksw2_exts2_sse.c:119-171 semantics,
// mirrored from ops/ksw2_splice_ref.py::_site_arrays).
static void exts2_sites(int32_t tlen, int32_t tpad, const uint8_t *t,
                        const uint8_t *junc, int32_t noncan,
                        int32_t junc_bonus, int32_t flag, int32_t *donor,
                        int32_t *acceptor) {
    const int32_t F_FOR = 0x100, F_REV = 0x200, F_FLANK = 0x400,
                  F_REVC = 0x80;
    for (int32_t i = 0; i < tpad; ++i) donor[i] = acceptor[i] = 0;
    if (!(flag & (F_FOR | F_REV))) return;
    int32_t semi = (flag & F_FLANK) ? -(noncan / 2) : 0;
    for (int32_t i = 0; i < tpad; ++i) donor[i] = acceptor[i] = -noncan;
    if (!(flag & F_REVC)) {
        for (int32_t i = 0; i < tlen - 4; ++i) {
            int32_t can = 0;
            if ((flag & F_FOR) && t[i + 1] == 2 && t[i + 2] == 3) can = 1;
            if ((flag & F_REV) && t[i + 1] == 1 && t[i + 2] == 3) can = 1;
            if (can && (t[i + 3] == 0 || t[i + 3] == 2)) can = 2;
            if (can) donor[i] = can == 2 ? 0 : semi;
        }
        if (junc)
            for (int32_t i = 0; i < tlen - 1; ++i)
                if (((flag & F_FOR) && (junc[i + 1] & 1)) ||
                    ((flag & F_REV) && (junc[i + 1] & 8)))
                    donor[i] += junc_bonus;
        for (int32_t i = 2; i < tlen; ++i) {
            int32_t can = 0;
            if ((flag & F_FOR) && t[i - 1] == 0 && t[i] == 2) can = 1;
            if ((flag & F_REV) && t[i - 1] == 0 && t[i] == 1) can = 1;
            if (can && (t[i - 2] == 1 || t[i - 2] == 3)) can = 2;
            if (can) acceptor[i] = can == 2 ? 0 : semi;
        }
        if (junc)
            for (int32_t i = 0; i < tlen; ++i)
                if (((flag & F_FOR) && (junc[i] & 2)) ||
                    ((flag & F_REV) && (junc[i] & 4)))
                    acceptor[i] += junc_bonus;
    } else {  // reversed sequences: mirror-image motifs
        for (int32_t i = 0; i < tlen - 4; ++i) {
            int32_t can = 0;
            if ((flag & F_FOR) && t[i + 1] == 2 && t[i + 2] == 0) can = 1;
            if ((flag & F_REV) && t[i + 1] == 1 && t[i + 2] == 0) can = 1;
            if (can && (t[i + 3] == 1 || t[i + 3] == 3)) can = 2;
            if (can) donor[i] = can == 2 ? 0 : semi;
        }
        if (junc)
            for (int32_t i = 0; i < tlen - 1; ++i)
                if (((flag & F_FOR) && (junc[i + 1] & 2)) ||
                    ((flag & F_REV) && (junc[i + 1] & 4)))
                    donor[i] += junc_bonus;
        for (int32_t i = 2; i < tlen; ++i) {
            int32_t can = 0;
            if ((flag & F_FOR) && t[i - 1] == 3 && t[i] == 2) can = 1;
            if ((flag & F_REV) && t[i - 1] == 3 && t[i] == 1) can = 1;
            if (can && (t[i - 2] == 0 || t[i - 2] == 2)) can = 2;
            if (can) acceptor[i] = can == 2 ? 0 : semi;
        }
        if (junc)
            for (int32_t i = 0; i < tlen; ++i)
                if (((flag & F_FOR) && (junc[i] & 1)) ||
                    ((flag & F_REV) && (junc[i] & 8)))
                    acceptor[i] += junc_bonus;
    }
}

// ksw2 exts2 (splice) extension DP. Same observable semantics as the
// SSE4.1 build, mirrored from ops/ksw2_splice_ref.py (the tested
// oracle). ez_out layout as mm2_ksw_extd2. junc may be null.
}  // close extern "C": templated exts2 impl needs C++ linkage

template <typename T>
static int ksw_exts2_impl(int32_t qlen, const uint8_t *query, int32_t tlen,
                  const uint8_t *target, const int8_t *mat /*5x5*/,
                  int32_t q, int32_t e, int32_t q2, int32_t noncan,
                  int32_t zdrop, int32_t junc_bonus, int32_t flag,
                  const uint8_t *junc, int64_t *ez_out, uint32_t **cigar_out,
                  int32_t *n_cigar_out) {
    Ez ez = {0, 0, -1, -1, MM2_NEG_INF, -1, MM2_NEG_INF, -1,
             MM2_NEG_INF, 0};
    *cigar_out = nullptr;
    *n_cigar_out = 0;
    bool with_cigar = !(flag & EZ_SCORE_ONLY);
    bool approx_max = flag & EZ_APPROX_MAX;
    bool right = flag & EZ_RIGHT;
    const int m = 5;
    auto finish = [&](void) {
        ez_out[0] = ez.max_;
        ez_out[1] = ez.zdropped;
        ez_out[2] = ez.max_q;
        ez_out[3] = ez.max_t;
        ez_out[4] = ez.mqe;
        ez_out[5] = ez.mqe_t;
        ez_out[6] = ez.mte;
        ez_out[7] = ez.mte_q;
        ez_out[8] = ez.score;
        ez_out[9] = ez.reach_end;
    };
    if (qlen <= 0 || tlen <= 0 || q2 <= q + e) {
        finish();
        return 0;
    }
    int32_t sc_mch = mat[0], sc_mis = mat[1];
    int32_t sc_N = mat[m * m - 1] == 0 ? -e : mat[m * m - 1];
    int32_t min_sc = mat[1];
    for (int i = 2; i < m * m; ++i)
        if (mat[i] < min_sc) min_sc = mat[i];
    if (-min_sc > 2 * (q + e)) {
        finish();
        return 0;
    }
    int32_t long_thres = (q2 - q) / e - 1;
    if (q2 > q + e + long_thres * e) ++long_thres;
    int32_t long_diff = long_thres * e - (q2 - q);

    int32_t tlen_ = (tlen + 15) / 16, qlen_ = (qlen + 15) / 16;
    int32_t tpad = tlen_ * 16;
    int32_t R = qlen + tlen - 1;
    int32_t n_col_ = qlen < tlen ? qlen : tlen;
    int32_t width_cap = (n_col_ + 30 + 15) / 16 * 16;
    KswArena &ar = g_ksw_arena;
    {
        size_t total = sizeof(T) * ((size_t)tpad + 1) * 10 +
                       sizeof(T) * (tpad + 16) +
                       sizeof(int64_t) * (size_t)tpad +
                       sizeof(T) * (qlen_ * 16 + 16) +
                       sizeof(T) * ((size_t)tpad + qlen_ * 16 + 16) +
                       sizeof(int32_t) * (size_t)tpad * 2 +
                       sizeof(T) * (size_t)tpad * 2 +
                       sizeof(int32_t) * (size_t)R * 2 +
                       sizeof(int64_t) * (size_t)R +
                       (with_cigar ? (size_t)R * width_cap : 0) +
                       64 * 16;
        if (!ar.reserve(total)) {
            finish();
            return -1;
        }
    }
    // double-buffered row generations — same scheme (and correctness
    // argument) as ksw_extd2_impl above, with 5 DP stripes
    size_t dstride = (size_t)tpad + 1;
    T *dpb = (T *)ar.carve(sizeof(T) * dstride * 10);
    T *U[2], *V[2], *X[2], *Y[2], *X2[2];
    for (int g = 0; g < 2; ++g) {
        T *base = dpb ? dpb + (size_t)g * 5 * dstride + 1 : nullptr;
        U[g] = base;
        V[g] = base ? base + dstride : nullptr;
        X[g] = base ? base + 2 * dstride : nullptr;
        Y[g] = base ? base + 3 * dstride : nullptr;
        X2[g] = base ? base + 4 * dstride : nullptr;
    }
    T *s = (T *)ar.carve(sizeof(T) * (tpad + 16));
    int64_t *H = approx_max ? nullptr
                            : (int64_t *)ar.carve(sizeof(int64_t) * tpad);
    T *qr = (T *)ar.carve(sizeof(T) * (qlen_ * 16 + 16));
    T *sf = (T *)ar.carve(
        sizeof(T) * ((size_t)tpad + qlen_ * 16 + 16));
    int32_t *sites32 = (int32_t *)ar.carve(sizeof(int32_t) * (size_t)tpad * 2);
    T *sites = (T *)ar.carve(sizeof(T) * (size_t)tpad * 2);
    int32_t *off = (int32_t *)ar.carve(sizeof(int32_t) * (size_t)R * 2);
    int32_t *off_end = off ? off + R : nullptr;
    int64_t *poff = nullptr;
    uint8_t *p = nullptr;
    if (with_cigar) {
        poff = (int64_t *)ar.carve(sizeof(int64_t) * R);
        p = (uint8_t *)ar.carve((size_t)R * width_cap);
    }
    if (!dpb || !s || (!approx_max && !H) || !qr || !sf || !sites || !off ||
        (with_cigar && (!poff || !p))) {
        finish();
        return -1;
    }
    memset(s, 0, sizeof(T) * (tpad + 16));
    memset(qr, 0, sizeof(T) * (qlen_ * 16 + 16));
    memset(sf, 0, sizeof(T) * ((size_t)tpad + qlen_ * 16 + 16));
    T *donor = sites, *acceptor = sites + tpad;
    for (int g = 0; g < 2; ++g) {
        std::fill(U[g] - 1, U[g] - 1 + 4 * dstride, (T)(-q - e));
        std::fill(X2[g] - 1, X2[g] - 1 + dstride, (T)(-q2));
    }
    if (H)
        for (int32_t t = 0; t < tpad; ++t) H[t] = MM2_NEG_INF;
    int cur = 0;
    for (int32_t i = 0; i < qlen; ++i) qr[i] = query[qlen - 1 - i];
    for (int32_t t = 0; t < tlen; ++t) sf[t] = target[t];
    for (int32_t i = 0; i < qlen_ * 16 + 16; ++i) sf[tpad + i] = qr[i];
    exts2_sites(tlen, tpad, target, junc, noncan, junc_bonus, flag,
                sites32, sites32 + tpad);
    for (int32_t i = 0; i < 2 * tpad; ++i) sites[i] = (T)sites32[i];

    int64_t H0 = 0;
    int32_t last_H0_t = 0, last_st = -1, last_en = -1;
    for (int32_t r = 0; r < R; ++r) {
        int32_t st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        int32_t st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;
        T *u_o = U[cur], *v_o = V[cur], *x_o = X[cur], *y_o = Y[cur];
        T *x2_o = X2[cur];
        T *u_n = U[cur ^ 1], *v_n = V[cur ^ 1], *x_n = X[cur ^ 1];
        T *y_n = Y[cur ^ 1], *x2_n = X2[cur ^ 1];
        int32_t x1, x21, v1;
        if (st > 0) {
            if (last_st <= st - 1 && st - 1 <= last_en) {
                x1 = x_o[st - 1];
                x21 = x2_o[st - 1];
                v1 = v_o[st - 1];
            } else {
                x1 = -q - e;
                x21 = -q2;
                v1 = -q - e;
            }
        } else {
            x1 = -q - e;
            x21 = -q2;
            v1 = r == 0 ? -q - e
                        : r < long_thres ? -e
                                         : r == long_thres ? long_diff : 0;
        }
        if (en >= r) {
            y_o[r] = (T)(-q - e);
            u_o[r] = (T)(r == 0 ? -q - e
                                : r < long_thres
                                      ? -e
                                      : r == long_thres ? long_diff : 0);
        }
        int32_t qoff = qlen - 1 - r;
        if (!(flag & EZ_GENERIC_SC)) {
            // branchless so the compiler vectorizes (this profile loop was
            // most of the per-row cost on narrow bands). qoff+t >= 0 holds
            // for every iterated t: t >= st0 >= r-qlen+1 gives qoff+t >= 0,
            // tail lanes only move t upward, and the upper bound
            // qoff+en0+15 <= qlen+14 stays inside qr's padded extent.
            // __restrict + all-T arithmetic: without them gcc sees a
            // possible alias between s and sf/qr and leaves this loop
            // scalar (~100 ns/row on narrow bands — the dominant cost)
            profile_row<T>(st0, en0, sf, qr + qoff, s, (T)(m - 1),
                           (T)sc_N, (T)sc_mch, (T)sc_mis);
        } else {
            for (int32_t t = st0; t <= en0; ++t)
                s[t] = mat[sf[t] * m + (qoff + t >= 0 ? qr[qoff + t] : 0)];
        }
        uint8_t *pr = nullptr;
        if (with_cigar) {
            off[r] = st;
            off_end[r] = en;
            poff[r] = (int64_t)r * width_cap;
            pr = p + poff[r];
        }
        {
            int32_t W = en - st + 1;
            x_o[st - 1] = (T)x1;
            v_o[st - 1] = (T)v1;
            x2_o[st - 1] = (T)x21;
            if (with_cigar && !right)
                exts2_row_d<true, false, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                       x2_o + st - 1, u_o + st, y_o + st,
                                       donor + st, acceptor + st, u_n + st,
                                       v_n + st, x_n + st, y_n + st, x2_n + st,
                                       pr, (T)q, (T)e, (T)q2);
            else if (with_cigar)
                exts2_row_d<true, true, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                      x2_o + st - 1, u_o + st, y_o + st,
                                      donor + st, acceptor + st, u_n + st,
                                      v_n + st, x_n + st, y_n + st, x2_n + st,
                                      pr, (T)q, (T)e, (T)q2);
            else if (!right)
                exts2_row_d<false, false, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                        x2_o + st - 1, u_o + st, y_o + st,
                                        donor + st, acceptor + st, u_n + st,
                                        v_n + st, x_n + st, y_n + st, x2_n + st,
                                        nullptr, (T)q, (T)e, (T)q2);
            else
                exts2_row_d<false, true, T>(W, s + st, x_o + st - 1, v_o + st - 1,
                                       x2_o + st - 1, u_o + st, y_o + st,
                                       donor + st, acceptor + st, u_n + st,
                                       v_n + st, x_n + st, y_n + st, x2_n + st,
                                       nullptr, (T)q, (T)e, (T)q2);
        }
        if (!approx_max) {
            int64_t max_H;
            int32_t max_t;
            if (r > 0) {
                exact_max_scan(H, u_n, v_n, st0, en0, &max_H, &max_t);
            } else {
                H[0] = v_n[0] - (q + e);
                max_H = H[0];
                max_t = 0;
            }
            if (en0 == tlen - 1 && H[en0] > ez.mte) {
                ez.mte = H[en0];
                ez.mte_q = r - en;
            }
            if (r - st0 == qlen - 1 && H[st0] > ez.mqe) {
                ez.mqe = H[st0];
                ez.mqe_t = st0;
            }
            if (apply_zdrop(ez, max_H, r, max_t, zdrop, 0)) break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1)
                ez.score = H[tlen - 1];
        } else {
            if (r > 0) {
                if (last_H0_t >= st0 && last_H0_t <= en0 &&
                    last_H0_t + 1 >= st0 && last_H0_t + 1 <= en0) {
                    int32_t d0 = v_n[last_H0_t], d1 = u_n[last_H0_t + 1];
                    if (d0 > d1)
                        H0 += d0;
                    else {
                        H0 += d1;
                        ++last_H0_t;
                    }
                } else if (last_H0_t >= st0 && last_H0_t <= en0) {
                    H0 += v_n[last_H0_t];
                } else {
                    ++last_H0_t;
                    H0 += u_n[last_H0_t];
                }
            } else {
                H0 = v_n[0] - (q + e);
                last_H0_t = 0;
            }
            if ((flag & EZ_APPROX_DROP) &&
                apply_zdrop(ez, H0, r, last_H0_t, zdrop, 0))
                break;
            if (r == qlen + tlen - 2 && en0 == tlen - 1) ez.score = H0;
        }
        last_st = st;
        last_en = en;
        cur ^= 1;
    }

    if (with_cigar) {
        bool rev_cigar = flag & EZ_REV_CIGAR;
        if (!ez.zdropped && !(flag & EZ_EXTZ_ONLY)) {
            *cigar_out = backtrack(p, poff, off, off_end, tlen - 1,
                                   qlen - 1, rev_cigar, n_cigar_out,
                                   long_thres);
        } else if (ez.max_t >= 0 && ez.max_q >= 0) {
            *cigar_out = backtrack(p, poff, off, off_end, ez.max_t,
                                   ez.max_q, rev_cigar, n_cigar_out,
                                   long_thres);
        }
    }
    finish();
    return 0;
}

extern "C" {


int mm2_ksw_exts2(int32_t qlen, const uint8_t *query, int32_t tlen,
                  const uint8_t *target, const int8_t *mat /*5x5*/,
                  int32_t q, int32_t e, int32_t q2, int32_t noncan,
                  int32_t zdrop, int32_t junc_bonus, int32_t flag,
                  const uint8_t *junc, int64_t *ez_out, uint32_t **cigar_out,
                  int32_t *n_cigar_out) {
    // int8 rows when the splice scoring envelope provably fits (same
    // reasoning as mm2_ksw_extd2's dispatch); int32 otherwise
    int32_t mx = 0;
    for (int i = 0; i < 25; ++i) {
        int32_t v = mat[i] < 0 ? -mat[i] : mat[i];
        if (v > mx) mx = v;
    }
    if (2 * (mx + q + e) + 2 * q2 + noncan + junc_bonus + 8 <= 120)
        return ksw_exts2_impl<int8_t>(qlen, query, tlen, target, mat, q, e,
                                      q2, noncan, zdrop, junc_bonus, flag,
                                      junc, ez_out, cigar_out, n_cigar_out);
    return ksw_exts2_impl<int32_t>(qlen, query, tlen, target, mat, q, e,
                                   q2, noncan, zdrop, junc_bonus, flag,
                                   junc, ez_out, cigar_out, n_cigar_out);
}


void mm2_free(void *ptr) { free(ptr); }

// ---------------------------------------------------------------------------
// SDUST low-complexity masking (sdust.c semantics; mirrors
// mm2tpu/mapping/sdust.py, the tested reference). Emits (start, finish)
// pairs into out; returns the interval count (no overflow: <= n/2+1 and
// the caller sizes out accordingly).
// ---------------------------------------------------------------------------
int64_t mm2_sdust(const uint8_t *codes, int64_t n, int32_t T, int32_t W,
                  int64_t *out, int64_t cap) {
    const int WLEN2 = 3, WTOT2 = 64, WMSK2 = 63;
    struct PI {
        int64_t start, finish, r, l;
    };
    std::vector<PI> P;
    std::vector<int> w;  // ring of words
    size_t whead = 0;
    int cv[64] = {0}, cw[64] = {0};
    int64_t rv = 0, rw = 0, L = 0, n_out = 0;
    auto wsize = [&]() { return w.size() - whead; };
    auto wat = [&](size_t i) { return w[whead + i]; };

    auto save_masked = [&](int64_t start) {
        if (P.empty() || P.back().start >= start) return;
        PI &p = P.back();
        bool saved = false;
        if (n_out) {
            int64_t s = out[2 * (n_out - 1)], f = out[2 * (n_out - 1) + 1];
            if (p.start <= f) {
                saved = true;
                out[2 * (n_out - 1) + 1] = f > p.finish ? f : p.finish;
                (void)s;
            }
        }
        if (!saved && n_out < cap) {
            out[2 * n_out] = p.start;
            out[2 * n_out + 1] = p.finish;
            ++n_out;
        }
        int64_t i = (int64_t)P.size() - 1;
        while (i >= 0 && P[i].start < start) --i;
        P.resize(i + 1);
    };
    auto shift_window = [&](int t) {
        if ((int64_t)wsize() >= W - WLEN2 + 1) {
            int s = wat(0);
            ++whead;
            rw -= --cw[s];
            if (L > (int64_t)wsize()) {
                --L;
                rv -= --cv[s];
            }
        }
        if (whead > 4096) {  // compact the ring
            w.erase(w.begin(), w.begin() + whead);
            whead = 0;
        }
        w.push_back(t);
        ++L;
        rw += cw[t]++;
        rv += cv[t]++;
        if (cv[t] * 10 > T << 1) {
            int s;
            do {
                s = wat(wsize() - L);
                rv -= --cv[s];
                --L;
            } while (s != t);
        }
    };
    auto find_perfect = [&](int64_t start) {
        int c[64];
        memcpy(c, cv, sizeof(c));
        int64_t r = rv, max_r = 0, max_l = 0;
        for (int64_t i = (int64_t)wsize() - L - 1; i >= 0; --i) {
            int t = wat((size_t)i);
            r += c[t]++;
            int64_t new_r = r, new_l = (int64_t)wsize() - i - 1;
            if (new_r * 10 > T * new_l) {
                size_t j = 0;
                while (j < P.size() && P[j].start >= i + start) {
                    PI &p = P[j];
                    if (max_r == 0 || p.r * max_l > max_r * p.l) {
                        max_r = p.r;
                        max_l = p.l;
                    }
                    ++j;
                }
                if (max_r == 0 || new_r * max_l >= max_r * new_l) {
                    max_r = new_r;
                    max_l = new_l;
                    PI np = {i + start, (int64_t)wsize() + WLEN2 - 1 + start,
                             new_r, new_l};
                    P.insert(P.begin() + j, np);
                }
            }
        }
    };

    int64_t l = 0;
    unsigned t = 0;
    for (int64_t i = 0; i <= n; ++i) {
        int b = i < n ? codes[i] : 4;
        if (b < 4) {
            ++l;
            t = ((t << 2) | (unsigned)b) & WMSK2;
            if (l >= WLEN2) {
                int64_t start = (l - W > 0 ? l - W : 0) + (i + 1 - l);
                save_masked(start);
                shift_window((int)t);
                if (rw * 10 > L * T) find_perfect(start);
            }
        } else {
            int64_t start = (l - W + 1 > 0 ? l - W + 1 : 0) + (i + 1 - l);
            while (!P.empty()) save_masked(start++);
            l = 0;
            t = 0;
        }
    }
    (void)WTOT2;
    return n_out;
}

// ---------------------------------------------------------------------------
// Striped local SW (ksw_ll_qinit/ksw_ll_i16, ksw2_ll_sse.c) — exact port
// of the ops/ksw2_ref.ksw_ll oracle including the padded-lane carries and
// the striped-memory-order qe tie scan. out: [score, qe, te].
// ---------------------------------------------------------------------------
void mm2_ksw_ll(int32_t qlen, const uint8_t *query, int32_t tlen,
                const uint8_t *target, const int8_t *mat /*5x5*/,
                int32_t gapo, int32_t gape, int64_t *out) {
    if (qlen <= 0 || tlen <= 0) {
        out[0] = 0;
        out[1] = out[2] = -1;
        return;
    }
    const int p = 8;
    int32_t slen = (qlen + p - 1) / p;
    int64_t gapoe = gapo + gape;
    size_t np_ = (size_t)slen * p;
    std::vector<int64_t> prof(5 * np_, 0);
    for (int aa = 0; aa < 5; ++aa)
        for (int32_t j = 0; j < slen; ++j)
            for (int k = 0; k < p; ++k) {
                int32_t qpos = j + k * slen;
                prof[(size_t)aa * np_ + (size_t)j * p + k] =
                    qpos < qlen ? mat[aa * 5 + query[qpos]] : 0;
            }
    std::vector<int64_t> H0(np_, 0), H1(np_, 0), E(np_, 0), Hmax(np_, 0);
    int64_t gmax = 0;
    int32_t te = -1;
    int64_t h[8], f[8], maxv[8];
    for (int32_t i = 0; i < tlen; ++i) {
        const int64_t *S = prof.data() + (size_t)target[i] * np_;
        for (int k = 0; k < p; ++k) {
            f[k] = 0;
            maxv[k] = 0;
        }
        // h = last stripe of H0 shifted right one lane
        h[0] = 0;
        for (int k = 1; k < p; ++k) h[k] = H0[(size_t)(slen - 1) * p + k - 1];
        for (int32_t j = 0; j < slen; ++j) {
            int64_t *Ej = E.data() + (size_t)j * p;
            int64_t *H1j = H1.data() + (size_t)j * p;
            const int64_t *H0j = H0.data() + (size_t)j * p;
            const int64_t *Sj = S + (size_t)j * p;
            for (int k = 0; k < p; ++k) {
                int64_t hh = h[k] + Sj[k];
                int64_t e = Ej[k];
                if (e > hh) hh = e;
                if (f[k] > hh) hh = f[k];
                if (hh > maxv[k]) maxv[k] = hh;
                H1j[k] = hh;
                int64_t q = hh - gapoe;
                if (q < 0) q = 0;
                e -= gape;
                if (e < 0) e = 0;
                Ej[k] = e > q ? e : q;
                int64_t ff = f[k] - gape;
                if (ff < 0) ff = 0;
                f[k] = ff > q ? ff : q;
                h[k] = H0j[k];
            }
        }
        // lazy-F propagation
        bool done = false;
        for (int it = 0; it < p && !done; ++it) {
            for (int k = p - 1; k > 0; --k) f[k] = f[k - 1];
            f[0] = 0;
            for (int32_t j = 0; j < slen; ++j) {
                int64_t *H1j = H1.data() + (size_t)j * p;
                bool any = false;
                for (int k = 0; k < p; ++k) {
                    int64_t hh = H1j[k] > f[k] ? H1j[k] : f[k];
                    H1j[k] = hh;
                    int64_t q = hh - gapoe;
                    if (q < 0) q = 0;
                    int64_t ff = f[k] - gape;
                    if (ff < 0) ff = 0;
                    f[k] = ff;
                    if (ff > q) any = true;
                }
                if (!any) {
                    done = true;
                    break;
                }
            }
        }
        int64_t imax = 0;
        for (int k = 0; k < p; ++k)
            if (maxv[k] > imax) imax = maxv[k];
        if (imax >= gmax) {
            gmax = imax;
            te = i;
            Hmax = H1;
        }
        H0.swap(H1);
    }
    int32_t qe = -1;
    for (size_t i = 0; i < np_; ++i)
        if (Hmax[i] == gmax) qe = (int32_t)(i / p + (i % p) * slen);
    out[0] = gmax;
    out[1] = qe;
    out[2] = te;
}

// ---------------------------------------------------------------------------
// Index finalize: sort minimizers into the CSR layout (index.c:191-243
// semantics: group by hash minier = x>>8, runs sorted by payload y).
// Outputs pos (n), keys/start/cnt (<= n, caller-allocated at n); returns
// the number of distinct keys.
}  // extern "C" (bucket-sort template needs C++ linkage)

#ifdef __linux__
#include <sys/mman.h>
#endif

// Ask the kernel to back a large buffer with transparent hugepages:
// GB-scale random scatters/gathers here are TLB-walk-bound under
// virtualization (2-level EPT walks), and whether khugepaged happened
// to promote the buffer was the difference between 5 s and 75 s for
// the same sort on the same input. Async advice only — MADV_COLLAPSE's
// synchronous compaction measured far worse on a fragmented host.
static void advise_huge(void *p, size_t n) {
#ifdef __linux__
    uintptr_t a = ((uintptr_t)p + 4095) & ~(uintptr_t)4095;
    uintptr_t e = ((uintptr_t)p + n) & ~(uintptr_t)4095;
    if (e > a) madvise((void *)a, e - a, MADV_HUGEPAGE);
#else
    (void)p; (void)n;
#endif
}

// MSB-bucket sort: counting-scatter by the key's top bits, then
// cache-local std::sort per bucket. On low-memory-bandwidth hosts this
// beats one global comparison sort by several passes (the reference gets
// the same effect from its per-bucket radix_sort_128x, index.c:201).
template <class T>
static void msb_bucket_sort(std::vector<T> &v, int nthreads = 1) {
    const int BB = 13;
    size_t n = v.size();
    if (n < ((size_t)1 << 16)) {
        std::sort(v.begin(), v.end());
        return;
    }
    uint64_t maxk = 0;
    for (const auto &e : v)
        if (e.first > maxk) maxk = e.first;
    int bits = 64 - __builtin_clzll(maxk | 1);
    int shift = bits > BB ? bits - BB : 0;
    size_t nb = ((size_t)(maxk >> shift)) + 1;
    std::vector<int64_t> off(nb + 1, 0);
    for (const auto &e : v) ++off[(size_t)(e.first >> shift) + 1];
    for (size_t b = 1; b <= nb; ++b) off[b] += off[b - 1];
    std::vector<T> tmp(n);
    advise_huge(tmp.data(), n * sizeof(T));
    advise_huge(v.data(), n * sizeof(T));
    {
        std::vector<int64_t> cur(off.begin(), off.end() - 1);
        for (const auto &e : v) tmp[cur[(size_t)(e.first >> shift)]++] = e;
    }
    if (nthreads > 1) {
        std::atomic<size_t> next{0};
        std::vector<std::thread> ths;
        for (int t = 0; t < nthreads; ++t)
            ths.emplace_back([&]() {
                size_t b0;
                while ((b0 = next.fetch_add(64)) < nb) {
                    size_t e = b0 + 64 < nb ? b0 + 64 : nb;
                    for (size_t b = b0; b < e; ++b)
                        std::sort(tmp.begin() + off[b],
                                  tmp.begin() + off[b + 1]);
                }
            });
        for (auto &th : ths) th.join();
    } else {
        for (size_t b = 0; b < nb; ++b)
            std::sort(tmp.begin() + off[b], tmp.begin() + off[b + 1]);
    }
    v.swap(tmp);
}

extern "C" {

// ---------------------------------------------------------------------------
// Piece-wise finalize: consumes the per-contig sketch outputs directly —
// no host-side concatenation, no (key, y) staging vector, and the key
// width is known a priori (hash64 masks to 2k bits, sketch.c:30), so
// there is no max-scan pass. On a memory-bandwidth-starved host this
// saves ~3 full passes over the minimizer array vs mm2_finalize_index.
// Emission is fused into the per-bucket sort walk (cache-hot), and keys
// never straddle buckets (bucketing is by the key's top bits).
int64_t mm2_finalize_pieces(int32_t npieces, const int64_t *ns,
                            const uint64_t *const *xs,
                            const uint64_t *const *ys, int32_t key_bits,
                            uint64_t *pos_out, uint64_t *keys_out,
                            int64_t *start_out, int32_t *cnt_out,
                            int32_t n_threads) {
    const int BB = 13;
    int64_t n = 0;
    for (int32_t p = 0; p < npieces; ++p) n += ns[p];
    if (n <= 0) return 0;
    int shift = key_bits > BB ? key_bits - BB : 0;
    size_t nb = (size_t)1 << (key_bits > BB ? BB : key_bits);
    std::vector<int64_t> off(nb + 1, 0);
    for (int32_t p = 0; p < npieces; ++p) {
        const uint64_t *x = xs[p];
        for (int64_t i = 0; i < ns[p]; ++i)
            ++off[(size_t)((x[i] >> 8) >> shift) + 1];
    }
    for (size_t b = 1; b <= nb; ++b) off[b] += off[b - 1];
    std::vector<std::pair<uint64_t, uint64_t>> tmp((size_t)n);
    {
        std::vector<int64_t> cur(off.begin(), off.end() - 1);
        for (int32_t p = 0; p < npieces; ++p) {
            const uint64_t *x = xs[p], *y = ys[p];
            for (int64_t i = 0; i < ns[p]; ++i)
                tmp[cur[(size_t)((x[i] >> 8) >> shift)]++] = {x[i] >> 8,
                                                              y[i]};
        }
    }
    // per-bucket: sort, then emit pos + key runs while the range is hot.
    // start_out/cnt_out slots are claimed per bucket by counting each
    // bucket's distinct keys first, so buckets can run on threads.
    std::vector<int64_t> koff(nb + 1, 0);
    auto sort_bucket = [&](size_t b) {
        std::sort(tmp.begin() + off[b], tmp.begin() + off[b + 1]);
        int64_t nk = 0;
        uint64_t prev = ~0ULL;
        for (int64_t i = off[b]; i < off[b + 1]; ++i)
            if (tmp[i].first != prev) { ++nk; prev = tmp[i].first; }
        koff[b + 1] = nk;
    };
    auto emit_bucket = [&](size_t b) {
        int64_t k = koff[b] - 1;
        uint64_t prev = ~0ULL;
        for (int64_t i = off[b]; i < off[b + 1]; ++i) {
            pos_out[i] = tmp[i].second;
            if (tmp[i].first != prev) {
                ++k;
                keys_out[k] = prev = tmp[i].first;
                start_out[k] = i;
                cnt_out[k] = 1;
            } else {
                ++cnt_out[k];
            }
        }
    };
    if (n_threads > 1) {
        std::atomic<size_t> next{0};
        std::vector<std::thread> ths;
        for (int t = 0; t < n_threads; ++t)
            ths.emplace_back([&]() {
                size_t b;
                while ((b = next.fetch_add(1)) < nb) sort_bucket(b);
            });
        for (auto &th : ths) th.join();
        for (size_t b = 1; b <= nb; ++b) koff[b] += koff[b - 1];
        std::atomic<size_t> next2{0};
        std::vector<std::thread> ths2;
        for (int t = 0; t < n_threads; ++t)
            ths2.emplace_back([&]() {
                size_t b;
                while ((b = next2.fetch_add(1)) < nb) emit_bucket(b);
            });
        for (auto &th : ths2) th.join();
    } else {
        for (size_t b = 0; b < nb; ++b) {
            sort_bucket(b);
            koff[b + 1] += koff[b];
            emit_bucket(b);
        }
    }
    return koff[nb];
}

// ---------------------------------------------------------------------------
int64_t mm2_finalize_index(int64_t n, const uint64_t *x, const uint64_t *y,
                           uint64_t *pos_out, uint64_t *keys_out,
                           int64_t *start_out, int32_t *cnt_out,
                           int32_t n_threads) {
    if (n <= 0) return 0;
    std::vector<std::pair<uint64_t, uint64_t>> v((size_t)n);
    for (int64_t i = 0; i < n; ++i) v[i] = {x[i] >> 8, y[i]};
    msb_bucket_sort(v, n_threads > 1 ? n_threads : 1);
    int64_t nk = -1;
    uint64_t prev = 0;
    for (int64_t i = 0; i < n; ++i) {
        pos_out[i] = v[i].second;
        if (nk < 0 || v[i].first != prev) {
            ++nk;
            keys_out[nk] = prev = v[i].first;
            start_out[nk] = i;
            cnt_out[nk] = 1;
        } else {
            ++cnt_out[nk];
        }
    }
    return nk + 1;
}

// ---------------------------------------------------------------------------
// .mmi bucket-region parsing (index.c:481-534 layout), two phases so the
// caller can pre-allocate exact outputs:
//   mm2_scan_mmi_buckets  — walk the headers, return entry/pos counts and
//                           the region's byte length
//   mm2_read_mmi_buckets  — fill caller-allocated CSR arrays; keys sorted
//                           globally by minier via a 16-byte (key, idx)
//                           sort; pos gathered straight from the buffer
// ---------------------------------------------------------------------------
int mm2_scan_mmi_buckets(const uint8_t *buf, int64_t len, int32_t b,
                         int64_t *n_entries_out, int64_t *npos_out,
                         int64_t *consumed_out) {
    const uint8_t *cur = buf, *end = buf + len;
    int64_t nb = (int64_t)1 << b;
    int64_t n_entries = 0, npos = 0;
    for (int64_t bucket = 0; bucket < nb; ++bucket) {
        if (end - cur < 4) return -1;
        int32_t n;
        memcpy(&n, cur, 4);
        cur += 4;
        if (n < 0 || end - cur < (int64_t)n * 8 + 4) return -1;
        cur += (int64_t)n * 8;
        uint32_t size;
        memcpy(&size, cur, 4);
        cur += 4;
        if (end - cur < (int64_t)size * 16) return -1;
        // per-entry pos contribution, validating multi-run bounds
        // against this bucket's p array (a corrupt/malicious file must
        // not drive the fill pass out of bounds)
        for (uint32_t j = 0; j < size; ++j) {
            uint64_t key, val;
            memcpy(&key, cur + (int64_t)j * 16, 8);
            memcpy(&val, cur + (int64_t)j * 16 + 8, 8);
            if (key & 1) {
                ++npos;
            } else {
                uint64_t st = val >> 32, c = val & 0xFFFFFFFFu;
                if (st + c > (uint64_t)n) return -1;
                npos += (int64_t)c;
            }
        }
        cur += (int64_t)size * 16;
        n_entries += size;
    }
    *n_entries_out = n_entries;
    *npos_out = npos;
    *consumed_out = cur - buf;
    return 0;
}

int mm2_read_mmi_buckets(const uint8_t *buf, int64_t len, int32_t b,
                         int64_t n_entries, uint64_t *keys_out,
                         int64_t *start_out, int32_t *cnt_out,
                         uint64_t *pos_out) {
    // One compact record per entry, sorted WHOLE (key embedded), via a
    // two-pass radix partition. The original (key, idx) pair sort left
    // the output pass with two unhideable random streams (a 300 Mb
    // index took minutes; the reference loads it in ~2.6 s). Three
    // things matter at this scale on a virtualized host:
    //   1. records carry everything (no indirection) and singleton
    //      payloads point INTO buf like runs do, so records are 24 B;
    //   2. the radix runs in two passes (2^7 coarse then 2^7 fine
    //      bins), keeping every pass's active write set TLB/cache
    //      local — one giant scatter was page-walk-bound (EPT);
    //   3. the output gather prefetches the single remaining random
    //      stream (buf) ~24 records ahead.
    struct Rec {
        uint64_t first;  // reconstructed minier (sort key)
        int64_t src;     // byte offset in buf: the run, or the
                         // singleton's value word (cnt == 1)
        int32_t cnt;
        bool operator<(const Rec &o) const { return first < o.first; }
    };
    std::vector<Rec> recs;
    recs.reserve(n_entries);
    advise_huge(recs.data(), (size_t)n_entries * sizeof(Rec));
    advise_huge((void *)buf, (size_t)len);
    const uint8_t *cur = buf, *end = buf + len;
    int64_t nb = (int64_t)1 << b;
    for (int64_t bucket = 0; bucket < nb; ++bucket) {
        if (end - cur < 4) return -1;
        int32_t n;
        memcpy(&n, cur, 4);
        cur += 4;
        if (n < 0 || end - cur < (int64_t)n * 8 + 4) return -1;
        int64_t p_base = cur - buf;
        cur += (int64_t)n * 8;
        uint32_t size;
        memcpy(&size, cur, 4);
        cur += 4;
        if (end - cur < (int64_t)size * 16) return -1;
        for (uint32_t j = 0; j < size; ++j) {
            uint64_t key, val;
            memcpy(&key, cur, 8);
            memcpy(&val, cur + 8, 8);
            cur += 16;
            Rec e;
            e.first = (key >> 1) << b | (uint64_t)bucket;
            if (key & 1) {
                e.src = (cur - buf) - 8;  // the value word itself
                e.cnt = 1;
            } else {
                uint64_t st = val >> 32, c = val & 0xFFFFFFFFu;
                if (st + c > (uint64_t)n) return -1;
                e.src = p_base + (int64_t)st * 8;
                e.cnt = (int32_t)c;
            }
            recs.push_back(e);
        }
    }
    if ((int64_t)recs.size() != n_entries) return -1;
    // two-pass radix partition + per-fine-bin sorts
    if (n_entries < (int64_t)1 << 16) {
        std::sort(recs.begin(), recs.end());
    } else {
        uint64_t maxk = 0;
        for (const auto &e : recs) if (e.first > maxk) maxk = e.first;
        int bits = 64 - __builtin_clzll(maxk | 1);
        const int C = 7, F = 7;
        int cs = bits > C ? bits - C : 0;
        size_t nc = ((size_t)(maxk >> cs)) + 1;
        std::vector<int64_t> coff(nc + 1, 0);
        for (const auto &e : recs) ++coff[(size_t)(e.first >> cs) + 1];
        for (size_t k = 1; k <= nc; ++k) coff[k] += coff[k - 1];
        std::vector<Rec> tmp(n_entries);
        advise_huge(tmp.data(), (size_t)n_entries * sizeof(Rec));
        {
            std::vector<int64_t> curo(coff.begin(), coff.end() - 1);
            for (const auto &e : recs)
                tmp[curo[(size_t)(e.first >> cs)]++] = e;
        }
        int fs = cs > F ? cs - F : 0;
        size_t nfmax = ((size_t)1 << (cs - fs)) + 1;
        std::vector<int64_t> foff(nfmax + 1);
        for (size_t c = 0; c < nc; ++c) {
            int64_t lo = coff[c], hi = coff[c + 1];
            if (hi - lo < 2) {
                if (hi > lo) recs[lo] = tmp[lo];
                continue;
            }
            if (fs == cs) {  // tiny key range left: sort directly
                std::copy(tmp.begin() + lo, tmp.begin() + hi,
                          recs.begin() + lo);
                std::sort(recs.begin() + lo, recs.begin() + hi);
                continue;
            }
            uint64_t base = (uint64_t)c << cs;
            size_t nf = 0;
            for (int64_t i = lo; i < hi; ++i) {
                size_t fbin = (size_t)((tmp[i].first - base) >> fs);
                if (fbin + 1 > nf) nf = fbin + 1;
            }
            std::fill(foff.begin(), foff.begin() + nf + 1, 0);
            for (int64_t i = lo; i < hi; ++i)
                ++foff[(size_t)((tmp[i].first - base) >> fs) + 1];
            for (size_t k = 1; k <= nf; ++k) foff[k] += foff[k - 1];
            {
                std::vector<int64_t> curo(foff.begin(), foff.begin() + nf);
                for (int64_t i = lo; i < hi; ++i)
                    recs[lo + curo[(size_t)((tmp[i].first - base)
                                            >> fs)]++] = tmp[i];
            }
            for (size_t k = 0; k < nf; ++k)
                std::sort(recs.begin() + lo + foff[k],
                          recs.begin() + lo + foff[k + 1]);
        }
    }
    const int64_t PF = 24;  // prefetch distance for the buf run stream
    int64_t o = 0;
    for (int64_t i = 0; i < n_entries; ++i) {
        if (i + PF < n_entries)
            __builtin_prefetch(buf + recs[i + PF].src);
        const Rec &e = recs[i];
        keys_out[i] = e.first;
        start_out[i] = o;
        cnt_out[i] = e.cnt;
        memcpy(pos_out + o, buf + e.src, (size_t)e.cnt * 8);
        o += e.cnt;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// CIGAR-walk stats for mm_update_extra (align.c:240-286): per-op ambiguous
// base counts, match/block lengths, and the clamped running DP score whose
// peak is dp_max. qseq/tseq start at the region's qs1/rs1 (post fix_cigar
// shift). out: [blen, mlen, n_ambi, dp_max, qoff, toff].
// ---------------------------------------------------------------------------
void mm2_update_stats(const uint32_t *cigar, int64_t n_cigar,
                      const uint8_t *qseq, const uint8_t *tseq,
                      const int8_t *mat /*5x5*/, int32_t q, int32_t e,
                      int64_t *out) {
    int64_t blen = 0, mlen = 0, n_ambi = 0;
    int64_t toff = 0, qoff = 0;
    int64_t s = 0, mx = 0;
    for (int64_t k = 0; k < n_cigar; ++k) {
        uint32_t c = cigar[k];
        int32_t op = c & 0xF;
        int64_t ln = c >> 4;
        if (op == 0) {
            int64_t na = 0, nd = 0;
            for (int64_t l = 0; l < ln; ++l) {
                uint8_t cq = qseq[qoff + l], ct = tseq[toff + l];
                bool ambi = cq > 3 || ct > 3;
                na += ambi;
                nd += !ambi && cq != ct;
                s += mat[(int32_t)ct * 5 + cq];
                if (s < 0) s = 0;
                else if (s > mx) mx = s;
            }
            blen += ln - na;
            mlen += ln - (na + nd);
            n_ambi += na;
            toff += ln;
            qoff += ln;
        } else if (op == 1) {
            int64_t na = 0;
            for (int64_t l = 0; l < ln; ++l) na += qseq[qoff + l] > 3;
            blen += ln - na;
            n_ambi += na;
            s -= q + e * ln;
            if (s < 0) s = 0;
            qoff += ln;
        } else if (op == 2) {
            int64_t na = 0;
            for (int64_t l = 0; l < ln; ++l) na += tseq[toff + l] > 3;
            blen += ln - na;
            n_ambi += na;
            s -= q + e * ln;
            if (s < 0) s = 0;
            toff += ln;
        } else if (op == 3) {
            toff += ln;
        }
    }
    out[0] = blen;
    out[1] = mlen;
    out[2] = n_ambi;
    out[3] = mx;
    out[4] = qoff;
    out[5] = toff;
}

// ---------------------------------------------------------------------------
// Z-drop scan of mm_test_zdrop (align.c:52-68): running last-occurrence
// score max (ties update), best first-occurrence drop penalized by the
// diagonal shift. out: [max_zdrop, i_at_max, i_at_drop, j_at_max, j_at_drop]
// (positions -1 when max_zdrop <= 0).
// ---------------------------------------------------------------------------
void mm2_zdrop_scan(const uint32_t *cigar, int64_t n_cigar,
                    const uint8_t *qseq, const uint8_t *tseq,
                    const int8_t *mat /*5x5*/, int32_t q, int32_t e,
                    int64_t *out) {
    const int64_t NEG = -0x7FFFFFFFFFFFLL;
    int64_t s = 0, best_m = NEG;
    int64_t mi = 0, mj = 0;        // (i, j) at the running max
    int64_t max_z = NEG;
    int64_t zi0 = -1, zi1 = -1, zj0 = -1, zj1 = -1;
    int64_t i = 0, j = 0;
    bool any = false;
    for (int64_t k = 0; k < n_cigar; ++k) {
        uint32_t c = cigar[k];
        int32_t op = c & 0xF;
        int64_t ln = c >> 4;
        if (op == 0) {
            for (int64_t l = 0; l < ln; ++l) {
                s += mat[(int32_t)tseq[i + l] * 5 + qseq[j + l]];
                int64_t ii = i + l, jj = j + l;
                if (s >= best_m) {
                    best_m = s;
                    mi = ii;
                    mj = jj;
                } else {
                    int64_t dd = (ii - jj) - (mi - mj);
                    if (dd < 0) dd = -dd;
                    int64_t z = best_m - s - dd * e;
                    if (z > max_z) {
                        max_z = z;
                        zi0 = mi;
                        zi1 = ii;
                        zj0 = mj;
                        zj1 = jj;
                    }
                }
            }
            i += ln;
            j += ln;
            any = true;
        } else if (op == 1 || op == 2 || op == 3) {
            s -= q + e * ln;
            if (op == 1) j += ln;
            else i += ln;
            if (s >= best_m) {
                best_m = s;
                mi = i;
                mj = j;
            } else {
                int64_t dd = (i - j) - (mi - mj);
                if (dd < 0) dd = -dd;
                int64_t z = best_m - s - dd * e;
                if (z > max_z) {
                    max_z = z;
                    zi0 = mi;
                    zi1 = i;
                    zj0 = mj;
                    zj1 = j;
                }
            }
            any = true;
        }
    }
    if (!any || max_z <= 0) {
        out[0] = 0;
        out[1] = out[2] = out[3] = out[4] = -1;
        return;
    }
    out[0] = max_z;
    out[1] = zi0;
    out[2] = zi1;
    out[3] = zj0;
    out[4] = zj1;
}

// One seed-gap fill of the align loop (align.c:709-765 semantics, the
// align.py fill sequence fused): approximate-max extd2, the zdrop test
// over the resulting CIGAR (mm_test_zdrop, align.c:47-89, including the
// inversion probe via the striped local SW), and the exact re-run when
// the test trips — a single FFI crossing instead of up to four (the
// Python-side call overhead dominated the align stage).
// zdrop_code_out: 0 = pass, 1 = zdrop, 2 = inversion. When the code is
// nonzero the returned ez/cigar are from the exact re-run, exactly as
// the unfused sequence produced.
int mm2_ksw_extd2_fill(int32_t qlen, const uint8_t *query, int32_t tlen,
                       const uint8_t *target, const int8_t *mat,
                       int32_t q, int32_t e, int32_t q2, int32_t e2,
                       int32_t w, int32_t zdrop, int32_t zdrop_inv,
                       int32_t flag, int32_t inv_enabled, int32_t max_gap,
                       int64_t min_inv_score, int64_t min_dp_max,
                       int64_t *ez_out, uint32_t **cigar_out,
                       int32_t *n_cigar_out, int32_t *zdrop_code_out) {
    int rc = mm2_ksw_extd2(qlen, query, tlen, target, mat, q, e, q2, e2, w,
                           zdrop, -1, flag | EZ_APPROX_MAX, ez_out,
                           cigar_out, n_cigar_out);
    *zdrop_code_out = 0;
    if (rc != 0) return rc;
    int64_t zs[5];
    mm2_zdrop_scan(*cigar_out, *n_cigar_out, query, target, mat, q, e, zs);
    int64_t max_z = zs[0];
    int32_t code = 0;
    if (max_z > 0) {
        int64_t t_len = zs[2] - zs[1], q_len = zs[4] - zs[3];
        if (inv_enabled && max_z > zdrop_inv && q_len < max_gap &&
            t_len < max_gap) {
            std::vector<uint8_t> sub((size_t)(q_len > 0 ? q_len : 0));
            for (int64_t i = 0; i < q_len; ++i) {
                uint8_t c = query[zs[4] - 1 - i];
                sub[i] = c >= 4 ? 4 : (uint8_t)(3 - c);
            }
            int64_t ll_out[3];
            mm2_ksw_ll((int32_t)q_len, sub.data(), (int32_t)t_len,
                       target + zs[1], mat, q, e, ll_out);
            if (ll_out[0] >= min_inv_score && ll_out[0] >= min_dp_max)
                code = 2;
        }
        if (code == 0 && max_z > zdrop) code = 1;
    }
    *zdrop_code_out = code;
    if (code != 0) {
        if (*n_cigar_out) {
            free(*cigar_out);
            *cigar_out = nullptr;
            *n_cigar_out = 0;
        }
        rc = mm2_ksw_extd2(qlen, query, tlen, target, mat, q, e, q2, e2, w,
                           code == 2 ? zdrop_inv : zdrop, -1, flag, ez_out,
                           cigar_out, n_cigar_out);
    }
    return rc;
}

// Param-packed variant of the fused fill: the 14 scalar parameters ride
// in one int64 array so the ctypes FFI marshals 8 arguments instead of
// 21 (scalar marshalling dominated the per-call cost at ~5k fills/100
// reads). par = [qlen, tlen, q, e, q2, e2, w, zdrop, zdrop_inv, flag,
// inv_enabled, max_gap, min_inv_score, min_dp_max, S_ptr, ref_off,
// q_ptr]. When par[14] is nonzero it is the 4-bit packed reference
// (mm_seq4_get layout) and the target is unpacked here from absolute
// offset par[15] — the caller skips its per-fill getseq + pointer
// extraction entirely. When par[16] is nonzero it is the query pointer.
int mm2_ksw_extd2_fillp(const int64_t *par, const uint8_t *query,
                        const uint8_t *target, const int8_t *mat,
                        int64_t *ez_out, uint32_t **cigar_out,
                        int32_t *n_cigar_out, int32_t *zdrop_code_out) {
    static thread_local std::vector<uint8_t> tbuf;
    if (par[14]) {
        const uint32_t *S = (const uint32_t *)par[14];
        int64_t off = par[15];
        int32_t tlen = (int32_t)par[1];
        if ((int32_t)tbuf.size() < tlen) tbuf.resize(tlen);
        for (int32_t t = 0; t < tlen; ++t) {
            int64_t o = off + t;
            tbuf[t] = (S[o >> 3] >> ((o & 7) << 2)) & 0xF;
        }
        target = tbuf.data();
    }
    if (par[16]) query = (const uint8_t *)par[16];
    return mm2_ksw_extd2_fill(
        (int32_t)par[0], query, (int32_t)par[1], target, mat,
        (int32_t)par[2], (int32_t)par[3], (int32_t)par[4], (int32_t)par[5],
        (int32_t)par[6], (int32_t)par[7], (int32_t)par[8], (int32_t)par[9],
        (int32_t)par[10], (int32_t)par[11], par[12], par[13], ez_out,
        cigar_out, n_cigar_out, zdrop_code_out);
}

// Batched seed-walk (the align.c:700-771 gap-fill loop): execute a
// PRECOMPUTED sequence of fused gap fills in ONE FFI crossing. The gap
// geometry is deterministic — each fill starts where the previous seed
// ended regardless of the fill's result — so the host plans the rows up
// front and this loop only has to stop early when a fill zdrops (the
// zdropped gap's CIGAR is still merged first, matching the host loop).
// Per-gap CIGARs merge with the append_cigar boundary-run rule
// (align.c:186-205) and the non-zdropped dp scores accumulate.
// gaps: ngaps x 5 int64 rows [qlen, tlen, q_off, ref_off, bw].
// par: the mm2_ksw_extd2_fillp constant layout (indices 2..5 scores,
// 7..13 zdrop/flag/inv/caps, 14 = 4-bit packed reference, 16 = query
// base pointer); per-gap w/qlen/tlen/offsets come from the rows.
// walk_out: [n_done, zdrop_code_of_last_gap, score_sum, zdropped].
int mm2_ksw_fill_walk(const int64_t *gaps, int64_t ngaps,
                      const int64_t *par, const int8_t *mat,
                      int64_t *ez_out, uint32_t **cigar_out,
                      int32_t *n_cigar_out, int64_t *walk_out) {
    static thread_local std::vector<uint8_t> tbuf;
    static thread_local std::vector<uint32_t> cbuf;
    cbuf.clear();
    const uint32_t *S = (const uint32_t *)par[14];
    const uint8_t *qbase = (const uint8_t *)par[16];
    int64_t score_sum = 0, n_done = 0, zdropped = 0;
    int32_t code = 0;
    *cigar_out = nullptr;
    *n_cigar_out = 0;
    for (int64_t g = 0; g < ngaps; ++g) {
        const int64_t *row = gaps + g * 5;
        const int32_t qlen = (int32_t)row[0], tlen = (int32_t)row[1];
        const int64_t off = row[3];
        if ((int64_t)tbuf.size() < (int64_t)tlen) tbuf.resize(tlen);
        for (int32_t t = 0; t < tlen; ++t) {
            const int64_t o = off + t;
            tbuf[t] = (S[o >> 3] >> ((o & 7) << 2)) & 0xF;
        }
        uint32_t *cig = nullptr;
        int32_t ncig = 0;
        int rc = mm2_ksw_extd2_fill(
            qlen, qbase + row[2], tlen, tbuf.data(), mat, (int32_t)par[2],
            (int32_t)par[3], (int32_t)par[4], (int32_t)par[5],
            (int32_t)row[4], (int32_t)par[7], (int32_t)par[8],
            (int32_t)par[9], (int32_t)par[10], (int32_t)par[11], par[12],
            par[13], ez_out, &cig, &ncig, &code);
        if (rc != 0) return rc;
        if (ncig) {
            int64_t start = 0;
            if (!cbuf.empty() && (cbuf.back() & 0xF) == (cig[0] & 0xF)) {
                cbuf.back() += cig[0] >> 4 << 4;  // merge the boundary run
                start = 1;
            }
            cbuf.insert(cbuf.end(), cig + start, cig + ncig);
            free(cig);
        }
        ++n_done;
        if (ez_out[1]) {  // zdropped: host handles the chain split
            zdropped = 1;
            break;
        }
        score_sum += ez_out[8];
    }
    if (!cbuf.empty()) {
        *cigar_out = (uint32_t *)malloc(cbuf.size() * sizeof(uint32_t));
        if (!*cigar_out) return -1;
        memcpy(*cigar_out, cbuf.data(), cbuf.size() * sizeof(uint32_t));
        *n_cigar_out = (int32_t)cbuf.size();
    }
    walk_out[0] = n_done;
    walk_out[1] = code;
    walk_out[2] = score_sum;
    walk_out[3] = zdropped;
    return 0;
}

// mm_fix_cigar (align.c:91-167): indel left-shift, 5I6D7I merge,
// leading-indel trim — in place on the uint32 cigar array. out =
// [qshift, tshift, lead_op, qoff, toff]; returns the new length. The
// Python caller applies the region-coordinate updates from lead_op and
// asserts qoff/toff against the region spans.
int64_t mm2_fix_cigar(uint32_t *cig, int64_t n, const uint8_t *qseq,
                      const uint8_t *tseq, int64_t *out) {
    int64_t qshift = 0, tshift = 0, lead_op = 0;
    int64_t toff = 0, qoff = 0;
    bool to_shrink = false;
    for (int64_t k = 0; k < n; ++k) {
        uint32_t op = cig[k] & 0xF;
        int64_t ln = cig[k] >> 4;
        if (ln == 0) to_shrink = true;
        if (op == 0) {
            toff += ln;
            qoff += ln;
        } else if (op == 1 || op == 2) {
            if (k > 0 && k < n - 1 && (cig[k - 1] & 0xF) == 0 &&
                (cig[k + 1] & 0xF) == 0) {
                int64_t prev_len = cig[k - 1] >> 4;
                int64_t l = 0;
                if (op == 1) {
                    while (l < prev_len &&
                           qseq[qoff - 1 - l] == qseq[qoff + ln - 1 - l])
                        ++l;
                } else {
                    while (l < prev_len &&
                           tseq[toff - 1 - l] == tseq[toff + ln - 1 - l])
                        ++l;
                }
                if (l > 0) {
                    cig[k - 1] -= (uint32_t)(l << 4);
                    cig[k + 1] += (uint32_t)(l << 4);
                    qoff -= l;
                    toff -= l;
                }
                if (l == prev_len) to_shrink = true;
            }
            if (op == 1) qoff += ln;
            else toff += ln;
        } else if (op == 3) {
            toff += ln;
        }
    }
    for (int64_t k = 0; k + 2 < n;) {  // fix CIGAR like 5I6D7I
        uint32_t opk = cig[k] & 0xF;
        if (opk > 0 && opk + (cig[k + 1] & 0xF) == 3) {
            int64_t s1 = 0, s2 = 0;
            int64_t l = k;
            for (; l < n; ++l) {
                uint32_t op = cig[l] & 0xF;
                if (op == 1 || op == 2 || (cig[l] >> 4) == 0) {
                    if (op == 1) s1 += cig[l] >> 4;
                    else if (op == 2) s2 += cig[l] >> 4;
                } else {
                    break;
                }
            }
            if (s1 > 0 && s2 > 0 && l - k > 2) {
                cig[k] = (uint32_t)(s1 << 4 | 1);
                cig[k + 1] = (uint32_t)(s2 << 4 | 2);
                for (int64_t kk = k + 2; kk < l; ++kk) cig[kk] &= 0xF;
                to_shrink = true;
            }
            k = l + 1;
        } else {
            ++k;
        }
    }
    if (to_shrink) {
        int64_t m_ = 0;
        for (int64_t k = 0; k < n; ++k) {
            if ((cig[k] >> 4) == 0) continue;
            if (m_ > 0 && (cig[m_ - 1] & 0xF) == (cig[k] & 0xF))
                cig[m_ - 1] += (cig[k] >> 4) << 4;
            else
                cig[m_++] = cig[k];
        }
        n = m_;
    }
    if (n > 0 && ((cig[0] & 0xF) == 1 || (cig[0] & 0xF) == 2)) {
        int64_t l = cig[0] >> 4;
        lead_op = cig[0] & 0xF;
        if (lead_op == 1) qshift = l;
        else tshift = l;
        memmove(cig, cig + 1, (size_t)(n - 1) * sizeof(uint32_t));
        --n;
    }
    out[0] = qshift;
    out[1] = tshift;
    out[2] = lead_op;
    out[3] = qoff;
    out[4] = toff;
    return n;
}

int mm2_has_fill() { return 1; }

int mm2_has_lookup() { return 1; }

// 4-bit reference packing (mm_seq4_set, mmpriv.h:29): one linear pass,
// ~40x the NumPy scatter/shift-or path on large contigs.
void mm2_pack_seq4(const uint8_t *codes, int64_t n, uint32_t *S,
                   int64_t offset) {
    int64_t i = 0;
    // unaligned head
    for (; i < n && ((offset + i) & 7); ++i)
        S[(offset + i) >> 3] |= (uint32_t)codes[i] << (((offset + i) & 7) << 2);
    // aligned body: build whole words
    for (; i + 8 <= n; i += 8) {
        uint32_t w = 0;
        for (int j = 0; j < 8; ++j)
            w |= (uint32_t)codes[i + j] << (j << 2);
        S[(offset + i) >> 3] |= w;
    }
    for (; i < n; ++i)
        S[(offset + i) >> 3] |= (uint32_t)codes[i] << (((offset + i) & 7) << 2);
}

// Chain-end detection, peak backtrack, compaction order (chain.c:348-422).
// Writes the compacted anchor-index order into idx_out (caller gathers
// a[idx]) and per-chain score<<32|cnt into u_out, chains ordered by first
// anchor position (stable). Returns total anchors across chains; n_u via
// pointer. f/p/v are all int32 (the binding coerces 64-bit device-path
// parent arrays before the call).
int64_t mm2_chain_backtrack(int64_t n, const int32_t *f, const int32_t *p,
                            const int32_t *v, const uint64_t *a,
                            int32_t min_cnt, int32_t min_sc,
                            int64_t *idx_out, uint64_t *u_out,
                            int64_t *n_u_out) {
    *n_u_out = 0;
    if (n <= 0) return 0;
    std::vector<uint8_t> t(n, 0);
    for (int64_t i = 0; i < n; ++i)
        if (p[i] >= 0) t[p[i]] = 1;
    std::vector<uint64_t> u;
    for (int64_t i = 0; i < n; ++i) {
        if (t[i] || v[i] < min_sc) continue;
        int64_t j = i;
        while (j >= 0 && f[j] < v[j]) j = p[j];
        if (j < 0) j = i;
        u.push_back(((uint64_t)(uint32_t)f[j] << 32) | (uint64_t)j);
    }
    if (u.empty()) return 0;
    std::sort(u.begin(), u.end(), std::greater<uint64_t>());
    std::fill(t.begin(), t.end(), 0);
    struct Chain { int64_t sc, start, len; };
    std::vector<Chain> chains;
    std::vector<int64_t> paths;  // concatenated reversed-walk indices
    for (uint64_t ui : u) {
        int64_t j = (int64_t)(ui & 0xFFFFFFFFu);
        int64_t start = (int64_t)paths.size();
        int64_t last;
        for (;;) {
            paths.push_back(j);
            t[j] = 1;
            last = j;
            j = p[j];
            if (j < 0 || t[j]) break;
        }
        (void)last;
        int64_t len = (int64_t)paths.size() - start;
        int64_t sc_end = (int64_t)(ui >> 32);
        bool keep = false;
        int64_t net = sc_end;
        if (j < 0) {
            keep = len >= min_cnt;
        } else if (sc_end - f[j] >= min_sc) {
            net = sc_end - f[j];
            keep = len >= min_cnt;
        }
        if (keep) chains.push_back({net, start, len});
        else paths.resize(start);
    }
    if (chains.empty()) return 0;
    // order chains by first-anchor x (the path walk collects indices
    // descending, so the chain's first anchor is the walk's last entry)
    std::stable_sort(chains.begin(), chains.end(),
                     [&](const Chain &x, const Chain &y) {
                         return a[2 * paths[x.start + x.len - 1]] <
                                a[2 * paths[y.start + y.len - 1]];
                     });
    int64_t pos = 0, ci = 0;
    for (const Chain &c : chains) {
        for (int64_t k = c.len - 1; k >= 0; --k)
            idx_out[pos++] = paths[c.start + k];
        u_out[ci++] = ((uint64_t)c.sc << 32) | (uint64_t)c.len;
    }
    *n_u_out = ci;
    return pos;
}

// Pre-align mm_set_parent + mm_select_sub + mm_sync_regs over the
// gen_regs field arrays (hit.c:125-186, 255-272, 231-253) — the fast
// path for the single-segment no-ALT case where no region carries
// alignment Extra state. Region objects are then built only for the
// ~best_n survivors. Returns n_kept; keep_out holds indices into the
// input order, parent_out positions within the kept set.
int64_t mm2_set_parent_select(
    int64_t n, const int32_t *score, const int32_t *qs, const int32_t *qe,
    const int32_t *cnt, const int32_t *rid, const int32_t *rs,
    const int32_t *re, float mask_level, int32_t mask_len, int32_t sub_diff,
    int32_t hard_mask, float pri_ratio, int32_t min_diff, int32_t best_n,
    int64_t *keep_out, int32_t *parent_out, int32_t *n_sub_out,
    int32_t *subsc_out, uint8_t *sam_pri_out) {
    (void)sub_diff;  // only consulted via Extra (absent pre-align)
    if (n <= 0) return 0;
    std::vector<int32_t> parent(n, -1), n_sub(n, 0), subsc(n, 0);
    std::vector<int64_t> w;
    w.reserve(64);
    parent[0] = 0;
    w.push_back(0);
    std::vector<uint64_t> cov;
    for (int64_t i = 1; i < n; ++i) {
        int32_t si = qs[i], ei = qe[i];
        int64_t uncov_len = 0;
        if (!hard_mask) {
            cov.clear();
            for (size_t j = 0; j < w.size(); ++j) {
                int32_t sj = qs[w[j]], ej = qe[w[j]];
                if (ej <= si || sj >= ei) continue;
                int32_t cs = sj > si ? sj : si, ce = ej < ei ? ej : ei;
                cov.push_back(((uint64_t)(uint32_t)cs << 32) |
                              (uint32_t)ce);
            }
            if (!cov.empty()) {
                std::sort(cov.begin(), cov.end());
                int64_t x = si;
                for (uint64_t cj : cov) {
                    int64_t cs = (int64_t)(cj >> 32);
                    int64_t ce = (int64_t)(cj & 0xFFFFFFFFu);
                    if (cs > x) uncov_len += cs - x;
                    if (ce > x) x = ce;
                }
                if (ei > x) uncov_len += ei - x;
            } else {
                w.push_back(i);
                parent[i] = (int32_t)i;
                n_sub[i] = 0;
                continue;
            }
        }
        bool found = false;
        for (size_t j = 0; j < w.size(); ++j) {
            int64_t pj = w[j];
            int32_t sj = qs[pj], ej = qe[pj];
            if (ej <= si || sj >= ei) continue;
            int32_t lj = ej - sj, li = ei - si;
            int32_t mn = lj < li ? lj : li, mx = lj > li ? lj : li;
            int32_t ol;
            if (si < sj)
                ol = ei < sj ? 0 : (ei < ej ? ei - sj : ej - sj);
            else
                ol = ej < si ? 0 : (ej < ei ? ej - si : ei - si);
            if ((float)ol / (float)mn -
                    (float)uncov_len / (float)mx > mask_level &&
                uncov_len <= mask_len) {
                parent[i] = parent[pj];
                if (score[i] > subsc[pj]) subsc[pj] = score[i];
                if (cnt[i] >= cnt[pj]) ++n_sub[pj];
                found = true;
                break;
            }
        }
        if (!found) {
            w.push_back(i);
            parent[i] = (int32_t)i;
            n_sub[i] = 0;
        }
    }
    // mm_select_sub + sync
    std::vector<int64_t> keep;
    keep.reserve(n);
    if (pri_ratio > 0.0f) {
        int32_t n_2nd = 0;
        for (int64_t i = 0; i < n; ++i) {
            int32_t p_ = parent[i];
            if (p_ == (int32_t)i) {
                keep.push_back(i);
            } else if (((float)score[i] >=
                            (float)score[p_] * pri_ratio ||
                        score[i] + min_diff >= score[p_]) &&
                       n_2nd < best_n) {
                if (!(qs[i] == qs[p_] && qe[i] == qe[p_] &&
                      rid[i] == rid[p_] && rs[i] == rs[p_] &&
                      re[i] == re[p_])) {
                    keep.push_back(i);
                    ++n_2nd;
                }
            }
        }
    } else {
        for (int64_t i = 0; i < n; ++i) keep.push_back(i);
    }
    std::vector<int32_t> newpos(n, -1);
    for (size_t o = 0; o < keep.size(); ++o) newpos[keep[o]] = (int32_t)o;
    int32_t n_pri = 0;
    for (size_t o = 0; o < keep.size(); ++o) {
        int64_t i = keep[o];
        keep_out[o] = i;
        int32_t p_ = parent[i];
        int32_t np = (p_ >= 0 && newpos[p_] >= 0) ? newpos[p_] : -1;
        parent_out[o] = np;
        n_sub_out[o] = n_sub[i];
        subsc_out[o] = subsc[i];
        if (np == (int32_t)o) {
            ++n_pri;
            sam_pri_out[o] = n_pri == 1;
        } else {
            sam_pri_out[o] = 0;
        }
    }
    return (int64_t)keep.size();
}

// mm_gen_regs scalar core (hit.c:8-88): tie-broken score ordering plus
// per-region coordinates and fuzzy mlen/blen. Output arrays are in final
// (descending z) region order; the Python layer builds Region objects.
void mm2_gen_regs(int64_t n_u, const uint64_t *u, const uint64_t *a,
                  uint64_t hash_, int32_t qlen, int32_t *score,
                  uint32_t *hash_out, int32_t *cnt_out, int64_t *as_out,
                  uint8_t *rev, int32_t *rid, int32_t *rs, int32_t *re,
                  int32_t *qs, int32_t *qe, int32_t *mlen, int32_t *blen) {
    const uint64_t M = ~0ULL;
    std::vector<std::pair<uint64_t, int64_t> > z(n_u);  // (z0, i)
    std::vector<int64_t> koff(n_u);
    int64_t k = 0;
    for (int64_t i = 0; i < n_u; ++i) {
        uint64_t h = hash64((hash64(a[2 * k], M) + hash64(a[2 * k + 1], M))
                            ^ hash_, M) & 0xFFFFFFFFu;
        z[i] = {u[i] ^ h, i};
        koff[i] = k;
        k += (int64_t)(u[i] & 0xFFFFFFFFu);
    }
    std::stable_sort(z.begin(), z.end(),
                     [](const std::pair<uint64_t, int64_t> &x,
                        const std::pair<uint64_t, int64_t> &y) {
                         return x.first < y.first;
                     });
    for (int64_t oi = 0; oi < n_u; ++oi) {
        const auto &zz = z[n_u - 1 - oi];  // descending
        int64_t i = zz.second;
        int64_t as = koff[i];
        int32_t cnt = (int32_t)(u[i] & 0xFFFFFFFFu);
        score[oi] = (int32_t)(zz.first >> 32);
        hash_out[oi] = (uint32_t)(zz.first & 0xFFFFFFFFu);
        cnt_out[oi] = cnt;
        as_out[oi] = as;
        uint64_t ax = a[2 * as], ay = a[2 * as + 1];
        int32_t span = (int32_t)((ay >> 32) & 0xFF);
        rev[oi] = (uint8_t)(ax >> 63);
        rid[oi] = (int32_t)((ax << 1) >> 33);
        int32_t axl = (int32_t)(uint32_t)ax;
        rs[oi] = axl + 1 > span ? axl + 1 - span : 0;
        re[oi] = (int32_t)(uint32_t)a[2 * (as + cnt - 1)] + 1;
        int32_t ayl = (int32_t)(uint32_t)ay;
        int32_t byl = (int32_t)(uint32_t)a[2 * (as + cnt - 1) + 1];
        if (!rev[oi]) {
            qs[oi] = ayl + 1 - span;
            qe[oi] = byl + 1;
        } else {
            qs[oi] = qlen - (byl + 1);
            qe[oi] = qlen - (ayl + 1 - span);
        }
        // fuzzy mlen/blen (hit.c:8-21)
        int32_t ml = span, bl = span;
        uint64_t px = ax, py = ay;
        for (int64_t j = as + 1; j < as + cnt; ++j) {
            uint64_t bx = a[2 * j], by = a[2 * j + 1];
            int32_t sp = (int32_t)((by >> 32) & 0xFF);
            int32_t tl = (int32_t)(uint32_t)bx - (int32_t)(uint32_t)px;
            int32_t ql = (int32_t)(uint32_t)by - (int32_t)(uint32_t)py;
            bl += tl > ql ? tl : ql;
            ml += (tl > sp && ql > sp) ? sp : (tl < ql ? tl : ql);
            px = bx;
            py = by;
        }
        mlen[oi] = ml;
        blen[oi] = bl;
    }
}

// Batched CSR index probe (mm_idx_get over many minimizers,
// index.c:81-98). The khash probe becomes: high-bits LUT -> short binary
// search over the sorted key array. Queries are processed in interleaved
// flights of 16 with software prefetch so the (latency-bound) random key
// reads overlap instead of serializing.
void mm2_lookup_many(int64_t nq, const uint64_t *q, int64_t nk,
                     const uint64_t *keys, const int64_t *start,
                     const int32_t *cnt, int32_t lut_bits, int32_t shift,
                     const int64_t *lut, int64_t *out_start,
                     int32_t *out_cnt) {
    const int64_t nbkt = (int64_t)1 << lut_bits;
    const int F = 16;
    int64_t lo[F], hi[F];
    for (int64_t base = 0; base < nq; base += F) {
        const int m = (int)((nq - base < F) ? (nq - base) : F);
        for (int t = 0; t < m; ++t) {
            int64_t b = (int64_t)(q[base + t] >> shift);
            if (b >= nbkt) b = nbkt - 1;
            lo[t] = lut[b];
            hi[t] = lut[b + 1];
            if (hi[t] - lo[t] > 1)
                __builtin_prefetch(&keys[(lo[t] + hi[t]) >> 1], 0, 1);
        }
        bool again = true;
        while (again) {
            again = false;
            for (int t = 0; t < m; ++t) {
                if (hi[t] - lo[t] <= 1) continue;
                int64_t mid = (lo[t] + hi[t]) >> 1;
                if (keys[mid] <= q[base + t]) lo[t] = mid;
                else hi[t] = mid;
                if (hi[t] - lo[t] > 1) {
                    __builtin_prefetch(&keys[(lo[t] + hi[t]) >> 1], 0, 1);
                    again = true;
                }
            }
        }
        for (int t = 0; t < m; ++t) {
            int64_t i = lo[t];
            // lo converged to the last index with key <= q inside the
            // bucket run (or the run start when the run is empty/all >q)
            if (i < nk && keys[i] == q[base + t]) {
                out_start[base + t] = start[i];
                out_cnt[base + t] = cnt[i];
            } else {
                out_start[base + t] = 0;
                out_cnt[base + t] = 0;
            }
        }
    }
}

// grow-only per-thread scratch for the seeding fast path (the kalloc
// arena idea: repeated ~170 KB mallocs would mmap/munmap per read)
static thread_local std::vector<uint64_t> g_seed_b1, g_seed_b2, g_seed_b3,
    g_seed_b4;
static uint64_t *seed_scratch(size_t n) {
    if (g_seed_b1.size() < n) g_seed_b1.resize(n);
    return g_seed_b1.data();
}
static uint64_t *seed_scratch2(size_t n) {
    if (g_seed_b2.size() < n) g_seed_b2.resize(n);
    return g_seed_b2.data();
}

// ---------------------------------------------------------------------------
// Seeding fast path: index probe -> repeat accounting -> anchor
// construction -> stable radix sort by x. One native pass replacing
// collect_matches + collect_seed_hits (map.c:90-123, 215-247; anchor
// encoding map.c:232-241, radix_sort_128x map.c:245). Covers the default
// seed rules plus for-only/rev-only (skip_mode 1/2); the qname-dependent
// NO_DIAG/NO_DUAL (ava-*) rules stay in the Python path.
// mv: (n_mv,2) u64 query minimizers [hash<<8|span, seg<<32|pos<<1|strand].
// Outputs *out_anchors (2*n_a u64 pairs) and *out_mini_pos (n_mini u64)
// point into per-thread scratch: valid until this thread's next call,
// caller copies out and must NOT free. Returns n_a.
int64_t mm2_seed_hits(int64_t n_mv, const uint64_t *mv,
                      int64_t nk, const uint64_t *keys, const int64_t *start,
                      const int32_t *cnt, int32_t lut_bits, int32_t shift,
                      const int64_t *lut, const uint64_t *pos,
                      int32_t max_occ, int64_t qlen, int32_t skip_mode,
                      uint64_t **out_anchors, uint64_t **out_mini_pos,
                      int64_t *out_n_mini, int64_t *out_rep_len) {
    const uint64_t TANDEM = 1ULL << 42;   // MM_SEED_TANDEM (mmpriv.h:18)
    const int SEG_SHIFT = 48;             // MM_SEED_SEG_SHIFT
    std::vector<uint64_t> q((size_t)n_mv);
    for (int64_t i = 0; i < n_mv; ++i) q[(size_t)i] = mv[2 * i] >> 8;
    std::vector<int64_t> st((size_t)n_mv);
    std::vector<int32_t> c((size_t)n_mv);
    if (n_mv)
        mm2_lookup_many(n_mv, q.data(), nk, keys, start, cnt, lut_bits,
                        shift, lut, st.data(), c.data());
    // repeat-length accounting over dropped minimizers (map.c:104-110)
    int64_t rep_len = 0, rep_st = 0, rep_en = 0, total = 0, n_mini = 0;
    for (int64_t i = 0; i < n_mv; ++i) {
        if (c[(size_t)i] >= max_occ) {
            int64_t qp = (int64_t)(mv[2 * i + 1] & 0xFFFFFFFFULL);
            int64_t span = (int64_t)(mv[2 * i] & 0xFF);
            int64_t en = (qp >> 1) + 1, s2 = en - span;
            if (s2 > rep_en) {
                rep_len += rep_en - rep_st;
                rep_st = s2;
                rep_en = en;
            } else {
                rep_en = en;
            }
        } else {
            total += c[(size_t)i];
            ++n_mini;
        }
    }
    rep_len += rep_en - rep_st;
    if (g_seed_b3.size() < (size_t)(n_mini ? n_mini : 1))
        g_seed_b3.resize((size_t)(n_mini ? n_mini : 1));
    if (g_seed_b4.size() < 2 * (size_t)(total ? total : 1))
        g_seed_b4.resize(2 * (size_t)(total ? total : 1));
    uint64_t *mp = g_seed_b3.data();
    uint64_t *an = g_seed_b4.data();
    int64_t na = 0, nm = 0;
    for (int64_t i = 0; i < n_mv; ++i) {
        if (c[(size_t)i] >= max_occ) continue;
        const uint64_t xi = mv[2 * i], yi = mv[2 * i + 1];
        const int64_t qp = (int64_t)(yi & 0xFFFFFFFFULL);
        const uint64_t span = xi & 0xFF;
        const uint64_t seg = yi >> 32;
        mp[nm++] = (span << 32) | (uint64_t)(qp >> 1);
        // tandem: same hash as a neighbouring query minimizer
        // (map.c:114-115; computed over ALL minimizers, pre-filter)
        const bool tandem =
            (i > 0 && (mv[2 * (i - 1)] >> 8) == (xi >> 8)) ||
            (i + 1 < n_mv && (mv[2 * (i + 1)] >> 8) == (xi >> 8));
        const uint64_t ybase = (span << 32) | (seg << SEG_SHIFT) |
                               (tandem ? TANDEM : 0);
        const int q_strand = (int)(qp & 1);
        const uint64_t y_rev =
            ybase | (uint64_t)(qlen - ((qp >> 1) + 1 - (int64_t)span) - 1);
        const uint64_t y_fwd = ybase | (uint64_t)(qp >> 1);
        const uint64_t *pp = pos + st[(size_t)i];
        const int32_t ci = c[(size_t)i];
        if (skip_mode == 0) {
            for (int32_t j = 0; j < ci; ++j) {  // branchless hot loop
                const uint64_t r = pp[j];
                const uint64_t fwd = (uint64_t)0 - ((r & 1) == (uint64_t)q_strand);
                const uint64_t x = ((r >> 32) << 32) | ((r & 0xFFFFFFFFULL) >> 1);
                an[2 * na] = x | ((~fwd) & (1ULL << 63));
                an[2 * na + 1] = y_rev ^ ((y_fwd ^ y_rev) & fwd);
                ++na;
            }
        } else {
            for (int32_t j = 0; j < ci; ++j) {
                const uint64_t r = pp[j];
                const int fwd = ((int)(r & 1) == q_strand);
                if (skip_mode == 1 && !fwd) continue;
                if (skip_mode == 2 && fwd) continue;
                uint64_t x = ((r >> 32) << 32) | ((r & 0xFFFFFFFFULL) >> 1);
                an[2 * na] = fwd ? x : (x | (1ULL << 63));
                an[2 * na + 1] = fwd ? y_fwd : y_rev;
                ++na;
            }
        }
    }
    // stable sort by x (radix_sort_128x equivalent; stability keeps
    // emission order on ties). Only the bits of x that actually vary
    // matter for order: compress them into a dense key (pext) and LSD-
    // radix the key with 11-bit digits — ~3 passes for a typical genome
    // instead of 6 byte passes over full (x, y) pairs.
    if (na > 1) {
        uint64_t diff = 0;
        const uint64_t x0 = an[0];
        for (int64_t i = 1; i < na; ++i) diff |= an[2 * i] ^ x0;
#if defined(__BMI2__)
        const int kb = __builtin_popcountll(diff);
        if (kb > 0 && kb <= 32 && na < (int64_t)1 << 31) {
            uint64_t *kk = seed_scratch(2 * (size_t)na);  // key<<32 | idx
            uint64_t *tmp = kk + na;
            for (int64_t i = 0; i < na; ++i)
                kk[i] = (_pext_u64(an[2 * i], diff) << 32) | (uint64_t)i;
            uint64_t *src = kk, *dst = tmp;
            for (int sh = 32; sh < 32 + kb; sh += 11) {
                int64_t cnts[2049] = {0};
                for (int64_t i = 0; i < na; ++i)
                    ++cnts[((src[i] >> sh) & 0x7FF) + 1];
                for (int k = 0; k < 2048; ++k) cnts[k + 1] += cnts[k];
                for (int64_t i = 0; i < na; ++i)
                    dst[cnts[(src[i] >> sh) & 0x7FF]++] = src[i];
                uint64_t *t = src;
                src = dst;
                dst = t;
            }
            uint64_t *out = seed_scratch2(2 * (size_t)na);
            for (int64_t i = 0; i < na; ++i) {
                const uint64_t j = src[i] & 0xFFFFFFFFULL;
                out[2 * i] = an[2 * j];
                out[2 * i + 1] = an[2 * j + 1];
            }
            memcpy(an, out, sizeof(uint64_t) * 2 * (size_t)na);
            diff = 0;  // sorted: skip the generic path below
        }
#endif
        if (diff) {  // generic stable byte radix over (x, y) pairs
            uint64_t *buf = seed_scratch(2 * (size_t)na);
            uint64_t *src = an, *dst = buf;
            for (int b = 0; b < 8; ++b) {
                if (!((diff >> (8 * b)) & 0xFF)) continue;
                int64_t cnts[257] = {0};
                const int sh = 8 * b;
                for (int64_t i = 0; i < na; ++i)
                    ++cnts[((src[2 * i] >> sh) & 0xFF) + 1];
                for (int k = 0; k < 256; ++k) cnts[k + 1] += cnts[k];
                for (int64_t i = 0; i < na; ++i) {
                    const int64_t d = cnts[(src[2 * i] >> sh) & 0xFF]++;
                    dst[2 * d] = src[2 * i];
                    dst[2 * d + 1] = src[2 * i + 1];
                }
                uint64_t *t = src;
                src = dst;
                dst = t;
            }
            if (src != an)
                memcpy(an, src, sizeof(uint64_t) * 2 * (size_t)na);
        }
    }
    *out_anchors = an;
    *out_mini_pos = mp;
    *out_n_mini = n_mini;
    *out_rep_len = rep_len;
    return na;
}

// CIGAR -> text ("<len><op>" runs, format.c:365-389 write_sam_cigar and
// the cg:Z: tag). One call formats the whole region incl. soft/hard
// clips; the Python f-string-per-op path costs ~240 ns/op on long-read
// CIGARs (~1k ops/read), this is ~5 ns/op. `out` must hold at least
// 11*(n+2) bytes (10 digits + 1 op char per run). Returns bytes written.
int64_t mm2_cigar_str(const uint32_t *cig, int64_t n, int32_t clip0,
                      int32_t clip1, char clip_char, char *out) {
    static const char OPS[] = "MIDNSHP=XB";
    char *p = out;
    auto put = [&p](uint32_t v, char op) {
        char tmp[10];
        int k = 0;
        do { tmp[k++] = (char)('0' + v % 10u); v /= 10u; } while (v);
        while (k) *p++ = tmp[--k];
        *p++ = op;
    };
    if (clip0 > 0) put((uint32_t)clip0, clip_char);
    for (int64_t i = 0; i < n; ++i) {
        uint32_t op = cig[i] & 0xF;
        if (op >= 10) return -1;  // corrupt CIGAR: fail loudly, caller raises
        put(cig[i] >> 4, OPS[op]);
    }
    if (clip1 > 0) put((uint32_t)clip1, clip_char);
    return (int64_t)(p - out);
}

// End-trimming of chains with bad anchors (mm_fix_bad_ends,
// align.c:459-493). `a` is the read's (n,2) x,y-interleaved anchor
// array; the scans walk from both chain ends and break early, so one
// FFI call replaces two column .tolist() copies plus the Python loops.
// Accumulators are int64: Python ints never overflow, and l/m stay
// bounded only via the early-break conditions.
void mm2_fix_bad_ends(const uint64_t *a, int64_t as0, int32_t cnt0,
                      int32_t bw, int32_t min_match, int32_t mlen,
                      int64_t *as_out, int64_t *cnt_out) {
    int64_t as_ = as0;
    int64_t cnt = cnt0;
    if (cnt0 >= 3) {
        const uint64_t LONG_JOIN = 1ULL << 40;
        int64_t m, l;
        m = l = (int64_t)((a[2 * as0 + 1] >> 32) & 0xff);
        for (int32_t i = 1; i < cnt0 - 1; ++i) {
            uint64_t yi = a[2 * (as0 + i) + 1];
            int64_t q_span = (int64_t)((yi >> 32) & 0xff);
            if (yi & LONG_JOIN) break;
            int64_t lr = (int64_t)(int32_t)(uint32_t)a[2 * (as0 + i)] -
                         (int64_t)(int32_t)(uint32_t)a[2 * (as0 + i - 1)];
            int64_t lq = (int64_t)(int32_t)(uint32_t)yi -
                         (int64_t)(int32_t)(uint32_t)a[2 * (as0 + i - 1) + 1];
            int64_t mn = lr < lq ? lr : lq, mx = lr < lq ? lq : lr;
            if (mx - mn > (l >> 1)) as_ = as0 + i;
            l += mn;
            m += mn < q_span ? mn : q_span;
            if (l >= ((int64_t)bw << 1) || (m >= min_match && m >= bw) ||
                m >= (mlen >> 1))
                break;
        }
        cnt = as0 + cnt0 - as_;
        m = l = (int64_t)((a[2 * (as0 + cnt0 - 1) + 1] >> 32) & 0xff);
        for (int32_t i = cnt0 - 2; i > (int32_t)(as_ - as0); --i) {
            uint64_t y1 = a[2 * (as0 + i + 1) + 1];
            int64_t q_span = (int64_t)((y1 >> 32) & 0xff);
            if (y1 & LONG_JOIN) break;
            int64_t lr = (int64_t)(int32_t)(uint32_t)a[2 * (as0 + i + 1)] -
                         (int64_t)(int32_t)(uint32_t)a[2 * (as0 + i)];
            int64_t lq = (int64_t)(int32_t)(uint32_t)y1 -
                         (int64_t)(int32_t)(uint32_t)a[2 * (as0 + i) + 1];
            int64_t mn = lr < lq ? lr : lq, mx = lr < lq ? lq : lr;
            if (mx - mn > (l >> 1)) cnt = as0 + i + 1 - as_;
            l += mn;
            m += mn < q_span ? mn : q_span;
            if (l >= ((int64_t)bw << 1) || (m >= min_match && m >= bw) ||
                m >= (mlen >> 1))
                break;
        }
    }
    *as_out = as_;
    *cnt_out = cnt;
}

// Sequence-divergence estimate (mm_est_err, esterr.c:30-64): one call
// covers every region of a read. Per-region inputs are parallel arrays
// (as_/cnt/rev/qs/rs/re plus the region's reference length); `a` is the
// (n,2) x,y-interleaved anchor array and mini_pos the read's sorted
// minimizer positions. Writes div_out[i] (float32, -1 when undefined).
// Replaces ~10 per-region NumPy dispatches in the Python path.
static inline int32_t est_qpos(int32_t qlen, uint64_t ax, uint64_t ay) {
    // get_for_qpos (esterr.c:7-14)
    int32_t x = (int32_t)(uint32_t)ay;
    int32_t q_span = (int32_t)((ay >> 32) & 0xff);
    if (ax >> 63) x = qlen - 1 - (x + 1 - q_span);
    return x;
}

void mm2_est_err(int32_t qlen, int32_t n_regs, const int64_t *as_,
                 const int32_t *cnt, const uint8_t *rev, const int32_t *qs,
                 const int32_t *rs, const int32_t *re, const int32_t *l_ref,
                 const uint64_t *a, int64_t n_mini, const uint64_t *mini_pos,
                 float *div_out) {
    if (n_mini <= 0) return;
    uint64_t sum_k = 0;
    for (int64_t i = 0; i < n_mini; ++i)
        sum_k += (mini_pos[i] >> 32) & 0xff;
    float avg_k = (float)sum_k / (float)n_mini;
    double avg_kd = (double)avg_k;  // Python compares int > float64(avg_k)
    for (int32_t i = 0; i < n_regs; ++i) {
        div_out[i] = -1.0f;
        if (cnt[i] == 0) continue;
        const int64_t a0 = as_[i];
        const int32_t c = cnt[i];
        const bool rv = rev[i] != 0;
        // first anchor's forward-strand query position + binary search
        int64_t i0 = rv ? a0 + c - 1 : a0;
        int32_t x0 = est_qpos(qlen, a[2 * i0], a[2 * i0 + 1]);
        // lower_bound (LEFTMOST match, like the Python oracle's
        // searchsorted; positions are distinct in practice so this is
        // also the reference's get_mini_idx result)
        int64_t L = 0, R = n_mini;
        while (L < R) {
            int64_t m = (L + R) >> 1;
            if ((int32_t)(uint32_t)mini_pos[m] < x0) L = m + 1;
            else R = m;
        }
        int64_t st = (L < n_mini &&
                      (int32_t)(uint32_t)mini_pos[L] == x0) ? L : -1;
        if (st < 0) continue;  // logic inconsistency in the reference
        // two-pointer subsequence match (esterr.c:53-58)
        int64_t en = st;
        int32_t n_match = 1, k = 1;
        for (int64_t j = st + 1; j < n_mini && k < c; ++j) {
            int64_t ik = rv ? a0 + c - 1 - k : a0 + k;
            int32_t x = est_qpos(qlen, a[2 * ik], a[2 * ik + 1]);
            if (x == (int32_t)(uint32_t)mini_pos[j]) { ++k; en = j; ++n_match; }
        }
        int32_t n_tot = (int32_t)(en - st + 1);
        if ((double)qs[i] > avg_kd && (double)rs[i] > avg_kd) ++n_tot;
        if ((double)(qlen - qs[i]) > avg_kd && (double)(l_ref[i] - re[i]) > avg_kd)
            ++n_tot;
        div_out[i] = n_match >= n_tot
            ? 0.0f
            : (float)(1.0 - pow((double)n_match / n_tot, 1.0 / avg_kd));
    }
}

}  // extern "C"
