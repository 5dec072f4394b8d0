// mm2tpu native runtime: exact host-side kernels for the paths that stay
// on CPU (the reference's "software path"). Semantics follow the Python
// reference implementations in mm2tpu/ops/chain_ref.py and
// mm2tpu/index/sketch.py, which are parity-tested against the reference
// binary (chain.c:184-238, sketch.c:77-143).
//
// Build: make -C native   (produces libmm2tpu.so, loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

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

}  // extern "C"
