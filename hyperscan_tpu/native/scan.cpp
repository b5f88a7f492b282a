// Native host scanning runtime.
//
// TPU-native framework split: device kernels (Pallas/XLA) handle bulk
// corpus scanning; this C++ library is the host runtime for the latency
// paths — small-write scans, streaming writes, and window validation —
// mirroring the reference's pure-C run side (src/nfa/mcclellan.c byte
// loop, src/fdr shift-or, src/rose window re-scan semantics).
//
// Built with build.py (g++ -O3 -shared); loaded via ctypes; every entry
// point has a numpy fallback with identical semantics.

#include <algorithm>
#include <cstdint>
#if defined(__AVX2__)
#include <immintrin.h>
#endif
#include <cstring>

extern "C" {

// Lockstep DFA over a [B, L] byte batch.
// trans: [S*C] row-major, b2c: [256], accept_id: [S], states: [B] in/out.
// Emits (row, pos, accept_set_id) triples into out_* (capacity cap).
// Returns the true number of hits (may exceed cap; caller re-runs).
int64_t hstpu_dfa_scan_batch(
    const int32_t* trans, int32_t C,
    const int32_t* b2c, const int32_t* accept_id,
    const uint8_t* data, int64_t B, int64_t L, const int32_t* lengths,
    int32_t* states,
    int32_t* out_row, int32_t* out_pos, int32_t* out_aid, int64_t cap) {
    int64_t n = 0;
    for (int64_t b = 0; b < B; b++) {
        int32_t s = states[b];
        const uint8_t* row = data + b * L;
        const int64_t len = lengths[b] < L ? lengths[b] : L;
        for (int64_t i = 0; i < len; i++) {
            s = trans[(int64_t)s * C + b2c[row[i]]];
            const int32_t aid = accept_id[s];
            if (aid) {
                if (n < cap) {
                    out_row[n] = (int32_t)b;
                    out_pos[n] = (int32_t)i;
                    out_aid[n] = aid;
                }
                n++;
            }
        }
        states[b] = s;
    }
    return n;
}

// Teddy shift-AND filter over a flat corpus.
// masks: [M*W*256] (m-major, then word, then byte).
// Candidate bitmask word w at position i = AND over m of
// masks[m][w][corpus[i-m]]; out-of-range m-offsets pass.
// Emits candidate positions + their W bitmask words; returns true count.
static int64_t teddy_filter_scalar(
    const int32_t* masks, int32_t M, int32_t W,
    const uint8_t* corpus, int64_t lo, int64_t hi, int64_t n_total,
    int64_t* out_pos, int32_t* out_words, int64_t cap, int64_t cnt) {
    for (int64_t i = lo; i < hi; i++) {
        int32_t words[8];
        for (int32_t w = 0; w < W; w++) words[w] = ~0;
        int32_t any = ~0;
        // m-outer with early exit: nearly every position dies within the
        // first mask row or two, so expected lookups/byte ~= 2*W, not M*W
        for (int32_t m = 0; m < M && m <= i; m++) {
            const int32_t* row = masks + (int64_t)m * W * 256;
            any = 0;
            for (int32_t w = 0; w < W; w++) {
                words[w] &= row[(int64_t)w * 256 + corpus[i - m]];
                any |= words[w];
            }
            if (!any) break;
        }
        if (any) {
            if (cnt < cap) {
                out_pos[cnt] = i;
                for (int32_t w = 0; w < W; w++) {
                    out_words[(int64_t)w * cap + cnt] = words[w];
                }
            }
            cnt++;
        }
    }
    (void)n_total;
    return cnt;
}

// Pair-gated teddy filter: an 8 KB bit table indexed by the 16-bit key
// (corpus[i] | corpus[i-1] << 8) holds the *exact* survival of mask rows
// m=0,1 (any bucket in any word). Nearly every position dies there, so
// the hot loop is one L1 load + bit test per byte; survivors (and the
// i=0 prologue) run the full per-row mask loop. This is the host-side
// analogue of the reference FDR's domain-hash gating (src/fdr/fdr.c
// domainMask lookups), sized for L1 rather than SIMD registers.
int64_t hstpu_teddy_filter_pair(
    const int32_t* masks, int32_t M, int32_t W,
    const uint8_t* pair_tab,  // [8192] bytes, bit (c[i-1] | c[i]<<8)
    const uint8_t* corpus, int64_t n,
    int64_t* out_pos, int32_t* out_words, int64_t cap) {
    int64_t cnt = teddy_filter_scalar(masks, M, W, corpus, 0, n < 1 ? n : 1,
                                      n, out_pos, out_words, cap, 0);
    // hot loop: the 16-bit key is one unaligned load (little-endian x86:
    // low byte = corpus[i-1], high byte = corpus[i])
    int64_t i = 1;
    for (; i + 4 <= n; i += 4) {
        uint16_t k0, k1, k2, k3;
        memcpy(&k0, corpus + i - 1, 2);
        memcpy(&k1, corpus + i, 2);
        memcpy(&k2, corpus + i + 1, 2);
        memcpy(&k3, corpus + i + 2, 2);
        const uint32_t b0 = (pair_tab[k0 >> 3] >> (k0 & 7)) & 1;
        const uint32_t b1 = (pair_tab[k1 >> 3] >> (k1 & 7)) & 1;
        const uint32_t b2 = (pair_tab[k2 >> 3] >> (k2 & 7)) & 1;
        const uint32_t b3 = (pair_tab[k3 >> 3] >> (k3 & 7)) & 1;
        if (!(b0 | b1 | b2 | b3)) continue;
        if (b0) cnt = teddy_filter_scalar(masks, M, W, corpus, i, i + 1, n,
                                          out_pos, out_words, cap, cnt);
        if (b1) cnt = teddy_filter_scalar(masks, M, W, corpus, i + 1, i + 2,
                                          n, out_pos, out_words, cap, cnt);
        if (b2) cnt = teddy_filter_scalar(masks, M, W, corpus, i + 2, i + 3,
                                          n, out_pos, out_words, cap, cnt);
        if (b3) cnt = teddy_filter_scalar(masks, M, W, corpus, i + 3, i + 4,
                                          n, out_pos, out_words, cap, cnt);
    }
    for (; i < n; i++) {
        uint16_t k;
        memcpy(&k, corpus + i - 1, 2);
        if (!((pair_tab[k >> 3] >> (k & 7)) & 1)) continue;
        cnt = teddy_filter_scalar(masks, M, W, corpus, i, i + 1, n,
                                  out_pos, out_words, cap, cnt);
    }
    return cnt;
}

// Byte-table variant of the pair gate: the same exact rows-0,1 survival
// expanded to one byte per 16-bit key (64 KB, L2-resident). The hot
// loop is a single byte load + test per position — no shift/mask bit
// extraction — and the 8-wide unroll keeps the independent table loads
// pipelined. ~2x the bit-table gate on streaming rescans.
int64_t hstpu_teddy_filter_pair8(
    const int32_t* masks, int32_t M, int32_t W,
    const uint8_t* pair8,  // [65536] bytes, key (c[i-1] | c[i]<<8)
    const uint8_t* corpus, int64_t n,
    int64_t* out_pos, int32_t* out_words, int64_t cap) {
    int64_t cnt = teddy_filter_scalar(masks, M, W, corpus, 0, n < 1 ? n : 1,
                                      n, out_pos, out_words, cap, 0);
    int64_t i = 1;
    for (; i + 8 <= n; i += 8) {
        uint8_t b[8];
        uint32_t any = 0;
        for (int32_t j = 0; j < 8; j++) {
            uint16_t k;
            memcpy(&k, corpus + i + j - 1, 2);
            b[j] = pair8[k];
            any |= b[j];
        }
        if (!any) continue;
        for (int32_t j = 0; j < 8; j++) {
            if (b[j])
                cnt = teddy_filter_scalar(masks, M, W, corpus, i + j,
                                          i + j + 1, n, out_pos, out_words,
                                          cap, cnt);
        }
    }
    for (; i < n; i++) {
        uint16_t k;
        memcpy(&k, corpus + i - 1, 2);
        if (!pair8[k]) continue;
        cnt = teddy_filter_scalar(masks, M, W, corpus, i, i + 1, n,
                                  out_pos, out_words, cap, cnt);
    }
    return cnt;
}

#if defined(__AVX2__)
// 8-super-bucket nibble candidacy for 32 corpus bytes: classic teddy
// PSHUFB split (reference: src/fdr/teddy.c prep_conf_teddy) — the
// per-byte bucket byte is shuffle(lo_tab, c & 15) & shuffle(hi_tab,
// c >> 4), a superset of the exact projection of the 32W-bucket masks
// onto bucket-index mod 8.
static inline __m256i teddy_nib_lookup(const uint8_t* nib_row,
                                       __m256i bytes) {
    const __m256i lo_tab = _mm256_loadu_si256((const __m256i*)nib_row);
    const __m256i hi_tab =
        _mm256_loadu_si256((const __m256i*)(nib_row + 32));
    const __m256i lomask = _mm256_set1_epi8(0x0F);
    const __m256i lo = _mm256_and_si256(bytes, lomask);
    const __m256i hi =
        _mm256_and_si256(_mm256_srli_epi16(bytes, 4), lomask);
    return _mm256_and_si256(_mm256_shuffle_epi8(lo_tab, lo),
                            _mm256_shuffle_epi8(hi_tab, hi));
}
#endif

// SIMD-gated teddy filter: 32 positions per step run the nibble
// super-bucket AND over all M rows (unaligned loads supply the i-m
// byte vectors); surviving byte lanes are re-checked through the exact
// rows-0,1 pair table and then the full scalar mask loop. Candidate
// output is byte-identical to the scalar filter.
// nib: [M * 64] bytes — per row, 32 B lo-nibble table (16 duplicated
// across both 128-bit lanes) then 32 B hi-nibble table.
int64_t hstpu_teddy_filter_nib(
    const int32_t* masks, int32_t M, int32_t W,
    const uint8_t* pair_tab,  // exact rows-0,1 gate; may be NULL
    const uint8_t* nib,
    const uint8_t* corpus, int64_t n,
    int64_t* out_pos, int32_t* out_words, int64_t cap) {
#if defined(__AVX2__)
    if (M < 2) pair_tab = nullptr;  // callers pass a dummy when M < 2
    const int64_t start = M > 1 ? (int64_t)M - 1 : 0;
    if (n < start + 32) {
        if (pair_tab) {
            return hstpu_teddy_filter_pair(masks, M, W, pair_tab, corpus,
                                           n, out_pos, out_words, cap);
        }
        return teddy_filter_scalar(masks, M, W, corpus, 0, n, n,
                                   out_pos, out_words, cap, 0);
    }
    int64_t cnt = teddy_filter_scalar(masks, M, W, corpus, 0, start, n,
                                      out_pos, out_words, cap, 0);
    const __m256i zero = _mm256_setzero_si256();
    int64_t i = start;
    for (; i + 32 <= n; i += 32) {
        __m256i res = teddy_nib_lookup(
            nib, _mm256_loadu_si256((const __m256i*)(corpus + i)));
        for (int32_t m = 1; m < M; m++) {
            if (_mm256_testz_si256(res, res)) break;
            res = _mm256_and_si256(
                res,
                teddy_nib_lookup(nib + (int64_t)m * 64,
                                 _mm256_loadu_si256(
                                     (const __m256i*)(corpus + i - m))));
        }
        if (_mm256_testz_si256(res, res)) continue;
        // surviving byte lanes: exact rows-0,1 pair bit test, then the
        // full scalar mask loop
        const __m256i z = _mm256_cmpeq_epi8(res, zero);
        uint32_t live = ~(uint32_t)_mm256_movemask_epi8(z);
        while (live) {
            const int32_t lane = __builtin_ctz(live);
            live &= live - 1;
            const int64_t p = i + lane;
            if (pair_tab) {
                uint16_t k;
                memcpy(&k, corpus + p - 1, 2);
                if (!((pair_tab[k >> 3] >> (k & 7)) & 1)) continue;
            }
            cnt = teddy_filter_scalar(masks, M, W, corpus, p, p + 1, n,
                                      out_pos, out_words, cap, cnt);
        }
    }
    return teddy_filter_scalar(masks, M, W, corpus, i, n, n,
                               out_pos, out_words, cap, cnt);
#else
    (void)nib;
    if (M < 2) pair_tab = nullptr;
    if (pair_tab) {
        return hstpu_teddy_filter_pair(masks, M, W, pair_tab, corpus, n,
                                       out_pos, out_words, cap);
    }
    return teddy_filter_scalar(masks, M, W, corpus, 0, n, n,
                               out_pos, out_words, cap, 0);
#endif
}

int64_t hstpu_teddy_filter(
    const int32_t* masks, int32_t M, int32_t W,
    const uint8_t* corpus, int64_t n,
    int64_t* out_pos, int32_t* out_words, int64_t cap) {
    int64_t cnt = 0;
#if defined(__AVX2__)
    if (W <= 8 && n > M + 8) {
        // prologue: positions whose suffix window would underrun
        cnt = teddy_filter_scalar(masks, M, W, corpus, 0, M, n,
                                  out_pos, out_words, cap, cnt);
        const int64_t body_end = n - 8;  // last full 8-lane block start
        int64_t i = M;
        __m256i words[8];
        for (; i <= body_end; i += 8) {
            // lanes = positions i..i+7; gather the m=0 row by byte value
            __m128i b8 = _mm_loadl_epi64(
                (const __m128i*)(corpus + i));
            __m256i idx = _mm256_cvtepu8_epi32(b8);
            __m256i alive = _mm256_setzero_si256();
            for (int32_t w = 0; w < W; w++) {
                words[w] = _mm256_i32gather_epi32(
                    (const int*)(masks + (int64_t)w * 256), idx, 4);
                alive = _mm256_or_si256(alive, words[w]);
            }
            for (int32_t m = 1; m < M; m++) {
                if (_mm256_testz_si256(alive, alive)) break;
                __m128i bm = _mm_loadl_epi64(
                    (const __m128i*)(corpus + i - m));
                __m256i idxm = _mm256_cvtepu8_epi32(bm);
                const int32_t* row = masks + (int64_t)m * W * 256;
                alive = _mm256_setzero_si256();
                for (int32_t w = 0; w < W; w++) {
                    words[w] = _mm256_and_si256(
                        words[w],
                        _mm256_i32gather_epi32(
                            (const int*)(row + (int64_t)w * 256), idxm, 4));
                    alive = _mm256_or_si256(alive, words[w]);
                }
            }
            if (_mm256_testz_si256(alive, alive)) continue;
            // rare: extract surviving lanes
            __m256i lanenz = _mm256_setzero_si256();
            for (int32_t w = 0; w < W; w++) {
                lanenz = _mm256_or_si256(lanenz, words[w]);
            }
            __m256i z = _mm256_cmpeq_epi32(lanenz, _mm256_setzero_si256());
            uint32_t deadmask = (uint32_t)_mm256_movemask_ps(
                _mm256_castsi256_ps(z));
            uint32_t live = (~deadmask) & 0xFFu;
            while (live) {
                const int32_t lane = __builtin_ctz(live);
                live &= live - 1;
                if (cnt < cap) {
                    out_pos[cnt] = i + lane;
                    int32_t tmp[8];
                    for (int32_t w = 0; w < W; w++) {
                        _mm256_storeu_si256((__m256i*)tmp, words[w]);
                        out_words[(int64_t)w * cap + cnt] = tmp[lane];
                    }
                }
                cnt++;
            }
        }
        return teddy_filter_scalar(masks, M, W, corpus, i, n, n,
                                   out_pos, out_words, cap, cnt);
    }
#endif
    return teddy_filter_scalar(masks, M, W, corpus, 0, n, n,
                               out_pos, out_words, cap, cnt);
}

// Exact-match confirm over filter candidates (reference: do_confirm_fdr,
// src/fdr/fdr.c:330 + FDRConfirm hash tables, src/fdr/fdr_confirm.h:78).
// Groups share (tail_len cl, tail mask): candidate survives group g when
// the masked little-endian u64 of corpus[p-cl+1..p] binary-searches into
// the group's sorted value array; matched factors are block-containment
// checked and, when longer than the 8-byte tail, verified against their
// full (value, mask) atoms. Emits (fid, pos) pairs; returns the true
// count (may exceed cap; caller re-runs with a larger buffer).
int64_t hstpu_confirm(
    const uint8_t* corpus, int64_t n,
    const int64_t* block_starts, int64_t nb,
    const int64_t* pos, int64_t npos,
    int32_t G,
    const int32_t* grp_cl,     // [G]
    const uint64_t* grp_mask,  // [G]
    const int64_t* grp_off,    // [G+1] into grp_vals/grp_fids
    const uint64_t* grp_vals,  // sorted within each group
    const int64_t* grp_fids,
    const int64_t* flen,       // [F] factor lengths
    const int64_t* atom_off,   // [F+1] into atom_vals/atom_masks
    const uint8_t* atom_vals, const uint8_t* atom_masks,
    int64_t* out_fid, int64_t* out_pos, int64_t cap) {
    int64_t cnt = 0;
    int64_t b = 0;
    for (int64_t ci = 0; ci < npos; ci++) {
        const int64_t p = pos[ci];
        if (p >= n) continue;
        while (b + 1 < nb && p >= block_starts[b + 1]) b++;
        while (b > 0 && p < block_starts[b]) b--;
        const int64_t bstart = block_starts[b];
        uint64_t t = 0;
        if (p >= 7) {
            memcpy(&t, corpus + p - 7, 8);
        } else {
            // low (oldest) bytes may underrun the corpus; groups with
            // cl > p+1 are skipped below, so junk low bytes never matter
            memcpy((uint8_t*)&t + (7 - p), corpus, p + 1);
        }
        for (int32_t g = 0; g < G; g++) {
            const int32_t cl = grp_cl[g];
            if (p + 1 < (int64_t)cl) continue;
            const uint64_t v = (cl < 8 ? (t >> (8 * (8 - cl))) : t)
                               & grp_mask[g];
            // lower_bound over the group's sorted values
            int64_t lo = grp_off[g], hi = grp_off[g + 1];
            while (lo < hi) {
                const int64_t mid = (lo + hi) >> 1;
                if (grp_vals[mid] < v) lo = mid + 1; else hi = mid;
            }
            for (; lo < grp_off[g + 1] && grp_vals[lo] == v; lo++) {
                const int64_t fid = grp_fids[lo];
                const int64_t fl = flen[fid];
                const int64_t start = p - fl + 1;
                if (start < bstart) continue;
                if (fl > 8) {
                    const int64_t ao = atom_off[fid];
                    bool ok = true;
                    for (int64_t j = 0; j < fl; j++) {
                        const uint8_t m = atom_masks[ao + j];
                        if ((corpus[start + j] & m) !=
                            (atom_vals[ao + j] & m)) {
                            ok = false;
                            break;
                        }
                    }
                    if (!ok) continue;
                }
                if (cnt < cap) {
                    out_fid[cnt] = fid;
                    out_pos[cnt] = p;
                }
                cnt++;
            }
        }
    }
    return cnt;
}

// Single-buffer DFA scan collecting accept positions (window validation
// inner loop; the caller handles per-window entry states and bounds).
int64_t hstpu_dfa_scan_one(
    const int32_t* trans, int32_t C,
    const int32_t* b2c, const int32_t* accept_id,
    const uint8_t* data, int64_t n, int32_t state,
    int32_t* out_pos, int32_t* out_aid, int64_t cap, int32_t* final_state) {
    int64_t cnt = 0;
    for (int64_t i = 0; i < n; i++) {
        state = trans[(int64_t)state * C + b2c[data[i]]];
        const int32_t aid = accept_id[state];
        if (aid) {
            if (cnt < cap) {
                out_pos[cnt] = (int32_t)i;
                out_aid[cnt] = aid;
            }
            cnt++;
        }
    }
    *final_state = state;
    return cnt;
}

// Batched window validation over the packed per-pattern validator DFAs
// (reference: the rose literal program running role checks around a
// literal hit, src/rose/program_runtime.c — here a bounded window
// re-scan with the pattern's own scanning DFA). Windows arrive
// unsorted; they are sorted by (pattern, block, start), overlapping
// windows of one (pattern, block) merge, and each merged window scans
// once from the float (or anchored) entry state, emitting bounds-
// checked (block, expr, to_local) records through the accept-set
// expansion tables. Returns the true record count (may exceed cap).
int64_t hstpu_validate_windows(
    const uint8_t* corpus, int64_t n,
    const int64_t* eidx_w, const int64_t* ws_a, const int64_t* we_a,
    const int64_t* b_w, int64_t nw,
    const int64_t* block_starts, const int64_t* block_ends,
    const uint8_t* block_anchored, const uint8_t* block_final,
    const int64_t* vid_arr, int64_t vid_len,   // expr idx -> validator id
    const int32_t* trans_all, int32_t cmax,    // [S_total, cmax], global ids
    const int32_t* acc_all, const int32_t* acce_all,  // [S_total] set ids
    const int32_t* b2c_all,                    // [V * 256]
    const int64_t* start_g, const int64_t* float_g,   // [V] entry states
    const int64_t* vset_base,                  // [V] global accept-set base
    const int64_t* exp_off, const int64_t* exp_eidx, const int64_t* exp_adj,
    int64_t* out_b, int64_t* out_e, int64_t* out_to, int64_t cap) {
    if (nw <= 0) return 0;
    // sort window indices by (eidx, block, start)
    static thread_local int64_t* order = nullptr;
    static thread_local int64_t order_cap = 0;
    if (order_cap < nw) {
        delete[] order;
        order = new int64_t[nw];
        order_cap = nw;
    }
    for (int64_t i = 0; i < nw; i++) order[i] = i;
    // simple insertion-friendly merge sort via std::sort
    struct Cmp {
        const int64_t *e, *b, *s;
        bool operator()(int64_t x, int64_t y) const {
            if (e[x] != e[y]) return e[x] < e[y];
            if (b[x] != b[y]) return b[x] < b[y];
            return s[x] < s[y];
        }
    };
    std::sort(order, order + nw, Cmp{eidx_w, b_w, ws_a});

    int64_t cnt = 0;
    int64_t i = 0;
    while (i < nw) {
        const int64_t e0 = eidx_w[order[i]];
        const int64_t b0 = b_w[order[i]];
        int64_t ws = ws_a[order[i]];
        int64_t we = we_a[order[i]];
        // merge overlapping/touching windows of this (pattern, block)
        int64_t j = i + 1;
        while (j < nw && eidx_w[order[j]] == e0 && b_w[order[j]] == b0 &&
               ws_a[order[j]] <= we) {
            if (we_a[order[j]] > we) we = we_a[order[j]];
            j++;
        }
        i = j;
        const int64_t vid = (e0 < vid_len) ? vid_arr[e0] : -1;
        if (vid < 0) continue;
        const int64_t bs = block_starts[b0];
        const int64_t be = block_ends[b0];
        const int64_t blen = be - bs;
        const int32_t* b2c = b2c_all + vid * 256;
        int64_t state = (ws == bs && block_anchored[b0])
                            ? start_g[vid] : float_g[vid];
        const int64_t base_to = ws - bs + 1;
        const int64_t hi = we < n ? we : n;
        for (int64_t p = ws; p < hi; p++) {
            state = trans_all[state * cmax + b2c[corpus[p]]];
            const int32_t aid = acc_all[state];
            if (aid) {
                const int64_t g = vset_base[vid] + aid;
                for (int64_t k = exp_off[g]; k < exp_off[g + 1]; k++) {
                    const int64_t to = base_to + (p - ws) + exp_adj[k];
                    if (to < 0 || to > blen) continue;
                    if (cnt < cap) {
                        out_b[cnt] = b0;
                        out_e[cnt] = exp_eidx[k];
                        out_to[cnt] = to;
                    }
                    cnt++;
                }
            }
        }
        if (we == be && block_final[b0]) {
            const int32_t aid = acce_all[state];
            if (aid) {
                const int64_t g = vset_base[vid] + aid;
                for (int64_t k = exp_off[g]; k < exp_off[g + 1]; k++) {
                    const int64_t to = blen + exp_adj[k];
                    if (to < 0 || to > blen) continue;
                    if (cnt < cap) {
                        out_b[cnt] = b0;
                        out_e[cnt] = exp_eidx[k];
                        out_to[cnt] = to;
                    }
                    cnt++;
                }
            }
        }
    }
    return cnt;
}

// Bit-parallel NFA batch scan (LimEx analogue; reference:
// src/nfa/limex_runtime_impl.h step: OR follower masks of active bits,
// AND the byte class's reach). States are [B, KW] uint64 words plus a
// per-row "anchored context" flag consumed by the first live byte.
// Hits are (row, pos, accept-set bitmask) where bit g-1 marks accept
// set id g (accept_gid[p]); returns the true hit count (may exceed cap).
int64_t hstpu_bitnfa_scan_batch(
    const uint64_t* follow,      // [P * KW] row u = successor mask of u
    const uint64_t* reach,       // [C * KW] class c = positions matching c
    const int32_t* b2c,          // [256]
    const int32_t* accept_gid,   // [P]
    const uint64_t* accept_any,  // [KW]
    const uint64_t* float_mask,  // [KW]
    const uint64_t* anch_mask,   // [KW]
    int32_t P, int32_t KW,
    const uint8_t* data, int64_t B, int64_t L, const int32_t* lengths,
    uint64_t* states,            // [B * KW] in/out
    uint8_t* is_start,           // [B] in/out
    int32_t* out_row, int32_t* out_pos, int64_t* out_bits, int64_t cap) {
    int64_t n = 0;
    uint64_t cur[512], nxt[512];  // KW <= 512 (P <= 32768, parser cap)
    for (int64_t b = 0; b < B; b++) {
        const uint8_t* row = data + b * L;
        const int64_t len = lengths[b] < L ? lengths[b] : L;
        uint64_t* st = states + b * KW;
        for (int32_t k = 0; k < KW; k++) cur[k] = st[k];
        uint8_t start = is_start[b];
        for (int64_t i = 0; i < len; i++) {
            for (int32_t k = 0; k < KW; k++) {
                nxt[k] = float_mask[k] | (start ? anch_mask[k] : 0);
            }
            for (int32_t k = 0; k < KW; k++) {
                uint64_t m = cur[k];
                while (m) {
                    const int32_t u = k * 64 + __builtin_ctzll(m);
                    const uint64_t* fr = follow + (int64_t)u * KW;
                    for (int32_t w = 0; w < KW; w++) nxt[w] |= fr[w];
                    m &= m - 1;
                }
            }
            const uint64_t* rc = reach + (int64_t)b2c[row[i]] * KW;
            uint64_t any_acc = 0;
            for (int32_t k = 0; k < KW; k++) {
                nxt[k] &= rc[k];
                cur[k] = nxt[k];
                any_acc |= nxt[k] & accept_any[k];
            }
            start = 0;
            if (any_acc) {
                int64_t bits = 0;
                for (int32_t k = 0; k < KW; k++) {
                    uint64_t m = cur[k] & accept_any[k];
                    while (m) {
                        const int32_t p = k * 64 + __builtin_ctzll(m);
                        bits |= (int64_t)1 << (accept_gid[p] - 1);
                        m &= m - 1;
                    }
                }
                if (n < cap) {
                    out_row[n] = (int32_t)b;
                    out_pos[n] = (int32_t)i;
                    out_bits[n] = bits;
                }
                n++;
            }
        }
        for (int32_t k = 0; k < KW; k++) st[k] = cur[k];
        is_start[b] = start;
    }
    return n;
}

// SOM-register NFA scan (Gough analogue; reference: src/nfa/gough.c SOM
// register file). Like the bit-NFA step, but each active position
// carries the minimum absolute start offset of any run reaching it;
// accepts emit (row, pos, accept-set id, start) with per-set minima.
// soms[] holds INT64_MAX for inactive positions.
int64_t hstpu_somnfa_scan_batch(
    const uint64_t* reach,      // [C * KW]
    const int32_t* b2c,         // [256]
    const int32_t* succ_off,    // [P + 1]
    const int32_t* succ_idx,    // [E]
    const int32_t* entry_idx,   // [NE] float-first positions
    const int32_t* entry_hop,   // [NE] 1 = start is offset + 1
    int32_t NE,
    const int32_t* anch_idx,    // [NA] anchored-first positions
    const int32_t* anch_hop,    // [NA]
    int32_t NA,
    const int32_t* accept_gid,  // [P]
    int32_t P, int32_t KW,
    const uint8_t* data, int64_t B, int64_t L, const int32_t* lengths,
    const int64_t* base_offsets,  // [B] absolute offset of data[b, 0]
    uint64_t* states,             // [B * KW] in/out
    int64_t* soms,                // [B * P] in/out
    uint8_t* is_start,            // [B] in/out
    int32_t* out_row, int32_t* out_pos, int32_t* out_gid,
    int64_t* out_frm, int64_t cap) {
    const int64_t INF = INT64_MAX;
    int64_t n = 0;
    uint64_t cur[512], nxt[512];  // KW <= 512 (P <= 32768, parser cap)
    // nsom buffer reused per byte
    static thread_local int64_t* nsom = nullptr;
    static thread_local int32_t nsom_cap = 0;
    if (nsom_cap < P) {
        delete[] nsom;
        nsom = new int64_t[P];
        nsom_cap = P;
    }
    for (int64_t b = 0; b < B; b++) {
        const uint8_t* row = data + b * L;
        const int64_t len = lengths[b] < L ? lengths[b] : L;
        uint64_t* st = states + b * KW;
        int64_t* sm = soms + b * P;
        for (int32_t k = 0; k < KW; k++) cur[k] = st[k];
        uint8_t start = is_start[b];
        const int64_t base = base_offsets[b];
        for (int64_t i = 0; i < len; i++) {
            const uint64_t* rc = reach + (int64_t)b2c[row[i]] * KW;
            for (int32_t k = 0; k < KW; k++) nxt[k] = 0;
            for (int32_t p = 0; p < P; p++) nsom[p] = INF;
            // successor relaxation from active positions
            for (int32_t k = 0; k < KW; k++) {
                uint64_t m = cur[k];
                while (m) {
                    const int32_t u = k * 64 + __builtin_ctzll(m);
                    const int64_t su = sm[u];
                    for (int32_t e = succ_off[u]; e < succ_off[u + 1]; e++) {
                        const int32_t v = succ_idx[e];
                        if ((rc[v >> 6] >> (v & 63)) & 1) {
                            nxt[v >> 6] |= 1ull << (v & 63);
                            if (su < nsom[v]) nsom[v] = su;
                        }
                    }
                    m &= m - 1;
                }
            }
            // entries
            for (int32_t e = 0; e < NE; e++) {
                const int32_t v = entry_idx[e];
                if ((rc[v >> 6] >> (v & 63)) & 1) {
                    nxt[v >> 6] |= 1ull << (v & 63);
                    const int64_t s0 = base + i + entry_hop[e];
                    if (s0 < nsom[v]) nsom[v] = s0;
                }
            }
            if (start) {
                for (int32_t e = 0; e < NA; e++) {
                    const int32_t v = anch_idx[e];
                    if ((rc[v >> 6] >> (v & 63)) & 1) {
                        nxt[v >> 6] |= 1ull << (v & 63);
                        const int64_t s0 = base + i + anch_hop[e];
                        if (s0 < nsom[v]) nsom[v] = s0;
                    }
                }
            }
            start = 0;
            for (int32_t k = 0; k < KW; k++) cur[k] = nxt[k];
            for (int32_t p = 0; p < P; p++) sm[p] = nsom[p];
            // accepts: min start per accept-set id
            int32_t seen_gid[16];
            int64_t seen_frm[16];
            int32_t nseen = 0;
            for (int32_t k = 0; k < KW; k++) {
                uint64_t m = cur[k];
                while (m) {
                    const int32_t p = k * 64 + __builtin_ctzll(m);
                    const int32_t g = accept_gid[p];
                    if (g) {
                        int32_t j = 0;
                        for (; j < nseen; j++) {
                            if (seen_gid[j] == g) {
                                if (sm[p] < seen_frm[j]) seen_frm[j] = sm[p];
                                break;
                            }
                        }
                        if (j == nseen && nseen < 16) {
                            seen_gid[nseen] = g;
                            seen_frm[nseen] = sm[p];
                            nseen++;
                        }
                    }
                    m &= m - 1;
                }
            }
            for (int32_t j = 0; j < nseen; j++) {
                if (n < cap) {
                    out_row[n] = (int32_t)b;
                    out_pos[n] = (int32_t)i;
                    out_gid[n] = seen_gid[j];
                    out_frm[n] = seen_frm[j];
                }
                n++;
            }
        }
        for (int32_t k = 0; k < KW; k++) st[k] = cur[k];
        is_start[b] = start;
    }
    return n;
}

}  // extern "C"
