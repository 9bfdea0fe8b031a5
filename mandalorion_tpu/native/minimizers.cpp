// Native minimizer extraction — C++ twin of align/encode.py's vectorized
// rolling-hash minimizers (bit-identical output; tests assert it).
//
// The host-side data path feeding the TPU: encode -> rolling polynomial
// hash (mod 2^64) -> xorshift scramble -> windowed leftmost-min selection.
// Replaces the role mappy's C layer plays in the reference (SURVEY §2.2).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

static const uint64_t B = 0x9E3779B97F4A7C15ULL;

// h ^= h >> 33; h *= C; h ^= h >> 33  (matches encode.kmer_hashes)
static inline uint64_t scramble(uint64_t h) {
    h ^= h >> 33;
    h *= 0xFF51AFD7ED558CCDULL;
    h ^= h >> 33;
    return h;
}

// Encode ASCII bases to 0-4 codes (A=0 C=1 G=2 T=3, other=4).
void encode_seq(const char* seq, int64_t n, uint8_t* out) {
    static uint8_t lut[256];
    static bool init = false;
    if (!init) {
        memset(lut, 4, 256);
        lut[(unsigned char)'A'] = lut[(unsigned char)'a'] = 0;
        lut[(unsigned char)'C'] = lut[(unsigned char)'c'] = 1;
        lut[(unsigned char)'G'] = lut[(unsigned char)'g'] = 2;
        lut[(unsigned char)'T'] = lut[(unsigned char)'t'] = 3;
        init = true;
    }
    for (int64_t i = 0; i < n; i++) out[i] = lut[(unsigned char)seq[i]];
}

// (k, w) minimizers of encoded sequence. out_pos/out_hash must hold up to
// n - k + 1 entries. Returns the number of minimizers written.
int64_t minimizers_c(const uint8_t* codes, int64_t n, int32_t k, int32_t w,
                     int64_t* out_pos, uint64_t* out_hash) {
    int64_t m = n - k + 1;
    if (m <= 0) return 0;

    // rolling hash h[i] = sum_j (codes[i+j]+1) * B^(k-1-j)  (mod 2^64)
    std::vector<uint64_t> h(m);
    std::vector<uint8_t> valid(m);
    uint64_t bk = 1;  // B^(k-1)
    for (int32_t j = 0; j < k - 1; j++) bk *= B;
    uint64_t cur = 0;
    int32_t bad_run = 0;
    for (int64_t i = 0; i < n; i++) {
        cur = cur * B + (uint64_t)(codes[i] + 1);
        if (codes[i] >= 4) bad_run = k;  // poisons k windows
        else if (bad_run > 0) bad_run--;
        if (i >= k - 1) {
            int64_t p = i - k + 1;
            h[p] = scramble(cur);
            valid[p] = bad_run == 0 ? 1 : 0;
            cur -= (uint64_t)(codes[p] + 1) * bk;  // pre-multiply next round
        }
    }

    const uint64_t INF = 0xFFFFFFFFFFFFFFFFULL;
    int64_t count = 0;
    if (m <= w) {
        uint64_t best = INF;
        int64_t arg = -1;
        for (int64_t i = 0; i < m; i++) {
            uint64_t hv = valid[i] ? h[i] : INF;
            if (hv < best) { best = hv; arg = i; }
        }
        bool any_valid = false;
        for (int64_t i = 0; i < m; i++) if (valid[i]) any_valid = true;
        if (!any_valid) return 0;
        out_pos[0] = arg;
        out_hash[0] = h[arg];
        return 1;
    }

    // leftmost window-min per window, dedup consecutive (monotone deque)
    std::vector<int64_t> deque_idx(m);
    int64_t head = 0, tail = 0;  // [head, tail)
    int64_t last_emitted = -1;
    for (int64_t i = 0; i < m; i++) {
        uint64_t hv = valid[i] ? h[i] : INF;
        // strict <: keeps the LEFTMOST minimum at the deque front
        while (tail > head) {
            uint64_t back = valid[deque_idx[tail - 1]]
                                ? h[deque_idx[tail - 1]] : INF;
            if (back > hv) tail--; else break;
        }
        deque_idx[tail++] = i;
        int64_t win_start = i - w + 1;
        if (deque_idx[head] < win_start) head++;
        if (win_start >= 0) {
            int64_t p = deque_idx[head];
            if (p != last_emitted && valid[p]) {
                out_pos[count] = p;
                out_hash[count] = h[p];
                count++;
                last_emitted = p;
            }
        }
    }
    return count;
}

}  // extern "C"

extern "C" {

// Fused seeding: minimizers -> bucketed index lookup (max_occ repeat
// filter) -> anchor expansion -> per-chromosome diagonal-segment collapse.
// One call per read orientation replaces four numpy round-trips
// (align/aligner.py _chain_for). Output is bit-identical to the numpy
// path: anchors sorted by (chrom, diag, t) collapse into maximal
// same-diagonal runs with spacing <= merge_gap + k, exactly
// align/chain.py collapse_anchors.
//
// Returns the segment count written, or -needed if cap is too small
// (caller re-invokes with a larger cap).
int64_t seed_segments_c(
    const uint8_t* codes, int64_t n, int32_t k, int32_t w,
    int64_t max_occ, int32_t merge_gap,
    const uint64_t* sorted_hashes, const int64_t* bucket_lo,
    const void* sorted_positions, int32_t pos_is_u32,
    const int64_t* chrom_offsets, int64_t n_chroms,
    int64_t cap, int32_t* out_chrom, int64_t* out_qs, int64_t* out_qe,
    int64_t* out_ts, int64_t* out_te, int64_t* out_nanchor) {
    int64_t m = n - k + 1;
    if (m <= 0) return 0;
    std::vector<int64_t> mpos(m);
    std::vector<uint64_t> mhash(m);
    int64_t nmin = minimizers_c(codes, n, k, w, mpos.data(), mhash.data());
    if (nmin == 0) return 0;

    struct Anchor { int32_t chrom; int64_t diag, t, q; };
    std::vector<Anchor> anchors;
    const uint32_t* pos32 = (const uint32_t*)sorted_positions;
    const int64_t* pos64 = (const int64_t*)sorted_positions;
    for (int64_t i = 0; i < nmin; i++) {
        uint64_t hq = mhash[i];
        uint32_t b = (uint32_t)(hq >> 48);
        int64_t l = bucket_lo[b], r = bucket_lo[b + 1];
        while (l < r) {  // lower bound
            int64_t mid = (l + r) >> 1;
            if (sorted_hashes[mid] < hq) l = mid + 1; else r = mid;
        }
        int64_t lo = l;
        r = bucket_lo[b + 1];
        while (l < r) {  // upper bound
            int64_t mid = (l + r) >> 1;
            if (sorted_hashes[mid] <= hq) l = mid + 1; else r = mid;
        }
        int64_t cnt = l - lo;
        if (cnt == 0 || cnt > max_occ) continue;
        for (int64_t j = lo; j < l; j++) {
            int64_t g = pos_is_u32 ? (int64_t)pos32[j] : pos64[j];
            // chrom = searchsorted(chrom_offsets, g, 'right') - 1
            int64_t cl = 0, cr = n_chroms;
            while (cl < cr) {
                int64_t mid = (cl + cr) >> 1;
                if (chrom_offsets[mid] <= g) cl = mid + 1; else cr = mid;
            }
            anchors.push_back({(int32_t)(cl - 1), g - mpos[i], g, mpos[i]});
        }
    }
    if (anchors.empty()) return 0;
    std::sort(anchors.begin(), anchors.end(),
              [](const Anchor& a, const Anchor& b) {
                  if (a.chrom != b.chrom) return a.chrom < b.chrom;
                  if (a.diag != b.diag) return a.diag < b.diag;
                  return a.t < b.t;
              });

    int64_t count = 0;
    int64_t seg_start = 0;
    auto flush = [&](int64_t s, int64_t e) {
        if (count < cap) {
            out_chrom[count] = anchors[s].chrom;
            out_qs[count] = anchors[s].q;
            out_qe[count] = anchors[e - 1].q + k;
            out_ts[count] = anchors[s].t;
            out_te[count] = anchors[e - 1].t + k;
            out_nanchor[count] = e - s;
        }
        count++;
    };
    for (size_t i = 1; i < anchors.size(); i++) {
        const Anchor &p = anchors[i - 1], &c = anchors[i];
        if (c.chrom != p.chrom || c.diag != p.diag
            || c.t - p.t > merge_gap + k) {
            flush(seg_start, (int64_t)i);
            seg_start = (int64_t)i;
        }
    }
    flush(seg_start, (int64_t)anchors.size());
    return count <= cap ? count : -count;
}

// Bucketed binary search: for each query hash, find [lo, hi) in the sorted
// hash array, restricted to its top-16-bit bucket (bucket_lo has 65537
// entries). Cuts probe count and cache misses vs full-range binary search.
void lookup_ranges_c(const uint64_t* sorted_hashes, const int64_t* bucket_lo,
                     const uint64_t* queries, int64_t n_queries,
                     int64_t* out_lo, int64_t* out_hi) {
    for (int64_t qi = 0; qi < n_queries; qi++) {
        uint64_t q = queries[qi];
        uint32_t b = (uint32_t)(q >> 48);
        int64_t lo = bucket_lo[b], hi = bucket_lo[b + 1];
        // lower bound
        int64_t l = lo, r = hi;
        while (l < r) {
            int64_t m = (l + r) >> 1;
            if (sorted_hashes[m] < q) l = m + 1; else r = m;
        }
        int64_t first = l;
        // upper bound
        r = hi;
        while (l < r) {
            int64_t m = (l + r) >> 1;
            if (sorted_hashes[m] <= q) l = m + 1; else r = m;
        }
        out_lo[qi] = first;
        out_hi[qi] = l;
    }
}

}  // extern "C"
