// Faithful scalar CPU search engine — the honest single-core baseline the
// TPU engine's vs_baseline ratio is measured against (VERDICT r2 item 1).
//
// This reproduces the reference's hot loops shape-for-shape:
//   - 128-doc block decode on demand into a small buffer
//     (rucene src/core/search/scorer/bulk_scorer.rs:89-154,
//      src/core/codec/postings/posting_reader.rs refill)
//   - skip-based advance() that steps block metadata without decoding
//     (src/core/codec/postings/skip_reader.rs:118)
//   - doc-at-a-time conjunction leapfrog (src/core/search/scorer/
//     conjunction_scorer.rs) and heap disjunction
//     (disjunction_scorer.rs)
//   - scalar BM25 scoring with the norm-byte cache row
//     (src/core/search/similarity/bm25_similarity.rs:152-215)
//   - bounded min-heap top-k with Lucene tie-breaks: score desc, doc asc
//     (src/core/search/collector/top_docs.rs:68-77)
//   - exact-phrase verification over decoded position runs
//     (src/core/search/scorer/phrase_scorer.rs:122 ExactPhraseScorer)
//
// It consumes the SAME packed segment the TPU engine serves from (the
// adaptive FOR/EF/norm-inline block format of codec/postings.py), so the
// comparison isolates the engine, not the storage format. Compiled -O3
// -march=native: the compiler auto-vectorizes the block decode the way the
// reference's explicit SSE decoder (simd_block_decoder.rs) does by hand.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int32_t kBlockSize = 128;
constexpr int32_t kEfTag = 64;        // util/packing.py EF_TAG
constexpr int32_t kEfUnaryWords = 12; // util/packing.py EF_UNARY_WORDS
constexpr int32_t kNoMoreDocs = INT32_MAX;

struct Segment {
    const uint32_t* data;
    const int32_t* blk_off;
    const int32_t* blk_doc_bits;
    const int32_t* blk_freq_bits;
    const int32_t* blk_base;
    const int32_t* blk_count;
    const int32_t* blk_last;
    const int32_t* blk_pos_base;
    const uint32_t* positions;
    const uint8_t* live;  // null -> all live
    int32_t max_doc;
};

inline int32_t doc_plane_words(int32_t dbits) {
    return dbits >= kEfTag ? 4 * (dbits - kEfTag) + kEfUnaryWords : 4 * dbits;
}

// Unpack 128 fixed-width values (LSB-first, little-endian u32 stream).
inline void unpack128(const uint32_t* w, int32_t bits, uint32_t* out) {
    uint64_t mask = bits >= 32 ? 0xFFFFFFFFull : ((1ull << bits) - 1);
    int64_t bitpos = 0;
    for (int32_t i = 0; i < kBlockSize; i++, bitpos += bits) {
        int64_t wi = bitpos >> 5;
        int32_t sh = (int32_t)(bitpos & 31);
        uint64_t v = ((uint64_t)w[wi] | ((uint64_t)w[wi + 1] << 32)) >> sh;
        out[i] = (uint32_t)(v & mask);
    }
}

// One term's postings over the packed block stream. Mirrors the
// reference's BlockDocIterator: decode-on-demand + block-skip advance.
struct PostingsIterator {
    const Segment* seg = nullptr;
    int32_t bstart = 0, bcount = 0;  // term's global block range
    int32_t cur = -1;                // block index within the term
    int32_t lane = 0, n = 0;
    int32_t doc = -1;
    int32_t docs[kBlockSize];
    int32_t freqs[kBlockSize];
    uint8_t normb[kBlockSize];
    int32_t occ_prefix[kBlockSize + 1];  // within-block freq prefix sums
    int32_t blk_posbase = 0;             // within-term occurrence base of cur block
    // phrase extras
    int32_t pos_width = 0;
    int64_t pos_word_start = 0;

    void init(const Segment* s, int32_t bs, int32_t bc) {
        seg = s; bstart = bs; bcount = bc; cur = -1; lane = 0; n = 0;
        doc = bc > 0 ? -1 : kNoMoreDocs;
    }

    void decode_block(int32_t b) {
        cur = b;
        int32_t g = bstart + b;
        const uint32_t* w = seg->data + seg->blk_off[g];
        int32_t dbits = seg->blk_doc_bits[g];
        int32_t fbits = seg->blk_freq_bits[g];
        n = seg->blk_count[g];
        int32_t base = seg->blk_base[g];
        uint32_t tmp[kBlockSize];
        if (dbits >= kEfTag) {
            // Elias-Fano: low plane + 384-bit unary plane of cumulative
            // offsets v_i = doc_i - base (posting_reader.rs:336 EF branch)
            int32_t l = dbits - kEfTag;
            if (l) unpack128(w, l, tmp); else std::memset(tmp, 0, sizeof(tmp));
            const uint32_t* uw = w + 4 * l;
            int32_t i = 0;
            for (int32_t wi = 0; wi < kEfUnaryWords && i < kBlockSize; wi++) {
                uint32_t bits = uw[wi];
                while (bits && i < kBlockSize) {
                    int32_t bit = __builtin_ctz(bits);
                    bits &= bits - 1;
                    int32_t hi = (wi * 32 + bit) - i;
                    docs[i] = base + (int32_t)(((uint32_t)hi << l) | tmp[i]);
                    i++;
                }
            }
        } else {
            // FOR: prefix-sum the packed deltas (for_util.rs analog)
            unpack128(w, dbits, tmp);
            int32_t d = base;
            for (int32_t i = 0; i < kBlockSize; i++) {
                d += (int32_t)tmp[i];
                docs[i] = d;
            }
        }
        int32_t dpw = doc_plane_words(dbits);
        unpack128(w + dpw, fbits, tmp);
        int32_t acc = 0;
        for (int32_t i = 0; i < kBlockSize; i++) {
            freqs[i] = (int32_t)tmp[i];
            occ_prefix[i] = acc;
            acc += i < n ? (int32_t)tmp[i] : 0;
        }
        occ_prefix[kBlockSize] = acc;
        // inline norm plane: 8 bits per valid lane (format v2)
        const uint32_t* nw = w + dpw + 4 * fbits;
        for (int32_t i = 0; i < n; i++)
            normb[i] = (uint8_t)(nw[i >> 2] >> (8 * (i & 3)));
        blk_posbase = seg->blk_pos_base[g];
    }

    int32_t next_doc() {
        lane++;
        while (lane >= n) {
            if (cur + 1 >= bcount) { doc = kNoMoreDocs; return doc; }
            decode_block(cur + 1);
            lane = 0;
        }
        doc = docs[lane];
        return doc;
    }

    // Skip-list advance: step block metadata (blk_last) without decoding,
    // then scan lanes (skip_reader.rs:118 + bulk_scorer.rs refill scan).
    int32_t advance(int32_t target) {
        if (doc >= target) return doc;
        if (cur < 0 || target > seg->blk_last[bstart + cur]) {
            int32_t b = cur < 0 ? 0 : cur + 1;
            while (b < bcount && seg->blk_last[bstart + b] < target) b++;
            if (b >= bcount) { doc = kNoMoreDocs; return doc; }
            decode_block(b);
            lane = 0;
            if (docs[0] >= target) { doc = docs[0]; return doc; }
        }
        // binary search within the decoded block
        int32_t lo = lane, hi = n - 1;
        while (lo < hi) {
            int32_t mid = (lo + hi) >> 1;
            if (docs[mid] < target) lo = mid + 1; else hi = mid;
        }
        lane = lo;
        doc = docs[lo] >= target ? docs[lo] : kNoMoreDocs;
        if (doc == kNoMoreDocs && lo == n - 1 && cur + 1 < bcount) {
            // target fell past this block's last valid lane
            return advance(target);
        }
        return doc;
    }

    int32_t freq() const { return freqs[lane]; }
    uint8_t norm() const { return normb[lane]; }

    // Decode the current doc's positions (within-doc delta runs at the
    // term's fixed width; first value of a doc run is absolute).
    void positions_of(std::vector<int32_t>& out) const {
        out.clear();
        int64_t o = (int64_t)blk_posbase + occ_prefix[lane];
        int32_t f = freqs[lane];
        int32_t w = pos_width;
        uint64_t mask = w >= 32 ? 0xFFFFFFFFull : ((1ull << w) - 1);
        int32_t p = 0;
        for (int32_t i = 0; i < f; i++) {
            int64_t bitpos = (o + i) * w;
            int64_t wi = pos_word_start + (bitpos >> 5);
            int32_t sh = (int32_t)(bitpos & 31);
            uint64_t v = ((uint64_t)seg->positions[wi] |
                          ((uint64_t)seg->positions[wi + 1] << 32)) >> sh;
            int32_t delta = (int32_t)(v & mask);
            p = i == 0 ? delta : p + delta;
            out.push_back(p);
        }
    }
};

// Exact-phrase virtual scorer: conjunction over member terms + position
// intersection (ExactPhraseScorer, phrase_scorer.rs:122). Presents the
// doc/advance surface of a postings iterator with freq = phrase freq.
struct PhraseIterator {
    std::vector<PostingsIterator> terms;
    int32_t doc = -1;
    int32_t pfreq = 0;
    std::vector<int32_t> scratch_a, scratch_b, scratch_c;

    bool exhausted() const { return doc == kNoMoreDocs; }

    int32_t compute_pfreq() {
        // intersect position lists, term j's positions shifted by -j
        terms[0].positions_of(scratch_a);
        for (size_t j = 1; j < terms.size() && !scratch_a.empty(); j++) {
            terms[j].positions_of(scratch_b);
            scratch_c.clear();
            size_t x = 0, y = 0;
            while (x < scratch_a.size() && y < scratch_b.size()) {
                int32_t pa = scratch_a[x], pb = scratch_b[y] - (int32_t)j;
                if (pa == pb) { scratch_c.push_back(pa); x++; y++; }
                else if (pa < pb) x++;
                else y++;
            }
            scratch_a.swap(scratch_c);
        }
        return (int32_t)scratch_a.size();
    }

    int32_t advance(int32_t target) {
        int32_t cand = terms[0].advance(std::max(target, doc + 1));
        for (;;) {
            if (cand == kNoMoreDocs) { doc = kNoMoreDocs; return doc; }
            // leapfrog the remaining terms onto cand
            bool agree = true;
            for (size_t j = 1; j < terms.size(); j++) {
                int32_t d = terms[j].advance(cand);
                if (d != cand) { cand = terms[0].advance(d); agree = false; break; }
            }
            if (!agree) continue;
            pfreq = compute_pfreq();
            if (pfreq > 0) { doc = cand; return doc; }
            cand = terms[0].advance(cand + 1);
        }
    }

    int32_t next_doc() { return advance(doc + 1); }
};

// Bounded top-k: min-heap whose root is the WORST kept hit under the
// Lucene ordering score desc, doc asc (top_docs.rs:68-77).
struct TopK {
    int32_t k;
    std::vector<float> scores;
    std::vector<int32_t> docs;

    explicit TopK(int32_t kk) : k(kk) { scores.reserve(kk); docs.reserve(kk); }

    static bool worse(float sa, int32_t da, float sb, int32_t db) {
        return sa < sb || (sa == sb && da > db);
    }

    void sift_down(size_t i) {
        size_t sz = scores.size();
        for (;;) {
            size_t l = 2 * i + 1, r = l + 1, m = i;
            if (l < sz && worse(scores[l], docs[l], scores[m], docs[m])) m = l;
            if (r < sz && worse(scores[r], docs[r], scores[m], docs[m])) m = r;
            if (m == i) break;
            std::swap(scores[i], scores[m]);
            std::swap(docs[i], docs[m]);
            i = m;
        }
    }

    void insert(float s, int32_t d) {
        if ((int32_t)scores.size() < k) {
            scores.push_back(s);
            docs.push_back(d);
            size_t i = scores.size() - 1;
            while (i > 0) {
                size_t p = (i - 1) >> 1;
                if (worse(scores[i], docs[i], scores[p], docs[p])) {
                    std::swap(scores[i], scores[p]);
                    std::swap(docs[i], docs[p]);
                    i = p;
                } else break;
            }
        } else if (worse(scores[0], docs[0], s, d)) {
            scores[0] = s;
            docs[0] = d;
            sift_down(0);
        }
    }

    // pop into out_docs/out_scores best-first; pad with -1
    void drain(int32_t* out_docs, float* out_scores) {
        int32_t m = (int32_t)scores.size();
        for (int32_t i = m; i < k; i++) { out_docs[i] = -1; out_scores[i] = 0.f; }
        for (int32_t i = m - 1; i >= 0; i--) {
            out_docs[i] = docs[0];
            out_scores[i] = scores[0];
            scores[0] = scores.back(); docs[0] = docs.back();
            scores.pop_back(); docs.pop_back();
            sift_down(0);
        }
    }
};

struct Clause {
    PostingsIterator it;
    float weight;            // boost*idf*(k1+1); 0 for FILTER/MUST_NOT
    const float* cache;      // f32[256] norm cache row
    uint8_t occur;           // 0 SHOULD 1 MUST 2 MUST_NOT 3 FILTER
    int32_t match_doc = -1;  // disjunction: doc the cached contrib is for
    float contrib = 0.f;
};

struct PhraseClause {
    PhraseIterator it;
    float weight;
    const float* cache;
};

inline float bm25(float w, int32_t f, const float* cache, uint8_t nb) {
    float tf = (float)f;
    return w * tf / (tf + cache[nb]);
}

inline float phrase_score(const PhraseClause& pc) {
    // norm byte of the doc: all member terms carry the same field norm;
    // read it from the first member's current lane
    const PostingsIterator& t0 = pc.it.terms[0];
    return bm25(pc.weight, pc.it.pfreq, pc.cache, t0.norm());
}

}  // namespace

extern "C" {

// Run Q queries sequentially on one core. Returns 0 on success.
// Layout documented in rucene_tpu/search/scalar_engine.py.
int32_t rtpu_scalar_search(
    const uint32_t* data, const int32_t* blk_off, const int32_t* blk_doc_bits,
    const int32_t* blk_freq_bits, const int32_t* blk_base,
    const int32_t* blk_count, const int32_t* blk_last,
    const int32_t* blk_pos_base, const uint32_t* positions,
    const uint8_t* live, int32_t max_doc,
    const float* caches,  // [R,256]
    int32_t n_queries, const int64_t* q_clause_start,
    const int32_t* q_min_should, const uint8_t* q_match_all,
    const float* q_boost,
    const int32_t* c_block_start, const int32_t* c_block_count,
    const float* c_weight, const uint8_t* c_occur, const int32_t* c_cache_idx,
    const int32_t* c_phrase_id, const int32_t* c_pos_width,
    const int64_t* c_pos_word_start,
    int32_t k, int32_t* out_docs, float* out_scores, int64_t* out_totals) {
    Segment seg{data, blk_off, blk_doc_bits, blk_freq_bits, blk_base,
                blk_count, blk_last, blk_pos_base, positions, live, max_doc};

    // clauses live in `all` in ORIGINAL clause order — scoring must sum
    // contributions in that order to reproduce the engines' f32 operation
    // order exactly (ties at the k boundary depend on it); the index
    // vectors drive iteration control only.
    std::vector<Clause> all;
    std::vector<int32_t> musts, shoulds, nots, filters;
    std::vector<PhraseClause> phrases;

    for (int32_t q = 0; q < n_queries; q++) {
        all.clear(); musts.clear(); shoulds.clear(); nots.clear();
        filters.clear(); phrases.clear();
        int64_t c0 = q_clause_start[q], c1 = q_clause_start[q + 1];
        for (int64_t c = c0; c < c1; c++) {
            if (c_phrase_id[c] >= 0) {
                // consecutive clauses with the same phrase id form a phrase
                if (phrases.empty() || c == c0 || c_phrase_id[c - 1] != c_phrase_id[c]) {
                    phrases.emplace_back();
                    phrases.back().weight = c_weight[c];
                    phrases.back().cache = caches + 256 * (int64_t)c_cache_idx[c];
                }
                PostingsIterator pit;
                pit.init(&seg, c_block_start[c], c_block_count[c]);
                pit.pos_width = c_pos_width[c];
                pit.pos_word_start = c_pos_word_start[c];
                phrases.back().it.terms.push_back(pit);
                continue;
            }
            Clause cl;
            cl.it.init(&seg, c_block_start[c], c_block_count[c]);
            cl.weight = c_weight[c];
            cl.cache = caches + 256 * (int64_t)c_cache_idx[c];
            cl.occur = c_occur[c];
            int32_t ix = (int32_t)all.size();
            all.push_back(cl);
            switch (c_occur[c]) {
                case 1: musts.push_back(ix); break;
                case 2: nots.push_back(ix); break;
                case 3: filters.push_back(ix); break;
                default: shoulds.push_back(ix); break;
            }
        }

        TopK top(k);
        int64_t total = 0;
        int32_t min_should = q_min_should[q];
        bool have_req = !musts.empty() || !filters.empty() || !phrases.empty();
        if (!have_req && shoulds.empty() && !q_match_all[q]) {
            // empty query (e.g. a required term missing from the segment)
            out_totals[q] = 0;
            top.drain(out_docs + (int64_t)q * k, out_scores + (int64_t)q * k);
            continue;
        }
        if (min_should <= 0 && !have_req && !q_match_all[q]) min_should = 1;

        if (q_match_all[q] && !have_req && shoulds.empty()) {
            float b = q_boost[q];
            for (int32_t d = 0; d < max_doc; d++) {
                if (live && !live[d]) continue;
                total++;
                top.insert(b, d);
            }
        } else if (have_req) {
            // conjunction-driven doc-at-a-time (conjunction_scorer.rs):
            // required = musts + filters + phrases leapfrog; shoulds and
            // nots advance onto the agreement doc
            int32_t doc = -1;
            for (;;) {
                // pick next candidate from the first required iterator
                int32_t cand;
                if (!musts.empty()) cand = all[musts[0]].it.advance(doc + 1);
                else if (!filters.empty()) cand = all[filters[0]].it.advance(doc + 1);
                else cand = phrases[0].it.advance(doc + 1);
                bool agree;
                do {
                    agree = true;
                    if (cand == kNoMoreDocs) break;
                    for (int32_t mi : musts) {
                        int32_t d = all[mi].it.advance(cand);
                        if (d != cand) { cand = d; agree = false; break; }
                    }
                    if (!agree) continue;
                    for (int32_t fi : filters) {
                        int32_t d = all[fi].it.advance(cand);
                        if (d != cand) { cand = d; agree = false; break; }
                    }
                    if (!agree) continue;
                    for (auto& p : phrases) {
                        int32_t d = p.it.doc >= cand ? p.it.doc : p.it.advance(cand);
                        if (d != cand) { cand = d; agree = false; break; }
                    }
                } while (!agree);
                if (cand == kNoMoreDocs) break;
                doc = cand;
                if (live && !live[doc]) continue;
                bool excluded = false;
                for (int32_t ni : nots) {
                    auto& nt = all[ni];
                    if (nt.it.doc < doc) nt.it.advance(doc);
                    if (nt.it.doc == doc) { excluded = true; break; }
                }
                if (excluded) continue;
                int32_t should_hits = 0;
                for (int32_t si : shoulds) {
                    auto& s = all[si];
                    if (s.it.doc < doc) s.it.advance(doc);
                    if (s.it.doc == doc) should_hits++;
                }
                if (should_hits < min_should) continue;
                // score in ORIGINAL clause order (host engine f32 parity),
                // then phrases in order
                float score = 0.f;
                for (auto& cl : all) {
                    if (cl.occur > 1) continue;  // NOT/FILTER never score
                    if (cl.it.doc == doc)
                        score += bm25(cl.weight, cl.it.freq(), cl.cache, cl.it.norm());
                }
                for (auto& p : phrases) score += phrase_score(p);
                total++;
                top.insert(score, doc);
            }
        } else {
            // pure disjunction: heap of iterators keyed by current doc
            // (disjunction_scorer.rs DisiPriorityQueue)
            struct HeapEnt { int32_t doc; int32_t idx; };
            std::vector<HeapEnt> heap;
            for (size_t i = 0; i < shoulds.size(); i++) {
                int32_t d = all[shoulds[i]].it.next_doc();
                if (d != kNoMoreDocs) heap.push_back({d, (int32_t)i});
            }
            auto cmp = [](const HeapEnt& a, const HeapEnt& b) { return a.doc > b.doc; };
            std::make_heap(heap.begin(), heap.end(), cmp);
            while (!heap.empty()) {
                int32_t doc = heap.front().doc;
                int32_t nmatch = 0;
                while (!heap.empty() && heap.front().doc == doc) {
                    std::pop_heap(heap.begin(), heap.end(), cmp);
                    auto& s = all[shoulds[heap.back().idx]];
                    nmatch++;
                    // cache the contribution now (the iterator moves on),
                    // sum later in original clause order
                    s.match_doc = doc;
                    s.contrib = bm25(s.weight, s.it.freq(), s.cache, s.it.norm());
                    int32_t d = s.it.next_doc();
                    if (d == kNoMoreDocs) heap.pop_back();
                    else { heap.back().doc = d; std::push_heap(heap.begin(), heap.end(), cmp); }
                }
                if (live && !live[doc]) continue;
                bool excluded = false;
                for (int32_t ni : nots) {
                    auto& nt = all[ni];
                    if (nt.it.doc < doc) nt.it.advance(doc);
                    if (nt.it.doc == doc) { excluded = true; break; }
                }
                if (excluded) continue;
                if (nmatch < min_should) continue;
                float score = 0.f;
                for (auto& cl : all)
                    if (cl.match_doc == doc) score += cl.contrib;
                total++;
                top.insert(score, doc);
            }
        }
        out_totals[q] = total;
        top.drain(out_docs + (int64_t)q * k, out_scores + (int64_t)q * k);
    }
    return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Span-tree evaluation: the native serving path for nested / unordered
// span-near shapes whose span geometry cannot reduce to the device term /
// synonym / phrase pipelines. Semantics mirror
// rucene_tpu/search/spans.py::spans_for_doc / host_eval EXACTLY (that
// Python path stays the test oracle). Reference analog:
// src/core/search/query/spans/span_near.rs:1067 (NearSpansUnordered),
// span_or.rs (SpansOr merge), span.rs:458 (SpanScorer sloppy-freq sum).

namespace {

struct Span {
    int32_t s, e;
};

inline bool span_lt(const Span& a, const Span& b) {
    return a.s < b.s || (a.s == b.s && a.e < b.e);
}

// numpy float64 pairwise summation, reproduced exactly: spans.py computes
// freq = np.sum(1/(1+max(width-mw,0))).astype(float32) and the f32 cast of
// the f64 sum must match bit-for-bit for cross-path top-k tie parity.
double np_pairwise_sum(const double* a, int64_t n) {
    if (n < 8) {
        double res = 0.;
        for (int64_t i = 0; i < n; i++) res += a[i];
        return res;
    }
    if (n <= 128) {  // numpy PW_BLOCKSIZE: 8 unrolled accumulators
        double r[8];
        for (int j = 0; j < 8; j++) r[j] = a[j];
        int64_t i = 8;
        for (; i + 8 <= n; i += 8)
            for (int j = 0; j < 8; j++) r[j] += a[i + j];
        double res = ((r[0] + r[1]) + (r[2] + r[3])) +
                     ((r[4] + r[5]) + (r[6] + r[7]));
        for (; i < n; i++) res += a[i];
        return res;
    }
    int64_t n2 = (n / 2) - ((n / 2) % 8);
    return np_pairwise_sum(a, n2) + np_pairwise_sum(a + n2, n - n2);
}

constexpr int32_t kSpanTerm = 0;
constexpr int32_t kSpanOr = 1;
constexpr int32_t kSpanNear = 2;

struct SpanNode {
    int32_t type, slop, minw;
    bool in_order;
    const int32_t* children;
    int32_t n_children;
    PostingsIterator it;  // kSpanTerm only
};

struct SpanEvaluator {
    std::vector<SpanNode> nodes;
    std::vector<std::vector<Span>> scratch;  // per-node span lists (reused)
    std::vector<int32_t> posbuf;
    std::vector<int32_t> startsbuf, endsbuf;

    // Spans of node `ni` in doc `doc`, written into scratch[ni], sorted
    // lexicographically by (start, end) — the invariant every Python
    // spans_for_doc result carries (term: positions ascending; or:
    // lexsort; near: sorted(out)).
    const std::vector<Span>& eval(int32_t ni, int32_t doc) {
        SpanNode& nd = nodes[ni];
        std::vector<Span>& out = scratch[ni];
        out.clear();
        if (nd.type == kSpanTerm) {
            if (nd.it.doc < doc) nd.it.advance(doc);
            if (nd.it.doc != doc) return out;
            nd.it.positions_of(posbuf);
            for (int32_t p : posbuf) out.push_back({p, p + 1});
            return out;
        }
        if (nd.type == kSpanOr) {
            for (int32_t c = 0; c < nd.n_children; c++) {
                const std::vector<Span>& sub = eval(nd.children[c], doc);
                out.insert(out.end(), sub.begin(), sub.end());
            }
            std::stable_sort(out.begin(), out.end(), span_lt);
            return out;
        }
        // kSpanNear: children first (any empty -> no spans; lazy bail is
        // result-identical to Python's evaluate-all-then-check)
        for (int32_t c = 0; c < nd.n_children; c++)
            if (eval(nd.children[c], doc).empty()) return out;
        if (nd.in_order) {
            // greedy ordered matching (NearSpansOrdered): for each first-
            // child span, chain each later child's FIRST span (in sorted
            // order) starting at-or-after the running end
            const std::vector<Span>& first = scratch[nd.children[0]];
            for (const Span& s0 : first) {
                int32_t start = s0.s, end = s0.e;
                bool ok = true;
                for (int32_t c = 1; c < nd.n_children; c++) {
                    const std::vector<Span>& sub = scratch[nd.children[c]];
                    Span key{end, INT32_MIN};
                    auto it = std::lower_bound(sub.begin(), sub.end(), key, span_lt);
                    if (it == sub.end()) { ok = false; break; }
                    end = it->e;
                }
                if (ok && (end - start) - nd.minw <= nd.slop)
                    out.push_back({start, end});
            }
            std::sort(out.begin(), out.end(), span_lt);  // duplicates kept
            return out;
        }
        // unordered: candidate (s0, e0) extents over unique child starts/
        // ends with width <= minw + slop; achievable iff every child has a
        // span inside [s0, e0], some child's inside-span starts at s0, some
        // child's ends at e0, and the witnesses are distinct clauses (or
        // one span realizes both ends) — spans.py:236-267 verbatim.
        int32_t cap = nd.minw + nd.slop;
        startsbuf.clear();
        endsbuf.clear();
        for (int32_t c = 0; c < nd.n_children; c++)
            for (const Span& sp : scratch[nd.children[c]]) {
                startsbuf.push_back(sp.s);
                endsbuf.push_back(sp.e);
            }
        std::sort(startsbuf.begin(), startsbuf.end());
        startsbuf.erase(std::unique(startsbuf.begin(), startsbuf.end()), startsbuf.end());
        std::sort(endsbuf.begin(), endsbuf.end());
        endsbuf.erase(std::unique(endsbuf.begin(), endsbuf.end()), endsbuf.end());
        for (int32_t s0 : startsbuf) {
            for (int32_t e0 : endsbuf) {
                if (e0 <= s0 || e0 - s0 > cap) continue;
                bool all_inside = true;
                int32_t first_start_c = -1, first_end_c = -1;
                int32_t n_start_c = 0, n_end_c = 0;
                bool both = false;
                for (int32_t c = 0; c < nd.n_children && all_inside; c++) {
                    const std::vector<Span>& sub = scratch[nd.children[c]];
                    bool inside = false, at_s = false, at_e = false, at_both = false;
                    for (const Span& sp : sub) {
                        if (sp.s < s0 || sp.e > e0) continue;
                        inside = true;
                        if (sp.s == s0) at_s = true;
                        if (sp.e == e0) at_e = true;
                        if (sp.s == s0 && sp.e == e0) at_both = true;
                    }
                    if (!inside) { all_inside = false; break; }
                    if (at_s) { n_start_c++; if (first_start_c < 0) first_start_c = c; }
                    if (at_e) { n_end_c++; if (first_end_c < 0) first_end_c = c; }
                    if (at_s && at_both) both = true;
                }
                if (!all_inside || n_start_c == 0 || n_end_c == 0) continue;
                // |set(c_start) union set(c_end)| >= 2: more than one
                // start-witness, more than one end-witness, or one of each
                // naming different children
                bool distinct = n_start_c >= 2 || n_end_c >= 2 ||
                                first_start_c != first_end_c;
                if (distinct || both) out.push_back({s0, e0});
            }
        }
        // iteration order (s0 asc, e0 asc) is already lexicographic and
        // (s0, e0) pairs are unique — matches sorted(set(out))
        return out;
    }
};

}  // namespace

extern "C" {

// Evaluate one span tree over `n_cand` ascending candidate docs; writes a
// match flag and BM25 span score per candidate. Node 0 is the root.
// Layout documented in rucene_tpu/search/span_native.py.
int32_t rtpu_span_eval(
    const uint32_t* data, const int32_t* blk_off, const int32_t* blk_doc_bits,
    const int32_t* blk_freq_bits, const int32_t* blk_base,
    const int32_t* blk_count, const int32_t* blk_last,
    const int32_t* blk_pos_base, const uint32_t* positions, int32_t max_doc,
    int32_t n_nodes, const int32_t* node_type, const int32_t* node_slop,
    const uint8_t* node_inorder, const int32_t* node_minw,
    const int32_t* node_child_start, const int32_t* node_child_count,
    const int32_t* children,
    const int32_t* t_block_start, const int32_t* t_block_count,
    const int32_t* t_pos_width, const int64_t* t_pos_word_start,
    const int32_t* cand, int32_t n_cand,
    float w2, const float* cache_row, const uint8_t* norms,
    uint8_t* out_match, float* out_scores) {
    Segment seg{data, blk_off, blk_doc_bits, blk_freq_bits, blk_base,
                blk_count, blk_last, blk_pos_base, positions,
                /*live=*/nullptr, max_doc};

    SpanEvaluator ev;
    ev.nodes.resize(n_nodes);
    ev.scratch.resize(n_nodes);
    for (int32_t i = 0; i < n_nodes; i++) {
        SpanNode& nd = ev.nodes[i];
        nd.type = node_type[i];
        nd.slop = node_slop[i];
        nd.minw = node_minw[i];
        nd.in_order = node_inorder[i] != 0;
        nd.children = children + node_child_start[i];
        nd.n_children = node_child_count[i];
        if (nd.type == kSpanTerm) {
            nd.it.init(&seg, t_block_start[i], t_block_count[i]);
            nd.it.pos_width = t_pos_width[i];
            nd.it.pos_word_start = t_pos_word_start[i];
        }
    }

    int32_t root_minw = n_nodes ? node_minw[0] : 0;
    std::vector<double> terms_d;
    for (int32_t ci = 0; ci < n_cand; ci++) {
        int32_t d = cand[ci];
        const std::vector<Span>& spans = ev.eval(0, d);
        if (spans.empty()) {
            out_match[ci] = 0;
            out_scores[ci] = 0.f;
            continue;
        }
        terms_d.clear();
        for (const Span& sp : spans) {
            int64_t dist = (int64_t)(sp.e - sp.s) - root_minw;
            if (dist < 0) dist = 0;  // overlap clamp (spans.py:67-69)
            terms_d.push_back(1.0 / (1.0 + (double)dist));
        }
        float freq = (float)np_pairwise_sum(terms_d.data(), (int64_t)terms_d.size());
        uint8_t nb = norms ? norms[d] : 0;
        float cval = cache_row[nb];
        out_match[ci] = 1;
        out_scores[ci] = w2 * freq / (freq + cval);
    }
    return 0;
}

}  // extern "C"
