// Native runtime components for rucene_tpu.
//
// 1. Inversion fast path: whitespace tokenize + term hash + postings
//    accumulation — the indexing hot loop the reference implements as
//    TermsHash/BytesRefHash over block pools
//    (rucene src/core/codec/postings/terms_hash_per_field.rs:610,
//     src/core/util/bytes_ref_hash.rs:36). Exposed as a handle-based C API
//    consumed through ctypes; exports columnar arrays that slice directly
//    into SegmentData with zero per-term Python work.
//
// 2. LZ4 block compression (reference src/core/util/compression.rs:46):
//    self-contained encoder/decoder of the standard LZ4 block format for
//    stored fields / term vectors.
//
// Build: g++ -O3 -shared -fPIC (see rucene_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Inversion
// ---------------------------------------------------------------------------

struct TermPostings {
    std::vector<int32_t> docs;
    std::vector<int32_t> freqs;
    std::vector<int32_t> positions;  // absolute positions, doc order
};

struct InvHandle {
    std::unordered_map<std::string, uint32_t> term_ids;
    std::vector<TermPostings> postings;
    std::vector<std::string> terms;
    int64_t total_postings = 0;
    int64_t total_positions = 0;
    // scratch reused across docs
    std::string tok;
};

InvHandle* rtpu_inv_create() { return new InvHandle(); }

void rtpu_inv_free(InvHandle* h) { delete h; }

// Tokenize on ASCII whitespace, optionally ASCII-lowercase, and append
// occurrences. base_pos supports multi-valued fields. Returns the number of
// tokens seen (the field-length contribution for norms).
int32_t rtpu_inv_add_doc(InvHandle* h, int32_t doc_id, const char* text,
                         int64_t len, int32_t lowercase, int32_t base_pos) {
    int32_t pos = base_pos;
    int64_t i = 0;
    while (i < len) {
        while (i < len && (unsigned char)text[i] <= ' ') i++;
        if (i >= len) break;
        int64_t start = i;
        while (i < len && (unsigned char)text[i] > ' ') i++;
        h->tok.assign(text + start, (size_t)(i - start));
        if (lowercase) {
            for (char& c : h->tok)
                if (c >= 'A' && c <= 'Z') c += 32;
        }
        auto it = h->term_ids.find(h->tok);
        uint32_t tid;
        if (it == h->term_ids.end()) {
            tid = (uint32_t)h->postings.size();
            h->term_ids.emplace(h->tok, tid);
            h->postings.emplace_back();
            h->terms.push_back(h->tok);
        } else {
            tid = it->second;
        }
        TermPostings& tp = h->postings[tid];
        if (tp.docs.empty() || tp.docs.back() != doc_id) {
            tp.docs.push_back(doc_id);
            tp.freqs.push_back(1);
            h->total_postings++;
        } else {
            tp.freqs.back()++;
        }
        tp.positions.push_back(pos);
        h->total_positions++;
        pos++;
    }
    return pos - base_pos;
}

// Bulk variant: docs concatenated in one UTF-8 buffer with offsets.
// Writes per-doc token counts to out_counts. One GIL release per chunk.
void rtpu_inv_add_docs(InvHandle* h, const char* buf, const int64_t* offsets,
                       int32_t n_docs, const int32_t* doc_ids, int32_t lowercase,
                       int32_t* out_counts) {
    for (int32_t d = 0; d < n_docs; d++) {
        out_counts[d] = rtpu_inv_add_doc(
            h, doc_ids[d], buf + offsets[d], offsets[d + 1] - offsets[d],
            lowercase, 0);
    }
}

int64_t rtpu_inv_num_terms(InvHandle* h) { return (int64_t)h->terms.size(); }

int64_t rtpu_inv_term_bytes_len(InvHandle* h) {
    int64_t n = 0;
    for (auto& t : h->terms) n += (int64_t)t.size();
    return n;
}

int64_t rtpu_inv_num_postings(InvHandle* h) { return h->total_postings; }

int64_t rtpu_inv_num_positions(InvHandle* h) { return h->total_positions; }

// Export columnar arrays with terms in sorted (byte) order. Caller
// allocates: term_bytes[term_bytes_len], term_offsets[T+1],
// post_start[T+1], pos_start[T+1], docs/freqs[total_postings],
// positions[total_positions].
void rtpu_inv_export(InvHandle* h, uint8_t* term_bytes, int64_t* term_offsets,
                     int64_t* post_start, int64_t* pos_start, int32_t* docs,
                     int32_t* freqs, int32_t* positions) {
    size_t t_count = h->terms.size();
    std::vector<uint32_t> order(t_count);
    for (size_t i = 0; i < t_count; i++) order[i] = (uint32_t)i;
    std::sort(order.begin(), order.end(), [h](uint32_t a, uint32_t b) {
        return h->terms[a] < h->terms[b];
    });

    int64_t byte_off = 0, post_off = 0, pos_off = 0;
    term_offsets[0] = 0;
    post_start[0] = 0;
    pos_start[0] = 0;
    for (size_t oi = 0; oi < t_count; oi++) {
        uint32_t tid = order[oi];
        const std::string& term = h->terms[tid];
        std::memcpy(term_bytes + byte_off, term.data(), term.size());
        byte_off += (int64_t)term.size();
        term_offsets[oi + 1] = byte_off;

        TermPostings& tp = h->postings[tid];
        std::memcpy(docs + post_off, tp.docs.data(), tp.docs.size() * 4);
        std::memcpy(freqs + post_off, tp.freqs.data(), tp.freqs.size() * 4);
        post_off += (int64_t)tp.docs.size();
        post_start[oi + 1] = post_off;

        std::memcpy(positions + pos_off, tp.positions.data(), tp.positions.size() * 4);
        pos_off += (int64_t)tp.positions.size();
        pos_start[oi + 1] = pos_off;
    }
}

// ---------------------------------------------------------------------------
// LZ4 block format (compatible with the standard spec)
// ---------------------------------------------------------------------------

static const int MIN_MATCH = 4;
static const int HASH_LOG = 16;

static inline uint32_t lz4_hash(uint32_t v) {
    return (v * 2654435761u) >> (32 - HASH_LOG);
}

static inline uint32_t read32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

// Compress src[0..n) into dst (capacity cap). Returns compressed size or -1.
int64_t rtpu_lz4_compress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
    if (n == 0) return 0;
    std::vector<int32_t> table(1 << HASH_LOG, -1);
    int64_t ip = 0, op = 0, anchor = 0;
    const int64_t mflimit = n - 12;  // spec: last match must start 12B before end

    while (ip < mflimit) {
        int32_t ref = table[lz4_hash(read32(src + ip))];
        table[lz4_hash(read32(src + ip))] = (int32_t)ip;
        if (ref >= 0 && (ip - ref) < 65536 && read32(src + ref) == read32(src + ip)) {
            // extend match
            int64_t mlen = MIN_MATCH;
            while (ip + mlen < n - 5 && src[ref + mlen] == src[ip + mlen]) mlen++;
            int64_t lit = ip - anchor;
            // token + literals
            int64_t need = 1 + lit / 255 + 1 + lit + 2 + (mlen - MIN_MATCH) / 255 + 1;
            if (op + need >= cap) return -1;
            uint8_t* tok = dst + op++;
            int64_t l = lit;
            *tok = (uint8_t)((l >= 15 ? 15 : l) << 4);
            if (l >= 15) {
                l -= 15;
                while (l >= 255) { dst[op++] = 255; l -= 255; }
                dst[op++] = (uint8_t)l;
            }
            std::memcpy(dst + op, src + anchor, (size_t)lit);
            op += lit;
            // offset
            uint16_t off = (uint16_t)(ip - ref);
            dst[op++] = (uint8_t)(off & 0xFF);
            dst[op++] = (uint8_t)(off >> 8);
            // match length
            int64_t m = mlen - MIN_MATCH;
            *tok |= (uint8_t)(m >= 15 ? 15 : m);
            if (m >= 15) {
                m -= 15;
                while (m >= 255) { dst[op++] = 255; m -= 255; }
                dst[op++] = (uint8_t)m;
            }
            ip += mlen;
            anchor = ip;
        } else {
            ip++;
        }
    }
    // trailing literals
    int64_t lit = n - anchor;
    if (op + 1 + lit / 255 + 1 + lit > cap) return -1;
    uint8_t* tok = dst + op++;
    int64_t l = lit;
    *tok = (uint8_t)((l >= 15 ? 15 : l) << 4);
    if (l >= 15) {
        l -= 15;
        while (l >= 255) { dst[op++] = 255; l -= 255; }
        dst[op++] = (uint8_t)l;
    }
    std::memcpy(dst + op, src + anchor, (size_t)lit);
    op += lit;
    return op;
}

// Decompress src[0..n) into dst (exact capacity cap = original size).
// Returns decompressed size or -1 on malformed input.
int64_t rtpu_lz4_decompress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
    int64_t ip = 0, op = 0;
    while (ip < n) {
        uint8_t token = src[ip++];
        // literals
        int64_t lit = token >> 4;
        if (lit == 15) {
            uint8_t b;
            do {
                if (ip >= n) return -1;
                b = src[ip++];
                lit += b;
            } while (b == 255);
        }
        if (ip + lit > n || op + lit > cap) return -1;
        std::memcpy(dst + op, src + ip, (size_t)lit);
        ip += lit;
        op += lit;
        if (ip >= n) break;  // last block has no match part
        // match
        if (ip + 2 > n) return -1;
        uint16_t off = (uint16_t)(src[ip] | (src[ip + 1] << 8));
        ip += 2;
        if (off == 0 || off > op) return -1;
        int64_t mlen = (token & 15);
        if (mlen == 15) {
            uint8_t b;
            do {
                if (ip >= n) return -1;
                b = src[ip++];
                mlen += b;
            } while (b == 255);
        }
        mlen += MIN_MATCH;
        if (op + mlen > cap) return -1;
        // overlapping copy byte-by-byte (required for off < mlen)
        for (int64_t i = 0; i < mlen; i++) {
            dst[op] = dst[op - off];
            op++;
        }
    }
    return op;
}

}  // extern "C"
