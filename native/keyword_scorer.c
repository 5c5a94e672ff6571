/* Exact substring keyword rescorer — the host-side hot path of certified
 * search. For each candidate chunk, computes the fraction of query terms
 * byte-substring-contained in the (pre-lowercased, UTF-8) content — the
 * exact semantics of the reference's KeywordScore
 * (src/OmniRecall.Api/Services/RecallSearchService.cs:90-113; byte-level
 * match on valid UTF-8 equals character-level ordinal match because UTF-8
 * is self-synchronizing).
 *
 * Built as a plain shared library (no Python.h) and loaded via ctypes, so
 * the scan loop runs without the GIL from the caller's perspective.
 *
 * Build: cc -O3 -shared -fPIC -o libomni_keyword.so keyword_scorer.c
 */

#define _GNU_SOURCE
#include <stddef.h>
#include <string.h>

/* Two-way/memmem is glibc; provide a fallback for other libcs. */
static const char *find_sub(const char *hay, size_t hay_len,
                            const char *needle, size_t needle_len) {
#ifdef __GLIBC__
    return (const char *)memmem(hay, hay_len, needle, needle_len);
#else
    if (needle_len == 0 || needle_len > hay_len) {
        return needle_len == 0 ? hay : NULL;
    }
    const char first = needle[0];
    const char *end = hay + hay_len - needle_len;
    for (const char *p = hay; p <= end; p++) {
        if (*p == first && memcmp(p, needle, needle_len) == 0) {
            return p;
        }
    }
    return NULL;
#endif
}

/* contents: n_contents buffers (lowercased UTF-8), terms: n_terms buffers
 * (lowercased UTF-8, distinct). out[i] = matches_i / n_terms.
 * Returns 0 on success. */
int keyword_scores(const char **contents, const long *content_lens,
                   long n_contents, const char **terms, const long *term_lens,
                   long n_terms, double *out) {
    if (n_terms <= 0) {
        for (long i = 0; i < n_contents; i++) out[i] = 0.0;
        return 0;
    }
    for (long i = 0; i < n_contents; i++) {
        const char *content = contents[i];
        long content_len = content_lens[i];
        long matches = 0;
        if (content_len > 0) {
            for (long t = 0; t < n_terms; t++) {
                if (term_lens[t] > 0 &&
                    find_sub(content, (size_t)content_len, terms[t],
                             (size_t)term_lens[t]) != NULL) {
                    matches++;
                }
            }
        }
        out[i] = (double)matches / (double)n_terms;
    }
    return 0;
}

/* ---- bloom signature construction (ingest hot path) ----
 *
 * Mirrors ops/hashing.py exactly: FNV-1a 64-bit over UTF-8 gram bytes with
 * seeds 1/2 (h ^= seed*GOLDEN at init), double hashing for n_hashes probe
 * positions, gram lengths {1, 2, ngram} skipping whitespace-containing
 * grams, packed layout word = pos % W, bit = pos / W. Byte-level gram
 * extraction over UTF-8 is identical to the Python character-level
 * extraction for ASCII content; multi-byte graphemes hash differently, so
 * the Python path remains the reference for non-ASCII content (the loader
 * routes non-ASCII contents to Python).
 */

#include <stdint.h>

static uint64_t fnv1a_seeded(const unsigned char *data, long len, uint64_t seed) {
    uint64_t h = 0xCBF29CE484222325ULL ^ (seed * 0x9E3779B97F4A7C15ULL);
    for (long i = 0; i < len; i++) {
        h ^= data[i];
        h *= 0x100000001B3ULL;
    }
    return h;
}

static int is_space(unsigned char c) {
    /* ASCII whitespace (str.isspace for ASCII) */
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v'
        || c == 0x1c || c == 0x1d || c == 0x1e || c == 0x1f || c == 0x0b;
}

static void set_gram(const unsigned char *gram, long glen, long bloom_bits,
                     long n_hashes, long w_bytes, unsigned char *out) {
    uint64_t h1 = fnv1a_seeded(gram, glen, 1);
    uint64_t h2 = fnv1a_seeded(gram, glen, 2) | 1ULL;
    for (long i = 0; i < n_hashes; i++) {
        uint64_t pos = (h1 + (uint64_t)i * h2) % (uint64_t)bloom_bits;
        out[pos % (uint64_t)w_bytes] |= (unsigned char)(1u << (pos / (uint64_t)w_bytes));
    }
}

/* Build packed bloom signatures for n_contents lowercased ASCII contents.
 * out is n_contents * (bloom_bits/8) bytes, zeroed by the caller. */
int chunk_signatures(const char **contents, const long *content_lens,
                     long n_contents, long bloom_bits, long ngram,
                     long n_hashes, unsigned char *out) {
    long w_bytes = bloom_bits / 8;
    long lens[3] = {1, 2, ngram};
    for (long i = 0; i < n_contents; i++) {
        const unsigned char *s = (const unsigned char *)contents[i];
        long slen = content_lens[i];
        unsigned char *row = out + i * w_bytes;
        for (int li = 0; li < 3; li++) {
            long gl = lens[li];
            if (li == 1 && ngram == 2) continue;  /* dedupe lengths */
            if (li == 2 && (ngram == 1 || ngram == 2)) continue;
            for (long p = 0; p + gl <= slen; p++) {
                int ws = 0;
                for (long j = 0; j < gl; j++) {
                    if (is_space(s[p + j])) { ws = 1; break; }
                }
                if (!ws) set_gram(s + p, gl, bloom_bits, n_hashes, w_bytes, row);
            }
        }
    }
    return 0;
}

/* Multi-query batch: content i is scored against the term slice of query
 * content_query[i]; query q's terms are terms[term_offsets[q] ..
 * term_offsets[q+1]). One call rescore for a whole search batch. */
int keyword_scores_multi(const char **contents, const long *content_lens,
                         const long *content_query, long n_contents,
                         const char **terms, const long *term_lens,
                         const long *term_offsets, long n_queries,
                         double *out) {
    for (long i = 0; i < n_contents; i++) {
        long q = content_query[i];
        if (q < 0 || q >= n_queries) {
            return 1;
        }
        long t_lo = term_offsets[q];
        long t_hi = term_offsets[q + 1];
        long n_terms = t_hi - t_lo;
        if (n_terms <= 0) {
            out[i] = 0.0;
            continue;
        }
        const char *content = contents[i];
        long content_len = content_lens[i];
        long matches = 0;
        if (content_len > 0) {
            for (long t = t_lo; t < t_hi; t++) {
                if (term_lens[t] > 0 &&
                    find_sub(content, (size_t)content_len, terms[t],
                             (size_t)term_lens[t]) != NULL) {
                    matches++;
                }
            }
        }
        out[i] = (double)matches / (double)n_terms;
    }
    return 0;
}
