/* grom_tpu native per-base SNV/depth accumulation.
 *
 * Native fast path for grom_tpu/call/scan.py:accumulate_chromosome — the
 * per-base tally half of the reference's scan loop (SNV counts with quality
 * split and read-name dedup, src/GROM.c:6757-6984; caf_rd_* depth lists,
 * src/GROM.c:6605-6664).  Semantics are defined by the Python implementation;
 * tests/test_native_scan.py checks bit equality of every output array.
 *
 * Read names are interned to int32 ids by the caller (np.unique — exact
 * equality, no hashing); the per-position dedup slots hold up to `max_slots`
 * ids in arrival order, living in a generation-tagged ring sized by the max
 * cigar reference span (a position can only be revisited while some live
 * read overlaps it, and reads arrive coordinate-sorted).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define GN_API __attribute__((visibility("default")))

#define MAX_DEDUP_SLOTS 16

typedef struct {
    int64_t gen;
    int32_t n;
    int32_t nids[MAX_DEDUP_SLOTS];
} dslot;

enum {
    SP_L = 0, SP_MIN_MAPQ, SP_MIN_BQ, SP_MAX_SLOTS, SP_NAME_LEN_CAP,
    SP_LO, SP_HI, SP_FINALIZE, SP_PARTS, SP_BASE, SP_STRIDE, N_SP
};
/* SP_BASE/SP_STRIDE (optional; params may be the short legacy array):
 * the SNV-family output arrays are chunk-local — element 0 is absolute
 * position SP_BASE and the [4,*] arrays have row stride SP_STRIDE.
 * The rd_* depth lists always stay whole-chromosome (absolute). */
/* SP_PARTS (optional; absent/0 = both): bit0 = SNV tally, bit1 = rd lists.
 * The threaded wrapper runs two position-gated SNV-only calls (disjoint
 * [lo,hi) halves — no shared writes) plus one serial rd-only call (the
 * rd span diffs straddle the split point). */

/* returns 0 ok; 1 = caller must fall back (unsorted spans / cap too big) */
GN_API int gn_snv_accumulate(
    long n_span,
    const int32_t *span_read, const int64_t *span_ref,
    const int64_t *span_readoff, const int64_t *span_len,
    const uint8_t *elig,
    const int32_t *mapq_a, const int32_t *flag_a, const int64_t *lseq_a,
    const int64_t *seq_off, const uint8_t *seq, const uint8_t *qual,
    const int32_t *name_id, const uint8_t *name_len,
    const uint8_t *chrom,
    const int64_t *params,
    int32_t *snv, int32_t *snv_lowmq,
    int32_t *bq, int32_t *bq_all, int32_t *mq_sum, int32_t *mq_all,
    int32_t *bq_read_count, int32_t *mq_read_count, int32_t *read_count_all,
    int32_t *pos_in_read, int32_t *fstrand,
    int32_t *rd_mq, int32_t *rd_hi, int32_t *rd_lo) {

    const int64_t L = params[SP_L];
    const int64_t min_mapq = params[SP_MIN_MAPQ];
    const int64_t min_bq = params[SP_MIN_BQ];
    const int32_t max_slots = (int32_t)params[SP_MAX_SLOTS];
    const int64_t name_len_cap = params[SP_NAME_LEN_CAP];
    /* position gate [lo, hi) + deferred prefix-sum: the streaming session
     * feeds overlapping read chunks; each call deposits only the positions
     * it owns, and the rd-list prefix sums run once on the final call */
    const int64_t lo = params[SP_LO];
    const int64_t hi = params[SP_HI] > 0 ? params[SP_HI] : L;
    const int finalize = (int)params[SP_FINALIZE];
    const int parts = params[SP_PARTS] ? (int)params[SP_PARTS] : 3;
    const int do_snv = parts & 1;
    const int do_rd = parts & 2;
    const int64_t base = params[SP_BASE];
    const int64_t stride = params[SP_STRIDE] > 0 ? params[SP_STRIDE] : L;
    if (max_slots > MAX_DEDUP_SLOTS)
        return 1;

    int8_t code_of[256];
    memset(code_of, -1, sizeof(code_of));
    code_of['A'] = code_of['a'] = 0;
    code_of['C'] = code_of['c'] = 1;
    code_of['G'] = code_of['g'] = 2;
    code_of['T'] = code_of['t'] = 3;

    /* ring sized by the max cigar ref span among eligible spans */
    dslot *ring = NULL;
    int64_t wmask = 0;
    if (do_snv) {
        int64_t max_span = 1;
        for (long s = 0; s < n_span; s++)
            if (span_len[s] > max_span)
                max_span = span_len[s];
        int64_t W = 1;
        while (W < max_span + 2)
            W <<= 1;
        ring = (dslot *)malloc((size_t)W * sizeof(dslot));
        if (!ring)
            return 1;
        for (int64_t i = 0; i < W; i++)
            ring[i].gen = -1;
        wmask = W - 1;
    }

    for (long s = 0; s < n_span; s++) {
        int32_t rid = span_read[s];
        if (!elig[rid])
            continue;
        const int64_t ref0 = span_ref[s];
        const int64_t roff = span_readoff[s];
        const int64_t ln = span_len[s];
        const int32_t mq = mapq_a[rid];
        const int fwd = !(flag_a[rid] & 16);
        const int64_t lseq = lseq_a[rid];
        const uint8_t *rseq = seq + seq_off[rid];
        const uint8_t *rq = qual + seq_off[rid];
        const int hi_mq = mq >= min_mapq;
        const int32_t nid = name_id[rid];
        const int nm_short = name_len[rid] < name_len_cap;

        if (do_snv) {
        /* hoist the position gate: j in [j0, j1) <=> p in [max(lo,0),
         * min(hi,L)) — no per-base branch */
        int64_t j0 = 0, j1 = ln;
        if (ref0 < lo)
            j0 = lo - ref0;
        if (ref0 < 0 && -ref0 > j0)
            j0 = -ref0;
        if (ref0 + j1 > hi)
            j1 = hi - ref0;
        if (ref0 + j1 > L)
            j1 = L - ref0;
        for (int64_t j = j0; j < j1; j++) {
            const int64_t p = ref0 + j;
            const int64_t ridx = roff + j;
            const uint8_t b = rseq[ridx];
            const int64_t q = rq[ridx];
            const int c = code_of[b];
            const int hi = hi_mq && q >= min_bq;
            uint8_t rb = chrom[p];
            if (rb >= 97)
                rb -= 32;
            const int mm = (rb != b);

            int skip = 0;
            if (hi && mm) {
                dslot *d = &ring[p & wmask];
                if (d->gen != p) {
                    d->gen = p;
                    d->n = 0;
                }
                int found = 0;
                for (int32_t k = 0; k < d->n; k++) {
                    if (d->nids[k] == nid) {
                        found = 1;
                        break;
                    }
                }
                if (found) {
                    skip = 1;
                } else if (d->n < max_slots) {
                    if (nm_short)
                        d->nids[d->n++] = nid;
                }
            }
            const int64_t pb = p - base;
            if (hi) {
                if (!skip && c >= 0) {
                    /* bq_all/mq_all/read_count_all/mq_read_count receive
                     * identical contributions here — folded in ONE
                     * vectorized pass after the span loop (the scatter
                     * loop is store-bandwidth-bound; this drops 4 of its
                     * 9 per-base read-modify-writes) */
                    snv[(int64_t)c * stride + pb] += 1;
                    bq[pb] += q;
                    mq_sum[pb] += mq;
                    bq_read_count[pb] += 1;
                    if (fwd)
                        fstrand[(int64_t)c * stride + pb] += 1;
                    const int64_t pir = (mm || fwd) ? ridx : lseq - ridx;
                    pos_in_read[(int64_t)c * stride + pb] += pir;
                }
            } else if (c >= 0) {
                snv_lowmq[(int64_t)c * stride + pb] += 1;
                bq_all[pb] += q;
                mq_all[pb] += mq;
                read_count_all[pb] += 1;
            }
        }
        }

        /* caf_rd_* depth lists: whole-span rule (src/GROM.c:6605-6664) —
         * deposited only when ref0 >= 0 and ref0 + ln < L (strict) */
        if (do_rd && ref0 >= 0 && ref0 + ln < L) {
            int64_t s0 = ref0 < lo ? lo : ref0;
            int64_t e0 = ref0 + ln > hi ? hi : ref0 + ln;
            if (e0 > s0) {
                rd_mq[s0] += mq;
                rd_mq[e0] -= mq;
                if (hi_mq) {
                    rd_hi[s0] += 1;
                    rd_hi[e0] -= 1;
                } else {
                    rd_lo[s0] += 1;
                    rd_lo[e0] -= 1;
                }
            }
        }
    }
    free(ring);

    if (do_snv) {
        /* fold the high-quality contributions into the *_all aggregates
         * (single sequential pass, auto-vectorized): this call owns
         * exactly the positions in [lo, hi) of these (chunk-local)
         * arrays, and mq_read_count's increments were identical to
         * bq_read_count's */
        int64_t p0 = (lo > 0 ? lo : 0) - base;
        int64_t p1 = (hi < L ? hi : L) - base;
        if (p0 < 0)
            p0 = 0;
        for (int64_t p = p0; p < p1; p++) {
            bq_all[p] += bq[p];
            mq_all[p] += mq_sum[p];
            read_count_all[p] += bq_read_count[p];
            mq_read_count[p] += bq_read_count[p];
        }
    }

    if (!finalize)
        return 0;

    /* prefix sums for the rd lists */
    {
        int32_t acc = 0;
        for (int64_t p = 0; p < L; p++) {
            acc += rd_mq[p];
            rd_mq[p] = acc;
        }
        int32_t a1 = 0, a2 = 0;
        for (int64_t p = 0; p < L; p++) {
            a1 += rd_hi[p];
            rd_hi[p] = a1;
            a2 += rd_lo[p];
            rd_lo[p] = a2;
        }
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* Read-name interning                                                */
/* ------------------------------------------------------------------ */

/* Assign int32 ids to NUL-terminated names in a flat buffer (first-
 * occurrence order; exact byte equality via open-addressing FNV-1a with
 * full compare).  out_len gets min(len, 255).  Returns the number of
 * distinct names, or -1 on allocation failure. */
GN_API long gn_intern_names(const uint8_t *buf, const int64_t *name_off,
                            long R, int32_t *out_id, uint8_t *out_len) {
    if (R == 0)
        return 0;
    uint64_t cap = 1;
    while (cap < (uint64_t)R * 2)
        cap <<= 1;
    int64_t *tab = (int64_t *)malloc(cap * sizeof(int64_t)); /* read index */
    if (!tab)
        return -1;
    for (uint64_t i = 0; i < cap; i++)
        tab[i] = -1;
    long next_id = 0;
    for (long i = 0; i < R; i++) {
        const int64_t o = name_off[i];
        const int64_t len = name_off[i + 1] - o - 1;  /* excl. NUL */
        out_len[i] = (uint8_t)(len > 255 ? 255 : (len < 0 ? 0 : len));
        uint64_t h = 1469598103934665603ull;
        for (int64_t k = 0; k < len; k++) {
            h ^= buf[o + k];
            h *= 1099511628211ull;
        }
        uint64_t slot = h & (cap - 1);
        for (;;) {
            int64_t j = tab[slot];
            if (j < 0) {
                tab[slot] = i;
                out_id[i] = (int32_t)next_id++;
                break;
            }
            const int64_t jo = name_off[j];
            const int64_t jlen = name_off[j + 1] - jo - 1;
            if (jlen == len && memcmp(buf + jo, buf + o, (size_t)len) == 0) {
                out_id[i] = out_id[j];
                break;
            }
            slot = (slot + 1) & (cap - 1);
        }
    }
    free(tab);
    return next_id;
}
