/* grom_tpu native reference preprocessing.
 *
 * Triangular-weighted GC% / ACGT% per base over a (2m-1)-base window
 * (behavioral spec: src/GROM.c:1766-1861) — computed with running window
 * sums in registers: T(p+1) - T(p) = W(p+1) - W(p-m+1) where W(k) is the
 * m-base window sum, and both W terms advance O(1) per base. This is the
 * reference's own paired increasing/decreasing-counter trick; the earlier
 * prefix-sum formulation allocated two int64[L+1] arrays (3.8GB at 240Mb)
 * whose first-touch page faults dominated the phase on sandboxed kernels.
 */

#include <stdint.h>
#include <stdlib.h>

#define GN_API __attribute__((visibility("default")))

/* out[p] = 100 * T(p) / (m*m) for p in [m-1, L-(2m-1)), else 0.
 * gc counts G/C; acgt counts A/C/G/T (case-insensitive). */
GN_API int gn_tri_weighted(const uint8_t *chrom, long L, long m,
                           int8_t *gc_w, int8_t *ac_w) {
    long W = 2 * m - 1;
    long lo = m - 1, hi = L - W;
    int64_t total = (int64_t) m * m;
    long p;
    for (p = 0; p < L; p++) { gc_w[p] = 0; ac_w[p] = 0; }
    if (hi <= lo || m <= 0)
        return 0;

    int8_t is_gc[256] = {0}, is_ac[256] = {0};
    is_gc['G'] = is_gc['g'] = is_gc['C'] = is_gc['c'] = 1;
    is_ac['A'] = is_ac['a'] = is_ac['T'] = is_ac['t'] = 1;
    is_ac['G'] = is_ac['g'] = is_ac['C'] = is_ac['c'] = 1;

    /* W(0) = sum x[0..m-1]; also T's first summand */
    int64_t wrg = 0, wra = 0;
    long k;
    for (k = 0; k < m; k++) {
        uint8_t b = chrom[k];
        wrg += is_gc[b];
        wra += is_ac[b];
    }
    /* wl = W(p-m) for the loop below; starts at W(0) (p = lo+1 uses
     * W(lo+1-m) = W(0)) */
    int64_t wlg = wrg, wla = wra;
    /* T(lo) = sum_{k=0}^{m-1} W(k), accumulating wr = W(k) as we go;
     * afterwards wr = W(m-1) = W(lo) */
    int64_t tg = wrg, ta = wra;
    for (k = 1; k < m; k++) {
        uint8_t add = chrom[k + m - 1], sub = chrom[k - 1];
        wrg += is_gc[add] - is_gc[sub];
        wra += is_ac[add] - is_ac[sub];
        tg += wrg;
        ta += wra;
    }
    gc_w[lo] = (int8_t)(100 * tg / total);
    ac_w[lo] = (int8_t)(100 * ta / total);
    for (p = lo + 1; p < hi; p++) {
        /* W(p-1) -> W(p) */
        uint8_t add = chrom[p + m - 1], sub = chrom[p - 1];
        wrg += is_gc[add] - is_gc[sub];
        wra += is_ac[add] - is_ac[sub];
        /* T(p) = T(p-1) + W(p) - W(p-m) */
        tg += wrg - wlg;
        ta += wra - wla;
        gc_w[p] = (int8_t)(100 * tg / total);
        ac_w[p] = (int8_t)(100 * ta / total);
        /* W(p-m) -> W(p+1-m) for the next iteration */
        uint8_t ladd = chrom[p], lsub = chrom[p - m];
        wlg += is_gc[ladd] - is_gc[lsub];
        wla += is_ac[ladd] - is_ac[lsub];
    }
    return 0;
}
