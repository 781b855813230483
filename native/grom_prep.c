/* grom_tpu native reference preprocessing.
 *
 * Triangular-weighted GC% / ACGT% per base over a (2m-1)-base window
 * (behavioral spec: src/GROM.c:1766-1861) — computed with the
 * second-difference recurrence T(p+1) - T(p) = W(p+1) - W(p-m+1) over one
 * int64 prefix-sum array per track, one streaming pass each, instead of the
 * reference's paired increasing/decreasing counters or the Python engine's
 * double prefix sums (which cost four full-size temporaries on the host).
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

    /* prefix sums c1[i] = sum x[0:i] for both tracks */
    int64_t *c1g = malloc((size_t)(L + 1) * sizeof(int64_t));
    int64_t *c1a = malloc((size_t)(L + 1) * sizeof(int64_t));
    if (!c1g || !c1a) { free(c1g); free(c1a); return -1; }
    c1g[0] = 0; c1a[0] = 0;
    for (p = 0; p < L; p++) {
        uint8_t b = chrom[p];
        c1g[p + 1] = c1g[p] + is_gc[b];
        c1a[p + 1] = c1a[p] + is_ac[b];
    }

    /* T(lo) = sum_{k=0}^{m-1} (c1[k+m] - c1[k]) */
    int64_t tg = 0, ta = 0;
    long k;
    for (k = 0; k < m; k++) {
        tg += c1g[k + m] - c1g[k];
        ta += c1a[k + m] - c1a[k];
    }
    gc_w[lo] = (int8_t)(100 * tg / total);
    ac_w[lo] = (int8_t)(100 * ta / total);
    for (p = lo + 1; p < hi; p++) {
        /* + W(p) - W(p-m):  W(k) = c1[k+m] - c1[k] */
        tg += (c1g[p + m] - c1g[p]) - (c1g[p] - c1g[p - m]);
        ta += (c1a[p + m] - c1a[p]) - (c1a[p] - c1a[p - m]);
        gc_w[p] = (int8_t)(100 * tg / total);
        ac_w[p] = (int8_t)(100 * ta / total);
    }
    free(c1g);
    free(c1a);
    return 0;
}
