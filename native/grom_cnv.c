/* grom_tpu native CNV kernels: per-base z-scores, the null window model,
 * and the del/dup window-growth scans.
 *
 * These are C ports of grom_tpu/call/cnv.py's vectorized implementations
 * (which are themselves clean-room re-expressions of the reference's CNV
 * engine, src/GROM.c:18228-20357). Floating-point accumulation follows the
 * same sequential order as the numpy cumsum-based code, so results are
 * bit-identical; the Python implementations remain as the differential
 * oracle (tests/test_native_cnv.py).
 *
 * Stage map (behavioral spec citations):
 *   gn_cnv_zscores    — per-base midrank / direct z (src/GROM.c:18754-18962)
 *   gn_cnv_null_model — window-score null stdev     (src/GROM.c:18975-19215)
 *   gn_cnv_scan       — del/dup window growth scan  (src/GROM.c:19358-20035)
 */

#include <stdint.h>
#include <string.h>

#define GN_API __attribute__((visibility("default")))

/* lower_bound / upper_bound over an int64 array */
static long lb_i64(const int64_t *a, long n, int64_t key) {
    long lo = 0, hi = n;
    while (lo < hi) {
        long mid = (lo + hi) >> 1;
        if (a[mid] < key)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}

static long ub_i64(const int64_t *a, long n, int64_t key) {
    long lo = 0, hi = n;
    while (lo < hi) {
        long mid = (lo + hi) >> 1;
        if (a[mid] <= key)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}

/* upper_bound over a double array (pv_p search) */
static long ub_f64(const double *a, long n, double key) {
    long lo = 0, hi = n;
    while (lo < hi) {
        long mid = (lo + hi) >> 1;
        if (a[mid] <= key)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}

/* the custom-bisect quirk the numpy path reproduces: with n == 2 a result
 * of 0 becomes 1 (see cnv.py's _fx; verified exhaustively vs the ported
 * reference bisects for n <= 8 and randomized to n = 300) */
static inline long fx(long ss, long n) {
    return (n == 2 && ss == 0) ? 1 : ss;
}

/* ------------------------------------------------------------------ */
/* Per-base z-scores (src/GROM.c:18754-18962; cnv.py detect_del_dup)  */
/* ------------------------------------------------------------------ */

/* dist_vals/dist_off: merged GC-bin depth distributions, flattened —
 * bin (cls, g) occupies dist_vals[dist_off[cls*101+g] : dist_off[...+1]].
 * ave/std: f64[2*101]. Fills stdev_list[lo:hi] (caller pre-zeroed).
 * ranks != 0 → midrank p-value path (-K 1, default); else direct z. */
GN_API void gn_cnv_zscores(long lo, long hi,
                           const int32_t *depth, const int16_t *mq,
                           const int8_t *gc, const int8_t *low_acgt,
                           const int64_t *dist_vals, const int64_t *dist_off,
                           const double *ave, const double *stdv,
                           const double *pv_p, const double *pv_sd,
                           long pv_len, long nb,
                           long min_mapq, double mapq_factor,
                           double dup_thr_factor, int ranks,
                           double *stdev_list) {
    int last_cls = 0;                    /* sticky class (eligible updates) */
    for (long p = lo; p < hi; p++) {
        int hi_mq = mq[p] >= min_mapq;
        int g = gc[p];
        int defz = hi_mq ? 0 : (depth[p] > 0 ? 1 : -1);
        long n_elig = dist_off[(hi_mq ? 0 : nb) + g + 1]
                    - dist_off[(hi_mq ? 0 : nb) + g];
        int eligible = (low_acgt[p] == 0) && (n_elig > 1);
        if (eligible && defz >= 0)
            last_cls = defz;
        int cls = defz >= 0 ? defz : last_cls;
        long k = cls * nb + g;
        long n = dist_off[k + 1] - dist_off[k];
        if (!eligible || n <= 0)
            continue;
        const int64_t *arr = dist_vals + dist_off[k];
        double av = ave[k];
        int64_t d = depth[p];
        double base;
        if (ranks) {
            double di, di2, prob;
            long bi, bi2, pi;
            double sign;
            if ((double)d < av) {
                bi = fx(ub_i64(arr, n, d), n);
                bi2 = fx(lb_i64(arr, n, d), n);
                sign = 1.0;
            } else {
                double clamp = dup_thr_factor * av;
                int64_t key_l = ((double)d > clamp) ? (int64_t)clamp : d;
                bi = n - fx(lb_i64(arr, n, key_l), n);
                bi2 = n - fx(ub_i64(arr, n, d), n);
                sign = -1.0;
            }
            di = bi <= 0 ? 0.5 : (double)bi;
            di2 = bi2 <= 0 ? 0.5 : (double)bi2;
            prob = (di + di2) / (double)(2 * n);
            pi = ub_f64(pv_p, pv_len, prob);
            if (pi < 0)
                pi = 0;
            if (pi > pv_len - 1)
                pi = pv_len - 1;
            base = sign * pv_sd[pi];
        } else {
            double sb = stdv[k];
            if ((double)d < av)
                base = sb != 0.0 ? (av - (double)d) / sb : 0.0;
            else if ((double)d > dup_thr_factor * av)
                base = sb != 0.0 ? (dup_thr_factor - 1.0) * (-av) / sb : 0.0;
            else
                base = sb != 0.0 ? (av - (double)d) / sb : 0.0;
        }
        double w = hi_mq
            ? mapq_factor + (1.0 - mapq_factor)
                            * ((double)(mq[p] - min_mapq)) / 40.0
            : mapq_factor;
        stdev_list[p] = w * base;
    }
}

/* ------------------------------------------------------------------ */
/* Null window model (src/GROM.c:18975-19215; cnv.py _null_window_model) */
/* ------------------------------------------------------------------ */

/* blocks: i64[2*n_blocks] = (start, end) pairs (lowvar blocks).
 * Accumulates into sums[0..maxw] / counts[0..maxw] (caller pre-zeroed).
 * Gate per base: low_acgt == 0 and merged-bin count (direct class) > 1.
 * The per-block carry across sampling phases reproduces the reference's
 * accumulator-reset bug (see cnv.py note). */
GN_API void gn_cnv_null_model(const int64_t *blocks, long n_blocks,
                              const int32_t *depth, const int16_t *mq,
                              const int8_t *gc, const int8_t *low_acgt,
                              const int64_t *dist_off,
                              const double *stdev_list, long nb,
                              long min_mapq, long minw, long maxw,
                              long sampling_rate,
                              double *sums, int64_t *counts) {
    (void)depth;                 /* gate uses mq class + bin counts only */
    for (long b = 0; b < n_blocks; b++) {
        long bs = blocks[2 * b], be = blocks[2 * b + 1];
        long wl0 = 0, cnt0 = 0;
        double tot0 = 0.0;
        for (long phase = 0; phase < sampling_rate; phase++) {
            long adj = phase * maxw / sampling_rate;
            long s = bs + adj;
            while (s < be) {
                long room = maxw - wl0;
                long e = s + room < be ? s + room : be;
                double acc = 0.0;
                long cacc = 0;
                for (long p = s; p < e; p++) {
                    int hi_mq = mq[p] >= min_mapq;
                    long g = gc[p];
                    long k = (hi_mq ? 0 : nb) + g;
                    int gate = (low_acgt[p] == 0)
                        && (dist_off[k + 1] - dist_off[k] > 1);
                    if (gate) {
                        acc += stdev_list[p];
                        cacc += 1;
                    }
                    long len = wl0 + (p - s + 1);
                    if (len >= minw) {
                        long cnt = cnt0 + cacc;
                        if (cnt > 0) {
                            double v = (tot0 + acc) / (double)cnt;
                            sums[len] += v * v;
                            counts[len] += 1;
                        }
                    }
                }
                if (wl0 + (e - s) < maxw) {     /* segment ended mid-window */
                    wl0 += e - s;
                    tot0 += acc;
                    cnt0 += cacc;
                    break;
                }
                wl0 = 0;
                tot0 = 0.0;
                cnt0 = 0;
                s = e;
            }
        }
    }
}

/* ------------------------------------------------------------------ */
/* Window growth scan (src/GROM.c:19358-20035; cnv.py _window_scan)   */
/* ------------------------------------------------------------------ */

/* thr: f64[2*101] per-(class, gc) seed threshold (del_thr for side=+1,
 * dup_thr for side=-1). win_std: f64[maxw+1]. Emits up to cap calls into
 * (starts, ends, sds); returns the total count (caller retries with a
 * larger cap if count > cap). */
GN_API long gn_cnv_scan(long bs, long be0,
                        const int32_t *depth, const int16_t *mq,
                        const int8_t *gc, const int8_t *low_acgt,
                        const int64_t *dist_off,
                        const double *stdev_list, const double *thr,
                        const double *win_std, long nb,
                        long min_mapq, long minw, long maxw, long L,
                        double max_low, int side,
                        int64_t *starts, int64_t *ends, double *sds,
                        long cap) {
    const double min_sd = 3.0;   /* g_one_base_read_depth_min_rd_low_stdev */
    long max_dist = maxw + 500;  /* g_max_distance_since_last_del_good */
    long n_out = 0;
    long be = be0 - minw;
    if (be <= bs)
        return 0;
    int mq_index = 0;            /* outer sticky class (visited positions) */
    long pos = bs;
    while (pos < be) {
        int dc = mq[pos] >= min_mapq ? 0 : (depth[pos] > 0 ? 1 : -1);
        if (dc >= 0)
            mq_index = dc;
        /* seed test: depth vs class threshold */
        double t = thr[mq_index * nb + gc[pos]];
        int sok = side > 0 ? ((double)depth[pos] <= t)
                           : ((double)depth[pos] >= t);
        if (!sok) {
            pos++;
            continue;
        }

        long n = be - pos < maxw ? be - pos : maxw;
        if (n < minw)
            n = minw;

        /* ---- window pass: gated sticky class, inc flags, first fail ---- */
        int wcls = mq_index;
        long f1 = n;
        long lc2 = 0;            /* running count of inc positions */
        double low_total0 = 0.0; /* ALL svals over the first minw window */
        long low_count0 = 0;     /* lowa count over the first minw window */
        int begin = 0, stop_base = 0;
        long c_start = 0, c_end = 0, last_good = 0, temp_pos = pos;
        double c_sd = 0.0;
        double lt = 0.0;         /* grow accumulator (seeded after minw) */
        long lc = 0;
        for (long j = 0; j < n; j++) {
            long p = pos + j;
            int lw = low_acgt[p] == 0;
            if (lw && (mq[p] >= min_mapq || depth[p] > 0))
                wcls = mq[p] >= min_mapq ? 0 : 1;
            double tc = thr[wcls * nb + gc[p]];
            int sw = side > 0 ? ((double)depth[p] <= tc)
                              : ((double)depth[p] >= tc);
            int inc = lw && sw;
            if (!inc && 2 * lc2 < j + 1) {   /* first fail */
                f1 = j;
                break;
            }
            if (inc)
                lc2++;
            double sv = side * stdev_list[p];
            if (j < minw) {
                low_total0 += sv;
                if (lw)
                    low_count0++;
                if (j == minw - 1) {
                    /* first-window check (src/GROM.c:19440-19470) */
                    if (low_count0 > 0 && win_std[minw] > 0.0) {
                        double ts0 = low_total0
                            / ((double)low_count0 * win_std[minw]);
                        if (ts0 >= min_sd
                            && (double)(minw - low_count0) / (double)minw
                               <= max_low) {
                            begin = 1;
                            c_start = pos;
                            last_good = pos + minw;
                            c_end = pos + minw;
                            c_sd = ts0;
                        }
                    }
                    lt = low_total0;
                    lc = low_count0;
                }
            } else {
                /* grow segment (src/GROM.c:19480-19505) */
                if (lw) {
                    lt += sv;
                    lc++;
                }
                long wl = j + 1;
                double ws = win_std[wl];
                double ts = (lc > 0 && ws > 0.0)
                    ? lt / ((double)lc * ws) : 0.0;
                if (inc && ws > 0.0 && ts >= min_sd
                    && (double)(wl - lc) / (double)wl <= max_low) {
                    if (!begin) {
                        begin = 1;
                        c_start = pos;
                    }
                    last_good = p;
                    c_end = p;
                    if (ts > c_sd)
                        c_sd = ts;
                }
            }
        }
        if (f1 < minw) {
            /* stopped inside the first window (src/GROM.c:19420-19435) */
            stop_base = 1;
            temp_pos = pos + f1;
        } else {
            if (f1 < n)
                stop_base = 1;           /* fail inside grow */
            else if (n < maxw)
                stop_base = 1;           /* hit be (src/GROM.c:19504) */
            int mqi = wcls;              /* gated sticky after last processed */

            if (!stop_base && begin) {
                /* ---- slide phase (src/GROM.c:19510-19600) ---- */
                long pa = pos + maxw;
                double s_total = 0.0;
                long s_count = 0;
                int mqb = mqi;
                while (pa < L && (pa - last_good) <= max_dist) {
                    if (pa == pos + maxw) {
                        for (long pb = pa - maxw + 1; pb <= pa; pb++) {
                            if (mq[pb] >= min_mapq)
                                mqb = 0;
                            else if (depth[pb] > 0)
                                mqb = 1;
                            long k = mqb * nb + gc[pb];
                            if (low_acgt[pb] == 0
                                && dist_off[k + 1] - dist_off[k] > 1) {
                                s_total += side * stdev_list[pb];
                                s_count++;
                            }
                        }
                    } else {
                        long pb = pa - maxw;
                        if (mq[pb] >= min_mapq)
                            mqb = 0;
                        else if (depth[pb] > 0)
                            mqb = 1;
                        long kb = mqb * nb + gc[pb];
                        if (low_acgt[pb] == 0
                            && dist_off[kb + 1] - dist_off[kb] > 1) {
                            s_total -= side * stdev_list[pb];
                            s_count--;
                        }
                        if (mq[pa] >= min_mapq)
                            mqi = 0;
                        else if (depth[pa] > 0)
                            mqi = 1;
                        long ka = mqi * nb + gc[pa];
                        if (low_acgt[pa] == 0
                            && dist_off[ka + 1] - dist_off[ka] > 1) {
                            s_total += side * stdev_list[pa];
                            s_count++;
                        }
                    }
                    if (s_count > 0 && win_std[maxw] > 0.0) {
                        double ts = s_total
                            / ((double)s_count * win_std[maxw]);
                        if (ts >= min_sd
                            && (double)(maxw - s_count) / (double)maxw
                               <= max_low) {
                            last_good = pa;
                            c_end = pa;
                            if (ts > c_sd)
                                c_sd = ts;
                        }
                    }
                    pa++;
                }
            }
            if (begin) {
                /* ---- trim phase (src/GROM.c:19585-19660) ---- */
                long p2 = c_end;
                int mqt = mqi;
                while (p2 > c_start + minw) {
                    if (mq[p2] >= min_mapq)
                        mqt = 0;
                    else if (depth[p2] > 0)
                        mqt = 1;
                    double tt = thr[mqt * nb + gc[p2]];
                    int sokt = side > 0 ? ((double)depth[p2] <= tt)
                                        : ((double)depth[p2] >= tt);
                    if (!sokt) {
                        p2--;
                        c_end = p2;
                    } else {
                        long tlc2 = 0, tlc3 = 0;
                        long pa = c_end;
                        int mqa = mqt;
                        int stop_w = 0;
                        while (pa > c_start + minw && !stop_w) {
                            if (low_acgt[pa] == 0) {
                                if (mq[pa] >= min_mapq)
                                    mqa = 0;
                                else if (depth[pa] > 0)
                                    mqa = 1;
                                tlc3++;
                                double ta = thr[mqa * nb + gc[pa]];
                                int soka = side > 0
                                    ? ((double)depth[pa] <= ta)
                                    : ((double)depth[pa] >= ta);
                                if (soka)
                                    tlc2++;
                            }
                            if (tlc3 == 0
                                || (tlc3 > 0
                                    && (double)tlc2 / (double)tlc3 < 0.5)
                                || (double)(c_end - pa + 1 - tlc3)
                                   / ((double)(c_end - pa) + 1.0) > max_low) {
                                c_end = pa - 1;
                                stop_w = 1;
                            }
                            pa--;
                        }
                        p2 = pa;
                    }
                }
                if (n_out < cap) {
                    starts[n_out] = c_start;
                    ends[n_out] = c_end;
                    sds[n_out] = c_sd;
                }
                n_out++;
                pos = c_end + 2;
                continue;
            }
        }
        pos = stop_base ? temp_pos + 1 : pos + 1;
    }
    return n_out;
}
