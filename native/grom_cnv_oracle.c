/* CNV window-growth scan ORACLE — GPL-2-derived (TEST USE ONLY).
 *
 * Direct transliteration of the Python reference port
 * grom_tpu/testing/cnv_oracle.py:window_scan_ref (itself a structural port of
 * the reference's del/dup window scans, src/GROM.c:19358-19700 / :19690-20035;
 * GROM is GPL-2, Smith & Grigoriev).  NOT part of the shipped calling
 * pipeline: bound only by grom_tpu/testing/cnv_oracle.py to speed the
 * differential-test oracle up (tests/test_cnv_scan_equiv.py).  All floating
 * accumulation happens in the same order as the Python port, so results are
 * bit-identical.
 */

#include <stdint.h>

#define GN_API __attribute__((visibility("default")))

enum {
    CP_L = 0, CP_MIN_MAPQ, CP_MINW, CP_MAXW, CP_SIDE, CP_BS, CP_BE0, N_CP
};

/* returns number of calls written, or -1 if cap exceeded (caller falls
 * back to the Python engine) */
GN_API long gn_cnv_window_scan(
    const int64_t *depth, const double *mq, const int64_t *gc,
    const int64_t *nwin /* [2][101] */, const int64_t *low_acgt,
    const double *stdev_list, const double *thr /* [2][101] */,
    const double *win_std /* [maxw+1] */,
    const int64_t *params, const double *dparams /* [max_low, min_sd] */,
    int64_t *out_start, int64_t *out_end, double *out_sd, long cap) {

    const int64_t L = params[CP_L];
    const int64_t min_mapq = params[CP_MIN_MAPQ];
    const int64_t minw = params[CP_MINW];
    const int64_t maxw = params[CP_MAXW];
    const int side = (int)params[CP_SIDE];
    const int64_t bs = params[CP_BS];
    const int64_t be0 = params[CP_BE0];
    const double max_low = dparams[0];
    const double min_sd = dparams[1];
    const int64_t max_dist = maxw + 500;
    long n_out = 0;

#define SEED_OK(p, cls) (side > 0 ? (depth[p] <= thr[(cls) * 101 + gc[p]]) \
                                  : (depth[p] >= thr[(cls) * 101 + gc[p]]))

    const int64_t be = be0 - minw;
    int64_t pos = bs;
    int64_t mq_index = 0, last_low = 0;
    while (pos < be) {
        int stop_base = 0;
        if (mq[pos] >= min_mapq) {
            mq_index = 0;
            last_low = 0;
        } else if (depth[pos] > 0) {
            mq_index = 1;
            last_low = 1;
        } else {
            mq_index = last_low;
        }
        if (SEED_OK(pos, mq_index)) {
            int64_t temp_pos = pos;
            double low_total = 0.0;
            int64_t low_count = 0, low_count2 = 0, wl = 0;
            int begin = 0;
            int64_t c_start = 0, c_end = 0;
            double c_sd = 0.0;
            int64_t last_good = 0;
            int64_t mqi = mq_index;
            for (int64_t pa = pos; pa < pos + minw; pa++) {
                wl += 1;
                if (low_acgt[pa] == 0) {
                    if (mq[pa] >= min_mapq)
                        mqi = 0;
                    else if (depth[pa] > 0)
                        mqi = 1;
                    if (SEED_OK(pa, mqi)) {
                        low_count2 += 1;
                    } else if (2 * low_count2 < wl) {
                        stop_base = 1;
                        temp_pos = pa;
                        break;
                    }
                } else if (2 * low_count2 < wl) {
                    stop_base = 1;
                    temp_pos = pa;
                    break;
                }
            }
            if (!stop_base) {
                low_count = minw;
                low_total = 0.0;
                for (int64_t pa = pos; pa < pos + minw; pa++) {
                    low_count -= low_acgt[pa];
                    low_total += side * stdev_list[pa];
                }
                if (low_count > 0 && win_std[minw] > 0 &&
                    low_total / (low_count * win_std[minw]) >= min_sd &&
                    (double)(minw - low_count) / (double)minw <= max_low) {
                    begin = 1;
                    c_start = pos;
                    last_good = pos + minw;
                    c_end = pos + minw;
                    c_sd = low_total / (low_count * win_std[minw]);
                }
            }
            if (!stop_base) {
                for (int64_t pa = pos + minw; pa < pos + maxw; pa++) {
                    wl += 1;
                    if (pa >= be) {  /* ddd_pos_a >= ddd_end (src/GROM.c:19504) */
                        stop_base = 1;
                        break;
                    }
                    if (low_acgt[pa] == 0) {
                        if (mq[pa] >= min_mapq)
                            mqi = 0;
                        else if (depth[pa] > 0)
                            mqi = 1;
                        low_total += side * stdev_list[pa];
                        low_count += 1;
                        if (SEED_OK(pa, mqi)) {
                            low_count2 += 1;
                            if (win_std[wl] > 0 &&
                                low_total / (low_count * win_std[wl]) >= min_sd &&
                                (double)(wl - low_count) / (double)wl <= max_low) {
                                last_good = pa;
                                if (!begin) {
                                    begin = 1;
                                    c_start = pos;
                                    c_end = pa;
                                    c_sd = low_total / (low_count * win_std[wl]);
                                } else {
                                    double ts = low_total / (low_count * win_std[wl]);
                                    c_end = pa;
                                    if (ts > c_sd)
                                        c_sd = ts;
                                }
                            }
                        } else if (2 * low_count2 < wl) {
                            stop_base = 1;
                            break;
                        }
                    } else if (2 * low_count2 < wl) {
                        stop_base = 1;
                        break;
                    }
                }
            }
            if (!stop_base && begin) {
                /* slide max-window extension (src/GROM.c:19510-19600) */
                int64_t pa = pos + maxw;
                double s_total = 0.0;
                int64_t s_count = 0;
                int64_t mqb = mqi;
                while (pa < L && (pa - last_good) <= max_dist) {
                    if (pa == pos + maxw) {
                        for (int64_t pb = pa - maxw + 1; pb <= pa; pb++) {
                            if (mq[pb] >= min_mapq)
                                mqb = 0;
                            else if (depth[pb] > 0)
                                mqb = 1;
                            if (low_acgt[pb] == 0 && nwin[mqb * 101 + gc[pb]] > 1) {
                                s_total += side * stdev_list[pb];
                                s_count += 1;
                            }
                        }
                    } else {
                        int64_t pb = pa - maxw;
                        if (mq[pb] >= min_mapq)
                            mqb = 0;
                        else if (depth[pb] > 0)
                            mqb = 1;
                        if (low_acgt[pb] == 0 && nwin[mqb * 101 + gc[pb]] > 1) {
                            s_total -= side * stdev_list[pb];
                            s_count -= 1;
                        }
                        if (mq[pa] >= min_mapq)
                            mqi = 0;
                        else if (depth[pa] > 0)
                            mqi = 1;
                        if (low_acgt[pa] == 0 && nwin[mqi * 101 + gc[pa]] > 1) {
                            s_total += side * stdev_list[pa];
                            s_count += 1;
                        }
                    }
                    if (s_count > 0 && win_std[maxw] > 0 &&
                        s_total / (s_count * win_std[maxw]) >= min_sd &&
                        (double)(maxw - s_count) / (double)maxw <= max_low) {
                        last_good = pa;
                        c_end = pa;
                        double ts = s_total / (s_count * win_std[maxw]);
                        if (ts > c_sd)
                            c_sd = ts;
                    }
                    pa += 1;
                }
            }
            if (begin) {
                /* trailing trim (src/GROM.c:19585-19660) */
                pos = c_end;
                while (pos > c_start + minw) {
                    if (mq[pos] >= min_mapq)
                        mqi = 0;
                    else if (depth[pos] > 0)
                        mqi = 1;
                    if (!SEED_OK(pos, mqi)) {
                        pos -= 1;
                        c_end = pos;
                    } else {
                        int64_t lc2 = 0, lc3 = 0;
                        int64_t pa = c_end;
                        int64_t mqa = mqi;
                        int stop_w = 0;
                        while (pa > c_start + minw && !stop_w) {
                            if (low_acgt[pa] == 0) {
                                if (mq[pa] >= min_mapq)
                                    mqa = 0;
                                else if (depth[pa] > 0)
                                    mqa = 1;
                                lc3 += 1;
                                if (SEED_OK(pa, mqa))
                                    lc2 += 1;
                            }
                            if (lc3 == 0 ||
                                (lc3 > 0 && (double)lc2 / (double)lc3 < 0.5) ||
                                (double)(c_end - pa + 1 - lc3) /
                                    ((double)(c_end - pa) + 1.0) > max_low) {
                                c_end = pa - 1;
                                stop_w = 1;
                            }
                            pa -= 1;
                        }
                        pos = pa;
                    }
                }
                pos = c_end + 1;
                if (n_out >= cap)
                    return -1;
                out_start[n_out] = c_start;
                out_end[n_out] = c_end;
                out_sd[n_out] = c_sd;
                n_out++;
            } else if (stop_base) {
                pos = temp_pos;
            }
        }
        pos += 1;
    }
    return n_out;
}
