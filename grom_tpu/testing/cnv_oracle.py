"""CNV window-scan ORACLE — GPL-2-derived reference port (TEST USE ONLY).

Provenance: ``window_scan_ref`` is a deliberate, labeled structural port of
the reference's del/dup window-growth scans (src/GROM.c:19358-19700 del,
:19690-20035 dup; GROM is GPL-2, Smith & Grigoriev, src/GROM.c:3).  It is
kept exclusively as the differential-test oracle for the production
vectorized scan (grom_tpu/call/cnv.py:_window_scan) and the device scan; it
is never imported by the shipped calling pipeline.  ``window_scan_native``
binds the equally-derived C transliteration (native/grom_cnv_oracle.c) used
to speed the oracle up on large differential tests.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from grom_tpu.call.cnv import CnvCall


_oracle_lib = None
_oracle_tried = False


def _get_oracle_lib():
    """The TEST-ONLY oracle library (native/_grom_test_oracle.so), built on
    demand. Kept out of the production _grom_native.so so no GPL-derived
    object code ships in the production engine (see module header)."""
    global _oracle_lib, _oracle_tried
    if _oracle_lib is not None or _oracle_tried:
        return _oracle_lib
    _oracle_tried = True
    import ctypes
    import os
    import subprocess
    src_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
    so = os.path.join(src_dir, "_grom_test_oracle.so")
    src = os.path.join(src_dir, "grom_cnv_oracle.c")
    if not os.path.exists(src):
        return None
    if not (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        try:
            r = subprocess.run(["make", "-C", src_dir, "-s", "oracle"],
                               capture_output=True, timeout=120)
            if r.returncode != 0 or not os.path.exists(so):
                return None
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        P = ctypes.c_void_p
        lib.gn_cnv_window_scan.restype = ctypes.c_long
        lib.gn_cnv_window_scan.argtypes = [P] * 13 + [ctypes.c_long]
        _oracle_lib = lib
    except OSError:
        _oracle_lib = None
    return _oracle_lib


def window_scan_native(blocks, depth, mq, gc, nwin, low_acgt, stdev_list,
                        thr, win_std, cfg, L, side: int
                        ) -> Optional[List[CnvCall]]:
    """Native C scan (native/grom_cnv_oracle.c), bit-identical to
    :func:`window_scan_ref`. None when unavailable."""
    import ctypes

    lib = _get_oracle_lib()
    if lib is None:
        return None
    holds = []

    def p(a, dt):
        a = np.ascontiguousarray(a, dt)
        holds.append(a)
        return a.ctypes.data_as(ctypes.c_void_p)

    cap = 1 << 16
    out_s = np.empty(cap, np.int64)
    out_e = np.empty(cap, np.int64)
    out_sd = np.empty(cap, np.float64)
    calls: List[CnvCall] = []
    for (bs, be0) in blocks:
        params = np.array([L, cfg.min_mapq, cfg.min_rd_window_len,
                           cfg.max_rd_window_len, side, bs, be0], np.int64)
        dparams = np.array([cfg.max_rd_low_acgt_or_windows, 3.0], np.float64)
        n = lib.gn_cnv_window_scan(
            p(depth, np.int64), p(mq, np.float64), p(gc, np.int64),
            p(nwin, np.int64), p(low_acgt, np.int64),
            p(stdev_list, np.float64), p(thr, np.float64),
            p(win_std, np.float64),
            params.ctypes.data_as(ctypes.c_void_p),
            dparams.ctypes.data_as(ctypes.c_void_p),
            out_s.ctypes.data_as(ctypes.c_void_p),
            out_e.ctypes.data_as(ctypes.c_void_p),
            out_sd.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(cap))
        if n < 0:
            return None
        calls.extend(CnvCall(int(out_s[i]), int(out_e[i]), float(out_sd[i]))
                     for i in range(n))
    return calls


def window_scan_ref(blocks, depth, mq, gc, nwin, low_acgt, stdev_list,
                     thr, win_std, cfg, L, side: int) -> List[CnvCall]:
    """The del (side=+1) / dup (side=-1) window growth scan, direct port
    (src/GROM.c:19358-19700 del, :19690-20035 dup). ``thr`` is the per
    (class, gc) threshold; z totals are accumulated as side*z. Kept as the
    differential-test oracle for the vectorized :func:`_window_scan`."""
    minw = cfg.min_rd_window_len
    maxw = cfg.max_rd_window_len
    min_sd = 3.0  # g_one_base_read_depth_min_rd_low_stdev
    max_low = cfg.max_rd_low_acgt_or_windows
    max_dist = maxw + 500  # g_max_distance_since_last_del_good
    out: List[CnvCall] = []

    def seed_thr_ok(p, cls):
        d = depth[p]
        if side > 0:
            return d <= thr[cls, gc[p]]
        return d >= thr[cls, gc[p]]

    for (bs, be0) in blocks:
        be = be0 - minw
        pos = bs
        mq_index = 0
        last_low = 0
        while pos < be:
            stop_base = False
            if mq[pos] >= cfg.min_mapq:
                mq_index = 0
                last_low = 0
            elif depth[pos] > 0:
                mq_index = 1
                last_low = 1
            else:
                mq_index = last_low
            if seed_thr_ok(pos, mq_index):
                temp_pos = pos
                low_total = 0.0
                low_count = 0
                low_count2 = 0
                wl = 0
                begin = False
                c_start = c_end = 0
                c_sd = 0.0
                last_good = 0
                mqi = mq_index
                for pa in range(pos, pos + minw):
                    wl += 1
                    if low_acgt[pa] == 0:
                        if mq[pa] >= cfg.min_mapq:
                            mqi = 0
                        elif depth[pa] > 0:
                            mqi = 1
                        if seed_thr_ok(pa, mqi):
                            low_count2 += 1
                        elif 2 * low_count2 < wl:
                            stop_base = True
                            temp_pos = pa
                            break
                    elif 2 * low_count2 < wl:
                        stop_base = True
                        temp_pos = pa
                        break
                if not stop_base:
                    low_count = minw
                    low_total = 0.0
                    for pa in range(pos, pos + minw):
                        low_count -= low_acgt[pa]
                        low_total += side * stdev_list[pa]
                    if (low_count > 0 and win_std[minw] > 0
                            and low_total / (low_count * win_std[minw]) >= min_sd
                            and (minw - low_count) / minw <= max_low):
                        begin = True
                        c_start = pos
                        last_good = pos + minw
                        c_end = pos + minw
                        c_sd = low_total / (low_count * win_std[minw])
                if not stop_base:
                    for pa in range(pos + minw, pos + maxw):
                        wl += 1
                        if pa >= be:  # ddd_pos_a >= ddd_end (src/GROM.c:19504)
                            stop_base = True
                            break
                        if low_acgt[pa] == 0:
                            if mq[pa] >= cfg.min_mapq:
                                mqi = 0
                            elif depth[pa] > 0:
                                mqi = 1
                            low_total += side * stdev_list[pa]
                            low_count += 1
                            if seed_thr_ok(pa, mqi):
                                low_count2 += 1
                                if (win_std[wl] > 0
                                        and low_total / (low_count * win_std[wl]) >= min_sd
                                        and (wl - low_count) / wl <= max_low):
                                    last_good = pa
                                    if not begin:
                                        begin = True
                                        c_start = pos
                                        c_end = pa
                                        c_sd = low_total / (low_count * win_std[wl])
                                    else:
                                        ts = low_total / (low_count * win_std[wl])
                                        c_end = pa
                                        if ts > c_sd:
                                            c_sd = ts
                            elif 2 * low_count2 < wl:
                                stop_base = True
                                break
                        elif 2 * low_count2 < wl:
                            stop_base = True
                            break
                if not stop_base and begin:
                    # slide max-window extension (src/GROM.c:19510-19600)
                    pa = pos + maxw
                    s_total = 0.0
                    s_count = 0
                    mqb = mqi
                    while pa < L and (pa - last_good) <= max_dist:
                        if pa == pos + maxw:
                            for pb in range(pa - maxw + 1, pa + 1):
                                if mq[pb] >= cfg.min_mapq:
                                    mqb = 0
                                elif depth[pb] > 0:
                                    mqb = 1
                                if low_acgt[pb] == 0 and nwin[mqb, gc[pb]] > 1:
                                    s_total += side * stdev_list[pb]
                                    s_count += 1
                        else:
                            pb = pa - maxw
                            if mq[pb] >= cfg.min_mapq:
                                mqb = 0
                            elif depth[pb] > 0:
                                mqb = 1
                            if low_acgt[pb] == 0 and nwin[mqb, gc[pb]] > 1:
                                s_total -= side * stdev_list[pb]
                                s_count -= 1
                            if mq[pa] >= cfg.min_mapq:
                                mqi = 0
                            elif depth[pa] > 0:
                                mqi = 1
                            if low_acgt[pa] == 0 and nwin[mqi, gc[pa]] > 1:
                                s_total += side * stdev_list[pa]
                                s_count += 1
                        if (s_count > 0 and win_std[maxw] > 0
                                and s_total / (s_count * win_std[maxw]) >= min_sd
                                and (maxw - s_count) / maxw <= max_low):
                            last_good = pa
                            c_end = pa
                            ts = s_total / (s_count * win_std[maxw])
                            if ts > c_sd:
                                c_sd = ts
                        pa += 1
                if begin:
                    # trailing trim (src/GROM.c:19585-19660)
                    pos = c_end
                    while pos > c_start + minw:
                        if mq[pos] >= cfg.min_mapq:
                            mqi = 0
                        elif depth[pos] > 0:
                            mqi = 1
                        if not seed_thr_ok(pos, mqi):
                            pos -= 1
                            c_end = pos
                        else:
                            lc2 = 0
                            lc3 = 0
                            pa = c_end
                            mqa = mqi
                            stop_w = False
                            while pa > c_start + minw and not stop_w:
                                if low_acgt[pa] == 0:
                                    if mq[pa] >= cfg.min_mapq:
                                        mqa = 0
                                    elif depth[pa] > 0:
                                        mqa = 1
                                    lc3 += 1
                                    if seed_thr_ok(pa, mqa):
                                        lc2 += 1
                                if (lc3 == 0 or (lc3 > 0 and lc2 / lc3 < 0.5)
                                        or (c_end - pa + 1 - lc3) / (c_end - pa + 1.0) > max_low):
                                    c_end = pa - 1
                                    stop_w = True
                                pa -= 1
                            pos = pa
                    pos = c_end + 1
                    out.append(CnvCall(c_start, c_end, c_sd))
                elif stop_base:
                    pos = temp_pos
            pos += 1
    return out
