/* grom_tpu native evidence-deposit engine.
 *
 * Native fast path for grom_tpu/call/deposits.py:run_deposits — the per-read
 * evidence deposit pass (the reference's read loop, src/GROM.c:6408-11085).
 * Semantics are defined by the Python implementation (which carries the
 * src/GROM.c citations for every branch); this file must replay it exactly —
 * a differential test (tests/test_native_deposits.py) checks bit equality of
 * every dense array and every typed primary/other-slot.
 *
 * Design: reads arrive coordinate-sorted; all typed deposits for a read at
 * position p land within [p - back, p + fwd] (back ~ insert_max + 2*lseq,
 * fwd ~ insert_max + max cigar ref-span).  Typed per-position state lives in
 * a power-of-two ring of `pstate` entries; positions that fall behind the
 * window are emitted to growable output vectors and recycled.  Dense
 * (commutative) accumulators are written straight into caller-provided
 * int64 numpy buffers, span types as ±diffs with a final in-place prefix sum.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>

#define GN_API __attribute__((visibility("default")))

/* typed evidence ids (deposits.py E_*) */
enum {
    E_DEL_F = 1, E_DEL_R, E_DUP_F, E_DUP_R,
    E_INV_F1, E_INV_R1, E_INV_F2, E_INV_R2,
    E_CTX_F, E_CTX_R,
    E_INDEL_I, E_INDEL_D_F, E_INDEL_D_R,
    N_ETYPE = 13
};
#define IS_EXACT(t) ((t) == E_INDEL_I || (t) == E_INDEL_D_F || (t) == E_INDEL_D_R)
#define IS_CTX(t) ((t) == E_CTX_F || (t) == E_CTX_R)

/* range modes */
enum { RM_END = 0, RM_MINMAX = 1, RM_MAX = 2 };

/* BAM flags */
#define FPAIRED 1
#define FREVERSE 16
#define FMREVERSE 32
#define FMUNMAP 8

/* cigar ops */
#define CMATCH 0
#define CINS 1
#define CDEL 2
#define CREF_SKIP 3
#define CSOFT_CLIP 4
#define CEQUAL 7
#define CDIFF 8

#define MAX_SLOTS 50

#define SEQ_INLINE_CAP 64

typedef struct {
    int64_t gen;                 /* absolute position, -1 = free */
    uint32_t touched;            /* bit (1<<etype) set once primary exists */
    int32_t other_head, other_tail, other_n;
    int32_t p_count[N_ETYPE + 1];
    double p_dist[N_ETYPE + 1];
    int64_t p_rs[N_ETYPE + 1], p_re[N_ETYPE + 1];
    int32_t p_mchr[N_ETYPE + 1];
    int32_t seq_len;                     /* E_INDEL_I first-set sequence */
    uint8_t seq_bytes[SEQ_INLINE_CAP];   /* copied inline at deposit time */
} pstate;

typedef struct {
    int32_t next;
    int32_t type;
    int32_t count;
    double dist;
    int64_t rs, re;
    int32_t mchr;
} oslot;

typedef struct {
    long n_prim, n_other;
    int64_t *prim_pos;
    int32_t *prim_etype, *prim_count;
    double *prim_dist;
    int64_t *prim_rs, *prim_re;
    int32_t *prim_mchr;
    uint8_t *seq_arena;                  /* E_INDEL_I inserted sequences */
    int32_t *prim_seq_off, *prim_seq_len; /* offsets into seq_arena; -1 none */
    int64_t *oth_pos;
    int32_t *oth_type, *oth_count;
    double *oth_dist;
    int64_t *oth_rs, *oth_re;
    int32_t *oth_mchr;
} gn_dep_out;

typedef struct {
    /* ring */
    pstate *ring;
    int64_t wmask;               /* ring size - 1 */
    int64_t flushed;             /* lowest abs position still live */
    /* slot pool */
    oslot *pool;
    long pool_n, pool_cap;
    /* outputs */
    gn_dep_out *out;
    long prim_cap, oth_cap;
    int err;
    /* streaming-session state (gn_deposits_init/feed/finish) */
    int64_t L, im, imin, imean, sc_min, min_mapq;
    int64_t max_split_loss, min_sr_len, read_len, indel_i_cap;
    int splitread;
    int32_t refid;
    double tol_base;
    int32_t **dense;
    int64_t back, max_lseq_cap, max_ref_span_cap;
    int64_t prev_pos;            /* cross-feed sortedness check */
    long seq_cap;                /* current out's seq_arena capacity */
    long seq_used;
    /* windowed dense mode (gn_deposits_init_stream): dense channels live in
     * position rings of dspan entries instead of whole-chromosome buffers;
     * gn_deposits_drain exports+recycles [drained_to, upto) incrementally */
    int windowed;
    int64_t dmask;               /* ring mask; legacy mode: all-ones (x&m==x) */
    int64_t dense_lo, dense_hi;  /* valid write window [lo, hi) */
    int64_t drained_to;
    int64_t span_carry[5];       /* committed prefix-sum carry per span chan */
    int32_t *dblock;             /* backing block for windowed channels */
    int32_t **dense_owned;       /* channel-pointer table owned by engine */
    int32_t scratch;             /* dump target for out-of-window writes */
} engine;

static int grow_prim(engine *e) {
    long c = e->prim_cap ? e->prim_cap * 2 : 4096;
    gn_dep_out *o = e->out;
#define GP(f, T) { void *p = realloc(o->f, (size_t)c * sizeof(T)); if (!p) return -1; o->f = (T *)p; }
    GP(prim_pos, int64_t) GP(prim_etype, int32_t) GP(prim_count, int32_t)
    GP(prim_dist, double) GP(prim_rs, int64_t) GP(prim_re, int64_t)
    GP(prim_mchr, int32_t) GP(prim_seq_off, int32_t) GP(prim_seq_len, int32_t)
#undef GP
    e->prim_cap = c;
    return 0;
}

static int grow_seq(engine *e, long need) {
    long c = e->seq_cap ? e->seq_cap : 4096;
    while (c < e->seq_used + need)
        c *= 2;
    if (c != e->seq_cap) {
        void *p = realloc(e->out->seq_arena, (size_t)c);
        if (!p)
            return -1;
        e->out->seq_arena = (uint8_t *)p;
        e->seq_cap = c;
    }
    return 0;
}

static int grow_oth(engine *e) {
    long c = e->oth_cap ? e->oth_cap * 2 : 4096;
    gn_dep_out *o = e->out;
#define GO(f, T) { void *p = realloc(o->f, (size_t)c * sizeof(T)); if (!p) return -1; o->f = (T *)p; }
    GO(oth_pos, int64_t) GO(oth_type, int32_t) GO(oth_count, int32_t)
    GO(oth_dist, double) GO(oth_rs, int64_t) GO(oth_re, int64_t)
    GO(oth_mchr, int32_t)
#undef GO
    e->oth_cap = c;
    return 0;
}

static pstate *get_ps(engine *e, int64_t p) {
    if (p < e->flushed || p > e->flushed + e->wmask) {
        e->err = 1;              /* outside window: caller falls back */
        return NULL;
    }
    pstate *ps = &e->ring[p & e->wmask];
    if (ps->gen != p) {
        ps->gen = p;
        ps->touched = 0;
        ps->other_head = ps->other_tail = -1;
        ps->other_n = 0;
        ps->seq_len = -1;
    }
    return ps;
}

/* dense-channel write target: window-checked ring slot (windowed mode) or
 * the whole-chromosome buffer (legacy: dmask all-ones, window [0, L+1)) */
static inline int32_t *dptr(engine *e, int ch, int64_t x) {
    if (x < e->dense_lo || x >= e->dense_hi) {
        e->err = 3;
        return &e->scratch;
    }
    return &e->dense[ch][x & e->dmask];
}

/* ensure primary entry exists (deposits.py EvidenceState.get_primary) */
static void touch_primary(pstate *ps, int t) {
    if (!(ps->touched & (1u << t))) {
        ps->touched |= (1u << t);
        ps->p_count[t] = 0;
        ps->p_dist[t] = 0.0;
        ps->p_rs[t] = 0;
        ps->p_re[t] = 0;
        ps->p_mchr[t] = 0;
    }
}

static double tol_of(double tol_base, int32_t count) {
    if (count == 0)
        return INFINITY;
    return tol_base * (1.0 + 1.0 / (double)count);
}

/* deposits.py:deposit_typed — one typed deposit with primary/other-slot
 * semantics (running means, dominant swap, 50-slot cap). */
static void deposit_typed(engine *e, int etype, int64_t pos, double dist,
                          int32_t add, double addf, int64_t range_val,
                          int range_mode, int32_t mchr, double tol_base,
                          const uint8_t *seqp, int64_t seq_len) {
    pstate *ps = get_ps(e, pos);
    if (!ps)
        return;
    touch_primary(ps, etype);
    int exact = IS_EXACT(etype);
    int isctx = IS_CTX(etype);

    int32_t *pc = &ps->p_count[etype];
    double *pd = &ps->p_dist[etype];
    int64_t *prs = &ps->p_rs[etype], *pre = &ps->p_re[etype];
    int32_t *pm = &ps->p_mchr[etype];

    if (*pc == 0) {
        /* first-set (also after zero-weight deposits) */
        *pc = add;
        *pd = dist;
        *prs = range_val;
        *pre = range_val;
        *pm = mchr;
        if (etype == E_INDEL_I && seqp && seq_len <= SEQ_INLINE_CAP) {
            memcpy(ps->seq_bytes, seqp, (size_t)seq_len);
            ps->seq_len = (int32_t)seq_len;
        }
        return;
    }
    int match;
    if (exact) {
        match = (dist == *pd);
    } else if (isctx) {
        if (*pm != mchr)
            match = 0;
        else if (dist >= 0)
            match = (*pd > 0 && fabs(*pd - dist) <= tol_of(tol_base, *pc));
        else
            match = (*pd < 0 && fabs(fabs(*pd) - (-dist)) <= tol_of(tol_base, *pc));
    } else {
        match = (fabs(*pd - dist) <= tol_of(tol_base, *pc));
    }
    if (match) {
        *pc += add;
        if (!exact && *pc)
            *pd += addf * (dist - *pd) / (double)*pc;
        if (range_mode == RM_END) {
            *pre = range_val;
        } else if (range_mode == RM_MAX) {
            if (range_val > *pre)
                *pre = range_val;
        } else {
            if (range_val < *prs)
                *prs = range_val;
            if (range_val > *pre)
                *pre = range_val;
        }
        return;
    }

    /* other-slot path */
    int found = 0;
    for (int32_t si = ps->other_head; si >= 0; si = e->pool[si].next) {
        oslot *s = &e->pool[si];
        if (s->type != etype)
            continue;
        int ok;
        if (exact) {
            ok = (dist == (double)((int64_t)(s->dist + 0.5)));
        } else if (isctx) {
            if (dist >= 0)
                ok = (s->mchr == mchr && s->dist > 0 &&
                      fabs(s->dist - dist) <= tol_of(tol_base, s->count));
            else
                ok = (s->mchr == mchr && s->dist < 0 &&
                      fabs(fabs(s->dist) - (-dist)) <= tol_of(tol_base, s->count));
        } else {
            ok = (fabs(s->dist - dist) <= tol_of(tol_base, s->count));
        }
        if (!ok)
            continue;
        found = 1;
        s->count += add;
        if (!exact && s->count)
            s->dist += addf * (dist - s->dist) / (double)s->count;
        if (range_mode == RM_END) {
            s->re = range_val;
        } else if (range_mode == RM_MAX) {
            if (range_val > s->re)
                s->re = range_val;
        } else {
            if (range_val < s->rs)
                s->rs = range_val;
            if (range_val > s->re)
                s->re = range_val;
        }
        if (s->count > *pc) {
            /* dominant swap: slot takes old primary verbatim; primary takes
             * the slot's dist rounded to int for exact-keyed types
             * (src/GROM.c:7315-7322 uint32 cast) */
            double new_p_dist = exact ? (double)((int64_t)(s->dist + 0.5)) : s->dist;
            int32_t sc = s->count, sm = s->mchr;
            int64_t srs = s->rs, sre = s->re;
            s->count = *pc;
            s->dist = *pd;
            s->rs = *prs;
            s->re = *pre;
            s->mchr = *pm;
            *pc = sc;
            *pd = new_p_dist;
            *prs = srs;
            *pre = sre;
            *pm = sm;
        }
        break;
    }
    if (!found) {
        if (ps->other_n < MAX_SLOTS) {
            if (e->pool_n == e->pool_cap) {
                long c = e->pool_cap ? e->pool_cap * 2 : 65536;
                void *p = realloc(e->pool, (size_t)c * sizeof(oslot));
                if (!p) {
                    e->err = 2;
                    return;
                }
                e->pool = (oslot *)p;
                e->pool_cap = c;
            }
            int32_t si = (int32_t)e->pool_n++;
            oslot *s = &e->pool[si];
            s->next = -1;
            s->type = etype;
            s->count = add;
            s->dist = dist;
            s->rs = range_val;
            s->re = range_val;
            s->mchr = mchr;
            if (ps->other_tail >= 0)
                e->pool[ps->other_tail].next = si;
            else
                ps->other_head = si;
            ps->other_tail = si;
            ps->other_n++;
        } else {
            for (int32_t si = ps->other_head; si >= 0; si = e->pool[si].next) {
                oslot *s = &e->pool[si];
                if (s->count <= add) {
                    s->count = add;
                    s->type = etype;
                    s->dist = dist;
                    s->rs = range_val;
                    s->re = range_val;
                    s->mchr = mchr;
                    break;
                }
            }
        }
    }
}

/* emit + recycle every live position < upto */
static void flush_to(engine *e, int64_t upto) {
    gn_dep_out *o = e->out;
    for (int64_t p = e->flushed; p < upto; p++) {
        pstate *ps = &e->ring[p & e->wmask];
        if (ps->gen != p)
            continue;
        for (int t = 1; t <= N_ETYPE; t++) {
            if (!(ps->touched & (1u << t)))
                continue;
            if (o->n_prim == e->prim_cap && grow_prim(e)) {
                e->err = 2;
                return;
            }
            long i = o->n_prim++;
            o->prim_pos[i] = p;
            o->prim_etype[i] = t;
            o->prim_count[i] = ps->p_count[t];
            o->prim_dist[i] = ps->p_dist[t];
            o->prim_rs[i] = ps->p_rs[t];
            o->prim_re[i] = ps->p_re[t];
            o->prim_mchr[i] = ps->p_mchr[t];
            if (t == E_INDEL_I && ps->seq_len >= 0) {
                if (grow_seq(e, ps->seq_len)) {
                    e->err = 2;
                    return;
                }
                memcpy(o->seq_arena + e->seq_used, ps->seq_bytes,
                       (size_t)ps->seq_len);
                o->prim_seq_off[i] = (int32_t)e->seq_used;
                o->prim_seq_len[i] = ps->seq_len;
                e->seq_used += ps->seq_len;
            } else {
                o->prim_seq_off[i] = o->prim_seq_len[i] = -1;
            }
        }
        for (int32_t si = ps->other_head; si >= 0; si = e->pool[si].next) {
            oslot *s = &e->pool[si];
            if (o->n_other == e->oth_cap && grow_oth(e)) {
                e->err = 2;
                return;
            }
            long i = o->n_other++;
            o->oth_pos[i] = p;
            o->oth_type[i] = s->type;
            o->oth_count[i] = s->count;
            o->oth_dist[i] = s->dist;
            o->oth_rs[i] = s->rs;
            o->oth_re[i] = s->re;
            o->oth_mchr[i] = s->mchr;
        }
        ps->gen = -1;
    }
    if (upto > e->flushed)
        e->flushed = upto;
}

/* dense array indices (binding order in grom_tpu/native/__init__.py) */
enum {
    D_RD = 0, D_CONC, D_INS, D_MF, D_MR,       /* span diffs, cumsummed */
    D_SC_LEFT, D_SC_RIGHT, D_SC_LEFT_RD, D_SC_RIGHT_RD, D_SC_RD,
    D_CTX_SC_LEFT, D_CTX_SC_RIGHT, D_CTX_SC_LEFT_RD, D_CTX_SC_RIGHT_RD,
    D_CTX_SC_RD,
    D_INDEL_SC_LEFT, D_INDEL_SC_RIGHT, D_INDEL_SC_LEFT_RD,
    D_INDEL_SC_RIGHT_RD, D_INDEL_SC_RD,
    D_INDEL_D_F_RD, D_INDEL_D_R_RD,
    N_DENSE
};

static inline void span_diff(engine *e, int ch, int64_t s, int64_t ec,
                             int32_t w) {
    int64_t s0 = s < 0 ? 0 : s;
    int64_t e0 = ec > e->L ? e->L : ec;
    if (e0 > s0) {
        *dptr(e, ch, s0) += w;
        *dptr(e, ch, e0) -= w;
    }
}

GN_API void gn_deposits_free(gn_dep_out *o) {
    if (!o)
        return;
    free(o->prim_pos);
    free(o->prim_etype);
    free(o->prim_count);
    free(o->prim_dist);
    free(o->prim_rs);
    free(o->prim_re);
    free(o->prim_mchr);
    free(o->seq_arena);
    free(o->prim_seq_off);
    free(o->prim_seq_len);
    free(o->oth_pos);
    free(o->oth_type);
    free(o->oth_count);
    free(o->oth_dist);
    free(o->oth_rs);
    free(o->oth_re);
    free(o->oth_mchr);
    free(o);
}

/* params_i layout */
enum {
    PI_CHROM_LEN = 0, PI_IM, PI_IMIN, PI_IMEAN, PI_SC_MIN, PI_MIN_MAPQ,
    PI_MAX_SPLIT_LOSS, PI_MIN_SR_LEN, PI_READ_LEN, PI_INDEL_I_CAP,
    PI_SPLITREAD, PI_REFID, N_PI
};

/* returns 0 on success; 1 = window overflow / unsorted input (caller must
 * fall back to the Python path); 2 = allocation failure */
/* ---- streaming session API ------------------------------------------
 * gn_deposits_init allocates a session whose pstate ring covers reads with
 * lseq <= max_lseq and cigar ref-span <= max_ref_span; gn_deposits_feed
 * replays one coordinate-sorted chunk of reads (chunks must arrive in
 * position order); gn_deposits_finish flushes, prefix-sums the span-diff
 * dense channels and hands the sparse outputs over. gn_deposits_run is the
 * single-shot wrapper. */

GN_API void *gn_deposits_init(
    const int64_t *params_i, const double *params_d, int32_t **dense,
    int64_t max_lseq, int64_t max_ref_span) {

    engine *e = (engine *)calloc(1, sizeof(engine));
    if (!e)
        return NULL;
    e->L = params_i[PI_CHROM_LEN];
    e->im = params_i[PI_IM];
    e->imin = params_i[PI_IMIN];
    e->imean = params_i[PI_IMEAN];
    e->sc_min = params_i[PI_SC_MIN];
    e->min_mapq = params_i[PI_MIN_MAPQ];
    e->max_split_loss = params_i[PI_MAX_SPLIT_LOSS];
    e->min_sr_len = params_i[PI_MIN_SR_LEN];
    e->read_len = params_i[PI_READ_LEN];
    e->indel_i_cap = params_i[PI_INDEL_I_CAP];
    e->splitread = (int)params_i[PI_SPLITREAD];
    e->refid = (int32_t)params_i[PI_REFID];
    e->tol_base = params_d[0];
    e->dense = dense;
    e->max_lseq_cap = max_lseq;
    e->max_ref_span_cap = max_ref_span;
    e->prev_pos = -1;
    /* legacy whole-chromosome dense mode: identity ring, window [0, L+1) */
    e->windowed = 0;
    e->dmask = -1;                  /* all-ones: x & dmask == x */
    e->dense_lo = 0;
    e->dense_hi = e->L + 1;
    e->drained_to = 0;

    int64_t back = e->im + 2 * max_lseq + 64;
    int64_t fwd = e->im + max_lseq + max_ref_span + 64;
    e->back = back;
    int64_t W = 1;
    while (W < back + fwd + 2)
        W <<= 1;
    e->ring = (pstate *)malloc((size_t)W * sizeof(pstate));
    if (!e->ring) {
        free(e);
        return NULL;
    }
    for (int64_t i = 0; i < W; i++)
        e->ring[i].gen = -1;
    e->wmask = W - 1;
    e->flushed = 0;
    e->out = (gn_dep_out *)calloc(1, sizeof(gn_dep_out));
    if (!e->out) {
        free(e->ring);
        free(e);
        return NULL;
    }
    return e;
}

GN_API void gn_deposits_abort(void *h) {
    engine *e = (engine *)h;
    if (!e)
        return;
    free(e->ring);
    free(e->pool);
    free(e->dblock);
    free(e->dense_owned);
    gn_deposits_free(e->out);
    free(e);
}

/* Streaming-session init with WINDOWED dense channels: instead of 22
 * caller-provided whole-chromosome buffers, the dense accumulators live in
 * internal position rings of `dspan` (power of two) entries each, and
 * gn_deposits_drain exports+recycles finalized ranges incrementally.  This
 * is the memory-bounding mode: peak dense memory is 22 * dspan * 4 bytes
 * regardless of chromosome length — the chunk-granular re-expression of the
 * reference's sliding half-shift window (src/GROM.c:5846-6402). */
GN_API void *gn_deposits_init_stream(
    const int64_t *params_i, const double *params_d,
    int64_t max_lseq, int64_t max_ref_span, int64_t dspan) {

    if (dspan <= 0 || (dspan & (dspan - 1)) != 0)
        return NULL;
    int32_t **chans = (int32_t **)malloc(N_DENSE * sizeof(int32_t *));
    if (!chans)
        return NULL;
    int32_t *block = (int32_t *)calloc((size_t)N_DENSE * (size_t)dspan,
                                       sizeof(int32_t));
    if (!block) {
        free(chans);
        return NULL;
    }
    for (int d = 0; d < N_DENSE; d++)
        chans[d] = block + (size_t)d * (size_t)dspan;
    engine *e = (engine *)gn_deposits_init(params_i, params_d, chans,
                                           max_lseq, max_ref_span);
    if (!e) {
        free(block);
        free(chans);
        return NULL;
    }
    /* window must cover back-reach + forward-reach beyond any undrained
     * span; the caller is responsible for draining often enough */
    if (dspan < e->back + (e->im + max_lseq + max_ref_span + 64) + 2) {
        gn_deposits_abort(e);
        free(block);
        free(chans);
        return NULL;
    }
    e->windowed = 1;
    e->dmask = dspan - 1;
    e->dense_lo = 0;
    e->dense_hi = dspan;
    e->dblock = block;
    e->dense_owned = chans;
    return e;
}

/* Export finalized state for [drained_to, upto): hands over the typed
 * evidence flushed so far (entries are position-ascending; a suffix may
 * reach beyond `upto` — the caller splits) and, in windowed mode, fills the
 * caller's 22 dense buffers (each upto-drained_to+halo int32) with the
 * finalized channel values, recycling the ring behind them.  Span channels
 * (indices 0-4) are exported prefix-summed with a committed running carry;
 * their halo tail continues the sum but is NOT final — only point-channel
 * halo values are (their writers stay within one read length of the
 * position).  `final` flushes everything regardless of `upto`.
 * Safety contract: every read with pos < upto + back must have been fed. */
GN_API int gn_deposits_drain(void *h, int64_t upto, int final, int64_t halo,
                             int32_t **dense_out, gn_dep_out **evout) {
    engine *e = (engine *)h;
    *evout = NULL;
    if (e->err)
        return e->err;
    if (final)
        flush_to(e, e->flushed + e->wmask + 1);
    else
        flush_to(e, upto);
    if (e->err)
        return e->err;
    *evout = e->out;
    e->out = (gn_dep_out *)calloc(1, sizeof(gn_dep_out));
    e->prim_cap = e->oth_cap = 0;
    e->seq_cap = e->seq_used = 0;
    if (!e->out) {
        e->err = 2;
        return 2;
    }
    if (e->windowed && dense_out) {
        const int64_t p0 = e->drained_to;
        const int64_t n = upto - p0;
        const int64_t m = e->dmask;
        if (n < 0 || upto + halo > e->dense_hi)
            return (e->err = 3);
        for (int d = 0; d <= 4; d++) {          /* span-diff channels */
            int32_t *rb = e->dense[d];
            int32_t *out = dense_out[d];
            int64_t acc = e->span_carry[d];
            for (int64_t x = p0; x < upto; x++) {
                int64_t xi = x & m;
                acc += rb[xi];
                rb[xi] = 0;
                out[x - p0] = (int32_t)acc;
            }
            e->span_carry[d] = acc;
            for (int64_t x = upto; x < upto + halo; x++) {
                acc += rb[x & m];               /* read-only continuation */
                out[x - p0] = (int32_t)acc;
            }
        }
        for (int d = 5; d < N_DENSE; d++) {     /* point channels */
            int32_t *rb = e->dense[d];
            int32_t *out = dense_out[d];
            for (int64_t x = p0; x < upto; x++) {
                int64_t xi = x & m;
                out[x - p0] = rb[xi];
                rb[xi] = 0;
            }
            for (int64_t x = upto; x < upto + halo; x++)
                out[x - p0] = rb[x & m];
        }
        e->drained_to = upto;
        e->dense_lo = upto;
        e->dense_hi = upto + (m + 1);
    }
    return 0;
}

GN_API int gn_deposits_feed(
    void *h, long R, int64_t read_base,
    const int64_t *pos, const int32_t *flag, const int32_t *mapq,
    const int32_t *mchr_a, const int64_t *mpos_a, const int64_t *tlen_a,
    const int64_t *lseq_a, const int64_t *sadj_a, const int64_t *eadj_a,
    const int64_t *eadj_i_a, const int32_t *addw, const uint8_t *elig,
    const uint32_t *cigar, const int64_t *cigar_off,
    const uint8_t *aux_match_a, const int64_t *aux_pos_a,
    const uint8_t *aux_strand_a, const int32_t *aux_mapq_a,
    const int32_t *aux_sadj_a, const int32_t *aux_eadj_a,
    const int32_t *aux_eadj_i_a,
    const uint8_t *seq, const int64_t *seq_off) {

    engine *e = (engine *)h;
    (void)read_base;
    const int64_t L = e->L;
    const int64_t im = e->im;
    const int64_t imin = e->imin;
    const int64_t imean = e->imean;
    const int64_t sc_min = e->sc_min;
    const int64_t min_mapq = e->min_mapq;
    const int64_t max_split_loss = e->max_split_loss;
    const int64_t min_sr_len = e->min_sr_len;
    const int64_t read_len = e->read_len;
    const int64_t indel_i_cap = e->indel_i_cap;
    const int splitread = e->splitread;
    const int32_t refid = e->refid;
    const double tol_base = e->tol_base;
    const int64_t back = e->back;
    (void)min_mapq; (void)read_len;

    /* window capacity + sortedness guards */
    int64_t prev_pos = e->prev_pos;
    for (long i = 0; i < R; i++) {
        if (!elig[i])
            continue;
        if (pos[i] < prev_pos)
            return 1;
        prev_pos = pos[i];
        if (lseq_a[i] > e->max_lseq_cap)
            return 1;
        int64_t span = 0;
        for (int64_t c = cigar_off[i]; c < cigar_off[i + 1]; c++) {
            uint32_t op = cigar[c] & 0xF;
            if (op == CMATCH || op == CDEL || op == CREF_SKIP ||
                op == CEQUAL || op == CDIFF)
                span += cigar[c] >> 4;
        }
        if (span > e->max_ref_span_cap)
            return 1;
    }
    e->prev_pos = prev_pos;

#define DEP(et, p, d, a, af, rv, rm, mc, tb) \
    deposit_typed(e, et, p, d, a, af, rv, rm, mc, tb, NULL, -1)
#define DPT(ch, p) (*dptr(e, ch, (p)))
#define RD_SPAN(s, ee) span_diff(e, D_RD, (s), (ee), 1)
#define RD_POINT(p) do { int64_t _p = (p); if (_p >= 0 && _p < L) { \
        DPT(D_RD, _p) += 1; DPT(D_RD, _p + 1) -= 1; } } while (0)

    for (long i = 0; i < R && !e->err; i++) {
        if (!elig[i])
            continue;
        int64_t rpos = pos[i];
        int32_t fl = flag[i];
        int32_t mq = mapq[i];
        int32_t mchr = mchr_a[i];
        int64_t mpos = mpos_a[i];
        int64_t tlen = tlen_a[i];
        int64_t lseq = lseq_a[i];
        int64_t sadj = sadj_a[i];
        int64_t eadj = eadj_a[i];
        int64_t eadj_i = eadj_i_a[i];
        int32_t add = addw[i];
        double addf = (double)add;
        int rev = (fl & FREVERSE) != 0;
        int mrev = (fl & FMREVERSE) != 0;
        int paired = (fl & FPAIRED) != 0;
        int munmap = (fl & FMUNMAP) != 0;
        int same_chr = (mchr == refid);

        int64_t read_end = rpos - sadj + lseq - eadj - eadj_i;
        int64_t expected_end = rpos - sadj - eadj_i + im - lseq;

        if (rpos > back)
            flush_to(e, rpos - back);

        int aux_match = splitread && aux_match_a[i];
        int64_t aux_pos = aux_pos_a[i];
        int aux_strand = aux_strand_a[i];
        int32_t aux_mapq = aux_mapq_a[i];
        int64_t aux_sadj = aux_sadj_a[i];
        int64_t aux_eadj = aux_eadj_a[i];
        int64_t aux_eadj_i = aux_eadj_i_a[i];

        /* ---- soft-clip point deposits (src/GROM.c:7105-7170) ---- */
        if (sadj >= sc_min) {
            int64_t lp = rpos - 1;
            if (!paired || (!rev && (munmap || (!munmap && same_chr && mpos > rpos)))) {
                if (lp >= 0 && lp < L) {
                    DPT(D_SC_LEFT, lp) += add;
                    DPT(D_SC_LEFT_RD, lp) += 1;
                    DPT(D_SC_RD, lp) += 1;
                }
            }
            if (paired && !munmap && !same_chr && rev) {
                if (lp >= 0 && lp < L) {
                    DPT(D_CTX_SC_LEFT, lp) += add;
                    DPT(D_CTX_SC_LEFT_RD, lp) += 1;
                    DPT(D_CTX_SC_RD, lp) += 1;
                }
            }
            if (paired && !munmap && same_chr && rev && llabs(tlen) <= im && mpos < rpos) {
                if (lp >= 0 && lp < L) {
                    DPT(D_INDEL_SC_LEFT, lp) += add;
                    DPT(D_INDEL_SC_LEFT_RD, lp) += 1;
                    DPT(D_INDEL_SC_RD, lp) += 1;
                }
            }
        }
        if (eadj >= sc_min) {
            int64_t rp = read_end;
            if (!paired || (rev && (munmap || (!munmap && same_chr && mpos < rpos)))) {
                if (rp >= 0 && rp < L) {
                    DPT(D_SC_RIGHT, rp) += add;
                    DPT(D_SC_RIGHT_RD, rp) += 1;
                    DPT(D_SC_RD, rp) += 1;
                }
            }
            if (paired && !munmap && !same_chr && !rev) {
                if (rp >= 0 && rp < L) {
                    DPT(D_CTX_SC_RIGHT, rp) += add;
                    DPT(D_CTX_SC_RIGHT_RD, rp) += 1;
                    DPT(D_CTX_SC_RD, rp) += 1;
                }
            }
            if (paired && !munmap && same_chr && !rev && llabs(tlen) <= im && mpos > rpos) {
                if (rp >= 0 && rp < L) {
                    DPT(D_INDEL_SC_RIGHT, rp) += add;
                    DPT(D_INDEL_SC_RIGHT_RD, rp) += 1;
                    DPT(D_INDEL_SC_RD, rp) += 1;
                }
            }
        }

        /* ---- physical rd over clipped aligned span (src/GROM.c:7172-7181) */
        if (read_end > rpos)
            RD_SPAN(rpos, read_end);

        /* ---- cigar walk: indel_i / indel_d (src/GROM.c:7190-7430) ---- */
        {
            int64_t tpos = rpos, rbase = 0;
            for (int64_t c = cigar_off[i]; c < cigar_off[i + 1] && !e->err; c++) {
                uint32_t op = cigar[c] & 0xF;
                int64_t ln = cigar[c] >> 4;
                if (op == CSOFT_CLIP) {
                    rbase += ln;
                } else if (op == CMATCH || op == CREF_SKIP || op == CEQUAL ||
                           op == CDIFF) {
                    tpos += ln;
                    if (op != CREF_SKIP)
                        rbase += ln;
                } else if (op == CINS) {
                    if (tpos >= 0 && tpos < L) {
                        if (ln <= indel_i_cap && seq)
                            deposit_typed(e, E_INDEL_I, tpos, (double)ln, add,
                                          addf, 0, RM_END, -1, 0.0,
                                          seq + seq_off[i] + rbase, ln);
                        else
                            DEP(E_INDEL_I, tpos, (double)ln, add, addf, 0,
                                RM_END, -1, 0.0);
                    }
                    rbase += ln;
                } else if (op == CDEL) {
                    if (tpos >= 0 && tpos < L) {
                        DPT(D_INDEL_D_F_RD, tpos) += 1;
                        DEP(E_INDEL_D_F, tpos, (double)ln, add, addf, 0,
                            RM_END, -1, 0.0);
                    }
                    int64_t dend = tpos + ln - 1;
                    if (dend >= 0 && dend < L) {
                        DPT(D_INDEL_D_R_RD, dend) += 1;
                        DEP(E_INDEL_D_R, dend, (double)ln, add, addf, 0,
                            RM_END, -1, 0.0);
                    }
                    tpos += ln;
                }
            }
        }

        /* ---- split-read deletion evidence (src/GROM.c:7431-7947) ---- */
        int sr_del = 0;
        int64_t lp_s = 0, lp_e = 0;
        int64_t aux_end = 0;
        if (aux_match) {
            aux_end = aux_pos - aux_sadj + lseq - aux_eadj - aux_eadj_i;
            if (aux_mapq >= min_mapq && mq >= min_mapq) {
                int same_strand = (!rev && aux_strand == 0) || (rev && aux_strand == 1);
                if (same_strand) {
                    if (paired && !munmap && same_chr) {
                        if (!rev && aux_strand == 0) {
                            if (rpos < aux_pos && tlen <= im && aux_pos < mpos) {
                                int64_t gap = aux_pos - read_end;
                                if (gap > 0 && gap < im) {
                                    if (llabs(lseq - eadj - aux_sadj) <= max_split_loss &&
                                        lseq - sadj - eadj - eadj_i >= min_sr_len &&
                                        lseq - aux_sadj - aux_eadj - aux_eadj_i >= min_sr_len) {
                                        sr_del = 1;
                                        lp_s = read_end;
                                        lp_e = aux_pos;
                                    }
                                }
                            }
                        } else if (rev && aux_strand == 1) {
                            if (aux_pos < rpos && llabs(tlen) < im && mpos < aux_pos) {
                                if (llabs(lseq - sadj - aux_eadj) <= max_split_loss &&
                                    lseq - sadj - eadj - eadj_i >= min_sr_len &&
                                    lseq - aux_sadj - aux_eadj - aux_eadj_i >= min_sr_len) {
                                    if (aux_end < rpos) {
                                        sr_del = 1;
                                        lp_s = aux_end;
                                        lp_e = rpos;
                                    }
                                }
                            }
                        }
                    } else {
                        if (!rev && aux_strand == 0) {
                            if (rpos < aux_pos) {
                                int64_t gap = aux_pos - read_end;
                                if (gap > 0 && gap < im) {
                                    sr_del = 1;
                                    lp_s = read_end;
                                    lp_e = aux_pos;
                                }
                            }
                        } else if (rev && aux_strand == 1) {
                            if (aux_pos < rpos && rpos - aux_end < im) {
                                if (aux_end < rpos) {
                                    sr_del = 1;
                                    lp_s = aux_end;
                                    lp_e = rpos;
                                }
                            }
                        }
                    }
                }
            }
        }
        if (sr_del) {
            int64_t gap = lp_e - lp_s;
            if (gap < read_len && gap < im - imean) {
                if (lp_s >= 0 && lp_s < L) {
                    DPT(D_INDEL_D_F_RD, lp_s) += 1;
                    DEP(E_INDEL_D_F, lp_s, (double)gap, add, addf, 0, RM_END,
                        -1, 0.0);
                }
                if (lp_e - 1 >= 0 && lp_e - 1 < L) {
                    DPT(D_INDEL_D_R_RD, lp_e - 1) += 1;
                    DEP(E_INDEL_D_R, lp_e - 1, (double)gap, add, addf, 0,
                        RM_END, -1, 0.0);
                }
            }
            RD_POINT(lp_s);
            int64_t lo_read = rpos < aux_pos ? rpos : aux_pos;
            int64_t hi_read = rpos > aux_pos ? rpos : aux_pos;
            if (lp_s >= 0 && lp_s < L)
                DEP(E_DEL_F, lp_s, (double)(gap + imean), add, addf, lo_read,
                    RM_MAX, -1, tol_base);
            RD_POINT(lp_e - 1);
            if (lp_e - 1 >= 0 && lp_e - 1 < L)
                DEP(E_DEL_R, lp_e - 1, (double)(gap + imean), add, addf,
                    hi_read, RM_MINMAX, -1, tol_base);
        }

        /* ---- orientation-based discordant-pair deposits (src/GROM.c:7947+) */
        int64_t insert_temp = imean - 2 * lseq > 0 ? imean - 2 * lseq : 0;
        double inv_tol = (double)(im - imin + insert_temp);

        if (paired && !munmap) {
            if (same_chr) {
                if (mpos > rpos) {
                    if (!rev && mrev) { /* FR */
                        if (imin <= tlen && tlen <= im) {
                            /* split-read duplication? (src/GROM.c:7980-8343) */
                            int sr_dup = 0;
                            int64_t dlp_s = 0, dlp_e = 0;
                            if (splitread && aux_match && aux_mapq >= min_mapq &&
                                mq >= min_mapq && !rev && aux_strand == 0 &&
                                rpos < aux_pos && aux_pos < mpos) {
                                int64_t eai_t = eadj_i > 0 ? eadj_i : 0;
                                /* reference bug: aux temp uses the PRIMARY's
                                 * value (src/GROM.c:7996-7999) */
                                int64_t aux_eai_t = aux_eadj_i > 0 ? eadj_i : 0;
                                if (llabs(lseq - sadj - aux_eadj) <= max_split_loss &&
                                    lseq - sadj - eadj - eai_t >= min_sr_len &&
                                    lseq - aux_sadj - aux_eadj - aux_eai_t >= min_sr_len) {
                                    sr_dup = 1;
                                    dlp_s = rpos;
                                    dlp_e = aux_pos - aux_sadj + lseq - aux_eadj - aux_eadj_i;
                                }
                            }
                            if (sr_dup) {
                                /* _sr_dup_deposit (src/GROM.c:8016-8343) */
                                double dist = (double)(dlp_e - dlp_s - imean);
                                int64_t hi_r = rpos > aux_pos ? rpos : aux_pos;
                                int64_t lo_r = rpos < aux_pos ? rpos : aux_pos;
                                RD_POINT(dlp_e);
                                if (dlp_e >= 0 && dlp_e < L) {
                                    pstate *ps = get_ps(e, dlp_e);
                                    int first_set = ps &&
                                        (!(ps->touched & (1u << E_DUP_F)) ||
                                         ps->p_count[E_DUP_F] == 0);
                                    DEP(E_DUP_F, dlp_e, dist, add, addf, hi_r,
                                        RM_MINMAX, -1, tol_base);
                                    if (first_set && !e->err) {
                                        pstate *ps2 = get_ps(e, dlp_e);
                                        if (ps2) {
                                            touch_primary(ps2, E_DEL_F);
                                            ps2->p_re[E_DEL_F] = hi_r;
                                        }
                                    }
                                }
                                RD_POINT(dlp_s - 1);
                                if (dlp_s - 1 >= 0 && dlp_s - 1 < L)
                                    DEP(E_DUP_R, dlp_s - 1, dist, add, addf,
                                        lo_r, RM_MINMAX, -1, tol_base);
                            } else {
                                int64_t s0 = read_end, e0 = mpos;
                                int64_t s0c = s0 < 0 ? 0 : s0;
                                int64_t e0c = e0 > L ? L : e0;
                                if (e0c > s0c) {
                                    span_diff(e, D_CONC, s0, e0, 1);
                                    RD_SPAN(s0, e0);
                                }
                            }
                        } else if (tlen > 2 * im) {
                            int64_t lo = read_end;
                            int64_t hi = expected_end < mpos ? expected_end : mpos;
                            RD_SPAN(lo, hi);
                            int64_t x0 = lo < 0 ? 0 : lo;
                            int64_t x1 = hi > L ? L : hi;
                            for (int64_t x = x0; x < x1 && !e->err; x++) {
                                int full = (eadj < sc_min) || (x == lo);
                                DEP(E_DEL_F, x, (double)tlen,
                                    full ? add : add / 2,
                                    full ? addf : addf / 2.0,
                                    rpos, RM_END, -1, tol_base);
                            }
                        } else if (tlen > im) {
                            int64_t lo = read_end;
                            int64_t hi = mpos < L ? mpos : L;
                            RD_SPAN(lo, hi);
                            int64_t f_limit = rpos - sadj - eadj_i + im - lseq;
                            int64_t r_limit = rpos - sadj + tlen - im + lseq;
                            int64_t x0 = lo < 0 ? 0 : lo;
                            for (int64_t x = x0; x < hi && !e->err; x++) {
                                if (x < f_limit) {
                                    int full = (eadj < sc_min) || (x == lo);
                                    DEP(E_DEL_F, x, (double)tlen,
                                        full ? add : add / 2,
                                        full ? addf : addf / 2.0,
                                        rpos, RM_END, -1, tol_base);
                                } else if (llabs(tlen) <= 2 * im && x > r_limit) {
                                    int full = (sadj < sc_min) || (x == hi - 1);
                                    DEP(E_DEL_R, x, (double)tlen,
                                        full ? add : add / 2,
                                        full ? addf : addf / 2.0,
                                        mpos, RM_MINMAX, -1, tol_base);
                                }
                            }
                        } else if (tlen < imin) {
                            int no_ins = 0;
                            if (splitread && aux_match &&
                                ((!rev && aux_strand == 0) || (rev && aux_strand == 1)) &&
                                paired && !munmap && same_chr &&
                                (!rev && aux_strand == 0) &&
                                aux_pos < rpos && rpos < mpos)
                                no_ins = 1;
                            if (!no_ins) {
                                int64_t s0 = read_end, e0 = mpos;
                                int64_t s0c = s0 < 0 ? 0 : s0;
                                int64_t e0c = e0 > L ? L : e0;
                                if (e0c > s0c) {
                                    span_diff(e, D_INS, s0, e0, add);
                                    RD_SPAN(s0, e0);
                                }
                            }
                        }
                    } else if (!rev && !mrev) { /* FF → INV_F1 */
                        if (mpos - rpos >= 10) {
                            int64_t lo = read_end;
                            int64_t hi = expected_end < mpos ? expected_end : mpos;
                            RD_SPAN(lo, hi);
                            int64_t x0 = lo < 0 ? 0 : lo;
                            int64_t x1 = hi > L ? L : hi;
                            for (int64_t x = x0; x < x1 && !e->err; x++) {
                                int full = (eadj < sc_min) || (x == lo);
                                DEP(E_INV_F1, x, (double)tlen,
                                    full ? add : add / 2,
                                    full ? addf : addf / 2.0,
                                    rpos, RM_END, -1, inv_tol);
                            }
                        }
                    } else if (rev) {
                        if (mpos - rpos >= 10) {
                            int64_t lo = rpos - sadj - im + 2 * lseq;
                            int64_t hi = rpos;
                            RD_SPAN(lo, hi);
                            int etype = mrev ? E_INV_R1 : E_DUP_R;
                            double tb = mrev ? inv_tol : tol_base;
                            int64_t x0 = lo < 0 ? 0 : lo;
                            int64_t x1 = hi > L ? L : hi;
                            for (int64_t x = x0; x < x1 && !e->err; x++) {
                                int full = (sadj < sc_min) || (x == hi - 1);
                                DEP(etype, x, (double)tlen,
                                    full ? add : add / 2,
                                    full ? addf : addf / 2.0,
                                    rpos, RM_END, -1, tb);
                            }
                        }
                    }
                } else { /* mpos <= rpos */
                    if (rev && !mrev) { /* RF */
                        if (imin <= llabs(tlen) && llabs(tlen) <= im) {
                            int sr_dup = 0;
                            int64_t dlp_s = 0, dlp_e = 0;
                            if (splitread && aux_match && aux_mapq >= min_mapq &&
                                mq >= min_mapq && rev && aux_strand == 1 &&
                                paired && !munmap && same_chr &&
                                aux_pos < rpos && mpos < aux_pos) {
                                int64_t eai_t = eadj_i > 0 ? eadj_i : 0;
                                int64_t aux_eai_t = aux_eadj_i > 0 ? eadj_i : 0;
                                if (llabs(lseq - aux_sadj - eadj) <= max_split_loss &&
                                    lseq - sadj - eadj - eai_t >= min_sr_len &&
                                    lseq - aux_sadj - aux_eadj - aux_eai_t >= min_sr_len) {
                                    sr_dup = 1;
                                    dlp_s = aux_pos;
                                    dlp_e = read_end;
                                }
                            }
                            if (sr_dup) {
                                double dist = (double)(dlp_e - dlp_s - imean);
                                int64_t hi_r = rpos > aux_pos ? rpos : aux_pos;
                                int64_t lo_r = rpos < aux_pos ? rpos : aux_pos;
                                RD_POINT(dlp_e);
                                if (dlp_e >= 0 && dlp_e < L) {
                                    pstate *ps = get_ps(e, dlp_e);
                                    int first_set = ps &&
                                        (!(ps->touched & (1u << E_DUP_F)) ||
                                         ps->p_count[E_DUP_F] == 0);
                                    DEP(E_DUP_F, dlp_e, dist, add, addf, hi_r,
                                        RM_MINMAX, -1, tol_base);
                                    if (first_set && !e->err) {
                                        pstate *ps2 = get_ps(e, dlp_e);
                                        if (ps2) {
                                            touch_primary(ps2, E_DEL_F);
                                            ps2->p_re[E_DEL_F] = hi_r;
                                        }
                                    }
                                }
                                RD_POINT(dlp_s - 1);
                                if (dlp_s - 1 >= 0 && dlp_s - 1 < L)
                                    DEP(E_DUP_R, dlp_s - 1, dist, add, addf,
                                        lo_r, RM_MINMAX, -1, tol_base);
                            }
                        } else if (llabs(tlen) > 2 * im) {
                            int64_t lo = rpos - sadj - im + 2 * lseq;
                            int64_t hi = rpos;
                            RD_SPAN(lo, hi);
                            int64_t x0 = lo < 0 ? 0 : lo;
                            int64_t x1 = hi > L ? L : hi;
                            for (int64_t x = x0; x < x1 && !e->err; x++) {
                                int full = (sadj < sc_min) || (x == hi - 1);
                                DEP(E_DEL_R, x, (double)llabs(tlen),
                                    full ? add : add / 2,
                                    full ? addf : addf / 2.0,
                                    rpos, RM_END, -1, tol_base);
                            }
                        }
                    } else if (!rev && !mrev) { /* FF → INV_F2 */
                        if (rpos - mpos >= 10) {
                            int64_t lo = read_end;
                            int64_t hi = expected_end;
                            RD_SPAN(lo, hi);
                            int64_t x0 = lo < 0 ? 0 : lo;
                            int64_t x1 = hi > L ? L : hi;
                            for (int64_t x = x0; x < x1 && !e->err; x++) {
                                int full = (eadj < sc_min) || (x == lo);
                                DEP(E_INV_F2, x, (double)llabs(tlen),
                                    full ? add : add / 2,
                                    full ? addf : addf / 2.0,
                                    rpos, RM_END, -1, inv_tol);
                            }
                        }
                    } else if (mrev) {
                        if (rpos - mpos >= 10) {
                            if (!rev) { /* DUP_F */
                                int64_t lo = read_end;
                                int64_t hi = expected_end;
                                RD_SPAN(lo, hi);
                                int64_t x0 = lo < 0 ? 0 : lo;
                                int64_t x1 = hi > L ? L : hi;
                                for (int64_t x = x0; x < x1 && !e->err; x++) {
                                    int full = (eadj < sc_min) || (x == lo);
                                    DEP(E_DUP_F, x, (double)llabs(tlen),
                                        full ? add : add / 2,
                                        full ? addf : addf / 2.0,
                                        rpos, RM_END, -1, tol_base);
                                }
                            } else { /* rev+mrev → INV_R2 */
                                int64_t lo = rpos - sadj - im + 2 * lseq;
                                if (lo < mpos + lseq)
                                    lo = mpos + lseq;
                                int64_t hi = rpos;
                                RD_SPAN(lo, hi);
                                int64_t x0 = lo < 0 ? 0 : lo;
                                int64_t x1 = hi > L ? L : hi;
                                for (int64_t x = x0; x < x1 && !e->err; x++) {
                                    int full = (sadj < sc_min) || (x == hi - 1);
                                    DEP(E_INV_R2, x, (double)llabs(tlen),
                                        full ? add : add / 2,
                                        full ? addf : addf / 2.0,
                                        rpos, RM_END, -1, inv_tol);
                                }
                            }
                        }
                    }
                }
            } else { /* mate on another chromosome → CTX */
                if (!rev) {
                    int64_t lo = read_end;
                    int64_t hi = expected_end;
                    RD_SPAN(lo, hi);
                    double key_mpos = mrev ? (double)(-mpos) : (double)mpos;
                    int64_t x0 = lo < 0 ? 0 : lo;
                    int64_t x1 = hi > L ? L : hi;
                    for (int64_t x = x0; x < x1 && !e->err; x++) {
                        int full = (eadj < sc_min) || (x == lo);
                        DEP(E_CTX_F, x, key_mpos,
                            full ? add : add / 2,
                            full ? addf : addf / 2.0,
                            rpos, RM_END, mchr, tol_base);
                    }
                } else {
                    int64_t lo = rpos - sadj + lseq - im + lseq;
                    int64_t hi = rpos;
                    RD_SPAN(lo, hi);
                    double key_mpos = mrev ? (double)(-mpos) : (double)mpos;
                    int64_t x0 = lo < 0 ? 0 : lo;
                    int64_t x1 = hi > L ? L : hi;
                    for (int64_t x = x0; x < x1 && !e->err; x++) {
                        int full = (sadj < sc_min) || (x == hi - 1);
                        DEP(E_CTX_R, x, key_mpos,
                            full ? add : add / 2,
                            full ? addf : addf / 2.0,
                            rpos, RM_END, mchr, tol_base);
                    }
                }
            }
        } else if (paired && munmap) {
            if (!rev) {
                int64_t s0 = read_end, e0 = expected_end;
                int64_t s0c = s0 < 0 ? 0 : s0;
                int64_t e0c = e0 > L ? L : e0;
                if (e0c > s0c) {
                    span_diff(e, D_MF, s0, e0, add);
                    RD_SPAN(s0, e0);
                }
            } else {
                int64_t s0 = rpos - sadj + lseq + eadj_i - im + lseq;
                int64_t e0 = rpos;
                int64_t s0c = s0 < 0 ? 0 : s0;
                int64_t e0c = e0 > L ? L : e0;
                if (e0c > s0c) {
                    span_diff(e, D_MR, s0, e0, add);
                    RD_SPAN(s0, e0);
                }
            }
        }
    }

    return e->err;
#undef DEP
#undef DPT
#undef RD_SPAN
#undef RD_POINT
}

GN_API int gn_deposits_finish(void *h, gn_dep_out **out_p) {
    engine *e = (engine *)h;
    if (!e->err)
        flush_to(e, e->flushed + e->wmask + 1);
    int err = e->err;
    int windowed = e->windowed;
    int32_t **dense = e->dense;
    const int64_t L = e->L;
    gn_dep_out *out = e->out;
    free(e->ring);
    free(e->pool);
    free(e->dblock);
    free(e->dense_owned);
    free(e);
    if (err) {
        gn_deposits_free(out);
        return err;
    }
    if (!windowed) {
        for (int d = D_RD; d <= D_MR; d++) {
            int32_t *a = dense[d];
            int32_t acc = 0;
            for (int64_t p = 0; p < L; p++) {
                acc += a[p];
                a[p] = acc;
            }
        }
    }
    *out_p = out;
    return 0;
}

GN_API int gn_deposits_run(
    long R,
    const int64_t *pos, const int32_t *flag, const int32_t *mapq,
    const int32_t *mchr_a, const int64_t *mpos_a, const int64_t *tlen_a,
    const int64_t *lseq_a, const int64_t *sadj_a, const int64_t *eadj_a,
    const int64_t *eadj_i_a, const int32_t *addw, const uint8_t *elig,
    const uint32_t *cigar, const int64_t *cigar_off,
    const uint8_t *aux_match_a, const int64_t *aux_pos_a,
    const uint8_t *aux_strand_a, const int32_t *aux_mapq_a,
    const int32_t *aux_sadj_a, const int32_t *aux_eadj_a,
    const int32_t *aux_eadj_i_a,
    const uint8_t *seq, const int64_t *seq_off,
    const int64_t *params_i, const double *params_d,
    int32_t **dense, gn_dep_out **out_p) {

    const int64_t L = params_i[PI_CHROM_LEN];
    const int64_t im = params_i[PI_IM];
    const int64_t imin = params_i[PI_IMIN];
    const int64_t imean = params_i[PI_IMEAN];
    const int64_t sc_min = params_i[PI_SC_MIN];
    const int64_t min_mapq = params_i[PI_MIN_MAPQ];
    const int64_t max_split_loss = params_i[PI_MAX_SPLIT_LOSS];
    const int64_t min_sr_len = params_i[PI_MIN_SR_LEN];
    const int64_t read_len = params_i[PI_READ_LEN];
    const int64_t indel_i_cap = params_i[PI_INDEL_I_CAP];
    const int splitread = (int)params_i[PI_SPLITREAD];
    const int32_t refid = (int32_t)params_i[PI_REFID];
    const double tol_base = params_d[0];

    /* pre-scan: max cigar ref span + max lseq + sorted check */
    int64_t max_ref_span = 0, max_lseq = 0, prev_pos = -1;
    for (long i = 0; i < R; i++) {
        if (!elig[i])
            continue;
        if (pos[i] < prev_pos)
            return 1;
        prev_pos = pos[i];
        if (lseq_a[i] > max_lseq)
            max_lseq = lseq_a[i];
        int64_t span = 0;
        for (int64_t c = cigar_off[i]; c < cigar_off[i + 1]; c++) {
            uint32_t op = cigar[c] & 0xF;
            if (op == CMATCH || op == CDEL || op == CREF_SKIP ||
                op == CEQUAL || op == CDIFF)
                span += cigar[c] >> 4;
        }
        if (span > max_ref_span)
            max_ref_span = span;
    }
    int64_t back = im + 2 * max_lseq + 64;
    int64_t fwd = im + max_lseq + max_ref_span + 64;
    int64_t W = 1;
    while (W < back + fwd + 2)
        W <<= 1;

    (void)L; (void)im; (void)imin; (void)imean; (void)sc_min;
    (void)min_mapq; (void)max_split_loss; (void)min_sr_len; (void)read_len;
    (void)indel_i_cap; (void)splitread; (void)refid; (void)tol_base;
    void *h = gn_deposits_init(params_i, params_d, dense,
                               max_lseq > 0 ? max_lseq : 1,
                               max_ref_span > 0 ? max_ref_span : 1);
    if (!h)
        return 2;
    int rc = gn_deposits_feed(h, R, 0, pos, flag, mapq, mchr_a, mpos_a, tlen_a,
                              lseq_a, sadj_a, eadj_a, eadj_i_a, addw, elig,
                              cigar, cigar_off, aux_match_a, aux_pos_a,
                              aux_strand_a, aux_mapq_a, aux_sadj_a,
                              aux_eadj_a, aux_eadj_i_a, seq, seq_off);
    if (rc) {
        gn_deposits_abort(h);
        return rc;
    }
    return gn_deposits_finish(h, out_p);
}

