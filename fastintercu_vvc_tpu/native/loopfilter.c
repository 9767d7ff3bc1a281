/* Native deblocking filter — exact port of ops/deblock.py (normative,
 * spec 8.8.3; behavioral parity with LoopFilter.cpp — see the Python
 * twin's docstring for the reference map).  The Python implementation
 * is the readable twin and stays the source of truth for tests; this
 * C port is the production path (the reference's equivalent hot file
 * is LoopFilter.cpp + its SIMD dispatch in InitX86.cpp).
 *
 * Bit-exactness contract: every arithmetic expression below mirrors
 * the Python twin line for line; tests/test_deblock.py cross-checks
 * the two on random CU/TU geometries.
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static const int32_t LF_TC_TABLE[66] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3, 4, 4, 4,
    4, 5, 5, 5, 5, 7, 7, 8, 9, 10, 10, 11, 13, 14, 15, 17, 19, 21, 24,
    25, 29, 33, 36, 41, 45, 51, 57, 64, 71, 80, 89, 100, 112, 125, 141,
    157, 177, 198, 222, 250, 280, 314, 352, 395};
static const int32_t LF_BETA_TABLE[64] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64, 66, 68, 70, 72, 74, 76, 78, 80, 82, 84, 86, 88};
#define LF_INTRA_TC_OFF 2
#define LF_MAX_QP 63

static inline int iabs(int v) { return v < 0 ? -v : v; }
static inline int imin(int a, int b) { return a < b ? a : b; }
static inline int imax(int a, int b) { return a > b ? a : b; }
static inline int iclip(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

/* line abstraction: base points at offset 0 (first Q-side sample),
 * step is +1 (vertical edge) or +W (horizontal edge); L(k) = base[k*step]
 * for signed k. */
typedef struct { int32_t *base; int step; } Line;
static inline int LN(const Line *l, int k) { return l->base[k * l->step]; }
static inline void LS(Line *l, int k, int v) { l->base[k * l->step] = v; }

/* ---- per-4x4 coding info (all [gh][gw], row-major) ---- */
typedef struct {
    int gh, gw;
    const int32_t *cu_x0, *cu_y0, *cu_w, *cu_h;
    const uint8_t *is_intra, *cbf_y, *cbf_cb, *cbf_cr;
    const int32_t *mv;        /* [gh][gw][2] (L0) */
    const int32_t *ref_poc;
    const int32_t *mv1;       /* NULL if absent */
    const int32_t *ref_poc1;
    int slice_is_b;
    const int32_t *tu_x0, *tu_y0, *tu_w, *tu_h;   /* NULL if absent */
    const uint8_t *sub_pu;    /* NULL if absent */
    const int32_t *qp_map;    /* NULL if absent */
    const int32_t *chroma_tab;
    const uint8_t *isp;       /* NULL if absent */
} LfInfo;

static inline int gidx(const LfInfo *in, int x, int y) {
    return (y / 4) * in->gw + (x / 4);
}

static int calc_dp(const Line *l, int chroma_hor_ctb) {
    if (chroma_hor_ctb)
        return iabs(LN(l, -2) - 2 * LN(l, -2) + LN(l, -1));
    return iabs(LN(l, -3) - 2 * LN(l, -2) + LN(l, -1));
}

static int calc_dq(const Line *l) {
    return iabs(LN(l, 0) - 2 * LN(l, 1) + LN(l, 2));
}

static int use_strong(const Line *l, int d, int beta, int tc,
                      int side_p_large, int side_q_large,
                      int max_p, int max_q, int chroma_hor_ctb) {
    int m4 = LN(l, 0), m3 = LN(l, -1), m7 = LN(l, 3), m0 = LN(l, -4);
    int m2 = LN(l, -2);
    int sp3 = chroma_hor_ctb ? iabs(m2 - m3) : iabs(m0 - m3);
    int sq3 = iabs(m7 - m4);
    int d_strong = sp3 + sq3;
    if (side_p_large || side_q_large) {
        if (side_p_large) {
            if (max_p == 7) {
                int mp5 = LN(l, -5), mp6 = LN(l, -6), mp7 = LN(l, -7);
                int mp4 = LN(l, -8);
                sp3 = sp3 + iabs(mp5 - mp6 - mp7 + mp4);
                sp3 = (sp3 + iabs(m0 - mp4) + 1) >> 1;
            } else {
                int mp4 = LN(l, -6);
                sp3 = (sp3 + iabs(m0 - mp4) + 1) >> 1;
            }
        }
        if (side_q_large) {
            if (max_q == 7) {
                int m8 = LN(l, 4), m9 = LN(l, 5), m10 = LN(l, 6);
                int m11 = LN(l, 7);
                sq3 = sq3 + iabs(m8 - m9 - m10 + m11);
                sq3 = (sq3 + iabs(m11 - m7) + 1) >> 1;
            } else {
                int m11 = LN(l, 5);
                sq3 = (sq3 + iabs(m11 - m7) + 1) >> 1;
            }
        }
        return ((sp3 + sq3) < (beta * 3 >> 5)) && (d < (beta >> 4))
            && (iabs(m3 - m4) < ((tc * 5 + 1) >> 1));
    }
    return (d_strong < (beta >> 3)) && (d < (beta >> 2))
        && (iabs(m3 - m4) < ((tc * 5 + 1) >> 1));
}

static void bilinear(Line *l, int ref_middle, int ref_p, int ref_q,
                     int np_side, int nq_side, int tc) {
    static const int db7[7] = {59, 50, 41, 32, 23, 14, 5};
    static const int db5[5] = {58, 45, 32, 19, 6};
    static const int db3[3] = {53, 32, 11};
    static const int tc7[7] = {6, 5, 4, 3, 2, 1, 1};
    static const int tc3[3] = {6, 4, 2};
    const int *dbP = np_side == 7 ? db7 : (np_side == 5 ? db5 : db3);
    const int *dbQ = nq_side == 7 ? db7 : (nq_side == 5 ? db5 : db3);
    const int *tcP = np_side == 3 ? tc3 : tc7;
    const int *tcQ = nq_side == 3 ? tc3 : tc7;
    for (int pos = 0; pos < np_side; pos++) {
        int src = LN(l, -1 - pos);
        int cval = (tc * tcP[pos]) >> 1;
        int v = (ref_middle * dbP[pos] + ref_p * (64 - dbP[pos]) + 32) >> 6;
        LS(l, -1 - pos, iclip(v, src - cval, src + cval));
    }
    for (int pos = 0; pos < nq_side; pos++) {
        int src = LN(l, pos);
        int cval = (tc * tcQ[pos]) >> 1;
        int v = (ref_middle * dbQ[pos] + ref_q * (64 - dbQ[pos]) + 32) >> 6;
        LS(l, pos, iclip(v, src - cval, src + cval));
    }
}

static void filter_pq(Line *l, int np_side, int nq_side, int tc) {
    /* P(k) = line[-1-k]; Q(k) = line[k] */
#define P(k) LN(l, -1 - (k))
#define Q(k) LN(l, (k))
    int ref_p, ref_q, ref_m;
    if (np_side == 7) ref_p = (P(6) + P(7) + 1) >> 1;
    else if (np_side == 5) ref_p = (P(4) + P(5) + 1) >> 1;
    else ref_p = (P(2) + P(3) + 1) >> 1;
    if (nq_side == 7) ref_q = (Q(6) + Q(7) + 1) >> 1;
    else if (nq_side == 5) ref_q = (Q(4) + Q(5) + 1) >> 1;
    else ref_q = (Q(2) + Q(3) + 1) >> 1;

    if (np_side == nq_side) {
        if (np_side == 5)
            ref_m = (2 * (P(0) + Q(0) + P(1) + Q(1) + P(2) + Q(2))
                     + P(3) + Q(3) + P(4) + Q(4) + 8) >> 4;
        else
            ref_m = (2 * (P(0) + Q(0)) + P(1) + Q(1) + P(2) + Q(2)
                     + P(3) + Q(3) + P(4) + Q(4) + P(5) + Q(5)
                     + P(6) + Q(6) + 8) >> 4;
    } else {
        int lo = imin(np_side, nq_side);
        int hi = imax(np_side, nq_side);
        int p_is_large = np_side > nq_side;
        /* L = larger-side access, S = smaller-side access */
#define LL(k) (p_is_large ? P(k) : Q(k))
#define SS(k) (p_is_large ? Q(k) : P(k))
        if (hi == 7 && lo == 5)
            ref_m = (2 * (P(0) + Q(0) + P(1) + Q(1))
                     + P(2) + Q(2) + P(3) + Q(3) + P(4) + Q(4)
                     + P(5) + Q(5) + 8) >> 4;
        else if (hi == 7 && lo == 3)
            ref_m = (2 * (LL(0) + SS(0)) + SS(0) + 2 * (SS(1) + SS(2))
                     + LL(1) + SS(1) + LL(2) + LL(3) + LL(4) + LL(5)
                     + LL(6) + 8) >> 4;
        else    /* 5 and 3 */
            ref_m = (P(0) + Q(0) + P(1) + Q(1) + P(2) + Q(2)
                     + P(3) + Q(3) + 4) >> 3;
#undef LL
#undef SS
    }
    bilinear(l, ref_m, ref_p, ref_q, np_side, nq_side, tc);
#undef P
#undef Q
}

static void pel_filter_luma(Line *l, int tc, int sw, int thr_cut,
                            int filter_p2, int filter_q2, int clip_hi,
                            int side_p_large, int side_q_large,
                            int max_p, int max_q) {
    int m4 = LN(l, 0), m3 = LN(l, -1);
    int m5 = LN(l, 1), m2 = LN(l, -2);
    int m6 = LN(l, 2), m1 = LN(l, -3);
    int m7 = LN(l, 3), m0 = LN(l, -4);
    static const int tc3[3] = {3, 2, 1};
    if (sw) {
        if (side_p_large || side_q_large) {
            filter_pq(l, side_p_large ? max_p : 3,
                      side_q_large ? max_q : 3, tc);
        } else {
            LS(l, -1, iclip((m1 + 2 * m2 + 2 * m3 + 2 * m4 + m5 + 4) >> 3,
                            m3 - tc3[0] * tc, m3 + tc3[0] * tc));
            LS(l, 0, iclip((m2 + 2 * m3 + 2 * m4 + 2 * m5 + m6 + 4) >> 3,
                           m4 - tc3[0] * tc, m4 + tc3[0] * tc));
            LS(l, -2, iclip((m1 + m2 + m3 + m4 + 2) >> 2,
                            m2 - tc3[1] * tc, m2 + tc3[1] * tc));
            LS(l, 1, iclip((m3 + m4 + m5 + m6 + 2) >> 2,
                           m5 - tc3[1] * tc, m5 + tc3[1] * tc));
            LS(l, -3, iclip((2 * m0 + 3 * m1 + m2 + m3 + m4 + 4) >> 3,
                            m1 - tc3[2] * tc, m1 + tc3[2] * tc));
            LS(l, 2, iclip((m3 + m4 + m5 + 3 * m6 + 2 * m7 + 4) >> 3,
                           m6 - tc3[2] * tc, m6 + tc3[2] * tc));
        }
    } else {
        int delta = (9 * (m4 - m3) - 3 * (m5 - m2) + 8) >> 4;
        if (iabs(delta) < thr_cut) {
            delta = iclip(delta, -tc, tc);
            LS(l, -1, iclip(m3 + delta, 0, clip_hi));
            LS(l, 0, iclip(m4 - delta, 0, clip_hi));
            int tc2 = tc >> 1;
            if (filter_p2) {
                int d1 = iclip((((m1 + m3 + 1) >> 1) - m2 + delta) >> 1,
                               -tc2, tc2);
                LS(l, -2, iclip(m2 + d1, 0, clip_hi));
            }
            if (filter_q2) {
                int d2 = iclip((((m6 + m4 + 1) >> 1) - m5 - delta) >> 1,
                               -tc2, tc2);
                LS(l, 1, iclip(m5 + d2, 0, clip_hi));
            }
        }
    }
}

static void pel_filter_chroma(Line *l, int tc, int sw, int clip_hi,
                              int large_boundary, int chroma_hor_ctb) {
    int m0 = LN(l, -4), m1 = LN(l, -3), m2 = LN(l, -2), m3 = LN(l, -1);
    int m4 = LN(l, 0), m5 = LN(l, 1), m6 = LN(l, 2), m7 = LN(l, 3);
    (void)large_boundary;
    if (sw) {
        if (chroma_hor_ctb) {
            LS(l, -1, iclip((3 * m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3,
                            m3 - tc, m3 + tc));
            LS(l, 0, iclip((2 * m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3,
                           m4 - tc, m4 + tc));
            LS(l, 1, iclip((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3,
                           m5 - tc, m5 + tc));
            LS(l, 2, iclip((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3,
                           m6 - tc, m6 + tc));
        } else {
            LS(l, -3, iclip((3 * m0 + 2 * m1 + m2 + m3 + m4 + 4) >> 3,
                            m1 - tc, m1 + tc));
            LS(l, -2, iclip((2 * m0 + m1 + 2 * m2 + m3 + m4 + m5 + 4) >> 3,
                            m2 - tc, m2 + tc));
            LS(l, -1, iclip((m0 + m1 + m2 + 2 * m3 + m4 + m5 + m6 + 4) >> 3,
                            m3 - tc, m3 + tc));
            LS(l, 0, iclip((m1 + m2 + m3 + 2 * m4 + m5 + m6 + m7 + 4) >> 3,
                           m4 - tc, m4 + tc));
            LS(l, 1, iclip((m2 + m3 + m4 + 2 * m5 + m6 + 2 * m7 + 4) >> 3,
                           m5 - tc, m5 + tc));
            LS(l, 2, iclip((m3 + m4 + m5 + 2 * m6 + 3 * m7 + 4) >> 3,
                           m6 - tc, m6 + tc));
        }
    } else {
        int delta = iclip((((m4 - m3) << 2) + m2 - m5 + 4) >> 3, -tc, tc);
        LS(l, -1, iclip(m3 + delta, 0, clip_hi));
        LS(l, 0, iclip(m4 - delta, 0, clip_hi));
    }
}

static int mv_ge(const int32_t *a, const int32_t *b) {
    return iabs(a[0] - b[0]) >= 8 || iabs(a[1] - b[1]) >= 8;
}

static int bs_luma(const LfInfo *in, int xq, int yq, int hor,
                   int tu_edge) {
    int gq = gidx(in, xq, yq);
    int gp = gidx(in, xq - (hor ? 0 : 4), yq - (hor ? 4 : 0));
    if (in->is_intra[gq] || in->is_intra[gp]) return 2;
    if (tu_edge && (in->cbf_y[gq] || in->cbf_y[gp])) return 1;

    static const int32_t zero[2] = {0, 0};
    int p0 = in->ref_poc[gp], q0 = in->ref_poc[gq];
    if (in->mv1 != NULL && in->slice_is_b) {
        int p1 = in->ref_poc1[gp];
        int q1 = in->ref_poc1[gq];
        const int32_t *mvp0 = p0 >= 0 ? &in->mv[2 * gp] : zero;
        const int32_t *mvp1 = p1 >= 0 ? &in->mv1[2 * gp] : zero;
        const int32_t *mvq0 = q0 >= 0 ? &in->mv[2 * gq] : zero;
        const int32_t *mvq1 = q1 >= 0 ? &in->mv1[2 * gq] : zero;
        if ((p0 == q0 && p1 == q1) || (p0 == q1 && p1 == q0)) {
            if (p0 != p1) {
                if (p0 == q0)
                    return (mv_ge(mvq0, mvp0) || mv_ge(mvq1, mvp1)) ? 1 : 0;
                return (mv_ge(mvq1, mvp0) || mv_ge(mvq0, mvp1)) ? 1 : 0;
            }
            int a = mv_ge(mvq0, mvp0) || mv_ge(mvq1, mvp1);
            int b = mv_ge(mvq1, mvp0) || mv_ge(mvq0, mvp1);
            return (a && b) ? 1 : 0;
        }
        return 1;
    }
    if (p0 < 0 || q0 < 0) return p0 == q0 ? 0 : 1;
    if (p0 != q0) return 1;
    return mv_ge(&in->mv[2 * gq], &in->mv[2 * gp]) ? 1 : 0;
}

static void bs_chroma(const LfInfo *in, int xq, int yq, int hor,
                      int *bs_cb, int *bs_cr) {
    int gq = gidx(in, xq, yq);
    int gp = gidx(in, xq - (hor ? 0 : 4), yq - (hor ? 4 : 0));
    if (in->is_intra[gq] || in->is_intra[gp]) { *bs_cb = 2; *bs_cr = 2;
        return; }
    *bs_cb = (in->cbf_cb[gq] || in->cbf_cb[gp]) ? 1 : 0;
    *bs_cr = (in->cbf_cr[gq] || in->cbf_cr[gp]) ? 1 : 0;
}

/* ---- CU coding-order reconstruction (tree inference) ---- */
typedef struct { int x, y, w, h; } Rect;
typedef struct { Rect *v; int n, cap; } RectList;

static void rl_push(RectList *rl, int x, int y, int w, int h) {
    if (rl->n == rl->cap) {
        rl->cap = rl->cap ? rl->cap * 2 : 64;
        rl->v = (Rect *)realloc(rl->v, rl->cap * sizeof(Rect));
    }
    rl->v[rl->n].x = x; rl->v[rl->n].y = y;
    rl->v[rl->n].w = w; rl->v[rl->n].h = h;
    rl->n++;
}

static int fits(const LfInfo *in, const Rect *ch, int nch) {
    for (int i = 0; i < nch; i++) {
        int cx = ch[i].x, cy = ch[i].y, cw = ch[i].w, chh = ch[i].h;
        int gy1 = imin((cy + chh) / 4, in->gh);
        int gx1 = imin((cx + cw) / 4, in->gw);
        for (int gy = cy / 4; gy < gy1; gy++)
            for (int gx = cx / 4; gx < gx1; gx++) {
                int g = gy * in->gw + gx;
                int x0 = in->cu_x0[g], y0 = in->cu_y0[g];
                if (!(cx <= x0 && cy <= y0)) return 0;
                if (x0 + in->cu_w[g] > cx + cw ||
                    y0 + in->cu_h[g] > cy + chh) return 0;
            }
    }
    return 1;
}

static int cu_coding_order(const LfInfo *in, int x, int y, int w, int h,
                           RectList *out) {
    if (y / 4 >= in->gh || x / 4 >= in->gw) return 0;
    int g = gidx(in, x, y);
    if (in->cu_x0[g] == x && in->cu_y0[g] == y &&
        in->cu_w[g] == w && in->cu_h[g] == h) {
        rl_push(out, x, y, w, h);
        return 0;
    }
    Rect cand[3][5]; int ncand = 0; int nchild[3];
    /* enumeration order matches the Python twin: QT, BT_H, BT_V,
     * TT_H, TT_V — but at most 3 entries ever fit in cand; grow it
     * dynamically instead */
    Rect cands[5][5]; int nc[5]; int total = 0;
    (void)cand; (void)ncand; (void)nchild;
    if (w == h && w >= 8) {
        int hw = w / 2, hh = h / 2;
        Rect *c = cands[total];
        c[0] = (Rect){x, y, hw, hh}; c[1] = (Rect){x + hw, y, hw, hh};
        c[2] = (Rect){x, y + hh, hw, hh};
        c[3] = (Rect){x + hw, y + hh, hw, hh};
        nc[total++] = 4;
    }
    if (h >= 8) {
        Rect *c = cands[total];
        c[0] = (Rect){x, y, w, h / 2}; c[1] = (Rect){x, y + h / 2, w, h / 2};
        nc[total++] = 2;
    }
    if (w >= 8) {
        Rect *c = cands[total];
        c[0] = (Rect){x, y, w / 2, h}; c[1] = (Rect){x + w / 2, y, w / 2, h};
        nc[total++] = 2;
    }
    if (h >= 16) {
        int q = h / 4;
        Rect *c = cands[total];
        c[0] = (Rect){x, y, w, q}; c[1] = (Rect){x, y + q, w, 2 * q};
        c[2] = (Rect){x, y + 3 * q, w, q};
        nc[total++] = 3;
    }
    if (w >= 16) {
        int q = w / 4;
        Rect *c = cands[total];
        c[0] = (Rect){x, y, q, h}; c[1] = (Rect){x + q, y, 2 * q, h};
        c[2] = (Rect){x + 3 * q, y, q, h};
        nc[total++] = 3;
    }
    for (int i = 0; i < total; i++) {
        if (fits(in, cands[i], nc[i])) {
            for (int j = 0; j < nc[i]; j++)
                if (cu_coding_order(in, cands[i][j].x, cands[i][j].y,
                                    cands[i][j].w, cands[i][j].h, out))
                    return -1;
            return 0;
        }
    }
    return -1;   /* cannot infer partition */
}

/* ---- per-edge filtering (port of _deblock_cu_edge) ---- */
typedef struct {
    int32_t *ry, *rcb, *rcr;
    int H, W;
    int qp, qp_c, clip_hi, bdscale, ctu_size, chroma, bit_depth;
} LfPlanes;

static void deblock_cu_edge(LfPlanes *pl, const LfInfo *in,
                            int cx, int cy, int cw, int ch, int hor,
                            int tu_edge, int pu0, int pu_len) {
    int W = pl->W;
    int edge_units;
    if (hor) { if (cy == 0) return; edge_units = cw / 4; }
    else { if (cx == 0) return; edge_units = ch / 4; }

    /* ---- luma ---- */
    for (int u = 0; u < edge_units; u++) {
        int px, py;
        if (hor) { px = cx + 4 * u; py = cy; }
        else { px = cx; py = cy + 4 * u; }
        int bs = bs_luma(in, px, py, hor, tu_edge);
        if (bs == 0) continue;
        int gq = gidx(in, px, py);
        int gp = gidx(in, px - (hor ? 0 : 4), py - (hor ? 4 : 0));
        int size_q, size_p;
        if (in->tu_w != NULL) {
            size_q = hor ? in->tu_h[gq] : in->tu_w[gq];
            size_p = hor ? in->tu_h[gp] : in->tu_w[gp];
        } else {
            size_q = imin(hor ? in->cu_h[gq] : in->cu_w[gq], 64);
            size_p = imin(hor ? in->cu_h[gp] : in->cu_w[gp], 64);
        }
        int small = size_p <= 4 || size_q <= 4;
        int max_q = small ? 1 : (size_q >= 32 ? 7 : 3);
        int max_p = small ? 1 : (size_p >= 32 ? 7 : 3);
        if (in->sub_pu != NULL) {
            if (tu_edge) {
                if (in->sub_pu[gq]) {
                    max_q = imin(max_q, 5);
                    int same_cu = in->cu_x0[gp] == in->cu_x0[gq]
                        && in->cu_y0[gp] == in->cu_y0[gq];
                    if (same_cu) max_p = imin(max_p, 5);
                }
            } else {
                int off = hor ? (py - pu0) : (px - pu0);
                /* is_tu(o): does a TU boundary sit at pu0+o? */
                int near4 = 0, near8 = 0;
                {
                    const int32_t *t = hor ? in->tu_y0 : in->tu_x0;
                    int probes[4] = {off - 4, off + 4, off - 8, off + 8};
                    int istu[4] = {0, 0, 0, 0};
                    if (t != NULL) {
                        for (int k = 0; k < 4; k++) {
                            int a = pu0 + probes[k];
                            int gy2, gx2;
                            if (hor) { gy2 = a / 4; gx2 = px / 4; }
                            else { gy2 = py / 4; gx2 = a / 4; }
                            if (gy2 < 0 || gy2 >= in->gh || gx2 < 0
                                || gx2 >= in->gw) continue;
                            istu[k] = (t[gy2 * in->gw + gx2] == a);
                        }
                    }
                    near4 = istu[0] || (off + 4 >= pu_len) || istu[1];
                    near8 = (off == 8) || istu[2]
                        || (off + 8 >= pu_len) || istu[3];
                }
                max_q = max_p = near4 ? 1 : (near8 ? 2 : 3);
            }
        }
        int side_p_large = max_p > 3;
        int side_q_large = max_q > 3;
        if (hor && (py % pl->ctu_size) == 0) side_p_large = 0;

        int qp_ed;
        if (in->qp_map != NULL)
            qp_ed = (in->qp_map[gp] + in->qp_map[gq] + 1) >> 1;
        else
            qp_ed = pl->qp;
        int idx_tc = iclip(qp_ed + LF_INTRA_TC_OFF * (bs - 1), 0,
                           LF_MAX_QP + LF_INTRA_TC_OFF);
        int idx_b = iclip(qp_ed, 0, LF_MAX_QP);
        int bd = pl->bit_depth;
        int tc = bd >= 10 ? (LF_TC_TABLE[idx_tc] << (bd - 10))
            : ((LF_TC_TABLE[idx_tc] + (1 << (9 - bd))) >> (10 - bd));
        int beta = LF_BETA_TABLE[idx_b] * pl->bdscale;
        int side_thresh = (beta + (beta >> 1)) >> 3;
        int thr_cut = tc * 10;

        Line lines[4];
        for (int i = 0; i < 4; i++) {
            if (hor) {
                lines[i].base = pl->ry + (int64_t)py * W + (px + i);
                lines[i].step = W;
            } else {
                lines[i].base = pl->ry + (int64_t)(py + i) * W + px;
                lines[i].step = 1;
            }
        }
        Line *l0 = &lines[0], *l3 = &lines[3];
        int dp0 = calc_dp(l0, 0), dq0 = calc_dq(l0);
        int dp3 = calc_dp(l3, 0), dq3 = calc_dq(l3);
        int dp0L = dp0, dq0L = dq0, dp3L = dp3, dq3L = dq3;
        if (side_p_large) {
            dp0L = (dp0L + iabs(LN(l0, -6) - 2 * LN(l0, -5)
                                + LN(l0, -4)) + 1) >> 1;
            dp3L = (dp3L + iabs(LN(l3, -6) - 2 * LN(l3, -5)
                                + LN(l3, -4)) + 1) >> 1;
        }
        if (side_q_large) {
            dq0L = (dq0L + iabs(LN(l0, 3) - 2 * LN(l0, 4)
                                + LN(l0, 5)) + 1) >> 1;
            dq3L = (dq3L + iabs(LN(l3, 3) - 2 * LN(l3, 4)
                                + LN(l3, 5)) + 1) >> 1;
        }
        int use_long = 0;
        if (side_p_large || side_q_large) {
            int d0L = dp0L + dq0L;
            int d3L = dp3L + dq3L;
            int dL = d0L + d3L;
            if (dL < beta) {
                int filter_p = (dp0L + dp3L) < side_thresh;
                int filter_q = (dq0L + dq3L) < side_thresh;
                int swL = use_strong(l0, 2 * d0L, beta, tc, side_p_large,
                                     side_q_large, max_p, max_q, 0)
                    && use_strong(l3, 2 * d3L, beta, tc, side_p_large,
                                  side_q_large, max_p, max_q, 0);
                if (swL) {
                    use_long = 1;
                    for (int i = 0; i < 4; i++)
                        pel_filter_luma(&lines[i], tc, 1, thr_cut,
                                        filter_p, filter_q, pl->clip_hi,
                                        side_p_large, side_q_large,
                                        max_p, max_q);
                }
            }
        }
        if (!use_long) {
            int d0 = dp0 + dq0;
            int d3 = dp3 + dq3;
            int d = d0 + d3;
            if (d < beta) {
                int filter_p = 0, filter_q = 0;
                if (max_p > 1 && max_q > 1) {
                    filter_p = (dp0 + dp3) < side_thresh;
                    filter_q = (dq0 + dq3) < side_thresh;
                }
                int sw = 0;
                if (max_p > 2 && max_q > 2)
                    sw = use_strong(l0, 2 * d0, beta, tc, 0, 0, 7, 7, 0)
                        && use_strong(l3, 2 * d3, beta, tc, 0, 0, 7, 7, 0);
                for (int i = 0; i < 4; i++)
                    pel_filter_luma(&lines[i], tc, sw, thr_cut,
                                    filter_p, filter_q, pl->clip_hi,
                                    0, 0, 3, 3);
            }
        }
    }

    /* ---- chroma ---- */
    if (!pl->chroma || !tu_edge) return;
    if (hor) { if ((cy / 4) % 4 != 0) return; }
    else { if ((cx / 4) % 4 != 0) return; }
    int loop_len = 2;
    int n_units = (hor ? cw : ch) / 4;
    int Wc = pl->W / 2;
    for (int u = 0; u < n_units; u++) {
        int px, py;
        if (hor) { px = cx + 4 * u; py = cy; }
        else { px = cx; py = cy + 4 * u; }
        int bs_cb, bs_cr;
        bs_chroma(in, px, py, hor, &bs_cb, &bs_cr);
        if (bs_cb == 0 && bs_cr == 0) continue;
        int gq = gidx(in, px, py);
        if (in->isp != NULL && in->isp[gq]) {
            int internal = hor ? (py != in->cu_y0[gq])
                : (px != in->cu_x0[gq]);
            if (internal) continue;
        }
        int gp = gidx(in, px - (hor ? 0 : 4), py - (hor ? 4 : 0));
        int size_q, size_p;
        if (in->tu_w != NULL) {
            if (in->isp != NULL && in->isp[gq])
                size_q = (hor ? in->cu_h[gq] : in->cu_w[gq]) / 2;
            else
                size_q = (hor ? in->tu_h[gq] : in->tu_w[gq]) / 2;
            if (in->isp != NULL && in->isp[gp])
                size_p = (hor ? in->cu_h[gp] : in->cu_w[gp]) / 2;
            else
                size_p = (hor ? in->tu_h[gp] : in->tu_w[gp]) / 2;
        } else {
            size_q = imin(hor ? in->cu_h[gq] : in->cu_w[gq], 64) / 2;
            size_p = imin(hor ? in->cu_h[gp] : in->cu_w[gp], 64) / 2;
        }
        int max_len = (size_q >= 8 && size_p >= 8) ? 3 : 1;
        int large_boundary = max_len >= 3;
        int chroma_hor_ctb = hor && (py % pl->ctu_size) == 0;
        int xc = px / 2, yc = py / 2;
        int bd = pl->bit_depth;
        int qp_c_ed;
        if (in->qp_map != NULL) {
            int avg = (in->qp_map[gp] + in->qp_map[gq] + 1) >> 1;
            int bd_off = 6 * (bd - 8);
            qp_c_ed = in->chroma_tab[avg + bd_off];
        } else {
            qp_c_ed = pl->qp_c;
        }
        for (int ci = 0; ci < 2; ci++) {
            int32_t *plane = ci == 0 ? pl->rcb : pl->rcr;
            int bs = ci == 0 ? bs_cb : bs_cr;
            if (!(bs == 2 || (large_boundary && bs == 1))) continue;
            int idx_tc = iclip(qp_c_ed + LF_INTRA_TC_OFF * (bs - 1), 0,
                               LF_MAX_QP + LF_INTRA_TC_OFF);
            int tc = bd >= 10 ? (LF_TC_TABLE[idx_tc] << (bd - 10))
                : ((LF_TC_TABLE[idx_tc] + (1 << (9 - bd)))
                   >> (10 - bd));
            Line cl[2];
            for (int i = 0; i < 2; i++) {
                if (hor) {
                    cl[i].base = plane + (int64_t)yc * Wc + (xc + i);
                    cl[i].step = Wc;
                } else {
                    cl[i].base = plane + (int64_t)(yc + i) * Wc + xc;
                    cl[i].step = 1;
                }
            }
            int use_long = 0;
            if (large_boundary) {
                int idx_b = iclip(qp_c_ed, 0, LF_MAX_QP);
                int beta = LF_BETA_TABLE[idx_b] * pl->bdscale;
                int dp0 = calc_dp(&cl[0], chroma_hor_ctb);
                int dq0 = calc_dq(&cl[0]);
                int dp3 = calc_dp(&cl[1], chroma_hor_ctb);
                int dq3 = calc_dq(&cl[1]);
                int d0 = dp0 + dq0, d3 = dp3 + dq3;
                if (d0 + d3 < beta) {
                    use_long = 1;
                    int sw = use_strong(&cl[0], 2 * d0, beta, tc, 0, 0,
                                        7, 7, chroma_hor_ctb)
                        && use_strong(&cl[1], 2 * d3, beta, tc, 0, 0,
                                      7, 7, chroma_hor_ctb);
                    for (int step = 0; step < loop_len; step++)
                        pel_filter_chroma(&cl[step], tc, sw, pl->clip_hi,
                                          large_boundary, chroma_hor_ctb);
                }
            }
            if (!use_long) {
                for (int step = 0; step < loop_len; step++)
                    pel_filter_chroma(&cl[step], tc, 0, pl->clip_hi,
                                      large_boundary, chroma_hor_ctb);
            }
        }
    }
}

/* sub-PU edge list entry */
typedef struct { int x, y, w, h, hor, pu0, pu_len; } SubEdge;
typedef struct { SubEdge *v; int n, cap; } SubList;

static void sl_push(SubList *sl, SubEdge e) {
    if (sl->n == sl->cap) {
        sl->cap = sl->cap ? sl->cap * 2 : 64;
        sl->v = (SubEdge *)realloc(sl->v, sl->cap * sizeof(SubEdge));
    }
    sl->v[sl->n++] = e;
}

/* main entry: returns 0 ok, -1 = partition inference failed */
int lf_deblock_frame(
    int32_t *ry, int32_t *rcb, int32_t *rcr, int H, int W,
    const int32_t *cu_x0, const int32_t *cu_y0,
    const int32_t *cu_w, const int32_t *cu_h,
    const uint8_t *is_intra, const uint8_t *cbf_y,
    const uint8_t *cbf_cb, const uint8_t *cbf_cr,
    const int32_t *mv, const int32_t *ref_poc,
    const int32_t *mv1, const int32_t *ref_poc1, int slice_is_b,
    const int32_t *tu_x0, const int32_t *tu_y0,
    const int32_t *tu_w, const int32_t *tu_h,
    const uint8_t *sub_pu, const int32_t *qp_map,
    const int32_t *chroma_tab, const uint8_t *isp,
    int qp, int qp_c, int bit_depth, int ctu_size) {
    LfInfo in;
    in.gh = H / 4; in.gw = W / 4;
    in.cu_x0 = cu_x0; in.cu_y0 = cu_y0; in.cu_w = cu_w; in.cu_h = cu_h;
    in.is_intra = is_intra; in.cbf_y = cbf_y;
    in.cbf_cb = cbf_cb; in.cbf_cr = cbf_cr;
    in.mv = mv; in.ref_poc = ref_poc;
    in.mv1 = mv1; in.ref_poc1 = ref_poc1; in.slice_is_b = slice_is_b;
    in.tu_x0 = tu_x0; in.tu_y0 = tu_y0; in.tu_w = tu_w; in.tu_h = tu_h;
    in.sub_pu = sub_pu; in.qp_map = qp_map; in.chroma_tab = chroma_tab;
    in.isp = isp;

    LfPlanes pl;
    pl.ry = ry; pl.rcb = rcb; pl.rcr = rcr; pl.H = H; pl.W = W;
    pl.qp = qp; pl.qp_c = qp_c;
    pl.clip_hi = (1 << bit_depth) - 1;
    pl.bdscale = 1 << (bit_depth - 8);
    pl.ctu_size = ctu_size;
    pl.chroma = rcb != NULL;
    pl.bit_depth = bit_depth;

    int nctu_y = (H + ctu_size - 1) / ctu_size;
    int nctu_x = (W + ctu_size - 1) / ctu_size;
    int nctu = nctu_y * nctu_x;

    /* per-CTU TU lists + sub-PU edge lists (built once, used twice) */
    RectList *tus = (RectList *)calloc(nctu, sizeof(RectList));
    SubList *subs = (SubList *)calloc(nctu, sizeof(SubList));
    int rc = 0;
    for (int cty = 0; cty < H && rc == 0; cty += ctu_size) {
        for (int ctx = 0; ctx < W && rc == 0; ctx += ctu_size) {
            int ci = (cty / ctu_size) * nctu_x + (ctx / ctu_size);
            RectList cus = {0};
            if (cu_coding_order(&in, ctx, cty, ctu_size, ctu_size,
                                &cus)) { rc = -1; free(cus.v); break; }
            RectList *tl = &tus[ci];
            for (int i = 0; i < cus.n; i++) {
                int cx = cus.v[i].x, cy = cus.v[i].y;
                int cw = cus.v[i].w, chh = cus.v[i].h;
                if (tu_x0 != NULL) {
                    /* unique TU rects within the CU (insertion order) */
                    int start = tl->n;
                    for (int gy = cy / 4; gy < (cy + chh) / 4; gy++)
                        for (int gx = cx / 4; gx < (cx + cw) / 4; gx++) {
                            int g = gy * in.gw + gx;
                            Rect r = {tu_x0[g], tu_y0[g],
                                      tu_w[g], tu_h[g]};
                            if (r.w <= 0) continue;
                            int dup = 0;
                            for (int k = start; k < tl->n; k++)
                                if (tl->v[k].x == r.x && tl->v[k].y == r.y
                                    && tl->v[k].w == r.w
                                    && tl->v[k].h == r.h) { dup = 1;
                                    break; }
                            if (!dup) rl_push(tl, r.x, r.y, r.w, r.h);
                        }
                } else {
                    int tw = imin(cw, 64), th = imin(chh, 64);
                    for (int ty = cy; ty < cy + chh; ty += th)
                        for (int tx = cx; tx < cx + cw; tx += tw)
                            rl_push(tl, tx, ty, tw, th);
                }
            }
            if (sub_pu != NULL) {
                for (int i = 0; i < cus.n; i++) {
                    int cx = cus.v[i].x, cy = cus.v[i].y;
                    int cw = cus.v[i].w, chh = cus.v[i].h;
                    if (!sub_pu[(cy / 4) * in.gw + (cx / 4)]) continue;
                    for (int off = 8; off < chh; off += 8) {
                        int found = 0;
                        for (int k = 0; k < tl->n; k++)
                            if (tl->v[k].x <= cx
                                && cx < tl->v[k].x + tl->v[k].w
                                && tl->v[k].y == cy + off) { found = 1;
                                break; }
                        if (!found)
                            sl_push(&subs[ci], (SubEdge){cx, cy + off,
                                cw, 4, 1, cy, chh});
                    }
                    for (int off = 8; off < cw; off += 8) {
                        int found = 0;
                        for (int k = 0; k < tl->n; k++)
                            if (tl->v[k].y <= cy
                                && cy < tl->v[k].y + tl->v[k].h
                                && tl->v[k].x == cx + off) { found = 1;
                                break; }
                        if (!found)
                            sl_push(&subs[ci], (SubEdge){cx + off, cy,
                                4, chh, 0, cx, cw});
                    }
                }
            }
            free(cus.v);
        }
    }

    if (rc == 0) {
        for (int hor = 0; hor <= 1; hor++) {
            for (int cty = 0; cty < H; cty += ctu_size) {
                for (int ctx = 0; ctx < W; ctx += ctu_size) {
                    int ci = (cty / ctu_size) * nctu_x
                        + (ctx / ctu_size);
                    RectList *tl = &tus[ci];
                    for (int i = 0; i < tl->n; i++)
                        deblock_cu_edge(&pl, &in, tl->v[i].x, tl->v[i].y,
                                        tl->v[i].w, tl->v[i].h, hor,
                                        1, 0, 0);
                    SubList *sl = &subs[ci];
                    for (int i = 0; i < sl->n; i++) {
                        if (sl->v[i].hor != hor) continue;
                        deblock_cu_edge(&pl, &in, sl->v[i].x, sl->v[i].y,
                                        sl->v[i].w, sl->v[i].h, hor, 0,
                                        sl->v[i].pu0, sl->v[i].pu_len);
                    }
                }
            }
        }
    }

    for (int i = 0; i < nctu; i++) { free(tus[i].v); free(subs[i].v); }
    free(tus); free(subs);
    return rc;
}
