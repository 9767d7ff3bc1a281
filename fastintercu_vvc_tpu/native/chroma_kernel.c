/* Native chroma intra leaf evaluation — C port of the commit-pass
 * chroma path in codec/encoder.py: _best_chroma_intra (DM vs
 * CCLM/MDLM by RD proxy), _chroma_pair_eval (separate Cb/Cr TQ +
 * joint-CbCr ICT masks), _tq_chroma (with LMCS chroma residual
 * scaling), and the CCLM machinery of ops/intra.py (cclm_downsample /
 * cclm_params / cclm_select_positions / cclm_predict —
 * IntraPrediction.cpp:266 predIntraChromaLM, :1744 xGetLMParameters).
 *
 * Bit-exact twin of the Python path (tests/test_native_commit.py
 * cross-checks whole-frame bitstreams).  Reuses the transform/quant
 * core of commit_kernel.c via the shared-object-internal externs
 * below.
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* from commit_kernel.c (same shared object) */
extern void ck_fwd_xform(const int32_t *resi, int w, int h, int kind_h,
                         int kind_v, int bd, int32_t *coeff);
extern void ck_inv_xform(const int32_t *coeff, int w, int h, int kind_h,
                         int kind_v, int bd, int32_t *resi);
extern int ck_quant_blk(const int32_t *coeff, int w, int h, int qp, int bd,
                        int is_irap, int transform_skip, int32_t *q);
extern void ck_dequant_blk(const int32_t *q, int w, int h, int qp, int bd,
                           int transform_skip, int32_t *dq);
extern void ck_sdh_apply(int32_t *q, int w, int h);
extern void ck_build_refs_sub(const int32_t *recon, int W, int H,
                              const uint8_t *coded, int gw, int gh,
                              int x, int y, int w, int h, int bd, int mrl,
                              int xmax, int sub, int32_t *top,
                              int32_t *left);
extern void ck_predict(int mode, const int32_t *top, const int32_t *left,
                       int w, int h, int bd, int mrl, int is_chroma,
                       int32_t *out);

#define MAX_CB 32            /* chroma TB <= 32 when luma CU <= 64 */
#define CSCALE_FP_PREC 11

static inline int cmin(int a, int b) { return a < b ? a : b; }
static inline int cmax(int a, int b) { return a > b ? a : b; }
static inline int cclip(int v, int lo, int hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}
static inline int blen(int64_t v) {
    int n = 0;
    while (v > 0) { v >>= 1; n++; }
    return n;
}

/* ---- LMCS chroma residual scaling (ops/lmcs.py scale_fwd/scale_inv) */
static void lmcs_scale_fwd(const int32_t *resi, int n, int scale, int bd,
                           int32_t *out) {
    int64_t max_abs = (1 << bd) - 1;
    for (int i = 0; i < n; i++) {
        int64_t v = resi[i];
        int64_t a = v < 0 ? -v : v;
        int64_t m = ((a << CSCALE_FP_PREC) + (scale >> 1)) / scale;
        int64_t o = v < 0 ? -m : m;
        if (o < -max_abs) o = -max_abs;
        if (o > max_abs) o = max_abs;
        out[i] = (int32_t)o;
    }
}

static void lmcs_scale_inv(const int32_t *resi, int n, int scale, int bd,
                           int32_t *out) {
    int64_t max_abs = (1 << bd) - 1;
    for (int i = 0; i < n; i++) {
        int64_t r = resi[i];
        if (r < -max_abs - 1) r = -max_abs - 1;
        if (r > max_abs) r = max_abs;
        int64_t a = r < 0 ? -r : r;
        int64_t m = (a * scale + ((int64_t)1 << (CSCALE_FP_PREC - 1)))
            >> CSCALE_FP_PREC;
        int64_t o = r < 0 ? -m : m;
        if (o < -32768) o = -32768;
        if (o > 32767) o = 32767;
        out[i] = (int32_t)o;
    }
}

/* ---- per-component TQ (encoder.py _tq_chroma) ---- */
typedef struct {
    int32_t q[MAX_CB * MAX_CB];
    int32_t rec[MAX_CB * MAX_CB];
    int cbf;
    int has_q;
    double ssd;
} CompOut;

static void tq_chroma(const int32_t *blk, const int32_t *pred, int wc,
                      int hc, int qp_c, int bd, int irap, int sdh,
                      int lmcs_scale, CompOut *o) {
    int n = wc * hc;
    int32_t resi[MAX_CB * MAX_CB], coeff[MAX_CB * MAX_CB];
    int32_t dq[MAX_CB * MAX_CB], r[MAX_CB * MAX_CB];
    for (int i = 0; i < n; i++) resi[i] = blk[i] - pred[i];
    if (lmcs_scale > 0) lmcs_scale_fwd(resi, n, lmcs_scale, bd, resi);
    ck_fwd_xform(resi, wc, hc, 0, 0, bd, coeff);
    o->cbf = ck_quant_blk(coeff, wc, hc, qp_c, bd, irap, 0, o->q);
    if (sdh && o->cbf) ck_sdh_apply(o->q, wc, hc);
    int hi = (1 << bd) - 1;
    if (o->cbf) {
        ck_dequant_blk(o->q, wc, hc, qp_c, bd, 0, dq);
        ck_inv_xform(dq, wc, hc, 0, 0, bd, r);
        if (lmcs_scale > 0) lmcs_scale_inv(r, n, lmcs_scale, bd, r);
        for (int i = 0; i < n; i++)
            o->rec[i] = cclip(pred[i] + r[i], 0, hi);
    } else {
        for (int i = 0; i < n; i++) o->rec[i] = cclip(pred[i], 0, hi);
    }
    o->has_q = 1;
    double s = 0.0;
    for (int i = 0; i < n; i++) {
        double d = (double)(blk[i] - o->rec[i]);
        s += d * d;
    }
    o->ssd = s;
}

/* RD proxy (encoder.py _best_chroma_intra cost / _chroma_pair_eval
 * proxy): SSD + lam * (extra bins + per-level 2 + log2(|q|+1)) */
static double chroma_proxy(const CompOut *a, const CompOut *b, int n,
                           double lam, double extra_bins) {
    double c = lam * extra_bins;
    const CompOut *two[2] = {a, b};
    for (int k = 0; k < 2; k++) {
        c += two[k]->ssd;
        if (!two[k]->has_q) continue;
        for (int i = 0; i < n; i++) {
            int aq = two[k]->q[i] < 0 ? -two[k]->q[i] : two[k]->q[i];
            if (aq > 0) c += lam * (2.0 + log2((double)aq + 1.0));
        }
    }
    return c;
}

/* ---- joint-CbCr pair evaluation (_chroma_pair_eval) ---- */
static double pair_eval(const int32_t *blk_cb, const int32_t *pred_cb,
                        const int32_t *blk_cr, const int32_t *pred_cr,
                        int wc, int hc, int qp_c, int bd, int irap,
                        int sdh, int joint_cbcr, int intra_cu,
                        int lmcs_scale, double lam,
                        CompOut *out_cb, CompOut *out_cr,
                        int *out_mask) {
    int n = wc * hc;
    tq_chroma(blk_cb, pred_cb, wc, hc, qp_c, bd, irap, sdh, lmcs_scale,
              out_cb);
    tq_chroma(blk_cr, pred_cr, wc, hc, qp_c, bd, irap, sdh, lmcs_scale,
              out_cr);
    *out_mask = 0;
    double best = chroma_proxy(out_cb, out_cr, n, lam,
                               (out_cb->cbf || out_cr->cbf) ? 1.0 : 0.0);
    if (!joint_cbcr) return best;

    int64_t res_cb[MAX_CB * MAX_CB], res_cr[MAX_CB * MAX_CB];
    int32_t tmp[MAX_CB * MAX_CB];
    if (lmcs_scale > 0) {
        int32_t t2[MAX_CB * MAX_CB];
        for (int i = 0; i < n; i++) t2[i] = blk_cb[i] - pred_cb[i];
        lmcs_scale_fwd(t2, n, lmcs_scale, bd, tmp);
        for (int i = 0; i < n; i++) res_cb[i] = tmp[i];
        for (int i = 0; i < n; i++) t2[i] = blk_cr[i] - pred_cr[i];
        lmcs_scale_fwd(t2, n, lmcs_scale, bd, tmp);
        for (int i = 0; i < n; i++) res_cr[i] = tmp[i];
    } else {
        for (int i = 0; i < n; i++) {
            res_cb[i] = blk_cb[i] - pred_cb[i];
            res_cr[i] = blk_cr[i] - pred_cr[i];
        }
    }
    int hi = (1 << bd) - 1;
    int masks[3];
    int n_masks = intra_cu ? 3 : 1;
    if (intra_cu) { masks[0] = 1; masks[1] = 2; masks[2] = 3; }
    else masks[0] = 3;
    CompOut jcb, jcr;
    for (int mi = 0; mi < n_masks; mi++) {
        int mask = masks[mi];
        int32_t c[MAX_CB * MAX_CB], coeff[MAX_CB * MAX_CB];
        int32_t q[MAX_CB * MAX_CB], dq[MAX_CB * MAX_CB];
        int32_t r[MAX_CB * MAX_CB];
        for (int i = 0; i < n; i++) {
            int64_t v;
            if (mask == 3) v = res_cb[i] + res_cr[i];
            else if (mask == 2) v = 4 * res_cb[i] + 2 * res_cr[i];
            else v = 4 * res_cr[i] + 2 * res_cb[i];
            int64_t d = mask == 3 ? 2 : 5;
            /* truncating division (numpy sign*abs//d twin) */
            int64_t a = v < 0 ? -v : v;
            int64_t t = a / d;
            c[i] = (int32_t)(v < 0 ? -t : t);
        }
        ck_fwd_xform(c, wc, hc, 0, 0, bd, coeff);
        int cbf = ck_quant_blk(coeff, wc, hc, qp_c, bd, irap, 0, q);
        if (sdh && cbf) ck_sdh_apply(q, wc, hc);
        if (!cbf) continue;
        ck_dequant_blk(q, wc, hc, qp_c, bd, 0, dq);
        ck_inv_xform(dq, wc, hc, 0, 0, bd, r);
        for (int i = 0; i < n; i++) {
            int64_t rr = r[i];
            int64_t rcb2, rcr2;
            if (mask == 3) { rcb2 = rr; rcr2 = rr; }
            else if (mask == 2) { rcb2 = rr; rcr2 = rr >> 1; }
            else { rcb2 = rr >> 1; rcr2 = rr; }
            jcb.rec[i] = (int32_t)rcb2;   /* staging, scaled below */
            jcr.rec[i] = (int32_t)rcr2;
        }
        if (lmcs_scale > 0) {
            lmcs_scale_inv(jcb.rec, n, lmcs_scale, bd, jcb.rec);
            lmcs_scale_inv(jcr.rec, n, lmcs_scale, bd, jcr.rec);
        }
        double scb = 0.0, scr = 0.0;
        for (int i = 0; i < n; i++) {
            int v1 = cclip(pred_cb[i] + jcb.rec[i], 0, hi);
            int v2 = cclip(pred_cr[i] + jcr.rec[i], 0, hi);
            jcb.rec[i] = v1;
            jcr.rec[i] = v2;
            double d1 = (double)(blk_cb[i] - v1);
            double d2 = (double)(blk_cr[i] - v2);
            scb += d1 * d1;
            scr += d2 * d2;
        }
        jcb.ssd = scb; jcr.ssd = scr;
        jcb.cbf = (mask & 2) ? 1 : 0;
        jcr.cbf = (mask & 1) ? 1 : 0;
        jcb.has_q = (mask & 2) ? 1 : 0;
        jcr.has_q = (mask == 1) ? 1 : 0;
        if (jcb.has_q) memcpy(jcb.q, q, sizeof(int32_t) * (size_t)n);
        if (jcr.has_q) memcpy(jcr.q, q, sizeof(int32_t) * (size_t)n);
        double cost = chroma_proxy(&jcb, &jcr, n, lam, 1.0);
        if (cost < best) {
            best = cost;
            *out_cb = jcb;
            *out_cr = jcr;
            *out_mask = mask;
        }
    }
    return best;
}

/* ---- CCLM (ops/intra.py) ---- */
static const int DIV_SIG_TABLE[16] = {0, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2,
                                      1, 1, 1, 1, 0};

static inline int32_t rc_clip(const int32_t *ry, int W, int H, int yy,
                              int xx) {
    if (yy < 0) yy = 0;
    if (yy > H - 1) yy = H - 1;
    if (xx < 0) xx = 0;
    if (xx > W - 1) xx = W - 1;
    return ry[(int64_t)yy * W + xx];
}

static inline int32_t ds6(const int32_t *ry, int W, int H, int yy,
                          int xx, int xm1) {
    return (4 + 2 * rc_clip(ry, W, H, yy, xx)
            + rc_clip(ry, W, H, yy, xx + 1) + rc_clip(ry, W, H, yy, xm1)
            + 2 * rc_clip(ry, W, H, yy + 1, xx)
            + rc_clip(ry, W, H, yy + 1, xx + 1)
            + rc_clip(ry, W, H, yy + 1, xm1)) >> 3;
}

static void cclm_params_c(const int32_t *sel_l, const int32_t *sel_c,
                          int cnt, int bd, int64_t *a_out, int64_t *b_out,
                          int *sh_out) {
    if (cnt == 0) {
        *a_out = 0; *b_out = (int64_t)1 << (bd - 1); *sh_out = 0;
        return;
    }
    int64_t lum[4] = {0, 0, 0, 0}, chr_[4] = {0, 0, 0, 0};
    for (int i = 0; i < cnt; i++) { lum[i] = sel_l[i]; chr_[i] = sel_c[i]; }
    if (cnt == 2) {
        lum[3] = lum[0]; chr_[3] = chr_[0];
        lum[2] = lum[1]; chr_[2] = chr_[1];
        lum[0] = lum[1]; chr_[0] = chr_[1];
        lum[1] = lum[3]; chr_[1] = chr_[3];
    }
    int mn[2] = {0, 2}, mx[2] = {1, 3};
    int t;
    if (lum[mn[0]] > lum[mn[1]]) { t = mn[0]; mn[0] = mn[1]; mn[1] = t; }
    if (lum[mx[0]] > lum[mx[1]]) { t = mx[0]; mx[0] = mx[1]; mx[1] = t; }
    if (lum[mn[0]] > lum[mx[1]]) {
        int a0 = mn[0], a1 = mn[1];
        mn[0] = mx[0]; mn[1] = mx[1];
        mx[0] = a0; mx[1] = a1;
    }
    if (lum[mn[1]] > lum[mx[0]]) { t = mn[1]; mn[1] = mx[0]; mx[0] = t; }
    int64_t min_l = (lum[mn[0]] + lum[mn[1]] + 1) >> 1;
    int64_t min_c = (chr_[mn[0]] + chr_[mn[1]] + 1) >> 1;
    int64_t max_l = (lum[mx[0]] + lum[mx[1]] + 1) >> 1;
    int64_t max_c = (chr_[mx[0]] + chr_[mx[1]] + 1) >> 1;
    int64_t diff = max_l - min_l;
    if (diff <= 0) { *a_out = 0; *b_out = min_c; *sh_out = 0; return; }
    int64_t diff_c = max_c - min_c;
    int x = blen(diff) - 1;
    int64_t norm_diff = ((diff << 4) >> x) & 15;
    int64_t v = DIV_SIG_TABLE[norm_diff] | 8;
    x += (norm_diff != 0);
    int y = diff_c ? (blen(diff_c < 0 ? -diff_c : diff_c) - 1) + 1 : 1;
    int64_t add = ((int64_t)1 << y) >> 1;
    int64_t a = (diff_c * v + add) >> y;
    int shift = 3 + x - y;
    if (shift < 1) {
        shift = 1;
        a = a == 0 ? 0 : (a < 0 ? -15 : 15);
    }
    int64_t b = min_c - ((a * min_l) >> shift);
    *a_out = a; *b_out = b; *sh_out = shift;
}

/* mode ids matching ops/intra.py */
#define LM_CHROMA_IDX 81
#define MDLM_L_IDX 82
#define MDLM_T_IDX 83

typedef struct {
    const int32_t *org_cb, *org_cr, *rec_cb, *rec_cr;
    int Wc, Hc;
    const int32_t *ry;
    int W, H;
    const uint8_t *coded;
    int gw, gh;
    int xmax;
} ChromaCtx;

/* _cclm_avail twin */
static int unit_ok(const ChromaCtx *cc, int cx, int cy) {
    int lx = 2 * cx, ly = 2 * cy;
    if (lx < 0 || ly < 0 || lx / 4 >= cc->gw || ly / 4 >= cc->gh)
        return 0;
    if (cc->xmax >= 0 && lx >= cc->xmax) return 0;
    return cc->coded[(ly / 4) * cc->gw + lx / 4] != 0;
}

static void cclm_avail(const ChromaCtx *cc, int xc, int yc, int wc,
                       int hc, int *above, int *left, int *ar, int *lb) {
    *above = yc > 0;
    for (int i = 0; *above && i < wc / 2; i++)
        if (!unit_ok(cc, xc + 2 * i, yc - 1)) *above = 0;
    *left = xc > 0;
    for (int j = 0; *left && j < hc / 2; j++)
        if (!unit_ok(cc, xc - 1, yc + 2 * j)) *left = 0;
    *ar = 0;
    if (*above)
        for (int i = 0; i < wc / 2; i++) {
            if (unit_ok(cc, xc + wc + 2 * i, yc - 1)) (*ar)++;
            else break;
        }
    *lb = 0;
    if (*left)
        for (int j = 0; j < hc / 2; j++) {
            if (unit_ok(cc, xc - 1, yc + hc + 2 * j)) (*lb)++;
            else break;
        }
}

/* one CCLM mode: predictions for cb+cr -> separate TQ (no joint) */
static double eval_cclm(const ChromaCtx *cc, int x, int y, int w, int h,
                        int mode, int first_ctu_row, int qp_c, int bd,
                        int irap, int sdh, int lmcs_scale, double lam,
                        double extra_bins, CompOut *out_cb,
                        CompOut *out_cr) {
    int xc = x / 2, yc = y / 2, wc = w / 2, hc = h / 2;
    int above, left, ar_u, lb_u;
    cclm_avail(cc, xc, yc, wc, hc, &above, &left, &ar_u, &lb_u);
    /* cclm_select_positions — the MDLM overrides apply to template
     * SELECTION only (sel_above/sel_left); the downsample below keeps
     * the original availability (Python _chroma_cclm passes the
     * un-overridden above/left into cclm_downsample) */
    int sel_above = above, sel_left = left;
    int added_ar = 0, added_lb = 0, actual_top, actual_left;
    const int unit = 2;
    if (mode == MDLM_T_IDX) {
        sel_left = 0;
        int ar = cmin(ar_u, hc / unit);
        added_ar = ar * unit;
        actual_top = sel_above ? unit * (wc / unit + ar) : 0;
        actual_left = 0;
    } else if (mode == MDLM_L_IDX) {
        sel_above = 0;
        int lb = cmin(lb_u, wc / unit);
        added_lb = lb * unit;
        actual_left = sel_left ? unit * (hc / unit + lb) : 0;
        actual_top = 0;
    } else {
        actual_top = sel_above ? wc : 0;
        actual_left = sel_left ? hc : 0;
    }
    int above_is4 = sel_left ? 0 : 1;
    int left_is4 = sel_above ? 0 : 1;
    int tpos[4], lpos[4], n_t = 0, n_l = 0;
    if (sel_above) {
        int start = actual_top >> (2 + above_is4);
        int step = cmax(1, actual_top >> (1 + above_is4));
        int cnt_t = cmin(actual_top, (1 + above_is4) << 1);
        int pos = start;
        for (int i = 0; i < cnt_t; i++) { tpos[n_t++] = pos; pos += step; }
    }
    if (sel_left) {
        int start = actual_left >> (2 + left_is4);
        int step = cmax(1, actual_left >> (1 + left_is4));
        int cnt_l = cmin(actual_left, (1 + left_is4) << 1);
        int pos = start;
        for (int i = 0; i < cnt_l; i++) { lpos[n_l++] = pos; pos += step; }
    }
    /* cclm_downsample */
    int x0 = 2 * xc, y0 = 2 * yc;
    int32_t inner[MAX_CB * MAX_CB];
    for (int j = 0; j < hc; j++) {
        int yy = y0 + 2 * j;
        for (int i = 0; i < wc; i++) {
            int xx = x0 + 2 * i;
            int xm1 = (i == 0 && !left) ? xx : xx - 1;
            inner[j * wc + i] = ds6(cc->ry, cc->W, cc->H, yy, xx, xm1);
        }
    }
    int32_t ds_top[2 * MAX_CB];
    if (above) {
        int nta = wc + added_ar;
        for (int i = 0; i < nta; i++) {
            int xx = x0 + 2 * i;
            int xm1 = (i == 0 && !left) ? xx : xx - 1;
            if (first_ctu_row)
                ds_top[i] = (2 + 2 * rc_clip(cc->ry, cc->W, cc->H,
                                             y0 - 1, xx)
                             + rc_clip(cc->ry, cc->W, cc->H, y0 - 1,
                                       xx + 1)
                             + rc_clip(cc->ry, cc->W, cc->H, y0 - 1,
                                       xm1)) >> 2;
            else
                ds_top[i] = ds6(cc->ry, cc->W, cc->H, y0 - 2, xx, xm1);
        }
    }
    int32_t ds_left[2 * MAX_CB];
    if (left) {
        int nla = hc + added_lb;
        for (int j = 0; j < nla; j++)
            ds_left[j] = ds6(cc->ry, cc->W, cc->H, y0 + 2 * j, x0 - 2,
                             x0 - 3);
    }
    /* per-component: pick template samples, fit, predict, TQ */
    const int32_t *orgs[2] = {cc->org_cb, cc->org_cr};
    const int32_t *recs[2] = {cc->rec_cb, cc->rec_cr};
    CompOut *outs[2] = {out_cb, out_cr};
    int hi = (1 << bd) - 1;
    for (int k = 0; k < 2; k++) {
        int32_t sel_l[8], sel_c[8];
        int cnt = 0;
        if (sel_above)
            for (int i = 0; i < n_t; i++) {
                sel_l[cnt] = ds_top[tpos[i]];
                sel_c[cnt] = recs[k][(int64_t)(yc - 1) * cc->Wc
                                     + xc + tpos[i]];
                cnt++;
            }
        if (sel_left)
            for (int i = 0; i < n_l; i++) {
                sel_l[cnt] = ds_left[lpos[i]];
                sel_c[cnt] = recs[k][(int64_t)(yc + lpos[i]) * cc->Wc
                                     + xc - 1];
                cnt++;
            }
        int64_t a, b;
        int sh;
        cclm_params_c(sel_l, sel_c, cnt, bd, &a, &b, &sh);
        int32_t pred[MAX_CB * MAX_CB], blk[MAX_CB * MAX_CB];
        for (int i = 0; i < wc * hc; i++) {
            int64_t val = (((int64_t)inner[i] * a) >> sh) + b;
            pred[i] = (int32_t)cclip((int)val, 0, hi);
        }
        for (int j = 0; j < hc; j++)
            memcpy(blk + j * wc,
                   orgs[k] + (int64_t)(yc + j) * cc->Wc + xc,
                   sizeof(int32_t) * (size_t)wc);
        tq_chroma(blk, pred, wc, hc, qp_c, bd, irap, sdh, lmcs_scale,
                  outs[k]);
    }
    return chroma_proxy(out_cb, out_cr, wc * hc, lam, extra_bins);
}

/* ---- public entry: _best_chroma_intra twin ----
 * flags: bit0 is_irap, bit1 sdh, bit2 joint_cbcr, bit3 cclm
 * meta out: [0] chroma_mode (0=dm else LM/MDLM idx), [1] joint mask,
 *           [2] cbf_cb, [3] cbf_cr, [4] has_q_cb, [5] has_q_cr
 * ssds out: [ssd_cb, ssd_cr] */
void ck_eval_chroma(const int32_t *org_cb, const int32_t *org_cr,
                    const int32_t *rec_cb, const int32_t *rec_cr,
                    int Wc, int Hc,
                    const int32_t *recon_y, int W, int H,
                    const uint8_t *coded, int gw, int gh,
                    int x, int y, int w, int h,
                    int luma_mode, int qp_c, int bd, int flags,
                    int xmax, int ctu_size, int lmcs_scale, double lam,
                    int32_t *q_cb, int32_t *q_cr,
                    int32_t *orec_cb, int32_t *orec_cr,
                    int32_t *meta, double *ssds) {
    int irap = flags & 1, sdh = (flags >> 1) & 1;
    int joint = (flags >> 2) & 1, cclm = (flags >> 3) & 1;
    int xc = x / 2, yc = y / 2, wc = w / 2, hc = h / 2;
    int n = wc * hc;
    ChromaCtx cc = {org_cb, org_cr, rec_cb, rec_cr, Wc, Hc,
                    recon_y, W, H, coded, gw, gh, xmax};

    /* ---- DM ---- */
    CompOut dm_cb, dm_cr;
    int dm_mask = 0;
    {
        int32_t top[4 * MAX_CB + 4], leftr[4 * MAX_CB + 4];
        int32_t pred_cb[MAX_CB * MAX_CB], pred_cr[MAX_CB * MAX_CB];
        int32_t blk_cb[MAX_CB * MAX_CB], blk_cr[MAX_CB * MAX_CB];
        ck_build_refs_sub(rec_cb, Wc, Hc, coded, gw, gh, xc, yc, wc, hc,
                          bd, 0, xmax, 2, top, leftr);
        ck_predict(luma_mode, top, leftr, wc, hc, bd, 0, 1, pred_cb);
        ck_build_refs_sub(rec_cr, Wc, Hc, coded, gw, gh, xc, yc, wc, hc,
                          bd, 0, xmax, 2, top, leftr);
        ck_predict(luma_mode, top, leftr, wc, hc, bd, 0, 1, pred_cr);
        for (int j = 0; j < hc; j++) {
            memcpy(blk_cb + j * wc,
                   org_cb + (int64_t)(yc + j) * Wc + xc,
                   sizeof(int32_t) * (size_t)wc);
            memcpy(blk_cr + j * wc,
                   org_cr + (int64_t)(yc + j) * Wc + xc,
                   sizeof(int32_t) * (size_t)wc);
        }
        pair_eval(blk_cb, pred_cb, blk_cr, pred_cr, wc, hc, qp_c, bd,
                  irap, sdh, joint, 1, lmcs_scale, lam,
                  &dm_cb, &dm_cr, &dm_mask);
    }
    double best_cost = chroma_proxy(&dm_cb, &dm_cr, n, lam, 2.0)
        + (dm_mask ? 0.0 : 0.0);
    /* note: _best_chroma_intra costs dm with bins=2 regardless of the
     * joint mask chosen inside pair_eval (same as Python: cost(dm, 2)) */
    CompOut *best_cb = &dm_cb, *best_cr = &dm_cr;
    int best_mode = 0, best_mask = dm_mask;

    CompOut lm_cb, lm_cr, md_cb, md_cr;
    if (cclm) {
        int first_row = (y % ctu_size) == 0;
        double c = eval_cclm(&cc, x, y, w, h, LM_CHROMA_IDX, first_row,
                             qp_c, bd, irap, sdh, lmcs_scale, lam, 2.0,
                             &lm_cb, &lm_cr);
        int lm_beats = c < best_cost;
        if (lm_beats) {
            best_cost = c;
            best_cb = &lm_cb; best_cr = &lm_cr;
            best_mode = LM_CHROMA_IDX; best_mask = 0;
        }
        if (lm_beats) {
            static const int mds[2] = {MDLM_L_IDX, MDLM_T_IDX};
            for (int k = 0; k < 2; k++) {
                CompOut t_cb, t_cr;
                double c2 = eval_cclm(&cc, x, y, w, h, mds[k], first_row,
                                      qp_c, bd, irap, sdh, lmcs_scale,
                                      lam, 3.0, &t_cb, &t_cr);
                if (c2 < best_cost) {
                    best_cost = c2;
                    md_cb = t_cb; md_cr = t_cr;
                    best_cb = &md_cb; best_cr = &md_cr;
                    best_mode = mds[k]; best_mask = 0;
                }
            }
        }
    }

    memcpy(orec_cb, best_cb->rec, sizeof(int32_t) * (size_t)n);
    memcpy(orec_cr, best_cr->rec, sizeof(int32_t) * (size_t)n);
    if (best_cb->has_q) memcpy(q_cb, best_cb->q,
                               sizeof(int32_t) * (size_t)n);
    if (best_cr->has_q) memcpy(q_cr, best_cr->q,
                               sizeof(int32_t) * (size_t)n);
    meta[0] = best_mode;
    meta[1] = best_mask;
    meta[2] = best_cb->cbf;
    meta[3] = best_cr->cbf;
    meta[4] = best_cb->has_q;
    meta[5] = best_cr->has_q;
    ssds[0] = best_cb->ssd;
    ssds[1] = best_cr->ssd;
}

/* ---- standalone pair evaluation for inter CUs (_chroma_inter ->
 * _chroma_pair_eval with intra_cu=0): predictions are produced by the
 * caller (motion compensation), TQ + joint-CbCr ICT run here.
 * flags: bit0 is_irap, bit1 sdh, bit2 joint_cbcr, bit3 intra_cu */
void ck_pair_eval(const int32_t *blk_cb, const int32_t *pred_cb,
                  const int32_t *blk_cr, const int32_t *pred_cr,
                  int wc, int hc, int qp_c, int bd, int flags,
                  int lmcs_scale, double lam,
                  int32_t *q_cb, int32_t *q_cr,
                  int32_t *orec_cb, int32_t *orec_cr,
                  int32_t *meta, double *ssds) {
    int irap = flags & 1, sdh = (flags >> 1) & 1;
    int joint = (flags >> 2) & 1, intra_cu = (flags >> 3) & 1;
    CompOut cb, cr;
    int mask = 0;
    pair_eval(blk_cb, pred_cb, blk_cr, pred_cr, wc, hc, qp_c, bd, irap,
              sdh, joint, intra_cu, lmcs_scale, lam, &cb, &cr, &mask);
    int n = wc * hc;
    memcpy(orec_cb, cb.rec, sizeof(int32_t) * (size_t)n);
    memcpy(orec_cr, cr.rec, sizeof(int32_t) * (size_t)n);
    if (cb.has_q) memcpy(q_cb, cb.q, sizeof(int32_t) * (size_t)n);
    if (cr.has_q) memcpy(q_cr, cr.q, sizeof(int32_t) * (size_t)n);
    meta[0] = 0;
    meta[1] = mask;
    meta[2] = cb.cbf;
    meta[3] = cr.cbf;
    meta[4] = cb.has_q;
    meta[5] = cr.has_q;
    ssds[0] = cb.ssd;
    ssds[1] = cr.ssd;
}
