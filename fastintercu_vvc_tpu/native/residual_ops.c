/* Native residual_coding bin-op generator.
 *
 * Emits the exact bin-op stream (same format as cabac_engine.c /
 * OpRecorder) for one TU component's quantized levels. Behavioral
 * parity with codec/residual.py write_residual_coding (itself parity
 * with CABACWriter.cpp residual_coding :2624 and ContextModelling.h) —
 * the per-coefficient context derivation is the hottest loop of the
 * commit pass, so it runs natively.
 *
 * Scope: dep-quant off; sign-data-hiding supported (the CTC config
 * codes with SDH on — CABACWriter.cpp:3011-3017 hidden-sign rule).
 * The Python writer remains the fallback for dep-quant streams.
 */

#include <stdint.h>
#include <stdlib.h>

#define K_CTX (0u << 28)
#define K_EP (1u << 28)
#define K_EPS (2u << 28)

static const int32_t group_idx[64] = {
    0, 1, 2, 3, 4, 4, 5, 5, 6, 6, 6, 6, 7, 7, 7, 7,
    8, 8, 8, 8, 8, 8, 8, 8, 9, 9, 9, 9, 9, 9, 9, 9,
    10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10, 10,
    11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11, 11};
static const int32_t min_in_group[14] = {0, 1, 2,  3,  4,  6,  8,
                                         12, 16, 24, 32, 48, 64, 96};
static const int32_t go_rice_pars[32] = {0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1,
                                         1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
                                         2, 2, 2, 2, 2, 2, 3, 3, 3, 3};

typedef struct {
  uint32_t *out;
  int64_t n;
  int64_t cap;
} Ops;

static void emit(Ops *o, uint32_t op) {
  if (o->n < o->cap) o->out[o->n] = op;
  o->n++;
}

static void ctx_bin(Ops *o, int bin, int ctx) {
  emit(o, K_CTX | ((uint32_t)ctx << 1) | (uint32_t)bin);
}

static void ep_bin(Ops *o, int bin) { emit(o, K_EP | (uint32_t)bin); }

static void ep_bins(Ops *o, uint32_t bins, int nbits) {
  while (nbits > 20) {
    nbits -= 20;
    emit(o, K_EPS | (20u << 20) | ((bins >> nbits) & 0xFFFFF));
    bins &= (1u << nbits) - 1;
  }
  emit(o, K_EPS | ((uint32_t)nbits << 20) | bins);
}

/* BinEncoderBase::encodeRemAbsEP (Golomb-Rice + EG(k)). */
static void rem_abs_ep(Ops *o, uint32_t bins, int rice) {
  const int cutoff = 5, max_range = 15;
  uint32_t threshold = (uint32_t)cutoff << rice;
  if (bins < threshold) {
    int length = (int)(bins >> rice) + 1;
    ep_bins(o, (1u << length) - 2, length);
    if (rice) ep_bins(o, bins & ((1u << rice) - 1), rice);
  } else {
    int max_prefix_len = 32 - cutoff - max_range;
    int prefix_len = 0, suffix_len;
    uint32_t code_value = (bins >> rice) - cutoff;
    if (code_value >= (1u << max_prefix_len) - 1) {
      prefix_len = max_prefix_len;
      suffix_len = max_range;
    } else {
      while (code_value > (2u << prefix_len) - 2) prefix_len++;
      suffix_len = prefix_len + rice + 1;
    }
    int total_prefix_len = prefix_len + cutoff;
    uint32_t bit_mask = (1u << rice) - 1;
    uint32_t prefix = (1u << total_prefix_len) - 1;
    uint32_t suffix =
        ((code_value - ((1u << prefix_len) - 1)) << rice) | (bins & bit_mask);
    ep_bins(o, prefix, total_prefix_len);
    ep_bins(o, suffix, suffix_len);
  }
}

/* plain up-right diagonal positions into xs/ys; returns count */
static int diag_positions(int w, int h, int32_t *xs, int32_t *ys) {
  int n = 0;
  for (int d = 0; d < w + h - 1; d++) {
    int y0 = d < h - 1 ? d : h - 1;
    for (int y = y0; y >= 0; y--) {
      int x = d - y;
      if (x < w) {
        xs[n] = x;
        ys[n] = y;
        n++;
      }
    }
  }
  return n;
}

/* ctxb layout (from the Python wrapper):
 *  0 ctx_last_x  1 ctx_last_y  2 sig0  3 sig1  4 sig2  5 par
 *  6 gt1  7 gt2  8 sig_group  9 last_off_x  10 last_off_y
 *  11 last_shift_x  12 last_shift_y  13 max_last_x  14 max_last_y
 */
int64_t residual_ops(const int32_t *coeff, int w, int h, int is_chroma,
                     int log2_cg_w, int log2_cg_h, int sign_hiding,
                     const int32_t *ctxb, uint32_t *out, int64_t cap) {
  Ops o = {out, 0, cap};
  int zw = w < 32 ? w : 32, zh = h < 32 ? h : 32;
  int n_scan = zw * zh;
  if (n_scan > 1024) return -1;
  int log2_cg = log2_cg_w + log2_cg_h;
  int cg_w = 1 << log2_cg_w, cg_h = 1 << log2_cg_h;
  int wig = zw >> log2_cg_w, hig = zh >> log2_cg_h;

  /* grouped scan */
  int32_t gxs[256], gys[256], pxs[64], pys[64];
  int n_cg = diag_positions(wig, hig, gxs, gys);
  int n_in = diag_positions(cg_w, cg_h, pxs, pys);
  static int32_t sx[1024], sy[1024];
  {
    int n = 0;
    for (int g = 0; g < n_cg; g++)
      for (int i = 0; i < n_in; i++) {
        sx[n] = gxs[g] * cg_w + pxs[i];
        sy[n] = gys[g] * cg_h + pys[i];
        n++;
      }
  }

#define CF(x, y) coeff[(y) * w + (x)]
#define CP(pos) CF(sx[pos], sy[pos])

  /* last position + per-CG significance */
  int scan_pos_last = -1;
  uint8_t cg_sig[256] = {0};
  for (int p = 0; p < n_scan; p++)
    if (CP(p)) {
      scan_pos_last = p;
      cg_sig[p >> log2_cg] = 1;
    }
  if (scan_pos_last < 0) return -2;

  /* ---- last_sig_coeff ---- */
  int last_x = sx[scan_pos_last], last_y = sy[scan_pos_last];
  {
    int gx = group_idx[last_x], gy = group_idx[last_y];
    int off_x = ctxb[9], off_y = ctxb[10];
    int sh_x = ctxb[11], sh_y = ctxb[12];
    for (int c = 0; c < gx; c++)
      ctx_bin(&o, 1, ctxb[0] + off_x + (c >> sh_x));
    if (gx < ctxb[13]) ctx_bin(&o, 0, ctxb[0] + off_x + (gx >> sh_x));
    for (int c = 0; c < gy; c++)
      ctx_bin(&o, 1, ctxb[1] + off_y + (c >> sh_y));
    if (gy < ctxb[14]) ctx_bin(&o, 0, ctxb[1] + off_y + (gy >> sh_y));
    if (gx > 3) {
      int px = last_x - min_in_group[gx];
      for (int i = ((gx - 2) >> 1) - 1; i >= 0; i--)
        ep_bin(&o, (px >> i) & 1);
    }
    if (gy > 3) {
      int py = last_y - min_in_group[gy];
      for (int i = ((gy - 2) >> 1) - 1; i >= 0; i--)
        ep_bin(&o, (py >> i) & 1);
    }
  }

  /* per-CG sig-group grid membership for context derivation */
  uint8_t grid[256] = {0};   /* [cgy * wig + cgx] */
  int reg_bin_limit = (zw * zh * 28) >> 4;

  for (int subset = scan_pos_last >> log2_cg; subset >= 0; subset--) {
    int cgx = gxs[subset], cgy = gys[subset];
    int cg_pos = cgy * wig + cgx;
    if (cg_sig[subset]) grid[cg_pos] = 1;
    int sig_right = (cgx + 1 < wig) ? grid[cg_pos + 1] : 0;
    int sig_lower = (cgy + 1 < hig) ? grid[cg_pos + wig] : 0;
    int sig_group_ctx = ctxb[8] + ((sig_right || sig_lower) ? 1 : 0);

    int min_sub_pos = subset << log2_cg;
    int max_sub_pos = min_sub_pos + (1 << log2_cg) - 1;
    int is_last = (scan_pos_last >> log2_cg) == subset;
    int first_sig_pos = is_last ? scan_pos_last : max_sub_pos;
    int next_sig_pos = first_sig_pos;
    int is_not_first = subset > 0;

    if (!is_last && is_not_first) {
      ctx_bin(&o, cg_sig[subset] ? 1 : 0, sig_group_ctx);
      if (!cg_sig[subset]) continue;
    }

    int infer_sig_pos = (next_sig_pos != scan_pos_last)
                            ? (is_not_first ? min_sub_pos : -1)
                            : next_sig_pos;
    int num_non_zero = 0;
    uint32_t sign_pattern = 0;
    int rem_reg_bins = reg_bin_limit;
    int tmpl_diag = -1, tmpl_sum1 = -1;
    int first_nz_pos = next_sig_pos, last_nz_pos = -1;

    while (next_sig_pos >= min_sub_pos && rem_reg_bins >= 4) {
      int x = sx[next_sig_pos], y = sy[next_sig_pos];
      int c = CF(x, y);
      int sig = c != 0;
      int need_ctx = (num_non_zero || next_sig_pos != infer_sig_pos);
      if (need_ctx || next_sig_pos != scan_pos_last) {
        /* sigCtxIdAbs template (ContextModelling.h:108) */
        int diag = x + y, sum_abs = 0, num_pos = 0;
#define UPD(cx, cy)                                    \
  do {                                                 \
    int a = CF(cx, cy);                                \
    if (a < 0) a = -a;                                 \
    int m = 4 + (a & 1);                               \
    sum_abs += (a < m) ? a : m;                        \
    num_pos += (a != 0);                               \
  } while (0)
        if (x < w - 1) {
          UPD(x + 1, y);
          if (x < w - 2) UPD(x + 2, y);
          if (y < h - 1) UPD(x + 1, y + 1);
        }
        if (y < h - 1) {
          UPD(x, y + 1);
          if (y < h - 2) UPD(x, y + 2);
        }
#undef UPD
        int ctx_ofs = ((sum_abs + 1) >> 1);
        if (ctx_ofs > 3) ctx_ofs = 3;
        ctx_ofs += (diag < 2) ? 4 : 0;
        if (!is_chroma) ctx_ofs += (diag < 5) ? 4 : 0;
        tmpl_diag = diag;
        tmpl_sum1 = sum_abs - num_pos;
        if (need_ctx) {
          ctx_bin(&o, sig, ctxb[2] + ctx_ofs);   /* state 0: set 0 */
          rem_reg_bins -= 1;
        }
      }

      if (sig) {
        /* ctxOffsetAbs (ContextModelling.h:152) */
        int ctx_off = 0;
        if (tmpl_diag != -1) {
          int t = tmpl_sum1 < 4 ? tmpl_sum1 : 4;
          ctx_off = t + 1;
          if (tmpl_diag == 0)
            ctx_off += is_chroma ? 5 : 15;
          else if (!is_chroma)
            ctx_off += tmpl_diag < 3 ? 10 : (tmpl_diag < 10 ? 5 : 0);
        }
        num_non_zero++;
        first_nz_pos = next_sig_pos;
        if (next_sig_pos > last_nz_pos) last_nz_pos = next_sig_pos;
        int rem_abs = (c < 0 ? -c : c) - 1;
        if (next_sig_pos != scan_pos_last) sign_pattern <<= 1;
        if (c < 0) sign_pattern += 1;
        int gt1 = rem_abs != 0;
        ctx_bin(&o, gt1, ctxb[6] + ctx_off);
        rem_reg_bins -= 1;
        if (gt1) {
          rem_abs -= 1;
          ctx_bin(&o, rem_abs & 1, ctxb[5] + ctx_off);
          rem_abs >>= 1;
          rem_reg_bins -= 1;
          ctx_bin(&o, rem_abs != 0, ctxb[7] + ctx_off);
          rem_reg_bins -= 1;
        }
      }
      next_sig_pos--;
    }

    int first_pos_mode2 = next_sig_pos;
    reg_bin_limit = rem_reg_bins;

    /* templateAbsSum (ContextModelling.h:166) */
#define TSUM(pos, base, dst)                               \
  do {                                                     \
    int x = sx[pos], y = sy[pos], s = 0, a;                \
    if (x < w - 1) {                                       \
      a = CF(x + 1, y); s += a < 0 ? -a : a;               \
      if (x < w - 2) { a = CF(x + 2, y); s += a < 0 ? -a : a; } \
      if (y < h - 1) { a = CF(x + 1, y + 1); s += a < 0 ? -a : a; } \
    }                                                      \
    if (y < h - 1) {                                       \
      a = CF(x, y + 1); s += a < 0 ? -a : a;               \
      if (y < h - 2) { a = CF(x, y + 2); s += a < 0 ? -a : a; } \
    }                                                      \
    s -= 5 * (base);                                       \
    if (s > 31) s = 31;                                    \
    if (s < 0) s = 0;                                      \
    dst = s;                                               \
  } while (0)

    for (int pos = first_sig_pos; pos > first_pos_mode2; pos--) {
      int sum_all;
      TSUM(pos, 4, sum_all);
      int rice = go_rice_pars[sum_all];
      int a = CP(pos);
      if (a < 0) a = -a;
      if (a >= 4) rem_abs_ep(&o, (uint32_t)((a - 4) >> 1), rice);
    }

    for (int pos = first_pos_mode2; pos >= min_sub_pos; pos--) {
      int c = CP(pos);
      int a = c < 0 ? -c : c;
      int sum_all;
      TSUM(pos, 0, sum_all);
      int rice = go_rice_pars[sum_all];
      int pos0 = 1 << rice;                 /* state 0 (<2) */
      int rem = a == 0 ? pos0 : (a <= pos0 ? a - 1 : a);
      rem_abs_ep(&o, (uint32_t)rem, rice);
      if (a) {
        num_non_zero++;
        first_nz_pos = pos;
        if (pos > last_nz_pos) last_nz_pos = pos;
        sign_pattern <<= 1;
        if (c < 0) sign_pattern += 1;
      }
    }
#undef TSUM

    /* the first nonzero's sign is hidden when SDH applies
     * (CABACWriter.cpp:3011-3017) */
    int num_signs = num_non_zero;
    if (sign_hiding && num_non_zero && (last_nz_pos - first_nz_pos) >= 4) {
      num_signs -= 1;
      sign_pattern >>= 1;
    }
    if (num_signs) ep_bins(&o, sign_pattern, num_signs);
  }
#undef CP
#undef CF

  return o.n <= o.cap ? o.n : -(o.n);   /* negative: needed capacity */
}
