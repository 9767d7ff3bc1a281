/* Dependent-quantization 4-state Viterbi trellis (encoder side).
 *
 * Behavioral role of VTM's DepQuant::quant (DepQuant.cpp:855-1574):
 * choose per-coefficient levels minimizing distortion + lambda * rate
 * over the scan order, where the admissible reconstruction grid of
 * each coefficient depends on the decoder state machine
 *   state' = (32040 >> ((state << 2) + ((level & 1) << 1))) & 3
 * with parity offset p = state >> 1 entering qIdx = 2*level - p.
 *
 * The rate model here is the framework's scalarized level-cost model
 * (transforms_np.quant_dep), made state-aware and solved exactly by
 * the trellis instead of greedily; the normative decode path is
 * untouched (dequant_dep).
 *
 * Exported:
 *   dq_trellis(qf, sgn, n, step, qshift, err_norm, lam, out)
 *     qf:   int64[n]  scaled |coeff| in scan order (pos 0 = DC)
 *     sgn:  int32[n]  sign per scan position
 *     out:  int32[n]  chosen signed levels in scan order
 *   returns index of the last nonzero scan position (or -1).
 */

#include <stdint.h>
#include <math.h>
#include <string.h>
#include <stdlib.h>

#define DQ_INF (1e300)

static inline double level_rate(int lv)
{
    /* ~bins of sig+gt1+gt2+remainder coding (matches the python
     * model: 0 for zero, else 1.5 + 2*log2(lv+1)) */
    if (lv == 0)
        return 0.0;
    return 1.5 + 2.0 * log2((double) lv + 1.0);
}

int64_t dq_trellis(const int64_t *qf, const int32_t *sgn, int64_t n,
                   int64_t step, int32_t qshift, double err_norm,
                   double lam, int32_t *out)
{
    if (n <= 0)
        return -1;
    /* candidate last positions: walk down from the highest position
     * where a nonzero level could pay off at state 0 */
    int64_t last = -1;
    for (int64_t pos = n - 1; pos >= 0; pos--) {
        double t = (double) qf[pos];
        double e1 = t - 2.0 * (double) step;
        double c1 = e1 * e1 * err_norm + lam * level_rate(1);
        double c0 = t * t * err_norm;
        if (qf[pos] * 2 >= 2 * step && c1 < c0) {
            last = pos;
            break;
        }
    }
    memset(out, 0, (size_t) n * sizeof(int32_t));
    if (last < 0)
        return -1;

    /* Viterbi over decode order: pos = last .. 0 (the decoder state
     * walks high-frequency to DC). choice[(pos<<3) | (ns<<1)..] holds
     * (prev_state, level) reaching state ns after coding pos. */
    int8_t *bp_state = (int8_t *) malloc((size_t) (last + 1) * 4);
    int32_t *bp_level = (int32_t *) malloc((size_t) (last + 1) * 4
                                           * sizeof(int32_t));
    if (!bp_state || !bp_level) {
        free(bp_state);
        free(bp_level);
        return -2;
    }
    double cost[4] = { 0.0, DQ_INF, DQ_INF, DQ_INF };

    for (int64_t pos = last; pos >= 0; pos--) {
        double ncost[4] = { DQ_INF, DQ_INF, DQ_INF, DQ_INF };
        int8_t nstate[4] = { -1, -1, -1, -1 };
        int32_t nlevel[4] = { 0, 0, 0, 0 };
        double t = (double) qf[pos];
        for (int s = 0; s < 4; s++) {
            if (cost[s] >= DQ_INF)
                continue;
            int p = s >> 1;
            /* nearest level on this state's grid + neighbors + zero */
            int64_t lr = (qf[pos] + (int64_t) p * step + step)
                >> (qshift + 1);
            int32_t cands[4];
            int ncand = 0;
            cands[ncand++] = 0;
            int64_t base = lr > 1 ? lr - 1 : 1;
            for (int64_t lv = base; lv <= lr + 1 && ncand < 4; lv++)
                if (lv >= 1)
                    cands[ncand++] = (int32_t) lv;
            /* the first nonzero decoded (== last scan pos) must be
             * nonzero; enforced by disallowing level 0 at 'last' */
            for (int ci = (pos == last ? 1 : 0); ci < ncand; ci++) {
                int32_t lv = cands[ci];
                double e, c;
                if (lv == 0)
                    e = t;
                else
                    e = t - (double) (2 * (int64_t) lv - p)
                        * (double) step;
                c = cost[s] + e * e * err_norm + lam * level_rate(lv);
                int ns = (32040 >> ((s << 2) + ((lv & 1) << 1))) & 3;
                if (c < ncost[ns]) {
                    ncost[ns] = c;
                    nstate[ns] = (int8_t) s;
                    nlevel[ns] = lv;
                }
            }
        }
        for (int s = 0; s < 4; s++) {
            cost[s] = ncost[s];
            bp_state[(pos << 2) + s] = nstate[s];
            bp_level[(pos << 2) + s] = nlevel[s];
        }
    }

    /* best final state after coding pos 0, then backtrack forward
     * (from pos 0 up to last) recovering the per-pos levels */
    int best = 0;
    for (int s = 1; s < 4; s++)
        if (cost[s] < cost[best])
            best = s;
    int cur = best;
    for (int64_t pos = 0; pos <= last; pos++) {
        int32_t lv = bp_level[(pos << 2) + cur];
        int prev = bp_state[(pos << 2) + cur];
        out[pos] = sgn[pos] >= 0 ? lv : -lv;
        cur = prev;
        if (cur < 0)
            break;                    /* reached the start (pos==last) */
    }
    free(bp_state);
    free(bp_level);
    return last;
}
