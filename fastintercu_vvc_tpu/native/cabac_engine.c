/* Native CABAC engine — executes a recorded bin-op stream.
 *
 * The final entropy write is the one intrinsically serial piece of the
 * encoder (SURVEY.md §7.1 "two-phase entropy coding"); the reference
 * implements it in C++ (EncoderLib/BinEncoder.cpp). This is the
 * TPU-framework equivalent: the (vectorized, Python/JAX) syntax layer
 * records (op, payload) pairs, and this engine crunches them at native
 * speed. Behavioral parity with codec/cabac.py (which is itself
 * bit-exact against the VTM arithmetic: BinEncoder.cpp:100-340,
 * Contexts.h BinProbModel_Std).
 *
 * Op format (uint32):
 *   bits 30..28 kind: 0 = ctx bin   (payload: ctxIdx<<1 | bin)
 *                     1 = EP bin    (payload: bin)
 *                     2 = EP bins   (payload: nbits<<20 | value(20))
 *                     3 = trm bin   (payload: bin)
 *   bits 27..0  payload
 *
 * Build: cc -O2 -shared -fPIC cabac_engine.c -o libcabac.so
 */

#include <stdint.h>
#include <string.h>

#define PROB_BITS 15
#define MASK_0 (((1u << 10) - 1) << (PROB_BITS - 10))
#define MASK_1 (((1u << 14) - 1) << (PROB_BITS - 14))

static const uint8_t renorm_table[32] = {
    6, 5, 4, 4, 3, 3, 3, 3, 2, 2, 2, 2, 2, 2, 2, 2,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1};

typedef struct {
  uint32_t low;
  uint32_t range;
  uint32_t buffered_byte;
  int32_t num_buffered_bytes;
  int32_t bits_left;
  uint8_t *out;
  int64_t out_len;
} Engine;

typedef struct {
  uint16_t s0[4096];
  uint16_t s1[4096];
  uint8_t rate[4096];
} Bank;

static void write_out(Engine *e) {
  uint32_t lead_byte = e->low >> (24 - e->bits_left);
  e->bits_left += 8;
  e->low &= 0xFFFFFFFFu >> e->bits_left;
  if (lead_byte == 0xFF) {
    e->num_buffered_bytes++;
  } else {
    if (e->num_buffered_bytes > 0) {
      uint32_t carry = lead_byte >> 8;
      uint32_t byte = e->buffered_byte + carry;
      e->buffered_byte = lead_byte & 0xFF;
      e->out[e->out_len++] = (uint8_t)byte;
      byte = (0xFF + carry) & 0xFF;
      while (e->num_buffered_bytes > 1) {
        e->out[e->out_len++] = (uint8_t)byte;
        e->num_buffered_bytes--;
      }
    } else {
      e->num_buffered_bytes = 1;
      e->buffered_byte = lead_byte & 0xFF;
    }
  }
}

static inline int bank_state8(const Bank *b, int i) {
  return ((int)b->s0[i] + (int)b->s1[i]) >> 8;
}

static void encode_bin(Engine *e, Bank *b, int ctx, int bin) {
  int q = bank_state8(b, ctx);
  int mps = q >> 7;
  int qq = (q & 0x80) ? (q ^ 0xFF) : q;
  uint32_t lps = (uint32_t)(((qq >> 2) * ((int)e->range >> 5) >> 1) + 4);
  e->range -= lps;
  if (bin != mps) {
    int nbits = renorm_table[lps >> 3];
    e->bits_left -= nbits;
    e->low += e->range;
    e->low <<= nbits;
    e->range = lps << nbits;
    if (e->bits_left < 12) write_out(e);
  } else if (e->range < 256) {
    e->bits_left -= 1;
    e->low <<= 1;
    e->range <<= 1;
    if (e->bits_left < 12) write_out(e);
  }
  /* update */
  {
    int rate0 = b->rate[ctx] >> 4;
    int rate1 = b->rate[ctx] & 15;
    uint16_t s0 = b->s0[ctx], s1 = b->s1[ctx];
    s0 -= (s0 >> rate0) & MASK_0;
    s1 -= (s1 >> rate1) & MASK_1;
    if (bin) {
      s0 += (0x7FFFu >> rate0) & MASK_0;
      s1 += (0x7FFFu >> rate1) & MASK_1;
    }
    b->s0[ctx] = s0;
    b->s1[ctx] = s1;
  }
}

static void encode_bin_ep(Engine *e, int bin) {
  e->low <<= 1;
  if (bin) e->low += e->range;
  e->bits_left -= 1;
  if (e->bits_left < 12) write_out(e);
}

static void encode_aligned_bins_ep(Engine *e, uint32_t bins, int nbits) {
  int rem = nbits;
  while (rem > 0) {
    int n = rem < 8 ? rem : 8;
    uint32_t mask = (1u << n) - 1;
    uint32_t newb = (bins >> (rem - n)) & mask;
    e->low = (e->low << n) + (newb << 8);
    rem -= n;
    e->bits_left -= n;
    if (e->bits_left < 12) write_out(e);
  }
}

static void encode_bins_ep(Engine *e, uint32_t bins, int nbits) {
  if (e->range == 256) {
    encode_aligned_bins_ep(e, bins, nbits);
    return;
  }
  while (nbits > 8) {
    nbits -= 8;
    uint32_t pattern = bins >> nbits;
    e->low <<= 8;
    e->low += e->range * pattern;
    bins -= pattern << nbits;
    e->bits_left -= 8;
    if (e->bits_left < 12) write_out(e);
  }
  e->low <<= nbits;
  e->low += e->range * bins;
  e->bits_left -= nbits;
  if (e->bits_left < 12) write_out(e);
}

static void encode_bin_trm(Engine *e, int bin) {
  e->range -= 2;
  if (bin) {
    e->low += e->range;
    e->low <<= 7;
    e->range = 2 << 7;
    e->bits_left -= 7;
  } else if (e->range >= 256) {
    return;
  } else {
    e->low <<= 1;
    e->range <<= 1;
    e->bits_left -= 1;
  }
  if (e->bits_left < 12) write_out(e);
}

/* Execute ops RESUMING from (and updating) a live engine state —
 * the splice point for the Python RD path: trial syntax generated
 * natively (residual_ops) executes against the live CabacEncoder
 * without the per-bin Python loop.  io_state: [low, range,
 * buffered_byte, num_buffered_bytes, bits_left] (int64).  Context
 * states update in place; appended payload bytes go to `out`;
 * returns the appended byte count (or <0 on error).  No finish. */
int64_t cabac_exec(const uint32_t *ops, int64_t n_ops, uint16_t *s0,
                   uint16_t *s1, uint8_t *rate, int n_ctx,
                   int64_t *io_state, uint8_t *out) {
  Engine e;
  Bank b;
  if (n_ctx > 4096) return -1;
  memcpy(b.s0, s0, n_ctx * sizeof(uint16_t));
  memcpy(b.s1, s1, n_ctx * sizeof(uint16_t));
  memcpy(b.rate, rate, n_ctx);
  e.low = (uint32_t)io_state[0];
  e.range = (uint32_t)io_state[1];
  e.buffered_byte = (uint32_t)io_state[2];
  e.num_buffered_bytes = (int32_t)io_state[3];
  e.bits_left = (int32_t)io_state[4];
  e.out = out;
  e.out_len = 0;
  for (int64_t i = 0; i < n_ops; i++) {
    uint32_t op = ops[i];
    uint32_t kind = op >> 28;
    uint32_t payload = op & 0x0FFFFFFF;
    switch (kind) {
      case 0:
        encode_bin(&e, &b, (int)(payload >> 1), (int)(payload & 1));
        break;
      case 1:
        encode_bin_ep(&e, (int)(payload & 1));
        break;
      case 2:
        encode_bins_ep(&e, payload & 0xFFFFF, (int)(payload >> 20));
        break;
      case 3:
        encode_bin_trm(&e, (int)(payload & 1));
        break;
      default:
        return -2;
    }
  }
  io_state[0] = e.low;
  io_state[1] = e.range;
  io_state[2] = e.buffered_byte;
  io_state[3] = e.num_buffered_bytes;
  io_state[4] = e.bits_left;
  memcpy(s0, b.s0, n_ctx * sizeof(uint16_t));
  memcpy(s1, b.s1, n_ctx * sizeof(uint16_t));
  return e.out_len;
}

/* Execute ops; returns payload byte count. tail_out[0] = tail value,
 * tail_out[1] = tail nbits (the final low>>8 bits, appended by the
 * bit-level writer). States in s0/s1/rate are updated in place. */
int64_t cabac_run(const uint32_t *ops, int64_t n_ops, uint16_t *s0,
                  uint16_t *s1, uint8_t *rate, int n_ctx, uint8_t *out,
                  uint32_t *tail_out) {
  Engine e;
  Bank b;
  if (n_ctx > 4096) return -1;
  memcpy(b.s0, s0, n_ctx * sizeof(uint16_t));
  memcpy(b.s1, s1, n_ctx * sizeof(uint16_t));
  memcpy(b.rate, rate, n_ctx);
  e.low = 0;
  e.range = 510;
  e.buffered_byte = 0xFF;
  e.num_buffered_bytes = 0;
  e.bits_left = 23;
  e.out = out;
  e.out_len = 0;

  for (int64_t i = 0; i < n_ops; i++) {
    uint32_t op = ops[i];
    uint32_t kind = op >> 28;
    uint32_t payload = op & 0x0FFFFFFF;
    switch (kind) {
      case 0:
        encode_bin(&e, &b, (int)(payload >> 1), (int)(payload & 1));
        break;
      case 1:
        encode_bin_ep(&e, (int)(payload & 1));
        break;
      case 2:
        encode_bins_ep(&e, payload & 0xFFFFF, (int)(payload >> 20));
        break;
      case 3:
        encode_bin_trm(&e, (int)(payload & 1));
        break;
      default:
        return -2;
    }
  }
  /* finish */
  if (e.low >> (32 - e.bits_left)) {
    e.out[e.out_len++] = (uint8_t)(e.buffered_byte + 1);
    while (e.num_buffered_bytes > 1) {
      e.out[e.out_len++] = 0x00;
      e.num_buffered_bytes--;
    }
    e.low -= 1u << (32 - e.bits_left);
  } else {
    if (e.num_buffered_bytes > 0) {
      e.out[e.out_len++] = (uint8_t)e.buffered_byte;
    }
    while (e.num_buffered_bytes > 1) {
      e.out[e.out_len++] = 0xFF;
      e.num_buffered_bytes--;
    }
  }
  {
    int nbits = 24 - e.bits_left;
    uint32_t val = nbits > 0 ? ((e.low >> 8) & ((1u << nbits) - 1)) : 0;
    tail_out[0] = val;
    tail_out[1] = (uint32_t)nbits;
  }
  memcpy(s0, b.s0, n_ctx * sizeof(uint16_t));
  memcpy(s1, b.s1, n_ctx * sizeof(uint16_t));
  return e.out_len;
}
