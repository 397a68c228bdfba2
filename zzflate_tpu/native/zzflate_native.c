/* zzflate_tpu native runtime: fast host-side inflate + checksums.
 *
 * A from-scratch table-driven raw-DEFLATE decoder (RFC 1951) plus
 * Adler-32/CRC-32, written for the host side of the TPU codec: the device
 * owns encode; decode of arbitrary zlib/gzip streams is bit-serial by
 * nature, so it lives here as native code (the reference-class codec's C2 +
 * C17 components, SURVEY.md section 2). Built as a plain shared library,
 * bound via ctypes (no pybind11 in this image).
 *
 * Bit order: LSB-first within each byte; Huffman codes are MSB-first so the
 * decode tables are indexed by bit-reversed codes (SURVEY.md A.1).
 */
#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>

#define ZZT_OK 0
#define ZZT_E_BTYPE (-1)
#define ZZT_E_STORED (-2)
#define ZZT_E_TABLE (-3)
#define ZZT_E_SYMBOL (-4)
#define ZZT_E_DIST (-5)
#define ZZT_E_OUTFULL (-6)
#define ZZT_E_INPUT (-7)
#define ZZT_E_AGAIN (-8) /* stream mode: need more input to finish a block */

/* ---------------- bit reader ---------------- */

typedef struct {
  const uint8_t *p, *end, *base;
  uint64_t acc;
  int n; /* bits valid in acc */
} bits_t;

static void br_init(bits_t *b, const uint8_t *in, size_t in_len,
                    size_t start_bit) {
  b->base = in;
  b->p = in + (start_bit >> 3);
  b->end = in + in_len;
  b->acc = 0;
  b->n = 0;
  if (b->p < b->end) {
    b->acc = (uint64_t)(*b->p++) >> (start_bit & 7);
    b->n = 8 - (int)(start_bit & 7);
  }
}

static inline void br_refill(bits_t *b) {
  if (b->n <= 56 && (size_t)(b->end - b->p) >= 8) {
    /* Branch-free bulk refill: one 64-bit load tops the accumulator up
     * to >= 56 valid bits; the cursor advances by the bytes consumed. */
    uint64_t chunk;
    memcpy(&chunk, b->p, 8);
    b->acc |= chunk << b->n;
    b->p += (63 - b->n) >> 3;
    b->n |= 56;
    return;
  }
  while (b->n <= 56 && b->p < b->end) {
    b->acc |= (uint64_t)(*b->p++) << b->n;
    b->n += 8;
  }
}

static inline uint32_t br_peek(bits_t *b, int k) {
  br_refill(b);
  return (uint32_t)(b->acc & ((1u << k) - 1));
}

static inline void br_consume(bits_t *b, int k) {
  b->acc >>= k;
  b->n -= k; /* may go negative past stream end; checked via br_pos */
}

static inline uint32_t br_get(bits_t *b, int k) {
  uint32_t v = br_peek(b, k);
  br_consume(b, k);
  return v;
}

static inline size_t br_pos(const bits_t *b) {
  return (size_t)(b->p - b->base) * 8 - (size_t)b->n;
}

static void br_align(bits_t *b) {
  int r = (int)(br_pos(b) & 7);
  if (r) br_consume(b, 8 - r);
}

/* ---------------- Huffman decode tables ---------------- */

/* Two-level decode table: a ROOT_BITS-wide root plus per-prefix
 * subtables for codes longer than ROOT_BITS. Root + pool fit in L1
 * (a flat 15-bit table is 128 KiB and misses constantly).
 * entry: (bits<<16) | sym ; bit 31 set => subtable link:
 *        0x80000000 | (subbits<<16) | pool_offset. 0 == invalid. */
#define ROOT_BITS 10
#define POOL_SIZE 4096

typedef struct {
  uint32_t root[1 << ROOT_BITS];
  uint32_t pool[POOL_SIZE];
} htab_t;

static int build_table(const uint8_t *lens, int n, htab_t *t) {
  int count[16] = {0};
  int i, l, max_len = 0;
  for (i = 0; i < n; i++) {
    if (lens[i] > 15) return ZZT_E_TABLE;
    count[lens[i]]++;
    if (lens[i] > max_len) max_len = lens[i];
  }
  memset(t->root, 0, sizeof(t->root));
  if (max_len == 0) return ZZT_OK; /* empty: legal for dist-free blocks */
  /* Kraft check: over-subscribed is an error; incomplete is legal only in
   * the 1-code case (DEFLATE allows a single distance code of length 1). */
  {
    int left = 1;
    for (l = 1; l <= 15; l++) {
      left <<= 1;
      left -= count[l];
      if (left < 0) return ZZT_E_TABLE;
    }
  }
  int first[16], code = 0;
  for (l = 1; l <= max_len; l++) {
    code = (code + count[l - 1]) << 1;
    first[l] = code;
  }
  int next[16];
  memcpy(next, first, sizeof(next));

  if (max_len > ROOT_BITS) {
    /* Pass 1: per-root-prefix deepest long code => subtable sizes. */
    uint8_t subbits[1 << ROOT_BITS];
    memset(subbits, 0, sizeof(subbits));
    int tmp[16];
    memcpy(tmp, first, sizeof(tmp));
    for (i = 0; i < n; i++) {
      l = lens[i];
      if (l <= ROOT_BITS) {
        if (l) tmp[l]++;
        continue;
      }
      uint32_t c = (uint32_t)tmp[l]++;
      uint32_t r = 0;
      for (int k = 0; k < l; k++) r |= ((c >> k) & 1u) << (l - 1 - k);
      uint32_t ridx = r & ((1u << ROOT_BITS) - 1);
      if (l - ROOT_BITS > subbits[ridx]) subbits[ridx] = (uint8_t)(l - ROOT_BITS);
    }
    uint32_t pool_used = 0;
    for (i = 0; i < (1 << ROOT_BITS); i++) {
      if (subbits[i]) {
        if (pool_used + (1u << subbits[i]) > POOL_SIZE) return ZZT_E_TABLE;
        t->root[i] = 0x80000000u | ((uint32_t)subbits[i] << 16) | pool_used;
        memset(t->pool + pool_used, 0, sizeof(uint32_t) << subbits[i]);
        pool_used += 1u << subbits[i];
      }
    }
  }

  for (i = 0; i < n; i++) {
    l = lens[i];
    if (!l) continue;
    uint32_t c = (uint32_t)next[l]++;
    uint32_t r = 0;
    for (int k = 0; k < l; k++) r |= ((c >> k) & 1u) << (l - 1 - k);
    uint32_t e = ((uint32_t)l << 16) | (uint32_t)i;
    if (l <= ROOT_BITS) {
      for (uint32_t idx = r; idx < (1u << ROOT_BITS); idx += 1u << l)
        t->root[idx] = e;
    } else {
      uint32_t ridx = r & ((1u << ROOT_BITS) - 1);
      uint32_t link = t->root[ridx];
      uint32_t sb = (link >> 16) & 0x7FFF;
      uint32_t base = link & 0xFFFF;
      for (uint32_t idx = r >> ROOT_BITS; idx < (1u << sb);
           idx += 1u << (l - ROOT_BITS))
        t->pool[base + idx] = e;
    }
  }
  return ZZT_OK;
}

static inline int decode_sym(bits_t *b, const htab_t *t) {
  br_refill(b);
  uint32_t bits = (uint32_t)(b->acc & 0x7FFF);
  uint32_t e = t->root[bits & ((1u << ROOT_BITS) - 1)];
  if (e & 0x80000000u) {
    uint32_t sb = (e >> 16) & 0x7FFF;
    e = t->pool[(e & 0xFFFF) + ((bits >> ROOT_BITS) & ((1u << sb) - 1))];
  }
  if (!e) return -1;
  br_consume(b, (int)(e >> 16));
  return (int)(e & 0xFFFF);
}

/* ---------------- DEFLATE constants (RFC 1951 / SURVEY.md A.2-A.5) ---- */

static const uint16_t LBASE[29] = {3, 4, 5, 6, 7, 8, 9, 10, 11, 13,
                                   15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
                                   67, 83, 99, 115, 131, 163, 195, 227, 258};
static const uint8_t LEXT[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                                 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
static const uint16_t DBASE[30] = {1, 2, 3, 4, 5, 7, 9, 13, 17, 25,
                                   33, 49, 65, 97, 129, 193, 257, 385, 513,
                                   769, 1025, 1537, 2049, 3073, 4097, 6145,
                                   8193, 12289, 16385, 24577};
static const uint8_t DEXT[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
                                 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12,
                                 13, 13};
static const uint8_t CLORD[19] = {16, 17, 18, 0, 8, 7, 9, 6, 10, 5,
                                  11, 4, 12, 3, 13, 2, 14, 1, 15};

static htab_t g_fixed_ll, g_fixed_d;
static int g_fixed_ready = 0;

static void init_fixed(void) {
  uint8_t lens[288];
  int i;
  for (i = 0; i < 144; i++) lens[i] = 8;
  for (; i < 256; i++) lens[i] = 9;
  for (; i < 280; i++) lens[i] = 7;
  for (; i < 288; i++) lens[i] = 8;
  build_table(lens, 288, &g_fixed_ll);
  for (i = 0; i < 30; i++) lens[i] = 5;
  build_table(lens, 30, &g_fixed_d);
  g_fixed_ready = 1;
}

/* ---------------- inflate ---------------- */

/* Decode a raw deflate stream.
 *   in/in_len/start_bit : input bitstream and starting bit offset
 *   out/out_cap         : output buffer; out[0..dict_len) must hold the
 *                         preset dictionary (back-reference context)
 *   dict_len            : bytes of dictionary already in `out`
 *   out_len (out)       : bytes produced AFTER the dictionary
 *   end_bit (out)       : bit position one past the final block
 *   stop_bytes          : if nonzero, return after >= this many output
 *                         bytes even without BFINAL (streaming support)
 *   stream              : nonzero enables incremental semantics: on input
 *                         exhaustion mid-block, return ZZT_E_AGAIN with
 *                         out_len/end_bit at the last COMPLETE block
 *                         boundary (the zlib.h:400 inflate() contract's
 *                         Z_OK-with-avail_in==0 state)
 *   bfinal_out          : if non-NULL, set to 1 iff decoding stopped at a
 *                         BFINAL block end
 * Returns ZZT_OK or a negative error. */
#define ZFAIL(code) do { rc = (code); goto zz_fail; } while (0)

static int inflate_core(const uint8_t *in, size_t in_len, size_t start_bit,
                        uint8_t *out, size_t out_cap, size_t dict_len,
                        size_t *out_len, size_t *end_bit, size_t stop_bytes,
                        int stream, uint32_t *bfinal_out) {
  bits_t b;
  size_t w = dict_len; /* write cursor into out */
  size_t chk_bit = start_bit, chk_w = dict_len; /* last block boundary */
  int rc;
  static __thread htab_t dyn_ll, dyn_d;

  if (bfinal_out) *bfinal_out = 0;
  if (!g_fixed_ready) init_fixed();
  br_init(&b, in, in_len, start_bit);

  for (;;) {
    uint32_t bfinal;
    chk_bit = br_pos(&b);
    chk_w = w;
    bfinal = br_get(&b, 1);
    uint32_t btype = br_get(&b, 2);
    const htab_t *ll, *dd;
    if (btype == 0) {
      br_align(&b);
      size_t pos = br_pos(&b) >> 3;
      if (pos + 4 > in_len) ZFAIL(ZZT_E_INPUT);
      uint32_t len = in[pos] | ((uint32_t)in[pos + 1] << 8);
      uint32_t nlen = in[pos + 2] | ((uint32_t)in[pos + 3] << 8);
      if ((len ^ nlen) != 0xFFFF) ZFAIL(ZZT_E_STORED);
      if (pos + 4 + len > in_len) ZFAIL(ZZT_E_INPUT);
      if (w + len > out_cap) ZFAIL(ZZT_E_OUTFULL);
      memcpy(out + w, in + pos + 4, len);
      w += len;
      br_init(&b, in, in_len, (pos + 4 + len) * 8);
      goto block_done;
    } else if (btype == 1) {
      ll = &g_fixed_ll;
      dd = &g_fixed_d;
    } else if (btype == 2) {
      uint32_t hlit = br_get(&b, 5) + 257;
      uint32_t hdist = br_get(&b, 5) + 1;
      uint32_t hclen = br_get(&b, 4) + 4;
      uint8_t cl_lens[19] = {0};
      uint8_t lens[288 + 32];
      uint32_t i;
      htab_t cl_tab;
      if (hlit > 286 || hdist > 30) ZFAIL(ZZT_E_TABLE);
      for (i = 0; i < hclen; i++) cl_lens[CLORD[i]] = (uint8_t)br_get(&b, 3);
      if (build_table(cl_lens, 19, &cl_tab) != ZZT_OK) ZFAIL(ZZT_E_TABLE);
      for (i = 0; i < hlit + hdist;) {
        int s = decode_sym(&b, &cl_tab);
        if (s < 0) ZFAIL(ZZT_E_SYMBOL);
        if (s < 16) {
          lens[i++] = (uint8_t)s;
        } else if (s == 16) {
          if (i == 0) ZFAIL(ZZT_E_TABLE);
          uint32_t r = 3 + br_get(&b, 2);
          uint8_t prev = lens[i - 1];
          if (i + r > hlit + hdist) ZFAIL(ZZT_E_TABLE);
          while (r--) lens[i++] = prev;
        } else {
          uint32_t r = (s == 17) ? 3 + br_get(&b, 3) : 11 + br_get(&b, 7);
          if (i + r > hlit + hdist) ZFAIL(ZZT_E_TABLE);
          while (r--) lens[i++] = 0;
        }
      }
      if (build_table(lens, (int)hlit, &dyn_ll) != ZZT_OK) ZFAIL(ZZT_E_TABLE);
      if (build_table(lens + hlit, (int)hdist, &dyn_d) != ZZT_OK)
        ZFAIL(ZZT_E_TABLE);
      ll = &dyn_ll;
      dd = &dyn_d;
    } else {
      ZFAIL(ZZT_E_BTYPE);
    }

    /* Hot token loop: one refill covers a full token (litlen <=15 +
     * len-extra <=5 + dist <=15 + dist-extra <=13 = 48 bits), so all
     * field extraction runs on the local accumulator without branches. */
    for (;;) {
      uint32_t e, s, len, dist;
      br_refill(&b);
      if (b.n < 48 && (size_t)(b.end - b.p) < 8 && br_pos(&b) > in_len * 8)
        ZFAIL(ZZT_E_INPUT);
      e = ll->root[(uint32_t)b.acc & ((1u << ROOT_BITS) - 1)];
      if (e & 0x80000000u) {
        uint32_t sb = (e >> 16) & 0x7FFF;
        e = ll->pool[(e & 0xFFFF) +
                     (((uint32_t)b.acc >> ROOT_BITS) & ((1u << sb) - 1))];
      }
      if (!e) ZFAIL(ZZT_E_SYMBOL);
      b.acc >>= (e >> 16);
      b.n -= (int)(e >> 16);
      s = e & 0xFFFF;
      if (s < 256) {
        if (w >= out_cap) ZFAIL(ZZT_E_OUTFULL);
        out[w++] = (uint8_t)s;
        /* Literal burst: keep decoding literals from the same refill
         * while >=15 accumulator bits remain (a code is <=15 bits). */
        while (b.n >= 15) {
          e = ll->root[(uint32_t)b.acc & ((1u << ROOT_BITS) - 1)];
          if (e & 0x80000000u) {
            uint32_t sb = (e >> 16) & 0x7FFF;
            e = ll->pool[(e & 0xFFFF) +
                         (((uint32_t)b.acc >> ROOT_BITS) & ((1u << sb) - 1))];
          }
          if (!e || (e & 0xFFFF) >= 256) break;
          if (w >= out_cap) ZFAIL(ZZT_E_OUTFULL);
          b.acc >>= (e >> 16);
          b.n -= (int)(e >> 16);
          out[w++] = (uint8_t)(e & 0xFFFF);
        }
        continue;
      }
      if (s == 256) break;
      {
        s -= 257;
        if (s >= 29) ZFAIL(ZZT_E_SYMBOL);
        len = LBASE[s] + ((uint32_t)b.acc & ((1u << LEXT[s]) - 1));
        b.acc >>= LEXT[s];
        b.n -= LEXT[s];
        {
        int ds;
        e = dd->root[(uint32_t)b.acc & ((1u << ROOT_BITS) - 1)];
        if (e & 0x80000000u) {
          uint32_t sb = (e >> 16) & 0x7FFF;
          e = dd->pool[(e & 0xFFFF) +
                       (((uint32_t)b.acc >> ROOT_BITS) & ((1u << sb) - 1))];
        }
        if (!e) ZFAIL(ZZT_E_SYMBOL);
        b.acc >>= (e >> 16);
        b.n -= (int)(e >> 16);
        ds = (int)(e & 0xFFFF);
        if (ds >= 30) ZFAIL(ZZT_E_SYMBOL);
        dist = DBASE[ds] + ((uint32_t)b.acc & ((1u << DEXT[ds]) - 1));
        b.acc >>= DEXT[ds];
        b.n -= DEXT[ds];
        }
        if (dist > w) ZFAIL(ZZT_E_DIST);
        if (w + len > out_cap) ZFAIL(ZZT_E_OUTFULL);
        {
          const uint8_t *src = out + w - dist;
          uint8_t *dst = out + w;
          if (dist >= len) {
            memcpy(dst, src, len);
          } else if (dist == 1) {
            memset(dst, src[0], len);
          } else if (dist >= 8 && w + ((len + 7u) & ~7u) <= out_cap) {
            /* Overlapping but with >= 8 bytes of slack: 8-byte strides
             * never read bytes written in the same stride. The rounded
             * tail stays inside out_cap (checked) and is overwritten by
             * the next token. */
            uint32_t k = 0;
            do {
              memcpy(dst + k, src + k, 8);
              k += 8;
            } while (k < len);
          } else {
            /* Small period: copy one period, then grow by doubling.
             * Each memcpy source [0,c) and target [filled,filled+c) are
             * disjoint (c <= filled), and `filled` stays a multiple of
             * dist except possibly on the final tail copy, which is
             * phase-aligned anyway. */
            uint32_t filled, c;
            for (filled = 0; filled < dist; filled++) dst[filled] = src[filled];
            while (filled < len) {
              c = filled < len - filled ? filled : len - filled;
              memcpy(dst + filled, dst, c);
              filled += c;
            }
          }
          w += len;
        }
      }
    }
  block_done:
    if (br_pos(&b) > in_len * 8) ZFAIL(ZZT_E_INPUT);
    if (bfinal) {
      if (bfinal_out) *bfinal_out = 1;
      break;
    }
    if (stop_bytes && w - dict_len >= stop_bytes) break;
  }
  *out_len = w - dict_len;
  *end_bit = br_pos(&b);
  return ZZT_OK;

zz_fail:
  /* Stream mode: an explicit input overrun, or any decode error raised
   * within a refill (64 bits) of the input end, means the current block
   * is incomplete -- report the last complete block boundary and ask for
   * more input. Errors strictly inside the available input are definitive
   * corruption (decode is prefix-deterministic). OUTFULL stays OUTFULL so
   * the caller can grow the buffer and retry. */
  if (stream && rc != ZZT_E_OUTFULL &&
      (rc == ZZT_E_INPUT || br_pos(&b) + 64 > in_len * 8)) {
    *out_len = chk_w - dict_len;
    *end_bit = chk_bit;
    if (bfinal_out) *bfinal_out = 0;
    return ZZT_E_AGAIN;
  }
  *out_len = w - dict_len;
  *end_bit = br_pos(&b);
  return rc;
}

int zzt_inflate(const uint8_t *in, size_t in_len, size_t start_bit,
                uint8_t *out, size_t out_cap, size_t dict_len,
                size_t *out_len, size_t *end_bit, size_t stop_bytes) {
  return inflate_core(in, in_len, start_bit, out, out_cap, dict_len, out_len,
                      end_bit, stop_bytes, 0, 0);
}

/* Incremental entry (SURVEY.md C18 decode side): decodes as many COMPLETE
 * blocks as the input allows; ZZT_E_AGAIN = feed more and call again from
 * *end_bit with out[0..dict_len) holding the last 32 KiB of output. */
int zzt_inflate_stream(const uint8_t *in, size_t in_len, size_t start_bit,
                       uint8_t *out, size_t out_cap, size_t dict_len,
                       size_t *out_len, size_t *end_bit, size_t stop_bytes,
                       uint32_t *bfinal_out) {
  return inflate_core(in, in_len, start_bit, out, out_cap, dict_len, out_len,
                      end_bit, stop_bytes, 1, bfinal_out);
}

/* ---------------- checksums ---------------- */

uint32_t zzt_adler32(uint32_t adler, const uint8_t *buf, size_t len) {
  const uint32_t MOD = 65521;
  uint32_t s1 = adler & 0xFFFF, s2 = (adler >> 16) & 0xFFFF;
  while (len) {
    size_t n = len < 5552 ? len : 5552; /* max before 32-bit overflow */
    len -= n;
    while (n >= 8) {
      s1 += buf[0]; s2 += s1; s1 += buf[1]; s2 += s1;
      s1 += buf[2]; s2 += s1; s1 += buf[3]; s2 += s1;
      s1 += buf[4]; s2 += s1; s1 += buf[5]; s2 += s1;
      s1 += buf[6]; s2 += s1; s1 += buf[7]; s2 += s1;
      buf += 8; n -= 8;
    }
    while (n--) { s1 += *buf++; s2 += s1; }
    s1 %= MOD;
    s2 %= MOD;
  }
  return (s2 << 16) | s1;
}

static uint32_t g_crc_tab[8][256];
static int g_crc_ready = 0;

static void init_crc(void) {
  for (int i = 0; i < 256; i++) {
    uint32_t c = (uint32_t)i;
    for (int k = 0; k < 8; k++) c = (c >> 1) ^ (0xEDB88320u & (0u - (c & 1)));
    g_crc_tab[0][i] = c;
  }
  for (int t = 1; t < 8; t++)
    for (int i = 0; i < 256; i++)
      g_crc_tab[t][i] =
          (g_crc_tab[t - 1][i] >> 8) ^ g_crc_tab[0][g_crc_tab[t - 1][i] & 0xFF];
  g_crc_ready = 1;
}

uint32_t zzt_crc32(uint32_t crc, const uint8_t *buf, size_t len) {
  if (!g_crc_ready) init_crc();
  crc = ~crc;
  while (len >= 8) { /* slice-by-8 */
    uint32_t lo = crc ^ ((uint32_t)buf[0] | ((uint32_t)buf[1] << 8) |
                         ((uint32_t)buf[2] << 16) | ((uint32_t)buf[3] << 24));
    uint32_t hi = (uint32_t)buf[4] | ((uint32_t)buf[5] << 8) |
                  ((uint32_t)buf[6] << 16) | ((uint32_t)buf[7] << 24);
    crc = g_crc_tab[7][lo & 0xFF] ^ g_crc_tab[6][(lo >> 8) & 0xFF] ^
          g_crc_tab[5][(lo >> 16) & 0xFF] ^ g_crc_tab[4][lo >> 24] ^
          g_crc_tab[3][hi & 0xFF] ^ g_crc_tab[2][(hi >> 8) & 0xFF] ^
          g_crc_tab[1][(hi >> 16) & 0xFF] ^ g_crc_tab[0][hi >> 24];
    buf += 8;
    len -= 8;
  }
  while (len--) crc = (crc >> 8) ^ g_crc_tab[0][(crc ^ *buf++) & 0xFF];
  return ~crc;
}

/* ---------------------------------------------------------------------------
 * Optimal (shortest-bit-path) parse for the level-9 encoder.
 *
 * Classic DEFLATE cost-aware parsing (the reference-class codec's lazy
 * heuristic approximates this; SURVEY.md C7/Appendix B): given each
 * position's best available match (mlen, mdist) from the device matcher
 * and per-sub-block provisional code lengths, run a backward min-plus DP
 * over token bit costs.  At a position the choices are: emit the literal,
 * or emit a match of ANY length 3..mlen[i] at mdist[i] (shorter lengths at
 * the same distance are always valid sources).  Only one candidate length
 * per length-code class matters (all lengths in a class cost the same
 * bits), so each position checks <= 29 match candidates.
 *
 * Cost tables: ll_bits (nsb x 288) and d_bits (nsb x 30) Huffman code
 * lengths; a zero length means "symbol absent from the provisional tree"
 * and is priced at 30 bits so the DP can still elect it (the final trees
 * are rebuilt from the DP's token histogram afterwards).
 * ------------------------------------------------------------------------- */

static const int32_t g_lbase[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11, 13,
                                    15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
                                    67, 83, 99, 115, 131, 163, 195, 227, 258};
static const int32_t g_lext[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                   2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
                                   0};
static const int32_t g_dbase[30] = {1,    2,    3,    4,    5,    7,    9,
                                    13,   17,   25,   33,   49,   65,   97,
                                    129,  193,  257,  385,  513,  769,  1025,
                                    1537, 2049, 3073, 4097, 6145, 8193, 12289,
                                    16385, 24577};
static const int32_t g_dext[30] = {0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4,  4,  5,
                                   5, 6, 6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11,
                                   12, 12, 13, 13};

#define ZZT_ABSENT_BITS 30

int zzt_optimal_parse(const uint8_t *data, const int32_t *mlen,
                      const int32_t *mdist, int64_t n, int64_t start,
                      int64_t end, const int32_t *ll_bits,
                      const int32_t *d_bits, const int64_t *sub_bounds,
                      int nsb, uint8_t *committed, uint8_t *take,
                      int32_t *sel_len) {
  if (end > n || start > end || nsb < 1) return -1;
  uint32_t *cost = (uint32_t *)malloc((size_t)(end - start + 1) * 4);
  int32_t *choice = (int32_t *)malloc((size_t)(end - start) * 4);
  if (!cost || !choice) {
    free(cost);
    free(choice);
    return -2;
  }
#define COST(i) cost[(i) - start]
  COST(end) = 0;
  int sb = nsb - 1;
  for (int64_t i = end - 1; i >= start; i--) {
    while (sb > 0 && i < sub_bounds[sb]) sb--;
    const int32_t *llb = ll_bits + (size_t)sb * 288;
    const int32_t *db = d_bits + (size_t)sb * 30;
    int32_t lb = llb[data[i]];
    uint32_t best = (lb ? (uint32_t)lb : ZZT_ABSENT_BITS) + COST(i + 1);
    int32_t bl = 0;
    int32_t ml = mlen[i];
    if (ml >= 3) {
      int32_t d = mdist[i];
      int dc = 29;
      while (dc > 0 && g_dbase[dc] > d) dc--;
      int32_t dbits =
          (db[dc] ? db[dc] : ZZT_ABSENT_BITS) + g_dext[dc];
      if (ml > (int32_t)(end - i)) ml = (int32_t)(end - i);
      for (int c = 0; c < 29 && g_lbase[c] <= ml; c++) {
        int32_t top =
            (c < 28) ? g_lbase[c] + (1 << g_lext[c]) - 1 : 258;
        if (c == 27 && top > 257) top = 257; /* 258 is code 285 (c=28) */
        int32_t L = ml < top ? ml : top;
        int32_t sym = 257 + c;
        int32_t cb = llb[sym];
        uint32_t tc = (cb ? (uint32_t)cb : ZZT_ABSENT_BITS) +
                      (uint32_t)g_lext[c] + (uint32_t)dbits + COST(i + L);
        if (tc < best) {
          best = tc;
          bl = L;
        }
      }
    }
    COST(i) = best;
    choice[i - start] = bl;
  }
  memset(committed + start, 0, (size_t)(end - start));
  memset(take + start, 0, (size_t)(end - start));
  memset(sel_len + start, 0, (size_t)(end - start) * 4);
  for (int64_t i = start; i < end;) {
    int32_t bl = choice[i - start];
    committed[i] = 1;
    if (bl >= 3) {
      take[i] = 1;
      sel_len[i] = bl;
      i += bl;
    } else {
      i += 1;
    }
  }
  free(cost);
  free(choice);
  return 0;
}
