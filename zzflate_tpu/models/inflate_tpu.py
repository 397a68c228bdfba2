"""TPU-parallel inflate for indexed gzip streams (SURVEY.md C17/M4).

DEFLATE decode is bit-serial: each symbol's width is unknown until the
previous symbol is decoded. The TPU-native answer (cf. the parallel-
decompression literature referenced in PAPERS.md, patterns only) is:

1. **Chunk parallelism.** Our encoder writes an FEXTRA 'ZZ' index with the
   per-chunk compressed sizes (utils/containers.py), so the member splits
   into byte-aligned segments that decode independently (the sync-flush
   framing every chunk carries).
2. **Speculative per-bit decode.** Inside a chunk, decode a *candidate
   token at every bit position at once*: one LUT gather gives (symbol,
   code bits); three more dependent gathers complete length/distance extra
   bits. Each position learns its token's total bit width locally.
3. **Pointer doubling.** next[p] = p + width(p) defines a successor graph;
   the true token boundaries are the orbit of bit 0 — found in O(log n)
   gather rounds, exactly like the encoder's parse commit (ops/matcher.py).
4. **Parallel LZ resolution.** Committed tokens scatter their output spans
   (start, dist) into the global output; a segmented cummax gives every
   output byte its covering token; parent[i] = i - dist (literals are
   roots); pointer doubling over parent resolves all copies — including
   overlapping (dist < len) and cross-chunk (32 KiB halo) references —
   in ceil(log2 N) gathers.

Header parsing (block type, code lengths) is a few hundred serial bits per
chunk and stays on the host; the 2^15-entry decode LUTs are built with
numpy strided fills.

Streams without a 'ZZ' index fall back to the native C decoder
(zzflate_tpu/native). Only streams produced by this package are indexed,
so the one-compressed-block-per-segment layout is guaranteed.
"""
from __future__ import annotations

import functools
import struct
import zlib as _zlib

import numpy as np

import jax
import jax.numpy as jnp

from zzflate_tpu import constants as C
from zzflate_tpu.models.inflate import BitReader, _read_dynamic_tables
from zzflate_tpu.utils import containers

_LUT_BITS = 15
_SENTINEL = jnp.int32(1 << 30)


# ---------------------------------------------------------------------------
# Host: per-segment header parse + LUT build.
# ---------------------------------------------------------------------------


def _build_lut(lengths: np.ndarray) -> np.ndarray:
    """(1<<15,) uint32 LUT: index = next 15 bits (LSB-first stream order),
    value = (code_bits << 16) | symbol; 0 = invalid."""
    lengths = np.asarray(lengths, np.int32)
    codes = C.canonical_codes(lengths)
    rev = C.bit_reverse(codes, lengths)
    lut = np.zeros(1 << _LUT_BITS, np.uint32)
    for sym in range(lengths.size):
        ln = int(lengths[sym])
        if ln:
            lut[int(rev[sym]) :: 1 << ln] = (ln << 16) | sym
    return lut


class _SegPlan:
    """Host-side decode plan for one indexed segment."""

    __slots__ = (
        "kind", "raw", "body_bit", "ll_lut", "d_lut", "out_bytes"
    )

    def __init__(self, kind, raw=None, body_bit=0, ll_lut=None, d_lut=None,
                 out_bytes=0):
        self.kind = kind  # "stored" | "coded"
        self.raw = raw
        self.body_bit = body_bit
        self.ll_lut = ll_lut
        self.d_lut = d_lut
        self.out_bytes = out_bytes


def _plan_stored(seg: bytes, out_bytes: int) -> _SegPlan:
    """Walk the byte-aligned stored blocks of a fallback segment (host)."""
    br = BitReader(seg, 0)
    raw = bytearray()
    while len(raw) < out_bytes:
        br.bits(3)
        br.align()
        pos = br.bitpos >> 3
        (ln,) = struct.unpack("<H", seg[pos : pos + 2])
        raw += seg[pos + 4 : pos + 4 + ln]
        br.bitpos = (pos + 4 + ln) << 3
    return _SegPlan("stored", raw=bytes(raw), out_bytes=out_bytes)


def _plan_block(seg: bytes, bit_off: int) -> _SegPlan:
    """Parse one block header at `bit_off` and build its decode LUTs."""
    br = BitReader(seg, bit_off)
    br.bits(1)  # BFINAL (stream layout comes from the index)
    btype = br.bits(2)
    if btype == 1:
        ll_len = C.fixed_litlen_lengths()
        d_len = C.fixed_dist_lengths()
    else:
        ll_dec, d_dec = _read_dynamic_tables(br)
        ll_len = _decoder_lengths(ll_dec, 288)
        d_len = _decoder_lengths(d_dec, 30)
    return _SegPlan(
        "coded",
        body_bit=br.bitpos,
        ll_lut=_build_lut(ll_len),
        d_lut=_build_lut(d_len),
    )


def _decoder_lengths(dec, n: int) -> np.ndarray:
    """Recover the per-symbol length array from a CanonicalDecoder."""
    lengths = np.zeros(n, np.int32)
    i = 0
    for ln in range(1, dec.max_len + 1):
        for _ in range(dec.counts[ln]):
            lengths[dec.syms[i]] = ln
            i += 1
    return lengths


# ---------------------------------------------------------------------------
# Device: speculative per-bit token decode + commit + global scatter.
# ---------------------------------------------------------------------------


def _window(words: jax.Array, bitpos: jax.Array) -> jax.Array:
    """32-bit little-endian bit window starting at `bitpos` (clamped)."""
    i = jnp.clip(bitpos >> 5, 0, words.shape[0] - 1)
    sh = (bitpos & 31).astype(jnp.uint32)
    w0 = words[i]
    w1 = words[jnp.clip(i + 1, 0, words.shape[0] - 1)]
    lo = w0 >> sh
    hi = (w1 << (jnp.uint32(31) - sh)) << jnp.uint32(1)
    return lo | hi


def _bits(words: jax.Array, bitpos: jax.Array, n: jax.Array) -> jax.Array:
    mask = (jnp.uint32(1) << n.astype(jnp.uint32)) - jnp.uint32(1)
    return _window(words, bitpos) & mask


def _decode_core(words, ll_lut, d_lut, body_bit, max_bits):
    """Speculative token decode at every bit offset of one chunk body."""
    rel = jnp.arange(max_bits, dtype=jnp.int32)
    p = body_bit + rel
    lut_mask = jnp.uint32((1 << _LUT_BITS) - 1)

    e = ll_lut[(_window(words, p) & lut_mask).astype(jnp.int32)]
    sym = (e & jnp.uint32(0xFFFF)).astype(jnp.int32)
    nb = (e >> jnp.uint32(16)).astype(jnp.int32)
    is_lit = (sym < 256) & (nb > 0)
    is_eob = (sym == 256) & (nb > 0)
    is_len = (sym > 256) & (nb > 0)

    lc = jnp.clip(sym - 257, 0, 28)
    lext = jnp.take(jnp.asarray(C.LENGTH_EXTRA), lc)
    lbase = jnp.take(jnp.asarray(C.LENGTH_BASE), lc)
    mlen = lbase + _bits(words, p + nb, lext).astype(jnp.int32)

    p2 = p + nb + lext
    de = d_lut[(_window(words, p2) & lut_mask).astype(jnp.int32)]
    dsym = (de & jnp.uint32(0xFFFF)).astype(jnp.int32)
    dnb = (de >> jnp.uint32(16)).astype(jnp.int32)
    dsym_c = jnp.clip(dsym, 0, 29)
    dext = jnp.take(jnp.asarray(C.DIST_EXTRA), dsym_c)
    dbase = jnp.take(jnp.asarray(C.DIST_BASE), dsym_c)
    mdist = dbase + _bits(words, p2 + dnb, dext).astype(jnp.int32)

    bad_len = is_len & ((dnb == 0) | (sym > 285) | (dsym > 29))
    width = jnp.where(is_len, nb + lext + dnb + dext, nb)
    invalid = (nb == 0) | bad_len
    nxt = jnp.where(invalid | is_eob, _SENTINEL, rel + width)
    nxt = jnp.minimum(nxt, max_bits)  # clamp into the sink slot
    outlen = jnp.where(is_lit, 1, jnp.where(is_len, mlen, 0))

    # Pointer doubling: orbit of rel=0 under nxt.
    g = jnp.concatenate([nxt, jnp.int32(max_bits)[None]])
    reach = jnp.zeros((max_bits + 1,), jnp.int32).at[0].set(1)
    for _ in range(max(1, max_bits.bit_length())):
        hopped = jnp.zeros((max_bits + 1,), jnp.int32).at[g].max(
            reach, mode="drop"
        )
        reach = jnp.maximum(reach, hopped)
        g = g[jnp.clip(g, 0, max_bits)]
    committed = (reach[:max_bits] == 1) & ~invalid & ~is_eob

    step = jnp.where(committed, outlen, 0)
    out_off = jnp.cumsum(step) - step
    return {
        "is_lit": is_lit & committed,
        "is_match": is_len & committed,
        "lit": sym,
        "mdist": mdist,
        "out_off": out_off,
        "committed": committed,
    }


def _make_batch_decoder(max_bits: int, n_slots: int):
    """Jitted: decode a batch of chunks and scatter their tokens into the
    global (n_slots,) assembly arrays (litval, start_mark, dist_at). The
    last slot is the drop sink; everything stays on device."""

    @jax.jit
    def step(words_b, ll_b, d_b, body_b, base_b, litval, start_mark, dist_at):
        res = jax.vmap(
            lambda w, l, d, bb: _decode_core(w, l, d, bb, max_bits)
        )(words_b, ll_b, d_b, body_b)
        goff = res["out_off"] + base_b[:, None]
        com = res["committed"]
        tgt = jnp.where(com, goff, n_slots - 1).reshape(-1)
        litval = litval.at[tgt].max(
            jnp.where(res["is_lit"], res["lit"], 0).reshape(-1), mode="drop"
        )
        start_mark = start_mark.at[tgt].max(
            jnp.where(com, goff, -1).reshape(-1), mode="drop"
        )
        dist_at = dist_at.at[tgt].max(
            jnp.where(res["is_match"], res["mdist"], 0).reshape(-1),
            mode="drop",
        )
        return litval, start_mark, dist_at

    return step


def _make_resolver(n_slots: int):
    """Jitted: segmented-cummax covering-token lookup + pointer doubling
    over parent = idx - dist to literal roots."""
    n_out = n_slots - 1

    @jax.jit
    def resolve(litval, start_mark, dist_at):
        idx = jnp.arange(n_out, dtype=jnp.int32)
        seg_start = jax.lax.associative_scan(jnp.maximum, start_mark[:n_out])
        dist = dist_at[jnp.clip(seg_start, 0, n_out - 1)]
        parent = jnp.where((dist > 0) & (seg_start >= 0), idx - dist, idx)
        parent = jnp.clip(parent, 0, n_out - 1)
        for _ in range(max(1, n_out.bit_length())):
            parent = parent[parent]
        return litval[:n_out][parent].astype(jnp.uint8)

    return resolve


_JIT_CACHE: dict = {}


def _cached(factory, *key):
    k = (factory.__name__,) + key
    if k not in _JIT_CACHE:
        _JIT_CACHE[k] = factory(*key)
    return _JIT_CACHE[k]


# ---------------------------------------------------------------------------
# Public entry.
# ---------------------------------------------------------------------------

_BATCH = 8


def decompress_indexed(data: bytes, verify: bool = True) -> bytes | None:
    """Chunk-parallel decode of an indexed gzip stream on device.

    Returns None if the stream carries no 'ZZ' index (caller falls back).
    All heavy work — per-bit speculative decode, token-boundary doubling,
    global LZ resolution — runs on device; the host only parses headers,
    builds LUTs, and fetches the final byte array once.
    """
    parsed = containers.parse_gzip_index(data)
    if parsed is None:
        return None
    header_len, chunk_bytes, chunks = parsed
    # The indexed member's extent comes from the index itself, not from
    # the end of the buffer: a valid stream may append further gzip
    # members after it (RFC 1952 multi-member). Trailing members are
    # decoded by the native path and concatenated.
    member_len = header_len + sum(sz for sz, _ in chunks) + 8
    if member_len > len(data):
        return None  # index inconsistent with buffer; fall back
    (crc_expect, isize) = struct.unpack(
        "<II", data[member_len - 8 : member_len]
    )
    tail = data[member_len:]
    nchunks = len(chunks)
    total_out = isize
    # Validate the (untrusted) index before any of it parameterizes device
    # shapes or jit arguments: a lying 'ZZ' subfield must raise ValueError,
    # never overflow int32 args or allocate absurd buffers (SURVEY.md 4.4).
    if not 1024 <= chunk_bytes <= (1 << 27):
        raise ValueError("ZZ index: implausible chunk_bytes")
    if isize > nchunks * chunk_bytes:
        raise ValueError("ZZ index: isize exceeds indexed chunk capacity")
    for sz, blocks in chunks:
        if sz > len(data) or len(blocks) > max(1, chunk_bytes // 1024):
            raise ValueError("ZZ index: implausible segment record")
        for bit_off, out_off in blocks:
            if bit_off >= 8 * max(sz, 1) or out_off > chunk_bytes:
                raise ValueError("ZZ index: block offsets out of range")
    out_sizes = [
        min(chunk_bytes, max(0, total_out - i * chunk_bytes))
        for i in range(nchunks)
    ]
    out_starts = [i * chunk_bytes for i in range(nchunks)]

    n_out = max(1, total_out)
    n_slots = n_out + 1
    litval = np.zeros(n_slots, np.int32)
    start_init = np.full(n_slots, -1, np.int32)
    dist_init = np.zeros(n_slots, np.int32)

    # Host: split segments; per BLOCK (the index carries every block's bit
    # offset + output offset) parse the header and build LUTs. Stored
    # fallback segments are detected from BTYPE and prefilled directly.
    pos = header_len
    units = []  # (seg_index, plan, global_out_base)
    segs = []
    try:
        for i, (sz, blocks) in enumerate(chunks):
            seg = data[pos : pos + sz]
            pos += sz
            segs.append(seg)
            br = BitReader(seg, 0)
            br.bits(1)
            if br.bits(2) == 0:
                plan = _plan_stored(seg, out_sizes[i])
                litval[out_starts[i] : out_starts[i] + len(plan.raw)] = (
                    np.frombuffer(plan.raw, np.uint8)
                )
                # dist=0 breaker so a previous chunk's match segment cannot
                # bleed into this chunk's bytes in the resolver.
                start_init[out_starts[i]] = out_starts[i]
                continue
            for bit_off, out_off in blocks:
                units.append(
                    (i, _plan_block(seg, bit_off), out_starts[i] + out_off)
                )
    except (IndexError, struct.error) as e:
        # Host header/LUT parsing ran off the segment: the index lied.
        raise ValueError(f"corrupt indexed segment: {e}") from e

    lv = jnp.asarray(litval)
    sm = jnp.asarray(start_init)
    da = jnp.asarray(dist_init)

    if units:
        max_bits = (chunk_bytes + 64) * 8
        w32 = (max(sz for sz, _ in chunks) + 11) // 4 + 2
        w32 = max(w32, (chunk_bytes + 80) // 4)  # stable shape per config
        stepf = _cached(_make_batch_decoder, max_bits, n_slots)
        for b0 in range(0, len(units), _BATCH):
            # Padded rows keep an all-zero LUT: every position decodes as
            # invalid, so they commit nothing.
            group = units[b0 : b0 + _BATCH]
            words_b = np.zeros((_BATCH, w32), "<u4")
            ll_b = np.zeros((_BATCH, 1 << _LUT_BITS), np.uint32)
            d_b = np.zeros((_BATCH, 1 << _LUT_BITS), np.uint32)
            body_b = np.zeros(_BATCH, np.int32)
            base_b = np.full(_BATCH, n_out, np.int32)
            for j, (i, plan, out_base) in enumerate(group):
                seg = segs[i]
                wpad = seg + b"\x00" * (w32 * 4 - len(seg))
                words_b[j] = np.frombuffer(wpad, "<u4")
                ll_b[j] = plan.ll_lut
                d_b[j] = plan.d_lut
                body_b[j] = plan.body_bit
                base_b[j] = out_base
            lv, sm, da = stepf(
                jnp.asarray(words_b),
                jnp.asarray(ll_b),
                jnp.asarray(d_b),
                jnp.asarray(body_b),
                jnp.asarray(base_b),
                lv, sm, da,
            )

    resolver = _cached(_make_resolver, n_slots)
    out = np.asarray(resolver(lv, sm, da))[:total_out].tobytes()

    if verify:
        if _zlib.crc32(out) != crc_expect:
            raise ValueError("crc32 mismatch (TPU inflate)")
        if (len(out) & 0xFFFFFFFF) != (isize & 0xFFFFFFFF):
            raise ValueError("isize mismatch (TPU inflate)")
    if tail:
        from zzflate_tpu.models import inflate

        out += inflate.decompress(tail, format="gzip")
    return out
