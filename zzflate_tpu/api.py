"""Public one-shot API: compress / decompress (SURVEY.md L6).

Shape of the API follows the whole-buffer model (libdeflate.h:71-137 is the
contract template; zlib.h:1229 compress2 the classic one): bytes in, bytes
out, with level/format/dictionary options. The streaming API lives in
zzflate_tpu.stream; the multi-device pipeline in zzflate_tpu.parallel.
"""
from __future__ import annotations

import os
import zlib as _zlib

import numpy as np

from zzflate_tpu import config as cfg_mod
from zzflate_tpu.config import CodecConfig
from zzflate_tpu.native import adler32 as _nadler32, crc32 as _ncrc32
from zzflate_tpu.models import deflate_encoder, inflate
from zzflate_tpu.utils import containers

_WINDOW = 32768

# Compact the emit phase's per-chunk word buffers into one dense device
# buffer before fetching (exact-size transfer; see emit_chunks_batch).
# Measured on-chip 2026-08-19 (8 MiB bench corpus, level 6): emit_fetch
# 572 -> 502 ms, end-to-end encode 5.07 -> 5.38 MB/s — the extra device
# scatter pass is cheaper than the device->host bytes it saves, so the
# compaction is now the default (ZZFLATE_COMPACT_FETCH=0 opts out).
_COMPACT = os.environ.get("ZZFLATE_COMPACT_FETCH", "1") == "1"


def compress_bound(n: int, format: str = "zlib") -> int:
    """Worst-case compressed size (stored fallback bound), zlib.h:760 shape."""
    overhead = {"raw": 0, "zlib": 2 + 4 + 4, "gzip": 10 + 8}[format]
    return n + 5 * (n // 65535 + 1) + 2 + overhead


def _build_chunk_batch(
    data: bytes,
    chunk_bytes: int,
    dictionary: bytes | None,
    mark_final: bool = True,
    halo: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
    """Lay out (nchunks, 32K + chunk_bytes) rows with halo prefixes.

    Chunk i's prefix is chunk i-1's last 32 KiB (the sequence-parallel halo
    of SURVEY.md section 5.7); chunk 0's is the preset dictionary.
    halo=False leaves every prefix empty (window reset per chunk — the
    seekable/random-access layout, Z_FULL_FLUSH semantics per chunk).
    Returns (buf, valid_ends, window_starts, bfinals, nchunks).
    """
    n = len(data)
    nchunks = max(1, -(-n // chunk_bytes))
    buf = np.zeros((nchunks, _WINDOW + chunk_bytes), dtype=np.uint8)
    valid_ends = np.zeros((nchunks,), dtype=np.int32)
    window_starts = np.zeros((nchunks,), dtype=np.int32)
    bfinals = np.zeros((nchunks,), dtype=np.int32)
    for i in range(nchunks):
        chunk = data[i * chunk_bytes : (i + 1) * chunk_bytes]
        if not halo:
            prefix = b""
        elif i == 0:
            prefix = (dictionary or b"")[-_WINDOW:]
        else:
            prefix = data[max(0, i * chunk_bytes - _WINDOW) : i * chunk_bytes]
        if prefix:
            buf[i, _WINDOW - len(prefix) : _WINDOW] = np.frombuffer(
                prefix, np.uint8
            )
        if chunk:
            buf[i, _WINDOW : _WINDOW + len(chunk)] = np.frombuffer(
                chunk, np.uint8
            )
        valid_ends[i] = _WINDOW + len(chunk)
        window_starts[i] = _WINDOW - len(prefix)
    if mark_final:
        bfinals[nchunks - 1] = 1
    return buf, valid_ends, window_starts, bfinals, nchunks


def _device_batch(chunk_bytes: int, mem_level: int = 8) -> int:
    """Chunks dispatched per device call, sized to bound peak HBM.

    ~4 MiB of chunk data per dispatch at the default mem_level=8: the
    suffix-sort matcher holds ~15 int32 arrays per position (~70 MiB per
    MiB-of-input transient, ~0.6 GiB peak with the 2-batch pipeline —
    comfortable in 16 GiB HBM) and larger dispatches amortize the
    tunnel's ~30-65 ms dispatch latency. mem_level (zlib.h:581-585
    contract) scales the budget: each level below 8 halves it, 9
    doubles it."""
    shift = mem_level - 8
    base = int(os.environ.get("ZZFLATE_BATCH_MIB", "4")) << 20
    budget = base << shift if shift >= 0 else base >> -shift
    return max(1, min(64, budget // chunk_bytes))


def _encode_segments(
    data: bytes,
    config: CodecConfig,
    dictionary: bytes | None,
    stream_final: bool = True,
    mesh=None,
    with_checksums: bool = False,
    single_block_chunks: bool = False,
    frame: bool = True,
    with_anchors: bool = False,
    halo: bool = True,
) -> dict:
    """Deflate payload as byte-aligned per-chunk segments (sync-flush framed).

    frame=False returns UNFRAMED segments as (bytes, nbits) tuples — no
    sync-flush marker, no stored fallback, the last byte possibly partial
    — for callers that join segments at bit granularity (the stream
    layer's Z_BLOCK support).

    Two-phase pipeline: device analyze (histograms) for every batch, host
    Huffman/header build, device emit (re-tokenize + bit-pack), host stitch
    in order. stream_final=False keeps the stream open (every chunk
    sync-flush framed, no BFINAL) for the streaming API. With `mesh`, each
    batch's leading axis is laid out across the mesh devices so the same
    jitted graphs become the multi-chip step. Returns
    {"segments": [bytes], "adler": [u32]|None, "crc": [u32]|None}.
    """
    import jax
    import jax.numpy as jnp

    chunk_bytes = config.chunk_bytes
    out_words = deflate_encoder.output_words_bound(chunk_bytes)
    params = config.params
    huffman_only = config.strategy == cfg_mod.STRATEGY_HUFFMAN_ONLY
    fixed_only = config.strategy == cfg_mod.STRATEGY_FIXED

    from zzflate_tpu.ops import huffman_host
    from zzflate_tpu.utils.profiling import maybe_stage

    n = len(data)
    nchunks = max(1, -(-n // chunk_bytes))

    bsz = _device_batch(chunk_bytes, config.mem_level)
    sharding = None
    ndev = 1
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        ndev = mesh.devices.size
        bsz = ndev * max(1, bsz)
        sharding = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
    # Never batch far beyond the real chunk count: padded rows run the
    # FULL analyze/emit compute for nothing (a 2 MiB input on a 4-device
    # mesh would otherwise dispatch 256 rows for 32 real chunks). Pow2
    # bucketing of the per-device row count keeps the number of compiled
    # shapes logarithmic while bounding pad waste at <2x.
    per_dev = -(-nchunks // ndev)
    cap = 1 << max(0, per_dev - 1).bit_length()
    bsz = max(ndev, min(bsz, cap * ndev))
    max_dist = min(32768, 1 << config.window_bits)

    # Level-9 cost-aware parse: native C shortest-bit-path DP over the
    # device matcher's (mlen, mdist) replaces the lazy commit
    # (SURVEY.md C7 / Appendix B's chain-4096 effort analogue).
    from zzflate_tpu import native as _native

    optimal = (
        params.optimal and not huffman_only and _native.lib() is not None
    )

    def dispatch_analyze(b0: int):
        """Stage host rows for chunks [b0, b0+bsz) and queue analysis."""
        b1 = min(b0 + bsz, nchunks)
        with maybe_stage("build_batches"):
            buf, valid_ends, window_starts, bfinals, _ = _build_chunk_batch(
                data[b0 * chunk_bytes : b1 * chunk_bytes], chunk_bytes,
                dictionary if b0 == 0
                else data[max(0, b0 * chunk_bytes - _WINDOW) : b0 * chunk_bytes],
                mark_final=stream_final and b1 == nchunks,
                halo=halo,
            )
            pad = bsz - (b1 - b0)
            if pad:
                # Pad the tail batch to the fixed batch size (one compiled
                # graph); padded rows encode an empty block the stitcher
                # ignores.
                buf = np.concatenate(
                    [buf, np.zeros((pad,) + buf.shape[1:], buf.dtype)]
                )
                valid_ends = np.concatenate(
                    [valid_ends, np.full((pad,), _WINDOW, np.int32)]
                )
                window_starts = np.concatenate(
                    [window_starts, np.full((pad,), _WINDOW, np.int32)]
                )
            starts = np.full((bsz,), _WINDOW, dtype=np.int32)

            def pick(a):
                if sharding is not None:
                    return jax.device_put(jnp.asarray(a), sharding)
                return jnp.asarray(a)

            db = (pick(buf), pick(starts), pick(valid_ends),
                  pick(window_starts))
        with maybe_stage("analyze_dispatch"):
            ana = deflate_encoder.analyze_chunks_batch(
                *db, params, huffman_only=huffman_only,
                with_checksums=with_checksums,
                strategy=config.strategy, max_dist=max_dist,
            )
        if optimal:
            ana = dict(ana, _host_buf=buf, _host_valid_ends=valid_ends)
        return (b0, b1), bfinals, ana

    def plan_and_emit(sl, bfinals, ana):
        """Fetch tiny freqs, build tables on host, queue the emit graph.

        Drops every big per-position analysis array afterwards so device
        memory stays bounded by the pipeline window, not the input."""
        b0, b1 = sl
        with maybe_stage("analyze_fetch_freqs"):
            # One packed fetch (one relay roundtrip) for both tables.
            freqs = np.asarray(ana["freqs"])  # (bsz, SB, 288 + 30)
            freq_ll = freqs[..., :288]
            freq_d = freqs[..., 288:]
        with maybe_stage("host_plan"):
            plans = [
                huffman_host.build_chunk_plan(
                    freq_ll[j],
                    freq_d[j],
                    bfinal=int(bfinals[j]) if b0 + j < b1 else 0,
                    fixed_only=fixed_only,
                    force_single=single_block_chunks,
                )
                for j in range(bsz)
            ]

        # Level 9: replace the device lazy parse with the C shortest-path
        # DP, priced by the pass-1 trees; then rebuild tables from the
        # DP's own token histogram (2-iteration cost model).
        override = None
        if optimal:
            with maybe_stage("optimal_parse"):
                from zzflate_tpu import constants as C_

                buf = ana["_host_buf"]
                vends = ana["_host_valid_ends"]
                mm = np.asarray(ana["mm_packed"])  # one half-size fetch
                mlen_np = mm >> 16
                mdist_np = mm & 0xFFFF
                nn = buf.shape[1]
                bounds = deflate_encoder.sub_block_bounds(nn)
                sbn = len(bounds) - 1
                com_b = np.zeros((bsz, nn), bool)
                take_b = np.zeros((bsz, nn), bool)
                sel_b = np.zeros((bsz, nn), np.int32)
                sym_b = np.zeros((bsz, nn), np.int32)
                lcode_b = np.zeros((bsz, nn), np.int32)
                dcode_np = np.maximum(
                    np.searchsorted(
                        np.asarray(C_.DIST_BASE),
                        np.maximum(mdist_np, 1),
                        side="right",
                    ).astype(np.int32)
                    - 1,
                    0,
                )
                ltc = np.asarray(C_.LENGTH_TO_CODE)
                for j in range(bsz):
                    res = _native.optimal_parse(
                        buf[j], mlen_np[j], mdist_np[j], _WINDOW,
                        int(vends[j]), plans[j]["ll_len"],
                        plans[j]["d_len"], bounds,
                    )
                    if res is None:
                        break  # library vanished: keep the lazy parse
                    com, take, sel = res
                    com_b[j], take_b[j], sel_b[j] = com, take, sel
                    lc = ltc[np.clip(sel, 0, 258)]
                    lcode_b[j] = lc
                    sym_b[j] = np.where(
                        take, 257 + lc, buf[j].astype(np.int32)
                    )
                    fll = np.zeros((sbn, 288), np.int64)
                    fd = np.zeros((sbn, 30), np.int64)
                    for b in range(sbn):
                        s, e = bounds[b], bounds[b + 1]
                        m = com[s:e]
                        fll[b] = np.bincount(
                            sym_b[j, s:e][m], minlength=288
                        )
                        fd[b] = np.bincount(
                            dcode_np[j, s:e][take[s:e]], minlength=30
                        )
                    plans[j] = huffman_host.build_chunk_plan(
                        fll, fd,
                        bfinal=int(bfinals[j]) if b0 + j < b1 else 0,
                        fixed_only=fixed_only,
                        force_single=single_block_chunks,
                    )
                else:

                    def up(a):
                        arr = jnp.asarray(a)
                        if sharding is not None:
                            arr = jax.device_put(arr, sharding)
                        return arr

                    override = {
                        "committed": up(com_b),
                        "is_match": up(take_b),
                        "litlen_sym": up(sym_b),
                        "lcode": up(lcode_b),
                        "mlen": up(sel_b),
                        "dcode": ana["dcode"],
                        "mdist": ana["mdist"],
                    }

        def stack(key, dtype):
            arr = jnp.asarray(
                np.stack([p[key] for p in plans]).astype(dtype)
            )
            if sharding is not None:
                arr = jax.device_put(arr, sharding)
            return arr

        compact = _COMPACT and sharding is None
        kbm = None
        if compact and frame:
            # Per-chunk bit budget above which the stitcher picks the
            # stored fallback: don't fetch Huffman words it will discard.
            # Mirrors finish()'s byte comparison: non-final segments cost
            # ceil((nbits+3)/8)+4 bytes (sync-flush opener + marker),
            # final ones ceil(nbits/8); stored costs 5*ceil(L/65535)+L.
            kbm = np.full((bsz,), np.iinfo(np.int32).max, np.int32)
            for j in range(b1 - b0):
                i = b0 + j
                clen = min(chunk_bytes, max(0, n - i * chunk_bytes))
                stored_len = 5 * max(1, -(-clen // 65535)) + clen
                if (i == nchunks - 1) and stream_final:
                    kbm[j] = 8 * stored_len
                else:
                    kbm[j] = 8 * (stored_len - 4) - 3
        with maybe_stage("emit_dispatch"):
            res = deflate_encoder.emit_chunks_batch(
                override
                or {
                    k: ana[k]
                    for k in (
                        "committed", "is_match", "litlen_sym", "lcode",
                        "dcode", "mlen", "mdist",
                    )
                },
                out_words,
                stack("ll_len", np.int32),
                stack("ll_code", np.uint32),
                stack("d_len", np.int32),
                stack("d_code", np.uint32),
                stack("hdr_vals", np.uint32),
                stack("hdr_nbits", np.int32),
                stack("eob_v", np.uint32),
                stack("eob_nb", np.int32),
                keep_bits_max=None if kbm is None else jnp.asarray(kbm),
                with_anchors=with_anchors,
                # Cross-chunk compaction would force cross-device traffic
                # on a mesh; only compact the single-device path.
                compact=compact,
            )
        cks = ana["cks"] if with_checksums else None
        return sl, plans, res, cks, kbm

    segments: list[bytes] = []
    blocks: list[list[tuple[int, int]]] = []
    anchors: list[list[tuple[int, int]]] = []
    adlers: list[int] | None = [] if with_checksums else None
    crcs: list[int] | None = [] if with_checksums else None

    def host_keep(i: int, nbits: int) -> bool:
        """Host replica of the stored-vs-huffman choice (and of the
        device keep_bits_max threshold): True when the Huffman segment
        is worth fetching/using, False when the stored fallback wins."""
        if not frame:
            return True
        clen = min(chunk_bytes, max(0, n - i * chunk_bytes))
        stored_len = 5 * max(1, -(-clen // 65535)) + clen
        if (i == nchunks - 1) and stream_final:
            return (nbits + 7) // 8 <= stored_len
        return (nbits + 10) // 8 + 4 <= stored_len

    def finish(sl, plans, res, cks, kbm):
        b0, b1 = sl
        # Fetch the packed metadata first (ONE roundtrip: bit counts,
        # sub-block offsets, anchors), then only the used prefix of the
        # word buffers (device->host bandwidth is the scarce resource;
        # the padded buffers are ~2.5x the compressed size).
        with maybe_stage("emit_fetch"):
            sbw = res["sb_bits"].shape[1]
            aw = res["anc_bit"].shape[1]
            meta = np.asarray(res["meta"])
            nbits_np = meta[:, 0]
            sb_bits_np = meta[:, 1 : 1 + sbw]
            sb_out_np = meta[:, 1 + sbw : 1 + 2 * sbw]
            anc_bit_np = meta[:, 1 + 2 * sbw : 1 + 2 * sbw + aw]
            anc_out_np = meta[:, 1 + 2 * sbw + aw :]
            keep = [
                host_keep(b0 + j, int(nbits_np[j])) for j in range(b1 - b0)
            ]
            if "flat_words" in res:
                # Compacted emit: fetch exactly the used words of the
                # whole batch in one dense transfer. The per-chunk word
                # counts are recomputed from nbits with the same rule
                # the device used (no word_cnt fetch).
                cnt_np = ((nbits_np + 3 + 31) // 32).astype(np.int64)
                if kbm is not None:
                    cnt_np = np.where(nbits_np <= kbm, cnt_np, 0)
                w_off = np.concatenate([[0], np.cumsum(cnt_np)])
                flat_np = np.asarray(
                    res["flat_words"][: int(w_off[-1])], dtype="<u4"
                )
                chunk_words = [
                    flat_np[w_off[j] : w_off[j + 1]]
                    for j in range(b1 - b0)
                ]
            else:
                # Width the padded batch fetch to the widest KEPT chunk:
                # stored-bound chunks are exactly the widest rows (their
                # Huffman coding exceeds the raw size) and their words
                # are never used.
                kept_bits = [
                    int(nbits_np[j])
                    for j in range(b1 - b0)
                    if keep[j]
                ]
                max_used = min(
                    out_words,
                    int((max(kept_bits, default=0) + 3 + 31) // 32) + 1,
                )
                words_np = np.asarray(
                    res["words"][:, :max_used], dtype="<u4"
                )
                chunk_words = [words_np[j] for j in range(b1 - b0)]
        if with_checksums:
            vals = np.asarray(cks)  # (bsz, 2): one roundtrip
            adlers.extend(int(x) for x in vals[: b1 - b0, 0])
            crcs.extend(int(x) for x in vals[: b1 - b0, 1])
        for j in range(b1 - b0):
            i = b0 + j
            nbits = int(nbits_np[j])
            final = (i == nchunks - 1) and stream_final
            if not frame:
                segments.append(
                    (chunk_words[j].tobytes()[: (nbits + 7) // 8], nbits)
                )
                blocks.append([])
                anchors.append([])
                continue
            chunk = data[i * chunk_bytes : (i + 1) * chunk_bytes]
            if not keep[j]:
                # The stored fallback wins; the Huffman words were never
                # fetched (compact emit zeroed word_cnt on device / the
                # padded fetch width excluded this chunk).
                seg = containers.stored_segment(chunk, final=final)
            elif final:
                seg = chunk_words[j].tobytes()[: (nbits + 7) // 8]
            else:
                # +3 zero bits open the sync-flush empty stored block;
                # its alignment padding is zeros too (buffer starts
                # zeroed).
                seg = (
                    chunk_words[j].tobytes()[: (nbits + 3 + 7) // 8]
                    + containers.SYNC_FLUSH_MARKER
                )
            segments.append(seg)
            # Block index entries: (bit offset in segment, output offset in
            # chunk) for each block-group start. Meaningless for stored
            # fallbacks (the decoder detects those from BTYPE).
            blocks.append([
                (int(sb_bits_np[j][g[0]]), int(sb_out_np[j][g[0]]))
                for g in plans[j]["groups"]
            ])
            # v3 anchors: interior sub-blocks of merged groups (their
            # first field IS their first token — interior headers are
            # zero-width) plus the emit phase's every-T-tokens slots.
            anc = [
                (int(sb_bits_np[j][b]), int(sb_out_np[j][b]))
                for g in plans[j]["groups"]
                for b in g[1:]
            ]
            valid = anc_bit_np[j] >= 0
            anc += [
                (int(bb), int(oo))
                for bb, oo in zip(
                    anc_bit_np[j][valid], anc_out_np[j][valid]
                )
            ]
            anc.sort()
            anchors.append(anc)

    # Windowed two-stage pipeline: analysis for batch i+1 is in flight on
    # device while batch i's tables are built and its emit graph queued,
    # and while batch i-1's output words are fetched. Peak device memory
    # is a constant number of batches regardless of input size
    # (BASELINE.json:11 GB-scale requirement); dropping the `ana` dict
    # after emit dispatch releases the ~24 B/position analysis arrays.
    #
    # finish() runs on ONE worker thread (order-preserving): its blocking
    # device->host fetches release the GIL, so batch i's words transfer
    # while the main thread plans/dispatches batch i+1 — on the tunneled
    # platform the fetch is a serial ~50-300 ms tail per batch otherwise.
    import collections
    from concurrent.futures import ThreadPoolExecutor

    a_q: collections.deque = collections.deque()
    e_q: collections.deque = collections.deque()
    f_q: collections.deque = collections.deque()
    with ThreadPoolExecutor(max_workers=1) as pool:
        def submit_finish():
            f_q.append(pool.submit(finish, *e_q.popleft()))
            # Keep at most 2 finishes in flight so emit outputs don't
            # accumulate on device; .result() re-raises worker errors.
            while len(f_q) > 2:
                f_q.popleft().result()

        for b0 in range(0, nchunks, bsz):
            a_q.append(dispatch_analyze(b0))
            if len(a_q) >= 2:
                e_q.append(plan_and_emit(*a_q.popleft()))
            if len(e_q) >= 2:
                submit_finish()
        while a_q:
            e_q.append(plan_and_emit(*a_q.popleft()))
        while e_q:
            submit_finish()
        while f_q:
            f_q.popleft().result()

    return {
        "segments": segments, "blocks": blocks, "anchors": anchors,
        "adler": adlers, "crc": crcs,
    }


def compress(
    data: bytes,
    level: int = 6,
    format: str = "zlib",
    dictionary: bytes | None = None,
    chunk_bytes: int = cfg_mod.DEFAULT_CHUNK_BYTES,
    strategy: int = cfg_mod.STRATEGY_DEFAULT,
    indexed: bool = False,
    window_bits: int = 15,
    mem_level: int = 8,
    engine: str = "tpu",
    seekable: bool = False,
) -> bytes:
    """One-shot compress to a zlib/gzip/raw stream (decodable by zlib).

    indexed=True (gzip only) adds a 'ZZ' FEXTRA subfield with the
    per-chunk compressed sizes; the stream stays a plain gzip member for
    every standard reader, while our TPU inflate uses the index for
    chunk-parallel decode (models/inflate_tpu.py). window_bits 8..15
    bounds match distances to 2^window_bits (zlib.h:551-556 contract).

    seekable=True (requires indexed) additionally resets the LZ window
    at every chunk boundary (Z_FULL_FLUSH semantics per chunk, at the
    usual ~0.3% ratio cost): any chunk then decodes from its own
    segment alone, and decompress_range() serves random-access reads
    touching only the covering chunks (bgzip-style seekable gzip).

    engine="tpu" (default) runs the device pipeline; engine="native"
    runs the one-shot C encoder (native/zzflate_native.c zzt_deflate) —
    the host-side serving path for payloads where a device dispatch is
    all latency. The native engine covers levels 0-9, all strategies,
    formats, window_bits and dictionaries; indexed output requires the
    device pipeline.
    """
    data = bytes(data)
    config = CodecConfig(
        level=level, format=format, chunk_bytes=chunk_bytes,
        strategy=strategy, window_bits=window_bits, mem_level=mem_level,
    )
    if dictionary is not None and format == "gzip":
        raise ValueError("gzip streams cannot carry a preset dictionary")
    if indexed and format != "gzip":
        raise ValueError("indexed output requires format='gzip'")
    if engine not in ("tpu", "native"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "native" and indexed:
        raise ValueError("indexed output requires engine='tpu'")
    if seekable and not indexed:
        raise ValueError("seekable output requires indexed=True")
    if indexed and level == 0:
        # Level 0 is one whole-stream stored run (no per-chunk segments
        # to index); rejecting beats silently emitting an unindexed
        # stream with the indexed/seekable promise dropped.
        raise ValueError("indexed output requires level >= 1")

    segments: list[bytes] | None = None
    if level == 0:
        payload = containers.stored_segment(data, final=True)
    elif engine == "native":
        from zzflate_tpu import native as _native

        # Chunk-parallel above 1 MiB (window-aligned halo chunks on a
        # thread pool, sync-flush stitched — the host mirror of the
        # device pipeline's DP axis); single-shot below it.
        payload = _native.deflate_raw_mt(
            data, level=level, dictionary=dictionary or b"",
            max_dist=min(32768, 1 << config.window_bits), final=True,
            strategy=strategy,
            # The native engine's chunk granularity: at least 1 MiB (its
            # serving-path sweet spot), honoring larger explicit values.
            # Output bytes depend only on (data, parameters) — never on
            # this machine's core count (deflate_raw_mt contract).
            chunk_bytes=max(chunk_bytes, 1 << 20),
        )
        # Whole-stream stored fallback keeps the compress_bound contract
        # (the native encoder's per-64 KiB blocks each add ~10 framing
        # bytes on incompressible data; one whole-stream stored run is
        # the contract's worst case).
        stored_whole = containers.stored_segment(data, final=True)
        if len(stored_whole) < len(payload):
            payload = stored_whole
    else:
        enc = _encode_segments(
            data, config, dictionary, with_anchors=indexed,
            halo=not seekable,
        )
        segments = enc["segments"]
        payload = b"".join(segments)
        # Whole-stream stored fallback: per-chunk sync-flush framing adds
        # ~5 bytes/chunk, so incompressible inputs could otherwise exceed
        # compress_bound (which is chunking-independent by contract).
        # Indexed streams keep their per-chunk layout instead (the chunks
        # already fall back to stored blocks individually).
        if not indexed:
            stored_whole = containers.stored_segment(data, final=True)
            if len(stored_whole) < len(payload):
                payload = stored_whole
                segments = None

    if format == "raw":
        return payload
    if format == "zlib":
        dictid = _nadler32(dictionary) if dictionary is not None else None
        return (
            containers.zlib_header(level, dictid, config.window_bits)
            + payload
            + containers.zlib_trailer(_nadler32(data))
        )
    if indexed and segments is not None:
        hdr = containers.gzip_header_indexed(
            chunk_bytes,
            list(
                zip(
                    (len(s) for s in segments),
                    enc["blocks"],
                    enc["anchors"],
                )
            ),
            flags=containers.ZZ_FLAG_SEEKABLE if seekable else 0,
        )
    else:
        hdr = containers.gzip_header()
    return (
        hdr
        + payload
        + containers.gzip_trailer(_ncrc32(data), len(data))
    )


def decompress(
    data: bytes,
    format: str = "zlib",
    dictionary: bytes | None = None,
    engine: str = "native",
) -> bytes:
    """One-shot decompress (our own inflate; checksum-verified).

    engine="native" uses the C decoder (host); engine="tpu" decodes
    indexed gzip streams chunk-parallel on device (models/inflate_tpu),
    falling back to native for unindexed streams.
    """
    data = bytes(data)
    if engine == "tpu":
        from zzflate_tpu.models import inflate_tpu

        if format == "gzip":
            out = inflate_tpu.decompress_indexed(data)
            if out is not None:
                return out
        if dictionary is None:
            # Foreign (unindexed) streams: host anchor pre-scan feeds the
            # same device anchor-walk kernel (SURVEY.md C17 — arbitrary
            # zlib/gzip/raw input decodes chunk-parallel on device).
            out = inflate_tpu.decompress_foreign(data, format=format)
            if out is not None:
                return out
    return inflate.decompress(data, format=format, dictionary=dictionary)


def decompress_range(
    data: bytes, offset: int, length: int
) -> bytes:
    """Random-access read of [offset, offset+length) from an indexed gzip
    stream without decoding the whole member.

    Seekable streams (compress(..., indexed=True, seekable=True)) decode
    only the chunks covering the range; halo-encoded indexed streams
    decode the prefix chunks up to the range's end (still skipping the
    tail). Unindexed streams fall back to a full decode + slice.
    Checksums are NOT verified on partial reads (the gzip CRC covers the
    whole member); use decompress() for verified full reads.
    """
    import struct as _struct

    data = bytes(data)
    if offset < 0 or length < 0:
        raise ValueError("offset/length must be non-negative")
    parsed = containers.parse_gzip_index(data)
    if parsed is None:
        out = inflate.decompress(data, format="gzip")
        if offset + length > len(out):
            # Same contract as the indexed path below: out-of-range
            # reads raise instead of silently truncating.
            raise ValueError("range beyond the decoded stream")
        return out[offset : offset + length]
    header_len, chunk_bytes, _anchor_tokens, chunks = parsed
    member_len = header_len + sum(sz for sz, _b, _a in chunks) + 8
    if member_len > len(data):
        raise ValueError("indexed stream shorter than its index")
    (isize,) = _struct.unpack("<I", data[member_len - 4 : member_len])
    if offset + length > isize:
        raise ValueError("range beyond the decoded stream")
    if length == 0:
        return b""
    flags = containers.gzip_index_flags(data) or 0
    seekable = bool(flags & containers.ZZ_FLAG_SEEKABLE)

    from zzflate_tpu import native as _native

    c0 = offset // chunk_bytes
    c1 = min(len(chunks), -(-(offset + length) // chunk_bytes))
    lo = c0 if seekable else 0
    cpos = header_len
    starts = []
    for sz, _b, _a in chunks:
        starts.append(cpos)
        cpos += sz
    window = b""
    parts: list[bytes] = []
    for ci in range(lo, c1):
        seg = data[starts[ci] : starts[ci] + chunks[ci][0]]
        expect = min(chunk_bytes, isize - ci * chunk_bytes)
        if _native.lib() is not None:
            out, _bit, _fin, _more = _native.inflate_stream(
                seg, window=window, out_cap_hint=expect + 16
            )
        else:
            out, _bit, _fin, _more = inflate.inflate_blocks(
                seg, window, 0
            )
        if len(out) != expect:
            raise ValueError("indexed segment decoded to the wrong size")
        if not seekable:
            # The encode halo is the last 32 KiB of ALL prior data, which
            # can span several chunks when chunk_bytes < 32 KiB.
            window = (window + out)[-32768:]
        if ci >= c0:
            parts.append(out)
    blob = b"".join(parts)
    rel = offset - c0 * chunk_bytes
    return blob[rel : rel + length]
