"""Pure-numpy baseline TIFF codec — the document/scan-corpus format
(multi-page scans, OCR dumps, satellite tiles) joining the real-codec
surface (netpbm/BMP/PNG/JPEG/GIF already decode for real; the reference
never decodes media — ``osm-pg-etl.md:31-105`` — so this is
training-data extension surface like its siblings).

Scope: TIFF 6.0 baseline + tiles, both byte orders (II/MM), 8- and
16-bit grayscale and RGB, strip organization (any RowsPerStrip) AND the
tiled layout (tags 322-325, edge tiles padded — the satellite/deep-zoom
shape), compression None (1), PackBits (32773), Deflate (8 — the
libtiff/GDAL zip default — and its old-style alias 32946; r15) and
LZW (5) — the TIFF LZW variant: MSB-first bit packing,
Clear=256/EOI=257, and the EARLY code-width change (the width bumps
one code sooner than GIF's — the classic interop trap), plus the
horizontal-differencing predictor (tag 317 = 2) LZW and Deflate files
usually pair with, applied on SAMPLE values so it is depth-correct
for 16-bit. PhotometricInterpretation 0/1/2
(WhiteIsZero inverted on decode), 3 (palette — 16-bit ColorMap lookup,
the scanned-map shape) and 5 (CMYK, converted with the exact integer
``(255-c)*(255-k)//255``). Multi-IFD (multi-page) files decode to a
list of pages; 16-bit pages come back as uint16 arrays (callers see
the true dynamic range). New-style JPEG-in-TIFF (compression 7, TIFF
Tech Note 2) decodes for real through :mod:`.jpegcodec` — full-JFIF
strips or abbreviated strips with shared JPEGTables (tag 347) spliced
back per strip. RAW (non-JPEG) YCbCr — photometric 6 with subsampled
macropixel data units per TIFF6 §21, tags 529/530/532 — decodes for
real since r13 (Rec.601/full-range only, the tag defaults), as does
16-bit CMYK. CCITT fax compressions, non-Rec.601 matrices/headroom
ReferenceBlackWhite, and mixed-depth channels raise
``NotImplementedError`` loudly — the honest-boundary pattern.

Lossless throughout: any image round-trips bit-exactly, so gates pin
true gradients, not special cases.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _packbits_encode(row: bytes) -> bytes:
    """Apple PackBits RLE: runs of >=3 identical bytes -> (257-n, byte);
    literals -> (n-1, bytes)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 2 < n and row[i] == row[i + 1] == row[i + 2])):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < expect and i < len(data):
        c = data[i]
        i += 1
        if c < 128:
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:
            out += bytes([data[i]]) * (257 - c)
            i += 1
        # 128 = no-op per spec
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first, Clear=256, EOI=257, first code 258,
    EARLY width change (bump when next_code == 2^width - 1)."""
    out = bytearray()
    cur = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, nbits
        cur = (cur << width) | code
        nbits += width
        while nbits >= 8:
            out.append((cur >> (nbits - 8)) & 0xFF)
            nbits -= 8
            cur &= (1 << nbits) - 1

    width = 9
    table: dict[bytes, int] = {}
    next_code = 258
    emit(256, width)
    seq = b""
    for b in data:
        cand = seq + bytes([b])
        if len(cand) == 1 or cand in table:
            seq = cand
            continue
        emit(seq[0] if len(seq) == 1 else table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1:   # EARLY change
            if width < 12:
                width += 1
            else:
                emit(256, width)
                table.clear()
                next_code = 258
                width = 9
        seq = bytes([b])
    if seq:
        emit(seq[0] if len(seq) == 1 else table[seq], width)
    emit(257, width)
    if nbits:
        out.append((cur << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    cur = nbits = pos = 0
    while len(out) < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated TIFF LZW strip")
            cur = (cur << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (cur >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        cur &= (1 << nbits) - 1
        if code == 256:   # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == 257:   # EOI
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt TIFF LZW: code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # EARLY change with the decoder's one-entry lag: the encoder
        # (per TIFF6: "whenever NextCode equals 511, write 10-bit
        # codes") widens after assigning entry 510, but the decoder
        # assigns each entry one code LATER — so it must widen when its
        # own next entry is 2^width - 2 to stay aligned
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        prev = entry
    if len(out) < expect:
        raise ValueError("TIFF LZW strip shorter than expected")
    return bytes(out[:expect])


def _store_decode(d: bytes, n: int) -> bytes:
    if len(d) < n:
        raise ValueError("truncated uncompressed strip")
    return d[:n]


def _deflate_encode(data: bytes) -> bytes:
    # level 6 (zlib default): output is deterministic for a given zlib,
    # and the decoder accepts any level
    return zlib.compress(data, 6)


def _deflate_decode(data: bytes, expect: int) -> bytes:
    try:
        raw = zlib.decompress(data)
    except zlib.error as e:
        raise ValueError(f"corrupt Deflate strip: {e}") from None
    if len(raw) < expect:
        raise ValueError("Deflate strip shorter than expected")
    return raw[:expect]


_COMPRESSORS = {
    1: (lambda d: d, _store_decode),
    5: (_tiff_lzw_encode, _tiff_lzw_decode),
    # 8 = Adobe Deflate (TIFF Tech Note; the libtiff/GDAL default for
    # zipped TIFFs), 32946 = the original old-style Deflate code —
    # identical zlib streams, both real-world shapes
    8: (_deflate_encode, _deflate_decode),
    32946: (_deflate_encode, _deflate_decode),
    32773: (_packbits_encode, _packbits_decode),
}


def _diff_predict(block: np.ndarray, spp: int, mod: int) -> np.ndarray:
    """Horizontal differencing (predictor 2) per row, per sample plane,
    on SAMPLE values (so it works for 8- and 16-bit alike)."""
    r3 = block.astype(np.int64).reshape(block.shape[0], -1, spp)
    r3[:, 1:, :] = (r3[:, 1:, :] - r3[:, :-1, :]) % mod
    return r3.reshape(block.shape[0], -1)


def encode_tiff(rgb_or_gray: np.ndarray | list[np.ndarray],
                compression: int = 5,
                predictor: int = 2, rows_per_strip: int = 16,
                byte_order: str = "II",
                tile_size: tuple[int, int] | None = None,
                palette: np.ndarray | None = None,
                ycbcr_subsampling: tuple[int, int] | None = None) -> bytes:
    """(h, w) gray or (h, w, 3) RGB — uint8 OR uint16 samples — or a
    LIST of such arrays for a multi-page file (the scan-corpus shape:
    one IFD per page, chained) -> TIFF bytes. ``compression``: 1 (none),
    5 (LZW), 8 or 32946 (Deflate — new- and old-style codes, identical
    zlib streams), 32773 (PackBits). ``predictor`` (LZW/Deflate):
    1 = none, 2 = horizontal differencing (applied on sample values, so
    it is depth-correct for 16-bit too). ``byte_order``: ``"II"``
    (little-endian) or ``"MM"`` (big-endian) — both real-world shapes,
    so the decoder's MM path is testable against genuine files.
    ``tile_size``: None writes the strip layout; ``(tile_w, tile_h)``
    (multiples of 16 per TIFF6 §15) writes the TILED layout — edge
    tiles zero-padded to full tile size, tags 322-325 instead of
    273/278/279. ``palette``: a (256, 3) uint8 colormap — pages must
    then be (h, w) uint8 INDEX arrays; writes photometric 3 with the
    spec's 16-bit ColorMap tag (channel values stored as v*257, the
    replicated-byte convention). A (h, w, 4) uint8 OR uint16 page
    writes CMYK (photometric 5, 4 samples/px). ``ycbcr_subsampling``
    (r13): (hs, vs) in {(1,1), (2,1), (2,2)} writes photometric 6 raw
    YCbCr — pages must be (h, w, 3) uint8 RGB, converted with the JFIF
    Rec.601 transform, chroma box-averaged per macropixel, packed in
    TIFF6 §21 data units (hs·vs Y samples + Cb + Cr), with explicit
    YCbCrCoefficients and full-range ReferenceBlackWhite tags; the
    predictor does not apply and strips round up to a multiple of vs."""
    pages = (rgb_or_gray if isinstance(rgb_or_gray, (list, tuple))
             else [rgb_or_gray])
    if not pages:
        raise ValueError("need at least one page")
    if compression not in _COMPRESSORS:
        raise ValueError(f"unsupported compression {compression}")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if tile_size is not None and (tile_size[0] % 16 or tile_size[1] % 16
                                  or tile_size[0] <= 0 or tile_size[1] <= 0):
        raise ValueError("tile dimensions must be positive multiples of 16")
    bo = "<" if byte_order == "II" else ">"
    magic = b"II*\x00" if byte_order == "II" else b"MM\x00*"
    out = bytearray(magic + struct.pack(bo + "I", 8))
    next_ptr_pos = 4       # where the pointer to the next IFD lives
    for page in pages:
        a = np.asarray(page)
        if a.dtype not in (np.uint8, np.uint16) or a.ndim not in (2, 3):
            raise ValueError("encoder expects (h, w[, 3]) uint8/uint16 "
                             "pages")
        spp = 1 if a.ndim == 2 else a.shape[2]
        if spp not in (1, 3, 4):
            raise ValueError("1 (gray/palette), 3 (RGB) or 4 (CMYK) "
                             "samples per pixel only")
        if a.shape[0] == 0 or a.shape[1] == 0:
            raise ValueError("cannot encode an empty page")
        if palette is not None:
            pal = np.asarray(palette)
            if spp != 1:
                raise ValueError("palette pages must be (h, w) uint8 or "
                                 "uint16 index arrays")
            nidx = 1 << (8 * a.dtype.itemsize)
            if pal.shape != (nidx, 3) or pal.dtype != np.uint8:
                raise ValueError(
                    f"palette must be a ({nidx}, 3) uint8 array matching "
                    f"the page's {8 * a.dtype.itemsize}-bit index depth")
        if ycbcr_subsampling is not None:
            if spp != 3 or a.dtype != np.uint8:
                raise ValueError("YCbCr pages must be (h, w, 3) uint8 RGB")
            if palette is not None or tile_size is not None:
                raise ValueError("ycbcr_subsampling excludes palette "
                                 "and tile layouts")
            if tuple(ycbcr_subsampling) not in ((1, 1), (2, 1), (2, 2)):
                raise ValueError("ycbcr_subsampling must be (1,1), "
                                 "(2,1) or (2,2)")
        bps = 8 * a.dtype.itemsize
        mod = 1 << bps
        sample_dt = np.dtype(bo + ("u1" if bps == 8 else "u2"))
        h, w = a.shape[:2]
        px = a.reshape(h, w * spp)
        use_pred = 2 if (compression in (5, 8, 32946) and predictor == 2
                         and ycbcr_subsampling is None) else 1
        chunks: list[bytes] = []
        enc = _COMPRESSORS[compression][0]
        if ycbcr_subsampling is not None:
            hs, vs = ycbcr_subsampling
            r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
            yf = 0.299 * r + 0.587 * g + 0.114 * b
            cbf = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
            crf = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
            ph = -(-h // vs) * vs
            pw = -(-w // hs) * hs

            def pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

            yq = np.clip(np.round(pad(yf)), 0, 255).astype(np.uint8)

            def subq(p):
                blk = pad(p).reshape(ph // vs, vs, pw // hs, hs)
                return np.clip(np.round(blk.mean(axis=(1, 3))),
                               0, 255).astype(np.uint8)

            cbq, crq = subq(cbf), subq(crf)
            rps_y = -(-rows_per_strip // vs) * vs
            for y0 in range(0, ph, rps_y):
                nrows = min(rps_y, ph - y0)
                nbr, nbc = nrows // vs, pw // hs
                yb = (yq[y0:y0 + nrows].reshape(nbr, vs, nbc, hs)
                      .transpose(0, 2, 1, 3).reshape(nbr, nbc, vs * hs))
                unit = np.concatenate(
                    [yb, cbq[y0 // vs:y0 // vs + nbr][:, :, None],
                     crq[y0 // vs:y0 // vs + nbr][:, :, None]], axis=2)
                chunks.append(enc(unit.tobytes()))
        elif tile_size is None:
            for y0 in range(0, h, rows_per_strip):
                rows = px[y0:y0 + rows_per_strip]
                if use_pred == 2:
                    rows = _diff_predict(rows, spp, mod)
                chunks.append(enc(rows.astype(sample_dt).tobytes()))
        else:
            tw, th = tile_size
            for ty in range(0, h, th):
                for tx in range(0, w, tw):
                    tile = np.zeros((th, tw * spp), dtype=a.dtype)
                    blk = px[ty:ty + th, tx * spp:(tx + tw) * spp]
                    tile[:blk.shape[0], :blk.shape[1]] = blk
                    if use_pred == 2:
                        tile = _diff_predict(tile, spp, mod)
                    chunks.append(enc(tile.astype(sample_dt).tobytes()))

        # page layout: IFD + out-of-line values + chunks, all at
        # absolute offsets from the file start
        n_entries = (11 if tile_size is None else 12) \
            + (1 if palette is not None else 0) \
            + (3 if ycbcr_subsampling is not None else 0)
        ifd_off = len(out)
        struct.pack_into(bo + "I", out, next_ptr_pos, ifd_off)
        ifd_size = 2 + n_entries * 12 + 4
        extra = bytearray()
        extra_base = ifd_off + ifd_size

        def val_offset(data: bytes) -> int:
            off = extra_base + len(extra)
            extra.extend(data)
            return off

        n_chunks = len(chunks)
        fmt_l = bo + "I" * n_chunks
        if spp > 1:
            bps_off = val_offset(struct.pack(bo + f"{spp}H",
                                             *([bps] * spp)))
        if palette is not None:
            # ColorMap: 3*2^depth SHORTs, plane-major R then G then B,
            # 8-bit channels replicated to 16-bit as v*257 (r14: a
            # uint16 index page writes the full 3x65536-entry table)
            cmap16 = (pal.astype(np.uint32) * 257).T.reshape(-1)
            cmap_off = val_offset(
                cmap16.astype(np.dtype(bo + "u2")).tobytes())
        if ycbcr_subsampling is not None:
            # explicit colorimetry: Rec.601 coefficients (the tag-529
            # default, written anyway so foreign readers need not guess)
            # and the full-range JFIF ReferenceBlackWhite
            coe_off = val_offset(struct.pack(
                bo + "6I", 299, 1000, 587, 1000, 114, 1000))
            rbw_off = val_offset(struct.pack(
                bo + "12I", 0, 1, 255, 1, 128, 1, 255, 1, 128, 1, 255, 1))
        chunk_off_pos = val_offset(struct.pack(fmt_l, *([0] * n_chunks))) \
            if n_chunks > 1 else None
        counts = [len(s) for s in chunks]
        counts_off = val_offset(struct.pack(fmt_l, *counts)) \
            if n_chunks > 1 else None
        data_base = extra_base + len(extra)
        offs = []
        p = data_base
        for s in chunks:
            offs.append(p)
            p += len(s)
        if chunk_off_pos is not None:
            extra[chunk_off_pos - extra_base:chunk_off_pos - extra_base
                  + 4 * n_chunks] = struct.pack(fmt_l, *offs)

        def entry(tag: int, typ: int, count: int, value) -> bytes:
            # inline values shorter than 4 bytes are LEFT-justified in
            # the value field (TIFF6 §2) — load-bearing for MM files
            if typ == 3 and count == 1:
                val = struct.pack(bo + "HH", value, 0)
            elif typ == 3 and count == 2:   # two SHORTs fit inline
                val = struct.pack(bo + "HH", value[0], value[1])
            else:   # a LONG value or an offset (always full 4 bytes)
                val = struct.pack(bo + "I", value)
            return struct.pack(bo + "HHI", tag, typ, count) + val

        # dimensions/RowsPerStrip as LONG: SHORT silently truncates
        # anything > 65535 (satellite-strip sizes are real)
        e = [entry(256, 4, 1, w), entry(257, 4, 1, h)]
        if spp > 1:
            e.append(entry(258, 3, spp, bps_off))
        else:
            e.append(entry(258, 3, 1, bps))
        e.append(entry(259, 3, 1, compression))
        if ycbcr_subsampling is not None:
            photometric = 6              # raw YCbCr
        elif spp == 4:
            photometric = 5              # CMYK (separated)
        elif palette is not None:
            photometric = 3              # palette-color
        else:
            photometric = 2 if spp == 3 else 1
        e.append(entry(262, 3, 1, photometric))
        if palette is not None:
            e.append(entry(320, 3, 3 * len(pal), cmap_off))
        if ycbcr_subsampling is not None:
            e.append(entry(529, 5, 3, coe_off))
            e.append(entry(530, 3, 2, tuple(ycbcr_subsampling)))
            e.append(entry(532, 5, 6, rbw_off))
        e.append(entry(274, 3, 1, 1))           # Orientation: top-left
        e.append(entry(277, 3, 1, spp))
        if tile_size is None:
            e.append(entry(273, 4, n_chunks,
                           offs[0] if n_chunks == 1 else chunk_off_pos))
            e.append(entry(278, 4, 1,
                           rows_per_strip if ycbcr_subsampling is None
                           else -(-rows_per_strip
                                  // ycbcr_subsampling[1])
                           * ycbcr_subsampling[1]))
            e.append(entry(279, 4, n_chunks,
                           counts[0] if n_chunks == 1 else counts_off))
        else:
            e.append(entry(322, 4, 1, tile_size[0]))
            e.append(entry(323, 4, 1, tile_size[1]))
            e.append(entry(324, 4, n_chunks,
                           offs[0] if n_chunks == 1 else chunk_off_pos))
            e.append(entry(325, 4, n_chunks,
                           counts[0] if n_chunks == 1 else counts_off))
        e.append(entry(317, 3, 1, use_pred))
        e.sort(key=lambda b: struct.unpack(bo + "H", b[:2])[0])  # TIFF6:
        # entries must be ascending by tag
        assert len(e) == n_entries, (len(e), n_entries)
        next_ptr_pos = ifd_off + 2 + n_entries * 12
        out += (struct.pack(bo + "H", n_entries) + b"".join(e)
                + struct.pack(bo + "I", 0) + bytes(extra)
                + b"".join(chunks))
    return bytes(out)


def _split_jpeg_tables(stream: bytes) -> tuple[bytes, bytes]:
    """Split one JFIF stream into (tables, abbreviated) per TIFF Tech
    Note 2: ``tables`` = SOI + every DQT/DHT segment + EOI, and
    ``abbreviated`` = the stream with those segments removed. Walking
    length-prefixed segments up to SOS is exact; entropy data follows
    SOS and is copied verbatim. Standalone (length-less) markers that
    may legally appear pre-SOS in foreign streams — TEM (0x01) and
    RSTn/SOI/EOI (0xD0-0xD9) — pass through to the abbreviated stream
    rather than misreading the next bytes as a segment length (r13;
    also the SOI precondition is a real ValueError, not an assert
    stripped under ``python -O``)."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("JPEG stream does not start with SOI")
    tables = bytearray(b"\xff\xd8")
    rest = bytearray(b"\xff\xd8")
    pos = 2
    while pos + 4 <= len(stream):
        if stream[pos] != 0xFF:
            raise ValueError("malformed JPEG segment stream")
        marker = stream[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            # standalone marker: no length word follows
            rest += stream[pos:pos + 2]
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", stream[pos + 2:pos + 4])
        seg = stream[pos:pos + 2 + seg_len]
        if marker in (0xDB, 0xC4):          # DQT / DHT
            tables += seg
        else:
            rest += seg
        pos += 2 + seg_len
        if marker == 0xDA:                  # SOS: entropy data follows
            rest += stream[pos:]
            break
    tables += b"\xff\xd9"
    return bytes(tables), bytes(rest)


def encode_tiff_jpeg(rgb_pages: np.ndarray | list[np.ndarray],
                     quant: np.ndarray | None = None,
                     subsample: str = "444",
                     rows_per_strip: int | None = None,
                     use_jpeg_tables: bool = False,
                     byte_order: str = "II",
                     tile_size: tuple[int, int] | None = None) -> bytes:
    """(h, w, 3) uint8 RGB page(s) -> TIFF bytes with compression 7
    (new-style JPEG-in-TIFF, TIFF Tech Note 2): each strip is a genuine
    JFIF datastream from :func:`..jpegcodec.encode_jpeg`, photometric 6
    (YCbCr — the JPEG stream owns the color model, as real writers
    emit). ``rows_per_strip`` must be a multiple of 8 (the JPEG MCU
    height; 16 for "420"); None writes one strip. ``use_jpeg_tables``
    moves the shared DQT/DHT segments into the JPEGTables tag (347) and
    writes ABBREVIATED per-strip streams — the table-sharing layout
    libtiff produces (sound here because the JPEG encoder uses the
    fixed Annex K tables, so every strip shares one table set).
    ``tile_size`` (r14): ``(tile_w, tile_h)`` — positive multiples of
    16, always MCU-aligned — writes the TILED layout instead (tags
    322-325, one JPEG stream per tile, edge tiles padded by edge
    replication so ringing never bleeds into kept pixels); mutually
    exclusive with ``rows_per_strip``."""
    from .jpegcodec import encode_jpeg

    pages = (rgb_pages if isinstance(rgb_pages, (list, tuple))
             else [rgb_pages])
    if not pages:
        raise ValueError("need at least one page")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    mcu_h = 16 if subsample == "420" else 8
    if tile_size is not None:
        if rows_per_strip is not None:
            raise ValueError("tile_size and rows_per_strip are mutually "
                             "exclusive")
        if (tile_size[0] % 16 or tile_size[1] % 16
                or tile_size[0] <= 0 or tile_size[1] <= 0):
            raise ValueError("tile dimensions must be positive multiples "
                             "of 16")
    bo = "<" if byte_order == "II" else ">"
    magic = b"II*\x00" if byte_order == "II" else b"MM\x00*"
    out = bytearray(magic + struct.pack(bo + "I", 8))
    next_ptr_pos = 4
    for page in pages:
        a = np.asarray(page)
        if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("JPEG-in-TIFF pages must be (h, w, 3) uint8")
        h, w = a.shape[:2]
        rps = h if rows_per_strip is None else rows_per_strip
        if rows_per_strip is not None and rps % mcu_h:
            raise ValueError(
                f"rows_per_strip must be a multiple of {mcu_h} "
                f"(the JPEG MCU height for subsample={subsample})")
        if tile_size is not None:
            tw, th = tile_size
            ph = -(-h // th) * th
            pw = -(-w // tw) * tw
            padded = np.pad(a, ((0, ph - h), (0, pw - w), (0, 0)),
                            mode="edge")
            strips = [encode_jpeg(padded[ty:ty + th, tx:tx + tw],
                                  quant=quant, subsample=subsample)
                      for ty in range(0, ph, th)
                      for tx in range(0, pw, tw)]
        else:
            strips = [encode_jpeg(a[y:y + rps], quant=quant,
                                  subsample=subsample)
                      for y in range(0, h, rps)]
        tables = b""
        if use_jpeg_tables:
            split = [_split_jpeg_tables(s) for s in strips]
            tables = split[0][0]
            strips = [s[1] for s in split]

        n_entries = ((11 if tile_size is not None else 10)
                     + (1 if use_jpeg_tables else 0))
        ifd_off = len(out)
        struct.pack_into(bo + "I", out, next_ptr_pos, ifd_off)
        extra = bytearray()
        extra_base = ifd_off + 2 + n_entries * 12 + 4

        def val_offset(data: bytes) -> int:
            off = extra_base + len(extra)
            extra.extend(data)
            return off

        n_strips = len(strips)
        fmt_l = bo + "I" * n_strips
        bps_off = val_offset(struct.pack(bo + "3H", 8, 8, 8))
        tables_off = val_offset(tables) if use_jpeg_tables else None
        if len(extra) % 2:
            extra.append(0)              # keep offsets word-aligned
        off_pos = val_offset(struct.pack(fmt_l, *([0] * n_strips))) \
            if n_strips > 1 else None
        counts = [len(s) for s in strips]
        counts_off = val_offset(struct.pack(fmt_l, *counts)) \
            if n_strips > 1 else None
        data_base = extra_base + len(extra)
        offs, p = [], data_base
        for s in strips:
            offs.append(p)
            p += len(s)
        if off_pos is not None:
            extra[off_pos - extra_base:off_pos - extra_base
                  + 4 * n_strips] = struct.pack(fmt_l, *offs)

        def entry(tag: int, typ: int, count: int, value: int) -> bytes:
            if typ == 3 and count == 1:
                val = struct.pack(bo + "HH", value, 0)
            else:
                val = struct.pack(bo + "I", value)
            return struct.pack(bo + "HHI", tag, typ, count) + val

        e = [entry(256, 4, 1, w), entry(257, 4, 1, h),
             entry(258, 3, 3, bps_off),
             entry(259, 3, 1, 7),            # new-style JPEG
             entry(262, 3, 1, 6),            # YCbCr: JPEG owns color
             entry(274, 3, 1, 1),
             entry(277, 3, 1, 3)]
        if tile_size is not None:
            e += [entry(322, 4, 1, tile_size[0]),
                  entry(323, 4, 1, tile_size[1]),
                  entry(324, 4, n_strips,
                        offs[0] if n_strips == 1 else off_pos),
                  entry(325, 4, n_strips,
                        counts[0] if n_strips == 1 else counts_off)]
        else:
            e += [entry(273, 4, n_strips,
                        offs[0] if n_strips == 1 else off_pos),
                  entry(278, 4, 1, rps),
                  entry(279, 4, n_strips,
                        counts[0] if n_strips == 1 else counts_off)]
        if use_jpeg_tables:
            e.append(entry(347, 7, len(tables), tables_off))
        e.sort(key=lambda b: struct.unpack(bo + "H", b[:2])[0])
        assert len(e) == n_entries
        next_ptr_pos = ifd_off + 2 + n_entries * 12
        out += (struct.pack(bo + "H", n_entries) + b"".join(e)
                + struct.pack(bo + "I", 0) + bytes(extra)
                + b"".join(strips))
    return bytes(out)


def _rationals(payload: bytes, bo: str,
               tags: dict, tag: int) -> list[tuple[int, int]] | None:
    """Read a RATIONAL (type 5) tag as (numerator, denominator) pairs;
    None when absent."""
    if tag not in tags:
        return None
    typ, count, raw = tags[tag]
    if typ != 5:
        raise ValueError(f"TIFF tag {tag}: expected RATIONAL, got {typ}")
    (o,) = struct.unpack(bo + "I", raw)     # 8 bytes each: never inline
    vals = struct.unpack(bo + "I" * (2 * count),
                         payload[o:o + 8 * count])
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(count)]


# Rec.601 luma coefficients — tag 529's spec DEFAULT, and the only
# matrix this decoder supports (matches jpegcodec's JFIF transform so
# YCbCr pixels decode identically whether they arrived via comp-7 JPEG
# strips or raw photometric-6 strips).
_REC601 = ((299, 1000), (587, 1000), (114, 1000))
# full-range ReferenceBlackWhite (tag 532): Y [0, 255], chroma centered
# on 128 — the JFIF convention
_FULL_RANGE_RBW = ((0, 1), (255, 1), (128, 1), (255, 1), (128, 1),
                   (255, 1))


def _rat_eq(got: list[tuple[int, int]],
            want: tuple[tuple[int, int], ...]) -> bool:
    return (len(got) == len(want)
            and all(gn * wd == wn * gd
                    for (gn, gd), (wn, wd) in zip(got, want)))


def _decode_ycbcr_page(payload: bytes, bo: str, values, tags: dict,
                       w: int, h: int, offs: list[int], cnts: list[int],
                       bps: list[int], comp: int, spp: int,
                       tiled: bool) -> np.ndarray:
    """One photometric-6 (raw YCbCr) IFD -> (h, w, 3) uint8 RGB.

    Layout per TIFF6 §21: with YCbCrSubSampling (hs, vs) the image is
    stored as macropixel data units — hs x vs Y samples (row-major)
    followed by one Cb and one Cr — walked left-to-right, top-to-bottom
    over a grid padded up to multiples of (hs, vs); RowsPerStrip must be
    a multiple of vs. Chroma upsamples by replication and converts with
    the same JFIF/Rec.601 arithmetic as :mod:`.jpegcodec` (coefficients
    pinned to the tag-529 DEFAULT; headroom ReferenceBlackWhite raises
    rather than rescaling silently-wrong)."""
    if spp != 3 or bps != [8, 8, 8]:
        raise NotImplementedError(
            f"YCbCr TIFF needs 3x8-bit samples (got spp={spp}, "
            f"bps={bps})")
    if tiled:
        raise NotImplementedError("tiled YCbCr TIFF unsupported "
                                  "(strip layout only)")
    if values(317, [1])[0] != 1:
        raise NotImplementedError(
            "predictor with YCbCr data is not in TIFF6")
    if comp not in _COMPRESSORS:
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported for YCbCr strips")
    sub = values(530, [2, 2])
    if len(sub) != 2 or (sub[0], sub[1]) not in ((1, 1), (2, 1), (2, 2),
                                                 (4, 1), (4, 2)):
        raise NotImplementedError(f"YCbCrSubSampling {sub} unsupported")
    hs, vs = sub
    coe = _rationals(payload, bo, tags, 529)
    if coe is not None and not _rat_eq(coe, _REC601):
        raise NotImplementedError(
            f"YCbCrCoefficients {coe} unsupported (Rec.601 only)")
    rbw = _rationals(payload, bo, tags, 532)
    if rbw is not None and not _rat_eq(rbw, _FULL_RANGE_RBW):
        raise NotImplementedError(
            f"ReferenceBlackWhite {rbw} unsupported (full-range "
            "JFIF convention only)")
    ph = -(-h // vs) * vs
    pw = -(-w // hs) * hs
    rps = values(278, [2 ** 32 - 1])[0]
    if rps < ph and rps % vs:
        raise ValueError(
            f"RowsPerStrip {rps} is not a multiple of the vertical "
            f"subsampling {vs}")
    dec = _COMPRESSORS[comp][1]
    out = np.zeros((ph, pw, 3), dtype=np.uint8)
    y0 = 0
    for so, sc in zip(offs, cnts):
        if y0 >= ph:
            # more strips than the padded height needs: nrows would go
            # <= 0 and die in a cryptic numpy reshape — fail loudly like
            # the too-few-strips case below
            raise ValueError("YCbCr strips exceed the image")
        nrows = min(rps, ph - y0)
        nbr, nbc = nrows // vs, pw // hs
        raw = dec(payload[so:so + sc], nbr * nbc * (hs * vs + 2))
        u = np.frombuffer(raw, np.uint8).reshape(nbr, nbc, hs * vs + 2)
        ys = u[:, :, :hs * vs].reshape(nbr, nbc, vs, hs)
        y = (ys.transpose(0, 2, 1, 3).reshape(nrows, pw)
             .astype(np.float64))
        cb = np.repeat(np.repeat(u[:, :, -2], vs, 0), hs, 1) \
            .astype(np.float64) - 128.0
        cr = np.repeat(np.repeat(u[:, :, -1], vs, 0), hs, 1) \
            .astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out[y0:y0 + nrows] = np.stack(
            [np.clip(np.round(x), 0, 255).astype(np.uint8)
             for x in (r, g, b)], axis=2)
        y0 += nrows
    if y0 < ph:
        raise ValueError("YCbCr strips do not cover the image")
    return out[:h, :w]


def decode_tiff(payload: bytes) -> list[np.ndarray]:
    """TIFF bytes -> list of (h, w, 3) uint8 RGB pages (gray replicated),
    one per IFD."""
    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    try:
        return _decode_tiff_body(payload, bo)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated TIFF payload: {e}") from e


def _decode_tiff_body(payload: bytes, bo: str) -> list[np.ndarray]:
    (ifd_off,) = struct.unpack(bo + "I", payload[4:8])
    pages: list[np.ndarray] = []
    seen_ifds: set[int] = set()
    while ifd_off:
        if ifd_off in seen_ifds:
            # a next-IFD pointer looping back would otherwise spin an
            # executor forever on one crafted/corrupt payload
            raise ValueError(f"cyclic TIFF IFD chain at offset {ifd_off}")
        seen_ifds.add(ifd_off)
        (n_entries,) = struct.unpack(
            bo + "H", payload[ifd_off:ifd_off + 2])
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n_entries):
            off = ifd_off + 2 + i * 12
            tag, typ, count = struct.unpack(bo + "HHI",
                                            payload[off:off + 8])
            tags[tag] = (typ, count, payload[off + 8:off + 12])
        (ifd_off,) = struct.unpack(
            bo + "I", payload[ifd_off + 2 + n_entries * 12:
                              ifd_off + 2 + n_entries * 12 + 4])

        def values(tag: int, default=None) -> list[int] | None:
            if tag not in tags:
                return default
            typ, count, raw = tags[tag]
            size = {1: 1, 3: 2, 4: 4}.get(typ)
            if size is None:
                raise NotImplementedError(f"TIFF value type {typ}")
            fmt = {1: "B", 3: "H", 4: "I"}[typ]
            total = size * count
            if total <= 4:
                buf = raw[:total]
            else:
                (o,) = struct.unpack(bo + "I", raw)
                buf = payload[o:o + total]
            return list(struct.unpack(bo + fmt * count, buf))

        tiled = 322 in tags or 323 in tags
        if tiled:
            dims = values(256), values(257), values(324), values(325)
            missing = ("ImageWidth/ImageLength/TileOffsets/"
                       "TileByteCounts")
        else:
            dims = values(256), values(257), values(273), values(279)
            missing = ("ImageWidth/ImageLength/StripOffsets/"
                       "StripByteCounts")
        if any(v is None for v in dims):
            raise ValueError(
                f"malformed TIFF: missing a mandatory tag ({missing})")
        w, h, offs, cnts = dims[0][0], dims[1][0], dims[2], dims[3]
        bps = values(258, [8])
        comp = values(259, [1])[0]
        spp = values(277, [1])[0]
        if comp == 7:
            # new-style JPEG-in-TIFF (Tech Note 2): every strip is a
            # JPEG datastream — full JFIF, or abbreviated with the
            # shared DQT/DHT segments in JPEGTables (347), spliced back
            # in right after each strip's SOI. The JPEG stream owns the
            # color model (photometric 6/YCbCr per the spec; 1 for
            # grayscale streams), so the decoded RGB is used as-is.
            from .jpegcodec import decode_jpeg

            pm = values(262, [6])[0]
            if pm not in (1, 6):
                # pm 2 (RGB-stored JPEG components, no color transform)
                # would need decode_jpeg to SKIP its JFIF YCbCr matrix;
                # decoding it anyway would yield silently wrong colors
                raise NotImplementedError(
                    f"JPEG-in-TIFF photometric {pm} unsupported "
                    "(YCbCr (6) or grayscale (1) streams only)")
            tables = None
            if 347 in tags:
                typ, count, raw = tags[347]
                if typ not in (1, 7):
                    raise ValueError("malformed JPEGTables tag")
                if count <= 4:
                    tables = raw[:count]
                else:
                    (o,) = struct.unpack(bo + "I", raw)
                    tables = payload[o:o + count]
            def jpeg_stream(so: int, sc: int) -> bytes:
                stream = payload[so:so + sc]
                if stream[:2] != b"\xff\xd8":
                    raise ValueError("JPEG-in-TIFF chunk missing SOI")
                if tables is not None and len(tables) > 4:
                    stream = stream[:2] + tables[2:-2] + stream[2:]
                return stream

            if tiled:
                # r14: tiled layout — each tile is its own JPEG stream
                # padded to the full tile size (tile dims are multiples
                # of 16, so always MCU-aligned); assemble the grid in
                # row-major tile order (TIFF6 §15) and crop edges
                tw = values(322, [w])[0]
                th = values(323, [h])[0]
                ta = -(-w // tw)
                expect = ta * (-(-h // th))
                if len(offs) != expect or len(cnts) != expect:
                    raise ValueError(
                        f"malformed tiled TIFF: {len(offs)} tiles for "
                        f"a {ta}x{-(-h // th)} grid")
                page = np.zeros((h, w, 3), dtype=np.uint8)
                for i, (so, sc) in enumerate(zip(offs, cnts)):
                    img = decode_jpeg(jpeg_stream(so, sc))
                    ty = (i // ta) * th
                    tx = (i % ta) * tw
                    ch = min(th, h - ty)
                    cw = min(tw, w - tx)
                    if img.shape[0] < ch or img.shape[1] < cw:
                        raise ValueError(
                            "JPEG-in-TIFF tile smaller than its grid "
                            "cell")
                    page[ty:ty + ch, tx:tx + cw] = img[:ch, :cw]
                pages.append(page)
                continue
            parts = []
            y = 0
            for so, sc in zip(offs, cnts):
                img = decode_jpeg(jpeg_stream(so, sc))
                parts.append(img[:min(img.shape[0], h - y)])
                y += parts[-1].shape[0]
            page = np.concatenate(parts, axis=0)
            if page.shape[0] != h or page.shape[1] < w:
                raise ValueError(
                    "JPEG-in-TIFF strips do not cover the image")
            pages.append(page[:, :w])
            continue
        # PhotometricInterpretation: 0 = WhiteIsZero (scanned docs),
        # 1 = BlackIsZero, 2 = RGB, 3 = palette (ColorMap lookup),
        # 5 = CMYK (separated), 6 = YCbCr (r13 — raw subsampled
        # macropixel strips, the digital-camera/scanner shape; the
        # JPEG-in-TIFF YCbCr case is handled by the comp==7 branch
        # above). Defaulting by spp when absent; anything else
        # (CIELab...) raises loudly rather than decoding silently-wrong
        # intensities.
        photometric = values(262, [1 if spp == 1 else 2])[0]
        if photometric == 6:
            pages.append(_decode_ycbcr_page(
                payload, bo, values, tags, w, h, offs, cnts, bps, comp,
                spp, tiled))
            continue
        allowed = {1: (0, 1, 3), 3: (2,), 4: (5,)}.get(spp, ())
        if photometric not in allowed:
            raise NotImplementedError(
                f"TIFF photometric {photometric} with {spp} samples/px "
                "unsupported (gray/palette, RGB, CMYK or YCbCr only)")
        rps = values(278, [2 ** 32 - 1])[0]
        pred = values(317, [1])[0]
        if len(set(bps)) != 1 or bps[0] not in (8, 16):
            raise NotImplementedError(
                f"TIFF BitsPerSample {bps} unsupported (uniform 8- or "
                "16-bit samples only)")
        depth = bps[0]
        # r14: 16-bit palette decodes too — the lookup below is
        # depth-generic (ColorMap must carry 3*2^depth entries, indices
        # come out of the raster path as uint16)
        mod = 1 << depth
        sample_dt = np.dtype((bo if depth == 16 else "") + f"u{depth // 8}")
        out_dt = np.uint8 if depth == 8 else np.uint16
        if comp not in _COMPRESSORS:
            raise NotImplementedError(
                f"TIFF compression {comp} unsupported (baseline "
                "none/LZW/Deflate/PackBits + new-style JPEG only — "
                "no CCITT)")
        if spp not in (1, 3, 4):
            raise NotImplementedError(f"{spp} samples per pixel")
        dec = _COMPRESSORS[comp][1]

        def unpredict(block_bytes: bytes, nrows: int,
                      row_w: int) -> np.ndarray:
            blk = np.frombuffer(block_bytes, sample_dt) \
                .reshape(nrows, row_w * spp)
            if pred == 2:
                blk = (blk.reshape(nrows, row_w, spp)
                       .astype(np.int64).cumsum(axis=1) % mod) \
                    .reshape(nrows, row_w * spp)
            return blk.astype(out_dt)

        rows = np.zeros((h, w * spp), dtype=out_dt)
        if not tiled:
            y = 0
            for so, sc in zip(offs, cnts):
                nrows = min(rps, h - y)
                raw = dec(payload[so:so + sc],
                          nrows * w * spp * (depth // 8))
                rows[y:y + nrows] = unpredict(raw, nrows, w)
                y += nrows
        else:
            tw = values(322, [w])[0]
            th = values(323, [h])[0]
            tiles_across = -(-w // tw)
            expect = -(-w // tw) * -(-h // th)
            if len(offs) != expect or len(cnts) != expect:
                raise ValueError(
                    f"malformed tiled TIFF: {len(offs)} tiles for a "
                    f"{tiles_across}x{-(-h // th)} grid")
            for i, (so, sc) in enumerate(zip(offs, cnts)):
                ty = (i // tiles_across) * th
                tx = (i % tiles_across) * tw
                raw = dec(payload[so:so + sc],
                          th * tw * spp * (depth // 8))
                tile = unpredict(raw, th, tw)
                ch = min(th, h - ty)
                cw = min(tw, w - tx)
                rows[ty:ty + ch, tx * spp:(tx + cw) * spp] = \
                    tile[:ch, :cw * spp]
        if spp == 1 and photometric == 3:
            cmap = values(320)
            if cmap is None or len(cmap) != 3 * mod:
                raise ValueError(
                    "malformed palette TIFF: ColorMap missing or not "
                    f"3*{mod} entries")
            # plane-major 16-bit R,G,B planes; >>8 inverts the v*257
            # replicated-byte convention exactly
            planes = (np.asarray(cmap, dtype=np.uint32)
                      .reshape(3, mod) >> 8).astype(np.uint8)
            idx = rows.reshape(h, w)
            pages.append(np.stack([planes[0][idx], planes[1][idx],
                                   planes[2][idx]], axis=2))
        elif spp == 1:
            g = rows.reshape(h, w)
            if photometric == 0:          # WhiteIsZero: invert to the
                g = (mod - 1) - g         # BlackIsZero convention used
            pages.append(np.stack([g, g, g], axis=2))
        elif spp == 4:
            # exact integer separation inverse, depth-generic (r13:
            # 16-bit CMYK decodes too; uint64 holds 65535^2 exactly)
            maxv = mod - 1
            cmyk = rows.reshape(h, w, 4).astype(np.uint64)
            inv_k = maxv - cmyk[:, :, 3]
            rgb = np.stack(
                [((maxv - cmyk[:, :, c]) * inv_k) // maxv
                 for c in range(3)], axis=2).astype(out_dt)
            pages.append(rgb)
        else:
            pages.append(rows.reshape(h, w, 3))
    if not pages:
        raise ValueError("TIFF contained no IFDs")
    return pages
