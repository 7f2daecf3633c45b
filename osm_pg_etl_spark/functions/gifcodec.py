"""Pure-numpy GIF codec (GIF87a/89a, LZW) — extends the real-codec
surface of :mod:`.imagecodec` to the third big web-crawl image format
after PNG and JPEG (the reference pipeline never decodes media —
``osm-pg-etl.md:31-105`` — so, like the sibling codecs, this is
training-data extension surface).

Scope: logical screen + global/local color tables, variable-width LZW
with clear/end codes, dictionary growth to 4096 and the KwKwK
first-use case, interlaced images (the 4-pass row shuffle), extension
blocks skipped (graphic control, comment, application), multiple image
blocks (animation frames) returned in order with transparency applied
per frame's graphic-control index. GIF is LOSSLESS, so ANY ≤256-color
image round-trips bit-exactly — the gates exploit that for value-hash
oracles on non-constant content.

The encoder performs REAL LZW compression (hash-dict, code-width
growth, clear-code reset at 4096) so decoder tests run against genuine
variable-width streams, not the no-compression trick.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_gif(rgb: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB with ≤256 distinct colors -> GIF89a bytes.
    The palette is the sorted distinct color list (deterministic);
    raises if the image needs quantization (this is a codec, not a
    quantizer)."""
    a = np.asarray(rgb)
    if a.ndim != 3 or a.shape[2] != 3 or a.dtype != np.uint8:
        raise ValueError("encoder expects (h, w, 3) uint8 RGB")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors > 256; "
                         "quantize before GIF-encoding")
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:len(palette)] = palette
    idx = inverse.astype(np.int64).reshape(h, w)
    if interlace:
        order = _interlace_rows(h)
        idx = idx[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1) << 4 | (bits - 1), 0, 0])  # GCT flag+size
    out += table.tobytes()
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])  # no LCT
    min_code = max(2, bits)
    out += bytes([min_code])
    out += _lzw_compress(idx.reshape(-1).tolist(), min_code)
    out += bytes([0x3B])
    return bytes(out)


def _interlace_rows(h: int) -> list[int]:
    """GIF interlace pass order: rows 0,8,16.. then 4,12.. then 2,6..
    then 1,3,5.. — the order rows appear IN THE STREAM."""
    return ([*range(0, h, 8)] + [*range(4, h, 8)]
            + [*range(2, h, 4)] + [*range(1, h, 2)])


def _lzw_compress(indices: list[int], min_code: int) -> bytes:
    """Real variable-width LZW per the GIF spec, emitted as the
    255-byte-max sub-block chain (LSB-first bit packing)."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    bitbuf = bitlen = 0
    payload = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += width
        while bitlen >= 8:
            payload.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    width = min_code + 1
    table: dict[tuple[int, ...], int] = {}
    next_code = end + 1
    emit(clear, width)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (px,)
        if len(cand) == 1 or cand in table:
            seq = cand
            continue
        emit(seq[0] if len(seq) == 1 else table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                table.clear()
                next_code = end + 1
                width = min_code + 1
        seq = (px,)
    if seq:
        emit(seq[0] if len(seq) == 1 else table[seq], width)
    emit(end, width)
    if bitlen:
        payload.append(bitbuf & 0xFF)
    out = bytearray()
    for i in range(0, len(payload), 255):
        block = payload[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00"
    return bytes(out)


def _lzw_decompress(data: bytes, min_code: int, n_pixels: int) -> list[int]:
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[tuple[int, ...]] = [(i,) for i in range(1 << min_code)]
    table += [(), ()]  # clear, end placeholders
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitbuf = bitlen = pos = 0
    while len(out) < n_pixels:
        while bitlen < width:
            if pos >= len(data):
                return out  # truncated stream: return what we have
            bitbuf |= data[pos] << bitlen
            pos += 1
            bitlen += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitlen -= width
        if code == clear:
            table = [(i,) for i in range(1 << min_code)] + [(), ()]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)   # the KwKwK first-use case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} beyond "
                             "table")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            # 4096-entry cap per the GIF spec: a conformant encoder stops
            # assigning codes at 0xFFF, so without the cap the KwKwK
            # branch (code == len(table)) would accept codes no encoder
            # can emit and silently diverge instead of raising
            table.append(prev + (entry[0],))
            # width grows when the NEXT code would not fit (the encoder
            # bumps after assigning code 2^width)
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF bytes -> list of (h, w, 3) uint8 RGB frames (one per image
    block; still GIFs yield one). Transparency (GIF89a graphic control)
    renders the transparent index as the logical-screen background
    color. Frames are each returned at their own sub-rectangle size —
    composition/disposal is a renderer concern, not a codec one."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated GIF payload: {e}") from e


def _decode_gif_body(payload: bytes) -> list[np.ndarray]:
    sw, sh = struct.unpack("<HH", payload[6:10])
    packed, bg = payload[10], payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    transparent: int | None = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:   # trailer
            break
        if b == 0x21:   # extension: label + sub-block chain
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                flags = payload[pos + 1]
                transparent = (payload[pos + 4]
                               if flags & 0x01 else None)
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
        ipacked = payload[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload[pos:pos + 3 * n],
                               np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image block without any color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.array(_lzw_decompress(bytes(data), min_code, w * h),
                       dtype=np.int64)
        if len(idx) < w * h:
            idx = np.pad(idx, (0, w * h - len(idx)))
        idx = idx[:w * h].reshape(h, w)
        if ipacked & 0x40:   # interlaced: rows arrived in pass order
            order = _interlace_rows(h)
            de = np.zeros_like(idx)
            de[order] = idx
            idx = de
        rgbf = ct[np.clip(idx, 0, len(ct) - 1)]
        if transparent is not None and gct is not None:
            rgbf = np.where((idx == transparent)[:, :, None],
                            gct[min(bg, len(gct) - 1)][None, None, :],
                            rgbf)
        frames.append(rgbf.astype(np.uint8))
        transparent = None
    if not frames:
        raise ValueError("GIF contained no image blocks")
    return frames
