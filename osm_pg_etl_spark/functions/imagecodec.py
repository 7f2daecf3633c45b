"""Pure-numpy image codec for the uncompressed formats — the REAL decode
leg of the multimodal pipeline (:mod:`..operators.multimodal`).

This container has no PIL/libav, so compressed codecs (JPEG/PNG) stay
behind the documented stub; but netpbm (P5/P6) and 24-bit BI_RGB BMP are
plain headers over raw pixel bytes, decodable with numpy alone — which
makes the Arrow-batched decode → feature-extract → resize → re-encode
path REAL end to end for those formats: actual pixel arrays flow through
``mapInPandas``, not fakes. A deployment with PIL swaps
:func:`decode_image`'s fallback branch; every shape/packing contract
here stays identical.

All functions are executor-safe (numpy only, no state) and operate on
``bytes`` in / ``bytes`` or ``ndarray`` out, so they compose with any
binary column regardless of source (parquet binary, COPY bytea, files).
"""

from __future__ import annotations

import numpy as np

_WS = b" \t\r\n"


def _ppm_tokens(buf: bytes, start: int, n: int) -> tuple[list[int], int]:
    """Read ``n`` whitespace-separated ASCII integers from a netpbm
    header, honoring ``#`` comments; returns (values, offset past the
    single whitespace byte that terminates the last token)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(buf) and buf[i:i + 1] in (b" ", b"\t", b"\r", b"\n"):
            i += 1
        if i < len(buf) and buf[i:i + 1] == b"#":
            while i < len(buf) and buf[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and buf[j:j + 1] not in (b" ", b"\t", b"\r",
                                                    b"\n", b"#"):
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        vals.append(int(buf[i:j]))
        i = j
    # exactly ONE whitespace byte separates the header from raster data
    return vals, i + 1


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6 → (H, W, 3) uint8) or PGM (P5 → (H, W))."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {magic!r}")
    (w, h, maxval), off = _ppm_tokens(payload, 2, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=off)
    arr = raster.reshape((h, w, 3)) if ch == 3 else raster.reshape((h, w))
    return arr.copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) or (H, W) uint8 to binary PPM/PGM."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (H,W,3) or (H,W), got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to (H, W, 3) uint8 RGB
    (handles 4-byte row padding and both bottom-up and top-down rows)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    dib = int.from_bytes(payload[14:18], "little")
    if dib < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib}")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported, got bpp={bpp} "
                         f"compression={comp}")
    bottom_up = h > 0
    h = abs(h)
    row = (w * 3 + 3) // 4 * 4  # rows padded to 4 bytes
    raster = np.frombuffer(payload, dtype=np.uint8, count=row * h,
                           offset=data_off).reshape((h, row))
    bgr = raster[:, :w * 3].reshape((h, w, 3))
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as an uncompressed 24-bit BI_RGB BMP
    (bottom-up rows, 4-byte row padding) — the exact inverse of
    :func:`decode_bmp`."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H,W,3), got {a.shape}")
    h, w = a.shape[0], a.shape[1]
    row = (w * 3 + 3) // 4 * 4
    raster = np.zeros((h, row), dtype=np.uint8)
    raster[:, :w * 3] = a[::-1, :, ::-1].reshape((h, w * 3))  # RGB→BGR, flip
    data = raster.tobytes()
    data_off = 14 + 40
    header = (b"BM"
              + (data_off + len(data)).to_bytes(4, "little")
              + b"\x00\x00\x00\x00"
              + data_off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + h.to_bytes(4, "little", signed=True)   # positive = bottom-up
              + (1).to_bytes(2, "little")
              + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little")              # BI_RGB
              + len(data).to_bytes(4, "little")
              + (2835).to_bytes(4, "little") * 2       # 72 dpi
              + (0).to_bytes(4, "little") * 2)
    return header + data


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode: netpbm and 24-bit BMP decode for real; anything
    else (JPEG/PNG/...) raises NotImplementedError — the documented stub
    boundary a PIL-equipped deployment replaces."""
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"no pure-numpy decoder for magic {payload[:2]!r}; compressed "
        "codecs need an image library not present in this environment")


def resize_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Nearest-neighbor resample via index gather — the standard
    pixel-center mapping (src = floor((dst + 0.5) * scale))."""
    h, w = arr.shape[0], arr.shape[1]
    ys = np.minimum(((np.arange(new_h) + 0.5) * (h / new_h)).astype(np.int64),
                    h - 1)
    xs = np.minimum(((np.arange(new_w) + 0.5) * (w / new_w)).astype(np.int64),
                    w - 1)
    return arr[ys][:, xs]


def image_features(arr: np.ndarray) -> dict:
    """Channel means + Rec.601 luma over a decoded array (grayscale is
    broadcast to three equal channels)."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        r = g = b = float(a.mean()) if a.size else 0.0
    else:
        means = a.reshape(-1, 3).mean(axis=0) if a.size else (0.0,) * 3
        r, g, b = (float(m) for m in means)
    return {"width": int(arr.shape[1]), "height": int(arr.shape[0]),
            "mean_r": r, "mean_g": g, "mean_b": b,
            "luma": 0.299 * r + 0.587 * g + 0.114 * b}
