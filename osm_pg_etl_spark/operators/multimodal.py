"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (extension beyond the reference surface,
BASELINE.json north star).

Design: a multimodal table carries ``content: binary`` plus a
``media_meta: struct<kind, mime, width, height, duration_ms>`` column.
Decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas iterators over ``mapInPandas`` — the Spark-side plumbing (schema,
batch shape, partitioning) is real and tested. The codec layer is split
honestly: netpbm P5/P6, 24-bit BI_RGB BMP, 8-bit PNG, baseline AND
progressive JPEG (:mod:`..functions.jpegcodec`), GIF
(:mod:`..functions.gifcodec`), PCM/μ-law/ADPCM WAV
(:mod:`..functions.audiocodec`), FLAC (:mod:`..functions.flaccodec`)
and AVI video — Motion-JPEG and the INTER-FRAME MS Video 1
(:mod:`..functions.avicodec` / :mod:`..functions.msvideo1`) — all
decode/resize/feature-extract for REAL through pure-numpy codecs (see
``extract_image_features`` / ``extract_audio_features`` /
``extract_video_features`` / ``resize_images``); only transform-coded
video (MPEG/H.26x), arithmetic-coded JPEG and MP3/Vorbis audio remain
behind ``decode_stub`` because no media library exists in this
container — a PIL/libav deployment replaces only
``functions.imagecodec.decode_image``'s fallback branch.

Scale notes: binary payloads dominate row size — repartition by size-aware
keys before mapInPandas so Arrow batches stay bounded
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps rows/batch); never
collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_META = StructType([
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("content_hash", StringType()),
    StructField("feat_mean", DoubleType()),   # mean byte value (stub feature)
    StructField("feat_entropy_proxy", DoubleType()),
])


def attach_fake_media(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", kind: str = "image") -> DataFrame:
    """Deterministically synthesize a binary payload + metadata from a text
    column so multimodal plumbing is testable in this container (no real
    media libraries / files available). ``kind="video"`` rows get a
    deterministic ``duration_ms`` so frame-sampling is exercisable."""
    content = F.encode(F.col(text_col), "utf-8").cast(BinaryType())
    duration = ((F.length(text_col) % 5000) + 1500).cast("int") \
        if kind == "video" else F.lit(None).cast("int")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        F.lit("application/x-fake").alias("mime"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        duration.alias("duration_ms"),
    )
    return df.select(F.col(id_col), content.alias("content"), meta.alias("media_meta"))


def decode_stub(payload: bytes) -> dict:
    """STUB decode step. A real deployment replaces this with PIL/libav/etc.
    Produces deterministic pseudo-features from the raw bytes so the
    distributed plumbing around it is fully exercised."""
    if payload is None:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; decode_stub only handles fake payloads")
    n = len(payload)
    mean = (sum(payload) / n) if n else 0.0
    distinct = len(set(payload))
    return {"n_bytes": n, "feat_mean": mean,
            "feat_entropy_proxy": distinct / 256.0}


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``. Each batch is
    a pandas DataFrame of (doc_id, content, media_meta); output schema is
    fixed (FEATURE_SCHEMA) so Catalyst can prune upstream columns."""
    import hashlib  # local import: shipped to executors inside the closure

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub(p) for p in pdf["content"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "kind": [m["kind"] for m in pdf["media_meta"]],
                "n_bytes": [f["n_bytes"] for f in feats],
                "content_hash": [hashlib.md5(p).hexdigest() for p in pdf["content"]],
                "feat_mean": [f["feat_mean"] for f in feats],
                "feat_entropy_proxy": [f["feat_entropy_proxy"] for f in feats],
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("luma", DoubleType()),
])


def attach_synthetic_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL image payloads without any media library: one binary P6 PPM
    per row, a constant-color image whose color and dimensions are pure
    functions of the id — so a SQL oracle can predict every decoded
    feature exactly while the decode itself still parses genuine netpbm
    bytes (header, maxval, raster reshape). color = (7·id, 13·id, 29·id)
    mod 256, dims = (id mod 16 + 1, id mod 12 + 1)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_ppm(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.imagecodec import encode_ppm

        out = []
        for i in ids:
            i = int(i)
            w, h = i % 16 + 1, i % 12 + 1
            color = np.array([i * 7 % 256, i * 13 % 256, i * 29 % 256],
                             dtype=np.uint8)
            out.append(encode_ppm(np.broadcast_to(color, (h, w, 3))))
        return pd.Series(out)

    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        (F.col(id_col) % 16 + 1).cast("int").alias("width"),
        (F.col(id_col) % 12 + 1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_ppm(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL compressed-image payloads with stdlib zlib only: one 8-bit
    RGB PNG per row, a GRADIENT image pixel(x, y) = base + x + y per
    channel with base = (7·id, 13·id, 29·id) mod 100 and dims =
    (id mod 16 + 1, id mod 12 + 1) — values stay < 256, so channel means
    are closed-form (base + (w−1)/2 + (h−1)/2) for a SQL oracle while the
    non-constant raster forces every scanline filter (the encoder cycles
    None→Sub→Up→Average→Paeth per row) through
    :func:`..functions.imagecodec.decode_png`'s real inverse."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_png(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.imagecodec import encode_png

        out = []
        for i in ids:
            i = int(i)
            w, h = i % 16 + 1, i % 12 + 1
            base = np.array([i * 7 % 100, i * 13 % 100, i * 29 % 100])
            img = (base[None, None, :]
                   + np.arange(w)[None, :, None]
                   + np.arange(h)[:, None, None]).astype(np.uint8)
            out.append(encode_png(img, filters="cycle"))
        return pd.Series(out)

    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/png").alias("mime"),
        (F.col(id_col) % 16 + 1).cast("int").alias("width"),
        (F.col(id_col) % 12 + 1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_png(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL JPEG payloads with numpy only (r10,
    :mod:`..functions.jpegcodec`): one baseline 4:4:4 JFIF per row — an
    8×8-BLOCK-constant gray-valued image (block(bx, by) = base + bx + by,
    base = 7·id mod 100, all three channels equal) encoded with FLAT
    quantization tables. Equal channels make Cb/Cr exactly 128 and
    block-constant content makes every block DC-only, so with q=1 the
    decode is bit-exact and channel means stay closed-form
    (base + (wb−1)/2 + (hb−1)/2 — a SQL oracle) while the bitstream still
    exercises the full real path: canonical Huffman DC/AC decode, EOB
    runs, DC prediction across MCUs, dequant, IDCT, YCbCr→RGB."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_jpeg(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.jpegcodec import encode_jpeg

        out = []
        for i in ids:
            i = int(i)
            wb, hb = i % 3 + 1, i % 2 + 1
            base = i * 7 % 100
            blocks = (base + np.arange(wb)[None, :]
                      + np.arange(hb)[:, None]).astype(np.uint8)
            gray = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
            out.append(encode_jpeg(np.stack([gray] * 3, axis=2),
                                   quant=np.ones((8, 8))))
        return pd.Series(out)

    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/jpeg").alias("mime"),
        ((F.col(id_col) % 3 + 1) * 8).cast("int").alias("width"),
        ((F.col(id_col) % 2 + 1) * 8).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_jpeg(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_jpeg_prog(df: DataFrame,
                               id_col: str = "doc_id") -> DataFrame:
    """REAL PROGRESSIVE JPEG payloads (r11,
    :func:`..functions.jpegcodec.encode_jpeg_progressive`): one SOF2
    4:2:0 JFIF per row — an 8×8-block-constant gray image
    (block(bx, by) = base + bx + by, base = 11·id mod 97, wb = id mod 4
    + 1, hb = id mod 3 + 1 blocks) with FLAT quantization, shipped as
    EIGHT scans: interleaved DC first (Al=1), per-component AC first
    bands, DC refinement bits, per-component AC refinement. Constant
    blocks are DC-only, so the two-scan DC split reconstructs exactly
    ((d>>1)<<1 | (d&1) = d) and the decode stays closed-form for the SQL
    oracle — while the bitstream still exercises the progressive
    machinery end-to-end: successive approximation, multi-block EOB
    runs spanning every all-zero AC band, 4:2:0's non-interleaved
    component grids (smaller than the MCU-padded DC grid when wb or hb
    is odd), and refinement scans over established history."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_jpeg_prog(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.jpegcodec import encode_jpeg_progressive

        out = []
        for i in ids:
            i = int(i)
            wb, hb = i % 4 + 1, i % 3 + 1
            base = i * 11 % 97
            blocks = (base + np.arange(wb)[None, :]
                      + np.arange(hb)[:, None]).astype(np.uint8)
            gray = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
            out.append(encode_jpeg_progressive(
                np.stack([gray] * 3, axis=2), quant=np.ones((8, 8)),
                subsample="420"))
        return pd.Series(out)

    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/jpeg").alias("mime"),
        ((F.col(id_col) % 4 + 1) * 8).cast("int").alias("width"),
        ((F.col(id_col) % 3 + 1) * 8).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_jpeg_prog(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_gif(df: DataFrame, id_col: str = "doc_id",
                         ) -> DataFrame:
    """REAL GIF payloads (r11, :mod:`..functions.gifcodec`): one GIF89a
    per row — a GRADIENT gray image (pixel = base + x + y, base =
    17·id mod 101, bounded < 256 so the ≤256-color palette is exact) —
    LZW-compressed for real (variable-width codes, dictionary growth),
    interlaced on odd ids so the 4-pass row shuffle decodes too. GIF is
    lossless, so the decode is bit-exact on NON-constant content and
    the closed-form oracle (base + (w−1)/2 + (h−1)/2) pins the whole
    palette+LZW+interlace path."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_gif(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.gifcodec import encode_gif

        out = []
        for i in ids:
            i = int(i)
            w, h = i % 16 + 1, i % 12 + 1
            base = i * 17 % 101
            gray = (base + np.arange(w)[None, :]
                    + np.arange(h)[:, None]).astype(np.uint8)
            out.append(encode_gif(np.stack([gray] * 3, axis=2),
                                  interlace=bool(i % 2)))
        return pd.Series(out)

    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/gif").alias("mime"),
        (F.col(id_col) % 16 + 1).cast("int").alias("width"),
        (F.col(id_col) % 12 + 1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_gif(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_tiff(df: DataFrame, id_col: str = "doc_id",
                          ) -> DataFrame:
    """REAL TIFF payloads (r11/r12, :mod:`..functions.tiffcodec`): one
    TIFF per row — a GRADIENT gray image (8-bit pixel = base + x + y,
    base = 19·id mod 103, bounded < 256) — cycling the baseline
    compressions on (id//2) % 6 (none / LZW with the horizontal-
    differencing predictor / PackBits / Deflate 8 / old-style Deflate
    32946 / LZW again — r15; (id//2) steps by 5 per class residue, so
    every id-mod-10 class sees all six), BOTH byte orders (MM keyed on (id//8) % 2, so
    every class sees both), and (r12, widened r13)
    the layout/depth/photometric classes by id mod 10:

    - 0: TILED 8-bit, (id%14+20) × (id%10+18) so the 16×16 tile grid is
      2×2 with genuinely padded edge tiles (tags 322-325);
    - 1: strip 16-BIT — the 8-bit gradient × 257 (full-scale uint16);
    - 2: tiled 16-bit (both extensions composed);
    - 3, 4: the original small strip layout (RowsPerStrip 4, so
      multi-strip assembly decodes too);
    - 5: PALETTE (photometric 3): the gradient as INDEX values with the
      affine ColorMap R = 255−i, G = i, B = 255−i — channel means stay
      closed-form (255−m, m, 255−m) and the asymmetry pins the
      plane-major ColorMap order; (id//4) % 2 flips to the 16-BIT
      palette (r14): index v·257 into a replicated 3×65536 ColorMap
      with identical means;
    - 6: CMYK (photometric 5): C = M = Y = 255−v, K = 0, whose exact
      integer conversion recovers (v, v, v) — spp=4 strip math and the
      4-sample predictor, identity in the mean;
    - 7: JPEG-IN-TIFF (compression 7, Tech Note 2): 8×8-block-constant
      gray at flat quantization (bit-exact JPEG inversion), (id%3+1)×2
      blocks in 8-row strips — or 16×16 JPEG TILES keyed on (id//4) % 2
      (r14; block-aligned tiling keeps flat-quant decode bit-exact) —
      abbreviated streams + shared JPEGTables keyed on (id//16) % 2 (so
      the class-7 residue still sees both table layouts) —
      mean = base + (wb−1)/2 + 1/2;
    - 8 (r13): RAW YCbCr (photometric 6, TIFF6 §21 macropixel data
      units, tags 529/530/532): a gray gradient, so chroma is exactly
      128 and decode is BIT-EXACT through every subsampling
      ((1,1)/(2,1)/(2,2) cycled by (id//2) % 3) — mean = the plain
      gradient closed form;
    - 9 (r13): 16-BIT CMYK: C = M = Y = 65535−v·257, K = 0, whose exact
      integer conversion recovers (v·257, …) — the ×257 closed form
      through spp=4 16-bit strip math.

    TIFF is lossless at every depth, so the closed-form oracle
    ((base + (w−1)/2 + (h−1)/2), × 257 for the 16-bit classes, affine
    for the palette class) pins the IFD parse, strip AND tile math,
    padding crop, early-change LZW and depth-correct predictor
    inversion on every pixel."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_tiff(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.tiffcodec import encode_tiff

        from ..functions.tiffcodec import encode_tiff_jpeg

        lut = np.arange(256, dtype=np.uint8)
        pal = np.stack([255 - lut, lut, 255 - lut], axis=1)
        out = []
        for i in ids:
            i = int(i)
            cls = i % 10
            base = i * 19 % 103
            # byte order keyed on i//8, NOT i%2: cls = i%10 fixes the
            # id's parity per class, so a parity-keyed option would weld
            # each class to ONE byte order (JPEG always-MM) and leave
            # those branch combinations gate-invisible
            mm = (i // 8) % 2
            if cls == 8:
                # raw (non-JPEG) YCbCr, photometric 6: gray gradient so
                # chroma is exactly 128 and decode is bit-exact through
                # every subsampling (Y carries the full-res gradient)
                w, h = i % 14 + 1, i % 10 + 1
                gray8 = (base + np.arange(w)[None, :]
                         + np.arange(h)[:, None]).astype(np.uint8)
                out.append(encode_tiff(
                    np.stack([gray8] * 3, axis=2),
                    compression=(1, 5, 32773, 8, 32946, 5)[(i // 2) % 6], rows_per_strip=4,
                    byte_order="MM" if mm else "II",
                    ycbcr_subsampling=((1, 1), (2, 1), (2, 2))
                    [(i // 2) % 3]))
                continue
            if cls == 9:
                # 16-bit CMYK: C=M=Y = 65535-v16, K=0 — the exact
                # integer separation inverse recovers (v16, v16, v16)
                w, h = i % 14 + 1, i % 10 + 1
                v16 = ((base + np.arange(w)[None, :]
                        + np.arange(h)[:, None]) * 257).astype(np.uint16)
                out.append(encode_tiff(
                    np.stack([65535 - v16, 65535 - v16, 65535 - v16,
                              np.zeros_like(v16)], axis=2),
                    compression=(1, 5, 32773, 8, 32946, 5)[(i // 2) % 6], rows_per_strip=4,
                    byte_order="MM" if mm else "II"))
                continue
            if cls == 7:
                wb = i % 3 + 1
                blocks = (base + np.arange(wb)[None, :]
                          + np.arange(2)[:, None]).astype(np.uint8)
                gray8 = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                # r14: cycle the TILED JPEG layout on (i//4)%2 — tiles
                # cut on 16-px boundaries keep 8x8 blocks intact and
                # edge padding replicates constant blocks, so the
                # flat-quant decode stays bit-exact and the closed form
                # is unchanged
                layout = (dict(tile_size=(16, 16)) if (i // 4) % 2
                          else dict(rows_per_strip=8))
                out.append(encode_tiff_jpeg(
                    np.stack([gray8] * 3, axis=2),
                    quant=np.ones((8, 8)),
                    use_jpeg_tables=bool((i // 16) % 2),
                    byte_order="MM" if mm else "II", **layout))
                continue
            big = cls in (0, 2)
            w = i % 14 + (20 if big else 1)
            h = i % 10 + (18 if big else 1)
            gray = (base + np.arange(w)[None, :]
                    + np.arange(h)[:, None]).astype(np.uint16)
            comp = (1, 5, 32773, 8, 32946, 5)[(i // 2) % 6]
            kwargs = dict(compression=comp, rows_per_strip=4,
                          byte_order="MM" if mm else "II",
                          tile_size=(16, 16) if big else None)
            if cls in (1, 2):
                page = gray * np.uint16(257)     # full-scale 16-bit
            elif cls == 5:
                if (i // 4) % 2:
                    # r14: 16-BIT palette — index v*257 into a 65536-
                    # entry LUT that replicates the 8-bit one
                    # (pal16[j] = pal[j // 257], so pal16[v*257] =
                    # pal[v]): full 3x65536 ColorMap exercised, means
                    # and closed form unchanged
                    page = (gray * np.uint16(257)).astype(np.uint16)
                    kwargs["palette"] = pal[np.arange(65536) // 257]
                else:
                    page = gray.astype(np.uint8)     # palette indices
                    kwargs["palette"] = pal
            elif cls == 6:
                v = gray.astype(np.uint8)
                page = np.stack([255 - v, 255 - v, 255 - v,
                                 np.zeros_like(v)], axis=2)
            else:
                page = gray.astype(np.uint8)
            out.append(encode_tiff(page, **kwargs))
        return pd.Series(out)

    cls = F.col(id_col) % 10
    big = cls.isin(0, 2)
    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("image/tiff").alias("mime"),
        F.when(cls == 7, (F.col(id_col) % 3 + 1) * 8)
        .otherwise(F.col(id_col) % 14 + F.when(big, 20).otherwise(1))
        .cast("int").alias("width"),
        F.when(cls == 7, 16)
        .otherwise(F.col(id_col) % 10 + F.when(big, 18).otherwise(1))
        .cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_tiff(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_mjpeg(df: DataFrame, id_col: str = "doc_id"
                           ) -> DataFrame:
    """REAL VIDEO payloads (r11, :mod:`..functions.avicodec`): one
    Motion-JPEG AVI per row — n = id mod 4 + 2 frames at 10 fps, frame f
    an 8×8-block-constant gray image (block(bx, by) = base + bx + by + f,
    base = 13·id mod 89, wb = id mod 3 + 1, hb = id mod 2 + 1 blocks)
    whose JPEG encoding uses FLAT quantization, so every frame decodes
    bit-exactly (the jpegcodec block-constant guarantee) and the video
    features stay closed-form: mean luma = base + (wb−1)/2 + (hb−1)/2 +
    (n−1)/2, motion = exactly 1.0 (consecutive frames differ by +1
    everywhere). The container walk (RIFF lists, word-aligned chunks,
    per-frame '00dc' JPEG payloads) is the real format webcams emit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_avi(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.avicodec import encode_avi_mjpeg

        out = []
        for i in ids:
            i = int(i)
            wb, hb = i % 3 + 1, i % 2 + 1
            n = i % 4 + 2
            base = i * 13 % 89
            frames = []
            for f in range(n):
                blocks = (base + f + np.arange(wb)[None, :]
                          + np.arange(hb)[:, None]).astype(np.uint8)
                gray = np.repeat(np.repeat(blocks, 8, 0), 8, 1)
                frames.append(np.stack([gray] * 3, axis=2))
            out.append(encode_avi_mjpeg(frames, fps=10.0,
                                        quant=np.ones((8, 8))))
        return pd.Series(out)

    meta = F.struct(
        F.lit("video").alias("kind"),
        F.lit("video/x-msvideo").alias("mime"),
        ((F.col(id_col) % 3 + 1) * 8).cast("int").alias("width"),
        ((F.col(id_col) % 2 + 1) * 8).cast("int").alias("height"),
        ((F.col(id_col) % 4 + 2) * 100).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_avi(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def attach_synthetic_msvc(df: DataFrame, id_col: str = "doc_id"
                          ) -> DataFrame:
    """REAL INTER-FRAME video payloads (r12, widened r13,
    :mod:`..functions.msvideo1`): one MS Video 1 AVI per row, cycling
    BOTH published variants by id parity — even ids get the 16-bit
    RGB555 stream, odd ids the 8-bit PALETTIZED stream (identity gray
    RGBQUAD table in strf, so index q decodes to (q, q, q)).

    Shared geometry, with k = id // 2: the frame grid is
    wb = k mod 2 + 2 by 2 blocks of 4x4 gray pixels, n = k mod 3 + 2
    frames at 10 fps, level step s = k mod 3 + 1. Frame 0 is all-solid
    at level q0 (7·id mod 20 for even ids on the 5-bit lattice,
    7·id mod 200 for odd ids in palette-index space); in frame f ≥ 1
    the odd checkerboard cells (exactly wb of the 2·wb cells) change to
    level q0 + f·s while the even cells stay put — so the encoder emits
    genuine SKIP blocks (temporal references to the previous frame) for
    half of every non-key frame, in both variants. Decode is
    pixel-exact: the 16-bit path lands on the RGB555 lattice (8-bit
    value G(q) = 8q + q//4, max level 19 + 3·3 = 28 < 32), the 8-bit
    path reads the identity palette (G(q) = q, max 199 + 9 < 256).
    Features stay closed-form: per-channel sums are integers, mean and
    motion are single divisions of those integers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BinaryType())
    def make_avi(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.avicodec import encode_avi_msvc, encode_avi_msvc8
        from ..functions.msvideo1 import rgb555_to_rgb888

        gray_pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
        out = []
        for i in ids:
            i = int(i)
            k = i // 2
            wb, n, s = k % 2 + 2, k % 3 + 2, k % 3 + 1
            if i % 2 == 0:            # 16-bit RGB555 leg
                q0 = 7 * i % 20

                def gray(q):
                    return np.uint16((q << 10) | (q << 5) | q)

                dtype = np.uint16
            else:                     # 8-bit palettized leg
                q0 = 7 * i % 200

                def gray(q):
                    return np.uint8(q)

                dtype = np.uint8
            frames = [np.full((8, wb * 4), gray(q0), dtype=dtype)]
            for f in range(1, n):
                nxt = frames[-1].copy()
                for by in range(2):
                    for bx in range(wb):
                        if (bx + by) % 2 == 1:
                            nxt[by * 4:by * 4 + 4,
                                bx * 4:bx * 4 + 4] = gray(q0 + f * s)
                frames.append(nxt)
            if i % 2 == 0:
                out.append(encode_avi_msvc(
                    [rgb555_to_rgb888(fr) for fr in frames], fps=10.0))
            else:
                out.append(encode_avi_msvc8(frames, gray_pal, fps=10.0))
        return pd.Series(out)

    meta = F.struct(
        F.lit("video").alias("kind"),
        F.lit("video/x-msvideo").alias("mime"),
        (((F.col(id_col) / 2).cast("long") % 2 + 2) * 4)
        .cast("int").alias("width"),
        F.lit(8).cast("int").alias("height"),
        (((F.col(id_col) / 2).cast("long") % 3 + 2) * 100)
        .cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_avi(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def extract_video_features(media: DataFrame,
                           sample_stride: int = 1) -> DataFrame:
    """REAL video decode → feature extraction over ``mapInPandas``:
    MJPEG-AVI payloads are container-parsed and per-frame JPEG-decoded
    (:mod:`..functions.avicodec`), then reduced to frame counts,
    duration, mean sampled luma and the inter-frame motion proxy. Every
    number comes from decoded pixels — the video leg of the same
    real-codec split as ``extract_image_features``; embarrassingly
    parallel per file, payloads never visit the driver."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_frames", IntegerType()),
        StructField("n_sampled", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("duration_ms", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("motion", DoubleType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.avicodec import decode_avi, video_features

        for pdf in it:
            feats = []
            for p in pdf["content"]:
                frames, fps = decode_avi(bytes(p))
                feats.append(video_features(frames, fps,
                                            sample_stride=sample_stride))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                **{c: [f[c] for f in feats] for c in
                   ("n_frames", "n_sampled", "fps", "duration_ms",
                    "width", "height", "mean_luma", "motion")}})

    return media.select("doc_id", "content").mapInPandas(batches, schema)


def extract_image_features(media: DataFrame) -> DataFrame:
    """REAL decode → feature extraction over ``mapInPandas``: netpbm/BMP
    payloads are parsed into pixel arrays (:mod:`..functions.imagecodec`)
    and reduced to channel means + Rec.601 luma. Unlike
    :func:`extract_features` (byte-level stub features for opaque
    formats), every number here is computed from decoded pixels."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import decode_image, image_features

        for pdf in it:
            feats = [image_features(decode_image(p)) for p in pdf["content"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
                "mean_r": [f["mean_r"] for f in feats],
                "mean_g": [f["mean_g"] for f in feats],
                "mean_b": [f["mean_b"] for f in feats],
                "luma": [f["luma"] for f in feats],
            })

    return media.mapInPandas(batches, schema=IMAGE_FEATURE_SCHEMA)


def resize_images(media: DataFrame, max_px: int = 256) -> DataFrame:
    """REAL resize for decodable payloads: decode → nearest-neighbor
    resample (pixel-center mapping) → re-encode, preserving aspect
    ratio; images already within ``max_px`` pass through untouched.
    PNG inputs re-encode as PNG (format preserved — alpha channels
    survive, which P6 cannot carry); everything else re-encodes as P6.
    Output schema matches the input contract so stages chain."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import (
            _PNG_SIG, decode_image, encode_png, encode_ppm, resize_nearest)

        for pdf in it:
            contents, widths, heights, mimes = [], [], [], []
            for payload, m in zip(pdf["content"], pdf["media_meta"]):
                arr = decode_image(payload)
                h, w = arr.shape[0], arr.shape[1]
                if max(w, h) > max_px:
                    s = max_px / max(w, h)
                    nw, nh = max(int(w * s), 1), max(int(h * s), 1)
                    arr = resize_nearest(arr, nw, nh)
                    w, h = nw, nh
                    # re-encode in kind: PNG stays PNG; raw formats
                    # re-encode as P6. Only re-encoded rows change mime;
                    # pass-through rows keep their original bytes AND
                    # their original mime (a BMP stays image/bmp).
                    if bytes(payload[:8]) == _PNG_SIG:
                        payload = encode_png(arr)
                        mime = "image/png"
                    else:
                        payload = encode_ppm(arr)
                        mime = "image/x-portable-pixmap"
                else:
                    mime = m["mime"]
                contents.append(payload)
                widths.append(w)
                heights.append(h)
                mimes.append(mime)
            meta = pd.DataFrame({
                "kind": [m["kind"] for m in pdf["media_meta"]],
                "mime": mimes,
                "width": pd.array(widths, dtype="int32"),
                "height": pd.array(heights, dtype="int32"),
                "duration_ms": [m["duration_ms"]
                                for m in pdf["media_meta"]],
            })
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "content": contents,
                "media_meta": list(meta.to_dict("records")),
            })

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_meta", MEDIA_META),
    ])
    return media.mapInPandas(batches, schema=schema)


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("peak", DoubleType()),
    StructField("zcr", DoubleType()),
])


def attach_synthetic_wav(df: DataFrame, id_col: str = "doc_id",
                         rate: int = 8000,
                         codec: str = "pcm") -> DataFrame:
    """REAL audio payloads without any media library: one WAV per row, a
    square wave whose amplitude (A = (id mod 9 + 1)/10), half-period
    (H = id mod 4 + 1) and length (N = id mod 50 + 2H) are pure
    functions of the id — so RMS/peak (= quantized A), duration and
    zero-crossing rate (⌊(N−1)/H⌋ / (N−1)) all have closed forms a SQL
    oracle can predict, while the decode still parses genuine RIFF
    chunks and de-interleaves real samples.

    ``codec``: ``"pcm"`` (16-bit, format tag 1), ``"ulaw"`` (G.711,
    tag 7 — the compressed-telephony leg; amplitudes pass through the
    μ-law quantizer, still closed-form because the 9 possible levels
    round-trip deterministically), or ``"flac"`` (r11,
    :mod:`..functions.flaccodec` — LOSSLESS compression, so the decoded
    samples are bit-identical to the PCM leg's and the SAME closed-form
    oracle applies while the bytes exercise fixed predictors, Rice
    residuals and frame CRCs)."""
    from pyspark.sql.functions import pandas_udf

    if codec not in ("pcm", "ulaw", "flac"):
        raise ValueError(f"codec must be pcm|ulaw|flac, got {codec!r}")

    @pandas_udf(BinaryType())
    def make_wav(ids: pd.Series) -> pd.Series:
        import numpy as np

        from ..functions.audiocodec import encode_wav, encode_wav_ulaw
        from ..functions.flaccodec import encode_flac

        enc = {"pcm": encode_wav, "ulaw": encode_wav_ulaw,
               "flac": encode_flac}[codec]
        out = []
        for i in ids:
            i = int(i)
            h, amp = i % 4 + 1, (i % 9 + 1) / 10.0
            n = i % 50 + 2 * h
            sign = ((np.arange(n) // h) % 2 == 0) * 2 - 1
            out.append(enc(amp * sign, rate))
        return pd.Series(out)

    meta = F.struct(
        F.lit("audio").alias("kind"),
        F.lit({"pcm": "audio/wav", "ulaw": "audio/basic",
               "flac": "audio/flac"}[codec]).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (((F.col(id_col) % 50 + 2 * (F.col(id_col) % 4 + 1)) * 1000)
         / rate).cast("int").alias("duration_ms"))
    return df.select(F.col(id_col).alias("doc_id"),
                     make_wav(F.col(id_col)).alias("content"),
                     meta.alias("media_meta"))


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode → waveform features over ``mapInPandas``:
    RIFF (PCM/μ-law/ADPCM) and FLAC payloads are sniffed and parsed
    into float waveforms (:mod:`..functions.audiocodec` /
    :mod:`..functions.flaccodec`) and reduced to duration, RMS, peak,
    and zero-crossing rate. Lossy audio (MP3/AAC) stays the stub."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audiocodec import audio_features, decode_wav
        from ..functions.flaccodec import decode_flac

        def dec(p: bytes):
            return (decode_flac(p) if bytes(p[:4]) == b"fLaC"
                    else decode_wav(p))

        for pdf in it:
            feats = [audio_features(*dec(p)) for p in pdf["content"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_samples": [f["n_samples"] for f in feats],
                "duration_ms": [f["duration_ms"] for f in feats],
                "rms": [f["rms"] for f in feats],
                "peak": [f["peak"] for f in feats],
                "zcr": [f["zcr"] for f in feats],
            })

    return media.mapInPandas(batches, schema=AUDIO_FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize plumbing: clamp width/height to ``max_px`` preserving aspect
    ratio and emit a (stub-)re-encoded payload. The pixel resample itself is
    stubbed (payload passes through with a truncation marker); the metadata
    arithmetic, schema, and Arrow batch shape are the real contract."""
    w = F.col("media_meta.width")
    h = F.col("media_meta.height")
    scale = F.when(F.greatest(w, h) > max_px,
                   F.lit(max_px) / F.greatest(w, h).cast("double")) \
             .otherwise(F.lit(1.0))
    new_meta = F.struct(
        F.col("media_meta.kind").alias("kind"),
        F.col("media_meta.mime").alias("mime"),
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("width"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("height"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
    )
    # stub re-encode: payload size shrinks with the pixel count; a real
    # deployment swaps this expression for a decode->resample->encode UDF
    new_content = F.when(scale < 1.0, F.substring(
        F.col("content"), 1,
        F.greatest((F.length(F.col("content")) * scale * scale).cast("int"),
                   F.lit(1)))).otherwise(F.col("content"))
    return media.select("doc_id", new_content.alias("content"),
                        new_meta.alias("media_meta"))


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled offset. The frame *decode* is stubbed (returns the offset and a
    slice digest); schema/explode shape is the real contract."""
    import hashlib

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_ms", IntegerType()),
        StructField("frame_hash", StringType()),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_ms": [], "frame_hash": []}
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["content"],
                                             pdf["media_meta"]):
                duration = meta.get("duration_ms") or every_ms
                for off in range(0, int(duration), every_ms):
                    lo = off % max(len(payload), 1)
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_ms"].append(off)
                    rows["frame_hash"].append(
                        hashlib.md5(payload[lo:lo + 64]).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(batches, schema=schema)
