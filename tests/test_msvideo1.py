"""functions/msvideo1 + the avicodec CRAM dispatch: real INTER-FRAME
video decode. The walk order (bottom-up DIB, bit 0 = bottom-left) is
pinned by a hand-crafted stream, independent of our own encoder; the
encoder round-trips every intra mode exactly on RGB555-representable
frames; skip blocks genuinely copy from the previous frame."""

import numpy as np
import pytest

from osm_pg_etl_spark.functions.avicodec import (
    decode_avi, encode_avi_msvc, video_features)
from osm_pg_etl_spark.functions.msvideo1 import (
    decode_msvc_frame, encode_msvc_frame, rgb555_to_rgb888,
    rgb888_to_rgb555)

RED, BLUE = 0x7C00, 0x001F


def rep5(q):
    """The representable 8-bit level for a 5-bit channel value."""
    return (q << 3) | (q >> 2)


def gray555(q):
    """Solid gray frame value: all three channels at 5-bit level q."""
    return (q << 10) | (q << 5) | q


def frame_from_555(packed):
    """(h, w) uint16 bottom-up buffer -> top-down RGB888 frame."""
    return rgb555_to_rgb888(np.asarray(packed, dtype=np.uint16)[::-1])


def test_handcrafted_two_color_pins_walk_order():
    """flags=0x0001 with colors (red, blue): exactly ONE red pixel, at
    the block's first-walked position = the IMAGE's bottom-left (the
    DIB walk starts at the bottom row)."""
    stream = bytes([0x01, 0x00]) + RED.to_bytes(2, "little") \
        + BLUE.to_bytes(2, "little")
    buf = decode_msvc_frame(stream, 4, 4, None)
    img = rgb555_to_rgb888(buf[::-1])
    assert tuple(img[3, 0]) == (255, 0, 0)          # bottom-left red
    assert (img.reshape(-1, 3) == (0, 0, 255)).all(axis=1).sum() == 15


def test_handcrafted_eight_color_quadrants():
    """8-color: first color's bit 15 set; each 2x2 quadrant has its own
    pair; quadrant index ((y&2)<<1)|(x&2) in walk space."""
    pairs = [(0x8000 | gray555(10), gray555(1)),
             (gray555(11), gray555(2)),
             (gray555(12), gray555(3)),
             (gray555(13), gray555(4))]
    flags = 0x00FF               # first two walked rows all bit-set
    stream = flags.to_bytes(2, "little") + b"".join(
        hi.to_bytes(2, "little") + lo.to_bytes(2, "little")
        for hi, lo in pairs)
    buf = decode_msvc_frame(stream, 4, 4, None)
    img = rgb555_to_rgb888(buf[::-1])
    # walk rows 0-1 (image rows 3-2): hi colors; rows 2-3 (image 1-0): lo
    assert img[3, 0, 0] == rep5(10) and img[3, 2, 0] == rep5(11)
    assert img[2, 1, 0] == rep5(10) and img[2, 3, 0] == rep5(11)
    assert img[1, 0, 0] == rep5(3) and img[1, 2, 0] == rep5(4)
    assert img[0, 3, 0] == rep5(4)


def test_solid_and_skip_inter_frame():
    """Frame 2 = frame 1 except one block: its stream is skip-dominated
    and strictly smaller; the unchanged blocks are copies of frame 1."""
    f1 = np.full((8, 8), gray555(5), dtype=np.uint16)
    f2 = f1.copy()
    f2[0:4, 4:8] = gray555(9)
    s1 = encode_msvc_frame(f1, None)
    s2 = encode_msvc_frame(f2, f1)
    assert len(s2) < len(s1)
    d1 = decode_msvc_frame(s1, 8, 8, None)
    d2 = decode_msvc_frame(s2, 8, 8, d1)
    assert np.array_equal(rgb555_to_rgb888(d2), rgb555_to_rgb888(f2))
    # and the second frame's stream really starts with a skip code
    assert (s2[1] & 0xFC) == 0x84


def test_skip_run_longer_than_1023_blocks():
    """A fully-unchanged 1088-block frame needs two skip codes."""
    f = np.full((136, 128), gray555(7), dtype=np.uint16)
    s = encode_msvc_frame(f, f)
    assert len(s) == 4                                # two skip words
    assert (s[1] & 0xFC) == 0x84 and (s[3] & 0xFC) == 0x84
    d = decode_msvc_frame(s, 128, 136, f)
    assert np.array_equal(d, f)


def test_solid_red1_aliases_skip_and_is_escaped():
    """Solid colors with red == 1 would collide with skip codes; the
    encoder must emit them as an equal-pair 2-color block instead."""
    color = (1 << 10) | (20 << 5) | 3
    f = np.full((4, 4), color, dtype=np.uint16)
    s = encode_msvc_frame(f, None)
    assert (s[1] & 0xFC) != 0x84                      # NOT a skip code
    d = decode_msvc_frame(s, 4, 4, None)
    assert np.array_equal(d & 0x7FFF, f)


def test_all_intra_modes_roundtrip_exactly():
    """solid + 2-color + 8-color blocks in one frame, all exact."""
    f = np.zeros((8, 8), dtype=np.uint16)
    f[0:4, 0:4] = gray555(20)                          # solid
    f[0:4, 4:8] = gray555(3)                           # 2-color checker
    f[0:4, 4:8][::2, ::2] = gray555(28)
    for qi, (qy, qx) in enumerate([(4, 0), (4, 2), (6, 0), (6, 2)]):
        f[qy:qy + 2, qx:qx + 2] = gray555(qi + 1)      # 8-color quads
        f[qy, qx] = gray555(qi + 10)
    f[4:8, 4:8] = gray555(15)
    s = encode_msvc_frame(f, None)
    d = decode_msvc_frame(s, 8, 8, None)
    assert np.array_equal(d & 0x7FFF, f)


def test_lossy_fallback_is_deterministic_and_two_color():
    """>2 colors per quadrant exceeds the format: the luma-split
    fallback emits a valid 2-color block, deterministically."""
    f = np.arange(16, dtype=np.uint16).reshape(4, 4) * 97 % 0x8000
    s1 = encode_msvc_frame(f, None)
    s2 = encode_msvc_frame(f.copy(), None)
    assert s1 == s2
    d = decode_msvc_frame(s1, 4, 4, None)
    assert len(np.unique(d)) <= 2


def test_avi_container_roundtrip_and_fps():
    """End-to-end: RGB frames -> CRAM AVI -> decode_avi. Inputs use
    only representable levels, so the round-trip is pixel-exact; the
    static checkerboard cells of later frames become true skips."""
    frames = []
    for f in range(3):
        img = np.zeros((8, 8, 3), dtype=np.uint8)
        for by in range(2):
            for bx in range(2):
                q = 6 if (bx + by) % 2 == 0 else 6 + f
                img[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = rep5(q)
        frames.append(img)
    avi = encode_avi_msvc(frames, fps=10.0)
    dec, fps = decode_avi(avi)
    assert fps == 10.0 and len(dec) == 3
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))
    feats = video_features(dec, fps)
    assert feats["n_frames"] == 3 and feats["duration_ms"] == 300.0
    # half the pixels move by rep5(q+1)-rep5(q) per step
    d1, d2 = rep5(7) - rep5(6), rep5(8) - rep5(7)
    mad = (d1 + d2) / 2.0 / 2
    assert feats["motion"] == 0.299 * mad + 0.587 * mad + 0.114 * mad


def test_boundaries_raise_loudly():
    with pytest.raises(NotImplementedError, match="multiples of 4"):
        encode_msvc_frame(np.zeros((5, 4), dtype=np.uint16), None)
    with pytest.raises(NotImplementedError, match="multiples of 4"):
        decode_msvc_frame(b"", 6, 4, None)
    with pytest.raises(ValueError, match="truncated"):
        decode_msvc_frame(b"\x00", 4, 4, None)
    with pytest.raises(ValueError, match="skip of 0"):
        decode_msvc_frame(bytes([0x00, 0x84]), 4, 4, None)
    f = np.zeros((4, 4, 3), dtype=np.uint8)
    avi = bytearray(encode_avi_msvc([f]))
    i = avi.find(b"strf")
    avi[i + 8 + 14:i + 8 + 16] = (4).to_bytes(2, "little")  # biBitCount=4
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_avi(bytes(avi))
    # 8-bit decodes since r13 — but an 8-bit strf that carries no
    # RGBQUAD table (biClrUsed=0 -> 256 expected entries, none present)
    # is a truncated palette
    avi[i + 8 + 14:i + 8 + 16] = (8).to_bytes(2, "little")
    with pytest.raises(ValueError, match="palette"):
        decode_avi(bytes(avi))


def test_roundtrip_random_representable_frames():
    """Randomized (seeded) frames drawn from the RGB555 lattice with
    inter-frame block reuse: container round-trip stays pixel-exact."""
    rng = np.random.default_rng(55)
    base555 = np.zeros((16, 12), dtype=np.uint16)
    for by in range(4):              # each block: random 2-color pattern
        for bx in range(3):          # (the format is lossy beyond that)
            qa, qb = rng.integers(0, 32, 2)
            patt = rng.integers(0, 2, (4, 4))
            base555[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
                np.where(patt == 1, gray555(int(qa)), gray555(int(qb)))
    frames = [rgb555_to_rgb888(base555)]
    for _ in range(3):
        nxt = frames[-1].copy()
        # mutate a random block to a random 2-color pattern
        by, bx = rng.integers(0, 4), rng.integers(0, 3)
        q1, q2 = rng.integers(0, 32, 2)
        patt = rng.integers(0, 2, (4, 4), dtype=np.uint16)
        block = np.where(patt == 1, gray555(int(q1)), gray555(int(q2)))
        nxt[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = \
            rgb555_to_rgb888(block.astype(np.uint16))
        frames.append(nxt)
    dec, _ = decode_avi(encode_avi_msvc(frames))
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))


def test_stereo_adpcm_roundtrip():
    """r12: stereo IMA ADPCM — per-channel headers, 4-byte-group L/R
    interleave, independent state machines. (Lives here with the other
    r12 codec additions.)"""
    import numpy as np

    from osm_pg_etl_spark.functions.audiocodec import (
        adpcm_decode_stereo, adpcm_encode_stereo, decode_wav,
        encode_wav_adpcm)

    t = np.arange(2000) / 8000.0
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.25 * np.sin(2 * np.pi * 220 * t + 1.0)
    sig = np.stack([left, right], axis=1)

    wav = encode_wav_adpcm(sig, 8000)
    dec, rate = decode_wav(wav)
    assert rate == 8000 and dec.shape == (2000, 2)
    # lossy but tracking: per-channel RMS error small vs signal RMS
    for c in range(2):
        err = np.sqrt(np.mean((dec[:, c] - sig[:, c]) ** 2))
        assert err < 0.02, (c, err)
    # channels stay independent: wildly different content per channel
    assert abs(np.std(dec[:, 0]) / np.std(dec[:, 1]) - 2.0) < 0.2

    # raw block layer: constant channels decode near-exactly after seed
    pcm = np.stack([np.full(500, 1000), np.full(500, -2000)], axis=1)
    raw = adpcm_encode_stereo(pcm.astype(np.int32), 64)
    out = adpcm_decode_stereo(raw, 64)[:500]
    assert np.abs(out - pcm).max() <= 16

    import pytest
    with pytest.raises(ValueError, match="multiple of 8"):
        adpcm_encode_stereo(pcm.astype(np.int32), 60)
    with pytest.raises(ValueError, match="fragment"):
        adpcm_decode_stereo(raw[:4], 64)
    with pytest.raises(ValueError, match="mid-group"):
        adpcm_decode_stereo(raw[:14], 64)


def test_eight_color_solid_last_quadrant():
    """Review regression (r12): an 8-color block whose bottom-right 2x2
    quadrant is SOLID must still satisfy the bit-15 flags constraint —
    the encoder emits a never-matching dummy first color for that pair
    instead of tripping its own assertion / emitting a corrupt word."""
    f = np.zeros((4, 4), dtype=np.uint16)
    f[0:2, 0:2] = gray555(1)
    f[0, 0] = gray555(2)            # quad 0: two colors
    f[0:2, 2:4] = gray555(3)        # quad 1: solid
    f[2:4, 0:2] = gray555(4)        # quad 2: solid
    f[2:4, 2:4] = gray555(5)        # quad 3: SOLID (the regression)
    s = encode_msvc_frame(f, None)
    assert (s[1] & 0x80) == 0       # a valid 2/8-color flags word
    d = decode_msvc_frame(s, 4, 4, None)
    assert np.array_equal(d & 0x7FFF, f)


def test_msvc_frame_starting_with_jpeg_soi_bytes():
    """Review regression (r12): a CRAM frame whose first code word is
    the 1-color block 0xD8FF (bytes FF D8 — the JPEG SOI marker) must
    dispatch on the DECLARED codec, not the JPEG byte sniff."""
    color = 0x58FF                   # solid word 0x8000|0x58FF = 0xD8FF
    f = rgb555_to_rgb888(np.full((4, 4), color, dtype=np.uint16))
    dec, _ = decode_avi(encode_avi_msvc([f]))
    assert np.array_equal(dec[0], f)


# ---------------------------------------------------------------- 8-bit

def test_msvc8_handcrafted_two_color_pins_walk_order():
    """8-bit 2-color: flags=0x0001 with index bytes (7, 9) — exactly ONE
    pixel reads index 7, at the block's BOTTOM-LEFT corner (bit 0 of the
    mask is the first pixel of the bottom-up walk)."""
    from osm_pg_etl_spark.functions.msvideo1 import decode_msvc_frame8

    stream = bytes([0x01, 0x00, 7, 9])
    d = decode_msvc_frame8(stream, 4, 4, None)
    assert d[0, 0] == 7                 # bottom-up row 0 = bottom row
    assert (d == 9).sum() == 15


def test_msvc8_handcrafted_eight_color_and_one_color():
    """8-bit 8-color: the CODE WORD ITSELF is the mask (byte_b >= 0x90)
    and eight index bytes follow, one (set, clear) pair per quadrant;
    1-color carries its index in byte_a with a free marker byte."""
    from osm_pg_etl_spark.functions.msvideo1 import decode_msvc_frame8

    # mask 0x9000: bits 12 and 15 set -> pixels (3,0) and (3,3) read
    # their quadrant pair's FIRST index, everything else the second
    stream = bytes([0x00, 0x90, 1, 2, 3, 4, 5, 6, 7, 8])
    d = decode_msvc_frame8(stream, 4, 4, None)
    assert d[3, 0] == 5 and d[3, 3] == 7     # quads 2, 3 first colors
    assert d[0, 0] == 2 and d[0, 3] == 4     # quads 0, 1 second colors
    assert d[3, 1] == 6 and d[3, 2] == 8
    # 1-color: index 0xAB, marker 0x80
    d2 = decode_msvc_frame8(bytes([0xAB, 0x80]), 4, 4, None)
    assert (d2 == 0xAB).all()


def test_msvc8_all_intra_modes_roundtrip_exactly():
    from osm_pg_etl_spark.functions.msvideo1 import (
        decode_msvc_frame8, encode_msvc_frame8)

    rng = np.random.RandomState(11)
    f = np.zeros((8, 16), dtype=np.uint8)
    f[0:4, 0:4] = 200                                      # solid
    f[0:4, 4:8] = np.where(rng.rand(4, 4) > .5, 3, 250)    # 2-color
    for qi, (qy, qx) in enumerate([(0, 0), (0, 2), (2, 0), (2, 2)]):
        f[qy:qy + 2, 8 + qx:8 + qx + 2] = \
            np.where(rng.rand(2, 2) > .5, 20 * qi + 1, 20 * qi + 2)
    f[0:4, 12:16] = np.where(rng.rand(4, 4) > .5, 0, 255)
    f[4:8, :] = 99
    d = decode_msvc_frame8(encode_msvc_frame8(f, None), 16, 8, None)
    assert np.array_equal(d, f)


def test_msvc8_skip_blocks_copy_previous_frame():
    from osm_pg_etl_spark.functions.msvideo1 import (
        decode_msvc_frame8, encode_msvc_frame8)

    f0 = np.arange(8 * 8, dtype=np.uint8).reshape(8, 8) // 16 * 50
    f1 = f0.copy()
    f1[4:8, 0:4] = 222
    e0, e1 = encode_msvc_frame8(f0, None), encode_msvc_frame8(f1, f0)
    assert len(e1) < len(e0) + 4        # unchanged blocks became skips
    d0 = decode_msvc_frame8(e0, 8, 8, None)
    d1 = decode_msvc_frame8(e1, 8, 8, d0)
    assert np.array_equal(d1, f1)
    # strictness: a skip run past the last block raises (r13)
    with pytest.raises(ValueError, match="exceeds"):
        decode_msvc_frame8(bytes([5, 0x84]), 8, 8, d0)
    with pytest.raises(ValueError, match="exceeds"):
        decode_msvc_frame(bytes([5, 0x84]), 8, 8, None)


def test_msvc8_eight_color_solid_anchor_quadrants():
    """An 8-color block whose quads 2/3 are SOLID must still produce a
    mask word >= 0x9000 (the variant's mode marker)."""
    from osm_pg_etl_spark.functions.msvideo1 import (
        decode_msvc_frame8, encode_msvc_frame8)

    f = np.zeros((4, 4), dtype=np.uint8)
    f[0:2, 0:2] = np.array([[1, 2], [2, 1]])
    f[0:2, 2:4] = 3
    f[2:4, 0:2] = 4
    f[2:4, 2:4] = 5
    s = encode_msvc_frame8(f, None)
    assert s[1] >= 0x90                 # valid 8-color marker
    assert np.array_equal(decode_msvc_frame8(s, 4, 4, None), f)


def test_msvc8_avi_container_palette_roundtrip():
    """encode_avi_msvc8 -> decode_avi: the RGBQUAD palette in strf maps
    indices to RGB; inter-frame state threads across 00dc chunks."""
    from osm_pg_etl_spark.functions.avicodec import encode_avi_msvc8

    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(256)                    # R = index
    pal[:, 2] = 255 - np.arange(256)              # B = 255 - index
    f0 = np.full((8, 8), 10, dtype=np.uint8)
    f1 = f0.copy()
    f1[0:4, 4:8] = 30
    avi = encode_avi_msvc8([f0, f1], pal, fps=5.0)
    frames, fps = decode_avi(avi)
    assert fps == 5.0 and len(frames) == 2
    assert np.array_equal(frames[0], pal[f0])
    assert np.array_equal(frames[1], pal[f1])
    feats = video_features(frames, fps)
    assert feats["n_frames"] == 2 and feats["motion"] > 0


def test_msvc8_missing_palette_raises():
    from osm_pg_etl_spark.functions.avicodec import encode_avi_msvc8

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    avi = bytearray(encode_avi_msvc8(
        [np.full((4, 4), 9, dtype=np.uint8)], pal))
    # zero out biClrUsed AND truncate: easier — rebuild with clr_used=0
    # by patching the strf's biClrUsed field to 0 and dropping the table
    # is fiddly; instead corrupt the table length via biClrUsed bump
    idx = bytes(avi).find(b"strf")
    # biClrUsed sits at strf body offset 32
    import struct as _s
    avi[idx + 8 + 32:idx + 8 + 36] = _s.pack("<I", 300)
    with pytest.raises(ValueError, match="palette"):
        decode_avi(bytes(avi))


def test_msvc8_palette_index_out_of_range_message():
    """Review fix (r14): a stream carrying palette indices >= biClrUsed
    raises a dedicated palette-range ValueError, not the misleading
    'truncated AVI payload' that numpy's IndexError used to surface
    as."""
    import struct as _s

    from osm_pg_etl_spark.functions.avicodec import encode_avi_msvc8

    pal = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    avi = bytearray(encode_avi_msvc8(
        [np.full((4, 4), 200, dtype=np.uint8)], pal))
    idx = bytes(avi).find(b"strf")
    # shrink biClrUsed (strf body offset 32) below the stream's indices
    avi[idx + 8 + 32:idx + 8 + 36] = _s.pack("<I", 16)
    with pytest.raises(ValueError, match="palette index 200 out of range"):
        decode_avi(bytes(avi))


def test_audio_strf_does_not_clobber_video_codec():
    """Review fix (r13): an AUDIO stream's strf (WAVEFORMATEX) after the
    video strl must NOT latch compression/bit_count/dims — only strf
    chunks preceded by a 'vids' strh dispatch the video codec."""
    import struct as _s

    f = rgb555_to_rgb888(np.full((4, 4), gray555(6), dtype=np.uint16))
    avi = encode_avi_msvc([f])
    # splice an audio strl (strh 'auds' + a WAVEFORMATEX-ish strf) right
    # after the video strl inside hdrl
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + _s.pack("<I", len(body)) + body + pad

    strh_a = chunk(b"strh", b"auds" + b"\x00" * 52)
    # 18-byte WAVEFORMATEX: wFormatTag=1 pcm, 2ch, 8000Hz, ... — bytes
    # that would misparse as a BITMAPINFOHEADER if latched
    wf = _s.pack("<HHIIHHH", 1, 2, 8000, 32000, 4, 16, 0)
    strf_a = chunk(b"strf", wf)
    strl_a = chunk(b"LIST", b"strl" + strh_a + strf_a)
    i = avi.find(b"LIST", avi.find(b"hdrl"))      # first strl LIST
    i = avi.find(b"LIST", i + 4)                   # the strl itself
    (sz,) = _s.unpack("<I", avi[i + 4:i + 8])
    end = i + 8 + sz + (sz % 2)
    patched = bytearray(avi[:end] + strl_a + avi[end:])
    # grow the enclosing hdrl LIST and RIFF sizes
    h = patched.find(b"hdrl") - 8
    (hsz,) = _s.unpack("<I", patched[h + 4:h + 8])
    patched[h + 4:h + 8] = _s.pack("<I", hsz + len(strl_a))
    (rsz,) = _s.unpack("<I", patched[4:8])
    patched[4:8] = _s.pack("<I", rsz + len(strl_a))
    frames, _ = decode_avi(bytes(patched))
    assert np.array_equal(frames[0], f)


def test_second_video_stream_raises():
    import struct as _s

    f = rgb555_to_rgb888(np.full((4, 4), gray555(6), dtype=np.uint16))
    avi = encode_avi_msvc([f])

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + _s.pack("<I", len(body)) + body + pad

    strl_v2 = chunk(b"LIST", b"strl" + chunk(b"strh", b"vids" + b"\x00" * 52))
    i = avi.find(b"LIST", avi.find(b"hdrl"))
    i = avi.find(b"LIST", i + 4)
    (sz,) = _s.unpack("<I", avi[i + 4:i + 8])
    end = i + 8 + sz + (sz % 2)
    patched = bytearray(avi[:end] + strl_v2 + avi[end:])
    h = patched.find(b"hdrl") - 8
    (hsz,) = _s.unpack("<I", patched[h + 4:h + 8])
    patched[h + 4:h + 8] = _s.pack("<I", hsz + len(strl_v2))
    (rsz,) = _s.unpack("<I", patched[4:8])
    patched[4:8] = _s.pack("<I", rsz + len(strl_v2))
    with pytest.raises(NotImplementedError, match="multi-video"):
        decode_avi(bytes(patched))
