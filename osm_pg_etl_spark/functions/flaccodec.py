"""Pure-numpy FLAC codec — the LOSSLESS compressed-audio leg of the
multimodal surface (PCM/μ-law/ADPCM live in :mod:`.audiocodec`). Real
speech corpora ship as FLAC (LibriSpeech et al.), so a training-data
pipeline hits this format immediately; and because FLAC is lossless,
the decode is bit-exact and the same closed-form square-wave oracles
that pin the PCM gate pin this one.

Decoder scope (the full baseline surface libFLAC emits): STREAMINFO +
skipped metadata blocks, fixed-blocksize frames with UTF-8 frame
numbers, all blocksize/samplerate/samplesize codes, CONSTANT / VERBATIM
/ FIXED(0-4) / LPC(1-32) subframes, wasted bits, partitioned Rice
residuals (4- and 5-bit parameters, escape-to-raw), stereo
decorrelation (left/side, right/side, mid/side), and both CRCs verified
(CRC-8 header, CRC-16 frame) — corrupt frames fail loudly. The encoder
emits genuine fixed-predictor Rice streams (order picked per channel by
residual magnitude, optional left/side or mid/side stereo) so tests and
gates decode real bitstreams, not hand-aligned bytes.

Everything is integer arithmetic until the final /2^(bps-1)
normalization — deterministic, hash-oracle-safe.
"""

from __future__ import annotations

import struct

import numpy as np

_CRC8_POLY, _CRC16_POLY = 0x07, 0x8005


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ _CRC8_POLY if c & 0x80 else c << 1) & 0xFF
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ _CRC16_POLY if c & 0x8000 else c << 1) & 0xFFFF
    return c


class _BW:
    """MSB-first bit writer."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.cur = 0
        self.n = 0

    def w(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.cur)
                self.cur = self.n = 0

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.w(0, 1)
        self.w(1, 1)

    def align(self) -> None:
        while self.n:
            self.w(0, 1)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.buf)


class _BR:
    """MSB-first bit reader."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos      # byte position
        self.bit = 0

    def r(self, bits: int) -> int:
        v = 0
        for _ in range(bits):
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def signed(self, bits: int) -> int:
        v = self.r(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def unary(self) -> int:
        q = 0
        while self.r(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _utf8_code(bw: _BW, value: int) -> None:
    """FLAC's extended UTF-8 number coding (frame index)."""
    if value < 0x80:
        bw.w(value, 8)
        return
    for nbytes, cap in ((2, 11), (3, 16), (4, 21), (5, 26), (6, 31),
                        (7, 36)):
        if value < (1 << cap):
            bw.w((0xFF00 >> nbytes) & 0xFF | (value >> (6 * (nbytes - 1))),
                 8)
            for k in range(nbytes - 2, -1, -1):
                bw.w(0x80 | ((value >> (6 * k)) & 0x3F), 8)
            return
    raise ValueError("frame number too large")


def _utf8_decode(br: _BR) -> int:
    b0 = br.r(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = br.r(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation in frame number")
        v = (v << 6) | (b & 0x3F)
    return v


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(n: int) -> int:
    return (n << 1) if n >= 0 else (-(n << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def encode_flac(samples: np.ndarray, rate: int,
                stereo_mode: str = "independent",
                block_size: int = 4096,
                predictor: str = "fixed") -> bytes:
    """(n,) or (n, ch) int16 (or float in [-1, 1]) -> FLAC bytes.
    Fixed-predictor encoding: per channel/frame the best of orders 0-2
    by total residual magnitude, single-partition Rice residuals,
    CRC-8/CRC-16 written for real. ``stereo_mode``: ``independent``,
    ``left_side`` or ``mid_side`` (stereo only) — the decorrelation
    modes real encoders pick, here selectable so tests hit each path.
    ``predictor="lpc"`` emits genuine LPC subframes (the layout libFLAC
    produces for essentially all real files: warmup, coefficient
    precision, shift, quantized coefficients, residual) using the
    order-2 polynomial coefficients — so the decoder's LPC branch is
    round-trip tested against real bitstreams, not hand-built ones."""
    a = np.asarray(samples)
    if a.dtype.kind == "f":
        a = np.clip(np.round(a * 32767.0), -32768, 32767)
    a = a.astype(np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if stereo_mode != "independent" and ch != 2:
        raise ValueError("stereo_mode needs exactly 2 channels")
    bps = 16

    out = bytearray(b"fLaC")
    si = _BW()
    si.w(block_size, 16)
    si.w(block_size, 16)
    si.w(0, 24)
    si.w(0, 24)
    si.w(rate, 20)
    si.w(ch - 1, 3)
    si.w(bps - 1, 5)
    si.w(n, 36)
    info = si.bytes() + bytes(16)         # md5 0 = unverified
    out += bytes([0x80]) + struct.pack(">I", len(info))[1:] + info

    if n == 0:
        raise ValueError("cannot encode an empty signal")
    if predictor not in ("fixed", "lpc"):
        raise ValueError("predictor must be 'fixed' or 'lpc'")

    def rice_residual(bw: _BW, bres: np.ndarray) -> None:
        mean = float(np.abs(bres).mean()) if len(bres) else 0.0
        k = min(14, max(0, int(mean).bit_length()))
        bw.w(0b00, 2)              # 4-bit Rice parameters
        bw.w(0, 4)                 # partition order 0
        bw.w(k, 4)
        for v in bres:
            u = _zigzag(int(v))
            bw.unary(u >> k)
            if k:
                bw.w(u & ((1 << k) - 1), k)

    def sub_channel(bw: _BW, x: np.ndarray, sbps: int) -> None:
        if len(x) and np.all(x == x[0]):
            bw.w(0, 1)
            bw.w(0b000000, 6)   # CONSTANT
            bw.w(0, 1)
            bw.w(int(x[0]) & ((1 << sbps) - 1), sbps)
            return
        if predictor == "lpc" and len(x) > 2:
            order, coefs, shift, prec = 2, [2, -1], 0, 4
            res = x[order:].copy()
            for j, c in enumerate(coefs):
                res = res - c * x[order - 1 - j:len(x) - 1 - j]
            bw.w(0, 1)
            bw.w(0b100000 | (order - 1), 6)   # LPC, order
            bw.w(0, 1)                        # no wasted bits
            for i in range(order):
                bw.w(int(x[i]) & ((1 << sbps) - 1), sbps)
            bw.w(prec - 1, 4)
            bw.w(shift & 0x1F, 5)
            for c in coefs:
                bw.w(c & ((1 << prec) - 1), prec)
            rice_residual(bw, res)
            return
        best, bres = 0, None
        for order in (0, 1, 2):
            if len(x) <= order:
                continue
            res = x[order:].copy()
            for j, c in enumerate(_FIXED_COEF[order]):
                res = res - c * x[order - 1 - j:len(x) - 1 - j]
            if bres is None or np.abs(res).sum() < np.abs(bres).sum():
                best, bres = order, res
        bw.w(0, 1)
        bw.w(0b001000 | best, 6)   # FIXED, order
        bw.w(0, 1)                 # no wasted bits
        for i in range(best):
            bw.w(int(x[i]) & ((1 << sbps) - 1), sbps)
        rice_residual(bw, bres)

    frame_idx = 0
    pos = 0
    while pos < n:
        blk = a[pos:pos + block_size]
        bn = len(blk)
        bw = _BW()
        bw.w(0b11111111111110, 14)
        bw.w(0, 1)
        bw.w(0, 1)                 # fixed blocksize strategy
        bw.w(0b0111, 4)            # blocksize-1 in 16 bits follows
        bw.w(0b0000, 4)            # sample rate from STREAMINFO
        assign = {"independent": ch - 1, "left_side": 0b1000,
                  "mid_side": 0b1010}[stereo_mode]
        bw.w(assign, 4)
        bw.w(0b100, 3)             # 16 bps
        bw.w(0, 1)
        _utf8_code(bw, frame_idx)
        bw.w(bn - 1, 16)
        # the header fields above are byte-aligned by construction, so
        # the CRC-8 covers exactly the whole bytes written so far
        assert bw.n == 0
        bw.w(_crc8(bytes(bw.buf)), 8)
        if stereo_mode == "left_side":
            sub_channel(bw, blk[:, 0], 16)
            sub_channel(bw, blk[:, 0] - blk[:, 1], 17)
        elif stereo_mode == "mid_side":
            side = blk[:, 0] - blk[:, 1]
            mid = (blk[:, 0] + blk[:, 1]) >> 1
            sub_channel(bw, mid, 16)
            sub_channel(bw, side, 17)
        else:
            for c in range(ch):
                sub_channel(bw, blk[:, c], 16)
        bw.align()
        bw.w(_crc16(bytes(bw.buf)), 16)
        out += bw.bytes()
        frame_idx += 1
        pos += bn
    return bytes(out)


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> ((n_samples, n_channels) float64 in [-1, 1],
    sample_rate) — the same contract as ``audiocodec.decode_wav``."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    try:
        return _decode_flac_body(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated FLAC payload: {e}") from e


def _decode_flac_body(payload: bytes) -> tuple[np.ndarray, int]:
    pos = 4
    rate = ch = bps = 0
    total = None
    last = False
    seen_si = False
    while not last:
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + payload[pos + 1:pos + 4])
        body = payload[pos + 4:pos + 4 + size]
        if btype == 0:   # STREAMINFO
            br = _BR(body)
            br.r(16), br.r(16), br.r(24), br.r(24)
            rate = br.r(20)
            ch = br.r(3) + 1
            bps = br.r(5) + 1
            total = br.r(36)
            seen_si = True
        pos += 4 + size
    if not seen_si:
        raise ValueError("FLAC missing STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(ch)]
    got = 0
    while pos < len(payload) and (total is None or total == 0
                                  or got < total):
        frame_start = pos
        br = _BR(payload, pos)
        if br.r(14) != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {frame_start}")
        br.r(1)
        br.r(1)   # blocking strategy (frame vs sample number — both parse)
        bs_code = br.r(4)
        sr_code = br.r(4)
        assign = br.r(4)
        ss_code = br.r(3)
        br.r(1)
        _utf8_decode(br)
        if bs_code == 0b0110:
            bn = br.r(8) + 1
        elif bs_code == 0b0111:
            bn = br.r(16) + 1
        elif bs_code == 0b0001:
            bn = 192
        elif 0b0010 <= bs_code <= 0b0101:
            bn = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            bn = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved blocksize code")
        if sr_code == 0b1100:
            br.r(8)
        elif sr_code in (0b1101, 0b1110):
            br.r(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample-rate code")
        sbits = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20,
                 0b110: 24}.get(ss_code, bps)
        assert br.bit == 0
        if _crc8(payload[frame_start:br.pos]) != br.r(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if assign <= 0b0111:
            nch, kinds = assign + 1, ["ind"] * (assign + 1)
        elif assign == 0b1000:
            nch, kinds = 2, ["ls0", "ls1"]
        elif assign == 0b1001:
            nch, kinds = 2, ["rs0", "rs1"]
        elif assign == 0b1010:
            nch, kinds = 2, ["ms0", "ms1"]
        else:
            raise ValueError("reserved channel assignment")
        if nch != ch:
            raise ValueError("frame channel count != STREAMINFO")

        sub: list[np.ndarray] = []
        for kind in kinds:
            cbps = sbits + (1 if kind in ("ls1", "rs0", "ms1") else 0)
            if br.r(1):
                raise ValueError("bad subframe header padding bit")
            stype = br.r(6)
            wasted = 0
            if br.r(1):
                wasted = br.unary() + 1
                cbps -= wasted
            if stype == 0:          # CONSTANT
                x = np.full(bn, br.signed(cbps), dtype=np.int64)
            elif stype == 1:        # VERBATIM
                x = np.array([br.signed(cbps) for _ in range(bn)],
                             dtype=np.int64)
            elif 8 <= stype <= 12:  # FIXED order 0-4
                order = stype - 8
                x = _residual_decode(br, bn, order, cbps)
                coefs = _FIXED_COEF[order]
                for i in range(order, bn):
                    x[i] += sum(c * x[i - 1 - j]
                                for j, c in enumerate(coefs))
            elif stype >= 32:       # LPC, order 1-32
                order = stype - 31
                x = np.empty(bn, dtype=np.int64)
                warm = [br.signed(cbps) for _ in range(order)]
                prec = br.r(4) + 1
                if prec == 16:
                    raise ValueError("invalid LPC precision code")
                shift = br.signed(5)
                coefs = [br.signed(prec) for _ in range(order)]
                # warmup was already read above (spec layout: warmup,
                # precision, shift, coefs, residual) — _residual_decode
                # must NOT read it again
                res = _residual_decode(br, bn, order, cbps,
                                       read_warmup=False)
                x[:order] = warm
                x[order:] = res[order:]
                for i in range(order, bn):
                    pred = sum(c * int(x[i - 1 - j])
                               for j, c in enumerate(coefs)) >> shift
                    x[i] += pred
            else:
                raise ValueError(f"reserved subframe type {stype}")
            if wasted:
                x = x << wasted
            sub.append(x)

        br.align()
        if _crc16(payload[frame_start:br.pos]) != br.r(16):
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.pos

        if kinds[0] == "ls0":
            left, side = sub
            sub = [left, left - side]
        elif kinds[0] == "rs0":
            side, right = sub
            sub = [right + side, right]
        elif kinds[0] == "ms0":
            mid, side = sub
            m2 = (mid << 1) | (side & 1)
            sub = [(m2 + side) >> 1, (m2 - side) >> 1]
        for c in range(ch):
            chans[c].extend(int(v) for v in sub[c])
        got += bn

    if total and got < total:
        raise ValueError(f"truncated FLAC payload: decoded {got} of "
                         f"{total} declared samples")
    arr = np.array(chans, dtype=np.float64).T
    if total:
        arr = arr[:total]
    return arr / float(1 << (bps - 1)), rate


def _residual_decode(br: _BR, bn: int, order: int, cbps: int,
                     read_warmup: bool = True) -> np.ndarray:
    """Partitioned Rice residual -> int64 array; with ``read_warmup``
    (the FIXED path) the first ``order`` entries are warmup samples read
    here, else (LPC — its header interleaves precision/shift/coefs after
    the warmup, so the caller reads it) they are left zero and the
    caller fills them."""
    warm = ([br.signed(cbps) for _ in range(order)]
            if order and read_warmup else [0] * order)
    method = br.r(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = br.r(4)
    nparts = 1 << porder
    out = np.empty(bn, dtype=np.int64)
    out[:order] = warm
    idx = order
    for p in range(nparts):
        cnt = (bn >> porder) - (order if p == 0 else 0)
        k = br.r(pbits)
        if k == escape:
            raw = br.r(5)
            for _ in range(cnt):
                out[idx] = br.signed(raw) if raw else 0
                idx += 1
        else:
            for _ in range(cnt):
                u = (br.unary() << k) | (br.r(k) if k else 0)
                out[idx] = _unzigzag(u)
                idx += 1
    if idx != bn:
        raise ValueError("residual partition sizes do not cover block")
    return out
