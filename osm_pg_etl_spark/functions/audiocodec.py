"""Pure-numpy WAV (RIFF/PCM) codec — the real AUDIO decode leg of the
multimodal pipeline, sibling of :mod:`.imagecodec`.

Uncompressed PCM WAV is a chunked header over raw little-endian samples:
decodable (and encodable) with numpy alone, so audio payloads flow
through ``mapInPandas`` as genuine waveforms — header parsing, channel
de-interleaving, sample-width scaling all real. Compressed audio
(MP3/AAC/Opus) stays behind the documented stub boundary
(:func:`..operators.multimodal.decode_stub`); a libav deployment
replaces only :func:`decode_wav`'s rejection branch.

Format support: PCM (format tag 1) 8/16/32-bit int samples, any channel
count and rate; chunk walker tolerates extra chunks (LIST, fact) and
odd-length padding per the RIFF spec.
"""

from __future__ import annotations

import numpy as np

_WIDTH_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → ((n_samples, n_channels) float64 in [-1, 1],
    sample_rate). 8-bit is unsigned per the spec; 16/32-bit signed."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i:i + 4]
        size = int.from_bytes(payload[i + 4:i + 8], "little")
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1:
        raise NotImplementedError(
            f"only PCM WAV decodes without an audio library "
            f"(format tag {tag})")
    width = bits // 8
    dtype = _WIDTH_DTYPE.get(width)
    if dtype is None or channels <= 0:
        raise ValueError(f"unsupported WAV layout bits={bits} "
                         f"channels={channels}")
    count = len(data) // (width * channels) * channels
    raw = np.frombuffer(data, dtype=dtype, count=count)
    samples = raw.reshape(-1, channels).astype(np.float64)
    if width == 1:
        samples = (samples - 128.0) / 128.0
    else:
        samples = samples / float(2 ** (bits - 1))
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n, channels) float in [-1, 1] → PCM WAV bytes (16-bit default)."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    if bits != 16:
        raise ValueError("encoder emits 16-bit PCM only")
    pcm = np.clip(np.round(a * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    channels = a.shape[1]
    block = channels * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Waveform summary: duration, RMS, peak, zero-crossing rate (mean
    over channels; ZCR = sign changes / (n-1) on the first channel)."""
    n = samples.shape[0]
    if n == 0:
        return {"n_samples": 0, "duration_ms": 0.0, "rms": 0.0,
                "peak": 0.0, "zcr": 0.0}
    rms = float(np.sqrt(np.mean(samples ** 2)))
    peak = float(np.max(np.abs(samples)))
    ch0 = samples[:, 0]
    zcr = (float(np.mean(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
           if n > 1 else 0.0)
    return {"n_samples": int(n), "duration_ms": n * 1000.0 / rate,
            "rms": rms, "peak": peak, "zcr": zcr}
