"""WARC (Web ARChive, ISO 28500) source — the Common Crawl ingestion
format, i.e. THE on-disk shape of the web-scale training-data corpora
this engine's dedup/quality/PII operators exist to process. The
reference pipeline has no analog (it ingests OSM PBF); this is
training-data extension surface like the media codecs.

Format support: WARC/1.0 and /1.1 records (warcinfo, request,
response, metadata, resource, conversion), CRLF header blocks,
Content-Length-delimited payloads, and BOTH packagings seen in the
wild — plain concatenated records and the Common Crawl shape where
every record is its own gzip member (``zlib`` handles member-at-a-time
via ``unused_data``). HTTP response records (Content-Type
``application/http``) are split into status / headers / body; body
bytes are returned raw (no chunked/deflate transfer decoding — crawl
WARCs store payloads pre-decoded, and the boundary raises nothing: the
raw body is still returned with the headers to inspect).

Scale shape: one WARC file maps to one ``mapInPandas`` batch row; the
record walk is a linear byte scan, embarrassingly parallel per file —
identical execution contract to the media codecs (one exchange-free
plan; at 100 TB the scaling axis is executor count).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

_CRLF2 = b"\r\n\r\n"


def _gunzip_members(payload: bytes) -> bytes:
    """Concatenate all gzip members (the Common Crawl record-per-member
    packaging); pass through if not gzip."""
    if payload[:2] != b"\x1f\x8b":
        return payload
    out = bytearray()
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out += d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        rest = d.unused_data
    if rest.strip(b"\x00"):
        raise ValueError("trailing non-gzip bytes after WARC members")
    return bytes(out)


def decode_warc(payload: bytes) -> list[dict]:
    """WARC bytes (plain or per-record-gzip) -> list of record dicts:
    ``type``, ``uri``, ``date``, ``record_id``, ``content_type``,
    ``payload`` (raw block), and for HTTP responses additionally
    ``http_status``, ``http_content_type``, ``body``."""
    data = _gunzip_members(payload)
    pos = 0
    records: list[dict] = []
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos:pos + 5] == b"WARC/":
            raise ValueError(f"bad WARC record header at byte {pos}")
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        lines = data[pos:hdr_end].decode("utf-8",
                                         errors="replace").split("\r\n")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record without a valid Content-Length")
        block_start = hdr_end + 4
        block = data[block_start:block_start + length]
        if len(block) < length:
            raise ValueError("truncated WARC record block")
        rec = {
            "type": headers.get("warc-type", ""),
            "uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type", ""),
            "payload": block,
        }
        if rec["content_type"].startswith("application/http"):
            he = block.find(_CRLF2)
            http_hdr = block[:he if he >= 0 else len(block)]
            rec["body"] = block[he + 4:] if he >= 0 else b""
            hlines = http_hdr.decode("utf-8",
                                     errors="replace").split("\r\n")
            status_parts = hlines[0].split(" ", 2) if hlines else []
            rec["http_status"] = (int(status_parts[1])
                                  if len(status_parts) > 1
                                  and status_parts[1].isdigit() else None)
            rec["http_content_type"] = next(
                (ln.partition(":")[2].strip() for ln in hlines[1:]
                 if ln.lower().startswith("content-type:")), None)
        records.append(rec)
        pos = block_start + length
    return records


def _hv(value) -> str:
    """Validate one WARC header value: headers are CRLF-framed, so an
    embedded CR/LF in a caller-supplied value would desync the header
    block from Content-Length and silently corrupt the record framing."""
    s = str(value)
    if "\r" in s or "\n" in s:
        raise ValueError(f"WARC header value contains CR/LF: {s!r}")
    return s


def encode_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Record dicts -> WARC/1.0 bytes. Each dict: ``type`` (response /
    resource / warcinfo...), optional ``uri``/``date``/``record_id``,
    and EITHER ``payload`` (raw block + ``content_type``) OR
    ``body`` + ``http_status`` + ``http_content_type`` (wrapped as an
    HTTP response block, the crawl shape). ``gzip_members`` emits the
    Common Crawl packaging — one gzip member per record."""
    out = bytearray()
    for r in records:
        if "body" in r:
            body = r["body"]
            http = (f"HTTP/1.1 {r.get('http_status', 200)} OK\r\n"
                    f"Content-Type: {r.get('http_content_type', 'text/plain')}\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                    ).encode() + body
            block = http
            ctype = "application/http; msgtype=response"
        else:
            block = r["payload"]
            ctype = r.get("content_type", "application/octet-stream")
        hdr = [f"WARC/1.0",
               f"WARC-Type: {_hv(r.get('type', 'response'))}"]
        if r.get("uri"):
            hdr.append(f"WARC-Target-URI: {_hv(r['uri'])}")
        if r.get("date"):
            hdr.append(f"WARC-Date: {_hv(r['date'])}")
        if r.get("record_id"):
            hdr.append(f"WARC-Record-ID: {_hv(r['record_id'])}")
        hdr.append(f"Content-Type: {_hv(ctype)}")
        hdr.append(f"Content-Length: {len(block)}")
        rec = ("\r\n".join(hdr) + "\r\n\r\n").encode() + block + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


WARC_RECORD_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("rec_type", StringType()),
    StructField("uri", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("http_status", IntegerType()),
    StructField("http_content_type", StringType()),
    StructField("n_body_bytes", LongType()),
    StructField("body", BinaryType()),
])


def warc_records(df: DataFrame, content_col: str = "content",
                 id_col: str = "doc_id") -> DataFrame:
    """Parse a binary WARC column into one row per record —
    Arrow-batched ``mapInPandas``, no exchanges; the Common Crawl
    ingestion step ahead of the text-quality/dedup operators."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: dict[str, list] = {f.name: [] for f in WARC_RECORD_SCHEMA}
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                for rec in decode_warc(bytes(payload)):
                    body = rec.get("body", rec["payload"])
                    rows["doc_id"].append(int(i))
                    rows["rec_type"].append(rec["type"])
                    rows["uri"].append(rec["uri"])
                    rows["warc_date"].append(rec["date"])
                    rows["content_type"].append(rec["content_type"])
                    rows["http_status"].append(rec.get("http_status"))
                    rows["http_content_type"].append(
                        rec.get("http_content_type"))
                    rows["n_body_bytes"].append(len(body))
                    rows["body"].append(bytes(body))
            yield pd.DataFrame(rows)

    return df.select(F.col(id_col), F.col(content_col)) \
        .mapInPandas(batches, schema=WARC_RECORD_SCHEMA)
