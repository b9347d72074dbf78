"""WARC/1.0 container support (pure stdlib) — the Common-Crawl wire
format in front of the ``pages`` table.

Real Common-Crawl WARC files are a concatenation of per-record gzip
members; readers must split members (not gunzip the whole file) to
seek records independently. Both layouts are supported here: plain
concatenated records and per-record gzip members (``zlib``
decompressobj loop over ``unused_data``).

Spark mapping for 100-TB inputs: ``spark.read.format("binaryFile")``
gives (path, content) rows — one task per WARC file, which is exactly
Common Crawl's unit of parallelism (~1 GB/file, ~80k files/crawl) —
then :func:`warc_to_pages` explodes records via Arrow-batched
``mapInPandas``. No driver-side parsing anywhere.

The reference repo has no ingestion tier (TSV only,
/root/reference/src/dachshund/input.rs); this module is
engine-addition surface for the Common-Crawl-style input contract.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, functions as F

_CRLF = "\r\n"


def _warc_date(epoch_s: int) -> str:
    return datetime.fromtimestamp(int(epoch_s), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def write_warc_record(url: str, epoch_s: int, html: bytes) -> bytes:
    """One WARC/1.0 ``response`` record wrapping an HTTP/1.1 response."""
    http = (
        (
            "HTTP/1.1 200 OK"
            + _CRLF
            + "Content-Type: text/html; charset=utf-8"
            + _CRLF
            + f"Content-Length: {len(html)}"
            + _CRLF
            + _CRLF
        ).encode("ascii")
        + html
    )
    hdr = (
        "WARC/1.0"
        + _CRLF
        + "WARC-Type: response"
        + _CRLF
        + f"WARC-Target-URI: {url}"
        + _CRLF
        + f"WARC-Date: {_warc_date(epoch_s)}"
        + _CRLF
        + "Content-Type: application/http; msgtype=response"
        + _CRLF
        + f"Content-Length: {len(http)}"
        + _CRLF
        + _CRLF
    ).encode("ascii")
    return hdr + http + _CRLF.encode() * 2


def gzip_member(record: bytes) -> bytes:
    """Compress one record as a standalone gzip member (CC layout)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip header
    return co.compress(record) + co.flush()


def write_warc_file(
    records: list[tuple[str, int, bytes]], gzipped: bool = True
) -> bytes:
    """Concatenate records (url, epoch_s, html) into one WARC file."""
    blocks = [write_warc_record(u, t, h) for u, t, h in records]
    if gzipped:
        return b"".join(gzip_member(b) for b in blocks)
    return b"".join(blocks)


def split_gzip_members(data: bytes):
    """Yield decompressed gzip members from a multi-member stream."""
    rest = data
    while rest:
        d = zlib.decompressobj(31)
        yield d.decompress(rest)
        rest = d.unused_data


def _warc_epoch(date: str) -> int | None:
    """Epoch seconds from a WARC-Date; WARC 1.1 (and some CC records)
    carry fractional seconds — accepted and truncated. None when
    unparseable.  (.timestamp() on an AWARE datetime is TZ-independent,
    unlike on a naive one.)"""
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in date else "%Y-%m-%dT%H:%M:%SZ"
    try:
        return int(
            datetime.strptime(date, fmt)
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
    except ValueError:
        return None


def parse_warc(data: bytes, *, strict: bool = False):
    """Yield ``(url, epoch_s, html)`` from a WARC file (gzipped per
    record or plain — sniffed from the magic bytes). Non-``response``
    records (warcinfo, request, metadata) are skipped, as a CC reader
    must.

    Tolerant by default (ADVICE r3): real Common-Crawl shards contain
    records without Content-Length, WARC 1.1 dates with fractional
    seconds, truncated tails, and inter-record garbage — one bad record
    must not kill the whole binaryFile task.  Malformed records are
    skipped by resyncing to the next ``WARC/`` header; ``strict=True``
    restores raising for tests/fixtures that must be byte-perfect."""
    if data[:2] == b"\x1f\x8b":
        stream = b"".join(split_gzip_members(data))
    else:
        stream = data
    pos = 0
    n = len(stream)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and stream[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end_hdr = stream.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            if strict:
                raise ValueError(f"truncated WARC header at byte {pos}")
            break
        hdr_lines = stream[pos:end_hdr].decode("ascii", "replace").split(_CRLF)
        if not hdr_lines[0].startswith("WARC/"):
            if strict:
                raise ValueError(f"bad WARC header at byte {pos}")
            nxt = stream.find(b"WARC/", pos + 1)
            if nxt < 0:
                break
            pos = nxt
            continue
        fields = {}
        for line in hdr_lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(f"missing Content-Length at byte {pos}")
            # payload can't be framed — resync to the next record header
            nxt = stream.find(b"\r\nWARC/", end_hdr)
            pos = nxt + 2 if nxt >= 0 else n
            continue
        payload = stream[end_hdr + 4 : end_hdr + 4 + clen]
        pos = end_hdr + 4 + clen
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        date = fields.get("warc-date", "1970-01-01T00:00:00Z")
        epoch = _warc_epoch(date)
        if epoch is None:
            if strict:
                raise ValueError(f"bad WARC-Date {date!r} at byte {pos}")
            continue
        # strip the HTTP envelope: body starts after its header block
        split = payload.find(b"\r\n\r\n")
        html = payload[split + 4 :] if split >= 0 else payload
        yield url, epoch, html


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------
PAGES_FROM_WARC_SCHEMA = "url string, warc_ts timestamp, html binary"


def warc_to_pages(files: DataFrame, content_col: str = "content") -> DataFrame:
    """(path?, content binary) WARC files → exploded pages rows
    ``[url, warc_ts, html]`` via Arrow-batched ``mapInPandas`` — one
    input row (file) may emit many output rows (records).

    Invariant: assumes ``spark.sql.session.timeZone=UTC`` (pinned by
    ``session.get_spark``).  The epoch is handed to Spark as a naive
    datetime that Spark interprets in the session tz; under any other
    tz the absolute timestamps shift, though WARC round-trips stay
    self-consistent."""

    def batches(it):
        for pdf in it:
            urls, tss, htmls = [], [], []
            for blob in pdf[content_col]:
                for url, epoch, html in parse_warc(bytes(blob)):
                    urls.append(url)
                    tss.append(
                        datetime.fromtimestamp(epoch, tz=timezone.utc).replace(
                            tzinfo=None
                        )
                    )
                    htmls.append(html)
            yield pd.DataFrame({"url": urls, "warc_ts": tss, "html": htmls})

    return files.select(content_col).mapInPandas(
        batches, schema=PAGES_FROM_WARC_SCHEMA
    )


def pages_to_warc_files(
    pages: DataFrame, num_files: int = 8, gzipped: bool = True
) -> DataFrame:
    """pages ``[url, warc_ts, html]`` → ``[bucket, content]`` WARC
    files, one per url-hash bucket, built distributed via
    ``applyInPandas`` (records sorted by url within a file so the
    bytes are partitioning-independent).

    Invariant: assumes ``spark.sql.session.timeZone=UTC`` (pinned by
    ``session.get_spark``) — Spark hands pandas naive-UTC timestamps
    only under that setting; any other session tz shifts the absolute
    WARC-Date strings (round-trips remain self-consistent)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        # naive-UTC arithmetic (never .timestamp(), which reads the
        # host TZ): Spark hands timestamps to pandas as naive UTC
        epoch0 = pd.Timestamp("1970-01-01")
        recs = [
            (
                r.url,
                int((r.warc_ts - epoch0) // pd.Timedelta("1s")),
                bytes(r.html),
            )
            for r in pdf.itertuples()
        ]
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "content": [write_warc_file(recs, gzipped=gzipped)],
            }
        )

    withb = pages.withColumn(
        "bucket", F.pmod(F.xxhash64("url"), F.lit(num_files)).cast("int")
    )
    return withb.groupBy("bucket").applyInPandas(
        build, schema="bucket int, content binary"
    )


def read_warc(spark, path_glob: str) -> DataFrame:
    """Real-input entry point: binaryFile scan (one task per WARC file,
    Common Crawl's natural parallelism unit) → pages rows."""
    files = spark.read.format("binaryFile").load(path_glob)
    return warc_to_pages(files)
