"""WARC ingestion: Common-Crawl-style .warc / .warc.gz -> web-pages table.

The input_hint table (url, warc_ts, html, ...) is what a crawl DELIVERS as
WARC files (ISO 28500); this module closes the first mile from scratch:

- a hand-rolled WARC/1.0 record parser (header block + Content-Length
  framing + CRLF CRLF separators) — no external warc library;
- per-record gzip members (the Common Crawl convention: each record is its
  own gzip stream, so a byte range that starts at a member boundary is
  independently decompressible) and plain concatenated-record files;
- an HTTP response splitter (status line/headers/body) for
  ``application/http; msgtype=response`` payloads;
- a writer for the same formats (used by tests and the round-trip proof —
  NOT a crawl archiver).

Spark surface: ``warc_pages_df(spark, path)`` reads via the binaryFile
source and parses inside ``mapInPandas`` — each WARC file is one row in,
N page rows out.  Scale shape: files are the parallel unit (Common Crawl
ships ~1 GB segments, one task each; list-partition pruning on the path
glob), parsing is map-only, and malformed records are per-record isolated
(skipped with a counter) — one corrupt segment never fails a task.

Offset-indexed range splits (``split_bytes=``): per-record gzip framing
means any byte range starting at a member boundary is independently
decompressible, so jumbo segments parallelize BELOW file granularity:
an index stage streams each file once through a zlib scanner (O(chunk)
memory, decompressed output discarded) and emits (path, offset, length)
split rows grouped to ~split_bytes of compressed data; the parse stage
then reads only its range.  Peak task memory is bounded by the split
size + one decompressed record, never a whole 1 GB segment in one Arrow
row.  Plain uncompressed .warc files have no member boundaries and fall
back to one split per file.
"""

from __future__ import annotations

import datetime
import gzip
import io
import zlib
from typing import Iterator, Optional

CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# record-level parsing (pure python — shared by the UDF and tests)
# ---------------------------------------------------------------------------


def _split_headers(block: bytes) -> dict:
    """WARC/HTTP header block -> {lower-name: value} (first wins)."""
    out: dict = {}
    for line in block.split(CRLF)[1:]:  # [0] is the version / status line
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if sep:
            key = name.strip().lower().decode("latin-1")
            if key not in out:
                out[key] = value.strip().decode("latin-1", "replace")
    return out


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (the CC per-record convention)."""
    out = io.BytesIO()
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            out.write(d.decompress(data[pos:]))
            out.write(d.flush())
        except zlib.error:
            break  # corrupt member: keep the records decoded so far
        consumed = n - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield {headers, payload} per WARC record; tolerant of a corrupt tail.

    Framing per ISO 28500: header block ends at CRLF CRLF, payload runs for
    exactly Content-Length bytes, then CRLF CRLF before the next record.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            break  # corrupt tail: stop cleanly, records so far are good
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            break
        headers = _split_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        payload_start = head_end + 4
        payload_end = payload_start + length
        if payload_end > n:
            break  # truncated record
        yield {"headers": headers, "payload": data[payload_start:payload_end]}
        pos = payload_end


def _split_http_response(payload: bytes) -> tuple[dict, bytes]:
    """(headers, body) of an HTTP response payload; ({}, payload) if not HTTP."""
    if not payload.startswith(b"HTTP/"):
        return {}, payload
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0:
        return {}, payload
    return _split_headers(payload[:head_end]), payload[head_end + 4 :]


def _parse_warc_date(value: Optional[str]) -> Optional[datetime.datetime]:
    """WARC-Date (ISO 8601 Zulu) -> naive UTC datetime, None if unparseable.

    WARC 1.1 (ISO 28500:2017) permits fractional seconds of any precision
    (e.g. ``2017-01-01T00:00:00.123456Z``); WARC 1.0 is whole-second.  Both
    parse; anything else degrades to a null timestamp, never a task error.
    """
    if not value:
        return None
    v = value
    if "." in v and v.endswith("Z"):
        # strptime %f takes at most 6 fraction digits; the spec allows any
        # precision, so truncate (sub-microsecond is below Spark's
        # TimestampType resolution anyway)
        head, _, frac = v[:-1].partition(".")
        if frac.isdigit():
            v = f"{head}.{frac[:6]}Z"
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.datetime.strptime(v, fmt)
        except ValueError:
            continue
    return None


def warc_response_rows(data: bytes) -> Iterator[dict]:
    """(url, warc_ts, html) rows from one WARC file's bytes.

    Only ``WARC-Type: response`` records with an HTTP payload contribute;
    every other record type (warcinfo, request, metadata) is crawl
    bookkeeping.  Rows with no Target-URI are dropped (nothing to key on).
    """
    for rec in parse_warc_records(data):
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        url = h.get("warc-target-uri")
        if not url:
            continue
        _http, body = _split_http_response(rec["payload"])
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(h.get("warc-date")),
            "html": body,
        }


# ---------------------------------------------------------------------------
# offset index (intra-file range splits for jumbo segments)
# ---------------------------------------------------------------------------


class UnalignedMemberError(Exception):
    """A gzip member's decompressed output does not start with the required
    prefix — the archive's members are not record-aligned, so member
    boundaries are NOT safe split points."""


def scan_gzip_member_offsets(
    fileobj,
    chunk_size: int = 1 << 20,
    member_prefix: Optional[bytes] = None,
) -> Iterator[int]:
    """Yield the byte offset of every COMPLETE gzip member in a
    concatenated-member stream (the Common Crawl per-record layout),
    streaming.

    One sequential decompression pass with the output DISCARDED in bounded
    slices (``decompress(data, max_length)``): memory is O(chunk_size)
    even against a gzip-bomb member — this is the cheap index scan that
    makes range splits possible.  Stops at the first byte run that is not
    a valid gzip member (corrupt tail tolerance: a truncated/garbled tail
    is simply not yielded, and the PREVIOUS split absorbs those bytes —
    the record parser isolates them).

    ``member_prefix``: when set (warc_split_rows passes b"WARC/"), every
    member's decompressed output must START with it; otherwise
    UnalignedMemberError raises.  This is what makes member boundaries
    safe split points — a pigz/bgzf-style archive whose members cut
    records mid-stream MUST fall back to a whole-file split or the split
    reader silently loses records.
    """
    buf = b""  # unconsumed compressed bytes; abs_pos = offset of buf[0]
    abs_pos = 0
    eof = False
    while True:
        while not eof and len(buf) < 2:
            more = fileobj.read(chunk_size)
            if not more:
                eof = True
            else:
                buf += more
        if len(buf) < 2:
            return  # EOF (possibly one stray trailing byte — not a member)
        if buf[:2] != b"\x1f\x8b":
            return  # non-gzip garbage: offsets so far are good
        member_start = abs_pos
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        head = b""
        want = len(member_prefix) if member_prefix else 0
        while True:
            try:
                out = d.decompress(buf, 1 << 16)
                # NB: once eof is reached mid-call, zlib does NOT clear
                # unconsumed_tail (the leftover also lands in unused_data)
                # — looping on the tail alone spins forever on any member
                # whose output exceeds the 64 KiB slice
                while d.unconsumed_tail and not d.eof:
                    if len(head) < want:
                        head = (head + out)[: want]
                    out = d.decompress(d.unconsumed_tail, 1 << 16)
                if len(head) < want:
                    head = (head + out)[: want]
            except zlib.error:
                return  # corrupt member: not yielded; prior offsets good
            if d.eof:
                consumed = len(buf) - len(d.unused_data)
                abs_pos += consumed
                buf = d.unused_data
                break
            abs_pos += len(buf)
            buf = b""
            more = fileobj.read(chunk_size)
            if not more:
                return  # truncated final member: not yielded
            buf = more
        if member_prefix and not head.startswith(member_prefix):
            raise UnalignedMemberError(
                f"gzip member at offset {member_start} does not start with "
                f"{member_prefix!r}"
            )
        yield member_start


def warc_split_rows(
    local_path: str, target_split_bytes: int = 64 << 20
) -> list[tuple[str, int, int]]:
    """(path, offset, length) splits of one .warc.gz file, each starting at
    a gzip member boundary and covering ~target_split_bytes of COMPRESSED
    data (a split never cuts a member).  A plain .warc (or an unscannable
    file) is one whole-file split — correctness never depends on the index.
    """
    import os

    size = os.path.getsize(local_path)
    if size == 0:
        return []
    try:
        with open(local_path, "rb") as f:
            offsets = list(scan_gzip_member_offsets(f, member_prefix=b"WARC/"))
    except UnalignedMemberError:
        # members cut records mid-stream (pigz/bgzf-style framing): member
        # boundaries are NOT safe split points — whole-file split, never
        # silent record loss
        return [(local_path, 0, size)]
    if not offsets:
        return [(local_path, 0, size)]
    bounds = offsets + [size]
    splits: list[tuple[str, int, int]] = []
    start = bounds[0]
    for i in range(1, len(bounds)):
        if bounds[i] - start >= target_split_bytes or i == len(bounds) - 1:
            splits.append((local_path, start, bounds[i] - start))
            start = bounds[i]
    return splits


def _strip_file_scheme(path: str) -> str:
    """binaryFile paths arrive as file:/abs or file:///abs URIs locally."""
    if path.startswith("file:"):
        rest = path[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return path


# ---------------------------------------------------------------------------
# writer (tests + round-trip proof)
# ---------------------------------------------------------------------------


def build_warc(
    records: list[dict], per_record_gzip: bool = False
) -> bytes:
    """Serialize (url, warc_ts, html) rows as a WARC/1.0 response file.

    per_record_gzip=True emits one gzip member per record (the Common Crawl
    layout parse_warc_records round-trips)."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK" + CRLF
            + b"Content-Type: text/html; charset=utf-8" + CRLF + CRLF
            + (r["html"] or b"")
        )
        ts = r.get("warc_ts")
        date = (ts or datetime.datetime(2020, 1, 1)).strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            b"WARC/1.0" + CRLF
            + b"WARC-Type: response" + CRLF
            + f"WARC-Record-ID: <urn:uuid:rec-{i}>".encode() + CRLF
            + f"WARC-Date: {date}".encode() + CRLF
            + f"WARC-Target-URI: {r['url']}".encode() + CRLF
            + b"Content-Type: application/http; msgtype=response" + CRLF
            + f"Content-Length: {len(http)}".encode() + CRLF + CRLF
        )
        record = head + http + CRLF + CRLF
        out.write(gzip.compress(record) if per_record_gzip else record)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def demo_warc_dir(sf_dir: str, n_files: int = 4) -> str:
    """Materialize the sf corpus as deterministic .warc.gz files (digest-
    keyed under tempdir) — input prep for the warc_ingest driver query and
    oracle; both engines parse the same layout.  Uses the pure-python
    synth_rows twin so no Spark session is needed to build."""
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    from docling_core_spark.sources.web_pages import synth_rows

    sf_name = os.path.basename(sf_dir.rstrip("/"))
    key = hashlib.sha256(f"warcdemo1:{sf_dir}:{n_files}".encode()).hexdigest()[:12]
    out_dir = os.path.join(tempfile.gettempdir(), f"warc_demo_{sf_name}_{key}")
    marker = os.path.join(out_dir, "_complete")
    if os.path.exists(marker):
        return out_dir
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).to_pylist()
    rows = list(
        synth_rows(
            [r["doc_id"] for r in docs],
            [r["text"] for r in docs],
            [r["lang"] for r in docs],
        )
    )
    tmp = out_dir + f".tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        with open(os.path.join(tmp, f"seg-{i:03d}.warc.gz"), "wb") as f:
            f.write(build_warc(chunk, per_record_gzip=True))
    with open(os.path.join(tmp, "_complete"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def _pages_schema():
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )


def _rows_from_bytes(data: bytes, default_lang: Optional[str]) -> list[dict]:
    try:
        recs = list(warc_response_rows(data))
    except Exception:  # noqa: BLE001 — file-level isolation: one hostile/
        # corrupt archive yields zero rows, never a failed task (same
        # contract as extract_pages rows)
        recs = []
    return [
        {
            "url": r["url"],
            "warc_ts": r["warc_ts"],
            "html": r["html"],
            "text": None,
            "lang": default_lang,
        }
        for r in recs
    ]


def warc_split_index_df(spark, path: str, target_split_bytes: int = 64 << 20):
    """(path, offset, length) split table for .warc.gz files under ``path``.

    The listing comes from the binaryFile source with ONLY metadata columns
    projected (column pruning keeps file bytes out of the scan); each file
    is then streamed once through the member scanner inside mapInPandas —
    the index stage parallelizes per file and costs one decompression pass
    with O(1 MB) memory, no record materialization.
    """
    import pandas as pd

    def index(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                local = _strip_file_scheme(p)
                try:
                    for sp, off, ln in warc_split_rows(local, target_split_bytes):
                        rows.append({"path": sp, "offset": off, "length": ln})
                except Exception:  # noqa: BLE001 — index scan failed
                    # fall back to ONE whole-file split, never a silent
                    # drop: the range reader handles (0, -1) as "read to
                    # EOF", so a file the local scanner cannot size or
                    # stream (permissions, races, non-posix paths) still
                    # parses exactly like the no-index path
                    rows.append({"path": local, "offset": 0, "length": -1})
            yield pd.DataFrame(rows, columns=["path", "offset", "length"])

    files = spark.read.format("binaryFile").load(path).select("path")
    return files.mapInPandas(index, schema="path string, offset long, length long")


def warc_pages_df(
    spark,
    path: str,
    default_lang: Optional[str] = None,
    split_bytes: Optional[int] = None,
):
    """Read .warc / .warc.gz files into the web-pages table shape
    (url, warc_ts, html, text, lang).

    Default: binaryFile source -> one row per file -> mapInPandas parse.
    With ``split_bytes``, the two-stage offset-index path runs instead:
    index each file's gzip member boundaries, repartition the (path,
    offset, length) splits across the cluster, and each task reads ONLY
    its byte range (independently decompressible — members never span
    splits), so a jumbo Common Crawl segment parallelizes intra-file and
    peak task memory is bounded by the split size, not the file size.

    ``text`` is NULL (extraction produces it) and ``lang`` defaults to
    NULL unless given — language_id runs downstream.  Malformed records
    are skipped per record; a corrupt file tail stops that file's parse
    cleanly without failing the task (per-row isolation at the record
    level).
    """
    import pandas as pd

    schema = _pages_schema()

    if split_bytes is not None:

        def run_ranges(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            for pdf in batches:
                rows = []
                for p, off, ln in zip(pdf["path"], pdf["offset"], pdf["length"]):
                    try:
                        with open(_strip_file_scheme(str(p)), "rb") as f:
                            f.seek(int(off))
                            data = f.read(int(ln))
                    except OSError:
                        continue  # file vanished between index and read
                    rows.extend(_rows_from_bytes(data, default_lang))
                yield pd.DataFrame(
                    rows, columns=["url", "warc_ts", "html", "text", "lang"]
                )

        splits = warc_split_index_df(spark, path, split_bytes)
        # splits are tiny rows; spread them so every core parses ranges even
        # when the file listing had fewer files than tasks
        n_parts = spark.sparkContext.defaultParallelism
        return splits.repartition(n_parts).mapInPandas(run_ranges, schema=schema)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_rows_from_bytes(bytes(content), default_lang))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(run, schema=schema)
