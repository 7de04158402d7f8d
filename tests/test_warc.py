"""WARC ingestion (sources/warc.py): record framing, gzip members, HTTP
splitting, Spark reader, and the round-trip proof that WARC-ingested pages
extract identically to the direct path."""

from __future__ import annotations

import datetime
import gzip

SF_DIR = "/root/testdata/sf0.001"


def _demo_records(n: int = 5) -> list[dict]:
    return [
        {
            "url": f"https://example.com/page-{i}",
            "warc_ts": datetime.datetime(2021, 3, 4, 5, 6, 7 + i),
            "html": f"<html><body><h1>Title {i}</h1><p>body text {i}</p></body></html>".encode(),
        }
        for i in range(n)
    ]


def test_roundtrip_plain_and_gzip_members():
    from docling_core_spark.sources.warc import build_warc, warc_response_rows

    recs = _demo_records()
    for per_gzip in (False, True):
        data = build_warc(recs, per_record_gzip=per_gzip)
        got = list(warc_response_rows(data))
        assert [r["url"] for r in got] == [r["url"] for r in recs]
        assert [r["html"] for r in got] == [r["html"] for r in recs]
        assert [r["warc_ts"] for r in got] == [r["warc_ts"] for r in recs]


def test_non_response_records_and_corrupt_tail_skipped():
    from docling_core_spark.sources.warc import (
        CRLF,
        build_warc,
        warc_response_rows,
    )

    info = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: warcinfo" + CRLF
        + b"Content-Length: 10" + CRLF + CRLF
        + b"x" * 10 + CRLF + CRLF
    )
    good = build_warc(_demo_records(2))
    corrupt_tail = b"GARBAGE NOT A RECORD"
    got = list(warc_response_rows(info + good + corrupt_tail))
    # warcinfo skipped, both responses parsed, corrupt tail stops cleanly
    assert len(got) == 2
    # truncated record (content-length beyond EOF) also stops cleanly
    truncated = good[: len(good) - 40]
    assert len(list(warc_response_rows(truncated))) == 1


def test_whole_file_gzip():
    from docling_core_spark.sources.warc import build_warc, warc_response_rows

    data = gzip.compress(build_warc(_demo_records(3)))
    assert len(list(warc_response_rows(data))) == 3


def test_http_payload_split_and_missing_uri():
    from docling_core_spark.sources.warc import CRLF, warc_response_rows

    # response record with NO Target-URI must be dropped, not crash
    payload = b"HTTP/1.1 200 OK" + CRLF + CRLF + b"<p>x</p>"
    rec = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + f"Content-Length: {len(payload)}".encode() + CRLF + CRLF
        + payload + CRLF + CRLF
    )
    assert list(warc_response_rows(rec)) == []


def test_spark_reader_and_extraction_parity(spark, tmp_path):
    """WARC-ingested pages must extract byte-identically to the same pages
    fed directly — the first-mile round trip of the north rule."""
    from pyspark.sql import functions as F

    from docling_core_spark.operators.extract import extract_pages
    from docling_core_spark.sources.warc import build_warc, warc_pages_df
    from docling_core_spark.sources.web_pages import web_pages_df

    direct = web_pages_df(spark, SF_DIR).limit(40).select("url", "warc_ts", "html")
    rows = [r.asDict() for r in direct.collect()]
    # two files, both layouts
    (tmp_path / "a.warc").write_bytes(build_warc(rows[:20]))
    (tmp_path / "b.warc.gz").write_bytes(
        build_warc(rows[20:], per_record_gzip=True)
    )
    ingested = warc_pages_df(spark, str(tmp_path) + "/*")
    assert ingested.count() == 40
    # timestamps survive (second precision — the WARC-Date granularity)
    ts = {r["url"]: r["warc_ts"] for r in ingested.select("url", "warc_ts").collect()}
    for r in rows:
        assert ts[r["url"]].replace(microsecond=0) == r["warc_ts"].replace(microsecond=0)

    got = (
        extract_pages(ingested, emit_doc_json=False)
        .select("url", "markdown")
        .orderBy("url")
        .collect()
    )
    want = (
        extract_pages(
            web_pages_df(spark, SF_DIR).limit(40).withColumn("lang", F.lit(None).cast("string")),
            emit_doc_json=False,
        )
        .select("url", "markdown")
        .orderBy("url")
        .collect()
    )
    assert [(r.url, r.markdown) for r in got] == [(r.url, r.markdown) for r in want]


def test_garbage_file_yields_no_rows_not_task_failure(spark, tmp_path):
    """A wholly corrupt file in the glob contributes zero rows; healthy
    files in the same read are unaffected (file-level isolation)."""
    from docling_core_spark.sources.warc import build_warc, warc_pages_df

    (tmp_path / "good.warc").write_bytes(build_warc(_demo_records(3)))
    (tmp_path / "bad.warc").write_bytes(b"\x00\x01 utterly not a warc \xff" * 100)
    (tmp_path / "bad2.warc.gz").write_bytes(b"\x1f\x8b broken gzip header")
    got = warc_pages_df(spark, str(tmp_path) + "/*").collect()
    assert len(got) == 3


def test_parser_total_on_random_bytes():
    """The record parser must be total: arbitrary bytes (including ones
    starting with gzip magic or 'WARC/') never raise, they just yield
    fewer records."""
    from hypothesis import given, settings, strategies as st

    from docling_core_spark.sources.warc import warc_response_rows

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=2048))
    def run(data):
        list(warc_response_rows(data))
        list(warc_response_rows(b"\x1f\x8b" + data))
        list(warc_response_rows(b"WARC/1.0\r\n" + data))

    run()


def test_roundtrip_with_hostile_bodies():
    """Bodies containing CRLF CRLF, fake WARC headers, and gzip magic must
    frame correctly (Content-Length framing, not delimiter scanning)."""
    import datetime

    from docling_core_spark.sources.warc import build_warc, warc_response_rows

    hostile = [
        b"<p>a\r\n\r\nb</p>",
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\nfake",
        b"\x1f\x8b\x08 not really gzip",
        "<p>unicode é中文</p>".encode(),
        b"",
    ]
    recs = [
        {
            "url": f"https://h.example/{i}",
            "warc_ts": datetime.datetime(2022, 1, 1, 0, 0, i),
            "html": body,
        }
        for i, body in enumerate(hostile)
    ]
    for per_gzip in (False, True):
        got = list(warc_response_rows(build_warc(recs, per_record_gzip=per_gzip)))
        assert [r["html"] for r in got] == hostile


def test_warc11_fractional_dates_and_unparseable_date_null():
    """Round-8 ADVICE: WARC 1.1 fractional-second WARC-Date values must
    parse (any precision, truncated to microseconds); garbage dates become
    null timestamps in BOTH the Spark path and the oracle builder (no
    AttributeError divergence)."""
    from docling_core_spark.sources.warc import _parse_warc_date

    assert _parse_warc_date("2021-03-04T05:06:07Z") == datetime.datetime(
        2021, 3, 4, 5, 6, 7
    )
    assert _parse_warc_date("2021-03-04T05:06:07.123456Z") == datetime.datetime(
        2021, 3, 4, 5, 6, 7, 123456
    )
    # WARC 1.1 allows ANY precision — 9 digits truncates to microseconds
    assert _parse_warc_date("2021-03-04T05:06:07.123456789Z") == datetime.datetime(
        2021, 3, 4, 5, 6, 7, 123456
    )
    assert _parse_warc_date("2021-03-04T05:06:07.5Z") == datetime.datetime(
        2021, 3, 4, 5, 6, 7, 500000
    )
    for bogus in (None, "", "not-a-date", "2021-03-04 05:06:07", "2021-13-99T05:06:07.xZ"):
        assert _parse_warc_date(bogus) is None


def test_null_warc_ts_flows_through_parser(tmp_path):
    """A response record with an unparseable WARC-Date yields a row with
    warc_ts=None (never a crash) from the shared parser BOTH engines use."""
    from docling_core_spark.sources.warc import CRLF, warc_response_rows

    body = b"HTTP/1.1 200 OK" + CRLF + CRLF + b"<html><p>x</p></html>"
    rec = (
        b"WARC/1.0" + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Target-URI: https://example.com/nodate" + CRLF
        + b"WARC-Date: bogus-date" + CRLF
        + b"Content-Length: " + str(len(body)).encode() + CRLF + CRLF
        + body + CRLF + CRLF
    )
    rows = list(warc_response_rows(rec))
    assert len(rows) == 1
    assert rows[0]["url"] == "https://example.com/nodate"
    assert rows[0]["warc_ts"] is None


def _member_offsets_expected(recs):
    """Ground-truth member offsets: build_warc writes one gzip.compress
    member per record, so offsets are the cumulative compressed sizes."""
    import gzip as _gzip

    from docling_core_spark.sources.warc import CRLF, build_warc  # noqa: F401

    sizes, data = [], b""
    for r in recs:
        one = build_warc([r], per_record_gzip=True)
        sizes.append(len(one))
        data += one
    offs, acc = [], 0
    for s in sizes:
        offs.append(acc)
        acc += s
    return data, offs


def test_scan_gzip_member_offsets_exact_and_chunk_edges():
    import io

    from docling_core_spark.sources.warc import scan_gzip_member_offsets

    recs = _demo_records(6)
    data, want = _member_offsets_expected(recs)
    # any chunk size must give identical offsets — including tiny chunks
    # that straddle member boundaries mid-magic
    for chunk in (1 << 20, 4096, 37, 7, 1):
        got = list(scan_gzip_member_offsets(io.BytesIO(data), chunk_size=chunk))
        assert got == want, f"chunk_size={chunk}"
    # corrupt tail: offsets up to the garbage are kept, then the scan stops
    got = list(
        scan_gzip_member_offsets(io.BytesIO(data + b"GARBAGE"), chunk_size=64)
    )
    assert got == want
    # non-gzip input: no offsets
    assert list(scan_gzip_member_offsets(io.BytesIO(b"WARC/1.0\r\n"))) == []


def test_warc_split_rows_invariants(tmp_path):
    from docling_core_spark.sources.warc import build_warc, warc_split_rows

    recs = _demo_records(9)
    data, offs = _member_offsets_expected(recs)
    p = tmp_path / "seg.warc.gz"
    p.write_bytes(data)
    # tiny target: one split per member
    splits = warc_split_rows(str(p), target_split_bytes=1)
    assert [s[1] for s in splits] == offs
    assert sum(s[2] for s in splits) == len(data)
    # huge target: one split for the whole file
    assert warc_split_rows(str(p), target_split_bytes=1 << 30) == [
        (str(p), 0, len(data))
    ]
    # mid target: every split starts on a member boundary and covers all
    mid = warc_split_rows(str(p), target_split_bytes=len(data) // 3)
    assert all(s[1] in set(offs) for s in mid)
    assert 1 < len(mid) < len(offs)
    assert sum(s[2] for s in mid) == len(data)
    # plain (non-gzip) warc: whole-file fallback split
    plain = tmp_path / "seg.warc"
    plain.write_bytes(build_warc(recs, per_record_gzip=False))
    assert warc_split_rows(str(plain), target_split_bytes=1) == [
        (str(plain), 0, plain.stat().st_size)
    ]


def test_range_splits_parse_byte_identical_to_whole_file(spark, tmp_path):
    """VERDICT r7 #5: N offset-indexed range splits must produce exactly the
    rows of the whole-file parse — same urls, same timestamps, same html
    bytes — while parallelizing below file granularity."""
    from docling_core_spark.sources.warc import build_warc, warc_pages_df, warc_split_index_df

    for i in range(3):
        recs = [
            {
                "url": f"https://example.com/f{i}/p{j}",
                "warc_ts": datetime.datetime(2021, 5, 1 + i, 0, 0, j),
                "html": f"<html><p>file {i} page {j} body</p></html>".encode(),
            }
            for j in range(8)
        ]
        (tmp_path / f"seg-{i}.warc.gz").write_bytes(
            build_warc(recs, per_record_gzip=True)
        )
    glob = str(tmp_path / "*.warc.gz")
    key = lambda r: r.url  # noqa: E731
    whole = sorted(warc_pages_df(spark, glob).collect(), key=key)
    split = sorted(
        warc_pages_df(spark, glob, split_bytes=1).collect(), key=key
    )
    assert len(whole) == 24
    assert [(r.url, r.warc_ts, bytes(r.html)) for r in whole] == [
        (r.url, r.warc_ts, bytes(r.html)) for r in split
    ]
    # the index stage really produced intra-file splits (one per member)
    n_splits = warc_split_index_df(spark, glob, 1).count()
    assert n_splits == 24


def test_unaligned_members_fall_back_to_whole_file(tmp_path):
    """Round-8 review finding (verified repro): a LEGAL multi-member
    .warc.gz whose gzip members cut records mid-stream (pigz/bgzf-style
    framing) must NOT be range-split — member boundaries are not record
    boundaries there, and splitting silently loses records.  The scanner
    validates every member's decompressed head starts with WARC/ and the
    split builder falls back to one whole-file split."""
    import gzip as _gzip
    import io

    from docling_core_spark.sources.warc import (
        UnalignedMemberError,
        _rows_from_bytes,
        scan_gzip_member_offsets,
        warc_split_rows,
    )

    # build 5 records as PLAIN warc bytes, then re-frame the stream into
    # gzip members at an arbitrary byte cut (NOT a record boundary)
    recs = []
    for i in range(5):
        body = f"<html><body>page {i}</body></html>".encode()
        recs.append(
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: http://ex.com/{i}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + b"Content-Type: application/http; msgtype=response\r\n"
            + f"Content-Length: {len(body) + 44}\r\n\r\n".encode()
            + b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            + body
            + b"\r\n\r\n"
        )
    plain = b"".join(recs)
    whole_rows = _rows_from_bytes(plain, None)
    assert len(whole_rows) == 5
    cut = len(recs[0]) + len(recs[1]) // 2  # mid-record member boundary
    unaligned = _gzip.compress(plain[:cut]) + _gzip.compress(plain[cut:])
    p = tmp_path / "unaligned.warc.gz"
    p.write_bytes(unaligned)
    # the scanner flags the second member (starts mid-record)
    import pytest as _pytest

    with _pytest.raises(UnalignedMemberError):
        list(
            scan_gzip_member_offsets(
                io.BytesIO(unaligned), member_prefix=b"WARC/"
            )
        )
    # and the split builder degrades to ONE whole-file split: parsing that
    # split yields all 5 records (gzip members decode transparently by the
    # record parser's concatenated-stream reader)
    splits = warc_split_rows(str(p), target_split_bytes=1)
    assert splits == [(str(p), 0, len(unaligned))]


def test_scan_handles_members_larger_than_slice(tmp_path):
    """Regression: a member whose decompressed output exceeds the bounded
    64 KiB decompress slice must scan (zlib does NOT clear unconsumed_tail
    once eof is reached mid-call — looping on the tail alone spins
    forever).  Also pins the bomb-bounded path: output is drained in
    slices, never materialized whole."""
    import gzip as _gzip
    import io

    from docling_core_spark.sources.warc import scan_gzip_member_offsets

    body = b"x" * 300_000  # 300 KB decompressed >> 64 KiB slice
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://ex.com/big\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
        + b"\r\n\r\n"
    )
    small = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://ex.com/small\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: 2\r\n\r\nok\r\n\r\n"
    )
    m1, m2 = _gzip.compress(rec), _gzip.compress(small)
    data = m1 + m2
    got = list(
        scan_gzip_member_offsets(io.BytesIO(data), member_prefix=b"WARC/")
    )
    assert got == [0, len(m1)]
    # and across tiny read chunks (member spans many chunks)
    got2 = list(
        scan_gzip_member_offsets(
            io.BytesIO(data), chunk_size=1024, member_prefix=b"WARC/"
        )
    )
    assert got2 == [0, len(m1)]
