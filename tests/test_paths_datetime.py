"""Path utilities + StrictDateTime semantics (mirrors reference
test_upath_support.py and test_base.py for the fsspec-free subset)."""

from __future__ import annotations

from datetime import datetime, timezone
from pathlib import Path

import pytest

from docling_core_spark.model.paths import (
    is_remote_path,
    relative_path,
    resolve_archive_path,
    validate_archive_relative_path,
)
from docling_core_spark.model.validators import (
    parse_strict_datetime,
    serialize_strict_datetime,
)


class _FakeRemote:
    protocol = "s3"


class _FakeLocal:
    protocol = "file"


def test_is_remote_path():
    assert is_remote_path(Path("/local/path")) is False
    assert is_remote_path(Path(".")) is False
    assert is_remote_path(None) is False
    assert is_remote_path("/some/path") is False
    assert is_remote_path(object()) is False
    assert is_remote_path(_FakeLocal()) is False
    assert is_remote_path(_FakeRemote()) is True

    class EmptyProtocol:
        protocol = ""

    assert is_remote_path(EmptyProtocol()) is False


def test_relative_path_common_ancestor():
    assert relative_path("/a/b/c", "/a/b/d/e") == Path("../d/e")
    assert relative_path("/a/b", "/a/b/c") == Path("c")
    assert relative_path("/a/b/c", "/a/b") == Path("..")
    assert relative_path("/x/y", "/p/q") == Path("../../p/q")


def test_relative_path_requires_absolute(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    # relative inputs resolve against cwd, so they become absolute — the
    # absolute-check error path needs an object that resolves to relative,
    # which Path never does; instead check the resolve-failure path
    class Unresolvable:
        def resolve(self):
            raise NotImplementedError("remote")

    with pytest.raises(ValueError, match="local filesystem"):
        relative_path(Unresolvable(), Path("/a"))  # type: ignore[arg-type]


def test_validate_archive_relative_path():
    validate_archive_relative_path("media/img_1.png")
    validate_archive_relative_path("document.xml")
    for bad in ("", "/abs/path", "a\\b", "../escape", "a/../../b", ".", ".."):
        with pytest.raises(ValueError, match="Invalid archive path"):
            validate_archive_relative_path(bad)


def test_resolve_archive_path_stays_inside(tmp_path):
    (tmp_path / "media").mkdir()
    (tmp_path / "media" / "x.png").write_bytes(b"p")
    assert resolve_archive_path(tmp_path, "media/x.png").name == "x.png"
    with pytest.raises(ValueError):
        resolve_archive_path(tmp_path, "../outside")


def test_strict_datetime_accepted_formats():
    # mirrors reference test_base.py::test_strict_date_time
    parse_strict_datetime(datetime.now(tz=timezone.utc))
    assert (
        parse_strict_datetime("2022-12-01T03:49:20.724435+00:00").isoformat()
        == "2022-12-01T03:49:20.724435+00:00"
    )
    assert (
        parse_strict_datetime("2022-12-01T03:49:20.724435+03:00").isoformat()
        == "2022-12-01T03:49:20.724435+03:00"
    )
    assert (
        parse_strict_datetime("2022-12-01T03:49:20.724435Z").isoformat()
        == "2022-12-01T03:49:20.724435+00:00"
    )
    assert parse_strict_datetime("2022-12-01T03:49:20").isoformat() == "2022-12-01T03:49:20"
    assert parse_strict_datetime("2022-12-01").isoformat() == "2022-12-01T00:00:00"


def test_strict_datetime_rejections():
    for bad in ("03:49:20", 1679616000.0, 1679616000, "12345"):
        with pytest.raises(ValueError):
            parse_strict_datetime(bad)


def test_strict_datetime_serializer_utc_normalizes():
    dt = parse_strict_datetime("2022-12-01T06:49:20.724435+03:00")
    assert serialize_strict_datetime(dt) == "2022-12-01T03:49:20.724435+00:00"


def test_archive_rejects_backslash_member(tmp_path):
    import zipfile

    from docling_core_spark.sources.doclang_archive import _safe_extract

    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("ok.txt", "fine")
        zf.writestr("a\\..\\..\\escape.txt", "bad")
    with pytest.raises(ValueError, match="Unsafe archive member"):
        _safe_extract(evil, tmp_path / "out", 1 << 20, 1 << 22)


def test_relative_path_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    seg = st.text(alphabet="abcxyz09", min_size=1, max_size=5)

    @settings(max_examples=100, deadline=None)
    @given(st.lists(seg, max_size=5), st.lists(seg, max_size=5))
    def inner(src_parts, tgt_parts):
        src = Path("/base", *src_parts)
        tgt = Path("/base", *tgt_parts)
        rel = relative_path(src, tgt)
        # walking rel from src lands exactly on target
        resolved = Path(*src.parts, *rel.parts)
        # normalize ".." segments
        out = []
        for p in resolved.parts:
            if p == "..":
                out.pop()
            else:
                out.append(p)
        assert Path(*out) == tgt

    inner()
