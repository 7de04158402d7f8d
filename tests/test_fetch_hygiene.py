"""Remote-fetch hygiene (reference test_utils.py:186-300)."""

from __future__ import annotations

import socket

import pytest

from docling_core_spark.sources.fetch import (
    FileSizeLimitExceededError,
    is_safe_url,
    resolve_remote_filename,
    sanitize_filename,
)


def test_sanitize_filename_paths():
    assert sanitize_filename("../../etc/config.txt") == "config.txt"
    assert sanitize_filename("/etc/config.txt") == "config.txt"
    assert sanitize_filename("..\\..\\windows\\system32\\config") == "config"
    assert sanitize_filename("C:\\Windows\\System32\\config") == "config"
    assert sanitize_filename("../../../etc\\config.txt") == "config.txt"
    assert sanitize_filename("document.pdf") == "document.pdf"
    assert sanitize_filename("my-file_123.txt") == "my-file_123.txt"
    assert sanitize_filename("") is None
    assert sanitize_filename(".") is None
    assert sanitize_filename("..") is None


def test_is_safe_url_rejects_private_networks(monkeypatch):
    table = {"example.com": "93.184.216.34", "localhost": "127.0.0.1"}

    def fake_resolve(host):
        if host in table:
            return table[host]
        raise socket.gaierror()

    monkeypatch.setattr(socket, "gethostbyname", fake_resolve)
    assert is_safe_url("https://example.com/doc.pdf")
    assert not is_safe_url("http://localhost/doc.pdf")
    assert not is_safe_url("http://127.0.0.1/doc.pdf")
    assert not is_safe_url("http://10.0.0.5/doc.pdf")
    assert not is_safe_url("http://192.168.1.1/doc.pdf")
    assert not is_safe_url("http://169.254.169.254/latest/meta-data")  # IMDS
    assert not is_safe_url("http://[::1]/doc.pdf")
    assert not is_safe_url("not a url")
    assert not is_safe_url("file:///etc/passwd")


def test_resolve_remote_filename_content_disposition():
    assert (
        resolve_remote_filename(
            "https://example.com/file",
            {"Content-Disposition": 'attachment; filename="../../etc/config.txt"'},
        )
        == "config.txt"
    )
    assert (
        resolve_remote_filename(
            "https://example.com/file",
            {"Content-Disposition": 'attachment; filename="report.pdf"'},
        )
        == "report.pdf"
    )


def test_resolve_remote_filename_fallbacks():
    assert resolve_remote_filename("https://example.com/docs/paper.pdf", {}) == "paper.pdf"
    assert resolve_remote_filename("https://example.com/", {}) == "file"
    assert resolve_remote_filename("https://example.com/..", {}, "backup.bin") == "backup.bin"
    with pytest.raises(ValueError):
        resolve_remote_filename("https://example.com/..", {}, "..")


def test_size_limit_error_carries_context():
    err = FileSizeLimitExceededError("big.bin", 100, 10)
    assert err.filename == "big.bin" and err.size == 100 and err.limit == 10
    assert "big.bin" in str(err)


# -- round-4 additions: the full resolve surface (reference utils/file.py) --


class _FakeResponse:
    def __init__(self, headers=None, chunks=()):
        self.headers = headers or {}
        self._chunks = list(chunks)

    def iter_content(self, chunk_size):
        return iter(self._chunks)


def test_rewrite_google_url_variants():
    from docling_core_spark.sources.fetch import rewrite_google_url

    assert (
        rewrite_google_url("https://drive.google.com/file/d/ABC-123/view")
        == "https://drive.google.com/uc?export=download&id=ABC-123"
    )
    assert (
        rewrite_google_url("https://docs.google.com/document/d/xyz_9/edit")
        == "https://docs.google.com/document/d/xyz_9/export?format=docx"
    )
    assert (
        rewrite_google_url("https://docs.google.com/spreadsheets/d/s1/edit")
        == "https://docs.google.com/spreadsheets/d/s1/export?format=xlsx"
    )
    assert (
        rewrite_google_url("https://docs.google.com/presentation/d/p1/edit")
        == "https://docs.google.com/presentation/d/p1/export?format=pptx"
    )
    assert rewrite_google_url("https://example.com/a") == "https://example.com/a"


def test_validate_redirect_target():
    from docling_core_spark.sources.fetch import validate_redirect_target

    validate_redirect_target("https://example.com/x", None)  # no location: ok
    with pytest.raises(ValueError, match="Redirect target"):
        validate_redirect_target("https://example.com/x", "http://127.0.0.1/evil")
    with pytest.raises(ValueError, match="Redirect target"):
        # relative location resolves against the responding URL, which is
        # loopback here
        validate_redirect_target("http://10.0.0.1/x", "/next")


def test_resolve_source_unsupported_scheme():
    from docling_core_spark.sources.fetch import resolve_source_to_stream

    with pytest.raises(ValueError, match="Unsupported URL scheme"):
        resolve_source_to_stream("ftp://example.com/a.bin")
    with pytest.raises(ValueError, match="Unsupported URL scheme"):
        resolve_source_to_stream("file:///etc/passwd")


def test_resolve_source_local_path(tmp_path):
    from docling_core_spark.sources.fetch import resolve_source_to_stream

    p = tmp_path / "doc.bin"
    p.write_bytes(b"payload")
    ds = resolve_source_to_stream(str(p))
    assert ds.name == "doc.bin"
    assert ds.stream.read() == b"payload"


def test_resolve_source_ssrf_guard():
    from docling_core_spark.sources.fetch import resolve_source_to_stream

    with pytest.raises(ValueError, match="not allowed"):
        resolve_source_to_stream("http://127.0.0.1/secret")
    with pytest.raises(ValueError, match="not allowed"):
        resolve_source_to_stream("http://192.168.1.1/router")


def test_resolve_source_streaming_and_size_limits():
    from docling_core_spark.sources.fetch import (
        FileSizeLimitExceededError,
        resolve_source_to_stream,
    )

    def getter(url, headers):
        assert headers["user-agent"]  # default UA installed
        return _FakeResponse(
            headers={"Content-Disposition": 'inline; filename="a.pdf"'},
            chunks=[b"12345", b"67890"],
        )

    ds = resolve_source_to_stream("https://93.184.216.34/x", _get=getter)
    assert ds.name == "a.pdf" and ds.stream.read() == b"1234567890"

    # declared Content-Length rejection
    def getter_declared(url, headers):
        return _FakeResponse(headers={"Content-Length": "1000"})

    with pytest.raises(FileSizeLimitExceededError):
        resolve_source_to_stream(
            "https://93.184.216.34/x", max_file_size=100, _get=getter_declared
        )

    # streamed byte-count abort
    def getter_stream(url, headers):
        return _FakeResponse(chunks=[b"x" * 60, b"x" * 60])

    with pytest.raises(FileSizeLimitExceededError):
        resolve_source_to_stream(
            "https://93.184.216.34/x", max_file_size=100, _get=getter_stream
        )


def test_resolve_source_to_path(tmp_path):
    from docling_core_spark.sources.fetch import resolve_source_to_path

    def getter(url, headers):
        return _FakeResponse(
            headers={"Content-Disposition": 'inline; filename="../../evil.bin"'},
            chunks=[b"data"],
        )

    out = resolve_source_to_path(
        "https://93.184.216.34/dl", workdir=tmp_path, _get=getter
    )
    # path-escape stripped to a safe basename inside workdir
    assert out == tmp_path / "evil.bin"
    assert out.read_bytes() == b"data"


def test_google_rewrite_applies_in_resolve():
    from docling_core_spark.sources.fetch import resolve_source_to_stream

    seen = {}

    def getter(url, headers):
        seen["url"] = url
        return _FakeResponse(chunks=[b"d"])

    resolve_source_to_stream("https://142.250.80.14/x?u=https://drive.google.com/file/d/ZZ/view", _get=getter)
    assert seen["url"] == "https://drive.google.com/uc?export=download&id=ZZ"


def test_package_semver():
    from docling_core_spark.model.package import Package

    p = Package(version="2.87.1-rc.1+build.5")
    assert p.get_major() == "2" and p.get_minor() == "87" and p.get_patch() == "1"
    assert p.get_pre_release() == "rc.1"
    assert p.get_build_metadata() == "build.5"
    assert hash(Package()) == hash(Package())
    assert Package() == Package()
    with pytest.raises(ValueError):
        Package(version="not-a-version")
    with pytest.raises(ValueError):
        Package(version="01.2.3")


def test_legacy_shims_inert():
    from docling_core_spark.model import legacy

    doc = legacy.docling_document_to_legacy(object())
    assert doc.main_text == []
    assert doc.export_to_markdown() == ""
    assert doc.export_to_document_tokens() == ""
    assert doc._resolve_ref("x") == "x"
    for name in (
        "BaseText", "Figure", "GlmTableCell", "PageDimensions", "PageReference",
        "Prov", "Ref", "Table", "TableCell", "CCSDocumentDescription",
        "CCSFileInfoObject", "ExportedCCSDocument",
    ):
        assert isinstance(getattr(legacy, name)(), object)


def test_declared_size_check_is_header_case_insensitive():
    from docling_core_spark.sources.fetch import (
        FileSizeLimitExceededError,
        resolve_source_to_stream,
    )

    def getter(url, headers):
        return _FakeResponse(headers={"content-length": "1000"})

    with pytest.raises(FileSizeLimitExceededError):
        resolve_source_to_stream(
            "https://93.184.216.34/x", max_file_size=100, _get=getter
        )


def test_content_disposition_is_header_case_insensitive():
    from docling_core_spark.sources.fetch import resolve_remote_filename

    assert (
        resolve_remote_filename(
            "https://93.184.216.34/x",
            {"content-disposition": 'inline; filename="b.pdf"'},
        )
        == "b.pdf"
    )
