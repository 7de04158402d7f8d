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
