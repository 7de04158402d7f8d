"""Remote-source resolution (reference utils/file.py).

The reference resolves documents from URLs/paths with safety layers a
crawl-ingest pipeline needs regardless of the HTTP client: an SSRF guard
(only globally routable addresses), per-redirect target validation,
filename sanitization (no path escapes from Content-Disposition or URL
paths), Google-Docs URL rewriting, scheme gating, and declared + streamed
size limits.  The pure pieces are dependency-free; the streaming fetch uses
``requests`` when available and accepts an injectable getter for tests.
"""

from __future__ import annotations

import ipaddress
import re
import tempfile
from io import BytesIO
from pathlib import Path
from typing import Callable, Optional, Union
from urllib.parse import urljoin, urlparse

_MAX_REDIRECTS = 5
_DOWNLOAD_CHUNK_SIZE = 512 * 1024


class FileSizeLimitExceededError(ValueError):
    """Raised when a remote file exceeds the configured size limit."""

    def __init__(self, filename: str, size: int, limit: int):
        super().__init__(
            f"File {filename!r} exceeds the size limit: {size} > {limit} bytes"
        )
        self.filename = filename
        self.size = size
        self.limit = limit


def is_safe_url(url: str) -> bool:
    """Whether a URL resolves to a globally routable address (SSRF guard)."""
    try:
        parsed = urlparse(url)
        hostname = parsed.hostname
        if not hostname:
            return False
        try:
            ip = ipaddress.ip_address(hostname)
        except ValueError:
            import socket

            try:
                ip = ipaddress.ip_address(socket.gethostbyname(hostname))
            except (socket.gaierror, socket.herror):
                return False
        return ip.is_global and not (
            ip.is_private
            or ip.is_loopback
            or ip.is_link_local
            or ip.is_reserved
            or ip.is_multicast
            or ip.is_unspecified
        )
    except Exception:
        return False


def _header(response_headers: dict[str, str], name: str) -> Optional[str]:
    """Case-insensitive header lookup: ``dict(res.headers)`` preserves
    as-sent casing, so a server sending ``content-length`` must not bypass
    the declared-size pre-check (requests' CaseInsensitiveDict semantics)."""
    want = name.lower()
    for k, v in response_headers.items():
        if k.lower() == want:
            return v
    return None


def sanitize_filename(filename: str) -> Optional[str]:
    """Basename-safe filename, or None if no usable basename remains."""
    normalized = filename.replace("\\", "/")
    basename = Path(normalized).name
    if not basename or basename in (".", "..") or "/" in basename:
        return None
    return basename


def resolve_remote_filename(
    url_path: str,
    response_headers: dict[str, str],
    fallback_filename: str = "file",
) -> str:
    """Filename for a fetched URL: Content-Disposition filename if present,
    else the URL path basename, else the fallback — always sanitized."""
    raw_fname = None
    if cont_disp := _header(response_headers, "Content-Disposition"):
        for par in cont_disp.strip().split(";"):
            if (split := par.split("=")) and split[0].strip() == "filename":
                raw_fname = "=".join(split[1:]).strip().strip("'\"") or None
                break
    if raw_fname is None:
        raw_fname = Path(urlparse(url_path).path or "").name or fallback_filename
    if fname := sanitize_filename(raw_fname):
        return fname
    if fname := sanitize_filename(fallback_filename):
        return fname
    raise ValueError("Could not derive a safe filename")


class DocumentStream:
    """A named binary stream (reference types/io DocumentStream)."""

    def __init__(self, name: str, stream: BytesIO):
        self.name = name
        self.stream = stream


_GOOGLE_DOC_RE = re.compile(
    r"google\.com\/(file|document|spreadsheets|presentation)\/d\/([\w-]+)"
)


def rewrite_google_url(url: str) -> str:
    """Google Docs/Drive share links -> direct export URLs
    (reference utils/file.py:153-172)."""
    m = _GOOGLE_DOC_RE.search(url)
    if not m:
        return url
    doc_type, doc_id = m.group(1), m.group(2)
    if doc_type == "file":
        return f"https://drive.google.com/uc?export=download&id={doc_id}"
    if doc_type == "document":
        return f"https://docs.google.com/document/d/{doc_id}/export?format=docx"
    if doc_type == "spreadsheets":
        return f"https://docs.google.com/spreadsheets/d/{doc_id}/export?format=xlsx"
    return f"https://docs.google.com/presentation/d/{doc_id}/export?format=pptx"


def validate_redirect_target(response_url: str, location: Optional[str]) -> None:
    """Reject redirects to non-globally-routable targets
    (reference utils/file.py:174-185); relative locations resolve against
    the responding URL first."""
    if not location:
        return
    if not location.startswith(("http://", "https://")):
        location = urljoin(response_url, location)
    if not is_safe_url(location):
        raise ValueError(f"Redirect target is not allowed: {location}")


def _looks_like_http_url(source: str) -> bool:
    parsed = urlparse(source)
    return parsed.scheme in ("http", "https") and bool(parsed.netloc)


def resolve_source_to_stream(
    source: Union[str, Path],
    headers: Optional[dict[str, str]] = None,
    max_file_size: Optional[int] = None,
    _get: Optional[Callable] = None,
) -> DocumentStream:
    """Resolve a URL or local path to a named binary stream
    (reference utils/file.py:113-246).

    Remote fetches enforce: SSRF guard on the initial URL and every redirect
    target, a redirect cap, a default user agent, a declared Content-Length
    pre-check, and a streamed byte-count abort once ``max_file_size`` is
    exceeded.  ``_get`` injects the transport for tests: it is called as
    ``_get(url, headers)`` and must return an object with ``headers`` (dict)
    and ``iter_content(chunk_size)``.
    """
    if isinstance(source, str) and _looks_like_http_url(source):
        url_str = str(source)
        if not is_safe_url(url_str):
            raise ValueError(f"URL is not allowed: {url_str}")

        req_headers = {k.lower(): v for k, v in (headers or {}).items()}
        req_headers.setdefault("user-agent", "docling-core-spark")
        url_str = rewrite_google_url(url_str)

        if _get is not None:
            res = _get(url_str, req_headers)
            response_headers = dict(res.headers)
            fname = resolve_remote_filename(url_str, response_headers)
            _check_declared_size(response_headers, fname, max_file_size)
            stream = BytesIO()
            downloaded = 0
            for chunk in res.iter_content(chunk_size=_DOWNLOAD_CHUNK_SIZE):
                if not chunk:
                    continue
                downloaded += len(chunk)
                if max_file_size is not None and downloaded > max_file_size:
                    raise FileSizeLimitExceededError(fname, downloaded, max_file_size)
                stream.write(chunk)
            stream.seek(0)
            return DocumentStream(name=fname, stream=stream)

        import requests  # env-dependent transport, reference utils/file.py:190

        def _check_redirect_safety(response, *args, **kwargs):
            if response.is_redirect or response.is_permanent_redirect:
                validate_redirect_target(
                    response.url, response.headers.get("location")
                )

        with requests.Session() as session:
            session.max_redirects = _MAX_REDIRECTS
            session.hooks["response"].append(_check_redirect_safety)
            with session.get(
                url_str, stream=True, headers=req_headers, allow_redirects=True
            ) as res:
                res.raise_for_status()
                response_headers = dict(res.headers)
                fname = resolve_remote_filename(url_str, response_headers)
                _check_declared_size(response_headers, fname, max_file_size)
                stream = BytesIO()
                downloaded = 0
                for chunk in res.iter_content(chunk_size=_DOWNLOAD_CHUNK_SIZE):
                    if not chunk:
                        continue
                    downloaded += len(chunk)
                    if max_file_size is not None and downloaded > max_file_size:
                        raise FileSizeLimitExceededError(
                            fname, downloaded, max_file_size
                        )
                    stream.write(chunk)
                stream.seek(0)
                return DocumentStream(name=fname, stream=stream)

    if isinstance(source, str) and "://" in source:
        scheme = source.split("://", 1)[0].lower()
        raise ValueError(
            f"Unsupported URL scheme: '{scheme}'. "
            "Only http:// and https:// are supported."
        )
    local_path = Path(source)
    return DocumentStream(name=local_path.name, stream=BytesIO(local_path.read_bytes()))


def _check_declared_size(
    response_headers: dict[str, str], fname: str, max_file_size: Optional[int]
) -> None:
    if max_file_size is None:
        return
    content_length = _header(response_headers, "Content-Length")
    if content_length is None:
        return
    try:
        declared = int(content_length)
    except ValueError:
        return
    if declared > max_file_size:
        raise FileSizeLimitExceededError(fname, declared, max_file_size)


def resolve_source_to_path(
    source: Union[str, Path],
    headers: Optional[dict[str, str]] = None,
    workdir: Optional[Path] = None,
    _get: Optional[Callable] = None,
) -> Path:
    """Resolve a URL or path to a local file path
    (reference utils/file.py:249-298): remote content downloads into
    ``workdir`` (or a fresh temp dir) under the resolved safe filename."""
    doc_stream = resolve_source_to_stream(
        source=source, headers=headers, _get=_get
    )
    if workdir is None:
        workdir = Path(tempfile.mkdtemp())
    workdir.mkdir(exist_ok=True, parents=True)
    local_path = workdir / doc_stream.name
    with local_path.open("wb") as f:
        f.write(doc_stream.stream.read())
    return local_path
