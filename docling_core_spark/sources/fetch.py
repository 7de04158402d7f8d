"""Remote-source hygiene helpers (reference utils/file.py:26-110).

The reference resolves documents from URLs with three safety layers that a
crawl-ingest pipeline needs regardless of the HTTP client: an SSRF guard
(only globally routable addresses), filename sanitization (no path escapes
from Content-Disposition or URL paths), and a size limit error type.  The
actual streaming fetch (requests) is environment-dependent and lives with
the caller; these pure pieces are the portable contract.
"""

from __future__ import annotations

import ipaddress
from pathlib import Path
from typing import Optional
from urllib.parse import urlparse


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
    if cont_disp := response_headers.get("Content-Disposition"):
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
