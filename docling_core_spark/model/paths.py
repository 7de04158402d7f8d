"""Path utilities (reference types/doc/utils.py:17-106).

Cloud-path helpers (UPath/fsspec duck-typing — the packages themselves are
not required), relative-path computation with the reference's common-ancestor
algorithm, and the archive path-hygiene validators the DocLang package
loader relies on.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Union


def is_remote_path(p: Any) -> bool:
    """Whether a path object points at remote/cloud storage.

    UPath-style objects expose a ``protocol`` attribute; anything without
    one, or with a file/empty protocol, is local (reference utils.py:17-30).
    """
    protocol = getattr(p, "protocol", None)
    return protocol is not None and protocol not in ("file", "")


def relative_path(src: Union[str, Path], target: Union[str, Path]) -> Path:
    """Relative path from ``src`` to ``target`` via their common ancestor
    (reference utils.py:33-87); both must be absolute local paths."""
    if isinstance(src, str):
        src = Path(src)
    if isinstance(target, str):
        target = Path(target)
    try:
        src = src.resolve()
        target = target.resolve()
    except (AttributeError, NotImplementedError, OSError) as e:
        raise ValueError(
            "Cannot resolve paths. This function only supports local "
            f"filesystem paths. Remote paths should use absolute URIs. Error: {e}"
        ) from e
    if not src.is_absolute():
        raise ValueError(f"The source path must be absolute: {src}")
    if not target.is_absolute():
        raise ValueError(f"The target path must be absolute: {target}")
    common = 0
    for src_part, target_part in zip(src.parts, target.parts):
        if src_part != target_part:
            break
        common += 1
    up = [".."] * (len(src.parts) - common)
    down = target.parts[common:]
    return Path(*up, *down)


def validate_archive_relative_path(path: str, *, label: str = "archive") -> None:
    """Reject absolute, backslashed, or parent-escaping archive member paths
    (reference utils.py:90-96)."""
    if not path or path.startswith("/") or "\\" in path:
        raise ValueError(f"Invalid {label} path: {path!r}")
    parts = Path(path).parts
    if ".." in parts or path in {".", ".."}:
        raise ValueError(f"Invalid {label} path: {path!r}")


def resolve_archive_path(archive_root: Path, rel: str) -> Path:
    """Resolve a package-relative path and ensure it stays inside
    ``archive_root`` (reference utils.py:99-106)."""
    validate_archive_relative_path(rel)
    root = archive_root.resolve()
    resolved = (root / rel).resolve()
    if not resolved.is_relative_to(root):
        raise ValueError(f"Invalid archive path: {rel!r}")
    return resolved
