"""Custom value validators (reference utils/validators.py).

The reference exposes these as pydantic validators; in the dict model they
are plain functions with identical semantics, usable by model/validate.py
and by callers sanitizing untrusted payloads.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Callable, Hashable, Optional, TypeVar

T = TypeVar("T", bound=Hashable)


def ensure_unique_list(values: Any) -> Any:
    """Deduplicate a list preserving first-occurrence order; raise if not a
    list (reference validators.py:14-28 — the silent-drop variant)."""
    if not isinstance(values, list):
        raise ValueError("values must be a list of strings")
    return list(dict.fromkeys(values))


def validate_unique_list(v: list[T]) -> list[T]:
    """Raise on duplicate values (reference validators.py:31-46 — the
    strict variant; PydanticCustomError("unique_list", ...) maps to
    ValueError here)."""
    if len(v) != len(set(v)):
        raise ValueError("List must be unique")
    return v


def validate_datetime(v: Any, handler: Optional[Callable[[Any], Any]] = None) -> Any:
    """Accept a datetime or a non-numeric string (reference
    validators.py:49-54); anything else raises.  ``handler`` is the
    downstream coercion in pydantic's wrap-validator protocol — identity
    when omitted."""
    if type(v) is datetime or (type(v) is str and not v.isnumeric()):
        return handler(v) if handler is not None else v
    raise ValueError("Value type must be a datetime or a non-numeric string")


def parse_strict_datetime(v: Any) -> datetime:
    """StrictDateTime validation+coercion (reference types/base.py:35-40:
    WrapValidator(validate_datetime) around pydantic's datetime parsing):
    accept a datetime, or a non-numeric ISO-8601 string (offset, 'Z', naive,
    or date-only); reject numbers, numeric strings, and time-only strings."""
    v = validate_datetime(v)
    if isinstance(v, datetime):
        return v
    try:
        return datetime.fromisoformat(v)
    except ValueError as err:
        raise ValueError(f"Invalid datetime string: {v!r}") from err


def serialize_strict_datetime(dt: datetime) -> str:
    """StrictDateTime serializer: UTC-normalized isoformat (reference
    types/base.py PlainSerializer)."""
    from datetime import timezone

    return dt.astimezone(tz=timezone.utc).isoformat()
