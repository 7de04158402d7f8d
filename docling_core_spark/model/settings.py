"""Env-configurable core settings (reference utils/settings.py:1-16).

The reference declares a pydantic-settings ``CoreSettings`` with env prefix
``DOCLINGCORE_``; the dict model reads the same variables with the same
defaults and the same fail-on-garbage posture (pydantic-settings raises a
validation error on an unparsable value; we raise ``ValueError``).

Consumed by: DocLang deserialization budgets (functions/doclang_load.py —
DoS protection for untrusted markup / .dclx archives, mirroring reference
transforms/deserializer/doclang.py:136-165) and the image-decode gates
(reference common/reference.py:100-123; PIL-blocked here, the limits still
gate the raw decoded byte sizes in sources/doclang_archive.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

_ENV_PREFIX = "DOCLINGCORE_"
_TRUE = frozenset({"1", "true", "yes", "on"})
_FALSE = frozenset({"0", "false", "no", "off", ""})


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(_ENV_PREFIX + name.upper())
    if raw is None:
        return default
    low = raw.strip().lower()
    if low in _TRUE:
        return True
    if low in _FALSE:
        return False
    raise ValueError(f"{_ENV_PREFIX}{name.upper()}: not a boolean: {raw!r}")


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(_ENV_PREFIX + name.upper())
    if raw is None:
        return default
    try:
        return int(raw.strip())
    except ValueError as err:
        raise ValueError(
            f"{_ENV_PREFIX}{name.upper()}: not an integer: {raw!r}"
        ) from err


@dataclass
class CoreSettings:
    """Field names and defaults match reference utils/settings.py."""

    allow_image_file_uri: bool = False
    max_image_decoded_size: int = 20 * 1024 * 1024  # 20MB

    # DocLang deserialize budgets (DoS protection for untrusted markup / .dclx)
    max_doclang_xml_bytes: int = 128 * 1024 * 1024  # 128 MiB
    max_doclang_xml_depth: int = 128
    max_doclang_xml_elements: int = 1_000_000

    @classmethod
    def from_env(cls) -> "CoreSettings":
        base = cls()
        return cls(
            allow_image_file_uri=_env_bool(
                "allow_image_file_uri", base.allow_image_file_uri
            ),
            max_image_decoded_size=_env_int(
                "max_image_decoded_size", base.max_image_decoded_size
            ),
            max_doclang_xml_bytes=_env_int(
                "max_doclang_xml_bytes", base.max_doclang_xml_bytes
            ),
            max_doclang_xml_depth=_env_int(
                "max_doclang_xml_depth", base.max_doclang_xml_depth
            ),
            max_doclang_xml_elements=_env_int(
                "max_doclang_xml_elements", base.max_doclang_xml_elements
            ),
        )


settings = CoreSettings.from_env()
