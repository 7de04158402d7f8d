"""Software-package version model (reference search/package.py:12-45).

Semantic Versioning 2.0.0 parsing with the named-group pattern published at
semver.org; the reference uses it to gate document-format compatibility
checks (types/doc/document.py version fields use the same pattern).
"""

from __future__ import annotations

import re
from typing import Optional

# the canonical SemVer 2.0.0 regex (semver.org), as in reference
# types/base.py VERSION_PATTERN
VERSION_PATTERN = (
    r"^(?P<major>0|[1-9]\d*)\.(?P<minor>0|[1-9]\d*)\.(?P<patch>0|[1-9]\d*)"
    r"(?:-(?P<prerelease>(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*)"
    r"(?:\.(?:0|[1-9]\d*|\d*[a-zA-Z-][0-9a-zA-Z-]*))*))?(?:\+"
    r"(?P<buildmetadata>[0-9a-zA-Z-]+(?:\.[0-9a-zA-Z-]+)*))?$"
)

# this package is not pip-installed, so the fallback the reference reads
# from importlib.metadata is a constant here
DEFAULT_VERSION = "1.0.0"


class Package:
    """A named software package with a SemVer-2.0.0 version."""

    def __init__(self, name: str = "docling-core-spark", version: str = DEFAULT_VERSION):
        if not isinstance(version, str) or re.match(VERSION_PATTERN, version) is None:
            raise ValueError(f"Not a valid SemVer 2.0.0 version: {version!r}")
        self.name = name
        self.version = version

    def __eq__(self, other) -> bool:
        return (
            type(self) is type(other)
            and self.name == other.name
            and self.version == other.version
        )

    def __hash__(self):
        return hash((type(self), self.name, self.version))

    def _group(self, name: str) -> Optional[str]:
        return re.match(VERSION_PATTERN, self.version)[name]

    def get_major(self) -> str:
        """Major version component."""
        return self._group("major")

    def get_minor(self) -> str:
        """Minor version component."""
        return self._group("minor")

    def get_patch(self) -> str:
        """Patch version component."""
        return self._group("patch")

    def get_pre_release(self) -> Optional[str]:
        """Pre-release component, if any."""
        return self._group("prerelease")

    def get_build_metadata(self) -> Optional[str]:
        """Build-metadata component, if any."""
        return self._group("buildmetadata")
