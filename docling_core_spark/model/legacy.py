"""Legacy-compat shims (reference types/legacy_doc/{base,document}.py,
utils/legacy.py — intentionally inert placeholders for docling<2.103).

The reference keeps these only so old package code can import the removed
legacy names and call the deprecated converter hook without crashing; the
shims restore no behavior.  Mirrored here for taxonomy completeness.
"""

from __future__ import annotations


# -- types/legacy_doc/base.py shims ------------------------------------------


class BaseText:  # noqa: D101
    pass


class Figure:  # noqa: D101
    pass


class GlmTableCell:  # noqa: D101
    pass


class PageDimensions:  # noqa: D101
    pass


class PageReference:  # noqa: D101
    pass


class Prov:  # noqa: D101
    pass


class Ref:  # noqa: D101
    pass


class Table:  # noqa: D101
    pass


class TableCell:  # noqa: D101
    pass


# -- types/legacy_doc/document.py shims ----------------------------------------


class CCSDocumentDescription:  # noqa: D101
    pass


class CCSFileInfoObject:  # noqa: D101
    pass


class ExportedCCSDocument:  # noqa: D101
    pass


# -- utils/legacy.py shim ---------------------------------------------------------


class _NullLegacyDocument:
    """Inert stand-in for the removed legacy document model
    (reference utils/legacy.py:8-20)."""

    main_text: list[object] = []

    def _resolve_ref(self, item):
        return item

    def export_to_markdown(self, *args, **kwargs) -> str:
        return ""

    def export_to_document_tokens(self, *args, **kwargs) -> str:
        return ""


def docling_document_to_legacy(doc) -> _NullLegacyDocument:
    """Compatibility hook only (reference utils/legacy.py:23-25)."""
    return _NullLegacyDocument()
