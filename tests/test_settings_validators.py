"""Settings + validators utilities (reference utils/settings.py,
utils/validators.py) and the DocLang deserialize budgets they gate."""

from __future__ import annotations

from datetime import datetime

import pytest

from docling_core_spark.model.settings import CoreSettings
from docling_core_spark.model.validators import (
    ensure_unique_list,
    validate_datetime,
    validate_unique_list,
)


def test_settings_defaults_match_reference():
    s = CoreSettings()
    assert s.allow_image_file_uri is False
    assert s.max_image_decoded_size == 20 * 1024 * 1024
    assert s.max_doclang_xml_bytes == 128 * 1024 * 1024
    assert s.max_doclang_xml_depth == 128
    assert s.max_doclang_xml_elements == 1_000_000


def test_settings_env_override(monkeypatch):
    monkeypatch.setenv("DOCLINGCORE_ALLOW_IMAGE_FILE_URI", "true")
    monkeypatch.setenv("DOCLINGCORE_MAX_DOCLANG_XML_DEPTH", "7")
    s = CoreSettings.from_env()
    assert s.allow_image_file_uri is True
    assert s.max_doclang_xml_depth == 7
    assert s.max_doclang_xml_elements == 1_000_000  # untouched default


def test_settings_env_garbage_raises(monkeypatch):
    monkeypatch.setenv("DOCLINGCORE_MAX_DOCLANG_XML_DEPTH", "not-an-int")
    with pytest.raises(ValueError, match="MAX_DOCLANG_XML_DEPTH"):
        CoreSettings.from_env()
    monkeypatch.delenv("DOCLINGCORE_MAX_DOCLANG_XML_DEPTH")
    monkeypatch.setenv("DOCLINGCORE_ALLOW_IMAGE_FILE_URI", "maybe")
    with pytest.raises(ValueError, match="ALLOW_IMAGE_FILE_URI"):
        CoreSettings.from_env()


def test_ensure_unique_list():
    assert ensure_unique_list(["a", "b", "a", "c", "b"]) == ["a", "b", "c"]
    assert ensure_unique_list([]) == []
    with pytest.raises(ValueError, match="must be a list"):
        ensure_unique_list("abc")


def test_validate_unique_list():
    assert validate_unique_list([1, 2, 3]) == [1, 2, 3]
    with pytest.raises(ValueError, match="unique"):
        validate_unique_list([1, 2, 1])


def test_validate_datetime():
    now = datetime(2020, 1, 2, 3, 4, 5)
    assert validate_datetime(now) is now
    assert validate_datetime("2020-01-02T03:04:05") == "2020-01-02T03:04:05"
    with pytest.raises(ValueError):
        validate_datetime("12345")  # numeric string rejected
    with pytest.raises(ValueError):
        validate_datetime(12345)
    # wrap-validator protocol: handler receives the accepted value
    assert validate_datetime("x", handler=lambda v: v + "!") == "x!"


# -- budgets wired into the DocLang deserializer ---------------------------


def _doclang(depth: int) -> str:
    open_tags = "".join("<group>" for _ in range(depth))
    close_tags = "".join("</group>" for _ in range(depth))
    return f"<doclang>{open_tags}<text><location value='0'/>x</text>{close_tags}</doclang>"


def test_doclang_depth_budget():
    from docling_core_spark.functions.doclang_load import DocLangDeserializer

    DocLangDeserializer(max_xml_depth=64).deserialize(_doclang(10))
    with pytest.raises(ValueError, match="nesting depth limit"):
        DocLangDeserializer(max_xml_depth=5).deserialize(_doclang(10))


def test_doclang_element_budget():
    from docling_core_spark.functions.doclang_load import DocLangDeserializer

    many = "<doclang>" + "<text>x</text>" * 50 + "</doclang>"
    DocLangDeserializer(max_xml_elements=200).deserialize(many)
    with pytest.raises(ValueError, match="element count limit"):
        DocLangDeserializer(max_xml_elements=20).deserialize(many)


def test_doclang_bytes_budget():
    from docling_core_spark.functions.doclang_load import DocLangDeserializer

    doc = "<doclang><text>hello</text></doclang>"
    DocLangDeserializer(max_xml_bytes=10_000).deserialize(doc)
    with pytest.raises(ValueError, match="size limit"):
        DocLangDeserializer(max_xml_bytes=10).deserialize(doc)
    with pytest.raises(ValueError, match="must be positive"):
        DocLangDeserializer(max_xml_bytes=0).deserialize(doc)


def test_doclang_default_budgets_allow_normal_docs():
    from docling_core_spark.functions.doclang_load import load_from_doclang

    d = load_from_doclang("<doclang><text>hello world</text></doclang>")
    assert len(d.texts) == 1
