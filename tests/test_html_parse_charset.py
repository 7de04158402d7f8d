"""WHATWG-style charset sniffing for the html:binary column."""

from __future__ import annotations

from docling_core_spark.functions.html_parse import (
    decode_html_bytes,
    parse_html,
    sniff_encoding,
)


class TestSniff:
    def test_bom_utf8(self):
        assert sniff_encoding(b"\xef\xbb\xbf<html>") == "utf-8-sig"
        assert decode_html_bytes(b"\xef\xbb\xbf<p>a</p>") == "<p>a</p>"

    def test_bom_utf16(self):
        text = "<p>café</p>"
        assert decode_html_bytes(b"\xff\xfe" + text.encode("utf-16-le")) == text
        assert decode_html_bytes(b"\xfe\xff" + text.encode("utf-16-be")) == text

    def test_meta_charset(self):
        html = "<html><head><meta charset='windows-1252'></head><body><p>café</p></body></html>"
        data = html.encode("cp1252")
        assert sniff_encoding(data) == "cp1252"
        assert decode_html_bytes(data) == html

    def test_meta_http_equiv(self):
        html = (
            '<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=ISO-8859-1"></head>'
            "<body><p>naïve</p></body></html>"
        )
        data = html.encode("latin-1")
        # WHATWG maps latin-1 labels to cp1252
        assert sniff_encoding(data) == "cp1252"
        assert decode_html_bytes(data) == html

    def test_shift_jis_label(self):
        html = '<meta charset="Shift_JIS"><p>日本語</p>'
        data = html.encode("shift_jis")
        assert decode_html_bytes(data) == html

    def test_meta_beyond_1024_ignored(self):
        data = b"<html>" + b" " * 1100 + b"<meta charset='shift_jis'>"
        assert sniff_encoding(data) == "utf-8"

    def test_unknown_label_falls_back(self):
        assert sniff_encoding(b"<meta charset='klingon-8'>") == "utf-8"

    def test_no_declaration_defaults_utf8(self):
        assert sniff_encoding(b"<p>plain</p>") == "utf-8"

    def test_mojibake_never_raises(self):
        # mislabeled page: declared sjis, actually utf-8 -> degrades, no raise
        data = "<meta charset='shift_jis'><p>é中</p>".encode("utf-8")
        out = decode_html_bytes(data)
        assert isinstance(out, str)

    def test_parse_html_uses_sniff(self):
        html = "<meta charset='windows-1251'><body><p>текст документа</p></body>"
        doc = parse_html(html.encode("cp1251"), main_content_only=False)
        texts = [t["text"] for t in doc.texts]
        assert any("текст" in t for t in texts)

    def test_utf8_path_unchanged(self):
        # the synthetic corpus path: no BOM, no meta charset -> utf-8
        doc_a = parse_html("<p>café</p>".encode("utf-8"))
        doc_b = parse_html("<p>café</p>")
        assert doc_a.texts == doc_b.texts


class TestReviewRegressions:
    def test_charset_in_unrelated_attr_ignored(self):
        data = (
            b'<meta name="description" content="a tutorial about '
            b'charset=shift_jis encodings"><p>plain utf-8</p>'
        )
        assert sniff_encoding(data) == "utf-8"

    def test_meta_declared_utf16_treated_as_utf8(self):
        # WHATWG: the meta was readable as ASCII, so the page is NOT utf-16
        data = b"<meta charset='utf-16'><p>hello world</p>"
        assert sniff_encoding(data) == "utf-8"
        assert "hello world" in decode_html_bytes(data)

    def test_http_equiv_requires_content_type(self):
        data = (
            b'<meta http-equiv="refresh" content="0; url=x?charset=koi8-r">'
            b"<p>plain</p>"
        )
        assert sniff_encoding(data) == "utf-8"
