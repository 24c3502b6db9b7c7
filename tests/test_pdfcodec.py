"""PDF writer/extractor: round-trips, escapes, incremental updates,
filters, and named gates."""

from __future__ import annotations

import re
import zlib

import pytest

from xorq_spark.functions.pdfcodec import pdf_extract, pdf_probe, pdf_write

PAGES = [
    ["Hello world", "Second line (with parens) and \\backslash"],
    ["Page two only line"],
]
EXPECTED = (
    "Hello world\nSecond line (with parens) and \\backslash\n"
    "Page two only line\n"
)


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip(compress):
    p = pdf_write(PAGES, compress=compress)
    n, text, info = pdf_extract(p)
    assert n == 2 and text == EXPECTED
    assert info["version"] == "1.4"
    assert info["producer"] == "xorq_spark_pdfcodec"


def test_incremental_update_prev_chain():
    p = pdf_write(PAGES, incremental_extra_page=["Appended page line"])
    n, text, info = pdf_extract(p)
    assert n == 3
    assert text == EXPECTED + "Appended page line\n"
    # trailer keys inherit down the /Prev chain
    assert info["producer"] == "xorq_spark_pdfcodec"


def test_probe():
    r = pdf_probe(pdf_write(PAGES))
    assert r == {
        "version": "1.4",
        "n_pages": 2,
        "n_chars": len(EXPECTED),
        "n_lines": 3,
        "has_producer": True,
    }


def test_escapes_and_hex_strings():
    # hand-built content stream: octal escape, hex string, TJ array
    from xorq_spark.functions.pdfcodec import _extract_text

    content = (
        b"BT (A\\051B) Tj T* <48656c6c6f> Tj T* "
        b"[(a) -120 (b)] TJ T* ET"
    )
    assert _extract_text(content) == "A)B\nHello\nab\n"


def test_positioning_preamble_emits_nothing():
    from xorq_spark.functions.pdfcodec import _extract_text

    assert _extract_text(b"BT /F1 9 Tf 10 20 Td 30 40 TD T* ET") == ""
    assert _extract_text(b"BT 1 0 0 1 5 5 Tm (x) Tj ET") == "x\n"


def test_encrypted_gate():
    p = pdf_write(PAGES)
    bad = p.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R", 1)
    with pytest.raises(NotImplementedError, match="Encrypt"):
        pdf_extract(bad)


def test_non_flate_filter_gate():
    p = pdf_write(PAGES, compress=True)
    bad = p.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode  ")
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        pdf_extract(bad)


def test_corruption_detected():
    p = pdf_write(PAGES)
    with pytest.raises(ValueError, match="startxref"):
        pdf_extract(p[:-30])
    with pytest.raises(ValueError):
        pdf_extract(b"%PDF-1.4\njunk\nstartxref\n2\n%%EOF\n")
    # corrupt the Flate stream body
    m = re.search(rb"stream\r?\n", p)
    b = bytearray(p)
    b[m.end() + 2] ^= 0xFF
    with pytest.raises((ValueError, NotImplementedError)):
        pdf_extract(bytes(b))


def test_flate_actually_compresses():
    big = [["word " * 200] * 5]
    raw = pdf_write(big, compress=False)
    comp = pdf_write(big, compress=True)
    assert len(comp) < len(raw) / 2
    assert pdf_extract(comp)[1] == pdf_extract(raw)[1]
    assert b"word word" not in comp  # text really is compressed


def test_not_a_pdf():
    with pytest.raises(ValueError, match="missing %PDF-"):
        pdf_extract(b"GIF89a not a pdf")
