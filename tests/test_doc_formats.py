"""DOCX / EPUB / RTF writers + extractors and the compressed-payload
sniffer: round-trips, structural edge cases, and named gates."""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import zipfile

import pytest

from xorq_spark.functions.compressedio import (
    decompress_auto,
    sniff_compression,
)
from xorq_spark.functions.docxcodec import docx_extract, docx_write
from xorq_spark.functions.epubcodec import epub_extract, epub_write
from xorq_spark.functions.rtfcodec import rtf_extract, rtf_write
from xorq_spark.functions.ziparchive import zip_build

# ------------------------------------------------------------------ docx


def test_docx_roundtrip_runs_tabs_breaks():
    paras = [["Hello ", "world"], ["A&B <q>\te"], ["line1\nline2"]]
    n, text = docx_extract(docx_write(paras))
    assert n == 3
    assert text == "Hello world\nA&B <q>\te\nline1\nline2\n"


def test_docx_table_rows_as_lines():
    tbl = [["r0c0", "r0c1"], ["r1c0", "r1c1"]]
    n, text = docx_extract(docx_write([["p"]], table=tbl))
    assert n == 1  # body paragraphs only; cell paragraphs don't count
    assert text == "p\nr0c0\tr0c1\nr1c0\tr1c1\n"


def test_docx_is_valid_opc_package():
    with zipfile.ZipFile(io.BytesIO(docx_write([["x"]]))) as zf:
        names = zf.namelist()
        assert "[Content_Types].xml" in names
        assert "_rels/.rels" in names
        assert "word/document.xml" in names
        assert zf.testzip() is None  # CRCs valid


def test_docx_gates():
    with pytest.raises(NotImplementedError, match="CFB/OLE"):
        docx_extract(b"\xd0\xcf\x11\xe0rest-of-ole")
    with pytest.raises(ValueError, match="corrupt docx"):
        docx_extract(b"not a zip at all")
    with pytest.raises(ValueError, match="word/document.xml"):
        docx_extract(zip_build([("xl/workbook.xml", "<x/>")]))


# ------------------------------------------------------------------ epub


def test_epub_spine_order_not_zip_order():
    chs = [["c0 p0"], ["c1 p0"], ["c2 p0"]]
    n, text = epub_extract(epub_write(chs, spine_order=[2, 0, 1]))
    assert n == 3
    assert text == "c2 p0\nc0 p0\nc1 p0\n"


def test_epub_entities_and_nested_em():
    chs = [["keep &x<y tail", "two words"]]
    n, text = epub_extract(epub_write(chs, em_token=True))
    assert text == "keep &x<y tail\ntwo words\n"


def test_epub_mimetype_first_and_stored():
    with zipfile.ZipFile(io.BytesIO(epub_write([["x"]]))) as zf:
        first = zf.infolist()[0]
        assert first.filename == "mimetype"
        assert first.compress_type == zipfile.ZIP_STORED


def test_epub_gates():
    with pytest.raises(ValueError, match="mimetype"):
        epub_extract(zip_build([("a.txt", "hi")]))
    with pytest.raises(ValueError, match="corrupt epub"):
        epub_extract(b"junk")
    # DRM marker
    base = epub_write([["x"]])
    out = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        out, "w"
    ) as zo:
        for it in zin.infolist():
            zo.writestr(it, zin.read(it))
        zo.writestr("META-INF/encryption.xml", "<enc/>")
    with pytest.raises(NotImplementedError, match="encryption.xml"):
        epub_extract(out.getvalue())
    # dangling spine idref (rewrite the OPF member — it is deflated,
    # so a byte-level patch of the archive would not reach it)
    out2 = io.BytesIO()
    with zipfile.ZipFile(io.BytesIO(base)) as zin, zipfile.ZipFile(
        out2, "w"
    ) as zo:
        for it in zin.infolist():
            data = zin.read(it)
            if it.filename == "OEBPS/content.opf":
                data = data.replace(b'idref="ch0"', b'idref="zz0"')
            zo.writestr(it, data)
    with pytest.raises(ValueError, match="spine"):
        epub_extract(out2.getvalue())


# ------------------------------------------------------------------- rtf


def test_rtf_roundtrip_escapes():
    paras = [
        "Hello world",
        "brace {b} back\\slash",
        "café € euro",  # cp1252 \'hh path
        "tab\there",
        "wide 中 char",  # \uN? path
    ]
    n, text = rtf_extract(rtf_write(paras))
    assert n == 5
    assert text == "".join(p + "\n" for p in paras)


def test_rtf_destinations_do_not_leak():
    raw = (
        b"{\\rtf1{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red1\\green2"
        b"\\blue3;}{\\*\\generator Fixture 1.0;}Visible\\par}"
    )
    n, text = rtf_extract(raw)
    assert (n, text) == (1, "Visible\n")


def test_rtf_uc0_unicode_no_fallback():
    n, text = rtf_extract(b"{\\rtf1\\uc0\\u233 x\\par}")
    assert text == "éx\n"


def test_rtf_uc1_skips_hex_fallback():
    n, text = rtf_extract(b"{\\rtf1\\u233\\'e9x\\par}")
    assert text == "éx\n"


def test_rtf_gates():
    with pytest.raises(ValueError, match="rtf header"):
        rtf_extract(b"plain text")
    with pytest.raises(NotImplementedError, match="bin"):
        rtf_extract(b"{\\rtf1 \\bin4 abcd}")
    with pytest.raises(ValueError, match="unbalanced"):
        rtf_extract(b"{\\rtf1 {open")


# ------------------------------------------------------------ compressed


def test_sniff_and_decompress_all_formats():
    body = b"line one\nline two\n" * 3
    for fmt, payload in (
        ("gzip", gzip.compress(body, mtime=0)),
        ("bz2", bz2.compress(body)),
        ("xz", lzma.compress(body)),
    ):
        assert sniff_compression(payload) == fmt
        got_fmt, raw = decompress_auto(payload)
        assert (got_fmt, raw) == (fmt, body)


def test_multimember_gzip_concatenation():
    a, b = b"first half|", b"second half"
    fmt, raw = decompress_auto(
        gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0)
    )
    assert (fmt, raw) == ("gzip", a + b)


def test_compression_gates():
    with pytest.raises(NotImplementedError, match="zstd"):
        sniff_compression(b"\x28\xb5\x2f\xfd rest")
    with pytest.raises(NotImplementedError, match="lz4"):
        sniff_compression(b"\x04\x22\x4d\x18 rest")
    with pytest.raises(ValueError, match="unknown compression"):
        sniff_compression(b"PLAINTEXT")
    with pytest.raises(ValueError, match="corrupt gzip"):
        decompress_auto(b"\x1f\x8b" + b"\x00" * 10)
