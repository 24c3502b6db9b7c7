"""Pure-stdlib DOCX (OOXML WordprocessingML) writer + text extractor —
the second document sibling of the PDF tier (pdfcodec.py): office
documents are a major crawl-corpus format, and a 100 TB text pipeline
needs their text at scan speed without an office suite.

Honest scope (static OPC packages):
- REAL OPC container walk (the ZIP central directory via stdlib
  `zipfile`, exactly like ziparchive.py), REAL XML parse of
  `word/document.xml` with stdlib ElementTree, document-order body
  walk over `w:p` paragraphs and `w:tbl` tables, run-level `w:t`
  text / `w:tab` / `w:br` handling, `xml:space="preserve"`
  whitespace fidelity, and XML entity unescaping (the parser's job —
  certified through fixtures that embed `&`, `<`, `>`).
- NAMED GATES: CFB/OLE containers (magic ``D0 CF 11 E0`` — both
  legacy binary `.doc` and ENCRYPTED OOXML, which wraps the package
  in a CFB `EncryptedPackage` stream) raise NotImplementedError
  naming the feature; a zip without `word/document.xml` (e.g. an
  xlsx/pptx sibling) raises ValueError naming the missing part.

Extraction convention (documented so the oracle can replay it): body
children are walked in document order; each `w:p` contributes the
concatenation of its runs' text (`w:t` verbatim, `w:tab` as TAB,
`w:br` as NEWLINE) plus ONE trailing newline; each `w:tbl`
contributes one line per `w:tr` — cell texts (cell paragraphs joined
with newline) joined with TAB — plus a trailing newline per row.
`n_paragraphs` counts BODY-level `w:p` only (table-cell paragraphs
are inside their table's lines, not the count).

The committed writer emits real OPC packages ([Content_Types].xml,
_rels/.rels, word/document.xml with the wordprocessingml namespace)
from closed-form parameters, so the oracle replays the paragraph
count and the md5 of every extracted character. A dropped run, a
broken entity, or a skipped table row cannot hash-match.

Reference parity: the reference ships no document-format layer; this
is LLM-pipeline territory (alongside WARC/WebDataset/PDF ingestion).
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile
from typing import List, Optional, Tuple

__all__ = ["docx_write", "docx_extract"]

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_CT_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.'
    'main+xml"/></Types>'
)
_RELS_XML = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)

# --------------------------------------------------------------- writer


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _run_xml(text: str) -> str:
    """One w:r; TAB and NEWLINE inside the text become real w:tab /
    w:br elements splitting the surrounding w:t pieces (the shape
    word processors actually emit)."""
    parts: List[str] = []
    piece = []
    for ch in text:
        if ch in "\t\n":
            if piece:
                parts.append(
                    '<w:t xml:space="preserve">'
                    + _xml_escape("".join(piece))
                    + "</w:t>"
                )
                piece = []
            parts.append("<w:tab/>" if ch == "\t" else "<w:br/>")
        else:
            piece.append(ch)
    if piece:
        parts.append(
            '<w:t xml:space="preserve">'
            + _xml_escape("".join(piece))
            + "</w:t>"
        )
    return "<w:r>" + "".join(parts) + "</w:r>"


def _para_xml(runs: List[str]) -> str:
    return "<w:p>" + "".join(_run_xml(r) for r in runs) + "</w:p>"


def docx_write(
    paragraphs: List[List[str]],
    table: Optional[List[List[str]]] = None,
) -> bytes:
    """Serialize paragraphs (each a list of run texts; ``\\t``/``\\n``
    inside a run become w:tab / w:br) and an optional trailing table
    (rows of cell texts) as a real minimal OPC package. Deterministic:
    fixed zip timestamps, DEFLATE members."""
    body: List[str] = [_para_xml(runs) for runs in paragraphs]
    if table is not None:
        rows = []
        for row in table:
            cells = "".join(
                "<w:tc>" + _para_xml([cell]) + "</w:tc>" for cell in row
            )
            rows.append("<w:tr>" + cells + "</w:tr>")
        body.append("<w:tbl>" + "".join(rows) + "</w:tbl>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>'
        + "".join(body)
        + "<w:sectPr/></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, payload in (
            ("[Content_Types].xml", _CT_XML),
            ("_rels/.rels", _RELS_XML),
            ("word/document.xml", doc),
        ):
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, payload.encode("utf-8"))
    return buf.getvalue()


# ------------------------------------------------------------ extractor


def _q(tag: str) -> str:
    return f"{{{W_NS}}}{tag}"


def _run_text(r: "ET.Element") -> str:
    out: List[str] = []
    for el in r.iter():
        if el.tag == _q("t"):
            out.append(el.text or "")
        elif el.tag == _q("tab"):
            out.append("\t")
        elif el.tag in (_q("br"), _q("cr")):
            out.append("\n")
    return "".join(out)


def _para_text(p: "ET.Element") -> str:
    return "".join(_run_text(r) for r in p.iter(_q("r")))


def docx_extract(payload: bytes) -> Tuple[int, str]:
    """Extract (n_body_paragraphs, text) from a DOCX payload per the
    module convention. CFB/OLE containers (legacy .doc, encrypted
    OOXML) raise NotImplementedError by name; a non-zip or a zip
    without word/document.xml raises ValueError."""
    if payload[:4] == b"\xd0\xcf\x11\xe0":
        raise NotImplementedError(
            "unsupported document: CFB/OLE container (legacy .doc or "
            "encrypted OOXML EncryptedPackage); only plain OPC zip "
            "packages are supported"
        )
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt docx: {exc}") from exc
    with zf:
        try:
            doc_xml = zf.read("word/document.xml")
        except KeyError:
            raise ValueError(
                "corrupt docx: no word/document.xml part (not a "
                "wordprocessingml package)"
            ) from None
        try:
            root = ET.fromstring(doc_xml)
        except ET.ParseError as exc:
            raise ValueError(f"corrupt docx: bad XML: {exc}") from exc
    body = root.find(_q("body"))
    if body is None:
        raise ValueError("corrupt docx: document has no w:body")
    n_paras = 0
    out: List[str] = []
    for child in body:
        if child.tag == _q("p"):
            n_paras += 1
            out.append(_para_text(child) + "\n")
        elif child.tag == _q("tbl"):
            for tr in child.iter(_q("tr")):
                cells = [
                    "\n".join(_para_text(p) for p in tc.iter(_q("p")))
                    for tc in tr.iter(_q("tc"))
                ]
                out.append("\t".join(cells) + "\n")
    return n_paras, "".join(out)
