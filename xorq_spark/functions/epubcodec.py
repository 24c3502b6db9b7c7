"""Pure-stdlib EPUB writer + text extractor — the third document
sibling of the PDF/DOCX tier: ebooks are a major long-form text
source, and their packaging (OCF zip + OPF manifest/spine + XHTML
chapters) is exactly the multi-part container shape a 100 TB corpus
pipeline must walk correctly — reading chapters in SPINE order, not
zip order, or the assembled text is silently scrambled.

Honest scope (EPUB 2/3 static, unencrypted):
- REAL OCF container checks (`mimetype` member must read
  ``application/epub+zip``), REAL XML parse of
  ``META-INF/container.xml`` (the OASIS container namespace) to find
  the OPF rootfile, REAL OPF parse (manifest id->href map, spine
  itemref order), hrefs resolved relative to the OPF directory, and
  XHTML chapter parse with stdlib ElementTree — paragraph text via
  document-order text iteration, so nested inline markup
  (``<em>``/``<b>``/spans) flattens correctly.
- NAMED GATES: ``META-INF/encryption.xml`` (DRM / font obfuscation)
  raises NotImplementedError by name; a zip without the epub
  mimetype, without container.xml, or with a dangling spine idref
  raises ValueError naming the defect.

Extraction convention (documented so the oracle can replay it):
chapters are visited in SPINE order; each ``<p>`` contributes its
full text content (nested elements flattened in document order) plus
ONE trailing newline; chapters concatenate with no extra separator.

The committed writer emits real OCF packages (stored-first mimetype,
container.xml, OPF with manifest + spine — the fixture SCRAMBLES
spine order vs file order on odd assets, so an extractor that walks
zip order cannot hash-match) from closed-form parameters.

Reference parity: the reference ships no document-format layer; this
is LLM-pipeline territory (alongside WARC/WebDataset/PDF/DOCX).
"""

from __future__ import annotations

import io
import posixpath
import xml.etree.ElementTree as ET
import zipfile
from typing import List, Optional, Tuple

__all__ = ["epub_write", "epub_extract"]

CONTAINER_NS = "urn:oasis:names:tc:opendocument:xmlns:container"
OPF_NS = "http://www.idpf.org/2007/opf"
XHTML_NS = "http://www.w3.org/1999/xhtml"

_CONTAINER_XML = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    f'<container version="1.0" xmlns="{CONTAINER_NS}">'
    '<rootfiles><rootfile full-path="OEBPS/content.opf" '
    'media-type="application/oebps-package+xml"/></rootfiles>'
    "</container>"
)


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def epub_write(
    chapters: List[List[str]],
    spine_order: Optional[List[int]] = None,
    title: str = "Fixture",
    em_token: bool = False,
) -> bytes:
    """Serialize chapters (each a list of paragraph strings) as a real
    OCF package: stored-first mimetype, container.xml, OPF manifest in
    FILE order + spine in `spine_order` (default identity — pass a
    permutation to decouple reading order from zip order). With
    `em_token` the last whitespace-token of every paragraph is wrapped
    in ``<em>`` (nested-inline flattening exercise; the text content
    is unchanged). Deterministic: fixed zip timestamps."""
    n = len(chapters)
    spine = list(range(n)) if spine_order is None else list(spine_order)
    if sorted(spine) != list(range(n)):
        raise ValueError("spine_order must be a permutation of chapters")

    def para_xhtml(text: str) -> str:
        if em_token and " " in text.rstrip():
            head, _, tail = text.rpartition(" ")
            return (
                "<p>"
                + _xml_escape(head + " ")
                + "<em>"
                + _xml_escape(tail)
                + "</em></p>"
            )
        return "<p>" + _xml_escape(text) + "</p>"

    files: List[Tuple[str, str]] = [("META-INF/container.xml", _CONTAINER_XML)]
    manifest = []
    for c, paras in enumerate(chapters):
        body = "".join(para_xhtml(p) for p in paras)
        files.append(
            (
                f"OEBPS/ch{c}.xhtml",
                '<?xml version="1.0" encoding="UTF-8"?>'
                f'<html xmlns="{XHTML_NS}"><head><title>'
                f"{_xml_escape(title)} {c}</title></head>"
                f"<body>{body}</body></html>",
            )
        )
        manifest.append(
            f'<item id="ch{c}" href="ch{c}.xhtml" '
            'media-type="application/xhtml+xml"/>'
        )
    spine_xml = "".join(f'<itemref idref="ch{c}"/>' for c in spine)
    files.append(
        (
            "OEBPS/content.opf",
            '<?xml version="1.0" encoding="UTF-8"?>'
            f'<package xmlns="{OPF_NS}" version="2.0" '
            'unique-identifier="uid">'
            "<metadata><dc:title xmlns:dc="
            '"http://purl.org/dc/elements/1.1/">'
            + _xml_escape(title)
            + "</dc:title></metadata>"
            "<manifest>" + "".join(manifest) + "</manifest>"
            f"<spine>{spine_xml}</spine></package>",
        )
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        info = zipfile.ZipInfo("mimetype", date_time=(1980, 1, 1, 0, 0, 0))
        info.compress_type = zipfile.ZIP_STORED
        zf.writestr(info, "application/epub+zip")
        for name, payload in files:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, payload.encode("utf-8"))
    return buf.getvalue()


def epub_extract(payload: bytes) -> Tuple[int, str]:
    """Extract (n_spine_chapters, text) per the module convention:
    container.xml -> OPF -> spine-ordered XHTML chapters -> <p> text.
    DRM (META-INF/encryption.xml) raises NotImplementedError; a broken
    container raises ValueError naming the defect."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(payload))
    except zipfile.BadZipFile as exc:
        raise ValueError(f"corrupt epub: {exc}") from exc
    with zf:
        names = set(zf.namelist())
        if "META-INF/encryption.xml" in names:
            raise NotImplementedError(
                "unsupported epub: META-INF/encryption.xml present "
                "(DRM / resource encryption)"
            )
        if "mimetype" not in names or zf.read("mimetype").strip() != (
            b"application/epub+zip"
        ):
            raise ValueError("corrupt epub: missing/wrong mimetype member")
        if "META-INF/container.xml" not in names:
            raise ValueError("corrupt epub: no META-INF/container.xml")
        try:
            container = ET.fromstring(zf.read("META-INF/container.xml"))
        except ET.ParseError as exc:
            raise ValueError(f"corrupt epub: bad container.xml: {exc}") from exc
        rootfile = container.find(
            f"{{{CONTAINER_NS}}}rootfiles/{{{CONTAINER_NS}}}rootfile"
        )
        if rootfile is None or not rootfile.get("full-path"):
            raise ValueError("corrupt epub: container.xml has no rootfile")
        opf_path = rootfile.get("full-path")
        if opf_path not in names:
            raise ValueError(f"corrupt epub: rootfile {opf_path!r} missing")
        try:
            opf = ET.fromstring(zf.read(opf_path))
        except ET.ParseError as exc:
            raise ValueError(f"corrupt epub: bad OPF: {exc}") from exc
        opf_dir = posixpath.dirname(opf_path)
        hrefs = {
            item.get("id"): item.get("href")
            for item in opf.iter(f"{{{OPF_NS}}}item")
        }
        out: List[str] = []
        n_chapters = 0
        for itemref in opf.iter(f"{{{OPF_NS}}}itemref"):
            idref = itemref.get("idref")
            href = hrefs.get(idref)
            if href is None:
                raise ValueError(
                    f"corrupt epub: spine idref {idref!r} not in manifest"
                )
            path = posixpath.normpath(posixpath.join(opf_dir, href))
            if path not in names:
                raise ValueError(f"corrupt epub: chapter {path!r} missing")
            try:
                doc = ET.fromstring(zf.read(path))
            except ET.ParseError as exc:
                raise ValueError(
                    f"corrupt epub: bad XHTML in {path!r}: {exc}"
                ) from exc
            n_chapters += 1
            for p in doc.iter(f"{{{XHTML_NS}}}p"):
                out.append("".join(p.itertext()) + "\n")
    return n_chapters, "".join(out)
