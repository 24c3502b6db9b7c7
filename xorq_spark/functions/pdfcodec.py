"""Pure-stdlib PDF writer + text extractor — the document sibling of
the WARC/WebDataset ingestion tier: crawl corpora ship PDFs in volume,
and a 100 TB text pipeline needs page counts and extracted text at
scan speed without a rendering stack.

Honest scope (PDF 1.4 static files):
- REAL xref-table parse (incl. /Prev chains from incremental updates),
  trailer, object tokenizer (dicts, arrays, names, numbers, literal +
  hex strings with full escape handling, references), page-tree walk,
  content streams with /FlateDecode (stdlib zlib) or no filter, and
  BT/ET text extraction over Tj / TJ / ' / " with Td/TD/T* treated as
  line breaks.
- NAMED GATES: encrypted files (/Encrypt), PDF 1.5+ cross-reference
  STREAMS and object streams, and non-Flate stream filters (DCT/LZW/
  ASCII85/...) raise NotImplementedError naming the feature.

Extraction convention (documented so the oracle can replay it): text
show operators append their string; each break (Td, TD, T*, ', ", ET)
flushes pending text with ONE trailing newline and is a no-op when no
text is pending — so positioning preambles emit nothing and every
visible text run ends with exactly one newline. TJ kerning numbers are
ignored. The deterministic subset heuristic extractors agree on.

The committed writer emits real multi-page PDFs (page tree, per-page
Flate-compressed or raw content streams, correct xref offsets,
optional incremental-update section) from closed-form parameters, so
the oracle replays page counts and the full extracted text. A slipped
xref offset, a broken Flate inflate, or a mis-tokenized escape cannot
hash-match.

Reference parity: the reference ships no document-format layer; this
is LLM-pipeline territory (alongside WARC/WebDataset ingestion).
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

__all__ = ["pdf_write", "pdf_extract", "pdf_probe"]


# --------------------------------------------------------------- writer


def _esc_literal(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "()\\":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        else:
            out.append(ch)
    return "".join(out).encode("latin-1")


def pdf_write(
    pages: List[List[str]],
    compress: bool = True,
    producer: str = "xorq_spark_pdfcodec",
    incremental_extra_page: List[str] = None,
) -> bytes:
    """A real PDF 1.4 file: catalog, page tree, one content stream per
    page (each line of the page becomes `(line) Tj T*`), optional
    Flate compression, a correct xref table, and optionally an
    INCREMENTAL UPDATE section appending one more page (exercises the
    /Prev xref chain the way real-world edited PDFs do)."""
    objs: Dict[int, bytes] = {}
    n_pages = len(pages)
    # 1 = catalog, 2 = pages, 3 = font, 4.. = page objs, then streams
    page_ids = [4 + i for i in range(n_pages)]
    stream_ids = [4 + n_pages + i for i in range(n_pages)]
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    for i, (pid, sid) in enumerate(zip(page_ids, stream_ids)):
        objs[pid] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {sid} 0 R >>"
        ).encode()
        body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for line in pages[i]:
            body += b"(" + _esc_literal(line) + b") Tj T*\n"
        body += b"ET"
        data = bytes(body)
        if compress:
            data = zlib.compress(data)
            objs[sid] = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
                + b"\nstream\n" + data + b"\nendstream"
            )
        else:
            objs[sid] = (
                f"<< /Length {len(data)} >>".encode()
                + b"\nstream\n" + data + b"\nendstream"
            )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: Dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    size = max(objs) + 1
    xref_at = len(out)
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {size} /Root 1 0 R "
        f"/Producer ({producer}) >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()

    if incremental_extra_page is not None:
        # real-world shape: an appended page via a NEW body + xref
        # section whose trailer /Prev points at the original xref
        new_pid, new_sid = size, size + 1
        body = bytearray(b"BT /F1 12 Tf 72 720 Td 14 TL\n")
        for line in incremental_extra_page:
            body += b"(" + _esc_literal(line) + b") Tj T*\n"
        body += b"ET"
        data = zlib.compress(bytes(body)) if compress else bytes(body)
        filt = " /Filter /FlateDecode" if compress else ""
        new_objs = {
            2: (
                f"<< /Type /Pages /Kids [{kids} {new_pid} 0 R] "
                f"/Count {n_pages + 1} >>"
            ).encode(),
            new_pid: (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {new_sid} 0 R >>"
            ).encode(),
            new_sid: (
                f"<< /Length {len(data)}{filt} >>".encode()
                + b"\nstream\n" + data + b"\nendstream"
            ),
        }
        offs2: Dict[int, int] = {}
        for num in sorted(new_objs):
            offs2[num] = len(out)
            out += f"{num} 0 obj\n".encode() + new_objs[num] + b"\nendobj\n"
        new_size = new_sid + 1
        xref2_at = len(out)
        # three subsections: object 2 (updated), then the two new ids
        out += b"xref\n"
        out += f"2 1\n{offs2[2]:010d} 00000 n \n".encode()
        out += f"{new_pid} 2\n".encode()
        out += f"{offs2[new_pid]:010d} 00000 n \n".encode()
        out += f"{offs2[new_sid]:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {new_size} /Root 1 0 R /Prev {xref_at} >>\n"
            f"startxref\n{xref2_at}\n%%EOF\n"
        ).encode()
    return bytes(out)


# -------------------------------------------------------------- tokenizer


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.d, len(self.d)
        while self.pos < n:
            c = self.d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def token(self):
        """Next raw token: bytes for operators/names/numbers, tuple
        ('str', text) for strings, '<<', '>>', '[', ']'."""
        self._skip_ws()
        d, n = self.d, len(self.d)
        if self.pos >= n:
            return None
        c = d[self.pos]
        if d[self.pos : self.pos + 2] == b"<<":
            self.pos += 2
            return b"<<"
        if d[self.pos : self.pos + 2] == b">>":
            self.pos += 2
            return b">>"
        if c == 0x28:  # ( literal string
            return ("str", self._literal_string())
        if c == 0x3C:  # < hex string
            return ("str", self._hex_string())
        if c in b"[]":
            self.pos += 1
            return bytes([c])
        if c == 0x2F:  # / name
            start = self.pos
            self.pos += 1
            while self.pos < n and d[self.pos] not in _WS + _DELIM:
                self.pos += 1
            return d[start : self.pos]
        start = self.pos
        while self.pos < n and d[self.pos] not in _WS + _DELIM:
            self.pos += 1
        if self.pos == start:  # lone delimiter (e.g. '{' '}')
            self.pos += 1
        return d[start : self.pos]

    def _literal_string(self) -> str:
        d, n = self.d, len(self.d)
        assert d[self.pos] == 0x28
        self.pos += 1
        depth = 1
        out = bytearray()
        while self.pos < n:
            c = d[self.pos]
            if c == 0x5C:  # backslash
                self.pos += 1
                e = d[self.pos]
                if e in b"nrtbf":
                    out += {
                        0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                        0x62: b"\b", 0x66: b"\x0c",
                    }[e]
                    self.pos += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_digits = bytearray()
                    while (
                        len(oct_digits) < 3
                        and self.pos < n
                        and 0x30 <= d[self.pos] <= 0x37
                    ):
                        oct_digits.append(d[self.pos])
                        self.pos += 1
                    out.append(int(oct_digits.decode(), 8) & 0xFF)
                elif e in b"\r\n":  # line continuation
                    self.pos += 1
                    if e == 0x0D and self.pos < n and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
                    self.pos += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                self.pos += 1
            elif c == 0x29:
                depth -= 1
                self.pos += 1
                if depth == 0:
                    return out.decode("latin-1")
                out.append(c)
            else:
                out.append(c)
                self.pos += 1
        raise ValueError("corrupt PDF: unterminated literal string")

    def _hex_string(self) -> str:
        d, n = self.d, len(self.d)
        self.pos += 1
        digits = bytearray()
        while self.pos < n and d[self.pos] != 0x3E:
            if d[self.pos] not in _WS:
                digits.append(d[self.pos])
            self.pos += 1
        self.pos += 1
        if len(digits) % 2:
            digits.append(0x30)
        return bytes.fromhex(digits.decode()).decode("latin-1")

    def value(self, tok=None):
        """Parse one PDF value starting at `tok` (or the next token):
        dict, array, name, number, string, bool, null, or an indirect
        reference tuple ('ref', num)."""
        if tok is None:
            tok = self.token()
        if tok == b"<<":
            out = {}
            while True:
                k = self.token()
                if k == b">>":
                    return out
                if not (isinstance(k, bytes) and k.startswith(b"/")):
                    raise ValueError("corrupt PDF: dict key not a name")
                out[k[1:].decode("latin-1")] = self.value()
        if tok == b"[":
            arr = []
            while True:
                save = self.pos
                t = self.token()
                if t == b"]":
                    return arr
                self.pos = save
                arr.append(self.value())
        if isinstance(tok, tuple):
            return tok[1]
        if tok in (b"true", b"false"):
            return tok == b"true"
        if tok == b"null":
            return None
        if isinstance(tok, bytes) and tok.startswith(b"/"):
            return ("name", tok[1:].decode("latin-1"))
        # number, possibly an indirect reference "num gen R"
        try:
            num = int(tok)
        except ValueError:
            try:
                return float(tok)
            except ValueError:
                return ("op", tok.decode("latin-1", "replace"))
        save = self.pos
        t2 = self.token()
        if isinstance(t2, bytes):
            try:
                int(t2)
                t3 = self.token()
                if t3 == b"R":
                    return ("ref", num)
            except ValueError:
                pass
        self.pos = save
        return num


# -------------------------------------------------------------- extractor


def _parse_xref(data: bytes, start: int, seen=None):
    """Parse the xref table at `start` (+ /Prev chain). Returns
    (offsets {obj: byte offset}, trailer dict of the NEWEST section)."""
    if seen is None:
        seen = set()
    if start in seen:
        raise ValueError("corrupt PDF: cyclic /Prev xref chain")
    seen.add(start)
    lex = _Lexer(data, start)
    tok = lex.token()
    if tok != b"xref":
        # an indirect object here ("N G obj") is a PDF 1.5+ xref
        # STREAM — a named gate; anything else is corruption
        looks_like_obj = False
        try:
            int(tok)
            t2 = lex.token()
            int(t2)
            looks_like_obj = lex.token() == b"obj"
        except (TypeError, ValueError):
            pass
        if looks_like_obj:
            raise NotImplementedError(
                "unsupported PDF: cross-reference STREAM (PDF 1.5+); "
                "only classic xref tables are parsed"
            )
        raise ValueError(
            f"corrupt PDF: no xref table at startxref offset {start}"
        )
    offsets: Dict[int, int] = {}
    while True:
        save = lex.pos
        t = lex.token()
        if t == b"trailer":
            break
        first = int(t)
        count = int(lex.token())
        lex._skip_ws()
        for i in range(count):
            line = data[lex.pos : lex.pos + 20]
            off = int(line[0:10])
            kind = line[17:18]
            if kind == b"n":
                offsets[first + i] = off
            lex.pos += 20 if line[18:20] in (b" \n", b" \r", b"\r\n") else 19
            lex._skip_ws()
    trailer = lex.value()
    if "Prev" in trailer:
        older, older_trailer = _parse_xref(data, int(trailer["Prev"]), seen)
        # newer sections override older entries; trailer keys inherit
        # down the chain with the newest winning (incremental updates
        # often omit e.g. /Producer rather than repeating it)
        older.update(offsets)
        offsets = older
        merged = dict(older_trailer)
        merged.update(trailer)
        trailer = merged
    return offsets, trailer


def _load_obj(data: bytes, offsets: Dict[int, int], num: int):
    """Parse object `num`: returns (value, stream_bytes_or_None)."""
    if num not in offsets:
        raise ValueError(f"corrupt PDF: object {num} not in xref")
    lex = _Lexer(data, offsets[num])
    onum = int(lex.token())
    if onum != num:
        raise ValueError(
            f"corrupt PDF: xref offset for {num} points at object {onum}"
        )
    lex.token()  # generation
    if lex.token() != b"obj":
        raise ValueError("corrupt PDF: missing obj keyword")
    val = lex.value()
    save = lex.pos
    t = lex.token()
    if t == b"stream":
        # EOL after 'stream' is CRLF or LF
        p = lex.pos
        if data[p : p + 2] == b"\r\n":
            p += 2
        elif data[p : p + 1] == b"\n":
            p += 1
        length = val.get("Length")
        if isinstance(length, tuple) and length[0] == "ref":
            length, _ = _load_obj(data, offsets, length[1])
        return val, data[p : p + int(length)]
    lex.pos = save
    return val, None


def _deref(data, offsets, v):
    while isinstance(v, tuple) and v[0] == "ref":
        v, _ = _load_obj(data, offsets, v[1])
    return v


def _decode_stream(d: dict, raw: bytes) -> bytes:
    filt = d.get("Filter")
    if filt is None:
        return raw
    filts = filt if isinstance(filt, list) else [filt]
    out = raw
    for f in filts:
        name = f[1] if isinstance(f, tuple) else str(f)
        if name == "FlateDecode":
            try:
                out = zlib.decompress(out)
            except zlib.error as ex:
                raise ValueError(f"corrupt PDF: Flate stream ({ex})")
        else:
            raise NotImplementedError(
                f"unsupported PDF stream filter /{name}; only "
                "/FlateDecode (and unfiltered) are built in"
            )
    return out


def _extract_text(content: bytes) -> str:
    """Text from one content stream per the documented convention."""
    lex = _Lexer(content)
    out: List[str] = []
    pend: List[str] = []  # strings shown since the last break
    in_bt = False

    def brk():
        # a break flushes pending text with ONE trailing newline and is
        # a no-op otherwise — positioning ops before any text (the
        # universal `x y Td` preamble) emit nothing
        if pend:
            out.append("".join(pend) + "\n")
            pend.clear()

    stack: List = []
    while True:
        tok = lex.token()
        if tok is None:
            break
        if isinstance(tok, tuple):
            stack.append(tok[1])
            continue
        if tok == b"[":
            lex.pos -= 1
            stack.append(lex.value())
            continue
        if tok == b"BT":
            in_bt = True
            continue
        if tok == b"ET":
            brk()
            in_bt = False
            continue
        if not in_bt:
            stack.clear()
            continue
        if tok == b"Tj" and stack:
            pend.append(stack[-1] if isinstance(stack[-1], str) else "")
            stack.clear()
        elif tok == b"TJ" and stack:
            arr = stack[-1]
            if isinstance(arr, list):
                pend.append(
                    "".join(x for x in arr if isinstance(x, str))
                )
            stack.clear()
        elif tok in (b"Td", b"TD", b"T*"):
            brk()
            stack.clear()
        elif tok == b"'":
            brk()
            if stack and isinstance(stack[-1], str):
                pend.append(stack[-1])
            stack.clear()
        elif tok == b'"':
            brk()
            if stack and isinstance(stack[-1], str):
                pend.append(stack[-1])
            stack.clear()
        else:
            # any other operator consumes its operands
            try:
                lex.value(tok)
            except Exception:
                pass
            if isinstance(tok, bytes) and tok.isalpha():
                stack.clear()
    brk()
    return "".join(out)


def pdf_extract(payload: bytes) -> Tuple[int, str, dict]:
    """(n_pages, text, info) from a static PDF. Walks the real xref
    (incl. /Prev chains), the page tree, and each page's content
    stream(s). Raises NotImplementedError by name for encrypted files,
    xref streams, and non-Flate filters; ValueError for corruption."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    tail = payload[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF\s*$", tail)
    if not m:
        raise ValueError("corrupt PDF: no startxref/%%EOF trailer")
    offsets, trailer = _parse_xref(payload, int(m.group(1)))
    if "Encrypt" in trailer:
        raise NotImplementedError(
            "unsupported PDF: encrypted (/Encrypt); decryption not "
            "implemented"
        )
    root = _deref(payload, offsets, trailer["Root"])
    pages_obj = _deref(payload, offsets, root["Pages"])

    page_texts: List[str] = []

    def walk(node):
        node = _deref(payload, offsets, node)
        ntype = node.get("Type")
        tname = ntype[1] if isinstance(ntype, tuple) else None
        if tname == "Pages":
            for kid in node.get("Kids", []):
                walk(kid)
            return
        # a leaf page
        contents = node.get("Contents")
        if contents is None:
            page_texts.append("")
            return
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if isinstance(r, tuple) and r[0] == "ref":
                d, raw = _load_obj(payload, offsets, r[1])
            else:
                raise ValueError("corrupt PDF: /Contents not a reference")
            parts.append(_decode_stream(d, raw))
        page_texts.append(_extract_text(b"\n".join(parts)))

    walk(pages_obj)
    version = payload[5:8].decode("latin-1", "replace")
    info = {"version": version, "producer": None}
    prod = trailer.get("Producer")
    if isinstance(prod, str):
        info["producer"] = prod
    return len(page_texts), "".join(page_texts), info


def pdf_probe(payload: bytes) -> dict:
    """Corpus-audit summary: version, n_pages, n_chars, n_lines,
    has_producer."""
    n_pages, text, info = pdf_extract(payload)
    return {
        "version": info["version"],
        "n_pages": n_pages,
        "n_chars": len(text),
        "n_lines": sum(1 for ln in text.split("\n") if ln),
        "has_producer": info["producer"] is not None,
    }
