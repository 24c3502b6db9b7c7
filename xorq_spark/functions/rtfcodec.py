"""Pure-stdlib RTF writer + text extractor — the fourth document
sibling of the PDF/DOCX/EPUB tier: decades of office exports and
email attachments ship RTF, and its token stream (groups, control
words, cp1252 + ``\\'hh`` + ``\\uN`` escapes) is a genuinely different
parsing shape from the XML/zip formats.

Honest scope (RTF 1.x static text):
- REAL tokenizer over the byte stream: ``{``/``}`` group stack,
  control words with signed numeric parameters and their single
  delimiting space, control symbols, ``\\'hh`` cp1252 escapes,
  ``\\uN`` Unicode escapes with proper ``\\ucN`` fallback skipping
  (the fallback may itself be a ``\\'hh``), escaped literals
  ``\\\\ \\{ \\}``, and raw-text accumulation in cp1252. Raw CR/LF
  bytes are ignored per spec (breaks come only from ``\\par`` /
  ``\\line``).
- Destination handling: any ``{\\* ...}`` ignorable destination and
  the known non-text destinations (fonttbl, colortbl, stylesheet,
  info, pict, objdata) are skipped whole — their text is metadata,
  not document content.
- NAMED GATES: ``\\binN`` embedded binary raises NotImplementedError
  by name (skipping it correctly requires honoring the byte count;
  silently mis-skipping would corrupt everything after). A stream not
  starting ``{\\rtf`` or with unbalanced groups raises ValueError.

Extraction convention (documented so the oracle can replay it):
``\\par`` and ``\\line`` append ONE newline; ``\\tab`` a TAB;
``\\~`` a NBSP (U+00A0); unknown control words contribute nothing;
text inside skipped destinations contributes nothing.

The committed writer emits real RTF (font/color tables, an ignorable
``{\\*\\generator}`` destination, cp1252 ``\\'hh`` for Latin-1 chars,
``\\uN?`` for wider Unicode) from closed-form parameters, so the
oracle replays every extracted character arithmetically.

Reference parity: the reference ships no document-format layer; this
is LLM-pipeline territory (alongside WARC/WebDataset/PDF/DOCX/EPUB).
"""

from __future__ import annotations

from typing import List, Tuple

__all__ = ["rtf_write", "rtf_extract"]

_SKIP_DESTS = {"fonttbl", "colortbl", "stylesheet", "info", "pict", "objdata"}

# --------------------------------------------------------------- writer


def _esc(s: str) -> str:
    out: List[str] = []
    for ch in s:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\line ")
        elif ch == "\t":
            out.append("\\tab ")
        elif ch == "\u00a0":
            out.append("\\~")
        elif o < 128:
            out.append(ch)
        else:
            try:
                b = ch.encode("cp1252")
                out.append("\\'%02x" % b[0])
            except UnicodeEncodeError:
                n = o if o < 32768 else o - 65536
                out.append("\\u%d?" % n)
    return "".join(out)


def rtf_write(paragraphs: List[str]) -> bytes:
    """Serialize paragraphs as a real RTF document: header with font
    and color tables, an ignorable {\\*\\generator} destination, each
    paragraph terminated by \\par. Deterministic."""
    body = "".join(_esc(p) + "\\par\n" for p in paragraphs)
    doc = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0"
        "{\\fonttbl{\\f0\\froman Times New Roman;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\*\\generator xorq_spark rtfcodec;}"
        "\\f0\\fs24 " + body + "}"
    )
    return doc.encode("cp1252")


# ------------------------------------------------------------ extractor


def rtf_extract(payload: bytes) -> Tuple[int, str]:
    """Extract (n_paragraphs, text) per the module convention.
    n_paragraphs counts \\par control words outside skipped
    destinations; text lines end with one newline each."""
    if not payload.startswith(b"{\\rtf"):
        raise ValueError("corrupt rtf: missing {\\rtf header")
    out: List[str] = []
    n_par = 0
    i, n = 0, len(payload)
    # group state: [skip, uc]; stack of inherited copies
    stack: List[List] = []
    skip, uc = False, 1
    pend_ignorable = False  # just saw "\*" — group is a destination
    while i < n:
        c = payload[i : i + 1]
        if c == b"{":
            stack.append([skip, uc])
            pend_ignorable = False
            i += 1
        elif c == b"}":
            if not stack:
                raise ValueError("corrupt rtf: unbalanced closing brace")
            skip, uc = stack.pop()
            pend_ignorable = False
            i += 1
        elif c == b"\\":
            i += 1
            if i >= n:
                raise ValueError("corrupt rtf: dangling backslash")
            ch = payload[i : i + 1]
            if ch.isalpha():
                j = i
                while j < n and payload[j : j + 1].isalpha():
                    j += 1
                word = payload[i:j].decode("ascii")
                k = j
                if k < n and payload[k : k + 1] in b"-0123456789":
                    k += 1
                    while k < n and payload[k : k + 1].isdigit():
                        k += 1
                param_s = payload[j:k].decode("ascii")
                param = int(param_s) if param_s else None
                if k < n and payload[k : k + 1] == b" ":
                    k += 1  # the single delimiting space
                i = k
                if word == "bin":
                    raise NotImplementedError(
                        "unsupported rtf: \\bin embedded binary data"
                    )
                if pend_ignorable or word in _SKIP_DESTS:
                    skip = True
                pend_ignorable = False
                if skip:
                    continue
                if word == "uc" and param is not None:
                    uc = param
                elif word in ("par", "line"):
                    out.append("\n")
                    if word == "par":
                        n_par += 1
                elif word == "tab":
                    out.append("\t")
                elif word == "u" and param is not None:
                    out.append(chr(param % 65536))
                    # skip `uc` fallback items (raw byte or \'hh each)
                    for _ in range(max(uc, 0)):
                        if payload[i : i + 2] == b"\\'":
                            i += 4
                        elif i < n and payload[i : i + 1] not in b"{}\\":
                            i += 1
                # every other control word is formatting — no text
            else:
                i += 1
                was_ignorable = ch == b"*"
                if was_ignorable:
                    pend_ignorable = True
                    continue
                pend_ignorable = False
                if skip:
                    continue
                if ch == b"'":
                    hx = payload[i : i + 2]
                    if len(hx) < 2:
                        raise ValueError("corrupt rtf: truncated \\'hh")
                    out.append(bytes([int(hx, 16)]).decode("cp1252"))
                    i += 2
                elif ch in (b"\\", b"{", b"}"):
                    out.append(ch.decode("ascii"))
                elif ch == b"~":
                    out.append("\u00a0")
                elif ch in (b"\r", b"\n"):
                    out.append("\n")  # escaped newline == \par
                    n_par += 1
                # other control symbols: no text
        else:
            pend_ignorable = False
            if not skip and c not in (b"\r", b"\n", b"\x00"):
                out.append(c.decode("cp1252"))
            i += 1
    if stack:
        raise ValueError("corrupt rtf: unbalanced opening brace")
    return n_par, "".join(out)
