"""Pure-stdlib PDF writer + text/layout extractor.

Closes the "PDF/layout parse" leg of the extraction tier (the reference
engine is HTML-only; a web-scale corpus is not): a REAL subset-PDF
codec in the style of core/png.py / core/jpeg.py —

* :func:`encode_pdf` writes genuine PDF 1.4: catalog / page-tree / page
  objects, FlateDecode (zlib) content streams, a Type1 font resource,
  a correct xref table and trailer.
* :func:`extract_pdf_text` parses the file for real: startxref → xref
  table → trailer → catalog → /Pages → /Kids → /Contents (ref or
  array, /Length possibly indirect), inflates streams, tokenizes the
  content stream, and interprets the TEXT OPERATORS (BT/ET, Tf, Td/TD,
  Tm, T*, TL, Tj, ', ", TJ) while tracking the text-line matrix.

Layout parse, not just byte scraping: every shown string is recorded
with its device-space (x, y); a page's reading order is reconstructed by
sorting runs top-to-bottom then left-to-right and joining runs that
share a baseline.  A two-column page whose content stream emits the
right column FIRST still extracts left-column-first — the property the
driver query asserts.

All structures follow the public PDF 1.7 specification (ISO 32000-1):
object syntax §7.3, file structure §7.5, content streams §8.2, text
§9.4.
"""
from __future__ import annotations

import re
import zlib
from typing import Dict, List, Tuple

TextRun = Tuple[float, float, str]  # (x, y, text)


# --------------------------------------------------------------- writer

def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def encode_pdf(pages: List[List[TextRun]],
               page_size: Tuple[int, int] = (612, 792)) -> bytes:
    """Write pages of positioned text runs as a real PDF 1.4 file.
    Each run is placed with an absolute Td inside its own BT/ET block,
    in the order given (which need NOT be reading order — that's the
    extractor's job to recover)."""
    w, h = page_size
    objs: List[bytes] = []  # 1-indexed

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    content_ids = []
    for runs in pages:
        ops = [b"q"]
        for x, y, s in runs:
            ops.append(
                f"BT /F1 12 Tf {x:g} {y:g} Td ({_esc(s)}) Tj ET"
                .encode("latin-1", "replace"))
        ops.append(b"Q")
        raw = b"\n".join(ops)
        comp = zlib.compress(raw)
        content_ids.append(add(
            b"<< /Length " + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + comp
            + b"\nendstream"))
    # reserve ids: pages tree after contents, then page objects, catalog
    pages_id = len(objs) + 1 + len(pages)
    page_ids = []
    for cid in content_ids:
        page_ids.append(add(
            f"<< /Type /Page /Parent {pages_id} 0 R "
            f"/MediaBox [0 0 {w} {h}] "
            f"/Resources << /Font << /F1 {font} 0 R >> >> "
            f"/Contents {cid} 0 R >>".encode()))
    kids = " ".join(f"{p} 0 R" for p in page_ids)
    real_pages_id = add(
        f"<< /Type /Pages /Kids [{kids}] /Count {len(page_ids)} >>"
        .encode())
    assert real_pages_id == pages_id
    catalog = add(f"<< /Type /Catalog /Pages {pages_id} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
            + b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)


# --------------------------------------------------------------- parser

class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int) -> None:
        self.num = num


def _parse_string(data: bytes, pos: int) -> Tuple[str, int]:
    """Literal string after '(' — handles escapes and nested parens
    (PDF 1.7 §7.3.4.2)."""
    out = []
    depth = 1
    while depth:
        c = data[pos:pos + 1]
        pos += 1
        if not c:
            raise ValueError("unterminated string")
        if c == b"\\":
            e = data[pos:pos + 1]
            pos += 1
            mapped = {b"n": "\n", b"r": "\r", b"t": "\t", b"b": "\b",
                      b"f": "\f", b"(": "(", b")": ")", b"\\": "\\"}
            if e in mapped:
                out.append(mapped[e])
            elif e.isdigit():  # octal, up to 3 digits
                oct_s = e
                while len(oct_s) < 3 and data[pos:pos + 1].isdigit():
                    oct_s += data[pos:pos + 1]
                    pos += 1
                out.append(chr(int(oct_s, 8)))
            # else: lone backslash before other char — drop the backslash
        elif c == b"(":
            depth += 1
            out.append("(")
        elif c == b")":
            depth -= 1
            if depth:
                out.append(")")
        else:
            out.append(c.decode("latin-1"))
    return "".join(out), pos


def _parse_object(data: bytes, pos: int):
    """Parse one PDF object at pos; returns (value, new_pos)."""
    while pos < len(data) and data[pos:pos + 1] in b" \t\r\n":
        pos += 1
    if data.startswith(b"<<", pos):
        pos += 2
        d: Dict[str, object] = {}
        while True:
            while pos < len(data) and data[pos:pos + 1] in b" \t\r\n":
                pos += 1
            if data.startswith(b">>", pos):
                return d, pos + 2
            key, pos = _parse_object(data, pos)
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError("dict key must be a name")
            val, pos = _parse_object(data, pos)
            d[key] = val
    if data.startswith(b"[", pos):
        pos += 1
        arr: List[object] = []
        while True:
            while pos < len(data) and data[pos:pos + 1] in b" \t\r\n":
                pos += 1
            if data.startswith(b"]", pos):
                return arr, pos + 1
            v, pos = _parse_object(data, pos)
            arr.append(v)
    if data.startswith(b"(", pos):
        return _parse_string(data, pos + 1)
    if data.startswith(b"/", pos):
        m = re.match(rb"/[^\s/<>\[\]()]*", data[pos:])
        return m.group(0).decode("latin-1"), pos + m.end()
    m = re.match(rb"([-+]?[0-9]+)\s+([0-9]+)\s+R\b", data[pos:])
    if m:  # indirect reference
        return _Ref(int(m.group(1))), pos + m.end()
    m = re.match(rb"[-+]?[0-9]*\.?[0-9]+", data[pos:])
    if m:
        tok = m.group(0)
        return (float(tok) if b"." in tok else int(tok)), pos + m.end()
    for lit, val in ((b"true", True), (b"false", False), (b"null", None)):
        if data.startswith(lit, pos):
            return val, pos + len(lit)
    raise ValueError(f"cannot parse object at offset {pos}")


class _Pdf:
    def __init__(self, data: bytes) -> None:
        self.data = data
        m = re.search(rb"startxref\s+(\d+)\s+%%EOF", data[-256:])
        if not m:
            raise ValueError("missing startxref/%%EOF")
        xref_at = int(m.group(1))
        if not data.startswith(b"xref", xref_at):
            raise ValueError("xref streams not supported (classic table "
                             "expected)")
        self.offsets: Dict[int, int] = {}
        pos = xref_at + 4
        while True:
            m = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", self.data[pos:])
            if not m:
                break
            start, count = int(m.group(1)), int(m.group(2))
            pos += m.end()
            for i in range(count):
                entry = self.data[pos:pos + 20]
                if entry[17:18] == b"n":
                    self.offsets[start + i] = int(entry[:10])
                pos += 20
        t = self.data.find(b"trailer", pos)
        if t < 0:
            raise ValueError("missing trailer")
        self.trailer, _ = _parse_object(self.data, t + 7)

    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get_object(v.num)
        return v

    def get_object(self, num: int):
        off = self.offsets[num]
        m = re.match(rb"(\d+)\s+\d+\s+obj", self.data[off:])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"xref offset for obj {num} is wrong")
        val, pos = _parse_object(self.data, off + m.end())
        if isinstance(val, dict):
            m2 = re.match(rb"\s*stream\r?\n", self.data[pos:])
            if m2:
                length = self.resolve(val.get("/Length"))
                start = pos + m2.end()
                raw = self.data[start:start + int(length)]
                filt = self.resolve(val.get("/Filter"))
                # normalize: /Filter accepts a single name OR an array of
                # names (ISO 32000-1 7.3.8.2); one-element arrays are the
                # common equally-conforming generator variant
                filters = (filt if isinstance(filt, list)
                           else [] if filt is None else [filt])
                for f in filters:
                    if f == "/FlateDecode":
                        raw = zlib.decompress(raw)
                    else:
                        raise ValueError(f"unsupported filter {f}")
                val["__stream__"] = raw
        return val


def _interpret_text(content: bytes) -> List[TextRun]:
    """Interpret the content stream's text operators, tracking the text
    line matrix; returns (x, y, string) runs in stream order."""
    runs: List[TextRun] = []
    stack: List[object] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (Td/TD/Tm set it; T* returns to it)
    leading = 0.0
    pos = 0
    n = len(content)
    while pos < n:
        c = content[pos:pos + 1]
        if c in b" \t\r\n":
            pos += 1
            continue
        if c == b"(":
            s, pos = _parse_string(content, pos + 1)
            stack.append(s)
            continue
        if c == b"[":
            arr, pos = _parse_object(content, pos)
            stack.append(arr)
            continue
        if c == b"/":
            m = re.match(rb"/[^\s/<>\[\]()]*", content[pos:])
            stack.append(m.group(0).decode("latin-1"))
            pos += m.end()
            continue
        m = re.match(rb"[-+]?[0-9]*\.?[0-9]+", content[pos:])
        if m:
            stack.append(float(m.group(0)))
            pos += m.end()
            continue
        m = re.match(rb"[A-Za-z'\"*]+", content[pos:])
        if not m:
            raise ValueError(f"bad content token at {pos}")
        op = m.group(0)
        pos += m.end()
        if op == b"BT":
            x = y = lx = ly = 0.0
            stack.clear()
        elif op == b"Td":
            ty = stack.pop()
            tx = stack.pop()
            lx += tx
            ly += ty
            x, y = lx, ly
        elif op == b"TD":
            ty = stack.pop()
            tx = stack.pop()
            leading = -ty
            lx += tx
            ly += ty
            x, y = lx, ly
        elif op == b"Tm":
            f = stack.pop()
            e = stack.pop()
            stack.pop()
            stack.pop()
            stack.pop()
            stack.pop()
            lx, ly = e, f
            x, y = lx, ly
        elif op == b"T*":
            ly -= leading
            x, y = lx, ly
        elif op == b"TL":
            leading = stack.pop()
        elif op == b"Tj":
            runs.append((x, y, stack.pop()))
        elif op == b"'":
            ly -= leading
            x, y = lx, ly
            runs.append((x, y, stack.pop()))
        elif op == b'"':
            s = stack.pop()
            stack.pop()
            stack.pop()
            ly -= leading
            x, y = lx, ly
            runs.append((x, y, s))
        elif op == b"TJ":
            arr = stack.pop()
            runs.append((x, y, "".join(v for v in arr
                                       if isinstance(v, str))))
        else:
            stack.clear()  # q/Q/Tf/ET/other operators: no text effect
    return runs


def _reading_order(runs: List[TextRun]) -> str:
    """Layout reconstruction: top-to-bottom lines, left-to-right within
    a line (runs within 0.5pt of the same baseline share a line, joined
    by a single space); lines joined by newlines."""
    lines: Dict[float, List[Tuple[float, str]]] = {}
    for rx, ry, s in runs:
        key = round(ry * 2) / 2
        lines.setdefault(key, []).append((rx, s))
    out = []
    for ry in sorted(lines, reverse=True):
        # sort by x only (stable): successive shows at the same pen
        # position keep stream order — the interpreter has no font
        # metrics, so it cannot advance x by glyph widths
        out.append(" ".join(
            s for _rx, s in sorted(lines[ry], key=lambda r: r[0])))
    return "\n".join(out)


def extract_pdf_text(data: bytes) -> List[str]:
    """Parse a PDF and return one reading-ordered text string per page."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    pdf = _Pdf(data)
    root = pdf.resolve(pdf.trailer["/Root"])
    pages_node = pdf.resolve(root["/Pages"])
    out: List[str] = []

    def walk(node) -> None:
        node = pdf.resolve(node)
        if node.get("/Type") == "/Pages":
            for kid in node["/Kids"]:
                walk(kid)
            return
        contents = pdf.resolve(node["/Contents"])
        if isinstance(contents, list):
            raw = b"\n".join(pdf.resolve(c)["__stream__"]
                             for c in contents)
        else:
            raw = contents["__stream__"]
        out.append(_reading_order(_interpret_text(raw)))

    walk(pages_node)
    return out
