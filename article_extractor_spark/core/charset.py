"""HTML charset sniffing + decoding (WHATWG encoding-standard shaped).

The extraction core parses ``str`` HTML; real Common-Crawl payloads are
BYTES in whatever encoding 2009 left behind.  This module is the
missing first step for raw-byte pages: detect the encoding the way
browsers do — BOM, then the transport-layer charset (Content-Type),
then a bounded ``<meta>`` prescan, then the WHATWG legacy default —
and decode with replacement, never raising on dirty bytes.

Precedence and the prescan window (first 1024 bytes) follow the WHATWG
encoding standard; label normalization implements the standard's most
consequential rule — ``latin1``/``iso-8859-1``/``ascii`` and friends
are ALIASES OF windows-1252 on the web — over the label subset that
covers real crawl distributions (the long tail falls back cleanly).
Python's codec registry does the decoding itself (all listed encodings
are stdlib).

Spark integration: ``decode_html_bytes`` is an Arrow-batched
mapInPandas over a binary column, emitting (text, encoding) — the
bytes->str bridge in front of ``operators/extract.py``; wiring into
the registered extraction queries is deferred to the next verification
window (those closures are frozen this round, NOTES.md).

Reference context: the reference crate takes ``&str`` input and leaves
transport decoding to its HTTP layer (/root/reference/src/lib.rs); a
batch engine over archived bytes must own this step itself.
"""

from __future__ import annotations

import codecs
import re

WHATWG_DEFAULT = "windows-1252"
PRESCAN_BYTES = 1024

# WHATWG label -> Python codec, the high-traffic subset.  Everything
# here is a stdlib codec; lookups are case-insensitive with ASCII
# whitespace trimmed (the standard's label matching).
_LABELS = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "latin1": "windows-1252", "latin-1": "windows-1252",
    "iso-8859-1": "windows-1252", "iso8859-1": "windows-1252",
    "l1": "windows-1252", "ascii": "windows-1252",
    "us-ascii": "windows-1252", "ansi_x3.4-1968": "windows-1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "cp1251": "cp1251", "windows-1254": "cp1254",
    "windows-1256": "cp1256", "windows-874": "cp874",
    "koi8-r": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "ms932": "cp932", "windows-31j": "cp932",
    "euc-jp": "euc_jp", "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk",
    "gb18030": "gb18030", "big5": "big5", "big5-hkscs": "big5hkscs",
    "euc-kr": "euc_kr", "ks_c_5601-1987": "euc_kr",
    "utf-16": "utf-16", "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be", "tis-620": "cp874",
    "macintosh": "mac_roman", "x-mac-roman": "mac_roman",
}

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""",
    re.IGNORECASE)
_HEADER_CHARSET_RE = re.compile(
    r"""charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""", re.IGNORECASE)


def normalize_label(label: str | None) -> str | None:
    """WHATWG label -> Python codec name; None for unknown labels."""
    if not label:
        return None
    key = label.strip(" \t\n\r\f").lower()
    enc = _LABELS.get(key)
    if enc is not None:
        return enc
    # unknown label: accept it only if it is a sane codec token Python
    # knows AND not a rotate/transform codec (never sniff those);
    # codecs.lookup raises ValueError (not LookupError) on null bytes
    if not re.fullmatch(r"[a-z0-9._:\-]+", key):
        return None
    try:
        info = codecs.lookup(key)
    except (LookupError, ValueError):
        return None
    return info.name if info.name not in ("rot-13", "base64", "hex",
                                          "zlib", "bz2", "uu") else None


def sniff_charset(data: bytes, content_type: str | None = None) -> str:
    """Detect a page's encoding: BOM > Content-Type charset > <meta>
    prescan (first 1024 bytes) > windows-1252.  Always returns a
    usable Python codec name."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if data[:2] == b"\xff\xfe":
        return "utf-16-le"
    if data[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _HEADER_CHARSET_RE.search(content_type)
        if m:
            enc = normalize_label(m.group(1))
            if enc:
                return enc
    m = _META_CHARSET_RE.search(data[:PRESCAN_BYTES])
    if m:
        enc = normalize_label(m.group(1).decode("ascii", "replace"))
        if enc:
            # the standard: utf-16 in meta is a lie (the prescan read
            # ASCII bytes to find it) — treat as utf-8
            return "utf-8" if enc.startswith("utf-16") else enc
    return WHATWG_DEFAULT


def decode_html(data: bytes,
                content_type: str | None = None) -> tuple[str, str]:
    """(text, encoding): sniff then decode with replacement — dirty
    bytes never raise.  BOMs are stripped from the decoded text."""
    enc = sniff_charset(data, content_type)
    if enc == "utf-8" and data[:3] == b"\xef\xbb\xbf":
        data = data[3:]
    elif enc in ("utf-16-le", "utf-16-be"):
        data = data[2:]
    return data.decode(enc, "replace"), enc


def decode_html_bytes(df, body_col: str = "body",
                      content_type_col: str | None = None,
                      out_col: str = "html"):
    """Spark bridge: binary pages -> (…, html string, encoding string)
    via one Arrow-batched mapInPandas.  ``content_type_col`` optionally
    names a header column consulted between BOM and meta."""
    import pandas as pd

    keep = [f.name for f in df.schema.fields if f.name != body_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields if f.name != body_col)
    schema += f", {out_col} string, encoding string"

    def fn(batches):
        for pdf in batches:
            out = pdf[keep].copy()
            cts = (pdf[content_type_col] if content_type_col
                   else [None] * len(pdf))
            texts, encs = [], []
            for raw, ct in zip(pdf[body_col], cts):
                b = bytes(raw) if raw is not None else b""
                t, e = decode_html(b, ct)
                texts.append(t)
                encs.append(e)
            out[out_col] = pd.Series(texts, dtype="object")
            out["encoding"] = pd.Series(encs, dtype="object")
            yield out

    return df.mapInPandas(fn, schema)
