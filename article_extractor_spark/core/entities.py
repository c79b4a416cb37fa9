"""HTML entity decoding matching libxml2's HTML parser behaviour.

libxml2 (the parser the reference engine binds, `/root/reference/
Cargo.toml:16`) decodes the HTML 4.0 named entity set plus numeric
character references.  Unknown names and un-terminated references are
left literal in the text (recovery behaviour).  This differs from HTML5
(no ``&ampnosemi`` style semicolon-less named references).
"""

from __future__ import annotations

import html.entities
import re

# XHTML 1.0 entity set == HTML 4.0 set (+ apos/quot which libxml2 also has).
_ENTITY_MAP = dict(html.entities.entitydefs)

_REF_RE = re.compile(
    r"&(?:#[xX]([0-9a-fA-F]+);?|#([0-9]+);?|([a-zA-Z][a-zA-Z0-9]*);)"
)


def _sub(m: re.Match) -> str:
    hexd, dec, name = m.group(1), m.group(2), m.group(3)
    if name is not None:
        val = _ENTITY_MAP.get(name)
        return val if val is not None else m.group(0)
    try:
        cp = int(hexd, 16) if hexd is not None else int(dec)
    except ValueError:
        return m.group(0)
    if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return ""
    return chr(cp)


def decode_entities_html(s: str, attr: bool = False) -> str:
    if "&" not in s:
        return s
    return _REF_RE.sub(_sub, s)


class EntityDecodeError(ValueError):
    pass


_STRICT_REF_RE = re.compile(
    r"&(?:#[xX]([0-9a-fA-F]+)|#([0-9]+)|([a-zA-Z][a-zA-Z0-9]*));"
)


def decode_html_strict(s: str) -> str:
    """Whole-string decode mirroring the `escaper` crate's ``decode_html``
    used for title/author post-processing (`/root/reference/src/
    full_text_parser/metadata.rs:14-47`): any '&' that does not begin a
    valid, ';'-terminated, known entity raises; callers keep the original
    string in that case."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        m = _STRICT_REF_RE.match(s, i)
        if m is None:
            raise EntityDecodeError(f"invalid entity at {i}")
        hexd, dec, name = m.group(1), m.group(2), m.group(3)
        if name is not None:
            val = _ENTITY_MAP.get(name)
            if val is None:
                raise EntityDecodeError(f"unknown entity &{name};")
            out.append(val)
        else:
            cp = int(hexd, 16) if hexd is not None else int(dec)
            if cp == 0 or cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                raise EntityDecodeError(f"invalid codepoint {cp}")
            out.append(chr(cp))
        i = m.end()
    return "".join(out)
