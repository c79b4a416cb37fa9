"""Minimal DOM with libxml2-compatible HTML recovery parsing and XML-style
serialization.

This is a from-scratch, pure-Python stand-in for the libxml2 C library that
the reference engine uses (reference: ``/root/reference/src/full_text_parser/
mod.rs:164-211`` parses with ``HTML_PARSE_RECOVER | HTML_PARSE_NOERROR`` and
serializes nodes with ``node_to_string`` = libxml2 ``xmlNodeDump``,
``/root/reference/src/util.rs:18-20``).  The goal is byte-compatible
behaviour for the extraction pipeline:

* element/attribute names lowercased at parse time, case-preserving after
  explicit ``set_name`` (goldens contain ``<DIV>`` from renames),
* implied ``html``/``head``/``body`` elements,
* HTML4-era auto-close rules (libxml2 predates the HTML5 tree builder:
  unknown elements like ``section``/``video`` never auto-close ``p``),
* ``/>`` honoured as self-closing only for tags outside the HTML4 table,
* XML-style serialization: ``<x/>`` for empty elements, ``&amp; &lt; &gt;``
  escaped in text, ``&quot;`` additionally in attributes, no added
  whitespace.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional

from .entities import decode_entities_html

ELEMENT_NODE = 1
TEXT_NODE = 3
CDATA_NODE = 4  # script/style raw content (libxml2 CDATA sections)
PI_NODE = 7
COMMENT_NODE = 8

# Structural-mutation version counter (module-global, monotonically
# increasing).  Every operation that can change WHICH elements exist,
# their tag names, or their document order bumps it; per-Document tag
# indexes (xpath fast scans) cache against it and rebuild when stale.
# Attribute/text edits deliberately do NOT bump — they cannot change a
# {tag -> ordered element list} mapping, so attribute-heavy passes (URL
# repair, attribute strips) keep their index hits.  A global (rather
# than per-document) counter is conservative — mutating any document
# invalidates all cached indexes — but makes missed-invalidation
# impossible for unattached subtrees that get spliced in later.
_MUTVER = 0


class Node:
    __slots__ = ("type", "name", "attrs", "children", "parent", "text", "doc",
                 "_idx", "_tc")

    def __init__(self, type_: int, name: str = "", text: str = "", doc=None):
        self.type = type_
        self.name = name
        self.attrs: dict[str, str | None] = {}
        self.children: List[Node] = []
        self.parent: Optional[Node] = None
        self.text = text
        self.doc = doc
        self._idx = 0  # cached sibling index hint (validated before use)

    # ---- constructors -------------------------------------------------
    @staticmethod
    def new_element(name: str, doc=None) -> "Node":
        return Node(ELEMENT_NODE, name=name, doc=doc)

    @staticmethod
    def new_text(content: str, doc=None) -> "Node":
        return Node(TEXT_NODE, name="text", text=content, doc=doc)

    # ---- identity -----------------------------------------------------
    def __repr__(self):  # pragma: no cover - debug aid
        if self.type == ELEMENT_NODE:
            return f"<Node {self.name} attrs={self.attrs}>"
        return f"<Node #{self.name} {self.text[:30]!r}>"

    # ---- basic accessors (mirroring rust-libxml Node API) -------------
    def get_name(self) -> str:
        return self.name

    def set_name(self, name: str) -> None:
        global _MUTVER
        self.name = name
        # bump AFTER the mutation: a reader building a cache between the
        # bump and the change would otherwise pin a stale snapshot under
        # the new version (same ordering in every mutation method below)
        _MUTVER += 1

    def is_element(self) -> bool:
        return self.type == ELEMENT_NODE

    def is_text(self) -> bool:
        return self.type == TEXT_NODE

    def get_type(self) -> int:
        return self.type

    def get_content(self) -> str:
        """xmlNodeGetContent: concatenated descendant text (CDATA incl)."""
        if self.type in (TEXT_NODE, CDATA_NODE, COMMENT_NODE, PI_NODE):
            return self.text
        ch = self.children
        # hot-path shortcuts: leaf element / single-text-child element
        if not ch:
            return ""
        if len(ch) == 1:
            c0 = ch[0]
            if c0.type == TEXT_NODE or c0.type == CDATA_NODE:
                return c0.text
        # multi-child subtree walk: memoized against the structural-
        # mutation counter (text edits go through set_content, which
        # bumps it too) — scoring passes re-read the same containers'
        # text many times between mutations
        ver = _MUTVER
        tc = getattr(self, "_tc", None)
        if tc is not None and tc[0] == ver:
            return tc[1]
        parts: List[str] = []
        stack = ch[::-1]
        while stack:
            n = stack.pop()
            t = n.type
            if t == TEXT_NODE or t == CDATA_NODE:
                parts.append(n.text)
            elif t == ELEMENT_NODE and n.children:
                stack.extend(n.children[::-1])
        res = "".join(parts)
        self._tc = (ver, res)
        return res

    def set_content(self, content: str) -> None:
        global _MUTVER
        if self.type == TEXT_NODE:
            self.text = content
            _MUTVER += 1  # text change invalidates get_content memos
            return
        self.children = []
        t = Node.new_text(content, self.doc)
        self.add_child(t)  # bumps _MUTVER after the structural change

    # ---- attributes ----------------------------------------------------
    def get_attribute(self, name: str) -> Optional[str]:
        if name in self.attrs:
            v = self.attrs[name]
            return "" if v is None else v
        return None

    get_property = get_attribute

    def has_attribute(self, name: str) -> bool:
        return name in self.attrs

    def set_attribute(self, name: str, value: str) -> None:
        self.attrs[name] = value

    set_property = set_attribute

    def remove_attribute(self, name: str) -> None:
        self.attrs.pop(name, None)

    remove_property = remove_attribute

    def get_attributes(self) -> list[tuple[str, str]]:
        return [(k, "" if v is None else v) for k, v in self.attrs.items()]

    def get_class_names(self) -> list[str]:
        cls = self.get_attribute("class")
        if cls is None:
            return []
        return [c for c in cls.split() if c]

    # ---- tree structure -------------------------------------------------
    def get_parent(self) -> Optional["Node"]:
        return self.parent

    def get_child_nodes(self) -> List["Node"]:
        return list(self.children)

    def get_child_elements(self) -> List["Node"]:
        return [c for c in self.children if c.type == ELEMENT_NODE]

    def get_first_child(self) -> Optional["Node"]:
        return self.children[0] if self.children else None

    def get_last_child(self) -> Optional["Node"]:
        return self.children[-1] if self.children else None

    def get_first_element_child(self) -> Optional["Node"]:
        for c in self.children:
            if c.type == ELEMENT_NODE:
                return c
        return None

    def _sibling_index(self) -> int:
        # Cached-hint lookup: the stored index is exact unless earlier
        # siblings were inserted/removed since it was set, in which case it
        # is off by a small shift — probe a window around the hint before
        # falling back to a linear scan.  Sequential DFS walks (the
        # readability prune pass calls next_sibling per node) would be
        # O(siblings) per step with a plain list.index.
        assert self.parent is not None
        ch = self.parent.children
        n = len(ch)
        i = self._idx
        if 0 <= i < n and ch[i] is self:
            return i
        lo = i - 2 if i >= 2 else 0
        hi = i + 3 if i + 3 < n else n
        for j in range(lo, hi):
            if ch[j] is self:
                self._idx = j
                return j
        j = ch.index(self)  # ValueError if absent (same as before)
        self._idx = j
        return j

    def get_next_sibling(self) -> Optional["Node"]:
        if self.parent is None:
            return None
        i = self._sibling_index()
        sibs = self.parent.children
        return sibs[i + 1] if i + 1 < len(sibs) else None

    def get_prev_sibling(self) -> Optional["Node"]:
        if self.parent is None:
            return None
        i = self._sibling_index()
        return self.parent.children[i - 1] if i > 0 else None

    def get_next_element_sibling(self) -> Optional["Node"]:
        n = self.get_next_sibling()
        while n is not None and n.type != ELEMENT_NODE:
            n = n.get_next_sibling()
        return n

    def get_prev_element_sibling(self) -> Optional["Node"]:
        n = self.get_prev_sibling()
        while n is not None and n.type != ELEMENT_NODE:
            n = n.get_prev_sibling()
        return n

    # ---- mutation --------------------------------------------------------
    def unlink(self) -> None:
        global _MUTVER
        if self.parent is not None:
            try:
                i = self._sibling_index()
                del self.parent.children[i]
            except ValueError:
                pass
            self.parent = None
        _MUTVER += 1

    def add_child(self, child: "Node") -> None:
        global _MUTVER
        child.unlink()
        child.parent = self
        child._idx = len(self.children)
        self.children.append(child)
        _MUTVER += 1

    def new_child(self, _ns, name: str) -> "Node":
        n = Node.new_element(name, self.doc)
        self.add_child(n)
        return n

    def add_text_child(self, _ns, name: str, content: str) -> "Node":
        """xmlNewTextChild: creates a child *element* ``name`` whose content
        is ``content`` (the reference's prevent_self_closing_tags therefore
        inserts literal ``<empty></empty>`` elements, visible in goldens)."""
        el = Node.new_element(name, self.doc)
        t = Node.new_text(content, self.doc)
        t.parent = el
        el.children.append(t)
        self.add_child(el)
        return el

    def insert_before(self, new: "Node", ref: "Node") -> None:
        global _MUTVER
        new.unlink()
        i = ref._sibling_index()
        new.parent = self
        new._idx = i
        self.children.insert(i, new)
        _MUTVER += 1

    def replace_child_node(self, new: "Node", old: "Node") -> "Node":
        """Replace ``old`` (a child of self) with ``new``; returns old."""
        global _MUTVER
        i = old._sibling_index()
        if old.parent is not self:
            raise ValueError("old is not a child of self")
        new.unlink()
        new.parent = self
        new._idx = i
        self.children[i] = new
        old.parent = None
        _MUTVER += 1
        return old

    # ---- traversal helpers -----------------------------------------------
    def iter_descendants(self) -> Iterator["Node"]:
        stack = self.children[::-1]
        while stack:
            n = stack.pop()
            yield n
            if n.type == ELEMENT_NODE:
                stack.extend(n.children[::-1])

    def ancestors(self) -> Iterator["Node"]:
        n = self.parent
        while n is not None:
            yield n
            n = n.parent


class Document:
    """A document owning a single root element (like xmlDoc)."""

    def __init__(self):
        self.root: Optional[Node] = None
        self._tag_index = None  # (mutver snapshot, {name|None: [elements]})

    def get_root_element(self) -> Optional[Node]:
        return self.root

    def set_root_element(self, node: Node) -> None:
        global _MUTVER
        self.root = node
        _MUTVER += 1

    def dup(self) -> "Document":
        d = Document()
        if self.root is not None:
            d.root = _deep_copy(self.root, d)
        return d

    def new_element(self, name: str) -> Node:
        return Node.new_element(name, self)

    def new_text(self, content: str) -> Node:
        return Node.new_text(content, self)


def _deep_copy(node: Node, doc) -> Node:
    n = Node(node.type, name=node.name, text=node.text, doc=doc)
    n.attrs = dict(node.attrs)
    for i, c in enumerate(node.children):
        cc = _deep_copy(c, doc)
        cc.parent = n
        cc._idx = i
        n.children.append(cc)
    return n


# ---------------------------------------------------------------------------
# HTML parsing (libxml2 HTML recovery parser behaviour)
# ---------------------------------------------------------------------------

# HTML4 void elements (libxml2 html40ElementTable EMPTY entries + embed).
VOID_ELEMENTS = frozenset(
    """area base basefont br col frame hr img input isindex link meta param
    embed""".split()
)

# Elements whose raw content is CDATA until the matching close tag.
CDATA_ELEMENTS = frozenset(("script", "style"))

# Tags that imply creation of <head> at top level (libxml2
# htmlCheckImplied; isindex/noscript/object go straight to <body> —
# verified empirically against libxml2 via tests/libxml2_oracle.py).
HEAD_CREATING_TAGS = frozenset(("title", "base", "link", "meta", "script", "style"))
HEAD_OK_TAGS = HEAD_CREATING_TAGS  # alias

# Known tags that do NOT break out of an explicitly-open <head>
# (every other KNOWN tag implies <body>; unknown tags always stay).
# Derived empirically from libxml2.
HEAD_STAY_TAGS = frozenset(
    """title base link meta script style noscript object isindex basefont
    input embed frame noframes area param col colgroup button select
    textarea applet caption legend optgroup option del ins label tbody td
    tfoot th thead tr""".split()
)

# libxml2 htmlStartClose matrix, derived EMPIRICALLY from the installed
# libxml2 (probe per pair: does <old>...<new> auto-close <old>?).
# Stored OLD -> closers, inverted below into NEW -> set(OLD); the builder
# pops repeatedly while the innermost open element is closable.
_OLD_TO_CLOSERS = {
    "a": ["a", "fieldset", "table", "td", "th"],
    "address": ["dd", "dl", "dt", "form", "li", "ul"],
    "b": ["center", "p", "td", "th"],
    "big": ["p"],
    "caption": ["tbody", "tfoot", "thead", "tr"],
    "dd": ["dt"],
    "dir": ["dd", "dl", "dt", "form", "ul"],
    "dl": ["form", "li"],
    "dt": ["dd", "dl"],
    "font": ["center", "td", "th"],
    "form": ["form"],
    "h1": ["fieldset", "form", "li", "p", "table"],
    "h2": ["fieldset", "form", "li", "p", "table"],
    "h3": ["fieldset", "form", "li", "p", "table"],
    "h4": ["fieldset", "form", "li", "p", "table"],
    "h5": ["fieldset", "form", "li", "p", "table"],
    "h6": ["fieldset", "form", "li", "p", "table"],
    "i": ["center", "p", "td", "th"],
    "legend": ["fieldset"],
    "li": ["li"],
    "listing": ["dd", "dl", "dt", "fieldset", "form", "li", "table", "ul"],
    "menu": ["dd", "dl", "dt", "form", "ul"],
    "ol": ["form", "ul"],
    "option": ["optgroup", "option"],
    "p": ["address", "blockquote", "caption", "center", "dd", "dir", "div",
          "dl", "dt", "fieldset", "form", "h1", "h2", "h3", "h4", "h5",
          "h6", "hr", "li", "listing", "menu", "ol", "p", "pre", "table",
          "tbody", "td", "tfoot", "th", "tr", "ul", "xmp"],
    "pre": ["dd", "dl", "dt", "fieldset", "form", "li", "table", "ul"],
    "s": ["p"],
    "small": ["p"],
    "span": ["td", "th"],
    "strike": ["p"],
    "tbody": ["tbody", "tfoot"],
    "td": ["tbody", "td", "tfoot", "th", "tr"],
    "tfoot": ["tbody"],
    "th": ["tbody", "td", "tfoot", "th", "tr"],
    "thead": ["tbody", "tfoot"],
    "tr": ["tbody", "tfoot", "tr"],
    "tt": ["p"],
    "u": ["p", "td", "th"],
    "ul": ["address", "form", "menu", "ol", "pre"],
    "xmp": ["dd", "dl", "dt", "fieldset", "form", "li", "table", "ul"],
}

START_CLOSE: dict[str, frozenset] = {}
for _old, _closers in _OLD_TO_CLOSERS.items():
    for _new in _closers:
        START_CLOSE.setdefault(_new, set()).add(_old)
START_CLOSE = {k: frozenset(v) for k, v in START_CLOSE.items()}

# Known HTML4 tags (libxml2 html40ElementTable): for *unknown* tags only,
# libxml2 honours XML-style "/>" self-closing.
KNOWN_TAGS = frozenset(
    """a abbr acronym address applet area b base basefont bdo big blockquote
    body br button caption center cite code col colgroup dd del dfn dir div
    dl dt em embed fieldset font form frame frameset h1 h2 h3 h4 h5 h6 head
    hr html i iframe img input ins isindex kbd label legend li link listing
    map menu meta noembed noframes noscript object ol optgroup option p
    param pre q s samp script select small span strike strong style sub sup
    table tbody td textarea tfoot th thead title tr tt u ul var xmp""".split()
)

# libxml2 htmlParseHTMLName: start = letter/_/:, continue = alnum/:/-/_/.
_TAG_NAME_RE = re.compile(
    r"(?:[A-Za-z_:]|[^\x00-\x7f])(?:[A-Za-z0-9:._\-]|[^\x00-\x7f])*"
)
_ATTR_NAME_RE = _TAG_NAME_RE
_WS_RE = re.compile(r"[ \t\n\r\f]+")
_CDATA_END_RE = re.compile(r"</[A-Za-z]")

# libxml2 htmlEndPriority: all other elements have priority 100
_END_PRIORITY = {
    "div": 150, "td": 160, "table": 170, "head": 180, "body": 190, "html": 200,
}


class _Tokenizer:
    """Hand-rolled tokenizer mirroring libxml2's HTML tokenizer closely
    enough for the recovery cases the fixtures exercise."""

    def __init__(self, data: str):
        self.data = data
        self.pos = 0
        self.n = len(data)
        # When set (by the tree builder), the next content is script/style
        # CDATA: emitted raw up to the next "</letter" (libxml2 semantics —
        # CDATA resumes after an end tag that failed to close the element).
        self.cdata_tag: str | None = None

    def tokens(self):
        data, n = self.data, self.n
        pos = self.pos
        while pos < n:
            if self.cdata_tag is not None:
                # script/style raw content.  libxml2 >= 2.10 (the version
                # family that generated the reference goldens) ends CDATA
                # only at the MATCHING close tag; older 2.9 ended at any
                # "</letter" — we follow the goldens.
                name = self.cdata_tag
                self.cdata_tag = None
                mm = re.compile(
                    r"</%s\s*>" % re.escape(name), re.IGNORECASE
                ).search(data, pos)
                if mm is None:
                    if pos < n:
                        yield ("rawtext", name, data[pos:])
                    yield ("end", name)
                    return
                if mm.start() > pos:
                    yield ("rawtext", name, data[pos : mm.start()])
                yield ("end", name)
                pos = mm.end()
                continue
            lt = data.find("<", pos)
            if lt < 0:
                yield ("text", data[pos:])
                return
            if lt > pos:
                yield ("text", data[pos:lt])
            pos = lt
            if pos + 1 >= n:
                yield ("text", data[pos:])
                return
            c = data[pos + 1]
            if c == "!":
                if data.startswith("<!--", pos):
                    end = data.find("-->", pos + 4)
                    if end < 0:
                        yield ("comment", data[pos + 4 :])
                        return
                    yield ("comment", data[pos + 4 : end])
                    pos = end + 3
                elif data[pos + 2 : pos + 9].lower() == "doctype":
                    end = data.find(">", pos)
                    if end < 0:
                        return
                    yield ("doctype", data[pos + 2 : end])
                    pos = end + 1
                else:
                    # bogus comment: skip to '>'
                    end = data.find(">", pos)
                    if end < 0:
                        return
                    pos = end + 1
            elif c == "?":
                end = data.find(">", pos)
                if end < 0:
                    return
                pos = end + 1
            elif c == "/":
                m = _TAG_NAME_RE.match(data, pos + 2)
                if m is None:
                    # '</' with junk: libxml2 skips to '>'
                    end = data.find(">", pos)
                    if end < 0:
                        return
                    pos = end + 1
                    continue
                name = m.group(0).lower()
                if ":" in name[1:]:
                    # HTML has no namespaces: element QName prefixes are
                    # discarded (libxml2 xmlSplitQName); attrs keep theirs
                    name = name[1:].split(":", 1)[1] if name[0] == ":" else name.split(":", 1)[1]
                end = data.find(">", m.end())
                if end < 0:
                    return
                yield ("end", name)
                pos = end + 1
            else:
                m = _TAG_NAME_RE.match(data, pos + 1)
                if m is None:
                    # stray '<' is literal text
                    yield ("text", "<")
                    pos += 1
                    continue
                name = m.group(0).lower()
                if ":" in name[1:]:
                    name = name.split(":", 1)[1] if name[0] != ":" else name
                attrs, newpos, self_close = self._parse_attrs(m.end())
                yield ("start", name, attrs, self_close)
                pos = newpos
                if name in CDATA_ELEMENTS:  # "/>"-ignored: script is a known tag
                    # libxml2 htmlParseScript: raw text ends at ANY "</"
                    # followed by a letter (not just the matching close
                    # tag) — scripts containing "</div>" strings terminate
                    # there and the rest is parsed as markup.  The builder
                    # re-arms cdata_tag if the end tag didn't close us.
                    self.cdata_tag = name
        return

    def _parse_attrs(self, pos: int):
        data, n = self.data, self.n
        attrs: list[tuple[str, str | None]] = []
        self_close = False
        while pos < n:
            while pos < n and data[pos] in " \t\n\r\f":
                pos += 1
            if pos >= n:
                break
            ch = data[pos]
            if ch == ">":
                pos += 1
                return attrs, pos, self_close
            if ch == "/":
                if pos + 1 < n and data[pos + 1] == ">":
                    self_close = True
                    pos += 2
                    return attrs, pos, self_close
                pos += 1
                continue
            if ch == "<":
                # libxml2: '<' in attr area ends the tag (recover)
                return attrs, pos, self_close
            m = _ATTR_NAME_RE.match(data, pos)
            if m is None:
                # libxml2: bogus attribute — dump up to the next blank or
                # tag end, NOT honouring quotes (so quoted values with
                # spaces shed trailing garbage too)
                while pos < n and data[pos] not in " \t\n\r\f>" and not (
                    data[pos] == "/" and pos + 1 < n and data[pos + 1] == ">"
                ):
                    pos += 1
                continue
            aname = m.group(0).lower()
            pos = m.end()
            while pos < n and data[pos] in " \t\n\r\f":
                pos += 1
            value: str | None = None
            if pos < n and data[pos] == "=":
                pos += 1
                while pos < n and data[pos] in " \t\n\r\f":
                    pos += 1
                if pos < n and data[pos] in "\"'":
                    q = data[pos]
                    end = data.find(q, pos + 1)
                    if end < 0:
                        value = data[pos + 1 :]
                        pos = n
                    else:
                        value = data[pos + 1 : end]
                        pos = end + 1
                else:
                    start = pos
                    while pos < n and data[pos] not in " \t\n\r\f>":
                        pos += 1
                    value = data[start:pos]
                value = decode_entities_html(value, attr=True)
                # libxml2 normalizes newlines/tabs in attribute values to
                # spaces? (attribute-value normalization applies to CDATA
                # attrs only for XML; HTML parser keeps them) -> keep as-is.
            attrs.append((aname, value))
        return attrs, pos, self_close


def parse_html(html: str) -> Document:
    """Parse HTML with libxml2-style recovery into a Document."""
    if html.startswith("﻿"):
        # UTF-8 BOM is consumed by encoding detection, never content
        html = html[1:]
    doc = Document()
    tok = _Tokenizer(html)

    html_el: Optional[Node] = None
    head_el: Optional[Node] = None
    body_el: Optional[Node] = None
    # open element stack; stack[0] is <html> once created
    stack: List[Node] = []

    def ensure_html() -> Node:
        nonlocal html_el
        if html_el is None:
            html_el = Node.new_element("html", doc)
            doc.set_root_element(html_el)
            stack.append(html_el)
        return html_el

    def ensure_head() -> Node:
        nonlocal head_el
        ensure_html()
        if head_el is None and body_el is None:
            head_el = Node.new_element("head", doc)
            html_el.add_child(head_el)
        return head_el

    def ensure_body() -> Node:
        nonlocal body_el
        ensure_html()
        if body_el is None:
            # close head if open
            while len(stack) > 1:
                stack.pop()
            b = Node.new_element("body", doc)
            html_el.add_child(b)
            body_el = b
            if stack and stack[-1] is html_el:
                stack.append(b)
        return body_el

    def cur() -> Optional[Node]:
        return stack[-1] if stack else None

    def in_head() -> bool:
        for nd in reversed(stack):
            if nd is head_el:
                return True
            if nd is body_el:
                return False
        return False

    def auto_close(name: str) -> None:
        closes = START_CLOSE.get(name)
        if not closes:
            return
        while len(stack) > 1:
            top = stack[-1]
            if top.name in closes and top is not body_el and top is not html_el:
                stack.pop()
            else:
                break

    def append_node(n: Node) -> None:
        c = cur()
        if c is None:
            ensure_html()
            c = cur()
        c.add_child(n)

    for t in tok.tokens():
        kind = t[0]
        if kind == "text":
            raw = t[1]
            text = decode_entities_html(raw)
            if not text:
                continue
            c = cur()
            if text.strip() == "":
                # areBlanks(): whitespace-only text dropped only at
                # document level (verified against libxml2: blanks under
                # html/head are kept).
                if c is None:
                    continue
                append_node(Node.new_text(text, doc))
                continue
            # htmlCheckParagraph: non-blank text at document/html/head
            # level gets an implied <p> wrapper; if body was already
            # closed, the <p> lands under <html> (no body re-entry).
            if c is None or c is html_el or (head_el is not None and c is head_el):
                if c is head_el:
                    while len(stack) > 1:
                        stack.pop()
                if body_el is None:
                    ensure_body()
                p_el = Node.new_element("p", doc)
                cur().add_child(p_el)
                stack.append(p_el)
            append_node(Node.new_text(text, doc))
        elif kind == "comment":
            # comments allowed anywhere; before html -> attached under root?
            # libxml2 keeps pre-root comments at doc level; we attach them
            # under <html> only if it exists, else drop (not observable in
            # the extraction output).
            if cur() is None:
                continue
            append_node(Node(COMMENT_NODE, name="comment", text=t[1], doc=doc))
        elif kind == "doctype":
            continue
        elif kind == "rawtext":
            _name, content = t[1], t[2]
            if content:
                # libxml2 stores script/style content as CDATA sections
                append_node(Node(CDATA_NODE, name="cdata-section",
                                 text=content, doc=doc))
        elif kind == "start":
            name, attrlist, self_close = t[1], t[2], t[3]
            if name == "html":
                el = ensure_html()
                for k, v in attrlist:
                    if k not in el.attrs:
                        el.attrs[k] = v
                continue
            if name == "head":
                el = ensure_head()
                if el is not None:
                    for k, v in attrlist:
                        if k not in el.attrs:
                            el.attrs[k] = v
                    if el not in stack:
                        stack.append(el)
                continue
            if name == "body":
                ensure_html()
                el = ensure_body()
                # explicit <body> closes anything open above it (implied
                # <p> from stray text, open head, ...)
                while stack and stack[-1] is not el and stack[-1] is not html_el:
                    stack.pop()
                for k, v in attrlist:
                    if k not in el.attrs:
                        el.attrs[k] = v
                continue
            ensure_html()
            if body_el is None:
                if in_head():
                    # inside an open head: only specific KNOWN tags break
                    # out to <body>; unknown tags stay (verified vs libxml2)
                    if name in KNOWN_TAGS and name not in HEAD_STAY_TAGS:
                        ensure_body()
                elif head_el is not None:
                    # head exists but was closed: head-creating tags land
                    # under <html>, anything else implies <body>
                    if name not in HEAD_CREATING_TAGS:
                        ensure_body()
                else:
                    if name in HEAD_CREATING_TAGS:
                        hd = ensure_head()
                        if hd is not None and (not stack or stack[-1] is html_el):
                            stack.append(hd)
                    else:
                        ensure_body()
            auto_close(name)
            el = Node.new_element(name, doc)
            for k, v in attrlist:
                if k not in el.attrs:
                    el.attrs[k] = v
            append_node(el)
            is_void = name in VOID_ELEMENTS
            honors_self_close = name not in KNOWN_TAGS
            if not is_void and not (self_close and honors_self_close):
                stack.append(el)
        elif kind == "end":
            name = t[1]
            if name == "html":
                continue
            # head/body close via the same priority rules as everything
            # else (e.g. </head> while body is open is IGNORED: body's end
            # priority 190 > head's 180 — verified against libxml2)
            # libxml2 htmlAutoCloseOnClose: a misplaced end tag may only
            # close through elements of lower-or-equal "end priority"; if a
            # higher-priority element (div/td/table/head/body/html) sits
            # between the top and the match, the end tag is IGNORED.
            p = _END_PRIORITY.get(name, 100)
            idx = None
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].name == name:
                    idx = i
                    break
                if _END_PRIORITY.get(stack[i].name, 100) > p:
                    break  # blocked: ignore this end tag
            if idx is not None:
                del stack[idx:]
            # if a script/style is (still) the open element, its remaining
            # content is CDATA again (libxml2 re-enters htmlParseScript)
            top = stack[-1] if stack else None
            if top is not None and top.name in CDATA_ELEMENTS:
                tok.cdata_tag = top.name

    if doc.root is None:
        # empty document
        html_node = Node.new_element("html", doc)
        doc.set_root_element(html_node)
    return doc


# ---------------------------------------------------------------------------
# Serialization (libxml2 xmlNodeDump, format=0)
# ---------------------------------------------------------------------------


def _escape_text(s: str) -> str:
    if "&" in s:
        s = s.replace("&", "&amp;")
    if "<" in s:
        s = s.replace("<", "&lt;")
    if ">" in s:
        s = s.replace(">", "&gt;")
    if "\r" in s:
        s = s.replace("\r", "&#13;")
    return s


def _escape_attr(s: str) -> str:
    if "&" in s:
        s = s.replace("&", "&amp;")
    if "<" in s:
        s = s.replace("<", "&lt;")
    if ">" in s:
        s = s.replace(">", "&gt;")
    if '"' in s:
        s = s.replace('"', "&quot;")
    if "\n" in s:
        s = s.replace("\n", "&#10;")
    if "\t" in s:
        s = s.replace("\t", "&#9;")
    if "\r" in s:
        s = s.replace("\r", "&#13;")
    if not s.isascii():
        # xmlAttrSerializeTxtContent with a NULL-encoding doc hex-escapes
        # all non-ASCII in attribute values (text content stays UTF-8)
        s = "".join(
            ch if ord(ch) < 0x80 else "&#x%X;" % ord(ch) for ch in s
        )
    return s


def serialize_node(node: Node) -> str:
    out: List[str] = []
    _dump(node, out)
    return "".join(out)


def _dump(node: Node, out: List[str]) -> None:
    if node.type == TEXT_NODE:
        out.append(_escape_text(node.text))
        return
    if node.type == CDATA_NODE:
        out.append("<![CDATA[")
        out.append(node.text)
        out.append("]]>")
        return
    if node.type == COMMENT_NODE:
        out.append("<!--")
        out.append(node.text)
        out.append("-->")
        return
    if node.type == PI_NODE:
        out.append(f"<?{node.name} {node.text}?>")
        return
    out.append("<")
    out.append(node.name)
    for k, v in node.attrs.items():
        out.append(" ")
        out.append(k)
        out.append('="')
        if v:
            out.append(_escape_attr(v))
        out.append('"')
    if not node.children:
        out.append("/>")
        return
    out.append(">")
    for c in node.children:
        _dump(c, out)
    out.append("</")
    out.append(node.name)
    out.append(">")
