"""Deterministic HTML -> Markdown rendering over the built-in DOM.

LLM training corpora are increasingly stored as Markdown rather than
HTML: it keeps document structure (headings, lists, tables, links,
code) at a fraction of the markup overhead, and matches what models
see at inference time.  This renderer turns the extraction pipeline's
output (the reference emits cleaned HTML only — `Article::html`,
/root/reference/src/article.rs — so this is additive, training-data
surface) into CommonMark-shaped text.

Design constraints:

* pure function of the DOM — byte-deterministic across runs, workers,
  partitionings (the driver's value oracle hashes the output);
* whitespace-normalizing — inline text collapses runs of whitespace to
  a single space, block boundaries are exactly one blank line, so the
  output is stable against formatting-only differences in the input
  HTML (the property Markdown corpora want for dedup);
* no information silently dropped — unknown elements render their
  children (inline) or their blocks (block context), never nothing.

Block model: the renderer walks the tree once; a node renders either as
a BLOCK (paragraph, heading, list, quote, fence, table, rule) or as
INLINE content folded into the nearest block.  Nested blocks inside
list items and blockquotes are indented/prefixed per CommonMark.
"""

from __future__ import annotations

import re

from article_extractor_spark.core.dom import Node, parse_html

_WS = re.compile(r"\s+")

_BLOCK = {
    "p", "div", "article", "section", "main", "aside", "header", "footer",
    "figure", "figcaption", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol",
    "li", "blockquote", "pre", "table", "hr", "nav", "body", "html",
}

_SKIP = {"script", "style", "head", "template", "noscript"}


def _inline_one(ch: Node) -> str:
    """Render ONE element node inline, honoring its own semantics."""
    name = ch.get_name().lower()
    if name in _SKIP:
        return ""
    if name in ("strong", "b"):
        inner = _inline(ch).strip()
        return f"**{inner}**" if inner else ""
    if name in ("em", "i"):
        inner = _inline(ch).strip()
        return f"*{inner}*" if inner else ""
    if name == "code":
        inner = _WS.sub(" ", ch.get_content()).strip()
        return f"`{inner}`" if inner else ""
    if name == "a":
        inner = _inline(ch).strip()
        href = (ch.get_attribute("href") or "").strip()
        if href and inner:
            return f"[{inner}]({href})"
        return inner
    if name == "img":
        alt = _WS.sub(" ", ch.get_attribute("alt") or "").strip()
        src = (ch.get_attribute("src") or "").strip()
        return f"![{alt}]({src})" if src else alt
    if name == "br":
        return "\n"
    return _inline(ch)


def _inline(node: Node) -> str:
    """Render a node's content as inline markdown (no block breaks)."""
    parts: list[str] = []
    for ch in node.get_child_nodes():
        if ch.is_text():
            parts.append(_WS.sub(" ", ch.text))
        elif ch.is_element():
            parts.append(_inline_one(ch))
    return "".join(parts)


def _clean_inline(node: Node) -> str:
    """Inline render, then per-line trim + blank-line drop."""
    raw = _inline(node)
    lines = [_WS.sub(" ", ln).strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def _list_blocks(node: Node, ordered: bool) -> list[str]:
    items = [ch for ch in node.get_child_elements()
             if ch.get_name().lower() == "li"]
    out = []
    for i, li in enumerate(items):
        marker = f"{i + 1}. " if ordered else "- "
        body = "\n\n".join(_blocks(li)) or _clean_inline(li)
        pad = " " * len(marker)
        lines = body.split("\n")
        rendered = lines[0] if lines else ""
        rest = [pad + ln if ln else "" for ln in lines[1:]]
        out.append(marker + "\n".join([rendered] + rest).strip()
                   if rendered or rest else marker.rstrip())
    return ["\n".join(out)] if out else []


def _table_block(node: Node) -> list[str]:
    rows = []
    for tr in (n for n in node.iter_descendants()
               if n.is_element() and n.get_name().lower() == "tr"):
        cells = [c for c in tr.get_child_elements()
                 if c.get_name().lower() in ("td", "th")]
        if cells:
            rows.append([_clean_inline(c).replace("\n", " ").replace("|", r"\|")
                         for c in cells])
    if not rows:
        return []
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    lines = ["| " + " | ".join(rows[0]) + " |",
             "|" + "|".join([" --- "] * width) + "|"]
    lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return ["\n".join(lines)]


def _blocks(node: Node) -> list[str]:
    """Render a container node's children as a list of markdown blocks."""
    out: list[str] = []
    inline_run: list[str] = []

    def flush():
        if inline_run:
            raw = "".join(inline_run)
            inline_run.clear()
            lines = [_WS.sub(" ", ln).strip() for ln in raw.split("\n")]
            text = "\n".join(ln for ln in lines if ln)
            if text:
                out.append(text)

    for ch in node.get_child_nodes():
        if ch.is_text():
            inline_run.append(_WS.sub(" ", ch.text))
            continue
        if not ch.is_element():
            continue
        name = ch.get_name().lower()
        if name in _SKIP:
            continue
        if name not in _BLOCK:
            inline_run.append(_inline_one(ch))
            continue
        flush()
        if name in ("h1", "h2", "h3", "h4", "h5", "h6"):
            text = _clean_inline(ch).replace("\n", " ").strip()
            if text:
                out.append("#" * int(name[1]) + " " + text)
        elif name == "p":
            text = _clean_inline(ch)
            if text:
                out.append(text)
        elif name in ("ul", "ol"):
            out.extend(_list_blocks(ch, ordered=(name == "ol")))
        elif name == "blockquote":
            inner = "\n\n".join(_blocks(ch))
            if inner:
                out.append("\n".join(
                    ("> " + ln).rstrip() for ln in inner.split("\n")))
        elif name == "pre":
            code = ch.get_content().strip("\n")
            out.append("```\n" + code + "\n```")
        elif name == "table":
            out.extend(_table_block(ch))
        elif name == "hr":
            out.append("---")
        else:  # div/article/section/... recurse as block container
            out.extend(_blocks(ch))
    flush()
    return out


def html_to_markdown(html: str) -> str:
    """Parse ``html`` (recovery parser, same as the pipeline) and render
    the document as Markdown.  Empty/unparseable input renders ''."""
    if not html:
        return ""
    doc = parse_html(html)
    root = doc.get_root_element()
    if root is None:
        return ""
    return "\n\n".join(_blocks(root))
