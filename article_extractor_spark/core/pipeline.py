"""Public entry points of the extraction core (no Spark).

Mirrors the reference's three lifecycles (`SURVEY.md §3`):

* :func:`parse_offline`   — config-driven extraction w/ readability fallback
  (`/root/reference/src/full_text_parser/mod.rs:30-83`)
* :func:`readability_extract` — standalone readability
  (`/root/reference/src/full_text_parser/readability/mod.rs:25-57`)
* :func:`clean_html_fragment` — RSS-item cleanup
  (`/root/reference/src/clean.rs:35-69`)
"""

from __future__ import annotations

from dataclasses import dataclass

from . import fulltext, metadata as metadata_mod, readability, util
from .config import ConfigCollection, ConfigEntry
from .dom import Document, Node, serialize_node
from .fulltext import (FullTextParser, check_for_thumbnail,
                       parse_html_with_config, post_process_document,
                       post_process_page, prep_content,
                       prevent_self_closing_tags)
from .metadata import Article
from .urlutil import Url
from .xpath import Context

DEFAULT_BASE_URL = "http://fakehost/test/base/"


def readability_extract(html: str, base_url: str | None = None) -> str:
    url = Url.parse(base_url) if base_url else None
    return readability.extract(html, url)


def run_golden_pipeline(html: str, base_url: str | None = None) -> str:
    """Exactly the fixture-test chain of the reference
    (`/root/reference/src/full_text_parser/readability/tests.rs:9-58`):
    parse -> prep_content (empty configs) -> metadata -> readability
    extract_body -> prevent_self_closing_tags -> post_process_document ->
    serialize <article>."""
    empty_config = ConfigEntry()
    url = Url.parse(base_url or DEFAULT_BASE_URL)
    document = parse_html_with_config(html, None, empty_config)
    ctx = Context(document)
    prep_content(ctx, None, empty_config, url, document, None)
    article = Article(url)

    article_document = Document()
    root = Node.new_element("article", document)
    article_document.set_root_element(root)

    metadata_mod.extract(ctx, None, None, article)
    readability.extract_body(document, root, article.title)

    article_ctx = Context(article_document)
    prevent_self_closing_tags(article_ctx)
    post_process_document(article_document)
    return serialize_node(root)


@dataclass
class CleanedHtml:
    html: str
    thumbnail: str | None


def clean_html_fragment(html_fragment: str, base_url: str) -> CleanedHtml:
    empty_config = ConfigEntry()
    url = Url.parse(base_url)
    document = parse_html_with_config(html_fragment, None, empty_config)
    ctx = Context(document)
    thumbnail = check_for_thumbnail(ctx)
    prep_content(ctx, None, empty_config, url, document, None)
    root = document.get_root_element()
    if root is not None:
        post_process_page(root)
    prevent_self_closing_tags(ctx)
    post_process_document(document)

    root = document.get_root_element()
    if root is None:
        return CleanedHtml("", thumbnail)
    if root.get_name() == "body":
        content_node = root
    else:
        body = util.get_first_element_by_tag_name(root, "body")
        content_node = body if body is not None else root
    return CleanedHtml(serialize_node(content_node), thumbnail)


_DEFAULT_PARSER: FullTextParser | None = None


def get_parser(config_dir: str | None = None) -> FullTextParser:
    global _DEFAULT_PARSER
    if config_dir is not None:
        return FullTextParser(ConfigCollection(directory=config_dir))
    if _DEFAULT_PARSER is None:
        _DEFAULT_PARSER = FullTextParser()
    return _DEFAULT_PARSER


def parse_offline(pages: list[str], url: str | None = None,
                  config: ConfigEntry | None = None,
                  parser: FullTextParser | None = None) -> Article:
    p = parser or get_parser()
    u = Url.parse(url) if url else None
    return p.parse_offline(pages, config=config, url=u)
