"""Title/author/date metadata extraction.

Port of `/root/reference/src/full_text_parser/metadata.rs:8-163`:
config xpaths first, then generic meta fallbacks; titles get an
entity-decode pass (kept-on-error) and separator cleanup."""

from __future__ import annotations

import datetime
import re

from . import constants
from .config import ConfigEntry
from .entities import EntityDecodeError, decode_html_strict
from .util import extract_value, extract_value_merge, get_attribute
from .xpath import Context


class Article:
    __slots__ = ("title", "author", "url", "date", "thumbnail_url", "html")

    def __init__(self, url):
        self.title: str | None = None
        self.author: str | None = None
        self.url = url
        self.date: datetime.datetime | None = None
        self.thumbnail_url: str | None = None
        self.html: str | None = None


def extract(ctx: Context, config: ConfigEntry | None,
            global_config: ConfigEntry | None, article: Article) -> None:
    if article.title is None:
        title = _extract_title(ctx, config, global_config)
        if title is not None:
            try:
                title = decode_html_strict(title)
            except EntityDecodeError:
                pass
            if constants.TITLE_SEPARATOR.search(title):
                new_title = constants.TITLE_CUT_END.sub(r"\1", title, count=1)
                word_count = len(constants.WORD_COUNT.split(title))
                if word_count < 3:
                    title = constants.TITLE_CUT_FRONT.sub(
                        r"\1", title, count=1
                    ).strip()
                else:
                    title = new_title.strip()
            article.title = title

    if article.author is None:
        author = _extract_author(ctx, config, global_config)
        if author is not None:
            try:
                author = decode_html_strict(author)
            except EntityDecodeError:
                pass
            article.author = author

    if article.date is None:
        article.date = _extract_date(ctx, config, global_config)


def _extract_title(ctx, config, global_config):
    if config is not None:
        for xpath_title in config.xpath_title:
            title = extract_value_merge(ctx, xpath_title)
            if title is not None:
                return title
    if global_config is not None:
        for xpath_title in global_config.xpath_title:
            title = extract_value_merge(ctx, xpath_title)
            if title is not None:
                return title
    v = extract_value(ctx, "//title")
    if v is not None:
        return v
    for name in ("dc:title", "dcterm:title", "og:title", "weibo:article:title",
                 "weibo:webpage:title", "twitter:title"):
        v = _get_meta(ctx, name)
        if v is not None:
            return v
    return None


def _extract_author(ctx, config, global_config):
    if config is not None:
        for xpath_author in config.xpath_author:
            author = extract_value(ctx, xpath_author)
            if author is not None:
                return author
    if global_config is not None:
        for xpath_author in global_config.xpath_author:
            author = extract_value(ctx, xpath_author)
            if author is not None:
                return author
    v = extract_value(ctx, "//author")
    if v is not None:
        return v
    for name in ("dc:creator", "dcterm:creator"):
        v = _get_meta(ctx, name)
        if v is not None:
            return v
    return None


def _extract_date(ctx, config, global_config):
    if config is not None:
        for xpath_date in config.xpath_date:
            date_string = extract_value(ctx, xpath_date)
            if date_string is not None:
                d = parse_rfc3339_utc(date_string)
                if d is not None:
                    return d
    if global_config is not None:
        for xpath_date in global_config.xpath_date:
            date_string = extract_value(ctx, xpath_date)
            if date_string is not None:
                d = parse_rfc3339_utc(date_string)
                if d is not None:
                    return d
    return None


def _get_meta(ctx, name):
    return get_attribute(ctx, f"//meta[contains(@name, '{name}')]", "content")


_RFC3339_RE = re.compile(
    r"^\s*(\d{4})-(\d{2})-(\d{2})[Tt ](\d{2}):(\d{2}):(\d{2})"
    r"(\.\d+)?\s*([Zz]|[+-]\d{2}:?\d{2})\s*$"
)


def parse_rfc3339_utc(s: str):
    """chrono ``DateTime::<Utc>::from_str``: RFC 3339 with required offset;
    anything else yields None (`metadata.rs:126-156`)."""
    m = _RFC3339_RE.match(s)
    if m is None:
        return None
    year, month, day, hh, mm, ss = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    micro = 0
    if frac:
        micro = int(round(float(frac) * 1_000_000))
        if micro >= 1_000_000:
            micro = 999_999
    off = m.group(8)
    try:
        dt = datetime.datetime(
            year, month, day, hh, mm, ss, micro, tzinfo=datetime.timezone.utc
        )
    except ValueError:
        return None
    if off not in ("Z", "z"):
        sign = 1 if off[0] == "+" else -1
        off = off[1:].replace(":", "")
        delta = datetime.timedelta(hours=int(off[:2]), minutes=int(off[2:]))
        dt -= sign * delta
    return dt
