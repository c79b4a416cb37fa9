"""fivefilters "ftr-site-config" rule parsing and lookup.

Grammar port of `/root/reference/src/full_text_parser/config/
config_entry.rs:52-164` (line-oriented directives, ``|``-multi values,
trailing-``#`` comment stripping) and the collection/lookup semantics of
``config_collection.rs`` (hostname minus leading ``www.`` + ``.txt``,
user dir overrides bundled entries, ``global.txt`` always applied)."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class Replace:
    to_replace: str
    replace_with: str


@dataclass
class ConfigEntry:
    xpath_title: list[str] = field(default_factory=list)
    xpath_author: list[str] = field(default_factory=list)
    xpath_date: list[str] = field(default_factory=list)
    xpath_body: list[str] = field(default_factory=list)
    xpath_strip: list[str] = field(default_factory=list)
    strip_id_or_class: list[str] = field(default_factory=list)
    strip_image_src: list[str] = field(default_factory=list)
    replace: list[Replace] = field(default_factory=list)
    header: list[tuple[str, str]] = field(default_factory=list)
    single_page_link: str | None = None
    next_page_link: str | None = None


def _extract_value(identifier: str, line: str) -> str:
    value = line[len(identifier):].strip()
    pos = value.find("#")
    return value[:pos] if pos >= 0 else value


def _split_values(values: str) -> list[str]:
    return [s.strip() for s in values.split("|")]


_MULTI = (("title:", "xpath_title"), ("body:", "xpath_body"),
          ("date:", "xpath_date"), ("author:", "xpath_author"))
_SINGLE = (("strip:", "xpath_strip"), ("strip_id_or_class:", "strip_id_or_class"),
           ("strip_image_src:", "strip_image_src"))
_OPT = (("single_page_link:", "single_page_link"),
        ("next_page_link:", "next_page_link"))
_IGNORE = ("tidy:", "prune:", "test_url:", "autodetect_on_failure:")


def parse_config_text(text: str) -> ConfigEntry:
    entry = ConfigEntry()
    lines = iter(text.splitlines())
    for raw in lines:
        line = raw.strip()
        if (
            not line
            or line.startswith("#")
            or any(line.startswith(ig) for ig in _IGNORE)
        ):
            continue
        matched = False
        for ident, attr in _MULTI:
            if line.startswith(ident):
                vals = [v.strip() for v in _split_values(_extract_value(ident, line))]
                getattr(entry, attr).extend(vals)
                matched = True
                break
        if matched:
            continue
        for ident, attr in _SINGLE:
            if line.startswith(ident):
                getattr(entry, attr).append(_extract_value(ident, line))
                matched = True
                break
        if matched:
            continue
        for ident, attr in _OPT:
            if line.startswith(ident):
                setattr(entry, attr, _extract_value(ident, line))
                matched = True
                break
        if matched:
            continue
        if line.startswith("replace_string("):
            value = _extract_value("replace_string(", line)
            parts = [s.strip() for s in value.split("): ")]
            if len(parts) == 2:
                entry.replace.append(Replace(parts[0], parts[1]))
            continue
        if line.startswith("http_header("):
            value = _extract_value("http_header(", line)
            parts = [s.strip() for s in value.split("): ")]
            if len(parts) == 2:
                entry.header.append((parts[0], parts[1]))
            continue
        if line.startswith("find_string:"):
            to_replace = _extract_value("find_string:", line)
            nxt = next(lines, None)
            if nxt is not None:
                replace_with = _extract_value("replace_string:", nxt)
                entry.replace.append(Replace(to_replace, replace_with))
            continue
        # unknown directives (wrap_in(, dissolve:, strip_attr:, ...) are
        # silently skipped, like the reference's while-let loop
    return entry


def parse_config_file(path: str) -> ConfigEntry:
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        return parse_config_text(f.read())


_ENV_CONFIG_DIR = "AES_FTR_SITE_CONFIG_DIR"
_DEFAULT_DIRS = (
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "data", "ftr-site-config"),
)


class ConfigCollection:
    """host -> ConfigEntry map, parsed once (driver-side) and broadcast."""

    def __init__(self, directory: str | None = None, user_directory: str | None = None):
        self.entries: dict[str, ConfigEntry] = {}
        self.user_entries: dict[str, ConfigEntry] = {}
        directory = directory or os.environ.get(_ENV_CONFIG_DIR)
        if directory is None:
            for cand in _DEFAULT_DIRS:
                if os.path.isdir(cand):
                    directory = cand
                    break
        if directory and os.path.isdir(directory):
            self._load(directory, self.entries)
        if user_directory and os.path.isdir(user_directory):
            self._load(user_directory, self.user_entries)

    @staticmethod
    def _load(directory: str, target: dict) -> None:
        for fn in sorted(os.listdir(directory)):
            if not fn.endswith(".txt"):
                continue
            try:
                target[fn] = parse_config_file(os.path.join(directory, fn))
            except OSError:
                continue

    def get(self, key: str) -> ConfigEntry | None:
        if key in self.user_entries:
            return self.user_entries[key]
        return self.entries.get(key)

    def __len__(self) -> int:
        return len({**self.entries, **self.user_entries})


def get_host_name(url) -> str | None:
    """Hostname minus leading 'www.' (`mod.rs:220-234`)."""
    name = url.host_str()
    if name is None:
        return None
    if name.startswith("www.") and len(name) > 4:
        name = name[4:]
    return name
