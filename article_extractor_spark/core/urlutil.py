"""WHATWG-URL-flavoured parsing/joining/serialization.

The reference engine uses the Rust ``url`` crate (a WHATWG URL
implementation) for URL validity checks, relative-URL completion and
normalized re-serialization (`/root/reference/src/full_text_parser/
mod.rs:491-598`).  This module implements the subset of that behaviour the
extraction pipeline observes:

* ``parse()`` fails with :class:`RelativeUrlError` when the input has no
  scheme (the pipeline branches on exactly this error),
* ``join()`` resolves references like WHATWG (tabs/newlines stripped,
  backslashes are slashes in special schemes, dot segments removed),
* serialization percent-encodes per the WHATWG path/query/fragment sets,
  lowercases scheme/host, drops default ports, and gives special-scheme
  URLs a "/" path when empty.
"""

from __future__ import annotations

import re

SPECIAL_SCHEMES = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21", "file": None}

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.\-]*):")


class UrlError(ValueError):
    pass


class RelativeUrlError(UrlError):
    """Equivalent of url::ParseError::RelativeUrlWithoutBase."""


_C0_SPACE = "".join(chr(i) for i in range(0x21)) + "\x7f"

_FRAGMENT_EXTRA = ' "<>`'
_PATH_EXTRA = _FRAGMENT_EXTRA + "#?{}"
_QUERY_EXTRA = ' "#<>'


def _pct_encode_c0(s: str) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x20 or cp == 0x7F or cp > 0x7F and cp < 0xA0:
            for b in ch.encode("utf-8"):
                out.append("%%%02X" % b)
        elif cp > 0x7F:
            for b in ch.encode("utf-8"):
                out.append("%%%02X" % b)
        else:
            out.append(ch)
    return "".join(out)


def _pct_encode(s: str, extra: str) -> str:
    out = []
    for ch in s:
        cp = ord(ch)
        if cp < 0x21 or cp == 0x7F or ch in extra:
            for b in ch.encode("utf-8"):
                out.append("%%%02X" % b)
        elif cp > 0x7F:
            for b in ch.encode("utf-8"):
                out.append("%%%02X" % b)
        else:
            out.append(ch)
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    output: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
                if not output:
                    output = [""]
        elif seg == ".":
            continue
        else:
            output.append(seg)
    # preserve trailing slash semantics of '.'/'..' final segments
    if path.endswith("/.") or path.endswith("/..") or path.endswith("/"):
        if output and output[-1] != "":
            output.append("")
    if not output or output[0] != "":
        output.insert(0, "")
    return "/".join(output)


def _preprocess(s: str) -> str:
    s = s.strip(_C0_SPACE)
    return s.replace("\t", "").replace("\n", "").replace("\r", "")


class Url:
    __slots__ = ("scheme", "host", "port", "path", "query", "fragment", "opaque", "userinfo")

    def __init__(self):
        self.scheme = ""
        self.host: str | None = None
        self.port: str | None = None
        self.path = ""
        self.query: str | None = None
        self.fragment: str | None = None
        self.opaque = False
        self.userinfo: str | None = None

    # -- public API ------------------------------------------------------
    @staticmethod
    def parse(s: str) -> "Url":
        s = _preprocess(s)
        m = _SCHEME_RE.match(s)
        if m is None:
            raise RelativeUrlError(s)
        u = Url()
        u.scheme = m.group(1).lower()
        rest = s[m.end():]
        special = u.scheme in SPECIAL_SCHEMES
        if special:
            # WHATWG: special schemes always have an authority; any run of
            # slashes (or backslashes) after the scheme is consumed.
            rest = rest.replace("\\", "/")
            after = rest.lstrip("/")
            if not after and u.scheme != "file":
                raise UrlError("empty host")
            u._parse_authority_path(after)
            if not u.host and u.scheme != "file":
                raise UrlError("empty host")
        elif rest.startswith("//"):
            u._parse_authority_path(rest[2:])
        else:
            u.opaque = True
            frag = None
            if "#" in rest:
                rest, frag = rest.split("#", 1)
            q = None
            if "?" in rest:
                rest, q = rest.split("?", 1)
            u.path = rest
            u.query = q
            u.fragment = frag
        return u

    def _parse_authority_path(self, after: str) -> None:
        # split off fragment, then query, then path
        frag = None
        if "#" in after:
            after, frag = after.split("#", 1)
        query = None
        if "?" in after:
            after, query = after.split("?", 1)
        if self.scheme == "file" and re.match(r"^[A-Za-z][:|](?:[/\\]|$)", after):
            # WHATWG file-URL Windows drive letter: empty host, path /C:/...
            self.host = ""
            self.port = None
            self.path = _remove_dot_segments("/" + after[0] + ":" + after[2:])
            self.query = query
            self.fragment = frag
            return
        slash = len(after)
        for i, ch in enumerate(after):
            if ch == "/":
                slash = i
                break
        authority, path = after[:slash], after[slash:]
        if "@" in authority:
            self.userinfo, authority = authority.rsplit("@", 1)
        host, port = authority, None
        if host.startswith("["):
            end = host.find("]")
            if end >= 0 and ":" in host[end:]:
                host, port = host[: end + 1], host[end + 2 :]
        elif ":" in host:
            host, port = host.rsplit(":", 1)
            if port and not port.isdigit():
                raise UrlError("invalid port")
        self.host = host.lower()
        if port:
            port = str(int(port))
            if SPECIAL_SCHEMES.get(self.scheme) == port:
                port = None
        self.port = port or None
        self.path = _remove_dot_segments(path) if path else ""
        self.query = query
        self.fragment = frag

    def join(self, reference: str) -> "Url":
        ref = _preprocess(reference)
        if not ref:
            res = self._clone()
            res.fragment = None
            return res
        try:
            return Url.parse(ref)
        except RelativeUrlError:
            pass
        except UrlError:
            raise
        if self.opaque:
            raise UrlError("cannot join on opaque base")
        if self.scheme in SPECIAL_SCHEMES:
            ref = ref.replace("\\", "/")
        res = self._clone()
        res.fragment = None
        if ref.startswith("//"):
            res._parse_authority_path(ref[2:])
            return res
        if ref.startswith("#"):
            res.query = self.query
            res.fragment = ref[1:]
            return res
        if ref.startswith("?"):
            frag = None
            q = ref[1:]
            if "#" in q:
                q, frag = q.split("#", 1)
            res.query = q
            res.fragment = frag
            return res
        frag = None
        if "#" in ref:
            ref, frag = ref.split("#", 1)
        query = None
        if "?" in ref:
            ref, query = ref.split("?", 1)
        if ref.startswith("/"):
            path = ref
        else:
            base_path = self.path or "/"
            merged = base_path[: base_path.rfind("/") + 1] + ref
            path = merged
        res.path = _remove_dot_segments(path)
        res.query = query
        res.fragment = frag
        return res

    def _clone(self) -> "Url":
        u = Url()
        for k in self.__slots__:
            setattr(u, k, getattr(self, k))
        return u

    def host_str(self) -> str | None:
        return self.host if self.host else None

    def as_str(self) -> str:
        if self.opaque:
            # cannot-be-a-base path uses the C0-control set only (space,
            # quotes, <, > are all kept raw — data: URLs stay readable)
            s = f"{self.scheme}:{_pct_encode_c0(self.path)}"
            if self.query is not None:
                s += "?" + _pct_encode(self.query, _QUERY_EXTRA)
            if self.fragment is not None:
                s += "#" + _pct_encode(self.fragment, _FRAGMENT_EXTRA)
            return s
        path = self.path or "/"
        s = f"{self.scheme}://"
        if self.userinfo:
            s += self.userinfo + "@"
        s += self.host or ""
        if self.port:
            s += ":" + self.port
        s += _pct_encode(path, _PATH_EXTRA)
        if self.query is not None:
            s += "?" + _pct_encode(self.query, _QUERY_EXTRA)
        if self.fragment is not None:
            s += "#" + _pct_encode(self.fragment, _FRAGMENT_EXTRA)
        return s

    def __str__(self):
        return self.as_str()


def parse_ok(s: str) -> bool:
    try:
        Url.parse(s)
        return True
    except UrlError:
        return False


def is_relative_err(s: str) -> bool:
    """True iff Url::parse(s) would fail with RelativeUrlWithoutBase."""
    try:
        Url.parse(s)
        return False
    except RelativeUrlError:
        return True
    except UrlError:
        return False
