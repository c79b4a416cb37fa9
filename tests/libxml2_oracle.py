"""Ground-truth oracle: parse with the real libxml2 (via ctypes) exactly as
the reference does (htmlReadMemory, RECOVER|NOERROR, forced utf-8) and
serialize with xmlNodeDump — the same call chain as rust-libxml's
``node_to_string``.  Dev/test tool only (the engine itself stays pure
Python); used to pinpoint recovery-parser divergences."""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None


def get_lib():
    global _lib
    if _lib is None:
        path = ctypes.util.find_library("xml2")
        if path is None:
            raise OSError("libxml2 not found")
        lib = ctypes.CDLL(path)
        lib.htmlReadMemory.restype = ctypes.c_void_p
        lib.htmlReadMemory.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.xmlDocGetRootElement.restype = ctypes.c_void_p
        lib.xmlDocGetRootElement.argtypes = [ctypes.c_void_p]
        lib.xmlBufferCreate.restype = ctypes.c_void_p
        lib.xmlNodeDump.restype = ctypes.c_int
        lib.xmlNodeDump.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.xmlBufferContent.restype = ctypes.c_char_p
        lib.xmlBufferContent.argtypes = [ctypes.c_void_p]
        lib.xmlFreeDoc.argtypes = [ctypes.c_void_p]
        lib.xmlBufferFree.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


HTML_PARSE_RECOVER = 1
HTML_PARSE_NOERROR = 32
HTML_PARSE_NOWARNING = 64


def parse_and_dump(html: str | bytes) -> str | None:
    """htmlReadMemory + xmlNodeDump(root) — byte-ground-truth of the
    reference's parse step.  Returns None if parsing yields no document."""
    lib = get_lib()
    data = html.encode("utf-8", "surrogatepass") if isinstance(html, str) else html
    doc = lib.htmlReadMemory(
        data, len(data), None, b"utf-8",
        HTML_PARSE_RECOVER | HTML_PARSE_NOERROR | HTML_PARSE_NOWARNING,
    )
    if not doc:
        return None
    try:
        root = lib.xmlDocGetRootElement(doc)
        if not root:
            return None
        buf = lib.xmlBufferCreate()
        try:
            lib.xmlNodeDump(buf, doc, root, 0, 0)
            content = lib.xmlBufferContent(buf)
            return content.decode("utf-8", "replace") if content else ""
        finally:
            lib.xmlBufferFree(buf)
    finally:
        lib.xmlFreeDoc(doc)


def my_parse_and_dump(html: str) -> str:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from article_extractor_spark.core.dom import parse_html, serialize_node

    doc = parse_html(html)
    root = doc.get_root_element()
    return serialize_node(root) if root is not None else ""


if __name__ == "__main__":
    import sys

    path = sys.argv[1]
    with open(path, encoding="utf-8", newline="") as f:
        html = f.read()
    truth = parse_and_dump(html)
    mine = my_parse_and_dump(html)
    if truth == mine:
        print("IDENTICAL", len(mine), "bytes")
    else:
        n = min(len(truth), len(mine))
        for i in range(n):
            if truth[i] != mine[i]:
                print(f"first diff @ {i}")
                print("LIBXML2:", repr(truth[max(0, i - 120):i + 150]))
                print("MINE   :", repr(mine[max(0, i - 120):i + 150]))
                break
        else:
            print(f"prefix match; lengths libxml2={len(truth)} mine={len(mine)}")
