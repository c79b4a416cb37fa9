"""The reference's three inline real-page `clean_html_fragment` cases
(`/root/reference/src/clean.rs:72-182`), ported verbatim: real-world messy
HTML (GNOME blog, Finshots newsletter, Pointiest Stick post) with the same
assertions — a byte-length window and thumbnail equality.  These pin
fragment-cleanup behavior beyond the synthetic-fragment + oracle coverage.
"""

import os

from article_extractor_spark.core.pipeline import clean_html_fragment

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "clean")


def _load(name: str) -> str:
    with open(os.path.join(FIXDIR, f"{name}.html"),
              encoding="utf-8", newline="") as f:
        return f.read()


def test_rethinking_window_management():
    # clean.rs:23-94: must clean without error (the Rust test only unwraps)
    res = clean_html_fragment(
        _load("rethinking_window_management"),
        "https://blogs.gnome.org/tbernard/2023/07/26/rethinking-window-management/",
    )
    assert res.html  # produced non-empty cleaned HTML


def test_finshots():
    # clean.rs:98-109: length window is on BYTES (Rust str::len)
    res = clean_html_fragment(_load("finshots"), "https://finshots.in")
    blen = len(res.html.encode("utf-8"))
    assert abs(blen - 12_000) < 200, f"cleaned byte length {blen}"
    assert res.thumbnail == (
        "https://cdn.finshots.app/images/2023/03/Design-8-Amul.jpg"
    )


def test_pointieststick():
    # clean.rs:111-126: video iframe survives cleanup; no thumbnail
    res = clean_html_fragment(_load("pointieststick"), "https://pointieststick.com")
    assert res.thumbnail is None
    assert "iframe" in res.html
