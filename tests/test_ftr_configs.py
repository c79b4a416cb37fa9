"""Site-config (FTR) path tests: config grammar + the six golden pairs
shipped by the reference (no in-repo harness there; we byte-compare through
``parse_offline`` with the vendored site config)."""

import pytest

from article_extractor_spark.core.config import parse_config_text
from article_extractor_spark.core.pipeline import get_parser
from article_extractor_spark.core.urlutil import Url
from tests.conftest import read_fixture

HOSTMAP = {
    "golem": "golem.de",
    "phoronix": "phoronix.com",
    "youtube": "youtube.com",
    "hardwareluxx": "hardwareluxx.de",
    "heise-1": "heise.de",
    "spiegel-1": "spiegel.de",
}


@pytest.mark.parametrize("name,host", sorted(HOSTMAP.items()))
def test_ftr_golden(name, host):
    parser = get_parser()
    src = read_fixture("ftr", name, "source.html")
    expected = read_fixture("ftr", name, "expected.html")
    cfg = parser.config_files.get(host + ".txt")
    assert cfg is not None
    art = parser.parse_offline([src], config=cfg, url=Url.parse(f"https://www.{host}/"))
    assert art.html == expected


def test_user_config_dir_overrides_embedded(tmp_path):
    """`config_collection.rs:35-69` precedence: a user-dir entry with the
    same filename shadows the embedded one, both at lookup and through a
    full parse; hosts without a user entry still resolve embedded."""
    from article_extractor_spark.core.config import ConfigCollection
    from article_extractor_spark.core.fulltext import FullTextParser

    (tmp_path / "phoronix.com.txt").write_text(
        "title: //h2[@id='user-title']\nbody: //div[@id='user-body']\n",
        encoding="utf-8",
    )
    coll = ConfigCollection(user_directory=str(tmp_path))
    over = coll.get("phoronix.com.txt")
    assert over is not None and over.xpath_title == ["//h2[@id='user-title']"]
    # embedded entry unchanged for other hosts
    assert coll.get("golem.de.txt") is not None
    assert coll.get("golem.de.txt").xpath_title != over.xpath_title

    parser = FullTextParser(coll)
    art = parser.parse_offline(
        ["<html><body><h2 id='user-title'>User Title</h2>"
         "<div id='user-body'><p>User body text here.</p></div>"
         "<div id='content'><p>Embedded-config body.</p></div></body></html>"],
        url=Url.parse("https://www.phoronix.com/article"),
    )
    assert art.title == "User Title"
    assert "User body text here." in (art.html or "")


def test_config_grammar():
    entry = parse_config_text(
        "# comment\n"
        "title: //h1 | //h2[@class='t']\n"
        "body: //div[@id='content']\n"
        "strip: //aside\n"
        "strip_id_or_class: share  # trailing comment\n"
        "strip_image_src: /emoji/\n"
        "replace_string(foo): bar\n"
        "find_string: abc\n"
        "replace_string: xyz\n"
        "http_header(user-agent): test\n"
        "single_page_link: //a[@id='all']\n"
        "tidy: yes\n"
        "prune: no\n"
        "unknown_directive: skipped\n"
    )
    assert entry.xpath_title == ["//h1", "//h2[@class='t']"]
    assert entry.xpath_body == ["//div[@id='content']"]
    assert entry.xpath_strip == ["//aside"]
    # quirk-faithful: trim happens BEFORE the '#' cut (`util.rs:30-37`),
    # so spaces before an inline comment survive
    assert entry.strip_id_or_class == ["share  "]
    assert entry.strip_image_src == ["/emoji/"]
    assert [(r.to_replace, r.replace_with) for r in entry.replace] == [
        ("foo", "bar"), ("abc", "xyz")
    ]
    assert entry.header == [("user-agent", "test")]
    assert entry.single_page_link == "//a[@id='all']"


def test_config_collection_loaded():
    parser = get_parser()
    assert len(parser.config_files.entries) >= 1900
    assert parser.config_files.get("global.txt") is not None
    # host lookup: www. stripped
    assert parser.get_grabber_config(Url.parse("https://www.golem.de/x")) is not None
