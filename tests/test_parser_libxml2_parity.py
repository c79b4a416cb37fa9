"""Recovery-parser behaviours verified against the real libxml2 (via the
ctypes oracle).  These encode the rules the goldens depend on:

* end-tag priority (htmlAutoCloseOnClose): an end tag cannot close through
  div/td/table/head/body/html; e.g. </head> while body is open is ignored
* implied <p> for stray text at document/html/head level
* non-head elements inside <head> imply <body>
* whitespace-only text kept everywhere except document level
* script/style CDATA ends at the matching close tag (libxml2 >= 2.10
  behaviour, which generated the reference goldens)
"""

import pytest

from article_extractor_spark.core.dom import parse_html, serialize_node


def my(html: str) -> str:
    return serialize_node(parse_html(html).get_root_element())


CASES = [
    ('<html><head><title>t</title><iframe src="x"></iframe></head>'
     "<body>y<div>z</div></body></html>",
     '<html><head><title>t</title></head><body><iframe src="x"/>y<div>z</div></body></html>'),
    ("<head>hello</head>",
     "<html><head/><body><p>hello</p></body></html>"),
    ("hello",
     "<html><body><p>hello</p></body></html>"),
    ("<body>hello</body>",
     "<html><body>hello</body></html>"),
    ("<body>x</body> tail ",
     "<html><body>x</body><p> tail </p></html>"),
    ("<html> lead <body>x</body></html>",
     "<html><body><p> lead </p>x</body></html>"),
    ("<html>\n<head>\n<title>x</title>\n</head>\n<body>y</body>\n</html>",
     "<html>\n<head>\n<title>x</title>\n</head>\n<body>y</body>\n</html>"),
    # end-priority: </button> may not close through an open div
    ("<div id='o'><button><div><span>s</span></button><p>after</p></div>",
     '<div id="o"><button><div><span>s</span><p>after</p></div></button></div>'),
    # stray end tags with no matching open element are ignored
    ("<div>a</span></div>", "<div>a</div>"),
    # script CDATA: raw content until the matching close tag, stored as a
    # CDATA section (serialized unescaped, like libxml2 xmlNodeDump)
    ("<div><script>if (a<b) { x = '<span>no</span>'; }</script>t</div>",
     "<div><script><![CDATA[if (a<b) { x = '<span>no</span>'; }]]></script>t</div>"),
]


@pytest.mark.parametrize("src,expected", CASES)
def test_parser_behaviour(src, expected):
    out = my(src)
    if out.startswith("<html>") and not expected.startswith("<html>"):
        assert expected in out
    else:
        assert out == expected or expected in out


def _libxml2_available():
    try:
        from tests.libxml2_oracle import get_lib

        get_lib()
        return True
    except OSError:
        return False


@pytest.mark.skipif(not _libxml2_available(), reason="libxml2 shared lib absent")
@pytest.mark.parametrize("src", [c[0] for c in CASES if "script" not in c[0]])
def test_matches_real_libxml2(src):
    """Direct ground-truth comparison where version semantics are stable
    (script CDATA differs between libxml2 2.9 and the goldens' 2.11)."""
    from tests.libxml2_oracle import parse_and_dump

    truth = parse_and_dump(src)
    assert my(src) == truth
