"""Profile the pure-Python extraction core over synthesized pages.

Usage: python scripts/profile_extract.py [n_docs] [sort_key]
Prints the cProfile hot list — the input to per-round throughput work.
No Spark involved: this isolates per-document CPU, which is what scales
out (the Spark layer is embarrassingly parallel around it).
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_html(doc_id: int, text: str) -> str:
    rep = doc_id % 4 + 1
    paras = "<h2>Section one</h2>\n" + (
        f"<p>{text}, extended run.</p>\n" * rep
    ) + "<p>Closing remarks, with commas, and more text to score.</p>\n"
    return (
        f"<!DOCTYPE html><html><head><title>Doc {doc_id} - Synthetic News</title>"
        f'<meta name="og:image" content="https://img.example.com/photo-{doc_id}.jpg"/>'
        "</head><body>"
        '<nav class="menu sidebar"><a href="/home">home</a><a href="/about">about</a></nav>'
        '<header class="banner header">Synthetic News Network</header>'
        f'<div id="content" class="article main"><h1>Headline {doc_id}</h1>\n{paras}'
        '<img src="/img/inline.jpg" alt="inline"/></div>'
        '<div class="comments social share"><p>comment spam</p></div>'
        '<footer class="footer">(c) synthetic</footer></body></html>'
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    sort = sys.argv[2] if len(sys.argv) > 2 else "cumtime"

    import duckdb
    texts = [
        r[0] or ""
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.01/documents.parquet' "
            f"ORDER BY doc_id LIMIT {n}"
        ).fetchall()
    ]
    docs = [(i, synth_html(i, t)) for i, t in enumerate(texts)]

    from article_extractor_spark.core.pipeline import get_parser
    from article_extractor_spark.core.urlutil import Url

    parser = get_parser()

    def run():
        for i, html in docs:
            parser.parse_offline([html], url=Url.parse(f"https://h{i}.example.com/a/"))

    # untimed warmup touches import-time caches
    parser.parse_offline([docs[0][1]], url=Url.parse("https://warm.example.com/"))

    # best-of-N: the sandbox carries bursty background load
    wall = None
    for _ in range(int(os.environ.get("AES_PROFILE_REPEATS", "3"))):
        t0 = time.monotonic()
        run()
        w = time.monotonic() - t0
        wall = w if wall is None else min(wall, w)
    print(f"plain: {n} docs best-of-N {wall:.2f}s = {n / wall:.0f} docs/s/core "
          f"({1000 * wall / n:.2f} ms/doc)")

    pr = cProfile.Profile()
    pr.enable()
    run()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats(sort).print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
