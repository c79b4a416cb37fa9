"""Raw-bytes extraction composite: charset sniff -> decode -> extract.

A real Common-Crawl payload is ``binary`` (WARC response bytes), not a
string; the registered extraction path (`operators/extract.py`) takes
``html string`` per the driver input hint.  This module supplies the
missing front step by composing two frozen, tested pieces —
``core.charset`` (WHATWG-shaped sniffing) and the extraction Arrow batch
loop — in a NEW file so no registered query closure changes.

Plan shape at 100 TB: ONE ``mapInArrow`` stage that decodes and extracts
inside the same Python worker invocation (the two-stage variant pays a
second full Arrow crossing for the decoded html — measured ~2x wall at
sf0.1), behind at most one hash exchange on ``url`` when partitioning is
requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_articles_from_bytes(
    pages_bin: DataFrame,
    body_col: str = "body",
    content_type_col: str | None = None,
    config_broadcast=None,
    num_partitions: int | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """pages(url, <body_col> binary, [content-type], ...) -> articles.

    Output schema == ``extract_articles``'s (url, title, author, date,
    thumbnail_url, text, part_id, batch_elapsed_ms).  Encoding per page
    follows the WHATWG order BOM > transport header > bounded meta
    prescan > windows-1252; undecodable bytes become U+FFFD rather than
    failing the partition.  Decode and extraction run FUSED in one
    Arrow stage."""
    from article_extractor_spark.operators.extract import (
        OUTPUT_SCHEMA, broadcast_configs, _extract_batches_arrow)

    spark = pages_bin.sparkSession
    if config_broadcast is None:
        config_broadcast = broadcast_configs(spark)
    entries = config_broadcast

    cols = ["url", body_col] + ([content_type_col] if content_type_col
                                else [])
    projected = pages_bin.select(*cols)
    if num_partitions:
        # Deterministic data-derived key, mirroring extract_articles'
        # partitioning contract (never rand()-based).
        key = F.xxhash64(F.col("url")) if salt_buckets <= 0 else \
            F.xxhash64(F.col("url"),
                       F.pmod(F.xxhash64(F.col("url"), F.col(body_col)),
                              F.lit(salt_buckets)))
        projected = projected.repartition(num_partitions, key)

    ct_col = content_type_col

    def fn(batches):
        import pyarrow as pa

        from article_extractor_spark.core.charset import decode_html

        def decoded(rbs):
            for rb in rbs:
                urls = rb.column(rb.schema.get_field_index("url"))
                bodies = rb.column(
                    rb.schema.get_field_index(body_col)).to_pylist()
                cts = (rb.column(rb.schema.get_field_index(ct_col))
                       .to_pylist() if ct_col else [None] * len(bodies))
                htmls = [decode_html(b if b is not None else b"", ct)[0]
                         for b, ct in zip(bodies, cts)]
                yield pa.RecordBatch.from_arrays(
                    [urls, pa.array(htmls, pa.string())], ["url", "html"])

        return _extract_batches_arrow(decoded(batches), entries.value)

    return projected.mapInArrow(fn, OUTPUT_SCHEMA)
