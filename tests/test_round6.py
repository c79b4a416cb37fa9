"""Round-6 optimization regression pins.

Every r6 change is plan-/kernel-level with outputs pinned by the
existing oracles; these tests pin the three internals whose failure
mode would NOT surface as a wrong answer elsewhere: the plan-stats
re-basing helper, the simhash no-token predicate rewrite, and the
vectorized JPEG kernels' bit-identity with their scalar references.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (SparkSession.builder.master("local[4]")
         .appName("round6-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
    yield s


def test_strip_plan_stats_preserves_rows_and_resets_estimate(spark):
    """_strip_plan_stats must return the same rows/schema while dropping
    the propagated origin statistics (the BigInt-compounding guard in
    dedup_clusters' label loop)."""
    from pyspark.sql import functions as F

    from article_extractor_spark.operators.dedup import _strip_plan_stats

    df = (spark.range(100)
          .select(F.col("id").alias("doc_id"),
                  (F.col("id") % 7).alias("label"))
          .localCheckpoint(eager=True))
    stripped = _strip_plan_stats(df)
    assert stripped.schema == df.schema
    assert sorted(stripped.collect()) == sorted(df.collect())
    ckpt_stats = df._jdf.queryExecution().optimizedPlan().stats()
    bare_stats = stripped._jdf.queryExecution().optimizedPlan().stats()
    # the checkpointed frame carries a real (small) estimate; the bare
    # scan falls back to the constant default — i.e. no origin stats
    # survive to be compounded by downstream joins
    assert int(bare_stats.sizeInBytes()) != int(ckpt_stats.sizeInBytes())


def test_simhash_no_token_predicate_edge_docs(spark):
    """The rlike('\\S') rewrite must keep exactly the docs the old
    size(hashed_tokens) > 0 filter kept: null, empty, whitespace-only
    and tab/newline-only docs are absent; single-char docs are not."""
    from article_extractor_spark.operators.dedup import simhash

    rows = [(1, None), (2, ""), (3, "   "), (4, "\t\n  \n"),
            (5, "x"), (6, "  padded  "), (7, "a b")]
    # doc 4 is the trap that motivated rlike('\\S'): trim() strips only
    # SPACES, so a trim-based predicate wrongly keeps tab/newline docs
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"] for r in simhash(df, bits=8).collect()}
    assert got == {5, 6, 7}


def test_vectorized_dct_paths_match_scalar_reference():
    """The numpy FDCT/IDCT/quantize kernels must be BIT-identical to the
    scalar reference functions on arbitrary content (not just the
    constant blocks the driver query uses)."""
    import random

    import numpy as np

    from article_extractor_spark.core.jpeg import (DEFAULT_QTABLE, ZIGZAG,
                                                   _fdct8x8, _fdct_blocks,
                                                   _gather_blocks, _idct8x8,
                                                   _idct_blocks,
                                                   _quantize_blocks,
                                                   _round_half_away)

    rng = random.Random(42)
    blocks = [[float(rng.randrange(256)) - 128.0 for _ in range(64)]
              for _ in range(32)]
    arr = np.array(blocks).reshape(-1, 8, 8)

    vec_f = _fdct_blocks(arr).reshape(-1, 64)
    for b, row in zip(blocks, vec_f):
        ref = _fdct8x8(b)
        assert all(x == y for x, y in zip(ref, row)), "FDCT diverged"

    q = DEFAULT_QTABLE
    vec_q = _quantize_blocks(_fdct_blocks(arr), q)
    for b, qrow in zip(blocks, vec_q):
        coef = _fdct8x8(b)
        ref_q = [_round_half_away(coef[ZIGZAG[i]] / q[ZIGZAG[i]])
                 for i in range(64)]
        assert ref_q == list(qrow), "quantize diverged"

    coefs = [[float(rng.randrange(-512, 512)) for _ in range(64)]
             for _ in range(32)]
    carr = np.array(coefs).reshape(-1, 8, 8)
    vec_i = _idct_blocks(carr)
    for c, blk in zip(coefs, vec_i):
        ref = _idct8x8(c)
        # both sides share the flat[x*8+y] layout by construction
        got = list(blk.reshape(64))
        assert all(x == y for x, y in zip(ref, got)), "IDCT diverged"

    # _gather_blocks edge replication == the scalar block_at loops
    w, h = 13, 9
    px = bytes(rng.randrange(256) for _ in range(w * h))
    bw, bh = (w + 7) // 8, (h + 7) // 8
    g = _gather_blocks(px, w, h, bw, bh)
    for by in range(bh):
        for bx in range(bw):
            blk = g[by * bw + bx]
            for y in range(8):
                sy = min(by * 8 + y, h - 1)
                for x in range(8):
                    sx = min(bx * 8 + x, w - 1)
                    assert blk[y][x] == px[sy * w + sx] - 128.0


def _brute_cc_min(edge_list):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edge_list:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_component_min_labels_adversarial(spark):
    """The iterated-contraction CC engine must match brute-force
    union-find on graphs built to stress its seams: a long chain whose
    edges are scattered across partitions in shuffled order (bridge
    edges every partition boundary), ids far apart so the min label
    must travel the whole chain, stars, and a dense random graph."""
    import random

    from article_extractor_spark.operators.dedup import (
        connected_component_min_labels)

    rng = random.Random(7)
    edges = []
    # chain of 400 nodes with non-monotone ids: label must propagate
    # end to end; shuffled input order defeats any ordering luck
    chain = [(i * 37) % 1009 + 5000 for i in range(400)]
    edges += list(zip(chain, chain[1:]))
    # star: hub with 50 leaves, hub id NOT the min (leaf 100 is)
    edges += [(7000, 100 + i) for i in range(50)]
    # random blobs
    nodes = [20000 + i for i in range(300)]
    edges += [tuple(rng.sample(nodes, 2)) for _ in range(500)]
    rng.shuffle(edges)
    want = _brute_cc_min(edges)

    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "src long, dst long").repartition(8)
    got = {r["node"]: r["rep"]
           for r in connected_component_min_labels(df).collect()}
    assert got == want


def test_connected_component_min_labels_empty_and_single(spark):
    from article_extractor_spark.operators.dedup import (
        connected_component_min_labels)

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_component_min_labels(empty).collect() == []
    one = spark.createDataFrame([(9, 3)], "src long, dst long")
    got = {r["node"]: r["rep"]
           for r in connected_component_min_labels(one).collect()}
    assert got == {3: 3, 9: 3}


def test_embedding_near_dups_chunked_equals_unchunked(spark):
    """The triangular chunk-pair split must emit exactly the same
    (a_id, b_id, cosine) rows as the plain block-diagonal join, for
    every chunk count — including s larger than the block size."""
    import random

    from article_extractor_spark.operators.dedup import embedding_near_dups

    rng = random.Random(11)
    rows = []
    for vid in range(120):
        # 64-wide (the codegen-specialized width) with clusters of
        # near-identical vectors so the threshold actually fires
        base = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((vid, [x + rng.uniform(-0.01, 0.01) * (vid % 7 != 0)
                           for x in base[:32] * 2], vid % 3))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    want = sorted(
        tuple(r) for r in embedding_near_dups(df, threshold=0.2).collect())
    assert want, "fixture must produce pairs for the test to mean anything"
    for s in (2, 3, 16):
        got = sorted(tuple(r) for r in
                     embedding_near_dups(df, threshold=0.2,
                                         n_chunks=s).collect())
        assert got == want, f"n_chunks={s} diverged"
