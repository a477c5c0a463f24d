"""Unit tests: BM25 retrieval (operators/retrieval.py), PageRank
(operators/graph.py) and MinHash signature agreement
(operators/dedup.minhash_agreement)."""

import math

import pytest

from pyspark.sql import functions as F

from emiproc_spark.operators.dedup import minhash_agreement, minhash_signatures
from emiproc_spark.operators.graph import pagerank
from emiproc_spark.operators.retrieval import bm25_topk


def _bm25_reference(corpus, terms, k1=1.2, b=0.75):
    """Independent plain-Python BM25 for the expected scores."""
    toks = {d: t.split(" ") for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            denom = tf + k1 * (1 - b + b * len(v) / avgdl)
            scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / denom
    return scores


def test_bm25_matches_reference(spark):
    corpus = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry date"),
        (3, "apple apple apple apple"),
        (4, "elderberry fig grape"),
    ]
    docs = spark.createDataFrame(corpus, schema="doc_id long, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, ["apple", "date"], k=10).collect()
    }
    want = _bm25_reference(corpus, ["apple", "date"])
    assert set(got) == set(want)  # doc 4 has no query term -> absent
    for d, s in want.items():
        assert got[d] == pytest.approx(s, abs=1e-6)


def test_bm25_topk_limit_and_ties(spark):
    docs = spark.createDataFrame(
        [(i, "apple pie") for i in range(5)], schema="doc_id long, text string"
    )
    rows = bm25_topk(docs, ["apple"], k=3).collect()
    # identical scores -> tie broken by ascending doc_id
    assert [r["doc_id"] for r in rows] == [0, 1, 2]


def test_bm25_validations(spark):
    docs = spark.createDataFrame([(1, "a")], schema="doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, ["a"], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [])


def _pr_reference(edges, iterations, damping=0.85):
    """Independent plain-Python PageRank (same dangling semantics)."""
    e = sorted(set(edges))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    out = {}
    for a, _ in e:
        out[a] = out.get(a, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        s = {v: 0.0 for v in nodes}
        for a, bb in e:
            s[bb] += pr[a] / out[a]
        pr = {v: (1 - damping) / n + damping * s[v] for v in nodes}
    return pr


def test_pagerank_symmetric_cycle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], schema="src long, dst long"
    )
    out = {r["node"]: r["pagerank"] for r in pagerank(edges, 4).collect()}
    assert out[1] == pytest.approx(0.5, abs=1e-9)
    assert out[2] == pytest.approx(0.5, abs=1e-9)


def test_pagerank_star_and_dangling(spark):
    # b -> a, c -> a; a dangles (its mass leaks each iteration)
    raw = [(2, 1), (3, 1)]
    edges = spark.createDataFrame(raw, schema="src long, dst long")
    out = {r["node"]: r["pagerank"] for r in pagerank(edges, 3).collect()}
    want = _pr_reference(raw, 3)
    for v, p in want.items():
        assert out[v] == pytest.approx(p, abs=1e-6)
    assert out[1] > out[2] == out[3]


def test_pagerank_dedups_edges(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], schema="src long, dst long"
    )
    out = {r["node"]: r["pagerank"] for r in pagerank(edges, 4).collect()}
    assert out[1] == pytest.approx(0.5, abs=1e-9)


def test_pagerank_validations(spark):
    edges = spark.createDataFrame([(1, 2)], schema="src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, 0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(edges, 1, damping=1.0)
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(edges.where(F.lit(False)), 1)


def test_minhash_agreement_bounds(spark):
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6"),
            (2, "w1 w2 w3 w4 w5 w6"),  # identical to 1
            (3, "x1 x2 x3 x4 x5 x6"),  # disjoint from 1
        ],
        schema="doc_id long, text string",
    )
    sigs = minhash_signatures(docs, k=8)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], schema="doc_a long, doc_b long"
    )
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_agreement(sigs, pairs, k=8).collect()
    }
    assert est[(1, 2)] == 1.0  # identical docs agree on every component
    assert est[(1, 3)] == 0.0  # disjoint shingle sets share no minimum
    with pytest.raises(ValueError, match="k must be"):
        minhash_agreement(sigs, pairs, k=0)


def test_bm25_repeated_query_term_upweights(spark):
    docs = spark.createDataFrame(
        [(1, "apple pie"), (2, "plum pie")],
        schema="doc_id long, text string",
    )
    single = {r["doc_id"]: r["score"]
              for r in bm25_topk(docs, ["apple", "plum"], k=5).collect()}
    double = {r["doc_id"]: r["score"]
              for r in bm25_topk(docs, ["apple", "apple", "plum"], k=5).collect()}
    assert double[1] == pytest.approx(2 * single[1], abs=1e-6)
    assert double[2] == pytest.approx(single[2], abs=1e-9)


def test_minhash_agreement_width_mismatch_raises(spark):
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 w4")],
        schema="doc_id long, text string",
    )
    sigs = minhash_signatures(docs, k=8)
    pairs = spark.createDataFrame([(1, 2)], schema="doc_a long, doc_b long")
    with pytest.raises(Exception, match="signature width"):
        minhash_agreement(sigs, pairs, k=4).collect()


def test_minhash_agreement_missing_signature_raises(spark):
    # a pair referencing a doc with no signature rows must raise, not
    # silently vanish from the output (left-join + aggregate guard)
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4"), (2, "w1 w2 w3 w4")],
        schema="doc_id long, text string",
    )
    sigs = minhash_signatures(docs, k=8)
    pairs = spark.createDataFrame(
        [(1, 99)], schema="doc_a long, doc_b long"
    )
    with pytest.raises(Exception, match="no signature rows"):
        minhash_agreement(sigs, pairs, k=8).collect()
    pairs_a = spark.createDataFrame(
        [(99, 1)], schema="doc_a long, doc_b long"
    )
    with pytest.raises(Exception, match="no signature rows"):
        minhash_agreement(sigs, pairs_a, k=8).collect()


def test_phrase_count_overlapping_and_short_docs(spark):
    from emiproc_spark.operators.retrieval import phrase_count

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y"), (3, "a"), (4, "b a b"),
         (5, "a a a a")],
        schema="doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_count(docs, ["a", "b"]).collect()
    }
    assert out == {1: 2, 2: 0, 3: 0, 4: 1, 5: 0}
    # overlapping starts all count
    tri = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_count(docs, ["a", "a"]).collect()
    }
    assert tri[5] == 3
    with pytest.raises(ValueError, match="at least one"):
        phrase_count(docs, [])
    with pytest.raises(ValueError, match="non-empty words"):
        phrase_count(docs, ["a b"])


def test_phrase_count_map_only(spark):
    from emiproc_spark.operators.retrieval import phrase_count

    docs = spark.createDataFrame(
        [(1, "a b")], schema="doc_id long, text string"
    )
    plan = phrase_count(docs, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure scan, no shuffle


def test_rrf_fuse_combines_lists(spark):
    from emiproc_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, s double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8), (1, 0.1)], "doc_id long, s double"
    )
    out = rrf_fuse([(a, "s"), (b, "s")], k=4).collect()
    got = {r["doc_id"]: r["rrf"] for r in out}
    # doc 1: rank 1 in a, rank 3 in b; doc 3: rank 3 in a, rank 1 in b
    import math
    exp1 = math.floor((1 / 61 + 1 / 63) * 1e9 + 0.5) / 1e9
    assert got[1] == exp1 and got[3] == exp1
    # docs 2 and 4 each appear in only one list
    assert got[2] == math.floor((1 / 62) * 1e9 + 0.5) / 1e9
    assert set(got) == {1, 2, 3, 4}
    with pytest.raises(ValueError, match="two ranked lists"):
        rrf_fuse([(a, "s")])


def test_rrf_fuse_enforces_bounded_input(spark):
    """The bounded-input contract is load-bearing: an oversized ranked
    list is truncated to its top input_k BEFORE ranking, and no
    partition-less Window appears anywhere in the fused plan."""
    from emiproc_spark.operators.retrieval import rrf_fuse

    big = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (1000 - F.col("id")).cast("double").alias("s")
    )
    out = rrf_fuse([(big, "s"), (big, "s")], k=3, input_k=5)
    rows = out.collect()
    # top input_k=5 survive ranking; top k=3 fused: ids 0,1,2 (best s)
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    import math

    assert rows[0]["rrf"] == math.floor((2 / 61) * 1e9 + 0.5) / 1e9
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    with pytest.raises(ValueError, match="input_k"):
        rrf_fuse([(big, "s"), (big, "s")], k=10, input_k=5)


def test_mine_hard_negatives_excludes_positives_and_ranks(spark):
    """Batch multi-query BM25: positives are anti-joined away, scores
    follow the single-query kernel (doc 2's doubled 'apple' + 'banana'
    beats doc 3's single 'apple'), zero-overlap docs never appear, and
    a repeated query term up-weights its contribution."""
    from emiproc_spark.operators.retrieval import bm25_topk, mine_hard_negatives

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple apple banana"),
            (3, "apple date egg"),
            (4, "fig grape hazel"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(100, "apple banana"), (200, "fig fig")],
        "query_id long, query_text string",
    )
    positives = spark.createDataFrame(
        [(100, 1), (200, 4)], "query_id long, doc_id long"
    )
    rows = mine_hard_negatives(docs, queries, positives, k=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # query 100: positive doc 1 excluded; doc 2 > doc 3; doc 4 shares
    # no term and is absent
    got = [(r["doc_id"], r["rank"]) for r in sorted(by_q[100], key=lambda r: r["rank"])]
    assert got == [(2, 1), (3, 2)]
    assert by_q[100][0]["score"] > 0
    # query 200: its only matching doc is the positive -> no negatives
    assert 200 not in by_q
    # kernel parity with the single-query operator: same quantized
    # score for the same (query, doc) pair
    single = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, ["apple", "banana"], k=4).collect()
    }
    mined = {r["doc_id"]: r["score"] for r in by_q[100]}
    for d in mined:
        assert mined[d] == single[d]
