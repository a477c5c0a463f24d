"""Keyword retrieval: Okapi BM25 scoring over a document corpus.

The classic inverted-index ranking function, expressed relationally:
postings are a (doc, term, tf) hash aggregate of the token explode, the
query side is a broadcast literal, and the final top-k plans as
TakeOrderedAndProject (per-partition heads + driver merge — no global
sort).  At 100 TB the postings aggregate is the only fact-scale
shuffle; document frequencies and corpus stats are term-count- and
1-row-sized broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.operators.text import tokens

# score quantization: per-(doc, term) contributions round to 1e-9 and
# sum as exact int64, so the total is addition-order-free and
# engine-reproducible (same convention as the cosine kernels)
BM25_SCALE = 1e9


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by Okapi BM25 (Robertson/Sparck Jones) for a
    bag-of-words query.

    idf(t)  = ln(1 + (N − df + 0.5)/(df + 0.5))      [RSJ, +1 form]
    s(d, q) = Σ_t qtf(t) · idf(t) · tf·(k1+1)
                 / (tf + k1·(1 − b + b·dl/avgdl))
    with qtf the query's own term frequency (the query is a multiset —
    repeating a term up-weights it).

    N, avgdl come from ONE corpus-wide aggregate (1 row, broadcast);
    per-term document frequencies are term-count-sized (broadcast).
    Documents containing none of the query terms score 0 and are not
    returned.  Returns (id_col, score) — ties broken by id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # the query is a MULTISET: a repeated term weights its contribution
    # by its query term frequency (plain isin would silently collapse
    # duplicates)
    from collections import Counter

    qterms = local_rows_df(
        docs.sparkSession,
        [(t, float(c)) for t, c in Counter(query_terms).items()],
        "term string, qtf double",
    )
    # doc length is the token-array size, known BEFORE the explode —
    # carrying it through the explode and into the tf groupBy keys (one
    # value per doc, so the extra key is free) removes the doc-length
    # window and its exchange over the aggregated relation.  Corpus
    # stats likewise come from a no-explode scan: a non-NULL text
    # always splits to >= 1 token (so its doc counts), a NULL text
    # explodes to no rows (so it must not).
    corpus = docs.agg(
        F.count(F.col(text_col)).alias("n_docs"),
        F.coalesce(
            F.sum(F.size(tokens(F.col(text_col)))), F.lit(0)
        ).cast("long").alias("n_tok"),
    )
    # widen before the tokenize/explode (same gate as doc_shingles —
    # no-op at scale): a compacted corpus presents 1-2 scan splits and
    # would serialize the tokenization on one core
    from emiproc_spark.qhelpers import widen_for_fanout

    tok = widen_for_fanout(docs).select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    # prune to query terms BEFORE the tf shuffle (broadcast semi join,
    # guide §2.3 "aggregate before you shuffle" / §3.2): only query-term
    # occurrences cross the exchange instead of the corpus's whole
    # token explode — the tf groups for query terms are identical
    # either side of the filter.  dl (full doc length) is computed from
    # the unexploded array above, so the prune cannot change it.
    tok = tok.join(F.broadcast(qterms.select("term")), "term")
    tf = tok.groupBy(id_col, "dl", "term").agg(F.count("*").alias("tf"))
    # the pruned posting relation feeds BOTH the per-term document
    # frequencies and the scored join; without a materialization
    # barrier Spark re-executes the whole tokenize/explode/aggregate
    # subtree once per reference (no CSE across DataFrame references —
    # the r12 plan dumps show the corpus scan + Generate pipeline
    # twice).  Lazy localCheckpoint: one pass, both consumers read the
    # materialized partitions (§3.3).
    posting = tf.localCheckpoint(eager=False)
    dfreq = posting.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        posting.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("n_tok") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0) / denom) * F.col("qtf")
    per_doc = (
        scored.select(
            id_col,
            F.floor(contrib * F.lit(BM25_SCALE) + F.lit(0.5))
            .cast("long")
            .alias("__c"),
        )
        .groupBy(id_col)
        .agg((F.sum("__c").cast("double") / F.lit(BM25_SCALE)).alias("score"))
    )
    return per_doc.orderBy(F.col("score").desc(), id_col).limit(k)


def mine_hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: for every
    query, the top-k BM25-scoring documents that are NOT its labeled
    positives — the standard way to build contrastive triplets (query,
    positive, hard negative) from a corpus (dense-retrieval training à
    la DPR/SBERT uses exactly this BM25-negatives recipe).

    Batch multi-query BM25: unlike :func:`bm25_topk` (ONE query as a
    broadcast literal), the query set is a DataFrame and scoring is a
    TERM-KEYED JOIN between the query token table and the postings —
    one pass over the corpus scores every query simultaneously.

    - ``queries``: (query_id, query_text); ``positives``: (query_id,
      doc_id) labeled relevant pairs, excluded via left-anti join.
    - Corpus stats (N, avgdl) are one broadcast row; the DISTINCT query
      vocabulary broadcasts to prune postings (bounded by the query
      set, which is training-batch-sized — the corpus never
      broadcasts); the (query term × posting) join and the
      (query, doc) score aggregate stay fully distributed.
    - The per-query top-k window partitions by query_id (bounded per
      query by its candidate count), never partition-less.
    - Same idf/tf saturation and 1e-9 score quantization as
      :func:`bm25_topk`, so scores are addition-order-free and
      engine-reproducible.

    Returns (query_id, doc_id, rank, score), rank 1..k per query, ties
    broken by doc id.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # same shape as bm25_topk: dl = token-array size carried through
    # the explode (no doc-length window), corpus stats from a
    # no-explode scan (NULL text -> no tokens -> not a corpus doc)
    corpus = docs.agg(
        F.count(F.col(text_col)).alias("n_docs"),
        F.coalesce(
            F.sum(F.size(tokens(F.col(text_col)))), F.lit(0)
        ).cast("long").alias("n_tok"),
    )
    # widen before the tokenize/explode: a compacted small corpus
    # presents 1-2 scan splits and would serialize the tokenization on
    # one core (same gate as doc_shingles; no-op at scale)
    from emiproc_spark.qhelpers import widen_for_fanout

    tok = widen_for_fanout(docs).select(
        id_col, tokens(F.col(text_col)).alias("__toks")
    ).select(
        id_col,
        F.size("__toks").alias("dl"),
        F.explode("__toks").alias("term"),
    )
    qtok = (
        queries.select(
            query_id_col,
            F.explode(tokens(F.col(query_text_col))).alias("term"),
        )
        .groupBy(query_id_col, "term")
        .agg(F.count("*").cast("double").alias("qtf"))
    )
    # prune to the query vocabulary BEFORE the tf shuffle (broadcast
    # semi join, guide §2.3/§3.2): only query-term occurrences cross
    # the exchange instead of the corpus's whole token explode.  dl is
    # computed from the unexploded array above, so the prune cannot
    # change it, and the tf groups for surviving terms are identical.
    tok = tok.join(F.broadcast(qtok.select("term").distinct()), "term")
    # the pruned posting relation feeds BOTH the document frequencies
    # and the scored join; without a materialization barrier Spark
    # re-executes the whole tokenize/explode/aggregate subtree once per
    # reference (the r12 plan dumps show the corpus scan + Generate
    # pipeline twice).  Lazy localCheckpoint: one pass (§3.3).  It also
    # settles the r12 advisor's widen-at-a-join-site concern: the
    # widen's observed-partition fallback now plans over a LogicalRDD
    # (the checkpointed partitions) instead of eagerly materializing an
    # unexecuted tokenize/groupBy/join subtree.
    posting = (
        tok.groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = posting.groupBy("term").agg(F.count("*").alias("df"))
    # the (posting x query-term) join multiplies rows, so its input is
    # exactly the CPU-heavy-per-byte shape AQE's byte-based coalescing
    # serializes onto 1-2 post-shuffle partitions: re-widen the pruned
    # postings (explicit repartition — AQE respects it; the gate makes
    # it a no-op once the relation is genuinely large)
    scored = (
        widen_for_fanout(posting)
        .join(F.broadcast(dfreq), "term")
        .join(qtok, "term")
        .crossJoin(F.broadcast(corpus))
    )
    avgdl = F.col("n_tok") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0) / denom) * F.col("qtf")
    per_pair = (
        scored.select(
            query_id_col,
            id_col,
            F.floor(contrib * F.lit(BM25_SCALE) + F.lit(0.5))
            .cast("long")
            .alias("__c"),
        )
        .groupBy(query_id_col, id_col)
        .agg((F.sum("__c").cast("double") / F.lit(BM25_SCALE)).alias("score"))
    )
    neg = per_pair.join(
        positives.select(query_id_col, id_col), [query_id_col, id_col], "left_anti"
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "score")
    )


def phrase_count(
    docs: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase occurrence count per document — the "quoted query"
    complement to BM25's bag-of-words ranking.

    Entirely map-only: the token array is materialized once per row and
    the k-word window match runs as a higher-order ``filter`` over the
    candidate start positions — no explode, no shuffle, no UDF, so at
    100 TB this is a pure scan at whole-stage-codegen speed and
    Catalyst prunes the read to (id, text).  Overlapping occurrences
    all count (start positions, not disjoint matches).

    An inverted positional index would serve the low-latency lookup
    case; for the batch "tag every document" case the scan IS the
    optimal plan (every text must be read anyway).

    Returns (id, n_occurrences) for every input document (0 when the
    phrase is absent or the text has fewer than k tokens).
    """
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    if any(" " in w or w == "" for w in phrase):
        raise ValueError(f"phrase tokens must be non-empty words, got {phrase}")
    k = len(phrase)
    tok = docs.select(id_col, tokens(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")

    def is_match(i):
        cond = F.lit(True)
        for j, w in enumerate(phrase):
            cond = cond & (
                F.element_at(F.col("__toks"), i + F.lit(j + 1)) == F.lit(w)
            )
        return cond

    starts = F.sequence(F.lit(0), n - F.lit(k))
    count = F.when(n >= k, F.size(F.filter(starts, is_match))).otherwise(
        F.lit(0)
    )
    return tok.select(
        id_col, count.cast("long").alias("n_occurrences")
    )


def rrf_fuse(
    ranked: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    c: int = 60,
    k: int = 10,
    input_k: int = 1000,
) -> DataFrame:
    """Reciprocal-rank fusion of result lists — the standard
    hybrid-search combiner (lexical BM25 + vector ANN):
    ``score(d) = Σ_lists 1 / (c + rank_list(d))``, lists that missed a
    document contribute nothing.

    ``ranked`` is [(frame, score_col), ...]; each list is ranked by
    (score desc, id) so ties are deterministic.  The bounded-input
    contract is ENFORCED, not assumed: every list is re-truncated to
    its own top ``input_k`` rows first (orderBy+limit compiles to
    TakeOrderedAndProject — a distributed partial top-k), so a caller
    that hands over an untruncated corpus-sized retriever output
    cannot silently funnel it through single-task ranking.  The rank
    itself is computed WITHOUT a window: the ≤input_k survivors pack
    into one sorted array whose posexplode position is the rank —
    no partition-less WindowExec anywhere in the fused plan.  Scores
    must be finite (NaN would order differently between the top-k
    truncation and the array sort).

    Returns (id, rrf) — the top ``k`` fused documents, rrf quantized
    (1e9) so downstream order is engine-reproducible.
    """
    if len(ranked) < 2:
        raise ValueError("rrf_fuse needs at least two ranked lists")
    if c < 1 or k < 1:
        raise ValueError(f"c and k must be >= 1, got {c}, {k}")
    if input_k < k:
        raise ValueError(f"input_k ({input_k}) must be >= k ({k})")
    fused = None
    rank_cols = []
    for idx, (df, score_col) in enumerate(ranked):
        rc = f"__r{idx}"
        bounded = (
            df.select(id_col, score_col)
            .orderBy(F.col(score_col).desc(), F.col(id_col))
            .limit(input_k)
        )
        # struct order (−score asc, id asc) == (score desc, id asc)
        arr = bounded.agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col(score_col).cast("double")).alias("ns"),
                        F.col(id_col).alias("id"),
                    )
                )
            ).alias("a")
        )
        r = arr.select(F.posexplode("a").alias("p", "s")).select(
            F.col("s.id").alias(id_col), (F.col("p") + 1).alias(rc)
        )
        rank_cols.append(rc)
        fused = r if fused is None else fused.join(r, id_col, "outer")
    score = None
    for rc in rank_cols:
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(rc)), F.lit(0.0)
        )
        score = term if score is None else score + term
    rrf = F.floor(score * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    return (
        fused.select(id_col, rrf.alias("rrf"))
        .orderBy(F.col("rrf").desc(), id_col)
        .limit(k)
    )
