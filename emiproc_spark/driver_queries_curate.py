"""Driver-contract queries for corpus-curation operators: duplicate
clustering (connected components), deterministic sampling / source
mixing, repetition filters, PII scrubbing, TF-IDF keywords.

Same parity conventions as ``driver_queries_text``: md5-derived
randomness, integer quantization, deterministic tie-breaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emiproc_spark import fixtures as fx
from emiproc_spark.operators import cluster as cl
from emiproc_spark.operators import dedup as dd
from emiproc_spark.operators import sampling as sp
from emiproc_spark.operators import text as tx
from emiproc_spark.driver_queries_text import DOCS2_SQL, SQL_MINHASH_LSH, _docs2
from emiproc_spark.qhelpers import qd, sql_qd


# ======================================================================
# duplicate clustering: LSH candidate pairs -> connected components
# ======================================================================
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dd.minhash_signatures(_docs2(spark, sf_dir), k=8)
    pairs = dd.lsh_candidate_pairs(sigs, bands=4, rows_per_band=2)
    return cl.connected_components(pairs)


SQL_DUP_CLUSTERS = f"""
    WITH RECURSIVE pairs AS (
        SELECT * FROM ({SQL_MINHASH_LSH}) t
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach(n, m) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    SELECT n AS node, LEAST(n, MIN(m)) AS component
    FROM reach GROUP BY n
"""


# ======================================================================
# deterministic sampling / mixing
# ======================================================================
SAMPLE_RATES = {"web": 0.5, "books": 0.9, "code": 0.25, "wiki": 1.0}
MIX_WEIGHTS = {"web": 0.4, "books": 0.3, "code": 0.2, "wiki": 0.1}
MIX_BUDGET = 300_000.0  # chars


def q_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fx.load(spark, sf_dir, "documents").select("doc_id", "source")
    return sp.stratified_sample(d, SAMPLE_RATES, stratum_col="source")


def _sql_rate_case(rates: dict[str, float]) -> str:
    whens = " ".join(
        f"WHEN source = '{k}' THEN {v!r}" for k, v in rates.items()
    )
    return f"CASE {whens} ELSE 0.0 END"


SQL_DOC_SAMPLE = f"""
    SELECT doc_id, source FROM documents
    WHERE {sp.sql_hash_fraction('doc_id')} < {_sql_rate_case(SAMPLE_RATES)}
"""


def q_data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fx.load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    rates = sp.mixture_rates(
        d, MIX_WEIGHTS, MIX_BUDGET, stratum_col="source", size_col="n_chars"
    )
    return sp.apply_mixture(d, rates, stratum_col="source").select(
        "doc_id", "source", "n_chars"
    )


def _sql_weight_case(weights: dict[str, float]) -> str:
    wsum = sum(weights.values())
    whens = " ".join(
        f"WHEN source = '{k}' THEN {float(v) / wsum!r}" for k, v in weights.items()
    )
    return f"CASE {whens} END"


SQL_DATA_MIX = f"""
    WITH totals AS (
        SELECT source, SUM(n_chars) AS stratum_tokens
        FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source,
               LEAST(1.0, {MIX_BUDGET!r} * ({_sql_weight_case(MIX_WEIGHTS)})
                          / CAST(stratum_tokens AS DOUBLE)) AS rate
        FROM totals
        WHERE ({_sql_weight_case(MIX_WEIGHTS)}) IS NOT NULL
    )
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d JOIN rates r USING (source)
    WHERE {sp.sql_hash_fraction('d.doc_id')} < r.rate
"""


# ======================================================================
# repetition filters (Gopher-style)
# ======================================================================
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        fx.load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 2000)
        .select("doc_id", "text")
    )
    out = tx.repetition_features(d)
    return out.where(
        F.size(tx.tokens(F.col("text"))) >= 2
    ).select(
        "doc_id",
        qd("dup_token_frac").alias("dup_token_frac"),
        qd("top_bigram_share").alias("top_bigram_share"),
    )


SQL_REPETITION_STATS = f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE doc_id < 2000
    ),
    base AS (SELECT doc_id, toks, len(toks) AS n FROM d WHERE len(toks) >= 2),
    big AS (
        SELECT doc_id, toks[t.i] || ' ' || toks[t.i + 1] AS g
        FROM base, UNNEST(range(1, n)) AS t(i)
    ),
    counts AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS top_c FROM counts GROUP BY doc_id)
    SELECT b.doc_id,
           {sql_qd('(b.n - len(list_distinct(b.toks))) / CAST(b.n AS DOUBLE)')}
               AS dup_token_frac,
           {sql_qd('t.top_c / CAST(b.n - 1 AS DOUBLE)')} AS top_bigram_share
    FROM base b JOIN top t ON b.doc_id = t.doc_id
"""


# ======================================================================
# PII scrubbing (emails/phones are synthesized so matches are guaranteed)
# ======================================================================
def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        fx.load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 2000)
        .select("doc_id", "text")
    )
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach me: user"),
            F.col("doc_id").cast("string"),
            F.lit("@ex"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".com or 415-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    )


AUGMENTED_SQL = """
    SELECT doc_id,
           text || ' reach me: user' || CAST(doc_id AS VARCHAR)
                || '@ex' || CAST(doc_id % 7 AS VARCHAR)
                || '.com or 415-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
    FROM documents WHERE doc_id < 2000
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tx.scrub_pii(_augmented(spark, sf_dir))
    return out.select(
        "doc_id", "n_emails", "n_phones", F.md5("scrubbed").alias("scrub_hash")
    )


SQL_PII_SCRUB = (
    "WITH d AS ("
    + AUGMENTED_SQL
    + """)
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '"""
    + tx.EMAIL_RE
    + """')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '"""
    + tx.PHONE_RE
    + """')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '"""
    + tx.EMAIL_RE
    + """', '<EMAIL>', 'g'), '"""
    + tx.PHONE_RE
    + """', '<PHONE>', 'g')) AS scrub_hash
    FROM d
"""
)


# ======================================================================
# TF-IDF top-k keywords (log-free idf for engine parity; see tfidf_topk)
# ======================================================================
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        fx.load(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 2000)
        .select("doc_id", "text")
    )
    return tx.tfidf_topk(d, k=3, log_idf=False)


SQL_TFIDF_TOPK = """
    WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 2000),
    tok AS (
        SELECT doc_id, t.term
        FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM d),
             UNNEST(toks) AS t(term)
        WHERE t.term != ''
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM d),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
               FLOOR(CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df * 1e9 + 0.5) / 1e9
                   AS score_q
        FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score_q, CAST(rank AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score_q DESC, term ASC) AS rank
        FROM scored
    ) WHERE rank <= 3
"""


QUERIES_CURATE: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dup_clusters": q_dup_clusters,
    "doc_sample": q_doc_sample,
    "data_mix": q_data_mix,
    "repetition_stats": q_repetition_stats,
    "pii_scrub": q_pii_scrub,
    "tfidf_topk": q_tfidf_topk,
}

ORACLES_CURATE: dict[str, str] = {
    "dup_clusters": SQL_DUP_CLUSTERS,
    "doc_sample": SQL_DOC_SAMPLE,
    "data_mix": SQL_DATA_MIX,
    "repetition_stats": SQL_REPETITION_STATS,
    "pii_scrub": SQL_PII_SCRUB,
    "tfidf_topk": SQL_TFIDF_TOPK,
}
