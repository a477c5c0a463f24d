"""Text analysis for large-scale training-data pipelines.

Beyond-reference operators (SURVEY.md §7.2 M7): tokenization, shingles,
quality scoring, language-ID heuristic, document fingerprinting.  All
hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from emiproc_spark.localdf import local_rows_df

from emiproc_spark.qhelpers import qd

# small English stopword set for the heuristic scorers (deterministic,
# shared with oracle SQL via STOPWORDS_SQL)
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]
STOPWORDS_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split — the canonical
    tokenizer shared with the DuckDB oracle)."""
    return F.split(text, " ")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings.

    Built by zipping n shifted slices of the token array — one pass, no
    per-index ``element_at`` (which would re-evaluate ``toks`` per
    element when it is an unmaterialized expression like ``split``).
    IMPORTANT: pass a *materialized column* (select the split into a
    column first); see ``operators.dedup.doc_shingles``.
    """
    if n < 1:
        # n=0 silently returned the raw tokens, n<0 nonsense slices —
        # wrong dedup/boilerplate shingles instead of a loud error
        raise ValueError(f"shingle width must be >= 1, got {n}")
    win = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    out = F.slice(toks, 1, win)
    for k in range(1, n):
        out = F.zip_with(
            out, F.slice(toks, k + 1, win), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def stopword_count(toks: Column) -> Column:
    """Tokens matched CASE-INSENSITIVELY against the stopword set: the
    tokenizer does not lowercase, so a sentence-initial "The" must
    still count — matching raw tokens biased en_score/stopword_ratio
    low on exactly the well-formed English the scorers exist to detect.
    Oracle lockstep: ``lower(x) IN {STOPWORDS_SQL}``."""
    return F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))


# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the subset both
# Java regex and RE2 support — no lookahead): contraction suffixes, then
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
# The punctuation class INCLUDES the apostrophe (as GPT-2's
# [^\s\p{L}\p{N}]+ does): ordered alternation still lets the
# contraction branch win, while a lone apostrophe (possessive "James'",
# quote marks) tokenizes as punctuation instead of being silently
# dropped from the count.
BPE_REGEX = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokenization (the GPT-2 split pattern without merges):
    the token-count estimator for LLM training budgets.  Pure
    ``regexp_extract_all`` — JVM-side, no UDF."""
    return F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token count, char count, mean word
    length, stopword ratio — the length/punct/stopword heuristics of
    web-scale corpus filtering."""
    t = tokens(F.col(text_col))
    return docs.withColumns(
        {
            "n_tokens": F.size(t),
            "n_chars_m": F.length(text_col),
            "mean_word_len": F.length(text_col) / F.size(t),
            "stopword_ratio": stopword_count(t) / F.size(t),
        }
    )


def lang_id_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Language-ID heuristic: stopword-overlap score (fraction of tokens
    in the English stopword set).  A real model plugs in the same shape —
    per-language marker-token sets scored in one pass."""
    t = tokens(F.col(text_col))
    return docs.withColumn("en_score", stopword_count(t) / F.size(t)).withColumn(
        "is_en", (F.col("en_score") > 0.05).cast("int")
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized
    (lowercased, whitespace-collapsed, space-joined) token stream —
    'a  b' and 'a b' fingerprint identically (empty tokens from runs of
    spaces are dropped before joining; the old split-then-rejoin was an
    exact identity that never normalized anything).

    NULL text fingerprints as NULL — ``concat_ws`` of a NULL array is
    ``''``, which would give every unfetched/NULL doc the SAME
    fingerprint as a genuinely empty doc and mass-cluster them as
    duplicates (and diverge from the oracle, whose md5(NULL) is NULL).
    """
    t = F.filter(tokens(F.lower(F.trim(F.col(text_col)))), lambda x: x != "")
    return docs.withColumn(
        "fp",
        F.when(
            F.col(text_col).isNotNull(), F.md5(F.concat_ws(" ", t))
        ),
    )


def repetition_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-style repetition
    filters): duplicate-token fraction and top-bigram share.

    Map-only (no explode, no shuffle) across three stacked projections:
    tokens and bigrams are *materialized columns* so the split/shingle
    expressions evaluate once per doc (inlining them re-derives the
    split per downstream expression — the shingles() docstring rule).
    Docs with < 2 tokens have no bigrams; their ``top_bigram_share`` is
    NULL (not a division crash — Spark 4's ANSI mode makes x/0 an
    error) and ``dup_token_frac`` is NULL for empty token arrays."""
    # most-frequent-bigram count without explode: sort the array, then
    # one linear fold tracking the longest equal-run — O(n log n) per
    # doc vs the quadratic distinct×count scan, still pure JVM exprs
    top_bigram = F.aggregate(
        F.array_sort(F.col("_bigrams")),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("cur"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.cur + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    return (
        docs.withColumn("_toks", tokens(F.col(text_col)))
        .withColumn("_bigrams", shingles(F.col("_toks"), 2))
        .withColumns(
            {
                "dup_token_frac": F.when(
                    F.size("_toks") > 0,
                    (F.size("_toks") - F.size(F.array_distinct("_toks")))
                    / F.size("_toks"),
                ),
                "top_bigram_share": F.when(
                    F.size("_bigrams") > 0, top_bigram / F.size("_bigrams")
                ),
            }
        )
        .drop("_toks", "_bigrams")
    )


# PII patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) agree on: no lookaround, no backreferences.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def scrub_pii(
    docs: DataFrame,
    text_col: str = "text",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """Mask emails and phone numbers, keeping match counts for audit.

    Map-only ``regexp_replace``/``regexp_count`` (JVM-side) — the shape
    of every large-scale PII pass; swap in richer patterns per policy.

    The audit counts mirror the replacement *cascade*: ``n_phones`` is
    counted on the email-scrubbed intermediate, so digits consumed by
    the email mask (e.g. ``415-555-0123@mail.com``) are not double-
    reported as a phone that was never masked — ``n_emails + n_phones``
    always equals the number of substitution tokens in ``scrubbed``."""
    c = F.col(text_col)
    after_email = F.regexp_replace(c, EMAIL_RE, email_token)
    return docs.withColumns(
        {
            "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)),
            "n_phones": F.regexp_count(after_email, F.lit(PHONE_RE)),
            "scrubbed": F.regexp_replace(after_email, PHONE_RE, phone_token),
        }
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    log_idf: bool = True,
) -> DataFrame:
    """Top-k TF-IDF terms per document.

    Plan: explode → per-(doc, term) counts → document frequency as a
    *second* aggregate on the same shuffled data (the groupBy(term)
    reuses the (doc,term) partitioning's map-side partials) → window
    top-k per doc.  idf = ln(N/df) on broadcast N; ``log_idf=False``
    uses the raw inverse frequency tf·N/df — exact integer/IEEE-division
    arithmetic, used by the driver oracle where ln() would be
    libm-dependent across engines.  CAVEAT for raw idf at extreme
    scale: the tie-stabilizing quantization floors ``score·1e9`` into
    a LONG, which overflows (an ANSI arithmetic error, not a silent
    wrong answer) once ``tf·N/df`` exceeds ~9.2e9 — e.g. a 1e10-doc
    corpus with a df=tf=10 term; use the default log idf there."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("term").agg(F.count("*").alias("df"))
    # N stays in the lazy plan as a broadcast scalar — a collect() here
    # would run a full corpus scan at plan-construction time
    n_docs = F.broadcast(docs.select(F.countDistinct(id_col).alias("__n")))
    if log_idf:
        score = F.col("tf") * F.log(F.col("__n").cast("double") / F.col("df"))
    else:
        score = (F.col("tf") * F.col("__n")).cast("double") / F.col("df")
    w = Window.partitionBy(id_col).orderBy(F.desc("score_q"), F.asc("term"))
    return (
        tf.join(df_counts, "term")
        .crossJoin(n_docs)
        .withColumn("score_q", F.floor(score * 1e9 + 0.5) / 1e9)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score_q", "rank")
    )


def unigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    qscale: float = 1e6,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-``alpha``-smoothed unigram distribution — the degenerate-order
    KenLM-style fluency score used as a cheap quality signal (documents
    full of rare/garbled tokens score low).

    Plan: one explode → per-(doc, term) counts (map-side partials) →
    corpus term counts as a second aggregate on the SAME shuffled data
    (reuses the (doc, term) partitioning, like ``tfidf_topk``) → join on
    term weighted by tf.  Corpus totals ride along as a lazy broadcast
    scalar — no driver collect.  The join key is the term, so hot terms
    skew; AQE skew-join handles it (the tf pre-aggregation already cut
    the join input from one row per token to one per (doc, term)).

    Per-term log-probs are quantized to ``1/qscale`` before the exact
    integer sum (the ``sumd`` convention) so the per-doc mean is
    fold-order-independent — and engine-independent up to a ulp of
    ``ln`` at a quantization boundary.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("gc"))
    totals = F.broadcast(
        corpus.agg(
            F.sum("gc").alias("__total"), F.count("*").alias("__vocab")
        )
    )
    logp = F.log(
        (F.col("gc") + F.lit(alpha))
        / (F.col("__total") + F.lit(alpha) * F.col("__vocab"))
    )
    lq = F.floor(logp * F.lit(qscale) + F.lit(0.5)).cast("long")
    return (
        tf.join(corpus, "term")
        .crossJoin(totals)
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("tf") * lq).cast("double")
                / F.sum("tf")
                / F.lit(qscale)
            ).alias("mean_logprob"),
        )
    )


def length_percentiles(
    docs: DataFrame,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    text_col: str = "text",
) -> DataFrame:
    """Exact token-count percentiles (type-7 linear interpolation) of a
    corpus — scale-safely.

    ``percentile``/``array_sort`` aggregates buffer every value; instead
    the distribution is reduced to a HISTOGRAM first (token counts have
    bounded cardinality — one row per distinct length), then the
    interpolation runs on that dimension-sized table: cumulative counts
    via a window over the tiny histogram, the 0-based rank positions
    ``(N−1)·q`` located with two min-joins.  One shuffle over the corpus
    (map-side partial counts), everything after is broadcast-sized.
    Returns (q, value).
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    hist = (
        docs.select(token_count(F.col(text_col)).alias("len"))
        # NULL-text docs have no length: excluding them matches the
        # oracle's quantile_cont (which ignores NULLs) — counted into
        # the histogram they'd sort first, inflate N, and shift every
        # percentile low
        .where(F.col("len").isNotNull())
        .groupBy("len")
        .agg(F.count("*").alias("cnt"))
    )
    # global window over the histogram only: bounded distinct lengths
    w = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    totals = F.broadcast(cum.agg(F.max("cum").alias("__n")))
    qdf = local_rows_df(spark, [(float(q),) for q in quantiles], "q double")
    pos = qdf.crossJoin(totals).select(
        "q",
        (F.lit(1.0) * (F.col("__n") - 1) * F.col("q")).alias("p"),
    )
    pos = pos.select(
        "q",
        "p",
        F.floor("p").cast("long").alias("lo"),
        F.ceil("p").cast("long").alias("hi"),
    )
    cumb = F.broadcast(cum.select("len", "cum"))
    # value at 0-based sorted position i = min len with cum >= i+1
    vlo = (
        pos.join(cumb, F.col("cum") >= F.col("lo") + 1)
        .groupBy("q", "p", "lo", "hi")
        .agg(F.min("len").alias("vlo"))
    )
    vhi = (
        pos.join(cumb, F.col("cum") >= F.col("hi") + 1)
        .groupBy("q")
        .agg(F.min("len").alias("vhi"))
    )
    return vlo.join(vhi, "q").select(
        "q",
        (
            F.col("vlo")
            + (F.col("vhi") - F.col("vlo")) * (F.col("p") - F.col("lo"))
        ).alias("value"),
    )


def quality_filter(
    docs: DataFrame,
    min_tokens: int | None = 20,
    max_tokens: int | None = None,
    max_mean_word_len: float | None = 12.0,
    min_stopword_ratio: float | None = None,
    max_dup_token_frac: float | None = 0.9,
    text_col: str = "text",
) -> DataFrame:
    """C4/Gopher-style composed quality gate: every document gets a
    ``keep`` flag and the FIRST failing rule's name in ``reason``
    (``'ok'`` when kept) — the audit column a curation pipeline reports
    before dropping rows.

    Rules evaluate in a fixed order (min_tokens, max_tokens,
    mean_word_len, stopword_ratio, dup_token_frac); pass ``None`` to
    disable one.  Map-only: token/bigram features are materialized
    columns shared across rules — one projection chain, no shuffle, no
    UDF, so the gate runs at scan speed over 100 TB and Catalyst prunes
    it to the columns the caller keeps.
    """
    staged = docs.withColumn("__toks", tokens(F.col(text_col)))
    n = F.size("__toks")
    checks: list[tuple[str, Column]] = []
    if min_tokens is not None:
        checks.append(("min_tokens", n >= min_tokens))
    if max_tokens is not None:
        checks.append(("max_tokens", n <= max_tokens))
    if max_mean_word_len is not None:
        checks.append(
            (
                "mean_word_len",
                (n > 0) & (F.length(text_col) / n <= max_mean_word_len),
            )
        )
    if min_stopword_ratio is not None:
        checks.append(
            (
                "stopword_ratio",
                (n > 0)
                & (stopword_count(F.col("__toks")) / n >= min_stopword_ratio),
            )
        )
    if max_dup_token_frac is not None:
        checks.append(
            (
                "dup_token_frac",
                (n > 0)
                & (
                    (n - F.size(F.array_distinct("__toks"))) / n
                    <= max_dup_token_frac
                ),
            )
        )
    reason = F.lit("ok")
    for name, ok in reversed(checks):
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    # NULL text makes every check condition NULL, so ~cond never fires
    # and the when-chain would fall through to 'ok' — a document with no
    # text must not pass the gate silently
    reason = F.when(F.col(text_col).isNull(), F.lit("null_text")).otherwise(reason)
    return (
        staged.withColumn("reason", reason)
        .withColumn("keep", F.col("reason") == "ok")
        .drop("__toks")
    )


def boilerplate_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
    min_doc_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Per-group boilerplate n-grams — word n-grams present in at least
    ``min_doc_frac`` of a group's documents (and ``min_docs`` absolute).

    The CCNet-style boilerplate detector reduced to the relational
    core: repeated headers/footers/navigation within one source
    (domain) appear in most of its documents, while real content does
    not.  Returns ``(group, shingle, doc_freq, group_docs)``.

    Plan shape: one shingle explode + two hash aggregations (per-group
    doc counts are a tiny dimension joined back broadcast); no join
    touches the fact table twice.  The size join is NULL-SAFE: a NULL
    ``group_col`` is a real group (groupBy keeps it) and a plain
    equi-join would silently drop its boilerplate from the output.
    """
    sh = (
        docs.select(F.col(group_col).alias("__grp"), "doc_id", tokens(F.col(text_col)).alias("toks"))
        .select("__grp", "doc_id", F.explode(shingles(F.col("toks"), n)).alias("shingle"))
        .distinct()
    )
    group_sizes = docs.groupBy(F.col(group_col).alias("__grp2")).agg(
        F.count("*").alias("group_docs")
    )
    return (
        sh.groupBy("__grp", "shingle")
        .agg(F.count("*").alias("doc_freq"))
        .join(
            F.broadcast(group_sizes),
            F.col("__grp").eqNullSafe(F.col("__grp2")),
        )
        .where(
            (F.col("doc_freq") >= F.col("group_docs") * F.lit(min_doc_frac))
            & (F.col("doc_freq") >= min_docs)
        )
        .select(F.col("__grp").alias(group_col), "shingle", "doc_freq", "group_docs")
    )


def strip_boilerplate(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    n: int = 3,
    min_doc_frac: float = 0.5,
    min_docs: int = 2,
) -> DataFrame:
    """Remove boilerplate spans from each document: every token covered
    by an occurrence of one of its group's boilerplate n-grams
    (:func:`boilerplate_ngrams`) is dropped; the rest re-joins in
    order.  Returns ``(doc_id, <group>, n_tokens, n_removed,
    text_clean)``.

    Plan shape: positioned shingles explode once; the boilerplate
    relation joins NULL-SAFELY on (group, shingle) — a NULL group is a
    real group and a plain equi-join would pass its docs through
    uncleaned with no signal — a shuffle join, both sides
    pre-aggregated — and covered positions collapse per doc with
    a map-side-combinable collect_set.  The fact table is scanned
    twice (shingle pass + final strip) but never crosses itself.
    The final kept-token filter scans ``__covered`` per token —
    O(tokens × covered) per doc, optimal when boilerplate is sparse
    (the designed regime); a corpus of near-fully-boilerplate long
    docs would prefer an explode/anti-join/re-aggregate shape, which
    costs a fact-scale shuffle in the COMMON case and is deliberately
    not used.
    """
    bp = boilerplate_ngrams(docs, text_col, group_col, n, min_doc_frac, min_docs)
    toks = docs.select(
        "doc_id", F.col(group_col), tokens(F.col(text_col)).alias("toks")
    )
    positioned = toks.select(
        "doc_id",
        group_col,
        F.posexplode(shingles(F.col("toks"), n)).alias("pos", "shingle"),
    )
    bps = bp.select(
        F.col(group_col).alias("__bg"), F.col("shingle").alias("__bs")
    )
    covered = (
        positioned.join(
            bps,
            F.col(group_col).eqNullSafe(F.col("__bg"))
            & (F.col("shingle") == F.col("__bs")),
        )
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("cpos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("cpos").alias("__covered"))
    )
    joined = toks.join(covered, "doc_id", "left")
    kept = F.filter(
        F.transform(F.col("toks"), lambda t, i: F.struct(i.alias("i"), t.alias("t"))),
        lambda s: ~F.coalesce(
            F.array_contains(F.col("__covered"), s["i"]), F.lit(False)
        ),
    )
    return joined.select(
        "doc_id",
        group_col,
        F.size("toks").alias("n_tokens"),
        F.coalesce(F.size("__covered"), F.lit(0)).alias("n_removed"),
        F.concat_ws(" ", F.transform(kept, lambda s: s["t"])).alias("text_clean"),
    )


def score_buckets(
    scored: DataFrame,
    by: list[str],
    score_col: str,
    n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Equal-count score buckets per group — the CCNet-style curation
    split (Wenzek et al. 2020 bucket web text per language by LM
    perplexity into head/middle/tail; downstream mixes sample by
    bucket).  ``ntile(n)`` over (score, id) — the id tiebreak makes the
    assignment total-order deterministic, so results are reproducible
    run-to-run and engine-to-engine.

    One sort-based window exchange per call; the rollup to
    (by…, bucket, n_docs, lo, hi) groups on a superset of the window
    key, so no second fact-scale shuffle.
    """
    if n < 1:
        raise ValueError(f"bucket count must be >= 1, got {n}")
    w = Window.partitionBy(*by).orderBy(score_col, id_col)
    return (
        scored.withColumn("bucket", F.ntile(n).over(w).cast("int"))
        .groupBy(*by, "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(score_col).alias("lo"),
            F.max(score_col).alias("hi"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    qscale: float = 1e6,
) -> DataFrame:
    """Per-document mean BIGRAM log-probability under the corpus's own
    add-``alpha``-smoothed bigram model — the order-2 step up from
    :func:`unigram_logprob`:

        P(w | c) = (count(c w) + α) / (count(c ·) + α·V)

    with V the corpus vocabulary size.  Repetitive documents score
    deceptively well on unigrams but reveal themselves here (their
    bigram mass concentrates); garbled token SEQUENCES (plausible words
    in implausible order) only this order catches.

    Plan: bigrams are built by zipping the token array with its shift
    (map-only), counted per (doc, bigram) with map-side partials;
    corpus bigram counts and per-context totals are second/third
    aggregates on the SAME shuffled data; vocabulary is one
    distinct-count; the context-count join keys on the context word —
    hot contexts skew, AQE's skew join handles it.  Per-bigram logs
    quantize to 1/``qscale`` before the exact integer sum (the
    ``sumd`` convention), so the per-doc mean is fold-order- and
    engine-independent up to an ulp of ``ln`` at a quantization edge.

    Documents with fewer than 2 tokens have no bigrams and are absent.
    Returns (id_col, n_bigrams, mean_logprob).
    """
    toks = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("__t")
    ).where(F.size("__t") >= 2)
    n = F.size("__t")
    bg = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("__t", 1, n - 1),
                F.slice("__t", 2, n - 1),
                lambda a, b: F.struct(
                    a.alias("ctx"), F.concat(a, F.lit(" "), b).alias("bg")
                ),
            )
        ).alias("s"),
    ).select(id_col, F.col("s.ctx").alias("ctx"), F.col("s.bg").alias("bg"))
    tf = bg.groupBy(id_col, "ctx", "bg").agg(F.count("*").alias("tf"))
    # context totals ride the bigram-vocabulary relation as a window —
    # joining a separate per-ctx aggregate back to the doc-level scored
    # relation would re-shuffle the corpus-sized tf join output by ctx;
    # this shuffles only the (ctx, bg)-level counts (integer sums, so
    # fold order cannot change the value)
    bgc = (
        tf.groupBy("ctx", "bg")
        .agg(F.sum("tf").alias("gc"))
        .withColumn("cc", F.sum("gc").over(Window.partitionBy("ctx")))
    )
    vocab = F.broadcast(
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("__w")
        )
        .where(F.col("__w") != "")
        .agg(F.count_distinct("__w").alias("__v"))
    )
    scored = tf.join(bgc, ["ctx", "bg"]).crossJoin(vocab)
    logp = F.log(
        (F.col("gc") + F.lit(alpha))
        / (F.col("cc") + F.lit(alpha) * F.col("__v"))
    )
    lq = F.floor(logp * F.lit(qscale) + F.lit(0.5)).cast("long")
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            (
                F.sum(F.col("tf") * lq).cast("double")
                / F.sum("tf")
                / F.lit(qscale)
            ).alias("mean_logprob"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    v_size: int,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-prep vocabulary audit: induce the top-``v_size``
    vocabulary by corpus frequency (ties → lexicographically smaller
    token, so the cut is deterministic) and report per-group
    out-of-vocabulary rates — the number that decides whether a
    tokenizer's vocab budget fits a new data source.

    Scale shape: one token-count aggregate (map-side combined), a
    v_size-bounded TakeOrdered for the vocabulary, then a broadcast
    left join back onto the token stream and one rollup per group —
    the corpus is scanned twice and shuffled only into the two
    aggregates; the vocabulary itself never exceeds v_size rows.

    Returns (group_col, n_tokens, n_oov, oov_rate).
    """
    if v_size < 1:
        raise ValueError(f"v_size must be >= 1, got {v_size}")
    tok = docs.select(
        group_col, F.explode(tokens(F.col(text_col))).alias("__t")
    )
    vocab = (
        tok.groupBy("__t")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), "__t")
        .limit(v_size)
        .select("__t", F.lit(1).alias("__in"))
    )
    flagged = tok.join(F.broadcast(vocab), "__t", "left")
    return flagged.groupBy(group_col).agg(
        F.count("*").alias("n_tokens"),
        F.count(F.when(F.col("__in").isNull(), 1)).alias("n_oov"),
        qd(
            F.count(F.when(F.col("__in").isNull(), 1))
            / F.count("*"),
            1e9,
        ).alias("oov_rate"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    qscale: float = 1e6,
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling" — hashed-n-gram variant reduced to the unigram feature
    space the engine's LM ops already use): per raw document, the mean
    token log-likelihood RATIO between a target-domain unigram LM and
    the raw-corpus unigram LM,

        w(d) = (1/|d|) · Σ_t tf_t(d) · [ln p_target(t) − ln p_raw(t)]

    Documents that look like the target domain score high; resample or
    take the top-k to tilt a huge raw corpus toward the target (the
    standard pretraining data-selection recipe).

    Both LMs are add-``alpha`` smoothed over the UNION vocabulary, so
    terms unseen on either side stay finite and the ratio is
    well-defined everywhere.  Each ln is quantized per term
    (``1/qscale``) BEFORE the exact integer combination — the
    unigram_logprob convention, so per-doc means are fold-order- and
    engine-independent.

    Plan: one explode per corpus → per-(doc, term) / per-term counts
    (map-side partials), a term-keyed full outer join for the union
    vocabulary (dimension-sized vs the corpus), totals as broadcast
    1-row frames, then one term-keyed join back to the raw tf relation
    — the raw corpus is scanned once, the target once; nothing
    driver-side.  Returns (id, n_tokens, dsir).
    """

    def _tf(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        ).where(F.col("term") != "")
        return toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))

    tf = _tf(raw)
    raw_c = tf.groupBy("term").agg(F.sum("tf").alias("rc"))
    # the target side only ever needs per-term totals: aggregate the
    # token stream by term directly — routing it through _tf paid a
    # wasted (doc, term)-keyed shuffle that was immediately re-reduced,
    # and needlessly required the target sample to carry id_col
    tgt_c = (
        target.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("tc"))
    )
    vocab = raw_c.join(tgt_c, "term", "full").select(
        "term",
        F.coalesce("rc", F.lit(0)).alias("rc"),
        F.coalesce("tc", F.lit(0)).alias("tc"),
    )
    totals = F.broadcast(
        vocab.agg(
            F.sum("rc").alias("__nr"),
            F.sum("tc").alias("__nt"),
            F.count("*").alias("__v"),
        )
    )
    a = float(alpha)
    lp_t = F.log(
        (F.col("tc") + F.lit(a)) / (F.col("__nt") + F.lit(a) * F.col("__v"))
    )
    lp_r = F.log(
        (F.col("rc") + F.lit(a)) / (F.col("__nr") + F.lit(a) * F.col("__v"))
    )
    s = F.lit(float(qscale))
    lq = (
        F.floor(lp_t * s + F.lit(0.5)).cast("long")
        - F.floor(lp_r * s + F.lit(0.5)).cast("long")
    )
    ratios = vocab.crossJoin(totals).select("term", lq.alias("__lq"))
    return (
        tf.join(ratios, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum(F.col("tf") * F.col("__lq")).cast("double")
                / F.sum("tf")
                / F.lit(float(qscale))
            ).alias("dsir"),
        )
    )
