"""Regression tests for the round-12 similarity/cluster review queue
(PLANS.md "round-12 queue: similarity/cluster review findings"): the
cosine NaN/zero-norm guard, LSH length validation, bucket-store reuse,
NULL-label kNN votes, the connected-components int64 round-trip id
contract, the unified NULL-id keep contract, and the O(dim²)
higher-order-function hoists.
"""

import math

import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.similarity import (
    _unit_normalized,
    ann_topk,
    cosine,
    cosine_topk,
    embedding_dup_pairs,
    knn_classify,
    knn_join,
    lsh_buckets,
    quantize_int8,
)
from emiproc_spark.operators.cluster import (
    connected_components,
    dedup_keep_best,
    dedup_keep_representative,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


# ----------------------------------------------------------------------
# finding 2: cosine() NaN / zero-norm guard
# ----------------------------------------------------------------------
def test_cosine_nan_and_zero_norm_yield_null(spark):
    df = _emb(
        spark,
        [
            (0, [1.0, 0.0]),
            (1, [float("nan"), 1.0]),
            (2, [0.0, 0.0]),
        ],
    )
    out = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id", cosine(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0))).alias("c")
        ).collect()
    }
    assert out[0] == pytest.approx(1.0)
    assert out[1] is None  # NaN component -> NULL, never NaN
    assert out[2] is None  # zero norm -> NULL, never DIVIDE_BY_ZERO


def test_cosine_topk_nan_row_cannot_rank_first(spark):
    # pre-fix, the NaN row ranked FIRST in every descending top-k
    rows = [(i, [1.0, float(i)]) for i in range(5)]
    rows.append((99, [float("nan"), 1.0]))
    rows.append((98, [0.0, 0.0]))
    out = cosine_topk(_emb(spark, rows), [1.0, 0.0], k=10).collect()
    ids = [r["vec_id"] for r in out]
    assert 99 not in ids and 98 not in ids
    assert ids[0] == 0  # exact match ranks first again


def test_knn_join_excludes_undefined_corpus_rows(spark):
    corpus = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [float("nan"), 0.0]), (4, [0.0, 0.0])],
    )
    queries = _emb(spark, [(0, [1.0, 0.0])])
    nn = knn_join(queries, corpus, k=4).collect()
    got = {r["neighbor_id"] for r in nn}
    assert got == {1, 2}
    assert all(r["cos"] is not None for r in nn)


# ----------------------------------------------------------------------
# finding 3: knn_classify NULL-label votes
# ----------------------------------------------------------------------
def test_knn_classify_ignores_null_labels(spark):
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], None),  # nearest, but unlabeled
            (2, [0.9, 0.1], None),
            (3, [0.5, 0.5], "a"),
            (4, [0.4, 0.6], "b"),
            (5, [0.45, 0.55], "a"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    queries = _emb(spark, [(0, [1.0, 0.0])])
    out = knn_classify(queries, corpus, k=3).collect()
    assert len(out) == 1
    # votes among the 3 nearest LABELED rows: a, a, b -> 'a'
    assert out[0]["pred_label"] == "a"
    assert out[0]["votes"] == 2


# ----------------------------------------------------------------------
# finding 9: lsh_buckets length validation
# ----------------------------------------------------------------------
def test_lsh_buckets_rejects_length_mismatch(spark):
    df = _emb(spark, [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0])])
    with pytest.raises(Exception, match="lsh_buckets.*dim=3"):
        lsh_buckets(df, dim=3).collect()


def test_lsh_buckets_rejects_null_vector(spark):
    df = _emb(spark, [(0, [1.0, 2.0]), (1, None)])
    with pytest.raises(Exception, match="lsh_buckets"):
        lsh_buckets(df, dim=2).collect()


# ----------------------------------------------------------------------
# finding 7: ann_topk stored-bucket reuse (the ivf_topk branch)
# ----------------------------------------------------------------------
def test_ann_topk_validates_query_length(spark):
    df = _emb(spark, [(0, [1.0, 2.0])])
    with pytest.raises(ValueError, match="query_vec"):
        ann_topk(df, [1.0], dim=2)


def test_ann_topk_reuses_stored_bucket_column(spark):
    rows = [(i, [((i * 31 + j * 7) % 19 - 9) / 9.0 for j in range(8)]) for i in range(100)]
    emb = _emb(spark, rows)
    q = rows[0][1]
    fresh = {r["vec_id"] for r in ann_topk(emb, q, dim=8, k=5).collect()}
    stored = lsh_buckets(emb, dim=8)
    reused = {r["vec_id"] for r in ann_topk(stored, q, dim=8, k=5).collect()}
    assert reused == fresh
    # proof of REUSE (not recompute): a poisoned stored assignment is
    # honored — every row in an impossible bucket means zero probes hit
    poisoned = emb.withColumn("bucket", F.lit("xxxxxxxx"))
    assert ann_topk(poisoned, q, dim=8, k=5).count() == 0


# ----------------------------------------------------------------------
# finding 8: the O(dim) aggregates are hoisted out of the lambdas
# ----------------------------------------------------------------------
def test_quantize_hoist_survives_optimizer(spark):
    emb = _emb(spark, [(0, [1.0, -4.0, 2.0])])
    plan = quantize_int8(emb)._jdf.queryExecution().optimizedPlan().toString()
    # hoisted: ONE array_max in its own projection; an inlined plan
    # duplicates it into the guard and the per-element lambda body
    assert plan.count("array_max") == 1
    row = quantize_int8(emb).collect()[0]
    assert row["qvec"] == [32, -127, 64]
    assert row["max_abs"] == 4.0


def test_unit_normalized_hoist_survives_optimizer(spark):
    emb = _emb(spark, [(0, [3.0, 4.0]), (1, [0.0, 0.0]), (2, [float("nan"), 1.0])])
    staged = _unit_normalized(emb, "embedding", ["vec_id"])
    plan = staged._jdf.queryExecution().optimizedPlan().toString()
    # one aggregate = the hoisted norm; inlining duplicates it into the
    # guard condition and the division lambda
    assert plan.count("aggregate(") == 1
    rows = {r["vec_id"]: r["__unit"] for r in staged.collect()}
    assert rows[0] == pytest.approx([0.6, 0.8])
    assert rows[1] is None  # zero norm
    assert rows[2] is None  # NaN — would otherwise poison >= checks


def test_embedding_dup_pairs_nan_vector_never_matches(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [float("nan")] * 4),
        (3, [0.0, 0.0, 0.0, 0.0]),
    ]
    pairs = embedding_dup_pairs(_emb(spark, rows), dim=4, threshold=0.9, planes=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p and 3 not in p for p in got)


# ----------------------------------------------------------------------
# findings 1/6: connected_components id contract
# ----------------------------------------------------------------------
def test_connected_components_rejects_fractional_ids(spark):
    pairs = spark.createDataFrame(
        [(7.2, 7.9)], "doc_a double, doc_b double"
    )
    with pytest.raises(Exception, match="round-trip int64"):
        connected_components(pairs).collect()


def test_connected_components_rejects_numerically_equal_strings(spark):
    pairs = spark.createDataFrame([("07", "8")], "doc_a string, doc_b string")
    with pytest.raises(Exception, match="round-trip int64"):
        connected_components(pairs).collect()


def test_connected_components_rejects_null_ids(spark):
    pairs = spark.createDataFrame(
        [(1, None), (2, 3)], "doc_a long, doc_b long"
    )
    with pytest.raises(Exception, match="NULL doc_b id"):
        connected_components(pairs).collect()


def test_connected_components_accepts_integral_strings(spark):
    pairs = spark.createDataFrame(
        [("1", "2"), ("2", "3")], "doc_a string, doc_b string"
    )
    comp = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1}


# ----------------------------------------------------------------------
# findings 1/4/5: keep-policy contracts
# ----------------------------------------------------------------------
def test_keep_representative_guards_id_coercion(spark):
    docs = spark.createDataFrame(
        [("07", "x"), ("8", "y")], "doc_id string, text string"
    )
    pairs = spark.createDataFrame([(7, 8)], "doc_a long, doc_b long")
    with pytest.raises(Exception, match="round-trip int64"):
        dedup_keep_representative(docs, pairs).collect()


def test_keep_policies_keep_null_id_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a", 0.5), (2, "a", 0.9), (None, "keyless", 0.1)],
        "doc_id long, text string, score double",
    )
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    rep = dedup_keep_representative(docs, pairs)
    assert sorted(
        (r["doc_id"] for r in rep.collect()), key=lambda x: (x is None, x)
    ) == [1, None]
    best = dedup_keep_best(docs, pairs, "score")
    assert sorted(
        (r["doc_id"] for r in best.collect()), key=lambda x: (x is None, x)
    ) == [2, None]


# ----------------------------------------------------------------------
# r12 joins/graph review: empty-interval overlap, NULL graph endpoints
# ----------------------------------------------------------------------
def test_range_join_empty_intervals_match_nothing(spark):
    from emiproc_spark.operators.joins import range_join

    left = spark.createDataFrame(
        [(1, "k", 5, 5), (2, "k", 3, 7)], "lid long, k string, start long, end long"
    )
    right = spark.createDataFrame(
        [(10, "k", 0, 10), (11, "k", 6, 6)], "rid long, k string, start long, end long"
    )
    got = {(r["lid"], r["rid"]) for r in range_join(left, right, ["k"], bucket=10).collect()}
    # the empty [5,5) and [6,6) intervals pair with nothing; pre-fix
    # (1,10), (2,11) both leaked through the cross conditions
    assert got == {(2, 10)}


def test_resample_vertical_validates_target_tops(spark):
    from emiproc_spark.operators.vertical import resample_vertical_profiles

    vp = spark.createDataFrame(
        [(1, [10.0, 20.0], [0.5, 0.5])],
        "profile_id long, heights_top_m array<double>, ratios array<double>",
    )
    # pre-fix an unsorted target list silently returned all-zero ratios
    with pytest.raises(ValueError, match="strictly increasing"):
        resample_vertical_profiles(vp, [20.0, 10.0])
    with pytest.raises(ValueError, match="strictly increasing"):
        resample_vertical_profiles(vp, [])
    ok = resample_vertical_profiles(vp, [15.0, 25.0]).collect()[0]
    assert ok["ratios"] == pytest.approx([0.75, 0.25])


def test_resolve_daytype_guards_slot_count(spark):
    from emiproc_spark.operators.interpolation import resolve_daytype

    ok = spark.createDataFrame(
        [(1, "weekday", [1.0] * 24), (1, "weekend", [2.0] * 24)],
        "profile_id long, day_type string, ratios array<double>",
    )
    row = resolve_daytype(ok).collect()[0]
    assert len(row["ratios"]) == 168
    # a typo'd day_type silently vanished in the join pre-fix,
    # compacting the array to 120 slots
    typo = spark.createDataFrame(
        [(1, "weekday", [1.0] * 24), (1, "Weekend", [2.0] * 24)],
        "profile_id long, day_type string, ratios array<double>",
    )
    with pytest.raises(Exception, match="instead of 168"):
        resolve_daytype(typo).collect()
    short = spark.createDataFrame(
        [(1, "weekday", [1.0] * 23), (1, "weekend", [2.0] * 24)],
        "profile_id long, day_type string, ratios array<double>",
    )
    with pytest.raises(Exception, match="instead of 168"):
        resolve_daytype(short).collect()


def test_fake_decode_empty_payload(spark):
    from emiproc_spark.operators.multimodal import (
        attach_binary,
        decode_image,
        extract_features,
    )

    assert decode_image(b"", fake=True).shape == (0, 0)
    docs = spark.createDataFrame([(1, ""), (2, "abcd")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in extract_features(attach_binary(docs), fake=True).collect()
    }
    # pre-fix: raw numpy "cannot reshape array of size 0" on doc 1
    assert out[1]["n_bytes"] == 0 and out[1]["mean_byte"] == 0.0
    assert out[2]["checksum"] == sum(b"abcd") % 1_000_003


def test_zorder_key_validates_range(spark):
    from emiproc_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(3, 2), (4, 0)], "x long, y long"  # 4 >= 2**2
    )
    ok = df.where(F.col("x") < 4).select(
        zorder_key("x", "y", 2).alias("z")
    ).collect()
    assert ok[0]["z"] == 0b1101  # interleave(3, 2)
    with pytest.raises(Exception, match="out of range"):
        df.select(zorder_key("x", "y", 2).alias("z")).collect()
    nulls = spark.createDataFrame([(None, 1)], "x long, y long")
    with pytest.raises(Exception, match="out of range"):
        nulls.select(zorder_key("x", "y", 2).alias("z")).collect()


def test_pagerank_rejects_null_endpoints(spark):
    from emiproc_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, None)], "src long, dst long")
    with pytest.raises(Exception, match="NULL dst endpoint"):
        pagerank(edges, iterations=1).collect()
    with pytest.raises(ValueError, match="no column"):
        pagerank(edges, src_col="nope")


# ----------------------------------------------------------------------
# r11 advisor items: shard_manifest salt passthrough, ordered-file
# mtime base re-anchoring
# ----------------------------------------------------------------------
def test_shard_manifest_follows_salt(spark):
    from emiproc_spark.operators.packing import assign_shards, shard_manifest

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    want = {
        r["shard_id"]: r["n"]
        for r in assign_shards(docs, 8, salt="mysalt")
        .groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    got = {
        r["shard_id"]: r["n_docs"]
        for r in shard_manifest(docs, 8, salt="mysalt").collect()
    }
    assert got == want  # pre-fix the manifest used the DEFAULT salt
    default = {
        r["shard_id"]: r["n_docs"] for r in shard_manifest(docs, 8).collect()
    }
    assert default != got  # the salt genuinely changes the assignment


def test_write_ordered_file_reanchors_after_recreate(spark, tmp_path):
    import os
    import shutil

    from emiproc_spark.streaming import bootstrap as bs

    d = str(tmp_path / "ordered")
    df = spark.range(3).select(F.col("id").alias("v"))
    bs.write_ordered_file(df, d, 0)
    first_base = bs._ORDERED_FILE_BASES[os.path.abspath(d)]
    # simulate a later session: the path is deleted and recreated after
    # enough wall-clock that reusing the old base would stamp stale
    # mtimes; force the stale condition by backdating the cached base
    shutil.rmtree(d)
    bs._ORDERED_FILE_BASES[os.path.abspath(d)] = first_base - 1e6
    bs.write_ordered_file(df, d, 0)
    new_base = bs._ORDERED_FILE_BASES[os.path.abspath(d)]
    assert new_base > first_base - 1e6 + 10  # re-anchored near now
    got = os.path.getmtime(os.path.join(d, "f0.parquet"))
    assert abs(got - new_base) < 2
    # eviction: a vanished directory's entry is dropped on the next call
    shutil.rmtree(d)
    bs.write_ordered_file(df, str(tmp_path / "other"), 0)
    assert os.path.abspath(d) not in bs._ORDERED_FILE_BASES


# ----------------------------------------------------------------------
# history review finding: apply_changelog op/order column validation
# ----------------------------------------------------------------------
def test_apply_changelog_validates_op_and_order_columns(spark):
    from emiproc_spark.operators.history import apply_changelog

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    # changelog has the merge columns but lacks op + order columns:
    # previously a raw UNRESOLVED_COLUMN out of the window sort
    ctl = spark.createDataFrame([(1, "b")], "k long, v string")
    with pytest.raises(ValueError, match="op/order column"):
        apply_changelog(snap, ctl, ["k"], ["ts"], op_col="op")
    ok = spark.createDataFrame(
        [(1, "b", 5, "upsert")], "k long, v string, ts long, op string"
    )
    got = apply_changelog(snap, ok, ["k"], ["ts"], op_col="op").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "b")]


# ----------------------------------------------------------------------
# text review findings: BPE apostrophe class, case-insensitive stopwords
# ----------------------------------------------------------------------
def test_bpe_lone_apostrophe_is_counted(spark):
    from emiproc_spark.operators.text import bpe_tokens

    d = spark.createDataFrame(
        [(0, "James' book"), (1, "'quoted'")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["toks"]
        for r in d.select("doc_id", bpe_tokens(F.col("text")).alias("toks")).collect()
    }
    # pre-fix the lone apostrophe vanished from the token stream
    assert out[0] == ["James", "'", " book"]
    assert out[1] == ["'", "quoted", "'"]


def test_stopwords_match_case_insensitively(spark):
    from emiproc_spark.operators.text import lang_id_score, quality_features

    d = spark.createDataFrame(
        [(0, "The cat sat on a mat")], "doc_id long, text string"
    )
    row = lang_id_score(d).collect()[0]
    # 'The' (sentence-initial) and 'a' both count: 2 of 6 tokens
    assert row["en_score"] == pytest.approx(2 / 6)
    q = quality_features(d).collect()[0]
    assert q["stopword_ratio"] == pytest.approx(2 / 6)


# ----------------------------------------------------------------------
# stats review findings: sumd overflow guards, internal-column prefix,
# strict PSI breaks (PLANS.md "round-12 queue: history/stats")
# ----------------------------------------------------------------------
def test_profile_table_epoch_ns_column_yields_null_sum(spark):
    from emiproc_spark.operators.stats import profile_table

    base = 1_700_000_000_000_000_000  # epoch-ns: |v|*1e6 far beyond int64
    df = spark.createDataFrame(
        [(i, base + i) for i in range(10)], "k long, ts_ns long"
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    # pre-fix: per-row clamp + silent int64 wrap produced garbage
    assert out["ts_ns"]["sum_num"] is None
    assert out["ts_ns"]["n_nonnull"] == 10  # the rest still profiles
    assert out["ts_ns"]["min_str"] == str(base)
    assert out["k"]["sum_num"] == pytest.approx(45.0)


def test_profile_table_sum_exact_past_int64_quantum_capacity(spark):
    from emiproc_spark.operators.stats import profile_table

    # 2000 rows at v = 8e9: quanta are 8e15 each — an int64 accumulator
    # wraps after ~1150 of them; the decimal path is exact
    df = spark.range(2000).select((F.lit(8.0e9)).alias("v"))
    out = {r["column"]: r for r in profile_table(df, ["v"]).collect()}
    assert out["v"]["sum_num"] == pytest.approx(8.0e9 * 2000)


def test_value_outliers_exact_at_wrap_magnitude(spark):
    import math

    from emiproc_spark.operators.stats import value_outliers

    # the judge's wrap case: v ~ 1e4 over 1e5 rows — Σ(v²·1e6) ≈ 1e19
    # wrapped int64 silently; decimal accumulation keeps it exact
    n = 100_000
    df = spark.range(n).select(
        F.lit("g").alias("grp"),
        (F.lit(10_000.0) + (F.col("id") % 100).cast("double")).alias("v"),
    )
    row = value_outliers(df, ["grp"], "v").collect()[0]
    vals = [10_000.0 + (i % 100) for i in range(n)]
    mean = sum(vals) / n
    var = (sum(v * v for v in vals) - n * mean * mean) / (n - 1)
    expect_max_z = max(abs(v - mean) for v in vals) / math.sqrt(var)
    assert row["n"] == n and row["n_outliers"] == 0
    assert row["max_abs_z"] == pytest.approx(expect_max_z, abs=1e-4)


def test_value_outliers_overflow_magnitude_group_is_null_not_garbage(spark):
    from emiproc_spark.operators.stats import value_outliers

    df = spark.createDataFrame(
        [("big", 1.7e18), ("big", 1.8e18), ("ok", 1.0), ("ok", 2.0)],
        "grp string, v double",
    )
    out = {r["grp"]: r for r in value_outliers(df, ["grp"], "v").collect()}
    assert out["big"]["max_abs_z"] is None and out["big"]["n_outliers"] == 0
    assert out["ok"]["max_abs_z"] is not None


def test_value_outliers_input_column_named_n(spark):
    from emiproc_spark.operators.stats import value_outliers

    df = spark.createDataFrame(
        [("a", 1.0, 7), ("a", 2.0, 7), ("a", 3.0, 7)],
        "grp string, v double, n int",
    )
    row = value_outliers(df, ["grp"], "v").collect()[0]
    assert row["n"] == 3  # group count, not the input column


def test_psi_drift_rejects_duplicate_and_nonfinite_breaks(spark):
    from emiproc_spark.operators.stats import psi_drift

    e = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="strictly-ascending"):
        psi_drift(e, e, "v", [1.0, 1.0, 2.0])
    with pytest.raises(ValueError, match="strictly-ascending"):
        psi_drift(e, e, "v", [1.0, float("inf")])


def test_sumd_safe_matches_duckdb_oracle(spark):
    """The Spark and DuckDB renderings of the overflow-safe sum agree
    bit-for-bit across the guard boundary."""
    import duckdb

    from emiproc_spark.qhelpers import sql_sumd_safe, sumd_safe

    cases = [
        [1.25, -2.5, 3.125],          # plain
        [8.0e9, 8.0e9, -1.0],         # at the magnitude limit
        [1.7e18, 1.0],                # beyond the limit -> NULL
        [float("nan"), 1.0],          # NaN -> NULL
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.agg(sumd_safe(F.col("v")).alias("s")).collect()[0]["s"]
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                    ", ".join(f"(CAST('{v!r}' AS DOUBLE))" for v in vals) +
                    ") AS t(v)")
        want = con.execute(f"SELECT {sql_sumd_safe('v')} FROM t").fetchone()[0]
        assert got == want, (vals, got, want)


def test_keep_policies_compose_with_embedding_pair_columns(spark):
    docs = spark.createDataFrame(
        [(0, 0.1), (1, 0.9), (5, 0.3)], "doc_id long, score double"
    )
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    rep = dedup_keep_representative(docs, pairs, a_col="id_a", b_col="id_b")
    assert {r["doc_id"] for r in rep.collect()} == {0, 5}
    best = dedup_keep_best(docs, pairs, "score", a_col="id_a", b_col="id_b")
    assert {r["doc_id"] for r in best.collect()} == {1, 5}
