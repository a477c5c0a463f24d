"""Unit tests for corpus-curation operators: connected components,
deterministic sampling / mixing, repetition features, PII scrub,
TF-IDF top-k."""

import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators import cluster as cl
from emiproc_spark.operators import sampling as sp
from emiproc_spark.operators import text as tx


def test_connected_components_chain(spark):
    # chain 1-2, 2-3, 3-4 plus isolated pair 10-11: two components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    out = {
        r["node"]: r["component"]
        for r in cl.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # a 40-node path exercises the pointer-jumping log-round convergence
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    out = cl.connected_components(pairs, max_iter=10).collect()
    assert {r["component"] for r in out} == {0}
    assert len(out) == 41


def test_dedup_keep_representative_collapses_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(6)], "doc_id long, text string"
    )
    # A-B, B-C chain: greedy pair-drop would also drop C's pair partner
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(
        r["doc_id"] for r in cl.dedup_keep_representative(docs, pairs).collect()
    )
    assert kept == [0, 1, 4, 5]


def test_stratified_sample_deterministic_and_bounded(spark):
    docs = spark.createDataFrame(
        [(i, "web" if i % 2 else "books") for i in range(2000)],
        "doc_id long, source string",
    )
    rates = {"web": 0.25, "books": 1.0}
    a = sorted(r["doc_id"] for r in sp.stratified_sample(docs, rates).collect())
    b = sorted(
        r["doc_id"]
        for r in sp.stratified_sample(docs.repartition(7), rates).collect()
    )
    assert a == b, "sampling must be independent of partitioning"
    n_web = sum(1 for i in a if i % 2)
    assert 1000 * 0.15 < n_web < 1000 * 0.35  # ~25% of the 1000 web docs
    assert sum(1 for i in a if not i % 2) == 1000  # books kept whole


def test_mixture_rates_hit_budget(spark):
    docs = spark.createDataFrame(
        [(i, "web", 100) for i in range(100)]
        + [(1000 + i, "code", 100) for i in range(100)],
        "doc_id long, source string, n_tokens long",
    )
    rates = {
        r["source"]: r["rate"]
        for r in sp.mixture_rates(
            docs, {"web": 3.0, "code": 1.0}, token_budget=8000.0
        ).collect()
    }
    # web wants 6000 of 10000 available -> rate 0.6; code wants 2000 -> 0.2
    assert abs(rates["web"] - 0.6) < 1e-12
    assert abs(rates["code"] - 0.2) < 1e-12
    # oversubscribed stratum clamps to 1.0
    rates2 = {
        r["source"]: r["rate"]
        for r in sp.mixture_rates(
            docs, {"web": 9.0, "code": 1.0}, token_budget=20000.0
        ).collect()
    }
    assert rates2["web"] == 1.0


def test_repetition_features(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y z w")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in tx.repetition_features(docs).collect()}
    # 6 tokens, 2 distinct -> dup frac 4/6; bigram 'a b' appears 3 of 5
    assert abs(out[1]["dup_token_frac"] - 4 / 6) < 1e-12
    assert abs(out[1]["top_bigram_share"] - 3 / 5) < 1e-12
    assert out[2]["dup_token_frac"] == 0.0


def test_scrub_pii(spark):
    docs = spark.createDataFrame(
        [(1, "mail bob@x.org or 415-555-0000 now")], "doc_id long, text string"
    )
    r = tx.scrub_pii(docs).collect()[0]
    assert r["n_emails"] == 1 and r["n_phones"] == 1
    assert r["scrubbed"] == "mail <EMAIL> or <PHONE> now"


def test_tfidf_topk_ranks_rare_terms(spark):
    docs = spark.createDataFrame(
        [(1, "common rare rare"), (2, "common other"), (3, "common x")],
        "doc_id long, text string",
    )
    out = tx.tfidf_topk(docs, k=1, log_idf=False).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[1] == "rare"  # tf=2, df=1 beats common tf=1 df=3
    assert all(r["rank"] == 1 for r in out)


def test_decontaminate_drops_overlapping_docs(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps away"),  # 5-gram hit
            (2, "completely unrelated content with no overlap at all"),
            (3, "short doc"),  # < 5 tokens: no grams, never contaminated
        ],
        "doc_id long, text string",
    )
    from emiproc_spark.operators import packing as pk

    kept = sorted(r["doc_id"] for r in pk.decontaminate(corpus, ev, n=5).collect())
    assert kept == [2, 3]
    flagged = pk.decontaminate(corpus, ev, n=5, keep=False).collect()
    assert [r["doc_id"] for r in flagged] == [1]


def test_pack_sequences_offsets_and_partition_stability(spark):
    from emiproc_spark.operators import packing as pk

    docs = spark.createDataFrame(
        [(i, 100 + i % 7) for i in range(200)], "doc_id long, n_tokens long"
    )
    a = pk.pack_sequences(docs, ctx_len=512, n_shards=4).collect()
    b = pk.pack_sequences(docs.repartition(13), ctx_len=512, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # per shard: offsets start at 0 and are contiguous (sum of sizes)
    by_shard = {}
    sizes = {i: 100 + i % 7 for i in range(200)}
    for r in a:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["start_offset"])
        assert rows[0]["start_offset"] == 0
        run = 0
        for r in rows:
            assert r["start_offset"] == run
            assert r["seq_first"] == run // 512
            assert r["seq_last"] == (run + sizes[r["doc_id"]] - 1) // 512
            run += sizes[r["doc_id"]]


def test_shard_manifest_conserves_totals(spark):
    from emiproc_spark.operators import packing as pk

    docs = spark.createDataFrame(
        [(i, 10) for i in range(1000)], "doc_id long, n_tokens long"
    )
    rows = pk.shard_manifest(docs, n_shards=8).collect()
    assert sum(r["n_docs"] for r in rows) == 1000
    assert sum(r["total_tokens"] for r in rows) == 10000
    assert len(rows) == 8  # all shards populated at this size


def test_repetition_features_short_docs_null_not_crash(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in tx.repetition_features(docs).collect()}
    assert out[1]["top_bigram_share"] is None  # 1 token, no bigram
    assert out[3]["top_bigram_share"] == 1.0  # its single bigram is the top one


def test_scrub_pii_email_consumes_phone_digits(spark):
    docs = spark.createDataFrame(
        [(1, "call 415-555-0123@mail.com now")], "doc_id long, text string"
    )
    r = tx.scrub_pii(docs).collect()[0]
    # the digits are part of the email match: one email, zero phones,
    # and the audit agrees with the substitutions actually made
    assert r["n_emails"] == 1 and r["n_phones"] == 0
    assert r["scrubbed"] == "call <EMAIL> now"


def test_transform_columns_identity_and_collision(spark):
    from emiproc_spark.functions.crs import WGS84, transform_columns

    df = spark.createDataFrame([(7.0, 47.0, 9.9)], "lon double, lat double, x double")
    out = transform_columns(df, WGS84, WGS84)
    assert out.columns.count("x") == 1  # pre-existing x replaced, not duplicated
    row = out.collect()[0]
    assert row["x"] == 7.0 and row["y"] == 47.0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir configured, the CC loop uses reliable
    checkpoints (files under the dir) instead of localCheckpoint."""
    import os

    sc = spark.sparkContext
    sc.setCheckpointDir(str(tmp_path / "ck"))
    try:
        from emiproc_spark.operators.cluster import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        comp = {
            r["node"]: r["component"]
            for r in connected_components(
                pairs, reliable_checkpoints=True
            ).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        ck_files = [
            os.path.join(r, f)
            for r, _d, fs in os.walk(tmp_path / "ck")
            for f in fs
        ]
        assert ck_files, "no reliable checkpoint files written"
    finally:
        # reset so other tests keep the localCheckpoint fast path
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.empty()
        )


def test_connected_components_raises_on_non_convergence(spark):
    import pytest

    from emiproc_spark.operators.cluster import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=1)
    # enough rounds: one component labeled 0
    out = connected_components(chain, max_iter=10).collect()
    assert {r["component"] for r in out} == {0}


def test_bloom_decontaminate_matches_exact(spark):
    from emiproc_spark.operators import packing as pk

    corpus = spark.createDataFrame(
        [(i, f"filler {i} alpha beta gamma delta epsilon zeta eta") for i in range(40)]
        + [
            (100, "prefix the secret eval answer is forty two suffix"),
            (101, "unrelated words only nothing shared with the suite"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "xx the secret eval answer is forty two yy")],
        "eid long, text string",
    )
    exact = {r["doc_id"] for r in pk.decontaminate(corpus, ev, n=5, keep=False).collect()}
    bloom = {r["doc_id"] for r in pk.decontaminate_bloom(corpus, ev, n=5, keep=False).collect()}
    assert bloom == exact == {100}
    assert pk.decontaminate_bloom(corpus, ev, n=5).count() == corpus.count() - 1


def test_bloom_decontaminate_empty_eval_set(spark):
    from emiproc_spark.operators import packing as pk

    corpus = spark.createDataFrame(
        [(0, "some words here that are long enough for five grams")],
        "doc_id long, text string",
    )
    # eval docs too short to yield a single 5-gram → empty dictionary
    ev = spark.createDataFrame([(0, "too short")], "eid long, text string")
    assert pk.decontaminate_bloom(corpus, ev, n=5, keep=False).count() == 0
    assert pk.decontaminate_bloom(corpus, ev, n=5).count() == 1


def test_bloom_layout_sane():
    from emiproc_spark.operators.packing import _bloom_layout

    m, k = _bloom_layout(1_000_000, 1e-3)
    assert m % 64 == 0
    assert 13_000_000 < m < 16_000_000  # ~14.4 bits/item at 0.1% fpr
    assert 8 <= k <= 12
    m0, k0 = _bloom_layout(0, 1e-3)  # degenerate input stays valid
    assert m0 >= 64 and k0 >= 1


def test_weighted_sample_semantics(spark):
    rows = [(i, "a" if i < 200 else "b", 1.0 if i % 2 else 1000.0) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    out = sp.weighted_sample(df, 10, "w", by=["source"]).collect()
    assert len(out) == 20
    # inclusion probability ∝ weight: the 1000× heavier rows dominate
    heavy = sum(1 for r in out if r["w"] == 1000.0)
    assert heavy >= 18
    # deterministic under repartitioning
    again = sp.weighted_sample(df.repartition(13), 10, "w", by=["source"]).collect()
    assert {r["doc_id"] for r in again} == {r["doc_id"] for r in out}
    # null / non-positive weights are never selected
    bad = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "doc_id long, w double"
    )
    got = sp.weighted_sample(bad, 4, "w").collect()
    assert [r["doc_id"] for r in got] == [1]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        sp.weighted_sample(df, 0, "w")


def test_weighted_sample_global_is_topk_plan(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 9 + 1.0).alias("w")
    )
    out = sp.weighted_sample(df, 25, "w")
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "TakeOrderedAndProject" in plan
    assert out.count() == 25


def test_weighted_sample_excludes_nan_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, float("nan")), (3, 2.0)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in sp.weighted_sample(df, 3, "w").collect()}
    assert got == {1, 3}


def test_heavy_hitters_exact_on_skewed_data(spark):
    from emiproc_spark.operators.hotkeys import heavy_hitters

    rows = (
        [("hot",)] * 500 + [("warm",)] * 200 + [("mild",)] * 50
        + [(f"cold{i}",) for i in range(300)] + [(None,)] * 5
    )
    df = spark.createDataFrame(rows, "v string").repartition(7)
    got = [(r["v"], r["n"]) for r in heavy_hitters(df, "v", k=3, capacity=64).collect()]
    assert got == [("hot", 500), ("warm", 200), ("mild", 50)]
    # determinism under repartitioning for the clearly-heavy head
    again = [(r["v"], r["n"]) for r in
             heavy_hitters(df.repartition(3), "v", k=3, capacity=64).collect()]
    assert again == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "v", k=10, capacity=5)


def test_profile_table(spark):
    from emiproc_spark.operators.stats import profile_table

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (3, None, 0.5), (3, "b", -1.0)],
        "id long, s string, v double",
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert set(out) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["s"]["n_nonnull"] == 3
    assert out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["sum_num"] is None
    assert out["id"]["n_distinct"] == 3
    assert out["v"]["sum_num"] == pytest.approx(2.0)
    assert out["v"]["min_str"] == "-1.0"

    sub = profile_table(df, ["id"])
    assert sub.count() == 1

    with pytest.raises(ValueError, match="no such columns"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df, [])


def test_curate_corpus_end_to_end(spark):
    from emiproc_spark.pipelines import curate_corpus

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base + " zero"),                      # keeper
        (1, base + " zero"),                      # exact dup of 0
        (2, base + " nearly zero"),               # near dup of 0
        (3, "completely different words about spark catalyst tungsten "
            "execution engines and columnar formats in modern systems"),
        (4, "short doc"),                          # fails min_tokens
        (5, "leaked eval answer sequence alpha beta gamma delta epsilon "
            "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    evals = spark.createDataFrame(
        [(100, "answer sequence alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs, evals, jaccard_threshold=0.5, min_tokens=5, ctx_len=16,
        n_shards=2,
    )
    assert {r["doc_id"] for r in out["exact_kept"].collect()} == {0, 2, 3, 4, 5}
    pairs = {(r["doc_a"], r["doc_b"]) for r in out["near_pairs"].collect()}
    assert (0, 2) in pairs
    assert {r["doc_id"] for r in out["deduped"].collect()} == {0, 3, 4, 5}
    reasons = {r["doc_id"]: r["reason"] for r in out["quality"].collect()}
    assert reasons[4] != "ok" and reasons[0] == "ok"
    assert {r["doc_id"] for r in out["kept"].collect()} == {0, 3, 5}
    assert {r["doc_id"] for r in out["clean"].collect()} == {0, 3}  # 5 leaked
    packed = {r["doc_id"]: r for r in out["packed"].collect()}
    assert set(packed) == {0, 3}
    assert all(r["seq_last"] >= r["seq_first"] >= 0 for r in packed.values())
    # no eval set, no packing: stages degrade to identity
    out2 = curate_corpus(docs, None, jaccard_threshold=0.5, min_tokens=5,
                         ctx_len=None)
    assert {r["doc_id"] for r in out2["clean"].collect()} == {0, 3, 5}
    assert out2["packed"] is None


def test_mixture_plan_epochs_and_deficit(spark):
    """Under-represented sources plan >1 epochs (capped at max_epochs,
    deficit reported); over-represented ones plan a plain rate < 1."""
    docs = spark.createDataFrame(
        [(i, "web", 100) for i in range(100)]
        + [(1000 + i, "code", 100) for i in range(10)],
        "doc_id long, source string, n_tokens long",
    )
    plan = {
        r["source"]: r
        for r in sp.mixture_plan(
            docs, {"web": 1.0, "code": 1.0}, token_budget=8000.0,
            max_epochs=3.0,
        ).collect()
    }
    # web: wants 4000 of 10000 -> 0.4 "epochs" (a plain rate)
    assert abs(plan["web"]["epochs"] - 0.4) < 1e-12
    assert plan["web"]["deficit_tokens"] == 0.0
    # code: wants 4000 of 1000 -> 4 epochs, capped at 3 -> 1000 deficit
    assert plan["code"]["epochs"] == 3.0
    assert abs(plan["code"]["achieved_tokens"] - 3000.0) < 1e-12
    assert abs(plan["code"]["deficit_tokens"] - 1000.0) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="max_epochs"):
        sp.mixture_plan(docs, {"web": 1.0}, 1.0, max_epochs=0.5)


def test_mixture_plan_absent_and_zero_token_sources(spark):
    """A weighted source with NO corpus rows (or zero tokens) must
    still get a plan row with epochs=0 and the full target as deficit
    — an inner join dropped it entirely, and target/0 -> NULL made
    F.least silently plan max_epochs over nothing."""
    docs = spark.createDataFrame(
        [(1, "web", 100), (2, "web", 100), (3, "empty", 0)],
        "doc_id long, source string, n_tokens long",
    )
    plan = {
        r["source"]: r
        for r in sp.mixture_plan(
            docs,
            {"web": 1.0, "empty": 1.0, "ghost": 2.0},
            token_budget=400.0,
            max_epochs=4.0,
        ).collect()
    }
    assert set(plan) == {"web", "empty", "ghost"}
    # ghost: weighted but absent from the corpus -> 0 avail, 0 epochs,
    # full target (400 * 2/4 = 200) as deficit
    assert plan["ghost"]["avail_tokens"] == 0.0
    assert plan["ghost"]["epochs"] == 0.0
    assert abs(plan["ghost"]["deficit_tokens"] - 200.0) < 1e-12
    # empty: present but zero tokens -> same contract (target 100)
    assert plan["empty"]["epochs"] == 0.0
    assert abs(plan["empty"]["deficit_tokens"] - 100.0) < 1e-12
    # web unaffected: wants 100 of 200 -> rate 0.5, no deficit
    assert abs(plan["web"]["epochs"] - 0.5) < 1e-12
    assert plan["web"]["deficit_tokens"] == 0.0
    # the materializer yields zero rows for both degenerate sources
    out = sp.apply_mixture_epochs(
        docs, sp.mixture_plan(
            docs, {"web": 1.0, "empty": 1.0, "ghost": 2.0},
            token_budget=400.0, max_epochs=4.0,
        )
    ).collect()
    assert {r["source"] for r in out} == {"web"}


def test_apply_mixture_epochs_replicates_and_thins(spark):
    """epochs = 2.5 -> every doc appears in epochs 0 and 1, and ~half
    flip into epoch 2; epochs = 0.25 -> single thinned pass; the
    result is partitioning-independent (pure key hash)."""
    docs = spark.createDataFrame(
        [(i, "code", 100) for i in range(400)]
        + [(10_000 + i, "web", 100) for i in range(400)],
        "doc_id long, source string, n_tokens long",
    )
    plan = spark.createDataFrame(
        [("code", 2.5), ("web", 0.25)], "source string, epochs double"
    )
    out = sp.apply_mixture_epochs(docs, plan).collect()
    code = [(r["doc_id"], r["epoch"]) for r in out if r["source"] == "code"]
    web = [(r["doc_id"], r["epoch"]) for r in out if r["source"] == "web"]
    # full epochs are exact
    assert sum(1 for _, e in code if e == 0) == 400
    assert sum(1 for _, e in code if e == 1) == 400
    n_frac = sum(1 for _, e in code if e == 2)
    assert 400 * 0.35 < n_frac < 400 * 0.65
    # web: one thinned pass only, ~25%
    assert all(e == 0 for _, e in web)
    assert 400 * 0.12 < len(web) < 400 * 0.40
    # determinism across partitioning
    again = sp.apply_mixture_epochs(docs.repartition(7), plan).collect()
    assert {(r["doc_id"], r["epoch"]) for r in again} == {
        (r["doc_id"], r["epoch"]) for r in out
    }


def test_apply_mixture_epochs_zero_epochs_yields_nothing(spark):
    """epochs == 0 (zero weight or zero budget) must produce ZERO rows
    — sequence(0, ceil(0)-1) counts DOWN to [0, -1] and the spurious
    epoch=-1 replica passed the keep predicate before the guard."""
    docs = spark.createDataFrame(
        [(1, "dead", 10), (2, "live", 10)],
        "doc_id long, source string, n_tokens long",
    )
    plan = spark.createDataFrame(
        [("dead", 0.0), ("live", 1.0)], "source string, epochs double"
    )
    out = sp.apply_mixture_epochs(docs, plan).collect()
    assert [(r["doc_id"], r["epoch"]) for r in out] == [(2, 0)]


def test_shard_coin_independent_of_sampler_coin(spark):
    """Sampling with the default (unsalted) coin then sharding must
    spread survivors over ALL shards — the shard coin is salted, so the
    two decisions are independent (unsalted, a 10% sample landed
    entirely in the bottom shards and packing parallelism collapsed)."""
    from emiproc_spark.operators.packing import assign_shards
    from emiproc_spark.operators.sampling import sample_fraction

    docs = spark.range(20_000).select(F.col("id").alias("doc_id"))
    surv = sample_fraction(docs, 0.1)
    shards = assign_shards(surv, 16)
    used = shards.select("shard_id").distinct().count()
    assert used == 16
    # and the spread is roughly balanced, not just nonempty
    counts = [r["n"] for r in shards.groupBy("shard_id").agg(
        F.count("*").alias("n")).collect()]
    assert min(counts) > 0.5 * (sum(counts) / 16)


def test_weighted_sample_small_weights_stay_weighted(spark):
    """Normalized weights (w ~ 1e-6) must still yield a weight-biased
    selection — the direct pow(u, 1/w) score underflowed to 0.0 for
    ~99.9% of rows and filled the slots by ascending doc_id instead."""
    from emiproc_spark.operators.sampling import weighted_sample

    n = 20_000
    # tiny uniform weights except heavy favorites sprinkled at high ids
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 == 99, 5e-4).otherwise(1e-6).alias("w"),
    )
    got = weighted_sample(docs, k=100, weight_col="w")
    ids = [r["doc_id"] for r in got.collect()]
    assert len(ids) == 100
    heavy = sum(1 for i in ids if i % 100 == 99)
    # 1% of rows hold ~83% of the weight mass: they must dominate the
    # sample (underflow regression picked doc_ids 0..99 instead)
    assert heavy > 50, f"only {heavy} heavy rows selected: {sorted(ids)[:10]}"
    assert ids != sorted(range(100))


def test_mixture_and_temperature_rates_zero_token_stratum(spark):
    """A weighted source whose rows all have 0/NULL tokens must get
    rate 0.0, not the silent 1.0 that budget*w/0 -> NULL -> F.least
    produced."""
    from emiproc_spark.operators.sampling import mixture_rates, temperature_rates

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 0), ("c", None)],
        "source string, n_tokens int",
    )
    rates = {
        r["source"]: r["rate"]
        for r in mixture_rates(
            df, {"a": 1.0, "b": 1.0, "c": 1.0}, token_budget=50
        ).collect()
    }
    assert rates["b"] == 0.0 and rates["c"] == 0.0 and 0 < rates["a"] <= 1.0
    trates = {
        r["source"]: r["rate"]
        for r in temperature_rates(df, 0.5, token_budget=50).collect()
    }
    assert trates["b"] == 0.0 and trates["c"] == 0.0 and 0 < trates["a"] <= 1.0


def test_decontaminate_null_doc_id_raises(spark):
    import pytest

    from emiproc_spark.operators import packing as pk

    ev = spark.createDataFrame(
        [(1, "secret eval phrase one two")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [(None, "secret eval phrase one two plus filler"),
         (2, "clean text with none of it at all")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="NULL doc_id"):
        pk.decontaminate(corpus, ev, n=5).count()
    # collect, not count: under count() Catalyst ELIMINATES the spans
    # path's unique-key left join (cardinality-preserving), so no key —
    # and no raise — is ever evaluated; any consumer that reads the
    # cleaned columns (i.e. every real one) evaluates the join key
    with pytest.raises(Exception, match="NULL doc_id"):
        pk.decontaminate_spans(corpus, ev, n=5).collect()
    with pytest.raises(Exception, match="NULL doc_id"):
        pk.decontaminate_bloom(corpus, ev, n=5).count()


def test_pack_sequences_null_size_raises(spark):
    import pytest

    from emiproc_spark.operators.packing import pack_sequences, shard_manifest

    docs = spark.createDataFrame(
        [(1, 10), (2, None), (3, 7)], "doc_id long, n_tokens int"
    )
    with pytest.raises(Exception, match="NULL n_tokens for doc_id=2"):
        pack_sequences(docs, ctx_len=8).collect()
    with pytest.raises(Exception, match="NULL n_tokens"):
        shard_manifest(docs, 4).collect()


def test_chunk_documents_skip_null_and_empty(spark):
    from emiproc_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two three four")],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, size=3, stride=2).collect()
    assert {r["doc_id"] for r in rows} == {3}
    assert all(r["chunk_text"] for r in rows)


def test_bloom_fpr_validated(spark):
    import pytest

    from emiproc_spark.operators.packing import decontaminate_bloom

    ev = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    c = spark.createDataFrame([(2, "a b c d e f")], "doc_id long, text string")
    for bad in (0.0, 1.0, -1.0, 2.0):
        with pytest.raises(ValueError, match="fpr"):
            decontaminate_bloom(c, ev, fpr=bad)


def test_cluster_split_tolerates_component_column(spark):
    from emiproc_spark.operators.sampling import cluster_split

    df = spark.createDataFrame(
        [(i, f"biz{i}") for i in range(40)], "doc_id long, component string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    out = cluster_split(df, pairs, {"train": 0.8, "test": 0.2})
    rows = {r["doc_id"]: (r["split"], r["component"]) for r in out.collect()}
    assert len(rows) == 40
    # the business column survives untouched and the cluster is atomic
    assert rows[0][1] == "biz0"
    assert rows[0][0] == rows[1][0] == rows[2][0]
