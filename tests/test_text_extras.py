"""chunk_documents / unigram_logprob / length_percentiles edge cases."""

import math

import pytest
from pyspark.sql import functions as F

from emiproc_spark.operators.packing import chunk_documents
from emiproc_spark.operators.text import length_percentiles, unigram_logprob


def test_chunk_documents_overlap_and_tail(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, size=3, stride=2).orderBy("doc_id", "start").collect()
    got = [(r["doc_id"], r["chunk_idx"], r["start"], r["chunk_tokens"], r["chunk_text"]) for r in rows]
    assert got == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (1, 2, 4, 3, "e f g"),
        (1, 3, 6, 1, "g"),
        (2, 0, 0, 1, "x"),
    ]


def test_chunk_documents_no_overlap_covers_everything(spark):
    docs = spark.createDataFrame([(1, " ".join(str(i) for i in range(10)))],
                                 "doc_id long, text string")
    rows = chunk_documents(docs, size=4, stride=4).collect()
    # disjoint cover: concatenation of chunks reproduces the doc
    joined = " ".join(r["chunk_text"] for r in sorted(rows, key=lambda r: r["start"]))
    assert joined == " ".join(str(i) for i in range(10))


def test_chunk_documents_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0, stride=1)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=0)


def test_unigram_logprob_prefers_common_tokens(spark):
    # doc 1 repeats the corpus-dominant token; doc 2 is all hapaxes
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "zq xv wk pj")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    assert rows[1]["n_tokens"] == 4 and rows[2]["n_tokens"] == 4
    assert rows[1]["mean_logprob"] > rows[2]["mean_logprob"]
    # hand-check doc 1: p(the) = (4+1)/(8+1*5) = 5/13
    expect = math.log(5 / 13)
    assert rows[1]["mean_logprob"] == pytest.approx(expect, abs=1e-6)


def test_unigram_logprob_ignores_multispace_empties(spark):
    docs = spark.createDataFrame([(1, "a  a")], "doc_id long, text string")
    row = unigram_logprob(docs).collect()[0]
    assert row["n_tokens"] == 2  # the empty split token is dropped


def test_length_percentiles_matches_numpy(spark):
    import numpy as np

    lengths = [1, 2, 2, 3, 5, 8, 13, 21, 34, 55]
    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    qs = (0.25, 0.5, 0.75, 0.9)
    got = {r["q"]: r["value"] for r in length_percentiles(docs, qs).collect()}
    for q in qs:
        assert got[q] == pytest.approx(
            float(np.quantile(lengths, q, method="linear")), abs=1e-9
        )


def test_length_percentiles_single_doc(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    got = {r["q"]: r["value"] for r in length_percentiles(docs, (0.0, 0.5, 1.0)).collect()}
    assert got == {0.0: 3.0, 0.5: 3.0, 1.0: 3.0}


def test_chunk_plan_is_map_only(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(docs, 4, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_winnow_guarantee_and_short_docs(spark):
    from emiproc_spark.operators.dedup import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta"
    docs = spark.createDataFrame(
        [
            (1, "one two " + shared + " x y z"),
            (2, shared + " p q r s"),
            (3, "ab cd"),          # shorter than k: no fingerprints
            (4, "a b c"),          # exactly one shingle: one window
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # winnowing guarantee: any shared run of >= w+k-1 tokens yields at
    # least one common fingerprint hash
    assert by_doc[1] & by_doc[2]
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1
    # density: far fewer fingerprints than shingles
    n_sh_1 = len("one two ".split() + shared.split() + "x y z".split()) - 2
    assert len(by_doc[1]) < n_sh_1


def test_winnow_rejects_bad_params(spark):
    import pytest as _pytest

    from emiproc_spark.operators.dedup import winnow_fingerprints

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        winnow_fingerprints(docs, k=0)


def test_quality_filter_reason_order_and_disable(spark):
    from emiproc_spark.operators.text import quality_filter

    docs = spark.createDataFrame(
        [
            (1, "short doc"),                      # min_tokens
            (2, " ".join(["tok"] * 50)),           # dup_token_frac (all dup)
            (3, " ".join(f"w{i}" for i in range(50))),  # ok
            (4, " ".join(["superlongword" * 3] * 30)),  # mean_word_len
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["keep"], r["reason"]) for r in quality_filter(
        docs, min_tokens=10, max_tokens=100, max_mean_word_len=12.0,
        max_dup_token_frac=0.5,
    ).collect()}
    assert out[1] == (False, "min_tokens")
    assert out[2] == (False, "dup_token_frac")
    assert out[3] == (True, "ok")
    assert out[4] == (False, "mean_word_len")
    # disabling every rule keeps everything
    all_keep = quality_filter(
        docs, min_tokens=None, max_tokens=None, max_mean_word_len=None,
        max_dup_token_frac=None,
    )
    assert all(r["keep"] for r in all_keep.collect())


def test_quality_filter_is_map_only(spark):
    from emiproc_spark.operators.text import quality_filter

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = quality_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_winnow_overlap_pairs_and_guard(spark):
    from emiproc_spark.operators.dedup import winnow_overlap_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra trailing words here"),   # heavy overlap
            (3, " ".join(f"other{i}" for i in range(30))),  # disjoint
        ],
        "doc_id long, text string",
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["n_shared"]
             for r in winnow_overlap_pairs(docs, min_shared=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert all(3 not in p for p in pairs)
    # hot-fingerprint guard: freq cap 1 kills every shared fingerprint
    guarded = winnow_overlap_pairs(docs, min_shared=1, max_fp_freq=1)
    assert guarded.count() == 0


def test_temperature_rates_boost_tail(spark):
    from emiproc_spark.operators.sampling import temperature_rates

    docs = spark.createDataFrame(
        [(i, "big" if i < 90 else "small", 100) for i in range(100)],
        "doc_id long, source string, n_tokens long",
    )
    # τ=1: natural shares; τ=0: uniform over sources
    nat = {r["source"]: r["rate"] for r in temperature_rates(docs, 1.0, 5000).collect()}
    uni = {r["source"]: r["rate"] for r in temperature_rates(docs, 0.0, 5000).collect()}
    assert nat["big"] == nat["small"]  # τ=1: rate = budget/total, same for all
    # τ=0 splits budget equally: small source gets a much higher rate
    assert uni["small"] > uni["big"]
    assert uni["small"] == pytest.approx(min(1.0, 2500 / 1000))
    import pytest as _p

    with _p.raises(ValueError):
        temperature_rates(docs, -1.0, 10)


def test_decontaminate_spans_surgical(spark):
    from emiproc_spark.operators.packing import decontaminate_spans

    evals = spark.createDataFrame(
        [(100, "one two three four five")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "clean words only here with nothing shared at all"),
            (2, "prefix stays one two three four five suffix stays too"),
            (3, "one two three four five"),  # fully removed
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate_spans(docs, evals, n=5).collect()}
    assert out[1]["n_hits"] == 0 and out[1]["n_tokens_removed"] == 0
    assert out[1]["clean_text"] == "clean words only here with nothing shared at all"
    assert out[2]["clean_text"] == "prefix stays suffix stays too"
    assert out[2]["n_tokens_removed"] == 5
    assert out[3]["clean_text"] == "" and out[3]["n_tokens_removed"] == 5


def test_decontaminate_spans_overlapping_matches_merge(spark):
    from emiproc_spark.operators.packing import decontaminate_spans

    evals = spark.createDataFrame(
        [(100, "a b c d e f")], "doc_id long, text string"
    )
    # doc shares the 6-token run => two overlapping 5-gram hits covering 6 tokens
    docs = spark.createDataFrame(
        [(1, "x a b c d e f y")], "doc_id long, text string"
    )
    row = decontaminate_spans(docs, evals, n=5).collect()[0]
    assert row["n_hits"] == 2
    assert row["n_tokens_removed"] == 6
    assert row["clean_text"] == "x y"


def test_boilerplate_strip_semantics(spark):
    """Per-source boilerplate n-grams (>=50% of the group's docs) are
    detected and every covered token is removed; content shared across
    groups but not frequent WITHIN a group survives."""
    from pyspark.sql import functions as F

    from emiproc_spark.operators.text import boilerplate_ngrams, strip_boilerplate

    rows = [
        # source A: 3 docs share the header "join our newsletter today"
        (0, "A", "join our newsletter today alpha beta gamma"),
        (1, "A", "join our newsletter today delta epsilon"),
        (2, "A", "join our newsletter today zeta eta theta iota"),
        # one A doc without the header
        (3, "A", "completely original content here"),
        # source B: same words exist but never frequently within B
        (4, "B", "join our newsletter maybe later sometime"),
        (5, "B", "unrelated text entirely different words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    bp = boilerplate_ngrams(docs, group_col="source", min_doc_frac=0.5, min_docs=2)
    got = {(r["source"], r["shingle"]) for r in bp.collect()}
    assert ("A", "join our newsletter") in got
    assert ("A", "our newsletter today") in got
    assert all(s != "B" for s, _ in got)  # B has no frequent shingles

    out = {r["doc_id"]: r for r in strip_boilerplate(docs, group_col="source").collect()}
    assert out[0]["text_clean"] == "alpha beta gamma"
    assert out[0]["n_removed"] == 4
    assert out[1]["text_clean"] == "delta epsilon"
    assert out[3]["text_clean"] == rows[3][2]  # untouched, n_removed 0
    assert out[3]["n_removed"] == 0
    assert out[4]["text_clean"] == rows[4][2]  # B keeps everything
    # n_tokens is the pre-strip count
    assert out[0]["n_tokens"] == 7


def test_canonical_url_rules(spark):
    from emiproc_spark.operators.urls import canonical_url

    cases = [
        # (input, expected canonical)
        ("https://www.Example.com:443/a/b/#frag", "https://example.com/a/b"),
        ("HTTP://Host.org:80/", "http://host.org/"),
        ("http://host.org:8080/x", "http://host.org:8080/x"),  # non-default kept
        ("https://h.io/p?utm_source=a&b=2&a=1&fbclid=z", "https://h.io/p?a=1&b=2"),
        ("https://h.io/p?utm_source=a", "https://h.io/p"),  # tracking-only
        ("https://h.io", "https://h.io/"),  # empty path → root
        ("https://h.io/p/?gclid=1&ref=x#s", "https://h.io/p"),
        ("https://h.io/p?refresh=1", "https://h.io/p?refresh=1"),  # not 'ref'
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    for (inp, want), out in zip(cases, got):
        assert out == want, (inp, out, want)


def test_dedup_by_url_keeps_min_id(spark):
    from emiproc_spark.operators.urls import dedup_by_url

    docs = spark.createDataFrame(
        [
            (1, "https://www.A.com/x"),
            (2, "https://a.com/x/"),
            (3, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r["canon_url"]: (r["keeper"], r["n_docs"]) for r in dedup_by_url(docs).collect()}
    assert out == {"https://a.com/x": (1, 2), "https://a.com/y": (3, 1)}


def test_bigram_logprob_prefers_coherent_sequences(spark):
    """A document reusing the corpus's common bigrams outscores one
    with the same UNIGRAM distribution but shuffled order."""
    from emiproc_spark.operators.text import bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "mat the on sat cat the"),  # same tokens, scrambled
            (4, "x"),                        # < 2 tokens -> absent
        ],
        schema="doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bigrams"] == 5
    assert out[1]["mean_logprob"] == out[2]["mean_logprob"]
    assert out[1]["mean_logprob"] > out[3]["mean_logprob"]


def test_vocab_coverage_oov_rates(spark):
    from emiproc_spark.operators.text import vocab_coverage

    docs = spark.createDataFrame(
        [
            ("a", "x x x y"),       # with V=2 vocab {x, y}: 0 OOV
            ("b", "x q r"),         # 2 OOV of 3
            ("b", "y y z"),         # 1 OOV of 3
        ],
        "source string, text string",
    )
    out = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in vocab_coverage(docs, v_size=2).collect()
    }
    assert out["a"] == (4, 0, 0.0)
    assert out["b"] == (6, 3, 0.5)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="v_size"):
        vocab_coverage(docs, 0)


def test_length_percentiles_ignore_null_text(spark):
    """NULL-text docs must not enter the histogram — counted in, they
    inflate N and shift every percentile low (the oracle's
    quantile_cont ignores NULLs)."""
    from emiproc_spark.operators.text import length_percentiles

    base = [(i, "w " * 10) for i in range(10)]
    with_null = base + [(100 + j, None) for j in range(5)]
    a = length_percentiles(
        spark.createDataFrame(base, "doc_id long, text string")
    ).collect()
    b = length_percentiles(
        spark.createDataFrame(with_null, "doc_id long, text string")
    ).collect()
    assert {(r["q"], r["value"]) for r in a} == {(r["q"], r["value"]) for r in b}


def test_fingerprint_null_text_is_null(spark):
    """md5('') for NULL text would cluster every unfetched doc with the
    genuinely-empty ones; NULL text fingerprints as NULL."""
    from emiproc_spark.operators.text import fingerprint

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["fp"] for r in fingerprint(docs).collect()}
    assert fps[1] is None
    assert fps[2] is not None and fps[2] != fps[3]


def test_boilerplate_null_group_not_silently_skipped(spark):
    """A NULL source is a real group: its boilerplate must be detected
    and stripped — the plain equi-joins used to drop it, passing those
    docs through uncleaned with no signal."""
    from emiproc_spark.operators.text import boilerplate_ngrams, strip_boilerplate

    bp = "shared header line"
    docs = spark.createDataFrame(
        [(i, None, f"{bp} unique{i} content words here") for i in range(4)],
        "doc_id long, source string, text string",
    )
    grams = boilerplate_ngrams(docs, n=3, min_doc_frac=0.5)
    assert grams.where(F.col("source").isNull()).count() > 0
    stripped = strip_boilerplate(docs, n=3, min_doc_frac=0.5)
    rows = stripped.collect()
    assert all(r["n_removed"] > 0 for r in rows)
    assert all(bp not in r["text_clean"] for r in rows)


def test_shingles_validates_n(spark):
    import pytest

    from emiproc_spark.operators.text import shingles

    with pytest.raises(ValueError, match="shingle width"):
        shingles(F.col("toks"), 0)


def test_dsir_target_needs_no_id(spark):
    """The target-domain sample is only a term distribution — it must
    not be required to carry the raw corpus's id column."""
    from emiproc_spark.operators.text import dsir_weights

    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([("alpha beta alpha",)], "text string")
    rows = {r["doc_id"]: r["dsir"] for r in dsir_weights(raw, target).collect()}
    assert rows[1] > rows[2]  # the alpha/beta doc looks like the target
