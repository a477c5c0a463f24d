"""Property tests for the round-7 quality/drift/split operators against
independent Python reference models on random inputs."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.operators.sampling import cluster_split, hash_split
from emiproc_spark.operators.stats import psi_drift

vals = st.lists(
    st.one_of(st.integers(-20, 20).map(float), st.none()),
    min_size=0, max_size=25,
)


@given(vals, vals, st.lists(st.integers(-15, 15), min_size=1, max_size=4,
                            unique=True).map(sorted))
@settings(max_examples=10, deadline=None)
def test_psi_drift_matches_reference_model(spark, ev, av, breaks):
    e = spark.createDataFrame([(v,) for v in ev] or [(None,)], "v double")
    a = spark.createDataFrame([(v,) for v in av] or [(None,)], "v double")
    got = {
        r["bin"]: (r["n_expected"], r["n_actual"], r["psi_term"])
        for r in psi_drift(e, a, "v", [float(b) for b in breaks]).collect()
    }
    nb = len(breaks) + 1

    def hist(xs):
        h = [0] * nb
        for x in xs:
            if x is not None:
                h[sum(1 for b in breaks if x >= b)] += 1
        return h

    he, ha = hist(ev), hist(av)
    ne, na = sum(he), sum(ha)
    assert set(got) == set(range(nb))
    for i in range(nb):
        pe = (he[i] + 1.0) / (ne + 1.0 * nb)
        pa = (ha[i] + 1.0) / (na + 1.0 * nb)
        term = math.floor((pa - pe) * math.log(pa / pe) * 1e9 + 0.5) / 1e9
        assert got[i] == (he[i], ha[i], term), i


@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0, max_size=15,
    )
)
@settings(max_examples=10, deadline=None)
def test_cluster_split_pairs_never_straddle(spark, edges):
    docs = spark.range(61).selectExpr("id AS doc_id")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(None, None)],
        "doc_a long, doc_b long",
    ).where("doc_a IS NOT NULL")
    fr = {"train": 0.6, "val": 0.2, "test": 0.2}
    got = {
        r["doc_id"]: r["split"]
        for r in cluster_split(docs, pairs, fr).collect()
    }
    assert set(got) == set(range(61))
    # invariant 1: every edge lands inside one split
    for a, b in edges:
        assert got[a] == got[b], (a, b)
    # invariant 2: nodes untouched by any edge keep the plain
    # hash_split assignment (same ladder keyed on their own id)
    base = {
        r["doc_id"]: r["split"] for r in hash_split(docs, fr).collect()
    }
    touched = {x for e in edges for x in e}
    for i in set(range(61)) - touched:
        assert got[i] == base[i], i


def test_dsir_weights_prefers_target_like_docs(spark):
    from emiproc_spark.operators.text import dsir_weights

    target = spark.createDataFrame(
        [(100 + i, "physics quantum field theory") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "physics quantum notes"),       # target-like
            (2, "cat dog bird fish"),           # off-domain
            (3, "quantum field lecture"),       # target-like
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["dsir"] for r in dsir_weights(raw, target).collect()}
    assert got[1] > got[2] and got[3] > got[2]
    # weights are mean log-ratios: off-domain-only tokens score negative
    assert got[2] < 0


# --- mixture_plan invariants against a Python reference model ---------

_mix_corpus = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50)),
    min_size=0, max_size=20,
)
_mix_weights = st.dictionaries(
    st.sampled_from(["a", "b", "c", "ghost"]),
    st.floats(0.1, 10.0, allow_nan=False),
    min_size=1, max_size=4,
)


@given(_mix_corpus, _mix_weights, st.floats(0.0, 5000.0),
       st.floats(1.0, 6.0))
@settings(max_examples=15, deadline=None)
def test_mixture_plan_matches_reference_model(spark, corpus, weights,
                                              budget, max_epochs):
    """Invariants on random corpora/weights: every weighted source gets
    exactly one row; epochs in [0, max_epochs]; achieved + deficit ==
    target (within fp); epochs == 0 iff the source has no tokens (when
    target > 0); the whole plan matches a dict-based reference."""
    from emiproc_spark.operators.sampling import mixture_plan

    docs = spark.createDataFrame(
        [(i, s, n) for i, (s, n) in enumerate(corpus)] or [(0, "zz", 0)],
        "doc_id long, source string, n_tokens long",
    )
    plan = {
        r["source"]: r
        for r in mixture_plan(
            docs, weights, budget, max_epochs=max_epochs
        ).collect()
    }
    assert set(plan) == set(weights)
    wsum = sum(weights.values())
    for s, w in weights.items():
        row = plan[s]
        avail = float(sum(n for src, n in corpus if src == s))
        target = budget * (w / wsum)
        assert row["avail_tokens"] == avail
        assert abs(row["target_tokens"] - target) < 1e-9 * max(1.0, target)
        assert 0.0 <= row["epochs"] <= max_epochs
        if avail > 0:
            exp_epochs = min(max_epochs, target / avail)
        else:
            exp_epochs = 0.0
        assert abs(row["epochs"] - exp_epochs) < 1e-12 * max(1.0, exp_epochs)
        exp_achieved = min(target, avail * max_epochs)
        assert abs(row["achieved_tokens"] - exp_achieved) < 1e-9 * max(
            1.0, exp_achieved
        )
        assert abs(
            (row["achieved_tokens"] + row["deficit_tokens"]) - target
        ) < 1e-9 * max(1.0, target)
        if target > 0 and avail == 0:
            assert row["epochs"] == 0.0
            assert abs(row["deficit_tokens"] - target) < 1e-9 * max(1.0, target)
