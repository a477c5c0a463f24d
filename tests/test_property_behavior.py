"""Property-based tests: the funnel window chain and the maximal
duplicated-span merge must agree with brute-force Python references on
random inputs.  One Spark job per example — example counts stay low."""

from hypothesis import given, settings
from hypothesis import strategies as st

from emiproc_spark.operators.behavior import funnel_user_steps
from emiproc_spark.operators.dedup import duplicated_spans

STEPS = ["a", "b", "c"]
event = st.tuples(
    st.integers(min_value=1, max_value=3),      # user
    st.integers(min_value=0, max_value=40),     # ts
    st.sampled_from(["a", "b", "c", "x"]),      # type (x = noise)
)


def _funnel_ref(rows, steps):
    """Brute force: step i = min ts of steps[i] strictly after step i-1."""
    out = {}
    for user in {u for u, _, _ in rows}:
        ev = [(t, e) for u, t, e in rows if u == user]
        stamps = []
        prev = None
        for s in steps:
            cand = [
                t for t, e in ev
                if e == s and (prev is None or (prev >= 0 and t > prev))
            ]
            cur = min(cand) if cand and (prev is None or prev >= 0) else -1
            stamps.append(cur if cur >= 0 else None)
            prev = cur
        out[user] = tuple(stamps)
    return out


@given(st.lists(event, min_size=1, max_size=25))
@settings(max_examples=15, deadline=None)
def test_funnel_matches_bruteforce(spark, rows):
    ev = spark.createDataFrame(
        rows, schema="user_id long, ts long, event_type string"
    )
    got = {
        r["user_id"]: (r["step1_ts"], r["step2_ts"], r["step3_ts"])
        for r in funnel_user_steps(ev, STEPS).collect()
    }
    assert got == _funnel_ref(rows, STEPS)


word = st.sampled_from(["w0", "w1", "w2", "w3"])
doc = st.lists(word, min_size=1, max_size=14)


def _spans_ref(docs_tokens, n, min_docs):
    """Brute force: positions of shingles in >= min_docs docs, merged."""
    from collections import defaultdict

    owners = defaultdict(set)
    for d, toks in docs_tokens.items():
        for p in range(len(toks) - n + 1):
            owners[tuple(toks[p:p + n])].add(d)
    hot = {s for s, ds in owners.items() if len(ds) >= min_docs}
    out = set()
    for d, toks in docs_tokens.items():
        ps = sorted(
            p for p in range(len(toks) - n + 1)
            if tuple(toks[p:p + n]) in hot
        )
        i = 0
        while i < len(ps):
            j = i
            while j + 1 < len(ps) and ps[j + 1] - ps[j] <= n:
                j += 1
            out.add((d, ps[i], ps[j] + n - 1))
            i = j + 1
    return out


@given(st.lists(doc, min_size=2, max_size=4))
@settings(max_examples=15, deadline=None)
def test_duplicated_spans_match_bruteforce(spark, docs_list):
    docs_tokens = {i: t for i, t in enumerate(docs_list)}
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs_tokens.items()],
        schema="doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicated_spans(df, n=2, min_docs=2).collect()
    }
    assert got == _spans_ref(docs_tokens, 2, 2)


def test_floor_period_matches_duckdb_floor_division(spark):
    # the parity-critical primitive pair: Spark's pmod+DIV bucket must
    # equal the DuckDB rendering (qhelpers.sql_floor_div) AND true
    # mathematical floor, for negative, zero and huge epoch-ns values.
    # (DuckDB's bare integer // TRUNCATES — that is exactly why the
    # explicit rendering exists.)
    import duckdb

    from emiproc_spark.operators.behavior import _floor_period
    from emiproc_spark.qhelpers import sql_floor_div

    vals = [
        0, 1, -1, 7, -7, 99, -99, 100, -100, 101, -101,
        3_600_000_000_000 - 1, -3_600_000_000_000 - 1,
        2**62, -(2**62), 1786795858_894636000,
    ]
    periods = [1, 7, 100, 3_600_000_000_000]
    df = spark.createDataFrame([(v,) for v in vals], "ts long")
    for p in periods:
        got = {
            r["ts"]: r["b"]
            for r in df.select("ts", _floor_period("ts", p).alias("b")).collect()
        }
        expr = sql_floor_div("x", p)
        oracle = dict(
            duckdb.sql(
                f"SELECT x, {expr} FROM (SELECT UNNEST($v) AS x)",
                params={"v": vals},
            ).fetchall()
        )
        want = {v: v // p for v in vals}  # python // IS floor
        assert got == want, f"spark vs floor, period {p}"
        assert oracle == want, f"duckdb rendering vs floor, period {p}"
