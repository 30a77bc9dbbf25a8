"""Property-based tests (hypothesis): the write-path operators are checked
against trivially-correct in-memory models on randomized inputs — the
result-level testing the reference lacks entirely (SURVEY.md §5), applied
to the operators whose bugs corrupt tables rather than query output.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark import dml
from sql_data_warehouse_analytics_project_spark.operators import windows

KV = st.dictionaries(st.integers(0, 20), st.integers(-100, 100), max_size=12)

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, d):
    rows = [Row(k=k, v=v) for k, v in sorted(d.items())] or [Row(k=0, v=0)]
    df = spark.createDataFrame(rows, "k int, v int")
    return df.limit(0) if not d else df


@SET
@given(target=KV, source=KV)
def test_upsert_matches_dict_model(spark, target, source):
    out, counts = dml.upsert(_df(spark, target), _df(spark, source), ["k"])
    model = {**target, **source}
    got = {r["k"]: r["v"] for r in out.select("k", "v").collect()}
    assert got == model
    assert counts["inserted"] == len(set(source) - set(target))
    assert counts["updated"] == len(set(source) & set(target))


@SET
@given(target=KV, source=KV, bar=st.integers(-50, 50))
def test_merge_delete_matches_model(spark, target, source, bar):
    out, counts = dml.merge(
        _df(spark, target),
        _df(spark, source),
        ["k"],
        delete_condition=F.col("v") > bar,
    )
    merged = {**target, **source}
    model = {k: v for k, v in merged.items() if not v > bar}
    got = {r["k"]: r["v"] for r in out.select("k", "v").collect()}
    assert got == model
    assert counts["deleted"] == sum(1 for v in merged.values() if v > bar)


@SET
@given(incoming=KV, existing=KV)
def test_changed_rows_matches_set_difference(spark, incoming, existing):
    got = dml.changed_rows(
        _df(spark, incoming), _df(spark, existing), ["k", "v"]
    )
    model = {(k, v) for k, v in incoming.items()} - {
        (k, v) for k, v in existing.items()
    }
    assert {(r["k"], r["v"]) for r in got.select("k", "v").collect()} == model


@SET
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)), max_size=20, unique=True
    )
)
def test_recompute_is_current_latest_wins(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(
        [Row(k=k, ts=ts) for k, ts in rows], "k int, ts long"
    )
    out = dml.recompute_is_current(df, ["k"], ts_column="ts").collect()
    latest = {}
    for k, ts in rows:
        latest[k] = max(latest.get(k, ts), ts)
    for r in out:
        assert r["_is_current"] == (r["ts"] == latest[r["k"]])


@SET
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 400), st.integers(-50, 50)),
        max_size=20,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_running_totals_matches_cumsum(spark, vals):
    if not vals:
        return
    df = spark.createDataFrame(
        [Row(p=p, d=d, v=v) for p, d, v in vals], "p int, d int, v int"
    )
    out = windows.running_totals(df, "v", "d", ["p"]).collect()
    by_part: dict[int, list[tuple[int, int]]] = {}
    for p, d, v in vals:
        by_part.setdefault(p, []).append((d, v))
    model = {}
    for p, dv in by_part.items():
        acc = 0
        for d, v in sorted(dv):
            acc += v
            model[(p, d)] = acc
    for r in out:
        assert r["running_total"] == model[(r["p"], r["d"])]


INTERVALS = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(1, 15)),
    min_size=0,
    max_size=10,
)


@SET
@given(iv=INTERVALS, bucket=st.integers(1, 10))
def test_interval_overlap_matches_bruteforce(spark, iv, bucket):
    from sql_data_warehouse_analytics_project_spark.operators.joins import (
        interval_overlap_join,
    )

    rows = [
        Row(g=g, id=i, s=s, e=s + ln) for i, (g, s, ln) in enumerate(iv)
    ] or [Row(g=0, id=0, s=0, e=1)]
    df = spark.createDataFrame(rows, "g int, id int, s int, e int")
    if not iv:
        df = df.limit(0)
    out = interval_overlap_join(
        df, df, ["g"], left_start="s", left_end="e",
        right_start="s", right_end="e", bucket=bucket,
    ).filter(F.col("l_id") < F.col("r_id"))
    got = sorted((r.l_id, r.r_id) for r in out.collect())
    data = [(g, i, s, s + ln) for i, (g, s, ln) in enumerate(iv)]
    model = sorted(
        (a[1], b[1])
        for a in data
        for b in data
        if a[1] < b[1] and a[0] == b[0] and a[2] < b[3] and b[2] < a[3]
    )
    assert got == model


@SET
@given(
    vals=st.lists(st.integers(0, 4), min_size=0, max_size=15),
)
def test_cumulative_distinct_matches_running_set(spark, vals):
    rows = [Row(k=0, i=i, v=v) for i, v in enumerate(vals)] or [Row(k=0, i=0, v=0)]
    df = spark.createDataFrame(rows, "k int, i int, v int")
    if not vals:
        df = df.limit(0)
    out = {
        r.i: r.n_distinct_cum
        for r in windows.cumulative_distinct(df, ["k"], ["i"], "v").collect()
    }
    seen: set = set()
    for i, v in enumerate(vals):
        seen.add(v)
        assert out[i] == len(seen), (i, vals)


@SET
@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=0, max_size=60, unique=True),
    nparts=st.integers(1, 7),
)
def test_contiguous_rank_matches_sorted_enumeration(spark, keys, nparts):
    """contiguous_rank == enumerate(sorted(keys)) for ANY unique key set
    and ANY input partitioning — the model the two-phase implementation
    (range partition → per-partition ordinal → offsets) must collapse to."""
    rows = [Row(k=k) for k in keys] or [Row(k=0)]
    df = spark.createDataFrame(rows, "k int")
    df = (df.limit(0) if not keys else df).repartition(nparts)
    got = {
        r["k"]: r["rk"]
        for r in windows.contiguous_rank(df, ["k"], "rk").collect()
    }
    model = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == model


# -- incremental BM25 index == rebuild (llm/retrieval.update_bm25_index) ----

WORDS = ["spark", "data", "disk", "sun", "cat", "join", "row", "warm"]
DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join)
CORPUS = st.dictionaries(st.integers(0, 9), DOC, max_size=6)

BM25_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@BM25_SET
@given(base=CORPUS, batch=CORPUS)
def test_bm25_update_equals_rebuild_property(spark, base, batch):
    """For ANY base corpus and ANY batch (overlapping ids replace, empty
    docs allowed), update(build(base), batch) must score every query
    identically to build(base − batch_ids ∪ batch) — the qd46 gate
    property generalized to randomized corpora."""
    from sql_data_warehouse_analytics_project_spark.llm import retrieval

    def df_of(d):
        rows = [Row(doc_id=k, text=v) for k, v in sorted(d.items())]
        base_df = spark.createDataFrame(
            rows or [Row(doc_id=0, text="x")], "doc_id long, text string"
        )
        return base_df.limit(0) if not d else base_df

    final = {**base, **batch}
    updated = retrieval.update_bm25_index(
        retrieval.build_bm25_index(df_of(base)), df_of(batch)
    )
    rebuilt = retrieval.build_bm25_index(df_of(final))
    assert updated["n_docs"] == rebuilt["n_docs"]
    assert updated["total_dl"] == rebuilt["total_dl"]
    ts_u = {r.term: r.df for r in updated["term_stats"].collect()}
    ts_r = {r.term: r.df for r in rebuilt["term_stats"].collect()}
    assert ts_u == ts_r
    queries = spark.createDataFrame(
        [(1, "spark data join"), (2, "warm sun cat")],
        "query_id long, text string",
    )
    got = sorted(map(tuple, retrieval.search_bm25(updated, queries, k=5).collect()))
    want = sorted(map(tuple, retrieval.search_bm25(rebuilt, queries, k=5).collect()))
    assert got == want


_WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "x1", "zz"])
_DOC = st.lists(_WORDS, min_size=0, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


@SET
@given(a=_CORPUS, b=_CORPUS)
def test_token_drift_kl_properties(spark, a, b):
    """Information-theory invariants of the drift operator on random
    corpora: total KL(A||B) over the FULL vocabulary is >= 0 (Gibbs'
    inequality survives the add-k smoothing, which renormalizes both
    sides over the same union vocab), and drift of a corpus against
    itself is exactly zero per token (p_a == p_b -> ln(1) == 0)."""
    from sql_data_warehouse_analytics_project_spark.llm import text as T

    if not any(t.strip() for t in a) or not any(t.strip() for t in b):
        return  # empty vocab on a side: nothing to compare
    da, db = _docs_df(spark, a), _docs_df(spark, b)
    rows = T.token_drift(da, db, top_k=10_000).collect()
    assert rows, "union vocab must be non-empty"
    # rounding is 9dp per token; allow the summed rounding slack
    assert sum(r.kl_contrib for r in rows) >= -1e-6 * len(rows)
    for r in T.token_drift(da, da, top_k=10_000).collect():
        assert r.kl_contrib == 0.0 and r.p_a == r.p_b


@SET
@given(corpus=_CORPUS)
def test_bigram_lm_probability_invariants(spark, corpus):
    """Smoothed-probability invariants on random corpora: every
    transition probability is in (0, 1) so avg_logprob < 0 and
    perplexity > 1; n_bigrams matches len(tokens) - 1 per doc; docs
    with < 2 tokens never appear."""
    from sql_data_warehouse_analytics_project_spark.llm import text as T

    df = _docs_df(spark, corpus)
    rows = {r.doc_id: r for r in T.bigram_lm_scores(df, "doc_id").collect()}
    for i, t in enumerate(corpus):
        toks = t.split()
        if len(toks) < 2:
            assert i not in rows
        else:
            assert rows[i].n_bigrams == len(toks) - 1
            assert rows[i].avg_logprob < 0
            assert rows[i].perplexity > 1
