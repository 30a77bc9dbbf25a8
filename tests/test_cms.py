"""Count-min sketch (llm/text.cms_*) — guarantee, merge, broadcast plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

import pytest

from sql_data_warehouse_analytics_project_spark.llm import text as T


def _bucket(salt: str, j: int, term: str, width: int) -> int:
    h = hashlib.md5(f"{salt}{j}|{term}".encode()).hexdigest()
    return int(h[:15], 16) % width


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def test_cms_table_cells_match_hand_hash(spark):
    words = ["a"] * 5 + ["b"] * 3 + ["c"]
    cms = {(r["depth"], r["bucket"]): r["cell_count"]
           for r in T.cms_table(_toks(spark, words), "term",
                                depth=2, width=8).collect()}
    expect: dict = {}
    for w in words:
        for j in range(2):
            key = (j, _bucket("cms", j, w, 8))
            expect[key] = expect.get(key, 0) + 1
    assert cms == expect


def test_cms_estimate_never_underestimates_and_collides(spark):
    # width 2 forces collisions: estimates must still be >= exact.
    words = [f"w{i}" for i in range(40) for _ in range(i % 5 + 1)]
    toks = _toks(spark, words)
    cms = T.cms_table(toks, "term", depth=3, width=2)
    terms = toks.distinct()
    est = {r["term"]: r["est_count"]
           for r in T.cms_estimate(cms, terms, "term",
                                   depth=3, width=2).collect()}
    exact = {r["term"]: r["cnt"]
             for r in toks.groupBy("term")
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)
    assert any(est[t] > exact[t] for t in exact)  # width 2 must collide
    # an unseen term estimates from whatever cells it hashes into —
    # never NULL, and still an over-estimate of its true count (0)
    ghost = T.cms_estimate(cms, _toks(spark, ["zz-unseen"]), "term",
                           depth=3, width=2).collect()[0]
    assert ghost["est_count"] >= 0


def test_cms_tables_merge_by_cellwise_addition(spark):
    a, b = ["x", "x", "y"], ["x", "z", "z", "z"]
    kw = dict(depth=2, width=4)
    whole = {(r["depth"], r["bucket"]): r["cell_count"]
             for r in T.cms_table(_toks(spark, a + b), "term",
                                  **kw).collect()}
    merged = (
        T.cms_table(_toks(spark, a), "term", **kw)
        .unionByName(T.cms_table(_toks(spark, b), "term", **kw))
        .groupBy("depth", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    got = {(r["depth"], r["bucket"]): r["cell_count"]
           for r in merged.collect()}
    assert got == whole


def test_cms_estimate_plan_broadcasts_sketch(spark):
    toks = _toks(spark, ["a", "b", "c"])
    cms = T.cms_table(toks, "term", depth=2, width=4)
    plan = T.cms_estimate(cms, toks, "term", depth=2, width=4)
    explained = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in explained


def test_cms_heavy_hitters_guarantee_and_validation(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(["the"] * 6 + [f"u{i}"])) for i in range(10)],
        "doc_id bigint, text string")
    rows = T.cms_heavy_hitters(docs, "text", k=5, depth=3, width=8).collect()
    assert rows[0]["term"] == "the" and rows[0]["exact_count"] == 60
    assert all(r["never_underestimates"] for r in rows)
    assert [r["term"] for r in rows] == sorted(
        [r["term"] for r in rows],
        key=lambda t: next((-r["est_count"], r["term"])
                           for r in rows if r["term"] == t))
    with pytest.raises(ValueError):
        T.cms_table(docs, "text", depth=0)
