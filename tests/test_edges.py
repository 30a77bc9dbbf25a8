"""Edge-case tests (mirrors the reference's edge-case sections,
``test_bronze.py:1014-1220``: empty inputs, unicode, NULL-heavy data,
single-row boundaries) applied to this engine's operators.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sql_data_warehouse_analytics_project_spark import dml
from sql_data_warehouse_analytics_project_spark.llm import dedup, text
from sql_data_warehouse_analytics_project_spark.operators import (
    aggregates,
    windows,
)

DOC_SCHEMA = "doc_id long, text string"


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows], DOC_SCHEMA)


def test_empty_input_through_dedup_and_text(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert dedup.exact_dedup(empty, "doc_id").count() == 0
    assert dedup.ngram_jaccard_pairs(empty, "doc_id").count() == 0
    assert dedup.simhash_pairs(empty, "doc_id").count() == 0
    assert empty.select(text.detect_language("text")).count() == 0


def test_unicode_and_null_text(spark):
    docs = _docs(
        spark,
        [
            (1, "der hund und die katze sind nicht da"),
            (2, "naïve café résumé — déjà vu"),
            (3, None),
            (4, ""),
            (5, "的 是 了 在 我 有"),
        ],
    )
    langs = {r.doc_id: r.lang for r in docs.select(
        "doc_id", text.detect_language("text").alias("lang")
    ).collect()}
    assert langs[1] == "de"
    assert langs[3] == "und" and langs[4] == "und"  # null/empty → undetermined
    assert langs[5] == "zh"
    # fingerprint of null text is null, never a crash
    fp = docs.select(text.fingerprint("text").alias("f")).collect()
    assert fp[2].f is None
    # quality features survive null/empty text
    q = text.quality_features(docs)
    assert q.count() == 5


def test_single_and_duplicate_doc_dedup(spark):
    docs = _docs(spark, [(1, "same words here"), (2, "same words here")])
    kept = dedup.exact_dedup(docs, "doc_id").collect()
    assert [r.doc_id for r in kept] == [1]  # lowest id wins
    one = _docs(spark, [(7, "only doc")])
    assert dedup.exact_dedup(one, "doc_id").count() == 1


def test_upsert_into_empty_target_and_empty_source(spark):
    target = spark.createDataFrame([], "k int, v int")
    source = spark.createDataFrame([Row(k=1, v=10)], "k int, v int")
    out, counts = dml.upsert(target, source, ["k"])
    assert counts == {"inserted": 1, "updated": 0}
    assert [(r.k, r.v) for r in out.collect()] == [(1, 10)]
    out2, counts2 = dml.upsert(source, target.limit(0), ["k"])
    assert counts2 == {"inserted": 0, "updated": 0}
    assert out2.count() == 1


def test_window_ops_on_single_row(spark):
    df = spark.createDataFrame([Row(g="a", d="2024-01-01", v=1.0)]).withColumn(
        "d", F.to_date("d")
    )
    rt = windows.running_totals(df, "v", "d", ["g"]).collect()
    assert rt[0].running_total == 1.0
    assert windows.detect_gaps(df, "d", ["g"], "daily").count() == 0


def test_quality_checks_on_empty_table(spark):
    empty = spark.createDataFrame([], "a int, b string")
    out = aggregates.quality_checks(
        empty,
        [
            {"type": "null_check", "column": "a"},
            {"type": "duplicate_check", "columns": ["a", "b"]},
        ],
    ).collect()
    assert all(r.issue_count == 0 and r.status == "PASS" for r in out)


def test_nanos_timestamp_events_roundtrip(spark, sf_dir):
    """events.parquet is TIMESTAMP(NANOS) — the reader must yield proper
    microsecond timestamps, not raw longs."""
    from sql_data_warehouse_analytics_project_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"].startswith("timestamp")
    assert ev.filter(F.col("ts").isNull()).count() == 0
