"""Pin the gate-local xxhash64 DuckDB twins (tools/local_oracles.py) to
Spark's ``xxhash64`` semantics — the contract the qd09/qd10/qd11/qd16
full-pipeline oracles rest on.

Coverage:
- scalar vs numpy-vectorized consistency (8-byte / 4-byte paths)
- Spark parity for strings (ascii, empty, unicode, >32-byte stripes),
  longs, and the chained (long, int-literal) MinHash seed pattern
- an end-to-end replay: the qd09/qd10 SQL twins over a tiny synthetic
  corpus must equal the production Spark operators row-for-row (the
  sf-scale version of this is the oracle gate; this pins it in pytest)
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tools.xxh64_py import hash4_vec, hash8_vec, xxh64_int, xxh64_long, xxh64_str


def test_vectorized_matches_scalar():
    xs = np.array([0, 1, -1, 2**62, -(2**62), 12345678901234], dtype=np.int64)
    seeds = np.array([42, 0, -7, 42, 42, 2**63 - 1], dtype=np.int64)
    v8 = hash8_vec(xs.view(np.uint64), seeds.view(np.uint64)).view(np.int64)
    assert list(v8) == [xxh64_long(int(x), int(s)) for x, s in zip(xs, seeds)]
    ints = np.array([0, 1, 63, -1, 2**31 - 1, -(2**31)], dtype=np.int64)
    v4 = hash4_vec(
        ints.view(np.uint64) & np.uint64(0xFFFFFFFF), seeds.view(np.uint64)
    ).view(np.int64)
    assert list(v4) == [xxh64_int(int(x), int(s)) for x, s in zip(ints, seeds)]


def test_spark_parity(spark):
    strings = ["hello world", "", "éàü 中文 test", "a" * 100, "x,y,-42,7"]
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r[0] for r in df.select(F.xxhash64("s")).collect()]
    assert got == [xxh64_str(s, 42) for s in strings]

    longs = [0, 1, -1, 12345678901234, -98765, 2**62]
    df2 = spark.createDataFrame([(x,) for x in longs], "x long")
    got2 = [r[0] for r in df2.select(F.xxhash64("x")).collect()]
    assert got2 == [xxh64_long(x, 42) for x in longs]

    # the MinHash seed pattern: xxhash64(shingle_long, lit(i))
    got3 = [r[0] for r in df2.select(F.xxhash64(F.col("x"), F.lit(17))).collect()]
    assert got3 == [xxh64_int(17, xxh64_long(x, 42)) for x in longs]


@pytest.fixture()
def synthetic_corpus(spark, tmp_path):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web"),
        (2, "the quick brown fox jumps over the lazy dog near the river bend", "en", "web"),
        (3, "completely different content about training data pipelines at scale", "en", "web"),
        (4, "the quick brown fox jumps over the lazy dog near the river bank", "en", "books"),
        (5, "yet another unrelated document mentioning ducks and databases", "en", "web"),
        (6, "completely different content about training data pipelines at size", "en", "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    path = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df, path


def _duck_rows(sql: str, docs_path: str):
    import duckdb

    from tools import local_oracles

    con = duckdb.connect()
    local_oracles.register(con)
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{docs_path}/*.parquet')"
    )
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_qd09_twin_matches_production(spark, synthetic_corpus):
    from sql_data_warehouse_analytics_project_spark.llm import dedup
    from tools.local_oracles import _qd09_sql

    df, path = synthetic_corpus
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.minhash_dedup_pairs(df, "doc_id", threshold=0.8).collect()
    )
    assert got, "synthetic corpus must produce at least one near-dup pair"
    assert got == _duck_rows(_qd09_sql(), path)


def test_qd10_twin_matches_production(spark, synthetic_corpus):
    from sql_data_warehouse_analytics_project_spark.llm import dedup
    from tools.local_oracles import _qd10_sql

    df, path = synthetic_corpus
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_pairs(df, "doc_id", max_hamming=3).collect()
    )
    assert got, "synthetic corpus must produce at least one simhash pair"
    assert got == _duck_rows(_qd10_sql(), path)
