"""Lexical retrieval over the corpus: BM25 scoring/top-k (north-star
extension — no reference counterpart; nearest surface is the reference's
aggregation catalog re-expressed as corpus statistics, like ``vocab.py``).

Training-data pipelines use lexical retrieval constantly — eval-set
decontamination beyond exact n-gram overlap, targeted corpus audits
("show me the documents most relevant to this prompt"), and hard-negative
mining — and BM25 is the standard scorer. The plan is the classic
inverted-index shape: the corpus reduces ONCE to (term → postings)
statistics, each query's terms equi-join the postings, and only
postings of the query's terms ever move — never |corpus| × |queries|.

Determinism contract (same as ``text.tfidf_top_terms``): scores round to
6 decimals BEFORE ranking and ties break on doc id, so the top-k set and
order are bit-stable across engines and partitionings (float summation
order can differ by an ulp; the pre-rank rounding absorbs it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sql_data_warehouse_analytics_project_spark.llm.text import tokens


def bm25_scores(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance for every (query, document) pair sharing ≥1 term:
    ``(query_id, doc_id, score)``.

    Robertson idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always
    positive), per-term contribution
    ``idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``.

    Plan shape: corpus explodes once → (doc, term, tf) + doc lengths;
    document frequency and the 1-row (N, avgdl) summary come from the
    already-reduced pairs; query terms (distinct per query) equi-join the
    postings on term — the inverted-index join whose cost is the postings
    of the QUERY's terms, not the corpus; one final (query, doc)
    aggregate. ``avgdl`` divides an exact long sum by an exact count, so
    both engines see the identical double."""
    tok = corpus.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )
    tf = tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    summary = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df_"))
        .crossJoin(F.broadcast(summary))
        .select(
            "term",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df_") + 0.5) / (F.col("df_") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    postings = tf.join(idf, "term").join(dl, "doc")
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(tokens(query_text_col))).alias("term"),
    )
    contrib = qterms.join(postings, "term").select(
        "query_id",
        "doc",
        (
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            )
        ).alias("c"),
    )
    return contrib.groupBy("query_id", "doc").agg(
        F.round(F.sum("c"), 6).alias("score")
    ).select("query_id", F.col("doc").alias(id_col), "score")


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 results per query: ``(query_id, doc_id, score, rank)``.
    Rank orders by the ROUNDED score (desc) then doc id — total-order
    deterministic, engine-portable."""
    scores = bm25_scores(
        corpus,
        queries,
        id_col,
        text_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        k1=k1,
        b=b,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scores.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
