"""Lexical retrieval over the corpus: BM25 index build/search + top-k
(north-star extension — no reference counterpart; nearest surface is the
reference's aggregation catalog re-expressed as corpus statistics, like
``vocab.py``).

Training-data pipelines use lexical retrieval constantly — eval-set
decontamination beyond exact n-gram overlap, targeted corpus audits
("show me the documents most relevant to this prompt"), and hard-negative
mining — and BM25 is the standard scorer. The plan is the classic
inverted-index shape, split the way the IVF ANN path is
(:func:`similarity.build_ivf_index` / ``search_ivf_index``): the corpus
reduces ONCE to a persistable (term → postings+stats) index, each query
batch equi-joins the postings on ITS terms only, and only those postings
ever move — never |corpus| × |queries|, and never a corpus re-scan per
query batch. At 100 TB the corpus-statistics pass IS the whole cost, so
recomputing it per search call is the one unacceptable plan; the index
is built once, written with :func:`sources.writers.write_dataset`
(``sort_by=["term"]`` keeps parquet row-group min/max stats tight on the
join key, so a query's terms prune row groups on read), and reused.

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


def build_bm25_index(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Build the BM25 inverted index ONCE, search it many times — the
    production retrieval lifecycle (index construction is the expensive,
    corpus-sized part; query batches arrive continuously and must not
    re-reduce the corpus).

    Returns a plain dict index (the IVF-index shape):

    - ``"postings"`` — LAZY DataFrame ``(term, doc, tf, dl, idf)``: one
      row per (term, document) with the term frequency, the document's
      token length, and the term's Robertson idf
      ``ln(1 + (N - df + 0.5)/(df + 0.5))`` (always positive) baked in at
      build time. Denormalized on purpose: search is then ONE equi-join
      on ``term`` with no second join for doc stats. Callers persist it
      however they like — ``localCheckpoint`` for a session,
      ``write_dataset(sort_by=["term"])`` for reuse across jobs (row
      groups then prune on the query's terms).
    - ``"n_docs"`` / ``"avgdl"`` — corpus size and mean document length
      (json-serializable scalars; ``avgdl`` is an exact long sum divided
      by an exact count, so every engine sees the identical double).
    - ``"id_type"`` — the id column's Spark type (output schema of
      searches, same contract as the IVF index).

    ``k1``/``b`` are deliberately NOT baked in: they are query-time
    scoring knobs, so one persisted index serves every tuning.
    """
    tok = corpus.select(
        F.col(id_col).alias("doc"), F.explode(tokens(text_col)).alias("term")
    )
    tf = tok.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tok.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    row = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    ).collect()[0]
    n_docs = int(row["n_docs"] or 0)
    avgdl = (row["total_dl"] / n_docs) if n_docs else 0.0
    idf = tf.groupBy("term").agg(
        F.log(
            1.0 + (F.lit(n_docs) - F.count(F.lit(1)) + 0.5)
            / (F.count(F.lit(1)) + 0.5)
        ).alias("idf")
    )
    postings = tf.join(idf, "term").join(dl, "doc").select(
        "term", "doc", "tf", "dl", "idf"
    )
    return {
        "postings": postings,
        "n_docs": n_docs,
        "avgdl": float(avgdl),
        "id_type": dict(corpus.dtypes)[id_col],
    }


def search_bm25(
    index: dict,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 search against a prebuilt index:
    ``(query_id, <id_col>, score, rank)``.

    Per-term contribution
    ``idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``; rank orders by
    the ROUNDED score (desc) then doc id — total-order deterministic,
    engine-portable. The query side explodes to distinct terms and joins
    the postings on ``term``: cost is the postings of the QUERY's terms
    (row-group-pruned when the index was written term-sorted), not the
    corpus. ``k <= 0`` returns unranked scores for every matching pair.
    """
    postings = index["postings"]
    avgdl = float(index["avgdl"]) or 1.0  # empty corpus → no postings anyway
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
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
        ).alias("c"),
    )
    scores = (
        contrib.groupBy("query_id", "doc")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .select("query_id", F.col("doc").alias(id_col), "score")
    )
    if k <= 0:
        return scores
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return scores.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).filter(F.col("rank") <= k)


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
    """One-shot BM25 relevance for every (query, document) pair sharing
    ≥1 term: ``(query_id, doc_id, score)``. Convenience composition of
    :func:`build_bm25_index` + :func:`search_bm25` (k≤0 = no cut) — the
    ad-hoc path; repeated searches should build the index once."""
    index = build_bm25_index(corpus, id_col, text_col)
    return search_bm25(
        index,
        queries,
        k=0,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        k1=k1,
        b=b,
    )


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
    Routes through the index-backed path (build once → search), so the
    gate key qd45 exercises exactly the plan a persisted index serves."""
    index = build_bm25_index(corpus, id_col, text_col)
    return search_bm25(
        index,
        queries,
        k=k,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        k1=k1,
        b=b,
    )
