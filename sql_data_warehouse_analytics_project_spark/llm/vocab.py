"""Tokenizer-training corpus prep: vocabulary construction and BPE merge
statistics (north-star extension — no reference counterpart; nearest
surface is the reference's aggregation catalog
``sql/query_builder.py:193-291``, re-expressed here as corpus-scale
term statistics).

Both operators reduce the corpus to vocabulary-keyed tables in
map-side-combined aggregations: the corpus text never shuffles, only
(term, count) pairs do. That is the shape a 100 TB tokenizer-training
prep job needs — the first aggregate cuts petabytes of text to a
vocabulary (millions of rows), and everything downstream is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sql_data_warehouse_analytics_project_spark.llm.text import tokens


def build_vocab(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    *,
    min_count: int = 1,
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary: ``(term, n_occurrences, n_docs[, rank])``.

    Two-stage aggregation: explode → (doc, term) partial counts (map-side
    combined, so a hot term never funnels raw occurrences through one
    reducer) → per-term totals, where ``n_docs`` falls out as the row
    count of the first stage. ``min_count`` prunes the long tail BEFORE
    any ordering. With ``top_k`` the cut is a distributed top-k sort
    (TakeOrderedAndProject — no global sort of the full vocabulary) and a
    ``rank`` column is added over the k survivors; ties break on term so
    output is total-order deterministic.
    """
    ex = df.select(F.col(id_col).alias("_doc"), F.explode(tokens(text_col)).alias("term"))
    per_doc = ex.groupBy("_doc", "term").agg(F.count(F.lit(1)).alias("c"))
    counts = (
        per_doc.groupBy("term")
        .agg(F.sum("c").alias("n_occurrences"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    if top_k is None:
        return counts
    top = counts.orderBy(F.desc("n_occurrences"), F.asc("term")).limit(top_k)
    # deliberate global window over an ALREADY top-k-cut frame (≤ top_k
    # rows by construction; plan-asserted parent/child order in tests)
    from sql_data_warehouse_analytics_project_spark.operators.windows import window_spec

    w = window_spec(
        None,
        [F.desc("n_occurrences"), F.asc("term")],
        allow_unpartitioned=True,
    )
    return top.select(
        "term", "n_occurrences", "n_docs", F.row_number().over(w).cast("int").alias("rank")
    )


def bpe_pair_counts(df, text_col: str = "text") -> DataFrame:
    """Adjacent character-pair frequencies over the corpus — the exact
    statistic BPE's first merge maximizes (count of each symbol bigram,
    weighted by word frequency). Returns ``(pair, n_occurrences)``.

    The corpus first collapses to ``(word, count)`` — so pair generation
    runs over the *vocabulary*, not every occurrence — then each word
    explodes into its ``len-1`` character bigrams carrying the word's
    weight. Two vocabulary-keyed shuffles; the raw text is read once.
    Tokens are ``[a-z0-9]+`` so the pair domain is tiny (≤36²) and the
    final aggregate is trivially small.
    """
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wn"))
        .filter(F.length("w") >= 2)
    )
    pairs = F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
    return (
        wc.select(F.explode(pairs).alias("pair"), "wn")
        .groupBy("pair")
        .agg(F.sum("wn").alias("n_occurrences"))
    )
