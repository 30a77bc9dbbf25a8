"""Physical-plan assertions for the headline queries: the scale
properties the engine is designed around (filter pushdown, column
pruning, broadcast dims, no stray shuffles) are checked in the plan
text so a regression in plan shape fails CI, not just a benchmark.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    qs = entry.queries()

    def plan_of(name: str) -> str:
        df = qs[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().treeString()

    return plan_of


def test_filter_pushdown_and_column_pruning(plans):
    p = plans("q01_filter_project")
    # predicate reaches the parquet scan…
    assert "PushedFilters: [" in p and "c_mktsegment" in p.split("PushedFilters")[1]
    # …and only the referenced columns are read
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "c_comment" not in read_schema and "c_address" not in read_schema


def test_star_join_broadcasts_dimensions(plans):
    p = plans("q09_star_join")
    assert "BroadcastHashJoin" in p
    # the fact table (lineitem) must NOT be on a broadcast side
    for chunk in p.split("BroadcastExchange")[1:]:
        head = chunk[:2000]
        assert "lineitem" not in head, "fact side was broadcast"


def _broadcast_subtrees(plan: str):
    """Yield the treeString subtree under each BroadcastExchange node,
    using marker-column depth (children print at a deeper +-/:- column)."""
    lines = plan.splitlines()

    def marker(line: str) -> int:
        pos = [line.find(m) for m in ("+-", ":-") if line.find(m) >= 0]
        return min(pos) if pos else 0

    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        depth = marker(line)
        sub = []
        for nxt in lines[i + 1 :]:
            if nxt.strip() and marker(nxt) <= depth and ("+-" in nxt or ":-" in nxt):
                break
            sub.append(nxt)
        yield "\n".join(sub)


@pytest.mark.parametrize("big", ["customer", "orders", "lineitem"])
def test_no_fact_scaling_table_is_hint_broadcast(spark, sf_dir, big):
    """Scale regression (round-1 verdict #3): customer grows with the
    fact side at 100×, so neither q09 nor the flagship may hard-wire a
    broadcast of it. AQE and auto-broadcast are disabled so the only
    BroadcastExchanges left are explicit hints — tiny dims must still be
    hinted, big tables must not."""
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        qs = entry.queries()
        for df in (qs["q09_star_join"](spark, sf_dir), entry.entry(spark)):
            p = df._jdf.queryExecution().executedPlan().treeString()
            assert "BroadcastHashJoin" in p  # tiny dims still hinted
            for sub in _broadcast_subtrees(p):
                for line in sub.splitlines():
                    if "FileScan" in line or "Scan parquet" in line:
                        assert big not in line, f"{big} on a broadcast side"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_agg_uses_partial_aggregation(plans):
    p = plans("q03_agg_having")
    assert "partial_" in p, "map-side combine missing"


def test_topk_plans_take_ordered(plans):
    p = plans("q02_topk_orders")
    assert "TakeOrderedAndProject" in p


def test_theta_join_is_broadcast_nested_loop(plans):
    p = plans("q30_theta_band_join")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_semi_anti_join_types(plans):
    assert "LeftAnti" in plans("q10_anti_join")
    assert "LeftSemi" in plans("q19_in_subquery")


def test_whole_stage_codegen_active(spark, sf_dir):
    df = entry.queries()["q07_monthly_revenue"](spark, sf_dir)
    df.collect()  # AQE: codegen stages exist only in the FINAL plan
    p = df._jdf.queryExecution().executedPlan().treeString()
    assert "== Final Plan ==" in p
    # '*(N)' prefixes mark WholeStageCodegen spans; both agg stages must be in one
    final = p.split("== Initial Plan ==")[0]
    assert "*(1)" in final and "*(2)" in final


def test_entry_flagship_broadcasts_dims(spark):
    df = entry.entry(spark)
    p = df._jdf.queryExecution().executedPlan().treeString()
    assert "BroadcastHashJoin" in p


def test_partitioned_table_prunes_partitions(spark):
    """P4's pruning claim: a table partitioned on the derived business
    date must show PartitionFilters (not a full scan + post-filter) when
    queried by that date."""
    import shutil
    from urllib.parse import urlparse

    from pyspark.sql import Row

    spark.sql("CREATE DATABASE IF NOT EXISTS prunetest")
    spark.sql("DROP TABLE IF EXISTS prunetest.t")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/prunetest.db", ignore_errors=True)
    df = spark.createDataFrame(
        [Row(v=i, business_date=f"2024-01-{(i % 3) + 1:02d}") for i in range(30)]
    )
    df.write.partitionBy("business_date").saveAsTable("prunetest.t")
    q = spark.table("prunetest.t").filter("business_date = '2024-01-02'")
    p = q._jdf.queryExecution().executedPlan().treeString()
    assert "PartitionFilters: [" in p
    assert "business_date" in p.split("PartitionFilters")[1].split("]")[0]
    assert q.count() == 10


def test_asof_join_is_single_shuffle(plans):
    """asof_join's scale claim: the union+window merge shuffles ONCE (on
    the key columns for the window) — never a per-key cross product, a
    sort-merge join, or a nested-loop join."""
    p = plans("q40_asof_join")
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in p, bad
    # exactly one exchange feeds the window (AQE may reuse it)
    n_exchanges = p.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected 1 shuffle, saw {n_exchanges}:\n{p}"
    assert "Window" in p


def test_range_join_is_equi_join(plans):
    """range_join's scale claim: bucketization turns the interval
    predicate into a hash-partitioned EQUI join — BroadcastNestedLoopJoin
    or CartesianProduct in this plan means the rewrite regressed."""
    p = plans("q44_range_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p  # AQE may promote the small test side
    )


def test_hash_sampling_is_map_side_only(plans):
    """qd19's zero-shuffle claim: deterministic sampling + splitting is a
    pure column predicate — no Exchange anywhere in the plan."""
    p = plans("qd19_hash_sample_split")
    assert "Exchange" not in p.split("== Initial Plan ==")[0].replace(
        "ReusedExchange", ""
    ), p


def test_sequence_packing_is_single_shuffle(plans):
    """pack_concat_chunks' scale claim: the layout is ONE stream-keyed
    window shuffle — no global sort, no join, no second exchange (the
    only other Exchange is _docs' round-robin spread of the single-file
    test input)."""
    p = plans("qd29_sequence_packing")
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in p, bad
    n = p.count("Exchange hashpartitioning")
    assert n == 1, f"expected 1 hash shuffle, saw {n}:\n{p}"
    assert "Window" in p


def test_chunking_has_no_hash_shuffle(plans):
    """chunk_text is generate→explode→substring: zero hash shuffles (the
    single round-robin Exchange is _docs' test-input spread)."""
    p = plans("qd30_document_chunking")
    assert "Exchange hashpartitioning" not in p, p
    assert "Generate" in p  # the posexplode


def test_vocab_topk_is_take_ordered(plans):
    """build_vocab(top_k=...) must cut with a distributed top-k, never a
    global sort of the vocabulary — and the rank window's single-partition
    exchange must sit ABOVE the top-k cut (round-6 verdict #5: the global
    window only ever sees the k survivors, so its input is bounded by the
    requested k, not by the vocabulary size)."""
    p = plans("qd33_vocab_top_terms")
    assert "TakeOrderedAndProject" in p, p
    if "Exchange SinglePartition" in p:
        # treeString prints parents first: the rank window's exchange
        # must be a parent of (appear before) the top-k cut
        assert p.index("Exchange SinglePartition") < p.index(
            "TakeOrderedAndProject"
        ), p


def test_key_skew_stats_plan(plans):
    """Skew probe: one map-side-combined shuffle for the key counts, the
    1-row summary broadcast back (never a second hash shuffle of the
    counts), top-N as TakeOrderedAndProject (never a global sort)."""
    p = plans("q47_key_skew")
    assert "TakeOrderedAndProject" in p
    assert "partial_count" in p  # map-side combine before the shuffle
    assert "BroadcastExchange" in p
    assert "Sort [" not in p.replace("TakeOrderedAndProject", "")


def test_table_profile_avoids_expand(plans):
    """Per-column profile branches must never trigger Catalyst's Expand
    rewrite (N distinct aggs in one agg => every row duplicated N times —
    the blowup scales WITH data; NOTES lesson 7)."""
    p = plans("q51_table_profile")
    assert "Expand" not in p
    # each branch prunes its scan to a single column
    for frag in p.split("ReadSchema:")[1:]:
        schema = frag.splitlines()[0]
        assert schema.count(":") <= 1, f"branch reads >1 column: {schema}"


def test_incremental_rollup_merges_without_join(plans):
    """Partial-state merge is union + re-aggregate: no join anywhere (a
    join-based merge would break N-way merges and double the shuffles)."""
    p = plans("q48_incremental_rollup")
    assert "Join" not in p
    assert "Union" in p


def test_event_funnel_no_cartesian_and_bounded_shuffles(plans):
    """Funnel steps join on the user key only — no cross products, no
    nested loops, and no collect_list of per-user event arrays."""
    p = plans("q53_event_funnel")
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin", "collect_list"):
        assert bad not in p, bad


def test_histogram_and_corr_single_shuffle(plans):
    """Histogram and moment-based correlation are each ONE map-side-
    combined aggregation — no second shuffle, no Expand rewrite."""
    for name in ("q59_histogram", "q60_grouped_correlation"):
        p = plans(name)
        assert "partial_" in p, name  # map-side combine present
        assert "Expand" not in p, name
        assert p.count("Exchange hashpartitioning") == 1, name


def test_repetition_and_corpus_filter_map_side_only(plans):
    """The Gopher-style quality signals (qd31/qd36) are ONE map-side
    projection: the n-gram repetition counts come from a sorted-run fold
    over the grams array (ngram_run_stats), not an explode + grouped
    count — zero hash shuffles, no join back, no Generate."""
    for name in ("qd31_repetition_signals", "qd36_corpus_filter"):
        p = plans(name)
        assert "Exchange hashpartitioning" not in p, name
        assert "Join" not in p, name
        assert "Generate" not in p, name


def test_token_rarity_vocab_broadcasts(plans):
    """qd38: the vocab (token→count) side must broadcast at test SF so
    the stopword-skewed exploded stream never shuffles on the token key
    (the doc-id aggregate is the only hash exchange of the big side)."""
    p = plans("qd38_token_rarity")
    assert "BroadcastHashJoin" in p, p


def test_contamination_score_eval_side_broadcasts(plans):
    """qd39: training text never shuffles — the eval shingle set is
    distinct + broadcast, and the only hash exchanges key on doc id /
    shingle aggregation, never on raw text."""
    p = plans("qd39_contamination_score")
    assert "BroadcastHashJoin" in p, p


def test_keyset_pagination_is_take_ordered_with_pushed_filter(plans):
    """q64: the seek predicate reaches the scan (PushedFilters non-empty)
    and the page plans as TakeOrderedAndProject — page N costs page 1,
    unlike OFFSET's global row_number rank."""
    p = plans("q64_keyset_pagination")
    assert "TakeOrderedAndProject" in p, p
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p.split(
        "PushedFilters"
    )[1][:3], p


def test_interval_overlap_join_is_equi_join(plans):
    """q66: the overlap join must plan as an EQUI join on (key, cell) —
    never the per-key cross product / nested loop the raw inequality
    predicate would produce."""
    p = plans("q66_interval_overlap_join")
    for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        assert bad not in p, bad


def test_gold_star_broadcasts_dims_no_fact_shuffle_join(plans):
    """q69: the fact table joins both dims via BroadcastHashJoin — at
    scale the fact side must never shuffle for a dimension join — and no
    cartesian/BNLJ sneaks in via the surrogate-key joins."""
    p = plans("q69_gold_star")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the sales CSV scan must not sit under a BroadcastExchange
    for chunk in p.split("BroadcastExchange")[1:]:
        assert "sales_details" not in chunk[:2000], "fact side was broadcast"


def test_silver_replay_csv_scans_have_declared_schema(spark):
    """The replay readers declare source schemas: plan construction must
    not trigger an eager inference scan (no jobs before the action)."""
    from sql_data_warehouse_analytics_project_spark import queries_medallion as qm

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    dfs = qm._silver_tables(spark)          # construction only — lazy
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before
    raw = qm._read_csv(spark, qm.CRM_DIR, "sales_details.csv")
    assert dict(raw.dtypes)["sls_order_dt"] == "bigint"   # declared, not inferred
    assert dict(dfs["crm_sales"].dtypes)["sls_order_dt"] == "date"


def test_dim_builds_have_no_single_partition_window(plans):
    """Round-6 verdict #1: the gold dim surrogate keys are minted by the
    two-phase contiguous rank — the executed plan of the dim builds (and
    of the operator's ranking phase, asserted in test_operators) must
    never route the dimension through an Exchange SinglePartition."""
    for name in ("q74_dim_customers_rows", "q75_dim_products_rows"):
        p = plans(name)
        assert "SinglePartition" not in p, name


def test_round6_new_query_plans(plans):
    """Plan shapes of the round-6 additions: candidate generation stays
    bucketed/keyed — never a cartesian or nested-loop fallback — and the
    per-stratum cap is exactly one stratum-keyed exchange."""
    p = plans("qd41_cross_snapshot_dedup")
    assert "LeftAnti" in p, p  # ledger probe is an anti join on the hash
    assert "CartesianProduct" not in p

    p = plans("qd42_near_dup_against_snapshot")
    # band-bucket equi joins only: a nested-loop here would be |snap|x|batch|
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p

    p = plans("qd43_per_source_cap")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "SinglePartition" not in p

    p = plans("qd44_line_dedup")
    assert "CartesianProduct" not in p
    assert "Generate" in p  # the positional explode

    p = plans("q87_new_vs_returning")
    assert "CartesianProduct" not in p
    assert "Window" in p  # first-month via window, not a join-back


def test_round9_new_query_plans(plans, spark, sf_dir):
    """Plan shapes of the round-9 additions: the DSIR bucket model joins
    by broadcast (fixed 4096-row model — never a shuffle of the per-doc
    features against it), the span-dedup interval-merge window stays
    partitioned by document, and neither collapses any stage to a single
    partition."""
    p = plans("qd60_dsir_selection")
    assert "SinglePartition" not in p and "SortMergeJoin" not in p, p

    # the registry key checkpoints the weights (they feed two consumers),
    # which hides the scoring join from its final plan — assert the
    # broadcast on the operator itself
    from pyspark.sql import functions as F

    from sql_data_warehouse_analytics_project_spark.llm import sampling
    from sql_data_warehouse_analytics_project_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    p = (
        sampling.dsir_importance_weights(docs, "doc_id", F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .treeString()
    )
    assert "BroadcastHashJoin" in p, p
    assert "SortMergeJoin" not in p, p
    # the only single-partition exchange allowed is the 1-ROW totals
    # aggregate that broadcasts through the cross join — never the data
    assert p.count("Exchange SinglePartition") <= 1, p
    if "Exchange SinglePartition" in p:
        assert "BroadcastNestedLoopJoin BuildRight, Cross" in p, p

    p = plans("qd61_duplicate_span_stats")
    assert "SinglePartition" not in p and "SortMergeJoin" not in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
