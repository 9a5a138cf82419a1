"""Physical-plan discipline tests (SURVEY §4; the 100 TB checklist).

These assert the *shape* of the plan, not just results: pushdown reaches the
scan, small dims broadcast, top-k avoids global sort, and nothing in the
core surface drops to row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").filter(
        F.col("l_quantity") > 10
    ).select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)" in plan
    # column pruning: scan only reads the two needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_broadcast_enrich_uses_broadcast_hash_join(spark):
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["broadcast_enrich"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no shuffle of the fact side


def test_top_routes_plans_take_ordered(spark):
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["top_routes"](spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in _plan(df)


def test_no_python_udfs_in_core_queries(spark):
    """Core (reference-parity) queries must stay JVM-side end-to-end."""
    from newyork_taxi_etl_spark.registry import queries

    core = [
        "traffic_congestion",
        "value_by_slot_dow",
        "rank_in_group",
        "top_routes",
        "corr_by_group",
        "clean_keep_drop",
        "fare_validation",
        "profile_nulls",
        "broadcast_enrich",
        "revenue_by_nation",
    ]
    for name in core:
        plan = _plan(queries()[name](spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_semi_anti_join_forms(spark):
    from newyork_taxi_etl_spark.registry import queries

    anti = _plan(queries()["customers_without_orders"](spark, SF_SMOKE))
    semi = _plan(queries()["suppliers_in_order_nations"](spark, SF_SMOKE))
    assert "LeftAnti" in anti
    assert "LeftSemi" in semi


def test_whole_stage_codegen_covers_cleaning(spark):
    """The cleaning cascade must fuse into whole-stage codegen (one narrow
    stage, no exchanges)."""
    from newyork_taxi_etl_spark.operators import clean as C

    df = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    # arbitrary narrow filter chain, shaped like the taxi cleaning pipeline
    out = (
        df.filter(F.col("l_quantity") > 1)
        .withColumn("x", F.when(F.col("l_discount") < 0.05, 1).otherwise(0))
        .filter(F.col("l_extendedprice") < 50000)
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    # '*(1)' marks a whole-stage-codegen'd stage in the string plan
    assert plan.lstrip().startswith("*(1)")


def test_bucketed_join_has_no_join_side_exchange(spark):
    """bucketBy(custkey) tables sort-merge-join with ZERO pre-join shuffle:
    the only exchanges left are the post-join aggregate/sort ones."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["bucketed_colocated_join"](spark, SF_SMOKE)
    df.collect()  # materialize so AQE finalizes the plan
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # no exchange on either join key anywhere in the plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_range_join_is_equi_not_nested_loop(spark):
    """The bucketed range join must plan a hash equi-join on the bucket,
    never a nested-loop over the raw BETWEEN predicate."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["range_join_windows"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_asof_join_single_shuffle(spark):
    """The union+window as-of join costs one hash exchange on the key (plus
    the window sort) — no join operator, no range explosion."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["asof_join_events"](spark, SF_SMOKE))
    assert "Join" not in plan  # no physical join at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_pricing_summary_partial_agg_and_pushdown(spark):
    """TPC-H Q1 shape: shipdate predicate reaches the scan; the aggregate is
    the partial+final HashAggregate split (map-side combine shrinks the
    shuffle to group-cardinality rows per task — the 100 TB-critical shape)."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["pricing_summary"](spark, SF_SMOKE)
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate," in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Exchange" in plan


def test_hash_sample_is_scan_plus_filter(spark):
    """Deterministic sampling must stay a pure scan+filter: no shuffle, no
    Python, and column pruning intact on the sampled scan."""
    from newyork_taxi_etl_spark.operators.sampling import hash_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    df = hash_sample(docs, "doc_id", 10).select("doc_id", "lang")
    plan = _plan(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in _formatted(df)


def test_topn_per_group_plans_window_group_limit(spark):
    """Per-group top-n must prune map-side (WindowGroupLimit, Spark 3.5+):
    only ~n rows per group per task reach the shuffle — the difference
    between a top-3 and a full per-group sort at 100 TB."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["topn_per_group"](spark, SF_SMOKE)
    assert "WindowGroupLimit" in _plan(df)


def test_batch_sessionize_single_hash_exchange(spark):
    """Windows and the session rollup share the user_id partitioning: ONE
    hash exchange end-to-end (plus the final presentation sort)."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["batch_sessionize"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_join_condition_includes_salt(spark):
    """The salted join must key on (orderkey, _salt) so a hot key spreads
    over n_salt reducers; salt is dropped before the group-by."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["skew_salted_join"](spark, SF_SMOKE))
    assert "_salt" in plan  # join keys carry the salt
    # the post-join aggregate partitions on the group key only
    assert "Exchange hashpartitioning(o_orderpriority" in plan


def test_canonical_docs_anti_join_broadcasts_drop_list(spark):
    """The corpus must not shuffle to subtract the (tiny) drop list."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["dedup_canonical_docs"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "Exchange hashpartitioning(doc_id" not in plan


def test_grouping_sets_single_scan_expand(spark):
    """GROUPING SETS must plan one scan + Expand, not two jobs."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["grouping_sets_report"](spark, SF_SMOKE))
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling must actually engage on a skewed shuffle join
    (the runtime complement to the static salting in skew_salted_join):
    with 90% of rows on one key, the final adaptive plan marks the
    sort-merge join skew=true and replans the hot partition into splits."""
    old = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # thresholds scaled down so local test data qualifies as "skewed"
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 50).select(F.col("id").alias("rk"))
        j = left.join(right.hint("merge"), F.col("k") == F.col("rk")).groupBy().count()
        j.collect()  # AQE finalizes at runtime
        plan = _plan(j)
        assert "skew=true" in plan
        assert "skewed" in plan  # AQEShuffleRead coalesced and skewed
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_null_safe_join_plans_hash_join(spark):
    """eqNullSafe must stay an equi hash join (Spark rewrites the key as
    coalesce+isnull), never a nested-loop fallback."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["null_safe_join_agg"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan


def test_contamination_broadcasts_benchmark_shingles(spark):
    """Decontamination at 100 TB only works if the eval-set shingles
    broadcast: the corpus side must not shuffle for the overlap join."""
    from newyork_taxi_etl_spark.queries.curation import (
        contamination_ngram_overlap,
    )

    plan = _plan(contamination_ngram_overlap(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_tfidf_top1_plans_window_group_limit(spark):
    from newyork_taxi_etl_spark.queries.curation import tfidf_top_terms

    assert "WindowGroupLimit" in _plan(tfidf_top_terms(spark, SF_SMOKE))


def test_multiband_lsh_topk_broadcasts_query_side(spark):
    """The ANN candidate join must broadcast the (tiny) query band keys;
    the corpus band explode stays shuffle-free before the join."""
    from newyork_taxi_etl_spark.queries.similarity import (
        ann_lsh_bucketed_topk,
    )

    plan = _plan(ann_lsh_bucketed_topk(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_funnel_single_user_exchange(spark):
    """funnel_conversion's event reduction is ONE user_id hash exchange
    plus the 1-row final — no window, no join, no second pass."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["funnel_conversion"](spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Window" not in plan and "Join" not in plan


def test_large_volume_customers_take_ordered_top20(spark):
    """Q18 shape: the TOP-20 is TakeOrderedAndProject, never a global
    sort; the customer dim broadcasts."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["large_volume_customers"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_idle_rich_customers_anti_join_broadcast(spark):
    """Q22 shape: the recent-custkey set anti-joins broadcast-side; the
    scalar threshold is a broadcast nested loop over ONE row."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["idle_rich_customers"](spark, SF_SMOKE))
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )


def test_triangle_count_no_cartesian(spark):
    """Wedge join + closing-edge semi join stay equi-keyed — no
    BroadcastNestedLoop/cartesian stage over the edge set."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["similarity_triangle_count"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan


def test_exact_quantile_distributed_no_single_buffer(spark):
    """The exact quantile is a range-partitioned selection: the full-data
    shuffle is rangepartitioning (a distributed global sort), and no
    collect_list pulls the column into one aggregation buffer."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["exact_quantile"](spark, SF_SMOKE))
    assert "rangepartitioning" in plan
    assert "collect_list" not in plan
    # the target-position joins stay broadcast (2 rows/probability)
    assert "BroadcastHashJoin" in plan


def test_waiting_orders_semi_anti_stay_equi(spark):
    """Q21 shape: EXISTS/NOT EXISTS with a supplier-inequality residual
    must plan as equi semi/anti joins on orderkey — never a nested loop
    over the lineitem pairs."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["waiting_orders_suppliers"](spark, SF_SMOKE))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_grouped_quantile_dist_distributed(spark):
    """Grouped exact quantile: same discipline as the global one — the
    full-data shuffle is rangepartitioning on (group, value), no
    percentile/collect_list buffers a whole group in one task."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["grouped_quantile_dist"](spark, SF_SMOKE))
    assert "rangepartitioning" in plan
    assert "collect_list" not in plan and "percentile" not in plan
    assert "BroadcastHashJoin" in plan


def test_local_supplier_volume_all_dims_broadcast(spark):
    """Q5 shape: five broadcast joins, no shuffle join anywhere — lineitem
    is the only side that ever moves, and only into its aggregate."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["local_supplier_volume"](spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_bracket_predicate_stays_hash_join(spark):
    """Q19 shape: the OR-of-ANDs must not degrade the join — the common
    partkey condition is extracted into a BroadcastHashJoin and the
    disjunction stays a residual filter, never a nested loop."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["bracket_discount_revenue"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_grouped_cms_topk_window_group_limit(spark):
    """Grouped CMS heavy hitters: the per-group top-5 prunes map-side via
    WindowGroupLimit (never a global sort of the estimates), and the
    counter matrix joins broadcast."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["freq_tokens_cms_by_lang"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_market_share_no_nested_loop_dims_broadcast(spark):
    """Q8 shape: seven joins with nation in two roles — every dim leg
    broadcasts (region/nation/supplier/filtered part), nothing degrades
    to a nested loop or cartesian, and the date/type/region filters reach
    the scans."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["nation_market_share"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "EqualTo(p_type,ECONOMY)" in plan       # pushed to part scan
    assert "EqualTo(r_name,ASIA)" in plan          # pushed to region scan


def test_product_profit_like_pushed_dims_broadcast(spark):
    """Q9 shape: the non-sargable LIKE prunes part at ITS scan
    (StringContains pushdown) before part ever meets lineitem, the dim
    legs broadcast, and no nested loop appears."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["product_type_profit"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    assert "StringContains(p_name,bolt)" in plan


def test_min_cost_supplier_decorrelated_broadcast(spark):
    """Q2 shape: the correlated MIN decorrelates to a broadcast of the
    per-part min table — no nested loop, no cartesian, lineitem never
    sort-merge-joins, and the part filters reach the part scan."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["min_cost_supplier"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert "EqualTo(p_type,ECONOMY)" in plan  # pushed to part scan


def test_late_shipment_semi_join_stays_hash(spark):
    """Q4 shape: EXISTS with a non-equi residual must still plan as a
    single hash LeftSemi (equi key + post-probe condition), never a
    nested loop, and the 6-month order window is pushed to the scan."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["late_shipment_priority"](spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate," in plan  # pushed date slice


def test_important_part_values_single_row_threshold(spark):
    """Q11 shape: the global-scalar HAVING decorrelates to a 1-row
    aggregate joined in (the only tolerated nested-loop: one row), with
    both aggregates map-side combined (partial HashAggregate pairs)."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["important_part_values"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # partial+final pairs for the grouped agg and the threshold agg
    assert plan.count("HashAggregate") >= 4


def test_customer_order_distribution_outer_then_reagg(spark):
    """Q13 shape: LEFT OUTER with the exclusion in the ON clause — the
    filter must NOT appear as a post-join Filter over the join output
    (that would drop zero-order customers); count distribution re-agg."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["customer_order_distribution"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_supplier_cnt_anti_join_broadcast(spark):
    """Q16 shape: the NOT-IN exclusion list broadcasts as a LeftAnti hash
    join; brand/size filters are pushed to the part scan."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["supplier_cnt_by_part"](spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Not(EqualTo(p_brand,Brand#1))" in plan


def test_incremental_refresh_delta_scans_pruned(spark):
    """Differential MV refresh: every leg's date/status filters reach the
    parquet scans (the whole point — delta legs must not rescan history),
    all three aggregates are partial+final pairs, and the two merges are
    FullOuter hash-partitioned joins (never a nested loop)."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["incremental_agg_refresh"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("FullOuter") == 2
    assert plan.count("partial_count") >= 3               # map-side combine x3
    # pushdown claims via the formatted plan (toString elides long scans)
    fmt = _formatted(df)
    assert "LessThan(o_orderdate,1999-01-01" in fmt       # base+delete scans
    assert "GreaterThanOrEqual(o_orderdate,1999-01-01" in fmt   # insert scan
    assert "EqualTo(o_orderstatus,F)" in fmt              # delete scan


def test_hll_merge_gate_mergeable_partials(spark):
    """Sketch algebra: both the per-group sketches and their union run as
    partial+merge ObjectHashAggregate pairs (executor-mergeable binary
    state); the only nested loop is the tolerated 1-row x 1-row final
    assembly."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["hll_sketch_merge_gate"](spark, SF_SMOKE))
    assert "partial_hll_sketch_agg" in plan
    assert "partial_hll_union_agg" in plan
    assert "SortMergeJoin" not in plan


def test_exact_n_sample_plans_take_ordered(spark):
    """The exactly-N sampler is TakeOrderedAndProject (per-task top-N heap,
    driver merges O(partitions x N)), never a global Sort+Limit."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["exact_n_sample"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_temperature_mix_broadcasts_rates(spark):
    """The per-lang rate table joins back onto the corpus as a broadcast —
    the kept-row stream itself never shuffles for the join."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["temperature_mix_sampling"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_quantile_binning_no_global_window(spark):
    """Bin assignment is cut-point comparison (broadcast nested loop over a
    1-row cut table), NOT a global NTILE window: no Window operator and no
    single-partition Sort in the plan."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["quantile_binning_feature"](spark, SF_SMOKE))
    assert "Window" not in plan


def test_winsorize_broadcasts_cuts(spark):
    """p05/p95 cut rows broadcast back; the row stream joins without an
    exchange on its side."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["winsorized_group_stats"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_semantic_dedup_pairs_only_within_bucket(spark):
    """The SemDeDup self-join carries the bucket equality in a hash join —
    never a cartesian across buckets."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["semantic_dedup_buckets"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_bootstrap_fanout_is_map_local(spark):
    """The 64x Poisson-replica fan-out is a Generate (explode) inside the
    scan stage — no shuffle carries the fanned-out rows except the
    (group, replica) partial aggregate."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["poisson_bootstrap_ci"](spark, SF_SMOKE))
    assert "Generate explode" in plan
    assert "partial_sum" in plan                     # map-side combine


def test_linear_trend_broadcasts_origin(spark):
    """The 1-row time origin joins as a broadcast; sums are map-side
    combined partials."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["grouped_linear_trend"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_rrf_legs_broadcast_query_side(spark):
    """Both RRF legs broadcast the 5-query side against the corpus; the
    fusion join touches only O(queries x k) rows."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["rrf_hybrid_retrieval"](spark, SF_SMOKE))
    assert plan.count("BroadcastNestedLoopJoin") >= 2


def test_persisted_ann_probe_prunes_partitions(spark):
    """The index scan must carry the probe lists as a PartitionFilters
    entry on cid — reading corpus/n_lists x n_probe, never the corpus."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["ann_index_persisted_probe"](spark, SF_SMOKE)
    fmt = _formatted(df)
    assert "PartitionFilters" in fmt and "cid" in fmt


def test_table_diff_fingerprints_are_partial_aggregates(spark):
    """Both sides' bucket fingerprints must map-side combine (partial_sum /
    partial_count) — O(buckets) rows cross the network, never the table."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["table_diff_reconcile"](spark, SF_SMOKE))
    assert "partial_sum" in plan and "partial_count" in plan


def test_group_aware_split_tagging_is_shuffle_free(spark):
    """The split tag is a pure projection: the only exchanges belong to the
    two aggregates, and no Window operator appears."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["group_aware_split"](spark, SF_SMOKE))
    assert "Window" not in plan


def test_windowed_hll_sketches_are_mergeable_partials(spark):
    """The per-day HLL runs as partial+merge sketch aggregates (executor-
    mergeable binary state), like the sketch-merge gate."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["windowed_distinct_hll"](spark, SF_SMOKE))
    assert "partial_hll_sketch_agg" in plan


def test_incremental_ann_append_probe_prunes_partitions(spark):
    """After the append, the probe scan must still carry the probe lists
    as a PartitionFilters entry on cid — appending new vectors must not
    cost the probe its partition pruning."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["ann_index_incremental_append"](spark, SF_SMOKE)
    fmt = _formatted(df)
    assert "PartitionFilters" in fmt and "cid" in fmt


def test_attribution_join_is_hashed_not_nested_loop(spark):
    """The per-user time-range join must hash on the user equality key
    (range as residual) — never a nested-loop/cartesian over events."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["attribution_multitouch"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Cartesian" not in plan


def test_grouped_moments_are_one_combining_aggregate(spark):
    """All four power sums must map-side combine in ONE aggregate —
    partial_sum partials present, no Python boundary, no join."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["grouped_moment_stats"](spark, SF_SMOKE))
    assert plan.count("partial_sum") >= 4
    assert "BatchEvalPython" not in plan and "Join" not in plan


def test_jl_projection_stays_in_jvm(spark):
    """The 64x16 projection fold and both distance folds are higher-order
    functions — zero Python evaluation nodes anywhere in the plan."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["jl_projection_distortion"](spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_knn_eval_fixed_n_plans_take_ordered_and_broadcast(spark):
    """The r9 fixed-N rewrite's scale contract, pinned in the plan: the
    query sample is drawn by TakeOrderedAndProject (per-task top-N heap,
    no global sort — asserted on the draw pipeline itself, since the r10
    localCheckpoint materializes it out of the query plan) and enters the
    candidate cross join as a BROADCAST side built from the checkpointed
    O(N) rows (ExistingRDD, not a second corpus scan)."""
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.registry import queries
    from newyork_taxi_etl_spark.sources.readers import table_path

    emb = spark.read.parquet(table_path(SF_SMOKE, "embeddings"))
    draw = emb.orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    ).limit(512)
    assert "TakeOrderedAndProject" in _plan(draw)

    plan = _plan(queries()["knn_label_accuracy"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan  # broadcast q x corpus scan
    assert "Scan ExistingRDD" in plan  # the checkpointed O(N) sample


def test_ivfpq_scan_prunes_cells_and_broadcasts(spark):
    """The composed IVF-PQ search reads ONLY the probed cid partitions
    (static PartitionFilters on the code scan), every small side
    (probes, distance tables) broadcasts, and nothing plans a
    cartesian."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["ann_ivfpq_adc_topk"](spark, SF_SMOKE)
    fmt = _formatted(df)
    assert "PartitionFilters" in fmt and "cid" in fmt
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_filtered_probe_pushes_partition_and_label_filters(spark):
    """Filtered ANN: the probed cids prune partitions AND the union of
    query labels pushes to the rowgroup scan — both filters visible in
    the formatted plan; the per-query refinement joins broadcast."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["ann_index_filtered_probe"](spark, SF_SMOKE)
    fmt = _formatted(df)
    assert "PartitionFilters" in fmt and "cid" in fmt
    assert "PushedFilters" in fmt and "In(label" in fmt
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_passage_dedup_no_cartesian_and_capped_bucket_join(spark):
    """Passage LSH must pair candidates ONLY through band-bucket equi
    joins (never a cartesian), with the hot-bucket cap applied as a
    broadcast anti join before the self-join."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["dedup_passage_lsh"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # hot-cap anti join broadcasts


def test_pmi_joins_broadcast_vocab_and_take_ordered(spark):
    """The unigram join sides are vocab-sized: they must broadcast, the
    totals row must broadcast (nested-loop on a 1-row build is fine),
    and the top-15 must be TakeOrderedAndProject, never a global sort."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["pmi_collocations"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_target_encoding_broadcasts_group_table(spark):
    """The O(groups) encode table must broadcast back onto the event
    stream — the encode projection itself adds no shuffle."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["target_encoding_loo"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_auc_window_runs_on_aggregated_scores(spark):
    """The AUC cumulative window must sit ABOVE the groupBy(p) aggregate
    (bounded input), never over raw corpus rows — and the aggregate
    must have a map-side partial."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["quality_auc_rank"](spark, SF_SMOKE))
    win = plan.index("Window")
    keyed = plan.index("HashAggregate(keys=[p")
    # executedPlan prints top-down: the groupBy(p) aggregate must sit
    # BELOW the Window (appear after it), i.e. the window input is the
    # bounded per-distinct-score table, not raw corpus rows
    assert win < keyed, plan[:2000]
    assert "partial_sum" in plan  # the score aggregate map-side combines


def test_skyline_sorts_cells_and_broadcasts_frontier(spark):
    """Pareto skyline's scale contract: the only global sort feeds the
    window over DISTINCT (price, size) cells — the corpus-side join with
    the frontier is a BROADCAST hash join, and the distinct reduction
    map-side combines (partial aggregate before the exchange)."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["pareto_skyline_parts"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_mmd_is_one_pass_no_python(spark):
    """The MMD sufficient statistics must stay JVM-side (no Python eval
    nodes) and aggregate with map-side partials; the only joins are on
    the O(d)-row moment tables."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["mmd_moment_drift"](spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan


def test_curriculum_stages_no_global_ntile(spark):
    """NTILE(4) over the corpus is reproduced by the range-partitioned
    position fold: no ntile in the plan, the full-data shuffle is
    rangepartitioning, and the only unpartitioned Window (the offset
    prefix sum) runs above the per-pid aggregate — never over raw rows."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["curriculum_quality_stages"](spark, SF_SMOKE))
    assert "ntile" not in plan
    assert "rangepartitioning" in plan
    win = plan.index("Window")
    assert "HashAggregate(keys=[_pid" in plan[win:], plan[win:win + 400]


def test_gini_rank_is_rangepartitioned_fold(spark):
    """The Gini rank-weight i comes from the position fold: the O(customers)
    table range-partitions (never a single-partition row_number), and the
    only unpartitioned Window (offset prefix sum) sits above the per-pid
    aggregate."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["gini_revenue_concentration"](spark, SF_SMOKE))
    assert "row_number" not in plan
    assert "rangepartitioning" in plan
    win = plan.index("Window")
    assert "HashAggregate(keys=[_pid" in plan[win:], plan[win:win + 400]


def test_nucleus_cumsum_is_rangepartitioned_fold(spark):
    """The nucleus prefix sum is offset[pid] + a pid-PARTITIONED running
    sum — every Window in the plan is either pid-partitioned or runs above
    the per-pid aggregate; the O(users) table range-partitions."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["nucleus_user_coverage"](spark, SF_SMOKE))
    assert "rangepartitioning" in plan
    # the within-partition running sum declares the pid PARTITION SPEC —
    # a Window node whose partition list is exactly [_pid#N]; a regression
    # to an unpartitioned running-sum window drops this list and fails.
    import re

    assert re.search(r"\], \[_pid#\d+L?\], \[", plan), plan[
        plan.index("Window") : plan.index("Window") + 400
    ]
    win = plan.index("Window")
    assert "HashAggregate(keys=[_pid" in plan[win:], plan[win:win + 400]


def test_shard_assignment_head_is_window_group_limit(spark):
    """The head fingerprint must NOT rank the whole corpus through 16
    window partitions: the rank<=3 filter sits directly above row_number
    so Spark plans WindowGroupLimit (map-side local min-3 per shard
    before the exchange), and the balance aggregate is a plain map-side
    combined groupBy — no corpus-sized per-shard sort anywhere."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["training_shard_assignment"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "partial_count" in plan or "partial_sum" in plan
    # the 16-row head side broadcasts back onto the 16-row balance side
    assert "BroadcastHashJoin" in plan


def test_shard_export_checksum_is_map_side_combinable(spark):
    """The manifest fingerprint must be a commutative sum (O(1) agg state
    per shard): no collect_list / sort_array in the plan, and the
    aggregate carries map-side partials."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["corpus_shard_export"](spark, SF_SMOKE))
    assert "collect_list" not in plan
    assert "partial_sum" in plan


def test_wasserstein_window_runs_on_tick_counts(spark):
    """W1 must reduce the corpus to per-tick counts BEFORE the cumulative
    window: the window's child contains the hash aggregate on v, so the
    sort touches O(distinct ticks) rows, never raw events."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["wasserstein_value_drift"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "Window" in plan
    # the aggregate on the tick key sits below the window
    win_pos = plan.index("Window")
    assert "HashAggregate(keys=[v" in plan[win_pos:], plan[win_pos:win_pos + 400]
    assert "BatchEvalPython" not in plan


def test_ann_ranking_quality_prunes_and_broadcasts(spark):
    """The ranking-quality probe reads only the probed cid partitions
    (PartitionFilters on the assignments scan) and every candidate join
    keeps the O(N) query sample on the broadcast side — the exact-truth
    cross join must never shuffle the corpus."""
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["ann_ranking_quality"](spark, SF_SMOKE)
    fmt = _formatted(df)
    assert "PartitionFilters" in fmt and "cid" in fmt
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan  # exact side: broadcast x corpus
    assert plan.count("BroadcastHashJoin") >= 2  # probes->idx, rel, per-query


def test_hard_negative_mining_plan_shape(spark):
    """The mining pass must be: broadcast 64-anchor side (BNLJ crossjoin,
    never CartesianProduct), map-side per-anchor top-4 (WindowGroupLimit
    from the rank<=4 filter), all JVM-side."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["hard_negative_mining"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_exact_substring_family_stays_jvm_side(spark):
    """The ExactSubstr family (runs, strip ledger, span decontamination)
    must stay in built-in expressions — no Python eval nodes, no
    cartesian joins (the pair join is an equi-join on the gram)."""
    from newyork_taxi_etl_spark.registry import queries

    for name in (
        "dedup_exact_substring",
        "dedup_substring_strip",
        "decontamination_exact_substring",
    ):
        plan = _plan(queries()[name](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name


def test_unigram_trainer_stays_jvm_side(spark):
    """The Viterbi fold is a built-in higher-order aggregate: the whole
    trainer must carry no Python eval nodes; the word-vocab aggregate
    must combine map-side."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["unigram_lm_train"](spark, SF_SMOKE))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ccnet_buckets_no_global_ntile(spark):
    """Per-language NTILE(3) is reproduced by the range-partitioned
    position fold plus the integer size formula: no ntile in the plan,
    the full-data shuffle is rangepartitioning, and the unpartitioned
    Windows (offset prefix sums) run above bounded inputs — the per-pid
    aggregate and the 5-row language count table — never raw rows."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["ccnet_perplexity_buckets"](spark, SF_SMOKE))
    assert "ntile" not in plan
    assert "rangepartitioning" in plan
    win = plan.index("Window")
    tail = plan[win:]
    assert (
        "HashAggregate(keys=[_pid" in tail
        or "HashAggregate(keys=[lang" in tail
    ), tail[:400]


def test_round11b_family_stays_jvm_side(spark):
    """Session-2 additions: no Python boundary anywhere, and the
    broadcast-model shapes hold — SQ8's (mins, steps) row and DSIR's
    64-bucket log-ratio table must broadcast, never shuffle-join."""
    from newyork_taxi_etl_spark.registry import queries

    for name in (
        "ann_sq8_adc_topk",
        "ann_recall_sq8",
        "wordpiece_merge_loop",
        "wordpiece_holdout_fertility",
        "dsir_importance_select",
        "span_corruption_plan",
        "ccnet_perplexity_buckets",
        "distinct_n_diversity",
    ):
        plan = _plan(queries()[name](spark, SF_SMOKE))
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
    for name in ("ann_sq8_adc_topk", "dsir_importance_select"):
        plan = _plan(queries()[name](spark, SF_SMOKE))
        assert "BroadcastExchange" in plan, name


def test_distinct_n_has_no_expand(spark):
    """The two-level aggregate must keep the count+distinct rollup free
    of the Expand the single mixed aggregate plans (2x the exploded
    n-gram stream through the shuffle)."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["distinct_n_diversity"](spark, SF_SMOKE))
    assert "Expand" not in plan, plan[:400]


def test_zipf_rank_is_rangepartitioned_fold(spark):
    """The Zipf ln(rank) regressor comes from the position fold: the
    vocab-sized frequency table range-partitions (never an unpartitioned
    row_number window — 1e8-1e9 distinct tokens at 100 TB web text would
    sort through ONE task), and the only Window in the plan is the
    per-partition offset prefix sum above the per-pid aggregate."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["zipf_token_slope"](spark, SF_SMOKE))
    assert "row_number" not in plan
    assert "rangepartitioning" in plan
    win = plan.index("Window")
    assert "HashAggregate(keys=[_pid" in plan[win:], plan[win:win + 400]


def test_wordpiece_greedy_vocab_is_broadcast(spark):
    """The greedy runtime's vocabulary (chars + merges) must broadcast
    onto the cell grid — a shuffle join on `piece` would exchange the
    whole O(vocab x len x L) candidate grid."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["wordpiece_greedy_segment"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_dsir_affinity_models_are_broadcast(spark):
    """The all-targets log-ratio table (targets x 64 rows) must broadcast
    onto the token-bucket stream — shuffling the corpus-sized stream
    against a tiny model table would be the scale-killer."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["dsir_domain_affinity"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rrf_bm25_leg_is_distributed_topk(spark):
    """The BM25 leg's top-50 must plan as TakeOrderedAndProject (the
    distributed top-K), never a global sort of all scored docs; the rank
    window then runs over the 50-row result only."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["hybrid_rrf_fusion"](spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_hill_topk_is_window_group_limit(spark):
    """The Hill estimator's top-65 order statistics must never sort a
    language's full document set: the rn<=65 filter sits directly above
    row_number so Spark plans WindowGroupLimit (map-side local top-65
    per language before the exchange), and the threshold row joins back
    by broadcast."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["hill_tail_index"](spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_label_margin_centroids_are_broadcast(spark):
    """Member-to-centroid distances join each vector to its OWN centroid
    row via broadcast (labels x dims — never a shuffle of the exploded
    corpus against itself), and the labels^2 centroid-pair leg is
    broadcast too; the corpus-sized reductions are partial-aggregated."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["embedding_label_margin"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_ewma_reduces_before_pair_join(spark):
    """The O(days^2) EWMA pair join runs over the DAILY table: the plan
    must partial-aggregate events down to (type, day) before any join
    (map-side combine), and the pair join itself is day-index
    equi-joined on event_type — no join touches raw event rows."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["ewma_anomaly_flags"](spark, SF_SMOKE))
    assert "partial_sum" in plan
    assert "CartesianProduct" not in plan


def test_heaps_positions_are_rangepartitioned(spark):
    """Heaps' first-occurrence positions come from the ordered_positions
    fold: the corpus range-partitions and no unpartitioned row_number
    ranks documents (the zipf/ccnet discipline); checkpoint joins are
    broadcast."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["heaps_law_exponent"](spark, SF_SMOKE))
    assert "row_number" not in plan
    assert "rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_semantic_decon_never_all_pairs(spark):
    """Candidates meet only inside LSH band buckets: no cartesian
    product anywhere in the decontamination plan."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["semantic_decontamination"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_zipf_by_source_uses_composite_fold(spark):
    """Per-source rank comes from ONE composite ordered_positions fold
    (rangepartitioning) with the 20-row base-offset broadcast back —
    never a source-partitioned row_number over per-source vocabularies."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["zipf_slope_by_source"](spark, SF_SMOKE))
    assert "row_number" not in plan
    assert "rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan


def test_lcp_depth_is_pure_counting(spark):
    """The suffix-LCP profile is duplicated-d-gram COUNTING: one ladder
    explode + two hash aggregates — no suffix sort (no global
    rangepartitioning of the gram stream into a window), no pair join,
    no cartesian anywhere."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["lcp_repetition_depth"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "row_number" not in plan
    assert "SortMergeJoin" not in plan  # aggregates only, never a pair join
    assert "partial_sum" in plan or "partial_count" in plan


def test_source_growth_matrix_uses_composite_folds(spark):
    """Both growth legs run off composite range-partitioned folds (the
    zipf/heaps discipline): no per-source row_number windows; checkpoint
    and offset tables broadcast back."""
    from newyork_taxi_etl_spark.registry import queries

    plan = _plan(queries()["source_growth_matrix"](spark, SF_SMOKE))
    assert "row_number" not in plan
    assert "rangepartitioning" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
