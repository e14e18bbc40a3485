"""Plan-shape tests: the 100-TB posture gate.

Correctness says what a query returns; these assert HOW it runs — filters
reach the scan, small sides broadcast, no accidental cartesian products,
aggregation is partial→final, top-k avoids a global sort. A regression here
is a query that still passes the oracle but would fall over at scale.
"""

from __future__ import annotations

import pytest

import ops_spark.queries as q
from ops_spark.plans import plan_summary

q.load_all()


def _plan(spark, sf_dir, name):
    return plan_summary(q.get_query(name).builder(spark, sf_dir))


def test_q1_pushdown_and_partial_agg(spark, sf_dir):
    from ops_spark.plans import plan_summary

    df = q.get_query("Q01_pricing_summary").builder(spark, sf_dir)
    df.collect()  # finalize THIS df's AQE plan (count() builds a new one)
    p = plan_summary(df)
    assert p.has_pushed_filters, "shipdate filter must reach the parquet scan"
    assert p.has_partial_aggregate, "aggregate must be partial->final"
    assert p.has_wholestage_codegen


def test_q1_prunes_columns(spark, sf_dir):
    p = _plan(spark, sf_dir, "Q01_pricing_summary")
    # 7 of 11 lineitem columns needed; the scan schema must not include
    # unused ones like l_partkey/l_suppkey.
    assert p.read_schemas and "l_partkey" not in p.read_schemas[0]


def test_q3_broadcasts_customer(spark, sf_dir):
    p = _plan(spark, sf_dir, "Q03_shipping_priority")
    assert p.n_broadcast_hash_joins >= 1
    assert p.n_cartesian == 0
    assert p.has_take_ordered, "top-k must plan TakeOrderedAndProject, not global sort"


def test_q5_no_cartesian_many_broadcasts(spark, sf_dir):
    p = _plan(spark, sf_dir, "Q05_local_supplier_volume")
    assert p.n_cartesian == 0
    assert p.n_broadcast_hash_joins >= 2, "dims must broadcast"


def test_semi_anti_join_planned(spark, sf_dir):
    assert _plan(spark, sf_dir, "Q04_order_priority").total_joins() >= 1
    assert _plan(spark, sf_dir, "Q22_dormant_customers").total_joins() >= 2


def test_asof_join_single_shuffle_no_quadratic(spark, sf_dir):
    p = _plan(spark, sf_dir, "join_asof")
    assert p.n_cartesian == 0 and p.n_nested_loop_joins == 0
    # union + one window = at most a couple of exchanges, never per-key work
    assert p.n_shuffle_exchanges <= 3


def test_ann_topk_no_cartesian(spark, sf_dir):
    p = _plan(spark, sf_dir, "x_llm_ann_lsh_topk")
    assert p.n_cartesian == 0 and p.n_nested_loop_joins == 0, (
        "LSH ANN must be an equi join on bucket id"
    )


def test_minhash_partial_aggregation(spark, sf_dir):
    p = _plan(spark, sf_dir, "llm_minhash_lsh_dedup")
    assert p.has_partial_aggregate, (
        "signature min-aggs must combine map-side (shuffle = docs x k ints)"
    )


def test_window_single_exchange_per_spec(spark, sf_dir):
    p = _plan(spark, sf_dir, "window_ranking")
    # six ranking functions over ONE window spec must share one shuffle
    assert p.n_shuffle_exchanges == 1


def test_shuffle_policy_advisor():
    from ops_spark.plans import ShufflePolicy, advise_partitions
    from ops_spark.plans.shuffle_policy import GiB, MiB

    # 100 TB input, 1000-executor * 4-core cluster
    parts = advise_partitions(100 * 1024 * GiB, 4000)
    assert parts == pytest.approx(100 * 1024 * GiB // (128 * MiB) + 1)
    # tiny input never under-parallelizes below 2x cores
    assert advise_partitions(1 * GiB, 32) == 64
    policy = ShufflePolicy.for_volume(10 * GiB, 32)
    confs = policy.confs()
    assert confs["spark.sql.adaptive.skewJoin.enabled"] == "true"
    assert int(confs["spark.sql.shuffle.partitions"]) >= 64


def test_shuffle_metrics_capture(spark, sf_dir):
    from ops_spark.plans import stage_shuffle_metrics

    q.get_query("Q01_pricing_summary").builder(spark, sf_dir).count()
    stages = stage_shuffle_metrics(spark)
    assert stages, "status store must yield stage metrics"
    assert any(s["shuffle_write_bytes"] > 0 for s in stages), (
        "the groupBy must have produced shuffle writes"
    )


def test_rebalance_hint_plans_aqe_rebalance(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.plans import rebalance

    li = load_table(spark, sf_dir, "lineitem")
    df = rebalance(li.select("l_orderkey", "l_quantity"), "l_orderkey")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "RebalancePartitions" in plan or "rebalance" in plan.lower()
    assert df.count() == li.count()  # rebalancing never changes content


def test_observe_metrics(spark, sf_dir):
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.plans import observe_rows

    li = load_table(spark, sf_dir, "lineitem").filter("l_quantity > 0")
    df, obs = observe_rows(
        li, rows=F.count(F.lit(1)), qty=F.round(F.sum("l_quantity"), 2)
    )
    n = df.count()
    got = obs.get
    assert got["rows"] == n and got["qty"] > 0


def test_policy_apply_roundtrip(spark):
    from ops_spark.plans import ShufflePolicy

    before = spark.conf.get("spark.sql.shuffle.partitions")
    ShufflePolicy(shuffle_partitions=77).apply(spark)
    assert spark.conf.get("spark.sql.shuffle.partitions") == "77"
    spark.conf.set("spark.sql.shuffle.partitions", before)


def test_cbo_analyze_stats_drive_join_reorder(spark, sf_dir):
    """ANALYZE TABLE statistics + CBO join reordering (reference
    AnalyzeTableCommand.scala:28, CostBasedJoinReorder.scala:35). The query
    is written in adversarial textual order — fact table first — so the
    left-deep default joins customer before the tiny filtered dimensions;
    with rowCount + column NDV stats and CBO on, the optimizer must rebuild
    the tree to join nation⋈region first. At 100 TB this reorder is the
    difference between shuffling the fact table once and shuffling every
    intermediate."""
    from ops_spark.plans import (
        analyze,
        cbo,
        join_leaf_order,
        snapshot_tables,
        table_row_count_stat,
    )

    names = snapshot_tables(
        spark,
        sf_dir,
        {
            "customer": ["c_nationkey"],
            "nation": ["n_nationkey", "n_regionkey"],
            "region": ["r_regionkey", "r_name"],
        },
    )
    for t, cols in (
        ("customer", ["c_nationkey"]),
        ("nation", ["n_nationkey", "n_regionkey"]),
        ("region", ["r_regionkey", "r_name"]),
    ):
        analyze(spark, names[t], cols)

    # Table-level stats materialized: the optimizer sees exact rowCount
    # (only surfaced when CBO is on; size-only otherwise). Compare against
    # the actual table count so the test holds at any fixture scale
    # (OPS_SPARK_TEST_SF sweeps run this at sf0.01 too).
    expected_rows = spark.table(names["customer"]).count()
    with cbo(spark, True):
        assert table_row_count_stat(spark, names["customer"]) == expected_rows
    # Column-level stats materialized (NDV/min/max for the join key).
    desc = {
        r.info_name: r.info_value
        for r in spark.sql(
            f"DESCRIBE EXTENDED {names['nation']} n_nationkey"
        ).collect()
    }
    assert desc["min"] == "0" and int(desc["distinct_count"]) >= 20

    q = f"""
        SELECT c.c_custkey, n.n_name
        FROM {names["customer"]} c
        JOIN {names["nation"]} n ON c.c_nationkey = n.n_nationkey
        JOIN {names["region"]} r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    """
    with cbo(spark, False):
        off = join_leaf_order(spark.sql(q))
    with cbo(spark, True):
        on = join_leaf_order(spark.sql(q))
        n_on = spark.sql(q).count()
    assert off[0].startswith("customer"), f"textual order expected first: {off}"
    assert on != off and not on[0].startswith("customer"), (
        f"CBO did not reorder: off={off} on={on}"
    )
    # Reorder must not change results.
    with cbo(spark, False):
        assert spark.sql(q).count() == n_on


def test_ensure_runtime_confs_respects_explicit_200(spark):
    # A deliberately-chosen 200 (e.g. ShufflePolicy(shuffle_partitions=200))
    # is indistinguishable from the stock default by VALUE; the resize must
    # key on SQLConf's explicit-set tracking, not the number.
    from ops_spark.session import ensure_runtime_confs

    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        ensure_runtime_confs(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


# Queries where an all-pairs operator is the INTENDED plan, with why:
#   join_cross          — the cross-join operator itself
#   llm_cosine_topk     — documented brute-force ANN baseline (broadcast cross)
#   llm_embedding_dedup — exact-dedup oracle path (broadcast cross)
#   Q11_important_parts — 1-row global-threshold broadcast (scalar-subquery shape)
#   Q22_dormant_customers — 1-row avg-acctbal broadcast (scalar-subquery shape)
_ALL_PAIRS_OK = {
    "join_cross",
    "llm_cosine_topk",
    # RRF's dense input is cosine_topk's broadcast-queries scan: corpus ×
    # |Q|=3 rows — linear in the corpus, bounded by the query battery,
    # the same shape llm_cosine_topk blesses above
    "llm_rrf_hybrid",
    "Q11_important_parts",
    "Q22_dormant_customers",
    "llm_bm25_scores",  # 1-row corpus-constants broadcast (scalar shape)
    "llm_tfidf_topk",  # 1-row n_docs broadcast (scalar shape, retrieval.py)
    "llm_ngram_lm_score",  # 1-row model-total broadcast (scalar shape, text.py)
    "llm_dsir_weights",  # two 1-row corpus-total broadcasts (scalar shape, retrieval.py)
    "llm_dsir_sample",  # same scalar broadcasts via dsir_importance
    "llm_embedding_standardize",  # 1-row stats-map broadcast (scalar shape)
    # 8 single-row count(*) subqueries cross-joined (TPC-DS q88's exact
    # shape): every BNLJ side is one aggregate row, so the "cross join"
    # is 8 scalar broadcasts
    "sql_tpcds_q88_bucket_counts",
    # same scalar shape, 2 single-row count(*) subqueries (q90's am/pm ratio)
    "sql_tpcds_q90_scalar_ratio",
    # llm_embedding_dedup left this list in round 3: the exact tier is now
    # chunk-pair cogrouped GEMM — quadratic WORK, but no cross-join stage.
}


def test_no_accidental_all_pairs_plans(spark):
    """Scale gate: no registered batch query may plan a CartesianProduct or
    BroadcastNestedLoopJoin unless it is on the explicit allowlist above.
    At 100 TB an accidental all-pairs stage is the difference between a job
    and an outage; this sweeps every query, so a new operator that silently
    loses its equi-join condition fails here, not on the cluster."""
    from ops_spark.queries import load_all
    from ops_spark.queries.registry import all_queries

    load_all()
    sf_dir = "/root/testdata/sf0.001"
    offenders = {}
    for name, q in sorted(all_queries().items()):
        if name.startswith("stream_"):
            continue  # streaming plans are bounded-state by watermark, not here
        plan = q.builder(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        bad = [m for m in ("CartesianProduct", "BroadcastNestedLoopJoin") if m in plan]
        if bad and name not in _ALL_PAIRS_OK:
            offenders[name] = bad
    assert not offenders, f"unexpected all-pairs plans: {offenders}"


def _exec_plan(spark, sf_dir, name):
    plan = (
        q.get_query(name)
        .builder(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
    # count operators in the current (first) section only
    return plan.split("== Initial Plan ==")[0]


def test_tpcds_q67_single_expand_and_group_limit(spark, sf_dir):
    # The 4-level ROLLUP must plan as ONE ExpandExec over ONE lineitem
    # scan (5 grouping sets ≠ 5 scans — at 100 TB a per-set rescan is a
    # 5× read amplification), and the rank() <= 10 filter must engage
    # WindowGroupLimit (partial + final) so each partition keeps a
    # bounded heap instead of materializing every rollup row through
    # the rank window.
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q67_topk_rollup")
    assert len(re.findall(r"\bExpand\b", plan)) == 1
    assert len(re.findall(r"FileScan parquet \[l_", plan)) == 1
    assert len(re.findall(r"WindowGroupLimit", plan)) == 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_tpcds_q47_no_rescan_between_windows(spark, sf_dir):
    # The yearly-avg window and the lag/lead window run over the SAME
    # monthly aggregate: one orders scan, and the cascaded window apps
    # re-Exchange at most once beyond the aggregation shuffle (the
    # (n_name, yr) -> (n_name) partition change); a second scan or a
    # third exchange means the CTE body executed twice.
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q47_monthly_deviation")
    assert len(re.findall(r"FileScan parquet \[o_", plan)) == 1
    assert len(re.findall(r"\bWindow\b", plan)) == 2
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2


def test_tpcds_q64_deep_join_chain_plan(spark, sf_dir):
    # The q64-class 10-instance self-joined chain is the corpus's
    # hardest join-order stress: the inequality predicate (n1 <> n2)
    # must ride the supplier-nation equi-join (NEVER plan a cartesian /
    # nested-loop), every dimension must broadcast, and each self-join
    # arm re-derives the chain — the fact appears once per arm plus the
    # HAVING-CTE scan, <= 4 lineitem scans total (exchange reuse may
    # collapse some), not the 2x-per-dim blowup a bad order would give.
    import re

    df = q.get_query("sql_tpcds_q64_deep_join_self").builder(spark, sf_dir)
    df.collect()  # executed plan: AQE's final join strategies
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    joins = (
        plan.count("BroadcastHashJoin")
        + plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
    )
    # 9 joins per cross_sales arm x 2 arms + the self-join = 19
    assert joins == 19, plan[:3000]
    assert plan.count("BroadcastHashJoin") >= 6  # dims broadcast
    scans = len(re.findall(r"FileScan parquet \[l_", plan))
    assert 2 <= scans <= 4, scans


def test_tpcds_rollups_single_expand(spark, sf_dir):
    # Every ROLLUP query in the TPC-DS-shaped battery: exactly one
    # Expand, never a union-of-grouping-sets rewrite.
    import re

    for name in (
        "sql_tpcds_q05_channel_rollup",
        "sql_tpcds_q27_rollup_avg",
        "sql_tpcds_q36_margin_rank",
        "sql_tpcds_q77_channel_profit",
        "sql_tpcds_q14_cross_channel",
    ):
        plan = _exec_plan(spark, sf_dir, name)
        assert len(re.findall(r"\bExpand\b", plan)) == 1, name


def test_tpcds_q35_exists_or_plans_existence_join(spark, sf_dir):
    # The OR of two EXISTS cannot both be semi joins (a semi join filters
    # rows, so the second EXISTS would never see the rows the first
    # dropped); Spark must plan them as ExistenceJoin marker columns and
    # evaluate the OR in a Filter. A rewrite through UNION/DISTINCT would
    # rescan customer per branch — pin one customer scan.
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q35_exists_or")
    assert "ExistenceJoin" in plan
    assert len(re.findall(r"FileScan parquet \[c_", plan)) == 1


def test_tpcds_q78_plans_anti_join(spark, sf_dir):
    # sales-without-returns must plan as ONE anti join on the composite
    # line key — not a distinct-and-except rewrite (extra shuffle) and
    # never a BNLJ (the gate above also covers that).
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q78_no_return_net")
    assert "LeftAnti" in plan
    assert len(re.findall(r"\bExcept\b", plan)) == 0


def test_tpcds_q49_one_exchange_two_windows(spark, sf_dir):
    # Two rank() windows over the SAME partition key (channel) with
    # different order keys must share ONE Exchange — Spark plans the
    # second Window directly over the first's output with only a Sort in
    # between. A second hashpartitioning exchange on channel means the
    # partitioning was lost between the window apps (at 100 TB that is a
    # full extra shuffle of the aggregate). One lineitem scan: the
    # ratio/amount ranks come from one by_channel aggregate, not a
    # per-window rescan.
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q49_return_ranks")
    assert len(re.findall(r"\bWindow\b", plan)) == 2
    assert len(re.findall(r"FileScan parquet \[l_", plan)) == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2  # agg + window


def test_tpcds_q95_plans_semi_and_anti(spark, sf_dir):
    # The correlated EXISTS-over-self-join must decorrelate to a SEMI
    # join on the order key and the NOT EXISTS to an ANTI join — no
    # per-row subquery execution, no BNLJ.
    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q95_double_exists")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_tpcds_q01_decorrelates_to_equi_join(spark, sf_dir):
    # The correlated scalar subquery (per-nation average of the same CTE)
    # must decorrelate into an aggregate joined on the correlation key —
    # plan shows only hash/merge equi-joins, no nested-loop per-row
    # subquery execution.
    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q01_correlated_avg")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_soundex_golden(spark):
    """soundex (stringExpressions.scala surface) against the published
    algorithm's canonical examples (no DuckDB equivalent, so golden
    values instead of an oracle)."""
    from pyspark.sql import functions as F

    golden = {
        "Robert": "R163",
        "Rupert": "R163",
        "Ashcraft": "A261",
        "Tymczak": "T522",
        "Pfister": "P236",
        "Honeyman": "H555",
    }
    df = spark.createDataFrame([(k,) for k in golden], "name string")
    got = {r.name: r.sx for r in df.select("name", F.soundex("name").alias("sx")).collect()}
    assert got == golden


def test_sort_within_partitions(spark, sf_dir):
    """sortWithinPartitions (SortExec global=false): rows are ordered
    inside each partition with NO global exchange-for-sort — the cheap
    form that backs sorted-run writes and merge-friendly layouts."""
    from pyspark.sql import functions as F

    from ops_spark.io import load_table

    df = (
        load_table(spark, sf_dir, "orders")
        .repartition(4, "o_custkey")
        .sortWithinPartitions("o_orderdate", "o_orderkey")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Sort [keys], false, 0 — the `false` is global=false (per-partition sort)
    assert "Sort [" in plan and "], false, 0" in plan
    # within every partition the (date, key) sequence must be nondecreasing
    part = df.select(
        F.spark_partition_id().alias("pid"), "o_orderdate", "o_orderkey"
    ).toPandas()
    for _, g in part.groupby("pid"):
        keys = list(zip(g.o_orderdate, g.o_orderkey))
        assert keys == sorted(keys)


def test_q21_exchange_budget(spark, sf_dir):
    # SCALE.md claim: both per-order counts ride one window pass over
    # the single lineitem x orders join — ONE lineitem scan, ONE sort,
    # and at most 2 hash exchanges (the window's l_orderkey partitioning
    # when orders broadcasts, plus the final s_name aggregation). The
    # two collect_sets plan as back-to-back WindowExecs sharing that
    # sort (CollapseWindow is defeated by the interposed Project, which
    # costs a buffer pass but NO extra exchange/sort); a second Sort or
    # lineitem scan would mean the join subtree executes twice.
    import re

    df = q.get_query("Q21_waiting_suppliers").builder(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan.toString appends the pre-AQE "Initial Plan" —
    # count operators in the current (first) section only
    plan = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2
    assert len(re.findall(r"\bSort \[", plan)) == 1
    assert len(re.findall(r"\bWindow\b", plan)) <= 2
    assert len(re.findall(r"FileScan parquet \[l_orderkey", plan)) == 1
    assert "BroadcastHashJoin" in plan


def test_sql_hints_shape(spark, sf_dir):
    # /*+ BROADCAST(nation), REPARTITION(8) */ must actually pin the
    # broadcast build side and insert the explicit round-robin exchange.
    from ops_spark.plans import plan_summary
    from ops_spark.queries import load_all
    from ops_spark.queries.registry import get_query

    load_all()
    df = get_query("sql_hints").builder(spark, sf_dir)
    p = plan_summary(df)
    assert p.n_broadcast_hash_joins >= 1
    assert "REPARTITION" in df._jdf.queryExecution().optimizedPlan().toString() or (
        p.n_shuffle_exchanges >= 2
    )


def test_null_safe_join_is_hash_join(spark, sf_dir):
    # EqualNullSafe keys still hash-partition (null buckets together);
    # the planner must not fall back to BroadcastNestedLoopJoin.
    from ops_spark.plans import plan_summary
    from ops_spark.queries import load_all
    from ops_spark.queries.registry import get_query

    load_all()
    p = plan_summary(get_query("join_null_safe").builder(spark, sf_dir))
    assert p.n_nested_loop_joins == 0 and p.n_cartesian == 0
    assert p.total_joins() >= 1


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    # rank() <= k filters must plan the Spark 3.5 WindowGroupLimit
    # pushdown: each partition keeps only k candidates BEFORE the full
    # window sort — the difference between shuffling k rows per group and
    # shuffling every row at 100 TB.
    df = q.get_query("topk_per_group").builder(spark, sf_dir)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in txt


def test_recursive_cte_plans_union_loop(spark, sf_dir):
    # WITH RECURSIVE must plan Spark 4's UnionLoop iterative node, not be
    # silently rewritten to a bounded unroll; the loop body re-executes per
    # level with the previous level as input.
    df = q.get_query("sql_recursive_cte").builder(spark, sf_dir)
    txt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnionLoop" in txt or "CTERelation" in txt


def test_collated_filter_is_codegen_not_udf(spark, sf_dir):
    # COLLATE UTF8_LCASE comparisons must stay JVM-side (collation-aware
    # predicate), never fall back to a Python UDF.
    df = q.get_query("sql_collation").builder(spark, sf_dir)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_sql_scripting_variable_resolution(spark, sf_dir):
    # The script's DECLARE/SET variable must resolve: final SELECT returns
    # only orders above the computed average.
    import ops_spark.io as io_mod

    df = q.get_query("sql_scripting").builder(spark, sf_dir)
    total = df.agg({"n_big": "sum"}).collect()[0][0]
    io_mod.register_views(spark, sf_dir)
    n_orders = spark.table("orders").count()
    assert 0 < total < n_orders


def test_star_except_prunes_scan(spark, sf_dir):
    # SELECT * EXCEPT must behave as projection pruning: the excluded
    # columns never reach the parquet scan.
    df = q.get_query("sql_star_except_order_all").builder(spark, sf_dir)
    txt = df._jdf.queryExecution().executedPlan().toString()
    import re
    schemas = re.findall(r"ReadSchema: ([^\n]+)", txt)
    assert schemas and all("c_name" not in s and "c_acctbal" not in s for s in schemas)


def test_tablesample_repeatable(spark, sf_dir):
    # TABLESAMPLE ... REPEATABLE parser surface (SampleExec): deterministic
    # within an engine for a fixed seed; sampling algorithms differ across
    # engines, so this is pytest-pinned, not oracle-hashed.
    import ops_spark.io as io_mod

    io_mod.register_views(spark, sf_dir)
    a = spark.sql(
        "SELECT count(*) AS n FROM customer TABLESAMPLE (20 PERCENT) REPEATABLE (42)"
    ).collect()[0].n
    b = spark.sql(
        "SELECT count(*) AS n FROM customer TABLESAMPLE (20 PERCENT) REPEATABLE (42)"
    ).collect()[0].n
    total = spark.table("customer").count()
    assert a == b  # same seed -> same sample
    assert 0 < a < total


def test_identifier_clause_and_session_variables(spark, sf_dir):
    # IDENTIFIER() templating (Spark 3.5) + SQL session variables
    # (Spark 4 DECLARE/SET VAR outside scripting) — engine-specific
    # syntax, so pytest-pinned.
    import ops_spark.io as io_mod

    io_mod.register_views(spark, sf_dir)
    n1 = spark.sql("SELECT count(*) AS n FROM IDENTIFIER('nation')").collect()[0].n
    assert n1 == spark.table("nation").count()
    spark.sql("DECLARE OR REPLACE VARIABLE region_cap INT DEFAULT 2")
    spark.sql("SET VAR region_cap = 3")
    got = spark.sql(
        "SELECT count(*) AS n FROM region WHERE r_regionkey <= region_cap"
    ).collect()[0].n
    assert got == 4  # regionkeys 0..3


def test_distribute_by_plans_hash_exchange(spark, sf_dir):
    # DISTRIBUTE BY / SORT BY: hash exchange + intra-partition sort,
    # NO global sort (the scalable ETL layout clause).
    import ops_spark.io as io_mod

    io_mod.register_views(spark, sf_dir)
    df = spark.sql(
        "SELECT c_custkey, c_nationkey FROM customer "
        "DISTRIBUTE BY c_nationkey SORT BY c_custkey"
    )
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(c_nationkey" in txt
    assert "rangepartitioning" not in txt  # no global sort


def test_attribution_is_single_window_shuffle(spark, sf_dir):
    # The as-of attribution must stay one union + one per-user window
    # pass: exactly ONE shuffle exchange (the window's hashpartitioning
    # on user_id), never a join-shaped plan with two.
    from ops_spark.plans import plan_summary

    df = q.get_query("an_attribution").builder(spark, sf_dir)
    p = plan_summary(df)
    assert p.n_shuffle_exchanges == 1, p.text


def test_quality_checks_row_rules_one_scan(spark, sf_dir):
    # All row-level rules must ride one aggregation: the builder's
    # row-rule pass is a single collect of a 1-row aggregate. Verified by
    # counting scans in the FK-free portion: build a 3-rule check and
    # assert its job ran exactly one aggregate over one scan.
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators import quality as Qc

    o = load_table(spark, sf_dir, "orders")
    agg_df = o.agg(
        F.count("*").alias("n"),
        F.sum(Qc.not_null("o_custkey").predicate.cast("long")).alias("v0"),
        F.sum(Qc.in_range("o_totalprice", 0, 1e6).predicate.cast("long")).alias("v1"),
    )
    txt = agg_df._jdf.queryExecution().executedPlan().toString()
    assert txt.count("Scan parquet") == 1


def test_pipeline_full_exchange_budget(spark, sf_dir):
    # The 4-stage intake pipeline must stay cheap: quality filter and
    # split are zero-shuffle, dedup is one digest window, decontamination
    # one broadcast probe + one doc groupBy — a handful of exchanges,
    # and never a cartesian/nested-loop stage.
    p = _plan(spark, sf_dir, "llm_pipeline_full")
    assert p.n_cartesian == 0 and p.n_nested_loop_joins == 0
    assert p.n_shuffle_exchanges <= 5, p.text


def test_quality_checks_unique_rules_ride_same_scan(spark, sf_dir):
    # Uniqueness rules are count_distinct(struct(keys)) riding the SAME
    # aggregation as the row rules: one scan of the fact table no matter
    # how many unique/row rules are checked (multi-distinct plans through
    # Expand, still one read).
    from ops_spark.io import load_table
    from ops_spark.operators import quality as Qc

    o = load_table(spark, sf_dir, "orders")
    agg_df = Qc._report_agg(
        o,
        row_rules=[Qc.not_null("o_custkey"), Qc.in_range("o_totalprice", 0, 1e6)],
        unique=[["o_orderkey"], ["o_custkey", "o_orderdate"]],
    )
    txt = agg_df._jdf.queryExecution().executedPlan().toString()
    assert txt.count("Scan parquet") == 1, txt


def test_bloom_build_is_one_aggregation_no_distinct(spark):
    # The bloom build folds positions into bitmap words with ONE partial →
    # final bit_or aggregation: no distinct stage, no Expand, driver
    # receives ≤ m/64 longs.
    from pyspark.sql import functions as F

    from ops_spark.operators.bloom import _word_bitmap_df, optimal_m_k

    src = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    m, k = optimal_m_k(1000, 0.03)
    df = _word_bitmap_df(src, k, m)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert txt.count("HashAggregate") == 2, txt  # partial + final, nothing else
    assert "Expand" not in txt
    assert df.count() <= m // 64


def test_ivfpq_candidate_shuffle_excludes_query_vector(spark, sf_dir):
    """IVF-PQ's one candidate exchange must carry (query_id, vec_id,
    codes) ONLY — m smallint codes, not the dim-double query vector; the
    vector rides in via a map-side broadcast join AFTER the shuffle, and
    the FlatMapGroupsInPandas reuses that partitioning with no second
    exchange. Shipping __qv per candidate row would largely cancel the
    m-byte-codes bandwidth win the ADC tier exists to deliver."""
    from ops_spark.operators.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(8).selectExpr("vec_id as query_id", "embedding")
    df = ivfpq_topk(emb, q, k=5)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]  # AQE prints both; pin final
    lines = plan.splitlines()
    (rep_i,) = [i for i, l in enumerate(lines) if "REPARTITION_BY_COL" in l]
    assert "hashpartitioning(query_id" in lines[rep_i]
    # the exchange's direct child projects the narrow candidate row
    child = lines[rep_i + 1]
    assert "codes" in child and "__qv" not in child, child
    # __qv reaches the ADC UDF via the broadcast join, after the shuffle
    (fmg_i,) = [i for i, l in enumerate(lines) if "FlatMapGroupsInPandas" in l]
    assert "__qv" in lines[fmg_i]
    between = lines[fmg_i + 1 : rep_i]
    assert any("BroadcastHashJoin [query_id" in l for l in between), plan
    # and NO re-exchange between the repartition and the grouped UDF
    assert not any("Exchange hashpartitioning" in l for l in between), plan


def test_tpcds_q72_dims_broadcast_one_fact_scan(spark, sf_dir):
    # q72's whole point is join ORDER: the dimension chain must ride
    # broadcasts (no dim may force a fact shuffle), the lineitem fact is
    # scanned exactly once, and the promotion-analog LEFT join survives
    # as an outer join (never rewritten inner — the null-extension is
    # COUNTED in the output).
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q72_broadcast_chain")
    assert len(re.findall(r"FileScan parquet \[l_", plan)) == 1
    assert plan.count("BroadcastHashJoin") >= 3
    assert "LeftOuter" in plan


def test_tpcds_q09_fifteen_scalar_subqueries_one_row(spark, sf_dir):
    # The q9 CASE ladder must plan as scalar subqueries hung off the
    # 1-row anchor scan — 15 independent aggregates, each its own
    # subquery (they run as separate small jobs and reuse exchange
    # where Spark can), never a join explosion on the anchor.
    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q09_bucket_case")
    assert plan.count("Subquery") >= 10
    assert "CartesianProduct" not in plan


def test_tpcds_q87_plans_two_excepts_as_anti_joins(spark, sf_dir):
    # the EXCEPT chain must lower to anti joins on the distinct sets (a
    # per-branch distinct-and-subtract materialization would rescan), and
    # there must be exactly TWO of them for the two set differences
    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q87_except_chain")
    assert plan.count("LeftAnti") == 2


def test_tpcds_q44_window_group_limit_both_directions(spark, sf_dir):
    # Best/worst dual ranking: rn <= 10 must push a WindowGroupLimit
    # below EACH of the two row_number windows (per-partition top-k
    # state instead of a full per-partition sort buffer — the property
    # that makes a global ranking survive 2M+ aggregate rows), and the
    # rank-to-rank self-join must not plan a cartesian.
    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q44_best_worst_rank")
    assert plan.count("WindowGroupLimit") >= 2
    assert "CartesianProduct" not in plan


def test_tpcds_q10_existence_join_under_disjunction(spark, sf_dir):
    # The AND-ed EXISTS may plan as a true semi join, but the two EXISTS
    # under the OR must become ExistenceJoin marker columns (a semi
    # would drop rows the other branch still needs); customer is
    # scanned exactly once.
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q10_existence_demographics")
    assert "ExistenceJoin" in plan
    assert len(re.findall(r"FileScan parquet \[c_", plan)) == 1


def test_tpcds_q45_in_subquery_under_or_plans_existence_join(spark, sf_dir):
    # An IN-subquery under OR cannot be a semi join (it would drop rows
    # the IN-list branch still needs) — it must plan as an ExistenceJoin
    # marker feeding the disjunctive Filter, with no subquery re-scan of
    # orders.
    import re

    plan = _exec_plan(spark, sf_dir, "sql_tpcds_q45_in_subquery_or")
    assert "ExistenceJoin" in plan
    assert len(re.findall(r"FileScan parquet \[o_", plan)) == 1
