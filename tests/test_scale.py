"""Scale-posture assertions that execute (not just plan-check) AQE's
runtime defenses: skew-join splitting and spill accounting. The full-size
versions (60M-row derived dataset, 2g-heap spill probe) live in
scripts/scale_stress.py + BENCH_SCALE.json; these are the always-on
miniatures that keep the mechanisms pinned in CI-sized runs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_skew_join_split_engages(spark):
    """A genuinely skewed SMJ must come out of AQE with the hot partition
    SPLIT (skew=true on the executed join). Guards the probe design too:
    the join's shuffle stages must feed the SMJ directly — e.g. an
    aggregate between shuffle and join silently disqualifies the join
    from OptimizeSkewedJoin, which is exactly the kind of regression this
    test exists to catch."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    try:
        # 40% of 2M rows on key 0, the rest uniform over 10k keys
        left = spark.range(0, 2_000_000).select(
            F.when(F.col("id") % 10 < 4, F.lit(0))
            .otherwise(F.col("id") % 10_000)
            .alias("k"),
            F.col("id").alias("x"),
        )
        right = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("y")
        )
        j = (
            left.hint("merge")  # pin SMJ: broadcast would dodge the skew path
            .join(right, "k")
            .agg(F.sum(F.col("x") + F.col("y")).alias("s"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_substring_remove_long_document_is_linear(spark):
    """Long-document hazard probe for exact_substring_remove: a fully
    duplicated 100k-token document pair. The rebuild must be
    O(L + |removed|) (array_except hash set + element_at gather); the
    old per-position array_contains scan was O(L * |removed|) — ~10^10
    comparisons inside ONE task here, minutes of wall. The generous
    bound (60s on a box that swings 3x; measured ~6s) trips only on an
    accidental return to a quadratic rebuild."""
    import time

    from ops_spark.operators.dedup import exact_substring_remove

    n_tok = 100_000
    text = " ".join(f"t{i}" for i in range(n_tok))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    t0 = time.perf_counter()
    rows = {r.doc_id: r for r in exact_substring_remove(df).collect()}
    wall = time.perf_counter() - t0
    # doc 1 holds every canonical occurrence and survives whole;
    # doc 2 is entirely non-canonical and is excised to nothing
    assert rows[1].n_removed == 0 and rows[1].n_tokens == n_tok
    assert rows[2].n_removed == n_tok and rows[2].clean_text == ""
    assert wall < 60, f"long-document rebuild took {wall:.1f}s"


def test_stage_metrics_expose_spill_counters(spark):
    """stage_shuffle_metrics must carry memory/disk spill bytes — the
    counters the scale-stress spill probe (scripts/scale_stress.py)
    asserts on under a shrunken heap."""
    from ops_spark.plans.shuffle_policy import stage_shuffle_metrics

    spark.range(10_000).groupBy((F.col("id") % 7).alias("g")).count().collect()
    stages = stage_shuffle_metrics(spark)
    assert stages, "status store returned no stages"
    for s in stages[:3]:
        assert "memory_bytes_spilled" in s and "disk_bytes_spilled" in s
        assert s["memory_bytes_spilled"] >= 0 and s["disk_bytes_spilled"] >= 0


def test_local_cluster_remote_shuffle_executes():
    """The shuffle-policy story must hold where shuffles really cross JVM
    boundaries. Runs a shuffle join on `local-cluster[2,2,1024]` (two
    separate executor processes, standalone scheduler, BlockManager
    transfers over TCP) in a SUBPROCESS — a second master cannot coexist
    with the session fixture — and asserts (1) the join answer is
    correct and (2) the status store recorded REMOTE shuffle bytes
    (identically zero on local[N], where every block is process-local).
    The full battery-scale version of this evidence lives in
    scripts/cluster_bench.py / BENCH_CLUSTER.json."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from ops_spark.session import get_session
from ops_spark.plans.shuffle_policy import shuffle_report
from pyspark.sql import functions as F
spark = get_session(
    app_name="lc_remote_probe",
    master="local-cluster[2,2,1024]",
    cores=4,
    extra_confs={"spark.executor.memory": "1024m", "spark.driver.memory": "2g"},
)
a = spark.range(0, 300_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
b = spark.range(0, 300_000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
n = a.join(b.hint("merge"), "k").count()
print(json.dumps({"rows": n, **shuffle_report(spark)}))
spark.stop()
""" % {"repo": repo}
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON from subprocess: {out.stderr[-1500:]}"
    got = json.loads(lines[-1])
    assert got["rows"] == 300_000
    assert got.get("shuffle_remote_bytes_read", 0) > 0, got


def test_consume_defeats_count_join_elimination(spark):
    """count(1) over an enrichment query lets Catalyst drop the final
    aggregate-unique left join from the plan (row count provably
    preserved) — so a bench that measures count() measures NOTHING of
    such a query's body. conformance.consume hashes every output column,
    which keeps the join in the executed plan. Asserted at plan level."""
    from ops_spark.conformance import consume

    pts = spark.range(100)
    grouped = (
        spark.range(1_000)
        .select((F.col("id") % 100).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("n"))
    )
    df = pts.join(grouped, "id", "left").select(
        "id", F.coalesce("n", F.lit(0)).alias("n")
    )
    count_plan = (
        df.groupBy().count()._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Join" not in count_plan  # the hazard is real on this Spark
    hashed = df.select(F.xxhash64("id", "n").alias("h")).groupBy().sum("h")
    hash_plan = hashed._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in hash_plan  # consume's shape keeps the join
    assert consume(df) == 100


def test_consume_handles_map_and_array_outputs(spark):
    from ops_spark.conformance import consume

    df = spark.range(5).select(
        "id",
        F.create_map(F.lit("k"), F.col("id")).alias("m"),
        F.array("id", "id").alias("a"),
    )
    assert consume(df) == 5
