"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Mirrors the reference's measurement hooks (reference:
ShuffleMapTask.scala:141-156 `[OPS]-` phase log lines,
TaskMetrics.scala:58-65) at the query level: per-query wall time with a
warm JVM, result fully materialized via count() so every stage executes.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    import ops_spark.queries as q
    from ops_spark.session import get_session

    q.load_all()
    spark = get_session(app_name="ops_spark_bench", cores=cores)

    names = sorted(q.all_queries())
    # JVM/codegen warm-up on the flagship so q1 doesn't absorb session init.
    q.get_query("q1_pricing_summary").builder(spark, sf_dir).count()
    # Python-runner warm-up: the Python Data Source planner/worker pool is
    # separate infra from the JVM; spin it up with a 10-row read so the
    # first ops_events query isn't charged ~5 s of process startup.
    try:
        from ops_spark.io.pysource import register_python_source

        register_python_source(spark)
        spark.read.format("ops_events").option("rows", 10).option(
            "numPartitions", 1
        ).load().count()
    except Exception as exc:  # noqa: BLE001
        print(f"bench: python-source warmup skipped: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in names:
        query = q.get_query(name)
        t0 = time.perf_counter()
        try:
            query.builder(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 — record, don't abort the run
            timings[name] = -1.0
            print(f"bench: {name} failed: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Session-wide shuffle/IO totals — the modern mirror of the reference's
    # [OPS]- phase metrics (ShuffleMapTask.scala:141-156).
    from ops_spark.plans.shuffle_policy import shuffle_report

    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "shuffle": shuffle_report(spark),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
