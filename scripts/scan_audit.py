"""Executed-plan duplication audit (guide §1.2/§7.2): for each named query,
run consume() once and report how many parquet-scan nodes the FINAL
(AQE-updated) executed plans contain, how many exchanges were reused, and
the Spark job count. Live scan counts are deterministic box-independent
evidence that a compute-once rewrite actually landed (wall time on this
box swings 3x under load).

Counts aggregate over every SQL execution the query triggered (fixture
builds + the consumed read), which matches how the r11 audits were taken.

Usage: python scripts/scan_audit.py [--sf DIR] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ops_spark.queries as q
from ops_spark.conformance import consume
from ops_spark.session import get_session, release_query_memory


def _store(spark):
    return spark._jsparkSession.sharedState().statusStore()


def _max_exec_id(spark) -> int:
    store = _store(spark)
    lst = store.executionsList()
    mx = -1
    for i in range(lst.size()):
        mx = max(mx, lst.apply(i).executionId())
    return mx


def _final_plan_counts(desc: str) -> tuple[int, int, int]:
    """(parquet scans, checkpoint scans, reused) inside the EXECUTED plan
    tree only.

    physicalPlanDescription for an adaptive plan prints "== Final Plan =="
    followed by "== Initial Plan ==" (per subquery too), then a details
    section repeating every operator header — counting the whole text
    therefore double/triple-counts each node (the r11 audits did exactly
    that; their numbers are comparable to each other but inflated).
    This counts only lines inside Final-Plan segments; for non-adaptive
    plans it counts the tree region before the details section. Each
    broadcast/shuffle build subtree still inlines its upstream scans'
    text, so duplicated-execution subtrees are what the count measures
    (a ReusedExchange prints one line without duplicating the subtree).
    """
    scans = ckpt = reused = 0
    adaptive = "== Final Plan ==" in desc
    counting = not adaptive
    for line in desc.splitlines():
        if adaptive:
            if "== Final Plan ==" in line:
                counting = True
                continue
            if "== Initial Plan ==" in line:
                counting = False
                continue
        elif line.startswith("(") and ") " in line[:7]:
            break  # details section of a non-adaptive plan
        if not counting:
            continue
        if "Scan parquet" in line:
            scans += 1
        elif "Scan ExistingRDD" in line:
            ckpt += 1
        elif "ReusedExchange" in line or "ReusedSubquery" in line:
            reused += 1
    return scans, ckpt, reused


def scan_counts(spark, since: int) -> tuple[int, int, int, int]:
    """(live parquet scans, checkpoint-RDD scans, reused exchanges,
    sql executions) over every execution with id > since, counted from
    the executed (AQE-final) plan trees."""
    store = _store(spark)
    lst = store.executionsList()
    scans = ckpt = reused = nexec = 0
    for i in range(lst.size()):
        e = lst.apply(i)
        if e.executionId() <= since:
            continue
        nexec += 1
        s, c, r = _final_plan_counts(e.physicalPlanDescription())
        scans += s
        ckpt += c
        reused += r
    return scans, ckpt, reused, nexec


def njobs(spark) -> int:
    ss = spark._jsparkSession.sparkContext().statusStore()
    return ss.jobsList(None).size()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    q.load_all()
    spark = get_session(app_name="scan_audit", cores=32)
    q.get_query("Q01_pricing_summary").builder(spark, args.sf).count()
    spark.sparkContext.parallelize(range(32), 32).map(lambda x: x).count()

    print(f"{'query':38s} {'scans':>5s} {'ckpt':>4s} {'reused':>6s} "
          f"{'execs':>5s} {'jobs':>4s} {'wall':>7s}")
    for name in args.names:
        release_query_memory(spark, quiet=True)
        since = _max_exec_id(spark)
        j0 = njobs(spark)
        t0 = time.perf_counter()
        try:
            consume(q.get_query(name).builder(spark, args.sf))
            wall = time.perf_counter() - t0
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: FAILED {exc}")
            continue
        scans, ckpt, reused, nexec = scan_counts(spark, since)
        jobs = njobs(spark) - j0
        print(f"{name:38s} {scans:5d} {ckpt:4d} {reused:6d} {nexec:5d} "
              f"{jobs:4d} {wall:6.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
