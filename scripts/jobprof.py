"""Job-count / executor-CPU profiler (guide §1): wall time swings 3x+ on
this box, so per-query Spark JOB counts and executor task-time are the
stable evidence for A/B comparisons. For each named query: runs consume()
once (after bench-style warmups), reporting #jobs, #stages, executor task
ms, and wall.

Usage: python scripts/jobprof.py [--sf DIR] [--reps N] name...
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


def counters(spark):
    ss = spark._jsparkSession.sparkContext().statusStore()
    jobs = ss.jobsList(None)
    njobs = jobs.size()
    lst = ss.executorList(False)
    task_ms = sum(lst.apply(i).totalDuration() for i in range(lst.size()))
    return njobs, task_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    q.load_all()
    spark = get_session(app_name="jobprof", cores=32)
    q.get_query("Q01_pricing_summary").builder(spark, args.sf).count()
    spark.sparkContext.parallelize(range(32), 32).map(lambda x: x).count()

    for name in args.names:
        query = q.get_query(name)
        for rep in range(args.reps):
            release_query_memory(spark)
            j0, c0 = counters(spark)
            t0 = time.perf_counter()
            consume(query.builder(spark, args.sf))
            wall = time.perf_counter() - t0
            j1, c1 = counters(spark)
            print(
                f"{name:42s} rep{rep} jobs={j1 - j0:4d} "
                f"task_ms={c1 - c0:7d} wall={wall:7.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
