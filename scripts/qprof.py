"""Per-query profiler for the optimization rounds (guide §1).

Usage: python scripts/qprof.py [--sf DIR] [--reps N] [--plans OUTDIR] [--tag T] name...

For each named registry query: builds the DataFrame, optionally writes
``<OUTDIR>/<name>_<tag>.txt`` with ``.explain("formatted")`` plus a shuffle
summary, then times ``consume()`` (bench.py's hash-all-columns action) N
times with between-run session hygiene, reporting each rep and the min.
Jobs are labelled via setJobDescription (guide §1.5).
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    q.load_all()
    spark = get_session(app_name="qprof", cores=32)
    # same warmups as bench.py so rep-1 numbers aren't session startup
    q.get_query("Q01_pricing_summary").builder(spark, args.sf).count()
    spark.sparkContext.parallelize(range(32), 32).map(lambda x: x).count()

    for name in args.names:
        query = q.get_query(name)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = query.builder(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(plan)
            release_query_memory(spark, quiet=True)
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"qprof:{name}#{rep}")
            t0 = time.perf_counter()
            try:
                consume(query.builder(spark, args.sf))
                times.append(round(time.perf_counter() - t0, 4))
            except Exception as exc:  # noqa: BLE001
                print(f"{name} rep{rep} FAILED: {exc}", flush=True)
                times.append(-1.0)
            spark.sparkContext.setJobDescription(None)
            release_query_memory(spark, quiet=True)
        good = [t for t in times if t >= 0]
        print(
            f"{name:42s} reps={times} "
            f"min={min(good) if good else ('-' if not times else 'FAIL')}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
