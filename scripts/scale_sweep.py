"""Run EVERY registered query against the 100x derived dataset.

The flagship probes in scale_stress.py answer "do the headline plans
hold"; this sweep answers the broader claim: the WHOLE registered
surface (TPC-H battery, joins, windows, aggregates, text/dedup/
similarity, analytics, streaming-with-static-fixtures) still executes
at ~100x the test fixtures without OOM, plan blowup, or hangs.

Each query gets a wall budget (default 180 s); a watchdog thread calls
``sparkContext.cancelAllJobs()`` on breach so one quadratic-at-scale
query cannot wedge the sweep — breaches are REPORTED, not hidden, since
"needs the approximate tier at this scale" (e.g. exact n-gram Jaccard
on 25-deep near-dup clusters) is itself a documented result.

Run:  python scripts/scale_sweep.py [--out /tmp/ops_scale/sf10]
      [--budget 180] [--only prefix1,prefix2]
Writes SCALE_SWEEP.json (per-query wall/rows/status).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.environ.get("OPS_SCALE_DIR", "/tmp/ops_scale/sf10"))
    ap.add_argument("--budget", type=float, default=180.0)
    ap.add_argument("--only", default="", help="comma-separated name prefixes")
    ap.add_argument("--json-out", default=os.path.join(REPO, "SCALE_SWEEP.json"), help="where to write the report (point smoke runs at /tmp so they cannot clobber committed evidence)")
    args = ap.parse_args()

    import ops_spark.queries as q
    from ops_spark.session import get_session

    q.load_all()
    spark = get_session(app_name="scale_sweep")
    sc = spark.sparkContext

    names = sorted(q.all_queries())
    if args.only:
        prefixes = tuple(p for p in args.only.split(",") if p)
        names = [n for n in names if n.startswith(prefixes)]

    from ops_spark.session import release_query_memory

    results: dict[str, dict] = {}
    for name in names:
        timed_out = threading.Event()
        group = f"sweep:{name}"
        # Per-query JOB GROUP so a timer firing just as a query finishes
        # can only cancel ITS OWN query's jobs — cancelAllJobs() from a
        # late-bound closure could cancel the NEXT query and misreport a
        # healthy query as a timeout (Timer.cancel cannot stop an
        # already-running callback).
        sc.setJobGroup(group, f"scale sweep {name}", interruptOnCancel=True)

        def cancel(ev=timed_out, grp=group) -> None:
            ev.set()
            try:
                sc.cancelJobGroup(grp)
            except Exception:  # noqa: BLE001
                pass

        watchdog = threading.Timer(args.budget, cancel)
        watchdog.daemon = True
        t0 = time.perf_counter()
        try:
            watchdog.start()
            n = q.get_query(name).builder(spark, args.out).count()
            status = "ok"
        except Exception as exc:  # noqa: BLE001
            n = -1
            status = "timeout" if timed_out.is_set() else f"error: {str(exc)[:160]}"
        finally:
            watchdog.cancel()
            sc.setLocalProperty("spark.jobGroup.id", None)  # clear group
        wall = round(time.perf_counter() - t0, 2)
        results[name] = {"wall_sec": wall, "rows": n, "status": status}
        print(f"sweep {name}: {results[name]}", file=sys.stderr)
        release_query_memory(spark, quiet=True)  # bench-style hygiene

    ok = sum(1 for r in results.values() if r["status"] == "ok")
    summary = {
        "out_dir": args.out,
        "budget_sec": args.budget,
        "n_queries": len(results),
        "n_ok": ok,
        "n_timeout": sum(1 for r in results.values() if r["status"] == "timeout"),
        "n_error": sum(
            1 for r in results.values() if r["status"].startswith("error")
        ),
        "total_wall_sec": round(sum(r["wall_sec"] for r in results.values()), 1),
        "queries": results,
    }
    line = json.dumps(summary, indent=1, sort_keys=True)
    with open(args.json_out, "w") as fh:
        fh.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
