"""Timed conformance sweep mirroring the driver's t2 loop: alphabetical
order, Spark + DuckDB oracle per query, wall time per query. Diagnostic
for why the round-1 driver run truncated after 50 entries."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ops_spark.queries as q
from ops_spark.conformance import compare
from ops_spark.session import get_session

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    q.load_all()
    spark = get_session(app_name="time_conformance", cores=32)
    names = sorted(q.all_queries())
    out = {}
    t_start = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            res = compare(spark, q.get_query(name), SF_DIR)
            ok, detail = res.ok, res.detail[:120]
        except Exception as exc:  # noqa: BLE001
            ok, detail = False, f"EXC {exc}"[:200]
        dt = round(time.perf_counter() - t0, 2)
        out[name] = {"sec": dt, "ok": ok}
        print(f"{time.perf_counter()-t_start:8.1f}s  {dt:7.2f}s  {name:40s} "
              f"{'OK' if ok else 'FAIL ' + detail}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
