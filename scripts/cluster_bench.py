"""Execute the shuffle-policy layer on a REAL multi-JVM cluster topology.

Until round 5 the ShufflePolicy presets (plans/shuffle_policy.py) were
config-only evidence: local[N] runs every task in the driver JVM, so no
shuffle ever crosses a process boundary — remote fetch, serialization to
the wire, and fetch-wait never execute. Spark's `local-cluster[N,c,m]`
master spawns N real executor JVMs (standalone scheduler, BlockManager
transfers over TCP) on one box — the reference's entire contribution IS
this network-shuffle layer (reference OpsTransferer.java:149-203,
OpsFetcherIterator.scala:202-236), so the parity claim needs shuffles that
actually cross JVMs.

What this harness proves, recorded in BENCH_CLUSTER.json:
1. The TPC-H battery + the shuffle-heaviest LLM/window queries run
   correctly on `local-cluster[2,8,4096]` (2 executors x 8 cores x 4 GiB).
2. ShufflePolicy presets SURVIVE into the executing session
   (read back via spark.conf, asserted).
3. Shuffles really crossed JVMs: per-phase `shuffle_remote_bytes_read` > 0
   (v1 StageData remote/local fetch split — impossible on local[N]).
4. External shuffle service: executors fetch map output from an
   out-of-process ExternalShuffleService daemon (launched from Spark's own
   jars) instead of each other — the disaggregated-shuffle deployment shape.
   Push-based pre-merge (spark.shuffle.push.*) additionally needs YARN
   merger coordination, impossible in standalone/local-cluster: recorded
   as env-blocked with its preset asserted, not silently skipped.

Row counts are cross-checked against the same queries on plain local[] —
same session confs, same data — so the network layer is shown to not
change results.

Run:  python scripts/cluster_bench.py [--sf-dir /root/testdata/sf0.1]
Writes BENCH_CLUSTER.json.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EXTRAS = [
    # shuffle-heavy non-battery queries: banded LSH (explode+groupBy+join),
    # prefix-filtered exact Jaccard (window + self-join + verify joins),
    # sessionization (window over a repartitioned event stream).
    "llm_minhash_lsh_dedup",
    "llm_ngram_jaccard_pairs",
    "sessionize_batch",
]


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def run_battery(spark, names, sf_dir, label):
    import ops_spark.queries as q
    from ops_spark.conformance import consume
    from ops_spark.plans.shuffle_policy import shuffle_report
    from ops_spark.session import release_query_memory

    results = {}
    before = shuffle_report(spark)
    t0 = time.perf_counter()
    for name in names:
        qt0 = time.perf_counter()
        try:
            rows = consume(q.get_query(name).builder(spark, sf_dir))
            status = "ok"
        except Exception as exc:  # noqa: BLE001
            rows, status = -1, f"error: {str(exc)[:160]}"
        results[name] = {
            "wall_sec": round(time.perf_counter() - qt0, 2),
            "rows": rows,
            "status": status,
        }
        print(f"{label} {name}: {results[name]}", file=sys.stderr)
        release_query_memory(spark, quiet=True)
    wall = round(time.perf_counter() - t0, 2)
    after = shuffle_report(spark)
    delta = {
        k: after.get(k, 0) - before.get(k, 0)
        for k in after
        if isinstance(after.get(k), (int, float))
    }
    return {"wall_sec": wall, "queries": results, "shuffle_delta": delta}


def run_battery_min2(spark, names, sf_dir, label):
    """Two back-to-back battery runs, keep the faster one — the A/B
    phases feed a policy-vs-stock RATIO, and this box's wall clock
    swings enough run-to-run (observed 0.73-1.15 on identical configs)
    that a single sample per arm is noise. min-of-2 per arm removes
    cold-start/JIT bias and most of the swing; both walls are recorded
    so the JSON shows the spread."""
    runs = [run_battery(spark, names, sf_dir, label) for _ in range(2)]
    best = min(runs, key=lambda r: r["wall_sec"])
    best["all_run_walls"] = [r["wall_sec"] for r in runs]
    return best


def start_ess(port: int = 7337):
    """Launch Spark's ExternalShuffleService from the installed jars.

    Returns (proc|None, detail). The daemon is the standalone deployment of
    the same NettyBlockTransfer service executors embed; registering
    executors with it moves shuffle file serving out of the executor
    process — executor loss no longer loses map output.
    """
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
        proc = subprocess.Popen(
            [
                "java",
                "-cp",
                jars,
                f"-Dspark.shuffle.service.port={port}",
                "org.apache.spark.deploy.ExternalShuffleService",
            ],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        deadline = time.time() + 20
        while time.time() < deadline:
            if proc.poll() is not None:
                return None, f"ESS exited rc={proc.returncode}"
            try:
                with socket.create_connection(("127.0.0.1", port), timeout=1):
                    return proc, f"listening on {port}"
            except OSError:
                time.sleep(0.5)
        proc.terminate()
        return None, "ESS never bound its port"
    except Exception as exc:  # noqa: BLE001
        return None, f"launch failed: {exc}"


def run_executor_kill(spark, sf_dir: str) -> dict:
    """The disaggregated-shuffle payoff, EXECUTED: SIGKILL one executor
    JVM mid-query and let the standalone master replace it. With the
    external shuffle service holding the map outputs, the dead
    executor's shuffle files stay fetchable, so recovery re-runs only
    the killed executor's in-flight tasks — and the query must complete
    with EXACTLY the rows the same session computed before the kill.

    Runs llm_minhash_lsh_dedup against ``sf_dir`` (the 100x derived
    dataset when available — the sf0.1 run is too short to kill
    mid-flight)."""
    import threading

    import ops_spark.queries as q
    from ops_spark.conformance import consume
    from ops_spark.plans.shuffle_policy import shuffle_report
    from ops_spark.session import release_query_memory

    name = "llm_minhash_lsh_dedup"
    expected = consume(q.get_query(name).builder(spark, sf_dir))
    release_query_memory(spark, quiet=True)

    before = shuffle_report(spark)
    out: dict = {}

    def run() -> None:
        try:
            out["rows"] = consume(q.get_query(name).builder(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            out["error"] = str(exc)[:300]

    t = threading.Thread(target=run)
    t0 = time.perf_counter()
    t.start()
    time.sleep(5.0)  # mid-flight: the first map stages have produced output
    pids = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True,
        text=True,
    ).stdout.split()
    killed = None
    if pids and t.is_alive():
        killed = int(pids[0])
        os.kill(killed, 9)
    t.join(timeout=600)
    after = shuffle_report(spark)
    return {
        "query": name,
        "sf_dir": sf_dir,
        "killed_pid": killed,
        "rows": out.get("rows"),
        "expected_rows": expected,
        "recovered": killed is not None and out.get("rows") == expected,
        "error": out.get("error"),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "fetch_delta": {
            k: after.get(k, 0) - before.get(k, 0)
            for k in (
                "shuffle_remote_bytes_read",
                "shuffle_local_bytes_read",
                "shuffle_remote_blocks_fetched",
            )
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--executors", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--mem-mb", type=int, default=4096)
    ap.add_argument("--json-out", default=os.path.join(REPO, "BENCH_CLUSTER.json"))
    ap.add_argument(
        "--kill-sf-dir",
        default=os.environ.get("OPS_SCALE_DIR", "/tmp/ops_scale/sf10"),
        help="dataset for the executor-kill phase (needs a query long "
        "enough to kill mid-flight; falls back to --sf-dir if absent)",
    )
    args = ap.parse_args()

    import ops_spark.queries as q
    from ops_spark.plans.shuffle_policy import ShufflePolicy
    from ops_spark.session import get_session

    q.load_all()
    battery = sorted(n for n in q.all_queries() if n.startswith("Q"))
    names = battery + EXTRAS
    total_cores = args.executors * args.cores

    policy = ShufflePolicy.for_volume(
        dir_bytes(args.sf_dir), total_cores, skew_threshold_bytes=64 << 20
    )

    report: dict = {
        "master": f"local-cluster[{args.executors},{args.cores},{args.mem_mb}]",
        "sf_dir": args.sf_dir,
        "policy": policy.confs(),
        "push_based_shuffle": {
            "status": "env-blocked",
            "detail": "spark.shuffle.push.* requires YARN merger coordination "
            "(SPARK-30602); standalone/local-cluster has no merger registry. "
            "Preset asserted below via ShufflePolicy(push_based=True).confs().",
            "preset_keys": sorted(
                ShufflePolicy(push_based=True).confs().keys()
            ),
        },
        "phases": {},
    }

    # ---- phase 1: reference row counts on plain local[] ----------------
    spark = get_session(app_name="cluster_bench_local", cores=total_cores)
    policy.apply(spark)
    report["phases"]["local"] = run_battery(spark, names, args.sf_dir, "local")
    spark.stop()
    time.sleep(2)

    # ---- phase 2: local-cluster, multi-JVM network shuffle -------------
    master = f"local-cluster[{args.executors},{args.cores},{args.mem_mb}]"
    spark = get_session(
        app_name="cluster_bench_lc",
        master=master,
        cores=total_cores,
        extra_confs={
            "spark.executor.memory": f"{args.mem_mb}m",
            # modest driver: the data lives in executors now
            "spark.driver.memory": "8g",
        },
    )
    policy.apply(spark)
    surviving = {
        k: spark.conf.get(k, None) for k in policy.confs()
    }
    report["policy_survives"] = all(
        surviving.get(k) == v for k, v in policy.confs().items()
    )
    report["policy_readback"] = surviving
    # run a small job first: executors register lazily, so counting at
    # session start reports 0
    spark.range(10_000).repartition(16).count()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    report["n_executors"] = n_exec
    report["phases"]["local_cluster"] = run_battery_min2(
        spark, names, args.sf_dir, "local-cluster"
    )
    spark.stop()
    time.sleep(2)

    # ---- phase 2b: same topology, STOCK shuffle defaults ----------------
    # SURVEY §7's parity-claim obligation: show the policy layer earns its
    # keep by measuring the same shuffle-heavy battery WITHOUT it — Spark
    # stock defaults (200 shuffle partitions, 10 MB broadcast threshold,
    # 256 MB skew threshold; AQE itself stays on, it is a Spark default).
    spark = get_session(
        app_name="cluster_bench_stock",
        master=master,
        cores=total_cores,
        extra_confs={
            "spark.executor.memory": f"{args.mem_mb}m",
            "spark.driver.memory": "8g",
        },
    )
    stock = {
        "spark.sql.shuffle.partitions": "200",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "10485760",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "268435456",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "67108864",
        "spark.sql.files.maxPartitionBytes": "134217728",
    }
    for k, v in stock.items():
        spark.conf.set(k, v)
    report["phases"]["local_cluster_stock"] = run_battery_min2(
        spark, names, args.sf_dir, "stock"
    )
    spark.stop()
    time.sleep(2)

    # ---- phase 3: local-cluster + external shuffle service -------------
    ess_proc, ess_detail = start_ess()
    report["ess"] = {"detail": ess_detail}
    if ess_proc is not None:
        try:
            spark = get_session(
                app_name="cluster_bench_ess",
                master=master,
                cores=total_cores,
                extra_confs={
                    "spark.executor.memory": f"{args.mem_mb}m",
                    "spark.driver.memory": "8g",
                    "spark.shuffle.service.enabled": "true",
                },
            )
            policy.apply(spark)
            report["phases"]["local_cluster_ess"] = run_battery(
                spark, battery[:6] + EXTRAS, args.sf_dir, "ess"
            )
            report["ess"]["status"] = "ok"
            # ---- phase 3b: SIGKILL an executor mid-query ---------------
            kill_dir = (
                args.kill_sf_dir
                if os.path.isdir(args.kill_sf_dir)
                else args.sf_dir
            )
            report["executor_kill"] = run_executor_kill(spark, kill_dir)
            spark.stop()
        except Exception as exc:  # noqa: BLE001
            report["ess"]["status"] = f"error: {str(exc)[:200]}"
        finally:
            ess_proc.terminate()
    else:
        report["ess"]["status"] = "env-blocked"

    # ---- verdicts ------------------------------------------------------
    lc = report["phases"]["local_cluster"]
    loc = report["phases"]["local"]
    report["remote_shuffle_executed"] = (
        lc["shuffle_delta"].get("shuffle_remote_bytes_read", 0) > 0
    )
    stock_phase = report["phases"].get("local_cluster_stock")
    if stock_phase:
        report["policy_vs_stock_speedup"] = round(
            stock_phase["wall_sec"] / lc["wall_sec"], 3
        )
    mismatches = [
        n
        for n in names
        if loc["queries"][n]["rows"] != lc["queries"][n]["rows"]
        or lc["queries"][n]["status"] != "ok"
    ]
    report["rows_match_local"] = not mismatches
    report["row_mismatches"] = mismatches

    line = json.dumps(report, indent=1, sort_keys=True)
    with open(args.json_out, "w") as fh:
        fh.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
