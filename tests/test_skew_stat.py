"""Salting operators + df.stat surface + sampling + misc sinks/sources."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ops_spark.io import load_table


def test_salted_agg_matches_plain(spark, sf_dir):
    from ops_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        (r.l_returnflag,): (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.count_l_quantity, round(r.sum_l_quantity, 2))
        for r in salted_agg(
            li, ["l_returnflag"], {"l_quantity": "count"}, salt_buckets=8
        )
        .join(
            salted_agg(li, ["l_returnflag"], {"l_quantity": "sum"}, salt_buckets=8),
            "l_returnflag",
        )
        .collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_mergeable(spark, sf_dir):
    from ops_spark.operators.skew import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="salted_agg supports"):
        salted_agg(li, ["l_returnflag"], {"l_quantity": "avg"})


def test_salted_join_matches_plain(spark, sf_dir):
    from ops_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, "l_orderkey").count()
    assert salted_join(li, orders, "l_orderkey", salt_buckets=4).count() == plain


def test_stat_helpers(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # approxQuantile (reference DataFrameStatFunctions.scala:71)
    q = li.stat.approxQuantile("l_extendedprice", [0.25, 0.5, 0.75], 0.01)
    assert q[0] <= q[1] <= q[2]
    # cov/corr scalars
    assert li.stat.corr("l_quantity", "l_extendedprice") == pytest.approx(
        li.select(F.corr("l_quantity", "l_extendedprice")).head()[0], abs=1e-9
    )
    # freqItems
    fi = li.stat.freqItems(["l_returnflag"], 0.2).head()[0]
    assert set(fi) >= {"A", "N", "R"} or len(fi) >= 1
    # sampleBy: stratified sample sizes bounded above by fraction*2
    frac = {"A": 0.1, "N": 0.1, "R": 0.1}
    n = li.stat.sampleBy("l_returnflag", frac, seed=42).count()
    assert 0 < n < li.count() * 0.25


def test_sketches(spark, sf_dir):
    # count-min sketch (reference common/sketch CountMinSketch.java:54,
    # CountMinSketchAgg.scala): the SQL aggregate returns the serialized
    # sketch. (The Scala-only df.stat.bloomFilter/countMinSketch wrappers
    # were dropped from the Python API in Spark 4 — the SQL aggregate is
    # the surviving public surface.)
    orders = load_table(spark, sf_dir, "orders")
    sk = orders.agg(
        F.count_min_sketch(
            "o_orderstatus", F.lit(0.01), F.lit(0.95), F.lit(42)
        ).alias("sk")
    ).head()["sk"]
    assert isinstance(sk, (bytes, bytearray)) and len(sk) > 0


def test_sample_and_split(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    s = li.sample(0.1, seed=42).count()
    assert 0.05 * n < s < 0.15 * n
    a, b = li.randomSplit([0.8, 0.2], seed=42)
    assert a.count() + b.count() == n


def test_monotonic_id_and_hash(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    withid = cust.withColumn("mid", F.monotonically_increasing_id())
    assert withid.select("mid").distinct().count() == cust.count()
    h = cust.select(F.hash("c_name").alias("h"), F.xxhash64("c_name").alias("x"))
    assert h.filter(F.col("h").isNull() | F.col("x").isNull()).count() == 0


def test_rate_source_smoke(spark):
    # rate source (reference RateStreamProvider.scala:44): emits
    # (timestamp, value) rows; run one micro-batch and stop.
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "100")
        .load()
        .writeStream.format("memory")
        .queryName("rate_smoke")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table("rate_smoke").columns == ["timestamp", "value"]


def test_foreach_batch_sink(spark, sf_dir):
    # foreachBatch (reference streaming.py:1022 kin): arbitrary batch sink
    # with epoch id — the exactly-once escape hatch.
    from ops_spark.streaming import events_stream

    seen: list[tuple[int, int]] = []
    ev = events_stream(spark, sf_dir).select("event_id")
    q = (
        ev.writeStream.foreachBatch(
            lambda df, epoch: seen.append((epoch, df.count()))
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen and sum(n for _, n in seen) == load_table(
        spark, sf_dir, "events"
    ).count()


def test_jdbc_derby_partitioned_pushdown(spark, sf_dir):
    # JDBC source (reference JDBCRelation.scala:230) against the embedded
    # Derby engine bundled with Spark: stride-partitioned read + filter
    # pushdown compiled into the JDBC WHERE clause.
    from ops_spark.io import load_table
    from ops_spark.io.jdbc import derby_url, read_jdbc_partitioned, write_jdbc

    nation = load_table(spark, sf_dir, "nation")
    url = derby_url("test_roundtrip")
    write_jdbc(nation, url, "nation_t")
    back = read_jdbc_partitioned(spark, url, "nation_t", "n_nationkey", 0, 25, 4)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == nation.count()
    plan = (
        back.filter("n_regionkey = 1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "EqualTo(n_regionkey,1)" in plan


def test_continuous_trigger_epochs_advance(spark, tmp_path):
    """Continuous-processing trigger (SURVEY §2.9; reference
    continuous/ContinuousExecution.scala): long-running epoch-based tasks
    instead of micro-batches. Beyond rows arriving, assert the epoch
    machinery itself: lastProgress.batchId is the committed epoch and must
    ADVANCE, and each commit is durably logged under <checkpoint>/commits
    (the epoch commit log the exactly-once story hangs off). Partitions
    bounded to 2 so the long-running tasks can't starve local[*] slots."""
    import os
    import time

    ckpt = str(tmp_path / "cont_ckpt")
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 100)
        .option("numPartitions", 2)
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("continuous_smoke")
        .option("checkpointLocation", ckpt)
        .trigger(continuous="1 second")
        .start()
    )
    def committed_epochs() -> list[int]:
        # StreamingQuery.lastProgress is not populated by the continuous
        # engine in this build, so read the durable signal directly: the
        # epoch commit log ContinuousExecution writes per committed epoch.
        d = os.path.join(ckpt, "commits")
        if not os.path.isdir(d):
            return []
        return sorted(int(f) for f in os.listdir(d) if f.isdigit())

    n = 0
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            epochs = committed_epochs()
            n = spark.sql("SELECT count(*) AS c FROM continuous_smoke").head().c
            if len(epochs) >= 3 and n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    epochs = committed_epochs()
    assert n > 0
    assert len(epochs) >= 3 and epochs[-1] >= epochs[0] + 2, (
        f"epoch commits did not advance: {epochs}"
    )
    assert not q.isActive


def test_foreach_row_sink(spark, tmp_path):
    """Row-level foreach sink (SURVEY §2.1 streaming sinks): the writer
    function is pickled to Python workers and called once per row — the
    escape hatch for sinks with no DataSource implementation."""
    import glob
    import os
    import time

    out_dir = str(tmp_path / "foreach_rows")
    os.makedirs(out_dir, exist_ok=True)

    def write_row(row):
        # one file per row: append races across partitions are not the
        # point of this test
        with open(f"{out_dir}/{row.value}.txt", "w") as f:
            f.write(str(row.timestamp))

    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 20)
        .option("numPartitions", 2)
        .load()
    )
    q = df.writeStream.foreach(write_row).trigger(processingTime="500 milliseconds").start()
    try:
        deadline = time.time() + 30
        while time.time() < deadline and not glob.glob(f"{out_dir}/*.txt"):
            time.sleep(0.5)
    finally:
        q.stop()
    files = glob.glob(f"{out_dir}/*.txt")
    assert files, "foreach writer produced no rows"
    assert open(files[0]).read()  # timestamps written per row


def test_window_spill_threshold_correctness(spark, sf_dir):
    """Spill-awareness (SURVEY §7 risk list): force WindowExec to spill by
    dropping its in-memory buffer threshold to 64 rows and assert results
    are identical to the in-memory run — the guarantee that lets the same
    plan survive executor-memory pressure at 100 TB."""
    from ops_spark.io import load_table
    from pyspark.sql.window import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_orderkey", "l_linenumber")

    def run():
        return (
            li.withColumn("rn", F.row_number().over(w))
            .withColumn("cum", F.sum("l_quantity").over(w))
            .groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("cum"), 4).alias("cum_sum"),
                F.max("rn").alias("max_rn"),
            )
            .collect()
        )

    baseline = {r.l_returnflag: (r.n, r.cum_sum, r.max_rn) for r in run()}
    prev = spark.conf.get("spark.sql.windowExec.buffer.spill.threshold")
    spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", "64")
    try:
        spilled = {r.l_returnflag: (r.n, r.cum_sum, r.max_rn) for r in run()}
    finally:
        spark.conf.set("spark.sql.windowExec.buffer.spill.threshold", prev)
    assert spilled == baseline


def test_observe_metrics(spark, sf_dir):
    """df.observe: named accumulator-style metrics evaluated inline with
    the query (the modern analogue of the reference's [OPS]- TaskMetrics
    log lines) — zero extra passes over the data."""
    from pyspark.sql import Observation
    from ops_spark.io import load_table

    obs = Observation("li_metrics")
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum("l_quantity").alias("qty_sum"),
        )
        .filter(F.col("l_returnflag") == "R")
        .count()
    )
    got = obs.get
    assert got["rows_seen"] == li.count()  # observed BEFORE the filter
    assert got["qty_sum"] > 0
    assert out > 0


def test_catalog_api(spark, sf_dir):
    """Catalog surface: temp views, global temp views, listings, drops
    (reference sql/catalog.py kin)."""
    from ops_spark.io import load_table

    load_table(spark, sf_dir, "nation").createOrReplaceTempView("cat_nation")
    load_table(spark, sf_dir, "region").createOrReplaceGlobalTempView("cat_region")
    names = {t.name for t in spark.catalog.listTables()}
    assert "cat_nation" in names
    assert spark.catalog.tableExists("cat_nation")
    g = {t.name for t in spark.catalog.listTables("global_temp")}
    assert "cat_region" in g
    assert spark.sql("SELECT count(*) c FROM global_temp.cat_region").head().c == 5
    cols = {c.name for c in spark.catalog.listColumns("cat_nation")}
    assert {"n_nationkey", "n_name"} <= cols
    spark.catalog.dropTempView("cat_nation")
    spark.catalog.dropGlobalTempView("cat_region")
    assert not spark.catalog.tableExists("cat_nation")


def test_accumulators_and_broadcast_vars(spark):
    """Core RDD-tier shared variables (reference core/ Accumulator,
    Broadcast): accumulators aggregate side-channel counts driver-side;
    broadcast vars ship read-only lookup state once per executor."""
    sc = spark.sparkContext
    acc = sc.accumulator(0)
    lookup = sc.broadcast({0: "even", 1: "odd"})

    def tag(x):
        acc.add(1)
        return (lookup.value[x % 2], x)

    pairs = sc.parallelize(range(100), 8).map(tag).reduceByKey(lambda a, b: a + b)
    got = dict(pairs.collect())
    assert got == {"even": sum(range(0, 100, 2)), "odd": sum(range(1, 100, 2))}
    assert acc.value == 100
    lookup.unpersist()


def test_map_in_arrow(spark, sf_dir):
    """mapInArrow: the zero-copy Arrow RecordBatch tier below mapInPandas —
    batch-level access without pandas conversion overhead."""
    import pyarrow as pa
    from ops_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")

    def scale(batches):
        for batch in batches:
            qty = batch.column("l_quantity")
            doubled = pa.compute.multiply(qty, pa.scalar(2.0))
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), doubled], ["l_orderkey", "qty2"]
            )

    out = li.mapInArrow(scale, "l_orderkey long, qty2 double")
    row = out.agg(F.sum("qty2").alias("s")).head()
    expect = li.agg((F.sum("l_quantity") * 2).alias("s")).head()
    assert abs(row.s - expect.s) < 1e-6


def test_socket_source_stream(spark):
    # Socket streaming source (reference streaming/sources/socket.scala:230)
    # — built into Spark, no external jar: feed lines over a real TCP
    # socket, read with format("socket"), drain into a memory sink.
    import socket
    import threading
    import time

    lines = [f"evt-{i}" for i in range(20)]
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]

    def serve():
        conn, _ = server.accept()
        with conn:
            conn.sendall(("\n".join(lines) + "\n").encode())
            time.sleep(3)  # keep the pipe open while micro-batches drain

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    stream = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    query = (
        stream.writeStream.format("memory")
        .queryName("socket_sink")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("socket_sink").count() >= len(lines):
                break
            time.sleep(0.5)
        got = {r.value for r in spark.table("socket_sink").collect()}
        assert set(lines) <= got
    finally:
        query.stop()
        server.close()


def test_arrow_optimized_row_udf(spark, sf_dir):
    """Arrow-optimized Python UDF (Spark 3.5+/4 useArrow=True): row-UDF
    ergonomics with Arrow-batched transfer instead of pickled rows — the
    modern midpoint between the reference's BatchEvalPythonExec (pickled)
    and ArrowEvalPythonExec (pandas) tiers."""
    from pyspark.sql import functions as F

    @F.udf("string", useArrow=True)
    def flag_status(flag, status):
        return f"{flag}/{status}"

    li = load_table(spark, sf_dir, "lineitem").limit(500)
    got = li.select(
        flag_status("l_returnflag", "l_linestatus").alias("fs")
    ).distinct()
    expected = li.select(
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("fs")
    ).distinct()
    assert {r.fs for r in got.collect()} == {r.fs for r in expected.collect()}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan, "useArrow=True must plan the Arrow eval tier"


def test_aqe_skew_join_splits(spark):
    """The policy layer's skew claim, proven: a join with one hot key must
    come out of AQE with its skewed partition SPLIT (skew=true in the
    final SortMergeJoin) — the runtime replacement for the reference's
    per-node pre-merge sidestepping skew (SURVEY §4.3)."""
    from pyspark.sql import functions as F

    tuned = {
        # force SMJ (no broadcast), make the skew detector fire on KB-scale
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    for k, v in tuned.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 250_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 5_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        n = joined.count()
        assert n == 250_000  # only hot key 0 matches (cold keys are >=250k)
        df = left.join(right, "k")
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, f"AQE must split the hot partition:\n{plan[:800]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_filter_no_false_negatives_and_fpr(spark):
    """df.stat.bloomFilter parity (BloomFilter.java:42; PySpark-absent):
    inserted keys always test positive; non-members false-positive at
    ~fpp. Deterministic: rebuilding yields an identical bitmap."""
    from pyspark.sql import functions as F

    from ops_spark.operators.bloom import bloom_build

    members = spark.range(0, 2000).select(F.col("id").alias("v"))
    bf = bloom_build(members, "v", expected_items=2000, fpp=0.05)
    assert bf.m % 64 == 0 and bf.k >= 1

    got = members.select(bf.might_contain(F.col("v")).alias("hit")).collect()
    assert all(r.hit for r in got), "bloom filter must have NO false negatives"

    non = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("v"))
    fp = non.select(bf.might_contain(F.col("v")).alias("hit")).filter("hit").count()
    fpr = fp / 10_000
    assert fpr < 0.05 * 3, f"false-positive rate {fpr} far above target 0.05"

    bf2 = bloom_build(members, "v", expected_items=2000, fpp=0.05)
    assert (bf.words == bf2.words).all(), "build must be deterministic"

    # Null input keeps SQL three-valued logic.
    nulls = spark.sql("SELECT CAST(NULL AS BIGINT) AS v")
    assert nulls.select(bf.might_contain(F.col("v")).alias("h")).head().h is None


def test_bloom_filter_broadcast_path_matches_literal(spark):
    """The large-filter (broadcast numpy) membership path must agree with
    the all-JVM literal path bit-for-bit on the same sketch."""
    from pyspark.sql import functions as F

    from ops_spark.operators.bloom import bloom_build

    members = spark.range(0, 500).select(F.col("id").alias("v"))
    bf = bloom_build(members, "v", expected_items=500, fpp=0.02)
    probe = spark.range(0, 3000).select(F.col("id").alias("v"))
    lit = probe.select("v", bf._might_contain_literal(F.col("v")).alias("h"))
    brd = probe.select("v", bf._might_contain_broadcast(F.col("v")).alias("h"))
    a = {r.v: r.h for r in lit.collect()}
    b = {r.v: r.h for r in brd.collect()}
    assert a == b


def test_from_xml_and_xpath(spark):
    """XML surface (Spark 4 from_xml + the older xpath_* family). No DuckDB
    XML support, so this is test-pinned rather than oracle-checked."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "<item><name>bolt</name><qty>7</qty></item>"),
         (2, "<item><name>nut</name><qty>11</qty></item>")],
        "id int, xml string",
    )
    parsed = df.select(
        "id",
        F.from_xml("xml", "name STRING, qty INT").alias("v"),
        F.xpath_string("xml", F.lit("/item/name")).alias("xname"),
        F.xpath_int("xml", F.lit("/item/qty")).alias("xqty"),
    ).select("id", "v.name", "v.qty", "xname", "xqty")
    rows = {r.id: r for r in parsed.collect()}
    assert rows[1].name == "bolt" and rows[1].qty == 7
    assert rows[2].xname == "nut" and rows[2].xqty == 11
    # schema_of_xml infers the struct shape
    inferred = spark.range(1).select(
        F.schema_of_xml(F.lit("<item><qty>7</qty></item>")).alias("s")
    ).head().s
    assert "qty" in inferred


def test_parameterized_sql(spark):
    """spark.sql(..., args=...) named and positional parameter binding
    (Spark 3.4+ parameterized queries — injection-safe literals)."""
    named = spark.sql(
        "SELECT id FROM range(10) WHERE id BETWEEN :lo AND :hi ORDER BY id",
        args={"lo": 3, "hi": 5},
    ).collect()
    assert [r.id for r in named] == [3, 4, 5]
    pos = spark.sql(
        "SELECT id FROM range(10) WHERE id > ? AND id < ? ORDER BY id",
        args=[6, 9],
    ).collect()
    assert [r.id for r in pos] == [7, 8]


def test_rate_micro_batch_source(spark):
    """rate-micro-batch source (Spark 3.3+): deterministic per-batch row
    allocation — unlike plain rate, every micro-batch carries exactly
    rowsPerBatch rows, which makes throughput tests reproducible."""
    q = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 20)
        .option("numPartitions", 2)
        .load()
        .writeStream.format("memory")
        .queryName("rate_mb_sink")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.table("rate_mb_sink").count()
            if n >= 40:
                break
            time.sleep(0.5)
        assert spark.table("rate_mb_sink").count() % 20 == 0  # whole batches
    finally:
        q.stop()


def test_streaming_query_listener(spark, tmp_path):
    """StreamingQueryListener (observability surface): progress events
    carry per-batch row counts for the running query."""
    from pyspark.sql.streaming import StreamingQueryListener

    events = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            events.append(("start", e.id))

        def onQueryProgress(self, e):  # noqa: N802
            events.append(("progress", e.progress.numInputRows))

        def onQueryIdle(self, e):  # noqa: N802
            pass

        def onQueryTerminated(self, e):  # noqa: N802
            events.append(("end", e.id))

    listener = L()
    spark.streams.addListener(listener)
    try:
        src = str(tmp_path / "lsrc")
        spark.range(30).selectExpr("id AS v").write.parquet(src)
        q = (
            spark.readStream.schema("v long")
            .parquet(src)
            .writeStream.format("memory")
            .queryName("listener_sink")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        import time

        deadline = time.time() + 30  # listener bus is async
        while time.time() < deadline:
            if any(k == "end" for k, _ in events):
                break
            time.sleep(0.5)
        kinds = {k for k, _ in events}
        assert {"start", "progress", "end"} <= kinds
        assert sum(n for k, n in events if k == "progress") == 30
    finally:
        spark.streams.removeListener(listener)


def test_aes_encrypt_roundtrip(spark):
    """aes_encrypt/aes_decrypt (Spark 3.3+): GCM (random IV) decrypts its
    own output; ECB is deterministic — same plaintext, same ciphertext."""
    df = spark.sql(
        """
        SELECT
          CAST(aes_decrypt(aes_encrypt('secret', '0000111122223333'),
                           '0000111122223333') AS STRING) AS gcm_roundtrip,
          base64(aes_encrypt('secret', '0000111122223333', 'ECB')) AS ecb_1,
          base64(aes_encrypt('secret', '0000111122223333', 'ECB')) AS ecb_2
        """
    ).head()
    assert df.gcm_roundtrip == "secret"
    assert df.ecb_1 == df.ecb_2


def test_partition_metadata_functions(spark, tmp_path):
    """spark_partition_id + input_file_name: the per-task provenance
    functions an audit/debug pipeline leans on."""
    p = str(tmp_path / "files")
    spark.range(100).repartition(4).write.parquet(p)
    df = spark.read.parquet(p).select(
        F.spark_partition_id().alias("pid"),
        F.input_file_name().alias("src"),
    )
    rows = df.collect()
    assert {r.pid for r in rows} <= set(range(8))
    assert all(r.src.endswith(".parquet") and "files" in r.src for r in rows)
    assert len({r.src for r in rows}) == 4  # one file per writing task


def test_misc_scalar_functions_golden(spark):
    """crc32 / uuid / assert_true / raise_error (SURVEY §2.8 misc row):
    crc32 against its published value for 'spark'; uuid format +
    per-row uniqueness; assert_true raises on violation."""
    import re

    import pytest

    r = spark.sql(
        "SELECT crc32('spark') AS c, uuid() AS u1, uuid() AS u2, "
        "assert_true(1 < 2) AS ok"
    ).head()
    import zlib

    assert r.c == zlib.crc32(b"spark")  # 2635321133
    assert re.fullmatch(r"[0-9a-f-]{36}", r.u1) and r.u1 != r.u2
    assert r.ok is None  # assert_true returns NULL on success
    with pytest.raises(Exception, match="not true|ASSERT"):
        spark.sql("SELECT assert_true(1 > 2)").collect()
    with pytest.raises(Exception, match="boom"):
        spark.sql("SELECT raise_error('boom')").collect()


def test_console_sink_smoke(spark, tmp_path):
    """Console streaming sink (SURVEY §2.1 sink list): plans and runs a
    bounded stream to completion (output goes to driver stdout)."""
    src = str(tmp_path / "csrc")
    spark.range(5).write.parquet(src)
    q = (
        spark.readStream.schema("id long")
        .parquet(src)
        .writeStream.format("console")
        .option("numRows", 3)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert q.lastProgress is not None


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark (Spark 3.5): dedup state is GC'd by
    the watermark, so duplicates arriving within the window collapse but
    state does not grow unboundedly (the production streaming dedup —
    plain dropDuplicates keeps keys forever)."""
    from datetime import datetime

    src = str(tmp_path / "ddw_src")
    rows = [
        (1, datetime(2024, 1, 1, 10, 0, 0)),
        (1, datetime(2024, 1, 1, 10, 0, 30)),  # dup within 10-min watermark
        (2, datetime(2024, 1, 1, 10, 1, 0)),
    ]
    spark.createDataFrame(rows, "k long, ts timestamp").write.parquet(src)
    q = (
        spark.readStream.schema("k long, ts timestamp")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["k"])
        .writeStream.format("memory")
        .queryName("ddw_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.k for r in spark.table("ddw_sink").collect())
    assert got == [1, 2]


def test_streaming_union_of_sources(spark, tmp_path):
    """Union of two independent streaming sources into one query — each
    side keeps its own offset tracking in the shared checkpoint."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    spark.range(0, 5).selectExpr("id AS v").write.parquet(a)
    spark.range(100, 103).selectExpr("id AS v").write.parquet(b)
    sa = spark.readStream.schema("v long").parquet(a)
    sb = spark.readStream.schema("v long").parquet(b)
    q = (
        sa.unionByName(sb)
        .writeStream.format("memory")
        .queryName("union_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.v for r in spark.table("union_sink").collect())
    assert got == [0, 1, 2, 3, 4, 100, 101, 102]
