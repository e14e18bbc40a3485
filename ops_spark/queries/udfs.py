"""UDF-tier coverage (SURVEY.md §2.10) + RDD escape hatch + misc sources.

Reference surface: row-Python UDFs (BatchEvalPythonExec.scala:41,
pyspark udf.py:70), Arrow scalar pandas UDFs (ArrowEvalPythonExec.scala:69),
grouped-map applyInPandas (FlatMapGroupsInPandasExec.scala:50, group.py:224),
grouped-agg pandas UDFs (AggregateInPandasExec.scala:43), window pandas UDFs
(WindowInPandasExec.scala:36), RDD escape hatch (MapPartitionsExec kin,
rdd.py), Range source (basicPhysicalOperators.scala:337), in-memory cache
scan (InMemoryTableScanExec.scala:33).

Every UDF here computes something an oracle can replay in SQL, so the
Python boundary itself is what's under test. Scale reminder: these are the
SLOW path — each crosses JVM↔Python per batch; the row-UDF variant exists
for parity, not for use at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from ops_spark.io import load_table
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "udf_python_row",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'A'
                WHEN o_totalprice > 100000 THEN 'B'
                ELSE 'C' END AS bracket
    FROM orders WHERE o_orderkey <= 1000
    """,
    description="Row-at-a-time Python UDF (pickled batches; the legacy slow path).",
    tags=("udf", "python"),
)
def udf_python_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(T.StringType())
    def bracket(price: float) -> str:
        return "A" if price > 300000 else ("B" if price > 100000 else "C")

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select("o_orderkey", bracket("o_totalprice").alias("bracket"))


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem WHERE l_orderkey <= 500
    """,
    description="Arrow-vectorized scalar pandas UDF (the fast Python path).",
    tags=("udf", "pandas", "arrow"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def charge(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - discount) * (1 + tax)

    # round JVM-side: pandas .round is half-even, SQL round is half-up
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # round at 6 > the product's exact decimal width (2+2+2): rounding AT
        # the data's precision puts every value on a half-boundary where
        # Spark (exact-binary BigDecimal) and DuckDB (x*10^k) disagree
        F.round(charge("l_extendedprice", "l_discount", "l_tax"), 6).alias("charged"),
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
             AS wavg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Grouped-aggregate pandas UDF (UDAF surface, Arrow-batched).",
    tags=("udf", "pandas", "udaf"),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The modern UDAF (reference udaf.scala:32 / AggregateInPandasExec:43):
    # whole-group pandas Series in, scalar out. No partial aggregation —
    # the group's rows all shuffle to one task, so keep group cardinality
    # high and group size bounded at scale (or refactor to built-ins, as
    # the oracle shows is possible here).
    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 4).alias("wavg_price")
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 4) AS zscore
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey)
    QUALIFY count(*) OVER w >= 2
    """,
    description="Grouped-map applyInPandas: per-customer z-scores (split-apply-combine).",
    tags=("udf", "pandas", "grouped-map"),
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    def zscores(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pdf.iloc[0:0][["o_custkey", "o_orderkey"]].assign(zscore=0.0)
        z = (pdf["o_totalprice"] - pdf["o_totalprice"].mean()) / pdf[
            "o_totalprice"
        ].std(ddof=1)
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "zscore": z,
            }
        )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    out = orders.groupBy("o_custkey").applyInPandas(
        zscores, "o_custkey bigint, o_orderkey bigint, zscore double"
    )
    # round JVM-side (pandas .round is half-even, SQL round is half-up)
    return out.withColumn("zscore", F.round("zscore", 4))


@register(
    "udf_window_pandas",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(avg(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS pandas_mavg
    FROM orders WHERE o_custkey <= 50
    """,
    description="Pandas UDF evaluated over a bounded window frame.",
    tags=("udf", "pandas", "window"),
)
def udf_window_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def mavg(price: pd.Series) -> float:
        return float(price.mean())

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(mavg("o_totalprice").over(w), 4).alias("pandas_mavg"),
    )


@register(
    "rdd_escape_hatch",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem WHERE l_orderkey <= 2000
    GROUP BY l_returnflag
    """,
    description="RDD escape hatch: per-partition imperative aggregation.",
    tags=("rdd",),
)
def rdd_escape_hatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reference rdd.py:1609 reduceByKey / MapPartitionsExec kin. Exists for
    # parity with the RDD surface — identical result to the one-line
    # DataFrame groupBy (which is what you'd actually run at scale).
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)

    def partial(rows):
        acc: dict[str, tuple[int, float]] = {}
        for r in rows:
            n, s = acc.get(r.l_returnflag, (0, 0.0))
            acc[r.l_returnflag] = (n + 1, s + r.l_quantity)
        yield from ((k, v) for k, v in acc.items())

    # reducer count sized to key cardinality (3 distinct flags), not the
    # session default: every reduce task is a Python worker launch, so 32
    # near-empty reducers cost more than the aggregation itself.
    merged = (
        li.select("l_returnflag", "l_quantity")
        .rdd.mapPartitions(partial)
        .reduceByKey(lambda a, b: (a[0] + b[0], a[1] + b[1]), numPartitions=4)
    )
    rows = merged.map(lambda kv: (kv[0], kv[1][0], round(kv[1][1], 2)))
    return spark.createDataFrame(rows, "l_returnflag string, n bigint, qty double")


@register(
    "range_source",
    oracle="""
    SELECT range % 7 AS bucket, count(*) AS n, CAST(sum(range * range) AS BIGINT) AS sum_sq
    FROM range(0, 100000)
    GROUP BY range % 7
    """,
    description="Range source (monotonic generator) + aggregation.",
    tags=("source", "range"),
)
def range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.range(0, 100000)
        .select((F.col("id") % 7).alias("bucket"), F.col("id"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("id") * F.col("id")).alias("sum_sq"),
        )
    )


@register(
    "cache_scan",
    oracle="""
    SELECT l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS total
    FROM lineitem GROUP BY l_linestatus
    """,
    description="In-memory columnar cache scan (cache + reuse).",
    tags=("source", "cache"),
)
def cache_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # InMemoryTableScanExec kin (reference :33): first action builds the
    # columnar cache, the returned plan scans it. unpersist is the caller's
    # job in a real pipeline; harmless to re-cache here per invocation.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_linestatus", "l_extendedprice"
    ).cache()
    li.count()  # materialize
    return li.groupBy("l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total")
    )


@register(
    "udf_python_udtf",
    oracle="""
    SELECT doc_id, CAST(pos AS INT) AS pos, tok
    FROM (
      SELECT doc_id, unnest(
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
             ) AS tok,
             generate_subscripts(
               list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), 1
             ) - 1 AS pos
      FROM documents WHERE doc_id < 50
    )
    """,
    description="Python UDTF (table function, Spark 3.5+): one input row → "
    "N output rows with its own schema — the UDTF surface SURVEY §2.10 "
    "notes is absent in 2.4 (Hive GenericUDTF was the only route).",
    tags=("udf", "udtf"),
)
def udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            pos = 0
            for tok in text.split():
                if tok:
                    yield pos, tok
                    pos += 1

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    spark.udtf.register("ops_tokenize", Tokenize)
    docs.select("doc_id", "text").createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.tok
        FROM __udtf_docs d, LATERAL ops_tokenize(d.text) t
        """
    )


@register(
    "udf_cogrouped_map",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS custkey, count(*) AS n_orders,
             round(sum(o_totalprice), 2) AS total_spend
      FROM orders GROUP BY 1
    ), c AS (
      SELECT c_custkey AS custkey, c_acctbal FROM customer WHERE c_custkey <= 300
    )
    SELECT c.custkey,
           round(c.c_acctbal, 2) AS acctbal,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           round(coalesce(o.total_spend, 0.0), 2) AS total_spend
    FROM c LEFT JOIN o USING (custkey)
    """,
    description="Cogrouped applyInPandas (reference CoGroupExec, "
    "objects.scala:445): both sides shuffled on the key, one pandas frame "
    "per side per key — the two-input split-apply-combine shape.",
    tags=("udf", "pandas", "cogroup"),
)
def udf_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 300)
        .select(F.col("c_custkey").alias("custkey"), "c_acctbal")
    )
    # Push the key predicate to BOTH cogroup inputs: orders outside the
    # filtered customer set can only ever produce empty output frames, so
    # shuffling them into Python is pure waste (at 100 TB this is the
    # difference between shuffling 0.2% of orders and all of them).
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 300)
        .select(F.col("o_custkey").alias("custkey"), "o_totalprice")
    )

    def merge(c: pd.DataFrame, o: pd.DataFrame) -> pd.DataFrame:
        if c.empty:
            # orders for customers outside the filtered side: no output row
            return pd.DataFrame(
                columns=["custkey", "acctbal", "n_orders", "total_spend"]
            )
        return pd.DataFrame(
            {
                "custkey": [int(c["custkey"].iloc[0])],
                "acctbal": [round(float(c["c_acctbal"].iloc[0]), 2)],
                "n_orders": [len(o)],
                "total_spend": [round(float(o["o_totalprice"].sum()), 2)],
            }
        )

    return (
        cust.groupBy("custkey")
        .cogroup(orders.groupBy("custkey"))
        .applyInPandas(
            merge, "custkey bigint, acctbal double, n_orders bigint, total_spend double"
        )
    )


@register(
    "source_python_datasource",
    oracle="""
    WITH gen AS (
      SELECT range AS event_id,
             CASE range % 3 WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                  ELSE 'purchase' END AS etype,
             range * 7919 % 10000 AS cents
      FROM range(0, 5000)
    )
    SELECT etype,
           count(*)                                  AS n,
           round(CAST(sum(cents) AS DOUBLE) / 100, 2) AS total_amount
    FROM gen
    WHERE event_id BETWEEN 1000 AND 3999
    GROUP BY etype
    """,
    description="User-defined Python Data Source (Spark 4 pyspark.sql."
    "datasource — DataSource V2 parity: InputPartition planning via "
    "partitions(), SupportsPushDownFilters via pushFilters). The event_id "
    "range predicate is pushed INTO the source, so pruned ids are never "
    "generated (source-side partition pruning).",
    tags=("source", "python-datasource", "pushdown"),
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.io.pysource import register_python_source

    # the driver may run this in its own session — make sure the source is
    # registered and source-side pushdown is on there too
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        register_python_source(spark)
    except Exception:
        pass  # already registered in this session
    ev = (
        spark.read.format("ops_events")
        .option("rows", 5000)
        .option("numPartitions", 8)
        .load()
    )
    cents = F.round(F.col("amount") * 100).cast("bigint")
    return (
        ev.filter((F.col("event_id") >= 1000) & (F.col("event_id") <= 3999))
        .groupBy("etype")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(cents).cast("double") / 100, 2).alias("total_amount"),
        )
    )


@register(
    "source_jdbc_derby",
    oracle="""
    SELECT c_nationkey, count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
    FROM customer WHERE c_custkey <= 500 AND c_acctbal > 0
    GROUP BY c_nationkey
    """,
    description="JDBC source (embedded Derby): partitioned stride read "
    "(JDBCRelation.scala:230 semantics) + WHERE-clause pushdown into the "
    "database; roundtrips a customer slice through a real JDBC table.",
    tags=("source", "jdbc"),
)
def source_jdbc_derby(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.io.jdbc import derby_url, read_jdbc_partitioned, write_jdbc

    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 500)
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    import hashlib

    # Stable digest, not builtin hash(): PYTHONHASHSEED salts hash() per
    # process, which would mint a fresh Derby DB name (and directory) on
    # every run.
    url = derby_url(f"fixtures_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}")
    write_jdbc(cust, url, "customer_slice")
    back = read_jdbc_partitioned(
        spark, url, "customer_slice", "c_custkey", 1, 501, num_partitions=4
    )
    # c_acctbal > 0 compiles into each stride's WHERE clause (JDBC filter
    # pushdown — the server prunes, not Spark).
    return (
        back.filter(F.col("c_acctbal") > 0)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "x_io_compact",
    oracle=None,  # filesystem maintenance op: file layout is not
    # SQL-expressible; data-equality + untouched-bytes + disjoint-range
    # invariants are pinned in
    # test_io.py::test_compact_parquet_binpacks_and_sorts /
    # test_compact_parquet_incremental_leaves_compliant_files
    description="OPTIMIZE-style INCREMENTAL small-file compaction "
    "(io/sinks.py:compact_parquet): a mixed layout of the orders table "
    "(4 compliant big files + a 60-file small shower, the streaming-"
    "sink pathology) bin-packs ONLY the undersized files — rewrite I/O "
    "is proportional to the small-file fraction, the property that "
    "makes continuous maintenance affordable at 100 TB. Returns layout "
    "stats, an untouched-bytes-identical flag for the compliant files, "
    "and a data checksum so the driver sees the pack was lossless.",
    tags=("io", "compaction", "maintenance"),
)
def x_io_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io.sinks import compact_parquet

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    work = os.path.join(tempfile.gettempdir(), f"ops_spark_compact_{digest}")
    shutil.rmtree(work, ignore_errors=True)
    base = spark.read.parquet(src)
    before_sum = base.selectExpr("sum(o_orderkey) s").first().s
    # mixed layout: 90% of rows in 4 compliant files, 10% sprayed across
    # 60 tiny files (what a streaming sink leaves behind between passes)
    base.where("o_orderkey % 10 != 0").repartition(4).write.parquet(work)
    base.where("o_orderkey % 10 = 0").repartition(60).write.mode(
        "append"
    ).parquet(work)
    names = [n for n in os.listdir(work) if n.endswith(".parquet")]
    sz = sorted(os.path.getsize(os.path.join(work, n)) for n in names)
    big_floor = sz[-4]  # smallest of the 4 big files
    big_before = {
        n: os.path.getsize(os.path.join(work, n))
        for n in names
        if os.path.getsize(os.path.join(work, n)) >= big_floor
    }
    stats = compact_parquet(
        spark,
        work,
        target_bytes=max(big_floor, 1024),
        sort_by=["o_orderkey"],
        min_file_bytes=max(int(big_floor * 0.9), 1024),
    )
    untouched_ok = all(
        os.path.exists(os.path.join(work, n))
        and os.path.getsize(os.path.join(work, n)) == s
        for n, s in big_before.items()
    )
    after_sum = spark.read.parquet(work).selectExpr("sum(o_orderkey) s").first().s
    return spark.createDataFrame(
        [
            (
                int(stats["files_before"]),
                int(stats["files_after"]),
                int(stats["rewritten_files"]),
                int(stats["untouched_files"]),
                bool(untouched_ok),
                bool(before_sum == after_sum),
            )
        ],
        "files_before int, files_after int, rewritten_files int, "
        "untouched_files int, untouched_bytes_identical boolean, "
        "lossless boolean",
    )


@register(
    "source_warc",
    oracle="""
    SELECT CASE WHEN doc_id % 4 = 0 THEN 'revisit' ELSE 'response' END
             AS warc_type,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(count(DISTINCT source) AS BIGINT) AS n_hosts
    FROM documents GROUP BY 1
    """,
    description="WARC source (io/warc.py): the documents table round-"
    "trips through real per-record-gzipped .warc.gz files (the "
    "CommonCrawl layout) and back through the warclite Python Data "
    "Source — one InputPartition per file, the crawl-pipeline unit of "
    "parallelism. The byte-count aggregate proves payloads survive the "
    "write→gzip→parse roundtrip exactly; the oracle re-derives every "
    "figure from the parquet source of truth.",
    tags=("source", "warc", "llm"),
)
def source_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.io.warc import register_warc_source, stage_documents_warc

    d = stage_documents_warc(sf_dir, html=False)
    register_warc_source(spark)
    w = spark.read.format("warclite").option("path", d).load()
    return w.groupBy("warc_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
        F.count_distinct(
            F.regexp_extract("target_uri", r"https://([^./]+)\.", 1)
        )
        .cast("bigint")
        .alias("n_hosts"),
    )


@register(
    "source_avro",
    oracle="""
    SELECT s_nationkey,
           count(*)                       AS n,
           round(sum(s_acctbal), 2)       AS total_bal
    FROM supplier
    GROUP BY s_nationkey
    """,
    description="Avro source/sink (AvroFileFormat.scala:44 kin): supplier "
    "roundtrips through Avro files, then aggregates. The roundtrip is "
    "lossless, so the parquet-backed oracle is exact. Uses the bundled "
    "implementation via full provider class when format('avro')'s short "
    "name isn't registered (io/kafka_avro.py).",
    tags=("source", "avro"),
)
def source_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ops_spark.io.kafka_avro import read_avro, write_avro

    sup = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    path = os.path.join(
        tempfile.gettempdir(),
        f"ops_spark_avro_{abs(sup.count())}_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    write_avro(sup, path, mode="overwrite")
    back = read_avro(spark, path)
    return back.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
    )


@register(
    "io_snapshot_timetravel",
    oracle=f"""
    SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
    description="Versioned snapshot table end-to-end "
    "(io/snapshots.py): append v0 (pre-1997 slice) + v1 (rest), "
    "overwrite v2 with a corrupted aggregate, roll BACK to v1, read "
    "latest. The oracle is the plain nation-by-year aggregate — so the "
    "commit-log fold, the version-pinned file listing, AND the rollback "
    "must all be exactly right for the hash to match (a torn read, a "
    "leaked v2 file, or a mis-folded remove list all change the values). "
    "Crash/race/vacuum behavior is pinned in test_io.py::test_snapshot_*.",
    tags=("io", "snapshot", "timetravel", "maintenance"),
)
def io_snapshot_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.io.snapshots import (
        append_slices,
        read_snapshot,
        rollback,
        write_snapshot,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_snap_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    agg = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, sf_dir, "nation"), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("__t"),
        )
        .select("n_name", "yr", "n_orders", F.col("__t").cast("double").alias("total"))
    )
    # v0 (pre-1997 slice) + v1 (rest) land as two append commits staged by
    # ONE execution of the aggregate (append_slices: identical log shape
    # to the former per-slice write_snapshot loop); the corrupt v2 then
    # derives from reading v0+v1 BACK instead of running the aggregate a
    # third time — the written rows ARE the aggregate, so doubling them
    # yields bit-identical corrupt values.
    append_slices(
        spark,
        agg.withColumn(
            "__s", F.when(F.col("yr") < 1997, 0).otherwise(1).cast("int")
        ),
        tbl,
        "__s",
        2,
    )  # v0 + v1
    corrupt = read_snapshot(spark, tbl).withColumn("total", F.col("total") * 2)
    write_snapshot(spark, corrupt, tbl, mode="overwrite")  # v2: the bad run
    rollback(spark, tbl, 1)  # v3: the undo
    return read_snapshot(spark, tbl)  # latest == v1 == the true aggregate


@register(
    "io_snapshot_read_skip",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey <= (SELECT CAST(floor(max(o_orderkey) / 4.0) AS BIGINT)
                         FROM orders)
    GROUP BY o_orderpriority
    """,
    description="READ-side data skipping on a snapshot table "
    "(io/snapshots.py:read_snapshot key_range): orders lands as 8 "
    "range-keyed commits (disjoint per-file min/max in the commit-log "
    "stats), then a key-range read prunes the non-intersecting files on "
    "the driver — zero I/O — and applies the matching predicate on top. "
    "The oracle is the plain filtered aggregate, so a file pruned "
    "wrongly (missing rows) or kept wrongly WITHOUT the predicate "
    "(extra rows) both flip the hash. That the scan actually touches "
    "only the intersecting files is pinned via df.inputFiles() in "
    "test_io.py::test_snapshot_read_key_range_skips_files.",
    tags=("io", "snapshot", "data-skipping", "scan"),
)
def io_snapshot_read_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import math
    import os
    import shutil
    import tempfile

    from ops_spark.io.snapshots import read_snapshot

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_skip_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    bounds = base.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    # 8 disjoint-range commits: a CDC-ish ingest keyed on a monotone id,
    # the layout read-side skipping exists for. The when-chain assigns each
    # key the SAME slice its between(s, e) filter would have selected; one
    # partitioned staging job replaces 8 scan+write jobs (append_slices),
    # with the identical 8-append-commit log.
    from ops_spark.io.snapshots import append_slices

    span = (bounds.hi - bounds.lo + 1) / 8.0
    sl = None
    for i in range(8):
        s = bounds.lo + int(math.floor(i * span))
        e = bounds.lo + int(math.floor((i + 1) * span)) - 1
        cond = F.col("o_orderkey").between(s, e)
        sl = F.when(cond, i) if sl is None else sl.when(cond, i)
    append_slices(spark, base.withColumn("__slice", sl), tbl, "__slice", 8)
    cut = int(math.floor(bounds.hi / 4.0))
    return (
        read_snapshot(spark, tbl, key_range=("o_orderkey", None, cut))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "x_io_merge",
    oracle="""
    WITH final AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                  ELSE o_totalprice END AS price
      FROM orders
      UNION ALL
      SELECT o_orderkey + 100000000, '6-SYNTH', o_totalprice
      FROM orders WHERE o_orderkey % 89 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM final GROUP BY o_orderpriority
    """,
    description="MERGE INTO on a snapshot table (io/snapshots.py:"
    "merge_snapshot) — the CDC upsert a continuously refreshed corpus "
    "needs (Delta/Iceberg MERGE shape). Orders becomes a range-"
    "partitioned snapshot table; a CDC batch doubles every 97th "
    "order's price and inserts synthetic '6-SYNTH' orders; the merge "
    "finds touched files via footer min/max pruning + an exact key "
    "semi-join, rewrites ONLY those, and publishes one atomic commit. "
    "The oracle re-derives the post-merge state from the raw table, so "
    "a lost update, a duplicated copy row, or a leaked pre-merge file "
    "all flip the hash. File-level incrementality + time travel across "
    "the merge are pinned in test_io.py::test_snapshot_merge_*.",
    tags=("io", "snapshot", "merge", "cdc", "maintenance"),
)
def x_io_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io.snapshots import merge_snapshot, read_snapshot, write_snapshot

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_merge_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").alias("price")
    )
    # range layout on the merge key → disjoint footer min/max per file,
    # the property phase-1 pruning exploits
    write_snapshot(spark, base.repartitionByRange(8, "o_orderkey"), tbl)

    updates = base.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "price", F.col("price") * 2
    )
    inserts = base.filter(F.col("o_orderkey") % 89 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("6-SYNTH").alias("o_orderpriority"),
        "price",
    )
    merge_snapshot(spark, tbl, updates.unionByName(inserts), on=["o_orderkey"])

    cents = F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint")
    return (
        read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).cast("bigint").alias("total_cents"),
        )
    )


@register(
    "x_io_zorder",
    oracle=None,  # file-layout op (Morton clustering quality is not
    # SQL-expressible); data equality + bounded-span invariants pinned in
    # test_io.py::test_compact_parquet_zorder_bounds_both_dimensions and
    # re-asserted at 100x by the sweep verifier reading this query's flags
    description="OPTIMIZE ZORDER BY (io/sinks.py:compact_parquet "
    "zorder_by): a small-file shower of the orders table re-clusters on "
    "the Morton interleave of (o_custkey, o_orderkey-derived day). "
    "Returns per-file footer min/max span stats for BOTH dimensions "
    "plus a lossless checksum — the measurable claim is that every "
    "packed file covers a bounded sub-rectangle, so scans filtering on "
    "EITHER column skip files; a linear sort only skips on its leading "
    "column.",
    tags=("io", "compaction", "zorder", "maintenance"),
)
def x_io_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ops_spark.io.sinks import compact_parquet

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    work = os.path.join(tempfile.gettempdir(), f"ops_spark_zorder_{digest}")
    shutil.rmtree(work, ignore_errors=True)
    base = spark.read.parquet(src).select(
        "o_orderkey",
        F.col("o_custkey").alias("x"),
        (F.dayofyear("o_orderdate").cast("bigint")).alias("y"),
    )
    before = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).first()
    base.repartition(64).write.parquet(work)
    sizes = sorted(
        os.path.getsize(os.path.join(work, n))
        for n in os.listdir(work)
        if n.endswith(".parquet")
    )
    stats = compact_parquet(
        spark,
        work,
        target_bytes=max(sum(sizes) // 12, 4096),
        zorder_by=("x", "y"),
        min_file_bytes=max(sizes[-1] + 1, 8192),  # every file is "small"
    )
    xs = {"x": [], "y": []}
    glob = {"x": [None, None], "y": [None, None]}
    for nm in sorted(os.listdir(work)):
        if not nm.endswith(".parquet") or nm.startswith("."):
            continue
        md = pq.ParquetFile(os.path.join(work, nm)).metadata
        names = md.schema.to_arrow_schema().names
        for c in ("x", "y"):
            idx = names.index(c)
            los = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
            his = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
            xs[c].append((min(los), max(his)))
            glob[c][0] = min(los) if glob[c][0] is None else min(glob[c][0], min(los))
            glob[c][1] = max(his) if glob[c][1] is None else max(glob[c][1], max(his))
    span = {}
    for c in ("x", "y"):
        width = max(1, glob[c][1] - glob[c][0])
        span[c] = sum((hi - lo) / width for lo, hi in xs[c]) / len(xs[c])
    after = spark.read.parquet(work).agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"), F.sum("y").alias("sy")
    ).first()
    return spark.createDataFrame(
        [
            (
                int(stats["files_before"]),
                int(stats["files_after"]),
                float(round(span["x"], 4)),
                float(round(span["y"], 4)),
                bool(tuple(before) == tuple(after)),
            )
        ],
        "files_before int, files_after int, avg_span_x double, "
        "avg_span_y double, lossless boolean",
    )


@register(
    "io_snapshot_cdf",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           'update_pre' AS change_type
    FROM upd
    UNION ALL
    SELECT o_orderkey, o_orderpriority,
           CAST(floor(o_totalprice * 2 * 100 + 0.5) AS BIGINT),
           'update_post'
    FROM upd
    UNION ALL
    SELECT o_orderkey + 100000000, '6-SYNTH',
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT),
           'insert'
    FROM orders WHERE o_orderkey % 89 = 0
    """,
    description="Change data feed between snapshot versions "
    "(io/snapshots.py:snapshot_diff): after the x_io_merge CDC batch, "
    "the v0→v1 diff must contain EXACTLY the update pre/post images "
    "and the inserts — and none of the thousands of copy rows the "
    "copy-on-write rewrite carried along (shared immutable files "
    "cancel by NAME, matched-equal rows cancel in the key join). The "
    "oracle re-derives the change set from the raw table, so a leaked "
    "copy row, a lost image, or a wrong change label all flip the "
    "hash.",
    tags=("io", "snapshot", "cdf", "cdc", "maintenance"),
)
def io_snapshot_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io.snapshots import (
        latest_version,
        merge_snapshot,
        snapshot_diff,
        write_snapshot,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_cdf_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").alias("price")
    )
    write_snapshot(spark, base.repartitionByRange(8, "o_orderkey"), tbl)
    updates = base.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "price", F.col("price") * 2
    )
    inserts = base.filter(F.col("o_orderkey") % 89 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("6-SYNTH").alias("o_orderpriority"),
        "price",
    )
    merge_snapshot(spark, tbl, updates.unionByName(inserts), on=["o_orderkey"])
    diff = snapshot_diff(spark, tbl, 0, latest_version(tbl), on=["o_orderkey"])
    return diff.select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.col("__change").alias("change_type"),
    )


@register(
    "io_snapshot_checkpoint",
    oracle="""
    SELECT o_orderpriority, 'latest' AS src,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'v11' AS src,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    WHERE o_orderkey % 24 < 12
    GROUP BY o_orderpriority
    """,
    description="Commit-log CHECKPOINTING on a snapshot table "
    "(io/snapshots.py:_write_checkpoint — the Delta _checkpoint.parquet "
    "idea): orders lands as 24 small append commits, the CDC-sink shape "
    "that makes a naive O(commits) log fold the driver bottleneck; the "
    "writer folds live-set + per-file stats + schema into a parquet "
    "checkpoint every CHECKPOINT_INTERVAL commits, and the latest read "
    "replays only the tail. The result unions the LATEST read (folded "
    "through the checkpoint) with a TIME-TRAVEL read to v11 (below the "
    "checkpoint, full replay), each re-derived by the oracle from the "
    "raw table — a checkpoint that dropped a file, double-counted one, "
    "or smeared the fold across versions flips the hash. The read-cost "
    "bound (<= interval commit opens) and corruption fallback are "
    "pinned in test_io.py::test_snapshot_checkpoint_*.",
    tags=("io", "snapshot", "checkpoint", "maintenance"),
)
def io_snapshot_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_ckpt_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    n_commits = 24
    # one commit per micro-batch, CDC-sink style — staged by ONE
    # partitioned write (append_slices) instead of 24 scan+write jobs;
    # the commit log still holds 24 append versions, one per residue
    S.append_slices(
        spark,
        base.withColumn("__slice", F.col("o_orderkey") % n_commits),
        tbl,
        "__slice",
        n_commits,
    )
    # the checkpoint must actually have engaged (v20 at the default
    # interval) — a silently-skipped checkpoint would make this query
    # test nothing
    if 0 < S.CHECKPOINT_INTERVAL < n_commits:
        expect = (n_commits - 1) // S.CHECKPOINT_INTERVAL * S.CHECKPOINT_INTERVAL
        if not os.path.exists(S._checkpoint_path(tbl, expect)):
            raise S.SnapshotError(f"checkpoint at v{expect} was not written")

    def _agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.lit(tag).alias("src"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        ).select("o_orderpriority", "src", "n_orders", "total_cents")

    latest = S.read_snapshot(spark, tbl)  # checkpoint + tail replay
    v11 = S.read_snapshot(spark, tbl, version=11)  # below the checkpoint
    return _agg(latest, "latest").unionByName(_agg(v11, "v11"))


@register(
    "io_snapshot_stream_tail",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="Streaming FROM a snapshot table (io/snapshot_stream.py "
    "— Delta's table-as-streaming-source): orders lands as 4 append "
    "commits, then readStream.format('ops_snapshot') tails the commit "
    "log — offsets are commit versions, each micro-batch's input "
    "partitions are exactly the files its commits added, read "
    "executor-side via pyarrow as Arrow batches. availableNow drains "
    "the log into a memory sink; the post-sink aggregate must equal the "
    "plain batch aggregate the oracle computes, so a skipped commit, a "
    "double-read file, or a mis-projected schema all flip the hash. "
    "Incremental continuation (checkpoint reads only NEW commits), "
    "append-mode failure on rewrite commits, ignore_changes, "
    "startingversion, and schema-evolution projection are pinned in "
    "test_streaming_extra.py::test_snapshot_stream_*.",
    tags=("io", "snapshot", "streaming", "source"),
)
def io_snapshot_stream_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_tail_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    for i in range(4):  # the CDC-ingest shape a downstream would tail
        S.write_snapshot(
            spark,
            base.filter(F.col("o_orderkey") % 4 == i).repartition(2),
            tbl,
            mode="append",
        )
    sdf = spark.readStream.format("ops_snapshot").option("path", tbl).load()
    drained = run_bounded(sdf, name=f"snap_tail_{digest}")
    return drained.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


@register(
    "io_snapshot_constraint",
    oracle="""
    WITH cap AS (
      SELECT CAST(floor(max(floor(o_totalprice * 100 + 0.5)) / 2) AS BIGINT)
        AS c
      FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders, cap
    WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) <= c
    GROUP BY o_orderpriority
    """,
    description="CHECK constraints on a snapshot table (io/snapshots.py:"
    "add_constraint — Delta ADD CONSTRAINT): the table is seeded with "
    "orders under a price cap and constrained to cents <= cap; the "
    "query then TRIES to append the full remainder (which contains "
    "violators) — enforcement inside the write job must raise and "
    "commit nothing — and falls back to appending only the valid rows. "
    "The final aggregate equals the oracle's capped aggregate, so a "
    "silently-passed violating append (extra rows) or a lost valid "
    "append both flip the hash: the gate itself is load-bearing. "
    "History validation, NULL-pass semantics, and per-writer "
    "enforcement are pinned in test_io.py::test_snapshot_check_"
    "constraints.",
    tags=("io", "snapshot", "constraint", "quality"),
)
def io_snapshot_constraint(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_ck_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    cap = base.agg(F.floor(F.max("cents") / 2).cast("bigint").alias("c")).first().c
    seed = base.filter((F.col("cents") <= cap) & (F.col("o_orderkey") % 2 == 0))
    S.write_snapshot(spark, seed, tbl)
    S.add_constraint(spark, tbl, "cents_cap", f"cents <= {cap}")
    rest = base.filter(F.col("o_orderkey") % 2 == 1)  # contains violators
    try:
        S.write_snapshot(spark, rest, tbl, mode="append")
        raise S.SnapshotError(
            "constraint gate silently passed a violating append"
        )
    except S.SnapshotError:
        raise
    except Exception:
        # the expected in-job CHECK violation: quarantine-split instead
        S.write_snapshot(
            spark, rest.filter(F.col("cents") <= cap), tbl, mode="append"
        )
    return (
        S.read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


@register(
    "io_snapshot_dml",
    oracle="""
    WITH final AS (
      SELECT o_orderkey,
             o_orderpriority,
             CASE WHEN o_orderpriority = '2-HIGH'
                  THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) * 2
                  ELSE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             END AS cents
      FROM orders
      WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0)
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY o_orderpriority
    """,
    description="Predicate DML on a snapshot table (io/snapshots.py:"
    "delete_where / update_where — Delta DELETE/UPDATE shape): orders "
    "lands as a multi-file snapshot; DELETE WHERE prunes every third "
    "urgent order, UPDATE WHERE doubles the high-priority cents, each "
    "as ONE atomic copy-on-write commit that rewrites only files "
    "containing a match (touch detection = a single column-pruned "
    "input_file_name scan). The oracle re-derives the post-DML table "
    "from raw orders, so a lost retained row, a surviving deleted row, "
    "or an update applied to the wrong rows all flip the hash. "
    "File-level incrementality and NULL-predicate semantics are pinned "
    "in test_io.py::test_snapshot_delete_where_* / test_snapshot_"
    "update_where_*.",
    tags=("io", "snapshot", "dml", "maintenance"),
)
def io_snapshot_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_dml_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    S.write_snapshot(spark, base.repartitionByRange(8, "o_orderkey"), tbl)
    S.delete_where(
        spark, tbl, "o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0"
    )
    S.update_where(
        spark, tbl, {"cents": "cents * 2"}, "o_orderpriority = '2-HIGH'"
    )
    return (
        S.read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("total_cents"),
        )
    )


@register(
    "io_snapshot_dv",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), final AS (
      SELECT * FROM base
      WHERE NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0)
        AND NOT (cents % 10 = 7)
    )
    SELECT o_orderpriority, count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY o_orderpriority
    UNION ALL
    SELECT '__v0' AS o_orderpriority, count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM base
    """,
    description="DELETION VECTORS on a snapshot table (io/snapshots.py:"
    "delete_where(dv=True) — Delta's DV mode): orders lands as a "
    "multi-file snapshot, then TWO dv deletes land as position-blob "
    "commits that rewrite NO data file (the second unions with the "
    "first on overlapping files); readers drop deleted rows scan-side "
    "via a broadcast anti-join on parquet _metadata row positions. The "
    "result aggregates the final state AND the '__v0' row re-reads the "
    "pre-delete version through time travel — so a row deleted from "
    "history, a surviving deleted row, or a vector applied to the "
    "wrong file all flip the hash. Union/idempotence/rollback/vacuum/"
    "merge-folds-vector pins live in test_io.py::test_snapshot_dv_*.",
    tags=("io", "snapshot", "dml", "maintenance"),
)
def io_snapshot_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_dv_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    S.write_snapshot(spark, base.repartitionByRange(8, "o_orderkey"), tbl)
    S.delete_where(
        spark, tbl, "o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0",
        dv=True,
    )
    S.delete_where(spark, tbl, "cents % 10 = 7", dv=True)
    final = (
        S.read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
    )
    v0 = (
        S.read_snapshot(spark, tbl, version=0)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            F.lit("__v0").alias("o_orderpriority"), "n_rows", "total_cents"
        )
    )
    return final.unionByName(v0)


@register(
    "io_snapshot_dv_cdf",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT 'insert' AS _change_type, o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM base GROUP BY o_orderpriority
    UNION ALL
    SELECT 'delete' AS _change_type, o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM base
    WHERE (o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0)
       OR cents % 10 = 7
    GROUP BY o_orderpriority
    """,
    description="CDF STREAMING from a snapshot table (io/snapshot_stream"
    ".py changemode=cdf — the Delta CDF-stream shape, incl. deletion-"
    "vector retractions): orders lands as two append commits, then TWO "
    "dv deletes (overlapping conditions) re-point files at position "
    "blobs; the bounded cdf stream must emit every appended row as an "
    "'insert' and every vector-deleted row as EXACTLY ONE 'delete' "
    "retraction — the second blob holds the whole vector, so a reader "
    "that replays it naively retracts the first delete's rows twice "
    "and flips the hash (new-minus-previous-vector is load-bearing). "
    "Aggregated by change type x priority against the oracle's direct "
    "recompute. Merge-as-delete+insert pairs and copy-on-write refusal "
    "are pinned in test_streaming_extra.py::test_snapshot_stream_cdf_"
    "mode.",
    tags=("io", "snapshot", "streaming", "cdf", "dml"),
)
def io_snapshot_dv_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S
    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.streaming.runner import run_bounded

    register_snapshot_source(spark)
    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_dvcdf_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    # 2 append commits staged by one partitioned write (append_slices);
    # the dv deletes and the cdf stream see the identical 2-commit log
    S.append_slices(
        spark,
        base.withColumn("__slice", F.col("o_orderkey") % 2),
        tbl,
        "__slice",
        2,
    )
    S.delete_where(
        spark, tbl, "o_orderpriority = '1-URGENT' AND o_orderkey % 3 = 0",
        dv=True,
    )
    S.delete_where(spark, tbl, "cents % 10 = 7", dv=True)

    cdf = (
        spark.readStream.format("ops_snapshot")
        .option("path", tbl)
        .option("changemode", "cdf")
        .load()
    )
    # aggregate INSIDE the stream (complete mode): the memory sink then
    # holds the ~10-row grouped result, not the full change feed — at
    # 100x the raw feed is ~15M wide rows, past any driver's
    # maxResultSize; collecting it would be the anti-pattern the cdf
    # source exists to avoid
    agg = cdf.groupBy("_change_type", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("total_cents"),
    )
    return run_bounded(
        agg, output_mode="complete", name=f"snap_dvcdf_{digest}"
    )


@register(
    "io_snapshot_dv_merge",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), merged AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 97 = 0 THEN cents * 2 ELSE cents END
               AS cents
      FROM base
      UNION ALL
      SELECT o_orderkey + 100000000, '8-DVM', cents
      FROM base WHERE o_orderkey % 89 = 0
    ), afterdel AS (
      SELECT * FROM merged
      WHERE o_orderkey NOT IN (
        SELECT o_orderkey FROM base WHERE o_orderkey % 83 = 0
      )
    ), final AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderpriority = '2-HIGH' AND o_orderkey % 7 = 0
                  THEN cents + 1 ELSE cents END AS cents
      FROM afterdel
    )
    SELECT o_orderpriority, count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY o_orderpriority
    UNION ALL
    SELECT '__v0' AS o_orderpriority, count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM base
    """,
    description="DELETION-VECTOR MERGE/UPDATE (io/snapshots.py:_merge_dv,"
    "_update_where_dv — Delta's DV MERGE): a CDC batch (price doubling "
    "on %97 keys + synthetic '8-DVM' inserts) lands as a dv merge that "
    "REWRITES NO FILE (matched rows vector-deleted, post-merge rows as "
    "new files), then a delete-mode dv merge retires the %83 keys, then "
    "update_where(dv=True) bumps '2-HIGH' %7 rows — three commits whose "
    "write cost is O(changed rows), not O(rows in touched files). The "
    "builder asserts files_rewritten == 0 on each, and the result "
    "aggregates the final state plus a '__v0' time-travel row, so a "
    "resurrected deleted row, a lost update, or a vector applied to the "
    "wrong file flips the hash. OCC/CDF/constraint pins live in "
    "test_io.py::test_snapshot_dv_merge_*.",
    tags=("io", "snapshot", "dml", "cdc", "maintenance"),
)
def io_snapshot_dv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_dvm_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    S.write_snapshot(spark, base.repartitionByRange(8, "o_orderkey"), tbl)

    upd = base.filter("o_orderkey % 97 = 0").withColumn(
        "cents", F.col("cents") * 2
    )
    ins = base.filter("o_orderkey % 89 = 0").select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("8-DVM").alias("o_orderpriority"),
        "cents",
    )
    r1 = S.merge_snapshot(spark, tbl, upd.unionByName(ins), on=["o_orderkey"],
                          dv=True)
    r2 = S.merge_snapshot(
        spark, tbl,
        base.filter("o_orderkey % 83 = 0"),
        on=["o_orderkey"], when_matched="delete", when_not_matched="ignore",
        dv=True,
    )
    r3 = S.update_where(
        spark, tbl, {"cents": "cents + 1"},
        "o_orderpriority = '2-HIGH' AND o_orderkey % 7 = 0", dv=True,
    )
    for r in (r1, r2, r3):  # the DV invariant: no data file rewritten
        assert r["files_rewritten"] == 0, r
    # REORG APPLY (PURGE): fold every vector back into plain files —
    # visible rows are identical, so the oracle match doubles as the
    # purge-correctness check
    S.reorg_purge(spark, tbl, min_deleted_ratio=1e-9)
    assert not S._state(tbl).dv, "purge left a live vector behind"

    final = (
        S.read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
    )
    v0 = (
        S.read_snapshot(spark, tbl, version=0)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
        .select(
            F.lit("__v0").alias("o_orderpriority"), "n_rows", "total_cents"
        )
    )
    return final.unionByName(v0)


@register(
    "io_snapshot_ivm",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), final AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 97 = 0 THEN cents * 2 ELSE cents END
               AS cents
      FROM base WHERE o_orderkey % 83 <> 0
      UNION ALL
      SELECT o_orderkey + 100000000, '7-IVM', cents
      FROM base WHERE o_orderkey % 89 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS total_cents
    FROM final GROUP BY o_orderpriority
    """,
    description="Incremental view maintenance over the change data feed "
    "(io/snapshots.py:incremental_aggregate): a SUM/COUNT rollup state "
    "is bootstrapped at v0, then two CDC merges land (price doubling + "
    "synthetic inserts; then deletes) and the state is advanced by "
    "signed deltas from snapshot_diff — post-images add, pre-images "
    "subtract — reading only the churned files, never the table. The "
    "returned state must equal the oracle's full recompute from raw "
    "orders: a missed pre-image, a double-applied post-image, or an "
    "undropped empty group all flip the hash. Chained maintenance and "
    "group-key moves are pinned in "
    "test_io.py::test_snapshot_incremental_aggregate.",
    tags=("io", "snapshot", "ivm", "cdf", "maintenance"),
)
def io_snapshot_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_ivm_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    S.write_snapshot(spark, base.repartitionByRange(8, "o_orderkey"), tbl)
    state = S.aggregate_snapshot(
        spark, tbl, ["o_orderpriority"], {"total_cents": "cents"}
    ).persist()
    state.count()  # materialize the v0 state before the CDC batches land

    updates = base.filter(F.col("o_orderkey") % 97 == 0).withColumn(
        "cents", F.col("cents") * 2
    )
    inserts = base.filter(F.col("o_orderkey") % 89 == 0).select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.lit("7-IVM").alias("o_orderpriority"),
        "cents",
    )
    S.merge_snapshot(spark, tbl, updates.unionByName(inserts), on=["o_orderkey"])
    S.merge_snapshot(
        spark,
        tbl,
        base.filter(F.col("o_orderkey") % 83 == 0).select("o_orderkey"),
        on=["o_orderkey"],
        when_matched="delete",
        when_not_matched="ignore",
    )
    out = S.incremental_aggregate(
        spark,
        tbl,
        0,
        S.latest_version(tbl),
        on=["o_orderkey"],
        group_by=["o_orderpriority"],
        sums={"total_cents": "cents"},
        state=state,
    )
    return out.select("o_orderpriority", "n_rows", "total_cents")


@register(
    "io_snapshot_replace_range",
    oracle="""
    WITH bounds AS (
      SELECT min(o_orderkey) AS lo_all, max(o_orderkey) AS hi_all FROM orders
    ), rng AS (
      SELECT CAST(lo_all + floor((hi_all - lo_all + 1) * 0.25) AS BIGINT) AS lo,
             CAST(lo_all + floor((hi_all - lo_all + 1) * 0.50) AS BIGINT) - 1 AS hi
      FROM bounds
    ), final AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice AS price
      FROM orders, rng WHERE o_orderkey < lo OR o_orderkey > hi
      UNION ALL
      SELECT o_orderkey, '7-REST', o_totalprice * 3
      FROM orders, rng
      WHERE o_orderkey BETWEEN lo AND hi AND o_orderkey % 2 = 0
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(price * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM final GROUP BY o_orderpriority
    """,
    description="replaceWhere on a snapshot table (io/snapshots.py:"
    "replace_range — Delta's replaceWhere): orders lands as 8 "
    "range-keyed commits; one atomic commit replaces the second "
    "key-quartile with a restated slice (every 2nd key, price*3, "
    "priority '7-REST'). The commit-log stats classify every live file "
    "with zero data I/O: fully-inside files drop whole, disjoint files "
    "keep their bytes by name, only the two boundary files rewrite "
    "their complement. The oracle re-derives the post-replace table "
    "from raw orders, so a dropped outside-row, a surviving "
    "inside-row, or a double-kept boundary row all flip the hash. "
    "File-level classification is pinned in "
    "test_io.py::test_snapshot_replace_range_classifies_and_replaces.",
    tags=("io", "snapshot", "replace-where", "cdc", "maintenance"),
)
def io_snapshot_replace_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import math
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_rr_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.col("o_totalprice").alias("price")
    )
    b = base.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).first()
    span = b.hi - b.lo + 1
    # range-clustered layout, one commit per slice — staged by one
    # partitioned write; the when-chain reproduces the between(s, e)
    # slice membership exactly, the log still holds 8 append commits
    sl = None
    for i in range(8):
        s = b.lo + int(math.floor(i * span / 8.0))
        e = b.lo + int(math.floor((i + 1) * span / 8.0)) - 1
        cond = F.col("o_orderkey").between(s, e)
        sl = F.when(cond, i) if sl is None else sl.when(cond, i)
    S.append_slices(spark, base.withColumn("__slice", sl), tbl, "__slice", 8)
    lo = b.lo + int(math.floor(span * 0.25))
    hi = b.lo + int(math.floor(span * 0.50)) - 1
    restated = (
        base.filter(
            F.col("o_orderkey").between(lo, hi) & (F.col("o_orderkey") % 2 == 0)
        )
        .withColumn("price", F.col("price") * 3)
        .withColumn("o_orderpriority", F.lit("7-REST"))
    )
    S.replace_range(spark, tbl, restated, "o_orderkey", lo, hi)
    return (
        S.read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint"))
            .alias("total_cents"),
        )
    )


@register(
    "io_snapshot_zorder",
    oracle="""
    SELECT dim, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
      SELECT 'orderkey' AS dim, o_totalprice FROM orders
      WHERE o_orderkey <= (SELECT CAST(floor(max(o_orderkey) / 5.0) AS BIGINT)
                           FROM orders)
      UNION ALL
      SELECT 'custkey' AS dim, o_totalprice FROM orders
      WHERE o_custkey <= (SELECT CAST(floor(max(o_custkey) / 5.0) AS BIGINT)
                          FROM orders)
    ) both_dims
    GROUP BY dim
    """,
    description="OPTIMIZE ZORDER on a snapshot table "
    "(io/snapshots.py:compact_snapshot zorder_by, via "
    "operators/analytics.py:zorder_cluster): orders lands as 8 commits "
    "each smeared across the FULL (o_orderkey, o_custkey) plane, a "
    "Morton-curve compaction re-clusters them in ONE commit, and the "
    "query reads back through key_range skipping on EACH dimension — "
    "the commit-log min/max is selective on both axes only if the "
    "physical clustering is real. The oracle recomputes both filtered "
    "aggregates from raw orders, so a row lost/duplicated by the "
    "rewrite or a file pruned wrongly on either axis flips the hash. "
    "Per-file skipping extents are pinned in "
    "test_io.py::test_compact_snapshot_zorder_restores_skipping_both_dims.",
    tags=("io", "snapshot", "zorder", "optimize", "data-skipping"),
)
def io_snapshot_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import math
    import os
    import shutil
    import tempfile

    from ops_spark.io.snapshots import compact_snapshot, read_snapshot

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_zorder_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    # 8 commits of interleaved residues: every file spans ~the whole
    # key plane on BOTH dimensions, so pre-compaction stats skip nothing.
    # One partitioned staging job (append_slices) replaces 8 scan+write
    # jobs; the log still holds 8 residue commits.
    from ops_spark.io.snapshots import append_slices

    append_slices(
        spark,
        base.withColumn("__slice", F.col("o_orderkey") % 8),
        tbl,
        "__slice",
        8,
    )
    compact_snapshot(
        spark, tbl, target_bytes=1 << 18, min_file_bytes=1 << 30,
        zorder_by=("o_orderkey", "o_custkey"),
    )
    b = base.agg(
        F.max("o_orderkey").alias("k_hi"), F.max("o_custkey").alias("c_hi")
    ).first()
    k_cut = int(math.floor(b.k_hi / 5.0))
    c_cut = int(math.floor(b.c_hi / 5.0))

    def agg_dim(df, label):
        return df.groupBy().agg(
            F.lit(label).alias("dim"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )

    by_k = read_snapshot(spark, tbl, key_range=("o_orderkey", None, k_cut))
    by_c = read_snapshot(spark, tbl, key_range=("o_custkey", None, c_cut))
    return agg_dim(by_k, "orderkey").unionByName(
        agg_dim(by_c, "custkey")
    ).select("dim", "n_orders", "total")


@register(
    "io_snapshot_rename_drop",
    oracle="""
    WITH final AS (
      SELECT o_orderkey AS ident, o_orderpriority,
             CASE WHEN o_orderkey % 101 = 0
                  THEN CAST(NULL AS BIGINT)
                  ELSE CAST(NULL AS BIGINT) END AS flag,
             CASE WHEN o_orderkey % 97 = 0 THEN 'RENAMED-UPD'
                  ELSE o_orderpriority END AS prio2
      FROM orders
    )
    SELECT prio2 AS o_prio, count(*) AS n_orders,
           count(flag) AS n_flagged
    FROM final GROUP BY prio2
    """,
    description="Column mapping DDL on a snapshot table "
    "(io/snapshots.py:rename_column/drop_column — Delta columnMapping "
    "name-mode): orders lands, o_orderkey is RENAMED to ident and "
    "o_totalprice DROPPED (both pure metadata commits: zero files "
    "touched), a column named flag is re-ADDED via append evolution "
    "(fresh physical name — the dropped bytes must NOT resurrect, so "
    "every pre-existing row reads NULL), and a merge keyed on the "
    "RENAMED column updates rows through the logical->physical mapping. "
    "The oracle recomputes from raw orders with flag uniformly NULL: a "
    "resurrected dropped value, a lost rename, or a merge that missed "
    "the mapped key flips the hash. Metadata-only commits and time "
    "travel across the DDL are pinned in "
    "test_io.py::test_snapshot_rename_column_is_metadata_only and "
    "::test_snapshot_drop_column_and_no_resurrection.",
    tags=("io", "snapshot", "ddl", "column-mapping"),
)
def io_snapshot_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io import snapshots as S

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_cmap_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_totalprice").cast("decimal(12,2)").alias("flag"),
    )
    S.write_snapshot(spark, base.repartitionByRange(4, "o_orderkey"), tbl)
    S.rename_column(spark, tbl, "o_orderkey", "ident")
    S.drop_column(spark, tbl, "flag")
    # re-add the dropped logical name with a DIFFERENT dtype: legal,
    # because the fresh physical column shares nothing with the old one
    upd = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 == 0)
        .select(
            F.col("o_orderkey").alias("ident"),
            F.lit("RENAMED-UPD").alias("o_orderpriority"),
            F.lit(None).cast("bigint").alias("flag"),
        )
    )
    S.merge_snapshot(spark, tbl, upd, on=["ident"], allow_schema_evolution=True)
    return (
        S.read_snapshot(spark, tbl)
        .groupBy(F.col("o_orderpriority").alias("o_prio"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("flag").alias("n_flagged"),
        )
    )


@register(
    "source_snapshot_batch",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey <= (SELECT CAST(floor(max(o_orderkey) / 3.0) AS BIGINT)
                         FROM orders)
    GROUP BY o_orderpriority
    """,
    description="The ops_snapshot Spark data source end-to-end "
    "(io/snapshot_stream.py — Delta's format('delta') UX): orders is "
    "WRITTEN through df.write.format('ops_snapshot') as ONE commit of "
    "6 range-clustered files (task-staged 2PC into the commit log, "
    "per-file min/max recorded), then READ back via "
    "spark.read.format('ops_snapshot') with a plain DataFrame filter — "
    "Spark 4.1 filter PUSHDOWN hands the predicate to the scan, which "
    "drops non-intersecting files from the commit-log stats on the "
    "driver before any task launches. The oracle is the filtered "
    "aggregate on raw orders: a row lost by the 2PC write, a file "
    "pruned wrongly, or a filter not re-applied post-scan flips the "
    "hash. Pruning counts, time travel options, and writer semantics "
    "are pinned in test_streaming_extra.py::"
    "test_snapshot_batch_datasource and ::test_snapshot_batch_writer.",
    tags=("source", "snapshot", "datasource", "pushdown", "writer"),
)
def source_snapshot_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import math
    import os
    import shutil
    import tempfile

    from ops_spark.io.snapshot_stream import register_snapshot_source

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    tbl = os.path.join(tempfile.gettempdir(), f"ops_spark_srcsnap_{digest}")
    shutil.rmtree(tbl, ignore_errors=True)

    register_snapshot_source(spark)
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # the filter cut only needs max(o_orderkey): ride it on the 2PC write
    # as an observation instead of a standalone agg job (guide §1.2 — one
    # fewer full source pass; max is idempotent under the range
    # partitioner's extra sampling execution of the subtree)
    from pyspark.sql import Observation

    obs = Observation()
    base = base.observe(obs, F.max("o_orderkey").alias("hi"))
    # one 2PC write, 6 range-clustered files -> per-file stats skip
    base.repartitionByRange(6, "o_orderkey").write.format(
        "ops_snapshot"
    ).option("path", tbl).mode("append").save()
    cut = int(math.floor(obs.get["hi"] / 3.0))
    return (
        spark.read.format("ops_snapshot")
        .option("path", tbl)
        .load()
        .filter(F.col("o_orderkey") <= cut)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@register(
    "stream_snapshot_sink",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
    description="Streaming WRITES into a snapshot table "
    "(io/snapshot_stream.py:SnapshotStreamWriter — Delta's streaming "
    "sink): orders flows through a file stream source into "
    "writeStream.format('ops_snapshot') with availableNow, every "
    "micro-batch landing as ONE txn-stamped append commit "
    "(txnAppId/batch idempotence, so a replayed batch is a no-op), and "
    "the query aggregates the RESULTING TABLE. The oracle recomputes "
    "from raw orders: a dropped batch, a double-applied replay, or a "
    "torn commit flips the hash. Restart/replay semantics pinned in "
    "test_streaming_extra.py::test_snapshot_stream_writer_sink.",
    tags=("stream", "snapshot", "sink", "exactly-once"),
)
def stream_snapshot_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from ops_spark.io.snapshot_stream import register_snapshot_source
    from ops_spark.io.snapshots import read_snapshot

    src = os.path.join(sf_dir, "orders.parquet")
    digest = hashlib.md5(
        f"{sf_dir}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:10]
    work = os.path.join(tempfile.gettempdir(), f"ops_spark_ssink_{digest}")
    shutil.rmtree(work, ignore_errors=True)
    feed, tbl, ckpt = (
        os.path.join(work, "in"), os.path.join(work, "tbl"),
        os.path.join(work, "ckpt"),
    )

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    base.repartition(4).write.parquet(feed)
    register_snapshot_source(spark)
    schema = spark.read.parquet(feed).schema
    q = (
        spark.readStream.schema(schema).parquet(feed)
        .writeStream.format("ops_snapshot")
        .option("path", tbl)
        .option("txnappid", "stream_snapshot_sink")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        read_snapshot(spark, tbl)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )
