"""Streaming operator coverage (SURVEY.md §2.9) under batch-equivalence.

Each query runs a REAL Structured Streaming job (file source → stateful
operators → memory sink, availableNow trigger) and returns the sink table;
the DuckDB oracle is the equivalent batch query — valid because a bounded
stream processed to completion must equal the batch result (inner joins and
aggregations emit everything once the source is exhausted; watermarks only
govern state eviction and late-data drop, which a bounded in-order replay
never triggers).

Reference surface: EventTimeWatermarkExec.scala:88, TimeWindow.scala:30,
StateStoreSave/RestoreExec (statefulOperators.scala:223,277), streaming
dedup (:428), session windows (absent in 2.4 — modern F.session_window),
stream-static and stream-stream joins
(StreamingSymmetricHashJoinExec.scala:126), applyInPandasWithState
(FlatMapGroupsWithStateExec.scala:44 kin), triggers (Triggers.scala),
checkpointing (HDFSMetadataLog.scala).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.queries.registry import register
from ops_spark.streaming import events_stream, run_bounded


@register(
    "stream_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    description="Streaming tumbling-window aggregation (watermark + complete mode).",
    tags=("streaming", "window", "watermark"),
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    out = run_bounded(agg, output_mode="complete")
    return out.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "total"
    )


@register(
    "stream_sliding_window",
    oracle="""
    WITH starts AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS w0, ts, value FROM events
    ), contrib AS (
      SELECT w0 AS window_start, value FROM starts
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS window_start, value FROM starts
    )
    SELECT window_start, count(*) AS n, round(sum(value), 4) AS total
    FROM contrib
    GROUP BY window_start
    """,
    description="Streaming sliding windows (1h window, 30m slide): each event in 2 windows.",
    tags=("streaming", "window"),
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    out = run_bounded(agg, output_mode="complete")
    return out.select(F.col("window.start").alias("window_start"), "n", "total")


@register(
    "stream_session_window",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 1 HOUR
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 1 HOUR AS session_end,
           count(*) AS n, round(sum(value), 4) AS total
    FROM numbered
    GROUP BY user_id, sid
    """,
    description="Streaming session windows (1h gap) — absent in the reference (2.4).",
    tags=("streaming", "window", "session"),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F.session_window: gap-merged event-time sessions, the Spark 3.2+
    # operator the reference could only express via flatMapGroupsWithState
    # (SURVEY §2.9). Oracle replays the lag+cumsum batch equivalent.
    ev = events_stream(spark, sf_dir).filter(F.col("user_id") <= 100)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "1 hour"), "user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    out = run_bounded(agg, output_mode="complete")
    return out.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n",
        "total",
    )


@register(
    "stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n FROM (
      SELECT DISTINCT ON (event_id) event_id, event_type FROM events
      ORDER BY event_id
    ) GROUP BY event_type
    """,
    description="Streaming deduplication on event_id (stateful, watermark-scoped).",
    tags=("streaming", "dedup"),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # StreamingDeduplicateExec kin (reference statefulOperators.scala:428):
    # state = seen event_ids, GC'd past the watermark. event_ids are unique
    # in the fixture so dedup is identity — the mechanism (stateful
    # operator + state store) is what's exercised; the post-sink batch agg
    # keeps the oracle comparison compact.
    ev = events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    out = run_bounded(deduped.select("event_id", "event_type"), "append")
    return out.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n, round(sum(value), 4) AS total
    FROM events JOIN customer ON user_id = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY c_mktsegment
    """,
    description="Stream-static join (streaming fact × broadcast dimension).",
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Stream-static join: the static side is re-read per micro-batch and
    # broadcast — no state required (reference planned these through the
    # same StreamingSymmetricHashJoin machinery only for stream-stream).
    ev = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    cust = load_table(spark, sf_dir, "customer")
    joined = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey
    ).select("c_mktsegment", "value")
    agg = joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total")
    )
    out = run_bounded(agg, output_mode="complete")
    return out


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.user_id, count(*) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    GROUP BY p.user_id
    """,
    description="Stream-stream interval join: clicks within 1h before each purchase.",
    tags=("streaming", "join", "stream-stream"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # StreamingSymmetricHashJoinExec kin (reference :126): both sides
    # buffered in state, matches emitted as rows arrive; the time-interval
    # condition + watermarks bound state. Inner join on a bounded source
    # emits exactly the batch-join result.
    purchases = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    out = run_bounded(joined.select(F.col("p_user").alias("user_id")), "append")
    return out.groupBy("user_id").agg(F.count("*").alias("n_pairs"))


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS total_value,
           max(value) AS max_value
    FROM events WHERE user_id <= 200
    GROUP BY user_id
    """,
    description="Custom stateful operator: per-user running totals (applyInPandasWithState).",
    tags=("streaming", "stateful", "pandas-udf"),
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.streaming.stateful import user_totals_stateful

    ev = events_stream(spark, sf_dir).filter(F.col("user_id") <= 200)
    out = run_bounded(user_totals_stateful(ev), output_mode="update")
    # update-mode emits one row per (user, batch); keep the final state per
    # user (single-batch source → already final, max() is a no-op guard).
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "stream_stateful_rocksdb",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), 4) AS total_value,
           max(value) AS max_value
    FROM events WHERE user_id <= 200
    GROUP BY user_id
    """,
    description="Custom stateful operator on the RocksDB state store "
    "provider (the 100 TB posture: per-key state spills to local RocksDB "
    "+ changelog checkpoint instead of being bounded by executor heap; "
    "reference HDFSBackedStateStoreProvider.scala:73 is the heap-bound "
    "ancestor).",
    tags=("streaming", "stateful", "pandas-udf", "rocksdb"),
)
def stream_stateful_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.streaming.stateful import user_totals_stateful

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        ev = events_stream(spark, sf_dir).filter(F.col("user_id") <= 200)
        out = run_bounded(user_totals_stateful(ev), output_mode="update")
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("total_value").alias("total_value"),
        F.max("max_value").alias("max_value"),
    )


@register(
    "stream_global_limit",
    oracle="""
    SELECT CAST(least(count(*), 500) AS BIGINT) AS n FROM events
    """,
    description="Streaming global limit (StreamingGlobalLimitExec kin): "
    "limit N on an append-mode stream admits rows across micro-batches "
    "until the running count reaches N; state = one counter.",
    tags=("streaming", "limit"),
)
def stream_global_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Which 500 event_ids are admitted depends on batch order, so the
    # stable observable is the admitted-row count.
    ev = events_stream(spark, sf_dir)
    out = run_bounded(ev.limit(500).select("event_id"), "append")
    return out.agg(F.count("*").alias("n"))


@register(
    "x_stream_lsh_dedup",
    oracle=None,  # MinHash internals aren't oracle-SQL-expressible; the
    # streaming==batch-LSH pair-set equality is pytest-pinned instead
    # (tests/test_streaming_extra.py), and the driver records rows-only.
    description="STREAMING MinHash-LSH near-dup detection "
    "(streaming/lsh_dedup.py): per-row signatures via mapInPandas (no "
    "shuffle), then applyInPandasWithState keyed by (band, bucket) — "
    "state holds each bucket's signatures and an arriving doc emits a "
    "candidate pair per stored doc with signature agreement >= 0.8. The "
    "ingest-time form of llm_minhash_lsh_dedup; pair set pinned equal to "
    "the batch LSH candidates on the same corpus.",
    tags=("streaming", "llm", "dedup", "stateful", "pandas-udf"),
)
def x_stream_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.streaming import documents_stream
    from ops_spark.streaming.lsh_dedup import streaming_lsh_dedup

    docs = documents_stream(spark, sf_dir)
    # bucket-keyed state is high-cardinality (bands x corpus), unlike the
    # fixture joins' few-key state: more store partitions = more parallel
    # Python group processing, and the per-store open/commit overhead is
    # amortized by real work here. Sized to the session's parallelism
    # instead of a constant (r12; measured at 32 cores: 4 parts 13.5 s,
    # 8 parts 8.2 s, 16 parts 5.1 s, 32 parts 4.7 s — the stateful pandas
    # stage is Python-CPU-bound, so stores == cores keeps every core busy
    # at any core count; the few-key fixture joins keep 4, where 32
    # stores measured 2.9x SLOWER from per-store open/commit overhead).
    out = run_bounded(
        streaming_lsh_dedup(docs),
        "append",
        state_partitions=max(4, spark.sparkContext.defaultParallelism),
    )
    # one emission per co-bucketed band -> distinct; agreement is a pure
    # function of the pair so it never forks a row
    return out.select("id_a", "id_b", "agreement").distinct()


@register(
    "stream_fasttext_filter",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id, lang,
             list_concat(t,
               CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])
                 ELSE []::VARCHAR[] END) AS fs
      FROM toks
    ), scored AS (
      SELECT doc_id, lang,
             CAST(coalesce(list_sum(list_transform(fs, f ->
               (('0x' || substr(md5('w#' || CAST(
                   (('0x' || substr(md5(f), 1, 15))::BIGINT % 262144)
                 AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000
             )), 0) AS BIGINT) AS w
      FROM feats
    )
    SELECT lang, count(*) AS n_kept, CAST(sum(w) AS BIGINT) AS sum_units
    FROM scored WHERE w > 0
    GROUP BY lang
    """,
    description="Streaming model-based quality filter: the fastText-style "
    "hashed-BoW classifier (operators/text.py:hashed_bow_score) applied "
    "INSIDE the micro-batch pipeline — a stateless whole-stage-codegen "
    "map, so it rides the stream with zero state and zero extra shuffle "
    "(the ingest-time slot where DCLM-style pipelines drop low-quality "
    "docs before anything stateful sees them). Post-sink batch aggregate "
    "keeps the oracle comparison compact.",
    tags=("streaming", "llm", "quality", "classifier"),
)
def stream_fasttext_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.text import hashed_bow_score
    from ops_spark.streaming import documents_stream

    docs = documents_stream(spark, sf_dir)
    scored = hashed_bow_score(docs, extra_cols=("lang",))
    kept = scored.filter(F.col("keep")).select("doc_id", "lang", "w_sum_units")
    out = run_bounded(kept, "append")
    return out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("w_sum_units").cast("bigint").alias("sum_units"),
    )
