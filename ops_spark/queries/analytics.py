"""Warehouse / product-analytics queries wiring ops_spark.operators.analytics
into the conformance registry: SCD2 merge, funnel, cohort retention,
histogram profiling, Z-order layout keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.operators import analytics as A
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "an_scd2_merge",
    oracle="""
    WITH cur AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer WHERE c_custkey <= 600
    ), upd AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 5 = 0 THEN 'WEB' ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 10 ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey <= 700
    )
    SELECT c_custkey, c_mktsegment, c_acctbal,
           '2024-01-01' AS valid_from, CAST(NULL AS VARCHAR) AS valid_to
    FROM cur WHERE NOT (c_custkey % 3 = 0 OR c_custkey % 5 = 0)
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           '2024-01-01', '2024-06-01'
    FROM cur WHERE c_custkey % 3 = 0 OR c_custkey % 5 = 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal,
           '2024-06-01', CAST(NULL AS VARCHAR)
    FROM upd WHERE c_custkey % 3 = 0 OR c_custkey % 5 = 0 OR c_custkey > 600
    """,
    description="SCD type-2 merge (operators/analytics.py:scd2_merge): "
    "changed open rows close at the update timestamp and re-version; new "
    "keys insert. One full-outer equi join + union — a single shuffle by "
    "business key. The oracle enumerates the same three branches directly "
    "from the synthetic change pattern (%3 balance bump, %5 segment flip, "
    "keys 601-700 brand-new).",
    tags=("analytics", "scd", "custom-operator"),
)
def an_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    current = cust.filter(F.col("c_custkey") <= 600).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("2024-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    updates = cust.filter(F.col("c_custkey") <= 700).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit("WEB"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        F.when(F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + 10)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
        F.lit("2024-06-01").cast("date").alias("update_ts"),
    )
    merged = A.scd2_merge(
        current, updates, ["c_custkey"], ["c_mktsegment", "c_acctbal"], "update_ts"
    )
    # ISO strings for the driver canonicalizer: literal DATEs round-trip as
    # pandas Timestamp from DuckDB but datetime.date from Spark, which
    # stringify differently.
    return merged.withColumn(
        "valid_from", F.date_format("valid_from", "yyyy-MM-dd")
    ).withColumn("valid_to", F.date_format("valid_to", "yyyy-MM-dd"))


@register(
    "an_funnel",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t_1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, min(e.ts) AS t_2
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t_1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), t3 AS (
      SELECT e.user_id, min(e.ts) AS t_3
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t_2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_step1,
           CAST((SELECT count(*) FROM t2) AS BIGINT) AS n_step2,
           CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_step3,
           round(CAST((SELECT count(*) FROM t3) AS DOUBLE)
                 / (SELECT count(*) FROM t1), 4) AS conversion
    """,
    description="Ordered 3-step funnel view→click→purchase "
    "(operators/analytics.py:funnel_steps): per-user earliest step times "
    "computed as chained agg→equi-join stages on a shrinking user "
    "frontier — no per-user sort of the event log.",
    tags=("analytics", "funnel", "custom-operator"),
)
def an_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = A.funnel_steps(ev, ["view", "click", "purchase"])
    return f.agg(
        F.count("t_1").cast("bigint").alias("n_step1"),
        F.count("t_2").cast("bigint").alias("n_step2"),
        F.count("t_3").cast("bigint").alias("n_step3"),
        F.round(
            F.count("t_3").cast("double") / F.count("t_1"), 4
        ).alias("conversion"),
    )


@register(
    "an_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(date_trunc('week', ts)) AS cohort
      FROM events GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
    )
    SELECT f.cohort,
           CAST(floor(date_diff('day', f.cohort, a.p) / 7.0) AS BIGINT)
             AS periods_since,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    description="Weekly cohort retention matrix "
    "(operators/analytics.py:cohort_retention): first-seen week per user, "
    "then distinct-user counts per (cohort, weeks-since). Two map-side "
    "combinable aggregations + one equi join.",
    tags=("analytics", "retention", "custom-operator"),
)
def an_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return A.cohort_retention(ev, period="week")


@register(
    "an_histogram",
    oracle="""
    SELECT CASE WHEN value < 0.0 THEN 0
                WHEN value >= 500.0 THEN 26
                ELSE LEAST(CAST(floor(value / 20.0) AS INT) + 1, 25) END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS vmin, max(value) AS vmax
    FROM events GROUP BY 1
    """,
    description="Equi-width numeric histogram over events.value "
    "(operators/analytics.py:numeric_histogram): 25 bins on [0,500) with "
    "under/overflow buckets. One codegen bucket expression + one groupBy; "
    "the explicit floor formula (not width_bucket) keeps the oracle "
    "bit-exact.",
    tags=("analytics", "profiling"),
)
def an_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    out = A.numeric_histogram(ev, "value", 0.0, 500.0, 25)
    return out.select("bucket", F.col("n").cast("bigint").alias("n"), "vmin", "vmax")


@register(
    "an_zorder_key",
    oracle=f"""
    SELECT o_orderkey,
           {A.zorder_key_sql('(o_custkey % 1024)',
                             'CAST(floor(o_totalprice / 500.0) AS INT)')} AS zval
    FROM orders WHERE o_orderkey <= 2000
    """,
    description="Z-order (Morton) layout key over (customer, price-bucket) "
    "(operators/analytics.py:zorder_key): bit interleaving as pure codegen. "
    "Range-partitioning by zval before a write co-locates rows close in "
    "BOTH dimensions so parquet min/max stats prune on either predicate — "
    "the OPTIMIZE ZORDER BY layout trick without a table format.",
    tags=("analytics", "layout", "custom-operator"),
)
def an_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    z = A.zorder_key(
        (F.col("o_custkey") % 1024).cast("int"),
        F.floor(F.col("o_totalprice") / 500.0).cast("int"),
    )
    return o.select("o_orderkey", z.alias("zval"))


@register(
    "an_quality_checks",
    oracle="""
    WITH t AS (SELECT count(*) AS n FROM orders),
    v1 AS (SELECT count(*) AS v FROM orders WHERE o_custkey IS NULL),
    v2 AS (SELECT count(*) AS v FROM orders
           WHERE o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 1000000),
    v3 AS (SELECT count(*) AS v FROM orders
           WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F', 'O', 'P')),
    v4 AS (SELECT CAST(coalesce(sum(c - 1), 0) AS BIGINT) AS v
           FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey
                 HAVING count(*) > 1)),
    v5 AS (SELECT count(*) AS v FROM orders o
           WHERE o.o_custkey IS NOT NULL
             AND NOT EXISTS (SELECT 1 FROM customer c
                             WHERE c.c_custkey = o.o_custkey))
    SELECT * FROM (
      SELECT 'not_null(o_custkey)' AS rule, v1.v AS violations, t.n AS n_rows,
             v1.v = 0 AS passed FROM v1, t
      UNION ALL
      SELECT 'in_range(o_totalprice,0,1000000)', v2.v, t.n, v2.v = 0 FROM v2, t
      UNION ALL
      SELECT 'one_of(o_orderstatus)', v3.v, t.n, v3.v = 0 FROM v3, t
      UNION ALL
      SELECT 'unique(o_orderkey)', v4.v, t.n, v4.v = 0 FROM v4, t
      UNION ALL
      SELECT 'foreign_key(o_custkey)', v5.v, t.n, v5.v = 0 FROM v5, t
    )
    """,
    description="Deequ-lite data-quality report (operators/quality.py): "
    "five constraints — null check, range, domain, key uniqueness, and "
    "referential integrity against customer — where every row-level rule "
    "rides ONE aggregation pass over one scan; uniqueness adds one "
    "groupBy, the FK check one anti join. The rule names are fixed "
    "strings, so the report is oracle-hashable.",
    tags=("analytics", "quality", "custom-operator"),
)
def an_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators import quality as Qc

    o = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return Qc.check_constraints(
        o,
        row_rules=[
            Qc.not_null("o_custkey"),
            Qc.in_range("o_totalprice", 0, 1000000),
            Qc.one_of("o_orderstatus", ["F", "O", "P"]),
        ],
        unique=[["o_orderkey"]],
        foreign_keys=[("o_custkey", cust, "c_custkey")],
    )


@register(
    "an_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), t AS (
      SELECT user_id, ts AS touch_ts, event_type AS touch_type
      FROM events WHERE event_type IN ('view', 'click')
    )
    SELECT p.event_id, p.user_id, t.touch_type,
           CAST(floor(epoch(p.ts)) AS BIGINT)
             - CAST(floor(epoch(t.touch_ts)) AS BIGINT) AS gap_s
    FROM p ASOF LEFT JOIN t
      ON p.user_id = t.user_id AND p.ts >= t.touch_ts
    """,
    description="Last-touch marketing attribution: each purchase joins the "
    "most recent prior view/click per user via the as-of operator "
    "(operators/asof.py — union + ONE per-user window pass, an equi-join's "
    "shuffle, no nested loop). The oracle is DuckDB's native ASOF LEFT "
    "JOIN — two independent as-of implementations agreeing. gap uses "
    "floor-epoch seconds (unix_timestamp truncates; a bare BIGINT cast in "
    "the oracle would round).",
    tags=("analytics", "attribution", "asof", "custom-operator"),
)
def an_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "ts",
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("touch_ts"),
    )
    j = asof_join(purchases, touches, on="ts", by="user_id")
    return j.select(
        "event_id",
        "user_id",
        "touch_type",
        (F.unix_timestamp("ts") - F.unix_timestamp("touch_ts"))
        .cast("bigint")
        .alias("gap_s"),
    )


@register(
    "an_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id % 2 AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), v AS (
      SELECT variant, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(converted) AS BIGINT) AS conv
      FROM u GROUP BY variant
    ), w AS (
      SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
             max(CASE WHEN variant = 0 THEN conv END) AS c0,
             max(CASE WHEN variant = 1 THEN n END) AS n1,
             max(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM v
    )
    SELECT n0, c0, n1, c1,
      CAST(floor(
        (CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
        / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
               * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
               * (1.0 / n0 + 1.0 / n1))
        * 10000.0 + 0.5) AS BIGINT) AS z_e4
    FROM w
    """,
    description="A/B experiment readout: users split by id parity, "
    "conversion = any purchase, pooled two-proportion z statistic in "
    "floor-e4 units (+,*,/,sqrt only — IEEE-deterministic). Two "
    "aggregations + a 1-row pivot; at any scale the heavy work is the "
    "per-user conversion rollup, map-side combinable.",
    tags=("analytics", "experiment"),
)
def an_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    v = per_user.groupBy((F.col("user_id") % 2).alias("variant")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("conv"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p0 - p1) / F.sqrt(
        pp * (1.0 - pp) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        F.floor(z * 10000.0 + 0.5).cast("bigint").alias("z_e4"),
    )


@register(
    "an_spatial_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             (('0x' || substr(md5(c_custkey || ':lat'), 1, 6))::BIGINT % 12000)
               / 100.0 - 60.0 AS lat,
             (('0x' || substr(md5(c_custkey || ':lon'), 1, 6))::BIGINT % 36000)
               / 100.0 - 180.0 AS lon
      FROM customer
    )
    SELECT a.id AS id_a, b.id AS id_b,
      CAST(floor(
        sqrt(
          ((b.lon - a.lon)
           * (1.0 - (((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))) / 2.0
                  + (((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))) / 24.0)
           * 111.32) * ((b.lon - a.lon)
           * (1.0 - (((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * (((a.lat + b.lat) / 2.0) * (3.141592653589793 / 180.0))) / 2.0
                  + (((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))
                     * ((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))) / 24.0)
           * 111.32)
          + ((b.lat - a.lat) * 111.32) * ((b.lat - a.lat) * 111.32)
        ) * 1000000.0 + 0.5) AS BIGINT) AS dist_e6
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE sqrt(
        pow((b.lon - a.lon)
            * (1.0 - pow((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0), 2) / 2.0
                   + pow((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0), 4) / 24.0)
            * 111.32, 2)
        + pow((b.lat - a.lat) * 111.32, 2)) <= 200.0
    """,
    description="Spatial self-join within 200 km (operators/geo.py): grid "
    "blocking with cell edge >= radius guarantees every qualifying pair "
    "shares one of 9 probed cells — recall exactly 1, verified because "
    "the ORACLE is the brute-force all-pairs filter with the same "
    "sqrt-only equirectangular distance (Taylor cos — no libm trig). "
    "Candidates are density-bounded equi joins, never |df|².",
    tags=("analytics", "spatial", "custom-operator"),
)
def an_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.geo import spatial_self_pairs

    cust = _t(spark, sf_dir, "customer")
    out = spatial_self_pairs(_spatial_pts(cust), "id", "lat", "lon", radius_km=200.0)
    return out.select(
        "id_a",
        "id_b",
        F.floor(F.col("dist_km") * 1000000.0 + 0.5).cast("bigint").alias("dist_e6"),
    )


def _spatial_pts(cust: DataFrame) -> DataFrame:
    """Deterministic synthetic (id, lat, lon) points hashed from custkeys
    (shared by the an_spatial_join / geo_* query family)."""
    return cust.select(
        F.col("c_custkey").alias("id"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("c_custkey"), F.lit(":lat"))), 1, 6),
                16, 10,
            ).cast("bigint") % 12000 / 100.0 - 60.0
        ).alias("lat"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("c_custkey"), F.lit(":lon"))), 1, 6),
                16, 10,
            ).cast("bigint") % 36000 / 100.0 - 180.0
        ).alias("lon"),
    )


# The exact arithmetic shape of operators/geo.equirect_km (Taylor cos with
# explicit multiplications, sqrt-only) so DuckDB reproduces Spark's doubles
# bit-for-bit — pow() would round differently.
_M = "((a.lat + b.lat) / 2.0 * (3.141592653589793 / 180.0))"
_COS = f"(1.0 - ({_M} * {_M}) / 2.0 + ({_M} * {_M} * {_M} * {_M}) / 24.0)"
_DX = f"((b.lon - a.lon) * {_COS} * 111.32)"
_DY = "((b.lat - a.lat) * 111.32)"
_DIST = f"sqrt({_DX} * {_DX} + {_DY} * {_DY})"
_PTS_SQL = """
    SELECT c_custkey AS id,
           (('0x' || substr(md5(c_custkey || ':lat'), 1, 6))::BIGINT % 12000)
             / 100.0 - 60.0 AS lat,
           (('0x' || substr(md5(c_custkey || ':lon'), 1, 6))::BIGINT % 36000)
             / 100.0 - 180.0 AS lon
    FROM customer
"""


@register(
    "geo_radius_count",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    d AS (
      SELECT a.id AS id, b.id AS neighbor
      FROM pts a JOIN pts b ON a.id <> b.id
      WHERE {_DIST} <= 200.0
    ),
    c AS (SELECT id, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY id)
    SELECT p.id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_neighbors
    FROM pts p LEFT JOIN c ON p.id = c.id
    """,
    description="Per-point neighbor COUNT within 200 km — the bounded-"
    "output mode of the spatial join (operators/geo.py:"
    "spatial_neighbor_counts): one row per point instead of the "
    "quadratic pair set (328M pair rows at 10M events in SCALE.md), for "
    "callers who want density, not pairs. Pairs exist only transiently "
    "inside the density-bounded grid-blocked candidate join; the count "
    "aggregation is map-side combinable. Oracle = brute-force all-pairs "
    "count with the identical sqrt-only Taylor distance.",
    tags=("analytics", "spatial", "custom-operator"),
)
def geo_radius_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.geo import spatial_neighbor_counts

    cust = _t(spark, sf_dir, "customer")
    return spatial_neighbor_counts(
        _spatial_pts(cust), "id", "lat", "lon", radius_km=200.0
    )


@register(
    "geo_nearest_hub",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    hubs AS (SELECT * FROM pts WHERE id % 500 = 0),
    d AS (
      SELECT a.id AS id, b.id AS neighbor, {_DIST} AS dist
      FROM pts a JOIN hubs b ON a.id <> b.id
      WHERE {_DIST} <= 800.0
    ),
    r AS (
      SELECT id, neighbor,
             CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT) AS dist_e6,
             CAST(row_number() OVER (PARTITION BY id ORDER BY dist, neighbor)
                  AS INT) AS rank
      FROM d
    )
    SELECT id, neighbor, dist_e6, rank FROM r WHERE rank <= 3
    """,
    description="BIPARTITE nearest-neighbor enrichment: every point's 3 "
    "nearest 'hub' points (the 1-in-500 subset) within 800 km "
    "(operators/geo.py:spatial_nearest_join) — the events-to-nearest-"
    "store/tower shape. The hub side is a small dimension, so Catalyst "
    "broadcasts the candidate join and the only wide op is the per-point "
    "top-k window over hub-density-bounded input. Oracle = brute-force "
    "point x hub ranking with the identical sqrt-only Taylor distance.",
    tags=("analytics", "spatial", "custom-operator"),
)
def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.geo import spatial_nearest_join

    pts = _spatial_pts(_t(spark, sf_dir, "customer"))
    hubs = pts.filter(F.col("id") % 500 == 0)
    out = spatial_nearest_join(
        pts, hubs, "id", "lat", "lon", radius_km=800.0, k=3
    )
    return out.select(
        "id",
        "neighbor",
        F.floor(F.col("dist_km") * 1000000.0 + 0.5).cast("bigint").alias("dist_e6"),
        "rank",
    )


@register(
    "geo_radius_topk",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    d AS (
      SELECT a.id AS id, b.id AS neighbor, {_DIST} AS dist
      FROM pts a JOIN pts b ON a.id <> b.id
      WHERE {_DIST} <= 200.0
    ),
    r AS (
      SELECT id, neighbor,
             CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT) AS dist_e6,
             CAST(row_number() OVER (PARTITION BY id ORDER BY dist, neighbor)
                  AS INT) AS rank
      FROM d
    )
    SELECT id, neighbor, dist_e6, rank FROM r WHERE rank <= 5
    """,
    description="Per-point 5 nearest neighbors within 200 km — the top-k "
    "bounded-output mode (operators/geo.py:spatial_topk_neighbors): ≤ k "
    "rows per point regardless of local density, ranked by (distance, "
    "neighbor id) inside a per-point window whose partitions are one "
    "point's neighbor list (density-bounded, never global). Oracle = "
    "brute-force all-pairs ranked with the identical distance arithmetic.",
    tags=("analytics", "spatial", "custom-operator"),
)
def geo_radius_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.geo import spatial_topk_neighbors

    cust = _t(spark, sf_dir, "customer")
    out = spatial_topk_neighbors(
        _spatial_pts(cust), "id", "lat", "lon", radius_km=200.0, k=5
    )
    return out.select(
        "id",
        "neighbor",
        F.floor(F.col("dist_km") * 1000000.0 + 0.5).cast("bigint").alias("dist_e6"),
        "rank",
    )


@register(
    "an_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY l_suppkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(min(c) AS BIGINT) AS min_rows,
           CAST(max(c) AS BIGINT) AS max_rows,
           CAST(floor(avg(c) * 100.0 + 0.5) AS BIGINT) AS avg_rows_e2,
           CAST(quantile_disc(c, 0.5) AS BIGINT) AS p50_rows,
           CAST(quantile_disc(c, 0.99) AS BIGINT) AS p99_rows,
           CAST(floor(CAST(max(c) AS DOUBLE) / avg(c) * 100.0 + 0.5) AS BIGINT)
             AS skew_factor_e2
    FROM per_key
    """,
    description="Join-key skew diagnostic for lineitem.l_suppkey: per-key "
    "row-count distribution (min/max/avg/p50/p99) plus max/avg skew "
    "factor — the pre-flight report that decides broadcast vs salting vs "
    "AQE skew-split before a 100 TB join. Two aggregations (per-key count "
    "is map-side combinable; the summary is 1 row). percentile_disc picks "
    "actual data values, exact on both engines.",
    tags=("analytics", "skew", "diagnostics"),
)
def an_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count("*").alias("c"))
    return per_key.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.min("c").cast("bigint").alias("min_rows"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.floor(F.avg("c") * 100.0 + 0.5).cast("bigint").alias("avg_rows_e2"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("p50_rows"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY c)")
        .cast("bigint")
        .alias("p99_rows"),
        F.floor(F.max("c").cast("double") / F.avg("c") * 100.0 + 0.5)
        .cast("bigint")
        .alias("skew_factor_e2"),
    )
