"""Scalar function surface (SURVEY.md §2.8) + generators (§2.8 explode).

Reference surface: the 282 function registrations in
catalyst/analysis/FunctionRegistry.scala — string (stringExpressions.scala,
regexpExpressions.scala), math (mathExpressions.scala), datetime
(datetimeExpressions.scala), conditional (conditionalExpressions.scala,
nullExpressions.scala), JSON (jsonExpressions.scala:345), collection +
higher-order (collectionOperations.scala, higherOrderFunctions.scala:538),
generators explode/posexplode (generators.scala:137 → GenerateExec.scala:58),
hash functions (hash.scala), cast (Cast.scala).

All of these run JVM-side inside whole-stage codegen — zero Python boundary
crossings — which is the point at 100 TB: per-row scalar work is free
relative to scan+shuffle only if it stays in the generated code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.queries.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                          AS uname,
           lower(c_mktsegment)                    AS lseg,
           substr(c_name, 10, 9)                  AS custnum,
           length(c_name)::INT                    AS name_len,
           concat(c_mktsegment, '#', c_name)      AS tagged,
           replace(c_name, 'Customer', 'C')       AS shortname,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS natcode,
           reverse(c_mktsegment)                  AS rseg,
           strpos(c_name, '#')::INT               AS hashpos,
           trim(concat('  ', c_mktsegment, '  ')) AS trimmed,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS xlate
    FROM customer WHERE c_custkey <= 200
    """,
    description="String functions: case, substring, pad, translate, locate.",
    tags=("function", "string"),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 9).alias("custnum"),
        F.length("c_name").cast("int").alias("name_len"),
        F.concat_ws("#", "c_mktsegment", "c_name").alias("tagged"),
        F.regexp_replace("c_name", "Customer", "C").alias("shortname"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("natcode"),
        F.reverse("c_mktsegment").alias("rseg"),
        F.instr("c_name", "#").cast("int").alias("hashpos"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias("trimmed"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("xlate"),
    )


@register(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([0-9]+)', 1)          AS first_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g')    AS devoweled,
           CASE WHEN regexp_matches(p_name, '^part_1')
                THEN 1 ELSE 0 END::INT                    AS is_p1,
           split_part(p_brand, '#', 2)                    AS brand_num
    FROM part WHERE p_partkey <= 300
    """,
    description="Regex: extract, global replace, rlike match, split_part.",
    tags=("function", "string", "regexp"),
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return part.select(
        "p_partkey",
        F.regexp_extract("p_name", r"([0-9]+)", 1).alias("first_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^part_1").cast("int").alias("is_p1"),
        F.split_part(F.col("p_brand"), F.lit("#"), F.lit(2)).alias("brand_num"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 30000), 4)   AS dev,
           CAST(ceil(l_quantity / 7) AS DOUBLE)     AS qbucket,
           CAST(floor(l_discount * 100) AS DOUBLE)  AS disc_pct,
           round(sqrt(l_extendedprice), 6)          AS sqrt_price,
           round(ln(l_extendedprice + 1), 6)        AS ln_price,
           round(log10(l_extendedprice + 1), 6)     AS log10_price,
           round(pow(1 + l_tax, 2), 6)              AS tax_sq,
           round(exp(l_discount), 6)                AS exp_disc,
           CAST(sign(l_quantity - 25) AS DOUBLE)    AS qty_side,
           CAST(l_orderkey % 97 AS BIGINT)          AS key_mod,
           greatest(l_tax, l_discount)              AS max_rate,
           least(l_tax, l_discount)                 AS min_rate
    FROM lineitem WHERE l_orderkey <= 500
    """,
    description="Math functions: abs/ceil/floor/sqrt/ln/log10/pow/exp/sign/mod.",
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_extendedprice") - 30000), 4).alias("dev"),
        F.ceil(F.col("l_quantity") / 7).cast("double").alias("qbucket"),
        F.floor(F.col("l_discount") * 100).cast("double").alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_price"),
        F.round(F.pow(F.col("l_tax") + 1, 2), 6).alias("tax_sq"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.signum(F.col("l_quantity") - 25).cast("double").alias("qty_side"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS yr,
           CAST(month(o_orderdate) AS INT)   AS mo,
           CAST(day(o_orderdate) AS INT)     AS dy,
           CAST(quarter(o_orderdate) AS INT) AS qtr,
           date_trunc('month', o_orderdate)  AS month_start,
           CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)         AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT)          AS epoch_s,
           date_diff('day', o_orderdate,
                     TIMESTAMP '2002-01-01 00:00:00')::INT AS days_to_2002
    FROM orders WHERE o_orderkey <= 500
    """,
    description="Datetime: extract fields, trunc, add, last_day, epoch, diff.",
    tags=("function", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofmonth("o_orderdate").cast("int").alias("dy"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        # DATE outputs are stringified: pandas renders Spark DateType as
        # datetime.date but DuckDB DATE as Timestamp — strings compare stably.
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("string").alias("due_date"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("string").alias("month_end"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("epoch_s"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_2002"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END                                AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN')       AS status_x,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END::INT                        AS urgent,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS f_price
    FROM orders WHERE o_orderkey <= 500
    """,
    description="CASE WHEN / nullif / coalesce / IN-list / implicit NULL branch.",
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_x"
        ),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .cast("int")
        .alias("urgent"),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).alias("f_price"),
    )


@register(
    "fn_cast",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS INT)                         AS qty_int,
           CAST(l_extendedprice AS DECIMAL(12,2))::VARCHAR AS price_dec,
           CAST(l_orderkey AS VARCHAR)                     AS key_str,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR)       AS ship_day,
           CAST(l_quantity > 25 AS INT)                    AS is_bulk
    FROM lineitem WHERE l_orderkey <= 300
    """,
    description="Cast matrix: double→int/decimal-string, ts→date→string, bool→int.",
    tags=("function", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Cast.scala:1371's conversion matrix via the public API. Decimal output
    # is cast to string so both engines pin the same scale rendering.
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day"),
        (F.col("l_quantity") > 25).cast("int").alias("is_bulk"),
    )


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')           AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing
    FROM events WHERE event_id <= 500
    """,
    description="JSON path extraction (get_json_object / from_json kin).",
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # jsonExpressions.scala:345 surface. from_json with an explicit schema is
    # the scalable form (single parse, pushdown-friendly columns); shown here
    # alongside path extraction.
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 500)
    parsed = F.from_json("props", "k INT")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
    )


@register(
    "fn_explode",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 100)
    WHERE word <> ''
    GROUP BY word
    """,
    description="explode(split(...)) word count (GenerateExec).",
    tags=("function", "generator"),
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fn_posexplode",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(unnest(range(len(t))) AS INT) AS pos,
           unnest(t) AS word
    FROM toks
    """,
    description="posexplode: token with position (LATERAL VIEW equivalent).",
    tags=("function", "generator"),
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "word")


@register(
    "fn_higher_order",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(len(t) AS INT)                                   AS n_tokens,
           CAST(len(list_distinct(t)) AS INT)                    AS n_unique,
           CAST(len(list_filter(t, x -> length(x) > 4)) AS INT)  AS n_long,
           CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT) AS total_chars,
           array_to_string(list_transform(t[1:3], x -> upper(x)), '-') AS head3_upper,
           CAST(list_contains(t, 'spark') AS INT)                AS has_spark
    FROM toks
    """,
    description="Higher-order array functions: transform/filter/aggregate/exists.",
    tags=("function", "higher-order", "array"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # higherOrderFunctions.scala:538 (2.4's transform/filter/aggregate/exists)
    # — lambdas evaluate inside codegen, no Python involved.
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = docs.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: x != "").alias("t"),
    )
    return toks.select(
        "doc_id",
        F.size("t").cast("int").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("int").alias("n_unique"),
        F.size(F.filter("t", lambda x: F.length(x) > 4)).cast("int").alias("n_long"),
        F.aggregate(
            "t", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.slice("t", 1, 3), lambda x: F.upper(x)), "-"
        ).alias("head3_upper"),
        F.array_contains("t", "spark").cast("int").alias("has_spark"),
    )


@register(
    "fn_array_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_sort(list_distinct(list_filter(string_split(text, ' '),
                                                 x -> x <> ''))) AS words
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
           words[1]                               AS first_word,
           words[-1]                              AS last_word,
           array_to_string(words[1:5], ',')       AS head5_csv,
           CAST(len(words) AS INT)                AS n
    FROM t
    """,
    description="Array ops: sort_array, element_at, slice, array_join.",
    tags=("function", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = F.sort_array(
        F.array_distinct(F.filter(F.split("text", " "), lambda x: x != ""))
    )
    t = docs.select("doc_id", words.alias("words"))
    return t.select(
        "doc_id",
        F.element_at("words", 1).alias("first_word"),
        F.element_at("words", -1).alias("last_word"),
        # DuckDB's words[1:5] slice is INCLUSIVE (5 elements) — match it.
        F.array_join(F.slice("words", 1, 5), ",").alias("head5_csv"),
        F.size("words").cast("int").alias("n"),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                       AS text_md5,
           sha256(text)                    AS text_sha256,
           length(md5(text || 'salt'))::INT AS salted_len
    FROM documents WHERE doc_id < 100
    """,
    description="Cryptographic hash functions: md5, sha2-256.",
    tags=("function", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.length(F.md5(F.concat(F.col("text"), F.lit("salt"))))
        .cast("int")
        .alias("salted_len"),
    )


@register(
    "fn_levenshtein",
    oracle="""
    SELECT c_custkey,
           levenshtein(c_mktsegment, 'MACHINERY')::INT AS dist_seg,
           levenshtein(c_name, 'Customer#000000042')::INT AS dist_name
    FROM customer WHERE c_custkey <= 200
    """,
    description="Edit distance (levenshtein) against reference strings.",
    tags=("function", "string"),
)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return cust.select(
        "c_custkey",
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("int").alias("dist_seg"),
        F.levenshtein("c_name", F.lit("Customer#000000042")).cast("int").alias("dist_name"),
    )


@register(
    "fn_sequence_agg",
    oracle="""
    SELECT p_partkey, p_size,
           CAST(p_size * (p_size + 1) / 2 AS BIGINT) AS tri
    FROM part WHERE p_partkey <= 300
    """,
    description="sequence() generator + higher-order aggregate (triangular sums).",
    tags=("function", "array", "generator"),
)
def fn_sequence_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sequence(1, n) then fold — the oracle verifies via the closed form.
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    return part.select(
        "p_partkey",
        "p_size",
        F.aggregate(
            F.sequence(F.lit(1), F.col("p_size")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("tri"),
    )


@register(
    "fn_stack_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS val FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nation' AS metric, CAST(s_nationkey AS DOUBLE) AS val
    FROM supplier
    """,
    description="stack() unpivot: wide columns to (metric, value) rows.",
    tags=("function", "generator", "unpivot"),
)
def fn_stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = _t(spark, sf_dir, "supplier")
    return supp.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'acctbal', s_acctbal, 'nation', CAST(s_nationkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


@register(
    "fn_map_ops",
    oracle="""
    SELECT o_orderkey,
           o_totalprice AS price_val,
           CAST(year(o_orderdate) AS BIGINT) AS year_val,
           'price,year' AS keys_csv
    FROM orders WHERE o_orderkey <= 300
    """,
    description="Map type: construction, element_at lookups, sorted key list.",
    tags=("function", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    m = F.map_from_arrays(
        F.array(F.lit("price"), F.lit("year")),
        F.array(F.col("o_totalprice"), F.year("o_orderdate").cast("double")),
    )
    return orders.select(
        "o_orderkey",
        F.element_at(m, "price").alias("price_val"),
        F.element_at(m, "year").cast("bigint").alias("year_val"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
    )


@register(
    "fn_unpivot_native",
    oracle="""
    SELECT p_partkey, 'retail' AS metric, p_retailprice AS val
    FROM part WHERE p_partkey <= 400
    UNION ALL
    SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part WHERE p_partkey <= 400
    """,
    description="Native df.unpivot / melt (Spark 3.4+ Unpivot node — the "
    "relational dual of pivot; reference expresses this only via stack()).",
    tags=("function", "unpivot"),
)
def fn_unpivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    return part.select(
        "p_partkey",
        F.col("p_retailprice").alias("retail"),
        F.col("p_size").cast("double").alias("size"),
    ).unpivot(
        ids=["p_partkey"],
        values=["retail", "size"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / nullif(l_discount, 0.0), 4) AS safe_ratio,
           CAST(l_orderkey + l_linenumber AS BIGINT)           AS safe_add,
           CASE WHEN l_linenumber <= 2 THEN l_linenumber END   AS maybe_elem,
           TRY_CAST(l_returnflag AS DOUBLE)                    AS bad_cast
    FROM lineitem WHERE l_orderkey <= 500
    """,
    description="ANSI-safe try_* family: NULL-on-error division, addition, "
    "element_at past array bounds, and try_cast of non-numeric strings "
    "(error-tolerant ingestion over dirty data — no task-killing exceptions).",
    tags=("function", "ansi", "try"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias("safe_ratio"),
        F.try_add("l_orderkey", "l_linenumber").cast("bigint").alias("safe_add"),
        F.try_element_at(
            F.array(F.lit(1), F.lit(2)), F.col("l_linenumber")
        ).alias("maybe_elem"),
        F.expr("try_cast(l_returnflag AS DOUBLE)").alias("bad_cast"),
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT o_orderkey,
           o_totalprice                    AS v_price,
           o_orderpriority                 AS v_prio,
           CAST(year(o_orderdate) AS INT)  AS v_year
    FROM orders WHERE o_orderkey <= 400
    """,
    description="VARIANT semi-structured type (Spark 4): parse_json round-trip "
    "with typed variant_get extraction — the open-schema column pattern for "
    "ingesting heterogeneous JSON at scale without a fixed schema.",
    tags=("function", "variant", "json"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    v = F.parse_json(
        F.to_json(
            F.struct(
                F.col("o_totalprice").alias("price"),
                F.col("o_orderpriority").alias("prio"),
                F.year("o_orderdate").alias("year"),
            )
        )
    )
    return orders.select(
        "o_orderkey",
        F.variant_get(v, "$.price", "double").alias("v_price"),
        F.variant_get(v, "$.prio", "string").alias("v_prio"),
        F.variant_get(v, "$.year", "int").alias("v_year"),
    )


@register(
    "fn_generators_stack_inline",
    oracle="""
    WITH p AS (SELECT * FROM part WHERE p_partkey <= 300),
    rows AS (
      SELECT 'brand' AS attr, p_brand AS val FROM p
      UNION ALL SELECT 'type', p_type FROM p
      UNION ALL SELECT 'size', CAST(p_size AS VARCHAR) FROM p
      UNION ALL SELECT 'name_head', substr(p_name, 1, 8) FROM p
    )
    SELECT attr, count(*) AS n, CAST(count(DISTINCT val) AS BIGINT) AS n_vals
    FROM rows GROUP BY attr
    """,
    description="stack + inline generators (generators.scala:385,400 → "
    "GenerateExec): wide-to-long unpivot via stack, array-of-struct "
    "flattening via inline — both stay in codegen, no shuffle until the "
    "final aggregate.",
    tags=("function", "generator"),
)
def fn_generators_stack_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    stacked = p.selectExpr(
        "stack(2, 'brand', p_brand, 'type', p_type) AS (attr, val)"
    )
    inlined = p.select(
        F.inline(
            F.array(
                F.struct(
                    F.lit("size").alias("attr"),
                    F.col("p_size").cast("string").alias("val"),
                ),
                F.struct(
                    F.lit("name_head").alias("attr"),
                    F.substring("p_name", 1, 8).alias("val"),
                ),
            )
        )
    )
    return (
        stacked.unionByName(inlined)
        .groupBy("attr")
        .agg(F.count("*").alias("n"), F.countDistinct("val").alias("n_vals"))
    )


@register(
    "fn_json_tuple",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           'STRUCT<k: BIGINT>'               AS inferred_schema
    FROM events WHERE event_id <= 300
    """,
    description="json_tuple multi-path extraction (jsonExpressions.scala "
    "JsonTuple — one parse, N outputs) + schema_of_json inference (the "
    "DDL string you feed from_json when onboarding a new feed).",
    tags=("function", "json", "generator"),
)
def fn_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") <= 300)
    return ev.select(
        "event_id",
        F.json_tuple("props", "k").alias("k_str"),
        F.schema_of_json(F.lit('{"k": 69}')).alias("inferred_schema"),
    )


@register(
    "fn_math_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity), 6)              AS sin_q,
           round(cos(l_discount), 6)              AS cos_d,
           round(atan2(l_quantity, l_linenumber), 6) AS at2,
           round(degrees(l_discount), 6)          AS deg_d,
           round(radians(l_quantity), 6)          AS rad_q,
           to_hex(l_linenumber)                   AS hex_ln,
           CAST(factorial(l_linenumber) AS BIGINT) AS fact_ln
    FROM lineitem WHERE l_orderkey <= 200
    """,
    description="Trigonometric / transcendental surface (mathExpressions"
    ".scala registry :217-271): sin/cos/atan2/degrees/radians plus "
    "hex and factorial — all whole-stage-codegen JVM expressions.",
    tags=("function", "math"),
)
def fn_math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_quantity"), 6).alias("sin_q"),
        F.round(F.cos("l_discount"), 6).alias("cos_d"),
        F.round(F.atan2(F.col("l_quantity"), F.col("l_linenumber")), 6).alias("at2"),
        F.round(F.degrees("l_discount"), 6).alias("deg_d"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
        F.hex(F.col("l_linenumber")).alias("hex_ln"),
        F.factorial(F.col("l_linenumber")).alias("fact_ln"),
    )


@register(
    "fn_datetime_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(dayofweek(o_orderdate) + 1 AS INT)  AS dow,
           CAST(weekofyear(o_orderdate) AS INT)     AS woy,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus3m,
           CAST(make_date(2024, 2, 29) AS VARCHAR)  AS leap_day
    FROM orders WHERE o_orderkey <= 500
    """,
    description="Datetime field extraction + month arithmetic "
    "(datetimeExpressions.scala:1584 kin): dayofweek/weekofyear/"
    "add_months (end-of-month clamping) / make_date. Spark dayofweek is "
    "1=Sunday (oracle shifts DuckDB's 0=Sunday dow); DATE outputs are "
    "stringified on both sides (pandas type drift, see fn_datetime).",
    tags=("function", "datetime"),
)
def fn_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return o.select(
        "o_orderkey",
        F.dayofweek("o_orderdate").alias("dow"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3m"),
        F.make_date(F.lit(2024), F.lit(2), F.lit(29)).cast("string").alias("leap_day"),
    )


@register(
    "fn_decimal_exact",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS dec_sum,
           CAST(min(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS dec_min,
           CAST(max(CAST(l_discount AS DECIMAL(4,2))
                    * CAST(l_tax AS DECIMAL(4,2))) AS VARCHAR) AS dec_prod
    FROM lineitem WHERE l_orderkey <= 2000
    GROUP BY l_returnflag
    """,
    description="Exact DECIMAL arithmetic (DecimalType.scala:43 kin): "
    "fixed-point sum/min and precision-propagating multiply — no float "
    "drift, so the oracle compares digit-for-digit as strings (decimal "
    "render differs by engine; value is what is pinned).",
    tags=("function", "decimal", "types"),
)
def fn_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("dec_sum"),
        F.min(price).cast("string").alias("dec_min"),
        F.max(disc * tax).cast("string").alias("dec_prod"),
    )


@register(
    "fn_string_extra",
    oracle="""
    SELECT n_nationkey,
           repeat(substr(n_name, 1, 2), 3)     AS rep2,
           ascii(n_name)                        AS first_cp,
           chr(65 + (n_nationkey % 26))         AS letter,
           left(n_name, 3)                      AS l3,
           right(n_name, 3)                     AS r3,
           printf('%s-%04d', left(n_name, 2), n_nationkey) AS fmt
    FROM nation
    """,
    description="String surface round 2 (stringExpressions.scala:2153 "
    "kin): repeat/ascii/chr/left/right/format_string.",
    tags=("function", "string"),
)
def fn_string_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.repeat(F.substring("n_name", 1, 2), 3).alias("rep2"),
        F.ascii("n_name").alias("first_cp"),
        F.chr(F.lit(65) + (F.col("n_nationkey") % 26)).alias("letter"),
        F.expr("left(n_name, 3)").alias("l3"),
        F.expr("right(n_name, 3)").alias("r3"),
        F.format_string("%s-%04d", F.expr("left(n_name, 2)"), F.col("n_nationkey")).alias("fmt"),
    )


@register(
    "fn_array_extra",
    oracle="""
    WITH t AS (
      SELECT c_custkey,
             [c_nationkey, c_nationkey + 1, c_custkey % 7] AS a,
             [c_custkey % 7, 99]                           AS b
      FROM customer WHERE c_custkey <= 300
    )
    SELECT c_custkey,
           list_position(a, c_custkey % 7)                  AS pos,
           array_to_string(list_sort(list_distinct(list_concat(a, b))), ',') AS uni,
           array_to_string(flatten([a, b]), ',')            AS flat,
           list_contains(b, 99)                             AS has99
    FROM t
    """,
    description="Array surface round 2 (collectionOperations.scala:3959 "
    "kin): array_position/array_union/flatten/array_contains. "
    "array_union is order-nondeterministic across engines, so both sides "
    "sort it (the VALUE SET is what is pinned). Array results are joined "
    "to csv strings on BOTH sides: the driver's canonicalizer sorts raw "
    "pandas cells and cannot order numpy.ndarray (round-2 red row).",
    tags=("function", "array"),
)
def fn_array_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    a = F.array(
        F.col("c_nationkey").cast("bigint"),
        (F.col("c_nationkey") + 1).cast("bigint"),
        (F.col("c_custkey") % 7),
    )
    b = F.array((F.col("c_custkey") % 7), F.lit(99).cast("bigint"))
    t = c.select("c_custkey", a.alias("a"), b.alias("b"))
    return t.select(
        "c_custkey",
        F.array_position("a", F.col("c_custkey") % 7).alias("pos"),
        F.array_join(F.sort_array(F.array_union("a", "b")), ",").alias("uni"),
        F.array_join(F.flatten(F.array("a", "b")), ",").alias("flat"),
        F.array_contains("b", F.lit(99).cast("bigint")).alias("has99"),
    )


@register(
    "fn_bit_scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(bit_count(o_orderkey) AS INT)        AS popcount,
           xor(o_orderkey, o_custkey)                AS x,
           o_orderkey & 255                          AS low_byte,
           o_orderkey | 1                            AS set_lsb,
           ~o_orderkey                               AS flipped
    FROM orders WHERE o_orderkey <= 1000
    """,
    description="Scalar bitwise surface (bitwiseExpressions kin): "
    "bit_count/popcount, xor, and, or, not — all codegen'd long ops.",
    tags=("function", "bitwise"),
)
def fn_bit_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.bit_count(k).alias("popcount"),
        k.bitwiseXOR(F.col("o_custkey")).alias("x"),
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(1)).alias("set_lsb"),
        F.expr("~o_orderkey").alias("flipped"),
    )


@register(
    "fn_url",
    oracle="""
    SELECT n_nationkey,
           'https' AS proto,
           'shop.example.com' AS host,
           '/nation/' || n_nationkey AS path,
           'q=' || replace(n_name, ' ', '+') AS query,
           replace(n_name, ' ', '+') AS encoded,
           n_name AS decoded
    FROM nation
    """,
    description="URL function surface (stringExpressions ParseUrl kin): "
    "parse_url(PROTOCOL/HOST/PATH/QUERY) + url_encode/url_decode. URLs are "
    "built from fixture columns; the oracle recomputes each part "
    "symbolically (DuckDB has no parse_url). Inputs are restricted to "
    "space-only specials so x-www-form-urlencoded is replace(' ','+') on "
    "both sides.",
    tags=("function", "string", "url"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    url = F.concat(
        F.lit("https://shop.example.com/nation/"),
        F.col("n_nationkey").cast("string"),
        F.lit("?q="),
        F.url_encode(F.col("n_name")),
    )
    return n.select(
        "n_nationkey",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.url_encode(F.col("n_name")).alias("encoded"),
        F.url_decode(F.url_encode(F.col("n_name"))).alias("decoded"),
    )


@register(
    "fn_string_format",
    oracle="""
    WITH b AS (
      SELECT *,
             CAST(round(abs(round(c_acctbal, 2)) * 100) AS BIGINT) AS cents
      FROM customer WHERE c_custkey <= 400
    )
    SELECT c_custkey,
           translate(c_mktsegment, 'AEIOU', 'aeiou')         AS transd,
           upper(substr(c_mktsegment, 1, 1))
             || lower(substr(c_mktsegment, 2))               AS capped,
           substr(c_name, 1, 4) || 'XX' || substr(c_name, 7) AS spliced,
           strpos(c_name, '0')                               AS pos0,
           format('{:,}', cents // 100) || '.'
             || lpad(CAST(cents % 100 AS VARCHAR), 2, '0')   AS fmt_bal
    FROM b
    """,
    description="String surface round 3 (stringExpressions.scala kin): "
    "translate, initcap (single-token input; oracle emulates per-char), "
    "overlay, position/strpos, format_number (grouped thousands over "
    "abs() — DuckDB's fmt rejects ',' on floats, so the oracle composes "
    "sign-free integer cents).",
    tags=("function", "string"),
)
def fn_string_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 400)
    return c.select(
        "c_custkey",
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("transd"),
        F.initcap("c_mktsegment").alias("capped"),
        F.overlay("c_name", F.lit("XX"), F.lit(5), F.lit(2)).alias("spliced"),
        F.expr("position('0' in c_name)").alias("pos0"),
        F.format_number(F.abs(F.round("c_acctbal", 2)), 2).alias("fmt_bal"),
    )


@register(
    "fn_time_interval",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 2 MONTH                AS plus_months,
           o_orderdate + INTERVAL 36 HOUR                AS plus_hours,
           o_orderdate - INTERVAL 90 MINUTE              AS minus_minutes,
           CAST(date_part('dow', o_orderdate) AS INT)    AS dow,
           CAST(date_part('doy', o_orderdate) AS INT)    AS doy
    FROM orders WHERE o_orderkey <= 400
    """,
    description="Interval arithmetic (intervalExpressions / make_interval "
    "kin): timestamp +- month/hour/minute intervals via make_interval and "
    "make_dt_interval, plus dayofweek/dayofyear parts. DuckDB mirrors "
    "with INTERVAL literals; month addition follows the same "
    "end-of-month clamping rule in both engines.",
    tags=("function", "datetime", "interval"),
)
def fn_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    ts = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (ts + F.make_interval(months=F.lit(2))).alias("plus_months"),
        (ts + F.make_dt_interval(hours=F.lit(36))).alias("plus_hours"),
        (ts - F.make_dt_interval(mins=F.lit(90))).alias("minus_minutes"),
        (F.dayofweek(ts) - 1).cast("int").alias("dow"),
        F.dayofyear(ts).cast("int").alias("doy"),
    )


@register(
    "fn_map_higher_order",
    oracle="""
    SELECT o_orderkey,
           'a_x:' || (o_orderkey * 2) || ',b_x:' || (o_custkey * 2) AS doubled,
           CASE
             WHEN o_orderkey % 2 = 0 AND o_custkey % 2 = 0
               THEN 'a:' || o_orderkey || ',b:' || o_custkey
             WHEN o_orderkey % 2 = 0 THEN 'a:' || o_orderkey
             WHEN o_custkey % 2 = 0 THEN 'b:' || o_custkey
             ELSE ''
           END AS evens,
           'a:' || (o_orderkey + o_custkey) AS zipped
    FROM orders WHERE o_orderkey <= 300
    """,
    description="Map higher-order functions (higherOrderFunctions.scala:538 "
    "kin): transform_keys, transform_values, map_filter, map_zip_with. "
    "Maps are serialized to sorted key:value csv on both sides (driver "
    "canonicalizer cannot sort raw dict cells); values are integers so the "
    "engines' number->string rendering agrees.",
    tags=("function", "map", "higher-order"),
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    m = F.map_from_arrays(
        F.array(F.lit("a"), F.lit("b")),
        F.array(F.col("o_orderkey"), F.col("o_custkey")),
    )

    def entries_csv(mp):
        return F.array_join(
            F.sort_array(
                F.transform(
                    F.map_entries(mp),
                    lambda e: F.concat(e.key, F.lit(":"), e.value.cast("string")),
                )
            ),
            ",",
        )

    doubled = F.transform_values(
        F.transform_keys(m, lambda k, v: F.concat(k, F.lit("_x"))),
        lambda k, v: v * 2,
    )
    evens = F.map_filter(m, lambda k, v: v % 2 == 0)
    zipped = F.map_zip_with(
        F.create_map(F.lit("a"), F.col("o_orderkey")),
        F.create_map(F.lit("a"), F.col("o_custkey")),
        lambda k, v1, v2: v1 + v2,
    )
    return orders.select(
        "o_orderkey",
        entries_csv(doubled).alias("doubled"),
        entries_csv(evens).alias("evens"),
        entries_csv(zipped).alias("zipped"),
    )


@register(
    "fn_csv_scalar",
    oracle="""
    WITH src AS (
      SELECT o_orderkey,
             o_orderkey || ',' || o_orderstatus || ',' || o_custkey AS line
      FROM orders WHERE o_orderkey <= 400
    )
    SELECT o_orderkey, line,
           CAST(string_split(line, ',')[1] AS BIGINT) AS k,
           string_split(line, ',')[2] AS status,
           CAST(string_split(line, ',')[3] AS BIGINT) AS cust
    FROM src
    """,
    description="CSV scalar functions (to_csv / from_csv / schema_of_csv, "
    "Spark 3.0+ surface over UnivocityParser): rows serialize to a CSV "
    "line and parse back to typed fields. DuckDB has no scalar CSV parser, "
    "so the oracle recomputes via string_split + casts — same values for "
    "this delimiter-safe projection.",
    tags=("function", "csv"),
)
def fn_csv_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    line = F.to_csv(
        F.struct(
            F.col("o_orderkey"), F.col("o_orderstatus"), F.col("o_custkey")
        )
    )
    parsed = F.from_csv(
        F.col("line"), "k BIGINT, status STRING, cust BIGINT"
    )
    return (
        o.select("o_orderkey", line.alias("line"))
        .withColumn("p", parsed)
        .select(
            "o_orderkey",
            "line",
            F.col("p.k").alias("k"),
            F.col("p.status").alias("status"),
            F.col("p.cust").alias("cust"),
        )
    )


@register(
    "fn_struct_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey AS id,
           upper(o_orderstatus) AS status,
           o_totalprice AS price,
           year(o_orderdate) AS yr
    FROM orders WHERE o_orderkey <= 300
    """,
    description="Nested-struct surgery (Spark 3.1 withField/dropFields + "
    "struct build/flatten): a struct column is assembled, a field is "
    "rewritten in place, another dropped, a third added, then the result "
    "is flattened back out. The oracle is the flat projection — the test "
    "is that nested rewrites preserve values; Catalyst collapses the whole "
    "chain into one Project (no intermediate materialization).",
    tags=("function", "struct"),
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    nested = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("odate"),
        ).alias("s"),
    )
    surgically = nested.withColumn(
        "s",
        F.col("s")
        .withField("status", F.upper(F.col("s.status")))
        .withField("yr", F.year(F.col("s.odate")))
        .dropFields("odate"),
    )
    return surgically.select(
        "o_orderkey",
        F.col("s.id").alias("id"),
        F.col("s.status").alias("status"),
        F.col("s.price").alias("price"),
        F.col("s.yr").alias("yr"),
    )


@register(
    "fn_explode_outer",
    oracle="""
    WITH src AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 = 0 THEN NULL
                  ELSE [n_nationkey, n_regionkey] END AS arr
      FROM nation
    )
    SELECT n_nationkey, CAST(NULL AS BIGINT) AS v FROM src WHERE arr IS NULL
    UNION ALL
    SELECT n_nationkey, unnest(arr) AS v FROM src WHERE arr IS NOT NULL
    """,
    description="explode_outer generator (GenerateExec outer=true): rows "
    "with NULL/empty arrays survive with NULL output instead of vanishing "
    "— the LEFT JOIN of generators. Oracle is the portable two-branch "
    "UNION (DuckDB's unnest drops NULL-array rows like inner explode).",
    tags=("function", "generator"),
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    src = n.select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 3 == 0, F.lit(None)).otherwise(
            F.array(
                F.col("n_nationkey").cast("bigint"),
                F.col("n_regionkey").cast("bigint"),
            )
        ).alias("arr"),
    )
    return src.select("n_nationkey", F.explode_outer("arr").alias("v"))


@register(
    "fn_bround",
    oracle="""
    SELECT o_orderkey,
           round_even(o_totalprice / 1000.0, 1) AS banker,
           round(o_totalprice / 1000.0, 1) AS half_up
    FROM orders WHERE o_orderkey <= 500
    """,
    description="bround (banker's/half-even rounding, DuckDB round_even) "
    "vs plain round side by side — the two rounding modes whose halfway "
    "disagreement motivates this repo's floor-e encoding elsewhere. "
    "Here the inputs are /1000 quotients whose binary doubles never land "
    "exactly on a .05 boundary, so both modes are engine-stable.",
    tags=("function", "math"),
)
def fn_bround(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    q = F.col("o_totalprice") / 1000.0
    return o.select(
        "o_orderkey",
        F.bround(q, 1).alias("banker"),
        F.round(q, 1).alias("half_up"),
    )
