"""Source/sink round-trips + bucketed-join shuffle elimination."""

from __future__ import annotations

from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.io.sinks import (
    roundtrip,
    scratch_dir,
    write_bucketed_table,
    write_partitioned,
)


def test_csv_roundtrip(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").limit(500)
    back = roundtrip(
        orders,
        "csv",
        writer_options={"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss"},
        reader_options={"header": "true", "timestampFormat": "yyyy-MM-dd HH:mm:ss"},
    )
    assert back.count() == 500
    a = orders.agg(F.sum("o_totalprice")).head()[0]
    b = back.agg(F.sum("o_totalprice")).head()[0]
    assert abs(a - b) < 1e-6


def test_json_roundtrip(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    back = roundtrip(cust, "json")
    assert back.count() == cust.count()
    assert back.schema == cust.schema


def test_orc_roundtrip(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").limit(1000)
    back = roundtrip(li, "orc")
    assert back.count() == 1000


def test_text_write_read(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").limit(100)
    path = scratch_dir("text") + "/data"
    docs.write.mode("overwrite").text(path)
    assert spark.read.text(path).count() == 100


def test_partitioned_write_prunes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    path = scratch_dir("part") + "/li"
    write_partitioned(li, path, ["l_returnflag"])
    back = spark.read.parquet(path)
    n_r = back.filter(F.col("l_returnflag") == "R").count()
    assert n_r == li.filter(F.col("l_returnflag") == "R").count()
    # partition pruning: the filtered scan must read only the R directory
    pruned = back.filter(F.col("l_returnflag") == "R")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan or "l_returnflag" in plan


def test_bucketed_join_no_shuffle(spark, sf_dir):
    from ops_spark.plans import plan_summary

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed_table(li, "li_bkt", "l_orderkey")
    write_bucketed_table(orders, "ord_bkt", "o_orderkey")
    joined = spark.table("li_bkt").join(
        spark.table("ord_bkt"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    p = plan_summary(joined)
    assert p.n_shuffle_exchanges == 0, (
        "bucketed-on-key join must not shuffle:\n" + p.text
    )
    assert joined.count() > 0
