"""Scala/Java UDF + UDAF registration through the PySpark surface.

Closes the "Python-first, JVM UDF path untested" gap (reference:
sql/core/src/main/scala/org/apache/spark/sql/expressions/udaf.scala:32,
UDFRegistration.scala): the image ships a full JDK, so these tests compile a
real Java UDF1 / UserDefinedAggregateFunction at test time, ship it with
ADD JAR, and register via spark.udf.registerJavaFunction / registerJavaUDAF
— the exact workflow a JVM-side user of the engine would follow. Skips only
if javac is genuinely absent.
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

PYSPARK_JARS = "/root/.pyenv/versions/3.11.7/lib/python3.11/site-packages/pyspark/jars"

UDF1_SRC = """
import org.apache.spark.sql.api.java.UDF1;
public class PlusTenUdf implements UDF1<Long, Long> {
    @Override public Long call(Long x) { return x == null ? null : x + 10; }
}
"""

UDAF_SRC = """
import org.apache.spark.sql.Row;
import org.apache.spark.sql.expressions.MutableAggregationBuffer;
import org.apache.spark.sql.expressions.UserDefinedAggregateFunction;
import org.apache.spark.sql.types.DataType;
import org.apache.spark.sql.types.DataTypes;
import org.apache.spark.sql.types.StructType;

public class SumTimesTwoUdaf extends UserDefinedAggregateFunction {
    @Override public StructType inputSchema() { return new StructType().add("v", DataTypes.LongType); }
    @Override public StructType bufferSchema() { return new StructType().add("s", DataTypes.LongType); }
    @Override public DataType dataType() { return DataTypes.LongType; }
    @Override public boolean deterministic() { return true; }
    @Override public void initialize(MutableAggregationBuffer b) { b.update(0, 0L); }
    @Override public void update(MutableAggregationBuffer b, Row in) { if (!in.isNullAt(0)) b.update(0, b.getLong(0) + in.getLong(0)); }
    @Override public void merge(MutableAggregationBuffer b1, Row b2) { b1.update(0, b1.getLong(0) + b2.getLong(0)); }
    @Override public Object evaluate(Row b) { return b.getLong(0) * 2; }
}
"""


def _compile_jar(tmp_path, class_name: str, source: str) -> str:
    src = tmp_path / f"{class_name}.java"
    src.write_text(source)
    subprocess.run(
        ["javac", "-cp", f"{PYSPARK_JARS}/*", src.name],
        cwd=tmp_path,
        check=True,
        capture_output=True,
    )
    jar = tmp_path / f"{class_name}.jar"
    subprocess.run(
        ["jar", "cf", jar.name, f"{class_name}.class"],
        cwd=tmp_path,
        check=True,
        capture_output=True,
    )
    return f"file:{jar}"


needs_jdk = pytest.mark.skipif(
    shutil.which("javac") is None or shutil.which("jar") is None,
    reason="JDK (javac/jar) not available to compile the JVM UDF",
)


@needs_jdk
def test_register_java_function(spark, tmp_path):
    from pyspark.sql.types import LongType

    jar = _compile_jar(tmp_path, "PlusTenUdf", UDF1_SRC)
    spark.sql(f"ADD JAR {jar}")
    spark.udf.registerJavaFunction("plus_ten_jvm", "PlusTenUdf", LongType())
    rows = spark.sql(
        "SELECT plus_ten_jvm(id) AS r FROM range(3) ORDER BY r"
    ).collect()
    assert [r.r for r in rows] == [10, 11, 12]
    # Null propagation is the UDF's contract, not Spark's.
    assert spark.sql("SELECT plus_ten_jvm(CAST(NULL AS BIGINT)) AS r").head().r is None


@needs_jdk
def test_register_java_udaf(spark, tmp_path):
    jar = _compile_jar(tmp_path, "SumTimesTwoUdaf", UDAF_SRC)
    spark.sql(f"ADD JAR {jar}")
    spark.udf.registerJavaUDAF("sum2x_jvm", "SumTimesTwoUdaf")
    # Partial aggregation exercises initialize/update/merge across partitions.
    got = spark.sql(
        "SELECT sum2x_jvm(id) AS r FROM (SELECT id FROM range(5) DISTRIBUTE BY id % 4)"
    ).head()
    assert got.r == 20  # (0+1+2+3+4) * 2


TYPED_AGG_SRC = """
import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.expressions.Aggregator;

public class SumSquaresAgg extends Aggregator<Long, Long, Long> {
    @Override public Long zero() { return 0L; }
    @Override public Long reduce(Long b, Long a) { return b + (a == null ? 0L : a * a); }
    @Override public Long merge(Long b1, Long b2) { return b1 + b2; }
    @Override public Long finish(Long b) { return b; }
    @Override public Encoder<Long> bufferEncoder() { return Encoders.LONG(); }
    @Override public Encoder<Long> outputEncoder() { return Encoders.LONG(); }
}
"""


@needs_jdk
def test_register_typed_aggregator(spark, tmp_path):
    """The TYPED Aggregator path (reference: sql/core/.../expressions/
    Aggregator.scala, udaf.scala:32): compile an
    org.apache.spark.sql.expressions.Aggregator subclass, wrap it with
    functions.udaf(agg, Encoders.LONG()) — the Spark-3+ replacement for the
    deprecated UserDefinedAggregateFunction — and register it for SQL use.
    registerJavaUDAF only accepts the legacy UDAF class, so the typed path
    goes through the JVM functions.udaf + UDFRegistration.register, exactly
    as a Scala/Java user would."""
    jar = _compile_jar(tmp_path, "SumSquaresAgg", TYPED_AGG_SRC)
    spark.sql(f"ADD JAR {jar}")  # ships the class to executors too
    jvm = spark._jvm
    loader = jvm.org.apache.spark.util.Utils.getContextOrSparkClassLoader()
    agg = loader.loadClass("SumSquaresAgg").newInstance()
    judf = jvm.org.apache.spark.sql.functions.udaf(
        agg, jvm.org.apache.spark.sql.Encoders.LONG()
    )
    spark._jsparkSession.udf().register("sumsq_jvm", judf)
    # DISTRIBUTE BY forces partial buffers -> merge across partitions.
    got = spark.sql(
        "SELECT sumsq_jvm(id) AS r FROM (SELECT id FROM range(5) DISTRIBUTE BY id % 3)"
    ).head()
    assert got.r == 30  # 0+1+4+9+16
    # null inputs hit the reduce null branch, not a crash
    assert spark.sql(
        "SELECT sumsq_jvm(CAST(NULL AS BIGINT)) AS r FROM range(1)"
    ).head().r == 0
