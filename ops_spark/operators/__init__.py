"""Custom operators the reference lacks, built Spark-first.

Everything here is a DataFrame→DataFrame composition of built-in
pyspark.sql.functions (JVM-side, codegen) unless genuinely impossible, in
which case it is an Arrow-batched Pandas UDF (never row-at-a-time Python).
Each operator documents its shuffle contract — what it partitions on and
why the plan survives a 100 TB input.
"""

from ops_spark.operators import dedup, multimodal, similarity, text  # noqa: F401
