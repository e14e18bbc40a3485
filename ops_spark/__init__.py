"""ops_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
sjtu-sail/ops (an Apache Spark 2.4.3 fork implementing the OPS optimized
shuffle management system, ICPP '20). The reference's capability surface is
stock Spark SQL + DataFrame + Structured Streaming; its novel contribution is
a physical shuffle redesign. Here both are re-expressed Spark-first:

- the full relational/streaming operator surface through modern PySpark
  (DataFrame/SQL, Catalyst does the optimizing),
- the OPS shuffle *capability* through a shuffle-policy layer
  (:mod:`ops_spark.plans.shuffle_policy`) built on AQE and modern Spark
  shuffle machinery,
- plus an LLM-data-pipeline operator set (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.

Nothing is copied from the reference; file:line citations in docstrings
point at the reference code whose behavior each component reproduces.
"""

from ops_spark.session import get_session, stop_session

__version__ = "0.1.0"

__all__ = ["get_session", "stop_session", "__version__"]
