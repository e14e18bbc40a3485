"""UserDefinedType: a typed embedding column.

Parity target: reference sql/catalyst/src/main/scala/org/apache/spark/sql/
types/UserDefinedType.scala:42 (and its canonical instance, MLlib's
VectorUDT) — SQL-invisible domain types that serialize to a Catalyst type.

``Embedding`` is the pipeline-relevant instance: a dense float vector that
rides DataFrames as ``array<float>`` under the hood (so parquet, shuffles,
and codegen all see a plain array) while Python code sees a real object on
both driver and executors. The UDT's module path must be importable by
Python workers — keeping it inside the installed package satisfies that.
"""

from __future__ import annotations

from pyspark.sql.types import ArrayType, FloatType, UserDefinedType


class Embedding:
    """A dense embedding vector (value object; equality by contents)."""

    __slots__ = ("values",)

    def __init__(self, values: list[float]):
        self.values = [float(v) for v in values]

    def norm(self) -> float:
        return sum(v * v for v in self.values) ** 0.5

    def dim(self) -> int:
        return len(self.values)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Embedding) and self.values == other.values

    def __hash__(self) -> int:
        return hash(tuple(self.values))

    def __repr__(self) -> str:
        return f"Embedding({self.values!r})"


class EmbeddingUDT(UserDefinedType):
    """Catalyst representation: array<float> (nullable elements disallowed).

    serialize/deserialize run in Python workers during Arrow/pickle
    transfer — the executor-side path the UDT test pins."""

    @classmethod
    def sqlType(cls) -> ArrayType:
        return ArrayType(FloatType(), False)

    @classmethod
    def module(cls) -> str:
        return "ops_spark.operators.udt"

    def serialize(self, obj: Embedding) -> list[float]:
        return obj.values

    def deserialize(self, datum: list[float]) -> Embedding:
        return Embedding(datum)

    def simpleString(self) -> str:
        return "embedding"


Embedding.__UDT__ = EmbeddingUDT()  # type: ignore[attr-defined]
