"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface (SURVEY.md §2 + the
training-pipeline ops); ``oracle_sql()`` gives DuckDB-equivalent SQL for each
(omitting only genuinely approximate operators, which get rows-only checks).
Integer-typed columns are widened to long so Spark/DuckDB schemas agree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cap-containment spatial join on sf0.001 (covering + refine)."""
    from rust_s2_spark.engine.queries import q_cap_join

    return _widen(q_cap_join(spark, "/root/testdata/sf0.001"))


def _widen(df: DataFrame) -> DataFrame:
    """Cast byte/short/int columns to long (DuckDB emits BIGINT everywhere)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ByteType, T.ShortType, T.IntegerType)):
            cols.append(F.col(f.name).cast("long").alias(f.name))
        elif isinstance(f.dataType, T.FloatType):
            cols.append(F.col(f.name).cast("double").alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rust_s2_spark.engine.queries import QUERIES

    def wrap(fn):
        return lambda spark, sf_dir: _widen(fn(spark, sf_dir))

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from rust_s2_spark.engine.oracles import oracle_sql as _o

    return _o()
