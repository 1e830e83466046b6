"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship KG pipeline (transcripts -> triples) at sf0.001.
queries()    — one Spark callable per implemented operator (SURVEY.md §2).
oracle_sql() — the DuckDB twin of each query, generated from the SAME
               fixture constants (eva_opentargets_spark/fixtures.py) so the
               two sides cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from eva_opentargets_spark.oracle import all_oracle_sql
from eva_opentargets_spark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full KG-construction pipeline on sf0.001 —
    transcripts -> mention extraction -> linking cascade -> triples."""
    return QUERIES["kg_triples"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return all_oracle_sql()
