"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (top-k entities by co-occurrence degree) on
                 sf0.001, the read-path counterpart of the KG pipeline.
queries()      — one entry per implemented operator (SURVEY.md §2 + the
                 training-data-pipeline operators); each (spark, sf_dir) →
                 DataFrame.
oracle_sql()   — DuckDB-equivalent SQL per query (column names aligned).

The full KG-construction pipeline over `pages` (BASELINE.json input_hint) is
exercised by tests/test_parity.py (P/R gate) and bench.py (throughput +
scaling); it is not oracle-expressible in SQL, so the driver-facing battery
here covers its operator shapes over the provided tables instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aperag_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from aperag_spark.queries import q_kg_top_entities

    return q_kg_top_entities(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
