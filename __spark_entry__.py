"""Driver contract for the spark-graft builder (PySpark target).

entry(spark):  flagship anomaly-extraction run on /root/testdata/sf0.001
queries():     operator-inventory queries (SURVEY.md §2), one per key
oracle_sql():  DuckDB-equivalent SQL for the SQL-expressible subset
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from logjuicer_spark.entry_queries import ORACLE_SQL, QUERIES, q_pipeline_anomalies


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: train on baseline convs
    (even user ids), score target convs, return emitted anomalies."""
    return q_pipeline_anomalies(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
