"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship composite query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the large-scale pipeline extensions) with DuckDB
oracles over the shared parquet tables.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cir_duplicate_detector_spark.plans import ALL_QUERIES
from cir_duplicate_detector_spark.session import RECOMMENDED_CONFS

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _apply_confs(spark: SparkSession) -> None:
    for key, value in RECOMMENDED_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full composite duplicate annotation at sf0.001."""
    _apply_confs(spark)
    fn, _ = ALL_QUERIES["detect_duplicates"]
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, (fn, _sql) in ALL_QUERIES.items():
        def wrapped(spark, sf_dir, _fn=fn):
            _apply_confs(spark)
            return _fn(spark, sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (fn, sql) in ALL_QUERIES.items() if sql is not None
    }
