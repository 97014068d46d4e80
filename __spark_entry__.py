"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship risk-classification query (the
reference's `/api/risk` lifecycle, SURVEY.md §3.3/§7.4) at sf0.001.
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle twin (None → rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def _prepare(spark: SparkSession) -> SparkSession:
    from algoritmos_etl_spark.session import configure_existing

    return configure_existing(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from algoritmos_etl_spark.driver_queries import REGISTRY

    _prepare(spark)
    return REGISTRY["risk_classification"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from algoritmos_etl_spark.driver_queries import REGISTRY

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prepare(spark)
            return REGISTRY[name].build(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: wrap(name) for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query (omitted → rows-only)."""
    from algoritmos_etl_spark.driver_queries import REGISTRY

    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }
