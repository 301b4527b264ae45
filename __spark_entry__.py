"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB-verifiable ANSI-SQL oracle (see
dataingestionplayground_spark.queries for the registry).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataingestionplayground_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Routed through queries() so it gets the same session pinning
    (UTC/AQE/ANSI, worker package shipping) as every other entry point.
    """
    return queries()["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable first ships the engine package to the session's Python
    workers (needed for mapInPandas stages when the driver's session was
    not created by this package).
    """
    from dataingestionplayground_spark.session import ensure_package_on_workers

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # timestamp semantics (date literals, year()/bucketing) are
            # session-TZ-dependent; the DuckDB oracle is TZ-naive -> pin UTC
            # regardless of how the driver built its session.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # sane execution conf on foreign sessions (a default 200-part
            # shuffle over-parallelizes small SFs; AQE fixes it at any SF)
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
            # pin ANSI semantics (cast/overflow behavior) independent of
            # how the driver configured its session
            spark.conf.set("spark.sql.ansi.enabled", "true")
            ensure_package_on_workers(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for genuinely
    non-SQL-expressible ops -> driver does a rows-only check)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
