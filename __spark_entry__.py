"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query at sf0.001; ``queries``/``oracle_sql``
expose every implemented operator from SURVEY.md §2 (relational plane,
join plane, crawl-plane analogs, training-data ops) with exact DuckDB
oracles. Implementations live in ``crawlspark/`` (entry_queries.py maps
names -> builders).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crawlspark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query. Rows-only (no oracle):
    q14b (HLL internals are engine-specific — its ACCURACY is gated by
    q14c) and t11 (iterative k-means — its RECALL is gated by t11b).
    t12 gained a hash-exact oracle in round 3: DuckDB HUGEINT carries the
    unsigned 64-bit SimHash (entry_queries._simhash64_oracle)."""
    return dict(ORACLES)
