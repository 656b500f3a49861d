"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spark_streaming_twitch_analytics_spark``; the
registry maps every SURVEY §2 operator (and the scale extensions) to a
named query + DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this module by file path with any cwd — make the
# package resolvable regardless
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from spark_streaming_twitch_analytics_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's signature
    dataflow (IRC-line parse → tokenize/stopwords → explode → filter →
    count → top-100) as one Catalyst plan."""
    return registry.get("flagship_wordcount").fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions)."""
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. As of round 4 EVERY registered
    query has an oracle (the former rows-only checks — sketches,
    multimodal decode/resize, the TWS stream — became hash-checkable via
    tolerance booleans, md5-recomputed fakes, and batch-equivalence)."""
    return registry.all_oracles()
