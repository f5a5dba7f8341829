"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tikv_data_compare_spark`` (queries.py /
queries_ext.py); this module is the thin adapter the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: checksum-compare src vs deterministically-mutated dst orders
    at sf0.001, then list the per-key culprits via keyed full-outer diff
    (the corrected form of the reference's diff subcommand).

    Returns the findings DataFrame [o_orderkey, status, src_*/dst_* canon
    columns] — non-empty by construction (the mutation spec guarantees
    deletes/updates/inserts).
    """
    from tikv_data_compare_spark import queries as q
    from tikv_data_compare_spark.model import Keyed
    from tikv_data_compare_spark.operators.checksum import checksum_verdict

    sf_dir = "/root/testdata/sf0.001"
    verdict = checksum_verdict(
        Keyed.of(q._load(spark, sf_dir, "orders"), keys=("o_orderkey",)),
        Keyed.of(q.mutated_orders(spark, sf_dir), keys=("o_orderkey",)),
    )
    assert not verdict["equal"], "mutated dst must differ from src"
    return q.q_diff_keyed(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    from tikv_data_compare_spark import queries as q

    return q.queries()


def oracle_sql(sf_dir: str | None = None) -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for Spark-only hash paths →
    driver records the weaker rows-only check for those).

    ``sf_dir`` (optional, r15): the directory the comparison runs against —
    threads the corpus to the oracles embedding data-dependent literals
    (the DSIR cost tables).  A no-arg call falls back to
    ``$SPARK_GRAFT_ORACLE_SF_DIR`` (default /root/testdata/sf0.01)."""
    from tikv_data_compare_spark import queries as q

    return q.oracle_sql(sf_dir)
