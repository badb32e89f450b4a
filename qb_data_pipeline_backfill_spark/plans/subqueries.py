"""Correlated-subquery query shapes, run through spark.sql.

The reference's verification SQL is flat (SURVEY.md §2B); a warehouse
engine additionally needs the correlated shapes every analyst writes:
EXISTS probes, per-group scalar subqueries, and HAVING against a
global scalar. Registering them through ``spark.sql`` (over the same
temp views the oracle uses) exercises Catalyst's subquery
decorrelation — each correlated form rewrites to the join/aggregate
plan a scale-safe engine must produce (EXISTS → left-semi hash join;
correlated scalar → aggregate + equi-join; HAVING scalar → one-row
broadcast), never a per-row re-execution.

All money arithmetic is exact DECIMAL on both engines, so threshold
comparisons are deterministic — no float boundary can flip membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.tables import load_table

_EXISTS_SQL = """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
"""

_SCALAR_SQL = """
    SELECT l.l_partkey,
           COUNT(*) AS n_max_lines,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue_at_max
    FROM lineitem l
    WHERE l.l_quantity = (
        SELECT MAX(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
"""

_HAVING_SQL = """
    SELECT l_partkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS part_revenue
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM(CAST(l_extendedprice AS DECIMAL(18,6))) > (
        SELECT SUM(CAST(l_extendedprice AS DECIMAL(18,6))) * CAST(0.00055 AS DECIMAL(8,6))
        FROM lineitem
    )
"""


def _views(spark: SparkSession, sf_dir: str, names: tuple[str, ...]) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "exists_correlated_orders",
    oracle=_EXISTS_SQL,
    doc="TPC-H Q4 shape: correlated EXISTS probe filtered by date, "
    "grouped by priority. Catalyst decorrelates to a left-semi hash "
    "join on l_orderkey — one shuffle, never a per-row subquery.",
)
def exists_correlated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_EXISTS_SQL)


@register(
    "scalar_subquery_max_qty",
    oracle=_SCALAR_SQL,
    doc="TPC-H Q17 shape with an exact aggregate: lines at their part's "
    "MAX quantity (MAX is element-selecting, so the correlated "
    "comparison is float-boundary-free). Catalyst decorrelates to a "
    "per-part aggregate joined back on l_partkey.",
)
def scalar_subquery_max_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_SCALAR_SQL)


@register(
    "having_fraction_of_total",
    oracle=_HAVING_SQL,
    doc="TPC-H Q11 shape: per-part revenue kept only above a fraction "
    "of the global total, the global scalar coming from an uncorrelated "
    "subquery Catalyst plans as a one-row broadcast. All comparisons in "
    "exact DECIMAL on both engines.",
)
def having_fraction_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_HAVING_SQL)


_RECURSIVE_SQL = """
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
        SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
    ),
    reach(part, dist) AS (
        SELECT CAST(1 AS BIGINT) AS part, 0 AS dist
        UNION ALL
        SELECT s.v AS part, r.dist + 1 AS dist
        FROM reach r JOIN sym s ON s.u = r.part
        WHERE r.dist < 2
    )
    SELECT part, MIN(dist) AS dist, COUNT(*) AS n_paths
    FROM reach
    GROUP BY part
"""


@register(
    "recursive_reachability",
    oracle=_RECURSIVE_SQL,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE) running UNMODIFIED on "
    "both engines: 2-hop BFS from a seed part over the co-purchase "
    "graph, reduced to (min hop distance, path count) per reached "
    "part. The frontier is re-joined per recursion level — the "
    "fixpoint shape graph.connected_components hand-builds, here "
    "expressed declaratively and bounded by the dist predicate.",
)
def recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ("lineitem",))
    return spark.sql(_RECURSIVE_SQL)
