"""Count-Min sketch as a pure DataFrame plan — frequency estimation
whose shuffle volume is bounded by the SKETCH size, not the key
cardinality.

The 100 TB problem: "how often does key X occur" over a column with
billions of distinct values. An exact ``groupBy(col).count()``
shuffles every distinct key; the Count-Min sketch (Cormode &
Muthukrishnan 2005) replaces that with a ``depth × width`` counter
grid — each row increments one counter per hash row, an estimate
reads the MIN of its counters, and grids merge by element-wise sum.

Spark-first realization, no UDFs anywhere:

- ``cms_sketch``: explode each row to its ``depth`` (row, bucket)
  cells via ``xxhash64(seed, key)`` and ``groupBy(d, b).count()``.
  HashAggregate's map-side combine collapses every partition to at
  most ``depth × width`` cells before the exchange, so the shuffle
  ships ~``depth × width × partitions`` counters regardless of input
  size — and the same groupBy IS the merge operator (sketches of
  unions = sums of sketches, proven in ``tests/test_sketch.py``).
- ``cms_estimate``: expand probe keys the same way, broadcast-join
  the (tiny) grid, take ``min`` per key; absent cells count 0.

Guarantees (deterministic given data + seeds): estimate ≥ true count
always; estimate ≤ true + ⌈(e/width)·N⌉ with probability
1 − e^{−depth} per key. ``cms_frequency_contract`` in
``plans.analytics`` hash-gates both properties against DuckDB's
exact counts, mirroring
the ``approx_distinct_report`` tolerance-contract pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(col: Column | str, depth: int, width: int) -> Column:
    """Array of ``depth`` structs (d, b): the key's counter cells."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.pmod(F.xxhash64(F.lit(d), c), F.lit(width)).alias("b"),
            )
            for d in range(depth)
        ]
    )


def cms_sketch(df: DataFrame, col: str, depth: int = 4, width: int = 4096) -> DataFrame:
    """Build the counter grid: rows ``(d, b, n)``, at most depth*width."""
    return (
        df.select(F.explode(_cells(col, depth, width)).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge grids built with identical (depth, width, key type)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, depth: int = 4, width: int = 4096
) -> DataFrame:
    """Estimated count per probe key: MIN over the key's cells.

    ``probes`` rows should be distinct keys. The grid side is tiny by
    construction — broadcast it so probing never shuffles the probes.
    """
    # internal cell/count columns carry __ prefixes so a probed key
    # column named 'd', 'b', or 'n' cannot collide (r7 review:
    # cms_estimate(col='n') crashed with AMBIGUOUS_REFERENCE)
    expanded = probes.select(
        F.col(col), F.explode(_cells(col, depth, width)).alias("c")
    ).select(col, F.col("c.d").alias("__d"), F.col("c.b").alias("__b"))
    grid = sketch.select(
        F.col("d").alias("__d"), F.col("b").alias("__b"), F.col("n").alias("__n")
    )
    return (
        expanded.join(F.broadcast(grid), ["__d", "__b"], "left")
        .fillna(0, subset=["__n"])
        .groupBy(col)
        .agg(F.min("__n").alias("estimate"))
    )


def frequent_items(
    df: DataFrame, col: str, capacity: int = 128, merge_partitions: int = 32
) -> DataFrame:
    """Heavy hitters via MERGEABLE Misra–Gries summaries (Misra &
    Gries 1982; mergeability per Agarwal et al. 2012) — the frequent-
    items companion to the Count-Min grid above, for when you want
    the ITEMS, not per-probe estimates.

    The 100 TB problem: "which keys dominate this column" over
    billions of distinct values. Exact ``groupBy(col).count()``
    shuffles every distinct key; here each PARTITION maintains at most
    ``capacity`` counters (one Arrow-batched ``mapInPandas`` pass —
    per-batch ``value_counts`` does the heavy lifting in C, and the
    classic decrement step subtracts the (capacity+1)-th largest
    count, removing at least (capacity+1)x that mass, so each
    partition's total decrement is <= n_p/(capacity+1)), and only the
    ``capacity``-bounded summaries shuffle.

    Returns ``(item, cnt_lb, err_ub)`` — at most
    ``partitions x capacity`` rows merged down to one per surviving
    item:

    - ``cnt_lb`` never overestimates: ``cnt_lb <= true count``;
    - ``true count <= cnt_lb + err_ub`` where ``err_ub`` (same value
      on every row: the summed per-partition decrements) is
      ``<= N/(capacity+1)``;
    - any item with true count ``> err_ub`` is GUARANTEED present —
      no false negatives among true heavy hitters.

    Top-k = ``orderBy(desc("cnt_lb")).limit(k)`` on the result. NULL
    items are dropped (a NULL is missingness, not a key).
    ``contract_heavy_hitters`` hash-gates all three properties against
    DuckDB's exact counts.

    Execution shape (review r12): the per-partition summaries feed ONE
    intermediate merge level (MG summaries are mergeable with the same
    ``N/(capacity+1)`` combined guarantee — Agarwal et al. 2012 §3) that
    folds them to ``merge_partitions`` summaries, which are collected
    and rebuilt as a local relation. One job scans the input; the
    driver holds at most ``merge_partitions x (capacity+1)`` rows no
    matter how many scan partitions the input has (a 100 TB scan is
    ~800k partitions — summaries alone would be 100M rows, too big to
    collect raw); and nothing is checkpointed, so repeated calls in a
    long session leave no executor-storage residue (the prior
    ``localCheckpoint`` pinned blocks until RDD GC)."""
    import pandas as pd  # noqa: PLC0415

    from pyspark import TaskContext

    m = int(capacity)
    if m < 1:
        raise ValueError("capacity must be >= 1")
    item_t = df.schema[col].dataType.simpleString()
    out_schema = f"item {item_t}, __cnt long, __err long, __pid int"

    def summarize(batches):
        counts: dict = {}
        dec = 0
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > m:
                vals = sorted(counts.values(), reverse=True)
                c_star = vals[m]  # (m+1)-th largest
                counts = {
                    i: c - c_star for i, c in counts.items() if c > c_star
                }
                dec += c_star
        pid = TaskContext.get().partitionId()
        if not counts:
            # still ship the partition's decrement: the global error
            # bound must count EVERY partition's loss, including one
            # whose summary emptied out
            yield pd.DataFrame(
                {"item": [None], "__cnt": [0], "__err": [dec], "__pid": [pid]}
            )
            return
        yield pd.DataFrame(
            {
                "item": list(counts.keys()),
                "__cnt": list(counts.values()),
                "__err": [dec] * len(counts),
                "__pid": [pid] * len(counts),
            }
        )

    def merge_summaries(batches):
        # fold many capacity-bounded summaries into one, carrying each
        # source partition's decrement exactly once (rows from one pid
        # share the same __err; a pid may span pandas batches -> max)
        counts: dict = {}
        dec = 0
        pid_err: dict = {}
        for pdf in batches:
            for p, e in pdf.groupby("__pid")["__err"].max().items():
                p = int(p)
                pid_err[p] = max(pid_err.get(p, 0), int(e))
            valid = pdf[pdf["item"].notna()]
            gc = valid.groupby("item", sort=False)["__cnt"].sum()
            for item, c in gc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > m:
                vals = sorted(counts.values(), reverse=True)
                c_star = vals[m]
                counts = {
                    i: c - c_star for i, c in counts.items() if c > c_star
                }
                dec += c_star
        pid = TaskContext.get().partitionId()
        err = sum(pid_err.values()) + dec
        if not counts:
            yield pd.DataFrame(
                {"item": [None], "__cnt": [0], "__err": [err], "__pid": [pid]}
            )
            return
        yield pd.DataFrame(
            {
                "item": list(counts.keys()),
                "__cnt": list(counts.values()),
                "__err": [err] * len(counts),
                "__pid": [pid] * len(counts),
            }
        )

    # level 0: one summary per scan partition; level 1: merge down to
    # merge_partitions summaries (tiny shuffle — capacity counters per
    # partition, never keys); then materialize ONCE to the driver and
    # rebuild locally. The bound and the merge below are two different
    # aggregates over this subtree — without the materialization each
    # would re-run the full input scan + Python summarization
    merged_lvl = (
        df.select(col)
        .mapInPandas(summarize, out_schema)
        # hash on the SOURCE pid: a level-0 summary must land whole in
        # one merge partition, or its decrement would be claimed (and
        # the bound inflated) once per fragment
        .repartition(int(merge_partitions), "__pid")
        .mapInPandas(merge_summaries, out_schema)
    )
    summaries = df.sparkSession.createDataFrame(
        merged_lvl.collect(), merged_lvl.schema
    )
    # global bound: one decrement total per partition, summed
    bound = summaries.groupBy("__pid").agg(
        F.max("__err").alias("__e")
    ).agg(F.sum("__e").alias("err_ub"))
    merged = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("__cnt").alias("cnt_lb"))
        .filter(F.col("cnt_lb") > 0)
    )
    return merged.crossJoin(F.broadcast(bound))
