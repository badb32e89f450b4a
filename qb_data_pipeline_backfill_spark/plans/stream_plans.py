"""Streaming plans registered in the correctness gate.

Each query builds a STREAMING plan over the bounded events source,
executes it with Trigger.AvailableNow into a memory sink, and returns
the materialized result — so the driver hash-compares actual
Structured Streaming execution (watermarks, state store, session
merge) against the same DuckDB oracles as the batch twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qb_data_pipeline_backfill_spark.plans.registry import register
from qb_data_pipeline_backfill_spark.streaming import (
    dedup_exactly_once,
    enriched_segment_rollup,
    events_stream,
    interval_attribution_join,
    run_available_now,
    session_aggregates,
    sliding_counts,
    stateful_user_counts,
    tumbling_counts,
)


@register(
    "streaming_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hourly tumbling window with watermark, executed through the "
    "Structured Streaming engine (AvailableNow) — same oracle as the "
    "batch twin tumbling_window_events.",
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(tumbling_counts(events_stream(spark, sf_dir)))


@register(
    "streaming_enriched_rollup",
    oracle="""
    SELECT date_trunc('hour', CAST(e.ts AS TIMESTAMP)) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    doc="Stream-static enrichment: the event stream broadcast-joined to the "
    "static customer dimension (re-read per micro-batch — dimension "
    "refreshes are picked up without restart) then rolled up hourly per "
    "market segment through the streaming engine. The stream never "
    "shuffles for the join; only the windowed aggregate keeps state.",
)
def streaming_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.tables import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return run_available_now(
        enriched_segment_rollup(events_stream(spark, sf_dir), dim)
    )


@register(
    "streaming_sliding_window",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP))
               - k * INTERVAL '15 minutes' AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events, LATERAL unnest(generate_series(0, 3)) AS g(k)
    GROUP BY 1, 2
    """,
    doc="Hopping windows (1-hour window, 15-minute slide) through the "
    "streaming engine: every event lands in 4 overlapping windows. The "
    "oracle replays the window assignment with generate_series(0,3) "
    "over 15-minute buckets.",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(sliding_counts(events_stream(spark, sf_dir)))


@register(
    "streaming_stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, c.event_id AS click_id
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.user_id = p.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
    doc="Stream-stream interval join (watermarks on both sides; the "
    "range predicate bounds join state to O(rate x horizon)): purchases "
    "attributed to same-user clicks within the preceding hour, executed "
    "through the streaming engine's symmetric hash join.",
)
def streaming_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both join sides derive from ONE source stream (self-join): the
    # landing directory is scanned once per micro-batch, not twice.
    ev = events_stream(spark, sf_dir)
    return run_available_now(
        interval_attribution_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
        ),
        output_mode="append",
    )


@register(
    "streaming_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE
                         OR LAG(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value, event_id FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, value,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="Native session_window sessionization (30-min gap) through the "
    "streaming engine's session-merge state store; oracle is the "
    "gaps-and-islands CTE (identical semantics for gap > 30min).",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(session_aggregates(events_stream(spark, sf_dir)))


@register(
    "streaming_stateful_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id
    """,
    doc="Custom stateful operator (applyInPandasWithState): per-user "
    "running accumulator in integer cents (order-insensitive); with a "
    "single AvailableNow micro-batch the final update per user equals "
    "the batch aggregate.",
)
def streaming_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(
        stateful_user_counts(events_stream(spark, sf_dir)), output_mode="update"
    )


@register(
    "streaming_dedup_exactly_once",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="At-least-once -> exactly-once: the event stream unioned with "
    "itself (every event delivered twice, the redelivery shape of any "
    "replayed source) is deduplicated by event_id via "
    "dropDuplicatesWithinWatermark (bounded per-key state), then "
    "aggregated. The oracle is the plain aggregate over the ORIGINAL "
    "events — hash-equality proves dedup restored exactly-once "
    "delivery, the streaming twin of the batch sink's anti-join "
    "idempotence.",
)
def streaming_dedup_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = events_stream(spark, sf_dir)
    redelivered = s.unionByName(events_stream(spark, sf_dir))
    deduped = run_available_now(
        dedup_exactly_once(redelivered), output_mode="append"
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "streaming_interval_join_outer",
    oracle="""
    WITH horizon AS (
        -- the engine's global watermark is min over the two sides'
        -- own max event times (each side is filtered before its
        -- watermark node); stay 4h behind THAT
        SELECT LEAST(
            (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
            (SELECT MAX(ts) FROM events WHERE event_type = 'click')
        ) - INTERVAL 4 HOUR AS cutoff
    ),
    matched AS (
        SELECT p.event_id AS purchase_id, c.event_id AS click_id
        FROM events p JOIN events c
          ON p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.user_id = p.user_id
         AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    )
    SELECT purchase_id, click_id FROM matched
    UNION ALL
    SELECT p.event_id AS purchase_id, CAST(NULL AS BIGINT) AS click_id
    FROM events p, horizon h
    WHERE p.event_type = 'purchase'
      AND p.ts < h.cutoff
      AND NOT EXISTS (
          SELECT 1 FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id
            AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
      )
    """,
    doc="LEFT OUTER stream-stream interval join through the streaming "
    "engine: matched purchase-click pairs plus watermark-released "
    "unmatched purchases. Unmatched rows are restricted to an "
    "event-time horizon (4h) safely behind the watermark on BOTH "
    "engines, because the engine's exact state-eviction boundary is an "
    "implementation detail, not a portable contract — the oracle "
    "replays the same rule in batch SQL.",
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.streaming import (
        interval_attribution_join_outer,
    )
    from qb_data_pipeline_backfill_spark.tables import load_table

    cutoff = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(F.max("ts").alias("m"))
        .agg(F.expr("min(m) - INTERVAL 4 HOUR").alias("c"))
        .collect()[0]["c"]
    )
    ev = events_stream(spark, sf_dir)
    joined = run_available_now(
        interval_attribution_join_outer(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
        ),
        output_mode="append",
    )
    return joined.filter(
        F.col("click_id").isNotNull() | (F.col("p_ts") < F.lit(cutoff))
    ).select("purchase_id", "click_id")


@register(
    "streaming_top_users",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id
    ORDER BY sum_value DESC, user_id
    LIMIT 20
    """,
    doc="Complete-output-mode streaming leaderboard: running per-user "
    "totals ranked and limited INSIDE the streaming query (sort+limit "
    "are legal atop a complete-mode aggregate) — the live-dashboard "
    "shape; with AvailableNow the final table equals the batch top-20 "
    "under the deterministic (sum, user_id) tie-break.",
)
def streaming_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = events_stream(spark, sf_dir)
    ranked = (
        stream.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy(F.desc("sum_value"), F.asc("user_id"))
        .limit(20)
    )
    return run_available_now(ranked, output_mode="complete")


@register(
    "streaming_media_decode",
    # Same closed-form oracle as multimodal_decode_stats: the decode
    # is deterministic, so batch and streaming must agree bit-for-bit.
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               (doc_id % 8 + 2) AS width,
               (doc_id % 5 + 2) AS height
        FROM documents WHERE doc_id % 10 = 0
    ),
    px AS (
        SELECT media_id, width, height,
               (media_id * 31 + i) % 256 AS v
        FROM m, LATERAL unnest(generate_series(0, width * height * 3 - 1)) AS t(i)
    )
    SELECT media_id, width, height,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(v) AS BIGINT) AS pixel_sum
    FROM px
    GROUP BY media_id, width, height
    """,
    doc="Media decode under the Structured Streaming engine: the "
    "documents FILE STREAM (landing-directory shape) flows through "
    "synthesize + the pure-Python PPM codec's Arrow mapInPandas pass "
    "per micro-batch — stateless, append-mode, no watermark — and must "
    "land bit-identical to the batch twin multimodal_decode_stats. "
    "Certifies that the Arrow decode surface composes with streaming "
    "micro-batch execution (the continuous-ingest curation shape).",
)
def streaming_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import multimodal as M
    from qb_data_pipeline_backfill_spark.streaming.jobs import documents_stream

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    decoded = M.decode_media(M.synthesize_images(docs, fmt="ppm"))
    pixel_sum = F.aggregate("pixels", F.lit(0.0), lambda a, x: a + x)
    out = decoded.select(
        "media_id",
        "width",
        "height",
        F.size("pixels").cast("long").alias("n_values"),
        pixel_sum.cast("long").alias("pixel_sum"),
    )
    return run_available_now(out, output_mode="append")


@register(
    "streaming_txn_cdf",
    oracle="SELECT o_orderkey, o_orderstatus, 'insert' AS _change_type "
    "FROM orders "
    "UNION ALL "
    "SELECT o_orderkey, o_orderstatus, 'delete' AS _change_type "
    "FROM orders WHERE o_orderkey % 89 = 0",
    doc="Streaming change-data-capture tail of the transactional table "
    "(sources/txn_cdf.py, Spark 4 partitioned Python streaming "
    "DataSource): offsets are table VERSIONS; change rows are recorded "
    "at COMMIT time (appends: new files ARE the inserts; the MoR delete "
    "stages explicit CDC rows) and read one-Spark-task-per-changed-file "
    "on executors — no row passes through the driver. Orders commit "
    "then lose every 89th key to a merge-on-read delete; the "
    "genesis→head catch-up batch must carry the append's inserts AND "
    "the delete's pre-image rows (per-commit feed, Delta CDF "
    "semantics). Hash-gated against the closed-form union. A change "
    "feed is an append-only HISTORY, so replaying the build commits "
    "would (correctly) lengthen it — the query pins the expected "
    "2-commit history and rebuilds from zero if the scratch table's "
    "head diverges, making the gate replay-stable.",
)
def streaming_txn_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.plans.formats import _orders_cdc2_table
    from qb_data_pipeline_backfill_spark.sources.txn_cdf import read_cdf_stream

    path = _orders_cdc2_table(spark, sf_dir)
    feed = run_available_now(
        read_cdf_stream(spark, path), output_mode="append"
    )
    return feed.select("o_orderkey", "o_orderstatus", "_change_type")


@register(
    "streaming_drift_psi",
    oracle="""
    WITH binned AS (
        SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT),
                              0), 9) AS bin,
               CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS is_ref
        FROM events
    ),
    spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(10)),
    counts AS (
        SELECT s.bin,
               CAST(COALESCE(SUM(b.is_ref), 0) AS BIGINT) AS ref_n,
               CAST(COALESCE(SUM(1 - b.is_ref), 0) AS BIGINT) AS cur_n
        FROM spine s LEFT JOIN binned b ON s.bin = b.bin
        GROUP BY s.bin
    ),
    tot AS (SELECT SUM(ref_n) AS rt, SUM(cur_n) AS ct FROM counts),
    terms AS (
        SELECT bin, ref_n, cur_n,
               (ref_n + 1.0) / (rt + 10.0) AS p,
               (cur_n + 1.0) / (ct + 10.0) AS q
        FROM counts, tot
    ),
    micro AS (
        SELECT bin, ref_n, cur_n,
               ROUND(p, 6) AS p_ref, ROUND(q, 6) AS p_cur,
               CAST(ROUND((p - q) * LN(p / q) * 1000000, 0) AS BIGINT)
                   AS psi_term_micro
        FROM terms
    )
    SELECT bin, ref_n, cur_n, p_ref, p_cur, psi_term_micro,
           (SELECT SUM(psi_term_micro) FROM micro) / 1000000.0 AS psi_total
    FROM micro
    """,
    doc="STREAMING twin of drift_psi_report: the current-window value "
    "histogram is maintained by the Structured Streaming engine (10-"
    "group running aggregate, complete mode — state is O(n_bins) "
    "regardless of stream length), then joined to the static reference "
    "histogram and finished with the shared exact-micro-unit PSI "
    "arithmetic. Same oracle as the batch twin — the monitor can move "
    "from nightly batch to continuous without changing its contract.",
)
def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.profile import (
        hist_bin,
        psi_from_counts,
    )
    from qb_data_pipeline_backfill_spark.tables import load_table

    split = F.lit("2024-01-16").cast("timestamp")
    bin_expr = hist_bin("value", lo=0.0, hi=500.0, n_bins=10)
    cur_counts = run_available_now(
        events_stream(spark, sf_dir)
        .filter(F.col("ts") >= split)
        .select(bin_expr)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cur_n"))
    )
    ref_counts = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < split)
        .select(bin_expr)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("ref_n"))
    )
    return psi_from_counts(ref_counts, cur_counts, n_bins=10)


def _scd2_stream_table(spark: SparkSession, sf_dir: str) -> str:
    """Pinned SCD2 scratch table built THROUGH the streaming path:
    three change batches (insert wave at seq 1, update/delete wave at
    seq 2, late delete wave at seq 3) flow file-by-file through
    ``stream_scd2``'s foreachBatch into ``apply_changes_scd2`` —
    bootstrap v0 + two incremental commits = pinned head 2. The
    fixture adopts/rebuilds atomically like every other pinned scratch
    table, so grading replays read the once-built history."""
    import os
    import shutil
    import time

    from qb_data_pipeline_backfill_spark.operators import txn
    from qb_data_pipeline_backfill_spark.plans.formats import (
        _SCRATCH,
        _atomic_rebuild,
    )
    from qb_data_pipeline_backfill_spark.tables import load_table

    path = os.path.join(
        _SCRATCH, f"scd2_stream_{os.path.basename(os.path.normpath(sf_dir))}"
    )

    def _build(p: str) -> None:
        keys = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 199 == 0)
            .select(
                F.col("o_orderkey").alias("k"), F.col("o_custkey").alias("v")
            )
        )
        one = F.lit(1).cast("long")
        b1 = keys.select(
            "k", one.alias("seq"), F.lit("i").alias("op"),
            F.col("v").alias("val"),
        )
        b2 = keys.filter(F.col("k") % 2 == 0).select(
            "k", F.lit(2).cast("long").alias("seq"), F.lit("u").alias("op"),
            (F.col("v") + 1000).alias("val"),
        ).unionByName(
            keys.filter((F.col("k") % 2 == 1) & (F.col("k") % 3 == 0)).select(
                "k", F.lit(2).cast("long").alias("seq"),
                F.lit("delete").alias("op"),
                F.lit(None).cast("long").alias("val"),
            )
        )
        b3 = keys.filter(F.col("k") % 10 == 0).select(
            "k", F.lit(3).cast("long").alias("seq"),
            F.lit("delete").alias("op"),
            F.lit(None).cast("long").alias("val"),
        )
        work = p + ".stream-work"
        src, ck = os.path.join(work, "src"), os.path.join(work, "ck")
        shutil.rmtree(work, ignore_errors=True)
        for i, b in enumerate((b1, b2, b3)):
            b.coalesce(1).write.parquet(os.path.join(src, f"b{i}.parquet"))
        # the file source orders batches by (mtime, path); pin mtimes
        # so the seq waves arrive in order (a same-millisecond tie
        # would trip the operator's out-of-order guard — correctly,
        # but flakily; same pinning as the pytest twin)
        now = time.time()
        for i in range(3):
            d = os.path.join(src, f"b{i}.parquet")
            for fn in os.listdir(d):
                os.utime(os.path.join(d, fn), (now + i * 10, now + i * 10))
        stream = (
            spark.readStream.schema("k long, seq long, op string, val long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/*")
        )
        q = txn.stream_scd2(
            stream, p, key="k", seq_col="seq", op_col="op",
            checkpoint_dir=ck,
        )
        q.awaitTermination()
        shutil.rmtree(work, ignore_errors=True)

    _atomic_rebuild(path, 2, _build)
    return path


@register(
    "streaming_scd2_apply",
    oracle="""
    WITH keys AS (
        SELECT o_orderkey AS k, o_custkey AS v
        FROM orders WHERE o_orderkey % 199 = 0
    )
    SELECT k, v AS val, CAST(1 AS BIGINT) AS valid_from,
           CASE WHEN k % 2 = 0 OR k % 3 = 0 THEN CAST(2 AS BIGINT) END
               AS valid_to,
           (k % 2 <> 0 AND k % 3 <> 0) AS is_current
    FROM keys
    UNION ALL
    SELECT k, v + 1000 AS val, CAST(2 AS BIGINT) AS valid_from,
           CASE WHEN k % 10 = 0 THEN CAST(3 AS BIGINT) END AS valid_to,
           k % 10 <> 0 AS is_current
    FROM keys WHERE k % 2 = 0
    """,
    doc="Streaming APPLY CHANGES ... STORED AS SCD TYPE 2, gated end "
    "to end (operators/txn.py stream_scd2 — the streaming face of "
    "apply_changes_scd2, VERDICT r11 #7): three change waves replay "
    "through foreachBatch micro-batches (engine batch ids = "
    "writer-namespaced manifest watermarks, so the build is "
    "exactly-once under at-least-once delivery) and the resulting "
    "interval history must hash-match the closed-form expectation — "
    "insert wave opens every key at seq 1; the update wave closes "
    "even keys and reopens them at seq 2 while deleting odd multiples "
    "of 3; the final wave tombstones multiples of 10. Any fold, "
    "watermark, or out-of-order bug shifts an interval or resurrects "
    "a deleted key and the hash goes red.",
)
def streaming_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import txn

    path = _scd2_stream_table(spark, sf_dir)
    return txn.read_table(spark, path).select(
        "k", "val", "valid_from", "valid_to", "is_current"
    )


@register(
    "streaming_html_extract",
    # Same closed-form oracle family as text_html_extract: extraction
    # is deterministic, so batch and streaming must agree bit-for-bit.
    # Restricted to doc_id % 10 = 0 (the streaming_media_decode
    # convention: the streaming twin certifies composition, the batch
    # twin carries the full-corpus load).
    oracle="""
    SELECT doc_id,
           'Doc ' || doc_id || ' (' || lang || ')' AS title,
           'Doc ' || doc_id || chr(10) || 'Q&A: ' || text AS text,
           CAST(2 AS INTEGER) AS n_blocks,
           CAST(3 AS INTEGER) AS n_dropped
    FROM documents WHERE doc_id % 10 = 0
    """,
    doc="Raw-web extraction under the Structured Streaming engine: the "
    "documents FILE STREAM flows through the deterministic page "
    "template + the boilerpipe extractor's Arrow mapInPandas pass per "
    "micro-batch — stateless, append-mode, no watermark — and must "
    "land bit-identical to the batch twin text_html_extract. The "
    "continuous-ingest shape of a crawling pipeline: pages land, "
    "extraction rides each micro-batch, downstream curation consumes "
    "clean text with no batch/stream fork in the operator code.",
)
def streaming_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.webtext import html_extract
    from qb_data_pipeline_backfill_spark.plans.llm import _doc_page
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
        run_available_now,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    pages = docs.select("doc_id", _doc_page().alias("html"))
    return run_available_now(html_extract(pages, "html"), output_mode="append")


_CLS_STREAM_TOKS = """
    SELECT doc_id,
           list_filter(string_split(regexp_replace(lower(trim(text)),
                       '\\s+', ' ', 'g'), ' '), t -> t != '') AS ts
    FROM documents WHERE doc_id % 10 = 0
"""


@register(
    "streaming_classifier_scores",
    # same closed-form model replay as text_classifier_scores,
    # restricted to the streaming twin's doc_id % 10 = 0 subset
    oracle="""
    WITH toks AS (%s),
    hs AS (
        SELECT doc_id,
               list_transform(ts, t ->
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(t,''),
                                      c -> CAST(ascii(c) AS BIGINT))),
                       (acc,x) -> (acc*31+x) %% 1000003)) AS h
        FROM toks
    ),
    feat AS (
        SELECT doc_id,
               CAST(len(h) + greatest(len(h) - 1, 0) AS BIGINT) AS n_feats,
               CAST(
                   2500
                   + COALESCE(list_sum(list_transform(h,
                         x -> (x * 2654435761) %% 1997 - 998)), 0)
                   + COALESCE(list_sum(list_transform(
                         generate_series(1, len(h) - 1),
                         i -> ((h[i] * 8191 + h[i+1]) %% 1000003)
                              * 2654435761 %% 1997 - 998)), 0)
               AS BIGINT) AS score_micro
        FROM hs
    )
    SELECT doc_id, n_feats, score_micro, score_micro > 0 AS label
    FROM feat
    """
    % _CLS_STREAM_TOKS,
    doc="The hashed-bigram quality classifier under the Structured "
    "Streaming engine: the documents file stream scores per "
    "micro-batch through the SAME codegen column expressions as the "
    "batch twin (classifier_score_expr — stateless, append-mode, no "
    "watermark, no UDF even under streaming) and must land "
    "bit-identical to the closed-form SQL replay. Completes the "
    "continuous-ingest story: extract (streaming_html_extract) then "
    "score, with no batch/stream fork anywhere in the operator code.",
)
def streaming_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import text as X
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
        run_available_now,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    n_feats, score = X.classifier_score_expr("text", bias_micro=2500)
    out = docs.select(
        "doc_id",
        n_feats.alias("n_feats"),
        score.alias("score_micro"),
        (score > 0).alias("label"),
    )
    return run_available_now(out, output_mode="append")


@register(
    "streaming_warc_parse",
    # Same closed-form family as warc_record_parse, restricted to the
    # streaming twin's doc_id % 10 = 0 subset (one record per stream
    # row — the grouping into multi-record blobs is a batch-fixture
    # concern; a real crawl stream delivers records as they land).
    oracle="""
    SELECT doc_id,
           'http://www.' || source || '.com/articles/'
               || CAST(((doc_id % 50) + 50) % 50 AS VARCHAR) AS target_uri,
           CAST(200 AS BIGINT) AS http_status,
           CASE WHEN ((doc_id % 7) + 7) % 7 = 0
                THEN 'WARC/1.0' || chr(13) || chr(10)
                     || 'WARC-Type: trap' || chr(13) || chr(10)
                     || chr(13) || chr(10)
                ELSE '' END || text AS body
    FROM documents WHERE doc_id % 10 = 0
    """,
    doc="WARC parsing under the Structured Streaming engine: the "
    "documents file stream builds one response record per row (the "
    "shared codegen record expression of the batch fixture) and "
    "parses it back through warc_parse's Arrow mapInPandas pass per "
    "micro-batch — stateless, append-mode — landing bit-identical to "
    "the batch twin's fields, trap bodies included. The crawl-ingest "
    "shape: records stream in, parsing rides each micro-batch, no "
    "batch/stream fork in operator code.",
)
def streaming_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators.webtext import warc_parse
    from qb_data_pipeline_backfill_spark.plans.llm import _warc_record_col
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
        run_available_now,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    blobs = docs.select("doc_id", _warc_record_col().alias("warc"))
    parsed = warc_parse(blobs, "warc")
    out = parsed.select(
        "doc_id",
        "target_uri",
        F.col("http_status").cast("long").alias("http_status"),
        "body",
    )
    return run_available_now(out, output_mode="append")


# Oracle building blocks shared with the batch twins in plans.llm; the
# module-level import makes the llm -> stream_plans ordering dependency
# explicit (plans/__init__ imports llm first).
from qb_data_pipeline_backfill_spark.plans.llm import (  # noqa: E402
    _DHASH_HASHES_SQL,
    _DSIR_CTES,
)


from qb_data_pipeline_backfill_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG_EARLY,
)


@register(
    "streaming_fivegram_perplexity",
    # batch-fit model, stream-applied (the streaming_dsir_scores
    # protocol at 5-gram KN strength): the distinct-5-gram NLL table
    # fits ONCE over the FULL batch corpus (+edge — the registered
    # fivegram oracle spliced verbatim), the stream's instances join
    # it stream-static, and only the scored rows restrict to the
    # streamed subset. Complete-mode aggregate over the bounded file
    # stream rebuilds each doc's (count, sum, avg) per micro-batch.
    oracle="""
    SELECT f.doc_id, f.n_ngrams, f.nll_micro, f.nll_micro_avg
    FROM (%s) f
    JOIN documents d ON d.doc_id = f.doc_id
    WHERE f.doc_id %% 4 = 1
    """
    % _REG_EARLY["text_fivegram_perplexity"].oracle,
    doc="5-gram KN perplexity scoring under Structured Streaming: "
    "the interpolated-KN NLL table (operators/text.py "
    "ngram_nll_table) fits once on the batch corpus — the model "
    "artifact — and every micro-batch of the documents file stream "
    "scores via a stateless instance explode + ONE stream-static "
    "join + a complete-mode per-doc aggregate. The deploy shape of "
    "CCNet quality filtering: fit the LM offline, score documents "
    "on the ingest stream. Oracle = the full fivegram replay "
    "restricted to the streamed subset.",
)
def streaming_fivegram_perplexity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import text as X
    from qb_data_pipeline_backfill_spark.plans.llm import _docs_edge
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
        run_available_now,
    )

    probs = X.ngram_nll_table(_docs_edge(spark, sf_dir), 5)
    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(4)) == 1
    )
    inst = X.ngram_instances(docs, 5)
    wn = [f"w{j}" for j in range(1, 6)]
    terms = inst.join(probs, wn).select("doc_id", "nll")
    out = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.sum("nll").alias("nll_micro"),
        F.floor(F.sum("nll") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("long")
        .alias("nll_micro_avg"),
    )
    return run_available_now(out, output_mode="complete")



@register(
    "streaming_dsir_scores",
    # batch-fit model, stream-applied: the λ CTEs fit over the FULL
    # batch corpus (+edge, shared with dsir_select_topk's oracle);
    # only the scored rows restrict to the stream twin's subset.
    oracle=_DSIR_CTES
    + """
    SELECT s.doc_id,
           CAST(COALESCE(w.n_feats, 0) AS BIGINT) AS n_feats,
           CAST(COALESCE(w.logw_micro, 0) AS BIGINT) AS logw_micro
    FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) s
    LEFT JOIN w ON w.doc_id = s.doc_id
    """,
    doc="DSIR model application under Structured Streaming: the λ "
    "table fits ONCE on the batch corpus (the model artifact, "
    "n_buckets-bounded), ships as a literal array, and every "
    "micro-batch of the documents file stream scores through the "
    "same narrow codegen fold as the batch twin — stateless append "
    "mode, no UDF, no shuffle, no batch/stream fork in operator "
    "code. The deploy shape of data selection: fit offline, apply "
    "on the ingest stream.",
)
def streaming_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import curation as C
    from qb_data_pipeline_backfill_spark.plans.llm import _docs_edge
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
        run_available_now,
    )

    lr = C.dsir_fit_weights(
        _docs_edge(spark, sf_dir), F.col("lang") == "en"
    )
    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 0
    )
    return run_available_now(C.dsir_log_weights(docs, lr), output_mode="append")


# --------------------------------------------------------------------------
# r13 curation twins: budget admission + epoch plan under streaming
# --------------------------------------------------------------------------
from qb_data_pipeline_backfill_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG,
)


@register(
    "streaming_budget_fill",
    # the stream twin must admit EXACTLY the batch-selected rows of
    # its subset, so the oracle is the batch query's oracle verbatim,
    # re-projected (cum_tok is a corpus-order fact no stream can
    # carry) and restricted to the streamed subset
    oracle="""
    SELECT doc_id, lang, tok, score_micro
    FROM (%s) WHERE doc_id %% 5 = 0
    """
    % _REG["sample_budget_fill"].oracle,
    doc="Token-budget selection under Structured Streaming — the "
    "deploy shape of budget_fill (operators/curation.py): the exact "
    "windowed selection runs ONCE on the batch corpus; what ships to "
    "the stream is only the per-group ADMISSION CUTOFF — the (score, "
    "id) key of the last admitted row, a |groups|-row broadcast. "
    "Because the batch selection is a prefix of the (score desc, id "
    "asc) order, cutoff admission reproduces the selected set "
    "row-for-row: every micro-batch filters against the cutoff in "
    "stateless append mode — no window, no state store, no "
    "batch/stream fork in operator code. The same artifact-then-"
    "apply split as streaming_dsir_scores.",
)
def streaming_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import curation as C
    from qb_data_pipeline_backfill_spark.operators import text as X
    from qb_data_pipeline_backfill_spark.plans.llm import _docs
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
    )

    _, score = X.classifier_score_expr("text", 0)
    tok = C.doc_token_count("text")
    sel = C.budget_fill(
        _docs(spark, sf_dir), budget=3000, score=score, tok=tok
    )
    # last admitted key per group under (score desc, id asc): the
    # lexicographic min of (score_micro, -doc_id) over the selection
    cutoff = sel.groupBy("lang").agg(
        F.min(
            F.struct(
                F.col("score_micro").alias("s"),
                (F.col("doc_id") * -1).alias("neg_id"),
            )
        ).alias("cut")
    )
    _, score_s = X.classifier_score_expr("text", 0)
    scored = (
        documents_stream(spark, sf_dir)
        .filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
        .select(
            "doc_id",
            "lang",
            F.coalesce(
                C.doc_token_count("text").cast("long"), F.lit(0)
            ).alias("tok"),
            score_s.cast("long").alias("score_micro"),
        )
    )
    admitted = (
        scored.join(F.broadcast(cutoff), "lang")
        .filter(
            (F.col("score_micro") > F.col("cut.s"))
            | (
                (F.col("score_micro") == F.col("cut.s"))
                & ((F.col("doc_id") * -1) >= F.col("cut.neg_id"))
            )
        )
        .select("doc_id", "lang", "tok", "score_micro")
    )
    return run_available_now(admitted, output_mode="append")


@register(
    "streaming_epoch_plan",
    # group-grained aggregate: the stream consumes the whole table,
    # so the oracle IS the batch twin's, verbatim
    oracle=_REG["sample_epoch_plan"].oracle,
    doc="Data-constrained epoch plan under Structured Streaming "
    "(operators/sample.py epoch_plan): the per-source token "
    "availability aggregates across micro-batches in complete mode "
    "(one map-side-combined streaming agg on the group key), and the "
    "integer plan arithmetic — floor-exact target share, ceil-exact "
    "epoch count, final-epoch take — projects over the streaming "
    "aggregate unchanged. Batch and stream share the operator; only "
    "the source differs.",
)
def streaming_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import curation as C
    from qb_data_pipeline_backfill_spark.operators import sample as SA
    from qb_data_pipeline_backfill_spark.plans.llm import _EPOCH_WEIGHTS
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
    )

    plan = SA.epoch_plan(
        documents_stream(spark, sf_dir),
        budget_tokens=2_000_000,
        weights=_EPOCH_WEIGHTS,
        tok=C.doc_token_count("text"),
    )
    return run_available_now(plan, output_mode="complete")


@register(
    "streaming_gopher_quality",
    # stateless codegen rules: stream result == batch result on the
    # streamed subset; oracle = the batch oracle, filtered
    # doc_id >= 0: the batch oracle includes the negative-id edge
    # fixtures, which the parquet file stream never carries
    oracle="""
    SELECT * FROM (%s) WHERE doc_id %% 4 = 0 AND doc_id >= 0
    """
    % _REG["text_gopher_quality"].oracle,
    doc="Gopher quality rules under Structured Streaming "
    "(operators/text.py gopher_quality): the full rule suite is "
    "stateless codegen over each document, so every micro-batch "
    "scores in append mode with no state store and no batch/stream "
    "fork — the filter a landing-directory corpus applies on "
    "ingest. Oracle shared with the batch twin, restricted to the "
    "streamed subset.",
)
def streaming_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import text as X
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(4)) == 0
    )
    return run_available_now(X.gopher_quality(docs), output_mode="append")


@register(
    "streaming_image_dhash",
    # the contract replay's closed-form hashes over the streamed
    # subset: decode + perceptual hash are deterministic, so batch
    # and stream must agree bit-for-bit
    oracle="""
    WITH ids AS (
        SELECT doc_id AS media_id, doc_id AS src
        FROM documents WHERE doc_id %% 6 = 0
    ),
    %s
    SELECT h.media_id, d.w AS width, d.h AS height, h.dhash
    FROM hashes h JOIN dims d USING (media_id)
    """
    % _DHASH_HASHES_SQL,
    doc="Perceptual dHash under Structured Streaming: every 6th "
    "document's formula image decodes and hashes per micro-batch "
    "through the SAME codec + codegen gradient expressions as the "
    "batch twin (contract_image_dhash_replay) — stateless append "
    "mode, the ingest-time fingerprinting shape of an image "
    "near-dup pipeline. Oracle = the closed-form dhash replay over "
    "the streamed subset.",
)
def streaming_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import multimodal as M
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(6)) == 0
    )
    out = M.image_dhash(M.synthesize_images(docs, fmt="ppm"))
    return run_available_now(out, output_mode="append")


@register(
    "streaming_winnow_fingerprints",
    # stateless per-doc selection: oracle = the batch oracle verbatim,
    # restricted to the streamed subset (file stream carries no
    # negative-id edge fixtures)
    oracle="""
    SELECT * FROM (%s) WHERE doc_id %% 6 = 0 AND doc_id >= 0
    """
    % _REG["text_winnow_fingerprints"].oracle,
    doc="Winnowing fingerprints under Structured Streaming "
    "(operators/text.py winnow_fingerprints): per-document selection "
    "is per-document and (since r16) fully stateless — the fused "
    "Arrow pass fingerprints each micro-batch in append mode, the "
    "ingest-time fingerprinting half of MOSS matching (the pair "
    "phase joins against an accumulating index downstream). Oracle "
    "shared with the batch twin, restricted to the streamed subset.",
)
def streaming_winnow_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import text as X
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(6)) == 0
    )
    # r16: the fused winnow pass is stateless per document, so the
    # stream appends each micro-batch's fingerprints (each doc lands
    # in exactly one batch — the union equals the old complete-mode
    # final state, oracle-pinned); no aggregation state at all.
    return run_available_now(
        X.winnow_fingerprints(docs, k=8, w=4), output_mode="append"
    )


from qb_data_pipeline_backfill_spark.plans.registry import (  # noqa: E402
    REGISTRY as _REG_G711,
)


@register(
    "streaming_audio_g711",
    # The registered batch oracle spliced verbatim (the
    # streaming_media_decode protocol): G.711 expansion is
    # deterministic and stateless, so the streamed run must land
    # bit-identical to the batch twin.
    oracle=_REG_G711["multimodal_audio_g711_stats"].oracle,
    doc="G.711 telephony-WAV decode under Structured Streaming: the "
    "documents file stream synthesizes mu-law (even ids) and A-law "
    "(odd ids) RIFF files per micro-batch, decodes them through the "
    "same Arrow mapInPandas G.711 expansion as the batch twin "
    "(operators/multimodal.py _decode_wav fmt tags 7/6), and "
    "aggregates per-clip stats in complete mode — the "
    "continuous-ingest shape of a speech-corpus pipeline. Oracle = "
    "the batch query's closed-form per-byte replay, verbatim.",
)
def streaming_audio_g711(spark: SparkSession, sf_dir: str) -> DataFrame:
    from qb_data_pipeline_backfill_spark.operators import multimodal as M
    from qb_data_pipeline_backfill_spark.streaming.jobs import (
        documents_stream,
        run_available_now,
    )

    docs = documents_stream(spark, sf_dir).filter(
        F.pmod(F.col("doc_id"), F.lit(10)) == 7
    )
    ul = M.synthesize_audio(
        docs.filter(F.pmod("doc_id", F.lit(2)) == 0), fmt="ulaw"
    )
    al = M.synthesize_audio(
        docs.filter(F.pmod("doc_id", F.lit(2)) == 1), fmt="alaw"
    )
    decoded = M.decode_audio(ul.unionByName(al))
    ex = decoded.select(
        "media_id", "sample_rate", F.posexplode("samples").alias("i", "v")
    )
    out = ex.groupBy("media_id", "sample_rate").agg(
        F.count(F.lit(1)).cast("long").alias("n_samples"),
        F.sum("v").cast("long").alias("amp_sum"),
        F.sum(F.col("v") * (F.pmod(F.col("i"), F.lit(97)) + 1))
        .cast("long")
        .alias("pos_checksum"),
    )
    return run_available_now(out, output_mode="complete")
