"""Temporal operators beyond the reference's tumbling windows: as-of join,
sessionization (gaps-and-islands), sliding windows.

Kafka Streams (the reference) offers only tumbling windows and ±interval
stream-stream joins (KafkaStreamsApp.scala:142, :182 — SURVEY §2.9). These
three are the temporal operators a user of any serious stream/analytics
engine reaches for next; each is expressed Spark-first:

* **as-of join** — NOT a range join (which explodes candidate pairs): the
  union-and-sort formulation costs one shuffle + one in-partition sort,
  linear in input, the same plan shape at 100 TB.
* **sessionization** — lag/cumulative-sum gaps-and-islands: one shuffle on
  the key, two in-partition window passes, no self-join.
* **sliding windows** — Spark's native multi-assign ``window(ts, size,
  slide)`` (each row expands to size/slide rows *before* the partial agg,
  so the shuffle carries per-window partials, not raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streams_playground_spark.plans.registry import query
from kafka_streams_playground_spark.sources.parquet import load_table

SESSION_GAP_S = 6 * 3600  # 6 h session gap (fixture events average ~2/user/day)


@query(
    "asof_purchase_last_click",
    oracle="""
    SELECT p.event_id, p.user_id,
           CAST(floor(epoch(p.ts::TIMESTAMP)) AS BIGINT) AS purchase_epoch,
           (SELECT c.event_id FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click'
               AND c.ts <= p.ts
             ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id,
           (SELECT CAST(floor(epoch(c.ts::TIMESTAMP)) AS BIGINT) FROM events c
             WHERE c.user_id = p.user_id AND c.event_type = 'click'
               AND c.ts <= p.ts
             ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_epoch
    FROM events p WHERE p.event_type = 'purchase'
    """,
    tags=("extension", "temporal", "asof", "join"),
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (left): each purchase event picks the user's latest click
    at-or-before it. Spark lacks a native ASOF JOIN; the scalable
    formulation is union-tag-sort — tag both sides, union, and take
    ``last_value(click, ignoreNulls)`` over (user, ts, side, id) ordering:

    * ONE hash exchange on user_id + ONE in-partition sort — linear, no
      candidate-pair explosion (a time-range join would buffer every click
      within the bound; this buffers exactly one value per row);
    * ties (click.ts == purchase.ts) resolve "click first" via the side tag,
      matching the oracle's ``c.ts <= p.ts``; among equal-ts clicks the
      largest event_id wins in both engines.

    This is the plan shape that survives 100 TB: the same single
    shuffle+sort regardless of time-bound width, where a range join's state
    grows with click density.
    """
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(0).alias("side"),
        F.col("event_id"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.lit(1).alias("side"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("click_id"),
    )
    u = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("side").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last(F.when(F.col("click_id").isNotNull(), F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_click_ts"),
    )
    return carried.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("purchase_epoch"),
        "last_click_id",
        F.unix_timestamp("last_click_ts").alias("last_click_epoch"),
    )


@query(
    "session_windows_per_user",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts::TIMESTAMP)
                     - epoch((lag(ts) OVER w)::TIMESTAMP)
                     >= {SESSION_GAP_S}
             THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT *, CAST(SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
      ) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           CAST(floor(epoch(MIN(ts)::TIMESTAMP)) AS BIGINT) AS session_start,
           CAST(floor(epoch(MAX(ts)::TIMESTAMP)) AS BIGINT) AS session_end,
           COUNT(*) AS n_events,
           FLOOR(SUM(value) * 100 + 0.5) / 100 AS sum_value
    FROM numbered GROUP BY user_id, session_no
    """,
    tags=("extension", "temporal", "session"),
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 6 h inactivity gap — gaps-and-islands: flag a
    row as session-opening when the previous event of the same user is at
    least the gap away; a running sum of flags numbers the sessions; group
    by (user, session_no). Batch twin of ``session_window()`` (the
    streaming form in streaming/queries.py) with IDENTICAL boundary
    semantics: the gap is computed on precise (sub-second) epochs and a gap
    exactly equal to SESSION_GAP_S opens a new session, matching
    session_window's end-exclusive bound. One shuffle on user_id, two
    in-partition window passes, no self-join — the linear-cost
    sessionization that holds at 100 TB."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.lag("ts").over(w).isNull() | (gap >= SESSION_GAP_S), 1)
        .otherwise(0)
        .alias("new_session"),
    )
    wnum = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = flagged.withColumn("session_no", F.sum("new_session").over(wnum))
    return numbered.groupBy("user_id", "session_no").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        F.unix_timestamp(F.max("ts")).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        # floor(x*100+0.5)/100, not ROUND(x,2): double summation order
        # differs across engines, and ROUND resolves tie-boundary cents
        # differently in Spark vs DuckDB (same hazard as q5_paid_orders).
        (F.floor(F.sum("value") * 100 + 0.5) / 100).alias("sum_value"),
    )


@query(
    "sliding_window_event_counts",
    oracle="""
    SELECT ws AS window_start, event_type, COUNT(*) AS cnt
    FROM (
      SELECT e.event_type,
             (FLOOR(epoch(e.ts::TIMESTAMP) / 10) * 10 - 10 * g.g)::BIGINT AS ws,
             epoch(e.ts::TIMESTAMP) AS es
      FROM events e CROSS JOIN (SELECT unnest(range(3)) AS g) g
    )
    WHERE es >= ws AND es < ws + 30
    GROUP BY 1, 2
    """,
    tags=("extension", "temporal", "sliding"),
)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows — 30 s length, 10 s slide — per event type.
    Spark's ``window(ts, size, slide)`` multi-assigns each row to its
    size/slide overlapping windows *before* the partial aggregate, so the
    shuffle carries per-(window,type) partials, not ×3 raw rows. The oracle
    reproduces epoch-aligned multi-assignment with an explicit 3-way
    expansion."""
    events = load_table(spark, sf_dir, "events")
    win = events.groupBy(
        F.window("ts", "30 seconds", "10 seconds").alias("window"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return win.select(
        F.unix_timestamp("window.start").alias("window_start"), "event_type", "cnt"
    )
