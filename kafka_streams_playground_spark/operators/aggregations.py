"""Grouping & aggregation operators (SURVEY.md §2.4, A1-A5).

Reference surface: key-changing ``groupBy`` (``KafkaStreamsApp.scala:125-128``),
``groupByKey`` (``:140``), continuous ``count`` (``:144``), 10-second tumbling
custom fold that *is* count (``:142, :146-148``), and changelog emission via
``toStream`` (``:150``).

Spark-first: ``groupBy(...).agg(...)`` — Catalyst plans a partial (map-side)
aggregate before the shuffle and a final aggregate after, which the reference's
single-phase per-key state update cannot do; at 100 TB the partial agg is what
keeps the shuffle small. Tumbling windows are the ``window()`` struct column;
changelog emission is ``outputMode("update")`` on the streaming query
(:mod:`..streaming`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def count_by(df: DataFrame, *keys: Column | str, out: str = "cnt") -> DataFrame:
    """A1/A2/A3 — grouped running count (``groupBy`` ``:125-128`` +
    ``count`` ``:144``; also completes the reference's dead-code A1 group)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(out))


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[Column | str],
    aggs: list[Column],
    window_alias: str = "window",
) -> DataFrame:
    """A4 — tumbling-window aggregate (``windowedBy(TimeWindows.of(10 s))
    .aggregate`` ``:142, :146-148``).

    The ``window(ts, duration)`` struct plays ``Windowed[K]`` (SURVEY §1.1).
    Windows are epoch-aligned in both Kafka Streams and Spark, so batch
    results agree with the oracle's ``time_bucket``.
    """
    return df.groupBy(F.window(F.col(ts_col), duration).alias(window_alias), *keys).agg(*aggs)


def tumbling_count(
    df: DataFrame, ts_col: str, duration: str, *keys: Column | str, out: str = "cnt"
) -> DataFrame:
    """A4 specialization — the reference's fold ``(counter + 1)`` starting at
    ``0L`` (``:148``) is exactly COUNT."""
    return tumbling_window_agg(df, ts_col, duration, list(keys), [F.count(F.lit(1)).alias(out)])


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level (salted) aggregation — the skew mitigation SCALE.md §4
    documents, as a reusable operator.

    When one group key carries a pathological share of rows (a bot user, an
    empty-string key), the single final-agg task for that key becomes the
    straggler. Salting splits each group into ``n_salts`` sub-groups on a
    random salt, aggregates partially per (key, salt), then combines the
    sub-aggregates per key — two small shuffles instead of one skewed one.

    ``aggs`` maps output column → (combine_fn_name, partial_agg_column);
    combine_fn must be decomposable (sum→sum, count→sum, max→max, min→min).
    ``keys`` must be plain column NAMES: the combine phase groups the
    partial aggregate by the same names, so an expression key would be
    re-evaluated against columns that no longer exist — compute expression
    keys with ``withColumn`` first. AQE's skew handling covers sort-merge
    joins; for aggregations this operator is the explicit tool.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    partial = df.withColumn("_salt", salt).groupBy(*keys, F.col("_salt")).agg(
        *[c.alias(f"_p_{name}") for name, (_, c) in aggs.items()]
    )
    combine = {
        "sum": F.sum,
        "count": F.sum,  # counts combine by summing partial counts
        "max": F.max,
        "min": F.min,
    }
    return partial.groupBy(*keys).agg(
        *[combine[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )
