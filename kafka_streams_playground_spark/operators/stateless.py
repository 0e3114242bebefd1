"""Stateless per-record operators (SURVEY.md §2.2, P1-P7).

Reference operators are inline Scala closures over whole deserialized objects
(filter ``KafkaStreamsApp.scala:107-109``, mapValues ``:114-116``,
flatMapValues ``:121-123``, selectKey ``:173``, copy-with-modification
``:170``, groupBy key transform ``:126-128``). Spark-first, each becomes a
Column expression — Catalyst can push filters into the scan and prune columns,
which the reference structurally cannot (it deserializes every record fully
before any predicate runs; SURVEY §4.1).

These wrappers stay trivially thin on purpose: any extra indirection would
only obscure the logical plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_records(df: DataFrame, predicate: Column) -> DataFrame:
    """P1 — keep records matching a predicate (``filter`` ``:107-109``)."""
    return df.filter(predicate)


def project(df: DataFrame, *cols: Column | str) -> DataFrame:
    """P2 — mapValues as projection (``mapValues`` ``:114-116``)."""
    return df.select(*cols)


def explode_list(df: DataFrame, list_col: str, out_col: str, *keep: str) -> DataFrame:
    """P3 — flatMapValues over a list field: one row per element
    (``flatMapValues`` ``:121-123, :136-138``)."""
    return df.select(*keep, F.explode(F.col(list_col)).alias(out_col))


def drop_nulls(df: DataFrame, col: str) -> DataFrame:
    """P4 — flatMapValues(Option.toIterable): drop None results (``:185``)."""
    return df.filter(F.col(col).isNotNull())


def select_key(df: DataFrame, key_expr: Column | str, key_name: str = "key") -> DataFrame:
    """P5 — re-key the stream (``selectKey`` ``:173``).

    Kafka Streams marks the stream repartition-required here and later writes
    a repartition topic; in Spark the downstream join/groupBy inserts the
    shuffle exchange itself — no eager repartition, and AQE may even avoid it
    (broadcast). We only materialize the new key column.
    """
    key = F.col(key_expr) if isinstance(key_expr, str) else key_expr
    return df.withColumn(key_name, key)


def with_computed(df: DataFrame, name: str, expr: Column) -> DataFrame:
    """P6 — copy-with-modification as a computed column
    (``order.copy(amount = order.amount * discount.amount)`` ``:170``)."""
    return df.withColumn(name, expr)


def first_letter_key(col: str) -> Column:
    """P7 — the reference's groupBy key transform: lowercased first char of
    the user id (``userId.charAt(0).toLower`` ``:126-128``)."""
    return F.lower(F.substring(F.col(col), 1, 1))
