"""JSON serde (SURVEY.md §2.1 S6/S7).

The reference's wire format is schemaless JSON bridged by a generic circe
serde (``KafkaStreamsApp.scala:60-73``): serialize = ``asJson.noSpaces``
(``:61``), deserialize = ``decode[A]`` with malformed records **logged and
dropped** (``Option.empty`` on failure, ``:64-70``).

Spark-first mapping: ``from_json`` in its default PERMISSIVE mode yields NULL
for corrupt records; a ``filter(isNotNull)`` reproduces drop-on-failure
exactly. Both are Catalyst expressions — JVM-side, codegen'd, no Python in
the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


def deserialize_json(
    df: DataFrame,
    schema: StructType,
    value_col: str = "value",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """bytes/str JSON → typed columns, dropping malformed records (S6).

    Mirrors the reference's permissive decode-or-drop (``KafkaStreamsApp.scala
    :64-70``): rows whose JSON fails to parse are filtered out, not errored.
    PERMISSIVE ``from_json`` yields an all-null struct (not NULL) on parse
    failure, so malformed rows are detected via the standard
    ``columnNameOfCorruptRecord`` idiom.
    """
    with_corrupt = StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])
    parsed = F.from_json(
        F.col(value_col).cast("string"),
        with_corrupt,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    out = df.select(*keep_cols, parsed.alias("_rec")).filter(
        F.col(f"_rec.{_CORRUPT}").isNull() & F.col("_rec").isNotNull()
    )
    return out.select(*keep_cols, "_rec.*").drop(_CORRUPT)


def serialize_json(df: DataFrame, *cols: str, out_col: str = "value") -> DataFrame:
    """Typed columns → one JSON string column (S7, ``asJson.noSpaces`` ``:61``)."""
    struct: Column = F.struct(*[F.col(c) for c in cols]) if cols else F.struct("*")
    return df.withColumn(out_col, F.to_json(struct))
