"""SparkSession factory and runtime configuration.

The reference configures its runtime via ``StreamsConfig`` properties
(``KafkaStreamsApp.scala:192-195``: application id, bootstrap servers, default
key serde). Our equivalent is the SparkSession builder plus a small set of
runtime confs that every query needs regardless of who built the session
(the driver harness builds its own session, so runtime-settable confs are
also applied per-query via :func:`configure_runtime`).

Scale notes (100 TB / 1000-executor design):
* AQE on — runtime coalescing, skew-join splitting, dynamic join strategy.
* ``spark.sql.session.timeZone=UTC`` — fixtures store naive timestamps; UTC
  makes ``unix_timestamp``/window bucketing agree with the DuckDB oracle.
* Shuffle partition count is a knob, not a constant: default 32 for local
  tests; a real deployment sizes it so a shuffle partition is ~128-200 MB
  (AQE coalesces down from a deliberately-high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to any session (including driver-provided).
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    # \r stage-progress spam corrupts harnesses that tail-capture stdout
    # (it cost round 2 its bench artifact). Static conf: only takes effect
    # on sessions built here; the runtime set below is a harmless no-op.
    "spark.ui.showConsoleProgress": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for pandas UDF / mapInPandas paths (north-star operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The events fixture stores TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects; read as epoch-nanos long and normalize in sources.parquet.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Read naive parquet timestamps as TIMESTAMP (session-tz UTC), not NTZ:
    # watermarks/windows require TimestampType, and UTC keeps epoch math
    # identical to the DuckDB oracle.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Driver-built sessions default to 200 shuffle partitions; on local[32]
    # that costs ~200 state-store tasks per tiny streaming micro-batch. AQE
    # coalesces batch plans but not streaming state, so pin a sane local
    # value (env-overridable). A real cluster deployment sizes this to data.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
}


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not runtime-settable in this build — leave the default.
            pass
    return spark


def get_spark(
    app_name: str = "kafka-streams-playground-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    # Explicit argument wins over the _RUNTIME_CONF default.
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = builder.getOrCreate()
    configure_runtime(spark)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark
