"""kafka_streams_playground_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference ``rcardin/kafka-streams-playground`` (a Kafka Streams Scala DSL
tutorial application, ``src/main/scala/KafkaStreamsApp.scala``), re-expressed
Spark-first:

* **Batch relational core** — the reference's five topologies
  (``KafkaStreamsApp.scala:106-189``) as declarative DataFrame plans, checked
  against a DuckDB oracle on the driver's TPC-H-ish parquet fixtures.
* **Structured Streaming layer** — Kafka source/sink, watermarks, tumbling
  windows, update-mode changelog emission, latest-per-key (KTable) state,
  interval stream-stream joins.
* **LLM-data-pipeline extensions** (north star) — dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), embedding similarity search, text analysis,
  multimodal (binary) column plumbing — all designed for 100 TB scale: no
  driver-side loops, broadcast only for provably-small sides, shuffle-once
  plans, Arrow-batched pandas UDFs where Python is unavoidable.

Nothing here ports the reference's implementation (processor nodes, serdes,
RocksDB stores); only the *observable semantics* are reproduced, on Catalyst.
"""

__version__ = "0.1.0"
