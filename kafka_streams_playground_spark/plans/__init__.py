"""Query plans: the reference's five topologies re-expressed as DataFrame
plans, extra relational coverage, and the north-star LLM-pipeline queries.
Importing this package populates the registry."""

from kafka_streams_playground_spark.plans.registry import REGISTRY, QuerySpec, query

# Import for side effects: each module registers its queries.
from kafka_streams_playground_spark.plans import topologies  # noqa: F401
from kafka_streams_playground_spark.plans import relational  # noqa: F401
from kafka_streams_playground_spark.plans import temporal  # noqa: F401
from kafka_streams_playground_spark.streaming import queries as _streaming_queries  # noqa: F401
from kafka_streams_playground_spark.plans import northstar_dedup  # noqa: F401
from kafka_streams_playground_spark.plans import northstar_similarity  # noqa: F401
from kafka_streams_playground_spark.plans import northstar_text  # noqa: F401
from kafka_streams_playground_spark.plans import northstar_multimodal  # noqa: F401

__all__ = ["REGISTRY", "QuerySpec", "query"]
