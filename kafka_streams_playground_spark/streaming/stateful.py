"""Custom keyed stateful operators via ``applyInPandasWithState``.

The reference's aggregate (KafkaStreamsApp.scala:146-148) is a custom fold
``(init=0L, adder=counter+1)`` whose every state update is emitted
downstream (``toStream.foreach``, :150-152) — true per-record changelog
emission, which Spark's built-in aggregates only approximate per
micro-batch in update mode. ``applyInPandasWithState`` closes that gap: a
Python handler owns the keyed state and can emit one output row per input
record, exactly the reference's emission cadence.

(Spark 4.x also offers ``transformWithStateInPandas``; this environment's
protobuf install can't back it, so the stable Arrow-based
``applyInPandasWithState`` is used — same keyed-state contract.)

Scale: state is one BIGINT per key in the state store; the handler
receives Arrow batches per key, vectorized with numpy ranges — no per-row
Python loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _running_count(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-key running event counter emitting one changelog row per input
    record. The iterator can hand a key's micro-batch as SEVERAL Arrow
    chunks in arrival order — sorting each chunk independently would
    interleave wrongly, so all chunks are concatenated and sorted once per
    (key, micro-batch) before counts are assigned; ordering is then
    globally (ts, event_id) within the batch and replays are deterministic.
    Memory bound = one key's rows in one micro-batch."""
    c = state.get[0] if state.exists else 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        n = len(pdf)
        yield pd.DataFrame(
            {
                "user_id": pdf["user_id"].values,
                "event_id": pdf["event_id"].values,
                "running_cnt": range(c + 1, c + n + 1),
            }
        )
        c += n
    state.update((c,))


def running_count_per_key(sdf: DataFrame) -> DataFrame:
    """The reference's aggregate-fold + toStream changelog (:146-152) as a
    custom stateful operator: every arriving event emits (user_id, event_id,
    running_cnt) with the post-update counter value."""
    return sdf.groupBy("user_id").applyInPandasWithState(
        _running_count,
        outputStructType="user_id BIGINT, event_id BIGINT, running_cnt BIGINT",
        stateStructType="c BIGINT",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
