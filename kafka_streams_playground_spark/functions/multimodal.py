"""Multimodal column handling (north star): opaque ``binary`` payloads with
typed metadata, and Arrow-batched decode/feature-extract plumbing.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic stub (``_decode_stub``); everything around it —
schema, Arrow batch shape, ``mapInPandas`` signature, partitioning — is the
real 100 TB plumbing: binary columns never pass through Python row-at-a-time,
only as Arrow buffers, and feature extraction emits a narrow typed frame so
downstream joins don't drag blob bytes through shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Model a multimodal table: utf-8 text bytes stand in for an encoded
    image; metadata is a typed struct (media_type, width, height) the way a
    real ingest would carry container-format headers. Derivations are
    deterministic so the oracle can recompute them."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            ((F.col("doc_id") * 37) % 480 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def _decode_stub(buf: bytes) -> list[float]:
    """STUB decoder — stands in for PIL/ffmpeg/torchvision, which are not in
    this container. Deterministic fake "pixel features": the payload is
    DECODED (UTF-8, the fake container format) and the first FEATURE_DIM
    codepoints scale by 1/255. Codepoints, not raw bytes: the oracle reads
    positions via ``ascii(substr(text, i, 1))`` (codepoints), and a
    byte-indexed stub silently diverged on non-ASCII payloads — found by
    the round-11 adversarial documents sweep; ASCII inputs are unchanged
    (byte == codepoint). A real deployment swaps only this function; the
    Arrow plumbing around it is production-shaped."""
    head = buf.decode("utf-8")[:FEATURE_DIM]
    feats = [ord(c) / 255.0 for c in head]
    feats += [0.0] * (FEATURE_DIM - len(feats))
    return feats


def decode_features(mm: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over (doc_id, content, meta).

    ``mapInPandas``: each Arrow batch arrives as a pandas frame; the stub
    decoder maps the binary column to a fixed-dim float vector. Output is the
    narrow FEATURES_SCHEMA — blob bytes stay in the scan stage and never
    shuffle. At scale, size batches via
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound decoder memory.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "features": pdf["content"].map(_decode_stub),
                }
            )

    return mm.select("doc_id", "content").mapInPandas(decode, FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("resized_bytes", LongType()),
    ]
)


def _resize_stub(buf: bytes, target_w: int, target_h: int) -> bytes:
    """STUB resize — stands in for PIL's ``Image.resize``. Deterministic
    fake: keep the first target_w×target_h bytes ("downsampled pixels").
    Same swap-only contract as :func:`_decode_stub`."""
    return buf[: target_w * target_h]


def resize_images(mm: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Arrow-batched resize over (doc_id, content, meta) — the
    decode→transform→re-encode pattern for image normalization before
    feature extraction. Emits byte-count accounting (the narrow audit frame
    a pipeline monitors); the resized payload itself would be written
    straight to a partitioned sink (sources/sinks.py), never shuffled."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["content"].map(lambda b: _resize_stub(b, target_w, target_h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_bytes": pdf["content"].map(len).astype("int64"),
                    "resized_bytes": resized.map(len).astype("int64"),
                }
            )

    return mm.select("doc_id", "content").mapInPandas(resize, RESIZED_SCHEMA)


AUDIO_CHUNK = 32  # samples per analysis window

AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("energy", DoubleType()),
    ]
)


def audio_chunk_energy(mm: DataFrame) -> DataFrame:
    """Arrow-batched audio analysis: DECODE the payload (STUB: UTF-8 decode,
    one CODEPOINT = one unsigned sample — stands in for an ffmpeg/soundfile
    decode; the round-11 checksum lesson applies here too: the byte-indexed
    form silently diverged from the codepoint oracle once a non-ASCII
    payload spanned a whole chunk, found by the round-12 casing-trap
    sweep), window it into AUDIO_CHUNK-sample chunks, emit one
    (doc_id, chunk_idx, energy) row per complete chunk where energy is the
    mean sample amplitude (in [0,1] for byte-range samples; exotic
    codepoints exceed the 8-bit stub scale — both engines compute the
    identical value, which is the contract; a real decode swap restores
    genuine PCM ranges). The exploding transform runs inside
    ``mapInPandas`` — the blob is cut into chunks in the scan stage and only
    the narrow numeric frame ever shuffles (same contract as
    :func:`decode_features`); numpy does the chunking as one reshape per
    batch, no per-sample Python."""
    import numpy as np

    def chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cidx, energy = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                # stub decode: codepoint array via UTF-32-LE round trip
                # (vectorized; no per-sample Python loop)
                cp = np.frombuffer(
                    bytes(buf).decode("utf-8").encode("utf-32-le"), dtype=np.uint32
                )
                n = len(cp) // AUDIO_CHUNK
                if n == 0:
                    continue
                # dim-ordered mean: sum in sample order, then scale (matches
                # the oracle's literal 32-term sum over doubles)
                e = cp[: n * AUDIO_CHUNK].reshape(n, AUDIO_CHUNK).astype(np.float64)
                acc = np.zeros(n)
                for j in range(AUDIO_CHUNK):
                    acc = acc + e[:, j]
                ids.extend([doc_id] * n)
                cidx.extend(range(n))
                energy.extend(acc / (AUDIO_CHUNK * 255.0))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(cidx, dtype="int64"),
                    "energy": pd.Series(energy, dtype="float64"),
                }
            )

    return mm.select("doc_id", "content").mapInPandas(chunks, AUDIO_SCHEMA)
