"""Multimodal-column queries (north star): binary payloads + typed metadata,
stub decode via Arrow-batched mapInPandas, frame sampling.

The stub decoder reads the first bytes of the payload; since the payload is
the utf-8 encoding of ``text``, the oracle recomputes the identical features
from ``ascii(substr(text, i, 1))`` — the Python path is cross-checked by SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_playground_spark.functions.multimodal import (
    FEATURE_DIM,
    attach_binary_payload,
    decode_features,
)
from kafka_streams_playground_spark.plans.registry import query
from kafka_streams_playground_spark.sources.parquet import load_table

FRAME_STRIDE = 4
CHARS_PER_FRAME = 16


@query(
    "mm_image_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(n_chars % 640 + 1 AS INT) AS width,
           CAST((doc_id * 37) % 480 + 1 AS INT) AS height,
           ROUND((n_chars % 640 + 1) * 1.0 / ((doc_id * 37) % 480 + 1), 4)
               AS aspect_ratio
    FROM documents
    """,
    tags=("northstar", "multimodal"),
)
def mm_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata pass over a multimodal table: blob size + header-style
    fields, no decode. Column pruning keeps the blob out of this scan
    entirely at the parquet level when metadata is a separate column — the
    reason metadata travels as a typed struct, not inside the payload."""
    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.octet_length("content").cast("bigint").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.round(F.col("meta.width") / F.col("meta.height"), 4).alias("aspect_ratio"),
    )


_FEATSUM_SQL = " + ".join(
    f"(ascii(substr(text, {i + 1}, 1)) / 255.0)" for i in range(FEATURE_DIM)
)


@query(
    "mm_decoded_feature_checksum",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           ROUND({_FEATSUM_SQL}, 4) AS feat_sum
    FROM documents
    """,
    tags=("northstar", "multimodal"),
)
def mm_decoded_feature_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drives the Arrow-batched ``mapInPandas`` decode path end-to-end and
    reduces the feature vector to a checksum the SQL oracle can recompute
    (stub decode = first FEATURE_DIM decoded CODEPOINTS / 255, matching
    the oracle's ascii(substr(...)) for any text — the byte-indexed stub
    diverged on non-ASCII payloads, round-11 adversarial sweep; short
    texts zero-pad in both engines since ascii('') = 0). Floats are
    summed in doc order in both engines → doubles agree."""
    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    feats = decode_features(mm)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(
            F.aggregate(
                "features", F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            4,
        ).alias("feat_sum"),
    )


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, CAST(n_chars // {CHARS_PER_FRAME} AS BIGINT) AS n_frames
      FROM documents
    )
    SELECT doc_id, CAST(unnest(range(0, n_frames, {FRAME_STRIDE})) AS BIGINT) AS frame_idx
    FROM v WHERE n_frames > 0
    """,
    tags=("northstar", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video-shaped payloads: every FRAME_STRIDE-th frame
    index, one output row per sampled frame (the explode pattern that feeds
    per-frame decode). Frame count is derived deterministically from payload
    size; real containers read it from the header struct."""
    docs = load_table(spark, sf_dir, "documents")
    v = docs.select(
        "doc_id", (F.col("n_chars") / CHARS_PER_FRAME).cast("bigint").alias("n_frames")
    ).filter(F.col("n_frames") > 0)
    return v.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1, F.lit(FRAME_STRIDE))
        ).alias("frame_idx"),
    )


RESIZE_W, RESIZE_H = 16, 16


@query(
    "mm_resize_audit",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
           CAST(LEAST(octet_length(encode(text)), {RESIZE_W * RESIZE_H}) AS BIGINT)
               AS resized_bytes
    FROM documents
    """,
    tags=("northstar", "multimodal", "resize"),
)
def mm_resize_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize pass (decode → resize → re-encode) with byte accounting.
    The resize itself is the documented stub (functions/multimodal.py:
    _resize_stub — no image libs in this container); the mapInPandas
    plumbing, audit schema, and blob-stays-map-side discipline are the real
    100 TB pattern."""
    from kafka_streams_playground_spark.functions.multimodal import resize_images

    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    return resize_images(mm, RESIZE_W, RESIZE_H)


_CHUNK_SUM = " + ".join(
    f"ascii(substr(text, chunk_idx * 32 + {j + 1}, 1))" for j in range(32)
)


@query(
    "mm_audio_chunk_energy",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, text,
             CAST(length(text) // 32 AS BIGINT) AS n_chunks
      FROM documents
    ),
    c AS (
      SELECT doc_id, text, CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
      FROM a WHERE n_chunks > 0
    )
    SELECT doc_id, chunk_idx,
           FLOOR(({_CHUNK_SUM}) / (32 * 255.0) * 10000 + 0.5) / 10000 AS energy
    FROM c
    """,
    tags=("northstar", "multimodal", "audio"),
)
def mm_audio_chunk_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped payload analysis: PCM-style chunking (32 samples/window)
    + per-chunk mean amplitude, all inside one Arrow-batched ``mapInPandas``
    pass (functions/multimodal.py::audio_chunk_energy — stub decode, real
    plumbing). Chunk sums are exact integer arithmetic in float64: since
    the r12 byte→codepoint decode a chunk sum is bounded by
    32 · 0x10FFFF ≈ 3.6e7 — far below 2^53 — so both engines divide
    identical numerators; no accumulation-order hazard, and the
    cent-floor is belt-and-braces."""
    from kafka_streams_playground_spark.functions.multimodal import audio_chunk_energy

    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    chunks = audio_chunk_energy(mm)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        (F.floor(F.col("energy") * 10000 + 0.5) / 10000).alias("energy"),
    )


@query(
    "mm_paired_modality_manifest",
    oracle="""
    SELECT d.doc_id,
           d.lang,
           len(string_split(d.text, ' ')) AS n_tokens,
           CAST(e.vec_id IS NOT NULL AS INT) AS has_embedding,
           CAST(COALESCE(len(e.embedding), 0) AS BIGINT) AS embedding_dim,
           CASE WHEN e.vec_id IS NOT NULL THEN 'text+vector'
                ELSE 'text_only' END AS modality
    FROM documents d LEFT JOIN embeddings e ON d.doc_id = e.vec_id
    """,
    tags=("northstar", "multimodal", "manifest", "bench"),
)
def mm_paired_modality_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired-modality training manifest: align the text corpus with its
    embedding table (shared id space) and emit, per document, the modality
    composition a multimodal batch writer consumes — token count,
    embedding presence/dimensionality, and the modality tag that drives
    mixture sampling. The alignment join is the backbone of every
    multimodal pipeline (text+image, text+audio follow the identical
    id-join shape with their binary tables; see the mm_* decode family for
    the payload side).

    Scale shape: one co-shuffled left join on the id — at 100 TB both
    sides hash on the shared key (or pre-bucket by id, making repeat
    manifest builds shuffle-free, sinks.write_bucketed_table); the wide
    text/embedding payloads are projected away BEFORE the join carries
    anything (only id + tiny derived columns ride the shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").cast("bigint").alias("embedding_dim")
    )
    j = docs.join(emb, docs["doc_id"] == emb["vec_id"], "left")
    return j.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.col("vec_id").isNotNull().cast("int").alias("has_embedding"),
        F.coalesce("embedding_dim", F.lit(0)).alias("embedding_dim"),
        F.when(F.col("vec_id").isNotNull(), "text+vector")
        .otherwise("text_only")
        .alias("modality"),
    )


# Scene segmentation: consecutive-frame intensity delta above SCENE_TH opens
# a new segment. Frame "intensity" is the stub decode of the frame's first
# byte (ascii of the char at the frame's payload offset) — deterministic and
# oracle-reproducible; a real pipeline reads a decoded luma histogram here.
SCENE_TH = 30


@query(
    "mm_scene_change_segments",
    oracle=f"""
    WITH v AS (
      SELECT doc_id, text, CAST(n_chars // {CHARS_PER_FRAME} AS BIGINT) AS n_frames
      FROM documents
    ),
    i AS (
      SELECT doc_id,
             unnest(range(0, n_frames)) AS fi,
             text
      FROM v WHERE n_frames > 0
    ),
    x AS (
      SELECT doc_id, fi,
             ascii(substr(text, CAST(fi * {CHARS_PER_FRAME} + 1 AS INT), 1)) AS inten
      FROM i
    ),
    d AS (
      SELECT doc_id, fi,
             CASE WHEN lag(inten) OVER w IS NULL THEN 1
                  WHEN abs(inten - lag(inten) OVER w) > {SCENE_TH} THEN 1
                  ELSE 0 END AS chg
      FROM x WINDOW w AS (PARTITION BY doc_id ORDER BY fi)
    ),
    s AS (
      SELECT doc_id, fi,
             CAST(SUM(chg) OVER (PARTITION BY doc_id ORDER BY fi) - 1 AS BIGINT)
                 AS segment_idx
      FROM d
    )
    SELECT doc_id, segment_idx,
           MIN(fi) AS start_frame,
           COUNT(*) AS n_frames_seg
    FROM s GROUP BY doc_id, segment_idx
    """,
    tags=("northstar", "multimodal", "video", "bench"),
)
def mm_scene_change_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change segmentation for video-shaped payloads: explode frames,
    decode a per-frame intensity (stub: the frame's first payload byte),
    open a new segment wherever the consecutive-frame delta exceeds
    SCENE_TH, and emit one row per (video, segment) with start frame and
    length — the shot-boundary pass a video curation pipeline runs before
    per-scene sampling/captioning (frame deltas are the classic
    shot-detection signal).

    Spark shape: ONE doc_id shuffle serves everything — the LAG delta, the
    running-sum segment id (two window specs over the same partitioning →
    one Exchange, same reuse as the EWMA taps), and the final
    (doc, segment) aggregate whose key PREFIX is the partitioning key.
    Frame explosion is map-side; only (doc_id, frame, one small int) ever
    shuffles, never the payload. At 100 TB per-video frame counts bound
    partition width (a 2-hour video is ~200k frames — fine); a pathological
    single video would take the range-partitioned two-phase variant of
    ``pack_sequences``'s prefix sum."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    v = docs.select(
        "doc_id",
        "text",
        (F.col("n_chars") / CHARS_PER_FRAME).cast("bigint").alias("n_frames"),
    ).filter(F.col("n_frames") > 0)
    x = v.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.col("n_frames") - 1, F.lit(1))
        ).alias("fi"),
        "text",
    ).select(
        "doc_id",
        "fi",
        F.ascii(
            F.substring(
                F.col("text"), (F.col("fi") * CHARS_PER_FRAME + 1).cast("int"), 1
            )
        ).alias("inten"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("fi")
    prev = F.lag("inten").over(w)
    chg = (
        F.when(prev.isNull(), F.lit(1))
        .when(F.abs(F.col("inten") - prev) > SCENE_TH, F.lit(1))
        .otherwise(F.lit(0))
    )
    s = x.select("doc_id", "fi", chg.alias("chg")).select(
        "doc_id",
        "fi",
        (F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
        .cast("bigint")
        .alias("segment_idx"),
    )
    return s.groupBy("doc_id", "segment_idx").agg(
        F.min("fi").alias("start_frame"),
        F.count(F.lit(1)).alias("n_frames_seg"),
    )


VAD_THR_E4 = 3600  # active chunk: energy >= 0.3600 on the exact 1e-4 grid


@query(
    "mm_audio_vad_segments",
    oracle=f"""
    WITH a AS (
      SELECT doc_id, text,
             CAST(length(text) // 32 AS BIGINT) AS n_chunks
      FROM documents
    ),
    c AS (
      SELECT doc_id, text, CAST(unnest(range(0, n_chunks)) AS BIGINT) AS chunk_idx
      FROM a WHERE n_chunks > 0
    ),
    e AS (
      SELECT doc_id, chunk_idx,
             CAST(FLOOR(({_CHUNK_SUM}) / (32 * 255.0) * 10000 + 0.5) AS BIGINT)
                 AS e4
      FROM c
    ),
    act AS (SELECT * FROM e WHERE e4 >= {VAD_THR_E4}),
    g AS (
      SELECT doc_id, chunk_idx, e4,
             chunk_idx - row_number() OVER (
               PARTITION BY doc_id ORDER BY chunk_idx) AS grp
      FROM act
    )
    SELECT doc_id,
           MIN(chunk_idx) AS start_chunk,
           MAX(chunk_idx) AS end_chunk,
           COUNT(*) AS n_active,
           CAST(SUM(e4) // COUNT(*) AS BIGINT) AS mean_energy_e4
    FROM g GROUP BY doc_id, grp
    """,
    tags=("northstar", "multimodal", "audio", "segmentation", "bench"),
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection segmentation over the audio-shaped payloads:
    maximal runs of consecutive above-threshold chunks become segments
    (start/end chunk, length, mean energy) — the speech-span manifest an
    audio curation pipeline cuts training clips from, and the audio twin
    of ``mm_scene_change_segments``'s shot boundaries. Activity compares
    on the EXACT 1e-4 integer energy grid (the chunk sum is exact integer
    arithmetic — same grid as mm_audio_chunk_energy), so both engines
    agree on every run boundary bit-for-bit.

    Spark shape: the per-chunk energies come from the same Arrow-batched
    decode pass as mm_audio_chunk_energy (stub decode, real plumbing —
    blobs stay map-side); segmentation is the gaps-and-islands identity
    (chunk_idx minus per-doc row_number is constant within a run), which
    costs ONE doc_id-keyed shuffle: the window sort and the (doc_id, grp)
    aggregate both ride the same hashpartitioning(doc_id) — grouping keys
    are a superset of the partitioning, so Catalyst inserts no second
    exchange (pinned in test_plans). At 100 TB this is embarrassingly
    parallel per recording; skew = longest single recording."""
    from kafka_streams_playground_spark.functions.multimodal import (
        audio_chunk_energy,
    )
    from pyspark.sql import Window as _W

    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))
    chunks = audio_chunk_energy(mm)
    e4 = F.floor(F.col("energy") * 10000 + 0.5).cast("long")
    act = chunks.select("doc_id", "chunk_idx", e4.alias("e4")).filter(
        F.col("e4") >= VAD_THR_E4
    )
    w = _W.partitionBy("doc_id").orderBy("chunk_idx")
    g = act.withColumn("grp", F.col("chunk_idx") - F.row_number().over(w))
    return (
        g.groupBy("doc_id", "grp")
        .agg(
            F.min("chunk_idx").alias("start_chunk"),
            F.max("chunk_idx").alias("end_chunk"),
            F.count(F.lit(1)).alias("n_active"),
            F.sum("e4").alias("sum_e4"),
        )
        .select(
            "doc_id",
            "start_chunk",
            "end_chunk",
            "n_active",
            F.expr("CAST(sum_e4 div n_active AS BIGINT)").alias("mean_energy_e4"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (round 7)
# ---------------------------------------------------------------------------

# aHash over the PHASH_BYTES leading payload bytes: bit b = byte[b] > mean
# (compared as byte*N > sum — pure integers, no float mean). 16 bits band
# into PHASH_BANDS=4 bands of 4 bits; by pigeonhole any pair within
# PHASH_HAM_TH=1 hamming shares >= 3 bands, so the band join finds EVERY
# qualifying pair — banding here is exact, not approximate.
PHASH_BYTES = 16
PHASH_BANDS = 4
PHASH_BAND_BITS = 4
PHASH_HAM_TH = 1

_PHASH_SUM_SQL = "ascii(substr(text,1,1)) + ascii(substr(text,2,1)) + ascii(substr(text,3,1)) + ascii(substr(text,4,1)) + ascii(substr(text,5,1)) + ascii(substr(text,6,1)) + ascii(substr(text,7,1)) + ascii(substr(text,8,1)) + ascii(substr(text,9,1)) + ascii(substr(text,10,1)) + ascii(substr(text,11,1)) + ascii(substr(text,12,1)) + ascii(substr(text,13,1)) + ascii(substr(text,14,1)) + ascii(substr(text,15,1)) + ascii(substr(text,16,1))"
_PHASH_BITS_SQL = """(CASE WHEN ascii(substr(text,1,1))*16 > asum THEN 1 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,2,1))*16 > asum THEN 2 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,3,1))*16 > asum THEN 4 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,4,1))*16 > asum THEN 8 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,5,1))*16 > asum THEN 16 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,6,1))*16 > asum THEN 32 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,7,1))*16 > asum THEN 64 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,8,1))*16 > asum THEN 128 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,9,1))*16 > asum THEN 256 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,10,1))*16 > asum THEN 512 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,11,1))*16 > asum THEN 1024 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,12,1))*16 > asum THEN 2048 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,13,1))*16 > asum THEN 4096 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,14,1))*16 > asum THEN 8192 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,15,1))*16 > asum THEN 16384 ELSE 0 END)
        + (CASE WHEN ascii(substr(text,16,1))*16 > asum THEN 32768 ELSE 0 END)"""


@query(
    "mm_phash_neardup",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, ({_PHASH_BITS_SQL}) AS phash
      FROM (SELECT doc_id, text, ({_PHASH_SUM_SQL}) AS asum FROM documents)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.phash, b.phash)) AS hamming
    FROM h a JOIN h b
      ON a.doc_id < b.doc_id
     AND bit_count(xor(a.phash, b.phash)) <= {PHASH_HAM_TH}
    """,
    tags=("northstar", "multimodal", "dedup", "bench"),
)
def mm_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over image-shaped payloads —
    the visual twin of MinHash text dedup: a 16-bit average-hash per blob
    (bit = leading byte above the block mean; stands in for the DCT pHash a
    real image pipeline computes after decode), then banded bucketing so
    candidate pairs come from band collisions, never an all-pairs scan.
    With 4 bands of 4 bits, hamming <= 1 pairs ALWAYS share a band
    (pigeonhole) — the band join is exact for this radius.

    Spark shape: the hash is ONE Arrow ``mapInPandas`` pass over the binary
    column (blob bytes never leave the scan stage — only (doc_id, 16-bit
    hash) rides on); bands explode 4 rows per doc and the equi-join on
    (band_no, band_value) buckets candidates exactly like the MinHash LSH
    machinery (northstar_dedup.py); verification is one integer
    bit_count(xor) per candidate. At 100 TB: band-bucket occupancy (not
    N**2) drives cost, hot buckets split by the salted-key recipe, and the
    hash widens to 64-bit DCT pHash with the same band algebra. The oracle
    recomputes the hash from ascii codepoints (payload = utf-8 of ascii
    text) and verifies pairs quadratically — affordable at oracle scale
    only, which is the point of the banding."""
    mm = attach_binary_payload(load_table(spark, sf_dir, "documents"))

    def phash_batches(batches):
        import numpy as np
        import pandas as pd

        nb = PHASH_BYTES
        for pdf in batches:
            out_ids = pdf["doc_id"].to_numpy()
            hashes = np.zeros(len(pdf), dtype=np.int64)
            for i, buf in enumerate(pdf["content"]):
                by = np.frombuffer(bytes(buf)[:nb], dtype=np.uint8).astype(np.int64)
                if len(by) < nb:
                    by = np.pad(by, (0, nb - len(by)))
                asum = int(by.sum())
                bits = (by * nb) > asum
                hashes[i] = int((bits.astype(np.int64) << np.arange(nb)).sum())
            yield pd.DataFrame({"doc_id": out_ids, "phash": hashes})

    h = mm.select("doc_id", "content").mapInPandas(
        phash_batches, "doc_id bigint, phash bigint"
    )
    band_mask = (1 << PHASH_BAND_BITS) - 1
    bands = h.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", PHASH_BAND_BITS * i).bitwiseAND(band_mask)
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("band_no", "band_val"),
    )
    ba = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("phash").alias("ha"), "band_no", "band_val"
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("phash").alias("hb"), "band_no", "band_val"
    )
    cand = (
        ba.join(bb, ["band_no", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(ha ^ hb)").alias("hamming"),
    ).filter(F.col("hamming") <= PHASH_HAM_TH).select("doc_a", "doc_b", "hamming")
