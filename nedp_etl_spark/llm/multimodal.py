"""Multimodal columns (SURVEY.md §2 'llm_multimodal_col'): image/audio/video
payloads modeled as opaque binary columns with typed metadata, plus the
decode/feature-extract plumbing as an Arrow-batched ``mapInPandas`` stage.

The container has no image/audio libraries, so the decoder is a clearly
marked deterministic fake (header-byte parse) — the Spark-side plumbing
(schema, batch iteration, column pruning through the UDF) is real and
tested.  Swapping ``_fake_decode`` for PIL/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# llm_multimodal_col — struct(binary payload, mime, metadata) construction,
# projection and filtering.  Payload bytes are the document text (a
# deterministic stand-in for real media bytes).
# --------------------------------------------------------------------------

_MULTIMODAL_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       source AS meta_source,
       lang AS meta_lang
FROM documents
WHERE octet_length(CAST(text AS BLOB)) > 100
"""


@register("llm_multimodal_col", oracle=_MULTIMODAL_ORACLE)
def llm_multimodal_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.struct(
            F.col("text").cast("binary").alias("payload"),
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("mime"),
            F.create_map(
                F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
            ).alias("meta"),
        ).alias("media"),
    )
    return media.filter(F.length(F.col("media.payload")) > 100).select(
        "doc_id",
        F.col("media.mime").alias("mime"),
        F.length(F.col("media.payload")).cast("bigint").alias("n_bytes"),
        F.element_at(F.col("media.meta"), "source").alias("meta_source"),
        F.element_at(F.col("media.meta"), "lang").alias("meta_lang"),
    )


# --------------------------------------------------------------------------
# llm_multimodal_decode — Arrow-batched decode/feature-extract stage.  The
# decode is a stub (no codec libs in the container), but a DETERMINISTIC
# one: (width, height, n_frames) derive from the first/last payload bytes
# and the byte length, so the op is exact-checkable (round-3 verdict item
# 7).  The fixture text is pure ASCII (verified across all sfs), so the
# oracle's ord(first char)/ord(last char) equal the payload's first/last
# UTF-8 bytes.
# --------------------------------------------------------------------------

_DECODE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, width int, height int, n_frames int"
)

_DECODE_ORACLE = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
            WHEN doc_id % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       CAST(16 + ord(substring(text, 1, 1)) % 64 AS INT) AS width,
       CAST(16 + ord(substring(text, length(text), 1)) % 64 AS INT) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                 ELSE 1 + octet_length(CAST(text AS BLOB)) % 30 END AS INT) AS n_frames
FROM documents
"""


def _fake_decode(payload: bytes, mime: str) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/audio/video decoder.

    Real deployment: PIL.Image.open / soundfile.read / pyav frame sampling
    here, one library call per row within the Arrow batch.  (The container
    ships none of these — SURVEY §2 mandates a stubbed decode with real
    plumbing.)
    """
    if not payload:
        raise NotImplementedError("empty payload — nothing to decode")
    w = 16 + payload[0] % 64
    h = 16 + payload[-1] % 64
    frames = 1 if mime.startswith("image/") else 1 + len(payload) % 30
    return w, h, frames


@register("llm_multimodal_decode", oracle=_DECODE_ORACLE)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    src = d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    ).filter(F.col("payload").isNotNull())  # absent media: nothing to decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # One pandas frame per Arrow batch: vectorized transfer, per-row
        # decode — the standard multimodal feature-extraction shape.
        for pdf in batches:
            decoded = [_fake_decode(p, m) for p, m in zip(pdf.payload, pdf.mime)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf.doc_id,
                    "mime": pdf.mime,
                    "n_bytes": [len(p) for p in pdf.payload],
                    "width": [t[0] for t in decoded],
                    "height": [t[1] for t in decoded],
                    "n_frames": [t[2] for t in decoded],
                }
            )

    return src.mapInPandas(decode_batches, _DECODE_SCHEMA)

# --------------------------------------------------------------------------
# llm_multimodal_framesample — video frame sampling: each video document
# explodes to one row per sampled frame (stride 5) through an Arrow-batched
# 1→N ``mapInPandas`` stage.  The frame "decode" is the deterministic fake
# (frame count / signature derived from payload bytes), so — unlike
# ``llm_multimodal_decode`` — the op is exact-checkable: the oracle
# reproduces the arithmetic over octet_length.  The Spark-side plumbing is
# the real shape: batch iteration, per-row explode inside the batch,
# map-side only (no shuffle; at 100 TB this is a pure scan→transform→write
# stage that parallelizes by input split).
# --------------------------------------------------------------------------

_FRAMESAMPLE_ORACLE = """
WITH vids AS (
  SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
         1 + octet_length(CAST(text AS BLOB)) % 30 AS n_frames
  FROM documents WHERE doc_id % 3 = 2
)
SELECT doc_id, CAST(t.f AS BIGINT) AS frame_idx, CAST(n_frames AS BIGINT) AS n_frames,
       CAST((n_bytes * (t.f + 1)) % 997 AS BIGINT) AS frame_sig
FROM vids, UNNEST(range(0, n_frames, 5)) AS t(f)
"""


@register("llm_multimodal_framesample", oracle=_FRAMESAMPLE_ORACLE)
def llm_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 2)
    src = d.select("doc_id", F.col("text").cast("binary").alias("payload")).filter(
        F.col("payload").isNotNull()  # absent media object — nothing to process
    )

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 1→N inside the Arrow batch: real deployment replaces the modular
        # arithmetic with pyav keyframe extraction per sampled index.
        for pdf in batches:
            ids, idxs, totals, sigs = [], [], [], []
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                n = len(payload)
                n_frames = 1 + n % 30
                for f in range(0, n_frames, 5):
                    ids.append(doc_id)
                    idxs.append(f)
                    totals.append(n_frames)
                    sigs.append((n * (f + 1)) % 997)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_frames": totals, "frame_sig": sigs}
            )

    return src.mapInPandas(
        sample_batches,
        "doc_id bigint, frame_idx bigint, n_frames bigint, frame_sig bigint",
    )


# --------------------------------------------------------------------------
# llm_multimodal_resize — image preprocessing: aspect-preserving resize to
# fit a 224×224 vision-model input, as a 1→1 Arrow-batched ``mapInPandas``
# stage.  Input dims come from the deterministic fake decode (derived from
# octet_length so the oracle can reproduce them); the resize arithmetic is
# pure integers (scale to the long side), so the op is exact-checkable.
# Real deployment: PIL ``Image.open(...).thumbnail((224, 224))`` per row in
# the batch loop — the schema, pruning, and batch shape stay identical.
# Map-side only: at 100 TB this parallelizes by input split, no shuffle.
# --------------------------------------------------------------------------

_RESIZE_ORACLE = """
WITH imgs AS (
  SELECT doc_id,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         16 + octet_length(CAST(text AS BLOB)) % 64 AS in_w,
         16 + (octet_length(CAST(text AS BLOB)) // 7) % 64 AS in_h
  FROM documents WHERE doc_id % 3 = 0
)
SELECT doc_id, CAST(in_w AS INT) AS in_w, CAST(in_h AS INT) AS in_h,
       CAST(in_w * 224 // GREATEST(in_w, in_h) AS INT) AS out_w,
       CAST(in_h * 224 // GREATEST(in_w, in_h) AS INT) AS out_h
FROM imgs
"""


@register("llm_multimodal_resize", oracle=_RESIZE_ORACLE)
def llm_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    src = d.select("doc_id", F.col("text").cast("binary").alias("payload")).filter(
        F.col("payload").isNotNull()  # absent media object — nothing to process
    )

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            in_w, in_h, out_w, out_h = [], [], [], []
            for payload in pdf.payload:
                n = len(payload)
                w, h = 16 + n % 64, 16 + (n // 7) % 64
                long_side = max(w, h)
                in_w.append(w)
                in_h.append(h)
                out_w.append(w * 224 // long_side)
                out_h.append(h * 224 // long_side)
            yield pd.DataFrame(
                {
                    "doc_id": pdf.doc_id,
                    "in_w": in_w,
                    "in_h": in_h,
                    "out_w": out_w,
                    "out_h": out_h,
                }
            )

    return src.mapInPandas(
        resize_batches, "doc_id bigint, in_w int, in_h int, out_w int, out_h int"
    )


# --------------------------------------------------------------------------
# llm_multimodal_audio_window — audio feature extraction: each audio
# document explodes to one row per 1-second analysis window (1→N inside the
# Arrow batch, like framesample but on the audio branch).  Sample count and
# per-window energy are the deterministic fake (octet_length arithmetic:
# 16 kHz mono, 4 "samples" per payload byte), so the oracle reproduces the
# windowing exactly.  Real deployment: soundfile.read + per-window RMS/FFT
# in the batch loop.
# --------------------------------------------------------------------------

_AUDIO_WINDOW_ORACLE = """
WITH auds AS (
  SELECT doc_id,
         octet_length(CAST(text AS BLOB)) * 4 AS n_samples
  FROM documents WHERE doc_id % 3 = 1
)
SELECT doc_id,
       CAST(t.w AS BIGINT) AS window_idx,
       CAST(LEAST(16000, n_samples - t.w * 16000) AS BIGINT) AS n_window_samples,
       CAST((n_samples * (t.w + 1)) % 1000 AS BIGINT) AS energy_milli
FROM auds, UNNEST(range(0, CAST(CEIL(n_samples / 16000.0) AS BIGINT))) AS t(w)
"""


@register("llm_multimodal_audio_window", oracle=_AUDIO_WINDOW_ORACLE)
def llm_multimodal_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    src = d.select("doc_id", F.col("text").cast("binary").alias("payload")).filter(
        F.col("payload").isNotNull()  # absent media object — nothing to process
    )

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 16000  # 1-second windows at 16 kHz
        for pdf in batches:
            ids, idxs, counts, energies = [], [], [], []
            for doc_id, payload in zip(pdf.doc_id, pdf.payload):
                n_samples = len(payload) * 4
                n_windows = -(-n_samples // rate)
                for w in range(n_windows):
                    ids.append(doc_id)
                    idxs.append(w)
                    counts.append(min(rate, n_samples - w * rate))
                    energies.append((n_samples * (w + 1)) % 1000)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": idxs,
                    "n_window_samples": counts,
                    "energy_milli": energies,
                }
            )

    return src.mapInPandas(
        window_batches,
        "doc_id bigint, window_idx bigint, n_window_samples bigint, energy_milli bigint",
    )


# --------------------------------------------------------------------------
# llm_multimodal_dedup — exact BINARY dedup over the media payload column
# (the image/audio counterpart of llm_dedup_exact: identical bytes ⇒ one
# stored copy, the first dedup every multimodal ingest runs before any
# perceptual hashing).  The ingest batch is documents plus EXACT re-
# uploads of every 10th payload (new asset ids, identical bytes — the
# re-ingest duplicates exist by construction at any sf).
# Output: one row per DUPLICATED payload group — content hash, byte size,
# copy count, keeper (min doc id), and the bytes a dedup store reclaims.
#
# Scale shape: md5 map-side over the payload bytes; ONE hash-keyed
# aggregate (map-side combine).  No joins, no windows.
# --------------------------------------------------------------------------

_MM_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
h AS (
  SELECT doc_id,
         -- DuckDB md5() takes VARCHAR; it hashes the same UTF-8 bytes
         -- Spark's md5(CAST(text AS BINARY)) hashes, so the keys agree
         md5(text) AS payload_md5,
         octet_length(CAST(text AS BLOB)) AS n_bytes
  FROM corpus
)
SELECT payload_md5,
       CAST(MAX(n_bytes) AS BIGINT) AS n_bytes,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(doc_id) AS BIGINT) AS keeper,
       CAST((COUNT(*) - 1) * MAX(n_bytes) AS BIGINT) AS bytes_reclaimed
FROM h GROUP BY payload_md5
HAVING COUNT(*) >= 2
"""


@register("llm_multimodal_dedup", oracle=_MM_DEDUP_ORACLE)
def llm_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 2000000).alias("doc_id"), "text"
        )
    )
    h = corpus.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("payload_md5"),
        F.length(F.col("text").cast("binary")).cast("bigint").alias("n_bytes"),
    )
    return (
        h.groupBy("payload_md5")
        .agg(
            F.max("n_bytes").cast("bigint").alias("n_bytes"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("keeper"),
            ((F.count(F.lit(1)) - 1) * F.max("n_bytes"))
            .cast("bigint")
            .alias("bytes_reclaimed"),
        )
        .filter(F.col("n_copies") >= 2)
    )
