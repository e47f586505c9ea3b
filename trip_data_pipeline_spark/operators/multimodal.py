"""Multimodal binary-column operators (task brief: treat image/audio/
video as opaque binary columns with typed metadata).

The container has no image/audio libraries, so the DECODE step is a
clearly-marked deterministic stub (see _decode_stub) — but every piece
of Spark plumbing around it is real and tested: BinaryType columns,
typed metadata projection, mapInPandas batch iteration with a fixed
output schema, and per-doc frame explosion.  Swapping _decode_stub for
PIL/ffmpeg is a one-function change; schemas, partitioning and batch
shapes stay identical.

The fixture tables carry no binary column, so payloads are synthesized
as utf-8 bytes of documents.text — an opaque blob as far as every
operator here is concerned.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trip_data_pipeline_spark.io import load
from trip_data_pipeline_spark.operators.common import bigint
from trip_data_pipeline_spark.registry import op

CAT = "2.11 multimodal binary"


def _payload(df: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload: binary, media_type)."""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/fake")
        .when(F.col("doc_id") % 3 == 1, "audio/fake")
        .otherwise("video/fake")
        .alias("media_type"),
    )


@op(
    "multimodal_binary_meta",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CASE WHEN doc_id % 3 = 0 THEN 'image/fake'
            WHEN doc_id % 3 = 1 THEN 'audio/fake'
            ELSE 'video/fake' END AS media_type,
       CASE WHEN octet_length(encode(text)) < 200 THEN 'small'
            WHEN octet_length(encode(text)) < 400 THEN 'medium'
            ELSE 'large' END AS size_band,
       md5(text) AS content_hash
FROM documents
""",
    category=CAT,
)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, media
    type, size band, content hash — task-brief multimodal addition
    (hash-checked: metadata extraction is engine-portable even though
    decode is not)."""
    d = _payload(load(spark, sf_dir, "documents"))
    n_bytes = F.octet_length("payload")
    return d.select(
        "doc_id",
        bigint(n_bytes).alias("n_bytes"),
        "media_type",
        F.when(n_bytes < 200, "small")
        .when(n_bytes < 400, "medium")
        .otherwise("large")
        .alias("size_band"),
        F.md5(F.col("payload")).alias("content_hash"),
    )


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder — stands in for PIL.Image.open / librosa / ffmpeg,
    none of which exist in this container.  Deterministic fake: derives
    'image' dimensions and a mean-pixel stat from the raw bytes so the
    downstream plumbing (schemas, batching, joins) is fully exercised.
    A real deployment replaces exactly this function; raise
    NotImplementedError for media types a real decoder would reject.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for null payloads")
    n = len(payload)
    return {
        "width": (payload[0] % 64 + 1) if n else 1,
        "height": (payload[-1] % 64 + 1) if n else 1,
        "mean_px": float(sum(payload) / n) if n else 0.0,
    }


@op("multimodal_decode_stub", oracle=None, category=CAT)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas 'decode' of binary payloads into typed features —
    task-brief multimodal addition (rows-only: the decode itself is a
    stub; the Arrow batch plumbing and schema contract are real)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "mean_px": [round(f["mean_px"], 4) for f in feats],
                    "decoder": "stub-v1",
                }
            )

    d = _payload(load(spark, sf_dir, "documents"))
    return d.mapInPandas(
        decode_batches,
        schema=(
            "doc_id bigint, media_type string, width int, height int, "
            "mean_px double, decoder string"
        ),
    )


@op("multimodal_frame_sample", oracle=None, category=CAT)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from 'video' payloads: every 32nd byte as a
    frame, max 8 frames per doc — task-brief multimodal addition
    (rows-only).  Same shape as real frame extraction: one input row ->
    bounded number of (doc, frame_idx, frame) rows, explode done
    JVM-side after the batch decode."""

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_val": []}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, off in enumerate(range(0, min(len(payload), 8 * 32), 32)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_val"].append(int(payload[off]))
        yield pd.DataFrame(rows)

    d = _payload(load(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video/fake"
    )
    return d.mapInPandas(
        sample_frames, schema="doc_id bigint, frame_idx int, frame_val int"
    )
