"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata;
decode/feature-extraction runs as Arrow-batched pandas UDFs via
``mapInPandas``.  The actual media codecs are NOT in this container,
so the decode step is a clearly-marked deterministic stub
(``_decode_stub``) — the Spark-side contract (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested, and swapping in
a real decoder is a one-function change.

Scale notes: mapInPandas streams Arrow record batches — the binary
payloads never materialize as Python lists; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.  Feature extraction
is embarrassingly parallel: no shuffle at all until the features feed
a downstream join/agg.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema of the media table: payload + typed metadata, as a real
# pipeline would land it (payloads from object storage, metadata from
# the ingest manifest).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("fake_feature", T.DoubleType(), False),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a media-shaped table from ``documents``: the UTF-8 bytes
    of the text stand in for an opaque payload (deterministic, so the
    DuckDB oracle can reproduce byte lengths)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payload = F.encode("text", "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> float:
    """STUB for the media decoder (image resize / audio resample /
    frame sample).  Real codecs are unavailable in this container;
    this deterministic placeholder keeps the pipeline testable.
    Replace with e.g. PIL/librosa behind the same signature."""
    n = len(payload)
    return round((n % 256) / 255.0, 6)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "fake_feature": pdf["payload"].map(_decode_stub),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(media_from_documents(spark, sf_dir)).orderBy("media_id")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_md5", T.StringType(), False),
        T.StructField("f0", T.DoubleType(), False),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4
) -> DataFrame:
    """Frame sampling: treat each payload as fixed-size frames and
    keep every ``stride``-th full frame — the video-keyframe shape of
    the pipeline, exercising mapInPandas' 1→N row fan-out (one input
    row yields a variable number of frame rows inside the same Arrow
    batch; no shuffle, no explode of materialized frame arrays).

    Per frame: a content digest (md5) and a stub first-byte feature —
    the decode stand-in (_decode_stub rationale; real frame decoding
    drops in behind the same signature).  The synthetic payloads are
    ASCII text bytes, which is what lets the DuckDB oracle reproduce
    the digests with substr/md5."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, digests, f0s = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b) // frame_bytes, stride):
                    frame = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    digests.append(hashlib.md5(frame).hexdigest())
                    f0s.append(round(frame[0] / 255.0, 6))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_md5": pd.Series(digests, dtype="object"),
                    "f0": pd.Series(f0s, dtype="float64"),
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(media_from_documents(spark, sf_dir)).orderBy(
        "media_id", "frame_idx"
    )
