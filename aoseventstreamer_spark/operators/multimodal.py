"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
iterators (``mapInPandas``).

The container has no decode libraries, so the decode step is a
deterministic STUB (clearly marked) — but everything Spark-side is
real and tested: schemas, batch iteration, partition behavior, and the
UDF signatures a production decode would drop into (swap
``_stub_decode_image`` for PIL/ffmpeg and nothing else changes).

At 100 TB: binary payloads never pass through the driver; Arrow moves
each partition's batches to Python once; per-batch output rows can
exceed or shrink input rows (frame sampling), which is why these are
``mapInPandas`` and not scalar pandas_udfs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feat", T.ArrayType(T.FloatType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def _stub_decode_image(payload: bytes) -> list[float]:
    """STUB decode: a real pipeline calls PIL/torchvision here.
    Deterministic fake: 8 byte-histogram buckets normalized to [0,1]."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("real image decode requires PIL — stubbed")
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    n = len(payload)
    return [c / n for c in buckets]


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from any source table by treating encoded
    text as the opaque payload — the schema/partitioning stand-in the
    real ingest (S3 blobs) would produce."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The closure is deliberately self-contained (no references to this
    module's globals): Python workers unpickle it without needing the
    package importable on their own sys.path, so the operator works no
    matter what directory the driver process was launched from.
    """
    import hashlib

    def safe_feat(p):
        # one undecodable row must not kill a distributed job: null
        # feature instead (the curation filter downstream drops it).
        # STUB decode inlined — swap for PIL/torchvision in production.
        if p is None or len(p) == 0:
            return None
        buckets = [0] * 8
        for b in p:
            buckets[b >> 5] += 1
        return [c / len(p) for c in buckets]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int64"),
                    "checksum": payloads.map(
                        lambda p: hashlib.md5(p).hexdigest() if p else None
                    ),
                    "feat": payloads.map(safe_feat),
                }
            )
            yield out

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 4) -> DataFrame:
    """Frame-sampling shape: one input row → up to max_frames output
    rows (why this is mapInPandas, not a scalar UDF). The 'frame' is a
    byte-slice stand-in for a real ffmpeg keyframe extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue  # nothing to sample; don't kill the task
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
