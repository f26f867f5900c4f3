"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond the reference (text/vector only) — this is the training-pipeline
surface for image/audio/video columns at 100 TB:

- payloads travel as ``BINARY`` columns with a typed metadata struct
  (modality, codec, width/height/duration, byte length);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages so bytes stay in columnar batches end-to-end
  (never row-at-a-time Python);
- partitioning: binary rows are fat, so stages repartition by byte budget
  (``target_partition_bytes``), not row count.

The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
container, so the decode kernels are STUBBED: ``decode_stub=True`` produces a
deterministic fake feature vector from the payload bytes; ``decode_stub=False``
raises NotImplementedError where the real library call belongs.  Everything
Spark-side — schema, batch iteration, partition sizing, UDF signatures — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("codec", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_FIELD = T.StructField("features", T.ArrayType(T.FloatType()), True)
FEATURED_SCHEMA = T.StructType([*MEDIA_SCHEMA.fields, _FEATURES_FIELD])


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Fill derivable metadata (byte length) server-side — no Python."""
    return df.withColumn("n_bytes", F.length(F.col(payload_col)).cast("long"))


def _stub_features(payload: bytes | None) -> list[float] | None:
    """Deterministic fake 'decoded' feature vector: bytes -> FEATURE_DIM
    floats.  Stands in for a real decode+embed kernel (PIL/ffmpeg absent
    in this environment)."""
    if payload is None:
        return None
    acc = [0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] = (acc[i % FEATURE_DIM] * 31 + b) % 1_000_003
    return [float(a) / 1_000_003.0 for a in acc]


def extract_features(
    media: DataFrame,
    decode_stub: bool = True,
    target_partition_bytes: int = 128 << 20,
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched mapInPandas stage.

    Repartitions by total byte volume first so each task handles
    ~``target_partition_bytes`` of payload (binary rows are fat; row-count
    partitioning would skew task memory).
    """
    total = media.agg(F.sum(F.length("payload"))).collect()[0][0] or 0
    n_parts = max(1, int(total // target_partition_bytes) + 1)
    media = media.repartition(n_parts)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decode_stub:
                pdf = pdf.copy()
                pdf["features"] = pdf["payload"].map(_stub_features)
            else:
                raise NotImplementedError(
                    "real decode requires PIL/ffmpeg/librosa — not in this container; "
                    "plug the codec call here"
                )
            yield pdf

    return media.mapInPandas(_batches, schema=FEATURED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per planned
    frame timestamp (the decode of each frame is the stubbed kernel above).
    Pure column expressions — the expensive explode happens before decode so
    Spark parallelizes per-frame work.  Zero/negative/null durations plan no
    frames (a 0 ms video has nothing to sample — and this keeps the semantics
    aligned with half-open [0, duration) range generators)."""
    return (
        media.filter((F.col("modality") == "video") & (F.col("duration_ms") > 0))
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
                    F.lit(every_ms).cast("long"),
                )
            ),
        )
        .select("media_id", "codec", "frame_ts_ms", "payload")
    )
