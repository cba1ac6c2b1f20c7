"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media codecs are STUBBED because
image/audio libraries are not available in this environment:

- ``decode_image`` raises NotImplementedError unless PIL is importable
  (import-try gate) — the call site, batching, and output schema are the
  production shape.
- ``fake_features`` is the deterministic stand-in used by tests/gates:
  a 16-bin byte histogram of the payload (pure numpy, reproducible).

Scale notes: payloads stay off the shuffle path — feature extraction is
a narrow mapInPandas over the source partitioning (no shuffle at all);
downstream joins carry only (media_id, features). maxRecordsPerBatch
bounds executor memory for large payloads; at production scale the
binary column would live in its own parquet/Iceberg table with a
row-group size tuned to payload size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "synth_media",
    "extract_features",
    "frame_sample",
    "decode_image",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic opaque payloads: repeated md5 bytes per media_id —
    binary column semantics without real media files, JVM-generated."""
    df = spark.range(0, n, 1)
    payload = F.unhex(
        F.concat(*[F.md5(F.concat(F.col("id").cast("string"), F.lit(f"#{i}#{seed}")))
                   for i in range(8)])
    )  # 8 * 16 = 128 deterministic bytes
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.when(kind == "image", (64 + F.pmod(F.col("id"), F.lit(64))).cast("int")).alias("width"),
        F.when(kind == "image", (64 + F.pmod(F.col("id") * 7, F.lit(64))).cast("int")).alias("height"),
        F.when(kind != "image", (1000 + F.pmod(F.col("id"), F.lit(9000))).cast("int")).alias("duration_ms"),
    )


def fake_features(payload: bytes, n_bins: int = 16) -> np.ndarray:
    """Deterministic payload 'embedding': normalized 16-bin byte histogram."""
    if payload is None or len(payload) == 0:
        return np.zeros(n_bins, dtype=np.float64)
    b = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(b >> 4, minlength=n_bins).astype(np.float64)
    return hist / hist.sum()


def decode_image(payload: bytes):
    """Real image decode — gated on PIL availability (not installed in
    this environment; the pipeline shape is what is under test)."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return np.asarray(Image.open(io.BytesIO(payload)))
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires PIL; this environment stubs it — "
            "use fake_features for deterministic pipeline tests"
        ) from e


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, n_bytes,
    features[16]) — Arrow-batched, no shuffle, payloads never leave the
    scan partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [fake_features(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed; schema/fan-out is the production shape).
    JVM-native explode of the timestamp grid — no Python at all."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ms"),
    )
