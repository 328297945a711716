"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly
batch shape, Arrow-batched mapInPandas UDF signatures — while the actual
codec work is stubbed (no image/audio libraries ship in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a clearly-marked deterministic fake decoder produces stable feature
vectors so the downstream pipeline (resize -> feature -> dedup/ANN) is
exercised end to end.

At 100 TB the design holds: binaries stay columnar (never hit the driver),
each mapInPandas batch is one Arrow RecordBatch, and
``spark.sql.files.maxPartitionBytes`` / input splits bound per-task memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),   # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = (h * ((256 // len(h)) + 1))[: 128 + (i % 64)]
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 + (i % 16) if kind == "image" else None,
                "height": 64 + (i % 8) if kind == "image" else None,
                "duration_ms": (1000 + i * 37) if kind != "image" else None,
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """DETERMINISTIC FAKE decode/feature-extract — stands in for a real
    codec + model; stable per payload so tests can assert exact values."""
    h = hashlib.sha256(payload).digest()
    raw = (h * ((dim * 2 // len(h)) + 1))[: dim * 2]
    return [
        ((raw[2 * i] << 8 | raw[2 * i + 1]) / 65535.0) * 2.0 - 1.0 for i in range(dim)
    ]


def extract_features(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    fake=False raises NotImplementedError at task time (no codec libs in
    this container) — the STUB boundary; fake=True runs the deterministic
    stand-in. Either way the Spark plumbing (schema, batching, shuffle
    shape) is identical to the real thing.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stand-in"
                )
            payloads = [
                p if isinstance(p, (bytes, bytearray)) else bytes(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "n_bytes": [len(p) for p in payloads],
                    "feature": [_fake_feature(p, dim) for p in payloads],
                }
            )

    return media.select("media_id", "payload").mapInPandas(_run, schema=FEATURES)


def frame_sample(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp —
    pure column algebra (sequence+explode), the decode itself deferred to
    extract_features. Shows the batch shape real frame extraction uses."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
