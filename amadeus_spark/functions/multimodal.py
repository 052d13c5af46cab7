"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, plus distributed decode / feature-extract / resize /
frame-sample plumbing.

Design (per BASELINE.json north star): media bytes ride in BinaryType
columns; per-item metadata (format, dims, duration) is a struct column so
filters/pruning work without touching bytes. Heavy transforms run as
Arrow-batched ``mapInPandas`` — one Python worker per partition, bytes
never pass through the driver. At 100 TB: media rows are large, so the
governing knobs are ``spark.sql.files.maxPartitionBytes`` (split size) and
keeping metadata-only queries from reading the binary column (columnar
Parquet prunes it automatically — verified in tests via ReadSchema).

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are STUBBED: ``decode_image`` raises NotImplementedError
unless ``fake=True``, which produces a deterministic fake decode (size
parsed from a tiny header contract) — the Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Decode an image payload to a feature vector.

    Real implementation needs PIL/torchvision (not in this container).
    ``fake=True`` gives a deterministic 8-dim digest-based vector so the
    distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/torchvision; not available in this "
            "environment — run with fake=True for plumbing tests"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed feature extraction over media payloads (mapInPandas,
    Arrow batches; bytes stay on executors)."""

    def _extract(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(b),
                        "sha256": hashlib.sha256(b).hexdigest(),
                        "feature": decode_image(b, fake=fake),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA])

    return df.select("media_id", "payload").mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: metadata-only selection of which
    frames to decode (frame indices from duration/fps metadata), so the
    expensive decode only touches selected offsets. Returns
    (media_id, frame_idx) pairs via sequence+explode — pure exprs."""
    n_frames = F.coalesce(F.element_at("meta", "n_frames").cast("int"), F.lit(0))
    frames = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return (
        df.filter(F.col("kind") == "video")
        # missing/zero n_frames → no frames to sample, not a crashed job
        # (sequence(0,-1,30) is illegal and would abort the query)
        .filter(n_frames >= 1)
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )


def make_fake_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for plumbing tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = (f"media-{i}-" + "x" * (i % 17)).encode()
        rows.append(
            (
                i,
                kind,
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                {"n_frames": str(90 + i)} if kind == "video" else {},
                payload,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
