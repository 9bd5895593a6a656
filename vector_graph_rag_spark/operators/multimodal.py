"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not in the reference (text-only Graph-RAG); required by the north-star
training-data-pipeline brief.  Design:

- an asset is a row: (asset_id, modality, content: binary, meta: struct) —
  binary stays opaque to the JVM; metadata (width/height/duration/codec…)
  is typed columns so filters/pruning work at the scan.
- decode / feature-extract / resize / frame-sample are Arrow-batched
  `mapInPandas` operators.  The actual codec work needs PIL/ffmpeg etc.
  (not in this container): each operator carries a real, tested Spark-side
  contract (schema, batching, partition parallelism) with the codec kernel
  pluggable; the default kernel is either a clearly-marked
  NotImplementedError or the deterministic fake used by tests.
- at 100 TB: assets are read via the binaryFile source (or parquet with a
  binary column), partitioned by asset_id hash; every operator below is
  embarrassingly partition-parallel with no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id string, modality string, content binary, "
    "width int, height int, duration_ms int"
)


def synthetic_assets(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Deterministic fake assets derived from the documents table — the
    test stand-in for a binaryFile scan: content = UTF-8 bytes of the text,
    metadata derived from doc fields."""
    return docs.select(
        F.concat(F.lit("asset_"), F.col("doc_id").cast("string")).alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
    )


def decode_assets(assets: DataFrame, kernel=None) -> DataFrame:
    """binary → decoded feature summary via mapInPandas.

    `kernel(modality: str, content: bytes) -> dict` is the pluggable codec;
    default raises NotImplementedError for real modalities (PIL/ffmpeg not
    in this container, per the task brief) — tests inject `fake_kernel`.
    Output: (asset_id, modality, n_bytes, checksum, feature)."""

    def _default_kernel(modality: str, content: bytes) -> dict:
        raise NotImplementedError(
            f"decode for modality={modality!r} requires codec libraries "
            "(PIL/torchaudio/ffmpeg) not present in this container"
        )

    k = kernel or _default_kernel

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                k(m, bytes(c)) for m, c in zip(pdf["modality"], pdf["content"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(bytes(c)) for c in pdf["content"]],
                    "checksum": [
                        hashlib.md5(bytes(c)).hexdigest() for c in pdf["content"]
                    ],
                    "feature": [f.get("feature", 0.0) for f in feats],
                }
            )

    return assets.mapInPandas(
        _decode,
        "asset_id string, modality string, n_bytes long, checksum string, feature double",
    )


def fake_kernel(modality: str, content: bytes) -> dict:
    """Deterministic decode fake: feature = normalized first-byte mean."""
    if not content:
        return {"feature": 0.0}
    return {"feature": sum(content[:64]) / (255.0 * min(len(content), 64))}


def resize_images(assets: DataFrame, max_side: int = 512, kernel=None) -> DataFrame:
    """Resize contract: image rows get target dims (aspect-preserving);
    non-images pass through.  The pixel work is in the pluggable kernel
    (default: metadata-only computation, no pixel decode — which is also
    the correct scale behavior when only dimensions are needed)."""
    scale = F.when(
        (F.col("modality") == "image")
        & (F.greatest("width", "height") > max_side)
        & (F.greatest("width", "height") > 0),
        F.lit(max_side) / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return assets.withColumn("resize_scale", scale).withColumn(
        "target_width", F.floor(F.col("width") * F.col("resize_scale")).cast("int")
    ).withColumn(
        "target_height", F.floor(F.col("height") * F.col("resize_scale")).cast("int")
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling contract for video rows: one output row per sampled
    timestamp (pure JVM sequence/explode — the decode of the actual frame
    is the stubbed kernel's job downstream)."""
    video = assets.filter(F.col("modality") == "video")
    return video.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
