"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side design is real and tested — schema convention, partitioning,
Arrow-batched UDF signatures, batch shapes; only the codec calls themselves
are stubbed (image/audio libraries are not in this container) behind
deterministic fakes / NotImplementedError, clearly marked.

Schema convention (one row per asset):
    asset_id   bigint
    modality   string              -- 'image' | 'audio' | 'video'
    content    binary              -- opaque encoded bytes
    meta       struct<mime:string, width:int, height:int,
                      duration_ms:bigint, sample_rate:int>

Large binaries dominate row size → partition by target size, not row count
(`spark.sql.files.maxPartitionBytes`); feature extraction runs in
``mapInPandas`` so one Arrow batch holds few assets but the Python worker
amortizes per-batch setup (model load via broadcast/singleton).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

def _pil():
    """Feature-detect the image codec. PIL is optional by design: this
    container ships without it (the Spark plumbing is tested with
    deterministic fakes), but when the deployment image has Pillow the
    SAME operators run the real decode path — no code change, no fork."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


_STUB = _pil() is None  # True in this container; False where Pillow exists


def _decode_image(content: bytes) -> "object":
    """Decode encoded image bytes. Real (PIL) when the codec is present;
    otherwise raises — callers that can proceed without decoding (the
    deterministic-fake paths) must check :func:`_pil` first."""
    Image = _pil()
    if Image is None:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not in this container; "
            "the surrounding Spark plumbing is real and tested with fakes"
        )
    import io

    return Image.open(io.BytesIO(content))


def synthetic_assets(spark, n: int = 100, modality: str = "image") -> DataFrame:
    """Deterministic fake assets for testing the plumbing end-to-end."""
    rows = []
    for i in range(n):
        content = bytes((i * 7 + j) % 256 for j in range(64))
        rows.append(
            (
                i,
                modality,
                content,
                {"mime": f"{modality}/fake", "width": 32 + i % 8,
                 "height": 32 + i % 4, "duration_ms": 1000 + i,
                 "sample_rate": 16000},
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def extract_features(df: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Feature extraction over binary content via mapInPandas (Arrow
    batches). The feature function is a deterministic fake (byte-histogram
    projection) standing in for a real encoder; the batch shape, schema and
    partitioning are production-real.
    """
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("modality", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                # deterministic fake: bucketed byte histogram, L1-normalized
                hist = [0.0] * feature_dim
                for b in content:
                    hist[b % feature_dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, out_schema)


def _meta_resized(width: int, height: int) -> F.Column:
    return F.struct(
        F.col("meta.mime").alias("mime"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )


def resize_images(
    df: DataFrame, width: int, height: int, codec: str = "auto"
) -> DataFrame:
    """Image resize operator — real decode when a codec is present.

    At scale: runs in mapInPandas so each Python worker processes Arrow
    batches (per-batch codec setup amortized); output keeps the INPUT
    schema with ``content`` replaced by re-encoded bytes plus a
    ``resized`` marker. Without a codec (this container), rows pass
    through with meta updated — the deterministic fake, same schema, so
    pipelines are portable across both environments.

    ``codec='stub'`` forces the deterministic fake even when Pillow is
    installed — the env-INDEPENDENT path the oracle gate and the
    synthetic-bytes fixtures use (their content is not real image data,
    so the real codec would rightly mark every row resized=false);
    ``codec='auto'`` (default) uses Pillow when available.
    """
    if codec not in ("auto", "stub"):
        raise ValueError(f"unknown codec {codec!r}")
    if codec == "stub" or _pil() is None:
        return df.withColumn("meta", _meta_resized(width, height)).withColumn(
            "resized", F.lit(True)
        )

    # preserve the INPUT schema (+ the resized marker), exactly like the
    # codec-less path — pinning ASSET_SCHEMA here would make a pipeline
    # that added columns work without Pillow and break with it
    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "resized"]
        + [T.StructField("resized", T.BooleanType(), False)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _pil()
        for pdf in it:
            new_content, new_meta, ok = [], [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                meta = dict(meta) if meta is not None else {}
                meta["width"], meta["height"] = width, height
                if content is None:
                    new_meta.append(meta)
                    new_content.append(None)
                    ok.append(False)
                    continue
                # per-row fault isolation: ONE truncated/corrupt image in
                # a crawl batch must not kill the task (and the job) —
                # bad rows pass through unresized with the error recorded
                try:
                    img = Image.open(io.BytesIO(bytes(content)))
                    fmt = img.format or "PNG"
                    buf = io.BytesIO()
                    img.resize((width, height)).save(buf, format=fmt)
                    new_content.append(buf.getvalue())
                    ok.append(True)
                except Exception:  # noqa: BLE001 — codec errors vary
                    # meta is a FIXED struct, so the failure is recorded
                    # via resized=False (filter on it downstream); the
                    # original bytes pass through for re-processing
                    new_content.append(bytes(content))
                    ok.append(False)
                new_meta.append(meta)
            pdf = pdf.assign(content=new_content, meta=new_meta, resized=ok)
            yield pdf

    return df.mapInPandas(batches, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp.
    Frame *extraction* is stubbed; the row-explosion shape (video → frames,
    the expensive part at scale) is real: duration-driven explode keeps the
    operator declarative and partition-friendly."""
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .withColumn("frame_content", F.lit(None).cast("binary"))  # STUB decode
    )
