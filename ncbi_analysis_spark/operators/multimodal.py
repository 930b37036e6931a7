"""Multimodal column operators (BASELINE.json north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct — the layout a 100 TB multimodal training pipeline uses
(media bytes travel with the row; metadata is queryable without decoding).

The Spark-side plumbing here is real and tested: schemas, Arrow batch
shapes, ``mapInPandas`` signatures, partition sizing. The actual codec
step is STUBBED — this container has no image/audio libraries — behind
``decoder=`` hooks: pass a real decoder (PIL/torchaudio/ffmpeg wrapper)
in production; the default ``deterministic_fake_decoder`` derives stable
pseudo-features from the bytes so plumbing is testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("data", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("format", T.StringType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("phash64", T.LongType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("frame", T.BinaryType()),
])


def deterministic_fake_decoder(data: bytes, meta: dict) -> dict:
    """STUB decode: derives stable pseudo-features from md5(bytes).
    Replace with a real codec in production (see module doc)."""
    h = hashlib.md5(data or b"").digest()
    return {
        "width": int(meta.get("width") or (h[0] % 64) + 1),
        "height": int(meta.get("height") or (h[1] % 64) + 1),
        "mean_luma": h[2] / 255.0,
        "phash64": int.from_bytes(h[:8], "big", signed=True),
    }


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes, dict], dict] = deterministic_fake_decoder,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas.

    Scale notes: media rows are large (bytes travel with the row) — keep
    ``spark.sql.files.maxPartitionBytes`` low enough that a partition of
    images fits in executor memory, and repartition upstream by size, not
    row count. Arrow moves each batch once; the decoder runs per row
    inside the batch.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta if isinstance(row.meta, dict) else (row.meta or {})
                feats = decoder(row.data, dict(meta) if meta is not None else {})
                out.append({
                    "media_id": row.media_id,
                    "width": feats["width"],
                    "height": feats["height"],
                    "mean_luma": feats["mean_luma"],
                    "phash64": feats["phash64"],
                })
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    imgs = media.filter(F.col("kind") == "image").select("media_id", "data", "meta")
    return imgs.mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: Callable | None = None) -> DataFrame:
    """Resize plumbing. Requires a real codec — raises by default.

    The Spark shape is identical to image_features: mapInPandas emitting
    (media_id, data) with resized bytes.
    """
    if decoder is None:
        raise NotImplementedError(
            "resize_images needs a real image codec (PIL/opencv); this "
            "container has none. Pass decoder=... implementing "
            "(bytes, meta, width, height) -> bytes."
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "data": [decoder(d, m, width, height) for d, m in zip(pdf["data"], pdf["meta"])],
            })

    schema = T.StructType([
        T.StructField("media_id", T.LongType()), T.StructField("data", T.BinaryType()),
    ])
    return media.filter(F.col("kind") == "image").select("media_id", "data", "meta") \
        .mapInPandas(gen, schema)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  extractor: Callable | None = None) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Without a real ``extractor`` codec, emits deterministic frame stubs
    (frame index + timestamp from metadata duration; frame bytes =
    md5-derived placeholder) so downstream plumbing (explode shape,
    per-frame joins) is fully exercisable.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                meta = dict(row.meta) if row.meta is not None else {}
                duration = int(meta.get("duration_ms") or 0)
                n_frames = max(duration // every_ms, 1)
                for i in range(n_frames):
                    ts = i * every_ms
                    if extractor is not None:
                        frame = extractor(row.data, meta, ts)
                    else:
                        frame = hashlib.md5((row.data or b"") + str(ts).encode()).digest()
                    rows.append({
                        "media_id": row.media_id, "frame_idx": i,
                        "ts_ms": ts, "frame": frame,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    vids = media.filter(F.col("kind") == "video").select("media_id", "data", "meta")
    return vids.mapInPandas(gen, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — no decode, pure codegen: bytes, counts,
    dimensions per kind. The point of the typed-meta layout: cheap
    queries never touch the binary column (column pruning drops it at
    the parquet scan)."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("data")).alias("total_bytes"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )
