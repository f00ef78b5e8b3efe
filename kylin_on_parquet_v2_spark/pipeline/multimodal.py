"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched pandas UDFs (``mapInPandas``).

The decode step is STUBBED (the container has no image/audio libs): the
default decoder is a clearly-marked deterministic fake so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is real
and tested; a real decoder (PIL/librosa/ffmpeg) drops into
``register_decoder`` unchanged at deployment.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling); binary
payloads never leave the executor; metadata-only queries prune the binary
column at the Parquet scan (columnar projection), which is the entire point
of the opaque-binary + typed-metadata layout.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a decoded media asset's features
FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def fake_decode(payload: bytes, media_type: str) -> dict[str, Any]:
    """Deterministic FAKE decoder (stub — replace with PIL/ffmpeg at deploy).

    Derives pseudo width/height/frames/features purely from the payload
    bytes so tests are reproducible without media libraries.
    """
    n = len(payload)
    h8 = payload[:8].ljust(8, b"\0")
    width = 64 + h8[0] % 192
    height = 64 + h8[1] % 192
    n_frames = 1 if media_type == "image" else 1 + h8[2] % 30
    features = [round((b % 64) / 64.0, 4) for b in payload[:16].ljust(16, b"\0")]
    return {
        "byte_len": n,
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "features": features,
    }


_DECODER: Callable[[bytes, str], dict[str, Any]] = fake_decode


def register_decoder(fn: Callable[[bytes, str], dict[str, Any]]) -> None:
    """Swap in a real decoder (must accept (payload, media_type))."""
    global _DECODER
    _DECODER = fn


def synthesize_assets(docs: DataFrame) -> DataFrame:
    """Build a multimodal asset table from the documents fixture: the text
    bytes stand in for an encoded media payload (binary column + typed
    metadata columns), as the real table would look."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        # typed metadata columns live NEXT TO the opaque payload so
        # metadata-only queries never deserialize it
        F.length(F.encode("text", "utf-8")).cast("long").alias("byte_len"),
        F.col("source").alias("origin"),
    )


def decode_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    mapInPandas: each batch arrives as a pandas DataFrame; the decoder runs
    per row inside the batch (CPU-bound, no JVM round-trips); output schema
    is fixed (FEATURE_SCHEMA).
    """
    decoder = _DECODER

    def _decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for asset_id, media_type, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                d = decoder(bytes(payload), media_type)
                out.append(
                    {
                        "asset_id": asset_id,
                        "media_type": media_type,
                        "byte_len": d["byte_len"],
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "features": d["features"],
                    }
                )
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        _decode, FEATURE_SCHEMA
    )


#: schema of a sampled frame row (one output row PER FRAME — the
#: row-generating mapInPandas shape, a video exploded into its keyframes)
FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_key", StringType()),
    ]
)


def frame_sample(assets: DataFrame, every_k: int = 5) -> DataFrame:
    """Sample every k-th frame of each asset (images contribute their single
    frame): one output row per sampled frame — the Arrow-batched
    row-GENERATING decode shape (output rows > input rows, which a scalar
    pandas UDF cannot express; the real deployment swaps the stub decoder
    for ffmpeg keyframe extraction via register_decoder, unchanged).

    Scale notes: sampling is map-side (no shuffle), parallelism follows the
    asset scan, and each Arrow batch expands in-executor — frames never
    round-trip through the driver."""
    decoder = _DECODER

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for asset_id, media_type, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                d = decoder(bytes(payload), media_type)
                n = d["n_frames"]
                for idx in range(0, n, every_k):
                    out.append(
                        {
                            "asset_id": asset_id,
                            "media_type": media_type,
                            "n_frames": n,
                            "frame_idx": idx,
                            "frame_key": f"{asset_id}:{idx}",
                        }
                    )
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        _sample, FRAME_SCHEMA
    )


#: schema of a resize plan row
RESIZE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("new_width", IntegerType()),
        StructField("new_height", IntegerType()),
    ]
)


def resize_plan(assets: DataFrame, max_w: int = 128, max_h: int = 96) -> DataFrame:
    """Aspect-preserving fit of each asset's decoded dimensions into
    (max_w, max_h) — INTEGER arithmetic only, so the plan is bit-identical
    on every engine (the oracle replays it): the binding side keeps its
    cap, the other scales by integer floor division. Assets already inside
    the box pass through unchanged. The real deployment applies the
    computed dims in the same mapInPandas pass (PIL resize on the decoded
    pixels); the stub plans the geometry over the fake-decoded dims."""
    decoder = _DECODER

    def _plan(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for asset_id, media_type, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                d = decoder(bytes(payload), media_type)
                w, h = d["width"], d["height"]
                if w <= max_w and h <= max_h:
                    nw, nh = w, h
                elif w * max_h <= max_w * h:  # height binds
                    nh = max_h
                    nw = (w * max_h) // h
                else:  # width binds
                    nw = max_w
                    nh = (h * max_w) // w
                out.append(
                    {
                        "asset_id": asset_id,
                        "media_type": media_type,
                        "width": w,
                        "height": h,
                        "new_width": nw,
                        "new_height": nh,
                    }
                )
            yield pd.DataFrame(out)

    return assets.select("asset_id", "media_type", "payload").mapInPandas(
        _plan, RESIZE_SCHEMA
    )


def metadata_summary(assets: DataFrame) -> DataFrame:
    """Metadata-only aggregate — only reads the typed metadata columns, so
    the Parquet scan prunes the binary `payload` (ReadSchema excludes it)."""
    return (
        assets.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("byte_len").alias("total_bytes"),
            F.min("byte_len").alias("min_bytes"),
            F.max("byte_len").alias("max_bytes"),
        )
        .orderBy("media_type")
    )
