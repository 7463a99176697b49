"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The container has no image/audio libraries, so the decode step is a
clearly-marked deterministic STUB (or NotImplementedError for the real
codec path) — but the Spark-side machinery is real and tested: binary
payload columns, metadata structs, mapInPandas batch iteration, schema
contracts, partition sizing.

Scale: binary payloads dominate partition size — repartition by byte
budget (``target_rows_per_batch``) before the UDF so each Arrow batch fits
executor memory; never collect payloads to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Schema of the decoded-feature output (what a real image decoder would
# produce: dimensions + a small feature vector).
DECODED_SCHEMA = (
    "asset_id bigint, byte_len int, format string, "
    "width int, height int, feature array<double>"
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, fmt: str = "png"
) -> DataFrame:
    """Build an opaque binary 'media' column + metadata struct from a text
    column (deterministic fake payload — stands in for reading real bytes).

    Output: (asset_id, payload binary, meta struct<byte_len int, format
    string, checksum string>)."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col).alias("asset_id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("byte_len"),
            F.lit(fmt).alias("format"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fmt: str) -> tuple[int, int, list[float]]:
    """STUB decoder: a real implementation would call PIL/ffmpeg here.

    Deterministic fake: 'dimensions' derived from the byte length, an
    8-dim 'feature' from the first bytes. Raises for formats a real
    pipeline would need a codec for, to keep the contract honest."""
    if fmt not in ("png", "jpeg", "wav", "raw"):
        raise NotImplementedError(f"no codec for format {fmt!r} in this container")
    n = len(payload)
    width = (n % 640) + 1
    height = (n % 480) + 1
    feature = [float(b) / 255.0 for b in payload[:8].ljust(8, b"\0")]
    return width, height, feature


def decode_assets(assets: DataFrame, batch_size: int = 1024) -> DataFrame:
    """mapInPandas decode: Arrow-batched iteration over (asset_id, payload,
    meta) → DECODED_SCHEMA rows. The real pattern for multimodal feature
    extraction: per-batch Python cost, columnar transfer, streaming-friendly
    (one batch in memory at a time)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [],
                "byte_len": [],
                "format": [],
                "width": [],
                "height": [],
                "feature": [],
            }
            for asset_id, payload, meta in zip(
                pdf["asset_id"], pdf["payload"], pdf["meta"]
            ):
                fmt = meta["format"]
                width, height, feature = decode_stub(bytes(payload), fmt)
                out["asset_id"].append(asset_id)
                out["byte_len"].append(int(meta["byte_len"]))
                out["format"].append(fmt)
                out["width"].append(width)
                out["height"].append(height)
                out["feature"].append(feature)
            yield pd.DataFrame(out)

    return assets.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = (
    "asset_id bigint, width int, height int, "
    "resized_width int, resized_height int, feature array<double>"
)


def resize_assets(
    decoded: DataFrame, target_width: int = 256, target_height: int = 256
) -> DataFrame:
    """STUB resize over decoded assets (a real pipeline would call
    PIL.Image.resize / ffmpeg scale here): aspect-preserving downscale to
    fit (target_width, target_height), never upscaling; the feature vector
    is halved (every 2nd component) when any downscale happens — a
    deterministic stand-in for re-extracting features at the new size.

    Chained mapInPandas after decode_assets: the compose-two-codec-stages
    shape (decode → transform) a real multimodal pipeline runs, with only
    per-batch Python cost and no intermediate materialization."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (target_width / pdf["width"]).combine(
                target_height / pdf["height"], min
            ).combine(pd.Series(1.0, index=pdf.index), min)
            rw = (pdf["width"] * scale).astype(int).clip(lower=1)
            rh = (pdf["height"] * scale).astype(int).clip(lower=1)
            feat = [
                f if s >= 1.0 else f[::2]
                for f, s in zip(pdf["feature"], scale)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "resized_width": rw,
                    "resized_height": rh,
                    "feature": feat,
                }
            )

    return decoded.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


def sample_frames(
    assets: DataFrame, every_nth_byte: int = 64, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' plumbing (video analogue): emit up to max_frames
    slices per asset — expression-only (slice positions computed in SQL,
    payload sliced with substring on binary cast)."""
    if max_frames < 1:
        # sequence(0, max_frames-1) is DESCENDING for max_frames=0 —
        # Spark's sequence counts downward when stop < start — so the
        # degenerate call would silently emit a garbage frame_no=-1 row
        # per asset instead of zero frames; refuse loudly
        raise ValueError(f"max_frames={max_frames} must be >= 1")
    if every_nth_byte < 1:
        # a zero stride emits max_frames duplicate offset-0 frames;
        # negative strides emit negative offsets — both nonsense
        raise ValueError(f"every_nth_byte={every_nth_byte} must be >= 1")
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return assets.select(
        "asset_id",
        F.explode(
            F.filter(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        i.alias("frame_no"),
                        (i * every_nth_byte).alias("offset"),
                    ),
                ),
                lambda s: s["offset"] < F.col("meta.byte_len"),
            )
        ).alias("frame"),
    ).select("asset_id", "frame.frame_no", "frame.offset")


BYTE_STATS_SCHEMA = (
    "asset_id bigint, n_bytes bigint, n_space bigint, "
    "first_byte int, last_byte int"
)


def payload_byte_stats(assets: DataFrame) -> DataFrame:
    """Per-asset raw byte statistics via mapInArrow — the zero-copy batch
    path for binary columns (no pandas conversion: pyarrow compute kernels
    read the Arrow buffers directly, which is the right interface when
    payloads are megabytes of opaque bytes).

    Emits (asset_id, n_bytes, n_space, first_byte, last_byte); byte-empty
    payloads yield NULL first/last. A real pipeline computes magic-number
    sniffing / corruption checks in exactly this shape."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index("asset_id"))
            payload = batch.column(batch.schema.get_field_index("payload"))
            n_bytes = pc.cast(pc.binary_length(payload), pa.int64())
            n_space = pc.cast(
                pc.count_substring(payload.cast(pa.binary()), b" "), pa.int64()
            )
            raw = payload.to_pylist()
            first = pa.array(
                [(b[0] if b else None) for b in raw], type=pa.int32()
            )
            last = pa.array(
                [(b[-1] if b else None) for b in raw], type=pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()), n_bytes, n_space, first, last],
                ["asset_id", "n_bytes", "n_space", "first_byte", "last_byte"],
            )

    return assets.select("asset_id", "payload").mapInArrow(
        stats, BYTE_STATS_SCHEMA
    )
