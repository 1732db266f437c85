"""Multimodal column plumbing (SURVEY.md SS7).

Image/audio/video payloads are opaque BINARY columns with typed
metadata. The container has no media libraries, so the decode step is a
clearly-marked deterministic stub - but the Spark-side plumbing
(schemas, binary columns, Arrow-batched mapInPandas, partition-sized
batches) is real and tested. Swapping `_fake_decode` for a PIL/ffmpeg
call changes nothing structurally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

DECODE_OUTPUT_SCHEMA = "doc_id bigint, n_bytes int, mean_byte double, feature_dim int"


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata (UTF-8 bytes of
    the text stand in for an image/audio blob)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "payload_meta",
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.sha2(F.col(text_col), 256).alias("sha256"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[float, int]:
    """STUB for the real media decode (no image/audio libs in this
    container). Deterministic: mean byte value + fake feature dim.
    Replace with e.g. PIL.Image.open(BytesIO(payload)) in production."""
    if payload is None or len(payload) == 0:
        return 0.0, 0
    return sum(payload) / len(payload), 4


def decode_features(docs_with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams partition-local record batches through Python -
    the scalable shape for media decode (no collect, no per-row UDF
    overhead); the decode itself is the stub above.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, dims = [], []
            for payload in pdf["payload"]:
                mean_byte, dim = _fake_decode(payload)
                means.append(mean_byte)
                dims.append(dim)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)).astype("int32"),
                    "mean_byte": means,
                    "feature_dim": pd.Series(dims, dtype="int32"),
                }
            )

    return docs_with_payload.select(id_col, "payload").mapInPandas(
        extract, schema=DECODE_OUTPUT_SCHEMA
    )


def frame_sample_plan(
    docs_with_payload: DataFrame,
    bytes_per_s: int = 100,
    every_s: float = 2.0,
    max_frames: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling SCHEDULE for video-like payloads: fan each payload
    row out to one row per sampled frame (index, timestamp, byte offset)
    via sequence+explode - all plan-side arithmetic, no decode, no
    Python. The per-frame decode then runs through decode_features'
    mapInPandas; at scale the explode keeps frames co-partitioned with
    their source row, so the expensive decode stage shuffles nothing.

    Duration is derived from payload size at `bytes_per_s` (deterministic
    stand-in for a container-header probe; a real probe is a tiny
    mapInPandas reading only the header bytes).
    """
    last_idx = F.least(
        F.lit(max_frames - 1),
        F.floor((F.col("payload_meta.n_bytes") / F.lit(bytes_per_s)) / F.lit(every_s)).cast("int"),
    )
    step_bytes = int(every_s * bytes_per_s)
    return (
        docs_with_payload.select(
            id_col,
            F.col("payload_meta.n_bytes").alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), last_idx)).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            F.round(F.col("frame_idx") * F.lit(every_s), 6).alias("frame_ts"),
            (F.col("frame_idx").cast("long") * F.lit(step_bytes)).alias("byte_offset"),
        )
    )


RESIZE_OUTPUT_SCHEMA = "doc_id bigint, out_w int, out_h int, n_bytes_out int"


def resize_stub(
    docs_with_payload: DataFrame,
    out_w: int = 64,
    out_h: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched image-resize plumbing over binary payloads
    (mapInPandas, same batch shape as decode_features). STUB transform:
    output byte count = min(len(payload), out_w*out_h) - a 1-byte/px
    grayscale stand-in; swap the body for PIL's Image.resize without
    touching the Spark plumbing."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cap = out_w * out_h
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "out_w": pd.Series([out_w] * len(pdf), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(pdf), dtype="int32"),
                    "n_bytes_out": pdf["payload"]
                    .map(lambda b: 0 if b is None else min(len(b), cap))
                    .astype("int32"),
                }
            )

    return docs_with_payload.select(id_col, "payload").mapInPandas(
        resize, schema=RESIZE_OUTPUT_SCHEMA
    )


def audio_window_plan(
    docs_with_payload: DataFrame,
    bytes_per_s: int = 200,
    window_s: float = 1.0,
    hop_s: float = 0.5,
    max_windows: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping audio-analysis windows (the STFT/feature-frame input
    grid): fan each payload out to one row per (window_idx, start_ts,
    byte range) with hop-size overlap — sequence+explode plan-side
    arithmetic like frame_sample_plan, no decode, no Python. Windows
    stay co-partitioned with their source row, so the downstream
    Arrow-batched feature UDF shuffles nothing. Duration derives from
    payload size at `bytes_per_s` (header-probe stand-in)."""
    dur = F.col("payload_meta.n_bytes") / F.lit(bytes_per_s)
    n_full = F.floor((dur - F.lit(window_s)) / F.lit(hop_s)).cast("int") + F.lit(1)
    last_idx = F.least(F.lit(max_windows - 1), F.greatest(n_full - 1, F.lit(0)))
    hop_bytes = int(hop_s * bytes_per_s)
    win_bytes = int(window_s * bytes_per_s)
    return docs_with_payload.filter(dur >= window_s).select(
        id_col,
        F.explode(F.sequence(F.lit(0), last_idx)).alias("window_idx"),
    ).select(
        id_col,
        "window_idx",
        F.round(F.col("window_idx") * F.lit(hop_s), 6).alias("start_ts"),
        (F.col("window_idx").cast("long") * F.lit(hop_bytes)).alias("byte_offset"),
        F.lit(win_bytes).alias("n_bytes"),
    )


def image_patch_plan(
    docs_with_payload: DataFrame,
    width: int = 32,
    patch: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """ViT-style patch grid over image-like payloads: treat the payload
    as a `width`-pixel-wide 1-byte/px image (rows = n_bytes / width,
    floored to whole patch rows) and emit one row per PxP patch with
    its (row, col, byte_offset) — the patch-embedding input schedule,
    all plan-side arithmetic. A real pipeline swaps the fake geometry
    for header-probed (w, h) and keeps the same fan-out."""
    n_rows_px = F.floor(F.col("payload_meta.n_bytes") / F.lit(width))
    patch_rows = F.floor(n_rows_px / F.lit(patch)).cast("int")
    patch_cols = width // patch
    n_patches = patch_rows * F.lit(patch_cols)
    return docs_with_payload.filter(patch_rows >= 1).select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_patches - 1)).alias("patch_idx"),
        patch_rows.alias("__pr"),
    ).select(
        id_col,
        "patch_idx",
        F.floor(F.col("patch_idx") / F.lit(patch_cols)).cast("int").alias("patch_row"),
        F.pmod(F.col("patch_idx"), F.lit(patch_cols)).cast("int").alias("patch_col"),
        (
            F.floor(F.col("patch_idx") / F.lit(patch_cols)).cast("long")
            * F.lit(patch * width)
            + F.pmod(F.col("patch_idx"), F.lit(patch_cols)).cast("long") * F.lit(patch)
        ).alias("byte_offset"),
    )
