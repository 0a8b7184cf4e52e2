"""Multimodal column plumbing (SURVEY.md §2 M4).

Images/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested; the actual
codec work is stubbed (no image/audio libraries in this container) behind
``decode_stub``: a clearly-marked deterministic fake so every downstream
operator (feature extraction, filtering, joins back to text) is exercised
end to end.

At 100 TB: binary payloads dominate partition size → ``mapInPandas`` with
small ``spark.sql.files.maxPartitionBytes`` / explicit repartition before
decode, and metadata-only predicates pushed down *before* any payload is
decoded (payload column pruned until needed).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, n_bytes bigint"
)
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, feat_mean double, feat_dim int"

DECODERS_IMPLEMENTED = False  # no PIL/ffmpeg in this container


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    metadata derived deterministically from it."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.length(F.col(text_col)) % 640 + 16).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480 + 16).cast("int").alias("height"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def decode_stub(payload: bytes) -> bytes:
    """Real decode (JPEG/PNG/audio frames) would go here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use extract_features' deterministic fake instead"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The fake 'feature' is the mean byte value of the payload — deterministic
    and SQL-mirrorable, so the full mapInPandas path is oracle-checkable.
    A real extractor swaps the loop body for decoded-pixel features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            means = [
                (sum(p) / len(p)) if len(p) else 0.0 for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": [round(m, 6) for m in means],
                    "feat_dim": [1] * len(pdf),
                }
            )

    return media.select("doc_id", "payload", "n_bytes").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id bigint, width int, height int, n_bytes bigint"


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Arrow-batched resize over the binary payload.

    A real implementation decodes and rescales pixels; the deterministic
    fake scales the byte budget by the area ratio and truncates the payload
    (floor, min 1 byte), which keeps the full mapInPandas path — schema,
    batch shape, payload handling — oracle-checkable. Metadata-only
    predicates should be applied *before* this operator so payloads for
    filtered-out rows are never shipped to Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_len = [
                max(1, min(int(n), int(n) * target_w * target_h // (int(w) * int(h))))
                for n, w, h in zip(pdf["n_bytes"], pdf["width"], pdf["height"])
            ]
            # the truncation is the "work"; only metadata leaves the stage
            _ = [p[:k] for p, k in zip(pdf["payload"], out_len)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "n_bytes": out_len,
                }
            )

    return media.select("doc_id", "payload", "width", "height", "n_bytes").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_mean double"


def sample_frames(
    media: DataFrame, frame_size: int = 16, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling: treat the payload as fixed-size frames
    and emit every ``stride``-th one (1:N explode through mapInPandas).
    The fake per-frame feature is the mean byte of the frame slice; a real
    sampler would decode keyframes. Output fans out ~n_frames/stride rows
    per input row, so at scale repartition *after* this operator, not
    before (input partitions are payload-heavy, output rows are tiny)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            means: list[float] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload), frame_size * stride):
                    frame = payload[i : i + frame_size]
                    ids.append(doc_id)
                    idxs.append(i // frame_size)
                    sizes.append(len(frame))
                    means.append(round(sum(frame) / len(frame), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)
