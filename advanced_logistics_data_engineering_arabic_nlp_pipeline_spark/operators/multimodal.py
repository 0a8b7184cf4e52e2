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
