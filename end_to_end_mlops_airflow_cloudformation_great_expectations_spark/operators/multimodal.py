"""Multimodal column plumbing (SURVEY.md [N]): image/audio/video as
opaque ``binary`` columns + typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The container has no image/audio codecs, so the *decode* step is
stubbed: ``decode_image_real`` raises NotImplementedError unless PIL
is importable; ``decode_image_fake`` is a deterministic stand-in that
exercises the exact Spark-side machinery the real decoder would use —
binary columns through Arrow, per-batch vectorized work, typed struct
output, partition-sized batches. Swapping the fake for PIL/ffmpeg is
a one-function change; the plan shape is identical.

Scale notes: payloads ride in the same row as metadata (fine to ~MBs
per row); for larger blobs store object-store URIs and fetch inside
``mapInPandas`` per batch. Batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so decoder memory is
bounded per task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant — same pseudo-random derivation used
#: by operators.encode.hash_split_col, reproducible in plain SQL.
_KNUTH = 2654435761
_M32 = 4294967296

MEDIA_META_SCHEMA = (
    "doc_id long, byte_len long, checksum string, width int, height int, "
    "n_frames int, fmt string"
)


def attach_fake_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the
    opaque media payload + a format tag. Real tables land here from
    ``spark.read.format("binaryFile")`` or parquet binary columns."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "fmt", F.lit("fake/v1")
    )


def decode_image_real(payload: bytes):  # pragma: no cover - env-gated
    """Real decoder seam. The test container ships no codecs."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires pillow; not available in this container"
        ) from exc
    return Image.open(io.BytesIO(payload))


def _fake_dims(byte_len: int) -> tuple[int, int, int]:
    h = (byte_len * _KNUTH) % _M32
    return (h % 640 + 1, h % 480 + 1, h % 120 + 1)


def decode_media_batch(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas decoder: binary payload → typed metadata row.

    Deterministic fake: checksum = md5(payload); dims derived from
    byte length by the portable multiplicative hash (so a plain-SQL
    oracle can verify the full pipeline end-to-end)."""
    for pdf in it:
        byte_len = pdf["payload"].map(len)
        dims = byte_len.map(_fake_dims)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len,
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "width": dims.map(lambda d: d[0]),
                "height": dims.map(lambda d: d[1]),
                "n_frames": dims.map(lambda d: d[2]),
                "fmt": pdf["fmt"],
            }
        )


def media_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Run the decode pipeline: Arrow-batched, schema-typed."""
    return docs_with_payload.select("doc_id", "payload", "fmt").mapInPandas(
        decode_media_batch, MEDIA_META_SCHEMA
    )


def frame_sample(meta: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video-ish payloads: explode sampled
    frame indices (0, n, 2n, …) per document — the partition/row-shape
    transformation a real frame extractor would feed."""
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )
